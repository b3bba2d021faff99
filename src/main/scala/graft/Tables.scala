package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet testdata (TESTDATA.md).
  *
  * All engine queries take `(spark, sfDir)` and read through here so the
  * scan is a plain columnar parquet scan that Catalyst can push filters
  * and projections into. At 100 TB these would be partitioned/bucketed
  * tables behind the same names; nothing else in the engine changes.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as raw long (legacy conf) and rebuild a
    * micros-precision TimestampType with integer DIV (no double
    * round-trip: nanos epochs exceed 2^53, so `/1000` through double
    * would lose microseconds). DuckDB likewise truncates nanos→micros,
    * keeping the two engines' views of `ts` identical.
    *
    * The nanos-as-long flag is SESSION-WIDE (no reader-scoped option
    * exists); [[GraftSession]] sets it at session setup and documents the
    * contract. The set here is an idempotent safety net for
    * driver-supplied sessions that bypassed GraftSession.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
