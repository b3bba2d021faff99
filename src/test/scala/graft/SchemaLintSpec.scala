package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The Verify-time output-schema lint must catch every driver-hash trap
  * type this project has hit (DECIMAL, ARRAY, MAP, TIMESTAMP), pass
  * hash-safe schemas, and — as a standing gate — pass every registered
  * QueryDef's declared output schema.
  */
class SchemaLintSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("schema-lint-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("lint catches a violating QueryDef for each trap type") {
    val ss = spark
    import ss.implicits._
    val base = Seq((1L, "a")).toDF("id", "s")
    val traps = Seq(
      "decimal" -> QueryDef("bad_decimal", "SELECT 1") { (_, _) =>
        base.select(col("id"), col("id").cast("decimal(18,3)").as("total")) },
      "array" -> QueryDef("bad_array", "SELECT 1") { (_, _) =>
        base.select(col("id"), array(col("s")).as("postings")) },
      "map" -> QueryDef("bad_map", "SELECT 1") { (_, _) =>
        base.select(col("id"), map(col("s"), col("id")).as("m")) },
      "timestamp" -> QueryDef("bad_ts", "SELECT 1") { (_, _) =>
        base.select(col("id"), current_timestamp().as("ts")) })
    traps.foreach { case (kind, qd) =>
      val df = qd.fn(spark, "unused")
      assert(SchemaLint.violations(df.schema).nonEmpty, s"$kind not caught")
      val e = intercept[IllegalStateException](SchemaLint.check(qd.name, df))
      assert(e.getMessage.contains(qd.name), s"$kind error lacks query name")
    }
  }

  test("lint passes hash-safe columns (double/string/long/date/bool)") {
    val ss = spark
    import ss.implicits._
    val ok = Seq((1L, "a")).toDF("id", "s")
      .select(col("id"), col("s"), col("id").cast("double").as("d"),
        lit(java.sql.Date.valueOf("2024-01-01")).as("day"),
        (col("id") > 0).as("flag"))
    assert(SchemaLint.violations(ok.schema).isEmpty)
    SchemaLint.check("ok", ok) // must not throw
  }

  test("every registered query's output schema passes the lint") {
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      SchemaLint.check(name, fn(spark, sf))
    }
  }
}
