package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics checks for the round-5 temporal operators (q160-q165),
  * focused on the distributed-algorithm claims: the two-phase prefix
  * sum must equal the naive single-partition sweep, and the analytic
  * outputs must satisfy their defining invariants.
  */
class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", "target/graft-warehouse")
        .config("spark.ui.enabled", "false")
        .appName("temporal-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q160 two-phase prefix sum equals the naive global-window sweep") {
    val r = SparkEntry.queries("q160_peak_concurrency")(spark, sf).collect()(0)
    // naive reference: one global window (fine at sf0.001)
    val clicks = Tables.events(spark, sf).where(col("event_type") === "click")
    val pts = clicks.select(col("ts").as("t"), lit(1).as("d"))
      .unionAll(clicks.select((col("ts") + expr("INTERVAL 30 MINUTES")).as("t"),
        lit(-1).as("d")))
    val w = Window.orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val sweep = pts.withColumn("conc", sum(col("d")).over(w)).cache()
    val peak = sweep.agg(max(col("conc"))).collect()(0).getLong(0)
    val firstAt = sweep.where(col("conc") === peak)
      .agg(date_format(min(col("t")), "yyyy-MM-dd HH:mm:ss")).collect()(0).getString(0)
    sweep.unpersist()
    assert(r.getLong(0) == peak, s"peak ${r.getLong(0)} != naive $peak")
    assert(r.getString(1) == firstAt, s"peak time ${r.getString(1)} != naive $firstAt")
  }

  test("q161 CUSUM of the full series telescopes to ~zero") {
    // sum over ALL days of (v - mu) == 0 by construction; the query's
    // running cusum at the last day must therefore be ~0 — recompute
    // the full frame here to pin the telescoping identity.
    val daily = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"))
      .agg((sum(col("value").cast("decimal(18,3)")).cast("double") /
        count(lit(1))).as("v"))
    val mu = daily.agg(avg(col("v"))).collect()(0).getDouble(0)
    val total = daily.agg(sum(col("v") - mu)).collect()(0).getDouble(0)
    assert(math.abs(total) < 1e-6)
  }

  test("q162 attribution conserves purchases") {
    val rows = SparkEntry.queries("q162_attribution")(spark, sf).collect()
    val attributed = rows.map(_.getLong(1)).sum
    val purchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    assert(attributed == purchases,
      s"attributed $attributed != purchases $purchases")
  }

  test("q163 A/B split covers every user exactly once and z matches the rates") {
    val r = SparkEntry.queries("q163_ab_test")(spark, sf).collect()(0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users)
    val (na, nb, ca, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val pool = (ca + cb).toDouble / (na + nb)
    if (pool > 0 && pool < 1) {
      val z = (ca.toDouble / na - cb.toDouble / nb) /
        math.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
      assert(math.abs(r.getDouble(6) - z) < 1e-4)
    }
  }

  test("q164 as-of snapshot agrees with the q150 SCD2 interval containing the instant") {
    val asof = SparkEntry.queries("q164_asof_snapshot")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = "2024-02-15 00:00:00"
    val viaScd2 = SparkEntry.queries("q150_scd2_intervals")(spark, sf).collect()
      .filter(r => r.getString(2) <= cut &&
        (r.getString(3) == "open" || r.getString(3) > cut))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asof == viaScd2, "as-of read disagrees with the SCD2 interval table")
  }

  test("q165 audit emits every check exactly once") {
    val rows = SparkEntry.queries("q165_integrity_audit")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("docs_under_100_chars", "lineitem_without_order",
        "orders_before_1996", "orders_without_customer"))
    assert(rows.forall(_.getLong(1) >= 0))
  }
}
