package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-30 operators (q468–q469) beyond their
  * oracle hash checks: the hub table is pinned against q452's edge
  * table (degrees, net flow, strongest edge); the lead-time profile
  * against scalar cross-correlations at every lag; plus the q450
  * plan-shape pin (its rank cut must lower to the bounded-heap
  * TopKPerGroup, not a generic window sort).
  */
class Round30Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round30-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  test("q468 hubs equal the collapse of q452's edge table") {
    val rows = byName("q468_causal_hubs")(spark, sf).collect()
    assert(rows.length === 5)
    val edges = byName("q452_causal_consensus")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3),
        r.getDouble(6), r.getInt(7)))
    for (r <- rows) {
      val el = r.getString(0)
      val out = edges.filter(_._1 == el)
      val in = edges.filter(_._2 == el)
      assert(r.getLong(1) === out.count(_._5 >= 2).toLong, s"$el out_deg")
      assert(r.getLong(2) === in.count(_._5 >= 2).toLong, s"$el in_deg")
      assert(r.getLong(3) === (out.count(_._5 >= 2) - in.count(_._5 >= 2)).toLong)
      assert(math.abs(r.getDouble(4) - out.map(_._4).sum / out.length) < 1e-5)
      val strongest = out.maxBy(e => e._5 * 1000.0 + math.abs(e._3))._2
      assert(r.getString(5) === strongest, s"$el strongest edge")
    }
    // degrees are conserved: total out == total in
    assert(rows.map(_.getLong(1)).sum === rows.map(_.getLong(2)).sum)
  }

  private lazy val dailyGrid: Map[String, Map[Int, Double]] =
    spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
      .agg((sum(col("value").cast("decimal(18,3)")).cast("double") /
        count(lit(1))).as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toMap).toMap

  test("q469 lead time equals the scalar argmax over the lag profile") {
    val rows = byName("q469_lead_time")(spark, sf).collect()
    assert(rows.length === 20)
    def corrAt(src: String, dst: String, lag: Int): (Int, Double) = {
      val x = dailyGrid(src); val y = dailyGrid(dst)
      val pairs = x.keys.toSeq.sorted.flatMap(di =>
        y.get(di + lag).map(yv => (x(di), yv)))
      val n = pairs.length
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      (n, (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    }
    for (r <- rows) {
      val (src, dst) = (r.getString(0), r.getString(1))
      val prof = (0 to 7).map(l => (l, corrAt(src, dst, l)))
      val best = prof.minBy { case (l, (_, rr)) => (-math.abs(rr), l) }
      assert(r.getInt(2) === best._1, s"$src->$dst lead")
      assert(math.abs(r.getDouble(3) - best._2._2) < 1e-5, s"$src->$dst peak r")
      assert(r.getLong(4) === best._2._1.toLong)
      assert(r.getInt(5) === (if (best._1 > 0) 1 else 0))
    }
  }

  test("q450's rank cut lowers to a bounded per-group heap (plan pin)") {
    // Spark 4's native WindowGroupLimit (Partial+Final top-k heap) or the
    // custom TopKPerGroup both bound the cut; a bare Window+Filter with no
    // group limit would sort every corpus row per query — the shape to ban.
    val plan = byName("q450_hard_negatives")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") || plan.contains("TopKPerGroup"),
      "q450's per-query rank cut must lower to a bounded heap, " +
        s"found plan:\n${plan.take(2000)}")
  }
}
