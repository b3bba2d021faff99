package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-31 operators (q470–q472) beyond their
  * oracle hash checks: the edge-FDR table is pinned against q446's
  * p-values with exact step-up arithmetic; VaR/ES against scalar order
  * statistics (and the ES ≤ VaR coherence property); and the
  * streaming==batch identity for q472.
  */
class Round31Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round31-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  test("q470 edge FDR equals q446's p-values with exact BH step-up arithmetic") {
    val rows = byName("q470_edge_fdr")(spark, sf).collect()
    assert(rows.length === 20)
    val ps = byName("q446_circular_shift_null")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(5))))
      .toMap
    val m = rows.length
    val kstar = rows.filter(r => r.getDouble(3) <= r.getLong(4) * 0.1 / m)
      .map(_.getLong(4)).sorted.lastOption.getOrElse(0L)
    var prev = -1.0
    for (r <- rows.sortBy(_.getLong(4))) {
      val k = (r.getString(0), r.getString(1))
      val (wantR, wantP) = ps(k)
      assert(r.getDouble(2) === wantR, s"$k r_lag1")
      assert(r.getDouble(3) === wantP, s"$k p")
      assert(r.getDouble(3) >= prev - 1e-12, "p ascending"); prev = r.getDouble(3)
      assert(math.abs(r.getDouble(5) - r.getLong(4) * 0.1 / m) < 1e-6)
      assert(r.getInt(6) === (if (r.getLong(4) <= kstar) 1 else 0))
    }
  }

  private lazy val dailyGrid: Map[String, Seq[(Int, Double)]] =
    spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
      .agg((sum(col("value").cast("decimal(18,3)")).cast("double") /
        count(lit(1))).as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq)
      .toMap

  test("q471 VaR/ES equal scalar order statistics; ES <= VaR (coherence)") {
    val rows = byName("q471_var_es")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val vs = dailyGrid(el).sortBy(v => (v._2, v._1)).map(_._2)
      val n = vs.length
      def cut(q: Double): Double = vs(math.ceil(n * q).toInt - 1)
      def es(v: Double): Double = {
        val tail = vs.filter(_ <= v); tail.sum / tail.length
      }
      assert(r.getLong(1) === n.toLong)
      assert(math.abs(r.getDouble(2) - cut(0.10)) < 1e-6, s"$el var10")
      assert(math.abs(r.getDouble(3) - es(cut(0.10))) < 1e-4, s"$el es10")
      assert(math.abs(r.getDouble(4) - cut(0.05)) < 1e-6, s"$el var05")
      assert(math.abs(r.getDouble(5) - es(cut(0.05))) < 1e-4, s"$el es05")
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-9, "ES10 <= VaR10")
      assert(r.getDouble(5) <= r.getDouble(4) + 1e-9, "ES05 <= VaR05")
      assert(r.getDouble(4) <= r.getDouble(2) + 1e-9, "deeper tail is lower")
    }
  }

  test("q472 streaming lead time final refresh equals the batch q469 result") {
    val batch = byName("q469_lead_time")(spark, sf).collect().map(_.toString).toSeq
    val stream = byName("q472_stream_lead_time")(spark, sf).collect().map(_.toString).toSeq
    assert(stream === batch)
  }
}
