package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-27 operators (q452–q456) beyond their
  * oracle hash checks: the consensus scoreboard is pinned COLUMN BY
  * COLUMN against the four standalone queries it composes (q441, q230,
  * q445, q446) and its vote arithmetic; Taylor/Allan/DFA against
  * scalar recomputations; break co-occurrence against the q233/q434
  * outputs it joins.
  */
class Round27Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round27-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  test("q452 consensus equals its four standalone component queries, vote-exact") {
    val rows = byName("q452_causal_consensus")(spark, sf).collect()
    assert(rows.length === 20)
    val bart = byName("q441_bartlett_xcorr")(spark, sf).collect()
      .filter(_.getInt(2) == 1)
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(4), r.getDouble(6))))
      .toMap
    val gg = byName("q230_granger_lite")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    val rg = byName("q445_rank_granger")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    val cn = byName("q446_circular_shift_null")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
    for (r <- rows) {
      val k = (r.getString(0), r.getString(1))
      val (wantR, wantZ) = bart(k)
      assert(r.getDouble(2) === wantR, s"$k r_lag1")
      assert(r.getDouble(3) === wantZ, s"$k z")
      assert(r.getDouble(4) === gg(k), s"$k granger gain")
      assert(r.getDouble(5) === rg(k), s"$k rank granger gain")
      assert(r.getDouble(6) === cn(k), s"$k surrogate p")
      val votes = (if (math.abs(wantZ) > 1.959963984540054) 1 else 0) +
        (if (gg(k) >= 0.05) 1 else 0) + (if (rg(k) >= 0.05) 1 else 0) +
        (if (cn(k) <= 0.1) 1 else 0)
      assert(r.getInt(7) === votes, s"$k votes")
    }
  }

  private lazy val hourly: Map[String, Map[Int, Double]] =
    spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        (datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")) * 24
          + hour(col("ts"))).as("h"))
      .agg(count(lit(1)).cast("double").as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toMap).toMap

  test("q453 Taylor's law equals the scalar log-log fit over day moments") {
    val rows = byName("q453_taylor_law")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val pts = (0 to 29).flatMap { di =>
        val hs = (0 to 23).map(hh => hourly(el).getOrElse(di * 24 + hh, 0.0))
        val m = hs.sum / 24.0
        val v = hs.map(x => (x - m) * (x - m)).sum / 23.0
        if (m > 0 && v > 0) Some((math.log(m), math.log(v))) else None
      }
      val n = pts.length
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(r.getLong(1) === n.toLong)
      assert(math.abs(r.getDouble(2) - b) < 1e-4, s"$el slope")
      assert(math.abs(r.getDouble(3) - (sy - b * sx) / n) < 1e-4)
      val corr = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(r.getDouble(4) - corr) < 1e-4)
      // event counts over-disperse mildly at worst on this fixture
      assert(r.getDouble(2) > 0.0, "positive fluctuation scaling")
    }
  }

  test("q454 Allan variance equals the scalar block recomputation; tau=1 near Poisson form") {
    val rows = byName("q454_allan_variance")(spark, sf).collect()
    assert(rows.length === 20)
    for (r <- rows) {
      val el = r.getString(0); val tau = r.getInt(1)
      val dense = (0 to 719).map(h => hourly(el).getOrElse(h, 0.0))
      val lam = dense.sum / 720.0
      val blocks = dense.grouped(tau).map(b => b.sum / tau).toSeq
      val diffs = blocks.sliding(2).filter(_.length == 2)
        .map(w => (w(1) - w(0)) * (w(1) - w(0))).toSeq
      val avar = 0.5 * diffs.sum / diffs.length
      assert(r.getLong(2) === diffs.length.toLong)
      assert(math.abs(r.getDouble(3) - avar) < 1e-5, s"$el tau=$tau avar")
      assert(math.abs(r.getDouble(4) - avar * tau / lam) < 1e-4)
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("q455 DFA equals the scalar per-window detrended RMS and 3-point fit") {
    val rows = byName("q455_dfa")(spark, sf).collect()
    assert(rows.nonEmpty)
    val dailyGrid = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
      .agg((sum(col("value").cast("decimal(18,3)")).cast("double") /
        count(lit(1))).as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).map(_._2))
      .toMap
    for (r <- rows) {
      val el = r.getString(0)
      val vs = dailyGrid(el)
      val mu = vs.sum / vs.length
      val prof = vs.scanLeft(0.0)((acc, v) => acc + (v - mu)).tail
      def fOf(w: Int): Double = {
        val msList = prof.zipWithIndex.map { case (y, i) => (i / w, i + 1.0, y) }
          .groupBy(_._1).values.filter(_.length == w).map { blk =>
            val c = blk.length
            val sx = blk.map(_._2).sum; val sy = blk.map(_._3).sum
            val sxy = blk.map(b => b._2 * b._3).sum
            val sxx = blk.map(b => b._2 * b._2).sum
            val syy = blk.map(b => b._3 * b._3).sum
            ((syy - sy * sy / c) -
              (sxy - sx * sy / c) * (sxy - sx * sy / c) / (sxx - sx * sx / c)) / c
          }.toSeq
        math.sqrt(msList.sum / msList.length)
      }
      val pts = Seq(5, 10, 15).map(w => (math.log(w.toDouble), math.log(fOf(w))))
      val n = pts.length
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val alpha = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(r.getLong(1) === 3L)
      assert(math.abs(r.getDouble(2) - alpha) < 1e-4, s"$el alpha")
      assert(math.abs(r.getDouble(3) - fOf(5)) < 1e-4, s"$el F(5)")
      assert(math.abs(r.getDouble(4) - fOf(15)) < 1e-4, s"$el F(15)")
    }
  }

  test("q456 break co-occurrence joins exactly the q233 / q434 changepoints") {
    val rows = byName("q456_break_cooccurrence")(spark, sf).collect()
    assert(rows.length === 10)
    val meanCp = byName("q233_cusum_changepoint")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    val varCp = byName("q434_inclan_tiao")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(3))).toMap
    for (r <- rows) {
      val (i, j) = (r.getString(0), r.getString(1))
      assert(r.getInt(2) === meanCp(i)); assert(r.getInt(3) === meanCp(j))
      assert(r.getInt(4) === math.abs(meanCp(i) - meanCp(j)))
      assert(r.getInt(5) === (if (math.abs(meanCp(i) - meanCp(j)) <= 2) 1 else 0))
      assert(r.getInt(6) === varCp(i)); assert(r.getInt(7) === varCp(j))
      assert(r.getInt(8) === math.abs(varCp(i) - varCp(j)))
      assert(r.getInt(9) === (if (math.abs(varCp(i) - varCp(j)) <= 2) 1 else 0))
    }
  }
}
