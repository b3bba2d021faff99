package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-24 operators (q434–q439) beyond their
  * oracle hash checks: scalar reimplementations of Inclán–Tiao, the
  * runs test, the variance-ratio diagnostic, the Gumbel fit, and the
  * full BH step-up (p-values re-derived through the same A&S 7.1.26
  * polynomial AND sanity-bounded against the exact normal tail); plus
  * the streaming==batch identity for q439.
  */
class Round24Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round24-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  private lazy val dailyGrid: Map[String, Seq[(Int, Double)]] =
    spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
      .agg((sum(col("value").cast("decimal(18,3)")).cast("double") /
        count(lit(1))).as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq)
      .toMap

  test("q434 Inclan-Tiao equals the scalar CUSUM-of-squares recomputation") {
    val rows = byName("q434_inclan_tiao")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val vs = dailyGrid(el)
      val n = vs.length
      val mu = vs.map(_._2).sum / n
      val a2 = vs.map { case (di, v) => (di, (v - mu) * (v - mu)) }
      val ctot = a2.map(_._2).sum
      var c = 0.0
      val ds = a2.zipWithIndex.map { case ((di, a), k) =>
        c += a; (di, c / ctot - (k + 1).toDouble / n)
      }
      val (cpDi, dMax) = ds.minBy { case (di, dv) => (-math.abs(dv), di) }
      val it = math.sqrt(n / 2.0) * math.abs(dMax)
      assert(r.getLong(1) === n.toLong)
      assert(math.abs(r.getDouble(2) - it) < 1e-5, s"$el it_stat")
      assert(r.getInt(3) === cpDi, s"$el cp day")
      assert(r.getInt(4) === (if (it > 1.358) 1 else 0))
    }
  }

  test("q435 runs test equals the scalar recomputation around the exact median") {
    val rows = byName("q435_runs_test")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val vs = dailyGrid(el)
      val n = vs.length
      val med = vs.sortBy(v => (v._2, v._1)).apply((n + 1) / 2 - 1)._2
      val signs = vs.map(v => if (v._2 > med) 1 else 0)
      val n1 = signs.sum; val n2 = n - n1
      val runs = 1 + signs.sliding(2).count(w => w.length == 2 && w(0) != w(1))
      val muR = 2.0 * n1 * n2 / n + 1.0
      val sigR = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) /
        (n.toDouble * n * (n - 1)))
      val z = (runs - muR) / sigR
      assert(r.getLong(1) === n1.toLong)
      assert(r.getLong(2) === n2.toLong)
      assert(r.getLong(3) === runs.toLong, s"$el runs")
      assert(math.abs(r.getDouble(4) - z) < 1e-5, s"$el z")
      assert(r.getInt(5) === (if (math.abs(z) > 1.959963984540054) 1 else 0))
    }
  }

  test("q436 variance ratio equals the scalar overlapping-sum recomputation") {
    val rows = byName("q436_variance_ratio")(spark, sf).collect()
    assert(rows.length === 15)
    for (r <- rows) {
      val el = r.getString(0); val m = r.getInt(1)
      val vs = dailyGrid(el).map(_._2)
      val rt = vs.sliding(2).collect { case Seq(a, b) => b - a }.toSeq
      val n = rt.length
      val mu = rt.sum / n
      val ss = rt.map(x => (x - mu) * (x - mu)).sum
      val sums = rt.sliding(m).filter(_.length == m).map(_.sum).toSeq
      val vr = (sums.map(s2 => (s2 - m * mu) * (s2 - m * mu)).sum / sums.length) /
        (m * (ss / n))
      val z = (vr - 1.0) / math.sqrt(2.0 * (2 * m - 1) * (m - 1) / (3.0 * m * n))
      assert(math.abs(r.getDouble(2) - vr) < 1e-4, s"$el m=$m vr: got ${r.getDouble(2)} want $vr")
      assert(math.abs(r.getDouble(3) - z) < 1e-3, s"$el m=$m z")
      assert(r.getInt(4) === (if (math.abs(z) > 1.959963984540054) 1 else 0))
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("q437 Gumbel fit equals the scalar moments and orders the return level") {
    val rows = byName("q437_gumbel_blockmax")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val mx = dailyGrid(el).filter(_._1 <= 27).groupBy(_._1 / 7)
        .values.map(_.map(_._2).max).toSeq
      val nb = mx.length
      val m = mx.sum / nb
      val s2 = mx.map(x => (x - m) * (x - m)).sum / (nb - 1)
      val beta = math.sqrt(s2) * math.sqrt(6.0) / math.Pi
      val mu = m - 0.5772156649015329 * beta
      val x30 = mu - beta * math.log(-math.log(1.0 - 1.0 / 30.0))
      assert(r.getLong(1) === nb.toLong)
      assert(math.abs(r.getDouble(2) - mu) < 1e-4, s"$el mu")
      assert(math.abs(r.getDouble(3) - beta) < 1e-4, s"$el beta")
      assert(math.abs(r.getDouble(4) - x30) < 1e-3, s"$el ret level")
      // the once-a-month exceedance level sits above the location param
      assert(x30 > mu)
      assert(beta > 0.0)
    }
  }

  test("q438 BH step-up: p-values match the polynomial and the exact tail; " +
    "discoveries are exactly ranks <= k*") {
    val rows = byName("q438_bh_fdr")(spark, sf).collect()
    assert(rows.length === 10)
    def pOf(absZ: Double): Double = {
      val u = absZ / 1.4142135623730951
      val t = 1.0 / (1.0 + 0.3275911 * u)
      (0.254829592 * t - 0.284496736 * t * t + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t + 1.061405429 * t * t * t * t * t) *
        math.exp(-u * u)
    }
    // exact two-sided normal tail via adaptive Simpson on the density
    def exactP(absZ: Double): Double = {
      def f(x: Double) = math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.Pi)
      val hi = absZ + 12.0
      val n = 20000
      val h = (hi - absZ) / n
      var s = f(absZ) + f(hi)
      for (i <- 1 until n) s += (if (i % 2 == 0) 2.0 else 4.0) * f(absZ + i * h)
      2.0 * s * h / 3.0
    }
    val m = rows.length
    val kstar = rows.filter(r => r.getDouble(4) <= r.getLong(5) * 0.1 / m)
      .map(_.getLong(5)).sorted.lastOption.getOrElse(0L)
    var prevP = -1.0
    for (r <- rows.sortBy(_.getLong(5))) {
      val (z, p, rank, crit, disc) = (r.getDouble(3), r.getDouble(4),
        r.getLong(5), r.getDouble(6), r.getInt(7))
      assert(math.abs(p - pOf(z)) < 2e-6, "polynomial parity")
      assert(math.abs(p - exactP(z)) < 1e-5, s"A&S error bound at z=$z")
      assert(p >= prevP - 1e-9, "p ascending in rank"); prevP = p
      assert(math.abs(crit - rank * 0.1 / m) < 1e-6)
      assert(disc === (if (rank <= kstar) 1 else 0), s"rank $rank vs k*=$kstar")
    }
  }

  test("q439 streaming Inclan-Tiao final refresh equals the batch q434 result") {
    val batch = byName("q434_inclan_tiao")(spark, sf).collect().map(_.toString).toSeq
    val stream = byName("q439_stream_inclan")(spark, sf).collect().map(_.toString).toSeq
    assert(stream === batch)
  }
}
