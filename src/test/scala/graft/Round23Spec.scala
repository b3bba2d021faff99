package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-23 operators (q426–q433) beyond their
  * oracle hash checks: scalar reimplementations of the discretized
  * Hawkes EM step, Welch coherence, distance correlation, Ljung–Box,
  * binary segmentation (brute-force over all split pairs), the GMM EM
  * chain, and tail dependence; plus the streaming==batch identity for
  * q433 and range sanity on every bounded statistic.
  */
class Round23Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round23-spec").getOrCreate())
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

  test("q426 Hawkes branching matrix equals the scalar EM-step recomputation") {
    val rows = byName("q426_hawkes_cross")(spark, sf).collect()
    assert(rows.length === 25)
    // scalar hour grid
    val hg = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        (datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")) * 24
          + hour(col("ts"))).as("h"))
      .agg(count(lit(1)).cast("double").as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val els = hg.map(_._1).distinct.sorted
    val nOf = hg.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val byH = hg.groupBy(x => (x._1, x._2)).view.mapValues(_.head._3).toMap
    val beta = graft.operators.Round23Ops.HawkesBeta
    val a0 = graft.operators.Round23Ops.HawkesAlpha0
    // excitation arriving at hour h from src j
    def e(j: String, h: Int): Double =
      (1 to graft.operators.Round23Ops.HawkesLags).map { dl =>
        byH.getOrElse((j, h - dl), 0.0) * (beta * math.exp(-beta * dl))
      }.sum
    val got = rows.map(r => ((r.getString(0), r.getString(1)),
      (r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    for (dst <- els; src <- els) {
      val mu = nOf(dst) / graft.operators.Round23Ops.HawkesHours
      var sr = 0.0
      for ((el, h, n) <- hg if el == dst) {
        val et = els.map(e(_, h)).sum
        val ej = e(src, h)
        if (et > 0) sr += n * (a0 * ej) / (mu + a0 * et)
      }
      val alpha = sr / nOf(src)
      val (gAlpha, gMass, gN) = got((dst, src))
      assert(gN === nOf(src).toLong)
      assert(math.abs(gAlpha - alpha) < 1e-4, s"$src->$dst: got $gAlpha want $alpha")
      assert(math.abs(gMass - sr) < 1e-2)
      assert(gAlpha >= 0.0 && gAlpha < 1.0, "subcritical branching on this fixture")
    }
    // responsibilities conserve mass: sum over sources of resp_mass for a
    // dst is at most the dst's total event count (background takes the rest)
    for (dst <- els) {
      val mass = rows.filter(_.getString(0) == dst).map(_.getDouble(3)).sum
      assert(mass < nOf(dst), s"$dst attributed mass $mass >= N=${nOf(dst)}")
    }
  }

  private def scalarCoherence: Map[(String, String, Double), Double] = {
    val els = dailyGrid.keys.toSeq.sorted
    val out = collection.mutable.Map[(String, String, Double), Double]()
    for (i <- els; j <- els if i < j; p <- Seq(7.0, 14.0)) {
      val om = 2.0 * math.Pi / p
      var xre = 0.0; var xim = 0.0; var pxx = 0.0; var pyy = 0.0
      for (seg <- 0 to 2) {
        val days = (seg * 7) to (seg * 7 + 13)
        def dft(el: String): (Double, Double) = {
          val vs = dailyGrid(el).filter(d => days.contains(d._1))
          val m = vs.map(_._2).sum / vs.length
          (vs.map(d => (d._2 - m) * math.cos(om * d._1)).sum,
            vs.map(d => (d._2 - m) * math.sin(om * d._1)).sum)
        }
        val (ci, si) = dft(i); val (cj, sj) = dft(j)
        xre += ci * cj + si * sj
        xim += si * cj - ci * sj
        pxx += ci * ci + si * si
        pyy += cj * cj + sj * sj
      }
      out((i, j, p)) = (xre * xre + xim * xim) / (pxx * pyy)
    }
    out.toMap
  }

  test("q427 coherence equals the scalar Welch recomputation and is in [0,1]") {
    val rows = byName("q427_coherence")(spark, sf).collect()
    assert(rows.length === 20)
    val want = scalarCoherence
    for (r <- rows) {
      val k = (r.getString(0), r.getString(1), r.getDouble(2))
      val got = r.getDouble(3)
      assert(math.abs(got - want(k)) < 1e-5, s"$k: got $got want ${want(k)}")
      assert(got >= 0.0 && got <= 1.0 + 1e-9)
    }
  }

  test("q428 distance correlation equals the scalar recomputation, in [0,1]") {
    val rows = byName("q428_distance_corr")(spark, sf).collect()
    assert(rows.length === 10)
    for (r <- rows) {
      val (i, j) = (r.getString(0), r.getString(1))
      val common = dailyGrid(i).map(_._1).toSet intersect dailyGrid(j).map(_._1).toSet
      val xs = dailyGrid(i).filter(d => common(d._1)).map(_._2).toArray
      val ys = dailyGrid(j).filter(d => common(d._1)).map(_._2).toArray
      val n = xs.length
      def centered(v: Array[Double]): Array[Array[Double]] = {
        val a = Array.tabulate(n, n)((k, l) => math.abs(v(k) - v(l)))
        val rm = a.map(_.sum / n)
        val gm = a.map(_.sum).sum / (n.toDouble * n)
        Array.tabulate(n, n)((k, l) => a(k)(l) - rm(k) - rm(l) + gm)
      }
      val ac = centered(xs); val bc = centered(ys)
      def mean2(f: (Int, Int) => Double) =
        (0 until n).flatMap(k => (0 until n).map(l => f(k, l))).sum / (n.toDouble * n)
      val vxy = mean2((k, l) => ac(k)(l) * bc(k)(l))
      val vxx = mean2((k, l) => ac(k)(l) * ac(k)(l))
      val vyy = mean2((k, l) => bc(k)(l) * bc(k)(l))
      val want = math.sqrt(math.max(vxy, 0.0) / math.sqrt(vxx * vyy))
      val got = r.getDouble(2)
      assert(math.abs(got - want) < 1e-5, s"($i,$j): got $got want $want")
      assert(got >= 0.0 && got <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(3) - math.sqrt(math.max(vxy, 0.0))) < 1e-5)
    }
  }

  test("q429 Ljung-Box equals the scalar recomputation with the pinned critical value") {
    val rows = byName("q429_ljung_box")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val vs = dailyGrid(el).map(_._2)
      val n = vs.length
      val mu = vs.sum / n
      val x = vs.map(_ - mu)
      val ss = x.map(v => v * v).sum
      val byDi = dailyGrid(el).map { case (di, v) => (di, v - mu) }.toMap
      val q = (1 to 7).map { k =>
        val num = dailyGrid(el).flatMap { case (di, _) =>
          for (a <- byDi.get(di); b <- byDi.get(di - k)) yield a * b
        }.sum
        (num / ss) * (num / ss) / (n - k)
      }.sum * n * (n + 2.0)
      assert(r.getLong(1) === n.toLong)
      assert(math.abs(r.getDouble(2) - q) < 1e-4, s"$el: got ${r.getDouble(2)} want $q")
      assert(r.getInt(3) === 7)
      assert(r.getInt(4) === (if (q > 14.067140449340169) 1 else 0))
    }
  }

  test("q430 binseg equals the brute-force best split / second split") {
    val rows = byName("q430_binseg_changepoints")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val vs = dailyGrid(el)
      val n = vs.length
      def sse(a: Int, b: Int): Double = { // positions (a, b] 1-based
        val seg = vs.slice(a, b).map(_._2)
        val s = seg.sum; val q = seg.map(v => v * v).sum
        q - s * s / seg.length
      }
      val cand1 = (1 until n).map(t => (sse(0, t) + sse(t, n), t))
      val best1 = cand1.minBy(c => (c._1, c._2))
      val cand2 = (1 until n).filter(_ != best1._2).map { u =>
        val t1 = best1._2
        val c = if (u < t1) sse(0, u) + sse(u, t1) + sse(t1, n)
        else sse(0, t1) + sse(t1, u) + sse(u, n)
        (c, u)
      }
      val best2 = cand2.minBy(c => (c._1, c._2))
      assert(r.getLong(1) === n.toLong)
      assert(math.abs(r.getDouble(2) - sse(0, n)) < 1e-4)
      assert(r.getInt(3) === vs(best1._2 - 1)._1,
        s"$el cp1: got ${r.getInt(3)} want day ${vs(best1._2 - 1)._1}")
      assert(math.abs(r.getDouble(4) - best1._1) < 1e-4, s"$el sse1")
      assert(r.getInt(5) === vs(best2._2 - 1)._1, s"$el cp2")
      assert(math.abs(r.getDouble(6) - best2._1) < 1e-4, s"$el sse2")
      // each refinement can only reduce cost
      assert(r.getDouble(4) <= r.getDouble(2) + 1e-9)
      assert(r.getDouble(6) <= r.getDouble(4) + 1e-9)
    }
  }

  test("q431 GMM equals the scalar 3-step EM chain; separation is positive") {
    val rows = byName("q431_gmm_em")(spark, sf).collect()
    assert(rows.nonEmpty)
    val vals = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("value").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for (r <- rows) {
      val el = r.getString(0)
      val vs = vals(el)
      val n = vs.length.toDouble
      val sx = vs.sum; val sxx = vs.map(v => v * v).sum
      val m = sx / n; val va = sxx / n - m * m
      var (pi, mu1, mu2, s1, s2) = (0.5, m - math.sqrt(va), m + math.sqrt(va), va, va)
      for (_ <- 1 to 3) {
        def phi(v: Double, mu: Double, s: Double) =
          math.exp(-(v - mu) * (v - mu) / (2.0 * s)) / math.sqrt(s)
        val gam = vs.map(v =>
          pi * phi(v, mu2, s2) / ((1 - pi) * phi(v, mu1, s1) + pi * phi(v, mu2, s2)))
        val sg = gam.sum
        val sgx = vs.zip(gam).map { case (v, g) => g * v }.sum
        val sgxx = vs.zip(gam).map { case (v, g) => g * v * v }.sum
        val nmu1 = (sx - sgx) / (n - sg)
        val nmu2 = sgx / sg
        val ns1 = math.max((sxx - sgxx) / (n - sg) - nmu1 * nmu1, 1e-6)
        val ns2 = math.max(sgxx / sg - nmu2 * nmu2, 1e-6)
        pi = sg / n; mu1 = nmu1; mu2 = nmu2; s1 = ns1; s2 = ns2
      }
      assert(math.abs(r.getDouble(1) - pi) < 1e-4, s"$el pi")
      assert(math.abs(r.getDouble(2) - mu1) < 1e-3, s"$el mu1")
      assert(math.abs(r.getDouble(3) - mu2) < 1e-3, s"$el mu2")
      assert(math.abs(r.getDouble(4) - math.sqrt(s1)) < 1e-3, s"$el sd1")
      assert(math.abs(r.getDouble(5) - math.sqrt(s2)) < 1e-3, s"$el sd2")
      assert(r.getDouble(6) > 0.0, "moment init keeps mu2 > mu1")
      assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0)
    }
  }

  test("q432 tail dependence equals the scalar ECDF recomputation, bounded") {
    val rows = byName("q432_tail_dependence")(spark, sf).collect()
    assert(rows.length === 30)
    val ranks: Map[String, Map[Int, Double]] = dailyGrid.map { case (el, vs) =>
      val n = vs.length.toDouble
      el -> vs.map { case (di, v) =>
        di -> vs.count(_._2 <= v) / n
      }.toMap
    }
    for (r <- rows) {
      val (i, j, u0) = (r.getString(0), r.getString(1), r.getDouble(2))
      val common = dailyGrid(i).map(_._1).toSet intersect dailyGrid(j).map(_._1).toSet
      val nJoint = common.count(d => ranks(i)(d) > u0 && ranks(j)(d) > u0)
      val lam = (nJoint.toDouble / common.size) / (1.0 - u0)
      assert(r.getLong(3) === nJoint.toLong, s"($i,$j,$u0) joint count")
      assert(r.getLong(4) === common.size.toLong)
      assert(math.abs(r.getDouble(5) - lam) < 1e-5)
      assert(r.getDouble(5) >= 0.0)
    }
  }

  test("q433 streaming coherence final refresh equals the batch q427 result") {
    val batch = byName("q427_coherence")(spark, sf).collect().map(_.toString).toSeq
    val stream = byName("q433_stream_coherence")(spark, sf).collect().map(_.toString).toSeq
    assert(stream === batch)
  }
}
