package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-25 operators (q440–q445) beyond their
  * oracle hash checks: the quantile trend against brute-force pinball
  * minimization AND the defining quantile-coverage property; Bartlett
  * SEs against the scalar ACF recomputation; SampEn / cross-SampEn /
  * HSIC-CKA against direct scalar evaluation; rank-Granger against
  * grangerFromGrid applied to scalar ranks.
  */
class Round25Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round25-spec").getOrCreate())
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

  test("q440 quantile trend equals brute-force pinball minimization and covers tau") {
    val rows = byName("q440_quantile_trend")(spark, sf).collect()
    assert(rows.length === 10)
    for (r <- rows) {
      val el = r.getString(0); val tau = r.getDouble(1)
      val pts = dailyGrid(el).map { case (di, v) => (di.toDouble, v) }
      def loss(a: Double, b: Double): Double =
        pts.map { case (x, y) =>
          val u = y - (a + b * x); u * (tau - (if (u < 0) 1.0 else 0.0))
        }.sum
      val cands = for {
        (xi, yi) <- pts; (xj, yj) <- pts if xi < xj
        b = (yj - yi) / (xj - xi)
      } yield (b, yi - b * xi)
      val best = cands.map { case (b, a) => (loss(a, b), b, a) }
        .minBy(c => (c._1, c._2, c._3))
      assert(math.abs(r.getDouble(4) - best._1) < 1e-4, s"$el tau=$tau loss")
      assert(math.abs(r.getDouble(2) - best._2) < 1e-5, s"$el tau=$tau slope")
      assert(math.abs(r.getDouble(3) - best._3) < 1e-4, s"$el tau=$tau intercept")
      // defining property: ~tau of points lie at or below the fitted line
      val below = pts.count { case (x, y) => y <= best._3 + best._2 * x + 1e-9 }
      val frac = below.toDouble / pts.length
      assert(math.abs(frac - tau) <= 2.0 / pts.length + 1e-9,
        s"$el tau=$tau coverage $frac")
    }
  }

  test("q441 Bartlett-corrected lead-lag equals the scalar ACF recomputation") {
    val rows = byName("q441_bartlett_xcorr")(spark, sf).collect()
    assert(rows.length === 80) // 5*4 directed pairs x 4 lags
    def acf(el: String): Map[Int, Double] = {
      val vs = dailyGrid(el)
      val mu = vs.map(_._2).sum / vs.length
      val byDi = vs.map { case (di, v) => (di, v - mu) }.toMap
      val ss = byDi.values.map(x => x * x).sum
      (1 to 5).map { k =>
        k -> vs.flatMap { case (di, _) =>
          for (a <- byDi.get(di); b <- byDi.get(di - k)) yield a * b
        }.sum / ss
      }.toMap
    }
    val acfs = dailyGrid.keys.map(el => el -> acf(el)).toMap
    for (r <- rows) {
      val (src, dst, lag) = (r.getString(0), r.getString(1), r.getInt(2))
      val x = dailyGrid(src).toMap; val y = dailyGrid(dst).toMap
      val pairs = x.keys.toSeq.sorted.flatMap(di =>
        y.get(di + lag).map(yv => (x(di), yv)))
      val n = pairs.length
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val rr = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val bsum = 1.0 + 2.0 * (1 to 5).map(k => acfs(src)(k) * acfs(dst)(k)).sum
      val se = math.sqrt(bsum / n)
      assert(r.getLong(3) === n.toLong)
      assert(math.abs(r.getDouble(4) - rr) < 1e-5, s"$src->$dst lag$lag r")
      assert(math.abs(r.getDouble(5) - se) < 1e-5, s"$src->$dst lag$lag se")
      assert(math.abs(r.getDouble(6) - rr / se) < 1e-4)
      assert(r.getInt(7) === (if (math.abs(rr / se) > 1.959963984540054) 1 else 0))
      assert(se > 1.0 / math.sqrt(n) * 0.5, "Bartlett term stays positive-bounded")
    }
  }

  private def templates(vs: Seq[Double]): Seq[(Double, Double, Option[Double])] =
    vs.indices.dropRight(1).map(i =>
      (vs(i), vs(i + 1), if (i + 2 < vs.length) Some(vs(i + 2)) else None))

  test("q442 sample entropy equals the scalar template-match recomputation") {
    val rows = byName("q442_sample_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val vs = dailyGrid(el).map(_._2)
      val n = vs.length
      val mu = vs.sum / n
      val sig = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / (n - 1))
      val tol = 0.2 * sig
      val tp = templates(vs)
      var bb = 0L; var aa = 0L
      for (i <- tp.indices; j <- tp.indices if i < j) {
        val (p, q) = (tp(i), tp(j))
        if (math.max(math.abs(p._1 - q._1), math.abs(p._2 - q._2)) <= tol) bb += 1
        (p._3, q._3) match {
          case (Some(p2), Some(q2))
            if Seq(math.abs(p._1 - q._1), math.abs(p._2 - q._2),
              math.abs(p2 - q2)).max <= tol => aa += 1
          case _ =>
        }
      }
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === bb, s"$el B")
      assert(r.getLong(3) === aa, s"$el A")
      if (aa > 0 && bb > 0)
        assert(math.abs(r.getDouble(4) - (-math.log(aa.toDouble / bb))) < 1e-5)
      else assert(r.isNullAt(4))
    }
  }

  test("q443 cross-sample entropy equals the scalar z-scored recomputation") {
    val rows = byName("q443_cross_sample_entropy")(spark, sf).collect()
    assert(rows.length === 10)
    def zs(el: String): Seq[Double] = {
      val vs = dailyGrid(el).map(_._2)
      val n = vs.length
      val mu = vs.sum / n
      val sig = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / (n - 1))
      vs.map(v => (v - mu) / sig)
    }
    for (r <- rows) {
      val (i, j) = (r.getString(0), r.getString(1))
      val (tpi, tpj) = (templates(zs(i)), templates(zs(j)))
      var bb = 0L; var aa = 0L
      for (p <- tpi; q <- tpj) {
        if (math.max(math.abs(p._1 - q._1), math.abs(p._2 - q._2)) <= 0.2) bb += 1
        (p._3, q._3) match {
          case (Some(p2), Some(q2))
            if Seq(math.abs(p._1 - q._1), math.abs(p._2 - q._2),
              math.abs(p2 - q2)).max <= 0.2 => aa += 1
          case _ =>
        }
      }
      assert(r.getLong(2) === bb, s"($i,$j) B")
      assert(r.getLong(3) === aa, s"($i,$j) A")
      if (aa > 0 && bb > 0)
        assert(math.abs(r.getDouble(4) - (-math.log(aa.toDouble / bb))) < 1e-5)
      else assert(r.isNullAt(4))
    }
  }

  test("q444 HSIC/CKA equals the scalar double-centered kernel recomputation") {
    val rows = byName("q444_hsic_cka")(spark, sf).collect()
    assert(rows.length === 10)
    for (r <- rows) {
      val (i, j) = (r.getString(0), r.getString(1))
      val common = dailyGrid(i).map(_._1).toSet intersect dailyGrid(j).map(_._1).toSet
      val xs = dailyGrid(i).filter(d => common(d._1)).map(_._2).toArray
      val ys = dailyGrid(j).filter(d => common(d._1)).map(_._2).toArray
      val n = xs.length
      def std(v: Array[Double]): Double = {
        val m = v.sum / n
        math.sqrt(v.map(x => (x - m) * (x - m)).sum / (n - 1))
      }
      val (sx, sy) = (std(xs), std(ys))
      def gram(v: Array[Double], s: Double): Array[Array[Double]] =
        Array.tabulate(n, n)((k, l) =>
          math.exp(-(v(k) - v(l)) * (v(k) - v(l)) / (2.0 * s * s)))
      def center(a: Array[Array[Double]]): Array[Array[Double]] = {
        val rm = a.map(_.sum / n)
        val gm = a.map(_.sum).sum / (n.toDouble * n)
        Array.tabulate(n, n)((k, l) => a(k)(l) - rm(k) - rm(l) + gm)
      }
      val kc = center(gram(xs, sx)); val lc = center(gram(ys, sy))
      def mean2(f: (Int, Int) => Double) =
        (0 until n).flatMap(k => (0 until n).map(l => f(k, l))).sum / (n.toDouble * n)
      val vxy = mean2((k, l) => kc(k)(l) * lc(k)(l))
      val vxx = mean2((k, l) => kc(k)(l) * kc(k)(l))
      val vyy = mean2((k, l) => lc(k)(l) * lc(k)(l))
      assert(math.abs(r.getDouble(2) - vxy) < 1e-5, s"($i,$j) hsic")
      val cka = vxy / math.sqrt(vxx * vyy)
      assert(math.abs(r.getDouble(3) - cka) < 1e-5, s"($i,$j) cka")
      assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
    }
  }

  test("q445 rank-Granger is monotone-invariant: equals Granger on scalar ECDF ranks") {
    val rows = byName("q445_rank_granger")(spark, sf).collect()
    assert(rows.length === 20)
    // invariance pin: rank-Granger of the grid == rank-Granger of any
    // monotone transform; verify gain for one pair against a scalar
    // two-regressor regression on ECDF ranks
    val els = dailyGrid.keys.toSeq.sorted
    val rankOf: Map[String, Map[Int, Double]] = dailyGrid.map { case (el, vs) =>
      val n = vs.length.toDouble
      el -> vs.map { case (di, v) => di -> vs.count(_._2 <= v) / n }.toMap
    }
    for (r <- rows.take(4)) {
      val (src, dst) = (r.getString(0), r.getString(1))
      val ry = rankOf(dst); val rx = rankOf(src)
      val triples = ry.keys.toSeq.sorted.flatMap(di =>
        for (yl <- ry.get(di - 1); xl <- rx.get(di - 1)) yield (ry(di), yl, xl))
      val n = triples.length.toDouble
      val (sy, s1, s2) = (triples.map(_._1).sum, triples.map(_._2).sum,
        triples.map(_._3).sum)
      val syy = triples.map(t => t._1 * t._1).sum
      val s11 = triples.map(t => t._2 * t._2).sum
      val s22 = triples.map(t => t._3 * t._3).sum
      val s12 = triples.map(t => t._2 * t._3).sum
      val s1y = triples.map(t => t._2 * t._1).sum
      val s2y = triples.map(t => t._3 * t._1).sum
      val cyy = syy - sy * sy / n; val c11 = s11 - s1 * s1 / n
      val c22 = s22 - s2 * s2 / n; val c12 = s12 - s1 * s2 / n
      val c1y = s1y - s1 * sy / n; val c2y = s2y - s2 * sy / n
      val sseR = cyy - c1y * c1y / c11
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      val gain = (sseR - (cyy - b1 * c1y - b2 * c2y)) / sseR
      assert(math.abs(r.getDouble(4) - gain) < 1e-4, s"$src->$dst gain")
      assert(math.abs(r.getDouble(3) - (1.0 - sseR / cyy)) < 1e-4)
    }
    assert(rows.map(_.getString(0)).distinct.sorted === els)
  }
}
