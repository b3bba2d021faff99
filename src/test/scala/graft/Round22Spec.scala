package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-22 operators (q420–q425) beyond their
  * oracle hash checks: scalar reimplementations of the E-value, the
  * Lomb–Scargle quadrature powers, Page–Hinkley, and the full NB-GLM
  * chain; the integer-boundary margin audit for the Bloom planner; and
  * the streaming==batch identity for q425.
  */
class Round22Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round22-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  test("q420 E-values equal the scalar VanderWeele-Ding closed forms") {
    val r = byName("q420_evalue_sensitivity")(spark, sf).head()
    val (a, b, c, d) = (r.getLong(0).toDouble, r.getLong(1).toDouble,
      r.getLong(2).toDouble, r.getLong(3).toDouble)
    val (rr, lcl, ucl, evP, evC) = (r.getDouble(4), r.getDouble(5), r.getDouble(6),
      r.getDouble(7), r.getDouble(8))
    val rrWant = (a / (a + b)) / (c / (c + d))
    val se = math.sqrt(1 / a - 1 / (a + b) + 1 / c - 1 / (c + d))
    assert(math.abs(rr - rrWant) < 1e-6)
    assert(math.abs(lcl - math.exp(math.log(rrWant) - 1.96 * se)) < 1e-5)
    assert(math.abs(ucl - math.exp(math.log(rrWant) + 1.96 * se)) < 1e-5)
    val rs = if (rrWant >= 1) rrWant else 1 / rrWant
    assert(math.abs(evP - (rs + math.sqrt(rs * (rs - 1)))) < 1e-5)
    // E-value of the point is at least the E-value of the CI bound
    assert(evP >= evC - 1e-9)
    assert(evC >= 1.0 - 1e-9, "CI E-value bottoms out at 1 (no confounding needed)")
    // this fixture's CI crosses 1, so the CI E-value must be exactly 1
    if (lcl <= 1 && ucl >= 1) assert(evC === 1.0)
  }

  test("q421 Lomb-Scargle equals a direct scalar evaluation per (element, period)") {
    val rows = byName("q421_lomb_scargle")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    assert(rows.size === 15)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        (datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("double") +
          (hour(col("ts")) * 3600.0 + minute(col("ts")) * 60.0 +
            second(col("ts"))) / 86400.0).as("t"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    for (el <- ev.map(_._1).distinct; period <- Seq(3.5, 7.0, 14.0)) {
      val es = ev.filter(_._1 == el)
      val n = es.length
      val ybar = es.map(_._3).sum / n
      val yvar = es.map(e => (e._3 - ybar) * (e._3 - ybar)).sum / (n - 1)
      val om = 2.0 * math.Pi / period
      val yc = es.map(e => (e._3 - ybar) * math.cos(om * e._2)).sum
      val ys = es.map(e => (e._3 - ybar) * math.sin(om * e._2)).sum
      val c2 = es.map(e => math.cos(2 * om * e._2)).sum
      val s2 = es.map(e => math.sin(2 * om * e._2)).sum
      val wt = math.atan2(s2, c2) / 2.0
      val (ct, st) = (math.cos(wt), math.sin(wt))
      val (c2t, s2t) = (math.cos(2 * wt), math.sin(2 * wt))
      val even = ct * yc + st * ys
      val odd = ct * ys - st * yc
      val dEven = n / 2.0 + (c2t * c2 + s2t * s2) / 2.0
      val dOdd = n / 2.0 - (c2t * c2 + s2t * s2) / 2.0
      val want = 0.5 * (even * even / dEven + odd * odd / dOdd) / yvar
      val got = rows((el, period))
      assert(math.abs(got - want) < 1e-4, s"($el, $period): got $got want $want")
      assert(got >= 0.0)
    }
  }

  test("q422 Bloom planner formulas are exact and integer-boundary-safe") {
    val rows = byName("q422_bloom_planner")(spark, sf).collect()
    assert(rows.length === 9)
    for (r <- rows) {
      val (n, p, m, k, fpp, bpk) = (r.getLong(1).toDouble, r.getDouble(2),
        r.getLong(3).toDouble, r.getInt(4), r.getDouble(5), r.getDouble(6))
      val mReal = -n * math.log(p) / (math.log(2) * math.log(2))
      assert(m === math.ceil(mReal))
      // boundary margin: the ceil argument is nowhere near an integer
      assert(math.abs(mReal - math.rint(mReal)) > 1e-6,
        s"ceil argument $mReal sits on an integer boundary")
      val kReal = math.log(2) * m / n
      assert(k === math.max(1, math.rint(kReal)).toInt)
      assert(math.abs(kReal - math.floor(kReal) - 0.5) > 1e-6,
        s"round argument $kReal sits on a half-integer boundary")
      val want = math.pow(1 - math.exp(-k * n / m), k)
      assert(math.abs(fpp - want) < 1e-6)
      // the planner hits the target: actual fpp within 2x of requested
      assert(fpp <= p * 2.0, s"actual $fpp vs target $p")
      assert(math.abs(bpk - m / n) < 1e-5)
    }
  }

  private def scalarPh(vs: Seq[(Int, Double)]): (Int, Double, Long, Int) = {
    var cnt = 0; var tot = 0.0; var m = 0.0; var mn = 0.0
    var mx = 0.0; var alarms = 0L; var first = -1
    for ((di, v) <- vs.sortBy(_._1)) {
      cnt += 1; tot += v
      m += v - tot / cnt - graft.operators.Round22Ops.PhDelta
      mn = math.min(mn, m)
      val exc = m - mn
      mx = math.max(mx, exc)
      if (exc > graft.operators.Round22Ops.PhLambda) {
        alarms += 1; if (first < 0) first = di
      }
    }
    (cnt, mx, alarms, first)
  }

  private lazy val dailyGrid: Map[String, Seq[(Int, Double)]] =
    spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
      .agg((sum(col("value").cast("decimal(18,3)")).cast("double") /
        count(lit(1))).as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap

  test("q423 Page-Hinkley equals the scalar sequential recomputation") {
    val rows = byName("q423_page_hinkley")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val (nd, mx, al, fst) = (r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4))
      val (wNd, wMx, wAl, wFst) = scalarPh(dailyGrid(el))
      assert(nd === wNd.toLong)
      assert(math.abs(mx - wMx) < 1e-5, s"$el excursion")
      assert(al === wAl, s"$el alarms")
      assert(fst === wFst, s"$el first alarm")
      assert(mx >= 0.0)
    }
  }

  test("q424 NB-GLM equals the scalar Poisson->alpha->NB2 chain") {
    val rows = byName("q424_negbin_glm")(spark, sf).collect()
    assert(rows.nonEmpty)
    // scalar daily count grid
    val cd = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        (datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("double") / lit(29.0)).as("u"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    def wls(pts: Seq[(Double, Double)], a0: Double, b0: Double,
        w: Double => Double): (Double, Double) = {
      var sw = 0.0; var swu = 0.0; var swuu = 0.0; var swz = 0.0; var swuz = 0.0
      for ((u, y) <- pts) {
        val eta = a0 + b0 * u; val mu = math.exp(eta); val ww = w(mu)
        val vz = ww * eta + (y - mu) * (ww / mu)
        sw += ww; swu += ww * u; swuu += ww * u * u; swz += vz; swuz += vz * u
      }
      val b = (sw * swuz - swu * swz) / (sw * swuu - swu * swu)
      (((swz - b * swu) / sw), b)
    }
    for (r <- rows) {
      val el = r.getString(0)
      val (alpha, aNb, bNb, tr, od) = (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))
      val pts = cd(el)
      val a0 = math.log(pts.map(_._2).sum / pts.length)
      val (a1, b1) = wls(pts, a0, 0.0, mu => mu)
      val (a2, b2) = wls(pts, a1, b1, mu => mu)
      val alWant = math.max(0.0, pts.map { case (u, y) =>
        val mu = math.exp(a2 + b2 * u); (y - mu) * (y - mu) - y
      }.sum / pts.map { case (u, _) =>
        val mu = math.exp(a2 + b2 * u); mu * mu
      }.sum)
      assert(math.abs(alpha - alWant) < 1e-4, s"$el alpha: got $alpha want $alWant")
      val (a3, b3) = wls(pts, a2, b2, mu => mu / (1.0 + alWant * mu))
      assert(math.abs(aNb - a3) < 1e-4, s"$el a")
      assert(math.abs(bNb - b3) < 1e-4, s"$el b")
      assert(math.abs(tr - math.exp(b3)) < 1e-3)
      assert(od === (if (alWant > 0) 1 else 0))
    }
  }

  test("q425 streaming Page-Hinkley final refresh equals the batch q423 result") {
    val batch = byName("q423_page_hinkley")(spark, sf).collect().map(_.toString).toSeq
    val stream = byName("q425_stream_page_hinkley")(spark, sf).collect().map(_.toString).toSeq
    assert(stream === batch)
  }
}
