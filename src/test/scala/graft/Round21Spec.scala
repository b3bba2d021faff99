package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-21 inference operators (q414–q419) beyond
  * their oracle hash checks — each statistic against an independent
  * scalar reimplementation (sort-based ranks for KW/Friedman, direct
  * 2×2 folds for MH, lgamma-free ln-factorial recomputation for the
  * exact Fisher/Bayesian paths), plus the tolerance-margin audit that
  * pins q417's two-sided membership rule away from its 1e-7 boundary.
  */
class Round21Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round21-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  private lazy val events: Array[(String, Double, Int)] =
    spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("value"),
        (datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")) % 7)
          .as("dow"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))

  test("q414 Kruskal-Wallis equals a sort-based midrank recomputation") {
    val r = byName("q414_kruskal_wallis")(spark, sf).head()
    val (nObs, k, h, dof, eps2) =
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3), r.getDouble(4))
    val groups = events.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val all = events.map(v => (v._1, v._2))
    assert(nObs === all.length.toLong && k === groups.size)
    // pooled midranks by sorting
    val sorted = all.sortBy(_._2)
    val rank = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1)._2 == sorted(i)._2) j += 1
      val mid = (i + j + 2) / 2.0 // average of 1-based ranks i+1..j+1
      for (t <- i to j) rank(t) = mid
      i = j + 1
    }
    val rj = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    for (t <- sorted.indices) rj(sorted(t)._1) += rank(t)
    val n = all.length.toDouble
    val s = groups.keys.map(g => rj(g) * rj(g) / groups(g).length).sum
    val hRaw = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    val ties = all.map(_._2).groupBy(identity).values.map(_.length.toLong)
      .map(t => t * t * t - t).sum
    val hWant = hRaw / (1.0 - ties.toDouble / (n * n * n - n))
    assert(math.abs(h - hWant) < 1e-5, s"got $h want $hWant")
    assert(dof === k - 1)
    assert(math.abs(eps2 - (hWant - k + 1) / (n - k)) < 1e-5)
    assert(h >= 0.0)
  }

  test("q415 Friedman + Kendall's W equal the scalar block-rank recomputation") {
    val r = byName("q415_friedman")(spark, sf).head()
    val (b, k, chi2, dof, w) =
      (r.getInt(0), r.getInt(1), r.getDouble(2), r.getInt(3), r.getDouble(4))
    // cell means rounded to 6 like the query
    val cells = events.groupBy(e => (e._3, e._1)).map { case ((blk, trt), es) =>
      val m = BigDecimal(es.map(e => BigDecimal(e._2)).sum.toDouble / es.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (blk, trt, m)
    }.toSeq
    val byBlk = cells.groupBy(_._1)
    assert(b === byBlk.size)
    val trts = cells.map(_._2).distinct
    assert(k === trts.length)
    val rj = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    for ((_, cs) <- byBlk; (_, trt, mv) <- cs) {
      val smaller = cs.count(_._3 < mv)
      val equal = cs.count(_._3 == mv)
      rj(trt) += smaller + (equal + 1) / 2.0
    }
    val s = rj.values.map(x => x * x).sum
    val chiWant = 12.0 / (b * k * (k + 1.0)) * s - 3.0 * b * (k + 1.0)
    assert(math.abs(chi2 - chiWant) < 1e-5)
    assert(dof === k - 1)
    assert(math.abs(w - chiWant / (b * (k - 1.0))) < 1e-5)
    assert(w >= -1e-9 && w <= 1.0 + 1e-9)
  }

  test("q416 MH pooled OR / CMH chi2 / Cochran Q equal the direct 2x2 folds") {
    val r = byName("q416_mantel_haenszel")(spark, sf).head()
    val (nStrata, mhOr, cmh, q, qDof) =
      (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4))
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(x => (x.getInt(0), x.getString(1) == "BUILDING", x.getDouble(2) > 0))
    val tables = cust.groupBy(_._1).map { case (_, rs) =>
      val a = rs.count(x => x._2 && x._3).toDouble
      val b = rs.count(x => x._2 && !x._3).toDouble
      val c = rs.count(x => !x._2 && x._3).toDouble
      val d = rs.count(x => !x._2 && !x._3).toDouble
      (a, b, c, d)
    }.toSeq.filter { case (a, b, c, d) => a + b + c + d > 1 }
    assert(nStrata === tables.length)
    val num = tables.map { case (a, _, _, d) => a * d / tables.map(t => t._1 + t._2 + t._3 + t._4).sum }
    // recompute per-stratum (not the aggregate shortcut above)
    def n(t: (Double, Double, Double, Double)) = t._1 + t._2 + t._3 + t._4
    val orWant = tables.map(t => t._1 * t._4 / n(t)).sum /
      tables.map(t => t._2 * t._3 / n(t)).sum
    assert(math.abs(mhOr - orWant) < 1e-5)
    val sa = tables.map(_._1).sum
    val se = tables.map(t => (t._1 + t._2) * (t._1 + t._3) / n(t)).sum
    val sv = tables.map { t =>
      val nn = n(t)
      (t._1 + t._2) * (t._3 + t._4) * (t._1 + t._3) * (t._2 + t._4) / (nn * nn * (nn - 1))
    }.sum
    val cmhWant = math.pow(math.abs(sa - se) - 0.5, 2) / sv
    assert(math.abs(cmh - cmhWant) < 1e-5)
    val lors = tables.map(t => (math.log((t._1 + 0.5) * (t._4 + 0.5) /
      ((t._2 + 0.5) * (t._3 + 0.5))),
      1.0 / (1 / (t._1 + 0.5) + 1 / (t._2 + 0.5) + 1 / (t._3 + 0.5) + 1 / (t._4 + 0.5))))
    val sw = lors.map(_._2).sum
    val qWant = lors.map { case (l, w2) => w2 * l * l }.sum -
      math.pow(lors.map { case (l, w2) => w2 * l }.sum, 2) / sw
    assert(math.abs(q - qWant) < 1e-4)
    assert(qDof === tables.length - 1)
    assert(cmh >= 0 && q >= -1e-9)
  }

  private def lnFactTable(n: Int): Array[Double] = {
    val a = new Array[Double](n + 1)
    for (i <- 2 to n) a(i) = a(i - 1) + math.log(i.toDouble)
    a
  }

  test("q417 Fisher exact equals the scalar hypergeometric enumeration, margin-safe") {
    val r = byName("q417_fisher_exact")(spark, sf).head()
    val (a, b, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (orr, pObs, p2) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    val (r1, r2, c1, n) = (a + b, c + d, a + c, a + b + c + d)
    val lf = lnFactTable(n.toInt)
    def lnC(nn: Long, kk: Long) = lf(nn.toInt) - lf(kk.toInt) - lf((nn - kk).toInt)
    val support = (math.max(0L, c1 - r2) to math.min(r1, c1))
      .map(av => av -> math.exp(lnC(r1, av) + lnC(r2, c1 - av) - lnC(n, c1)))
    val pObsWant = support.toMap.apply(a)
    assert(math.abs(pObs - pObsWant) < 1e-6)
    val p2Want = support.collect { case (_, p) if p <= pObsWant * (1 + 1e-7) => p }.sum
    assert(math.abs(p2 - p2Want) < 1e-5)
    assert(math.abs(orr - a.toDouble * d / (b.toDouble * c)) < 1e-5)
    assert(p2 >= pObs - 1e-9 && p2 <= 1.0 + 1e-9)
    // margin audit: no candidate probability sits within 1e-4 RELATIVE of
    // the membership boundary, so the 1e-7 tolerance cannot flip a term
    val boundary = pObsWant
    for ((av, p) <- support if av != a && p > 0) {
      val rel = math.abs(p - boundary) / boundary
      assert(rel > 1e-4, s"candidate a=$av probability $p sits on the boundary")
    }
  }

  test("q418 P(B>A) equals the scalar Cook-identity sum and brackets the rate gap") {
    val r = byName("q418_bayes_ab")(spark, sf).head()
    val (sa, fa, sb, fb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (pma, pmb, p) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    val (aa, ba, ab, bb) = (sa + 1, fa + 1, sb + 1, fb + 1)
    val lf = lnFactTable((aa + ba + ab + bb + 4).toInt)
    def lnBeta(x: Long, y: Long) = lf((x - 1).toInt) + lf((y - 1).toInt) - lf((x + y - 1).toInt)
    val want = (0L until ab).map { i =>
      math.exp(lnBeta(aa + i, ba + bb) - math.log((bb + i).toDouble) -
        lnBeta(1 + i, bb) - lnBeta(aa, ba))
    }.sum
    assert(math.abs(p - want) < 1e-5, s"got $p want $want")
    assert(p > 0.0 && p < 1.0)
    assert(math.abs(pma - aa.toDouble / (aa + ba)) < 1e-6)
    assert(math.abs(pmb - ab.toDouble / (ab + bb)) < 1e-6)
    // direction: the higher posterior mean wins more than half the mass
    if (pmb > pma) assert(p > 0.5) else if (pmb < pma) assert(p < 0.5)
  }

  test("q419 shrinkage pulls every rate toward the prior mean, never past it") {
    val rows = byName("q419_eb_shrinkage")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length === 20)
    val (alpha, beta) = (rows.head._6, rows.head._7)
    assert(alpha > 0 && beta > 0)
    val m = alpha / (alpha + beta)
    for ((uid, n, x, pRaw, pShr, _, _) <- rows) {
      // posterior mean = convex combination of raw rate and prior mean
      val wN = n / (n + alpha + beta)
      val want = wN * (x.toDouble / n) + (1 - wN) * m
      assert(math.abs(pShr - want) < 1e-5, s"user $uid")
      // shrunk lands between the raw rate and the prior mean
      assert(pShr >= math.min(pRaw, m) - 1e-6 && pShr <= math.max(pRaw, m) + 1e-6)
    }
    // leaderboard is sorted by shrunk rate
    val s = rows.map(_._5).toSeq
    assert(s === s.sorted.reverse)
  }
}
