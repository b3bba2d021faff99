package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-17 operators (q390–q395) beyond their oracle
  * hash checks — each against an independent scalar reimplementation:
  * the mediation paths satisfy the exact OLS identity c = c′ + a·b and
  * equal scalar regressions; the stratified CATEs equal per-stratum
  * scalar OLS evaluated at stratum means; κ equals a brute 2×2 recount;
  * the Theil decomposition reproduces the DIRECTLY-computed total index;
  * the Bradley–Terry strengths equal a scalar MM iteration and sum to
  * 1; and the subclassification ATE equals a scalar propensity-decile
  * pipeline.
  */
class Round17Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round17-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  private lazy val li: Array[(Double, Double, Double, Double, String, Long, Int)] =
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_discount"), col("l_extendedprice"), col("l_quantity"),
        col("l_tax"), col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getString(4), r.getLong(5), r.getInt(6)))

  private def solve3(aM: Array[Array[Double]], bV: Array[Double]): Array[Double] = {
    val m = aM.map(_.clone); val b2 = bV.clone
    for (i <- 0 until 3) {
      val piv = (i until 3).maxBy(j => math.abs(m(j)(i)))
      val (mi, bi) = (m(i), b2(i)); m(i) = m(piv); b2(i) = b2(piv)
      if (piv != i) { m(piv) = mi; b2(piv) = bi }
      for (j <- i + 1 until 3) {
        val f = m(j)(i) / m(i)(i)
        for (k <- i until 3) m(j)(k) -= f * m(i)(k)
        b2(j) -= f * b2(i)
      }
    }
    val w = Array.fill(3)(0.0)
    for (i <- 2 to 0 by -1)
      w(i) = (b2(i) - (i + 1 until 3).map(k => m(i)(k) * w(k)).sum) / m(i)(i)
    w
  }

  test("q390 mediation: OLS identity c = c' + a*b and scalar path recompute") {
    val r = byName("q390_mediation")(spark, sf).collect().head
    assert(math.abs(r.getAs[Double]("c_total") -
      (r.getAs[Double]("c_prime") + r.getAs[Double]("indirect"))) < 1e-2,
      "total effect must decompose exactly into direct + indirect")
    val xs = li.map(_._1); val ms = li.map(_._3)
    val ys = li.map(t => t._2 * (1.0 - t._1))
    val n = li.length.toDouble
    def c2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map(p => p._1 * p._2).sum - a.sum * b.sum / n
    val (cxx, cxm, cxy) = (c2(xs, xs), c2(xs, ms), c2(xs, ys))
    val (cmm, cmy, cyy) = (c2(ms, ms), c2(ms, ys), c2(ys, ys))
    val a = cxm / cxx
    val dd = cxx * cmm - cxm * cxm
    val b = (cxx * cmy - cxm * cxy) / dd
    val cp = (cmm * cxy - cxm * cmy) / dd
    val c = cxy / cxx
    val varA = ((cmm - cxm * cxm / cxx) / (n - 2)) / cxx
    val varB = ((cyy - cp * cxy - b * cmy) / (n - 3)) * cxx / dd
    assert(math.abs(r.getAs[Double]("a_path") - a) < 1e-4)
    assert(math.abs(r.getAs[Double]("b_path") - b) < 1e-4)
    assert(math.abs(r.getAs[Double]("c_total") - c) < 1e-3)
    assert(math.abs(r.getAs[Double]("sobel_z") -
      a * b / math.sqrt(b * b * varA + a * a * varB)) < 1e-3)
  }

  test("q391 stratified CATE equals per-stratum scalar OLS at the stratum means") {
    val rows = byName("q391_cate_strata")(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val g = r.getAs[String]("stratum")
      val sub = li.filter(_._5 == g).map(t =>
        (if (t._1 >= 0.05) 1.0 else 0.0, t._2 * (1.0 - t._1), t._3, t._4))
      def fit(arm: Double): Array[Double] = {
        val s2 = sub.filter(_._1 == arm)
        val aM = Array.fill(3, 3)(0.0); val bV = Array.fill(3)(0.0)
        s2.foreach { case (_, y, x1, x2) =>
          val xs = Array(1.0, x1, x2)
          for (i <- 0 until 3; j <- 0 until 3) aM(i)(j) += xs(i) * xs(j)
          for (i <- 0 until 3) bV(i) += y * xs(i)
        }
        solve3(aM, bV)
      }
      val (w1, w0) = (fit(1.0), fit(0.0))
      val mx1 = sub.map(_._3).sum / sub.length
      val mx2 = sub.map(_._4).sum / sub.length
      val cate = (w1(0) + w1(1) * mx1 + w1(2) * mx2) -
        (w0(0) + w0(1) * mx1 + w0(2) * mx2)
      assert(r.getAs[Long]("n") === sub.length.toLong)
      assert(math.abs(r.getAs[Double]("cate") - cate) < 1e-2, s"CATE mismatch in $g")
      val y1 = sub.filter(_._1 == 1.0).map(_._2); val y0 = sub.filter(_._1 == 0.0).map(_._2)
      assert(math.abs(r.getAs[Double]("naive_diff") -
        (y1.sum / y1.length - y0.sum / y0.length)) < 1e-2)
    }
  }

  test("q392 kappa equals a brute 2x2 recount") {
    val r = byName("q392_cohens_kappa")(spark, sf).collect().head
    val tab = li.map { t =>
      val ra = if (t._3 / 10.0 - t._1 * 20.0 + t._4 * 5.0 - 1.5 > 0) 1 else 0
      val rb = if (t._3 >= 25) 1 else 0
      (ra, rb)
    }
    val n = tab.length.toDouble
    val n11 = tab.count(_ == ((1, 1))); val n10 = tab.count(_ == ((1, 0)))
    val n01 = tab.count(_ == ((0, 1))); val n00 = tab.count(_ == ((0, 0)))
    assert(r.getAs[Long]("n11") === n11.toLong && r.getAs[Long]("n00") === n00.toLong)
    assert(r.getAs[Long]("n10") === n10.toLong && r.getAs[Long]("n01") === n01.toLong)
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-5)
    assert(math.abs(r.getAs[Double]("pabak") - (2 * po - 1)) < 1e-5)
    assert(math.abs(r.getAs[Double]("p_observed") - po) < 1e-6)
  }

  test("q393 Theil decomposition reproduces the directly-computed total index") {
    val r = byName("q393_theil_index")(spark, sf).collect().head
    val cu = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_nationkey", "o_custkey").agg(sum(col("o_totalprice")).as("y"))
      .collect().map(x => (x.getInt(0), x.getAs[Double]("y")))
    val yt = cu.map(_._2).sum; val n = cu.length.toDouble
    val mu = yt / n
    val tDirect = cu.map { case (_, y) => (y / yt) * math.log(y / mu) }.sum
    assert(r.getAs[Long]("n_customers") === cu.length.toLong)
    assert(math.abs(r.getAs[Double]("theil_total") - tDirect) < 1e-4,
      s"between+within must equal the direct Theil total: $tDirect")
    val byNat = cu.groupBy(_._1)
    val tB = byNat.values.map { g =>
      val yg = g.map(_._2).sum
      (yg / yt) * math.log((yg / yt) / (g.length / n))
    }.sum
    assert(math.abs(r.getAs[Double]("theil_between") - tB) < 1e-5)
    assert(r.getAs[Double]("theil_total") >= 0)
  }

  test("q394 Bradley-Terry equals a scalar MM iteration and sums to 1") {
    val rows = byName("q394_bradley_terry")(spark, sf).collect()
    assert(rows.length === 5)
    assert(math.abs(rows.map(_.getAs[Double]("bt_strength")).sum - 1.0) < 1e-4)
    // rebuild the daily grid and pair wins
    import java.time.LocalDate
    val grid = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("ts").cast("date").cast("string"), col("value"))
      .collect()
      .groupBy(r => (r.getString(0),
        java.time.temporal.ChronoUnit.DAYS.between(
          LocalDate.parse("2024-01-01"), LocalDate.parse(r.getString(1))).toInt))
      .map { case (k, rs) =>
        val s2 = rs.map(r => BigDecimal(r.getDouble(2))
          .setScale(3, BigDecimal.RoundingMode.HALF_UP)).sum
        k -> (s2.toDouble / rs.length)
      }
    val els = grid.keys.map(_._1).toSeq.distinct.sorted
    val days = grid.keys.map(_._2).toSeq.distinct
    val pairs = scala.collection.mutable.Map[(String, String), (Double, Double)]()
    for (a <- els; b <- els if a != b; di <- days) {
      (grid.get((a, di)), grid.get((b, di))) match {
        case (Some(va), Some(vb)) if va != vb =>
          val (nn, ww) = pairs.getOrElse((a, b), (0.0, 0.0))
          pairs((a, b)) = (nn + 1, ww + (if (va > vb) 1 else 0))
        case _ => ()
      }
    }
    val wins = els.map(e => e -> pairs.filter(_._1._1 == e).values.map(_._2).sum).toMap
    var pi = els.map(e => e -> 1.0 / els.length).toMap
    for (_ <- 1 to 3) {
      val raw = els.map { e =>
        val dn = els.filter(_ != e).map { o =>
          pairs.get((e, o)).map(_._1 / (pi(e) + pi(o))).getOrElse(0.0) }.sum
        e -> wins(e) / dn
      }.toMap
      val z = raw.values.sum
      pi = raw.map { case (k, v) => k -> v / z }
    }
    rows.foreach { r =>
      val e = r.getAs[String]("el")
      assert(math.abs(r.getAs[Double]("bt_strength") - pi(e)) < 1e-4,
        s"BT strength mismatch for $e")
      assert(r.getAs[Long]("wins") === wins(e).toLong)
    }
  }

  test("q395 subclassification equals a scalar propensity-decile pipeline") {
    val rows = byName("q395_propensity_strata")(spark, sf).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.length === 10)
    val fx = li.map(t => (if (t._1 >= 0.05) 1.0 else 0.0,
      t._2 * (1.0 - t._1), t._3, t._4, t._6, t._7))
    val n = fx.length.toDouble
    val pbar = fx.map(_._1).sum / n
    var wts = Array(math.log(pbar / (1 - pbar)), 0.0, 0.0)
    for (_ <- 1 to 2) {
      val aM = Array.fill(3, 3)(0.0); val bV = Array.fill(3)(0.0)
      fx.foreach { case (t, _, x1, x2, _, _) =>
        val xs = Array(1.0, x1, x2)
        val eta = wts.zip(xs).map(p => p._1 * p._2).sum
        val p = 1.0 / (1.0 + math.exp(-eta))
        val v = p * (1 - p); val vz = v * eta + (t - p)
        for (i <- 0 until 3; j <- 0 until 3) aM(i)(j) += v * xs(i) * xs(j)
        for (i <- 0 until 3) bV(i) += vz * xs(i)
      }
      wts = solve3(aM, bV)
    }
    val scored = fx.map { case (t, y, x1, x2, k1, k2) =>
      val e = 1.0 / (1.0 + math.exp(-(wts(0) + wts(1) * x1 + wts(2) * x2)))
      (t, y, BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, k1, k2)
    }.sortBy(s2 => (s2._3, s2._4, s2._5))
    val nt = scored.length; val q = nt / 10; val rem = nt % 10
    val diffs = (1 to 10).map { dec =>
      val lo = (dec - 1) * q + math.min(dec - 1, rem)
      val hi = dec * q + math.min(dec, rem)
      val sub = scored.slice(lo, hi)
      val y1 = sub.filter(_._1 == 1.0).map(_._2)
      val y0 = sub.filter(_._1 == 0.0).map(_._2)
      (sub.length, y1.length, y0.length, y1.sum / y1.length - y0.sum / y0.length)
    }
    rows.zip(diffs).foreach { case (r, (nn, n1, n0, diff)) =>
      assert(r.getAs[Long]("n") === nn.toLong)
      assert(r.getAs[Long]("n_treated") === n1.toLong)
      assert(r.getAs[Long]("n_control") === n0.toLong)
      assert(math.abs(r.getAs[Double]("decile_diff") - diff) < 1e-2,
        s"decile ${r.getAs[Int]("decile")} diff mismatch")
    }
    val ate = diffs.map { case (nn, _, _, diff) => nn * diff }.sum / nt
    assert(math.abs(rows.head.getAs[Double]("ate_stratified") - ate) < 1e-2)
  }
}
