package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-16 operators (q384–q389) beyond their oracle
  * hash checks — each checked against an independent scalar
  * reimplementation on the collected (bounded) inputs: the Cox Newton
  * steps equal a scalar partial-likelihood iteration; the Poisson IRLS
  * equals a scalar GLM fit step-for-step; ANOVA/Levene equal textbook
  * sums-of-squares; the effect sizes equal brute-force pair counting
  * (Cliff's δ) and moment formulas; Good–Turing equals exact integer
  * count-of-count ratios; and the AIPW pipeline equals a scalar
  * logistic-IRLS + OLS + augmentation recomputation.
  */
class Round16Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round16-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  /** (user, event_type, day-index) rows collected once. */
  private lazy val evRows: Array[(Long, String, Int)] = {
    import java.time.LocalDate
    spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_type"), col("ts").cast("date").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        java.time.temporal.ChronoUnit.DAYS.between(
          LocalDate.parse("2024-01-01"), LocalDate.parse(r.getString(2))).toInt))
  }

  test("q384 Cox equals a scalar partial-likelihood Newton iteration") {
    val r = byName("q384_cox_ph")(spark, sf).collect().head
    val horizon = evRows.map(_._3).max
    val signup = evRows.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).min }
    val firstPur = evRows.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3) }
    val clicks = evRows.filter(_._2 == "click").groupBy(_._1)
      .map { case (u, rs) => u -> rs.length }
    val subj = signup.toSeq.map { case (u, t0) =>
      val p = firstPur.get(u).flatMap(ds => ds.filter(_ >= t0).sorted.headOption)
      val (t, ev2) = p.map(t1 => (t1 - t0, 1)).getOrElse((horizon - t0, 0))
      (t, ev2, clicks.getOrElse(u, 0).toDouble)
    }
    def newton(b: Double): (Double, Double) = {
      val times = subj.map(_._1).distinct.sorted
      var u = 0.0; var inf = 0.0
      for (t <- times) {
        val deaths = subj.filter(s2 => s2._1 == t && s2._2 == 1)
        if (deaths.nonEmpty) {
          val risk = subj.filter(_._1 >= t)
          val s0 = risk.map(s2 => math.exp(b * s2._3)).sum
          val s1 = risk.map(s2 => s2._3 * math.exp(b * s2._3)).sum
          val s2s = risk.map(s2 => s2._3 * s2._3 * math.exp(b * s2._3)).sum
          u += deaths.map(_._3).sum - deaths.length * s1 / s0
          inf += deaths.length * (s2s / s0 - (s1 / s0) * (s1 / s0))
        }
      }
      (u, inf)
    }
    val (u0, i0) = newton(0.0); val b1 = u0 / i0
    val (u1, i1) = newton(b1); val b2 = b1 + u1 / i1
    val (u2, i2) = newton(b2)
    assert(r.getAs[Long]("n") === subj.length.toLong)
    assert(r.getAs[Long]("n_events") === subj.count(_._2 == 1).toLong)
    assert(math.abs(r.getAs[Double]("beta1") - b1) < 1e-5)
    assert(math.abs(r.getAs[Double]("beta") - b2) < 1e-5)
    assert(math.abs(r.getAs[Double]("se") - 1.0 / math.sqrt(i2)) < 1e-5)
    assert(math.abs(r.getAs[Double]("score_final") - u2) < 1e-3)
    assert(math.abs(r.getAs[Double]("hazard_ratio") - math.exp(b2)) < 1e-5)
  }

  test("q385 Poisson IRLS equals a scalar GLM fit step-for-step") {
    val rows = byName("q385_poisson_glm")(spark, sf).collect()
    assert(rows.length === 5)
    val byEl = evRows.groupBy(_._2)
    rows.foreach { r =>
      val el = r.getAs[String]("el")
      val cnts = byEl(el).groupBy(_._3).map { case (di, rs) =>
        (di / 29.0, rs.length.toDouble) }.toSeq
      var a = math.log(cnts.map(_._2).sum / cnts.length); var b = 0.0
      for (_ <- 1 to 2) {
        val terms = cnts.map { case (u, c) =>
          val eta = a + b * u; val mu = math.exp(eta)
          (mu, u, c, mu * eta + (c - mu))
        }
        val sw = terms.map(_._1).sum
        val swu = terms.map(t => t._1 * t._2).sum
        val swuu = terms.map(t => t._1 * t._2 * t._2).sum
        val swz = terms.map(_._4).sum
        val swuz = terms.map(t => t._4 * t._2).sum
        val b2 = (sw * swuz - swu * swz) / (sw * swuu - swu * swu)
        a = (swz - b2 * swu) / sw; b = b2
      }
      val dev = 2.0 * cnts.map { case (u, c) =>
        val mu = math.exp(a + b * u); c * math.log(c / mu) - (c - mu) }.sum
      assert(r.getAs[Long]("n_days") === cnts.length.toLong)
      assert(math.abs(r.getAs[Double]("a") - a) < 1e-5, s"a mismatch for $el")
      assert(math.abs(r.getAs[Double]("b") - b) < 1e-5, s"b mismatch for $el")
      assert(math.abs(r.getAs[Double]("deviance") - dev) < 1e-4)
    }
  }

  test("q386 ANOVA and Levene equal textbook sums of squares") {
    val r = byName("q386_anova_levene")(spark, sf).collect().head
    val od = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    def oneWayF(groups: Map[String, Array[Double]]): (Double, Double) = {
      val k = groups.size; val n = groups.values.map(_.length).sum
      val grand = groups.values.flatten.sum / n
      val ssb = groups.values.map(g => g.length * math.pow(g.map(identity).sum / g.length - grand, 2)).sum
      val ssw = groups.values.map(g => { val m = g.sum / g.length; g.map(y => (y - m) * (y - m)).sum }).sum
      val sst = groups.values.flatten.map(y => (y - grand) * (y - grand)).sum
      ((ssb / (k - 1)) / (ssw / (n - k)), ssb / sst)
    }
    val groups = od.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2) }
    val (f, eta2) = oneWayF(groups)
    val zGroups = groups.map { case (g, ys) =>
      val m = ys.sum / ys.length; g -> ys.map(y => math.abs(y - m)) }
    val (fl, _) = oneWayF(zGroups)
    assert(r.getAs[Int]("k") === 5)
    assert(r.getAs[Long]("n") === od.length.toLong)
    assert(math.abs(r.getAs[Double]("f_anova") - f) < 1e-4)
    assert(math.abs(r.getAs[Double]("eta_sq") - eta2) < 1e-6)
    assert(math.abs(r.getAs[Double]("f_levene") - fl) < 1e-4)
  }

  test("q387 effect sizes equal brute-force pair counting and moment formulas") {
    val r = byName("q387_effect_sizes")(spark, sf).collect().head
    val od = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(x => (x.getString(0) == "1-URGENT", x.getDouble(1)))
    val a = od.filter(_._1).map(_._2); val b = od.filterNot(_._1).map(_._2)
    val (na, nb) = (a.length.toDouble, b.length.toDouble)
    val (ma, mb) = (a.sum / na, b.sum / nb)
    val va = a.map(y => (y - ma) * (y - ma)).sum / (na - 1)
    val vb = b.map(y => (y - mb) * (y - mb)).sum / (nb - 1)
    val d = (ma - mb) / math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    // brute-force Cliff's delta (na*nb ≈ 9M comparisons — fine in memory)
    var gt = 0L; var lt = 0L
    for (x <- a; y <- b) { if (x > y) gt += 1 else if (x < y) lt += 1 }
    val cliff = (gt - lt).toDouble / (na * nb)
    assert(r.getAs[Long]("n_a") === a.length.toLong)
    assert(r.getAs[Long]("n_b") === b.length.toLong)
    assert(math.abs(r.getAs[Double]("cohen_d") - d) < 1e-5)
    assert(math.abs(r.getAs[Double]("hedges_g") -
      d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))) < 1e-5)
    assert(math.abs(r.getAs[Double]("cliff_delta") - cliff) < 1e-5,
      s"Cliff mismatch: reported ${r.getAs[Double]("cliff_delta")} vs brute $cliff")
    assert(math.abs(r.getAs[Double]("cles") - (cliff + 1.0) / 2.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("var_ratio") - va / vb) < 1e-5)
  }

  test("q388 Good-Turing equals exact integer count-of-count ratios") {
    val rows = byName("q388_good_turing")(spark, sf).collect().sortBy(_.getAs[Int]("r"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val bigrams = docs.flatMap { t =>
      val ws = t.split(" ").filter(_.nonEmpty)
      ws.sliding(2).filter(_.length == 2).map(p => p(0) + " " + p(1))
    }
    val wc = bigrams.groupBy(identity).map(_._2.length)
    val coc = wc.groupBy(identity).map { case (r2, v) => r2 -> v.size }
    val n = wc.sum.toDouble
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val r2 = row.getAs[Int]("r")
      assert(row.getAs[Long]("n_r") === coc(r2).toLong, s"N_$r2 mismatch")
      val rstar = (r2 + 1.0) * coc.getOrElse(r2 + 1, 0) / coc(r2)
      assert(math.abs(row.getAs[Double]("r_star") - rstar) < 1e-6)
      assert(math.abs(row.getAs[Double]("p_gt") - rstar / n) < 1e-6)
      assert(math.abs(row.getAs[Double]("p0_mass") - coc(1) / n) < 1e-6)
    }
    // every row present in the output is a frequency that exists
    assert(rows.map(_.getAs[Int]("r")).toSet === coc.keySet.filter(_ <= 10))
  }

  test("q389 AIPW equals a scalar logistic-IRLS + OLS + augmentation pipeline") {
    val r = byName("q389_aipw_dr")(spark, sf).collect().head
    val fx = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_discount"), col("l_extendedprice"), col("l_quantity"), col("l_tax"))
      .collect().map { x =>
        val disc = x.getDouble(0)
        (if (disc >= 0.05) 1.0 else 0.0, x.getDouble(1) * (1.0 - disc),
          x.getDouble(2), x.getDouble(3))
      }
    val n = fx.length.toDouble
    def solve3(aM: Array[Array[Double]], bV: Array[Double]): Array[Double] = {
      // Gaussian elimination, 3x3
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
    val pbar = fx.map(_._1).sum / n
    var wts = Array(math.log(pbar / (1 - pbar)), 0.0, 0.0)
    for (_ <- 1 to 2) {
      var aM = Array.fill(3, 3)(0.0); var bV = Array.fill(3)(0.0)
      fx.foreach { case (t, _, x1, x2) =>
        val xs = Array(1.0, x1, x2)
        val eta = wts.zip(xs).map(p => p._1 * p._2).sum
        val p = 1.0 / (1.0 + math.exp(-eta))
        val v = p * (1 - p); val vz = v * eta + (t - p)
        for (i <- 0 until 3; j <- 0 until 3) aM(i)(j) += v * xs(i) * xs(j)
        for (i <- 0 until 3) bV(i) += vz * xs(i)
      }
      wts = solve3(aM, bV)
    }
    def ols(arm: Double): Array[Double] = {
      val sub = fx.filter(_._1 == arm)
      var aM = Array.fill(3, 3)(0.0); var bV = Array.fill(3)(0.0)
      sub.foreach { case (_, y, x1, x2) =>
        val xs = Array(1.0, x1, x2)
        for (i <- 0 until 3; j <- 0 until 3) aM(i)(j) += xs(i) * xs(j)
        for (i <- 0 until 3) bV(i) += y * xs(i)
      }
      solve3(aM, bV)
    }
    val w1 = ols(1.0); val w0 = ols(0.0)
    var spsi = 0.0; var sipw = 0.0
    fx.foreach { case (t, y, x1, x2) =>
      val xs = Array(1.0, x1, x2)
      val e = 1.0 / (1.0 + math.exp(-wts.zip(xs).map(p => p._1 * p._2).sum))
      val ec = math.min(math.max(e, 0.01), 0.99)
      val m1 = w1.zip(xs).map(p => p._1 * p._2).sum
      val m0 = w0.zip(xs).map(p => p._1 * p._2).sum
      spsi += m1 - m0 + t * (y - m1) / ec - (1 - t) * (y - m0) / (1 - ec)
      sipw += t * y / ec - (1 - t) * y / (1 - ec)
    }
    assert(r.getAs[Long]("n") === fx.length.toLong)
    assert(r.getAs[Long]("n_treated") === fx.count(_._1 == 1.0).toLong)
    assert(math.abs(r.getAs[Double]("ate_aipw") - spsi / n) < 1e-2,
      s"AIPW mismatch: ${r.getAs[Double]("ate_aipw")} vs ${spsi / n}")
    assert(math.abs(r.getAs[Double]("ate_ipw") - sipw / n) < 1e-2)
    assert(math.abs(r.getAs[Double]("prop_coef_qty") - wts(1)) < 1e-5)
    assert(math.abs(r.getAs[Double]("prop_coef_tax") - wts(2)) < 1e-5)
  }
}
