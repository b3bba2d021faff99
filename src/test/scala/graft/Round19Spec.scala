package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-19 operators (q402–q407) beyond their oracle
  * hash checks — each against an independent scalar reimplementation:
  * the Breslow baseline equals a scalar refit + cumulative-hazard fold
  * and is consistent with q384's β; RMST equals trapezoid-free exact
  * step integration of a scalar KM curve; seasonal MK sums per-weekday
  * brute S/Var; AD and CvM equal brute pooled-distinct-value formulas;
  * and the energy distance equals the O(n²) pairwise definition.
  */
class Round19Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round19-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  /** Subjects (t, ev, x) rebuilt independently, as in Round16Spec. */
  private lazy val subj: Seq[(Int, Int, Double)] = {
    import java.time.LocalDate
    val evRows = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_type"), col("ts").cast("date").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        java.time.temporal.ChronoUnit.DAYS.between(
          LocalDate.parse("2024-01-01"), LocalDate.parse(r.getString(2))).toInt))
    val horizon = evRows.map(_._3).max
    val signup = evRows.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).min }
    val firstPur = evRows.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3) }
    val clicks = evRows.filter(_._2 == "click").groupBy(_._1)
      .map { case (u, rs) => u -> rs.length }
    signup.toSeq.map { case (u, t0) =>
      val p = firstPur.get(u).flatMap(ds => ds.filter(_ >= t0).sorted.headOption)
      val (t, ev2) = p.map(t1 => (t1 - t0, 1)).getOrElse((horizon - t0, 0))
      (t, ev2, clicks.getOrElse(u, 0).toDouble)
    }
  }

  private def coxNewton(b: Double): (Double, Double) = {
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

  test("q402 Breslow baseline equals a scalar refit + cumulative fold") {
    val rows = byName("q402_breslow_baseline")(spark, sf).collect()
      .sortBy(_.getAs[Int]("duration_days"))
    assert(rows.nonEmpty)
    val (u0, i0) = coxNewton(0.0); val b1 = u0 / i0
    val (u1, i1) = coxNewton(b1); val b2 = b1 + u1 / i1
    assert(math.abs(rows.head.getAs[Double]("beta") - b2) < 1e-5)
    var ch = 0.0
    val times = subj.map(_._1).distinct.sorted
    val expected = times.flatMap { t =>
      val d = subj.count(s2 => s2._1 == t && s2._2 == 1)
      if (d > 0) {
        val s0 = subj.filter(_._1 >= t).map(s2 => math.exp(b2 * s2._3)).sum
        ch += d / s0
        Some((t, d, d / s0, ch, math.exp(-ch)))
      } else None
    }
    assert(rows.length === expected.length)
    rows.zip(expected).foreach { case (r, (t, d, hinc, cum, sb)) =>
      assert(r.getAs[Int]("duration_days") === t)
      assert(r.getAs[Long]("n_events") === d.toLong)
      assert(math.abs(r.getAs[Double]("hazard_increment") - hinc) < 1e-5)
      assert(math.abs(r.getAs[Double]("cum_hazard") - cum) < 1e-4)
      assert(math.abs(r.getAs[Double]("baseline_survival") - sb) < 1e-4)
    }
    // baseline survival is a proper survival curve
    val sv = rows.map(_.getAs[Double]("baseline_survival"))
    sv.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) }
  }

  test("q403 RMST equals exact step integration of a scalar KM curve") {
    val rows = byName("q403_rmst")(spark, sf).collect().sortBy(_.getAs[Int]("tau"))
    assert(rows.map(_.getAs[Int]("tau")).toSeq === Seq(10, 21))
    // scalar KM on (t, ev)
    val n = subj.size
    val times = subj.map(_._1).distinct.sorted
    var atRisk = n; var s = 1.0
    val steps = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    for (t <- times) {
      val c = subj.count(_._1 == t); val d = subj.count(x => x._1 == t && x._2 == 1)
      if (d > 0) {
        s *= (if (d >= atRisk) 0.0 else 1.0 - d.toDouble / atRisk)
        if (d >= atRisk) s = 0.0
        steps += ((t, s))
      }
      atRisk -= c
    }
    def rmst(tau: Double): Double = {
      var area = 0.0; var sPrev = 1.0; var tPrev = 0.0
      for ((t, sv) <- steps) {
        area += sPrev * (math.min(t, tau) - math.min(tPrev, tau))
        sPrev = sv; tPrev = t
      }
      area + sPrev * math.max(tau - math.min(tPrev, tau), 0.0)
    }
    rows.foreach { r =>
      val tau = r.getAs[Int]("tau").toDouble
      assert(math.abs(r.getAs[Double]("rmst") - rmst(tau)) < 1e-4,
        s"RMST mismatch at tau=$tau: ${r.getAs[Double]("rmst")} vs ${rmst(tau)}")
      assert(r.getAs[Double]("rmst") <= tau + 1e-9)
    }
    assert(rows(0).getAs[Double]("rmst") <= rows(1).getAs[Double]("rmst"))
  }

  private lazy val grid: Map[(String, Int), Double] = {
    import java.time.LocalDate
    spark.read.parquet(s"$sf/events.parquet")
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
  }

  test("q404 seasonal MK sums per-weekday brute S and variance") {
    val rows = byName("q404_seasonal_mk")(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val el = r.getAs[String]("el")
      val series = grid.filter(_._1._1 == el).toSeq
        .map { case ((_, di), v) => (di, v) }.sortBy(_._1)
      var sTot = 0L; var vTot = 0.0; var nSeasons = 0
      for (w <- 0 until 7) {
        val vs = series.filter(_._1 % 7 == w).map(_._2)
        val t = vs.length
        if (t >= 2) {
          nSeasons += 1
          var s2 = 0L
          for (i <- 0 until t; j <- i + 1 until t)
            s2 += (if (vs(j) > vs(i)) 1 else if (vs(j) < vs(i)) -1 else 0)
          val tieCorr = vs.groupBy(identity).values.map(_.size)
            .filter(_ > 1).map(tc => tc.toLong * (tc - 1) * (2 * tc + 5)).sum
          sTot += s2
          vTot += (t.toDouble * (t - 1) * (2 * t + 5) - tieCorr) / 18.0
        }
      }
      assert(r.getAs[Long]("s_stat") === sTot, s"seasonal S mismatch for $el")
      assert(r.getAs[Int]("n_seasons") === nSeasons)
      assert(math.abs(r.getAs[Double]("var_s") - vTot) < 1e-5)
      val z = if (sTot > 0) (sTot - 1) / math.sqrt(vTot)
        else if (sTot < 0) (sTot + 1) / math.sqrt(vTot) else 0.0
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
    }
  }

  /** Raw event values per element for the two-sample family. */
  private lazy val valsByEl: Map[String, Array[Double]] =
    spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (el, rs) => el -> rs.map(_.getDouble(1)) }

  test("q405 AD equals the brute pooled-distinct-value formula") {
    val rows = byName("q405_anderson_darling")(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val xs = valsByEl(r.getAs[String]("src")); val ys = valsByEl(r.getAs[String]("dst"))
      val (na, nb) = (xs.length, ys.length); val nN = na + nb
      val pooled = (xs ++ ys).distinct.sorted
      var ta = 0.0; var tb = 0.0
      for (v <- pooled) {
        val ma = xs.count(_ <= v).toLong; val mb = ys.count(_ <= v).toLong
        val bj = ma + mb
        val l = xs.count(_ == v) + ys.count(_ == v)
        if (bj < nN) {
          val numA = nN * ma - na.toLong * bj
          val numB = nN * mb - nb.toLong * bj
          ta += l * numA.toDouble * numA / (bj.toDouble * (nN - bj))
          tb += l * numB.toDouble * numB / (bj.toDouble * (nN - bj))
        }
      }
      val ad = (ta / na + tb / nb) / nN
      assert(r.getAs[Long]("n_a") === na.toLong && r.getAs[Long]("n_b") === nb.toLong)
      assert(math.abs(r.getAs[Double]("ad_stat") - ad) < 1e-4,
        s"AD mismatch ${r.getAs[String]("src")}/${r.getAs[String]("dst")}")
    }
  }

  test("q406 energy distance equals the O(n^2) pairwise definition") {
    val rows = byName("q406_energy_distance")(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val xs = valsByEl(r.getAs[String]("src")); val ys = valsByEl(r.getAs[String]("dst"))
      val (na, nb) = (xs.length.toDouble, ys.length.toDouble)
      var sxy = 0.0
      for (x <- xs; y <- ys) sxy += math.abs(x - y)
      var sxx = 0.0
      for (a2 <- xs; b2 <- xs) sxx += math.abs(a2 - b2)
      var syy = 0.0
      for (a2 <- ys; b2 <- ys) syy += math.abs(a2 - b2)
      val d2 = 2 * sxy / (na * nb) - sxx / (na * na) - syy / (nb * nb)
      assert(math.abs(r.getAs[Double]("energy_dist_sq") - d2) < 1e-4,
        s"energy mismatch ${r.getAs[String]("src")}/${r.getAs[String]("dst")}: " +
          s"${r.getAs[Double]("energy_dist_sq")} vs $d2")
      assert(r.getAs[Double]("energy_dist_sq") >= -1e-9)
      assert(math.abs(r.getAs[Double]("t_stat") -
        (na * nb / (na + nb)) * d2) < 1e-3)
    }
  }

  test("q407 CvM equals the brute pooled-distinct-value formula") {
    val rows = byName("q407_cramer_von_mises")(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val xs = valsByEl(r.getAs[String]("src")); val ys = valsByEl(r.getAs[String]("dst"))
      val (na, nb) = (xs.length, ys.length); val nN = (na + nb).toDouble
      val pooled = (xs ++ ys).distinct.sorted
      var s2 = 0.0
      for (v <- pooled) {
        val fa = xs.count(_ <= v) / na.toDouble
        val fb = ys.count(_ <= v) / nb.toDouble
        val l = xs.count(_ == v) + ys.count(_ == v)
        s2 += l * (fa - fb) * (fa - fb)
      }
      val cvm = (na.toDouble * nb / (nN * nN)) * s2
      assert(math.abs(r.getAs[Double]("cvm_stat") - cvm) < 1e-5,
        s"CvM mismatch ${r.getAs[String]("src")}/${r.getAs[String]("dst")}")
      assert(r.getAs[Double]("cvm_stat") >= 0)
    }
  }
}
