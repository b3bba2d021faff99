package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants and measured parity margins of the cointegration /
  * pre-whitening family (q314-q316): the Engle-Granger kernel agrees
  * with an independent scalar implementation to 1e-9 and separates a
  * planted cointegrated pair from a spurious-regression pair; the AR(1)
  * pre-whitening filter recovers a planted coefficient; permutation
  * entropy hits its closed-form values on constructed series; and the
  * libm-sensitive readouts sit measurably clear of their round-6
  * boundaries so a last-ulp engine difference cannot flip a hash.
  */
class Round11Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round11-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Independent scalar Engle-Granger: OLS y~x, then the DF t-stat of
    * the residual — plain-double sums in the same position order as the
    * engine kernel, written from the formulas, not the kernel. */
  private def scalarDfT(xs: Seq[Double], ys: Seq[Double]): (Double, Double) = {
    val n = xs.size
    var sx = 0.0; var sy = 0.0; var sxy = 0.0; var sxx = 0.0
    for (i <- 0 until n) {
      sx += xs(i); sy += ys(i); sxy += xs(i) * ys(i); sxx += xs(i) * xs(i)
    }
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val e = (0 until n).map(i => ys(i) - a - b * xs(i))
    var s1 = 0.0; var s2 = 0.0; var sdd = 0.0
    for (i <- 1 until n) {
      val d = e(i) - e(i - 1)
      s1 += e(i - 1) * d; s2 += e(i - 1) * e(i - 1); sdd += d * d
    }
    val gamma = s1 / s2
    val ssr = math.max(sdd - s1 * s1 / s2, 0.0)
    (b, gamma / math.sqrt((ssr / (n - 2)) / s2))
  }

  private def kernelDfT(xs: Seq[Double], ys: Seq[Double]): (Double, Double) = {
    val n = xs.size
    val r = spark.sql(
      s"SELECT array(${xs.mkString(",")}) AS xv, array(${ys.mkString(",")}) AS yv, $n AS n")
      .withColumn("m1", expr(operators.CointOps.mom1Spark))
      .withColumn("beta", expr(operators.CointOps.betaExpr))
      .withColumn("alpha", expr(operators.CointOps.alphaExpr))
      .withColumn("ev", expr(operators.CointOps.residSpark))
      .withColumn("md", expr(operators.CointOps.dfSpark))
      .select(col("beta"), expr(operators.CointOps.dfTExpr).as("t"))
      .head()
    (r.getDouble(0), r.getDouble(1))
  }

  // Deterministic white-ish pseudo-noise (the GLSL fract-sin hash; no
  // RNG state): uniform on (-0.5, 0.5), negligible lag-1 correlation —
  // sin(i*c) alone is a SLOW sinusoid (period ~15 here), not noise.
  private def noise(i: Int): Double = {
    val x = math.sin(i * 12.9898) * 43758.5453
    (x - math.floor(x)) - 0.5
  }

  test("q314 kernel == independent scalar Engle-Granger to 1e-9, and separates planted from spurious") {
    val n = 60
    // shared random walk driver
    val walk = Iterator.iterate((0.0, 1)) { case (v, i) => (v + 4.0 * noise(i), i + 1) }
      .take(n).map(_._1).toSeq
    // planted: y = 2x + stationary noise (noise sd << walk sd so the OLS
    // slope error cannot re-inject the walk into the residual)
    val xs = walk
    val ysCoint = walk.zipWithIndex.map { case (v, i) => 2.0 * v + 0.8 * noise(i + 7) }
    // spurious: an unrelated smooth wandering series -> residual inherits the walk
    val ysSpur = Iterator.iterate((5.0, 1)) { case (v, i) => (v + 0.4 * math.cos(i / 3.0), i + 1) }
      .take(n).map(_._1).toSeq

    val (bK, tK) = kernelDfT(xs, ysCoint)
    val (bS, tS) = scalarDfT(xs, ysCoint)
    assert(math.abs(bK - bS) < 1e-9 && math.abs(tK - tS) < 1e-9, s"kernel ($bK,$tK) vs scalar ($bS,$tS)")
    assert(math.abs(bK - 2.0) < 0.05, s"OLS should recover the planted slope 2.0, got $bK")
    assert(tK < -4.0, s"planted cointegration must reject the unit root strongly, got $tK")

    val (_, tSpur) = kernelDfT(xs, ysSpur)
    val (_, tSpurScalar) = scalarDfT(xs, ysSpur)
    assert(math.abs(tSpur - tSpurScalar) < 1e-9)
    assert(tSpur > tK + 2.0, s"spurious pair ($tSpur) must sit well above planted ($tK)")
  }

  test("q314 invariants on sf0.001: flag consistency, finite stats, n bound") {
    val rows = SparkEntry.queries("q314_cointegration")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("df_t")
      assert(!t.isNaN && !t.isInfinite)
      assert(r.getAs[Int]("cointegrated") == (if (t < -2.86) 1 else 0), s"$r")
      assert(r.getAs[Long]("n_common") >= 10)
    }
  }

  test("q315 pre-whitening recovers a planted AR(1) coefficient and kernel phi matches scalar") {
    val n = 80
    // x_t = 0.8 x_{t-1} + pulse train (deterministic innovations)
    val xs = Iterator.iterate((1.0, 1)) { case (v, i) => (0.8 * v + noise(i), i + 1) }
      .take(n).map(_._1).toSeq
    var sa = 0.0; var sb = 0.0; var sab = 0.0; var saa = 0.0
    for (i <- 1 until n) {
      sa += xs(i - 1); sb += xs(i); sab += xs(i - 1) * xs(i); saa += xs(i - 1) * xs(i - 1)
    }
    val phiScalar = ((n - 1) * sab - sa * sb) / ((n - 1) * saa - sa * sa)
    val phiK = spark.sql(
      s"SELECT array(${xs.mkString(",")}) AS xv, $n AS n")
      .withColumn("ma", expr(operators.CointOps.arSpark))
      .select(expr(operators.CointOps.phiExpr).as("phi")).head().getDouble(0)
    assert(math.abs(phiK - phiScalar) < 1e-9)
    assert(math.abs(phiK - 0.8) < 0.15, s"AR(1) fit should recover ~0.8, got $phiK")
  }

  test("q315 invariants on sf0.001: rho bounds, per-pair constant phi, attenuation flag consistency") {
    val rows = SparkEntry.queries("q315_prewhiten_xcorr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("rho_raw")) <= 1.0 + 1e-9)
      assert(math.abs(r.getAs[Double]("rho_prew")) <= 1.0 + 1e-9)
      assert(r.getAs[Int]("attenuated") ==
        (if (math.abs(r.getAs[Double]("rho_prew")) < math.abs(r.getAs[Double]("rho_raw"))) 1 else 0))
    }
    val phis = rows.groupBy(r => (r.getAs[String]("src"), r.getAs[String]("dst")))
      .values.map(_.map(_.getAs[Double]("phi")).distinct.size)
    assert(phis.forall(_ == 1), "phi must not depend on the lag")
  }

  test("q316 closed forms: monotone series has zero entropy; 2-alternation hits ln2/ln6") {
    val s = spark
    import s.implicits._
    val mono = (1 to 20).map(i => ("m", i, i.toDouble)).toDF("el", "di", "v")
    val rm = operators.CointOps.permEntropyFromGrid(mono).head()
    assert(rm.getAs[Long]("n_triples") == 18 && rm.getAs[Long]("n_patterns") == 1)
    assert(rm.getAs[Double]("perm_entropy") == 0.0)

    // v alternates 0,1,0,1,... -> patterns alternate between exactly two
    // codes with counts 9/9 -> H = ln 2, normalized = ln2/ln6
    val alt = (1 to 20).map(i => ("a", i, (i % 2).toDouble)).toDF("el", "di", "v")
    val ra = operators.CointOps.permEntropyFromGrid(alt).head()
    assert(ra.getAs[Long]("n_patterns") == 2)
    val expected = BigDecimal(math.log(2) / math.log(6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(ra.getAs[Double]("perm_entropy") - expected) < 1e-9)
  }

  test("q316 invariants on sf0.001: entropy in [0, 1.2], triples = series length - 2") {
    val grid = operators.CausalOps.daily(spark, sf)
    val lens = grid.groupBy("el").count().collect()
      .map(r => r.getAs[String]("el") -> r.getAs[Long]("count")).toMap
    val rows = SparkEntry.queries("q316_perm_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pe = r.getAs[Double]("perm_entropy")
      assert(pe >= 0.0 && pe <= 1.2, s"$r")
      assert(r.getAs[Long]("n_triples") == lens(r.getAs[String]("el")) - 2)
    }
  }

  test("q325 recovers a planted VAR(1): a_yx ~ 0.4, a_xx ~ 0.5, stable, and the IRF unroll is self-consistent") {
    val s = spark
    import s.implicits._
    val n = 60
    var xv = 0.5; var yv = 0.3
    val rows = (1 to n).flatMap { i =>
      val nx = 0.5 * xv + noise(i)
      val ny = 0.4 * xv + 0.3 * yv + noise(i + 1000)
      xv = nx; yv = ny
      Seq(("x", i, nx), ("y", i, ny))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_var").toString
    rows.toDF("event_type", "dayi", "value")
      .selectExpr("cast(dayi as long) * 2 + cast(event_type = 'y' as long) as event_id",
        "timestamp(date_add(date'2024-01-01', dayi)) as ts",
        "cast(1 as long) as user_id", "event_type", "value", "'{}' as props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = SparkEntry.queries("q325_var_irf")(spark, tmp).collect()
      .find(x => x.getAs[String]("src") == "x" && x.getAs[String]("dst") == "y").get
    assert(math.abs(r.getAs[Double]("a_yx") - 0.4) < 0.15, s"$r")
    assert(math.abs(r.getAs[Double]("a_xx") - 0.5) < 0.2, s"$r")
    assert(r.getAs[Int]("stable") == 1, s"$r")
    // IRF unroll consistency from the emitted (rounded) matrix entries
    val irf2 = r.getAs[Double]("a_yx") * r.getAs[Double]("a_xx") +
      r.getAs[Double]("a_yy") * r.getAs[Double]("a_yx")
    assert(math.abs(r.getAs[Double]("irf2_yx") - irf2) < 1e-4, s"$r")
  }

  test("q326/q327 invariants on sf0.001: ALSH ranking agrees with MIPS; the rerank funnel dominates the prefix cut") {
    val m = SparkEntry.queries("q326_mips_alsh")(spark, sf).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[Long]("agree5") == 5L, s"ALSH order must match MIPS order: $r")
      assert(r.getAs[Double]("norm_bias") > 0.0)
    }
    val mk = SparkEntry.queries("q327_matryoshka")(spark, sf).collect()
    assert(mk.nonEmpty)
    mk.foreach { r =>
      val rp = r.getAs[Double]("recall_prefix"); val rf = r.getAs[Double]("recall_funnel")
      assert(rp >= 0.0 && rp <= 1.0 && rf >= 0.0 && rf <= 1.0)
      assert(rf >= rp, s"funnel top-10 must contain at least the prefix-top-10 exact hits: $r")
    }
  }

  test("q330/q331 invariants; q329 streaming permutation entropy == batch q316 row-for-row") {
    val tr = SparkEntry.queries("q330_textrank")(spark, sf).collect()
    assert(tr.nonEmpty && tr.length <= 15)
    assert(tr.forall(_.getAs[Double]("textrank") > 0.15 - 1e-9),
      "TextRank scores are bounded below by the damping floor")
    val cf = SparkEntry.queries("q331_item_cf")(spark, sf).collect()
    cf.foreach { r =>
      val sim = r.getAs[Double]("cosine_sim")
      assert(sim > 0.0 && sim <= 1.0 + 1e-9, s"$r")
      assert(r.getAs[Long]("n_co") >= 2)
    }
    val batch = SparkEntry.queries("q316_perm_entropy")(spark, sf).collect().toSeq
    val stream = SparkEntry.queries("q329_stream_perm_entropy")(spark, sf).collect().toSeq
    assert(batch.nonEmpty && batch == stream)
  }

  test("q333-q336 invariants: W1 bounds, motif structure, monotone lateness sweep, erasure bounds") {
    val w1 = SparkEntry.queries("q333_wasserstein")(spark, sf).collect()
    assert(w1.nonEmpty)
    w1.foreach { r =>
      val w = r.getAs[Double]("w1_bins"); val sft = r.getAs[Double]("signed_shift")
      assert(r.getAs[Long]("n_bins") == 10L)
      assert(w >= math.abs(sft) - 1e-9, s"W1 dominates the signed shift: $r")
      assert(w >= 0.0 && w <= 9.0 + 1e-9, s"ordinal W1 is bounded by the bin span: $r")
    }
    val sp = SparkEntry.queries("q334_seq_patterns")(spark, sf).collect()
    assert(sp.nonEmpty)
    sp.foreach { r =>
      assert(r.getAs[String]("motif").count(_ == '>') == 2)
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("n_users"))
    }
    val ls = SparkEntry.queries("q335_lateness_sweep")(spark, sf).collect()
    assert(ls.length == 4)
    val fracs = ls.sortBy(_.getAs[Int]("hours")).map(_.getAs[Double]("frac_dropped"))
    assert(fracs.zip(fracs.tail).forall { case (a, b) => a >= b },
      s"drop fraction must not increase with watermark delay: ${fracs.toSeq}")
    val ea = SparkEntry.queries("q336_erasure_audit")(spark, sf).collect()
    assert(ea.length == 4)
    ea.foreach(r => assert(r.getAs[Long]("n_erase") <= r.getAs[Long]("n_total")))
  }

  test("q335 detects planted out-of-order arrivals and the sweep separates the deltas") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_late").toString
    // batches of 500 by event_id; batch 1 carries events 26h older than
    // batch 0's max -> dropped at 1h/6h/24h, kept at 72h
    val rows = (0 until 1500).map { i =>
      val base = 1704067200000000L // 2024-01-01T00:00Z in micros
      val ts = if (i >= 500 && i < 600) base - 26L * 3600 * 1000000
               else base + i.toLong * 1000000
      (i.toLong, ts, 1L, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "tsus", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "timestamp_micros(tsus) AS ts", "user_id",
        "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q335_lateness_sweep")(spark, tmp).collect()
      .map(r => r.getAs[Int]("hours") -> r.getAs[Long]("n_dropped")).toMap
    assert(out(1) == 100L && out(6) == 100L && out(24) == 100L, s"$out")
    assert(out(72) == 0L, s"$out")
  }

  test("q337 LTV curves are cumulative; q338 Shapley matches the closed form on a one-channel world") {
    val ltv = SparkEntry.queries("q337_cohort_ltv")(spark, sf).collect()
    assert(ltv.nonEmpty)
    ltv.groupBy(_.getAs[String]("cohort_week")).values.foreach { rows =>
      val byAge = rows.sortBy(_.getAs[Long]("age_w")).map(_.getAs[Double]("cum_ltv"))
      assert(byAge.zip(byAge.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"cumulative LTV must not decrease: ${byAge.toSeq}")
      assert(rows.map(_.getAs[Long]("n_users")).distinct.length == 1)
    }
    // one-channel world: 5 of 10 click-users convert -> phi_click =
    // w(1)*(v({click}) - v(empty-set)) = 0.25 * (0.5 - 0) = 0.125
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_shap").toString
    val rows = (0 until 10).flatMap { u =>
      val base = 1704067200000000L + u * 1000000L
      val click = Seq((u * 10L, base, u.toLong, "click", 1.0, "{}"))
      val buy = if (u < 5) Seq((u * 10L + 1, base + 1000000L, u.toLong, "purchase", 5.0, "{}"))
                else Seq.empty
      click ++ buy
    }
    rows.toDF("event_id", "tsus", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "timestamp_micros(tsus) AS ts", "user_id",
        "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val sh = SparkEntry.queries("q338_shapley_attribution")(spark, tmp).collect()
      .map(r => r.getAs[String]("channel") -> r.getAs[Double]("shapley")).toMap
    assert(sh == Map("click" -> 0.125), s"$sh")
  }

  test("q340-q342: DP noise is Laplace-scaled and reproducible; decay feature matches the closed form; advisor is sane") {
    val dp = SparkEntry.queries("q340_dp_release")(spark, sf).collect()
    assert(dp.nonEmpty)
    dp.foreach(r => assert(r.getAs[Long]("dp_count") >= 0L))
    val meanAbs = dp.map(r => math.abs(r.getAs[Double]("noise"))).sum / dp.length
    assert(meanAbs > 0.2 && meanAbs < 3.0, s"E|Laplace(1)| = 1, got $meanAbs")
    val dp2 = SparkEntry.queries("q340_dp_release")(spark, sf).collect()
    assert(dp.toSeq == dp2.toSeq, "seeded release must be reproducible")

    // closed form: one click at day 0, purchase at day 7 -> exp(-0.7)
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_decay").toString
    val day = 86400000000L
    Seq((1L, 1704067200000000L, 9L, "click", 1.0, "{}"),
        (2L, 1704067200000000L + 7 * day, 9L, "purchase", 5.0, "{}"))
      .toDF("event_id", "tsus", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "timestamp_micros(tsus) AS ts", "user_id",
        "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val dec = SparkEntry.queries("q341_decay_features")(spark, tmp).collect()
    assert(dec.length == 1)
    val expect = BigDecimal(math.exp(-0.7))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(dec.head.getAs[Double]("decayed_clicks") - expect) < 1e-9, s"${dec.head}")

    val adv = SparkEntry.queries("q342_encoding_advisor")(spark, sf).collect()
    assert(adv.length == 4)
    adv.foreach { r =>
      assert(Set("rle", "dictionary", "plain")(r.getAs[String]("advice")))
      assert(r.getAs[Double]("mean_run") >= 1.0)
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n"))
    }
    // the 2-3 value flag columns must never be advised 'plain'
    val flag = adv.find(_.getAs[String]("col_name") == "l_returnflag").get
    assert(flag.getAs[String]("advice") != "plain", s"$flag")
  }

  test("q343 frame plan: contiguous frame indices, monotone offsets, quota-consistent") {
    val rows = SparkEntry.queries("q343_frame_plan")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { fr =>
      val sorted = fr.sortBy(_.getAs[Long]("frame_idx"))
      val idxs = sorted.map(_.getAs[Long]("frame_idx"))
      assert(idxs.head == 0L && idxs.zip(idxs.tail).forall { case (a, b) => b == a + 1 },
        s"frame indices must be contiguous from 0: ${idxs.toSeq}")
      val offs = sorted.map(_.getAs[Long]("byte_offset"))
      assert(offs.zip(offs.tail).forall { case (a, b) => b > a },
        s"byte offsets must strictly increase: ${offs.toSeq}")
      assert(fr.map(_.getAs[Long]("quota")).distinct.length == 1)
      assert(idxs.length <= fr.head.getAs[Long]("quota"))
    }
  }

  test("q344-q346: bitemporal corrections only appear at the later tx cut; trigger composes its inputs; estimator brackets truth") {
    val bt = SparkEntry.queries("q344_bitemporal")(spark, sf).collect()
    val byCut = bt.groupBy(_.getAs[String]("tx_cut"))
    assert(byCut.keySet == Set("1998-06-01", "1999-06-01"))
    val nCorr = byCut.map { case (c, rows) => c -> rows.map(_.getAs[Long]("n_corrected")).sum }
    assert(nCorr("1999-06-01") >= nCorr("1998-06-01"),
      s"later knowledge can only add corrections: $nCorr")
    // same effective date: row counts per status must MATCH across cuts
    val nByCut = byCut.map { case (c, rows) => c -> rows.map(r =>
      r.getAs[String]("status") -> r.getAs[Long]("n")).toMap }
    assert(nByCut("1998-06-01") == nByCut("1999-06-01"),
      "the effective-date population is fixed; only prices restate")

    val tr = SparkEntry.queries("q345_retrain_trigger")(spark, sf).collect()
    val psi = SparkEntry.queries("q281_psi_drift")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("psi")).toMap
    val w1 = SparkEntry.queries("q333_wasserstein")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("w1_bins")).toMap
    tr.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Double]("psi") == psi(et), "trigger must reuse q281's exact psi")
      assert(r.getAs[Double]("w1_bins") == w1(et), "trigger must reuse q333's exact W1")
      val expect = if (r.getAs[Double]("psi") > 0.2 || r.getAs[Double]("w1_bins") > 0.5 ||
        math.abs(r.getAs[Double]("signed_shift")) > 0.3) 1 else 0
      assert(r.getAs[Int]("retrain") == expect)
    }

    val ce = SparkEntry.queries("q346_join_card_estimate")(spark, sf).head()
    assert(ce.getAs[Long]("bucket_est") >= ce.getAs[Long]("true_card"),
      "bucketed product over-counts cross-key collisions, never under")
    assert(ce.getAs[Double]("bucket_ratio") >= 1.0)
    assert(ce.getAs[Long]("true_card") > 0L)
  }

  test("q348 picks order 2 on a planted AR(2); q349 assortativity is a bounded correlation") {
    val s = spark
    import s.implicits._
    // AR(2) with a strong second lag: x_t = 0.2 x_{t-1} + 0.6 x_{t-2} + noise
    val n = 120
    var x1 = 0.3; var x2 = 0.1
    val rows = (1 to n).map { i =>
      val x = 0.2 * x1 + 0.6 * x2 + noise(i)
      x2 = x1; x1 = x
      ("a", i, x)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_arbic").toString
    rows.toDF("event_type", "dayi", "value")
      .selectExpr("cast(dayi as long) as event_id",
        "timestamp(date_add(date'2024-01-01', dayi)) as ts",
        "cast(1 as long) as user_id", "event_type", "value", "'{}' as props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = SparkEntry.queries("q348_ar_order_bic")(spark, tmp).head()
    assert(r.getAs[Int]("best_p") == 2, s"planted AR(2) must select order 2: $r")
    // BIC consistency with the emitted values
    val (b1, b2, b3) = (r.getAs[Double]("bic1"), r.getAs[Double]("bic2"), r.getAs[Double]("bic3"))
    assert(b2 <= b1 && b2 <= b3, s"$r")

    val a = SparkEntry.queries("q349_assortativity")(spark, sf).head()
    val rho = a.getAs[Double]("assortativity")
    assert(math.abs(rho) <= 1.0 + 1e-9)
    assert(a.getAs[Long]("n_edge_ends") % 2 == 0, "symmetric edge list has even size")
    assert(a.getAs[Double]("mean_deg") > 0.0)
  }

  test("q350-q352: FK flag discriminates; allocations sum to budget; planted clustering drives ICC to 1") {
    val fk = SparkEntry.queries("q350_fk_discovery")(spark, sf).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Int]("fk_candidate")).toMap
    assert(fk("lineitem.l_orderkey->orders.o_orderkey") == 1)
    assert(fk("orders.o_orderkey->part.p_partkey") == 0,
      "the designed negative pair must not flag")

    val al = SparkEntry.queries("q351_neyman_allocation")(spark, sf).collect()
    assert(al.map(_.getAs[Long]("neyman_n")).sum == 1000L)
    assert(al.map(_.getAs[Long]("proportional_n")).sum == 1000L)

    val icc = SparkEntry.queries("q352_icc")(spark, sf).head().getAs[Double]("icc1")
    assert(icc >= -1.0 && icc <= 1.0)
    // planted: user means far apart, within-user noise tiny -> ICC ~ 1
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_icc").toString
    val rows = for (u <- 1 to 10; i <- 1 to 20) yield
      ((u * 100 + i).toLong, 1704067200000000L + i * 1000000L, u.toLong, "view",
        u * 100.0 + noise(u * 20 + i), "{}")
    rows.toDF("event_id", "tsus", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "timestamp_micros(tsus) AS ts", "user_id",
        "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val planted = SparkEntry.queries("q352_icc")(spark, tmp).head().getAs[Double]("icc1")
    assert(planted > 0.95, s"planted user clustering must dominate: $planted")
  }

  test("q353 LSH planner: closed-form thresholds pinned; candidate workload falls as the threshold rises") {
    val rows = SparkEntry.queries("q353_lsh_planner")(spark, sf).collect()
      .sortBy(-_.getAs[Int]("b"))
    assert(rows.length == 4)
    val sStars = rows.map(_.getAs[Double]("s_star"))
    assert(sStars.toSeq == Seq(0.0625, 0.3536, 0.7071, 0.917),
      s"(1/b)^(1/r) closed forms: ${sStars.toSeq}")
    val pairs = rows.map(_.getAs[Long]("candidate_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, bb) => a >= bb },
      s"more rows per band must prune candidates: ${pairs.toSeq}")
  }

  test("q354 lift curve ends at exactly 1.0 and the selector beats random; q355 coverage brackets its thresholds") {
    val lift = SparkEntry.queries("q354_dsir_lift")(spark, sf01).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(lift.length == 10)
    val recalls = lift.map(_.getAs[Double]("cum_recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a })
    assert(recalls.last == 1.0 && lift.last.getAs[Double]("lift") == 1.0)
    assert(lift.head.getAs[Double]("lift") > 1.0,
      s"the DSIR score must front-load target docs: ${lift.head}")

    val cov = SparkEntry.queries("q355_vocab_coverage")(spark, sf01).collect()
      .sortBy(_.getAs[Double]("tau"))
    assert(cov.length == 3)
    cov.foreach(r => assert(r.getAs[Double]("mass_covered") >= r.getAs[Double]("tau")))
    val sizes = cov.map(_.getAs[Long]("vocab_size"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b >= a })
  }

  test("JaroWinklerSim pins textbook values, DuckDB edge semantics, and codegen==interpreted parity") {
    import graft.functions.JaroWinklerSim.jw
    // textbook references (also probed against DuckDB 1.0)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-15)
    assert(math.abs(jw("arnab", "aranb") - 0.9466666666666665) < 1e-15)
    // the 0.7 boost threshold: prefix bonus NOT applied below it
    assert(math.abs(jw("aXXXXX", "aYYYYY") - 0.4444444444444444) < 1e-15)
    // edges per DuckDB: both-empty -> 0, identical -> 1, no matches -> 0
    assert(jw("", "") == 0.0 && jw("abc", "") == 0.0)
    assert(jw("abc", "abc") == 1.0 && jw("ab", "ba") == 0.0)
    // codegen path == interpreted path on real data: evaluate through a
    // projection (whole-stage codegen) and via the expression's eval
    graft.functions.JaroWinklerSim.register(spark)
    val names = SparkEntry.queries("q332_fuzzy_blocking")(spark, sf01).collect()
    assert(names.nonEmpty)
    names.foreach { r =>
      val expect = BigDecimal(jw(r.getAs[String]("u"), r.getAs[String]("v")))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("sim") == expect, s"$r")
    }
  }

  test("q332 threshold and rounding margins are measurable at sf0.01") {
    graft.functions.JaroWinklerSim.register(spark)
    val dn = graft.Tables.part(spark, sf01).select(col("p_name").as("nm")).distinct()
    val bl = dn.select(col("nm"), substring(col("nm"), 1, 4).as("blk"))
    val sims = bl.join(bl.select(col("nm").as("vnm"), col("blk").as("vblk")),
        col("vblk") === col("blk") && col("vnm") > col("nm"))
      .select(expr("jaro_winkler_sim(nm, vnm)").as("sim"))
      .collect().map(_.getDouble(0))
    assert(sims.nonEmpty)
    // Membership is decided on ROUND-6 values, which are engine-identical
    // as long as no unrounded sim sits within last-ulp reach of a 0.5e-6
    // rounding boundary — THAT is the only flippable edge (a rounded
    // value exactly AT 0.84 is stable: both engines compute the same
    // double, round it the same way, and >= includes it). Measure it.
    val roundMargin = sims.map { v =>
      val scaled = v * 1e6
      math.abs(scaled - math.floor(scaled) - 0.5)
    }.min
    assert(roundMargin > 1e-6, s"round-6 boundary margin too thin: $roundMargin")
  }

  test("q314/q315 round-6 rounding boundaries have measurable margin at sf0.01 (oracle-parity safety)") {
    // Rebuild the UNROUNDED readouts through the same kernels and measure
    // each value's distance to the nearest 0.5e-6 rounding boundary —
    // the q281/q306 margin idiom: a libm last-ulp skew (~1e-15 relative)
    // cannot cross a boundary that is >= 1e-9 away.
    def boundaryMargin(v: Double): Double = {
      val scaled = math.abs(v) * 1e6
      math.abs(scaled - math.floor(scaled) - 0.5)
    }
    val grid = operators.CausalOps.daily(spark, sf01)
    val co = operators.CointOps.pairSeriesOf(spark, grid)
      .withColumn("m1", expr(operators.CointOps.mom1Spark))
      .withColumn("beta", expr(operators.CointOps.betaExpr))
      .withColumn("alpha", expr(operators.CointOps.alphaExpr))
      .withColumn("ev", expr(operators.CointOps.residSpark))
      .withColumn("md", expr(operators.CointOps.dfSpark))
      .select(expr(operators.CointOps.dfTExpr).as("t"))
      .collect().map(_.getDouble(0))
    assert(co.nonEmpty)
    val mCo = co.map(boundaryMargin).min
    assert(mCo > 1e-6, s"df_t rounding margin too thin: $mCo")
    // flag boundary: distance of rounded df_t to the -2.86 cut
    val fCo = co.map(t => math.abs(BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 2.86)).min
    assert(fCo > 1e-4, s"cointegration flag margin too thin: $fCo")
  }
}
