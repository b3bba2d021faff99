package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Mathematical invariants of the round-9 operator family: drift is
  * non-negative and JSD-bounded, conformal coverage is a probability,
  * the Brier decomposition closes up to within-bin variance, Markov
  * removal effects are non-negative and share-normalized, predicted
  * links are genuinely non-adjacent, PACF values are partial
  * correlations, and the DTW fold kernel reproduces hand-computed
  * distances. The oracle pins exact VALUES; these pin why the values
  * are shaped like the statistics they claim to be.
  */
class Round9Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round9-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q281 PSI is non-negative and JSD is bounded by ln 2") {
    val rows = SparkEntry.queries("q281_psi_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("psi") >= -1e-9, s"negative PSI: $r")
      val jsd = r.getAs[Double]("jsd")
      assert(jsd >= -1e-9 && jsd <= math.log(2) + 1e-9, s"JSD out of [0, ln2]: $r")
      assert(r.getAs[Long]("n_bins") <= 10)
    }
  }

  test("q281 bin-boundary margin is measurably nonzero at the driver's verify SF") {
    // the hash-compare risk in PSI is a value landing bitwise ON a
    // decile boundary where the engines' interpolated percentiles could
    // differ in the last ulp; measure the actual gap (ADVICE r7 idiom)
    val d01 = "/root/testdata/sf0.01"
    val e = Tables.events(spark, d01).select(col("event_type").as("et"),
      col("value").as("v"),
      (col("ts") < lit("2024-01-16").cast("timestamp")).as("is_ref"))
    val qs = e.where(col("is_ref")).groupBy(col("et").as("qet"))
      .agg(expr("percentile(v, 0.1)").as("q1"),
        (2 to 9).map(k => expr(s"percentile(v, 0.$k)").as(s"q$k")): _*)
    // exact equality (gap = 0) is SAFE: both engines compare the same
    // doubles consistently. The ulp risk is a NEAR-miss — and the raw
    // corpus HAS one (a value 8.9e-16 from a boundary), which is why
    // q281 bins on round-9 comparands: after round-9, near-misses under
    // 5e-10 COLLAPSE to equality and the minimum positive gap is at
    // least 1e-9 by construction. Measure it on the rounded values.
    val gap = e.join(broadcast(qs), col("et") === col("qet"))
      .select((1 to 9).map(k =>
        abs(round(col("v"), 9) - round(col(s"q$k"), 9))).reduce(least(_, _)).as("g"))
      .where(col("g") > 0)
      .agg(min(col("g"))).head.getDouble(0)
    assert(gap >= 1e-9 - 1e-15, s"near-boundary value survived rounding (gap=$gap)")
  }

  test("q286 conformal interval: qhat is a non-negative residual and coverage is a probability") {
    val rows = SparkEntry.queries("q286_conformal_forecast")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("qhat") >= 0, s"$r")
      val cov = r.getAs[Double]("coverage")
      assert(cov >= 0 && cov <= 1, s"$r")
      assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_test") > 0)
    }
  }

  test("q287 Murphy decomposition closes: brier ~= reliability - resolution + uncertainty") {
    val rows = SparkEntry.queries("q287_calibration_brier")(spark, sf).collect()
    assert(rows.length == 10 || rows.nonEmpty)
    val r0 = rows.head
    val (brier, rel, res, unc) = (r0.getAs[Double]("brier"),
      r0.getAs[Double]("reliability"), r0.getAs[Double]("resolution"),
      r0.getAs[Double]("uncertainty"))
    // exact identity holds only when p is constant within a bin; the gap
    // IS the within-bin variance of p, which 10 fixed-width bins keep
    // small (each bin spans 0.1 -> var < 0.01/4)
    assert(math.abs(brier - (rel - res + unc)) <= 0.01,
      s"decomposition gap: brier=$brier rel=$rel res=$res unc=$unc")
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val avgP = r.getAs[Double]("avg_p")
      assert(avgP >= bin / 10.0 - 1e-9 && avgP <= (bin + 1) / 10.0 + 1e-9,
        s"bin mean outside bin: $r")
      val fp = r.getAs[Double]("frac_pos")
      assert(fp >= 0 && fp <= 1)
    }
  }

  test("q284 removal effects are non-negative, probabilities valid, shares sum to 1") {
    val rows = SparkEntry.queries("q284_markov_attribution")(spark, sf).collect()
    assert(rows.length == 4, s"expected one row per channel, got ${rows.length}")
    var shareSum = 0.0
    rows.foreach { r =>
      val pf = r.getAs[Double]("p_conv_full")
      val pr = r.getAs[Double]("p_conv_removed")
      assert(pf >= 0 && pf <= 1 && pr >= 0 && pr <= 1, s"$r")
      // deleting a channel only removes conversion paths: monotone
      assert(r.getAs[Double]("removal_effect") >= -1e-9, s"$r")
      assert(pr <= pf + 1e-9, s"removal increased conversion: $r")
      shareSum += r.getAs[Double]("share")
    }
    assert(math.abs(shareSum - 1.0) <= 1e-4, s"shares sum to $shareSum")
  }

  test("q285 predicted links are non-adjacent pairs with positive scores") {
    val preds = SparkEntry.queries("q285_adamic_adar")(spark, sf).collect()
    assert(preds.nonEmpty)
    preds.foreach { r =>
      assert(r.getAs[Double]("score") > 0)
      assert(r.getAs[Long]("n_common") >= 1)
      assert(r.getAs[Long]("u") < r.getAs[Long]("v"))
    }
    // recompute the support-floored edge set and assert disjointness
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val b = li.select(col("o").as("ob"), col("p").as("pb"))
    val edges = li.join(b, col("ob") === col("o") && col("pb") > col("p"))
      .groupBy(col("p").as("u"), col("pb").as("v"))
      .agg(count(lit(1)).as("n")).where(col("n") >= 2)
      .select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    preds.foreach { r =>
      val pair = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      assert(!edges.contains(pair), s"predicted an existing edge: $pair")
    }
  }

  test("q282 Theil-Sen enumerates exactly n(n-1)/2 slope pairs per element") {
    SparkEntry.queries("q282_theilsen_trend")(spark, sf).collect().foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2, s"$r")
    }
  }

  test("q283 PACF values are partial correlations: |pacf_k| <= 1") {
    val rows = SparkEntry.queries("q283_pacf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (c <- Seq("pacf1", "pacf2", "pacf3"))
        assert(math.abs(r.getAs[Double](c)) <= 1.0 + 1e-6, s"$c out of range: $r")
    }
  }

  test("DTW fold kernel reproduces hand-computed distances (identity, known path, asymmetric lengths)") {
    val s2 = spark
    import s2.implicits._
    val toy = Seq(
      ("id", Seq(0.0, 1.0, 2.0, 3.0), Seq(0.0, 1.0, 2.0, 3.0), 0.0),
      ("kp", Seq(0.0, 1.0, 2.0), Seq(1.0, 2.0, 3.0), 2.0),
      ("al", Seq(0.0, 5.0), Seq(0.0, 1.0, 5.0), 1.0))
      .toDF("nm", "xv_raw", "yv_raw", "expect")
      .select(col("nm"), col("expect"),
        col("xv_raw").as("xv"), col("yv_raw").as("yv"),
        size(col("xv_raw")).as("lx"), size(col("yv_raw")).as("ly"))
    val got = toy.withColumn("dtw", expr(graft.operators.SeriesOps.dtwFoldSpark))
      .select("nm", "expect", "dtw").collect()
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("dtw") - r.getAs[Double]("expect")) < 1e-12,
        s"DTW mismatch: $r")
    }
  }

  test("q288 DTW of a pair is symmetric under series swap") {
    val s2 = spark
    import s2.implicits._
    val g = Seq(("a", Seq(0.0, 1.0, 4.0, 2.0, 3.0)), ("b", Seq(1.0, 0.0, 2.0, 5.0, 3.0)))
      .toDF("el", "sv")
    def dtwOf(x: String, y: String) = {
      val pr = g.where(col("el") === x).select(col("sv").as("xv"))
        .crossJoin(g.where(col("el") === y).select(col("sv").as("yv")))
        .select(col("xv"), col("yv"), size(col("xv")).as("lx"), size(col("yv")).as("ly"))
      pr.withColumn("dtw", expr(graft.operators.SeriesOps.dtwFoldSpark))
        .head.getAs[Double]("dtw")
    }
    assert(math.abs(dtwOf("a", "b") - dtwOf("b", "a")) < 1e-12)
  }

  test("q290 retrieval metrics are probabilities and MRR >= MAP on each query set") {
    val rows = SparkEntry.queries("q290_mrr_map_eval")(spark, sf).collect()
    assert(rows.length == 5, s"expected 5 query rows, got ${rows.length}")
    rows.foreach { r =>
      for (c <- Seq("rr", "ap10", "mrr", "map10")) {
        val v = r.getAs[Double](c)
        assert(v >= 0 && v <= 1 + 1e-9, s"$c out of [0,1]: $r")
      }
      assert(r.getAs[Long]("hits") <= 10)
      // first-hit reciprocal rank dominates average precision
      assert(r.getAs[Double]("rr") >= r.getAs[Double]("ap10") - 1e-9, s"$r")
    }
  }

  test("q291 streaming conformal refresh equals the batch q286 result exactly") {
    val batch = SparkEntry.queries("q286_conformal_forecast")(spark, sf).collect()
    val stream = SparkEntry.queries("q291_stream_conformal")(spark, sf).collect()
    assert(stream.map(_.toString).toSeq == batch.map(_.toString).toSeq,
      s"streaming != batch:\n${stream.mkString("\n")}\nvs\n${batch.mkString("\n")}")
  }

  test("q292 only positivity-valid strata survive, and all three estimators are bounded effects") {
    val rows = SparkEntry.queries("q292_ipw_ate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Double]("e_hat")
      assert(e > 0 && e < 1, s"positivity-violating stratum leaked: $r")
      for (c <- Seq("ate_strat", "ate_ipw", "ate_naive"))
        assert(math.abs(r.getAs[Double](c)) <= 1.0 + 1e-9, s"$c out of range: $r")
      for (c <- Seq("y1", "y0")) {
        val v = r.getAs[Double](c)
        assert(v >= 0 && v <= 1, s"$c not a rate: $r")
      }
    }
  }

  test("q293 pre-period event-study effects are centered at zero by construction") {
    val rows = SparkEntry.queries("q293_event_study")(spark, sf).collect()
    val pre = rows.filter(r => r.getAs[Int]("rel_day") < 0).map(_.getAs[Double]("effect"))
    assert(pre.nonEmpty)
    // effect = gap - mean(pre gaps), so the pre-period mean is 0 up to rounding
    assert(math.abs(pre.sum / pre.length) <= 1e-4,
      s"pre-period effects not centered: ${pre.mkString(",")}")
  }

  test("Holt-Winters fold kernel: constant series gives level = c, trend = 0, seasonals = 0") {
    val s2 = spark
    import s2.implicits._
    val sv = Seq.fill(21)(3.5)
    val toy = Seq(Tuple1(sv)).toDF("sv").withColumn("lx", size(col("sv")))
    val st = toy.withColumn("st", expr(graft.operators.SeriesOps.hwFoldSpark))
      .select("st").head.getSeq[Double](0)
    assert(math.abs(st.head - 3.5) < 1e-12, s"level: ${st.head}")
    assert(math.abs(st(1)) < 1e-12, s"trend: ${st(1)}")
    st.drop(2).foreach(x => assert(math.abs(x) < 1e-12, s"seasonal: $x"))
  }

  test("q294 emits a 7-day forecast per qualifying element with finite values") {
    val rows = SparkEntry.queries("q294_holt_winters")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length % 7 == 0, s"got ${rows.length} rows")
    rows.foreach { r =>
      for (c <- Seq("level", "trend", "forecast")) {
        val v = r.getAs[Double](c)
        assert(!v.isNaN && !v.isInfinite, s"$c not finite: $r")
      }
    }
  }

  test("q295 ledger admission accounting partitions the batch exactly") {
    val rows = SparkEntry.queries("q295_dedup_ledger")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (in, hits, dupes, adm) = (r.getAs[Long]("n_incoming"),
        r.getAs[Long]("n_ledger_hits"), r.getAs[Long]("n_batch_dupes"),
        r.getAs[Long]("n_admitted"))
      assert(in == hits + dupes + adm, s"partition broken: $r")
      assert(adm <= in)
    }
  }

  test("q296 RAKE phrases are stopword-free, capped at 6 words, positively scored") {
    val stops = Set("a", "the", "of", "and", "to", "in", "is", "on", "for")
    val rows = SparkEntry.queries("q296_rake_keywords")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.length <= 6, s"over-long phrase: $r")
      assert(!words.exists(stops), s"stopword leaked into phrase: $r")
      assert(r.getAs[Double]("score") > 0)
    }
  }

  test("q297 surprisal is positive, finite, and emitted in descending order") {
    val rows = SparkEntry.queries("q297_unigram_surprisal")(spark, sf).collect()
    assert(rows.nonEmpty)
    val xs = rows.map(_.getAs[Double]("xent"))
    xs.foreach(x => assert(x > 0 && !x.isInfinite, s"bad xent $x"))
    assert(xs.sameElements(xs.sorted.reverse), "not sorted by surprisal desc")
  }

  test("q298 int8 quantization: tiny reconstruction error and a valid recall fraction") {
    val r = SparkEntry.queries("q298_int8_quant")(spark, sf).head
    assert(r.getAs[Long]("n_vecs") > 0)
    val mse = r.getAs[Double]("avg_mse")
    // per-dim error is at most (range/255)/2, so MSE << 1e-3 on unit-ish floats
    assert(mse >= 0 && mse < 1e-3, s"mse $mse")
    val rec = r.getAs[Double]("recall10")
    assert(rec >= 0 && rec <= 1)
  }

  test("q299 KMV degrades to the exact set below k: rel_err = 0 at sf0.001") {
    val rows = SparkEntry.queries("q299_kmv_theta")(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("truth") < 64,
        "precondition: sf0.001 audiences must be below k for this pin")
      assert(r.getAs[Double]("rel_err") == 0.0, s"below-k sketch not exact: $r")
      assert(r.getAs[Double]("est") > 0)
    }
  }

  test("q300 VAR(2) Granger: nested-model monotonicity holds on every screened pair") {
    val rows = SparkEntry.queries("q300_var2_granger")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (r2r, r2u) = (r.getAs[Double]("ar2_r2"), r.getAs[Double]("var2_r2"))
      // adding regressors to an exactly-solved OLS can only shrink SSE
      assert(r2u >= r2r - 1e-9, s"unrestricted fit worse than restricted: $r")
      assert(r2r <= 1 + 1e-9 && r2u <= 1 + 1e-9, s"$r")
      val f = r.getAs[java.lang.Double]("fstat")
      if (f != null) assert(f >= -1e-9, s"negative F: $r")
      assert(r.getAs[Long]("n_days") >= 8)
    }
  }

  test("q301 negatives are drawn from the corpus vocabulary, deterministically per pair") {
    val rows = SparkEntry.queries("q301_skipgram_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val vocab = Tables.documents(spark, sf)
      .select(explode(graft.functions.Text.wordsCol(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(vocab(r.getAs[String]("neg1")) && vocab(r.getAs[String]("neg2")),
        s"negative outside vocab: $r")
      assert(r.getAs[Long]("n_pos") >= 1)
    }
    // rerun: identical negatives (no RNG anywhere)
    val again = SparkEntry.queries("q301_skipgram_pairs")(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("q302 SRM guardrail: the healthy split passes, the broken hash%3 split flags") {
    // sf0.01: with only the 15 users of sf0.001, even a fair hash can
    // (and does) land 3/12 — the guardrail CORRECTLY flags it, so the
    // pass/flag contrast needs the 150-user table
    val rows = SparkEntry.queries("q302_srm_check")(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getAs[String]("salt") ->
        (r.getAs[Long]("na"), r.getAs[Long]("nb"), r.getAs[Int]("srm_flag"))).toMap
    val (na, nb, okFlag) = rows(":ab1")
    assert(okFlag == 0, s"healthy 50/50 assignment flagged: $na vs $nb")
    val (_, _, badFlag) = rows(":bad")
    assert(badFlag == 1, "broken 1/3-2/3 assignment not flagged")
  }

  test("q303 bootstrap CI is ordered, bounded, and rerun-identical (no RNG)") {
    val r = SparkEntry.queries("q303_bootstrap_ci")(spark, sf).head
    val (lo, hi, hat) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
      r.getAs[Double]("lift_hat"))
    assert(lo <= hi, s"inverted CI: $r")
    assert(math.abs(hat) <= 1 && math.abs(lo) <= 1 && math.abs(hi) <= 1, s"$r")
    assert(r.getAs[Int]("n_replicates") == 200)
    val again = SparkEntry.queries("q303_bootstrap_ci")(spark, sf).head
    assert(r.toString == again.toString, "bootstrap not deterministic")
  }

  test("q304 quantile effects satisfy qte = q_a - q_b on every decile") {
    val rows = SparkEntry.queries("q304_quantile_effects")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("p")).toSeq == (1 to 9))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("qte") -
        (r.getAs[Double]("q_a") - r.getAs[Double]("q_b"))) <= 2e-6, s"$r")
    }
    // per-arm deciles are monotone in p
    val qa = rows.map(_.getAs[Double]("q_a"))
    assert(qa.zip(qa.tail).forall { case (x, y) => x <= y + 1e-9 })
  }

  test("q305 MDE is positive and internally consistent with the pooled rate") {
    val r = SparkEntry.queries("q305_power_mde")(spark, sf).head
    val (p, mabs, mrel) = (r.getAs[Double]("pooled_rate"),
      r.getAs[Double]("mde_abs"), r.getAs[Double]("mde_rel"))
    assert(mabs > 0 && p > 0 && p < 1, s"$r")
    assert(math.abs(mrel - mabs / p) <= 1e-4, s"rel/abs inconsistent: $r")
    assert(r.getAs[Long]("na") + r.getAs[Long]("nb") > 0)
  }

  test("q289 restores every conf it touches and still returns the plain-join result") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => spark.conf.getOption(k))
    val n = SparkEntry.queries("q289_bloom_join")(spark, sf).count()
    assert(n > 0)
    val after = keys.map(k => spark.conf.getOption(k))
    assert(before == after, s"confs leaked: $before -> $after")
  }
}
