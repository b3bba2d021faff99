package graft

import graft.operators.CausalOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the mathematical invariants of the q229/q230 causality pair:
  * a correlogram entry is a correlation (|xcorr| ≤ 1, and lag 0 is
  * symmetric — corr(a,b) = corr(b,a) on the identical aligned grid),
  * and the Granger gain is a nested-model variance reduction (adding a
  * regressor to the exactly-solved OLS can only shrink SSE, so
  * gain ∈ [0,1], and ar1_r2 ≤ 1). The oracle pins the values; these
  * pin why the values are shaped like causality evidence.
  */
class CausalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  private def byName(n: String) = CausalOps.defs.find(_.name == n).get.fn

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("causal-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q229 correlogram entries are correlations: |xcorr| <= 1 over all 20 pairs x 4 lags") {
    val rows = byName("q229_lead_lag_corr")(spark, sf).collect()
    assert(rows.length == 80, s"expected 20 directed pairs x 4 lags, got ${rows.length}")
    rows.foreach { r =>
      val c = r.getAs[java.lang.Double]("xcorr")
      assert(c != null && math.abs(c) <= 1.0 + 1e-9, s"$r")
      assert(r.getAs[Long]("n_days") >= 2)
    }
  }

  test("q229 lag-0 cross-correlation is symmetric in the pair") {
    val m = byName("q229_lead_lag_corr")(spark, sf)
      .where("lag = 0").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("xcorr")).toMap
    m.foreach { case ((a, b), c) =>
      assert(math.abs(m((b, a)) - c) <= 1e-6, s"asym at ($a,$b): $c vs ${m((b, a))}")
    }
  }

  test("q230 granger gain is a nested-model variance reduction: 0 <= gain <= 1, ar1_r2 <= 1") {
    val rows = byName("q230_granger_lite")(spark, sf).collect()
    assert(rows.length == 20, s"expected 20 directed pairs, got ${rows.length}")
    rows.foreach { r =>
      val gain = r.getAs[java.lang.Double]("granger_gain")
      val r2 = r.getAs[java.lang.Double]("ar1_r2")
      assert(gain != null && gain >= -1e-9 && gain <= 1.0 + 1e-9, s"$r")
      assert(r2 != null && r2 <= 1.0 + 1e-9, s"$r")
    }
  }

  test("q233 finds one changepoint per element, inside the observed day range") {
    import org.apache.spark.sql.functions._
    val rows = byName("q233_cusum_changepoint")(spark, sf).collect()
    assert(rows.length == 5, s"one row per event_type, got ${rows.length}")
    val Array(lo, hi) = Tables.events(spark, sf)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
      .agg(min("di"), max("di")).collect()(0).toSeq.map(_.asInstanceOf[Int]).toArray
    rows.foreach { r =>
      assert(r.getAs[Double]("cusum_max") >= 0.0)
      val cp = r.getAs[Int]("cp_di")
      // argmax|S| over a zero-sum walk is never the final point unless T=1
      assert(cp >= lo && cp < hi, s"changepoint $cp outside [$lo,$hi)")
      assert(r.getAs[java.lang.Double]("mean_shift") != null)
    }
  }

  test("q246 mutual information is a KL divergence: mi >= 0 and 0 <= nmi <= 1 over all 10 pairs") {
    val rows = byName("q246_mutual_information")(spark, sf).collect()
    assert(rows.length == 10, s"expected 10 unordered pairs, got ${rows.length}")
    rows.foreach { r =>
      val mi = r.getAs[java.lang.Double]("mi")
      val nmi = r.getAs[java.lang.Double]("nmi")
      assert(mi != null && mi >= -1e-9, s"$r")
      assert(nmi != null && nmi >= -1e-9 && nmi <= 1.0 + 1e-9, s"$r")
      // 4x4 quartile grid: at most 16 joint cells, at least 4 occupied
      val cells = r.getAs[Long]("n_cells")
      assert(cells >= 4 && cells <= 16, s"$r")
    }
  }

  test("q247 transfer entropy is a conditional KL: te >= 0, and the pair set is directed") {
    val rows = byName("q247_transfer_entropy")(spark, sf).collect()
    assert(rows.length == 20, s"expected 20 directed pairs, got ${rows.length}")
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSet
    keys.foreach { case (a, b) => assert(keys((b, a)), s"missing reverse of ($a,$b)") }
    rows.foreach { r =>
      val te = r.getAs[java.lang.Double]("te")
      assert(te != null && te >= -1e-9, s"$r")
      assert(r.getAs[Long]("n_trans") >= 2)
    }
  }

  test("q248 partial correlation stays a correlation (|r| <= 1) and drops toward 0 vs raw on market-driven pairs") {
    val rows = byName("q248_partial_corr")(spark, sf).collect()
    assert(rows.length == 10, s"expected 10 unordered pairs, got ${rows.length}")
    rows.foreach { r =>
      val raw = r.getAs[java.lang.Double]("r_raw")
      val part = r.getAs[java.lang.Double]("r_partial")
      val drop = r.getAs[java.lang.Double]("confound_drop")
      assert(raw != null && math.abs(raw) <= 1.0 + 1e-9, s"$r")
      assert(part != null && math.abs(part) <= 1.0 + 1e-9, s"$r")
      assert(drop != null && math.abs(raw - part - drop) <= 2e-6, s"$r")
    }
  }

  test("q251 screen prunes: survivors are a strict non-empty subset and keep every pair above tau") {
    val surv = byName("q251_causal_screen")(spark, sf).collect()
    val all = byName("q248_partial_corr")(spark, sf).collect() // all 10 unordered pairs
    assert(surv.nonEmpty && surv.length < all.length,
      s"screen should drop some of ${all.length} pairs, kept ${surv.length}")
    // every pair whose |lag-0 r| >= tau must survive via by_tau
    surv.foreach { r =>
      val r0 = r.getAs[Double]("r0")
      val byTau = r.getAs[Int]("by_tau")
      assert((math.abs(r0) >= operators.CausalOps.ScreenTau - 1e-9) == (byTau == 1), s"$r")
      assert(byTau == 1 || r.getAs[Int]("by_topm") == 1, s"survivor without reason: $r")
    }
  }

  test("q252 pruned MI equals full q246 bit-for-bit on surviving pairs, and covers exactly them") {
    val surv = byName("q251_causal_screen")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val full = byName("q246_mutual_information")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    val pruned = byName("q252_mi_pruned")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    assert(pruned.keySet == surv, s"pruned pair set ${pruned.keySet} != screen $surv")
    pruned.foreach { case (k, v) =>
      assert(full(k) == v, s"pruned row differs from full at $k: $v vs ${full(k)}")
    }
  }

  test("q253 pruned TE equals full q247 on both orientations of each surviving pair") {
    val surv = byName("q251_causal_screen")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = surv ++ surv.map { case (a, b) => (b, a) }
    val full = byName("q247_transfer_entropy")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    val pruned = byName("q253_te_pruned")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    assert(pruned.keySet == expected, s"pruned TE pair set != both orientations of screen")
    pruned.foreach { case (k, v) =>
      assert(full(k) == v, s"pruned TE differs from full at $k: $v vs ${full(k)}")
    }
  }

  test("q259 skeleton: PC order-1 pruning fires on the fixture and orientation matches the lead gap") {
    val rows = byName("q259_causal_skeleton")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("r_raw")) >= operators.CausalOps.ScreenTau - 1e-9, s"$r")
      val edge = r.getAs[Int]("edge")
      val minp = r.getAs[Double]("min_abs_partial")
      assert((edge == 1) == (minp >= operators.CausalOps.ScreenTau), s"$r")
      val gap = r.getAs[Double]("lead_gap")
      val orient = r.getAs[String]("orient")
      assert(if (gap > 0) orient == "->" else if (gap < 0) orient == "<-" else orient == "~", s"$r")
    }
    // the fixture has a genuinely explained-away pair: error—purchase's
    // correlation vanishes once click is controlled for (measured)
    val pruned = rows.filter(_.getAs[Int]("edge") == 0)
    assert(pruned.nonEmpty, "expected at least one conditioning-pruned edge on the fixture")
    assert(pruned.exists(r => r.getString(0) == "error" && r.getString(1) == "purchase"
      && r.getAs[String]("blocker") == "click"), s"unexpected pruned set: ${pruned.toSeq}")
  }

  test("q260 banded LSH screen prunes deterministically and agrees bit-for-bit with the full screen") {
    // sf0.01 is where the sketch genuinely prunes (all 10 pairs collide
    // at sf0.001); everything is deterministic, so the measured
    // candidate set and recall are exact fixture facts, not thresholds
    val sf01 = "/root/testdata/sf0.01"
    val cands = byName("q260_causal_lsh_screen")(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("r0")).toMap
    val full = byName("q251_causal_screen")(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("r0")).toMap
    assert(cands.nonEmpty && cands.size < 10,
      s"expected band-bucket pruning at sf0.01, got ${cands.size} of 10 pairs")
    // candidate correlations equal the full screen's exactly where both exist
    cands.foreach { case (k, r) =>
      full.get(k).foreach(fr => assert(fr == r, s"$k: lsh $r vs full $fr"))
    }
    // measured recall of the full-screen survivor set (5 of 8 on this
    // fixture's weak correlations — the documented OR-construction curve)
    val hit = full.keySet.count(cands.contains)
    assert(hit * 2 >= full.size,
      s"candidate recall $hit/${full.size} fell below the measured floor")
  }

  test("full-enumeration paths fail loudly past the element-cardinality guard") {
    val s = spark
    import s.implicits._
    val big = (0 until 3000).map(i => (s"el$i", 0, 1.0)).toDF("el", "di", "v")
    val e = intercept[IllegalStateException] {
      operators.CausalOps.guardFullEnum(big, "q247_transfer_entropy")
    }
    assert(e.getMessage.contains("q253_te_pruned"), e.getMessage)
    assert(e.getMessage.contains("P=3000"), e.getMessage)
  }

  test("q263 periodogram: power is nonnegative at every candidate period, all P x 3 rows present") {
    val rows = byName("q263_periodogram")(spark, sf).collect()
    val els = rows.map(_.getString(0)).distinct
    assert(rows.length == els.length * 3,
      s"expected ${els.length} elements x 3 periods, got ${rows.length}")
    rows.foreach { r =>
      assert(Set(7, 14, 30).contains(r.getAs[Int]("period")), s"$r")
      assert(r.getAs[Double]("power") >= 0.0, s"negative spectral power: $r")
      assert(r.getAs[Long]("n_days") >= 2)
    }
  }

  test("q264 seasonal decomposition: dow means are a least-squares fit, so strength is in [0,1]") {
    val rows = byName("q264_seasonal_decompose")(spark, sf).collect()
    rows.foreach { r =>
      val dow = r.getAs[Int]("dow")
      assert(dow >= 0 && dow <= 6, s"$r")
      val strength = r.getAs[Double]("seasonal_strength")
      // subtracting per-group means can only shrink SSE (LS projection),
      // so 1 - SS_resid/SS_detrended is a true R^2
      assert(strength >= -1e-9 && strength <= 1.0 + 1e-9,
        s"seasonal strength outside [0,1]: $r")
    }
    // every element covers all 7 days-of-week on the ~100-day fixture grid
    rows.groupBy(_.getString(0)).foreach { case (el, rs) =>
      assert(rs.map(_.getAs[Int]("dow")).toSet.size == 7, s"$el missing a dow")
    }
  }

  test("q266 ACF: lag 0 is exactly 1, every entry is a correlation, 8 lags per element") {
    val rows = byName("q266_acf")(spark, sf).collect()
    val els = rows.map(_.getString(0)).distinct
    assert(rows.length == els.length * 8,
      s"expected ${els.length} elements x 8 lags, got ${rows.length}")
    rows.foreach { r =>
      val acf = r.getAs[java.lang.Double]("acf")
      assert(acf != null && math.abs(acf) <= 1.0 + 1e-9, s"$r")
      if (r.getAs[Int]("lag") == 0)
        assert(math.abs(acf - 1.0) <= 1e-6, s"acf(0) must be 1: $r")
    }
  }

  test("q268 anomaly summary: counts bounded by days, worst score consistent with the flag") {
    val rows = byName("q268_stl_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      val k = r.getAs[Long]("n_anomalies")
      assert(k >= 0 && k <= n, s"$r")
      val worst = r.getAs[Double]("worst_score")
      // if any day was flagged, the worst |MAD-z| must itself exceed 3
      if (k > 0) assert(math.abs(worst) > 3.0 - 1e-9, s"$r")
    }
  }

  test("q269 backtest: error metrics are nonnegative, sMAPE <= 2, MASE is the advertised ratio") {
    val rows = byName("q269_forecast_backtest")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, ms) = (r.getAs[Double]("mae_naive"), r.getAs[Double]("mae_snaive"))
      assert(mn >= 0 && ms >= 0, s"$r")
      val smape = r.getAs[Double]("smape")
      assert(smape >= 0 && smape <= 2.0 + 1e-9, s"sMAPE out of [0,2]: $r")
      if (mn > 0)
        assert(math.abs(r.getAs[Double]("mase") - ms / mn) <= 2e-6,
          s"mase != mae_snaive/mae_naive: $r")
      assert(r.getAs[Long]("n_eval") >= 1)
    }
  }

  test("q265 BH discoveries are exactly the p-rank prefix and honor the step-up bound") {
    val rows = byName("q265_causal_fdr")(spark, sf).collect()
    assert(rows.nonEmpty)
    val m = rows.length
    rows.foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p >= -1e-12 && p <= 1.0 + 1e-9, s"p outside [0,1]: $r")
    }
    val k = rows.count(_.getAs[Int]("discovery") == 1)
    // discoveries are exactly ranks 1..k (a prefix of the p-ascending order)
    rows.foreach { r =>
      val expect = if (r.getAs[Int]("p_rank") <= k) 1 else 0
      assert(r.getAs[Int]("discovery") == expect, s"non-prefix discovery set: $r")
    }
    if (k > 0) {
      // the step-up criterion held at k: p_(k) <= alpha * k / m
      val pk = rows.find(_.getAs[Int]("p_rank") == k).get.getAs[Double]("p_value")
      assert(pk <= 0.1 * k / m + 1e-12, s"BH bound violated at k=$k: p=$pk")
    }
  }
}
