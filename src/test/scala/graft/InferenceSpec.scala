package graft

import graft.operators.InferenceOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the statistical invariants of the round-8 inference layer:
  * chi-square is a nonnegative quadratic form with the advertised
  * degrees of freedom and a [0,1] effect size; the Mann-Whitney U from
  * the histogram identity stays inside its exact [0, n_a·n_b] range;
  * the KS statistic is a bounded sup-norm of two ECDFs. The oracle pins
  * the values; these pin why they are the claimed statistics.
  */
class InferenceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  private def byName(n: String) = InferenceOps.defs.find(_.name == n).get.fn

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("inference-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q272 chi-square: nonnegative statistic, (r-1)(c-1) dof, Cramer's V in [0,1]") {
    val r = byName("q272_chi2_independence")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Double]("chi2") >= 0.0)
    assert(row.getAs[Int]("dof") ==
      (row.getAs[Int]("n_types") - 1) * (row.getAs[Int]("n_dows") - 1))
    val v = row.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0 + 1e-9, s"V out of [0,1]: $row")
  }

  test("q273 Mann-Whitney: U inside [0, na*nb], sample sizes match the raw counts") {
    val rows = byName("q273_mann_whitney")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totals = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(na == totals(r.getString(0)) && nb == totals(r.getString(1)),
        s"histogram sample sizes diverge from raw counts: $r")
      val u = r.getAs[Double]("u_stat")
      assert(u >= -1e-9 && u <= na.toDouble * nb + 1e-9, s"U out of range: $r")
      assert(!r.isNullAt(r.fieldIndex("z_score")))
    }
  }

  test("q274 KS: statistic is a [0,1] sup-norm over every unordered pair") {
    val rows = byName("q274_ks_test")(spark, sf).collect()
    val p = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == p * (p - 1) / 2, s"expected all unordered pairs")
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks_stat")
      assert(ks >= 0.0 && ks <= 1.0 + 1e-9, s"$r")
      assert(r.getString(0) < r.getString(1), s"pair not canonical: $r")
    }
  }

  test("pairwise grids fail loudly past the element ceiling") {
    assert(InferenceOps.MaxInferenceElements == 64L)
  }

  test("q275 CUPED: arms partition the users and pooled-theta adjustment cannot increase variance") {
    val r = byName("q275_cuped")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_treat") + row.getAs[Long]("n_ctrl") ==
      row.getAs[Long]("n_users"))
    assert(row.getAs[Long]("n_treat") > 0 && row.getAs[Long]("n_ctrl") > 0,
      "hash arms must both be populated")
    val vr = row.getAs[Double]("var_reduction")
    // with theta fit on the same sample, var(Y') = var(Y)(1 - rho^2)
    assert(vr >= -1e-6 && vr <= 1.0 + 1e-9, s"variance reduction out of [0,1]: $row")
  }

  test("q277 Kaplan-Meier: survival is monotone nonincreasing from 1, risk sets shrink") {
    val rows = byName("q277_survival_km")(spark, sf).collect()
    assert(rows.nonEmpty)
    var lastS = 1.0 + 1e-9
    var lastRisk = Long.MaxValue
    var lastT = Long.MinValue
    rows.foreach { r =>
      val t = r.getAs[Int]("duration_days").toLong
      assert(t > lastT, s"curve not time-ordered: $r"); lastT = t
      val sv = r.getAs[Double]("survival")
      assert(sv >= -1e-12 && sv <= lastS, s"survival not monotone in [0,1]: $r")
      lastS = sv
      val risk = r.getAs[Long]("n_risk")
      assert(risk <= lastRisk && risk >= r.getAs[Long]("n_events"),
        s"risk set must shrink and cover the events: $r")
      lastRisk = risk
    }
  }

  test("q278 log-rank: chi2 nonnegative, observed within the treatment total, expectation positive") {
    val r = byName("q278_logrank_test")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_treat") > 0 && row.getAs[Long]("n_ctrl") > 0)
    val o = row.getAs[Long]("o_treat")
    assert(o >= 0 && o <= row.getAs[Long]("n_treat"), s"$row")
    assert(row.getAs[Double]("e_treat") > 0, s"$row")
    assert(row.getAs[Double]("logrank_chi2") >= 0, s"$row")
  }

  test("q279 histogram quantiles: estimates bracket inside the data range with bounded bin error") {
    val rows = byName("q279_histogram_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length % 3 == 0, "three quantiles per element")
    val (lo, hi) = {
      val r = Tables.events(spark, sf)
        .agg(org.apache.spark.sql.functions.min("value"),
          org.apache.spark.sql.functions.max("value")).head
      (r.getDouble(0), r.getDouble(1))
    }
    val binW = (hi - lo) / 64
    rows.foreach { r =>
      val approx = r.getAs[Double]("approx")
      assert(approx >= lo - 1e-9 && approx <= hi + 1e-9, s"estimate off-range: $r")
      // abs_err is self-consistent with the emitted estimate/exact pair
      assert(math.abs(r.getAs[Double]("abs_err") -
        math.abs(approx - r.getAs[Double]("exact"))) <= 2e-6, s"$r")
      // in the DENSE region the fixed-width histogram is bin-accurate;
      // tails are not bins-relative (sparse-tail p99 measured up to
      // 10.4 binW on this fixture — the documented fixed-width sketch
      // trade-off the abs_err column exists to expose)
      if (r.getAs[Double]("q") == 0.5)
        assert(r.getAs[Double]("abs_err") <= binW + 1e-9,
          s"median error exceeds one bin width ($binW): $r")
    }
    // quantile estimates are monotone in q within each element
    rows.groupBy(_.getString(0)).foreach { case (el, rs) =>
      val byQ = rs.sortBy(_.getAs[Double]("q")).map(_.getAs[Double]("approx"))
      assert(byQ.zip(byQ.tail).forall { case (a, b) => a <= b + 1e-9 },
        s"$el: quantile estimates not monotone in q")
    }
  }

  test("q276 DiD estimate equals the recomputed cell-mean contrast") {
    val r = byName("q276_diff_in_diff")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val expect = (row.getAs[Double]("mean_t_post") - row.getAs[Double]("mean_t_pre")) -
      (row.getAs[Double]("mean_c_post") - row.getAs[Double]("mean_c_pre"))
    assert(math.abs(row.getAs[Double]("did") - expect) <= 4e-6,
      s"did != cell-mean contrast: $row (expected ~$expect)")
    assert(row.getAs[Long]("n_treat") > 0 && row.getAs[Long]("n_ctrl") > 0)
  }
}
