package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 time-series structure operators on the shared causal
  * (element, day) grid: the Theil–Sen robust trend estimator and the
  * partial autocorrelation function (Durbin–Levinson to lag 3 — the
  * companion of q266's ACF that separates direct lag-k memory from
  * carried-over lag-1 memory). Both run entirely on the PlanCache'd
  * O(P·T) grid: day count T is calendar-bounded at any data volume, so
  * the per-element O(T²) slope enumeration is a constant-factor compute
  * step after the one fact-table reduction, embarrassingly parallel in
  * the element key.
  */
object SeriesOps {
  private def r6(c: Column) = round(c, 6)
  import CausalOps.{daily, dailySql, dsum}

  /** The banded-DTW dynamic program as a LINEAR fold over the row-major
    * cell index k = i·ly + j, carrying only the last ly+1 DP values —
    * O(ly) state instead of the O(lx·ly) matrix, which is what lets the
    * whole recursion run as one constant-size kernel expression per
    * pair (the q284 fold-kernel pattern; no UDF, no driver loop). The
    * recurrence uses only abs/+/least, so both engines produce
    * bit-identical doubles from the same recursion — no decimal
    * accumulation needed. Cells outside the Sakoe-Chiba band |i−j| >
    * 3+|lx−ly| cost 1e18, which min-propagation never selects while a
    * feasible path exists.
    */
  private val Inf = "cast(1e18 as double)"

  /** Spark-dialect fold: xv/yv/lx/ly are outer columns in scope. */
  private[graft] val dtwFoldSpark: String = {
    val i = "(k div ly)"
    val j = "(k % ly)"
    s"""element_at(aggregate(sequence(0, lx * ly - 1),
       |  cast(array() as array<double>),
       |  (acc, k) -> slice(
       |    concat(acc, array(
       |      (CASE WHEN abs($i - $j) > 3 + abs(lx - ly) THEN $Inf
       |            ELSE abs(element_at(xv, cast($i + 1 as int))
       |                     - element_at(yv, cast($j + 1 as int))) END)
       |      + (CASE WHEN k = 0 THEN cast(0.0 as double) ELSE least(
       |          CASE WHEN $j > 0 THEN element_at(acc, size(acc)) ELSE $Inf END,
       |          CASE WHEN $i > 0 THEN element_at(acc, size(acc) - ly + 1) ELSE $Inf END,
       |          CASE WHEN $i > 0 AND $j > 0 THEN element_at(acc, size(acc) - ly) ELSE $Inf END) END)
       |    )),
       |    greatest(1, size(acc) + 1 - ly), ly + 1)), -1)""".stripMargin
  }

  /** q294's Holt-Winters fold (Spark dialect): 9-value state
    * [l, b, s0..s6] over series positions 7..lx-1; binary-fraction
    * coefficients keep every product exact-representable. sv/lx are
    * outer columns. Exposed for the Round9Spec constant-series toy. */
  private[graft] val hwFoldSpark: String = {
    val init = "array(" +
      ("(" + (1 to 7).map(i => s"element_at(sv, $i)").mkString(" + ") + ") / 7") +
      ", cast(0.0 as double), " + (1 to 7).map(i =>
        s"element_at(sv, $i) - (${(1 to 7).map(j => s"element_at(sv, $j)").mkString(" + ")}) / 7")
        .mkString(", ") + ")"
    val y = "element_at(sv, cast(k + 1 as int))"
    val m = "(k % 7)"
    val lnew = s"0.5 * ($y - element_at(acc, cast(3 + $m as int))) + 0.5 * (element_at(acc, 1) + element_at(acc, 2))"
    val bnew = s"0.25 * (($lnew) - element_at(acc, 1)) + 0.75 * element_at(acc, 2)"
    val snew = s"0.25 * ($y - ($lnew)) + 0.75 * element_at(acc, cast(3 + $m as int))"
    val accNew = s"array($lnew, $bnew, " + (0 to 6).map(j =>
      s"CASE WHEN $m = $j THEN $snew ELSE element_at(acc, ${3 + j}) END").mkString(", ") + ")"
    s"aggregate(sequence(7, lx - 1), $init, (acc, k) -> $accNew)"
  }

  /** DuckDB-dialect fold: same recurrence; 1.0's two-arg reduce takes
    * the init accumulator as the list head, and list_slice is
    * begin:end. */
  private[operators] val dtwFoldDuck: String = {
    val k = "CAST(xk[1] AS BIGINT)"
    val i = s"($k // ly)"
    val j = s"($k % ly)"
    val inf = "CAST(1e18 AS DOUBLE)"
    s"""list_reduce(
       |    [[]::DOUBLE[]] || [[CAST(kk AS DOUBLE)] FOR kk IN range(0, lx * ly)],
       |    (acc, xk) -> list_slice(
       |      acc || [
       |        (CASE WHEN abs($i - $j) > 3 + abs(lx - ly) THEN $inf
       |              ELSE abs(xv[$i + 1] - yv[$j + 1]) END)
       |        + (CASE WHEN $k = 0 THEN 0.0 ELSE least(
       |            CASE WHEN $j > 0 THEN acc[len(acc)] ELSE $inf END,
       |            CASE WHEN $i > 0 THEN acc[len(acc) - ly + 1] ELSE $inf END,
       |            CASE WHEN $i > 0 AND $j > 0 THEN acc[len(acc) - ly] ELSE $inf END) END)
       |      ],
       |      greatest(1, len(acc) + 2 - (ly + 1)), len(acc) + 1))[-1]""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    /** Theil–Sen trend per element: the MEDIAN of all pairwise slopes
      * (v_j − v_i)/(di_j − di_i), i < j — the classic 29%-breakdown
      * robust alternative to the OLS slope that one spiky day would
      * drag (exactly the contamination q268 flags). The intercept is
      * the median of (v − slope·di). Slopes are deterministic doubles;
      * the two medians are exact interpolated percentiles (the
      * q179/q268 parity idiom). Scale: pairs are per-element and
      * O(T²) with T calendar-bounded (~hundreds), so the pair join is
      * grid-local compute, never a fact-table self-join; one shuffle
      * on `el` no matter the raw volume.
      */
    QueryDef(
      "q282_theilsen_trend",
      s"""WITH $dailySql,
        |sl AS (
        |  SELECT a.el, (b.v - a.v) / (b.di - a.di) AS slope
        |  FROM daily a JOIN daily b ON b.el = a.el AND b.di > a.di),
        |se AS (
        |  SELECT el, count(*) AS n_pairs, median(slope) AS slope
        |  FROM sl GROUP BY 1),
        |ic AS (
        |  SELECT d.el, count(*) AS n_days,
        |    median(d.v - se.slope * d.di) AS intercept, max(se.slope) AS slope,
        |    max(se.n_pairs) AS n_pairs
        |  FROM daily d JOIN se ON se.el = d.el GROUP BY 1)
        |SELECT el, CAST(n_days AS BIGINT) AS n_days,
        |  CAST(n_pairs AS BIGINT) AS n_pairs,
        |  round(slope, 6) AS slope, round(intercept, 6) AS intercept
        |FROM ic ORDER BY el""".stripMargin) { (s, d) =>
      val g = daily(s, d)
      val a = g.select(col("el"), col("di"), col("v"))
      val b = g.select(col("el").as("elb"), col("di").as("dib"), col("v").as("vb"))
      val sl = a.join(b, col("elb") === col("el") && col("dib") > col("di"))
        .select(col("el"), ((col("vb") - col("v")) / (col("dib") - col("di"))).as("slope"))
      val se = sl.groupBy(col("el").as("sel"))
        .agg(count(lit(1)).as("n_pairs"), expr("percentile(slope, 0.5)").as("slope"))
      g.join(broadcast(se), col("sel") === col("el"))
        .groupBy("el")
        .agg(count(lit(1)).as("n_days"),
          expr("percentile(v - slope * di, 0.5)").as("intercept"),
          max(col("slope")).as("slope"), max(col("n_pairs")).as("n_pairs"))
        .select(col("el"), col("n_days"), col("n_pairs"),
          r6(col("slope")).as("slope"), r6(col("intercept")).as("intercept"))
        .orderBy("el")
    },

    /** Partial autocorrelation to lag 3 via Durbin–Levinson: the
      * classical sample ACF r_k = Σ(d_t·d_{t+k}) / Σd_t² (global-mean
      * deviations — a true autocovariance sequence, unlike q266's
      * per-overlap Pearson, which is the right input for the DL
      * recursion), then the closed-form unroll
      * φ11 = r1; φ22 = (r2 − r1²)/(1 − r1²);
      * φ33 = (r3 − φ21·r2 − φ22·r1)/(1 − φ21·r1 − φ22·r2).
      * PACF answers "does day t−k matter DIRECTLY once t−1..t−(k−1)
      * are accounted for" — the single-series analogue of q248's
      * partial correlation. All sums decimal-exact on the grid; the
      * final recursion is identical scalar IEEE arithmetic in both
      * engines over O(P) rows.
      */
    QueryDef(
      "q283_pacf",
      s"""WITH $dailySql,
        |m AS (
        |  SELECT el, CAST(sum(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS vb
        |  FROM daily GROUP BY 1),
        |dv AS (
        |  SELECT d.el, d.di, d.v - m.vb AS dev
        |  FROM daily d JOIN m ON m.el = d.el),
        |c0 AS (
        |  SELECT el, count(*) AS n_days,
        |    CAST(sum(CAST(dev * dev AS DECIMAL(38,12))) AS DOUBLE) AS c0
        |  FROM dv GROUP BY 1),
        |ck AS (
        |  SELECT a.el, l.k,
        |    CAST(sum(CAST(a.dev * b.dev AS DECIMAL(38,12))) AS DOUBLE) AS ck
        |  FROM dv a
        |  CROSS JOIN (VALUES (1), (2), (3)) l(k)
        |  JOIN dv b ON b.el = a.el AND b.di = a.di + l.k
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT c0.el, max(c0.n_days) AS n_days,
        |    max(CASE WHEN k = 1 THEN ck / c0 END) AS r1,
        |    max(CASE WHEN k = 2 THEN ck / c0 END) AS r2,
        |    max(CASE WHEN k = 3 THEN ck / c0 END) AS r3
        |  FROM ck JOIN c0 ON ck.el = c0.el GROUP BY 1),
        |dl AS (
        |  SELECT el, n_days, r1, r2, r3,
        |    (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
        |  FROM r),
        |dl2 AS (
        |  SELECT el, n_days, r1, r2, r3, phi22,
        |    r1 - phi22 * r1 AS phi21
        |  FROM dl)
        |SELECT el, CAST(n_days AS BIGINT) AS n_days,
        |  round(r1, 6) AS pacf1,
        |  round(phi22, 6) AS pacf2,
        |  round((r3 - phi21 * r2 - phi22 * r1)
        |    / (1 - phi21 * r1 - phi22 * r2), 6) AS pacf3,
        |  round(r2, 6) AS acf2, round(r3, 6) AS acf3
        |FROM dl2 ORDER BY el""".stripMargin) { (s, d) =>
      val g = daily(s, d)
      val m = g.groupBy(col("el").as("mel"))
        .agg((dsum(col("v")) / count(lit(1))).as("vb"))
      val dv = g.join(broadcast(m), col("mel") === col("el"))
        .select(col("el"), col("di"), (col("v") - col("vb")).as("dev"))
      val c0 = dv.groupBy(col("el").as("cel"))
        .agg(count(lit(1)).as("n_days"), dsum(col("dev") * col("dev")).as("c0"))
      import s.implicits._
      val lags = Seq(1, 2, 3).toDF("k")
      val b = dv.select(col("el").as("elb"), col("di").as("dib"), col("dev").as("devb"))
      val ck = dv.crossJoin(broadcast(lags))
        .join(b, col("elb") === col("el") && col("dib") === col("di") + col("k"))
        .groupBy("el", "k")
        .agg(dsum(col("dev") * col("devb")).as("ck"))
      val r = ck.join(broadcast(c0), col("cel") === col("el"))
        .groupBy("el")
        .agg(max(col("n_days")).as("n_days"),
          max(when(col("k") === 1, col("ck") / col("c0"))).as("r1"),
          max(when(col("k") === 2, col("ck") / col("c0"))).as("r2"),
          max(when(col("k") === 3, col("ck") / col("c0"))).as("r3"))
      val dl = r.withColumn("phi22",
        (col("r2") - col("r1") * col("r1")) / (lit(1) - col("r1") * col("r1")))
      val dl2 = dl.withColumn("phi21", col("r1") - col("phi22") * col("r1"))
      dl2.select(col("el"), col("n_days"),
          r6(col("r1")).as("pacf1"),
          r6(col("phi22")).as("pacf2"),
          r6((col("r3") - col("phi21") * col("r2") - col("phi22") * col("r1")) /
            (lit(1) - col("phi21") * col("r1") - col("phi22") * col("r2"))).as("pacf3"),
          r6(col("r2")).as("acf2"), r6(col("r3")).as("acf3"))
        .orderBy("el")
    },

    /** Banded dynamic-time-warping distance between element series, for
      * the pairs surviving the q251 causal screen — lag-tolerant shape
      * similarity where plain correlation (which the screen itself
      * uses) demands day-exact alignment. Series assemble per element
      * (sorted (di, v) collect — O(T) state, T calendar-bounded); each
      * surviving pair runs the [[dtwFoldSpark]] linear-state fold:
      * O(lx·ly) steps but only O(ly) carried values, one kernel
      * expression per pair, no UDF. Scale shape: the screen bounds
      * pairs to P·m (never P²), series travel as single arrays on the
      * pair row, and the fold is map-side compute after one broadcast
      * join of the tiny survivor list — the 100 TB cost remains the
      * shared grid aggregate.
      */
    QueryDef(
      "q288_dtw_band",
      s"""WITH $dailySql,
        |${CausalOps.screenSql},
        |xs AS (SELECT el, list(v ORDER BY di) AS sv FROM daily GROUP BY 1),
        |pp AS (
        |  SELECT sp.src, sp.dst, a.sv AS xv, b.sv AS yv,
        |    len(a.sv) AS lx, len(b.sv) AS ly
        |  FROM surv sp JOIN xs a ON a.el = sp.src JOIN xs b ON b.el = sp.dst),
        |dp AS (
        |  SELECT src, dst, lx, ly,
        |    ${dtwFoldDuck} AS dtw
        |  FROM pp)
        |SELECT src, dst, CAST(lx AS BIGINT) AS lx, CAST(ly AS BIGINT) AS ly,
        |  round(dtw, 6) AS dtw,
        |  round(dtw / (lx + ly), 6) AS dtw_norm
        |FROM dp ORDER BY src, dst""".stripMargin) { (s, d) =>
      val g = daily(s, d)
      val xs = g.groupBy("el")
        .agg(transform(array_sort(collect_list(struct(col("di"), col("v")))),
          p => p.getField("v")).as("sv"))
      val pr = CausalOps.screen(s, d).select(col("src"), col("dst"))
        .join(broadcast(xs.select(col("el").as("ea"), col("sv").as("xv"))),
          col("ea") === col("src"))
        .join(broadcast(xs.select(col("el").as("eb"), col("sv").as("yv"))),
          col("eb") === col("dst"))
        .select(col("src"), col("dst"), col("xv"), col("yv"),
          size(col("xv")).as("lx"), size(col("yv")).as("ly"))
      pr.withColumn("dtw", expr(dtwFoldSpark))
        .select(col("src"), col("dst"),
          col("lx").cast("long").as("lx"), col("ly").cast("long").as("ly"),
          r6(col("dtw")).as("dtw"),
          r6(col("dtw") / (col("lx") + col("ly"))).as("dtw_norm"))
        .orderBy("src", "dst")
    },

    /** Additive Holt-Winters (level + trend + weekly seasonality) per
      * element, with a 7-day-ahead forecast — the seasonal upgrade of
      * q199's Holt trend, run as the q288 fold-kernel pattern instead
      * of q199's typed mapGroups: the 9-value state [l, b, s0..s6]
      * folds over the series positions in ONE kernel expression per
      * element. Coefficients are binary fractions (α=0.5, β=0.25,
      * γ=0.25 — exactly representable, the q199 parity trick), the
      * init is a fixed-order 7-term mean, and the recurrence uses only
      * *, +, − — bit-identical across engines against the same
      * list_reduce DuckDB oracle shape q288 proved out. Elements with
      * under two full weeks are excluded identically on both sides.
      * Scale: one grid groupBy assembles O(T)-length arrays; the fold
      * is map-side; output O(P·7).
      */
    QueryDef(
      "q294_holt_winters", {
        val init = "[" + ("(" + (1 to 7).map(i => s"sv[$i]").mkString(" + ") + ") / 7") +
          ", 0.0, " + (1 to 7).map(i =>
            s"sv[$i] - (${(1 to 7).map(j => s"sv[$j]").mkString(" + ")}) / 7").mkString(", ") + "]"
        val k = "CAST(xk[1] AS BIGINT)"
        val y = s"sv[$k + 1]"
        val m = s"($k % 7)"
        val lnew = s"0.5 * ($y - acc[3 + $m]) + 0.5 * (acc[1] + acc[2])"
        val bnew = s"0.25 * (($lnew) - acc[1]) + 0.75 * acc[2]"
        val snew = s"0.25 * ($y - ($lnew)) + 0.75 * acc[3 + $m]"
        val accNew = s"[$lnew, $bnew, " + (0 to 6).map(j =>
          s"CASE WHEN $m = $j THEN $snew ELSE acc[${3 + j}] END").mkString(", ") + "]"
        val pad = ", 0.0" * 8
        s"""WITH ${dailySql},
           |xs AS (
           |  SELECT el, list(v ORDER BY di) AS sv, len(list(v)) AS lx
           |  FROM daily GROUP BY 1 HAVING len(list(v)) >= 14),
           |hw AS (
           |  SELECT el, lx,
           |    list_reduce(
           |      [$init] || [[CAST(kk AS DOUBLE)$pad] FOR kk IN range(7, lx)],
           |      (acc, xk) -> $accNew) AS st
           |  FROM xs)
           |SELECT el, h,
           |  round(st[1], 6) AS level, round(st[2], 6) AS trend,
           |  round(st[1] + h * st[2] + st[3 + ((lx + h - 1) % 7)], 6) AS forecast
           |FROM hw CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) t(h)
           |ORDER BY el, h""".stripMargin
      }) { (s, d) =>
      val g = daily(s, d)
      val xs = g.groupBy("el")
        .agg(transform(array_sort(collect_list(struct(col("di"), col("v")))),
          p => p.getField("v")).as("sv"))
        .withColumn("lx", size(col("sv")))
        .where(col("lx") >= 14)
      val hw = xs.withColumn("st", expr(hwFoldSpark))
      import s.implicits._
      hw.crossJoin(broadcast(Seq(1, 2, 3, 4, 5, 6, 7).toDF("h")))
        .select(col("el"), col("h"),
          r6(element_at(col("st"), 1)).as("level"),
          r6(element_at(col("st"), 2)).as("trend"),
          r6(element_at(col("st"), 1) + col("h") * element_at(col("st"), 2) +
            element_at(col("st"),
              (lit(3) + pmod(col("lx") + col("h") - 1, lit(7))).cast("int")))
            .as("forecast"))
        .orderBy("el", "h")
    }
  )
}
