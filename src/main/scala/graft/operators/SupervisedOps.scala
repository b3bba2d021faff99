package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Supervised feature construction as pure aggregates — the two
  * workhorses of tabular feature pipelines, each expressed so that
  * "training" never leaves the SQL engine:
  *
  *  - q320: multivariate ridge regression in CLOSED FORM — one
  *    distributed moment aggregate over the fact table, then Cramer's
  *    rule on the 3×3 centered Gram matrix as plain column arithmetic.
  *    The whole fit is a single scan + a single 1-row reduction: no
  *    iterations, no driver-side solver, no collect of anything wider
  *    than one row. (The q300 VAR sweep solves for SSEs; this solves
  *    for the COEFFICIENTS — together they cover both halves of linear
  *    modeling at scale.)
  *  - q321: leave-one-out target encoding with prior smoothing (the
  *    standard high-cardinality categorical encoder; smoothing per
  *    Micci-Barreca, SIGKDD Expl. 3(1), 2001): enc(row) =
  *    (Σ_cat y − y_own + m·prior_loo) / (cnt_cat − 1 + m). The
  *    LOO subtraction makes it leakage-free without a per-fold
  *    re-aggregation.
  *
  * Scale shape: q320 is ONE map-side pass producing 15 decimal moment
  * sums (exact, order-free) — everything after is arithmetic on a
  * single row. q321 deliberately avoids `OVER (PARTITION BY cat)`:
  * a low-cardinality category window would funnel the table through
  * ~|cats| partitions, so the per-category and global statistics are
  * tiny groupBy aggregates BROADCAST back onto the fact rows —
  * map-side encoding, no skewed shuffle.
  *
  * Parity: moment sums are DECIMAL(38,12)-exact on both engines; all
  * downstream arithmetic is the SAME expression strings run by both
  * dialects (the VarOps discipline), so doubles match bit-for-bit.
  */
object SupervisedOps {
  import CausalOps.dsum

  /** Ridge regularization, diagonal-PROPORTIONAL (each diagonal entry
    * scaled by 1 + 1e-6 — the standardized-ridge form): invariant to
    * feature units and SF, never over-shrinks a small-variance feature
    * the way an absolute λ does, and still makes a collinear solve
    * finite. */
  private val LamScale = "1.000001"

  /** 3×3 determinant by first-row expansion; ci = matrix COLUMN i as
    * its three row-entry expression names. */
  private def det3(c1: (String, String, String), c2: (String, String, String),
      c3: (String, String, String)): String =
    s"(${c1._1} * (${c2._2} * ${c3._3} - ${c2._3} * ${c3._2})" +
      s" - ${c2._1} * (${c1._2} * ${c3._3} - ${c1._3} * ${c3._2})" +
      s" + ${c3._1} * (${c1._2} * ${c2._3} - ${c1._3} * ${c2._2}))"

  private val col1 = ("r11", "a12", "a13")
  private val col2 = ("a12", "r22", "a23")
  private val col3 = ("a13", "a23", "r33")
  private val rhs = ("ay1", "ay2", "ay3")

  /** Shared select-expression stages (Spark selectExpr == oracle CTE). */
  private[graft] val cmStage: Seq[String] = Seq(
    "n", "s1", "s2", "s3", "sy",
    "s11 - s1 * s1 / n AS a11",
    "s12 - s1 * s2 / n AS a12",
    "s13 - s1 * s3 / n AS a13",
    "s22 - s2 * s2 / n AS a22",
    "s23 - s2 * s3 / n AS a23",
    "s33 - s3 * s3 / n AS a33",
    "s1y - s1 * sy / n AS ay1",
    "s2y - s2 * sy / n AS ay2",
    "s3y - s3 * sy / n AS ay3",
    "syy - sy * sy / n AS ayy")

  private[graft] val rgStage: Seq[String] = Seq(
    "n", "s1", "s2", "s3", "sy",
    "a11", "a12", "a13", "a22", "a23", "a33", "ay1", "ay2", "ay3", "ayy",
    s"a11 * $LamScale AS r11", s"a22 * $LamScale AS r22", s"a33 * $LamScale AS r33")

  private[graft] val solveStage: Seq[String] = Seq(
    "n", "s1", "s2", "s3", "sy",
    "a11", "a12", "a13", "a22", "a23", "a33", "ay1", "ay2", "ay3", "ayy",
    s"${det3(rhs, col2, col3)} / ${det3(col1, col2, col3)} AS b1",
    s"${det3(col1, rhs, col3)} / ${det3(col1, col2, col3)} AS b2",
    s"${det3(col1, col2, rhs)} / ${det3(col1, col2, col3)} AS b3")

  private[graft] val outStage: Seq[String] = Seq(
    "CAST(n AS BIGINT) AS n_rows",
    "round(b1, 6) AS b_quantity",
    "round(b2, 6) AS b_discount",
    "round(b3, 6) AS b_tax",
    "round((sy - b1 * s1 - b2 * s2 - b3 * s3) / n, 6) AS intercept",
    "round(1.0 - (ayy - 2.0 * (b1 * ay1 + b2 * ay2 + b3 * ay3)" +
      " + (b1 * b1 * a11 + b2 * b2 * a22 + b3 * b3 * a33" +
      " + 2.0 * b1 * b2 * a12 + 2.0 * b1 * b3 * a13 + 2.0 * b2 * b3 * a23)) / ayy, 6) AS r2")

  private def duckMoments: String =
    """mom AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(l_discount AS DECIMAL(38,12))) AS DOUBLE) AS s2,
      |    CAST(sum(CAST(l_tax AS DECIMAL(38,12))) AS DOUBLE) AS s3,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS s11,
      |    CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS s12,
      |    CAST(sum(CAST(l_quantity * l_tax AS DECIMAL(38,12))) AS DOUBLE) AS s13,
      |    CAST(sum(CAST(l_discount * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS s22,
      |    CAST(sum(CAST(l_discount * l_tax AS DECIMAL(38,12))) AS DOUBLE) AS s23,
      |    CAST(sum(CAST(l_tax * l_tax AS DECIMAL(38,12))) AS DOUBLE) AS s33,
      |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS s1y,
      |    CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS s2y,
      |    CAST(sum(CAST(l_tax * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS s3y,
      |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS syy
      |  FROM lineitem)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    /** Closed-form ridge fit of l_extendedprice ~ quantity + discount +
      * tax: one decimal moment aggregate, then the centered-Gram
      * Cramer solve as shared column arithmetic. Output: coefficients,
      * intercept, and in-sample R² — all from the same single row. */
    QueryDef(
      "q320_ridge_gram",
      s"""WITH $duckMoments,
        |cm AS (SELECT ${cmStage.mkString(", ")} FROM mom),
        |rg AS (SELECT ${rgStage.mkString(", ")} FROM cm),
        |sv AS (SELECT ${solveStage.mkString(", ")} FROM rg)
        |SELECT ${outStage.mkString(", ")} FROM sv""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("l_quantity")).as("s1"),
          dsum(col("l_discount")).as("s2"),
          dsum(col("l_tax")).as("s3"),
          dsum(col("l_extendedprice")).as("sy"),
          dsum(col("l_quantity") * col("l_quantity")).as("s11"),
          dsum(col("l_quantity") * col("l_discount")).as("s12"),
          dsum(col("l_quantity") * col("l_tax")).as("s13"),
          dsum(col("l_discount") * col("l_discount")).as("s22"),
          dsum(col("l_discount") * col("l_tax")).as("s23"),
          dsum(col("l_tax") * col("l_tax")).as("s33"),
          dsum(col("l_quantity") * col("l_extendedprice")).as("s1y"),
          dsum(col("l_discount") * col("l_extendedprice")).as("s2y"),
          dsum(col("l_tax") * col("l_extendedprice")).as("s3y"),
          dsum(col("l_extendedprice") * col("l_extendedprice")).as("syy"))
        .selectExpr(cmStage: _*)
        .selectExpr(rgStage: _*)
        .selectExpr(solveStage: _*)
        .selectExpr(outStage: _*)
    },

    /** Leave-one-out smoothed target encoding of o_orderpriority
      * against o_totalprice (m = 10), reported as per-category encoding
      * statistics. Category and global sums are tiny broadcast
      * aggregates — the encoding itself is map-side on the fact rows. */
    QueryDef(
      "q321_target_encoding",
      """WITH cg AS (
        |  SELECT o_orderpriority AS gcat, count(*) AS cnt,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS scat
        |  FROM orders GROUP BY 1),
        |gg AS (
        |  SELECT count(*) AS ng,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sg
        |  FROM orders),
        |e2 AS (
        |  SELECT o.o_orderpriority AS cat,
        |    ((cg.scat - o.o_totalprice)
        |      + 10.0 * ((gg.sg - o.o_totalprice) / (gg.ng - 1)))
        |      / ((cg.cnt - 1) + 10.0) AS enc
        |  FROM orders o JOIN cg ON cg.gcat = o.o_orderpriority CROSS JOIN gg)
        |SELECT cat, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(enc AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS enc_mean,
        |  round(min(enc), 6) AS enc_min,
        |  round(max(enc), 6) AS enc_max
        |FROM e2 GROUP BY cat ORDER BY cat""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val cg = o.groupBy(col("o_orderpriority").as("gcat"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("scat"))
      val gg = o.agg(count(lit(1)).as("ng"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sg"))
      o.join(broadcast(cg), col("gcat") === col("o_orderpriority"))
        .crossJoin(broadcast(gg))
        .select(col("o_orderpriority").as("cat"),
          (((col("scat") - col("o_totalprice")) +
            lit(10.0) * ((col("sg") - col("o_totalprice")) / (col("ng") - 1))) /
            ((col("cnt") - 1) + lit(10.0))).as("enc"))
        .groupBy(col("cat"))
        .agg(count(lit(1)).as("n"),
          (sum(col("enc").cast("decimal(38,12)")).cast("double") / count(lit(1))).as("em"),
          min(col("enc")).as("emin"), max(col("enc")).as("emax"))
        .select(col("cat"), col("n").cast("long").as("n"), round(col("em"), 6).as("enc_mean"),
          round(col("emin"), 6).as("enc_min"), round(col("emax"), 6).as("enc_max"))
        .orderBy("cat")
    }
  )
}
