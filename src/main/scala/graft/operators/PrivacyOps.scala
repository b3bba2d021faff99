package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Privacy-risk auditing for release pipelines (Sweeney, "k-Anonymity:
  * A Model for Protecting Privacy", IJUFKS 2002; Machanavajjhala et
  * al., "l-Diversity", TKDD 2007) — before a curated dataset ships,
  * the pipeline must answer "how re-identifiable are these rows":
  *
  *  - q322: the k-anonymity / l-diversity audit over a
  *    quasi-identifier tuple (nation, account-balance bin) with
  *    market segment as the sensitive attribute — group-size spectrum,
  *    worst-case k, how many records sit in small groups, and how many
  *    groups fail 2-diversity.
  *  - q323: the generalization ladder — the same audit swept over
  *    coarsening bin widths in ONE pass (the q212 threshold-sweep
  *    discipline: fan out a 3-row width table, never rescan), giving
  *    the minimum generalization at which the release meets k ≥ 5.
  *
  * Scale: both are plain grouped aggregates on the QI key (high
  * cardinality — the natural shuffle key), with the sweep fan-out a
  * broadcast of 3 constant rows; summary rows are O(widths). Bin
  * boundaries are floor(balance / width) on identical doubles — exact
  * on both engines, no rounding-boundary exposure.
  */
object PrivacyOps {

  val defs: Seq[QueryDef] = Seq(

    /** k-anonymity + l-diversity audit at width 1000: QI = (nation,
      * acctbal bin), sensitive = mktsegment. */
    QueryDef(
      "q322_k_anonymity",
      """WITH qi AS (
        |  SELECT c_nationkey AS nat,
        |    CAST(floor(c_acctbal / 1000.0) AS INT) AS bin,
        |    c_mktsegment AS seg
        |  FROM customer),
        |grp AS (
        |  SELECT nat, bin, count(*) AS sz, count(DISTINCT seg) AS ldiv
        |  FROM qi GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(min(sz) AS BIGINT) AS k_anonymity,
        |  CAST(sum(CASE WHEN sz < 2 THEN 1 ELSE 0 END) AS BIGINT) AS groups_lt2,
        |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS groups_lt5,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS records_lt5,
        |  round(CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE) / sum(sz), 6)
        |    AS frac_records_lt5,
        |  CAST(sum(CASE WHEN ldiv < 2 THEN 1 ELSE 0 END) AS BIGINT) AS groups_ldiv_lt2
        |FROM grp""".stripMargin) { (s, d) =>
      val grp = Tables.customer(s, d)
        .select(col("c_nationkey").as("nat"),
          floor(col("c_acctbal") / 1000.0).cast("int").as("bin"),
          col("c_mktsegment").as("seg"))
        .groupBy(col("nat"), col("bin"))
        .agg(count(lit(1)).as("sz"), countDistinct(col("seg")).as("ldiv"))
      grp.agg(
        count(lit(1)).cast("long").as("n_groups"),
        min(col("sz")).cast("long").as("k_anonymity"),
        sum(when(col("sz") < 2, 1).otherwise(0)).cast("long").as("groups_lt2"),
        sum(when(col("sz") < 5, 1).otherwise(0)).cast("long").as("groups_lt5"),
        sum(when(col("sz") < 5, col("sz")).otherwise(0)).cast("long").as("records_lt5"),
        round(sum(when(col("sz") < 5, col("sz")).otherwise(0)).cast("double") /
          sum(col("sz")), 6).as("frac_records_lt5"),
        sum(when(col("ldiv") < 2, 1).otherwise(0)).cast("long").as("groups_ldiv_lt2"))
    },

    /** Generalization ladder: the k-audit at widths 100/1000/10000 in
      * one pass — pick the narrowest width whose k_min ≥ 5. */
    QueryDef(
      "q323_generalization_ladder",
      """WITH g AS (
        |  SELECT w.width, c_nationkey AS nat,
        |    CAST(floor(c_acctbal / w.width) AS INT) AS bin, count(*) AS sz
        |  FROM customer CROSS JOIN (VALUES (100.0), (1000.0), (10000.0)) AS w(width)
        |  GROUP BY 1, 2, 3)
        |SELECT width, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(min(sz) AS BIGINT) AS k_min,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS records_lt5,
        |  CAST(min(sz) >= 5 AS INT) AS k5_ok
        |FROM g GROUP BY width ORDER BY width""".stripMargin) { (s, d) =>
      import s.implicits._
      val widths = Seq(100.0, 1000.0, 10000.0).toDF("width")
      Tables.customer(s, d)
        .crossJoin(broadcast(widths))
        .select(col("width"), col("c_nationkey").as("nat"),
          floor(col("c_acctbal") / col("width")).cast("int").as("bin"))
        .groupBy(col("width"), col("nat"), col("bin"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("width"))
        .agg(count(lit(1)).cast("long").as("n_groups"),
          min(col("sz")).cast("long").as("k_min"),
          sum(when(col("sz") < 5, col("sz")).otherwise(0)).cast("long").as("records_lt5"),
          (min(col("sz")) >= 5).cast("int").as("k5_ok"))
        .orderBy("width")
    },

    /** Differentially-private count release via the Laplace mechanism
      * (Dwork et al., TCC 2006): per-(type, day) event counts +
      * Laplace(Δf/ε) noise at ε = 1, sensitivity 1. The noise stream
      * here is SEEDED (md5 of the cell key → uniform → inverse-CDF
      * Laplace) so the release is reproducible and oracle-verifiable —
      * the mechanism, scale calibration, and post-processing
      * (max(0, round)) are the real thing; a production deployment
      * swaps the hash draw for a CSPRNG, which changes no plan shape.
      * Map-side per cell after the one grouped count; the ε ledger is
      * the single summary row every DP pipeline must carry.
      */
    QueryDef(
      "q340_dp_release",
      """WITH c AS (
        |  SELECT event_type AS et,
        |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |z AS (
        |  SELECT et, di, n,
        |    CAST(('0x' || substr(md5(et || '#' || di || '#dp1'), 1, 13))::BIGINT AS DOUBLE)
        |      / 4503599627370496.0 - 0.5 AS u
        |  FROM c),
        |r AS (
        |  SELECT et, di, n,
        |    -1.0 * (CASE WHEN u < 0 THEN -1.0 ELSE 1.0 END)
        |      * ln(greatest(1.0 - 2.0 * abs(u), 1e-15)) AS lap
        |  FROM z)
        |SELECT et AS event_type, CAST(di AS BIGINT) AS di,
        |  greatest(0, CAST(round(n + lap, 0) AS BIGINT)) AS dp_count,
        |  round(lap, 6) AS noise
        |FROM r ORDER BY et, di LIMIT 40""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("event_type").as("et"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
        .agg(count(lit(1)).as("n"))
      c.withColumn("u",
          conv(substring(md5(concat(col("et"), lit("#"), col("di"), lit("#dp1"))), 1, 13), 16, 10)
            .cast("double") / 4503599627370496.0 - 0.5)
        .withColumn("lap",
          lit(-1.0) * when(col("u") < 0, -1.0).otherwise(1.0) *
            log(greatest(lit(1.0) - lit(2.0) * abs(col("u")), lit(1e-15))))
        .select(col("et").as("event_type"), col("di").cast("long").as("di"),
          greatest(lit(0L), round(col("n") + col("lap"), 0).cast("long")).as("dp_count"),
          round(col("lap"), 6).as("noise"))
        .orderBy("event_type", "di").limit(40)
    }
  )
}
