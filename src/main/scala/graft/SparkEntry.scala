package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's operator surface is assembled from per-module registries;
  * each [[QueryDef]] pairs a Spark plan builder with (when
  * SQL-expressible) its DuckDB oracle.
  */
object SparkEntry {
  // lazy val, not def (round 12, VERDICT r11 #8): `queries` is read once
  // per QUERY by the driver's Verify loop, and a def here rebuilt all
  // ~470 QueryDefs — including their embedded oracle-SQL string
  // concatenations — on every lookup. Registration is already split by
  // family module (each `defs` below is its own class file, nowhere near
  // the JVM 64K method limit); caching the assembled registry removes
  // the per-run re-registration overhead entirely.
  private lazy val allDefs: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.RelationalExt.defs ++
      operators.RelationalMore.defs ++
      operators.PipelineMore.defs ++
      operators.Windows.defs ++
      operators.TimeSeries.defs ++
      operators.LLMPipeline.defs ++
      operators.CorpusOps.defs ++
      operators.QualityOps.defs ++
      operators.Tensor.defs ++
      operators.Multimodal.defs ++
      operators.Extensions.defs ++
      operators.RetainOps.defs ++
      operators.FeatureOps.defs ++
      operators.SupervisedOps.defs ++
      operators.PrivacyOps.defs ++
      operators.AnalyticsOps.defs ++
      operators.StatsOps.defs ++
      operators.CurriculumOps.defs ++
      operators.TemporalOps.defs ++
      operators.RobustOps.defs ++
      operators.CausalOps.defs ++
      operators.CcmOps.defs ++
      operators.CointOps.defs ++
      operators.DriftOps.defs ++
      operators.SeriesOps.defs ++
      operators.GraphOps.defs ++
      operators.VarOps.defs ++
      operators.TextIndexOps.defs ++
      operators.SearchOps.defs ++
      operators.HybridOps.defs ++
      operators.InferenceOps.defs ++
      operators.DialectOps.defs ++
      operators.MLOps.defs ++
      operators.Round12Ops.defs ++
      operators.Round13Ops.defs ++
      operators.Round14Ops.defs ++
      operators.Round15Ops.defs ++
      operators.Round16Ops.defs ++
      operators.Round17Ops.defs ++
      operators.Round18Ops.defs ++
      operators.Round19Ops.defs ++
      operators.Round20Ops.defs ++
      operators.Round21Ops.defs ++
      operators.Round22Ops.defs ++
      operators.Round23Ops.defs ++
      operators.Round24Ops.defs ++
      operators.Round25Ops.defs ++
      operators.Round26Ops.defs ++
      operators.Round27Ops.defs ++
      operators.Round28Ops.defs ++
      operators.Round29Ops.defs ++
      operators.Round30Ops.defs ++
      operators.Round31Ops.defs ++
      operators.Round32Ops.defs ++
      operators.Observability.defs ++
      streaming.Streaming.defs ++
      sources.Sources.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pricing-summary aggregate (SURVEY.md §7.2): one scan, one
    * shuffle, the reference's evaluation-style grouped metrics shape.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Shared parser for the Bench/Verify comma-separated name-filter env
    * vars. Empty or unset ⇒ empty set ⇒ "run everything" (a bare
    * `VAR= sbt ...` must not silently filter out every query).
    */
  def nameFilter(envVar: String): Set[String] =
    sys.env.get(envVar)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
}
