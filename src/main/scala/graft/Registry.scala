package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark plan builder plus (when SQL-expressible) the
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism contract (SURVEY.md §5.2.1): every query ends in an
  * `orderBy` on a unique non-null key set, aliases every computed column
  * identically to the oracle, rounds floating aggregates, and never emits
  * raw timestamps (formatted strings / dates only) so the hash compare is
  * stable across engines.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
