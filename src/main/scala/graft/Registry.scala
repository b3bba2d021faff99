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

/** Per-run scratch root for queries that must materialize intermediate
  * files (q205/q207/q223). Pid-suffixed so two concurrent verify/bench
  * runs on one box never clobber each other's data, yet STABLE within a
  * JVM so the oracle SQL strings (built at class-init) and the query
  * functions (run later) agree on the path — the driver's DuckDB reads
  * the files this JVM wrote, after it exits. Override with
  * -Dgraft.scratch for a fixed location.
  */
object Scratch {
  val root: String = sys.props.get("graft.scratch").getOrElse {
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    s"$tmp/graft_scratch_${ProcessHandle.current().pid()}"
  }
}
