package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Output-schema lint for the driver's correctness gate.
  *
  * The driver hashes query results via parquet → pandas, which is
  * type-sensitive in ways a value-equal result can still trip over.
  * Four top-level column types have each caused a red CORRECTNESS row
  * at least once in this project's history:
  *
  *   - DecimalType: pandas renders `2480.770` vs DuckDB's `2480.77`
  *     (and Spark/DuckDB infer different precisions for the same sum).
  *   - ArrayType / MapType: pandas `sort_values` crashes on ndarray /
  *     dict cells ("unhashable type").
  *   - TimestampType: tz/precision rendering differs between engines.
  *
  * Every query therefore casts decimals to double, `array_join`s
  * arrays, stringifies maps, and formats timestamps before emitting.
  * This lint enforces that invariant mechanically at Verify time so a
  * new QueryDef can't reintroduce the class.
  */
object SchemaLint {
  /** Top-level columns of `schema` whose type the driver hash cannot
    * round-trip faithfully, as "name: type" strings; empty = clean. */
  def violations(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[DecimalType] ||
        f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType == TimestampType || f.dataType == TimestampNTZType =>
        s"${f.name}: ${f.dataType.simpleString}"
    }

  /** Fail loudly (with the query name) if `df` would trip the driver
    * hash. Called by Verify on every result before it is written. */
  def check(name: String, df: DataFrame): Unit = {
    val bad = violations(df.schema)
    if (bad.nonEmpty) throw new IllegalStateException(
      s"[schema-lint] $name emits driver-hash-unsafe column(s): " +
        bad.mkString(", ") +
        " — cast DECIMAL to DOUBLE, array_join arrays, stringify maps," +
        " date_format timestamps (see SchemaLint scaladoc)")
  }
}
