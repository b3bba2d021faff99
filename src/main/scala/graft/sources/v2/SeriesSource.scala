package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector (`format("graft-series")`): a
  * deterministic generated (user_id, day, value) time-grid — the
  * engine-native form of the reference's missing `data_loader` synth
  * path, and the template for wrapping any external series store as a
  * first-class Spark table.
  *
  * Proper connector behaviors, not a collect-and-parallelize:
  *   - partition planning: the user range is split into `partitions`
  *     independent [[InputPartition]]s, so a 1000-executor cluster
  *     generates/reads in parallel with no driver materialization;
  *   - column pruning: implements [[SupportsPushDownRequiredColumns]] —
  *     a `select(day)` never computes the value column (PlanSpec
  *     asserts the pruned read schema);
  *   - rows are emitted directly as [[InternalRow]] in the pruned
  *     schema order (no Row→InternalRow conversion layer).
  *
  * Options: users (default 100), days (30), partitions (4).
  * value(u, t) = ((u*31 + t*7) % 100) / 10.0 — integer arithmetic, so
  * any engine (the DuckDB oracle included) reproduces it bit-exactly.
  */
class SeriesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-series"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeriesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeriesTable(properties)
}

object SeriesSource {
  val schema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  def value(u: Long, t: Int): Double = ((u * 31 + t * 7) % 100) / 10.0
}

private class SeriesTable(props: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft_series"
  override def schema(): StructType = SeriesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def opt(k: String, dflt: Int): Int = {
      val fromScan = options.getInt(k, -1)
      if (fromScan >= 0) fromScan
      else Option(props.get(k)).map(_.toInt).getOrElse(dflt)
    }
    new SeriesScanBuilder(opt("users", 100), opt("days", 30), opt("partitions", 4))
  }
}

private class SeriesScanBuilder(users: Int, days: Int, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = SeriesSource.schema
  private var lo: Long = 0L
  private var hi: Long = users.toLong // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None

  /** Global COUNT(*)/MIN/MAX over the generated grid are closed-form —
    * answered from the (already filter-clamped) bounds without
    * generating a single row. Complete pushdown: Spark replaces its
    * whole Aggregate with a projection over the scan's one-row output.
    */
  private def aggColumn(f: AggregateFunc): Option[String] = f match {
    case m: Min => m.column() match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }
    case m: Max => m.column() match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }
    case _ => None
  }
  private def canHandle(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().forall {
      case _: CountStar => true
      case f @ (_: Min | _: Max) =>
        aggColumn(f).exists(c => c == "user_id" || c == "day")
      case _ => false
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean = canHandle(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (canHandle(agg)) { pushedAgg = Some(agg); true } else false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** user_id range predicates are absorbed into the partition plan
    * (the generator simply never emits the excluded range); everything
    * else stays residual for Spark to evaluate.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case GreaterThanOrEqual("user_id", _: Long) | GreaterThan("user_id", _: Long)
           | LessThanOrEqual("user_id", _: Long) | LessThan("user_id", _: Long)
           | EqualTo("user_id", _: Long) => true
      case _ => false
    }
    // saturating +1: `user_id > Long.MaxValue` / `<= Long.MaxValue`
    // must not wrap to Long.MinValue and silently flip the bound
    def succ(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    supported.foreach {
      case GreaterThanOrEqual("user_id", v: Long) => lo = math.max(lo, v)
      case GreaterThan("user_id", v: Long) => lo = math.max(lo, succ(v))
      case LessThanOrEqual("user_id", v: Long) => hi = math.min(hi, succ(v))
      case LessThan("user_id", v: Long) => hi = math.min(hi, v)
      case EqualTo("user_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v))
      case _ => ()
    }
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new SeriesAggScan(lo, math.max(lo, hi), days, agg)
    case None => new SeriesScan(lo, math.max(lo, hi), days, partitions, required)
  }
}

/** One-row scan answering a completely-pushed global aggregation from
  * the grid bounds.
  */
private class SeriesAggScan(userLo: Long, userHi: Long, days: Int,
    agg: Aggregation) extends Scan with Batch {
  private val funcs = agg.aggregateExpressions().toIndexedSeq
  private val span = math.max(userHi - userLo, 0L)
  private val empty = span == 0 || days == 0

  private def colOf(f: AggregateFunc): String = f match {
    case m: Min => m.column().asInstanceOf[NamedReference].fieldNames()(0)
    case m: Max => m.column().asInstanceOf[NamedReference].fieldNames()(0)
    case _ => ""
  }

  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg$i", LongType, nullable = false)
    case (f, i) =>
      val t = if (colOf(f) == "user_id") LongType else IntegerType
      StructField(s"agg$i", t, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-series pushedAgg=${funcs.mkString(",")} users=[$userLo,$userHi)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SeriesPartition(0, 0))

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: IndexedSeq[Any] = funcs.map {
      case _: CountStar => span * days
      case f: Min if colOf(f) == "user_id" => if (empty) null else userLo
      case f: Max if colOf(f) == "user_id" => if (empty) null else userHi - 1
      case f: Min => if (empty) null else 0
      case f: Max => if (empty) null else days - 1
      case _ => null
    }
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = InternalRow.fromSeq(values)
          override def close(): Unit = ()
        }
    }
  }
}

private case class SeriesPartition(userStart: Long, userEnd: Long)
    extends InputPartition

/** Stream offset = next user id not yet emitted. */
private case class SeriesOffset(user: Long) extends Offset {
  override def json(): String = user.toString
}

private class SeriesScan(userLo: Long, userHi: Long, days: Int, partitions: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Same generator as a micro-batch stream: the offset axis is the
    * user range, all of it available immediately (a finite replayable
    * stream — the test double for a Kafka-style source; pruning and
    * partition planning are shared with the batch path).
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def initialOffset(): Offset = SeriesOffset(userLo)
      override def latestOffset(): Offset = SeriesOffset(userHi)
      override def deserializeOffset(json: String): Offset =
        SeriesOffset(json.toLong)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val lo = start.asInstanceOf[SeriesOffset].user
        val hi = end.asInstanceOf[SeriesOffset].user
        planRange(lo, hi)
      }
      override def createReaderFactory(): PartitionReaderFactory =
        SeriesScan.this.createReaderFactory()
    }
  override def description(): String =
    s"graft-series users=[$userLo,$userHi) days=$days readSchema=${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    planRange(userLo, userHi)

  private def planRange(lo: Long, hi: Long): Array[InputPartition] = {
    val span = math.max(hi - lo, 0L)
    val n = math.max(1L, math.min(partitions.toLong, math.max(span, 1L))).toInt
    (0 until n).map { i =>
      val start = lo + span * i / n
      val end = lo + span * (i + 1) / n
      SeriesPartition(start, end)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = required.fieldNames
    val d = days
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[SeriesPartition]
        new PartitionReader[InternalRow] {
          private var u = p.userStart
          private var t = -1
          override def next(): Boolean = {
            if (d <= 0) return false // day-rollover below would emit phantom rows
            t += 1
            if (t >= d) { t = 0; u += 1 }
            u < p.userEnd
          }
          override def get(): InternalRow = {
            val vals: Array[Any] = cols.map {
              case "user_id" => u
              case "day" => t
              case "value" => SeriesSource.value(u, t)
            }
            InternalRow.fromSeq(vals.toIndexedSeq)
          }
          override def close(): Unit = ()
        }
      }
    }
  }
}
