package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase global-ordering idiom (round 10, VERDICT r9 #3) — the
  * scale-safe replacement for a single-partition `Window.orderBy(...)`
  * over a data-grain table: range-partition on the sort key, run the
  * window PER PARTITION in parallel, then add the driver-collected
  * exclusive per-partition offsets (O(partitions) scalars) to stitch the
  * global result. Extracted from q160/q174 (TemporalOps) so the
  * inference/graph family reuses one audited implementation.
  */
private[operators] object TwoPhase {

  /** Exclusive prefix offset of this row's range partition, as a CASE
    * chain over the (tiny, driver-collected) per-partition totals — the
    * broadcast half of the two-phase prefix sum. Expects a `pid` column.
    */
  private[operators] def offsets(totals: Seq[(Int, Long)]): Column = {
    val prefix = totals.sortBy(_._1)
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (pid, tot)) => (pid, acc + tot) }
    val exclusive = prefix.sliding(2).collect {
      case Seq((_, prevSum), (pid, _)) => (pid, prevSum)
    }.toSeq
    exclusive.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("pid") === pid, lit(off)).otherwise(acc)
    }
  }

  /** Global `row_number()` over a TOTAL order (`sort` must be a unique
    * key set) without ever funnelling the data through one partition.
    * Returns the input plus a `rn` column (1-based) and the total row
    * count (free — the offsets collect already aggregated it). The
    * phase-1 frame is PlanCache'd under `cacheKey`: the offsets collect
    * materializes it and phase 2 re-reads the same persisted rows.
    */
  private[operators] def globalRowNumber(s: SparkSession, df: DataFrame,
      cacheKey: String, sort: Seq[Column], parts: Int = 32): (DataFrame, Long) = {
    // materialize the INPUT before range partitioning (round-10 sf10
    // fence finding): repartitionByRange runs a SAMPLING job over its
    // child to pick range bounds, so an expensive lazy subtree (a
    // token explode, a scoring pipeline) would execute twice — once
    // for the sample, once for the real pass. Cached, the sampler and
    // the pass both read the materialized rows.
    val in = graft.PlanCache.cached(s, s"$cacheKey|in")(df)
    val local = graft.PlanCache.cached(s, cacheKey) {
      in.repartitionByRange(parts, sort: _*)
        .withColumn("pid", spark_partition_id())
        .withColumn("rl", row_number().over(
          Window.partitionBy(col("pid")).orderBy(sort: _*)))
    }
    val totals = local.groupBy("pid").agg(count(lit(1)).as("c"))
      .orderBy("pid").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val n = totals.map(_._2).sum
    (local.withColumn("rn", col("rl") + offsets(totals)).drop("rl", "pid"), n)
  }

  /** Exact `ntile(buckets)` from a two-phase global row number — the
    * same bucket-boundary arithmetic every engine implements: with
    * q = n/buckets and r = n%buckets, the first r buckets take q+1 rows
    * and the rest q. Integer DIV keeps it exact at any n. 1-based.
    */
  private[operators] def ntileFromRn(n: Long, buckets: Int): Column = {
    val q = n / buckets
    val r = n % buckets
    val cut = r * (q + 1)
    when(col("rn") <= cut, expr(s"(rn - 1) DIV ${q + 1}"))
      .otherwise(lit(r) + expr(s"(rn - 1 - $cut) DIV ${math.max(q, 1L)}"))
      .cast("int") + 1
  }
}
