package graft

import graft.plans.{TopKPerGroupExec, TopKPerGroupOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The custom TopKPerGroup operator (plans/TopKPerGroup.scala) must
  * compute exactly the window-function top-k AND plan as the two-phase
  * partial/final exec with the exchange BETWEEN the phases (so only
  * k-bounded partial output is shuffled).
  */
class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("topk-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  import PlanTestUtils.{allNodes, finalPlan}

  test("custom operator matches the window-function top-k exactly") {
    val ev = Tables.events(spark, sf)
    val custom = TopKPerGroupOps
      .topKPerGroup(spark, ev, Seq(ev("event_type")),
        Seq(ev("value").desc, ev("event_id").asc), 5)
      .select("event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val window = ev.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(custom === window)
  }

  test("plans as partial -> exchange -> final (bounded shuffle)") {
    val ev = Tables.events(spark, sf)
    val df = TopKPerGroupOps.topKPerGroup(spark, ev, Seq(ev("event_type")),
      Seq(ev("value").desc, ev("event_id").asc), 5)
    val nodes = allNodes(finalPlan(df))
    val execs = nodes.collect { case t: TopKPerGroupExec => t }
    assert(execs.map(_.partial).sorted === Seq(false, true),
      s"expected one partial and one final TopKPerGroupExec, got $execs")
    // the final (non-partial) node must have a shuffle somewhere below
    // it and the partial node below that shuffle
    val fin = execs.find(!_.partial).get
    val below = allNodes(fin).drop(1)
    assert(below.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "final phase must read from an exchange")
    assert(below.collect { case t: TopKPerGroupExec if t.partial => t }.nonEmpty,
      "partial phase must run below the exchange")
  }

  test("handles k larger than the group size") {
    val ev = Tables.events(spark, sf).where(col("event_type") === "click")
    val n = ev.count()
    val all = TopKPerGroupOps.topKPerGroup(spark, ev, Seq(ev("event_type")),
      Seq(ev("value").desc, ev("event_id").asc), (n + 100).toInt)
    assert(all.count() === n)
  }

  test("accepts a child that emits GenericInternalRow (not UnsafeRow)") {
    // SparkPlan.execute() only guarantees InternalRow; drive the exec
    // directly over a raw-row scan to pin the UnsafeProjection fallback
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, GenericInternalRow, SortOrder}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    import graft.plans.TopKPerGroupExec
    val g = AttributeReference("g", IntegerType, nullable = false)()
    val v = AttributeReference("v", LongType, nullable = false)()
    val rows = spark.sparkContext.parallelize(
      (1 to 40).map(i => new GenericInternalRow(Array[Any](i % 4, i.toLong)): InternalRow), 3)
    val scan = org.apache.spark.sql.GraftBridge.rawRowScan(Seq(g, v), rows)
    val exec = TopKPerGroupExec(Seq(g), Seq(SortOrder(v, Ascending)), 2, partial = true, scan)
    val out = exec.execute().map(r => (r.getInt(0), r.getLong(1))).collect()
    // partial pass over 3 partitions: ≤2 rows per (partition, group),
    // all drawn from the input — the point is it no longer ClassCastExceptions
    assert(out.length >= 8 && out.toSet.subsetOf(
      (1 to 40).map(i => (i % 4, i.toLong)).toSet))
    // exact check: global top-2 per group after a final pass
    val fin = TopKPerGroupExec(Seq(g), Seq(SortOrder(v, Ascending)), 2, partial = true,
      org.apache.spark.sql.GraftBridge.rawRowScan(Seq(g, v), rows.coalesce(1)))
    val one = fin.execute().map(r => (r.getInt(0), r.getLong(1))).collect().toSet
    val want = (1 to 40).map(i => (i % 4, i.toLong)).groupBy(_._1)
      .values.flatMap(_.toSeq.sortBy(_._2).take(2)).toSet
    assert(one === want)
  }
}
