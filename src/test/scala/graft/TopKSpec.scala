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
}
