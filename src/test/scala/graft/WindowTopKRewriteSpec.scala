package graft

import graft.plans.TopKPerGroupExec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end proof of the packaged extension path: a session built with
  * spark.sql.extensions=graft.GraftExtensions rewrites the plain
  * window-function top-k idiom through WindowTopKRewrite into the
  * TopKPerGroup exec, with identical results to an unextended session.
  */
class WindowTopKRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .appName("window-topk-rewrite-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  import PlanTestUtils.{allNodes, finalPlan}

  private def windowTopK(k: Int): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("event_type", "event_id", "value")
  }

  test("window top-k idiom plans through TopKPerGroupExec") {
    val df = windowTopK(4)
    val plan = finalPlan(df)
    val custom = allNodes(plan).collect { case t: TopKPerGroupExec => t }
    assert(custom.nonEmpty, s"rewrite did not fire:\n$plan")
    assert(!plan.toString.contains("WindowExec") &&
      !allNodes(plan).exists(_.getClass.getSimpleName.startsWith("Window")),
      "the Window exec should be gone after the rewrite")
  }

  test("rewritten plan returns exactly the window-function rows") {
    val got = windowTopK(4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // exact reference computed outside Spark: collect and sort on the
    // driver (the dataset is sf0.001-tiny)
    val rows = Tables.events(spark, sf)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(t => (-t._3, t._2)).take(4).toSeq
    }.map(t => (t._1, t._2)).toSet
    assert(got === expect)
  }

  test("injected functions resolve from SQL text in the extension session") {
    val r = spark.sql(
      """SELECT round(sigmoid_ce(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), 6) AS ce,
        |  sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) === math.rint((1.0 + math.log1p(math.exp(-1.0))) * 1e6) / 1e6)
    assert(r.getInt(1) === 2)
  }

  test("global top-k (no PARTITION BY) works under the extension") {
    // the rule must NOT fire (empty partitionSpec) and the query must
    // not crash — regression for ClusteredDistribution(Nil)
    val w = Window.orderBy(col("value").desc, col("event_id"))
    val df = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("event_id")
    assert(df.count() === 3)
    // the direct operator API supports empty group exprs via AllTuples
    val ev = Tables.events(spark, sf)
    val direct = graft.plans.TopKPerGroupOps.topKPerGroup(spark, ev, Seq.empty,
      Seq(ev("value").desc, ev("event_id").asc), 3)
    assert(direct.count() === 3)
  }

  test("conjunctive filter `rn <= k AND other` rewrites, other predicate preserved") {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val df = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 4 && col("event_id") % 2 === 0)
      .select("event_type", "event_id", "value")
    assert(allNodes(finalPlan(df)).exists(_.isInstanceOf[TopKPerGroupExec]),
      "conjunctive rn filter should still rewrite")
    // semantics: rn computed over all rows, THEN both predicates — i.e.
    // even-id rows among each group's top-4, not top-4 of the even rows
    val expect = windowTopK(4).where(col("event_id") % 2 === 0).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
  }

  test("pagination `rn <= k AND rn >= j` does NOT rewrite (wrong semantics for a heap)") {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val df = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 4 && col("rn") >= 2)
      .select("event_type", "event_id")
    assert(!allNodes(finalPlan(df)).exists(_.isInstanceOf[TopKPerGroupExec]))
    assert(df.count() === windowTopK(4).count() -
      Tables.events(spark, sf).select("event_type").distinct().count())
  }

  test("huge k stays on the window path and still answers") {
    // regression: k = Int.MaxValue used to eagerly allocate a k+1 array
    // per group (negative capacity → IllegalArgumentException)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val df = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= Int.MaxValue)
      .select("event_id")
    assert(!allNodes(finalPlan(df)).exists(_.isInstanceOf[TopKPerGroupExec]),
      "k above MaxRewriteK must not rewrite")
    assert(df.count() === Tables.events(spark, sf).count())
    // and the direct operator API with a huge k must not crash either
    val ev = Tables.events(spark, sf).limit(50)
    val direct = graft.plans.TopKPerGroupOps.topKPerGroup(spark, ev,
      Seq(ev("event_type")), Seq(ev("value").desc), Int.MaxValue)
    assert(direct.count() === 50)
  }

  test("rank() <= k rewrites to WITH-TIES retention and keeps boundary ties") {
    // bucket value to force heavy ties on the sort key
    val base = Tables.events(spark, sf).withColumn("vb", floor(col("value") / 50))
    val w = Window.partitionBy(col("event_type")).orderBy(col("vb").desc)
    val df = base.withColumn("rk", rank().over(w))
      .where(col("rk") <= 3)
      .select("event_type", "event_id", "vb")
    val plan = finalPlan(df)
    val custom = allNodes(plan).collect { case t: TopKPerGroupExec => t }
    assert(custom.nonEmpty, s"rank rewrite did not fire:\n$plan")
    assert(custom.forall(_.withTies), "rank must map to the WITH-TIES mode")
    assert(!allNodes(plan).exists(_.getClass.getSimpleName.startsWith("Window")),
      "the Window exec should be gone after the rank rewrite")
    // reference: driver-side rank (row kept iff <3 strictly-greater keys)
    val rows = base.select("event_type", "event_id", "vb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val keys = g.map(_._3)
      g.filter(t => keys.count(_ > t._3) < 3)
    }.map(t => (t._1, t._2)).toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
    // the bucketing genuinely produced boundary ties (WITH TIES > exact k)
    assert(got.size > 3 * rows.map(_._1).distinct.length,
      "test data produced no ties — rank coverage is vacuous")
  }

  test("dense_rank() <= k does NOT rewrite (different retention semantics)") {
    val base = Tables.events(spark, sf).withColumn("vb", floor(col("value") / 50))
    val w = Window.partitionBy(col("event_type")).orderBy(col("vb").desc)
    val df = base.withColumn("rk", dense_rank().over(w))
      .where(col("rk") <= 3)
      .select("event_type", "event_id")
    assert(!allNodes(finalPlan(df)).exists(_.isInstanceOf[TopKPerGroupExec]),
      "dense_rank must stay on the window path")
  }

  test("direct operator API with k = 0 returns empty in both retention modes") {
    // regression: the heap path NPE'd on peek() and the tie path on
    // lastKey() — the exec must short-circuit like the rewrite does
    val ev = Tables.events(spark, sf).limit(50)
    assert(graft.plans.TopKPerGroupOps.topKPerGroup(spark, ev,
      Seq(ev("event_type")), Seq(ev("value").desc), 0).count() === 0)
    assert(graft.plans.TopKPerGroupOps.topKPerGroup(spark, ev,
      Seq(ev("event_type")), Seq(ev("value").desc), 0, withTies = true)
      .count() === 0)
  }

  test("rn = 1 (argmax per group) also rewrites") {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val df = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("event_type", "event_id")
    assert(allNodes(finalPlan(df)).exists(_.isInstanceOf[TopKPerGroupExec]))
    assert(df.count() === Tables.events(spark, sf)
      .select("event_type").distinct().count())
  }
}
