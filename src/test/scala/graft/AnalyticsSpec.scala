package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics + plan-shape checks for the round-5 feature/analytics
  * operators (q144-q154). The oracle hash pins values; these specs pin
  * the SCALE properties the hash can't see — shuffle counts, window
  * pass counts, and the driver-loop invariants of the iterative ops.
  */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", "target/graft-warehouse")
        .config("spark.ui.enabled", "false")
        .appName("analytics-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  import PlanTestUtils.{allNodes, finalPlan}

  test("q146 EWMA runs as ONE window pass (all 16 lag taps share a frame)") {
    val p = finalPlan(SparkEntry.queries("q146_ewma_window")(spark, sf))
    val windows = allNodes(p).collect { case w: WindowExec => w }
    assert(windows.length == 1, s"expected 1 WindowExec, got ${windows.length}")
  }

  test("q145 interpolation fills every grid day and preserves observed values") {
    val rows = SparkEntry.queries("q145_linear_interpolate")(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val days = rs.map(r => java.time.LocalDate.parse(r.getString(1)).toEpochDay)
      assert(days.max - days.min + 1 == days.length, "grid has holes")
    }
    // interpolated values sit between the surrounding observations
    assert(rows.forall(r => !r.isNullAt(3)), "null v_interp on a bounded grid")
  }

  test("q149 Z-order buckets bound BOTH dimensions (the data-skipping property)") {
    val rows = SparkEntry.queries("q149_zorder_layout")(spark, sf).collect()
    // Morton prefix => each bucket spans at most a 16-wide aligned range
    // per dimension (8 bits interleaved, top 4+4 kept after >> 8)
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 16, s"x range too wide: $r")
      assert(r.getLong(5) - r.getLong(4) < 16, s"d range too wide: $r")
    }
  }

  test("q152 k-means assignment is map-side: no shuffle between scan and partial agg") {
    // The whole per-iteration pass must be scan -> project(argmin) ->
    // partial agg -> single exchange of K rows -> final agg. One
    // exchange per aggregation, nothing proportional to data size.
    val p = finalPlan(SparkEntry.queries("q152_kmeans_lloyd")(spark, sf))
    val exchanges = allNodes(p).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.length <= 2, // final agg + presentation sort
      s"k-means final pass should shuffle only K rows: ${exchanges.length} exchanges")
  }

  test("q151 PageRank conserves probability mass (sums to ~1)") {
    val rows = SparkEntry.queries("q151_host_pagerank")(spark, sf).collect()
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass drifted: $total")
  }

  test("q150 SCD2 intervals tile each user's timeline without overlap") {
    val rows = SparkEntry.queries("q150_scd2_intervals")(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getString(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(3) == b.getString(2),
            s"gap/overlap between ${a.getString(3)} and ${b.getString(2)}")
        case _ => ()
      }
      assert(sorted.last.getString(3) == "open" && sorted.last.getInt(4) == 1)
      assert(sorted.init.forall(_.getInt(4) == 0))
    }
  }

  test("q153 funnel stages are monotonically non-increasing") {
    val r = SparkEntry.queries("q153_event_funnel")(spark, sf).collect()(0)
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2))
  }

  test("q154 cohort matrix: week-0 cell equals cohort size") {
    val rows = SparkEntry.queries("q154_retention_cohort")(spark, sf).collect()
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (_, rs) =>
      val w0 = rs.find(_.getLong(1) == 0L).map(_.getLong(2)).getOrElse(0L)
      assert(rs.forall(_.getLong(2) <= w0),
        "a later week exceeds the cohort's week-0 population")
    }
  }
}
