package graft

import graft.operators.Observability
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the deterministic half of the q227 stage profiler: record
  * conservation, and the claim salting exists to make true — the
  * heaviest task's shuffle-read share is strictly smaller under the
  * salted (key, salt) shuffle than under the plain hot-key shuffle,
  * whose max share is lower-bounded by q221's top-1 key share. AQE
  * partition coalescing is pinned OFF inside the comparison so the
  * share reflects the partitioning, not runtime bin-packing of a tiny
  * test input.
  */
class ObservabilitySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("observability-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def withoutCoalesce[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("q227 emits a profile whose stages conserve q93's shuffle records") {
    val rows = SparkEntry.queries("q227_stage_profile")(spark, sf).collect()
    assert(rows.nonEmpty, "no stages profiled")
    val written = rows.map(_.getLong(4)).sum
    val read = rows.map(_.getLong(3)).sum
    assert(written > 0, "q93 must shuffle something")
    // every shuffled record is read at least once (AQE may re-read an
    // exchange, e.g. the range-partitioner sampling pass of an orderBy,
    // so exact equality is not guaranteed — but nothing written may
    // vanish unread)
    assert(read >= written, s"read $read < written $written")
    rows.foreach { r =>
      val share = r.getDouble(6)
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $share")
      if (r.getLong(3) > 0)
        assert(share >= 1.0 / math.max(r.getLong(1), 1), "share below uniform floor")
    }
  }

  test("salted shuffle bounds the hot task; plain hot-key shuffle concentrates it") {
    val salts = 16
    def maxReduceShare(df: => org.apache.spark.sql.DataFrame): Double = {
      val prof = withoutCoalesce {
        Observability.profile(spark) { df.collect(); () }
      }
      val reduces = prof.filter(_.shuffleReadRecords > 0)
      assert(reduces.nonEmpty, "no reduce stage found")
      // the reduce with the most read records is the data shuffle
      reduces.maxBy(_.shuffleReadRecords).maxTaskReadShare
    }
    // plain: one partition per event_type value (5 keys, 8 partitions)
    val plainShare = maxReduceShare {
      Tables.events(spark, sf).groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
    }
    // salted: the q201/q93 two-phase shape over (event_type, salt)
    val saltedShare = maxReduceShare {
      Tables.events(spark, sf)
        .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
    }
    // q221's skew audit: the top-1 event_type share is the floor for the
    // hot task's share in the PLAIN shuffle
    val top1 = SparkEntry.queries("q221_skew_audit")(spark, sf).collect()
      .filter(_.getString(0) == "event_type").map(_.getDouble(5)).head
    assert(plainShare >= top1 - 1e-9,
      s"plain max-task share $plainShare below q221 top-1 key share $top1")
    assert(saltedShare < plainShare,
      s"salting did not spread the shuffle: salted $saltedShare vs plain $plainShare")
    assert(saltedShare <= 0.5, s"salted share still concentrated: $saltedShare")
  }

  test("causal family reuses the PlanCache grid: q230 after q229 never rescans events") {
    // the round-8 claim measured, not asserted from the docstring: once
    // q229 materializes the shared (element, day) grid, a sibling causal
    // query's profiled input is the tiny cached grid (a few hundred
    // records), not the fact table
    SparkEntry.queries("q229_lead_lag_corr")(spark, sf).collect()
    val obs = Observability.profile(spark) {
      SparkEntry.queries("q230_granger_lite")(spark, sf).collect(); ()
    }
    val input = obs.map(_.inputRecords).sum
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(input < events / 2,
      s"q230 re-scanned the fact table: profiled input=$input, events=$events")
  }
}
