package graft.operators

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming panel at realistic P (round 10, VERDICT r9 #2): q357's
  * watermarked grid aggregation has only ever maintained a ~5-element
  * fixture grid; the engine claims P ≈ 10⁴. This spec pushes the
  * CausalScaleSpec P=2000 fixture (50 orthogonal latent clusters, T=64)
  * through the SAME aggregation shape — groupBy(window(ts, 1 day),
  * element) with a 40-day watermark, complete mode, foreachBatch — and
  * MEASURES what the q357 design argues:
  *
  *  - state is O(P·T) GRID CELLS (exactly P·T = 128,000 state rows, with
  *    the store's measured byte size recorded to BENCH_NOTES), not raw
  *    event rows;
  *  - per-refresh READOUT cost tracks the grid, not cumulative ingested
  *    volume: after a second wave multiplying total events 8×, the
  *    element-grain panel readout over the materialized grid (q316's
  *    permutation entropy) must not grow with it. The grid
  *    MATERIALIZATION itself (state-store read + Spark's complete-mode
  *    re-execution of the micro-batch, which re-scans the new batch by
  *    contract — O(new data), the ingest cost every engine pays once)
  *    is measured and reported but not asserted: round 17 found its
  *    wall time both volume-dependent by construction and the suite's
  *    noisiest measurement under ambient steal (8.8–89 s for identical
  *    work across runs), i.e. it pins the box, not the plan. The
  *    engine's own q357 path pays that read exactly once per refresh
  *    (the round-17 collect + re-root) — the property this spec guards
  *    is that the READOUT side never re-pays raw volume;
  *  - a real panel readout is exercised at P=2000, ordinal-pattern
  *    counts over all 128k cells — the element-grain family that runs
  *    per-refresh unscreened (the PAIR family at P=2000 goes through the
  *    q251 screen first; its 16 s P=2000 cost is measured in
  *    CausalScaleSpec — that is a screened-refresh cost, not per-batch
  *    grid maintenance).
  *
  * Reference anchor: `model.py:296-310` dumps the live B matrix each
  * epoch — this is that dashboard at the scale the engine claims.
  */
class PanelScaleSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
        .config("spark.ui.enabled", "false")
        .appName("panel-scale-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val P = 2000
  private val T = 64

  /** One wave of synthetic events: `copies` events per (el, di) grid
    * cell, values split so the per-cell mean stays the cluster factor
    * (CausalScaleSpec's fixture semantics, event-ized). */
  private def wave(copies: Int, offset: Int): Seq[(java.sql.Timestamp, String, Double)] = {
    def factor(c: Int, ti: Int): Double = {
      val k = c / 2 + 1
      val ang = 2.0 * math.Pi * k * ti / 64.0
      if (c % 2 == 0) math.cos(ang) else math.sin(ang)
    }
    val day0 = java.time.LocalDate.parse("2024-01-01")
    for {
      i <- 0 until P
      ti <- 0 until T
      c <- 0 until copies
    } yield {
      // UTC instants: Timestamp.valueOf would interpret the wall time in
      // the JVM's zone and spill late hours across UTC day windows
      val ts = java.sql.Timestamp.from(day0.plusDays(ti)
        .atTime(1 + ((c + offset) % 20), 0).toInstant(java.time.ZoneOffset.UTC))
      (ts, f"e$i%04d", factor(i % 50, ti))
    }
  }

  test("P=2000 panel aggregation: state is exactly P*T cells; refresh readout cost tracks the grid, not cumulative volume") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = stream.toDF().toDF("ts", "el", "value")
      .withWatermark("ts", "40 days")
      .groupBy(window(col("ts"), "1 day").as("w"), col("el"))
      .agg(sum(col("value").cast("decimal(18,3)")).as("sv"),
        count(lit(1)).as("n"))

    val gridRows = scala.collection.mutable.ArrayBuffer[Long]()
    val gridSecs = scala.collection.mutable.ArrayBuffer[Double]()
    val readoutSecs = scala.collection.mutable.ArrayBuffer[Double]()
    val q = graft.streaming.Streaming.withStreamConf(ss) {
      agg.writeStream.outputMode("complete")
        .foreachBatch { (b: DataFrame, _: Long) =>
          val t0 = System.nanoTime()
          // PERSIST the per-batch grid before fanning out readouts:
          // every action inside foreachBatch re-executes the stateful
          // aggregation (re-reading the state store and double-counting
          // its progress metrics) — measured here, and the reason q357
          // persists its grid across the ten readouts (round 10)
          val grid = b.select(col("el"),
            datediff(col("w.start").cast("date"), lit("2024-01-01").cast("date"))
              .as("di"),
            (col("sv").cast("double") / col("n")).as("v"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // grid materialization: state-store read + the micro-batch
            // re-execution complete mode performs on every action —
            // O(new batch) ingest-class work, reported not asserted
            gridRows += grid.count()
            gridSecs += (System.nanoTime() - t0) / 1e9
            // the asserted guard: an element-grain panel readout (q316
            // permutation entropy) over the materialized O(P·T) grid
            val t1 = System.nanoTime()
            val ent = graft.operators.CointOps.permEntropyFromGrid(grid)
            val nEnt = ent.count()
            assert(nEnt == P.toLong, s"one entropy row per element, got $nEnt")
            readoutSecs += (System.nanoTime() - t1) / 1e9
          } finally grid.unpersist()
          ()
        }.start()
    }
    try {
      stream.addData(wave(1, 0))
      q.processAllAvailable()
      // 7 more events per cell — cumulative raw volume ×8, grid unchanged
      stream.addData(wave(7, 1))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty, "expected a stateful aggregation operator")
      // progress lists the restore and save facets of the one
      // aggregation state — max, not sum, is the store's row count
      val rows = state.map(_.numRowsTotal).max
      val bytes = state.map(_.memoryUsedBytes).max
      assert(rows === P.toLong * T,
        s"state must be one row per (el, day) grid cell: got $rows, want ${P * T}")
      assert(gridRows.forall(_ == P.toLong * T),
        s"every refresh derives the full P*T grid: $gridRows")
      assert(readoutSecs.size >= 2)
      // the second refresh ingests 7x the events but re-derives the SAME
      // grid; the readout over that grid must not track cumulative
      // volume (warm codegen typically makes it FASTER; 2x is noise)
      assert(readoutSecs.last <= readoutSecs.head * 2 + 1.0,
        f"readout cost grew with raw volume: ${readoutSecs.mkString(", ")}")
      info(f"state: $rows rows, ${bytes / 1024.0 / 1024.0}%.1f MiB for P=$P T=$T")
      info(f"per-refresh grid materialization (unasserted, ingest-class): " +
        f"${gridSecs.map(t => f"$t%.1f").mkString(", ")} s")
      info(f"per-refresh entropy readout over the grid: " +
        f"${readoutSecs.map(t => f"$t%.1f").mkString(", ")} s")
    } finally q.stop()
  }
}
