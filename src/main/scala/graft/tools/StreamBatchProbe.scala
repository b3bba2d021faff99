package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic: does a finite complete-mode streaming aggregation with a
  * watermark fire a second, empty micro-batch after the watermark
  * advances (re-running the whole foreachBatch readout)?  Prints each
  * foreachBatch invocation's batchId, row count and wall time, with and
  * without the watermark, over the engine's staged event stream.
  *
  * Usage: runMain graft.tools.StreamBatchProbe [sfDir]
  */
object StreamBatchProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.build("stream-batch-probe")
    try graft.streaming.Streaming.warm(s, d) catch { case _: Throwable => () }

    def run(tag: String, withWm: Boolean): Unit = {
      val src0 = graft.streaming.Streaming.eventStream(s, d)
      val src = if (withWm) src0.withWatermark("ts", "40 days") else src0
      val agg = src
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type").as("el"))
        .agg(sum(col("value").cast("decimal(18,3)")).as("sv"),
          count(lit(1)).as("n"))
      val t0 = System.nanoTime()
      val q = graft.streaming.Streaming.withStreamConf(s) {
        agg.writeStream.outputMode("complete")
          .foreachBatch { (b: DataFrame, id: Long) =>
            val bt0 = System.nanoTime()
            val n = b.count()
            println(f"$tag foreachBatch id=$id rows=$n inner=${(System.nanoTime() - bt0) / 1e9}%.2f s at t=${(bt0 - t0) / 1e9}%.2f s")
          }.start()
      }
      try q.processAllAvailable() finally q.stop()
      println(f"$tag total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    run("WITH_WM", withWm = true)
    run("NO_WM", withWm = false)
    run("WITH_WM2", withWm = true)
    run("NO_WM2", withWm = false)
    s.stop()
  }
}
