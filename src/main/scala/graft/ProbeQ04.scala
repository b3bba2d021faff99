package graft

/** Scratch probe (deleted before commit): q04 per-stage profile at a
  * scale dir — VERDICT r14 #6 / r15 #6. Prints one line per stage:
  * tasks, input records, shuffle read/write records, spill bytes, max
  * task ms, sum task ms, max-read share.
  */
object ProbeQ04 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = GraftSession.build("probe-q04")
    val t0 = System.nanoTime()
    val obs = graft.operators.Observability.profile(spark) {
      SparkEntry.queries("q04_join_inner_agg")(spark, d).count()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"PROBE q04 wall=$wall%.1f s, stages=${obs.size}")
    println("stageId | nTasks | inputRec | shufRead | shufWrite | spillMB | maxTaskMs | sumTaskMs | maxReadShare")
    obs.foreach { o =>
      println(f"${o.stageId}%7d | ${o.nTasks}%6d | ${o.inputRecords}%9d | ${o.shuffleReadRecords}%9d | ${o.shuffleWriteRecords}%9d | ${o.spillBytes / 1e6}%7.1f | ${o.maxTaskDurMs}%9d | ${o.sumTaskDurMs}%9d | ${o.maxTaskReadShare}%5.3f")
    }
    spark.stop()
  }
}
