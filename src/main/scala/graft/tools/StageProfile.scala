package graft.tools

import graft.{GraftSession, SparkEntry}

/** Permanent per-stage profiling main (the structural fix for the
  * ScratchAB/ProbeQ04 recurrence, VERDICT r16 "What's wrong" #1): stage
  * profiling is a standing diagnostic need at the scale rungs, so it
  * lives as a documented tool under graft.tools instead of a scratch
  * file that keeps getting committed by accident.
  *
  * Usage: runMain graft.tools.StageProfile <queryName> <sfDir> [reps]
  *
  * Runs the named SparkEntry query against the given data dir `reps`
  * times (default 2 — one cold, one warm) and prints, per run, one line
  * per stage: tasks, input records, shuffle read/write records, spill
  * MB, max task ms, sum task ms, and the max single-task read share
  * (skew indicator). Wraps [[graft.operators.Observability.profile]].
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q04_join_inner_agg")
    val dir = args.lift(1).getOrElse("/tmp/graft_sf100")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.build(s"stage-profile-$name")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val obs = graft.operators.Observability.profile(spark) {
        fn(spark, dir).count()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $name rep=$rep wall=$wall%.1f s, stages=${obs.size}")
      println("stageId | nTasks | inputRec | shufRead | shufWrite | spillMB | maxTaskMs | sumTaskMs | maxReadShare")
      obs.foreach { o =>
        println(f"${o.stageId}%7d | ${o.nTasks}%6d | ${o.inputRecords}%9d | ${o.shuffleReadRecords}%9d | ${o.shuffleWriteRecords}%9d | ${o.spillBytes / 1e6}%7.1f | ${o.maxTaskDurMs}%9d | ${o.sumTaskDurMs}%9d | ${o.maxTaskReadShare}%5.3f")
      }
    }
    spark.stop()
  }
}
