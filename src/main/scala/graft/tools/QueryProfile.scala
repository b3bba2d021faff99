package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job wall-clock breakdown for one or more queries under the exact
  * Bench methodology (same session build, same table warm, same
  * `.count()` action) — answers "where does this query's wall time go":
  * which Spark jobs run, how long each takes, and how much wall time is
  * driver-side gaps between jobs (planning, collect, checkpoint setup).
  *
  * Usage: runMain graft.tools.QueryProfile <q1,q2,...> [sfDir] [reps]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = GraftSession.build("query-profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")) {
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try graft.streaming.Streaming.warm(spark, sfDir)
    catch { case _: Throwable => () }

    final case class Job(id: Int, desc: String, t0: Long, var t1: Long,
        var stages: Int, var tasks: Long, var taskMs: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties).map(_.getProperty("spark.job.description"))
          .flatMap(Option(_)).getOrElse("")
        jobs.put(e.jobId, Job(e.jobId, d, e.time, e.time, e.stageIds.size, 0L, 0L))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        // attach to the most recent job that contains this stage: jobs
        // know their stage ids only at submit; cheap approximation — we
        // only need totals per job, match by stage id set
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (q <- names; rep <- 1 to reps) {
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(q)(spark, sfDir).count()
      catch { case e: Throwable =>
        println(s"FAILED $q: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(160)}")
        -1L
      }
      val wall = (System.nanoTime() - t0) / 1e9
      try org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      catch { case _: Throwable => () }
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.distinct.flatMap(id => Option(jobs.get(id)))
      val jobSum = js.map(j => (j.t1 - j.t0) / 1e3).sum
      println(f"QPROFILE $q rep=$rep wall=$wall%.2f s rows=$n jobs=${js.size} jobWallSum=$jobSum%.2f s driverGap=${wall - jobSum}%.2f s")
      js.foreach { j =>
        val d = if (j.desc.length > 90) j.desc.take(90) else j.desc
        println(f"  job ${j.id}%4d ${(j.t1 - j.t0) / 1e3}%7.2f s  $d")
      }
      // drop whatever this run cached so the next rep is cold again
      if (rep < reps) graft.PlanCache.drop(graft.PlanCache.keys)
    }
    spark.stop()
  }
}
