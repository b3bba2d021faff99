package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-evidence dump for the optimization rounds: writes
  * `explain("formatted")` for each named query to
  * `plans/<tag>/<query>_<suffix>.txt` so before/after plan claims in
  * OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage: runMain graft.tools.PlanDump <tag> <suffix> <q1,q2,...> [sfDir]
  *   e.g. runMain graft.tools.PlanDump r17 before q311_hits,q379_pca_power
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("r17")
    val suffix = args.lift(1).getOrElse("before")
    val names = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build(s"plan-dump-$tag")
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    for (q <- names) {
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${q}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"wrote plans/$tag/${q}_$suffix.txt (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          println(s"FAILED $q: ${Option(e.getMessage).getOrElse(e.getClass.getName)}")
      }
    }
    spark.stop()
  }
}
