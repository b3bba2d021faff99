package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("explain")
    val d = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"===== $q =====")
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      println(plan.linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
