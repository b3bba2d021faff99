package graft

import graft.functions.SigmoidCE
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native packaging of the engine's custom expressions: inject via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * so any session (spark-submit, thrift server, notebook) gets the
  * `sigmoid_ce` codegen expression without touching engine code.
  * [[graft.functions.SigmoidCE.register]] remains the per-session
  * programmatic path used by the queries themselves.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: plans graft.plans.TopKPerGroup logical
    // nodes as the partial/final bounded-heap exec pair
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // optimizer extension: window-function top-k idiom -> TopKPerGroup
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[graft.functions.SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "sorted_intersect_count(a, b) takes exactly 2 arguments")
        graft.functions.SortedIntersectCount(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler_sim"),
      new ExpressionInfo(classOf[graft.functions.JaroWinklerSim].getName,
        "jaro_winkler_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "jaro_winkler_sim(a, b) takes exactly 2 arguments")
        graft.functions.JaroWinklerSim(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("sigmoid_ce"),
      new ExpressionInfo(classOf[SigmoidCE].getName, "sigmoid_ce"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "sigmoid_ce(z, y) takes exactly 2 arguments")
        SigmoidCE(children.head, children(1))
      }))
  }
}
