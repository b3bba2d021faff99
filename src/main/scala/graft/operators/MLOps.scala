package graft.operators

import graft.QueryDef
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.StandardScaler
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** MLlib surface (the driver north star names "MLlib + DataFrame window
  * functions" explicitly): a standard `ml.Pipeline` — StandardScaler →
  * LogisticRegression — trained on the shared RETAIN feature grid,
  * predicting the same task-0 onset label the reference's task heads
  * predict (`model.py:149-159`). The MLlib estimator is the library
  * alternative to the engine's hand-rolled AMTL trainer (q79/q94):
  * same featurized input, same treeAggregate-style distributed
  * gradient shape inside LBFGS, driver-held coefficients.
  */
object MLOps {

  val defs: Seq[QueryDef] = Seq(

    /** Rows-only (iterative optimizer output is not ANSI-SQL
      * expressible); invariants pinned in MLOpsSpec: AUC ≥ 0.5 on the
      * training set, finite non-zero coefficients, deterministic row
      * count (F + 3 summary rows).
      */
    QueryDef.noOracle("q191_mllib_logreg") { (s, d) =>
      import s.implicits._
      // mean-pool the [T][F] grid to F features per entity — the
      // classical fixed-length featurization next to RETAIN's attention
      val data = RetainOps.featurized(s, d)
        .map { case (_, x, ys) =>
          val f = new Array[Double](graft.functions.Retain.F)
          var t = 0
          while (t < x.length) {
            var i = 0
            while (i < f.length) { f(i) += x(t)(i) / x.length; i += 1 }
            t += 1
          }
          (Vectors.dense(f), ys(0))
        }.toDF("rawFeatures", "label")
      val pipe = new Pipeline().setStages(Array(
        new StandardScaler().setInputCol("rawFeatures").setOutputCol("features")
          .setWithMean(true).setWithStd(true),
        new LogisticRegression().setMaxIter(25).setRegParam(0.01)
          .setStandardization(false)))
      val model = pipe.fit(data)
      val lr = model.stages(1)
        .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
      val scored = model.transform(data)
      val auc = new BinaryClassificationEvaluator()
        .setRawPredictionCol("rawPrediction").evaluate(scored)
      val coefRows = lr.coefficients.toArray.zipWithIndex.map {
        case (c, i) => (f"coef_$i%02d", c)
      }
      val rows = coefRows.toSeq ++ Seq(
        ("intercept", lr.intercept),
        ("train_auc", auc),
        ("n_rows", data.count().toDouble))
      s.createDataFrame(rows).toDF("term", "value")
        .select(col("term"), round(col("value"), 6).as("value"))
        .orderBy("term")
    }
  )
}
