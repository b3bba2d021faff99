package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants for the MLlib pipeline query (q191, rows-only): the
  * fitted model must beat chance on its training set, produce finite
  * coefficients for every feature, and emit a fixed-shape summary.
  */
class MLOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", "target/graft-warehouse")
        .config("spark.ui.enabled", "false")
        .appName("ml-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q191 MLlib logreg fits above chance with finite coefficients") {
    val rows = SparkEntry.queries("q191_mllib_logreg")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.size == graft.functions.Retain.F + 3, rows.keys.toSeq.sorted)
    assert(rows("train_auc") >= 0.5, s"auc=${rows("train_auc")}")
    assert(rows("n_rows") > 0)
    val coefs = rows.filter(_._1.startsWith("coef_")).values
    assert(coefs.forall(c => !c.isNaN && !c.isInfinite))
    assert(coefs.exists(_ != 0.0), "all-zero coefficients")
  }
}
