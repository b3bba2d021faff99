package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Column-kernel numerics vs closed forms (SURVEY.md §5.2.2/5.2.3) on a
  * tiny in-memory frame — softmax shift-invariance, CE at known points,
  * array dot/norm against hand computation.
  */
class KernelsSpec extends AnyFunSuite with BeforeAndAfterAll {
  import graft.functions.Kernels

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("kernels-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def one(colExpr: org.apache.spark.sql.Column): Double =
    spark.range(1).select(colExpr.cast("double").as("v")).head().getDouble(0)

  test("sigmoid(0)=0.5, CE(z=0,y=1)=ln 2") {
    assert(math.abs(one(Kernels.sigmoid(lit(0.0))) - 0.5) < 1e-15)
    assert(math.abs(one(Kernels.sigmoidCrossEntropy(lit(0.0), lit(1.0))) - math.log(2)) < 1e-12)
  }

  test("stable CE equals naive CE away from overflow") {
    for (z <- Seq(-3.0, -0.5, 0.7, 4.0); y <- Seq(0.0, 1.0)) {
      val p = 1.0 / (1.0 + math.exp(-z))
      val naive = -(y * math.log(p) + (1 - y) * math.log(1 - p))
      assert(math.abs(one(Kernels.sigmoidCrossEntropy(lit(z), lit(y))) - naive) < 1e-10,
        s"z=$z y=$y")
    }
  }

  test("stable CE does not overflow at |z|=1000") {
    val v = one(Kernels.sigmoidCrossEntropy(lit(1000.0), lit(0.0)))
    assert(v == 1000.0) // max(z,0) - 0 + log1p(exp(-1000)) = 1000
  }

  test("arrayDot / arrayNorm / cosine match hand computation") {
    val a = array(lit(1.0), lit(2.0), lit(-2.0))
    val b = array(lit(3.0), lit(0.5), lit(1.0))
    assert(math.abs(one(Kernels.arrayDot(a, b)) - 2.0) < 1e-12)
    assert(math.abs(one(Kernels.arrayNorm(a)) - 3.0) < 1e-12)
    val cos = 2.0 / (3.0 * math.sqrt(9 + 0.25 + 1))
    assert(math.abs(one(Kernels.cosine(a, b)) - cos) < 1e-12)
  }

  test("vecMat matches manual matrix multiply") {
    val m = Array(Array(1.0, 0.0), Array(0.5, -1.0)) // 2x2
    val v = array(lit(2.0), lit(4.0))
    val out = Kernels.vecMat(v, m)
    assert(math.abs(one(element_at(out, 1)) - (2.0 * 1.0 + 4.0 * 0.5)) < 1e-12)
    assert(math.abs(one(element_at(out, 2)) - (2.0 * 0.0 + 4.0 * -1.0)) < 1e-12)
  }

  test("window softmax is shift-invariant and sums to 1 per partition") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 1.0), (1, 2.0), (1, 3.0), (2, 10.0), (2, 10.0)).toDF("g", "v")
    val p = org.apache.spark.sql.expressions.Window.partitionBy("g")
    def softmax(c: org.apache.spark.sql.Column) =
      exp(c - max(c).over(p)) / sum(exp(c - max(c).over(p))).over(p)
    val sums = df.select(col("g"), softmax(col("v")).as("sm"))
      .groupBy("g").agg(sum("sm").as("s")).collect()
    assert(sums.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))
    val shifted = df.select(col("g"), softmax(col("v") + 100.0).as("sm")).collect()
    val plain = df.select(col("g"), softmax(col("v")).as("sm")).collect()
    assert(shifted.map(_.getDouble(1)).sorted.zip(plain.map(_.getDouble(1)).sorted)
      .forall { case (x, y) => math.abs(x - y) < 1e-12 })
  }
}
