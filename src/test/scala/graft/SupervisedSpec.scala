package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Closed-form behavior of the supervised/privacy family (q320-q323)
  * on constructed scratch tables, plus the q324 streaming==batch pin:
  * the ridge solve recovers an exactly-linear relationship, LOO target
  * encoding matches hand-computed values including the cold-category
  * pure-prior case, and the k-anonymity audit counts a planted
  * singleton exactly.
  */
class SupervisedSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var tmp: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("supervised-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    tmp = java.nio.file.Files.createTempDirectory("graft_supervised").toString
    val s = spark
    import s.implicits._
    // exactly-linear lineitem: y = 5 + 2q - 3d + 4t, over a feature grid
    // with plenty of independent variation
    val li = (for {
      q <- 1 to 20; d <- 0 to 4; t <- 0 to 3
    } yield (q.toDouble, d / 10.0, t / 20.0,
      5.0 + 2.0 * q - 3.0 * (d / 10.0) + 4.0 * (t / 20.0)))
      .toDF("l_quantity", "l_discount", "l_tax", "l_extendedprice")
    li.coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    // orders: category A = {10, 20}, B = {30} (cold category -> pure prior)
    val o = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    o.coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // customers: nation 0 = six rows in one bin sharing one segment
    // (k-safe but 1-diverse), nation 1 = a singleton (k = 1)
    val c = ((1 to 6).map(i => (i.toLong, s"c$i", 0L, 500.0, "AUTO")) :+
      (7L, "c7", 1L, 500.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    c.coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q320 ridge recovers an exactly-linear model (b=(2,-3,4), intercept 5, r2 ~ 1)") {
    val r = SparkEntry.queries("q320_ridge_gram")(spark, tmp).head()
    assert(math.abs(r.getAs[Double]("b_quantity") - 2.0) < 1e-4, s"$r")
    assert(math.abs(r.getAs[Double]("b_discount") + 3.0) < 1e-3, s"$r")
    assert(math.abs(r.getAs[Double]("b_tax") - 4.0) < 1e-3, s"$r")
    assert(math.abs(r.getAs[Double]("intercept") - 5.0) < 1e-4, s"$r")
    assert(r.getAs[Double]("r2") > 0.999999, s"$r")
  }

  test("q320 on real data: R2 in (0,1], coefficients finite, one-row output") {
    val rows = SparkEntry.queries("q320_ridge_gram")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Double]("r2") > 0.0 && r.getAs[Double]("r2") <= 1.0, s"$r")
    Seq("b_quantity", "b_discount", "b_tax", "intercept")
      .foreach(cn => assert(!r.getAs[Double](cn).isNaN, s"$cn in $r"))
  }

  test("q321 LOO target encoding matches hand-computed values incl. the cold-category prior") {
    // global: n=3, sum=60. For A row y=10: loo-others=20-10? scat_A=30.
    //   enc = ((30-10) + 10*((60-10)/2)) / (1+10) = (20+250)/11
    //   enc = ((30-20) + 10*((60-20)/2)) / 11     = (10+200)/11
    // For B (cnt=1): enc = (0 + 10*((60-30)/2)) / (0+10) = 15.0 exactly
    val rows = SparkEntry.queries("q321_target_encoding")(spark, tmp).collect()
    val byCat = rows.map(r => r.getAs[String]("cat") ->
      (r.getAs[Long]("n"), r.getAs[Double]("enc_min"), r.getAs[Double]("enc_max"))).toMap
    val encA1 = (20.0 + 250.0) / 11.0
    val encA2 = (10.0 + 200.0) / 11.0
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byCat("A") == ((2L, r6(encA2), r6(encA1))), s"$byCat")
    assert(byCat("B") == ((1L, 15.0, 15.0)), s"$byCat")
  }

  test("q322/q323 count the planted singleton exactly") {
    val r = SparkEntry.queries("q322_k_anonymity")(spark, tmp).head()
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("k_anonymity") == 1L)
    assert(r.getAs[Long]("groups_lt2") == 1L)
    assert(r.getAs[Long]("records_lt5") == 1L)
    assert(r.getAs[Long]("groups_ldiv_lt2") == 2L) // both groups single-segment
    val lad = SparkEntry.queries("q323_generalization_ladder")(spark, tmp).collect()
    assert(lad.length == 3)
    // the singleton is nation-separated, so NO width fixes it: k_min = 1 at all widths
    lad.foreach(l => assert(l.getAs[Long]("k_min") == 1L && l.getAs[Int]("k5_ok") == 0))
  }

  test("q324 streaming cointegration refresh == batch q314, row for row") {
    val sf = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q314_cointegration")(spark, sf).collect().toSeq
    val stream = SparkEntry.queries("q324_stream_coint")(spark, sf).collect().toSeq
    assert(batch.nonEmpty && batch == stream)
  }
}
