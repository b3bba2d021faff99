package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariant checks for the stats/robust operators: the skyline
  * window-prune rewrite must equal the quadratic dominance definition
  * (in Spark, independent of the DuckDB oracle), the incremental merge
  * must equal the direct rollup, and the weighted sample must actually
  * be weight-biased.
  */
class StatsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", "target/graft-warehouse")
        .config("spark.ui.enabled", "false")
        .appName("stats-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q157 window-prune skyline equals the quadratic dominance definition") {
    val fast = SparkEntry.queries("q157_skyline_pareto")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val p = Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    val b = p.select(col("p_size").as("b_size"), col("p_retailprice").as("b_price"))
    // brute force: a survives iff no b dominates it
    val dominated = p.join(b,
        col("b_price") <= col("p_retailprice") && col("b_size") >= col("p_size") &&
          (col("b_price") < col("p_retailprice") || col("b_size") > col("p_size")),
        "left_semi")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val all = p.select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(fast == all -- dominated,
      s"rewrite=${fast.size} brute=${(all -- dominated).size}")
  }

  test("q158 incremental merge equals the direct rollup") {
    val merged = SparkEntry.queries("q158_incremental_agg")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val direct = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,3)")), 3)
          .cast("double").as("total"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(merged.sameElements(direct))
  }

  test("q166 weighted sample is biased toward heavy documents") {
    val sampleMean = SparkEntry.queries("q166_weighted_sample")(spark, sf)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("q156 profile null counts are zero on the clean tables and NDVs are positive") {
    val rows = SparkEntry.queries("q156_table_profile")(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getLong(1) == 0L))
    assert(rows.forall(_.getLong(2) > 0L))
  }

  test("q155 Markov rows are proper conditional distributions") {
    val rows = SparkEntry.queries("q155_markov_transitions")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val mass = rs.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"row mass $mass")
    }
  }

  test("q231 count-min never underestimates: est_n >= true_n on every probe") {
    val rows = SparkEntry.queries("q231_count_min")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("true_n"), s"$r")
    }
  }

  test("q232 both attribution models credit every purchase exactly once") {
    val rows = SparkEntry.queries("q232_attribution")(spark, sf).collect()
    val purchases = Tables.events(spark, sf).where("event_type = 'purchase'").count()
    Seq("first", "last").foreach { model =>
      val n = rows.filter(_.getString(0) == model).map(_.getAs[Long]("n")).sum
      assert(n == purchases, s"$model credits $n of $purchases purchases")
    }
  }
}
