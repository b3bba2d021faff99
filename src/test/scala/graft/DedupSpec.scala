package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Dedup-pipeline invariants (SURVEY.md §5.2.3 "dedup idempotence") on
  * the sf0.001 documents: keep-first dedup by token-set fingerprint is
  * idempotent, removes exactly the J=1.0 token-set pairs, and preserves
  * one representative per cluster.
  */
class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("dedup-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def withFp(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("setfp",
      md5(array_join(array_sort(array_distinct(
        filter(split(col("text"), " "), w => w =!= ""))), " ")))

  private def dedup(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("setfp")).orderBy(col("doc_id"))
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  test("token-set dedup is idempotent and keeps one doc per cluster") {
    val docs = withFp(Tables.documents(spark, sf))
    val once = dedup(docs).cache()
    val twice = dedup(once)
    assert(once.count() == twice.count(), "second dedup removed more rows")
    // exactly one representative per distinct fingerprint
    assert(once.count() == docs.select("setfp").distinct().count())
    // representatives are the min doc_id of each cluster
    val reps = once.select("setfp", "doc_id")
    val minIds = docs.groupBy("setfp").agg(min("doc_id").as("doc_id"))
    assert(reps.except(minIds).count() == 0 && minIds.except(reps).count() == 0)
  }

  test("after dedup no two docs share a token set") {
    val once = dedup(withFp(Tables.documents(spark, sf)))
    val dupFp = once.groupBy("setfp").count().where(col("count") > 1).count()
    assert(dupFp == 0)
  }
  test("q62 exact-Jaccard guard trips past MaxExactJaccardClasses and passes below") {
    // the guard is the q62 scale fence (round 9/10): the exact class-pair
    // join is Theta(C^2 per source) BY CONTRACT, so past the per-source
    // class ceiling it must fail LOUDLY and point at the sub-quadratic
    // banding path rather than silently launching a quadratic join
    val limit = graft.operators.LLMPipeline.MaxExactJaccardClasses
    def cls(c: Long) = spark.range(c)
      .select(lit("src00000001").as("source"), col("id"))
    // below the ceiling: no-op
    graft.operators.LLMPipeline.guardExactJaccard(cls(1000))
    // above it: loud failure naming the banding alternative
    val e = intercept[IllegalStateException] {
      graft.operators.LLMPipeline.guardExactJaccard(cls(limit + 1))
    }
    assert(e.getMessage.contains("MaxExactJaccardClasses"))
    assert(e.getMessage.contains("banding"))
  }

}
