package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Closed-form behavior of the corpus-quality family (q317-q319) on a
  * constructed corpus written to a scratch sf-dir, plus invariants on
  * the real testdata: the bigram LM ranks word salad above repetitive
  * text, DSIR scores a target-vocabulary doc above same-label peers,
  * and the 8-gram span union produces exactly the hand-counted
  * coverage.
  */
class QualityOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"
  private var tmp: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("quality-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    tmp = java.nio.file.Files.createTempDirectory("graft_quality").toString
    val s = spark
    import s.implicits._
    // en docs share vocabulary {alpha..delta}; fr docs use {un..quatre};
    // doc 5 is labeled fr but WRITTEN in the en vocabulary (the DSIR
    // probe); doc 6 is word salad (every bigram unseen elsewhere);
    // docs 7/8 share the 10-token run r1..r10; doc 9 is fully unique.
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta alpha beta", "en", "s0"),
      (2L, "beta alpha beta gamma delta alpha beta gamma delta alpha", "en", "s0"),
      (3L, "un deux trois quatre un deux trois quatre un deux", "fr", "s1"),
      (4L, "deux un deux trois quatre un deux trois quatre un", "fr", "s1"),
      (5L, "alpha beta gamma delta alpha beta gamma delta beta gamma", "fr", "s1"),
      (6L, "zig zag quux corge grault garply waldo fred plugh xyzzy", "en", "s2"),
      (7L, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 tailA1 tailA2 tailA3", "en", "s3"),
      (8L, "headB1 headB2 r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 tailB1", "en", "s3"),
      (9L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13", "en", "s3"))
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q317: the all-unseen-bigram doc tops the perplexity ranking; repetitive docs sit lowest") {
    val rows = SparkEntry.queries("q317_bigram_perplexity")(spark, tmp).collect()
    assert(rows.head.getAs[Long]("doc_id") == 6L,
      s"word salad must rank most-perplexing, got ${rows.toSeq}")
    val xents = rows.map(_.getAs[Double]("xent2"))
    assert(xents.sameElements(xents.sortBy(-_)), "must be sorted desc")
    // repetitive template docs (1-4) must all score below the salad doc
    val salad = rows.head.getAs[Double]("xent2")
    rows.filter(r => r.getAs[Long]("doc_id") <= 4L)
      .foreach(r => assert(r.getAs[Double]("xent2") < salad))
  }

  test("q318: the fr-labeled doc written in en vocabulary outranks true-fr docs on target-likeness") {
    val rows = SparkEntry.queries("q318_dsir_weights")(spark, tmp).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_logratio")).toMap
    assert(byDoc(5L) > byDoc(3L) && byDoc(5L) > byDoc(4L),
      s"en-vocabulary fr doc must look more target-like than true-fr docs: $byDoc")
    // and the en-vocabulary docs score above the fr-vocabulary ones generally
    assert(byDoc(1L) > byDoc(3L))
  }

  test("q319: hand-counted span coverage — shared 10-run covers exactly 10 tokens; unique doc covers 0") {
    val rows = SparkEntry.queries("q319_span_dedup")(spark, tmp).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("covered"), r.getAs[Double]("dup_frac"))).toMap
    // docs 7/8 share exactly r1..r10: 3 shared 8-grams starting at the
    // run head -> interval union spans the 10 run tokens, nothing else
    assert(byDoc(7L)._1 == 10L, s"$byDoc")
    assert(byDoc(8L)._1 == 10L, s"$byDoc")
    assert(byDoc(9L) == ((0L, 0.0)), s"unique doc must have zero coverage: $byDoc")
    // fractions are exact integer ratios
    assert(math.abs(byDoc(7L)._2 - BigDecimal(10.0 / 13)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("q317-q319 invariants on sf0.001: positive entropies, finite scores, fractions in [0,1]") {
    val p = SparkEntry.queries("q317_bigram_perplexity")(spark, sf).collect()
    assert(p.nonEmpty && p.forall(_.getAs[Double]("xent2") > 0.0))
    val w = SparkEntry.queries("q318_dsir_weights")(spark, sf).collect()
    assert(w.nonEmpty && w.forall(r => !r.getAs[Double]("dsir_logratio").isNaN))
    val c = SparkEntry.queries("q319_span_dedup")(spark, sf).collect()
    assert(c.nonEmpty && c.forall { r =>
      val f = r.getAs[Double]("dup_frac"); f >= 0.0 && f <= 1.0 &&
        r.getAs[Long]("covered") <= r.getAs[Long]("n_tokens")
    })
  }
}
