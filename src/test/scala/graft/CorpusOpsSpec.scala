package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants for the round-5 corpus-curation operators beyond what the
  * DuckDB hash-compare pins: hash-vs-string equivalence of the
  * decontamination join, distribution identities of the Zipf/mixture
  * outputs, and determinism of the hash-based sampler.
  */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("corpus-ops-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q138 hashed shingle join equals the string-shingle ground truth") {
    // recompute contamination with STRING shingles (no xxhash64): the
    // 64-bit hash join must not change any per-source count
    val ws = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        filter(split(col("text"), " "), w => w =!= "").as("ws"))
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 10)
      .where(size(col("ws")) >= 5)
    val sh = ws.select(col("doc_id"), col("source"), col("bucket"),
      explode(transform(sequence(lit(1), size(col("ws")) - 4),
        i => array_join(slice(col("ws"), i, lit(5)), " "))).as("shingle"))
    val train = sh.where(col("bucket") < 8).select("shingle").distinct()
    val want = sh.where(col("bucket") >= 8)
      .join(train.withColumn("hit", lit(1)), Seq("shingle"), "left")
      .groupBy("doc_id", "source")
      .agg(max(coalesce(col("hit"), lit(0))).as("contam"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_test"),
        count_if(col("contam") === 1).as("n_contaminated"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("q138_decontamination")(spark, sf)
      .select("source", "n_test", "n_contaminated")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted === want.sorted)
  }

  test("q139 cumulative share is monotone and ends at 1; counts sum to token total") {
    val rows = SparkEntry.queries("q139_zipf_stats")(spark, sf).collect()
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.drop(1)).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(shares.last - 1.0) < 1e-6)
    val totalTokens = Tables.documents(spark, sf)
      .select(size(filter(split(col("text"), " "), w => w =!= "")).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n")).sum === totalTokens)
  }

  test("q140 sampler is deterministic and bounded by the population") {
    val a = SparkEntry.queries("q140_quality_sample")(spark, sf).collect()
    val b = SparkEntry.queries("q140_quality_sample")(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q141 shares sum to 1 and epochs invert the share against uniform") {
    val rows = SparkEntry.queries("q141_domain_mixture")(spark, sf).collect()
    val k = rows.length
    assert(math.abs(rows.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val inv = r.getAs[Double]("epochs_uniform") * r.getAs[Double]("token_share")
      assert(math.abs(inv - 1.0 / k) < 1e-4)
    }
  }

  test("q137/q142 per-source outputs cover every source exactly once") {
    val sources = Tables.documents(spark, sf).select("source").distinct().count()
    val rep = SparkEntry.queries("q137_repetition_metrics")(spark, sf).collect()
    assert(rep.length === sources)
    rep.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
      val f = r.getAs[Double]("avg_dup_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
    val urls = SparkEntry.queries("q142_url_parse")(spark, sf).collect()
    assert(urls.length === sources)
    assert(urls.forall(_.getAs[String]("host").endsWith(".example.com")))
  }

  test("q223 salted write spreads every event_type over multiple files") {
    // a plain repartition(event_type) would pin each type to ONE write
    // task (and one file) — the 5-straggler shape at scale; the salted
    // repartition must yield >1 file per partition dir, deterministically
    val rows = SparkEntry.queries("q223_file_metadata")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") > 1L,
        s"event_type ${r.getAs[String]("event_type")} wrote only " +
          s"${r.getAs[Long]("n_files")} file(s)")
    }
    val again = SparkEntry.queries("q223_file_metadata")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq,
      "file counts must be stable run-over-run")
  }

  test("q234 compaction plan conserves the snapshot and bounds each group's overshoot") {
    val rows = SparkEntry.queries("q234_compaction_plan")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_files")).sum == 16L, "plan must cover all 16 files")
    assert(rows.map(_.getAs[Long]("rows_total")).sum == nDocs, "plan must cover every row")
    val grps = rows.map(_.getAs[Long]("grp")).sorted
    assert(grps.head == 0L && grps.sameElements(grps.indices.map(_.toLong)),
      "group ids must be contiguous from 0")
    // every group except the last must have REACHED the budget boundary:
    // its cumulative start is below a 120 multiple its end is at-or-past
    val sorted = rows.sortBy(_.getAs[Long]("grp"))
    var cum = 0L
    sorted.init.foreach { r =>
      val end = cum + r.getAs[Long]("rows_total")
      assert(end >= 120L * (r.getAs[Long]("grp") + 1),
        s"group ${r.getAs[Long]("grp")} ends at $end before its budget boundary")
      cum = end
    }
  }
  test("q368 containment: bounded, ordered, and clone pairs read exactly 1.0") {
    val rows = SparkEntry.queries("q368_eval_containment")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val sh = r.getAs[Long]("n_shared"); val ne = r.getAs[Long]("n_eval_shingles")
      assert(sh >= 1 && sh <= ne, s"$r")
      val c = r.getAs[Double]("containment")
      assert(c > 0.0 && c <= 1.0, s"$r")
      // asymmetric split: an eval doc can never be its own train doc
      assert(r.getAs[Long]("eval_doc") != r.getAs[Long]("train_doc"), s"$r")
    }
    val cs = rows.map(_.getAs[Double]("containment"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "containment-descending")
    // the corpus's known clone clusters must surface as full containment
    assert(cs.head == 1.0, s"expected an exact-clone pair at the top, got ${cs.head}")
  }

}
