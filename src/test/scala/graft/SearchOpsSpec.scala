package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariant checks for the round-5 search/curation/audit operators,
  * independent of the DuckDB oracle: BM25 must rank a doc higher when
  * it matches more query terms at equal length, chunk-dedup survival
  * must be a partition of the chunk multiset, the snapshot diff classes
  * must partition the key space, and the PQ encoding must assign every
  * codebook vector to its own code with zero reconstruction error.
  */
class SearchOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", "target/graft-warehouse")
        .config("spark.ui.enabled", "false")
        .appName("search-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q178 BM25 scores are positive and bounded by the idf sum") {
    val rows = SparkEntry.queries("q178_bm25_rank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(r => r.getDouble(r.fieldIndex("bm25")))
    assert(scores.forall(_ > 0.0))
    // top-10 comes back sorted descending
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
  }

  test("q180 chunk-dedup kept counts partition the chunk multiset") {
    val rows = SparkEntry.queries("q180_chunk_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val chunks = r.getLong(r.fieldIndex("chunks"))
      val kept = r.getLong(r.fieldIndex("kept"))
      assert(kept >= 1 && kept <= chunks)
    }
    // global: kept == number of distinct chunks in the corpus
    val totalKept = rows.map(r => r.getLong(r.fieldIndex("kept"))).sum
    val distinctChunks = {
      val tok = Tables.documents(spark, sf)
        .select(col("doc_id"), graft.functions.Text.wordsCol(col("text")).as("ws"))
        .where(size(col("ws")) > 0)
      tok.select(explode(transform(
          sequence(lit(0L), floor((size(col("ws")) - 1) / lit(10))),
          i => concat_ws(" ", slice(col("ws"), (i * 10 + 1).cast("int"), lit(10)))))
          .as("chunk"))
        .select("chunk").distinct().count()
    }
    assert(totalKept == distinctChunks, s"kept=$totalKept distinct=$distinctChunks")
  }

  test("q181 snapshot-diff classes partition the union of key spaces") {
    val rows = SparkEntry.queries("q181_snapshot_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sf)
    val nBase = o.where(col("o_orderkey") % 97 =!= 0).count()
    val nCurr = o.where(col("o_orderkey") % 101 =!= 0).count()
    val nBoth = o.where(col("o_orderkey") % 97 =!= 0 &&
      col("o_orderkey") % 101 =!= 0).count()
    assert(rows.getOrElse("delete", 0L) == nBase - nBoth)
    assert(rows.getOrElse("insert", 0L) == nCurr - nBoth)
    assert(rows.getOrElse("update", 0L) + rows.getOrElse("same", 0L) == nBoth)
    // updates carry drift; deletes/inserts carry the full price
    assert(rows.getOrElse("update", 0L) ==
      o.where(col("o_orderkey") % 97 =!= 0 && col("o_orderkey") % 101 =!= 0 &&
        col("o_orderkey") % 89 === 0).count())
  }

  test("q185 PQ assigns each codebook vector its own code at zero error") {
    // re-derive the per-vector encoding at sf0.001 and check vec 0..3
    val v = Tables.embeddings(spark, sf).select(col("vec_id") +:
      (1 to 8).map(i => element_at(col("embedding"), i).cast("double").as(s"x$i")): _*)
    val cents = v.where(col("vec_id") < 4).orderBy("vec_id").collect()
    def dist(r: org.apache.spark.sql.Row, lo: Int) =
      (lo until lo + 4).map(i =>
        (col(s"x$i") - r.getDouble(i)) * (col(s"x$i") - r.getDouble(i))).reduce(_ + _)
    def code(lo: Int) = least(cents.map(r =>
      struct(dist(r, lo).as("d"), lit(r.getLong(0)).as("c"))): _*)
    val self = v.where(col("vec_id") < 4)
      .select(col("vec_id"), code(1).as("a1"), code(5).as("a2")).collect()
    self.foreach { r =>
      val id = r.getLong(0)
      assert(r.getStruct(1).getLong(1) == id, s"vec $id code1")
      assert(r.getStruct(2).getLong(1) == id, s"vec $id code2")
      assert(r.getStruct(1).getDouble(0) == 0.0)
      assert(r.getStruct(2).getDouble(0) == 0.0)
    }
    // full profile: every vector lands in exactly one (code1, code2) cell
    val prof = SparkEntry.queries("q185_pq_encode")(spark, sf)
    assert(prof.agg(sum(col("n"))).collect()(0).getLong(0) == v.count())
  }

  test("q196 two-phase heavy hitters equal the naive full group-by") {
    val fast = SparkEntry.queries("q196_heavy_hitters")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.functions.Text.wordsCol(col("text"))).as("w"))
    val total = toks.count().toDouble
    val naive = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .where(col("n") >= lit(0.03) * lit(total))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fast == naive, s"fast=${fast.size} naive=${naive.size}")
    assert(naive.nonEmpty)
  }

  test("q182 sequence examples only emit full 3-contexts") {
    val rows = SparkEntry.queries("q182_sequence_examples")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ctx = r.getString(r.fieldIndex("context"))
      assert(ctx.split(">").length == 3, ctx)
      assert(r.getLong(r.fieldIndex("n")) >= 1)
    }
  }
}
