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

  /** Spark-side mirror of q225's minhash component:
    * conv(substring(md5(w || '#s'), 1, 15), 16, 10) as a long. */
  private def mh(w: String, seed: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((w + "#" + seed).getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q225 cap-aware first-surviving-band dedup equals the global-distinct form on an oversized-bucket fixture") {
    // round 15 (VERDICT r14 #1): the round-14 in-bucket rewrite of
    // q225 replaced candidates → global DISTINCT → join-back with
    // in-bucket enumeration + first-SURVIVING-band dedup. Its subtle
    // rule — skip a pair at band b only if an earlier band b' both
    // key-matches AND survived the ≤64 cap — had no fixture pushing an
    // oversized bucket through it. Build one:
    //  * 70 docs share an anchor token that is the argmin of minhash
    //    seeds 0 AND 1 over the whole vocabulary, so ALL 70 share the
    //    band-0 key → one 70-member bucket > 64 → band 0 is excluded.
    //  * docs 0 and 1 differ by one extra token chosen so bands 1–3
    //    also key-match; band 0 is their LOWEST matching band but it
    //    did not survive, so the pair MUST still be emitted (at band
    //    1) — a naive "skip if any earlier band matches" drops it.
    //  * docs 100/101 are exact clones in small buckets (multi-band
    //    match, all surviving) — emitted exactly once, at band 0.
    val pool = (0 until 2000).map(i => f"tok$i%04d")
    val cands = pool.sortBy(w => mh(w, 0) + mh(w, 1))
    val wstar = cands.find { c =>
      pool.count(w => w != c && mh(w, 0) > mh(c, 0) && mh(w, 1) > mh(c, 1)) >= 720
    }.get
    val okw = pool.filter(w =>
      w != wstar && mh(w, 0) > mh(wstar, 0) && mh(w, 1) > mh(wstar, 1))
    val docWords = scala.collection.mutable.LinkedHashMap[Long, Seq[String]]()
    for (k <- 0 until 70) docWords(k.toLong) = wstar +: okw.slice(10 * k, 10 * k + 10)
    val d0mins = (2 until 8).map(s => s -> docWords(0L).map(mh(_, s)).min).toMap
    val extra = okw.drop(700).find(w => (2 until 8).forall(s => mh(w, s) > d0mins(s))).get
    docWords(1L) = docWords(0L) :+ extra
    docWords(100L) = okw.slice(710, 718)
    docWords(101L) = docWords(100L)
    for (k <- 0 until 10) docWords(200L + k) = okw.slice(718 + 3 * k, 721 + 3 * k)

    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q225cap").toString
    docWords.toSeq.map { case (id, ws) =>
      val text = ws.mkString(" ")
      (id, text, "en", "fix", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent reference: signatures → capped band buckets → global
    // DISTINCT pair set → exact Jaccard — the pre-round-14 form.
    val sig = docWords.map { case (id, ws) =>
      id -> (0 until 8).map(seed => ws.distinct.map(mh(_, seed)).min).toArray
    }.toMap
    val buckets = scala.collection.mutable.Map[(Int, (Long, Long)), List[Long]]()
    for ((id, sg) <- sig; b <- 0 until 4) {
      val key = (b, (sg(2 * b), sg(2 * b + 1)))
      buckets(key) = id :: buckets.getOrElse(key, Nil)
    }
    val oversized = buckets.filter(_._2.length > 64)
    assert(oversized.nonEmpty && oversized.head._2.length == 70 &&
      oversized.head._1._1 == 0, "fixture lost its oversized band-0 bucket — test is vacuous")
    val surviving = buckets.filter(_._2.length <= 64)
    def bandMatch(a: Long, b: Long, bd: Int): Boolean =
      sig(a)(2 * bd) == sig(b)(2 * bd) && sig(a)(2 * bd + 1) == sig(b)(2 * bd + 1)
    assert((0 until 4).forall(bandMatch(0L, 1L, _)),
      "fixture pair (0,1) no longer matches at all bands — test is vacuous")
    val expectPairs = surviving.values.flatMap { ms =>
      val srt = ms.sorted
      for (i <- srt.indices; j <- (i + 1) until srt.length) yield (srt(i), srt(j))
    }.toSet
    assert(expectPairs.contains((0L, 1L)),
      "fixture pair (0,1) fell out of the surviving buckets — test is vacuous")
    val expected = expectPairs.toSeq.map { case (a, b) =>
      val (wa, wb) = (docWords(a).toSet, docWords(b).toSet)
      val j = wa.intersect(wb).size.toDouble / wa.union(wb).size
      (a, b, BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.filter(_._3 >= 0.5).sorted

    val got = graft.operators.CurriculumOps.defs
      .find(_.name == "q225_lsh_candidate_pairs").get.fn(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("jaccard"))).toSeq.sorted
    assert(got == expected,
      s"cap-aware in-bucket pair set diverged from the global-distinct form:\n" +
        s"got      $got\nexpected $expected")
    // the load-bearing case by name: the pair whose lowest matching
    // band was capped out is present exactly once
    assert(got.count(p => p._1 == 0L && p._2 == 1L) == 1,
      "pair (0,1) — lowest matching band oversized — missing or double-emitted")
    assert(got.count(p => p._1 == 100L && p._2 == 101L) == 1,
      "exact-clone pair (100,101) missing or double-emitted")
  }
  test("q62 exact-Jaccard guard: counts always; throws past the ceiling only in strict mode") {
    // round 13 (VERDICT r12 #1): the default behavior past the class
    // ceiling is ROUTING to the banded candidate path, so the guard
    // only throws under SPARK_GRAFT_STRICT_GUARDS/graft.strictGuards;
    // in both modes it returns the max per-source class count the
    // routing decision keys on.
    val limit = graft.operators.LLMPipeline.MaxExactJaccardClasses
    def cls(c: Long) = spark.range(c)
      .select(lit("src00000001").as("source"), col("id"))
    // below the ceiling: returns the count, never throws
    assert(graft.operators.LLMPipeline.guardExactJaccard(cls(1000)) == 1000L)
    // above it, default mode: still returns (the caller routes)
    assert(graft.operators.LLMPipeline.guardExactJaccard(cls(limit + 1)) == limit + 1)
    // above it, strict mode: loud failure naming the banding alternative.
    // The props override only reaches strictGuards when the env var is
    // absent on the OTHER precedence order; since round 14 props take
    // precedence (testability), but an env var set to "1" would still
    // make the BELOW-ceiling default-mode assertions above meaningless —
    // so require a clean environment rather than silently testing the
    // wrong mode (ADVICE r13).
    assume(!sys.env.contains("SPARK_GRAFT_STRICT_GUARDS"),
      "SPARK_GRAFT_STRICT_GUARDS is set in the environment; strict-mode test skipped")
    sys.props("graft.strictGuards") = "1"
    try {
      val e = intercept[IllegalStateException] {
        graft.operators.LLMPipeline.guardExactJaccard(cls(limit + 1))
      }
      assert(e.getMessage.contains("MaxExactJaccardClasses"))
      assert(e.getMessage.contains("banding"))
    } finally sys.props.remove("graft.strictGuards")
  }

  test("q62 banded route: pairs are a subset of the naive enumeration, identical within-class counts") {
    // The routed form (taken automatically above MaxExactJaccardClasses)
    // must never invent a pair: banded candidates pass the SAME exact
    // verify, so per source n_pairs_50 <= naive, max_j <= naive, and the
    // closed-form within-class identical count is byte-identical.
    graft.functions.SortedIntersectCount.register(spark)
    val cls = graft.operators.LLMPipeline.q62Classes(spark, sf)
    val naive = graft.operators.LLMPipeline
      .q62Readout(graft.operators.LLMPipeline.q62CrossNaive(spark, cls), cls)
      .collect().map(r => r.getString(0) -> r).toMap
    val banded = graft.operators.LLMPipeline
      .q62Readout(graft.operators.LLMPipeline.q62CrossBanded(cls), cls)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(banded.keySet.subsetOf(naive.keySet),
      "banded route emitted a source the naive form does not")
    assert(banded.nonEmpty, "banded route found nothing at fixture scale")
    for ((src, b) <- banded) {
      val n = naive(src)
      assert(b.getLong(1) <= n.getLong(1), s"$src: banded n_pairs_50 > naive")
      assert(b.getLong(2) == n.getLong(2), s"$src: within-class identical count differs")
      assert(b.getDouble(3) <= n.getDouble(3) + 1e-12, s"$src: banded max_j > naive")
    }
    // Recall floor (round 14, VERDICT r13 #1b): per-source exactness is
    // NOT an invariant — cross-class pairs have J < 1 by construction
    // (identical token sets are the SAME class), so their band-collision
    // probability 1−(1−J²)⁴ < 1 and a handful of borderline pairs per
    // source makes "some source is exact" a data accident, not a
    // guarantee. What the banding design DOES promise is useful
    // aggregate recall on a ≥0.5-Jaccard workload (J=0.5 ⇒ per-band
    // J²=0.25, 4 bands ⇒ ≥68% per pair, higher-J pairs asymptote to 1);
    // pinned ≥ 0.5 like HybridSpec's q474 split-recall idiom (the
    // measured value is logged each run via info() below).
    val found = banded.values.map(_.getLong(1)).sum.toDouble
    val truth = naive.values.map(_.getLong(1)).sum.toDouble
    info(f"banded aggregate recall ${found / truth}%.3f ($found of $truth pairs)")
    assert(truth > 0, "fixture lost its near-dup structure — test is vacuous")
    assert(found / truth >= 0.5,
      f"banded aggregate recall ${found / truth}%.3f fell below 0.5 ($found of $truth pairs)")
  }

}
