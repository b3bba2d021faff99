package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence data generator (round 9, VERDICT r8 #1): derives an
  * sf1-shaped corpus from the driver's sf0.1 tables by key-remapped
  * replication, so the full suite can be MEASURED at 10× instead of
  * argued from plan shape. Usage:
  *
  *   sbt "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf1 10"
  *
  * Replication design (what 10× must mean per table so the workload
  * scales the way a real 10× corpus would):
  *
  *  - Every surrogate key k of replica i becomes k + i·span(table),
  *    span = max(k)+1 of the SOURCE — replicas never collide, and every
  *    foreign key is shifted by the span of the table it REFERENCES, so
  *    join fan-in/fan-out per key is IDENTICAL to sf0.1 (a customer
  *    still has ~10 orders; there are just 10× customers).
  *  - Timestamps are NOT shifted: 10× volume over the SAME calendar
  *    span ("more entities, not longer history") — this is the regime
  *    the per-entity fold kernels and the T=11-day RETAIN grid meet at
  *    100 TB, and it keeps every date-window predicate selectivity-
  *    stable while its matching row count grows 10×.
  *  - `documents.text` is passed through a per-replica letter
  *    permutation (translate over "aeioubcdfg", rotation i) — replicas
  *    are DISTINCT documents (length and token structure preserved,
  *    n_chars stays consistent), so the intra-corpus duplicate/near-dup
  *    fraction matches sf0.1's per replica instead of every doc gaining
  *    9 exact clones. Naive replication would put all 10 copies in the
  *    same MinHash band buckets and grow LSH candidate pairs ~100×
  *    (quadratic in bucket size) — an artifact of the generator, not of
  *    10× real data.
  *  - `embeddings.embedding` gets one dimension nudged by a per-replica
  *    epsilon (replica 0 unchanged — the vec_id<64 quantizer-training
  *    sample keeps its exact bits), so ANN top-k has no artificial
  *    10-way distance ties while the geometry stays sf0.1-like.
  *  - region/nation are genuine fixed dimensions (25 nations at any
  *    scale) and are copied as-is.
  *
  * Seed spaces (round 14, VERDICT r13 #5 — the sf100 rotation-exhaustion
  * fix): a COMPOSED rung (sf100 generated FROM sf10) applies this
  * generator's document permutation twice, and two alphabet ROTATIONS
  * compose into another rotation of the same 10-member space — so the
  * first sf100 generation collapsed 100 (sf10 rotation) × 10 (second
  * pass) replica pairs onto ~10-member exact-clone classes, a generator
  * artifact the dedup family then measured instead of real data. The
  * optional fourth argument `seedBase` (default 0 = the historical
  * rotation scheme, so existing sf1/sf10 corpora stay reproducible)
  * switches each replica's permutation to a seeded Fisher–Yates shuffle
  * of each alphabet — a family of 10!² permutations per seed space, so
  * permutations drawn in DIFFERENT rungs (different seedBase) compose
  * into distinct full permutations instead of cycling. The embedding
  * nudge dimension/value are seed-mixed the same way (the rotation
  * scheme's (i,0)/(0,i) second-pass pairs composed to identical nudges).
  *
  *   sbt "runMain graft.ScaleGen /tmp/graft_sf10 /tmp/graft_sf100 10 2"
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val seedBase = if (args.length > 3) args(3).toLong else 0L
    val spark = GraftSession.build("graft-scalegen")
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val customer = read("customer"); val cSpan = span(customer, "c_custkey")
    val orders = read("orders"); val oSpan = span(orders, "o_orderkey")
    val part = read("part"); val pSpan = span(part, "p_partkey")
    val supplier = read("supplier"); val sSpan = span(supplier, "s_suppkey")
    val events = read("events")
    val eSpan = span(events, "event_id"); val uSpan = span(events, "user_id")
    val documents = read("documents"); val dSpan = span(documents, "doc_id")
    val embeddings = read("embeddings"); val vSpan = span(embeddings, "vec_id")

    def replicate(df: DataFrame)(mutate: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => mutate(df, i)).reduce(_.unionByName(_))
    def shift(c: String, sp: Long, i: Int) = (col(c) + lit(sp * i)).as(c)

    // TWO independent letter rotations per replica (round 10): a single
    // 10-letter rotation yields only 10 distinct permutations, so at
    // factor=100 every document gains 9 exact clones and the dedup/LSH
    // family's candidate pairs grow ~quadratically in clone-class size —
    // an artifact of the GENERATOR, not of 100× real data (the round-9
    // scaladoc warned exactly this for naive replication). Composing a
    // rotation of alpha (i mod 10) with a rotation of beta (i div 10
    // mod 10) gives factor-many distinct permutations up to 100, so the
    // per-replica duplicate fraction stays sf0.1-like at every factor
    // this generator supports.
    val alpha = "aeioubcdfg" // letters permuted per replica for documents
    val beta = "hjklmnpqrs" // second, disjoint rotation alphabet
    // Per-replica permutation of (alpha, beta): seedBase 0 = rotations
    // (historical rungs); nonzero = seeded shuffles (independent space
    // per rung — see the scaladoc). Replica 0 always passes through so
    // the source rung's corpus survives composition intact.
    def docPerm(i: Int): (String, String) =
      if (seedBase == 0L) {
        val permA = alpha.drop(i % alpha.length) + alpha.take(i % alpha.length)
        val j = (i / alpha.length) % beta.length
        (permA, beta.drop(j) + beta.take(j))
      } else if (i == 0) (alpha, beta)
      else {
        val rnd = new java.util.Random(seedBase * 1000003L + i)
        def shuffle(in: String): String = {
          val a = in.toCharArray; var k = a.length - 1
          while (k > 0) {
            val r = rnd.nextInt(k + 1)
            val t = a(k); a(k) = a(r); a(r) = t; k -= 1
          }
          new String(a)
        }
        (shuffle(alpha), shuffle(beta))
      }
    def nudgeDim(i: Int): Int =
      if (seedBase == 0L) i % 64 else (((seedBase * 17 + i) % 64).toInt)
    def nudgeVal(i: Int): Float =
      if (seedBase == 0L) (((i * 7 + 1) % 13) * 1e-3).toFloat
      else (((((seedBase * 31 + i) * 7 + 1) % 13) + 1) * 1e-3).toFloat
    def write(name: String, df: DataFrame, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name -> $out/$name.parquet (${parts} files)")
    }

    write("region", read("region"), 1)
    write("nation", read("nation"), 1)
    write("customer", replicate(customer) { (df, i) =>
      df.select(shift("c_custkey", cSpan, i), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }, 4)
    write("supplier", replicate(supplier) { (df, i) =>
      df.select(shift("s_suppkey", sSpan, i), col("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    }, 1)
    write("part", replicate(part) { (df, i) =>
      df.select(shift("p_partkey", pSpan, i), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))
    }, 4)
    write("orders", replicate(orders) { (df, i) =>
      df.select(shift("o_orderkey", oSpan, i), shift("o_custkey", cSpan, i),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }, 8)
    write("lineitem", replicate(read("lineitem")) { (df, i) =>
      df.select(shift("l_orderkey", oSpan, i), shift("l_partkey", pSpan, i),
        shift("l_suppkey", sSpan, i), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    }, 16)
    write("events", replicate(events) { (df, i) =>
      df.select(shift("event_id", eSpan, i), col("ts"),
        shift("user_id", uSpan, i), col("event_type"), col("value"),
        col("props"))
    }, 8)
    write("documents", replicate(documents) { (df, i) =>
      val (permA, permB) = docPerm(i)
      df.select(shift("doc_id", dSpan, i),
        translate(col("text"), alpha + beta, permA + permB).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }, 4)
    write("embeddings", replicate(embeddings) { (df, i) =>
      val emb =
        if (i == 0) col("embedding")
        else transform(col("embedding"), (x, ix) =>
          when(ix === lit(nudgeDim(i)), (x + lit(nudgeVal(i))).cast("float"))
            .otherwise(x)).cast("array<float>")
      df.select(shift("vec_id", vSpan, i), emb.as("embedding"), col("label"))
    }, 2)

    spark.stop()
  }
}
