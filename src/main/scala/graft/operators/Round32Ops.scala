package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-32 batch: the portable-hash Bernoulli sampler —
  *
  *  - q479 closes the last non-oracled G2 row (round 15, VERDICT r14
  *    #9): q36 demonstrates Spark's native Bernoulli sampler
  *    (`df.sample`, engine-private RNG ⇒ rows-only by declared
  *    semantics, bounds-checked by spec); q479 is its hash-derived
  *    TWIN — keep a row iff the 60-bit integer of md5(key) falls below
  *    ⌊p·2⁶⁰⌋ — the q37/q127 portable-selection idiom applied to the
  *    Bernoulli grain. Same marginal inclusion probability p = 0.1
  *    under the hash's uniformity, but deterministic and engine-
  *    independent, so the oracle hash-verifies the EXACT sample.
  *    The compare stays in integer space (no float division) so both
  *    engines decide each row identically.
  *
  * Scale shape: the predicate is pure map work over the scan (no
  * shuffle, no RNG state, trivially reproducible across retries and
  * speculative tasks — the property that makes hash-Bernoulli the
  * production sampler at 100 TB, where `rand()` resampling under task
  * retry silently changes the sample).
  *
  * Reference: R4 random minibatch sampling (`model.py:191`).
  */
object Round32Ops {

  /** ⌊0.1 · 2⁶⁰⌋ — the inclusion threshold on the 60-bit md5 prefix. */
  private val BernThreshold = 115292150460684697L

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q479_sample_bernoulli_hash",
      s"""SELECT l_orderkey, l_linenumber, l_quantity
         |FROM lineitem
         |WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '#' ||
         |    CAST(l_linenumber AS VARCHAR) || '#bern'), 1, 15))::BIGINT
         |  < $BernThreshold
         |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(conv(substring(md5(concat(
            col("l_orderkey").cast("string"), lit("#"),
            col("l_linenumber").cast("string"), lit("#bern"))), 1, 15), 16, 10)
          .cast("long") < BernThreshold)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }
  )
}
