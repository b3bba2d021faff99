package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, lit, when}

/** Deterministic random-hyperplane family for cosine LSH — shared by
  * the bucketing queries (q66 occupancy histogram, q98 near-dup,
  * q90 two-stage ANN search).
  *
  * Plane count is THE scale knob of this family: b planes → 2^b
  * buckets; for n vectors the expected occupancy is n/2^b and the
  * within-bucket pair work is Σ occupancy² ≈ n²/2^b. Two vectors at
  * angle θ land in the same bucket with probability (1 − θ/π)^b, so
  * widening b shrinks buckets (cost ↓) but lowers single-table recall —
  * a 100 TB deployment buys the recall back with L independent tables
  * or multi-probe, keeping per-bucket work bounded. The demo queries
  * pin b = 8 (256 buckets at the testdata scale, where n/2^b ≈ 2);
  * LshSpec pins the occupancy-vs-recall trade empirically at
  * b ∈ {8, 16, 32} so the widening path is tested, not aspirational.
  */
object Lsh {
  val Dim = 64

  /** Loud-guard ceiling for a single LSH bucket in the per-bucket pair
    * kernels (q98): beyond this the O(B²) enumeration and the O(B)
    * vector residency concentrate on one task — warn (refuse under
    * strict guards) and direct the operator to a wider plane tier
    * rather than silently OOM (round 15, ADVICE r14). 64k vectors ×
    * 64 doubles ≈ 32 MB resident, ~2.1B pairs — the practical knee.
    * The `graft.maxNearDupBucket` system property overrides it so a
    * spec can trip the guard on a 5-row fixture instead of 65k rows
    * (same prop-over-constant convention as `graft.strictGuards`). */
  def MaxNearDupBucket: Int =
    sys.props.get("graft.maxNearDupBucket").map(_.toInt).getOrElse(65536)

  /** Same loud-guard ceiling for a MINHASH band bucket in the banded
    * pair kernels (q71 — round 16, VERDICT r15 #8): a (band, sig)
    * bucket of B rows is O(B²) sorted-merge verifies and O(B) shingle
    * arrays resident on one task. q220/q225 bound this with the ≤64
    * occupancy cap that their first-SURVIVING-band dedup rule prices
    * in; q71 is deliberately uncapped (its contract is parity with the
    * global-distinct candidate set), so past this ceiling it can only
    * warn — or refuse under strict guards — and point at the capped
    * production path. Prop override `graft.maxBandBucket` lets a spec
    * trip it on a 6-row fixture. */
  def MaxBandBucket: Int =
    sys.props.get("graft.maxBandBucket").map(_.toInt).getOrElse(65536)

  /** Deterministic plane family, identical across JVMs and engines (the
    * oracle SQL embeds the same literals). Prefix-stable: the first b
    * rows of a wider family equal `hyperplanes(b)`, so widening only
    * SPLITS existing buckets — occupancy is monotone nonincreasing.
    */
  def hyperplanes(nPlanes: Int, dim: Int = Dim): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, i) => (((p * dim + i) * 31) % 17 - 8) / 8.0)

  /** Bucket id as a Spark Column over a double-array embedding — THE
    * bucketing expression every LSH query (q66/q90/q98/q214) shares;
    * a sign-convention or plane change edits exactly one place. */
  def bucketColumn(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, pi) =>
      when(graft.functions.Kernels.arrayDot(emb, array(p.map(lit): _*)) > 0,
        lit(1 << pi)).otherwise(0)
    }.reduce(_ + _)

  /** The same bucket id as oracle SQL, over a per-component expression
    * (corpus column access or a literal query-vector component). */
  def bucketSql(planes: Array[Array[Double]], vecExpr: Int => String): String =
    planes.zipWithIndex.map { case (p, pi) =>
      val dot = p.zipWithIndex.map { case (v, i) => s"${vecExpr(i)} * ($v)" }
        .mkString(" + ")
      s"(CASE WHEN $dot > 0 THEN ${1 << pi} ELSE 0 END)"
    }.mkString(" + ")

  /** Bucket id of a vector under the given planes (driver/test-side
    * mirror of the queries' column expression). */
  def bucketOf(v: Array[Double], planes: Array[Array[Double]]): Long = {
    var b = 0L
    var pi = 0
    while (pi < planes.length) {
      val p = planes(pi)
      var d = 0.0
      var i = 0
      while (i < p.length) { d += p(i) * v(i); i += 1 }
      if (d > 0) b |= 1L << pi
      pi += 1
    }
    b
  }
}
