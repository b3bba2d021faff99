package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass fixed-bin histogram AUC — the 100 TB replacement for the
  * exact window-rank AUC (q21): no global sort, no total order; a
  * single mergeable aggregate whose buffer is 2×B longs. Scores are
  * binned to B equal-width buckets in [0,1]; AUC is the mid-rank
  * trapezoid over bins,
  *
  *   AUC = Σ_b (cumNeg(<b)·pos_b + ½·neg_b·pos_b) / (P·N),
  *
  * which equals the exact tie-aware mid-rank AUC of the binned scores
  * (reference R18 semantics, `model.py:157` — TF's own streaming AUC is
  * exactly this bucketed estimator with num_thresholds bins).
  *
  * Implemented as a typed [[Aggregator]] (SURVEY.md group 9) so it runs
  * as a partial+final aggregate: each partition fills a local
  * histogram, merge is elementwise add — shuffle traffic is O(B), not
  * O(rows).
  */
object AucHistogram {
  val Bins = 1000

  /** (p, y) rows in, (posCounts ++ negCounts) buffer,
    * (AUC, nPos, nNeg) out. `bins` is the resolution knob: q87 runs
    * the engine default (1000); q254 runs 200 — `tf.metrics.auc`'s
    * own `num_thresholds` default (`model.py:157`) — to state the
    * approximation error of the reference's estimator against the
    * exact mid-rank AUC.
    */
  def aggWith(bins: Int): Aggregator[(Double, Double), Array[Long], (Double, Long, Long)] =
    new Aggregator[(Double, Double), Array[Long], (Double, Long, Long)] {
      def zero: Array[Long] = new Array[Long](2 * bins)
      def reduce(b: Array[Long], row: (Double, Double)): Array[Long] = {
        val (p, y) = row
        val bin = math.min((p * bins).toInt, bins - 1)
        if (y == 1.0) b(bin) += 1 else b(bins + bin) += 1
        b
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(b: Array[Long]): (Double, Long, Long) = {
        var pTot = 0L; var nTot = 0L
        var i = 0
        while (i < bins) { pTot += b(i); nTot += b(bins + i); i += 1 }
        if (pTot == 0 || nTot == 0) return (Double.NaN, pTot, nTot)
        var cumNeg = 0L
        var num = 0.0
        i = 0
        while (i < bins) {
          val pos = b(i); val neg = b(bins + i)
          num += pos.toDouble * cumNeg + 0.5 * pos.toDouble * neg
          cumNeg += neg
          i += 1
        }
        (num / (pTot.toDouble * nTot.toDouble), pTot, nTot)
      }
      def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[(Double, Long, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaLong)
    }

  val agg: Aggregator[(Double, Double), Array[Long], (Double, Long, Long)] =
    aggWith(Bins)
}
