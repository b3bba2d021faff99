package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression kernels shared across the engine.
  *
  * These are the Spark-native forms of the reference's elementwise graph ops
  * (reference `model.py:147-159`): everything stays inside whole-stage
  * codegen — no UDFs — so the kernels fuse into the surrounding scan or
  * aggregate stage and survive a 100x scale-up without a JVM<->interpreter
  * boundary.
  */
object Kernels {

  /** Logistic sigmoid, reference `model.py:154` (`tf.nn.sigmoid`). */
  def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Numerically-stable sigmoid cross-entropy with logits, the closed form
    * TF documents for `tf.nn.sigmoid_cross_entropy_with_logits`
    * (reference `model.py:159`): max(z,0) - z*y + log1p(exp(-|z|)).
    */
  def sigmoidCrossEntropy(z: Column, y: Column): Column =
    greatest(z, lit(0.0)) - z * y + log1p(exp(-abs(z)))

  /** Accuracy*100 at threshold 0.5, reference `model.py:158`. */
  def accuracyPct(p: Column, y: Column): Column =
    lit(100.0) * avg(((p >= 0.5) === (y === 1.0)).cast("double"))

  /** Dot product of two double-array columns via codegen'd higher-order
    * functions (no UDF). Sequential left-to-right fold => deterministic
    * float summation order, which the DuckDB oracle can reproduce.
    */
  def arrayDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a double-array column. */
  def arrayNorm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Squared euclidean distance of two double-array columns — same
    * codegen'd left-to-right fold discipline as [[arrayDot]]. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    arrayDot(a, b) / (arrayNorm(a) * arrayNorm(b))

  /** Elementwise vector*matrix for an array column against a broadcast-able
    * literal matrix (rows = input dim). Used by the tensor ops R7/R12/R16
    * (reference `model.py:119-123,149-153`) when expressed relationally.
    */
  def vecMat(v: Column, m: Array[Array[Double]]): Column = {
    val cols = m(0).indices.map { j =>
      m.indices.map(i => element_at(v, i + 1) * lit(m(i)(j))).reduce(_ + _)
    }
    array(cols: _*)
  }
}
