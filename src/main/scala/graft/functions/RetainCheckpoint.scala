package graft.functions

import org.apache.spark.sql.SparkSession

/** Model-weights save/restore — the engine's equivalent of the
  * reference's `tf.train.Saver` surface (`model.py:216-217`; vestigial
  * there under the default config, but the real checkpoint contract a
  * training loop needs).
  *
  * Format: the flat parameter vector of RetainGrad's documented layout
  * (V | αcell | βcell | wα bα | Wβ bβ | heads headB) written as
  * (idx, value) parquet — order-independent on disk, restored by idx,
  * so a restore is exact to the last bit regardless of task/partition
  * scheduling. Both cell kinds: [[save]]/[[load]] carry the LSTM
  * training layout, [[saveGru]]/[[loadGru]] the GRU fallback's
  * (packGru) layout; the differing flat sizes make cross-loading fail
  * loudly.
  */
object RetainCheckpoint {
  /** Write `w` to `path` (overwrites). One ~2.4k-row parquet file. */
  def save(spark: SparkSession, w: Retain.RetainWeights, path: String): Unit = {
    import spark.implicits._
    val flat = RetainGrad.pack(w)
    flat.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("idx", "value")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Restore the exact weights written by [[save]]. */
  def load(spark: SparkSession, path: String): Retain.RetainWeights = {
    val rows = spark.read.parquet(path).collect()
    require(rows.length == RetainGrad.Dim,
      s"checkpoint at $path has ${rows.length} params, expected ${RetainGrad.Dim}")
    val flat = new Array[Double](RetainGrad.Dim)
    rows.foreach(r => flat(r.getInt(0)) = r.getDouble(1))
    RetainGrad.unpack(flat)
  }

  /** GRU-cell variant of [[save]] — the `use_lstm=False` fallback's
    * checkpoint (packGru layout; also what q203's oracle reads). */
  def saveGru(spark: SparkSession, w: Retain.RetainWeights, path: String): Unit = {
    import spark.implicits._
    RetainGrad.packGru(w).toSeq.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("idx", "value")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Restore the exact GRU weights written by [[saveGru]]. */
  def loadGru(spark: SparkSession, path: String): Retain.RetainWeights = {
    val rows = spark.read.parquet(path).collect()
    require(rows.length == RetainGrad.GruDim,
      s"GRU checkpoint at $path has ${rows.length} params, expected ${RetainGrad.GruDim}")
    val flat = new Array[Double](RetainGrad.GruDim)
    rows.foreach(r => flat(r.getInt(0)) = r.getDouble(1))
    RetainGrad.unpackGru(flat)
  }
}
