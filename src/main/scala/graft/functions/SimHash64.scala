package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression #3: per-document SimHash fingerprint in
  * one pass over the token array.
  *
  * The composed form (q63's original plan) explodes every token to a
  * row, evaluates `bits` shift/mask sum-aggregates per token, and
  * shuffles the wide partial aggregates — the per-token row
  * materialization dominates. This expression keeps the whole
  * fingerprint map-side: md5 each token once, accumulate the ±1 bit
  * votes in a local int array, emit one long. The only shuffle left in
  * a simhash dedup is the final fingerprint groupBy.
  *
  * Hash contract (shared with the q60-q71 family and the DuckDB
  * oracles): per token, the top 60 bits of md5 — numerically equal to
  * `conv(substr(md5(w),1,15),16,10)` / `('0x'||substr(md5(w),1,15))::BIGINT`.
  */
case class SimHash64(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits >= 1 && bits <= 60 =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string> and 1 <= bits <= 60, got ($t, $bits)")
  }

  override protected def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[ArrayData], bits)

  /** Stays inside whole-stage codegen by emitting a static call — the
    * loop body is JVM-hot either way; what matters is not breaking the
    * surrounding codegen stage into interpreted fallback. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** One-pass simhash: ±1 vote per (token, bit), sign-threshold at the
    * end. Matches sum(((h >> j) & 1) * 2 - 1) > 0 exactly. */
  def compute(tokens: ArrayData, bits: Int): Long = {
    val md = md5.get()
    val cnt = new Array[Int](bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(tokens.getUTF8String(i).getBytes)
      // top 60 bits of the digest == first 15 hex chars as a long
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = h >>> 4
      var j = 0
      while (j < bits) {
        cnt(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (cnt(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  /** Register `simhash64(tokens, bits)` in the session registry
    * (idempotent); bits must be a foldable int literal. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("simhash64")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => {
          require(children.length == 2 && children(1).foldable,
            "simhash64(tokens, bits) takes a token array and a literal bit count")
          SimHash64(children.head,
            children(1).eval().asInstanceOf[Number].intValue())
        })
    }
  }
}
