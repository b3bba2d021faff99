package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler string similarity — the
  * standard record-linkage comparator (Winkler 1990, building on Jaro
  * 1989), textbook semantics matched to DuckDB's
  * `jaro_winkler_similarity` (probed: MARTHA/MARHTA = 0.9611…,
  * DIXON/DICKSONX = 0.8133…, the 0.7 boost threshold IS applied —
  * 'aXXXXX'/'aYYYYY' stays at its Jaro 0.444 —, prefix capped at 4,
  * p = 0.1, and both-empty returns 0).
  *
  * Spark has `levenshtein` built in but no Jaro-Winkler, which is the
  * comparator entity-resolution blocking actually wants (prefix-weighted,
  * length-tolerant, O(n·window) instead of O(n·m) DP). As a codegen
  * `BinaryExpression` calling one static method, it stays inside
  * whole-stage codegen — no UDF serialization boundary — so a blocked
  * candidate join evaluates millions of pairs at scan speed. Scratch
  * buffers are thread-local and grown geometrically: zero per-row
  * allocation on the hot path.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler_sim requires (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the $.MODULE$ form resolves unambiguously from generated Java even
    // though a companion CLASS with the same name exists
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerSim$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  private val buffers = new ThreadLocal[(Array[Boolean], Array[Boolean])] {
    override def initialValue(): (Array[Boolean], Array[Boolean]) =
      (new Array[Boolean](64), new Array[Boolean](64))
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Double =
    jw(a.toString, b.toString)

  private[graft] def jw(s: String, t: String): Double = {
    val ls = s.length; val lt = t.length
    if (ls == 0 || lt == 0) return 0.0 // incl. both-empty (DuckDB parity)
    if (s == t) return 1.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    var (ms, mt) = buffers.get()
    if (ms.length < ls || mt.length < lt) {
      ms = new Array[Boolean](math.max(ls, ms.length * 2))
      mt = new Array[Boolean](math.max(lt, mt.length * 2))
      buffers.set((ms, mt))
    }
    java.util.Arrays.fill(ms, 0, ls, false)
    java.util.Arrays.fill(mt, 0, lt, false)
    // match pass
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mt(j) && t.charAt(j) == s.charAt(i)) {
          ms(i) = true; mt(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transposition pass: aligned matched chars that differ
    var half = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (ms(i)) {
        while (!mt(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val trans = half / 2
    val md = m.toDouble
    val jaro = (md / ls + md / lt + (md - trans) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val pmax = math.min(4, math.min(ls, lt))
    while (p < pmax && s.charAt(p) == t.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /** Register `jaro_winkler_sim` in the session function registry
    * (idempotent); also shipped via [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("jaro_winkler_sim")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler_sim"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "jaro_winkler_sim(a, b) takes exactly 2 arguments")
          JaroWinklerSim(children.head, children(1))
        })
    }
  }
}
