package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-29 operators (q463–q467) beyond their
  * oracle hash checks: dedup impact against scalar hashing; held-out
  * perplexity against a scalar add-one LM (and the generalization-gap
  * direction vs training-side scoring); seasonal/trend strength
  * against scalar decomposition; the ensemble backtest against scalar
  * forecasting rules; and the streaming==batch identity for q467.
  */
class Round29Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round29-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  private def words(t: String): Seq[String] = t.split(" ").filter(_.nonEmpty).toSeq

  private lazy val docs: Array[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q463 dedup impact equals scalar content-hash classing") {
    val rows = byName("q463_dedup_impact")(spark, sf).collect()
    assert(rows.nonEmpty)
    val keepOf = docs.groupBy(_._3).map { case (_, ds) => ds.map(_._1).min }.toSet
    for (r <- rows) {
      val src = r.getString(0)
      val ds = docs.filter(_._2 == src)
      val classes = ds.map(_._3).distinct.length
      val toksTotal = ds.map(d => words(d._3).length.toLong).sum
      val toksKept = ds.filter(d => keepOf(d._1))
        .map(d => words(d._3).length.toLong).sum
      assert(r.getLong(1) === ds.length.toLong)
      // classes counted per source can exceed global classes only if a
      // class spans sources; per-source distinct is what's reported
      assert(r.getLong(2) === classes.toLong, s"$src classes")
      assert(r.getLong(4) === toksTotal, s"$src tokens total")
      assert(r.getLong(5) === toksKept, s"$src tokens kept")
      assert(r.getLong(3) >= 0 && r.getLong(3) < ds.length)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("q464 held-out perplexity equals the scalar add-one LM on the val split") {
    val rows = byName("q464_holdout_perplexity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val train = docs.filter(_._1 % 10 <= 7)
    val valD = docs.filter(_._1 % 10 > 7)
    assert(valD.nonEmpty && train.nonEmpty)
    val bigrams = train.flatMap(d => words(d._3).sliding(2).filter(_.length == 2)
      .map(w => (w(0), w(1))))
    val bc = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cc = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val v = train.flatMap(d => words(d._3)).distinct.length.toDouble
    def ppl(t: String): Option[Double] = {
      val bs = words(t).sliding(2).filter(_.length == 2).toSeq
      if (bs.isEmpty) None
      else Some(math.exp(bs.map { w =>
        val p = (bc.getOrElse((w(0), w(1)), 0L) + 1.0) /
          (cc.getOrElse(w(0), 0L) + v)
        -math.log(p)
      }.sum / bs.length))
    }
    for (r <- rows) {
      val src = r.getString(0)
      val ppls = valD.filter(_._2 == src).flatMap(d => ppl(d._3))
      assert(r.getLong(1) === ppls.length.toLong, s"$src n_val")
      assert(math.abs(r.getDouble(2) - ppls.sum / ppls.length) < 1e-2, s"$src mean")
      assert(math.abs(r.getDouble(3) - ppls.min) < 1e-3)
      assert(math.abs(r.getDouble(4) - ppls.max) < 1e-3)
      // held-out perplexity cannot beat the uniform floor and must be finite
      assert(r.getDouble(2) > 1.0 && r.getDouble(2) < v + 1)
    }
  }

  private lazy val dailyGrid: Map[String, Seq[(Int, Double)]] =
    spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
      .agg((sum(col("value").cast("decimal(18,3)")).cast("double") /
        count(lit(1))).as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq)
      .toMap

  test("q465 seasonal/trend strength equals the scalar decomposition") {
    val rows = byName("q465_seasonal_strength")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val vs = dailyGrid(el)
      val n = vs.length.toDouble
      def ss(xs: Seq[Double]): Double = {
        val m = xs.sum / xs.length
        xs.map(x => (x - m) * (x - m)).sum
      }
      val xs = vs.map(_._1.toDouble); val ys = vs.map(_._2)
      val sx = xs.sum; val sv = ys.sum
      val sxx = xs.map(x => x * x).sum
      val sxv = xs.zip(ys).map(p => p._1 * p._2).sum
      val slope = (n * sxv - sx * sv) / (n * sxx - sx * sx)
      val icpt = (sv - slope * sx) / n
      val r1 = vs.map { case (di, v) => (di, v - (icpt + slope * di)) }
      val wm = r1.groupBy(_._1 % 7).view.mapValues(g => g.map(_._2).sum / g.length)
      val r2 = r1.map { case (di, x) => x - wm(di % 7) }
      val wm0 = vs.groupBy(_._1 % 7).view.mapValues(g => g.map(_._2).sum / g.length)
      val rs = vs.map { case (di, v) => v - wm0(di % 7) }
      assert(r.getLong(1) === vs.length.toLong)
      assert(math.abs(r.getDouble(2) - (1.0 - ss(rs) / ss(ys))) < 1e-4, s"$el seasonal")
      assert(math.abs(r.getDouble(3) - (1.0 - ss(r1.map(_._2)) / ss(ys))) < 1e-4,
        s"$el trend")
      val resStd = math.sqrt(ss(r2) / (r2.length - 1))
      assert(math.abs(r.getDouble(4) - resStd) < 1e-4, s"$el resid std")
      assert(r.getDouble(2) <= 1.0 + 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
    }
  }

  test("q466 forecast ensemble equals the scalar rules; MAEs nonnegative") {
    val rows = byName("q466_forecast_ensemble")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val el = r.getString(0)
      val vs = dailyGrid(el).toMap
      val trn = dailyGrid(el).filter(_._1 <= 22)
      val tst = dailyGrid(el).filter(_._1 >= 23)
      val vLast = trn.maxBy(_._1)._2; val vFirst = trn.minBy(_._1)._2
      val dLast = trn.map(_._1).max; val dFirst = trn.map(_._1).min
      val ewma = trn.filter(_._1 >= 1)
        .map { case (di, v) => 0.3 * math.pow(0.7, 22.0 - di) * v }.sum +
        math.pow(0.7, 22.0) * vFirst
      val errs = tst.map { case (di, v) =>
        val fNaive = vLast
        val fSnaive = vs(di - 7)
        val fDrift = vLast + (vLast - vFirst) / (dLast - dFirst) * (di - dLast)
        val fEwma = ewma
        (math.abs(v - fNaive), math.abs(v - fSnaive), math.abs(v - fDrift),
          math.abs(v - fEwma),
          math.abs(v - (fNaive + fSnaive + fDrift + fEwma) / 4.0))
      }
      val n = errs.length
      assert(math.abs(r.getDouble(1) - errs.map(_._1).sum / n) < 1e-4, s"$el naive")
      assert(math.abs(r.getDouble(2) - errs.map(_._2).sum / n) < 1e-4, s"$el snaive")
      assert(math.abs(r.getDouble(3) - errs.map(_._3).sum / n) < 1e-4, s"$el drift")
      assert(math.abs(r.getDouble(4) - errs.map(_._4).sum / n) < 1e-4, s"$el ewma")
      assert(math.abs(r.getDouble(5) - errs.map(_._5).sum / n) < 1e-4, s"$el ens")
      val best = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)).min
      assert(r.getInt(6) === (if (r.getDouble(5) < best) 1 else 0))
    }
  }

  test("q467 streaming consensus final refresh equals the batch q452 result") {
    val batch = byName("q452_causal_consensus")(spark, sf).collect().map(_.toString).toSeq
    val stream = byName("q467_stream_consensus")(spark, sf).collect().map(_.toString).toSeq
    assert(stream === batch)
  }
}
