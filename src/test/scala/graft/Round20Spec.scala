package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-20 eval-shelf operators (q408–q413) beyond
  * their oracle hash checks — scalar reimplementations where the math
  * has room to be subtly wrong (pass@k combinatorics, Fleiss kappa,
  * query-likelihood scoring, Chao1), self-consistency from emitted
  * exact counts where the output carries its own witnesses (BLEU-2),
  * and cascade-model bounds for ERR.
  */
class Round20Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round20-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  test("q408 pass@k equals the scalar combinatorial estimator and is monotone in k") {
    val rows = byName("q408_pass_at_k")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 5, 10))
    // independent scalar recompute from raw events
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .where(col("event_type") === "click")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), count_if(col("value") > 60).as("c"))
      .where(col("n") >= 10)
      .collect().map(r => (r.getLong(1).toInt, r.getLong(2).toInt))
    def passAtK(n: Int, c: Int, k: Int): Double =
      if (n - c < k) 1.0
      else 1.0 - (0 until k).foldLeft(1.0)((acc, i) => acc * (n - c - i).toDouble / (n - i))
    for ((k, nTasks, got) <- rows) {
      assert(nTasks === ev.length.toLong)
      val want = ev.map { case (n, c) => passAtK(n, c, k) }.sum / ev.length
      assert(math.abs(got - want) < 1e-6, s"k=$k got $got want $want")
      assert(got >= 0.0 && got <= 1.0)
    }
    // more tries can only help: pass@1 <= pass@5 <= pass@10
    assert(rows(0)._3 <= rows(1)._3 + 1e-12)
    assert(rows(1)._3 <= rows(2)._3 + 1e-12)
  }

  test("q409 BLEU-2 is self-consistent with its emitted clipped counts and bounded") {
    val rows = byName("q409_bleu_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nU, mU, nB, mB, bleu) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(mU <= nU && mB <= nB, "clipped counts cannot exceed candidate counts")
      val want =
        if (mU > 0 && mB > 0)
          math.sqrt((mU.toDouble / nU) * (mB.toDouble / nB))
        else 0.0
      assert(math.abs(bleu - want) < 1e-6)
      assert(bleu >= 0.0 && bleu <= 1.0)
    }
    // top-20 is sorted by score desc
    val scores = rows.map(_.getDouble(5)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("q410 ERR@10 obeys the cascade bounds and beats the top-gain floor") {
    val r = byName("q410_err_eval")(spark, sf).head()
    val (nSys, err, maxGain) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(nSys === 10L)
    assert(maxGain >= 0.0 && maxGain <= 1023.0 / 1024.0 + 1e-9)
    // ERR is a probability-weighted reciprocal rank: in (0, 1]
    assert(err > 0.0 && err <= 1.0)
    // a result with gain g at position 1 alone contributes R_1; ERR >= R_1
    // iff the top result is the top contribution — weaker sound bound:
    // ERR >= maxGain/10 (the worst placement of the best gain, fully
    // survived), and ERR <= sum 1/r = H_10
    assert(err >= maxGain / 10.0 - 1e-9)
    assert(err <= (1 to 10).map(1.0 / _).sum + 1e-9)
  }

  test("q411 Fleiss kappa equals the scalar panel recompute") {
    val r = byName("q411_fleiss_kappa")(spark, sf).head()
    val (nItems, pBar, pE, kappa) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // scalar recompute with the same total order
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r2 => (r2.getLong(0), r2.getString(1),
        (r2.getInt(2), r2.getLong(3), r2.getLong(4), r2.getDouble(5), r2.getDouble(6))))
    val panels = li.groupBy(_._1).filter(_._2.length >= 3)
      .map { case (_, rs) => rs.sortBy(_._3).take(3).map(_._2) }
    assert(nItems === panels.size.toLong)
    val pis = panels.map { cats =>
      val sq = cats.groupBy(identity).values.map(g => g.length * g.length).sum
      (sq - 3).toDouble / 6.0
    }
    val pBarWant = pis.sum / panels.size
    val catTot = panels.toSeq.flatten.groupBy(identity).view.mapValues(_.length).toMap
    val peWant = catTot.values.map { m =>
      val p = m.toDouble / (3.0 * panels.size); p * p
    }.sum
    val kWant = (pBarWant - peWant) / (1.0 - peWant)
    assert(math.abs(pBar - pBarWant) < 1e-6)
    assert(math.abs(pE - peWant) < 1e-6)
    assert(math.abs(kappa - kWant) < 1e-5)
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("q412 query likelihood matches a scalar Dirichlet scorer doc-for-doc") {
    val rows = byName("q412_query_likelihood")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length === 10)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty)))
    val terms = Seq("spark", "join", "fast")
    val tot = docs.map(_._2.length.toDouble).sum
    val cc = terms.map(t => docs.map(_._2.count(_ == t).toDouble).sum)
    val mu = 300.0
    val scored = docs.map { case (id, ws) =>
      val dl = ws.length.toDouble
      val tfs = terms.map(t => ws.count(_ == t).toDouble)
      val sc = tfs.zip(cc).map { case (tf, c) =>
        math.log((tf + mu * (c / tot)) / (dl + mu))
      }.sum
      (id, tfs.sum, sc)
    }.filter(_._2 > 0).map(x => (x._1, x._3))
      .sortBy(x => (-x._2, x._1)).take(10)
    for (((gid, gsc), (wid, wsc)) <- rows.zip(scored)) {
      assert(gid === wid)
      assert(math.abs(gsc - wsc) < 1e-5, s"doc $gid got $gsc want $wsc")
    }
  }

  test("q413 Chao1 matches scalar frequency-of-frequencies and dominates S_obs") {
    val rows = byName("q413_chao1_richness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(' ').filter(_.nonEmpty)))
    val bySrc = docs.groupBy(_._1)
    for ((src, sObs, f1, f2, nTok, chao1, cov) <- rows) {
      val counts = bySrc(src).flatMap(_._2).groupBy(identity).view.mapValues(_.length)
      assert(sObs === counts.size.toLong)
      assert(f1 === counts.values.count(_ == 1).toLong)
      assert(f2 === counts.values.count(_ == 2).toLong)
      assert(nTok === counts.values.map(_.toLong).sum)
      val chaoWant = sObs + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1))
      assert(math.abs(chao1 - chaoWant) < 1e-6)
      assert(chao1 >= sObs.toDouble, "richness estimate cannot fall below observed")
      assert(cov >= 0.0 && cov <= 1.0)
      assert(math.abs(cov - (1.0 - f1.toDouble / nTok)) < 1e-6)
    }
  }
}
