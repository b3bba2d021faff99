package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-26 operators (q446–q451) beyond their
  * oracle hash checks: the circular-shift null against a scalar
  * enumeration of all shifts; burst sync against scalar threshold
  * counting; Flesch against scalar regex counting; the entropy rate
  * against scalar bigram tallies (and its log-P upper bound); hard
  * negatives against brute-force cosine ranking; burstiness/memory
  * against scalar per-user gap sequences.
  */
class Round26Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round26-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  private lazy val dailyGrid: Map[String, Seq[(Int, Double)]] =
    spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
      .agg((sum(col("value").cast("decimal(18,3)")).cast("double") /
        count(lit(1))).as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq)
      .toMap

  test("q446 circular-shift null equals the scalar enumeration of all shifts") {
    val rows = byName("q446_circular_shift_null")(spark, sf).collect()
    assert(rows.length === 20)
    def corr(xs: Seq[Double], ys: Seq[Double]): Double = {
      val n = xs.length
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    for (r <- rows) {
      val (src, dst) = (r.getString(0), r.getString(1))
      val xs = dailyGrid(src).map(_._2)
      val ys = dailyGrid(dst).map(_._2)
      val n = ys.length
      val rS = (0 until n).map { s =>
        val shifted = (0 until n).map(t => xs(((t - 1 + s) % n + n) % n))
        corr(shifted, ys)
      }
      val rObs = rS.head
      val nExceed = rS.tail.count(rs => math.abs(rs) >= math.abs(rObs))
      val p = (1.0 + nExceed) / n
      assert(math.abs(r.getDouble(2) - rObs) < 1e-5, s"$src->$dst r_obs")
      assert(r.getLong(3) === nExceed.toLong, s"$src->$dst exceed count")
      assert(r.getLong(4) === n.toLong)
      assert(math.abs(r.getDouble(5) - p) < 1e-6)
      assert(r.getDouble(5) >= 1.0 / n && r.getDouble(5) <= 1.0)
    }
  }

  test("q447 burst sync equals the scalar threshold recomputation") {
    val rows = byName("q447_burst_sync")(spark, sf).collect()
    val hg = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type").as("el"),
        (datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")) * 24
          + hour(col("ts"))).as("h"))
      .agg(count(lit(1)).cast("double").as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val bursts: Map[String, Set[Int]] = hg.groupBy(_._1).map { case (el, vs) =>
      val ns = vs.map(_._3)
      val mu = ns.sum / ns.length
      val sg = math.sqrt(ns.map(x => (x - mu) * (x - mu)).sum / (ns.length - 1))
      el -> vs.filter(_._3 > mu + 2.0 * sg).map(_._2).toSet
    }
    val els = bursts.keys.toSeq.sorted
    val expected = for {
      i <- els; j <- els if i < j
      bi = bursts(i); bj = bursts(j)
    } yield (i, j, bi.count(bj.contains), bi.count(h => bj.contains(h - 1)),
      bi.count(h => bj.contains(h + 1)), bi.size, bj.size)
    // pairs with no coincidences at all are absent from the join
    val got = rows.map(r => (r.getString(0), r.getString(1))).toSet
    for ((i, j, same, jl, il, ni, nj) <- expected if same + jl + il > 0) {
      assert(got.contains((i, j)), s"missing pair ($i,$j)")
      val r = rows.find(r => r.getString(0) == i && r.getString(1) == j).get
      assert(r.getLong(2) === ni.toLong)
      assert(r.getLong(3) === nj.toLong)
      assert(r.getLong(4) === same.toLong, s"($i,$j) same")
      assert(r.getLong(5) === jl.toLong, s"($i,$j) j_leads")
      assert(r.getLong(6) === il.toLong, s"($i,$j) i_leads")
      val q = (same + jl + il) / math.sqrt(ni.toDouble * nj)
      assert(math.abs(r.getDouble(7) - q) < 1e-5)
    }
  }

  test("q448 Flesch equals the scalar regex recomputation") {
    val rows = byName("q448_flesch_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    for (r <- rows) {
      val src = r.getString(0)
      val scores = bySource(src).map(_._2).flatMap { t =>
        val w = "\\S+".r.findAllIn(t).length.toDouble
        val sen = math.max(1, "[.!?]+".r.findAllIn(t).length).toDouble
        val syl = "[aeiouy]+".r.findAllIn(t.toLowerCase).length.toDouble
        if (w > 0) Some(206.835 - 1.015 * (w / sen) - 84.6 * (syl / w)) else None
      }
      assert(r.getLong(1) === scores.length.toLong)
      assert(math.abs(r.getDouble(2) - scores.sum / scores.length) < 1e-4,
        s"$src avg")
      assert(math.abs(r.getDouble(3) - scores.min) < 1e-5)
      assert(math.abs(r.getDouble(4) - scores.max) < 1e-5)
      assert(r.getLong(5) === scores.count(_ < 30).toLong)
    }
  }

  test("q449 Markov entropy rate equals scalar bigram tallies, bounded by ln P") {
    val rows = byName("q449_markov_entropy_rate")(spark, sf).collect()
    assert(rows.length === 5)
    val seq = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("mic"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val trans = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    for ((_, evs) <- seq) {
      val ordered = evs.sortBy(e => (e._3, e._4)).map(_._2)
      for (w <- ordered.sliding(2) if w.length == 2)
        trans((w(0), w(1))) = trans((w(0), w(1))) + 1
    }
    val call = trans.values.sum.toDouble
    val states = rows.map(_.getString(0))
    var rate = 0.0
    for (r <- rows) {
      val a = r.getString(0)
      val ca = trans.filter(_._1._1 == a).values.sum.toDouble
      val ha = trans.filter(_._1._1 == a).values.map { c =>
        val p = c / ca; -p * math.log(p)
      }.sum
      assert(r.getLong(1) === ca.toLong, s"$a origin count")
      assert(math.abs(r.getDouble(2) - ca / call) < 1e-6)
      assert(math.abs(r.getDouble(3) - ha) < 1e-4, s"$a H_cond")
      assert(r.getDouble(3) <= math.log(5.0) + 1e-9, "H_a <= ln(#states)")
      rate += r.getDouble(4)
    }
    assert(rate > 0 && rate <= math.log(5.0) + 1e-6)
    assert(states.sorted === states.toSeq)
  }

  test("q450 hard negatives equal brute-force cosine ranking with positive margins") {
    val rows = byName("q450_hard_negatives")(spark, sf).collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (k <- a.indices) { d += a(k) * b(k); na += a(k) * a(k); nb += b(k) * b(k) }
      d / math.sqrt(na * nb)
    }
    val queries = emb.filter(_._1 < 16)
    assert(rows.length === queries.length * 3)
    for ((qid, qv, qlabel) <- queries) {
      val scored = emb.filter(_._1 != qid)
        .map { case (id, v, l) => (id, l, cos(v, qv)) }
      val posCos = scored.filter(_._2 == qlabel).map(_._3).max
      val negs = scored.filter(_._2 != qlabel)
        .sortBy(s => (-s._3, s._1)).take(3)
      val got = rows.filter(_.getLong(0) == qid).sortBy(_.getInt(2))
      for ((want, g) <- negs.zip(got)) {
        assert(g.getLong(3) === want._1, s"q$qid neg id")
        assert(math.abs(g.getDouble(5) - want._3) < 1e-5)
        assert(math.abs(g.getDouble(6) - posCos) < 1e-5)
        assert(math.abs(g.getDouble(7) - (posCos - want._3)) < 1e-5)
      }
    }
  }

  test("q451 burstiness/memory equals the scalar per-user gap recomputation") {
    val rows = byName("q451_burstiness")(spark, sf).collect()
    assert(rows.length === 5)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("mic"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    for (r <- rows) {
      val el = r.getString(0)
      val gapsByUser: Seq[Seq[Double]] =
        ev.filter(_._1 == el).groupBy(_._2).values.map { evs =>
          val ms = evs.sortBy(e => (e._3, e._4)).map(_._3)
          ms.sliding(2).filter(_.length == 2)
            .map(w => (w(1) - w(0)) / 1000000.0).toSeq
        }.toSeq
      val gaps = gapsByUser.flatten
      val n = gaps.length
      val mu = gaps.sum / n
      val sg = math.sqrt(gaps.map(g => (g - mu) * (g - mu)).sum / (n - 1))
      val b = (sg - mu) / (sg + mu)
      val pairs = gapsByUser.flatMap(gs =>
        gs.sliding(2).filter(_.length == 2).map(w => (w(0), w(1))))
      val np = pairs.length
      val (s1, s2) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val s12 = pairs.map(p => p._1 * p._2).sum
      val s11 = pairs.map(p => p._1 * p._1).sum
      val s22 = pairs.map(p => p._2 * p._2).sum
      val mem = (np * s12 - s1 * s2) /
        math.sqrt((np * s11 - s1 * s1) * (np * s22 - s2 * s2))
      assert(r.getLong(1) === n.toLong, s"$el gap count")
      assert(math.abs(r.getDouble(2) - mu) < 1e-4, s"$el mean gap")
      assert(math.abs(r.getDouble(3) - b) < 1e-5, s"$el burstiness")
      assert(math.abs(r.getDouble(4) - mem) < 1e-4, s"$el memory")
      assert(r.getLong(5) === np.toLong)
      assert(r.getDouble(3) > -1.0 && r.getDouble(3) < 1.0)
    }
  }
}
