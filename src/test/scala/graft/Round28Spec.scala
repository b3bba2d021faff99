package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-28 operators (q457–q462) beyond their
  * oracle hash checks: isotropy against scalar per-dimension spectra;
  * deseasonalized/windowed Granger against scalar two-regressor
  * regressions; the Poisson-Granger IRLS chain against a scalar
  * reimplementation; PII patterns proven on a hostile fixture; the
  * split audit against scalar counting plus the leakage invariant.
  */
class Round28Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round28-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  test("q457 isotropy equals the scalar per-dimension spectrum; eff_rank <= dims") {
    val rows = byName("q457_embedding_isotropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => (r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray))
    val dims = emb.head._2.length
    for (r <- rows) {
      val label = r.getInt(0)
      val vs = emb.filter(_._1 == label).map(_._2)
      val n = vs.length.toDouble
      val vars = (0 until dims).map { i =>
        val xs = vs.map(_(i))
        val m = xs.sum / n
        (xs.map(x => x * x).sum - xs.sum * xs.sum / n) / n
      }
      val mus = (0 until dims).map(i => vs.map(_(i)).sum / n)
      val ex2 = (0 until dims).map(i => vs.map(x => x(i) * x(i)).sum / n).sum
      val vtot = vars.sum
      val h = vars.filter(_ > 0).map { v => val p = v / vtot; -p * math.log(p) }.sum
      assert(r.getLong(1) === vs.length.toLong)
      assert(math.abs(r.getDouble(2) - math.exp(h)) < 1e-3, s"label $label eff_rank")
      assert(r.getDouble(2) <= dims + 1e-6)
      assert(math.abs(r.getDouble(3) - vars.max / vtot) < 1e-5)
      assert(math.abs(r.getDouble(4) - mus.map(m => m * m).sum / ex2) < 1e-5)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9)
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

  /** Scalar q230 Granger gain over (di, v) maps. */
  private def scalarGain(src: Map[Int, Double], dst: Map[Int, Double]): Double = {
    val triples = dst.keys.toSeq.sorted.flatMap(di =>
      for (yl <- dst.get(di - 1); xl <- src.get(di - 1)) yield (dst(di), yl, xl))
    val n = triples.length.toDouble
    val (sy, s1, s2) = (triples.map(_._1).sum, triples.map(_._2).sum,
      triples.map(_._3).sum)
    val syy = triples.map(t => t._1 * t._1).sum
    val s11 = triples.map(t => t._2 * t._2).sum
    val s22 = triples.map(t => t._3 * t._3).sum
    val s12 = triples.map(t => t._2 * t._3).sum
    val s1y = triples.map(t => t._2 * t._1).sum
    val s2y = triples.map(t => t._3 * t._1).sum
    val cyy = syy - sy * sy / n; val c11 = s11 - s1 * s1 / n
    val c22 = s22 - s2 * s2 / n; val c12 = s12 - s1 * s2 / n
    val c1y = s1y - s1 * sy / n; val c2y = s2y - s2 * sy / n
    val sseR = cyy - c1y * c1y / c11
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    (sseR - (cyy - b1 * c1y - b2 * c2y)) / sseR
  }

  test("q458 deseasonalized Granger equals the scalar residual regression") {
    val rows = byName("q458_deseasonal_granger")(spark, sf).collect()
    assert(rows.length === 20)
    val resid: Map[String, Map[Int, Double]] = dailyGrid.map { case (el, vs) =>
      val wm = vs.groupBy(_._1 % 7).view.mapValues(g => g.map(_._2).sum / g.length)
      el -> vs.map { case (di, v) => di -> (v - wm(di % 7)) }.toMap
    }
    val raw: Map[String, Map[Int, Double]] =
      dailyGrid.map { case (el, vs) => el -> vs.toMap }
    for (r <- rows.take(6)) {
      val (src, dst) = (r.getString(0), r.getString(1))
      assert(math.abs(r.getDouble(2) - scalarGain(raw(src), raw(dst))) < 1e-4,
        s"$src->$dst raw gain")
      assert(math.abs(r.getDouble(3) - scalarGain(resid(src), resid(dst))) < 1e-4,
        s"$src->$dst deseasonal gain")
      val flag = if (r.getDouble(2) >= 0.05 && r.getDouble(3) < 0.05) 1 else 0
      assert(r.getInt(4) === flag)
    }
  }

  test("q459 Poisson Granger equals the scalar two-step IRLS chain") {
    val rows = byName("q459_poisson_granger")(spark, sf).collect()
    assert(rows.length === 20)
    val counts: Map[String, Map[Int, Double]] =
      spark.read.parquet(s"$sf/events.parquet")
        .groupBy(col("event_type").as("el"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("di"))
        .agg(count(lit(1)).cast("double").as("cnt"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toMap).toMap
    def solve3(m: Array[Array[Double]], rhs: Array[Double]): Array[Double] = {
      def det3(a: Array[Array[Double]]) =
        a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
          a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
          a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
      val d = det3(m)
      (0 to 2).map { j =>
        val mj = m.map(_.clone())
        for (i <- 0 to 2) mj(i)(j) = rhs(i)
        det3(mj) / d
      }.toArray
    }
    for (r <- rows.take(6)) {
      val (src, dst) = (r.getString(0), r.getString(1))
      val mcs = counts(src).values.sum / counts(src).size
      val mcd = counts(dst).values.sum / counts(dst).size
      val pts = counts(dst).keys.toSeq.sorted.flatMap(di =>
        for (yl <- counts(dst).get(di - 1); xl <- counts(src).get(di - 1))
          yield (counts(dst)(di), yl / mcd, xl / mcs))
      var b = Array(math.log(pts.map(_._1).sum / pts.length), 0.0, 0.0)
      for (_ <- 1 to 2) {
        var sw, sw1, sw2, s11, s12, s22, sz, sz1, sz2 = 0.0
        for ((y, x1, x2) <- pts) {
          val eta = b(0) + b(1) * x1 + b(2) * x2
          val mu = math.exp(eta)
          val z = eta + (y - mu) / mu
          sw += mu; sw1 += mu * x1; sw2 += mu * x2
          s11 += mu * x1 * x1; s12 += mu * x1 * x2; s22 += mu * x2 * x2
          sz += mu * z; sz1 += mu * z * x1; sz2 += mu * z * x2
        }
        b = solve3(Array(Array(sw, sw1, sw2), Array(sw1, s11, s12),
          Array(sw2, s12, s22)), Array(sz, sz1, sz2))
      }
      assert(math.abs(r.getDouble(2) - b(0)) < 1e-4, s"$src->$dst b0")
      assert(math.abs(r.getDouble(3) - b(1)) < 1e-4, s"$src->$dst b1")
      assert(math.abs(r.getDouble(4) - b(2)) < 1e-4, s"$src->$dst b2")
      assert(math.abs(r.getDouble(5) - math.exp(b(2))) < 1e-3)
    }
  }

  test("q460 Granger stability equals per-window scalar gains; range consistent") {
    val rows = byName("q460_granger_stability")(spark, sf).collect()
    assert(rows.length === 60)
    val raw: Map[String, Map[Int, Double]] =
      dailyGrid.map { case (el, vs) => el -> vs.toMap }
    for (r <- rows.take(9)) {
      val (src, dst, w0) = (r.getString(0), r.getString(1), r.getInt(2))
      val sliced = (el: String) => raw(el).filter { case (di, _) =>
        di >= w0 && di <= w0 + 19
      }
      val want = scalarGain(sliced(src), sliced(dst))
      assert(math.abs(r.getDouble(3) - want) < 1e-4, s"$src->$dst w$w0")
    }
    // range = max - min of the three window gains per pair
    val byPair = rows.groupBy(r => (r.getString(0), r.getString(1)))
    for ((k, rs) <- byPair) {
      val gains = rs.map(_.getDouble(3))
      val want = gains.max - gains.min
      for (r <- rs) assert(math.abs(r.getDouble(4) - want) < 2e-6, s"$k range")
    }
  }

  test("q461 PII patterns fire on a hostile fixture and match scalar counts on the corpus") {
    // the patterns themselves, proven on hostile strings
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+".r
    val url = "https?://[^ ]+".r
    val ip = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+".r
    val phone = "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]".r
    assert(email.findAllIn("contact a.b+c@mail-host.co.uk now").length === 1)
    assert(url.findAllIn("see https://x.y/z?a=1 and http://q.r").length === 2)
    assert(ip.findAllIn("server 10.0.0.1 and 192.168.1.255").length === 2)
    assert(phone.findAllIn("call 555-123-4567").length === 1)
    assert(email.findAllIn("no pii here").isEmpty)
    // corpus-side equality with the scalar recomputation
    val rows = byName("q461_pii_scan")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for (r <- rows) {
      val src = r.getString(0)
      val ds = docs.filter(_._1 == src)
      val em = ds.map(d => email.findAllIn(d._2).length).sum
      val ur = ds.map(d => url.findAllIn(d._2).length).sum
      val ipn = ds.map(d => ip.findAllIn(d._2).length).sum
      val ph = ds.map(d => phone.findAllIn(d._2).length).sum
      assert(r.getLong(1) === ds.length.toLong)
      assert(r.getLong(2) === em.toLong, s"$src email")
      assert(r.getLong(3) === ur.toLong, s"$src url")
      assert(r.getLong(4) === ipn.toLong, s"$src ipv4")
      assert(r.getLong(5) === ph.toLong, s"$src phone")
      val withPii = ds.count { d =>
        email.findAllIn(d._2).nonEmpty || url.findAllIn(d._2).nonEmpty ||
          ip.findAllIn(d._2).nonEmpty || phone.findAllIn(d._2).nonEmpty
      }
      assert(r.getLong(6) === withPii.toLong)
    }
  }

  test("q462 split audit equals scalar counting and proves the leakage invariant") {
    val rows = byName("q462_group_split_audit")(spark, sf).collect()
    assert(rows.length === 3)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def splitOf(u: Long): String =
      if (u % 10 <= 7) "train" else if (u % 10 == 8) "val" else "test"
    val global = ev.groupBy(_._2).view.mapValues(_.length.toDouble / ev.length)
    for (r <- rows) {
      val sp = r.getString(0)
      val es = ev.filter(e => splitOf(e._1) == sp)
      assert(r.getLong(1) === es.map(_._1).distinct.length.toLong, s"$sp users")
      assert(r.getLong(2) === es.length.toLong, s"$sp events")
      assert(math.abs(r.getDouble(3) - es.map(_._3).sum / es.length) < 1e-4)
      val drift = global.keys.map { t =>
        math.abs(es.count(_._2 == t).toDouble / es.length - global(t))
      }.max
      assert(math.abs(r.getDouble(4) - drift) < 1e-5, s"$sp drift")
      assert(r.getLong(5) === 1L, "every user in exactly one split")
    }
    // 8/1/1 shape: train has most users
    val users = rows.map(r => (r.getString(0), r.getLong(1))).toMap
    assert(users("train") > users("val") && users("train") > users("test"))
  }
}
