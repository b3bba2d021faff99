package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-13 operators (q369–q371) beyond their oracle
  * hash checks: the Fellegi–Sunter EM posterior is the exact monotone
  * transform of the decision weight and the pattern counts partition the
  * blocked pair space; Kneser–Ney scoring matches an independent scalar
  * reimplementation doc-for-doc on the whole top-20; and the matrix
  * profile's motif/discord per element EQUAL an independent brute-force
  * O(n²m) computation on the collected grid, with the round-6 cut margins
  * measured rather than assumed.
  */
class Round13Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round13-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  test("q369 EM: posterior is the monotone transform of the weight; counts partition the pair space") {
    val rows = byName("q369_fellegi_sunter")(spark, sf).collect()
    assert(rows.nonEmpty)
    val prev = rows.head.getAs[Double]("prevalence")
    assert(prev > 0 && prev < 1, s"prevalence must be interior, got $prev")
    assert(rows.map(_.getAs[Double]("prevalence")).distinct.length === 1,
      "prevalence is a corpus scalar, identical on every pattern row")
    // posterior = 1 / (1 + (1-p)/p · 2^{-w}) — strictly increasing in w,
    // so sorting by weight and sorting by posterior must agree exactly
    val byW = rows.sortBy(_.getAs[Double]("log2_weight")).map(_.getAs[Int]("pattern"))
    val byPost = rows.sortBy(_.getAs[Double]("posterior")).map(_.getAs[Int]("pattern"))
    assert(byW.toSeq === byPost.toSeq,
      "posterior and log2 weight must induce the same pattern order")
    // the pattern counts partition the blocked candidate-pair space:
    // recompute the pair count directly from the same blocking key
    val px = Tables.documents(spark, sf).select(
      col("doc_id"), col("lang"), col("source"),
      expr("n_chars div 20").as("blk"))
    val b = px.select(col("doc_id").as("b_doc"), col("lang").as("b_lang"),
      col("source").as("b_src"), col("blk").as("b_blk"))
    val nPairs = px.join(b,
        col("b_lang") === col("lang") && col("b_src") === col("source") &&
          col("b_blk") === col("blk") && col("b_doc") > col("doc_id")).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === nPairs,
      "pattern counts must sum to the blocked pair count")
    // EM separates: the strongest-agreement observed pattern must carry a
    // higher match posterior than the all-disagree pattern
    val p0 = rows.find(_.getAs[Int]("pattern") == 0).get.getAs[Double]("posterior")
    val pMax = rows.map(_.getAs[Double]("posterior")).max
    assert(pMax > p0 + 0.1,
      s"EM must separate the match class: max posterior $pMax vs all-disagree $p0")
  }

  test("q370 Kneser–Ney: positive finite xent; matches the scalar KN reference doc-for-doc") {
    val top = byName("q370_kneser_ney")(spark, sf).collect()
    assert(top.length === 20)
    top.foreach { r =>
      val x = r.getAs[Double]("kn_xent")
      assert(!x.isNaN && !x.isInfinite && x > 0, s"xent must be positive finite, got $x")
      assert(r.getAs[Long]("n_bigrams") >= 1)
    }
    // independent scalar reference: reimplement interpolated KN (Chen &
    // Goodman eq. 4.24, D = 0.75, add-one continuation over B + V + 1)
    // in plain Scala over the collected corpus, and require the query's
    // top-20 to match it doc-for-doc -- the q371 brute-force discipline.
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      functions.Text.wordsCol(col("text")).as("ws"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 10).as("bucket"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getSeq[String](1), r.getAs[Long]("bucket")))
    val train = docs.filter(_._3 < 8)
    val eval_ = docs.filter(_._3 >= 8)
    val bc = scala.collection.mutable.Map[(String, String), Long]()
    train.foreach { case (_, ws, _) =>
      if (ws.length >= 2) ws.sliding(2).foreach { p =>
        bc((p(0), p(1))) = bc.getOrElse((p(0), p(1)), 0L) + 1
      }
    }
    val c1 = bc.groupBy(_._1._1).map { case (h, m) => h -> m.values.sum }
    val n1fw = bc.groupBy(_._1._1).map { case (h, m) => h -> m.size.toLong }
    val n1bw = bc.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val bb = bc.size.toDouble
    val vv = train.flatMap(_._2).distinct.length.toDouble
    def xentOf(ws: Seq[String]): (Long, Double) = {
      val terms = ws.sliding(2).filter(_.length == 2).map { p =>
        val (w1, w2) = (p(0), p(1))
        val pc = (n1bw.getOrElse(w2, 0L) + 1) / (bb + vv + 1.0)
        val prob = c1.get(w1) match {
          case None => pc
          case Some(c) =>
            math.max(bc.getOrElse((w1, w2), 0L) - 0.75, 0) / c +
              (0.75 * n1fw(w1) / c) * pc
        }
        -math.log(prob)
      }.toSeq
      (terms.length.toLong, terms.sum / terms.length)
    }
    val ref = eval_.filter(_._2.length >= 2).map { case (id, ws, _) =>
      val (n, x) = xentOf(ws); (id, n, x)
    }
    val refTop = ref.sortBy { case (id, _, x) =>
      (-BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, id)
    }.take(20)
    assert(top.map(_.getAs[Long]("doc_id")).toSeq === refTop.map(_._1).toSeq,
      "query top-20 must match the scalar KN reference selection")
    top.zip(refTop).foreach { case (r, (id, n, x)) =>
      assert(r.getAs[Long]("n_bigrams") === n, s"doc $id n_bigrams")
      assert(math.abs(r.getAs[Double]("kn_xent") - x) < 1e-6, s"doc $id xent vs reference $x")
    }
  }

  test("q371 matrix profile equals an independent brute-force computation; cut margins measured") {
    val rows = byName("q371_matrix_profile")(spark, sf).collect()
      .map(r => r.getAs[String]("el") -> r).toMap
    assert(rows.nonEmpty)
    // independent brute force on the collected grid (O(P·T²·m) — tiny)
    val grid = operators.CausalOps.daily(spark, sf)
      .select("el", "di", "v").collect()
      .groupBy(_.getAs[String]("el"))
      .map { case (el, rs) =>
        el -> rs.sortBy(_.getAs[Int]("di")).map(_.getAs[Double]("v"))
      }
    val m = 7
    for ((el, x) <- grid) {
      val n = x.length
      val starts = 0 until (n - m + 1) // 0-based; query reports 1-based
      def stats(i: Int): (Double, Double) = {
        var sx = 0.0; var sxx = 0.0
        var k = 0
        while (k < m) { sx += x(i + k); sxx += x(i + k) * x(i + k); k += 1 }
        (sx, sxx)
      }
      def dist(i: Int, j: Int): Double = {
        val (sxi, sxxi) = stats(i); val (sxj, sxxj) = stats(j)
        var sxy = 0.0
        var k = 0
        while (k < m) { sxy += x(i + k) * x(j + k); k += 1 }
        val den = math.sqrt((m * sxxi - sxi * sxi) * (m * sxxj - sxj * sxj))
        val rho = if (den == 0) 0.0 else (m * sxy - sxi * sxj) / den
        math.sqrt(math.max(2.0 * m * (1.0 - rho), 0.0))
      }
      val pairs = for {
        i <- starts; j <- starts if j >= i + 4
      } yield (i, j, dist(i, j))
      if (pairs.nonEmpty) {
        val r = rows(el)
        val motif = pairs.minBy { case (i, j, d) =>
          (BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP), i, j)
        }
        assert(r.getAs[Long]("motif_i") === motif._1 + 1, s"$el motif_i")
        assert(r.getAs[Long]("motif_j") === motif._2 + 1, s"$el motif_j")
        assert(math.abs(r.getAs[Double]("motif_dist") - motif._3) < 1e-6, s"$el motif_dist")
        val nn = pairs.flatMap { case (i, j, d) => Seq(i -> d, j -> d) }
          .groupBy(_._1).map { case (s, ds) => s -> ds.map(_._2).min }
        val discord = nn.toSeq.maxBy { case (s, d) =>
          (BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP), -s)
        }
        assert(r.getAs[Long]("discord_i") === discord._1 + 1, s"$el discord_i")
        assert(math.abs(r.getAs[Double]("discord_dist") - discord._2) < 1e-6, s"$el discord")
        assert(r.getAs[Long]("n_sub") === starts.length.toLong, s"$el n_sub")
        // measured round-6 cut margin: winner vs runner-up keys must not
        // collide unless the (i, j) tie-break is what decided — record the
        // gap so a future fixture change that lands on a boundary fails
        // loudly here rather than as an intermittent hash red
        val keys = pairs.map(p => BigDecimal(p._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sorted.take(2)
        if (keys.size == 2 && keys(0) != keys(1)) {
          val gap = (keys(1) - keys(0)).toDouble
          assert(gap > 1e-6 - 1e-12, s"$el motif margin $gap")
        }
      }
    }
  }
}
