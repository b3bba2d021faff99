package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-15 operators (q378–q383) beyond their oracle
  * hash checks — each is checked against an INDEPENDENT in-memory Scala
  * reimplementation on the collected (bounded) inputs: the synthetic-
  * control ridge weights satisfy the normal equations and the placebo
  * ranks are an exact permutation; the PCA loadings equal a scalar
  * power iteration on the same covariance; the RD fits equal scalar
  * weighted least squares per side; the Newey–West se equals a scalar
  * HAC recomputation; the JL distortion histogram matches bin-for-bin
  * with every R entry rebuilt from MD5; and the LPA trajectory equals a
  * scalar synchronous propagation with the same tie-break.
  */
class Round15Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round15-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  /** The (el, di, v) daily grid recomputed independently of CausalOps. */
  private lazy val grid: Map[(String, Int), Double] = {
    import java.time.LocalDate
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("ts").cast("date").cast("string"), col("value"))
      .collect()
    rows.groupBy(r => (r.getString(0),
        java.time.temporal.ChronoUnit.DAYS.between(
          LocalDate.parse("2024-01-01"), LocalDate.parse(r.getString(1))).toInt))
      .map { case (k, rs) =>
        // mirror the decimal(18,3) exact daily mean
        val s = rs.map(r => BigDecimal(r.getDouble(2)).setScale(3, BigDecimal.RoundingMode.HALF_UP)).sum
        k -> (s.toDouble / rs.length)
      }
  }

  test("q378 synthetic control: ridge normal equations, placebo permutation") {
    val rows = byName("q378_synthetic_control")(spark, sf).collect()
    assert(rows.length === 5)
    val els = rows.map(_.getAs[String]("el"))
    // ranks are an exact permutation of 1..5 and pval = rnk/5
    val rnks = rows.map(_.getAs[Int]("rnk")).sorted
    assert(rnks.toSeq === (1 to 5))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("pval") - r.getAs[Int]("rnk") / 5.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("ratio") -
        r.getAs[Double]("post_rmspe") / r.getAs[Double]("pre_rmspe")) < 1e-4)
      assert(r.getAs[Double]("pre_rmspe") > 0 && r.getAs[Double]("post_rmspe") > 0)
    }
    assert(rows.count(_.getAs[Int]("treated") == 1) === 1)
    // the reported weights satisfy (S + I) w = s_y on independently
    // recomputed pre-period design moments (rounding tolerance 1e-3)
    rows.foreach { r =>
      val t = r.getAs[String]("el")
      val ds = Array("d1", "d2", "d3").map(r.getAs[String])
      val days = (0 until 21).filter(di =>
        grid.contains((t, di)) && ds.forall(dn => grid.contains((dn, di))))
      val n = days.length.toDouble
      val y = days.map(di => grid((t, di))).toArray
      val x = ds.map(dn => days.map(di => grid((dn, di))).toArray)
      def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(p => p._1 * p._2).sum
      val w = Array("w1", "w2", "w3").map(r.getAs[Double])
      for (i <- 0 until 3) {
        val lhs = (0 until 3).map { j =>
          val sij = dot(x(i), x(j)) - x(i).sum * x(j).sum / n
          (sij + (if (i == j) 1.0 else 0.0)) * w(j)
        }.sum
        val rhs = dot(x(i), y) - x(i).sum * y.sum / n
        assert(math.abs(lhs - rhs) < 1e-2,
          s"normal equation $i violated for $t: $lhs vs $rhs")
      }
      val icept = y.sum / n - (0 until 3).map(i => w(i) * x(i).sum / n).sum
      assert(math.abs(icept - r.getAs[Double]("icept")) < 1e-3)
    }
  }

  test("q379 PCA equals a scalar power iteration on the same covariance") {
    val rows = byName("q379_pca_power")(spark, sf).collect().sortBy(_.getAs[Int]("dim"))
    assert(rows.length === 64)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = emb.length; val dd = 64
    val mu = Array.tabulate(dd)(i => emb.map(_(i)).sum / n)
    val c = Array.tabulate(dd, dd)((i, j) =>
      emb.map(v => v(i) * v(j)).sum / n - mu(i) * mu(j))
    var v = Array.fill(dd)(0.125)
    for (_ <- 1 to 6) {
      val w = Array.tabulate(dd)(i => (0 until dd).map(j => c(i)(j) * v(j)).sum)
      val nm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nm)
    }
    val w7 = Array.tabulate(dd)(i => (0 until dd).map(j => c(i)(j) * v(j)).sum)
    val lam = v.zip(w7).map(p => p._1 * p._2).sum
    val tr = (0 until dd).map(i => c(i)(i)).sum
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("loading") - v(i)) < 1e-4,
        s"loading mismatch at dim ${i + 1}")
      assert(math.abs(r.getAs[Double]("eig") - lam) < 1e-4)
      assert(math.abs(r.getAs[Double]("evr") - lam / tr) < 1e-4)
    }
    // unit norm within rounding
    val nrm = rows.map(_.getAs[Double]("loading")).map(x => x * x).sum
    assert(math.abs(nrm - 1.0) < 1e-4)
  }

  test("q380 RD equals scalar weighted least squares per side") {
    val rows = byName("q380_reg_discontinuity")(spark, sf).collect()
    assert(rows.length === 3)
    val od = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_totalprice"), col("o_orderpriority")).collect()
      .map(r => ((r.getDouble(0) - 250000.0) / 1000.0,
        if (r.getString(1) == "1-URGENT") 1.0 else 0.0))
    rows.foreach { r =>
      val h = r.getAs[Double]("h")
      def fit(side: Boolean): (Double, Double, Long) = {
        val pts = od.filter { case (u, _) =>
          math.abs(u) < h && (if (side) u >= 0 else u < 0) }
        val w = pts.map { case (u, _) => 1.0 - math.abs(u) / h }
        val sw = w.sum
        val swu = pts.zip(w).map { case ((u, _), wi) => wi * u }.sum
        val swy = pts.zip(w).map { case ((_, y), wi) => wi * y }.sum
        val swuu = pts.zip(w).map { case ((u, _), wi) => wi * u * u }.sum
        val swuy = pts.zip(w).map { case ((u, y), wi) => wi * u * y }.sum
        val b = (sw * swuy - swu * swy) / (sw * swuu - swu * swu)
        val a = (swy - b * swu) / sw
        (a, b, pts.length.toLong)
      }
      val (al, bl, nl) = fit(side = false)
      val (ar, br, nr) = fit(side = true)
      assert(r.getAs[Long]("n_left") === nl && r.getAs[Long]("n_right") === nr)
      assert(math.abs(r.getAs[Double]("cut_left") - al) < 1e-5)
      assert(math.abs(r.getAs[Double]("cut_right") - ar) < 1e-5)
      assert(math.abs(r.getAs[Double]("tau") - (ar - al)) < 1e-5)
      assert(math.abs(r.getAs[Double]("slope_left") - bl) < 1e-5)
      assert(math.abs(r.getAs[Double]("slope_right") - br) < 1e-5)
    }
  }

  test("q381 Newey-West equals a scalar HAC recomputation") {
    val rows = byName("q381_newey_west")(spark, sf).collect()
    assert(rows.length === 20)
    val els = grid.keys.map(_._1).toSeq.distinct.sorted
    rows.foreach { r =>
      val (ea, eb) = (r.getAs[String]("ea"), r.getAs[String]("eb"))
      val days = (0 until 30).filter(di =>
        grid.contains((ea, di)) && grid.contains((eb, di)))
      val x = days.map(di => grid((ea, di))).toArray
      val y = days.map(di => grid((eb, di))).toArray
      val n = days.length.toDouble
      val xb = x.sum / n
      val sxxc = x.map(v => (v - xb) * (v - xb)).sum
      val beta = x.zip(y).map { case (a2, b2) => (a2 - xb) * b2 }.sum / sxxc
      val alpha = (y.sum - beta * x.sum) / n
      val u = x.zip(y).map { case (xi, yi) => (yi - alpha - beta * xi) * (xi - xb) }
      val L = 7
      var ss = 0.0
      for (l <- 0 to L) {
        // engine pairs on CALENDAR lag di1 - di2 = l, not array offset
        val gl = (for {
          i <- days.indices; j <- days.indices
          if days(i) - days(j) == l
        } yield u(i) * u(j)).sum
        ss += (if (l == 0) gl else 2.0 * (1.0 - l / 8.0) * gl)
      }
      assert(r.getAs[Long]("n") === days.length.toLong)
      assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-4)
      assert(math.abs(r.getAs[Double]("se_hac") - math.sqrt(ss) / sxxc) < 1e-4,
        s"se_hac mismatch for ($ea,$eb)")
      val syyc = y.map(v => (v - y.sum / n) * (v - y.sum / n)).sum
      val seOls = math.sqrt(((syyc - beta * beta * sxxc) / (n - 2)) / sxxc)
      assert(math.abs(r.getAs[Double]("se_ols") - seOls) < 1e-4)
    }
  }

  test("q382 JL distortion histogram matches an MD5-exact recomputation") {
    val rows = byName("q382_jl_projection")(spark, sf).collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1).map(_._2)
    assert(emb.length === 64)
    def md5hex(s2: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rmat = Array.tabulate(16, 64) { (k0, j0) =>
      val h = Integer.parseInt(md5hex(s"jl:${k0 + 1}:${j0 + 1}").substring(0, 1), 16)
      (1 - 2 * (h % 2)) * 0.25
    }
    val proj = emb.map(v => Array.tabulate(16)(k =>
      (0 until 64).map(j => rmat(k)(j) * v(j)).sum))
    val hist = scala.collection.mutable.Map[Int, (Long, Double)]()
    for (a2 <- 0 until 64; b2 <- a2 + 1 until 64) {
      val d2o = (0 until 64).map(j => math.pow(emb(a2)(j) - emb(b2)(j), 2)).sum
      val d2p = (0 until 16).map(k => math.pow(proj(a2)(k) - proj(b2)(k), 2)).sum
      val q = d2p / d2o
      val bin = math.floor(q / 0.1).toInt
      val (c, s2) = hist.getOrElse(bin, (0L, 0.0))
      hist(bin) = (c + 1, s2 + q)
    }
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === 2016L)
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val (c, s2) = hist.getOrElse(bin, (0L, 0.0))
      assert(r.getAs[Long]("n_pairs") === c, s"count mismatch in bin $bin")
      assert(math.abs(r.getAs[Double]("mean_distortion") - s2 / c) < 1e-5)
    }
    assert(rows.length === hist.size)
  }

  test("q383 LPA trajectory equals a scalar synchronous propagation") {
    val rows = byName("q383_label_propagation")(spark, sf).collect()
      .sortBy(_.getAs[Int]("round"))
    assert(rows.length === 5)
    // independent edge build: co-purchase pairs with >= 2 shared orders
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = op.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val edges = pairCnt.filter(_._2 >= 2).keys.toArray
    val und = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(k => k -> k).toMap
    def stats(l: Map[Long, Long]): (Long, Long) = {
      val sizes = l.values.groupBy(identity).map(_._2.size)
      (l.values.toSet.size.toLong, sizes.max.toLong)
    }
    val expected = scala.collection.mutable.ArrayBuffer[(Long, Long)](stats(lbl))
    for (_ <- 1 to 4) {
      lbl = adj.map { case (node, nbrs) =>
        val counts = nbrs.map(lbl).groupBy(identity).map { case (k, v) => (k, v.size) }
        node -> counts.toSeq.sortBy { case (l2, c) => (-c, l2) }.head._1
      }
      expected += stats(lbl)
    }
    rows.zip(expected).foreach { case (r, (nl, tc)) =>
      assert(r.getAs[Long]("n_labels") === nl,
        s"n_labels mismatch at round ${r.getAs[Int]("round")}")
      assert(r.getAs[Long]("top_community") === tc,
        s"top_community mismatch at round ${r.getAs[Int]("round")}")
    }
  }
}
