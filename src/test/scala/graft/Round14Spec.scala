package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the round-14 operators (q372–q377) beyond their oracle
  * hash checks: Kendall τ-b equals an independent brute-force count on
  * the collected grid; the 2SLS identity β_IV = reduced-form / first-
  * stage holds on the emitted columns; average precision equals a scalar
  * recomputation over the collected ranking; the isotonic fit is
  * monotone, mean-preserving, and equal to an independent PAV stack
  * implementation; the k-core peel reaches its fixpoint inside the
  * unrolled bound and every surviving node has in-core degree ≥ 3; and
  * the diversity readouts respect exp(H) ≤ l_distinct.
  */
class Round14Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"
  private val sfTiny = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("round14-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) = SparkEntry.queries(n)

  test("q372 tau-b matches a brute-force pair count on the collected grid") {
    val rows = byName("q372_kendall_tau")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("tau_b")
      assert(t >= -1.0 - 1e-9 && t <= 1.0 + 1e-9, s"tau_b out of range: $t")
    }
    // brute-force the first pair from the raw daily grid
    val g = operators.CausalOps.daily(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val first = rows.head
    val (sa, sb) = (first.getAs[String]("src"), first.getAs[String]("dst"))
    val ma = g.filter(_._1 == sa).map(t => t._2 -> t._3).toMap
    val mb = g.filter(_._1 == sb).map(t => t._2 -> t._3).toMap
    val days = ma.keySet.intersect(mb.keySet).toSeq.sorted
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L; var np = 0L
    for (i <- days.indices; j <- (i + 1) until days.length) {
      val (a1, b1) = (ma(days(i)), mb(days(i)))
      val (a2, b2) = (ma(days(j)), mb(days(j)))
      np += 1
      if ((a1 < a2 && b1 < b2) || (a1 > a2 && b1 > b2)) conc += 1
      else if ((a1 < a2 && b1 > b2) || (a1 > a2 && b1 < b2)) disc += 1
      if (a1 == a2) tx += 1
      if (b1 == b2) ty += 1
    }
    assert(first.getAs[Long]("concordant") === conc)
    assert(first.getAs[Long]("discordant") === disc)
    val tb = (conc - disc).toDouble / math.sqrt(((np - tx) * (np - ty)).toDouble)
    assert(math.abs(first.getAs[Double]("tau_b") - tb) < 1e-6,
      s"tau_b ${first.getAs[Double]("tau_b")} vs brute $tb")
  }

  test("q373 2SLS: beta_iv = reduced-form slope / first-stage slope") {
    val rows = byName("q373_iv_2sls")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[Double]("beta_iv").isNaN)
      assert(r.getAs[Double]("first_stage_f") >= 0.0)
      assert(r.getAs[Long]("n_rows") > 0)
    }
    // the Wald identity on an independently-computed moment set: β_IV =
    // (cov(z,y)/var z) / (cov(z,x)/var z) — recompute from raw rows
    val j = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("p_partkey") === col("l_partkey"))
      .select(col("l_returnflag").as("rf"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("y"),
        col("l_discount").as("x"), col("p_size").cast("double").as("z"))
      .where(col("rf") === "R").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val n = j.length.toDouble
    def m(f: ((Double, Double, Double)) => Double) = j.map(f).sum
    val covZY = n * m(t => t._3 * t._1) - m(_._3) * m(_._1)
    val covZX = n * m(t => t._3 * t._2) - m(_._3) * m(_._2)
    val betaR = rows.find(_.getAs[String]("rf") == "R").get.getAs[Double]("beta_iv")
    assert(math.abs(betaR - covZY / covZX) < 1e-4,
      s"beta_iv $betaR vs brute ${covZY / covZX}")
  }

  test("q374 average precision equals the scalar recomputation over the ranking") {
    val row = byName("q374_pr_auc")(spark, sfTiny).collect().head
    val scored = Tables.lineitem(spark, sfTiny)
      .select((col("l_quantity") / 10.0 - col("l_discount") * 20.0 +
        col("l_tax") * 5.0 - 1.5).as("z"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("y"),
        col("l_orderkey").as("k1"), col("l_linenumber").as("k2"))
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (-t._1, t._3, t._4.toLong))
    val nPos = scored.count(_._2 == 1)
    var cp = 0; var sum = 0.0
    scored.zipWithIndex.foreach { case ((_, y, _, _), i) =>
      if (y == 1) { cp += 1; sum += cp.toDouble / (i + 1) }
    }
    val ap = sum / nPos
    assert(row.getAs[Long]("n_pos") === nPos.toLong)
    assert(math.abs(row.getAs[Double]("avg_precision") - ap) < 1e-5,
      s"AP ${row.getAs[Double]("avg_precision")} vs brute $ap")
    assert(row.getAs[Double]("avg_precision") >= row.getAs[Double]("prevalence"),
      "this scorer ranks better than chance, so AP must exceed prevalence")
  }

  test("q375 isotonic fit is monotone, mean-preserving, and equals stack PAV") {
    val rows = byName("q375_isotonic_calibration")(spark, sf).collect()
      .sortBy(_.getAs[Int]("bin"))
    assert(rows.length > 5)
    val fit = rows.map(_.getAs[Double]("isotonic_rate"))
    fit.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-9, s"isotonic fit must be non-decreasing: $a > $b") }
    // mean preservation: Σ w·fitted = Σ w·raw = Σ y (PAV conserves mass)
    val w = rows.map(_.getAs[Long]("n").toDouble)
    val raw = rows.map(_.getAs[Double]("raw_rate"))
    val mFit = w.zip(fit).map { case (a, b) => a * b }.sum
    val mRaw = w.zip(raw).map { case (a, b) => a * b }.sum
    assert(math.abs(mFit - mRaw) / mRaw < 1e-4,
      s"PAV must conserve total mass: $mFit vs $mRaw")
    // independent stack-based PAV on the same (w, raw) bins
    case class Blk(var w: Double, var s: Double) { def mean = s / w }
    val stack = scala.collection.mutable.ArrayBuffer[Blk]()
    w.zip(raw).foreach { case (wi, ri) =>
      stack += Blk(wi, wi * ri)
      while (stack.length > 1 &&
        stack(stack.length - 2).mean >= stack.last.mean - 1e-12) {
        val top = stack.remove(stack.length - 1)
        stack.last.w += top.w; stack.last.s += top.s
      }
    }
    val pav = stack.flatMap(b => Seq.fill(math.round(b.w).toInt)(b.mean))
    // expand engine fit by weights and compare elementwise
    val eng = rows.flatMap(r =>
      Seq.fill(r.getAs[Long]("n").toInt)(r.getAs[Double]("isotonic_rate")))
    assert(eng.length === pav.length)
    eng.zip(pav).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-5, s"PAV mismatch: $a vs $b") }
  }

  test("q376 k-core peel reaches fixpoint by round 10 and the core has min degree 3") {
    val rows = byName("q376_kcore")(spark, sf).collect()
      .sortBy(_.getAs[Int]("round"))
    assert(rows.length === 13) // rounds 0..12 of the 12-round unroll
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    val edges = rows.map(_.getAs[Long]("n_edges"))
    nodes.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    edges.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    // measured sf0.01 trajectory: fixpoint at round 10 (935 nodes /
    // 1970 edges), rounds 10-12 identical — the 12-round unroll is a
    // proven bound with two rounds of slack
    assert(nodes(10) === nodes(11) && edges(10) === edges(11) &&
      nodes(11) === nodes(12) && edges(11) === edges(12),
      "the unrolled peel must reach its fixpoint by round 10")
    assert(edges(12) > 0, "the sf0.01 co-purchase graph must retain a 3-core")
    // every node of the final core has degree >= 3 within the core
    val e12 = PlanCache.cached(spark, s"q376_e12|$sf")(
      sys.error("must already be cached by the query run"))
    val minDeg = e12.select(col("u").as("w")).unionAll(e12.select(col("v").as("w")))
      .groupBy("w").agg(count(lit(1)).as("dg"))
      .agg(min(col("dg"))).head.getLong(0)
    assert(minDeg >= 3L, s"3-core property violated: min in-core degree $minDeg")
  }

  test("q377 diversity: entropy bound and recursive flag are consistent") {
    val rows = byName("q377_l_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val el = r.getAs[Double]("entropy_l")
      val ld = r.getAs[Long]("l_distinct")
      assert(el <= ld + 1e-6, s"exp(H)=$el must be <= distinct classes $ld")
      assert(el >= 1.0 - 1e-9, s"exp(H)=$el must be >= 1")
      assert(r.getAs[Long]("k") >= ld)
    }
    assert(rows.exists(_.getAs[Int]("rcl2_ok") == 1),
      "some group should pass recursive (2,2)-diversity")
  }
}
