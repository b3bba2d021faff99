package graft.operators

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Large-P causal-screen evidence (round 9, VERDICT r8 #2): the screens
  * and guards exist and fire in CausalSpec, but the survey fixture has
  * ~5 elements — nowhere near the regime they were built for. This spec
  * EXERCISES them on a synthetic P=2000-element grid (the reference's
  * `model.py:86-101` enumerates all pairs only because num_tasks=3; this
  * engine claims 10⁴):
  *
  *  - the q251 compact-map screen runs at P=2000 (2.0M unordered pairs)
  *    and its survivor set is exactly the planted structure — candidate
  *    workload ~2% of P²/2;
  *  - the q252 MI joint-histogram stage over those survivors is
  *    survivor-grain (≤ 16·|surv| cells), i.e. downstream cost scales
  *    with SURVIVORS, not P²;
  *  - `guardFullEnum` actually trips at P > MaxFullEnumElements (2048);
  *  - the q260 banded sign-LSH candidate stage at P=2000: the shipped
  *    (4 bands × 2 rows) geometry keeps recall ~1 but admits most
  *    random pairs (measured here — exactly why q353's planner exists),
  *    while a planner-chosen (4 × 9) geometry keeps recall ≳0.98 and
  *    cuts the random-pair candidate fraction by orders of magnitude
  *    (b·2^-r: 4/512 ≈ 0.8%).
  *
  * Fixture: 50 EXACTLY-orthogonal latent factors (cos/sin at integer
  * frequencies k=1..25 over the 64-day window — discrete Fourier
  * orthogonality makes cross-cluster sample correlation ~0 by
  * construction, not by luck) + deterministic hash noise at amplitude
  * 0.01, 40 elements per cluster. So ground truth is sharp: the 39,000
  * within-cluster pairs have |r0| ≈ 1, every cross pair |r0| ≲ 0.005 —
  * well clear of ScreenTau=0.05 on both sides.
  *
  * Wall-clock at P=2000 on local[8] is printed per stage and recorded
  * in BENCH_NOTES (round 9).
  */
class CausalScaleSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("causal-scale-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val P = 2000
  private val Clusters = 50
  private val PerCluster = P / Clusters
  private val TruePairs = Clusters * (PerCluster * (PerCluster - 1) / 2) // 39,000

  /** (el, di, v) grid: cluster factor + tiny deterministic noise. */
  private def fixtureGrid(p: Int, t: Int): DataFrame = {
    val ss = spark
    import ss.implicits._
    def factor(c: Int, ti: Int): Double = {
      val k = c / 2 + 1 // 1..25 — all nonconstant, all orthogonal at T=64
      val ang = 2.0 * math.Pi * k * ti / 64.0
      if (c % 2 == 0) math.cos(ang) else math.sin(ang)
    }
    def noise(i: Int, ti: Int): Double = {
      val h = (i * 1315423911L + ti * 2654435761L) & 0x7fffffffL
      ((h % 10007) / 10007.0 - 0.5) * 0.02
    }
    (0 until p).flatMap(i => (0 until t).map(ti =>
      (f"e$i%04d", ti, factor(i % Clusters, ti) + noise(i, ti))))
      .toDF("el", "di", "v")
  }

  private def clusterOf(c: org.apache.spark.sql.Column) =
    substring(c, 2, 4).cast("int") % Clusters

  private def timed[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  test("q251 screen at P=2000: survivors are exactly the planted structure, ~2% of P^2/2") {
    val g = fixtureGrid(P, 64).cache()
    g.count()
    // the batch-query shape (screen(s, d)): pair-corr stats materialized
    // once, the decision layer's three references hit the cache
    val pc = CausalOps.pairCorrOf(g)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val surv = CausalOps.screenFromPairs(spark, pc).cache()
    val n = timed(s"screen P=$P (${P.toLong * (P - 1) / 2} pairs, pc materialize + decision layer)") {
      pc.count()
      surv.count()
    }
    assert(n === TruePairs.toLong,
      s"expected exactly the $TruePairs within-cluster pairs, got $n")
    val crossSurvivors =
      surv.where(clusterOf(col("src")) =!= clusterOf(col("dst"))).count()
    assert(crossSurvivors === 0L, "no cross-cluster pair may survive the tau cut")
    assert(surv.where(col("by_tau") === 0).count() === 0L,
      "every planted pair must clear tau on its own, not just top-m")
    info(f"candidate fraction: ${n.toDouble / (P.toLong * (P - 1) / 2)}%.4f of all pairs")

    // downstream MI workload is survivor-grain: <= 16 cells per survivor
    val cells = CausalOps.miCellsOf(
      surv.select(col("src").as("csrc"), col("dst").as("cdst")),
      CausalOps.quartileBins(g)).cache()
    val cellRows = timed("q252 MI joint-histogram stage over survivors") {
      cells.count()
    }
    assert(cellRows <= n * 16, "joint histogram must stay at <=16 cells per survivor")
    assert(cells.select("src", "dst").distinct().count() === n,
      "every survivor (and only survivors) reaches the MI stage")
    val mi = CausalOps.miReadout(cells)
    assert(mi.count() === n)
    // planted pairs carry near-maximal dependence: every MI is positive
    assert(mi.where(col("mi") <= 0).count() === 0L)
    cells.unpersist(); surv.unpersist(); pc.unpersist(); g.unpersist()
  }

  test("guardFullEnum trips past MaxFullEnumElements and passes below it") {
    val small = fixtureGrid(2000, 2)
    CausalOps.guardFullEnum(small, "qtest") // must not throw at P=2000
    val big = fixtureGrid(2100, 2)
    val e = intercept[IllegalStateException] {
      CausalOps.guardFullEnum(big, "qtest")
    }
    assert(e.getMessage.contains("q251_causal_screen"),
      "guard must point at the pruned variants")
  }

  test("q260 banded LSH at P=2000: shipped geometry recalls everything but barely prunes; planner geometry prunes 50x harder at >=0.98 recall") {
    val g = fixtureGrid(P, 64).cache()
    g.count()
    val crossPairs = P.toLong * (P - 1) / 2 - TruePairs

    def measure(name: String, planes: Int, bands: Int, r: Int): (Double, Double) = {
      val cand =
        CausalOps.lshCandidates(g, Lsh.hyperplanes(planes, 64), bands, r).cache()
      timed(s"lshCandidates $name ($planes planes = $bands x $r)")(cand.count())
      val within = cand.where(clusterOf(col("src")) === clusterOf(col("dst"))).count()
      val cross = cand.count() - within
      cand.unpersist()
      val recall = within.toDouble / TruePairs
      val crossFrac = cross.toDouble / crossPairs
      info(f"$name: recall=$recall%.4f crossFrac=$crossFrac%.4f")
      (recall, crossFrac)
    }

    val (recallShip, crossShip) = measure("shipped", 8, 4, 2)
    val (recallPlan, crossPlan) = measure("planner", 36, 4, 9)

    assert(recallShip >= 0.98, "near-identical series must collide in the wide bands")
    assert(recallPlan >= 0.98, "sharper bands may not lose the planted structure")
    // the shipped 2-bit bands admit ~1-(1-2^-2)^4 = 68% of random pairs;
    // 9-bit bands admit ~4*2^-9 = 0.8% — pin the ordering with margin
    assert(crossPlan <= 0.05, f"planner geometry must prune random pairs, got $crossPlan%.4f")
    assert(crossPlan * 5 < crossShip,
      "sharper bands must beat the shipped geometry by a wide margin")
    g.unpersist()
  }
}
