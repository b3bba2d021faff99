package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level timing probe for the P=2000 causal fixture
  * (round 9) — `sbt "Test/runMain graft.operators.CausalScaleProbe"`.
  * Not a test; exists so the expensive stages can be timed in isolation
  * without re-running the whole CausalScaleSpec.
  */
object CausalScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.prepare(
      org.apache.spark.sql.SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("causal-scale-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val P = 2000; val Clusters = 50
    def factor(c: Int, ti: Int): Double = {
      val k = c / 2 + 1
      val ang = 2.0 * math.Pi * k * ti / 64.0
      if (c % 2 == 0) math.cos(ang) else math.sin(ang)
    }
    def noise(i: Int, ti: Int): Double = {
      val h = (i * 1315423911L + ti * 2654435761L) & 0x7fffffffL
      ((h % 10007) / 10007.0 - 0.5) * 0.02
    }
    val g = (0 until P).flatMap(i => (0 until 64).map(ti =>
      (f"e$i%04d", ti, factor(i % Clusters, ti) + noise(i, ti))))
      .toDF("el", "di", "v").cache()
    g.count()

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s (rows=$n)")
    }

    t("seriesMaps")(CausalOps.seriesMaps(g).count())
    val pc = CausalOps.pairCorrOf(g)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // count() alone would let column pruning drop the r0 folds — force
    // them with an aggregate over r0
    t("pairCorr 2M pairs (r0 forced)") {
      pc.agg(count(col("r0"))).head.getLong(0)
    }
    val surv = CausalOps.screenFromPairs(spark, pc).cache()
    t("screen decision layer over cached pc")(surv.count())
    t("lsh shipped")(CausalOps.lshCandidates(g, Lsh.hyperplanes(8, 64), 4, 2).count())
    t("lsh planner")(CausalOps.lshCandidates(g, Lsh.hyperplanes(36, 64), 4, 9).count())
    spark.stop()
  }
}
