package graft

import graft.operators.RetainOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** AMTL training smoke test (SURVEY.md §5.2.5) on the sf0.001 fixture:
  * loss decreases, B off-diagonals move from 0, B diagonal stays
  * exactly 0 (`model.py:91-92`).
  */
class TrainingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("training-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("B diagonal pinned to zero; off-diagonals learn; CE finite") {
    val (bMat, ces, _) = RetainOps.trainAmtl(spark, sf, iters = 15)
    for (i <- 0 until 3) assert(bMat(i)(i) == 0.0)
    assert(bMat.flatten.exists(v => math.abs(v) > 1e-6),
      "no off-diagonal B weight moved from its 0 init")
    assert(ces.forall(c => c > 0 && c.isFinite))
  }

  test("training reduces CE vs iteration-0 baseline") {
    val (_, ce15, _) = RetainOps.trainAmtl(spark, sf, iters = 15)
    val (_, ce1, _) = RetainOps.trainAmtl(spark, sf, iters = 1)
    assert(ce15.sum < ce1.sum,
      s"sum CE after 15 iters (${ce15.sum}) not below after 1 iter (${ce1.sum})")
  }

  test("full joint training reduces loss and moves shared weights") {
    import graft.functions.{Retain, RetainGrad}
    val (b12, p12, loss12, hist12) = RetainOps.trainFull(spark, sf, iters = 12)
    val (_, _, loss1, _) = RetainOps.trainFull(spark, sf, iters = 1)
    assert(loss12 < loss1, s"loss after 12 iters ($loss12) not below after 1 ($loss1)")
    assert(hist12.size == 12 && hist12.head._1 == 1 && hist12.last._1 == 12)
    val init = RetainGrad.pack(Retain.defaultWeights)
    val lstmDrift = (RetainGrad.OffACell until RetainGrad.OffWAlpha)
      .map(i => math.abs(p12(i) - init(i))).max
    assert(lstmDrift > 1e-6, "BPTT did not move any LSTM weight")
    for (i <- 0 until 3) assert(b12(i)(i) == 0.0)
  }

  test("scored output is deterministic across invocations") {
    val w = graft.functions.Retain.defaultWeights
    val a = RetainOps.scored(spark, sf, w).select("user_id", "p0", "p1", "p2")
      .collect().map(_.toString).sorted
    val b = RetainOps.scored(spark, sf, w).select("user_id", "p0", "p1", "p2")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("weights checkpoint round-trips bit-exactly and rejects truncation") {
    import graft.functions.{Retain, RetainCheckpoint, RetainGrad}
    val w = Retain.defaultWeights
    val dir = java.nio.file.Files.createTempDirectory("ckpt-spec").toString
    RetainCheckpoint.save(spark, w, s"$dir/w")
    val restored = RetainCheckpoint.load(spark, s"$dir/w")
    assert(RetainGrad.pack(restored).sameElements(RetainGrad.pack(w)),
      "restored flat vector differs from the saved one")
    // a truncated/partial checkpoint must fail loudly, not mis-restore
    spark.read.parquet(s"$dir/w").limit(10)
      .write.mode("overwrite").parquet(s"$dir/bad")
    intercept[IllegalArgumentException] {
      RetainCheckpoint.load(spark, s"$dir/bad")
    }
  }

  test("GRU checkpoint round-trips bit-exactly and guards against the LSTM layout") {
    import graft.functions.{Retain, RetainCheckpoint, RetainGrad}
    val w = Retain.defaultGruWeights
    val dir = java.nio.file.Files.createTempDirectory("ckpt-gru-spec").toString
    RetainCheckpoint.saveGru(spark, w, s"$dir/w")
    val restored = RetainCheckpoint.loadGru(spark, s"$dir/w")
    assert(RetainGrad.packGru(restored).sameElements(RetainGrad.packGru(w)),
      "restored GRU flat vector differs from the saved one")
    // scoring under the restored weights must be IDENTICAL (the q205
    // zero-divergence contract, GRU cell kind)
    val a = RetainOps.scored(spark, sf, w).select("user_id", "p0", "p1", "p2")
      .collect().map(_.toString).sorted
    val b = RetainOps.scored(spark, sf, restored).select("user_id", "p0", "p1", "p2")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "restored GRU weights score differently")
    // the two flat layouts have different sizes: loading a GRU file as
    // LSTM (or vice versa) must fail loudly
    intercept[IllegalArgumentException] {
      RetainCheckpoint.load(spark, s"$dir/w")
    }
    intercept[IllegalArgumentException] {
      RetainGrad.packGru(Retain.defaultWeights) // LSTM cells into packGru
    }
  }

  test("q254: bucketed AUC error obeys the same-bin-mass theorem; bins are margin-safe") {
    // the TRUE bound for a mid-rank binned AUC: cross-bin pairs rank
    // identically to the exact form, so |binned − exact| ≤ half the
    // same-bin (pos·neg) pair mass. (The naive 1/bins intuition is
    // FALSE on concentrated scores — task 0's 200-bucket error is
    // ~0.023 at sf0.01, a genuine fidelity statement about
    // tf.metrics.auc's default that SURVEY §7.4 documents.)
    val rows = SparkEntry.queries("q254_auc_bucketed")(spark, sf).collect()
    assert(rows.length == 3)
    val sc = RetainOps.scored(spark, sf, graft.functions.Retain.defaultWeights)
      .select("p0", "p1", "p2", "y0", "y1", "y2").collect()
    for (k <- 0 until 3) {
      val py = sc.map(r => (r.getDouble(k), r.getDouble(3 + k)))
      val bins = py.groupBy { case (p, _) => math.min((p * 200).toInt, 199) }
      val nPos = py.count(_._2 == 1.0).toDouble
      val nNeg = py.length - nPos
      val sameBinMass = bins.values.map { g =>
        val gp = g.count(_._2 == 1.0).toDouble; gp * (g.length - gp)
      }.sum / (nPos * nNeg)
      val err = rows(k).getAs[Double]("approx_err")
      assert(err <= 0.5 * sameBinMass + 1e-9,
        s"task $k: err $err exceeds same-bin-mass bound ${0.5 * sameBinMass}")
      // bin-boundary margin: no probability sits within 1e-7 of a
      // p·200 integer boundary, so the measured ≤1.8e-9 cross-engine
      // score deviation (RetainOracleSql) cannot flip a bin
      val margin = py.map { case (p, _) =>
        val f = p * 200; math.min(f - math.floor(f), math.ceil(f) - f)
      }.min
      assert(margin > 1e-7, s"task $k: bin-boundary margin $margin too tight")
    }
  }
}
