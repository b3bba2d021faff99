package graft

import java.nio.file.{Files, Path}

import graft.operators.RetainOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Format-parity pin for the reference's one persistent artifact,
  * `B_matrix_loss_sqrtn.txt` (`model.py:296-310`), as emitted by
  * [[RetainOps.referenceRegime]] / q224: block structure, trailing
  * commas, the literal `Eval Loss <loss>= <sum>` quirk, append mode,
  * and the 500-vs-200 cadence rule (artifact uses the LATEST eval).
  */
class RetainArtifactSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("retain-artifact-spec").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshPath(): Path = {
    val dir = Files.createTempDirectory("graft_artifact_spec")
    dir.resolve("B_matrix_loss_sqrtn.txt")
  }

  private val K = graft.functions.Retain.numTasks

  /** A float literal as Python's str() / Scala's toString both emit. */
  private val Num = """-?\d+(?:\.\d+)?(?:[eE]-?\d+)?"""

  test("artifact reproduces the reference block shape line-for-line") {
    val p = freshPath()
    // 20 iters, eval every 4, artifact every 10 → evals at 4..20,
    // artifacts at 10 and 20 (10 is NOT a multiple of 4 — the
    // reference's 500-vs-200 shape)
    val lines = RetainOps.referenceRegime(spark, sf, totalIter = 20,
      checkIter = 4, artifactEvery = 10, minibatch = 64, lr = 0.05,
      artifactPath = p)
    val onDisk = Files.readAllLines(p)
    assert(onDisk.size == lines.size, "returned lines != file content")
    assert(lines == onDisk.toArray.toSeq, "returned lines differ from file")

    val blockLen = 1 + K + 1 + K + 1 // Step + B rows + Main + per-task + blank
    assert(lines.size == 2 * blockLen, s"expected 2 blocks, got ${lines.size} lines")
    for ((stepAt, blockIx) <- Seq(10 -> 0, 20 -> 1)) {
      val b = lines.slice(blockIx * blockLen, (blockIx + 1) * blockLen)
      assert(b(0) == s"Step $stepAt", s"header was '${b(0)}'")
      for (t <- 1 to K) {
        // model.py:303-305: every value followed by ',' — INCLUDING the last
        assert(b(t).matches(s"(?:$Num,){$K}"), s"B row '${b(t)}' not $K trailing-comma values")
      }
      assert(b(K + 1).matches(s"Eval Main Loss = $Num"), s"'${b(K + 1)}'")
      val sumStr = b(K + 1).stripPrefix("Eval Main Loss = ")
      for (t <- K + 2 until 2 * K + 2) {
        // model.py:308-309 quirk: the per-task LOSS value sits before '='
        // and the SUM repeats after it
        assert(b(t).matches(s"Eval Loss $Num= ${java.util.regex.Pattern.quote(sumStr)}"),
          s"'${b(t)}' does not match the reference's Eval Loss line")
      }
      assert(b(2 * K + 2) == "", "block must end with a blank line")
    }
    // Main loss is the sum of the per-task losses it was printed with
    val sum = lines(K + 1).stripPrefix("Eval Main Loss = ").toDouble
    val parts = (K + 2 until 2 * K + 2)
      .map(i => lines(i).stripPrefix("Eval Loss ").takeWhile(_ != '=').toDouble)
    assert(math.abs(parts.sum - sum) < 1e-9, s"per-task losses ${parts} don't sum to $sum")
  }

  test("file lifecycle matches the reference: truncate at run start, append per dump") {
    // model.py:229 opens 'w' once at training start, model.py:297
    // appends per 500-iter dump — so a SECOND run replaces the file
    // (it does not grow), while blocks within one run accumulate.
    val p = freshPath()
    val first = RetainOps.referenceRegime(spark, sf, totalIter = 10,
      checkIter = 5, artifactEvery = 10, minibatch = 64, lr = 0.05, artifactPath = p)
    val second = RetainOps.referenceRegime(spark, sf, totalIter = 10,
      checkIter = 5, artifactEvery = 10, minibatch = 64, lr = 0.05, artifactPath = p)
    val onDisk = Files.readAllLines(p).toArray.toSeq
    assert(onDisk == second, "second run must TRUNCATE then append (model.py:229 open 'w')")
    assert(first == second, "seeded regime must be deterministic run-over-run")
  }

  test("B diagonal stays exactly 0 in the artifact text") {
    val p = freshPath()
    val lines = RetainOps.referenceRegime(spark, sf, totalIter = 10,
      checkIter = 5, artifactEvery = 10, minibatch = 64, lr = 0.05, artifactPath = p)
    for (t <- 0 until K) {
      val vals = lines(1 + t).split(",", -1).init // trailing comma → drop last empty
      assert(vals.length == K)
      assert(vals(t).toDouble == 0.0, s"B[$t][$t] = ${vals(t)} in artifact, must be 0")
    }
  }

  test("q224 query returns the artifact lines with stable numbering") {
    val df = SparkEntry.queries("q224_reference_regime")(spark, sf)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.head.getLong(0) == 1L)
    assert(rows.head.getString(1) == "Step 50", s"first line was '${rows.head.getString(1)}'")
    val blockLen = 1 + K + 1 + K + 1
    assert(rows.length == 2 * blockLen, "1/10-scaled regime must emit exactly 2 blocks")
  }
}
