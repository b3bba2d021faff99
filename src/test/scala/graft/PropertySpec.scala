package graft

import graft.functions.AucHistogram
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2.3) for the driver-side
  * numeric kernels — these exercise the exact arithmetic the
  * distributed operators run per row / per buffer, via raw ScalaCheck
  * (the scalatest bridge artifact isn't in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  /** Exact mid-rank AUC by O(n²) pair counting — the specification the
    * histogram aggregate approximates.
    */
  private def exactAuc(rows: Seq[(Double, Double)]): Double = {
    val pos = rows.filter(_._2 == 1.0).map(_._1)
    val neg = rows.filter(_._2 == 0.0).map(_._1)
    if (pos.isEmpty || neg.isEmpty) Double.NaN
    else {
      var num = 0.0
      for (p <- pos; n <- neg)
        num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      num / (pos.size.toDouble * neg.size.toDouble)
    }
  }

  private val rowsGen: Gen[List[(Double, Double)]] =
    Gen.nonEmptyListOf(for {
      p <- Gen.choose(0.0, 1.0)
      y <- Gen.oneOf(0.0, 1.0)
    } yield (p, y))

  test("histogram AUC == exact mid-rank AUC of the binned scores") {
    check(Prop.forAll(rowsGen) { rows =>
      val hasBoth = rows.exists(_._2 == 1.0) && rows.exists(_._2 == 0.0)
      !hasBoth || {
        val buf = rows.foldLeft(AucHistogram.agg.zero)(AucHistogram.agg.reduce)
        val (hist, np, nn) = AucHistogram.agg.finish(buf)
        // precise contract: the trapezoid over bins IS the tie-aware
        // pair-count AUC after quantizing scores to their bin index
        val binned = rows.map { case (p, y) =>
          (math.min((p * AucHistogram.Bins).toInt, AucHistogram.Bins - 1).toDouble, y)
        }
        np == rows.count(_._2 == 1.0) && nn == rows.count(_._2 == 0.0) &&
          math.abs(hist - exactAuc(binned)) < 1e-12
      }
    })
  }

  test("histogram AUC buffer merge == single-pass reduce (mergeability)") {
    check(Prop.forAll(rowsGen, rowsGen) { (a, b) =>
      val merged = AucHistogram.agg.merge(
        a.foldLeft(AucHistogram.agg.zero)(AucHistogram.agg.reduce),
        b.foldLeft(AucHistogram.agg.zero)(AucHistogram.agg.reduce))
      val single = (a ++ b).foldLeft(AucHistogram.agg.zero)(AucHistogram.agg.reduce)
      merged.sameElements(single)
    })
  }

  test("AUC invariant under strictly monotone transform of scores") {
    check(Prop.forAll(rowsGen) { rows =>
      val hasBoth = rows.exists(_._2 == 1.0) && rows.exists(_._2 == 0.0)
      !hasBoth || {
        val t = exactAuc(rows.map { case (p, y) => (p / 2.0, y) }) // monotone
        math.abs(t - exactAuc(rows)) < 1e-12
      }
    })
  }

  test("RETAIN softmax: shift-invariance and normalization") {
    check(Prop.forAll(Gen.listOfN(11, Gen.choose(-5.0, 5.0)),
      Gen.choose(-100.0, 100.0)) { (scores, shift) =>
      def softmax(xs: Seq[Double]): Seq[Double] = {
        val m = xs.max
        val e = xs.map(x => math.exp(x - m))
        val s = e.sum
        e.map(_ / s)
      }
      val a = softmax(scores)
      val b = softmax(scores.map(_ + shift))
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-12 } &&
        math.abs(a.sum - 1.0) < 1e-12
    })
  }

  test("sigmoid CE closed form is non-negative") {
    check(Prop.forAll(Gen.choose(-50.0, 50.0), Gen.oneOf(0.0, 1.0)) { (z, y) =>
      math.max(z, 0) - z * y + math.log1p(math.exp(-math.abs(z))) >= 0.0
    })
  }

  test("Misra-Gries partition candidates are a superset of global heavy hitters") {
    // the property q196's two-phase exactness rests on: for ANY data and
    // ANY partition split, every item with global count > n/k survives
    // in at least one partition's k-counter summary
    val itemsGen = Gen.nonEmptyListOf(Gen.oneOf((1 to 12).map(i => s"w$i")))
    val kGen = Gen.choose(2, 8)
    val partsGen = Gen.choose(1, 6)
    check(Prop.forAll(itemsGen, kGen, partsGen, Gen.choose(0L, Long.MaxValue)) {
      (items, k, parts, seed) =>
        val rnd = new scala.util.Random(seed)
        val shuffled = rnd.shuffle(items)
        val partitions = Array.fill(parts)(
          scala.collection.mutable.ArrayBuffer.empty[String])
        shuffled.foreach(w => partitions(rnd.nextInt(parts)) += w)
        val cands = partitions.toSeq
          .flatMap(p => graft.functions.MisraGries.candidates(p.iterator, k))
          .toSet
        val n = items.size.toDouble
        val heavy = items.groupBy(identity).collect {
          case (w, occ) if occ.size > n / k => w
        }.toSet
        heavy.subsetOf(cands)
    })
  }

  test("WITH-TIES top-k retention is a semigroup (partial∘final == global)") {
    // the algebra TopKPerGroupExec's withTies two-phase plan rests on:
    // keep row r iff fewer than k rows sort strictly before it; for ANY
    // partition split, re-retaining the union of per-partition
    // retentions equals retaining globally (multiset equality, so
    // boundary ties are neither lost nor duplicated)
    def retainTies(rows: Seq[Int], k: Int): Seq[Int] =
      rows.filter(r => rows.count(_ < r) < k)
    val rowsGen = Gen.nonEmptyListOf(Gen.choose(0, 9)) // tie-heavy domain
    val kGen = Gen.choose(1, 5)
    val partsGen = Gen.choose(1, 6)
    check(Prop.forAll(rowsGen, kGen, partsGen, Gen.choose(0L, Long.MaxValue)) {
      (rows, k, parts, seed) =>
        val rnd = new scala.util.Random(seed)
        val partitions = Array.fill(parts)(
          scala.collection.mutable.ArrayBuffer.empty[Int])
        rows.foreach(r => partitions(rnd.nextInt(parts)) += r)
        val twoPhase = retainTies(
          partitions.toSeq.flatMap(p => retainTies(p.toSeq, k)), k)
        twoPhase.sorted == retainTies(rows, k).sorted
    })
  }
}
