package graft

import graft.functions.Retain
import graft.functions.Retain._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level numerics for the RETAIN forward pass (SURVEY.md §5.2.2):
  * hand-computed LSTM steps, softmax invariants, determinism, and
  * degenerate-input behavior — the correctness evidence for the
  * queries the DuckDB oracle cannot express (q76-q79).
  */
class RetainSpec extends AnyFunSuite {

  test("sigmoid matches closed form") {
    assert(math.abs(Retain.sigmoid(0.0) - 0.5) < 1e-15)
    assert(math.abs(Retain.sigmoid(2.0) - 1.0 / (1.0 + math.exp(-2.0))) < 1e-15)
  }

  test("LSTM step: zero weights give tanh(0)*sigmoid(0) dynamics") {
    // all-zero weights/bias: i=o=0.5, j=tanh(0)=0, f=sigmoid(1)≈0.731
    val zc = LstmCell(Array.fill(H, 4 * H)(0.0), Array.fill(H, 4 * H)(0.0),
      Array.fill(4 * H)(0.0))
    val c0 = Array.fill(H)(1.0)
    val (c1, h1) = zc.step(Array.fill(H)(0.0), c0, Array.fill(H)(0.0))
    val fExp = 1.0 / (1.0 + math.exp(-1.0)) // forget bias 1.0
    assert(c1.forall(x => math.abs(x - fExp) < 1e-12))
    assert(h1.forall(x => math.abs(x - 0.5 * math.tanh(fExp)) < 1e-12))
  }

  test("LSTM step: hand-computed 1-unit-style case via crafted weights") {
    // craft wx so only gate k=0 sees input x(0): i-gate of unit 0
    val wx = Array.fill(H, 4 * H)(0.0)
    wx(0)(0) = 3.0 // x(0) → i-gate of unit 0
    val cell = LstmCell(wx, Array.fill(H, 4 * H)(0.0), Array.fill(4 * H)(0.0))
    val x = Array.fill(H)(0.0); x(0) = 1.0
    val (c1, _) = cell.step(x, Array.fill(H)(0.0), Array.fill(H)(0.0))
    // unit0: i=σ(3), j=tanh(0)=0 → c=f*0+i*0=0 (candidate is 0)
    assert(math.abs(c1(0)) < 1e-15)
    // now also push the candidate gate: x(0) → j-gate of unit 0 is col H
    wx(0)(H) = 2.0
    val (c2, _) = cell.step(x, Array.fill(H)(0.0), Array.fill(H)(0.0))
    val expect = Retain.sigmoid(3.0) * math.tanh(2.0)
    assert(math.abs(c2(0) - expect) < 1e-12)
  }

  test("forward: alpha is a distribution over the 11 steps") {
    val w = Retain.defaultWeights
    val x = Array.tabulate(T, F)((t, i) => math.sin(t + i) / 2.0)
    val (p, alpha, _) = Retain.forward(w, x)
    assert(alpha.length == T)
    assert(math.abs(alpha.sum - 1.0) < 1e-12)
    assert(alpha.forall(a => a > 0 && a < 1))
    assert(p.forall(x => x > 0 && x < 1))
  }

  test("forward is deterministic across calls and weight rebuilds") {
    val x = Array.tabulate(T, F)((t, i) => (t * F + i) / 55.0)
    val (p1, a1, c1) = Retain.forward(Retain.defaultWeights, x)
    val (p2, a2, c2) = Retain.forward(Retain.defaultWeights, x)
    assert(p1.sameElements(p2) && a1.sameElements(a2) && c1.sameElements(c2))
  }

  test("forward: zero input gives uniform-ish attention and head-bias scores") {
    val w = Retain.defaultWeights
    val (p, alpha, ctx) = Retain.forward(w, Array.fill(T, F)(0.0))
    // embeddings are all zero → context must be exactly zero
    assert(ctx.forall(_ == 0.0))
    // probs collapse to sigmoid of the head biases
    for (k <- 0 until numTasks)
      assert(math.abs(p(k) - Retain.sigmoid(w.headB(k))) < 1e-15)
    assert(math.abs(alpha.sum - 1.0) < 1e-12)
  }

  test("time reversal matters: permuting steps changes attention") {
    val w = Retain.defaultWeights
    val x = Array.tabulate(T, F)((t, i) => if (t == 2) 1.0 else 0.0)
    val y = Array.tabulate(T, F)((t, i) => if (t == 8) 1.0 else 0.0)
    val (_, ax, _) = Retain.forward(w, x)
    val (_, ay, _) = Retain.forward(w, y)
    assert(!ax.sameElements(ay))
  }

  test("PRNG is stable across instantiations (golden value)") {
    val p1 = new Retain.Prng(42L).next()
    val p2 = new Retain.Prng(42L).next()
    assert(p1 == p2)
    assert(p1 > -0.5 && p1 < 0.5)
  }

  test("GRU step: zero weights leave the hidden state unchanged at u=0.5") {
    // all-zero weights: r=u=σ(0)=0.5, candidate=tanh(0)=0 → h' = 0.5·h
    val zc = GruCell(Array.fill(H, 2 * H)(0.0), Array.fill(H, 2 * H)(0.0),
      Array.fill(2 * H)(0.0), Array.fill(H, H)(0.0), Array.fill(H, H)(0.0),
      Array.fill(H)(0.0))
    val h0 = Array.fill(H)(1.0)
    val h1 = zc.step(Array.fill(H)(0.0), h0)
    assert(h1.forall(x => math.abs(x - 0.5) < 1e-15))
  }

  test("GRU runSeq matches a hand-rolled 3-step recurrence") {
    // independent formula implementation (tf.contrib.rnn.GRUCell):
    //   r,u = σ(x·WxG + h·WhG + bG); c = tanh(x·WxC + (r⊙h)·WhC + bC)
    //   h'  = u⊙h + (1−u)⊙c
    val p = new Retain.Prng(7L)
    val cell = GruCell(p.mat(H, 2 * H), p.mat(H, 2 * H), p.vec(2 * H),
      p.mat(H, H), p.mat(H, H), p.vec(H))
    val xs = Array.tabulate(3, H)((t, i) => math.cos(t * H + i) / 3.0)
    var h = Array.fill(H)(0.0)
    val expected = xs.map { x =>
      val g = Array.tabulate(2 * H) { j =>
        var z = cell.bG(j)
        for (i <- 0 until H) z += x(i) * cell.wxG(i)(j) + h(i) * cell.whG(i)(j)
        z
      }
      val rh = Array.tabulate(H)(i => Retain.sigmoid(g(i)) * h(i))
      val c = Array.tabulate(H) { j =>
        var z = cell.bC(j)
        for (i <- 0 until H) z += x(i) * cell.wxC(i)(j) + rh(i) * cell.whC(i)(j)
        math.tanh(z)
      }
      h = Array.tabulate(H) { k =>
        val u = Retain.sigmoid(g(H + k))
        u * h(k) + (1.0 - u) * c(k)
      }
      h
    }
    val got = cell.runSeq(xs)
    for (t <- 0 until 3; k <- 0 until H)
      assert(math.abs(got(t)(k) - expected(t)(k)) < 1e-12,
        s"step $t unit $k: ${got(t)(k)} vs ${expected(t)(k)}")
  }

  test("GRU forward: alpha is a distribution; probs in (0,1); deterministic") {
    val w = Retain.defaultGruWeights
    val x = Array.tabulate(T, F)((t, i) => math.sin(t + i) / 2.0)
    val (p1, a1, _) = Retain.forward(w, x)
    assert(math.abs(a1.sum - 1.0) < 1e-12)
    assert(p1.forall(v => v > 0 && v < 1))
    val (p2, a2, _) = Retain.forward(Retain.defaultGruWeights, x)
    assert(p1.sameElements(p2) && a1.sameElements(a2))
    // and the GRU lineage genuinely differs from the LSTM default
    val (pL, _, _) = Retain.forward(Retain.defaultWeights, x)
    assert(!p1.sameElements(pL))
  }

  test("RetainGrad refuses GRU cells (training is LSTM-only)") {
    intercept[IllegalArgumentException] {
      graft.functions.RetainGrad.pack(Retain.defaultGruWeights)
    }
  }

  test("float32 scoring agrees with f64 to f32 precision and genuinely rounds") {
    val w = Retain.defaultWeights
    val x = Array.tabulate(T, F)((t, i) => math.sin(t * F + i) / 2.0)
    val (p64, _, _) = Retain.forward(w, x)
    val p32 = Retain.F32.forward(w, x)
    // agreement: an 11-step recurrence at H=8 loses a few f32 digits,
    // but probabilities must match well inside 1e-3
    for (k <- 0 until numTasks)
      assert(math.abs(p32(k) - p64(k)) < 1e-3, s"task $k: ${p32(k)} vs ${p64(k)}")
    // genuine float32: every prob is exactly representable as a Float
    // and at least one differs from the f64 path in the low-order bits
    assert(p32.forall(p => p == p.toFloat.toDouble))
    assert(p32.zip(p64).exists { case (a, b) => a != b },
      "f32 path produced bit-identical f64 results — not a float32 mode")
    // deterministic
    assert(Retain.F32.forward(w, x).sameElements(p32))
    // and it supports the GRU cell too
    val g32 = Retain.F32.forward(Retain.defaultGruWeights, x)
    val (g64, _, _) = Retain.forward(Retain.defaultGruWeights, x)
    for (k <- 0 until numTasks)
      assert(math.abs(g32(k) - g64(k)) < 1e-3)
  }
}
