package graft.operators

import graft.functions.Retain.{F, H, T, numTasks}

/** DuckDB oracle for q204 — the RETAIN forward pass in the reference's
  * OWN precision (`model.py:45`: the TF graph is float32 end-to-end) —
  * closing the last rows-only query with an ANSI-SQL form (round 9,
  * VERDICT r8 #4).
  *
  * Technique: the f64 unrolled-recurrence oracle ([[RetainOracleSql]])
  * works because both engines run IEEE doubles in the same association
  * order; here BOTH engines must run IEEE *float32* per-op rounding in
  * the same order. DuckDB has no f32 fold primitive, so every
  * accumulation is a `list_reduce` left fold whose lambda rounds each
  * partial sum to REAL — `list_prepend(seed, terms)` seeds the fold
  * with the same value the JVM accumulator starts from (the bias, or
  * 0.0f) and the terms appear in the JVM's loop order. Every product
  * is `CAST(a*b AS REAL)`.
  *
  * Why CAST-to-REAL is EXACTLY the JVM's f32 op, not an approximation:
  * DuckDB may evaluate `a*b`/`a+b` on REAL inputs either natively in
  * float (one rounding, identical to the JVM) or promoted to double;
  * in the promoted case the double result of a single +,−,× on two
  * floats is EXACT (f32 values are 24-bit, f64 carries 53), so the
  * final CAST performs the one float rounding — same bits. Division is
  * also safe via the 2p+2 theorem (53 ≥ 2·24+2: a correctly-rounded
  * double quotient of two floats re-rounds to the correctly-rounded
  * float quotient). Transcendentals (exp, the inlined tanh) are
  * evaluated in double and then rounded to REAL, exactly like
  * [[graft.functions.Retain.F32]] — which since round 10 inlines the
  * SAME 1−2/(e^{2z}+1) tanh form (round-9 ADVICE), so the only
  * cross-engine channel left anywhere in the pipeline is libm exp's
  * ≤1-ulp double difference; that is annihilated by
  * the 29-bit drop to f32 UNLESS the double lands within ~2^-29
  * f32-ulps of a rounding midpoint (~1.9e-9 per evaluation). That is
  * the real protection: Round12Spec MEASURED the corpus digit margins
  * and the worst score sits only 0.018 f32-ulps from its round-6
  * boundary (9.8% of scores within 1 ulp — near the pure-geometry floor,
  * since one f32 ulp at p≈0.5 spans ~6% of a digit cell), so safety rests on
  * bit-exact f32 op parity, not on digit margins — net expected hash
  * risk ≈ 1e-5 per corpus run, and the spec pins the exposure so a
  * regime change gets flagged.
  */
object RetainOracleSqlF32 {
  private val K = numTasks

  private def r(e: String) = s"CAST(($e) AS REAL)"
  /** f32 σ: double exp, one rounding to REAL — `F32.sig`. */
  private def sigF(z: String) = r(s"1.0/(1.0 + exp(-CAST(($z) AS DOUBLE)))")
  /** f32 tanh via 1 − 2/(e^{2z}+1) in double, one rounding — `F32.tanhF`. */
  private def thF(z: String) = r(s"1.0 - 2.0/(exp(2.0*CAST(($z) AS DOUBLE))+1.0)")
  /** Left fold with f32 rounding at every partial sum, seeded with the
    * JVM accumulator's start value. */
  private def fold(seed: String, terms: String) =
    s"list_reduce(list_prepend($seed, $terms), (a, b) -> CAST(a + b AS REAL))"
  private val zeroF = "CAST(0.0 AS REAL)"

  private val lay = RetainOracleSql.lstmLay

  /** g[j] = fold from bias over [x_i·wx_ij, h_i·wh_ij] pairs in
    * ascending i — `Lstm32.runSeq`'s
    * `g(j) = g(j) + xi*wxr(j) + hi*whr(j)`: TWO rounded adds per i, so
    * the term list keeps the products separate rather than pre-summing
    * the pair (which would be the f64 oracle's association, one add
    * per i — different f32 bits).
    */
  private def gatesF(base: Int, x: String, h: String): String = {
    val gH = 4 * H
    s"""list_transform(range($gH), j -> ${fold(
      s"wf[$base + ${2 * H} * $gH + j + 1]",
      s"""flatten(list_transform(range($H), i ->
         |        [CAST($x[i+1]*wf[$base + i*$gH + j + 1] AS REAL),
         |         CAST($h[i+1]*wf[$base + $H*$gH + i*$gH + j + 1] AS REAL)]))""".stripMargin)})"""
  }

  /** Reversed LSTM step t in f32: gate layout [i, j, f, o], forget
    * bias +1.0f (an f32 add BEFORE σ, as in `Lstm32`), and
    * `nc = fl(fl(fg·c) + fl(ig·jg))`, `nh = fl(og·tanh32(nc))`.
    */
  private def stepCte(t: Int): String = {
    val x = s"es[${T - t + 1}]"
    def nc(g: String, c: String) =
      s"""list_transform(range($H), k -> ${r(
        r(s"(${sigF(s"$g[${2 * H}+k+1] + 1.0")})*$c[k+1]") + " + " +
          r(s"(${sigF(s"$g[k+1]")})*${thF(s"$g[$H+k+1]")}"))})"""
    def nh(g: String, ncc: String) =
      s"""list_transform(range($H), k -> ${r(
        s"(${sigF(s"$g[${3 * H}+k+1]")}) * ${thF(s"$ncc[k+1]")}")})"""
    s"""s$t AS (
       |  SELECT user_id, es, wf, ncA AS cA, ${nh("gA", "ncA")} AS hA,
       |    ncB AS cB, ${nh("gB", "ncB")} AS hB,
       |    list_append(hAs, ${nh("gA", "ncA")}) AS hAs,
       |    list_append(hBs, ${nh("gB", "ncB")}) AS hBs
       |  FROM (
       |    SELECT user_id, es, wf, hAs, hBs, gA, gB, ${nc("gA", "cA")} AS ncA,
       |      ${nc("gB", "cB")} AS ncB
       |    FROM (
       |      SELECT user_id, es, wf, cA, hA, cB, hB, hAs, hBs,
       |        ${gatesF(lay.offA, x, "hA")} AS gA,
       |        ${gatesF(lay.offB, x, "hB")} AS gB
       |      FROM s${t - 1})))""".stripMargin
  }

  /** q204: per-user f32 scores rounded (as doubles) to 6 decimals —
    * the same SELECT shape as the f64 q76 oracle, every op in f32.
    */
  def q204(ckptGlob: String): String = {
    val zeros = s"list_transform(range($H), k -> $zeroF)"
    def prob(k: Int) = sigF(fold(s"wf[${lay.offHeadB}+${k + 1}]",
      s"list_transform(range($H), j -> CAST(ctx[j+1]*wf[${lay.offHeads}+${k * H}+j+1] AS REAL))"))
    s"""${RetainOracleSql.prepCtes(ckptGlob)},
       |w0f AS (
       |  SELECT list_transform(w, x -> CAST(x AS REAL)) AS wf FROM w0),
       |emb AS (
       |  SELECT user_id, wf,
       |    list_transform(xs, xrow ->
       |      list_transform(range($H), j -> ${fold(zeroF,
      s"list_transform(range($F), i -> CAST(CAST(xrow[i+1] AS REAL) * wf[i*$H + j + 1] AS REAL))")})) AS es
       |  FROM grid, w0f),
       |s0 AS (
       |  SELECT user_id, es, wf, $zeros AS cA, $zeros AS hA, $zeros AS cB,
       |    $zeros AS hB, CAST([] AS REAL[][]) AS hAs, CAST([] AS REAL[][]) AS hBs
       |  FROM emb),
       |${(1 to T).map(stepCte).mkString(",\n")},
       |att AS (
       |  SELECT user_id, es, wf, hAs, hBs,
       |    list_transform(hAs, hrow -> ${fold(s"wf[${lay.offBAlpha}+1]",
      s"list_transform(range($H), j -> CAST(hrow[j+1]*wf[${lay.offWAlpha}+j+1] AS REAL))")}) AS sc
       |  FROM s$T),
       |soft AS (
       |  SELECT user_id, es, wf, hBs,
       |    list_transform(sc, x -> CAST(exp(CAST(CAST(x - list_max(sc) AS REAL) AS DOUBLE)) AS REAL)) AS ez
       |  FROM att),
       |alpha AS (
       |  SELECT user_id, es, wf, hBs,
       |    list_transform(ez, x -> CAST(x / sez AS REAL)) AS aRev
       |  FROM (SELECT *, ${fold(zeroF, "ez")} AS sez FROM soft)),
       |betas AS (
       |  SELECT user_id, es, wf, aRev,
       |    list_transform(hBs, hrow ->
       |      list_transform(range($H), j ->
       |        ${thF(fold(s"wf[${lay.offBBeta}+j+1]",
      s"list_transform(range($H), i -> CAST(hrow[i+1]*wf[${lay.offWBeta}+i*$H+j+1] AS REAL))"))})) AS bRev
       |  FROM alpha),
       |ctxt AS (
       |  SELECT user_id, wf,
       |    list_transform(range($H), j -> ${fold(zeroF,
      s"list_transform(range($T), t -> CAST(CAST(aRev[$T-t] * bRev[$T-t][j+1] AS REAL) * es[t+1][j+1] AS REAL))")}) AS ctx
       |  FROM betas)
       |SELECT user_id, ${(0 until K).map(k => s"round(CAST(${prob(k)} AS DOUBLE), 6) AS p$k").mkString(", ")}
       |FROM ctxt ORDER BY user_id""".stripMargin
  }
}
