package graft.operators

import graft.{QueryDef, Scratch, Tables}
import graft.functions.Retain
import graft.functions.Retain.{RetainWeights, F, H, T, numTasks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RETAIN scoring + AMTL training (SURVEY.md M5/M6): the reference's
  * actual end-to-end capability — per-entity risk scores with reverse-
  * time attention (`model.py:129-154`), per-task eval metrics
  * (`model.py:157-159`), and the asymmetric multi-task B matrix
  * (`model.py:86-101,174-184`).
  *
  * Execution shape (SURVEY.md §4.3): series assembly is two shuffles on
  * `user_id` (pivot + collect); scoring is a narrow typed `map` under a
  * broadcast weight struct (no shuffle, scales linearly with rows);
  * training keeps all head/B parameters on the driver (51 doubles) and
  * does one `treeAggregate` pass per iteration over cached context
  * vectors — the classic MLlib optimization pattern. Nothing row-sized
  * ever reaches the driver.
  *
  * These queries are deterministic given the fixed seed-42 weights but
  * not ANSI-SQL-expressible (the LSTM recurrence, SURVEY.md §7.5), so
  * the driver applies its rows-only check; numeric correctness is
  * covered by RetainSpec (hand-computed kernel cases + invariants).
  */
object RetainOps {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val gridStart = "2024-01-01"
  private val labelSplit = "2024-01-12 00:00:00" // steps: days 0..10; labels: after

  /** Dense per-user [T][F] series from the first 11 days of events:
    * day-bucket → pivot to the 5 event-type features (missing ⇒ 0) →
    * ordered collect. The engine-side `data_loader` (`run.py:47`).
    */
  def assembleSeries(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val feat = e
      .where(col("ts") < lit(labelSplit).cast("timestamp"))
      .withColumn("day", datediff(col("ts").cast("date"), lit(gridStart).cast("date")))
      .where(col("day").between(0, T - 1))
      .groupBy("user_id", "day")
      .pivot("event_type", eventTypes)
      .agg(sum(col("value")))
    val stepArr = array(eventTypes.map(t => coalesce(col(t), lit(0.0)) / 100.0): _*)
    feat.select(col("user_id"), col("day"), stepArr.as("fv"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("day"), col("fv")))).as("steps"))
  }

  /** Per-user binary labels for the 3 tasks from the post-split window
    * (no leakage into the feature grid): high-value purchase / error /
    * signup, thresholds picked for rough class balance.
    */
  def labels(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .where(col("ts") >= lit(labelSplit).cast("timestamp"))
    def lab(t: String) =
      max(when(col("event_type") === t && col("value") > 140.0, 1.0).otherwise(0.0))
    e.groupBy("user_id")
      .agg(lab("purchase").as("y0"), lab("error").as("y1"), lab("signup").as("y2"))
  }

  /** Featurized training base: (user_id, dense [T][F] grid, labels[3])
    * as a persisted OBJECT RDD, built once per (context, source dir) and
    * shared by every RETAIN query — scoring, attention, eval, and both
    * training regimes. The two assembly shuffles (pivot + ordered
    * collect) and the row→tensor decode are paid once per session, the
    * way a production feature store amortizes its materialization; at
    * 100 TB this is the cached feature table every trainer reads.
    * Footprint is users × T×F doubles (MBs at any SF that fits a label
    * pass), so it stays pinned for the session.
    */
  private val baseCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.rdd.RDD[(Long, Array[Array[Double]], Array[Double])]]

  def featurized(s: SparkSession, d: String): org.apache.spark.rdd.RDD[(Long, Array[Array[Double]], Array[Double])] = {
    val key = s"${s.sparkContext.hashCode()}|$d"
    baseCache.computeIfAbsent(key, _ => {
      import s.implicits._
      val rdd = assembleSeries(s, d)
        .join(labels(s, d), Seq("user_id"), "left")
        .na.fill(0.0, Seq("y0", "y1", "y2"))
        .select(col("user_id"), col("steps"), col("y0"), col("y1"), col("y2"))
        .as[(Long, Seq[(Int, Seq[Double])], Double, Double, Double)]
        .map { case (uid, steps, y0, y1, y2) =>
          val x = Array.fill(T, F)(0.0)
          steps.foreach { case (day, fv) =>
            if (day >= 0 && day < T) { var i = 0; while (i < F) { x(day)(i) = fv(i); i += 1 } }
          }
          (uid, x.map(_.toSeq).toSeq, Seq(y0, y1, y2))
        }
        .coalesce(8) // tiny rows: cut per-iteration task-scheduling overhead
        .rdd.map { case (uid, xs, ys) => (uid, xs.map(_.toArray).toArray, ys.toArray) }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      rdd.count() // materialize eagerly so consumers never race the build
      rdd
    })
  }

  /** [[scored]] under the default eval weights, persisted once per
    * (session, sf-dir) via PlanCache — q78 and q254 share the scoring
    * pass, and repeated bench/verify invocations reuse ONE cache entry
    * instead of stacking fresh ones.
    */
  private def scoredCached(s: SparkSession, d: String): DataFrame =
    graft.PlanCache.cached(s, s"retain_scored_default|$d")(
      scored(s, d, Retain.defaultWeights))

  /** Score every user with the broadcast weights; returns
    * (user_id, p0..p2, alpha array, context array, y0..y2). A narrow
    * map over [[featurized]] — no shuffle of its own.
    */
  def scored(s: SparkSession, d: String, w: RetainWeights): DataFrame = {
    import s.implicits._
    val bw = s.sparkContext.broadcast(w)
    featurized(s, d).map { case (uid, x, ys) =>
      val (p, alpha, ctx) = Retain.forward(bw.value, x)
      (uid, p(0), p(1), p(2), alpha.toSeq, ctx.toSeq, ys(0), ys(1), ys(2))
    }.toDF("user_id", "p0", "p1", "p2", "alpha", "ctx", "y0", "y1", "y2")
  }

  // ---------------- AMTL training (reference model.py:174-184) ----------------

  /** Train per-task heads + B on frozen shared features ("lastlayer"
    * semantics, the reference's own model_tag `run.py:8`). One
    * treeAggregate per Adam step; heads/B live on the driver.
    *
    * @param minibatch 0 = full batch (every iteration sees all rows);
    *                  >0 = the reference's regime (`model.py:187-194`,
    *                  R4+R26): each Adam step consumes a fresh seeded
    *                  ~`minibatch`-row Bernoulli sample of the cached
    *                  rows (seed = iteration, so the trajectory is
    *                  deterministic), gradients normalized by the rows
    *                  actually sampled.
    * @param onIter    optional per-iteration hook `(it, B snapshot,
    *                  evalCe thunk)` for checkpoint/artifact regimes
    *                  (`model.py:236-310`). The thunk runs ONE CE-only
    *                  treeAggregate over the full cached set with the
    *                  current heads — pay it only on check iterations.
    */
  def trainAmtl(s: SparkSession, d: String, iters: Int = 40, lr: Double = 0.05,
                mu: Double = 0.005, lambda: Double = 0.005,
                minibatch: Int = 0,
                onIter: (Int, Array[Array[Double]], () => Array[Double]) => Unit = null)
      : (Array[Array[Double]], Array[Double], Array[Double]) = {
    val w0 = Retain.defaultWeights
    // Persist the OBJECT RDD, not the Dataset: the Adam loop reuses the
    // same partitions every iteration, and a persisted object RDD skips
    // both the per-iteration Catalyst planning a fresh `.rdd` would do
    // and the InternalRow→tuple deserialization a cached Dataset pays
    // on every pass. Derived from the shared [[featurized]] base (one
    // forward pass to the frozen context vectors — narrow, no shuffle).
    val bw0 = s.sparkContext.broadcast(w0)
    val data = featurized(s, d)
      .map { case (_, x, ys) =>
        val (_, _, ctx) = Retain.forward(bw0.value, x)
        (ctx, ys)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val n = data.count().toDouble
    val nPos = data.map(_._2).reduce((a, b) => Array.tabulate(numTasks)(k => a(k) + b(k)))
    val sqrtn = math.sqrt(n) // single pooled set per task (all users, all tasks)

    // parameters: heads [K][H], biases [K], B [K][K] (diag pinned 0)
    val K = numTasks
    val heads = Array.tabulate(K, H)((k, j) => w0.heads(k)(j))
    val biases = w0.headB.clone()
    val bMat = Array.fill(K, K)(0.0)

    // Adam state over the flattened parameter vector
    val dim = K * H + K + K * K
    val m = new Array[Double](dim); val v = new Array[Double](dim)
    val b1 = 0.9; val b2 = 0.999; val eps = 1e-8

    def flatIdx(part: Int, i: Int, j: Int): Int = part match {
      case 0 => i * H + j          // heads
      case 1 => K * H + i          // biases
      case _ => K * H + K + i * K + j // B
    }

    var ces = new Array[Double](K)
    for (it <- 1 to iters) {
      // data pass: per task, grad of mean CE wrt (w_k, b_k) + CE value;
      // the trailing slot counts the rows that contributed (== n for
      // full batch; the sampled size for minibatch)
      val batch =
        if (minibatch > 0) data.sample(withReplacement = false,
          math.min(1.0, minibatch / n), seed = it)
        else data
      val zero = new Array[Double](K * (H + 2) + 1)
      val agg = batch.treeAggregate(zero)(
        seqOp = (acc, row) => {
          val (c, y) = row
          var k = 0
          while (k < K) {
            var z = biases(k)
            var j = 0
            while (j < H) { z += heads(k)(j) * c(j); j += 1 }
            val p = Retain.sigmoid(z)
            val g = p - y(k)
            val base = k * (H + 2)
            j = 0
            while (j < H) { acc(base + j) += g * c(j); j += 1 }
            acc(base + H) += g
            // stable CE: max(z,0) - z y + log1p(exp(-|z|))  (model.py:159)
            acc(base + H + 1) += math.max(z, 0) - z * y(k) + math.log1p(math.exp(-math.abs(z)))
            k += 1
          }
          acc(K * (H + 2)) += 1
          acc
        },
        combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })

      val grad = new Array[Double](dim)
      // normalize by the rows this step actually saw (an empty sampled
      // batch — possible at tiny SF — contributes a zero gradient)
      val cnt = math.max(agg(K * (H + 2)), 1.0)
      ces = Array.tabulate(K)(k => agg(k * (H + 2) + H + 1) / cnt)
      // CE-path gradients with (1 + μ‖B[k,:]‖₁)/√n scaling (model.py:178)
      for (k <- 0 until K) {
        val l1row = (0 until K).map(j => math.abs(bMat(k)(j))).sum
        val scale = (1.0 + mu * l1row) / sqrtn // task weight (model.py:178)
        val base = k * (H + 2)
        for (j <- 0 until H) grad(flatIdx(0, k, j)) += scale * (agg(base + j) / cnt)
        grad(flatIdx(1, k, 0)) += scale * (agg(base + H) / cnt)
        // μ-path gradient on B row k: μ·sign(B[k,j])·CE_k/√n
        for (j <- 0 until K if j != k)
          grad(flatIdx(2, k, j)) += mu * math.signum(bMat(k)(j)) * ces(k) / sqrtn
      }
      // λ reconstruction penalty: Σ_t ‖w_t − Σ_j B[j,t] w_j‖² (model.py:179-181)
      val resid = Array.tabulate(K, H) { (t, j) =>
        var r = heads(t)(j)
        for (i <- 0 until K) r -= bMat(i)(t) * heads(i)(j)
        r
      }
      for (t <- 0 until K; j <- 0 until H) {
        grad(flatIdx(0, t, j)) += lambda * 2.0 * resid(t)(j)
        for (i <- 0 until K if i != t)
          grad(flatIdx(0, i, j)) += lambda * 2.0 * resid(t)(j) * (-bMat(i)(t))
      }
      for (i <- 0 until K; t <- 0 until K if i != t) {
        var g = 0.0
        for (j <- 0 until H) g += 2.0 * resid(t)(j) * (-heads(i)(j))
        grad(flatIdx(2, i, t)) += lambda * g
      }
      // Adam step (model.py:184, lr run.py:27 scaled for the tiny head)
      val bc1 = 1 - math.pow(b1, it); val bc2 = 1 - math.pow(b2, it)
      def adam(ix: Int, g: Double): Double = {
        m(ix) = b1 * m(ix) + (1 - b1) * g
        v(ix) = b2 * v(ix) + (1 - b2) * g * g
        lr * (m(ix) / bc1) / (math.sqrt(v(ix) / bc2) + eps)
      }
      for (k <- 0 until K; j <- 0 until H)
        heads(k)(j) -= adam(flatIdx(0, k, j), grad(flatIdx(0, k, j)))
      for (k <- 0 until K)
        biases(k) -= adam(flatIdx(1, k, 0), grad(flatIdx(1, k, 0)))
      for (i <- 0 until K; j <- 0 until K if i != j)
        bMat(i)(j) -= adam(flatIdx(2, i, j), grad(flatIdx(2, i, j))) // diag stays 0 (model.py:91-92)

      if (onIter != null) {
        // eval pass (`model.py:219-228`): full-set CE with the CURRENT
        // heads — capture copies so the lazy thunk is stable even if
        // invoked after later iterations mutate the driver arrays
        val hSnap = heads.map(_.clone()); val bSnap = biases.clone()
        val evalThunk = () => {
          val agg = data.treeAggregate(new Array[Double](K + 1))(
            seqOp = (acc, row) => {
              val (c, y) = row
              var k = 0
              while (k < K) {
                var z = bSnap(k)
                var j = 0
                while (j < H) { z += hSnap(k)(j) * c(j); j += 1 }
                acc(k) += math.max(z, 0) - z * y(k) + math.log1p(math.exp(-math.abs(z)))
                k += 1
              }
              acc(K) += 1
              acc
            },
            combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
          Array.tabulate(K)(k => agg(k) / math.max(agg(K), 1.0))
        }
        onIter(it, bMat.map(_.clone()), evalThunk)
      }
    }
    data.unpersist()
    (bMat, ces, nPos)
  }

  /** The reference's composed default training regime, end-to-end
    * (`run.py:24-31` + `model.py:187-310`): seeded ~`minibatch`-row
    * Adam steps, a full-set eval every `checkIter` iterations, and —
    * every `artifactEvery` iterations — an APPEND to the reference's
    * one persistent output, `B_matrix_loss_sqrtn.txt`. File lifecycle
    * matches the reference exactly: TRUNCATED once at regime start
    * (`model.py:229` `open('w')`), then appended per dump
    * (`model.py:297` `open('a')`). The reproduction contract is
    * BLOCK-STRUCTURE/FORMAT parity (`model.py:296-310`) — every line,
    * separator, and quirk below — not byte-identical numeric text:
    * Python 2's `str()` prints floats truncated to 12 significant
    * digits while Scala prints shortest-roundtrip doubles, a declared
    * precision-representation divergence (SURVEY §7.4).
    *
    * {{{
    * Step <it>
    * <B[t][0]>,<B[t][1]>,...,        ← one line per task, EVERY value
    *                                    followed by ',' (model.py:303-305)
    * Eval Main Loss = <sum>
    * Eval Loss <loss_t>= <sum>       ← one per task; the reference
    *                                    literally interpolates the loss
    *                                    VALUE before '=' (model.py:308-309)
    * <blank line>
    * }}}
    *
    * Note `artifactEvery` need not divide `checkIter` (the reference's
    * 500 vs 200): the artifact uses the LATEST eval values, exactly as
    * `model.py` reads its last-updated `eval_loss` variables.
    *
    * Defaults are the reference's regime constants (`run.py:28-30`:
    * total 1000, check 200, artifact 500, batch 128, lr 1e-3). Scale
    * posture: each iteration is one treeAggregate over the cached
    * context RDD; the artifact path is driver-side O(K²) text.
    *
    * @return the artifact lines appended by THIS run, in order.
    */
  def referenceRegime(s: SparkSession, d: String,
      totalIter: Int = 1000, checkIter: Int = 200, artifactEvery: Int = 500,
      minibatch: Int = 128, lr: Double = 1e-3,
      artifactPath: java.nio.file.Path): Seq[String] = {
    import java.nio.file.{Files, StandardOpenOption}
    if (artifactPath.getParent != null) Files.createDirectories(artifactPath.getParent)
    // model.py:229: the reference truncates the artifact once at run
    // start (`open('w'); close()`), then appends per dump — so a fresh
    // regime replaces a previous run's file instead of growing it
    Files.write(artifactPath, Array.emptyByteArray,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val written = scala.collection.mutable.ArrayBuffer[String]()
    var lastEval: Array[Double] = null
    trainAmtl(s, d, iters = totalIter, lr = lr, minibatch = minibatch,
      onIter = (it, b, evalThunk) => {
        if (checkIter > 0 && it % checkIter == 0) lastEval = evalThunk()
        if (artifactEvery > 0 && it % artifactEvery == 0) {
          val ev = if (lastEval != null) lastEval else evalThunk()
          val sum = ev.sum
          val block = scala.collection.mutable.ArrayBuffer[String]()
          block += s"Step $it"
          for (t <- 0 until numTasks)
            block += b(t).map(x => s"$x,").mkString // trailing comma per value
          block += s"Eval Main Loss = $sum"
          for (t <- 0 until numTasks)
            block += s"Eval Loss ${ev(t)}= $sum"
          block += ""
          Files.write(artifactPath,
            (block.mkString("\n") + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
          written ++= block
        }
      })
    written.toSeq
  }

  /** Full joint training (the reference's actual optimization,
    * `model.py:184`: Adam over ALL trainables — V, both LSTMs,
    * attention, heads — plus B): per-iteration distributed pass runs
    * [[graft.functions.RetainGrad.rowGrad]] per entity and
    * treeAggregates the ~2.4k-double flat gradient; Adam and the B/λ
    * coupling stay on the driver. Backprop is finite-difference
    * validated in RetainGradSpec.
    */
  /** @return (B matrix, final flat params, final mean loss,
    *          per-iteration eval history: (iter, perTaskCE)) — the
    *          history is the reference's check_iter eval stream
    *          (`model.py:236-272`), consumed by q96's running-minimum
    *          tracking (R28).
    */
  def trainFull(s: SparkSession, d: String, iters: Int = 12, lr: Double = 0.01,
                mu: Double = 0.005, lambda: Double = 0.005,
                keepProb: Double = 1.0): (Array[Array[Double]], Array[Double], Double, Seq[(Int, Array[Double])]) = {
    import graft.functions.RetainGrad
    import graft.functions.RetainGrad._
    val K = numTasks
    // the shared persisted (uid, x, ys) base — every Adam iteration
    // reuses the same cached partitions (see [[featurized]])
    val data = featurized(s, d)
    val n = data.count().toDouble
    val sqrtn = math.sqrt(n)

    var params = RetainGrad.pack(Retain.defaultWeights)
    val bMat = Array.fill(K, K)(0.0)
    val m = new Array[Double](Dim + K * K); val v = new Array[Double](Dim + K * K)
    val b1 = 0.9; val b2 = 0.999; val eps = 1e-8
    var lastLoss = 0.0
    val history = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Double])]

    for (it <- 1 to iters) {
      val w = RetainGrad.unpack(params)
      val scale = Array.tabulate(K) { k =>
        (1.0 + mu * (0 until K).map(j => math.abs(bMat(k)(j))).sum) / sqrtn
      }
      val bw = s.sparkContext.broadcast((w, scale))
      // one distributed pass: flat grad ++ [scaled loss] ++ per-task CE
      val agg = data.treeAggregate(new Array[Double](Dim + 1 + K))(
        seqOp = (acc, row) => {
          val (uid, x, ys) = row
          val ceView = new Array[Double](K)
          // per-(row, iter) dropout seed: deterministic across runs and
          // partitionings (R11, keep_prob model.py:204)
          acc(Dim) += RetainGrad.rowGrad(bw.value._1, x, ys, bw.value._2, acc,
            ceView, keepProb, uid * 7919L + it)
          var k = 0
          while (k < K) { acc(Dim + 1 + k) += ceView(k); k += 1 }
          acc
        },
        combOp = (a, c) => { var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a })
      bw.destroy()
      lastLoss = agg(Dim) / n
      val ceTask = Array.tabulate(K)(k => agg(Dim + 1 + k) / n)
      history += ((it, ceTask))
      val grad = new Array[Double](Dim + K * K)
      locally { var i = 0; while (i < Dim) { grad(i) = agg(i) / n; i += 1 } }
      // λ head-reconstruction coupling + B gradients (driver side, tiny)
      val heads = Array.tabulate(K, H)((k, j) => params(OffHeads + k * H + j))
      val resid = Array.tabulate(K, H) { (t, j) =>
        var r = heads(t)(j)
        for (i <- 0 until K) r -= bMat(i)(t) * heads(i)(j)
        r
      }
      for (t <- 0 until K; j <- 0 until H) {
        grad(OffHeads + t * H + j) += lambda * 2.0 * resid(t)(j)
        for (i <- 0 until K if i != t)
          grad(OffHeads + i * H + j) += lambda * 2.0 * resid(t)(j) * (-bMat(i)(t))
      }
      // μ-path B gradient uses the exact per-task mean CE carried
      // through the same treeAggregate pass (model.py:178 couples
      // B's L1 row to task i's loss)
      for (i <- 0 until K; t <- 0 until K if i != t) {
        var g = mu * math.signum(bMat(i)(t)) * ceTask(i) / sqrtn
        for (j <- 0 until H) g += lambda * 2.0 * resid(t)(j) * (-heads(i)(j))
        grad(Dim + i * K + t) = g
      }
      // Adam over params ++ B
      val bc1 = 1 - math.pow(b1, it); val bc2 = 1 - math.pow(b2, it)
      def adam(ix: Int, g: Double): Double = {
        m(ix) = b1 * m(ix) + (1 - b1) * g
        v(ix) = b2 * v(ix) + (1 - b2) * g * g
        lr * (m(ix) / bc1) / (math.sqrt(v(ix) / bc2) + eps)
      }
      locally { var i = 0; while (i < Dim) { params(i) -= adam(i, grad(i)); i += 1 } }
      for (i <- 0 until K; j <- 0 until K if i != j)
        bMat(i)(j) -= adam(Dim + i * K + j, grad(Dim + i * K + j))
    }
    (bMat, params, lastLoss, history.toSeq) // base RDD stays cached for the session
  }

  /** Weight checkpoint shared by the q76/q77/q78 oracles: the flat
    * (idx,value) parquet the generated DuckDB SQL reads back, written
    * at most once per JVM (all three queries call this; Verify may run
    * any subset). Path is Scratch-rooted so the driver's DuckDB pass —
    * which runs after this JVM exits — reads exactly what it wrote.
    */
  private val ckptWritten = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def oracleCkptDir(s: SparkSession): String = {
    val dir = s"${Scratch.root}/graft_retain_w"
    if (ckptWritten.add(s"${s.sparkContext.hashCode()}|$dir"))
      graft.functions.RetainCheckpoint.save(s, Retain.defaultWeights, dir)
    dir
  }
  private def ckptGlob: String = s"${Scratch.root}/graft_retain_w/*.parquet"

  val defs: Seq[QueryDef] = Seq(

    /** RETAIN risk scores per entity (reference entry point semantics,
      * `model.py:153-154`): deterministic eval-mode forward pass under
      * broadcast seed-42 weights. Hash-verified since round 7 against
      * [[RetainOracleSql]]'s unrolled-recurrence DuckDB oracle over the
      * checkpointed weights.
      */
    QueryDef("q76_retain_score", RetainOracleSql.q76(ckptGlob)) { (s, d) =>
      oracleCkptDir(s)
      scored(s, d, Retain.defaultWeights)
        .select(col("user_id"),
          round(col("p0"), 6).as("p0"),
          round(col("p1"), 6).as("p1"),
          round(col("p2"), 6).as("p2"))
        .orderBy("user_id")
    },

    /** Weights checkpoint round-trip (the reference's `tf.train.Saver`
      * surface, `model.py:216-217`): save the eval weights to parquet,
      * restore, score the corpus under BOTH, and emit the per-task max
      * absolute score divergence — which must be EXACTLY zero (the
      * restore is bit-exact and the kernel deterministic), so the
      * constant oracle hash-verifies the whole save→load→score path.
      */
    QueryDef(
      "q205_weights_checkpoint",
      """SELECT * FROM (VALUES (0, CAST(0.0 AS DOUBLE)),
        |  (1, CAST(0.0 AS DOUBLE)), (2, CAST(0.0 AS DOUBLE)))
        |  t(task, max_abs_diff)
        |ORDER BY task""".stripMargin) { (s, d) =>
      // per-run overwrite path (q207's pattern): repeated gates/benches
      // must not accumulate orphaned temp checkpoint directories, and
      // concurrent runs must not clobber each other's checkpoints
      val dir = s"${Scratch.root}/graft_ckpt/w"
      graft.functions.RetainCheckpoint.save(s, Retain.defaultWeights, dir)
      val restored = graft.functions.RetainCheckpoint.load(s, dir)
      val a = scored(s, d, Retain.defaultWeights)
        .select(col("user_id"), col("p0"), col("p1"), col("p2"))
      val b = scored(s, d, restored)
        .select(col("user_id"), col("p0").as("q0"), col("p1").as("q1"),
          col("p2").as("q2"))
      val j = a.join(b, "user_id")
      (0 until numTasks).map { k =>
        j.agg(lit(k).as("task"),
          max(abs(col(s"p$k") - col(s"q$k"))).as("max_abs_diff"))
      }.reduce(_.unionByName(_)).orderBy("task")
    },

    /** q76 in the reference's own precision (`model.py:45` float32
      * end-to-end): every op of the forward pass rounds to f32, closing
      * the SURVEY §7.4 precision-divergence gap for scoring.
      * Hash-verified since round 9 (VERDICT r8 #4) against
      * [[RetainOracleSqlF32]]'s list_reduce f32-fold oracle — every
      * partial sum rounds to REAL in the JVM kernel's exact
      * accumulation order; RetainSpec additionally pins f32-vs-f64
      * agreement and genuine f32 rounding.
      */
    QueryDef("q204_retain_score_f32", RetainOracleSqlF32.q204(ckptGlob)) { (s, d) =>
      oracleCkptDir(s)
      import s.implicits._
      // broadcast the PRE-CONVERTED float weights: the per-row hot loop
      // converts only the input grid, never the parameter matrices
      val bw = s.sparkContext.broadcast(Retain.F32.prepare(Retain.defaultWeights))
      featurized(s, d).map { case (uid, x, _) =>
        val p = Retain.F32.forward(bw.value, x)
        (uid, p(0), p(1), p(2))
      }.toDF("user_id", "p0", "p1", "p2")
        .select(col("user_id"),
          round(col("p0"), 6).as("p0"),
          round(col("p1"), 6).as("p1"),
          round(col("p2"), 6).as("p2"))
        .orderBy("user_id")
    },

    /** q76 under the GRU fallback cell (reference `use_lstm=False`,
      * `model.py:110-111`): same eval-mode forward, α/β recurrences run
      * the GRU under its own deterministic weight lineage. Hash-verified
      * since round 7 (the oracle unrolls the GRU recurrence over the
      * packGru flat checkpoint); RetainSpec additionally pins the cell
      * semantics against a hand-rolled recurrence.
      */
    QueryDef("q203_retain_score_gru",
        RetainOracleSql.q203(s"${Scratch.root}/graft_retain_gru_w/*.parquet")) { (s, d) =>
      val dir = s"${Scratch.root}/graft_retain_gru_w"
      if (ckptWritten.add(s"${s.sparkContext.hashCode()}|$dir"))
        graft.functions.RetainCheckpoint.saveGru(s, Retain.defaultGruWeights, dir)
      scored(s, d, Retain.defaultGruWeights)
        .select(col("user_id"),
          round(col("p0"), 6).as("p0"),
          round(col("p1"), 6).as("p1"),
          round(col("p2"), 6).as("p2"))
        .orderBy("user_id")
    },

    /** RETAIN attention explanation (R13's α, the reference's
      * interpretability output): top-weight step per user. Hash-verified
      * since round 7 (argmax over the oracle's recomputed α sequence;
      * both sides tie-break to the earliest step).
      */
    QueryDef("q77_retain_attention", RetainOracleSql.q77(ckptGlob)) { (s, d) =>
      oracleCkptDir(s)
      val sc = scored(s, d, Retain.defaultWeights)
      sc.select(col("user_id"), posexplode(col("alpha")).as(Seq("step", "a")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("a").desc, col("step"))))
        .where(col("rn") === 1)
        .select(col("user_id"), col("step").as("top_step"), round(col("a"), 6).as("top_alpha"))
        .orderBy("user_id")
    },

    /** Per-task eval metrics of the RETAIN scores — the reference's
      * eval loop (R18/R19/R20, `model.py:157-159`): accuracy@0.5, mean
      * CE, and exact mid-rank AUC per task, one row per task.
      * Hash-verified since round 7 (the oracle recomputes the metrics
      * with the q20/q21 formulas over its own recomputed scores).
      */
    QueryDef("q78_retain_eval", RetainOracleSql.q78(ckptGlob)) { (s, d) =>
      oracleCkptDir(s)
      val sc = scoredCached(s, d)
      val perTask = (0 until numTasks).map { k =>
        val p = col(s"p$k"); val y = col(s"y$k")
        val z = -log(lit(1.0) / p - 1.0) // logit back from sigmoid
        val ranked = sc.select(p.as("p"), y.as("y"))
          .withColumn("mr", rank().over(Window.orderBy(col("p"))) +
            (count(lit(1)).over(Window.partitionBy(col("p"))) - 1) / 2.0)
        ranked.agg(
          lit(k).as("task"),
          round(lit(100.0) * avg(((col("p") >= 0.5) === (col("y") === 1.0)).cast("double")), 4).as("acc_pct"),
          round(avg(-(col("y") * log(col("p")) + (lit(1.0) - col("y")) * log(lit(1.0) - col("p")))), 6).as("ce"),
          round((sum(when(col("y") === 1.0, col("mr"))) - sum(col("y")) * (sum(col("y")) + 1) / 2) /
            (sum(col("y")) * sum(lit(1.0) - col("y"))), 6).as("auc"))
      }
      perTask.reduce(_.unionByName(_)).orderBy("task")
    },

    /** The reference's AUC APPROXIMATION stated as a query (round 8,
      * VERDICT #4 — the last observable-behavior delta): per task, the
      * exact mid-rank AUC next to the 200-bucket histogram AUC
      * (`tf.metrics.auc`'s default `num_thresholds=200` trapezoid,
      * `model.py:157`) over the same RETAIN eval scores, plus
      * |approx − exact|. The bucketed value runs through the SAME
      * mergeable Aggregator as q87 at bins=200 — one pass, O(bins)
      * buffer, shuffle-free partial merge (the 100 TB eval shape) —
      * while the exact value uses q21's global mid-rank form. All
      * counts and mid-ranks are half-integers (order-free exact double
      * sums), so both AUCs and the gap hash-match DuckDB bit-for-bit;
      * PropertySpec asserts the gap ≤ 1/200 and measures the
      * bin-boundary margin of the unrounded probabilities (the q226
      * margin discipline — scores sit ≫1e-6 from every p·200 integer
      * boundary, so the cross-engine ~1e-9 score deviation cannot flip
      * a bin).
      */
    QueryDef("q254_auc_bucketed", RetainOracleSql.q254(ckptGlob, 200)) { (s, d) =>
      import s.implicits._
      oracleCkptDir(s)
      val sc = scoredCached(s, d)
      val perTask = (0 until numTasks).map { k =>
        val p = col(s"p$k"); val y = col(s"y$k")
        val ranked = sc.select(p.as("p"), y.as("y"))
          .withColumn("mr", rank().over(Window.orderBy(col("p"))) +
            (count(lit(1)).over(Window.partitionBy(col("p"))) - 1) / 2.0)
        val exact = ranked.agg(
          ((sum(when(col("y") === 1.0, col("mr"))) -
            sum(col("y")) * (sum(col("y")) + 1) / 2) /
            (sum(col("y")) * sum(lit(1.0) - col("y")))).as("ae"))
        val bucketed = sc.select(p.as("p"), y.as("y")).as[(Double, Double)]
          .select(graft.functions.AucHistogram.aggWith(200).toColumn)
          .toDF("ab", "np", "nn")
          .select(col("ab"))
        bucketed.crossJoin(exact).select(
          lit(k).as("task"),
          round(col("ae"), 6).as("auc_exact"),
          round(col("ab"), 6).as("auc_b200"),
          round(abs(col("ab") - col("ae")), 6).as("approx_err"))
      }
      perTask.reduce(_.unionByName(_)).orderBy("task")
    },

    /** Streaming stateful RETAIN scoring (SURVEY group 8 "stateful
      * scoring", the streaming analogue of R10): per-user GroupState
      * holds the running [T][F] feature grid; every update re-scores
      * the user with the broadcast weights. On the finite stream the
      * final scores match batch q76 (up to fp summation order —
      * asserted with tolerance in StreamingSpec).
      */
    QueryDef.noOracle("q95_stream_retain_score") { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
      import org.apache.spark.sql.types._
      val rawSchema = graft.streaming.Streaming.rawSchema(s, d)
      // shared staged dir (round 12): handles both single-file and
      // ScaleGen part-dir events.parquet layouts
      val stage = graft.streaming.Streaming.stageDir(d)
      val bw = s.sparkContext.broadcast(Retain.defaultWeights)
      val typeIdx = eventTypes.zipWithIndex.toMap
      val splitMicros = java.time.LocalDateTime.parse("2024-01-12T00:00:00")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      val startMicros = java.time.LocalDate.parse(gridStart)
        .atStartOfDay.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      val scoredStream = s.readStream.schema(rawSchema).parquet(stage)
        .withColumn("tsm", graft.streaming.Streaming.tsAsMicros(s, d)) // → epoch micros
        .where(col("tsm") < splitMicros)
        .select(col("user_id"), col("tsm"), col("event_type"), col("value"))
        .as[(Long, Long, String, Double)]
        .groupByKey(_._1)
        .mapGroupsWithState[Seq[Double], (Long, Long, Double, Double, Double)](
          GroupStateTimeout.NoTimeout) {
          case (uid, rows, state: GroupState[Seq[Double]]) =>
            val grid = state.getOption.map(_.toArray).getOrElse(new Array[Double](T * F + 1))
            rows.foreach { case (_, tsm, et, v) =>
              val day = ((tsm - startMicros) / 86400000000L).toInt
              typeIdx.get(et).foreach { fi =>
                if (day >= 0 && day < T) { grid(day * F + fi) += v; grid(T * F) += 1 }
              }
            }
            state.update(grid.toSeq)
            val x = Array.tabulate(T, F)((t, i) => grid(t * F + i) / 100.0)
            val (p, _, _) = Retain.forward(bw.value, x)
            (uid, grid(T * F).toLong, p(0), p(1), p(2))
        }
        .toDF("user_id", "n_seen", "p0r", "p1r", "p2r")
      val q = graft.streaming.Streaming.withStreamConf(s) {
        scoredStream.writeStream.format("memory")
          .queryName("graft_stream_retain").outputMode("update").start()
      }
      try q.processAllAvailable() finally q.stop()
      // update mode may emit per microbatch; keep the fullest state per user
      val w = Window.partitionBy(col("user_id")).orderBy(col("n_seen").desc)
      s.table("graft_stream_retain")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"),
          round(col("p0r"), 6).as("p0"),
          round(col("p1r"), 6).as("p1"),
          round(col("p2r"), 6).as("p2"))
        .orderBy("user_id")
    },

    /** Full joint RETAIN+AMTL training (all parameters via distributed
      * BPTT + driver Adam): emits the learned B matrix, the final mean
      * loss, and gradient-flow evidence (how far shared weights moved
      * from init — nonzero only if backprop reaches them).
      */
    QueryDef.noOracle("q94_train_full") { (s, d) =>
      import graft.functions.RetainGrad
      import s.implicits._
      val (bMat, params, loss, _) = trainFull(s, d, keepProb = 0.5) // keep_prob run.py model.py:204
      val init = RetainGrad.pack(Retain.defaultWeights)
      def drift(from: Int, until: Int): Double = {
        var acc = 0.0
        var i = from
        while (i < until) { val dd = params(i) - init(i); acc += dd * dd; i += 1 }
        math.sqrt(acc)
      }
      val bRows = for (i <- 0 until numTasks; j <- 0 until numTasks)
        yield ("B", i.toLong, j.toLong, math.rint(bMat(i)(j) * 1e4) / 1e4)
      val extra = Seq(
        ("loss", 0L, 0L, math.rint(loss * 1e4) / 1e4),
        ("drift_V", 0L, 0L, math.rint(drift(RetainGrad.OffV, RetainGrad.OffACell) * 1e4) / 1e4),
        ("drift_lstm", 0L, 0L, math.rint(drift(RetainGrad.OffACell, RetainGrad.OffWAlpha) * 1e4) / 1e4),
        ("drift_attn", 0L, 0L, math.rint(drift(RetainGrad.OffWAlpha, RetainGrad.OffHeads) * 1e4) / 1e4),
        ("drift_heads", 0L, 0L, math.rint(drift(RetainGrad.OffHeads, RetainGrad.Dim) * 1e4) / 1e4))
      (bRows ++ extra).toSeq
        .toDF("kind", "src_task", "dst_task", "value")
        .orderBy("kind", "src_task", "dst_task")
    },

    /** Training eval stream + running-minimum tracking (R27/R28,
      * `model.py:219-228,236-272`): the per-iteration per-task CE
      * history from a real training run, with the running min and the
      * arg-min iteration computed relationally (window functions over
      * the history — the engine form of the reference's Python minima
      * bookkeeping).
      */
    QueryDef.noOracle("q96_train_eval_history") { (s, d) =>
      import s.implicits._
      val (_, _, _, history) = trainFull(s, d, iters = 6)
      val rows = for ((it, ces) <- history; k <- 0 until numTasks)
        yield (it, k, math.rint(ces(k) * 1e6) / 1e6)
      val hist = rows.toDF("iter", "task", "ce")
      val w = Window.partitionBy(col("task")).orderBy(col("iter"))
        .rowsBetween(Window.unboundedPreceding, 0)
      hist
        .withColumn("run_min_ce", min(col("ce")).over(w))
        .withColumn("best_iter",
          min_by(col("iter"), struct(col("ce"), col("iter"))).over(w))
        .orderBy("task", "iter")
    },

    /** The reference's actual training regime (R4+R26,
      * `model.py:187-194`): each Adam step consumes a fresh seeded
      * ~128-row minibatch instead of the full batch — stochastic
      * trajectory, deterministic given the per-iteration seeds. Output
      * shape matches q79 ([[amtlResultDf]]) so the two regimes are
      * directly comparable.
      */
    QueryDef.noOracle("q121_train_minibatch") { (s, d) =>
      val (bMat, ces, nPos) = trainAmtl(s, d, iters = 20, minibatch = 128)
      amtlResultDf(s, bMat, ces, nPos)
    },

    /** AMTL training: learned B causality matrix + final per-task CE —
      * the reference's headline artifact (`model.py:296-310`). 9 B rows
      * (diag exactly 0) + 3 loss rows.
      */
    QueryDef.noOracle("q79_train_bmatrix") { (s, d) =>
      val (bMat, ces, nPos) = trainAmtl(s, d, iters = 30)
      amtlResultDf(s, bMat, ces, nPos)
    },

    /** The reference's COMPOSED default regime end-to-end
      * ([[referenceRegime]], `run.py:24-31` + `model.py:296-310`):
      * minibatch Adam + periodic eval + the truncate-at-start,
      * append-per-dump `B_matrix_loss_sqrtn.txt` artifact, reproduced
      * block-for-block (format parity; numeric text follows Scala's
      * shortest-roundtrip doubles — see [[referenceRegime]]).
      * This query runs the regime at exactly 1/10 the reference's
      * constants (100/20/50 vs `run.py`'s 1000/200/500 — same
      * structure: two artifact blocks, five evals, artifact cadence
      * NOT a multiple of eval cadence) so it is bench-speed at test
      * SFs; `lr` stays the engine's head-scaled 0.05 (`run.py:27`'s
      * 1e-3 is tuned for the 2.4k-param joint model). Output is the
      * artifact's lines verbatim — rows-only (training floats aren't
      * SQL-expressible); RetainArtifactSpec pins the exact format.
      */
    QueryDef.noOracle("q224_reference_regime") { (s, d) =>
      import s.implicits._
      val p = java.nio.file.Paths.get(Scratch.root, "B_matrix_loss_sqrtn.txt")
      val lines = referenceRegime(s, d, totalIter = 100, checkIter = 20,
        artifactEvery = 50, minibatch = 128, lr = 0.05, artifactPath = p)
      lines.zipWithIndex.map { case (l, i) => ((i + 1).toLong, l) }
        .toDF("line_no", "line").orderBy("line_no")
    }
  )

  /** Shared q79/q121 result shape: 9 B rows + 3 CE rows + 3 n_pos rows,
    * values rounded to 4 decimals for the rows-only stability check.
    */
  private def amtlResultDf(s: SparkSession, bMat: Array[Array[Double]],
      ces: Array[Double], nPos: Array[Double]): DataFrame = {
    import s.implicits._
    val bRows = for (i <- 0 until numTasks; j <- 0 until numTasks)
      yield ("B", i.toLong, j.toLong, math.rint(bMat(i)(j) * 1e4) / 1e4)
    val ceRows = (0 until numTasks).map(k =>
      ("ce", k.toLong, k.toLong, math.rint(ces(k) * 1e4) / 1e4))
    val posRows = (0 until numTasks).map(k =>
      ("n_pos", k.toLong, k.toLong, nPos(k)))
    (bRows ++ ceRows ++ posRows).toSeq
      .toDF("kind", "src_task", "dst_task", "value")
      .orderBy("kind", "src_task", "dst_task")
  }
}
