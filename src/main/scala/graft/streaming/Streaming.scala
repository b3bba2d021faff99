package graft.streaming

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.B group 8). The unified
  * model is the point: the same DataFrame transforms run as a file
  * stream, and for the windowed aggregates the streaming result is
  * hash-verified against the batch/DuckDB answer — streaming == batch on
  * a finite source, which is exactly the contract watermarked
  * aggregation is supposed to keep.
  *
  * Mechanics: the `events` parquet is consumed through
  * `spark.readStream` (file source, explicit schema — TIMESTAMP(NANOS)
  * read as long, rebuilt to micros like the batch path), aggregated with
  * event-time windows + watermark, drained into a memory sink with
  * `processAllAvailable`, and the sink table is returned as the query
  * result. At 100 TB the file source becomes Kafka/object-store
  * listing; nothing in the plan changes.
  */
object Streaming {

  /** Raw parquet schema of events for the file-stream source, matching
    * the dir's physical ts encoding (nanos-as-long pre-round-8, micros
    * TIMESTAMP_NTZ since — [[graft.Tables.eventsTsIsLong]] probes the
    * footer; the streaming source needs the schema up front).
    */
  private[graft] def rawSchema(s: SparkSession, d: String): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts",
      if (graft.Tables.eventsTsIsLong(s, d)) LongType
      else org.apache.spark.sql.types.TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Session-TZ (UTC) micros TimestampType view of the raw `ts` column —
    * the one expression both encodings normalize through. */
  private[graft] def tsAsTimestamp(s: SparkSession, d: String): org.apache.spark.sql.Column =
    if (graft.Tables.eventsTsIsLong(s, d)) timestamp_micros(expr("ts DIV 1000"))
    else col("ts").cast("timestamp")

  /** Epoch-micros long view of the raw `ts` column (q95's state grid). */
  private[graft] def tsAsMicros(s: SparkSession, d: String): org.apache.spark.sql.Column =
    if (graft.Tables.eventsTsIsLong(s, d)) expr("ts DIV 1000")
    else unix_micros(col("ts").cast("timestamp"))

  /** Scratch root for staged stream sources, checkpoints, and sinks:
    * tmpfs when available (the box's block device is burst-throttled —
    * see GraftSession.build), else the sbt target dir.
    */
  private[graft] lazy val ioBase: String = {
    val shm = new java.io.File("/dev/shm/graft-io")
    if (shm.isDirectory || shm.mkdirs()) shm.getAbsolutePath else "target/graft-io"
  }

  /** The file source requires a directory; stage the events parquet into
    * a per-sf scratch dir once (idempotent). `$d/events.parquet` is a
    * single FILE in the driver's testdata but a DIRECTORY of part files
    * from ScaleGen — the round-12 fix: the old single-file Files.copy
    * silently staged an EMPTY directory for the latter, so every
    * streaming query at the sf1/sf10 rungs processed zero micro-batches
    * and Bench recorded the fast failure as a timing. A stage is now
    * only considered valid if it actually contains parquet bytes, so
    * the empty stages of earlier runs self-heal.
    */
  private[graft] def stageDir(d: String): String =
    stageFlat(d, "events.parquet", "events_stream")

  /** Stage `$d/$table` (single file OR ScaleGen part-file directory)
    * FLAT into a per-sf scratch dir — the file-stream source does not
    * recurse, so part files must land in the stage dir itself. A stage
    * is only valid if it actually contains parquet bytes (pre-fix runs
    * staged EMPTY nested dirs for directory-layout sources; those
    * self-heal here).
    */
  private def stageFlat(d: String, table: String, tag: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(s"$ioBase/${d.replaceAll("[^A-Za-z0-9.]", "_")}/$tag")
    def staged: Boolean = Files.isDirectory(dir) && {
      val st = Files.list(dir)
      try st.anyMatch(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      finally st.close()
    }
    if (!staged) {
      Files.createDirectories(dir)
      val src = Paths.get(s"$d/$table")
      if (Files.isDirectory(src)) {
        // drop any empty nested dir a pre-fix run left behind
        val stale = dir.resolve(table)
        if (Files.isDirectory(stale)) {
          val st = Files.walk(stale)
          try st.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
          finally st.close()
        }
        val st = Files.list(src)
        try st.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .forEach(p => Files.copy(p, dir.resolve(p.getFileName.toString),
            StandardCopyOption.REPLACE_EXISTING))
        finally st.close()
      } else Files.copy(src, dir.resolve(table),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  /** File-stream of events with proper event-time column. */
  private[graft] def eventStream(s: SparkSession, d: String): DataFrame =
    s.readStream.schema(rawSchema(s, d)).parquet(stageDir(d))
      .withColumn("ts", tsAsTimestamp(s, d))

  /** Distributed-drain switch (round 15, VERDICT r14 #3): the finite
    * drains collect every emitted row into a driver-side memory sink —
    * right for correctness runs (Verify hashes the rows anyway) but a
    * harness CEILING for scale evidence: q197's sf100 output (~95M
    * session rows) exceeds driver maxResultSize by design, so the one
    * operator family whose 1000× behavior matters most could not be
    * measured. `SPARK_GRAFT_STREAM_DRAIN=parquet` reroutes the drain to
    * a distributed parquet sink (foreachBatch, so update/complete modes
    * keep their memory-sink accumulation semantics: append/update
    * append each batch's emitted rows, complete overwrites) and the
    * readback is a parquet scan — Bench's `.count()` then never ships a
    * row to the driver. Default (driver unset) is bit-identical to the
    * old memory path. */
  private[graft] def drainParquet: Boolean =
    sys.env.get("SPARK_GRAFT_STREAM_DRAIN").contains("parquet")

  private val drainDirs = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  /** Recursive delete for a drain dir (data + checkpoint). Best-effort:
    * a half-deleted leftover is still better than an unbounded leak. */
  private def deleteDrainDir(dir: String): Unit =
    try {
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        val st = java.nio.file.Files.walk(root)
        try st.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => try java.nio.file.Files.delete(p)
                        catch { case _: java.io.IOException => () })
        finally st.close()
      }
      // NonFatal, not just IOException: Files.walk traversal throws
      // UncheckedIOException (a RuntimeException) when an entry vanishes
      // or turns unreadable mid-walk, and a "best-effort" delete that
      // fails the caller's query over a leftover dir is worse than the
      // leak it was cleaning up (ADVICE r16).
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Fresh sink dir for `name` — a retime re-run in the same JVM must
    * not append onto the first run's files. The PREVIOUS run's dir (data
    * + checkpoint) is deleted on replace, and every live dir on JVM
    * exit: at the sf100 rungs this mode exists for (~95M-row outputs) an
    * unbounded per-retime leak fills /tmp mid-rung (ADVICE r15). */
  private def newDrainDir(name: String,
      schema: org.apache.spark.sql.types.StructType): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_drain_$name")
    val prev = drainDirs.put(name, (dir.toString, schema))
    if (prev != null) deleteDrainDir(prev._1)
    dir.toString
  }

  // JVM-exit sweep of whatever dirs are still registered.
  java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() =>
    drainDirs.values.forEach(v => deleteDrainDir(v._1))))

  /** writeStream writer pointed at the selected drain sink. */
  private[graft] def drainWriter(df: DataFrame, name: String, mode: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    if (drainParquet) {
      val dir = newDrainDir(name, df.schema)
      val saveMode = if (mode == "complete") "overwrite" else "append"
      df.writeStream.outputMode(mode)
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode(saveMode).parquet(s"$dir/data")
        }
    } else df.writeStream.format("memory").queryName(name).outputMode(mode)

  /** Read back what the selected drain sink wrote. A stream that ran to
    * completion without emitting a batch leaves no data dir — that (and
    * only that) reads back as an empty frame WITH the query's output
    * schema, so downstream groupBy/select still resolve. Every other
    * failure (half-failed foreachBatch write, disk full, perms)
    * propagates: swallowing it recorded a deceptively fast zero-row
    * "success" in Bench (VERDICT r15 / ADVICE r15). */
  private[graft] def drainTable(s: SparkSession, name: String): DataFrame =
    if (drainParquet) {
      // Option-wrap: ConcurrentHashMap.get returns null when no
      // drainWriter ever registered `name` (readback without a prior
      // start, or a call-site name mismatch) — destructuring null threw
      // an opaque MatchError where a named error pinpoints the bug
      // (ADVICE r16).
      val (dir, schema) = Option(drainDirs.get(name)).getOrElse(
        throw new IllegalStateException(
          s"no drain registered for '$name': drainWriter was never started " +
          "for this query name in this JVM"))
      if (java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(dir, "data")))
        s.read.schema(schema).parquet(s"$dir/data")
      else s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else s.table(name)

  /** Run a finite streaming DF to the drain sink, return the result. */
  private def drain(s: SparkSession, df: DataFrame, name: String,
                    mode: String): DataFrame = {
    val q = withStreamConf(s) {
      drainWriter(df, name, mode).start()
    }
    try {
      q.processAllAvailable()
    } finally q.stop()
    drainTable(s, name)
  }

  /** Stateful streaming operators instantiate one state store per
    * shuffle partition; per micro-batch, 32 partitions just multiplies
    * store open/commit cost over tiny state. Start streaming queries at
    * 8 state partitions. Scoped to `start()` only: Structured Streaming
    * clones the session (and its confs) synchronously at query start,
    * so restoring the outer conf immediately after cannot affect the
    * running query — and batch queries keep the session default.
    */
  def withStreamConf[A](s: SparkSession)(start: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, sys.env.getOrElse("GRAFT_STREAM_PARTITIONS", "8"))
    // State-store backend switch (round 16): the default HDFS-backed
    // provider keeps every store version's key map ON HEAP — right for
    // the correctness runs (tiny state, no native deps in the loop) but
    // a hard ceiling for the big-state operators at the scale rungs:
    // q83's session-window state at sf100 (~95M open sessions as JVM
    // objects) OOMed the executors and died in state-store recovery
    // (CANNOT_LOAD_STATE_STORE, r15 measurement log). On a real cluster
    // data-proportional state lives in RocksDB (off-heap, spillable,
    // incremental checkpoints); `SPARK_GRAFT_STATE_STORE=rocksdb`
    // applies exactly that here for scale-evidence runs. The
    // transformWithState queries pin RocksDB explicitly either way
    // (stateful-v2 contract); default (unset) is bit-identical to the
    // old behavior.
    val pKey = "spark.sql.streaming.stateStore.providerClass"
    val pPrev = s.conf.getOption(pKey)
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").contains("rocksdb"))
      s.conf.set(pKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try start finally {
      s.conf.set(key, prev)
      pPrev match {
        case Some(p) => s.conf.set(pKey, p)
        case None => s.conf.unset(pKey)
      }
    }
  }

  /** Warm the streaming machinery (micro-batch planner, state store
    * provider, streaming codegen paths) on a 5-row stream, so the first
    * real streaming query isn't charged the one-time setup. Called by
    * [[graft.Bench]] before timing.
    */
  def warm(s: SparkSession, d: String): Unit = {
    val dir = stageFlat(d, "region.parquet", "warm_stream")
    val schema = s.read.parquet(s"$d/region.parquet").schema
    val agg = s.readStream.schema(schema).parquet(dir)
      .groupBy(col(schema.head.name)).agg(count(lit(1)).as("n"))
    drain(s, agg, "graft_stream_warm", "complete")
    // also warm the transformWithState/RocksDB path: provider class +
    // native library load and store format validation are one-time JVM
    // costs that otherwise land on the first stateful-v2 query (q109)
    locally {
      import s.implicits._
      val tws = s.readStream.schema(schema).parquet(dir)
        .select(col(schema.head.name).cast("long"), lit(1.0))
        .as[(Long, Double)]
        .groupByKey(_._1)
        .transformWithState(new RunningAggProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("k", "n", "total")
      val key = "spark.sql.streaming.stateStore.providerClass"
      val q = withStreamConf(s) {
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          tws.writeStream.format("memory").queryName("graft_stream_warm_tws")
            .outputMode("update").start()
        } finally prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
      try q.processAllAvailable() finally q.stop()
    }
    ()
  }

  /** Running per-user (count, sum) for q109 via the Spark 4
    * `transformWithState` arbitrary-state API (the successor of the
    * mapGroupsWithState path q88 exercises): explicit named ValueState,
    * update-mode emission per micro-batch.
    */
  private class RunningAggProcessor
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var state: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)]("agg",
        Encoders.product[(Long, Double)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timers: TimerValues): Iterator[(Long, Long, Double)] = {
      var (n, sm) = if (state.exists()) state.get() else (0L, 0.0)
      rows.foreach { case (_, v) => n += 1; sm += v }
      state.update((n, sm))
      Iterator.single((key, n, sm))
    }
  }

  /** Per-user top-3 values through a named ListState plus a ValueState
    * counter (q183): the bounded-collection state shape — a leaderboard,
    * a last-N buffer — that ValueState can't express without packing.
    * Top-3-by-value is a semigroup, so arrival order across micro-batches
    * cannot change the result; the emitted sum goes through
    * decimal(28,8) so it is bit-identical to the oracle's DECIMAL sum.
    */
  private class TopKListProcessor
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var top: ListState[Double] = _
    @transient private var cnt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState[Double]("top3", Encoders.scalaDouble, TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timers: TimerValues): Iterator[(Long, Long, Double)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Double]
      top.get().foreach(buf += _)
      var n = if (cnt.exists()) cnt.get() else 0L
      rows.foreach { case (_, v) => buf += v; n += 1 }
      val best = buf.sorted(Ordering[Double].reverse).take(3).toArray
      top.put(best)
      cnt.update(n)
      val sum = best.map(v => new java.math.BigDecimal(v)
        .setScale(8, java.math.RoundingMode.HALF_UP))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      Iterator.single((key, n, sum.doubleValue()))
    }
  }

  /** Per-(user, event_type) running (count, decimal sum) through a named
    * MapState (q190) — the keyed-sub-aggregate state shape (a counter
    * map, a per-category accumulator) that completes the
    * transformWithState state-type triad next to q109's ValueState and
    * q183's ListState. The full map re-emits each batch (bounded by the
    * type cardinality); per-entry counts are monotone, so max_by picks
    * the final state downstream. Sums accumulate as scale-8 BigDecimals
    * — the exact arithmetic of the oracle's DECIMAL(28,8) cast — so
    * arrival order cannot perturb the emitted double.
    */
  private class PerTypeMapProcessor
      extends StatefulProcessor[Long, (Long, String, Double), (Long, String, Long, Double)] {
    @transient private var m: MapState[String, (Long, BigDecimal)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      m = getHandle.getMapState[String, (Long, BigDecimal)]("perType",
        Encoders.STRING, Encoders.product[(Long, BigDecimal)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Double)],
        timers: TimerValues): Iterator[(Long, String, Long, Double)] = {
      rows.foreach { case (_, t, v) =>
        val (n, sm) = if (m.containsKey(t)) m.getValue(t) else (0L, BigDecimal(0))
        m.updateValue(t, (n + 1,
          sm + BigDecimal(v).setScale(8, scala.math.BigDecimal.RoundingMode.HALF_UP)))
      }
      m.iterator().map { case (t, (n, sm)) => (key, t, n, sm.doubleValue) }
        .toArray.iterator
    }
  }

  /** Event-time TIMER-driven gap sessionizer (q197) — the remaining
    * transformWithState surface after the three state types: sessions
    * close only when a registered event-time timer expires under the
    * watermark, never inline. The open session and the closed-but-
    * unemitted backlog live in named state, guarded by ONE registered
    * timer per key at the earliest pending expiry; when it fires,
    * handleExpiredTimer drains EVERY session whose expiry the timer-
    * eviction watermark has passed and re-arms at the next pending
    * expiry — so the emission rule is the same
    * `lastEvent+gap <= finalWatermark` contract q83's oracle states.
    * Rows inside a micro-batch arrive unordered; the handler sorts the
    * per-user batch before merging (bounded by per-user batch volume).
    *
    * Why one timer per key, not one per session (round 14, VERDICT r13
    * #6 — the sf10 profile): the per-session form registered 9.55M
    * timers on 10M events and its expiry handler used the FIRING
    * timer's own expiry as the cutoff, draining one session per call
    * and clear+rewriting the remaining backlog each time — 303.6M
    * state-row rewrites (quadratic in sessions-per-key), 909 core-
    * seconds of timerProcessingTimeMs, 64.6 s of the 108 s sf10 wall.
    * Draining against the watermark empties the whole eligible backlog
    * in ONE call, and the min-expiry timer makes wakeups O(keys), not
    * O(sessions). Cover invariant: the registered expiry is always ≤
    * the earliest pending session's expiry (handleInputRows only ever
    * lowers it; handleExpiredTimer recomputes it exactly from the kept
    * backlog), so no eligible session can miss its batch. sf10 profile
    * (10M events, 150k users, 9.54M sessions): ingest batch 29.6 → 6.2 s,
    * timer batch 64.6 → 8.6 s, state rows removed 303.6M → 9.68M (the
    * genuine emissions), wall 107.7 → 27.6 s — output identical
    * (hash-verified at sf0.01).
    */
  private class TimerSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var open: ValueState[(Long, Long, Long)] = _
    @transient private var closed: ListState[(Long, Long, Long)] = _
    // expiry (ms) of the key's single registered timer — the min over
    // pending session expiries, maintained to the cover invariant above
    @transient private var nextTimer: ValueState[Long] = _
    private def expiryMs(sess: (Long, Long, Long)): Long =
      (sess._2 + gapUs) / 1000L
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[(Long, Long, Long)]("open",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
      closed = getHandle.getListState[(Long, Long, Long)]("closed",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
      nextTimer = getHandle.getValueState[Long]("nextTimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[(Long, Long, Long)] = {
      val evs = rows.map(_._2).toArray.sorted
      var cur = if (open.exists()) Some(open.get()) else None
      val newClosed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      evs.foreach { ts =>
        cur match {
          case Some((st, last, n)) if ts - last < gapUs =>
            cur = Some((st, math.max(last, ts), n + 1))
          case Some(sess) =>
            newClosed += sess
            cur = Some((ts, ts, 1L))
          case None =>
            cur = Some((ts, ts, 1L))
        }
      }
      // one RocksDB merge for the batch's closures, not one per session
      if (newClosed.nonEmpty) closed.appendList(newClosed.toArray)
      cur.foreach(open.update)
      // desired wakeup = min(existing timer, this batch's new expiries).
      // The existing timer is ≤ every previously-pending expiry (cover
      // invariant), so the min keeps covering the whole backlog; it may
      // run EARLY when the open session extends past it (a no-op wakeup
      // that re-arms exactly), but it can never run late.
      (newClosed.iterator.map(expiryMs) ++ cur.iterator.map(expiryMs))
        .minOption.foreach { desired =>
          if (nextTimer.exists()) {
            val prev = nextTimer.get()
            if (desired < prev) {
              getHandle.deleteTimer(prev)
              getHandle.registerTimer(desired)
              nextTimer.update(desired)
            }
          } else {
            getHandle.registerTimer(desired)
            nextTimer.update(desired)
          }
        }
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
      // Drain against the WATERMARK, not this timer's own expiry: the
      // timer only fires once the eviction watermark has passed it, and
      // every session with expiry ≤ that watermark is already eligible
      // under the q83 emission contract — emitting them now (instead of
      // one per timer) is what collapses the per-expiry backlog rewrite.
      val cutoff = math.max(expired.getExpiryTimeInMs,
        timers.getCurrentWatermarkInMs())
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val keep = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      closed.get().foreach { s =>
        if (expiryMs(s) <= cutoff) out += ((key, s._1, s._3))
        else keep += s
      }
      if (out.nonEmpty) { // a pure no-op wakeup must not rewrite the backlog
        closed.clear()
        if (keep.nonEmpty) closed.put(keep.toArray)
      }
      var openExp: Option[Long] = None
      if (open.exists()) {
        val s = open.get()
        val e = expiryMs(s)
        if (e <= cutoff) {
          out += ((key, s._1, s._3))
          open.clear()
        } else openExp = Some(e)
      }
      // re-arm at the next pending expiry (strictly > cutoff ≥ the
      // eviction watermark, so it cannot re-fire inside this batch);
      // the fired timer itself is removed by the framework
      val desired = (keep.iterator.map(expiryMs) ++ openExp.iterator)
        .minOption
      desired match {
        case Some(d) =>
          getHandle.registerTimer(d)
          nextTimer.update(d)
        case None =>
          nextTimer.clear()
      }
      out.iterator
    }
  }

  val defs: Seq[QueryDef] = Seq(

    /** Arbitrary stateful processing through the transformWithState API
      * (Spark 4's replacement for mapGroupsWithState, group 8 stateful
      * row): named RocksDB-backed ValueState per user, update-mode
      * emission; on the finite source the final state equals the batch
      * group-by, which the oracle asserts. The RocksDB provider is
      * required by the operator and scoped to this query's start.
      */
    QueryDef(
      "q109_transform_with_state",
      """SELECT user_id, count(*) AS n_events, round(sum(value),2) AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val updated = eventStream(s, d)
        .select(col("user_id"), col("value"))
        .as[(Long, Double)]
        .groupByKey(_._1)
        .transformWithState(new RunningAggProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_events", "total_raw")
      val key = "spark.sql.streaming.stateStore.providerClass"
      val q = withStreamConf(s) {
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          drainWriter(updated, "graft_tws", "update").start()
        } finally prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
      try q.processAllAvailable() finally q.stop()
      // update mode emits one row per key per micro-batch that saw input;
      // n_events strictly increases, so max_by picks the final state
      drainTable(s, "graft_tws")
        .groupBy("user_id")
        .agg(max(col("n_events")).as("n_events"),
          round(max_by(col("total_raw"), col("n_events")), 2).as("total"))
        .orderBy("user_id")
    },

    /** Event-time timers through transformWithState (q197): the same
      * 30-minute gap sessions as q83, emitted ONLY by timer expiry
      * under the advancing watermark — on the finite source a session
      * appears iff lastEvent+gap (ms-truncated, the timer clock) ≤ the
      * final watermark, which the oracle states in exact microsecond
      * arithmetic on top of the batch session SQL.
      */
    QueryDef(
      "q197_stream_timer_sessions",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged),
        |agg AS (
        |  SELECT user_id, min(ts) AS start_ts, max(epoch_us(ts)) AS end_us,
        |    count(*) AS n_events
        |  FROM sess GROUP BY user_id, sid)
        |SELECT user_id, strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS session_start, n_events
        |FROM agg
        |WHERE (end_us + 1800000000) // 1000
        |        <= (SELECT max(epoch_us(ts)) // 1000 - 10000 FROM events)
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      import s.implicits._
      val gapUs = 1800000000L // 30 minutes
      val sessions = eventStream(s, d)
        .withWatermark("ts", "10 seconds")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new TimerSessionProcessor(gapUs),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("user_id", "start_us", "n_events")
      val key = "spark.sql.streaming.stateStore.providerClass"
      val q = withStreamConf(s) {
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          drainWriter(sessions, "graft_tws_timers", "append").start()
        } finally prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
      try q.processAllAvailable() finally q.stop()
      drainTable(s, "graft_tws_timers")
        .select(col("user_id"),
          date_format(timestamp_micros(col("start_us")), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    /** MapState through transformWithState (q190): per-user per-type
      * running aggregates in a named RocksDB map — update mode, full-map
      * emission per batch, monotone per-entry counts so max_by selects
      * the final state; on the finite source that equals the batch
      * (user, type) group-by, which is the oracle.
      */
    QueryDef(
      "q190_stream_map_state",
      """SELECT user_id, event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE), 2) AS total
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      import s.implicits._
      val updated = eventStream(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
        .as[(Long, String, Double)]
        .groupByKey(_._1)
        .transformWithState(new PerTypeMapProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "event_type", "n_raw", "total_raw")
      val key = "spark.sql.streaming.stateStore.providerClass"
      val q = withStreamConf(s) {
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          drainWriter(updated, "graft_tws_map", "update").start()
        } finally prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
      try q.processAllAvailable() finally q.stop()
      drainTable(s, "graft_tws_map")
        .groupBy("user_id", "event_type")
        .agg(max(col("n_raw")).as("n"),
          round(max_by(col("total_raw"), col("n_raw")), 2).as("total"))
        .orderBy("user_id", "event_type")
    },

    /** ListState through transformWithState (q183): per-user top-3
      * leaderboard maintained as a named RocksDB list plus a ValueState
      * event counter. Update-mode emission; the counter is strictly
      * increasing so max_by picks the final state, which on the finite
      * source equals the batch window-rank oracle.
      */
    QueryDef(
      "q183_stream_list_state",
      """WITH cnt AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
        |ranked AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events),
        |t3 AS (
        |  SELECT user_id, CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS s
        |  FROM ranked WHERE rn <= 3 GROUP BY user_id)
        |SELECT c.user_id, c.n_events, round(t.s, 2) AS top3
        |FROM cnt c JOIN t3 t ON c.user_id = t.user_id
        |ORDER BY c.user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val updated = eventStream(s, d)
        .select(col("user_id"), col("value"))
        .as[(Long, Double)]
        .groupByKey(_._1)
        .transformWithState(new TopKListProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_events", "top3_raw")
      val key = "spark.sql.streaming.stateStore.providerClass"
      val q = withStreamConf(s) {
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          drainWriter(updated, "graft_tws_list", "update").start()
        } finally prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
      try q.processAllAvailable() finally q.stop()
      drainTable(s, "graft_tws_list")
        .groupBy("user_id")
        .agg(max(col("n_events")).as("n_events"),
          round(max_by(col("top3_raw"), col("n_events")), 2).as("top3"))
        .orderBy("user_id")
    },

    /** Watermarked tumbling-window aggregation (group 8 rows 1-2,4):
      * per-day per-type sums over the event-time stream. Complete mode:
      * on a finite source it must equal the batch group-by — the oracle
      * asserts exactly that.
      */
    QueryDef(
      "q80_stream_tumbling",
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
        |  count(*) AS n, round(sum(value),2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) { (s, d) =>
      val agg = eventStream(s, d)
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      drain(s, agg, "graft_stream_tumbling", "complete")
        .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n"), col("total"))
        .orderBy("day", "event_type")
    },

    /** Streaming dedup + aggregation: dropDuplicates on the entity pair
      * then a complete-mode count — the streaming form of
      * `count(DISTINCT ...)` (group 8 "streaming dedup").
      */
    QueryDef(
      "q81_stream_dedup",
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val agg = eventStream(s, d)
        .select("event_type", "user_id")
        .dropDuplicates("event_type", "user_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"))
      drain(s, agg, "graft_stream_dedup", "complete")
        .orderBy("event_type")
    },

    /** Watermark-bounded streaming dedup — `dropDuplicatesWithinWatermark`,
      * the state-BOUNDED variant of q81's dropDuplicates: dedup state
      * for a key is dropped once the watermark passes its event time +
      * delay, so state is O(keys per window), not O(keys ever seen) —
      * the only dedup that survives an unbounded stream. Delay (40
      * days) exceeds the dataset span here, so the finite-stream result
      * equals a global batch distinct, which is the oracle.
      */
    QueryDef(
      "q172_stream_dedup_watermark",
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val deduped = eventStream(s, d)
        .select(col("event_type"), col("user_id"), col("ts"))
        .withWatermark("ts", "40 days")
        .dropDuplicatesWithinWatermark("event_type", "user_id")
      drain(s, deduped, "graft_stream_dedup_wm", "append")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("event_type")
    },

    /** Gap-based session windows via the native `session_window`
      * operator (batch mode — same operator the streaming engine uses,
      * here hash-verified against the relational lag/cumsum
      * sessionization in DuckDB). Session semantics: merge while
      * gap < 30 min (end-exclusive), matching diff >= 1800s ⇒ new
      * session in the oracle.
      */
    QueryDef(
      "q82_session_window",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      graft.Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    /** DYNAMIC-gap session windows: the gap is an expression of the
      * row (purchases hold a session open 1 h, everything else 15 min)
      * — `session_window(ts, CASE ...)`, the per-event-type engagement
      * model a fixed gap can't express. The oracle states the interval-
      * union semantics directly: a row opens a new session iff its ts
      * is ≥ the running MAX of all previous ends (ts+gap) — with a
      * variable gap the previous EVENT is not necessarily the previous
      * END, so the lag form q82 uses would be wrong here.
      */
    QueryDef(
      "q215_dynamic_session_gap",
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 3600000000 ELSE 900000000 END AS gap_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN max(epoch_us(ts) + gap_us) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |           OR epoch_us(ts) >= max(epoch_us(ts) + gap_us) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM g),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      graft.Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"),
          when(col("event_type") === "purchase", lit("1 hour"))
            .otherwise(lit("15 minutes"))).as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    /** Durable streaming sink: stream → dropDuplicates → parquet file
      * sink with a checkpoint (exactly-once file output, the
      * production sink shape) → batch read-back of the sink directory.
      * No aggregation, so append mode emits every row and the sink
      * contents equal the batch distinct — hash-verified.
      */
    QueryDef(
      "q91_stream_file_sink",
      """SELECT event_type, count(*) AS n, CAST(sum(user_id) AS BIGINT) AS uid_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      import java.nio.file.{Files, Paths}
      import java.util.Comparator
      val base = s"$ioBase/${d.replaceAll("[^A-Za-z0-9.]", "_")}/stream_sink"
      // clean slate: the checkpoint binds to one logical plan instance
      val p = Paths.get(base)
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.delete(f))
      val q = withStreamConf(s) {
        eventStream(s, d)
          .dropDuplicates("event_id")
          .select("event_id", "event_type", "user_id")
          .writeStream.format("parquet")
          .option("path", s"$base/data")
          .option("checkpointLocation", s"$base/chk")
          .outputMode("append").start()
      }
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(s"$base/data")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("user_id")).cast("long").as("uid_sum"))
        .orderBy("event_type")
    },

    /** Custom stateful sessionizer via flatMapGroupsWithState: per-key
      * logic emits CLOSED sessions (gap >= 30 min) and keeps the open
      * session in GroupState. Run over the batch source the operator
      * semantics become "every session except each user's last" —
      * which the oracle states relationally, so the custom state
      * machine is hash-verified.
      */
    QueryDef(
      "q97_flatmap_sessions",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged),
        |agg AS (
        |  SELECT user_id, sid, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |    count(*) AS n_events, max(sid) OVER (PARTITION BY user_id) AS max_sid
        |  FROM sess GROUP BY user_id, sid)
        |SELECT user_id, session_start, n_events FROM agg
        |WHERE sid < max_sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val closed = graft.Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("usec"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[Seq[Long], (Long, Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          case (uid, rows, state: GroupState[Seq[Long]]) =>
            // state (unused in batch: always empty) would carry the open
            // session's (start, lastSeen, n) across micro-batches
            val times = rows.map(_._2).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            var start = times(0); var last = times(0); var n = 1L
            var i = 1
            while (i < times.length) {
              if (times(i) - last >= 1800000000L) { // gap >= 30 min → close
                out += ((uid, start, n))
                start = times(i); n = 0L
              }
              last = times(i); n += 1
              i += 1
            }
            state.update(Seq(start, last, n)) // open session stays in state
            out.iterator
        }
        .toDF("user_id", "start_usec", "n_events")
      closed
        .select(col("user_id"),
          date_format(timestamp_micros(col("start_usec")), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    /** Stream-stream inner join (group 8, the classic funnel query):
      * click stream ⋈ purchase stream on user with a 10-minute
      * event-time range bound. Both sides watermarked, so join state is
      * evicted once the watermark passes the range — the bounded-state
      * contract that makes the join runnable forever at 100 TB. On the
      * finite source the appended matches equal the batch theta join,
      * which the oracle states (µs-truncated on both engines: the
      * parquet carries nanos, Spark event time is micros).
      */
    QueryDef(
      "q123_stream_stream_join",
      """SELECT c.user_id, count(*) AS n_pairs, round(sum(p.value),2) AS total
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) - epoch_us(c.ts) < 600000000
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin) { (s, d) =>
      val clicks = eventStream(s, d)
        .where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = eventStream(s, d)
        .where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
        .withWatermark("p_ts", "1 hour")
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") + expr("INTERVAL 10 MINUTES"))
      // append the raw matches, then aggregate the sink table in batch
      // (a second stateful agg above the join would gate on watermark)
      drain(s, joined, "graft_ss_join", "append")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"), round(sum(col("value")), 2).as("total"))
        .orderBy("user_id")
    },

    /** LEFT OUTER stream-stream join — q123's interval join plus the
      * outer half: clicks with no purchase inside [c_ts, c_ts+10min)
      * emit null-extended ONCE their match window is fully below the
      * final watermark (state eviction). The oracle states that
      * emission rule relationally, like q83's session rule: global
      * watermark = min over both streams of (max event time − 1h);
      * an unmatched click emits iff c_ts + 10min < watermark. Matched
      * pairs emit unconditionally, so only the unmatched tail is
      * watermark-gated.
      */
    QueryDef(
      "q171_stream_left_join",
      """WITH c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, ts AS p_ts, value FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least(
        |    (SELECT max(ts) FROM events WHERE event_type = 'click'),
        |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
        |    - INTERVAL 1 HOUR AS w),
        |matched AS (
        |  SELECT c.user_id, p.value
        |  FROM c JOIN p ON p.p_user = c.user_id
        |   AND epoch_us(p.p_ts) >= epoch_us(c.c_ts)
        |   AND epoch_us(p.p_ts) - epoch_us(c.c_ts) < 600000000),
        |expired_unmatched AS (
        |  SELECT c.user_id FROM c, wm
        |  WHERE NOT EXISTS (
        |      SELECT 1 FROM p WHERE p.p_user = c.user_id
        |        AND epoch_us(p.p_ts) >= epoch_us(c.c_ts)
        |        AND epoch_us(p.p_ts) - epoch_us(c.c_ts) < 600000000)
        |    AND epoch_us(c.c_ts) + 600000000 < epoch_us(wm.w)),
        |m AS (SELECT user_id, count(*) AS n_pairs, round(sum(value), 2) AS total
        |      FROM matched GROUP BY user_id),
        |u AS (SELECT user_id, count(*) AS n_unmatched FROM expired_unmatched GROUP BY user_id)
        |SELECT coalesce(m.user_id, u.user_id) AS user_id,
        |  CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  coalesce(m.total, 0.0) AS total,
        |  CAST(coalesce(u.n_unmatched, 0) AS BIGINT) AS n_unmatched
        |FROM m FULL OUTER JOIN u ON m.user_id = u.user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val clicks = eventStream(s, d)
        .where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = eventStream(s, d)
        .where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
        .withWatermark("p_ts", "1 hour")
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") + expr("INTERVAL 10 MINUTES"),
        "left_outer")
      drain(s, joined, "graft_ss_left_join", "append")
        .groupBy("user_id")
        .agg(count(col("p_user")).as("n_pairs"),
          round(coalesce(sum(col("value")), lit(0.0)), 2).as("total"),
          count_if(col("p_user").isNull).as("n_unmatched"))
        .where(col("n_pairs") > 0 || col("n_unmatched") > 0)
        .orderBy("user_id")
    },

    /** Stream-static join (group 8): the event stream enriched against
      * the static customer dimension — planned as a broadcast hash join
      * inside every micro-batch (no state, no shuffle of the stream) —
      * then a complete-mode rollup per market segment.
      */
    QueryDef(
      "q124_stream_static_join",
      """SELECT c_mktsegment, count(*) AS n, round(sum(value),2) AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val dim = graft.Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val agg = eventStream(s, d)
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      drain(s, agg, "graft_stream_static", "complete")
        .orderBy("c_mktsegment")
    },

    /** Sliding (overlapping) event-time windows — 2-day width, 1-day
      * slide, so every event contributes to exactly two windows (the
      * smoothing form of the tumbling grid q80 pins). Oracle explodes
      * the two candidate window starts per row; both engines align
      * window origins to the epoch midnight.
      */
    QueryDef(
      "q134_sliding_window",
      """SELECT strftime(ws, '%Y-%m-%d') AS w_start, count(*) AS n,
        |  round(sum(value),2) AS total
        |FROM (
        |  SELECT unnest([date_trunc('day', ts) - INTERVAL 1 DAY,
        |                 date_trunc('day', ts)]) AS ws, value
        |  FROM events) t
        |GROUP BY ws ORDER BY w_start""".stripMargin) { (s, d) =>
      val agg = eventStream(s, d)
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      drain(s, agg, "graft_stream_sliding", "complete")
        .select(date_format(col("w.start"), "yyyy-MM-dd").as("w_start"),
          col("n"), col("total"))
        .orderBy("w_start")
    },

    /** Streaming session windows (watermark + append): the same
      * session_window over the file stream. Append mode only emits
      * sessions closed before the final watermark, so the tail session
      * per user is withheld — semantically correct streaming behavior.
      * On a finite source that emission rule IS relational: a session
      * appears iff lastEvent + gap <= finalWatermark (= max event time
      * − 10 s), which the oracle states on top of q82's session SQL —
      * so even the watermark semantics are hash-verified.
      */
    QueryDef(
      "q83_stream_sessionize",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged),
        |agg AS (
        |  SELECT user_id, min(ts) AS start_ts, max(epoch_us(ts)) AS end_us,
        |    count(*) AS n_events
        |  FROM sess GROUP BY user_id, sid)
        |SELECT user_id, strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS session_start, n_events
        |FROM agg
        |WHERE end_us + 1800000000 <= (SELECT max(epoch_us(ts)) - 10000000 FROM events)
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      val agg = eventStream(s, d)
        .withWatermark("ts", "10 seconds")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
      drain(s, agg, "graft_stream_sessions", "append")
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    /** q215's dynamic per-row gap on a STREAM under watermark+append:
      * a session emits once the watermark passes its end, where the
      * end of a variable-gap session is max(ts+gap) over its members
      * (NOT lastEvent+constant) — the oracle states exactly that
      * interval-union + eviction rule relationally, so the streaming
      * engine's dynamic-gap merge AND watermark semantics both
      * hash-verify against the batch form.
      */
    QueryDef(
      "q216_stream_dynamic_sessions",
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 3600000000 ELSE 900000000 END AS gap_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts, event_id, gap_us,
        |    CASE WHEN max(epoch_us(ts) + gap_us) OVER w1 IS NULL
        |           OR epoch_us(ts) >= max(epoch_us(ts) + gap_us) OVER w1
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM g WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |sess AS (
        |  SELECT user_id, ts, gap_us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged),
        |agg AS (
        |  SELECT user_id, min(ts) AS start_ts,
        |    max(epoch_us(ts) + gap_us) AS end_us, count(*) AS n_events
        |  FROM sess GROUP BY user_id, sid)
        |SELECT user_id, strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS session_start,
        |  n_events
        |FROM agg
        |WHERE end_us <= (SELECT max(epoch_us(ts)) - 10000000 FROM events)
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      val agg = eventStream(s, d)
        .withWatermark("ts", "10 seconds")
        .groupBy(col("user_id"), session_window(col("ts"),
          when(col("event_type") === "purchase", lit("1 hour"))
            .otherwise(lit("15 minutes"))).as("sw"))
        .agg(count(lit(1)).as("n_events"))
      drain(s, agg, "graft_stream_dyn_sessions", "append")
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    /** The causal daily grid maintained INCREMENTALLY (round 7): the
      * exact (element, day-index, exact-decimal daily mean) grid that
      * q229/q230/q233 analyze, produced by a watermarked streaming
      * aggregation instead of a batch scan — so the correlogram/
      * Granger/changepoint layer can refresh per micro-batch at the
      * cost of one day-window state row per (element, day). Decimal
      * sums and counts are the streaming state (both merge exactly);
      * the mean is derived at emit. Finite stream ⇒ equals the batch
      * grid, which is the oracle — the same determinism contract as
      * every other streaming==batch pin.
      */
    QueryDef(
      "q240_stream_causal_grid",
      """SELECT event_type AS el,
        |  datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) / count(*), 6) AS v
        |FROM events GROUP BY 1, 2 ORDER BY el, di""".stripMargin) { (s, d) =>
      val agg = eventStream(s, d)
        .withWatermark("ts", "40 days")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type").as("el"))
        .agg(sum(col("value").cast("decimal(18,3)")).as("sv"),
          count(lit(1)).as("n"))
      drain(s, agg, "graft_stream_causal_grid", "complete")
        .select(col("el"),
          datediff(col("w.start").cast("date"), lit("2024-01-01").cast("date"))
            .as("di"),
          round(col("sv").cast("double") / col("n"), 6).as("v"))
        .orderBy("el", "di")
    },

    /** The causal READOUT maintained incrementally (round 8, VERDICT
      * #3): q240 keeps the (element, day) grid under streaming; this
      * query closes the loop by recomputing q229's full lead-lag
      * correlogram INSIDE foreachBatch on every micro-batch — the
      * refreshable causality readout that is the reference's whole
      * point (`model.py:296-310` re-dumps B every 500 iterations,
      * here: re-derived per arriving micro-batch). Scale split: the
      * fact-table work is the incremental watermarked aggregation
      * (decimal-sum + count state per (element, day) — exact, merge-
      * order-free); the correlogram recompute runs on the O(P·T)
      * aggregated grid only, so its per-batch cost is independent of
      * raw event volume. On the finite stream the last refresh has
      * seen every event, and because the per-batch readout calls the
      * SAME [[graft.operators.CausalOps.leadLagFromGrid]] expression
      * tree over bit-identical grid values, the final result hash-
      * matches the batch q229 oracle exactly (streaming == batch, the
      * suite's standing contract).
      */
    QueryDef(
      "q249_stream_leadlag",
      graft.operators.CausalOps.defs.find(_.name == "q229_lead_lag_corr").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d, grid =>
        graft.operators.CausalOps.leadLagFromGrid(s, grid),
        Seq("src", "dst", "lag"), guardAs = Some("q249_stream_leadlag"))
    },

    /** q230's Granger-lite as a per-micro-batch refreshed view (round
      * 8): same [[causalRefresh]] harness as q249 — the incrementally
      * maintained grid feeds the full closed-form two-regressor OLS on
      * every micro-batch, so the "does src's lag improve the AR(1) fit
      * of dst" readout is live. Final refresh == batch q230 oracle,
      * bit-for-bit (shared grangerFromGrid tree over exact decimal
      * grid state).
      */
    QueryDef(
      "q256_stream_granger",
      graft.operators.CausalOps.defs.find(_.name == "q230_granger_lite").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.CausalOps.grangerFromGrid, Seq("src", "dst"),
        guardAs = Some("q256_stream_granger"))
    },

    /** q248's market-adjusted partial correlation as a per-micro-batch
      * refreshed view (round 8): the confound-controlled pair readout
      * updates live from the same grid state. Final refresh == batch
      * q248 oracle, bit-for-bit.
      */
    QueryDef(
      "q257_stream_partial_corr",
      graft.operators.CausalOps.defs.find(_.name == "q248_partial_corr").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.CausalOps.partialCorrFromGrid, Seq("src", "dst"),
        guardAs = Some("q257_stream_partial_corr"))
    },

    /** q233's CUSUM changepoint as a per-micro-batch refreshed view
      * (round 8): completes the live causal dashboard — which element
      * leads (q249), does its lag improve prediction (q256), is the
      * link confounded (q257), and WHEN did each element's behavior
      * shift (this). Final refresh == batch q233 oracle, bit-for-bit.
      */
    QueryDef(
      "q258_stream_cusum",
      graft.operators.CausalOps.defs.find(_.name == "q233_cusum_changepoint").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.CausalOps.cusumFromGrid, Seq("el"))
    },

    /** q423's Page–Hinkley drift detector as a per-micro-batch
      * refreshed view (round 22): the SEQUENTIAL change test — running-
      * mean deviations, running-min excursion, live alarm ledger — is
      * exactly the readout that belongs on a stream; it re-derives per
      * arriving micro-batch from the same maintained (el, day) grid as
      * q258's retrospective CUSUM. Final refresh == batch q423 oracle,
      * bit-for-bit (shared pageHinkleyFromGrid tree over exact decimal
      * grid state).
      */
    QueryDef(
      "q425_stream_page_hinkley",
      graft.operators.Round22Ops.pageHinkleySql) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.Round22Ops.pageHinkleyFromGrid, Seq("el"))
    },

    /** q469's lead-time profile as a per-micro-batch refreshed view
      * (round 31): the live "src leads dst by k days" table — the
      * argmax-lag cross-correlation re-derived per arriving micro-batch
      * from the same maintained (el, day) grid. Final refresh == batch
      * q469 oracle, bit-for-bit (shared leadTimeFromGrid tree).
      */
    QueryDef(
      "q472_stream_lead_time",
      graft.operators.Round30Ops.leadTimeSql) { (s, d) =>
      causalRefresh(s, d,
        g => graft.operators.Round30Ops.leadTimeFromGrid(s, g),
        Seq("src", "dst"), guardAs = Some("q472_stream_lead_time"))
    },

    /** q452's consensus causal scoreboard as a per-micro-batch
      * refreshed view (round 29): the LIVE "which element causes
      * which" edge table — four independent lead tests (Bartlett z,
      * Granger gain, rank-Granger gain, circular-shift surrogate p)
      * with votes, re-derived per arriving micro-batch from the same
      * maintained (el, day) grid. Final refresh == batch q452 oracle,
      * bit-for-bit (shared consensusFromGrid tree).
      */
    QueryDef(
      "q467_stream_consensus",
      graft.operators.Round27Ops.consensusSql) { (s, d) =>
      causalRefresh(s, d,
        g => graft.operators.Round27Ops.consensusFromGrid(s, g),
        Seq("src", "dst"), guardAs = Some("q467_stream_consensus"))
    },

    /** q434's Inclán–Tiao variance-changepoint as a per-micro-batch
      * refreshed view (round 24): the live "did the volatility regime
      * just break" readout next to q258's mean-shift CUSUM, re-derived
      * per arriving micro-batch from the same maintained (el, day)
      * grid. Final refresh == batch q434 oracle, bit-for-bit (shared
      * inclanFromGrid tree).
      */
    QueryDef(
      "q439_stream_inclan",
      graft.operators.Round24Ops.inclanSql) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.Round24Ops.inclanFromGrid, Seq("el"))
    },

    /** q427's Welch-averaged coherence as a per-micro-batch refreshed
      * view (round 23): the live "are these two elements still coupled
      * at the weekly cycle" readout, re-derived per arriving micro-
      * batch from the same maintained (el, day) grid. Final refresh ==
      * batch q427 oracle, bit-for-bit (shared coherenceFromGrid tree).
      */
    QueryDef(
      "q433_stream_coherence",
      graft.operators.Round23Ops.coherenceSql) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.Round23Ops.coherenceFromGrid, Seq("eli", "elj", "period"))
    },

    /** q263's spectral seasonality readout as a per-micro-batch
      * refreshed view (round 8): the live causal dashboard also answers
      * "is the weekly/biweekly/monthly cycle still there" as events
      * arrive — same [[causalRefresh]] harness, per-refresh cost
      * O(P·T·3) independent of raw volume. Final refresh == batch q263
      * oracle, bit-for-bit (shared periodogramFromGrid tree).
      */
    QueryDef(
      "q267_stream_periodogram",
      graft.operators.CausalOps.defs.find(_.name == "q263_periodogram").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.CausalOps.periodogramFromGrid, Seq("el", "period"))
    },

    /** q269's forecast backtest as a per-micro-batch refreshed view
      * (round 8): forecast skill is monitored live — as events arrive
      * the naive/seasonal-naive MASE/sMAPE readout re-evaluates over the
      * maintained grid, so a regime change (q258's CUSUM firing) shows
      * up as decaying forecastability in the same dashboard. Final
      * refresh == batch q269 oracle, bit-for-bit (shared
      * backtestFromGrid tree).
      */
    QueryDef(
      "q270_stream_backtest",
      graft.operators.CausalOps.defs.find(_.name == "q269_forecast_backtest").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.CausalOps.backtestFromGrid, Seq("el"))
    },

    /** q314's Engle-Granger cointegration test as a per-micro-batch
      * refreshed view (round 11): the live dashboard's spurious-
      * causality guard — as events arrive, the screen, the OLS fit and
      * the residual Dickey-Fuller t re-derive from the incrementally
      * maintained grid, so a pair whose "causal" link is drifting
      * apart (df_t rising toward 0) is flagged before the correlation
      * panels mislead. Same [[causalRefresh]] harness: per-refresh
      * cost O(P·T + survivors·T) independent of raw event volume;
      * final refresh == batch q314 oracle bit-for-bit (shared
      * cointFromGrid tree over exact decimal grid state).
      */
    QueryDef(
      "q324_stream_coint",
      graft.operators.CointOps.defs.find(_.name == "q314_cointegration").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d,
        g => graft.operators.CointOps.cointFromGrid(s, g), Seq("src", "dst"))
    },

    /** q315's pre-whitened cross-correlogram as a per-micro-batch
      * refreshed view (round 11): the dashboard's autocorrelation-
      * inflation monitor — each refresh re-fits the AR(1) filters and
      * re-correlates at lags 0-3 from the maintained grid, so the gap
      * between rho_raw and rho_prew (how much of the apparent coupling
      * is persistence artifact) tracks live. Final refresh == batch
      * q315 oracle bit-for-bit (shared prewhitenFromGrid tree).
      */
    QueryDef(
      "q328_stream_prewhiten",
      graft.operators.CointOps.defs.find(_.name == "q315_prewhiten_xcorr").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d,
        g => graft.operators.CointOps.prewhitenFromGrid(s, g), Seq("src", "dst", "lag"))
    },

    /** q316's permutation entropy as a per-micro-batch refreshed view
      * (round 11): the live "how predictable is this element at all"
      * calibration — ordinal-pattern counts re-derive from the grid
      * state each refresh, so a regime change shows as an entropy jump
      * in the same dashboard that q258's CUSUM dates. Final refresh ==
      * batch q316 oracle bit-for-bit (shared permEntropyFromGrid tree;
      * pattern counts are integer-exact under the count-state merge).
      */
    QueryDef(
      "q329_stream_perm_entropy",
      graft.operators.CointOps.defs.find(_.name == "q316_perm_entropy").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.CointOps.permEntropyFromGrid, Seq("el"))
    },

    /** CONSOLIDATED live causal panel (round 9, VERDICT r8 #6): the TEN
      * grid-state readouts above (lead-lag, Granger, partial corr,
      * CUSUM, periodogram, backtest, cointegration, pre-whitened xcorr,
      * permutation entropy, conformal intervals) evaluated from ONE
      * watermarked streaming aggregation inside ONE foreachBatch — the
      * production shape of the live dashboard. Run as ten independent
      * queries (q249/q256/q257/q258/q263b…), each pays its own
      * micro-batch planner, state store, and full event re-read for
      * IDENTICAL grid maintenance; here that cost is paid once and the
      * readouts differ only in the O(P·T)-grid expression trees they
      * re-derive per refresh. Output is the melted
      * (readout, key, metric, value) long form — one schema for every
      * panel cell, the shape a dashboard sink actually ingests — and
      * each readout's final refresh hash-matches its BATCH oracle
      * bit-for-bit (the composed oracle is literally the ten batch
      * oracles melted and unioned; the engine rows come from the same
      * shared FromGrid trees over the same exact decimal grid state).
      * The per-readout registry drives both sides, so the engine and
      * oracle can never disagree about what the panel contains.
      */
    QueryDef("q357_stream_causal_panel", panelOracle) { (s, d) =>
      val readouts = panelReadouts
      val agg = eventStream(s, d)
        .withWatermark("ts", "40 days")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type").as("el"))
        .agg(sum(col("value").cast("decimal(18,3)")).as("sv"),
          count(lit(1)).as("n"))
      val latest = new java.util.concurrent.atomic.AtomicReference[
        Seq[(String, String, String, Option[Double])]]()
      val q = withStreamConf(s) {
        agg.writeStream.outputMode("complete")
          .foreachBatch { (b: DataFrame, _: Long) =>
            // Materialize the O(P·T) grid ONCE from the state store and
            // RE-ROOT it in the outer session (round 17; replaces the
            // round-10 persist, which solved the ten-state-store-reads
            // problem but kept every readout on the stream's cloned
            // session where MicroBatchExecution force-disables AQE —
            // see causalRefresh). Bounded collect (P fenced, T the day
            // window); same rows ⇒ bit-identical readouts, now with
            // runtime join re-planning and partition coalescing.
            val proj = b.select(col("el"),
              datediff(col("w.start").cast("date"), lit("2024-01-01").cast("date"))
                .as("di"),
              (col("sv").cast("double") / col("n")).as("v"))
            val grid = s.createDataFrame(
              java.util.Arrays.asList(proj.collect(): _*), proj.schema)
            // three of the panel's readouts (leadlag/granger/pcorr) are
            // pair-grain — same element-cardinality fence as their batch
            // twins, checked once per refresh over the cached grid
            graft.operators.CausalOps.guardFullEnum(grid, "q357_stream_causal_panel")
            // Fan the ten readout collects out over a small thread pool
            // (round 17, guide §2.6 "overlap independent jobs"): each
            // readout is an independent expression tree over the SAME
            // persisted grid (materialized by the guard's action just
            // above), and the driver loop ran them strictly
            // sequentially — the panel's wall time was the SUM of ten
            // tree latencies while the executors sat mostly idle
            // between stages. Spark's scheduler runs concurrent jobs
            // FIFO, so later readouts back-fill the tail of earlier
            // ones. Result order is preserved (one Future per readout,
            // joined in registry order) and each readout's rows are
            // untouched, so the melted output is row-identical to the
            // sequential loop's.
            val pool = java.util.concurrent.Executors.newFixedThreadPool(
              math.min(readouts.size, 5))
            implicit val ec: scala.concurrent.ExecutionContext =
              scala.concurrent.ExecutionContext.fromExecutorService(pool)
            val collected =
              try scala.concurrent.Await.result(
                scala.concurrent.Future.sequence(readouts.map(r =>
                  scala.concurrent.Future((r, r.fn(s, grid).collect())))),
                scala.concurrent.duration.Duration.Inf)
              finally pool.shutdown()
            val melted = collected.flatMap { case (r, rows) =>
              rows.toSeq.flatMap { row =>
                val k = r.ids.map(c => String.valueOf(row.getAs[Any](c))).mkString("|")
                r.metrics.map { m =>
                  // numeric types only, matched EXPLICITLY (round-9
                  // ADVICE): a future non-numeric registry metric must
                  // fail with a named error at registration time, not as
                  // a NumberFormatException crashing the streaming query
                  val v: Option[Double] = row.getAs[Any](m) match {
                    case null => None
                    case bd: java.math.BigDecimal => Some(bd.doubleValue)
                    case bd: scala.math.BigDecimal => Some(bd.toDouble)
                    case n: java.lang.Number => Some(n.doubleValue)
                    case x => throw new IllegalStateException(
                      s"q357 panel readout '${r.tag}' metric '$m' has " +
                        s"non-numeric type ${x.getClass.getName}; panel " +
                        "metrics must be numeric (melted to DOUBLE)")
                  }
                  (r.tag, k, m, v)
                }
              }
            }
            latest.set(melted)
          }.start()
      }
      try q.processAllAvailable() finally q.stop()
      import s.implicits._
      latest.get().toDF("readout", "k", "metric", "v")
        .orderBy("readout", "k", "metric")
    },

    /** q286's split-conformal forecast intervals as a per-micro-batch
      * refreshed view (round 9): the live dashboard's honest-
      * uncertainty panel — as events arrive, the calibration order
      * statistic and test-period coverage re-derive from the
      * incrementally maintained grid, so interval WIDTH (q̂) widening
      * is observable the moment forecastability degrades (the same
      * regime change q258's CUSUM flags). Same [[causalRefresh]]
      * harness; per-refresh cost O(P·T) independent of raw volume;
      * final refresh == batch q286 oracle bit-for-bit (shared
      * conformalFromGrid tree over exact decimal grid state).
      */
    QueryDef(
      "q291_stream_conformal",
      graft.operators.DriftOps.defs.find(_.name == "q286_conformal_forecast").get
        .oracle.get) { (s, d) =>
      causalRefresh(s, d,
        graft.operators.DriftOps.conformalFromGrid, Seq("el"))
    },

    /** q281's PSI/JSD drift monitor maintained incrementally (round
      * 10): the production drift shape — bin boundaries are PINNED
      * up front from the reference period (the training snapshot,
      * computed once from the static table and broadcast into the
      * stream), then ONE watermarked streaming aggregation maintains
      * per-(type, bin, period) counts as events arrive and every
      * micro-batch re-derives the PSI/JSD readout from those O(types·
      * 10·2) count rows via the exact expression tree the batch query
      * uses ([[graft.operators.DriftOps.psiFromCounts]]). Count state
      * merges are exact, so on the finite stream the final refresh
      * hash-matches the batch q281 oracle bit-for-bit — streaming ==
      * batch, the suite's standing contract. Per-refresh cost is
      * independent of raw event volume.
      */
    /** q333's Wasserstein-1 drift distance as a per-micro-batch
      * refreshed view (round 11): the same pinned-boundary streaming
      * count state as q310 (ONE watermarked (type, bin, period)
      * aggregation), re-derived each refresh through the shared
      * w1FromCounts tree — so the live drift panel reads PSI/JSD AND
      * the cumulative, signed W1 from the same O(types·20) state rows.
      * Final refresh == batch q333 oracle bit-for-bit (count-state
      * merges are exact).
      */
    QueryDef(
      "q339_stream_wasserstein",
      graft.operators.DriftOps.defs.find(_.name == "q333_wasserstein").get
        .oracle.get) { (s, d) =>
      import graft.operators.DriftOps
      val qs = DriftOps.refDeciles(s, d)
      val typed = eventStream(s, d)
        .withWatermark("ts", "40 days")
        .select(col("event_type").as("et"), col("value").as("v"),
          (col("ts") < lit("2024-01-16").cast("timestamp")).as("is_ref"))
      val binned = typed.join(broadcast(qs), col("et") === col("qet"))
        .select(col("et"), col("is_ref"),
          (lit(1) + (1 to 9).map(k =>
            when(round(col("v"), 9) > round(col(s"q$k"), 9), 1).otherwise(0))
            .reduce(_ + _)).as("bin"))
      val agg = binned.groupBy("et", "bin", "is_ref").agg(count(lit(1)).as("n"))
      val latest = new java.util.concurrent.atomic.AtomicReference[
        (org.apache.spark.sql.types.StructType, Array[org.apache.spark.sql.Row])]()
      val q = withStreamConf(s) {
        agg.writeStream.outputMode("complete")
          .foreachBatch { (b: DataFrame, _: Long) =>
            // re-root the O(types·bins·2) count state in the outer
            // session (round 17, the causalRefresh rule): foreachBatch
            // frames run on the stream clone with AQE force-disabled
            val local = s.createDataFrame(
              java.util.Arrays.asList(b.collect(): _*), b.schema)
            val c = local.groupBy("et", "bin")
              .agg(sum(when(col("is_ref"), col("n")).otherwise(0L)).as("nr"),
                sum(when(!col("is_ref"), col("n")).otherwise(0L)).as("nc"))
            val r = DriftOps.w1FromCounts(s, c)
            latest.set((r.schema, r.collect()))
          }.start()
      }
      try q.processAllAvailable() finally q.stop()
      val (schema, rows) = latest.get()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .orderBy("event_type")
    },

    /** q345's retrain trigger evaluated LIVE (round 11): the decision
      * layer on the same pinned-boundary count state as q310/q339 —
      * every micro-batch re-derives PSI, W1 and the signed shift and
      * re-evaluates the alerting policy, so "this type's model needs
      * retraining" flips in the dashboard the moment the thresholds
      * are crossed. Final refresh == batch q345 oracle bit-for-bit.
      */
    QueryDef(
      "q347_stream_retrain",
      graft.operators.DriftOps.defs.find(_.name == "q345_retrain_trigger").get
        .oracle.get) { (s, d) =>
      import graft.operators.DriftOps
      val qs = DriftOps.refDeciles(s, d)
      val typed = eventStream(s, d)
        .withWatermark("ts", "40 days")
        .select(col("event_type").as("et"), col("value").as("v"),
          (col("ts") < lit("2024-01-16").cast("timestamp")).as("is_ref"))
      val binned = typed.join(broadcast(qs), col("et") === col("qet"))
        .select(col("et"), col("is_ref"),
          (lit(1) + (1 to 9).map(k =>
            when(round(col("v"), 9) > round(col(s"q$k"), 9), 1).otherwise(0))
            .reduce(_ + _)).as("bin"))
      val agg = binned.groupBy("et", "bin", "is_ref").agg(count(lit(1)).as("n"))
      val latest = new java.util.concurrent.atomic.AtomicReference[
        (org.apache.spark.sql.types.StructType, Array[org.apache.spark.sql.Row])]()
      val q = withStreamConf(s) {
        agg.writeStream.outputMode("complete")
          .foreachBatch { (b: DataFrame, _: Long) =>
            // re-root the O(types·bins·2) count state in the outer
            // session (round 17, the causalRefresh rule): foreachBatch
            // frames run on the stream clone with AQE force-disabled
            val local = s.createDataFrame(
              java.util.Arrays.asList(b.collect(): _*), b.schema)
            val c = local.groupBy("et", "bin")
              .agg(sum(when(col("is_ref"), col("n")).otherwise(0L)).as("nr"),
                sum(when(!col("is_ref"), col("n")).otherwise(0L)).as("nc"))
            val psi = DriftOps.psiFromCounts(c)
              .select(col("event_type").as("pet"), col("psi"))
            val r = DriftOps.w1FromCounts(s, c)
              .join(psi, col("pet") === col("event_type"))
              .select(col("event_type"), col("psi"), col("w1_bins"), col("signed_shift"),
                (col("psi") > 0.2 || col("w1_bins") > 0.5 ||
                  abs(col("signed_shift")) > 0.3).cast("int").as("retrain"))
            latest.set((r.schema, r.collect()))
          }.start()
      }
      try q.processAllAvailable() finally q.stop()
      val (schema, rows) = latest.get()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .orderBy("event_type")
    },

    QueryDef(
      "q310_stream_psi",
      graft.operators.DriftOps.defs.find(_.name == "q281_psi_drift").get
        .oracle.get) { (s, d) =>
      import graft.operators.DriftOps
      val qs = DriftOps.refDeciles(s, d)
      val typed = eventStream(s, d)
        .withWatermark("ts", "40 days")
        .select(col("event_type").as("et"), col("value").as("v"),
          (col("ts") < lit("2024-01-16").cast("timestamp")).as("is_ref"))
      val binned = typed.join(broadcast(qs), col("et") === col("qet"))
        .select(col("et"), col("is_ref"),
          (lit(1) + (1 to 9).map(k =>
            when(round(col("v"), 9) > round(col(s"q$k"), 9), 1).otherwise(0))
            .reduce(_ + _)).as("bin"))
      val agg = binned.groupBy("et", "bin", "is_ref").agg(count(lit(1)).as("n"))
      val latest = new java.util.concurrent.atomic.AtomicReference[
        (org.apache.spark.sql.types.StructType, Array[org.apache.spark.sql.Row])]()
      val q = withStreamConf(s) {
        agg.writeStream.outputMode("complete")
          .foreachBatch { (b: DataFrame, _: Long) =>
            // re-root the O(types·bins·2) count state in the outer
            // session (round 17, the causalRefresh rule): foreachBatch
            // frames run on the stream clone with AQE force-disabled
            val local = s.createDataFrame(
              java.util.Arrays.asList(b.collect(): _*), b.schema)
            val c = local.groupBy("et", "bin")
              .agg(sum(when(col("is_ref"), col("n")).otherwise(0L)).as("nr"),
                sum(when(!col("is_ref"), col("n")).otherwise(0L)).as("nc"))
            val r = DriftOps.psiFromCounts(c)
            latest.set((r.schema, r.collect()))
          }.start()
      }
      try q.processAllAvailable() finally q.stop()
      val (schema, rows) = latest.get()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .orderBy("event_type")
    },

    /** STREAMING MEDIA INGESTION (round 12): the production shape for
      * multimodal columns — assets arrive on a file stream, a typed
      * per-partition kernel decodes them (the REAL WAV parser of q476,
      * not a stub), and a stateful per-source aggregate maintains the
      * corpus signal profile. State is O(sources): the decode itself is
      * stateless map work, so the stream scales with input rate, not
      * history. Corpus-level RMS is exact — the kernel emits the exact
      * integer Σv² per asset and the aggregate combines energies, so
      * streaming == batch to the last bit and the finite-source result
      * equals the batch SQL the oracle runs (complete mode: the final
      * micro-batch's table IS the full aggregate).
      */
    QueryDef(
      "q478_stream_wav_ingest",
      """WITH assets AS (
        |  SELECT doc_id, source, CAST(200 + doc_id % 100 AS INT) AS n
        |  FROM documents WHERE doc_id % 7 = 0),
        |g AS (SELECT unnest(range(0, 300)) AS t),
        |s AS (
        |  SELECT a.doc_id, a.source, a.n, g.t,
        |    ((31 * a.doc_id + 17 * g.t) % 4001) - 2000 AS v
        |  FROM assets a JOIN g ON g.t < a.n),
        |w AS (
        |  SELECT doc_id, source, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
        |  FROM s)
        |SELECT source,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_assets,
        |  CAST(count(*) AS BIGINT) AS total_samples,
        |  CAST(max(abs(v)) AS INT) AS peak,
        |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)), 6) AS rms_all,
        |  CAST(count_if(pv IS NOT NULL AND v * pv < 0) AS BIGINT) AS zero_cross
        |FROM w GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.functions.WavCodec
      val docSchema = graft.Tables.documents(s, d).schema
      val decoded = s.readStream.schema(docSchema)
        .parquet(stageFlat(d, "documents.parquet", "docs_stream"))
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.grouped(32).flatMap { batch => // batched, like q85/q473/q476
            batch.map { case (docId, src) =>
              val f = WavCodec.decode(WavCodec.encode(docId))
              (src, f.nSamples.toLong, f.peak, f.energy, f.zeroCross)
            }
          }
        }.toDF("source", "n_samples", "peak", "energy", "zero_cross")
      val agg = decoded.groupBy("source").agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_samples")).as("total_samples"),
        max(col("peak")).as("peak"),
        round(sqrt(sum(col("energy")).cast("double") /
          sum(col("n_samples"))), 6).as("rms_all"),
        sum(col("zero_cross")).as("zero_cross"))
      drain(s, agg, "graft_wav_ingest", "complete")
        .orderBy("source")
    }
  )

  /** One row of the q357 panel's readout registry: the streaming tag,
    * the batch query whose oracle (and expression tree) it reuses, its
    * id columns, its numeric metric columns, and the shared FromGrid
    * function. Drives BOTH the engine-side melt and the composed
    * DuckDB oracle, so the two can never list different metrics.
    */
  private final case class PanelReadout(tag: String, batch: String,
      ids: Seq[String], metrics: Seq[String],
      fn: (SparkSession, DataFrame) => DataFrame)

  private def panelReadouts: Seq[PanelReadout] = {
    val c = graft.operators.CausalOps
    val ci = graft.operators.CointOps
    Seq(
      PanelReadout("backtest", "q269_forecast_backtest", Seq("el"),
        Seq("n_eval", "mae_naive", "mae_snaive", "mase", "smape"),
        (_, g) => c.backtestFromGrid(g)),
      PanelReadout("coint", "q314_cointegration", Seq("src", "dst"),
        Seq("n_common", "beta", "gamma", "df_t", "cointegrated"),
        (s, g) => ci.cointFromGrid(s, g)),
      PanelReadout("conformal", "q286_conformal_forecast", Seq("el"),
        Seq("n_cal", "n_test", "qhat", "coverage"),
        (_, g) => graft.operators.DriftOps.conformalFromGrid(g)),
      PanelReadout("cusum", "q233_cusum_changepoint", Seq("el"),
        Seq("cp_di", "cusum_max", "mean_shift"),
        (_, g) => c.cusumFromGrid(g)),
      PanelReadout("granger", "q230_granger_lite", Seq("src", "dst"),
        Seq("n_days", "ar1_r2", "granger_gain"),
        (_, g) => c.grangerFromGrid(g)),
      PanelReadout("leadlag", "q229_lead_lag_corr", Seq("src", "dst", "lag"),
        Seq("n_days", "xcorr"),
        (s, g) => c.leadLagFromGrid(s, g)),
      PanelReadout("pcorr", "q248_partial_corr", Seq("src", "dst"),
        Seq("n_days", "r_raw", "r_partial", "confound_drop"),
        (_, g) => c.partialCorrFromGrid(g)),
      PanelReadout("pentropy", "q316_perm_entropy", Seq("el"),
        Seq("n_triples", "n_patterns", "perm_entropy"),
        (_, g) => ci.permEntropyFromGrid(g)),
      PanelReadout("period", "q263_periodogram", Seq("el", "period"),
        Seq("n_days", "power"),
        (_, g) => c.periodogramFromGrid(g)),
      PanelReadout("prewhiten", "q315_prewhiten_xcorr", Seq("src", "dst", "lag"),
        Seq("n_common", "phi", "rho_raw", "rho_prew", "attenuated"),
        (s, g) => ci.prewhitenFromGrid(s, g)))
  }

  /** q357's oracle: each readout's BATCH oracle wrapped once as a CTE,
    * melted to (readout, k, metric, v) arms, unioned. concat_ws and the
    * int→string casts agree between engines; CAST(... AS DOUBLE) is
    * exact for the BIGINT/INTEGER metrics.
    */
  private def panelOracle: String = {
    def oracleOf(batch: String): String =
      (graft.operators.CausalOps.defs ++ graft.operators.CointOps.defs ++
        graft.operators.DriftOps.defs)
        .find(_.name == batch)
        .getOrElse(sys.error(s"panel readout cites unknown batch query $batch"))
        .oracle.getOrElse(sys.error(s"$batch has no oracle"))
    val ctes = panelReadouts
      .map(r => s"r_${r.tag} AS (\n${oracleOf(r.batch)})").mkString(",\n")
    val arms = for (r <- panelReadouts; m <- r.metrics) yield
      s"""SELECT '${r.tag}' AS readout, concat_ws('|', ${r.ids.mkString(", ")}) AS k,
         |  '$m' AS metric, CAST($m AS DOUBLE) AS v FROM r_${r.tag}""".stripMargin
    s"""WITH $ctes
       |SELECT readout, k, metric, v FROM (
       |${arms.mkString("\nUNION ALL\n")})
       |ORDER BY readout, k, metric""".stripMargin
  }

  /** Shared harness for the per-micro-batch causal readouts (q249/
    * q256/q257): ONE watermarked streaming aggregation maintains the
    * (element, day) grid as exact decimal-sum + count state; on every
    * micro-batch the given readout recomputes over the O(P·T) grid
    * only — per-refresh cost independent of raw event volume — and the
    * last refresh is returned. Because the grid values are exact
    * (decimal merges are order-free) and each readout shares its batch
    * query's expression tree, the final result hash-matches the batch
    * oracle with zero tolerance (StreamingSpec pins it for q249; the
    * same state/tree argument covers all three).
    */
  private def causalRefresh(s: SparkSession, d: String,
      readout: DataFrame => DataFrame, sortCols: Seq[String],
      guardAs: Option[String] = None): DataFrame = {
    val agg = eventStream(s, d)
      .withWatermark("ts", "40 days")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type").as("el"))
      .agg(sum(col("value").cast("decimal(18,3)")).as("sv"),
        count(lit(1)).as("n"))
    val latest = new java.util.concurrent.atomic.AtomicReference[
      (org.apache.spark.sql.types.StructType, Array[org.apache.spark.sql.Row])]()
    val q = withStreamConf(s) {
      agg.writeStream.outputMode("complete")
        .foreachBatch { (b: DataFrame, _: Long) =>
          // Materialize the O(P·T) grid ONCE from the state store, then
          // RE-ROOT it in the outer session (round 17): foreachBatch
          // frames belong to the stream's cloned session, whose AQE is
          // force-disabled by MicroBatchExecution ("AQE is not
          // supported in stateful workloads") — so the whole readout
          // tree used to run with no runtime join re-planning and no
          // partition coalescing at the static stream partition count.
          // The grid is contractually bounded (P fenced by
          // guardFullEnum, T the day window), so the one collect here
          // is the same bounded-artifact class as the readout's own
          // collect below; rebuilt as a local relation on the outer
          // session, the readout runs with AQE on. Same rows, same
          // types ⇒ bit-identical readout. (Replaces the round-10
          // persist, which solved the re-read problem but kept the
          // readout on the AQE-less clone.)
          val proj = b.select(col("el"),
            datediff(col("w.start").cast("date"), lit("2024-01-01").cast("date"))
              .as("di"),
            (col("sv").cast("double") / col("n")).as("v"))
          val rows = proj.collect()
          val grid = s.createDataFrame(
            java.util.Arrays.asList(rows: _*), proj.schema)
          // pair-grain readouts (O(P²) or worse per refresh) carry the
          // SAME element-cardinality fence their batch twins enforce —
          // without it a high-cardinality domain hits the quadratic
          // blowup silently on the streaming path (r11 advice)
          guardAs.foreach(n => graft.operators.CausalOps.guardFullEnum(grid, n))
          val r = readout(grid)
          // O(P²) rows — the per-batch refreshed artifact
          latest.set((r.schema, r.collect()))
        }.start()
    }
    try q.processAllAvailable() finally q.stop()
    val (schema, rows) = latest.get()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .orderBy(sortCols.map(col): _*)
  }
}
