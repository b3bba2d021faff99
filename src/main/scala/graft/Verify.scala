package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Box-health fields in every artifact (VERDICT r16 #8): correctness
    // is timing-insensitive, but recording steal/latency alongside each
    // run makes later epoch forensics (the round-15/16 regression hunt)
    // one grep instead of a session.
    def procStat(): Array[Long] =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().next().split("\\s+").drop(1).map(_.toLong)
        finally src.close()
      } catch { case _: Throwable => Array.empty[Long] }
    val statStart = procStat()
    val wallStart = System.nanoTime()
    val spark = GraftSession.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated name filter for focused local iteration
    // (like Bench's SPARK_GRAFT_BENCH_ONLY); the driver leaves it unset.
    val only = SparkEntry.nameFilter("SPARK_GRAFT_VERIFY_ONLY")
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        SchemaLint.check(name, df) // driver-hash-unsafe types fail loudly
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // drop any STALE output from a previous run into this outDir —
        // otherwise the checker would hash the old parquet and report a
        // now-broken query green (exactly what the lint must prevent)
        val dir = Paths.get(s"$outDir/$name")
        if (Files.exists(dir)) {
          val st = Files.walk(dir)
          try st.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
          finally st.close()
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val stealPct = {
      val statEnd = procStat()
      if (statStart.length >= 8 && statEnd.length >= 8) {
        val d = statEnd.zip(statStart).map { case (b, a) => b - a }
        val tot = d.sum.toDouble
        if (tot > 0) 100.0 * d(7) / tot else -1.0
      } else -1.0
    }
    val wallSec = (System.nanoTime() - wallStart) / 1e9
    Files.writeString(Paths.get(s"$outDir/box_health.json"),
      f"""{"steal_pct":$stealPct%.3f,"wall_sec":$wallSec%.1f}""")
    spark.stop()
  }
}
