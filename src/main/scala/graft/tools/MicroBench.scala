package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-benchmarks for operator-internals decisions in the
  * optimization rounds (tokenizer expression form, scan-starved
  * repartition, ...). Each case times a full pass with a non-prunable
  * aggregate over the result. Prints name, reps, min seconds.
  *
  * Usage: runMain graft.tools.MicroBench [sfDir] [reps]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val s = GraftSession.build("micro-bench")
    s.range(1000).selectExpr("sum(id)").collect()

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.agg(sum(length(col("w"))).as("x")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"MICRO $name min=${ts.min}%.3f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = Tables.documents(s, d).select(col("text"))
    val docsPar = Tables.documents(s, d).select(col("text")).repartition(32)
    docsPar.count()

    def hofWords(c: org.apache.spark.sql.Column) =
      filter(split(c, " "), w => w =!= "")
    def regexWords(c: org.apache.spark.sql.Column) = {
      val t = trim(c)
      when(t === "", array().cast("array<string>")).otherwise(split(t, " +"))
    }

    time("tok_hof_1task")(docs.select(explode(hofWords(col("text"))).as("w")))
    time("tok_regex_1task")(docs.select(explode(regexWords(col("text"))).as("w")))
    time("tok_hof_32task")(docsPar.select(explode(hofWords(col("text"))).as("w")))
    time("tok_regex_32task")(docsPar.select(explode(regexWords(col("text"))).as("w")))
    // plain split with no empty-filter, as the floor
    time("tok_split_32task")(docsPar.select(explode(split(col("text"), " ")).as("w")))

    // per-call spark.read.parquet resolution cost (driver-side footer
    // read + listing) — paid once per Tables.load call, i.e. 1-4 times
    // per query across the 477-query suite
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 50) { Tables.lineitem(s, d).schema; i += 1 }
      println(f"MICRO read_parquet_resolve_x50 rep=$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val t1 = System.nanoTime()
      i = 0
      val cached = Tables.lineitem(s, d)
      while (i < 50) { cached.select(col("l_orderkey")).schema; i += 1 }
      println(f"MICRO reuse_relation_x50   rep=$rep ${(System.nanoTime() - t1) / 1e9}%.3f s")
    }
    s.stop()
  }
}
