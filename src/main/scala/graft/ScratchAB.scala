package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

// Scratch A/B probe (deleted before commit): pre-round-15 global-distinct
// forms of q225/q71 vs the current in-bucket kernels, alternating twice
// in one JVM (shared page cache; PlanCache cleared between timings).
object ScratchAB {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val which = if (args.length > 1) args(1) else "both"
    val s = GraftSession.build("scratch-ab")
    for (t <- Seq("documents")) s.read.parquet(s"$d/$t.parquet").count()
    def words(c: org.apache.spark.sql.Column) = graft.functions.Text.wordsCol(c)

    def old225() = {
      graft.functions.SortedIntersectCount.register(s)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), array_distinct(words(col("text"))).as("wset"))
      val tokArr = docs.select(col("doc_id"),
        array_sort(transform(col("wset"), w => xxhash64(w))).as("ws"))
      val mh = docs.select(col("doc_id"), explode(col("wset")).as("w"))
        .groupBy("doc_id")
        .agg(
          min(conv(substring(md5(concat(col("w"), lit("#0"))), 1, 15), 16, 10)
            .cast("long")).as("mh0"),
          (1 until 8).map(si =>
            min(conv(substring(md5(concat(col("w"), lit(s"#$si"))), 1, 15), 16, 10)
              .cast("long")).as(s"mh$si")): _*)
      val bandStructs = (0 until 4).map { b =>
        struct(lit(b).as("band"),
          concat(col(s"mh${2 * b}").cast("string"), lit("_"),
            col(s"mh${2 * b + 1}").cast("string")).as("key"))
      }
      val bands = mh.select(col("doc_id"),
          explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
        .withColumn("bn", count(lit(1)).over(
          Window.partitionBy(col("band"), col("key"))))
        .where(col("bn") <= 64)
        .drop("bn")
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      cand
        .join(tokArr.select(col("doc_id").as("a_id"), col("ws").as("aw")), "a_id")
        .join(tokArr.select(col("doc_id").as("b_id"), col("ws").as("bw")), "b_id")
        .select(col("a_id"), col("b_id"),
          expr("sorted_intersect_count(aw, bw)").cast("double").as("inter"),
          size(col("aw")).as("na"), size(col("bw")).as("nb"))
        .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
        .where(col("j") >= 0.5)
        .select(col("a_id"), col("b_id"), round(col("j"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    }

    def old71() = {
      graft.functions.SortedIntersectCount.register(s)
      val w = words(col("text"))
      val shingles = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => array_join(slice(w, i, lit(2)), " ")))
        .otherwise(array(array_join(w, " ")))
      val repW = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      val numBands = 3
      val rowsPerBand = 2
      val sigCols = (0 until numBands).map { b =>
        val rows = (0 until rowsPerBand).map { r =>
          val i = b * rowsPerBand + r
          array_min(transform(col("shingles"), x => xxhash64(lit(i), x)))
        }
        xxhash64(rows: _*).as(s"sig$b")
      }
      val docs = Tables.documents(s, d)
        .withColumn("h", sha2(col("text"), 256))
        .withColumn("rn", row_number().over(repW))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("source"), array_distinct(shingles).as("shingles"))
      val signed = graft.PlanCache.cached(s, s"lsh_signed_OLD|$d") {
        docs.select(
          (Seq(col("doc_id"), col("source"),
            array_sort(transform(col("shingles"), x => xxhash64(lit(-1), x))).as("sh64"))
            ++ sigCols): _*)
      }
      val banded = signed.select(col("doc_id"), col("source"),
        size(col("sh64")).as("nsh"),
        posexplode(array((0 until numBands).map(b => col(s"sig$b")): _*))
          .as(Seq("band", "sig")))
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
            && col("a.doc_id") < col("b.doc_id")
            && col("a.nsh") * 4 <= col("b.nsh") * 5
            && col("b.nsh") * 4 <= col("a.nsh") * 5)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          col("a.source").as("source"))
        .dropDuplicates("a_id", "b_id")
      val verified = cand
        .join(signed.select(col("doc_id").as("a_id"), col("sh64").as("aw")), "a_id")
        .join(signed.select(col("doc_id").as("b_id"), col("sh64").as("bw")), "b_id")
        .select(col("source"),
          expr("sorted_intersect_count(aw, bw)").cast("double").as("inter"),
          size(col("aw")).as("na"), size(col("bw")).as("nb"))
        .withColumn("jaccard_dist",
          lit(1.0) - col("inter") / (col("na") + col("nb") - col("inter")))
        .where(col("jaccard_dist") <= 0.2)
      verified.groupBy("source")
        .agg(count(lit(1)).as("n_candidate_pairs"),
          round(min(col("jaccard_dist")), 6).as("min_dist"))
        .orderBy("source")
    }

    def timeIt(label: String)(fn: () => org.apache.spark.sql.DataFrame): Unit = {
      val before = PlanCache.keys
      val t0 = System.nanoTime()
      val n = fn().count()
      val dt = (System.nanoTime() - t0) / 1e9
      PlanCache.drop(PlanCache.keys -- before)
      println(f"ABPROBE $label%-10s $dt%8.2f s  rows=$n")
    }

    for (round <- 1 to 2) {
      if (which == "both" || which == "q225") {
        timeIt(s"old225/$round")(() => old225())
        timeIt(s"new225/$round")(() =>
          SparkEntry.queries("q225_lsh_candidate_pairs")(s, d))
      }
      if (which == "both" || which == "q71") {
        timeIt(s"old71/$round")(() => old71())
        timeIt(s"new71/$round")(() =>
          SparkEntry.queries("q71_minhash_lsh")(s, d))
      }
    }
    s.stop()
  }
}
