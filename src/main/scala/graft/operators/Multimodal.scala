package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.B group 10 "multimodal"):
  * image/audio/video as opaque `binary` columns with typed metadata
  * structs, decode/feature-extract/frame-sample as batched per-partition
  * kernels. The container has no image/audio codecs, so the decode step
  * is a clearly-marked DETERMINISTIC STUB (byte statistics standing in
  * for pixel statistics) — the Spark-side contract that matters at
  * 100 TB is real and tested: binary columns survive parquet round
  * trips, metadata travels in a struct, kernels process partition-local
  * batches, and nothing ever widens the binary into a driver collect.
  *
  * The stand-in bytes are the UTF-8 document text, so every byte-level
  * result is independently computable by the DuckDB oracle through
  * string functions (ASCII ⇒ byte offset == char offset).
  */
object Multimodal {

  val defs: Seq[QueryDef] = Seq(

    /** Binary column + typed metadata + frame sampling: pack text bytes
      * as the payload, derive declared metadata, hash fixed-offset
      * "frames" (the keyframe-sample access pattern) — all on the
      * BinaryType column.
      */
    QueryDef(
      "q84_multimodal_meta",
      """SELECT doc_id,
        |  CAST(16 + doc_id % 64 AS INT) AS width,
        |  CAST(16 + (doc_id * 7) % 64 AS INT) AS height,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  md5(substr(text, 1, 8)) AS frame0_md5,
        |  md5(substr(text, 1 + CAST(floor(length(text)/4) AS INT), 8)) AS frame1_md5,
        |  md5(substr(text, 1 + 2*CAST(floor(length(text)/4) AS INT), 8)) AS frame2_md5
        |FROM documents WHERE doc_id % 7 = 0
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val img = encode(col("text"), "UTF-8") // stand-in image payload
      val q = floor(length(col("payload")) / 4).cast("int")
      Tables.documents(s, d)
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          img.as("payload"),
          struct(
            (lit(16) + col("doc_id") % 64).cast("int").as("width"),
            (lit(16) + (col("doc_id") * 7) % 64).cast("int").as("height"),
            lit(3).as("channels")).as("meta"))
        .select(col("doc_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          md5(substring(col("payload"), 1, 8)).as("frame0_md5"),
          md5(col("payload").substr(lit(1) + q, lit(8))).as("frame1_md5"),
          md5(col("payload").substr(lit(1) + q * 2, lit(8))).as("frame2_md5"))
        .orderBy("doc_id")
    },

    /** Batched decode/feature-extract kernel over the binary payload:
      * partition-local batches of 32 through a STUBBED decoder
      * (`decodeStub`) that emits fixed-shape features — the exact
      * mapPartitions shape a real image decoder (JNI/codec) plugs into.
      * Feature arithmetic is byte-level and integer, so the oracle
      * recomputes it from the text with translate/regexp.
      */
    QueryDef(
      "q85_multimodal_features",
      """WITH f AS (
        |  SELECT source,
        |    length(text) AS n_bytes,
        |    length(text) - length(translate(text, 'aeiou', '')) AS n_vowels,
        |    length(text) - length(replace(text, ' ', '')) AS n_spaces
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(n_vowels) AS BIGINT) AS total_vowels,
        |  CAST(sum(n_spaces) AS BIGINT) AS total_spaces
        |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.documents(s, d)
        .select(col("source"), encode(col("text"), "UTF-8").as("payload"))
        .as[(String, Array[Byte])]
      // STUB decoder: byte statistics in place of pixel decode. A real
      // codec would decode `batch` (e.g. via a native lib) here; the
      // partition/batch shape, schema, and downstream agg are the
      // production plumbing.
      def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
        var vowels = 0L; var spaces = 0L
        var i = 0
        while (i < payload.length) {
          val b = payload(i)
          if (b == 'a' || b == 'e' || b == 'i' || b == 'o' || b == 'u') vowels += 1
          else if (b == ' ') spaces += 1
          i += 1
        }
        (payload.length.toLong, vowels, spaces)
      }
      ds.mapPartitions { it =>
        it.grouped(32).flatMap { batch => // batched: real decoders amortize setup per batch
          batch.map { case (src, payload) =>
            val (nb, nv, nsp) = decodeStub(payload)
            (src, nb, nv, nsp)
          }
        }
      }.toDF("source", "n_bytes", "n_vowels", "n_spaces")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bytes").as("total_bytes"),
          sum("n_vowels").as("total_vowels"),
          sum("n_spaces").as("total_spaces"))
        .orderBy("source")
    }
  )
}
