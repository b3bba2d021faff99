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
    },

    /** Budgeted frame-sampling PLAN — the scheduling half of video
      * ingestion: a global budget of 200 "frames" is split across the
      * sampled assets proportionally to payload length by
      * largest-remainder (Hamilton) apportionment — pure integer
      * arithmetic, so the plan is bit-deterministic and the oracle
      * recomputes it exactly — then each asset's quota becomes evenly
      * spaced byte offsets with an md5 "frame read" at each (the
      * seek-pattern a real decoder executes). Shapes that matter at
      * 100 TB: apportionment runs on the ASSET-grain row set with NO
      * asset-grain global window (round 10) — only the ≤200 assets that
      * can win a remainder seat pass through a bounded TopKPerGroup
      * heap; plan rows explode map-side from each asset row, and the
      * payload is only ever touched at the planned offsets.
      */
    QueryDef(
      "q343_frame_plan",
      """WITH assets AS (
        |  SELECT doc_id, text, length(text) AS n_bytes
        |  FROM documents WHERE doc_id % 7 = 0),
        |tot AS (SELECT sum(n_bytes) AS w, count(*) AS na FROM assets),
        |quota AS (
        |  SELECT doc_id, text, n_bytes,
        |    CAST(200 * n_bytes // w AS BIGINT) AS base,
        |    200 * n_bytes % w AS rem
        |  FROM assets CROSS JOIN tot),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, doc_id) AS rr,
        |    200 - sum(base) OVER () AS leftover
        |  FROM quota),
        |alloc AS (
        |  SELECT doc_id, text, n_bytes,
        |    base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS q
        |  FROM ranked),
        |plan AS (
        |  SELECT doc_id, n_bytes, q, unnest(range(0, q)) AS frame_idx
        |  FROM alloc WHERE q > 0),
        |reads AS (
        |  SELECT p.doc_id, p.q, p.frame_idx,
        |    CAST(p.frame_idx * p.n_bytes // p.q AS BIGINT) AS byte_offset,
        |    md5(substr(a.text, 1 + CAST(p.frame_idx * p.n_bytes // p.q AS INT), 8)) AS frame_md5
        |  FROM plan p JOIN alloc a ON a.doc_id = p.doc_id)
        |SELECT doc_id, CAST(q AS BIGINT) AS quota, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  byte_offset, frame_md5
        |FROM reads ORDER BY doc_id, frame_idx LIMIT 60""".stripMargin) { (s, d) =>
      val assets = Tables.documents(s, d)
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n_bytes"))
      val tot = assets.agg(sum(col("n_bytes")).as("w"), count(lit(1)).as("na"))
      val quota = graft.PlanCache.cached(s, s"q343_quota|$d") {
        assets.crossJoin(broadcast(tot))
          .select(col("doc_id"), col("text"), col("n_bytes"),
            expr("(200 * n_bytes) div w").as("base"),
            (lit(200L) * col("n_bytes") % col("w")).as("rem"))
      }
      // Largest-remainder tie-break WITHOUT an asset-grain global rank
      // (round 10): leftover = 200 − Σbase is at most 200, so only the
      // top-200 assets by (rem desc, doc_id) can ever receive a +1. The
      // bounded-heap TopKPerGroup cut finds them (B·partitions rows
      // shuffle, never a global sort); ranking the ≤200 survivors is a
      // bounded window; everyone else keeps base. Same integers as the
      // oracle's full-table row_number — rows past rank 200 could never
      // satisfy rr <= leftover.
      val leftDf = quota.agg((lit(200L) - sum(col("base"))).as("leftover"))
      val top = graft.plans.TopKPerGroupOps.topKPerGroup(s, quota
          .select(col("doc_id").as("bdoc"), col("rem"), col("base")),
        Seq.empty, Seq(col("rem").desc, col("bdoc").asc), 200)
        .withColumn("rr", row_number().over(org.apache.spark.sql.expressions
          .Window.orderBy(col("rem").desc, col("bdoc"))))
        .crossJoin(broadcast(leftDf))
        .where(col("rr") <= col("leftover"))
        .select(col("bdoc"))
      val alloc = quota.join(top, col("bdoc") === col("doc_id"), "left")
        .select(col("doc_id"), col("text"), col("n_bytes"),
          (col("base") + when(col("bdoc").isNotNull, 1L).otherwise(0L)).as("q"))
      alloc.where(col("q") > 0)
        .select(col("doc_id"), col("text"), col("n_bytes"), col("q"),
          explode(sequence(lit(0L), col("q") - 1)).as("frame_idx"))
        .select(col("doc_id"), col("q").as("quota"), col("frame_idx"),
          expr("(frame_idx * n_bytes) div q").as("byte_offset"),
          md5(col("text").substr(
            (lit(1L) + expr("(frame_idx * n_bytes) div q")).cast("int"),
            lit(8))).as("frame_md5"))
        .orderBy("doc_id", "frame_idx").limit(60)
    },

    /** REAL image decode (round 12, VERDICT r11 #6 — q85's decoder is a
      * byte-stat stub; this one parses an actual raster format): each
      * sampled asset becomes a byte-valid 24-bpp BMP (header, little-
      * endian fields, bottom-up rows, 4-byte row padding) synthesized by
      * [[graft.functions.BmpCodec.encode]], and the SAME batched
      * mapPartitions kernel shape as q85 runs
      * [[graft.functions.BmpCodec.decode]] — a genuine header parser +
      * pixel walk that reads width/height/bpp/file-size out of the BYTES
      * and accumulates per-channel means from the pixel array (padding
      * skipped, bottom-up order handled). Because the synthetic pixel
      * values are a closed-form function of (doc_id, x, y, channel), the
      * oracle recomputes every output column arithmetically — so a
      * decoder bug (wrong stride, wrong offset, signed-byte slip) is a
      * hash mismatch, not a silent wrong feature. At 100 TB the kernel
      * is embarrassingly parallel: no shuffle before the per-asset
      * feature row, payloads never leave their partition.
      */
    QueryDef(
      "q473_image_decode",
      """WITH assets AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + (doc_id * 3) % 9 AS INT) AS height
        |  FROM documents WHERE doc_id % 7 = 0),
        |g AS (SELECT unnest(range(0, 17)) AS i),
        |px AS (
        |  SELECT a.doc_id, a.width, a.height, gx.i AS x, gy.i AS y
        |  FROM assets a JOIN g gx ON gx.i < a.width JOIN g gy ON gy.i < a.height)
        |SELECT doc_id, width, height, 24 AS bpp,
        |  CAST(54 + height * ((width * 3 + 3) // 4 * 4) AS BIGINT) AS n_bytes,
        |  round(sum((31 * doc_id + 7 * x + 13 * y) % 256) / (width * height), 6) AS mean_b,
        |  round(sum((31 * doc_id + 7 * x + 13 * y + 97) % 256) / (width * height), 6) AS mean_g,
        |  round(sum((31 * doc_id + 7 * x + 13 * y + 194) % 256) / (width * height), 6) AS mean_r
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.functions.BmpCodec
      val ids = Tables.documents(s, d).where(col("doc_id") % 7 === 0)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.grouped(32).flatMap { batch => // batched, like q85: a JNI codec amortizes setup here
          batch.map { docId =>
            val payload = BmpCodec.encode(docId)
            val f = BmpCodec.decode(payload) // every column below comes from the BYTES
            (docId, f.width, f.height, f.bpp, f.nBytes, f.meanB, f.meanG, f.meanR)
          }
        }
      }.toDF("doc_id", "width", "height", "bpp", "n_bytes",
          "mean_b", "mean_g", "mean_r")
        .select(col("doc_id"), col("width"), col("height"), col("bpp"),
          col("n_bytes"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_r"), 6).as("mean_r"))
        .orderBy("doc_id")
    },

    /** COMPRESSED-format image decode (round 12): q473 proved the decode
      * plumbing on an uncompressed raster; this one exercises the full
      * compressed pipeline a production image column actually needs —
      * [[graft.functions.PngCodec]] synthesizes byte-valid truecolor
      * PNGs (chunk framing + CRC-32, zlib-deflated scanlines split
      * across two IDAT chunks, rows cycling through all five predictor
      * filters) and the SAME batched mapPartitions kernel parses them
      * back: signature check, per-chunk CRC verification, IHDR parse,
      * IDAT reassembly, `java.util.zip.Inflater` decompression, and the
      * five-filter unfilter walk (Paeth included). Pixel values are
      * closed-form in (doc_id, x, y, channel), so the oracle recomputes
      * every channel mean arithmetically — a wrong predictor, a missed
      * CRC, or a botched multi-chunk reassembly is a hash mismatch.
      * Compressed SIZE is deliberately not an output column (deflate
      * byte output is zlib-version-dependent); the inflated size
      * `n_raw_bytes` = h·(1+3w) is exact. Same 100 TB shape as q473:
      * embarrassingly parallel, payloads never leave their partition.
      */
    QueryDef(
      "q475_png_decode",
      """WITH assets AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + (doc_id * 5) % 9 AS INT) AS height
        |  FROM documents WHERE doc_id % 7 = 0),
        |g AS (SELECT unnest(range(0, 17)) AS i),
        |px AS (
        |  SELECT a.doc_id, a.width, a.height, gx.i AS x, gy.i AS y
        |  FROM assets a JOIN g gx ON gx.i < a.width JOIN g gy ON gy.i < a.height)
        |SELECT doc_id, width, height, 8 AS bit_depth, 2 AS color_type,
        |  4 AS n_chunks,
        |  CAST(height * (1 + width * 3) AS BIGINT) AS n_raw_bytes,
        |  round(sum((31 * doc_id + 7 * x + 13 * y) % 256) / (width * height), 6) AS mean_r,
        |  round(sum((31 * doc_id + 7 * x + 13 * y + 97) % 256) / (width * height), 6) AS mean_g,
        |  round(sum((31 * doc_id + 7 * x + 13 * y + 194) % 256) / (width * height), 6) AS mean_b
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.functions.PngCodec
      val ids = Tables.documents(s, d).where(col("doc_id") % 7 === 0)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.grouped(32).flatMap { batch => // batched, like q85/q473
          batch.map { docId =>
            val payload = PngCodec.encode(docId)
            val f = PngCodec.decode(payload) // every column below comes from the BYTES
            (docId, f.width, f.height, f.bitDepth, f.colorType, f.nChunks,
              f.nRawBytes, f.meanR, f.meanG, f.meanB)
          }
        }
      }.toDF("doc_id", "width", "height", "bit_depth", "color_type",
          "n_chunks", "n_raw_bytes", "mean_r", "mean_g", "mean_b")
        .select(col("doc_id"), col("width"), col("height"), col("bit_depth"),
          col("color_type"), col("n_chunks"), col("n_raw_bytes"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy("doc_id")
    },

    /** AUDIO decode (round 12): the third modality, same discipline as
      * q473/q475 — [[graft.functions.WavCodec]] synthesizes byte-valid
      * RIFF/WAVE PCM16 assets (canonical fmt chunk, an ancillary LIST
      * chunk ahead of data so the chunk walk is genuinely exercised) and
      * the batched kernel PARSES them: RIFF/WAVE magic validation, sized
      * chunk walk with RIFF word-alignment, fmt parse with loud rejects
      * of non-PCM/stereo/non-16-bit forms, signed-LE sample read, and
      * signal statistics (peak, RMS energy, zero crossings) accumulated
      * from the decoded samples. Sample values are closed-form in
      * (doc_id, t) so the oracle recomputes every statistic exactly
      * (integer energy sums are exact at these magnitudes; RMS rounds
      * the identical double). sample_rate/duration come from the PARSED
      * fmt fields, not the generator. Embarrassingly parallel at 100 TB,
      * like its image siblings.
      */
    QueryDef(
      "q476_wav_decode",
      """WITH assets AS (
        |  SELECT doc_id, CAST(200 + doc_id % 100 AS INT) AS n
        |  FROM documents WHERE doc_id % 7 = 0),
        |g AS (SELECT unnest(range(0, 300)) AS t),
        |s AS (
        |  SELECT a.doc_id, a.n, g.t,
        |    ((31 * a.doc_id + 17 * g.t) % 4001) - 2000 AS v
        |  FROM assets a JOIN g ON g.t < a.n),
        |w AS (
        |  SELECT doc_id, n, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
        |  FROM s)
        |SELECT doc_id, 8000 AS sample_rate, 1 AS channels, 16 AS bits,
        |  CAST(n AS INT) AS n_samples,
        |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(max(abs(v)) AS INT) AS peak,
        |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / n), 6) AS rms,
        |  CAST(count_if(pv IS NOT NULL AND v * pv < 0) AS BIGINT) AS zero_cross
        |FROM w GROUP BY doc_id, n ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.functions.WavCodec
      val ids = Tables.documents(s, d).where(col("doc_id") % 7 === 0)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.grouped(32).flatMap { batch => // batched, like q85/q473/q475
          batch.map { docId =>
            val payload = WavCodec.encode(docId)
            val f = WavCodec.decode(payload) // every column below comes from the BYTES
            (docId, f.sampleRate, f.channels, f.bits, f.nSamples,
              f.durationMs, f.peak, f.rms, f.zeroCross)
          }
        }
      }.toDF("doc_id", "sample_rate", "channels", "bits", "n_samples",
          "duration_ms", "peak", "rms", "zero_cross")
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("bits"), col("n_samples"), col("duration_ms"), col("peak"),
          round(col("rms"), 6).as("rms"), col("zero_cross"))
        .orderBy("doc_id")
    }
  )
}
