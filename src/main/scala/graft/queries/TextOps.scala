package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language-ID heuristic,
  * quality scoring, token counting, document fingerprinting, and the
  * binary-column (multimodal) metadata path.
  *
  * All row-level — embarrassingly parallel, no shuffle except the final
  * small rollups; exactly the shape that streams through 100 TB of text.
  * Only engine-portable string ops are used (replace-count instead of
  * engine-specific tokenizers), so every op is oracle-checkable.
  */
object TextOps extends QueryModule {

  def defs: Seq[QueryDef] = Seq(langId, qualityScore, tokenCount, fingerprint,
    corpusFilter, textClean, mmBinaryMeta, mmDecodePipeline)

  /** Decoded media metadata row (the typed output of the decode stage). */
  case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long, w: Long, h: Long)

  /** Output of the REAL decode stage: dimensions and the raster pixel sum
    * read back from the decoded image, not from the generator. */
  case class MediaDecoded(doc_id: Long, kind: String, w: Long, h: Long, px_sum: Long)

  /** Occurrence count of literal `pat` inside column `c` (both engines:
    * length-difference / pattern-length). */
  private def occExpr(c: String, pat: String): String =
    s"(length($c) - length(replace($c, '$pat', ''))) / ${pat.length}"

  /** Language-ID by marker-token frequency (n-gram heuristic): pick the
    * marker class with the highest occurrence count in the padded text;
    * compare against the labeled lang → confusion-matrix counts. */
  private val langId = QueryDef(
    "t_langid",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        .withColumn("s_the", expr(occExpr("padded", " the ")))
        .withColumn("s_data", expr(occExpr("padded", " data ")))
        .withColumn("s_query", expr(occExpr("padded", " query ")))
        .withColumn("pred",
          when(col("s_the") >= col("s_data") && col("s_the") >= col("s_query"), "m_the")
            .when(col("s_data") >= col("s_query"), "m_data")
            .otherwise("m_query"))
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    },
    Some {
      val (sThe, sData, sQuery) =
        (occExpr("padded", " the "), occExpr("padded", " data "), occExpr("padded", " query "))
      s"""SELECT lang, CASE
          WHEN $sThe >= $sData AND $sThe >= $sQuery THEN 'm_the'
          WHEN $sData >= $sQuery THEN 'm_data'
          ELSE 'm_query' END AS pred,
        COUNT(*) AS n
        FROM (SELECT lang, ' ' || text || ' ' AS padded FROM documents)
        GROUP BY 1, 2 ORDER BY 1, 2"""
    })

  /** Quality scoring: length, stopword ratio, mean word length → composite
    * score. Pure integer-derived arithmetic → bit-exact across engines. */
  private val qualityScore = QueryDef(
    "t_quality_score",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
        .withColumn("n_stop", expr(occExpr("padded", " the ")) +
          expr(occExpr("padded", " a ")) + expr(occExpr("padded", " of ")))
        .select(col("doc_id"), col("n_words"),
          ((length(col("text")) - (col("n_words") - 1)).cast("double") / col("n_words"))
            .as("mean_word_len"),
          (col("n_stop").cast("double") / col("n_words")).as("stop_ratio"),
          (col("n_words").cast("double") / lit(100.0)
            + col("n_stop").cast("double") / col("n_words") * lit(2.0)).as("quality"))
        .orderBy("doc_id")
    },
    Some {
      val nStop = s"(${occExpr("padded", " the ")} + ${occExpr("padded", " a ")} + ${occExpr("padded", " of ")})"
      s"""SELECT doc_id, n_words,
        CAST(length(text) - (n_words - 1) AS DOUBLE) / n_words AS mean_word_len,
        CAST($nStop AS DOUBLE) / n_words AS stop_ratio,
        CAST(n_words AS DOUBLE) / 100.0 + CAST($nStop AS DOUBLE) / n_words * 2.0 AS quality
        FROM (SELECT doc_id, text, ' ' || text || ' ' AS padded,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
              FROM documents)
        ORDER BY doc_id"""
    })

  /** Token counting: whitespace tokens + a regex token class (the BPE-ish
    * pre-tokenizer pattern), rolled up per source. */
  private val tokenCount = QueryDef(
    "t_token_count",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("n_ws", size(split(col("text"), " ")).cast("long"))
        .withColumn("n_re", expr("size(regexp_extract_all(text, '[a-z]+', 0))").cast("long"))
        .withColumn("n_long", expr("size(regexp_extract_all(text, '[a-z]{5,}', 0))").cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_ws")).as("sum_ws_tokens"),
          sum(col("n_re")).as("sum_re_tokens"), sum(col("n_long")).as("sum_long_tokens"))
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens,
      CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS sum_re_tokens,
      CAST(SUM(len(regexp_extract_all(text, '[a-z]{5,}'))) AS BIGINT) AS sum_long_tokens
      FROM documents GROUP BY 1 ORDER BY 1"""))

  /** Document fingerprinting: md5 over the sorted distinct word set (word-
    * order-insensitive near-dup detector); fingerprint clusters reported. */
  private val fingerprint = QueryDef(
    "t_fingerprint",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("fp", md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
        .filter(col("n_docs") > 1)
        .orderBy("fp")
    },
    Some("""SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
      FROM (SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
            FROM documents)
      GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1"""))

  /** The corpus FILTER pass a training-data run executes in one scan:
    * language-ID, quality score, and token bounds evaluated per document,
    * drop reasons assigned in priority order (lang → quality → length) so
    * every document lands in exactly one bucket, rolled up per source.
    * One row-level pass, no joins — the shape that streams 100 TB.
    * Thresholds sit inside the fixture's distribution (lang splits
    * 213/287, quality 0.45 ≈ p25, word bounds clip both tails) so all
    * three drop arms are live. */
  private val corpusFilter = QueryDef(
    "t_corpus_filter",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
        .withColumn("s_the", expr(occExpr("padded", " the ")))
        .withColumn("s_data", expr(occExpr("padded", " data ")))
        .withColumn("s_query", expr(occExpr("padded", " query ")))
        .withColumn("n_stop", expr(occExpr("padded", " the ")) +
          expr(occExpr("padded", " a ")) + expr(occExpr("padded", " of ")))
        .withColumn("quality", col("n_words").cast("double") / lit(100.0)
          + col("n_stop").cast("double") / col("n_words") * lit(2.0))
        .withColumn("verdict",
          when(!(col("s_the") >= col("s_data") && col("s_the") >= col("s_query")),
            "drop_lang")
            .when(col("quality") < 0.45, "drop_quality")
            .when(col("n_words") < 20 || col("n_words") > 90, "drop_len")
            .otherwise("keep"))
      d.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("verdict") === "keep", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("verdict") === "drop_lang", 1L).otherwise(0L)).as("n_drop_lang"),
        sum(when(col("verdict") === "drop_quality", 1L).otherwise(0L)).as("n_drop_quality"),
        sum(when(col("verdict") === "drop_len", 1L).otherwise(0L)).as("n_drop_len"),
        sum(when(col("verdict") === "keep", col("n_words")).otherwise(0L)).as("sum_kept_tokens"))
        .orderBy("source")
    },
    Some {
      val (sThe, sData, sQuery) =
        (occExpr("padded", " the "), occExpr("padded", " data "), occExpr("padded", " query "))
      val nStop = s"(${occExpr("padded", " the ")} + ${occExpr("padded", " a ")} + ${occExpr("padded", " of ")})"
      s"""SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN verdict = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN verdict = 'drop_lang' THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_lang,
        CAST(SUM(CASE WHEN verdict = 'drop_quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_quality,
        CAST(SUM(CASE WHEN verdict = 'drop_len' THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_len,
        CAST(SUM(CASE WHEN verdict = 'keep' THEN n_words ELSE 0 END) AS BIGINT) AS sum_kept_tokens
        FROM (
          SELECT source, n_words,
            CASE WHEN NOT ($sThe >= $sData AND $sThe >= $sQuery) THEN 'drop_lang'
                 WHEN CAST(n_words AS DOUBLE) / 100.0e0
                      + CAST($nStop AS DOUBLE) / n_words * 2.0e0 < 0.45e0 THEN 'drop_quality'
                 WHEN n_words < 20 OR n_words > 90 THEN 'drop_len'
                 ELSE 'keep' END AS verdict
          FROM (SELECT source, ' ' || text || ' ' AS padded,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
                FROM documents))
        GROUP BY 1 ORDER BY 1"""
    })

  /** Multimodal plumbing: opaque BINARY payloads carrying a magic-byte
    * header (PNG/GIF magics, alternating per doc) + typed metadata sniffed
    * from the first bytes — the cheap sniff-only pass that runs BEFORE any
    * codec (real decode lives in `mm_decode_pipeline` below). Both engines
    * compare the header in the hex-string domain (DuckDB has no BLOB
    * substring overload). */
  /** Text CLEANING — the normalization pass upstream of every dedup/
    * quality stage: URL stripping, markup-tag removal, whitespace
    * collapse, case folding. The fixture corpus is synthetic-clean, so the
    * dirt is INJECTED deterministically (spam URL + doubled spaces on
    * doc_id%3==0, a void markup tail on doc_id%2==0, upper-cased noise),
    * then the cleaning pipeline — three regexp_replace passes + lower +
    * trim, all codegen'd builtins — must reproduce the closed-form
    * expected text byte-for-byte (`n_roundtrip_ok`). The regexes are in
    * the Java∩RE2 common dialect so both engines execute the SAME
    * patterns; DuckDB gets the 'g' flag (its default is first-match). */
  private val textClean = QueryDef(
    "t_text_clean",
    (s, dir) => {
      val dirty = Tables.documents(s, dir)
        .withColumn("dirty", concat(
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("VISIT http://spam.example/"),
              md5(col("doc_id").cast("string")), lit(" NOW  ")))
            .otherwise(lit("")),
          col("text"),
          when(pmod(col("doc_id"), lit(2)) === 0, " <br/><hr/>").otherwise("")))
      val cleaned = dirty.withColumn("clean",
          trim(regexp_replace(regexp_replace(regexp_replace(lower(col("dirty")),
            "https?://[^ ]+", ""), "<[^>]*>", ""), " +", " ")))
        .withColumn("expected", concat(
          when(pmod(col("doc_id"), lit(3)) === 0, "visit now ").otherwise(""),
          col("text")))
      cleaned
        .groupBy(pmod(col("doc_id"), lit(3)).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("dirty"))).as("sum_dirty_chars"),
          sum(length(col("clean"))).as("sum_clean_chars"),
          sum(when(col("dirty").contains("http"), 1L).otherwise(0L))
            .as("n_urls_removed"),
          sum(when(col("clean") === col("expected"), 1L).otherwise(0L))
            .as("n_roundtrip_ok"))
        .orderBy("bucket")
    },
    Some("""WITH dirty AS (
        SELECT doc_id, text,
          (CASE WHEN doc_id % 3 = 0
            THEN 'VISIT http://spam.example/' || md5(CAST(doc_id AS VARCHAR)) || ' NOW  '
            ELSE '' END)
          || text
          || (CASE WHEN doc_id % 2 = 0 THEN ' <br/><hr/>' ELSE '' END) AS d
        FROM documents),
      cleaned AS (
        SELECT doc_id, text, d,
          trim(regexp_replace(regexp_replace(regexp_replace(lower(d),
            'https?://[^ ]+', '', 'g'), '<[^>]*>', '', 'g'), ' +', ' ', 'g'))
            AS clean,
          (CASE WHEN doc_id % 3 = 0 THEN 'visit now ' ELSE '' END) || text
            AS expected
        FROM dirty)
      SELECT doc_id % 3 AS bucket, COUNT(*) AS n_docs,
        CAST(SUM(length(d)) AS BIGINT) AS sum_dirty_chars,
        CAST(SUM(length(clean)) AS BIGINT) AS sum_clean_chars,
        CAST(SUM(CASE WHEN d LIKE '%http%' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_urls_removed,
        CAST(SUM(CASE WHEN clean = expected THEN 1 ELSE 0 END) AS BIGINT)
          AS n_roundtrip_ok
      FROM cleaned GROUP BY 1 ORDER BY 1"""))

  private val mmBinaryMeta = QueryDef(
    "mm_binary_meta",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("magic",
          when(pmod(col("doc_id"), lit(2)) === 0, "89504e47").otherwise("47494638"))
        .withColumn("payload",
          concat(to_binary(col("magic"), lit("hex")), col("text").cast("binary")))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
        .withColumn("header", upper(hex(substring(col("payload"), 1, 4))))
        .withColumn("kind",
          when(col("header") === "89504E47", "image/png")
            .when(col("header") === "47494638", "image/gif")
            .otherwise("unknown"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("sum_bytes"),
          countDistinct(col("header")).as("n_headers"),
          sum(when(col("kind") === "image/png", 1L).otherwise(0L)).as("n_png"))
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(octet_length(payload)) AS BIGINT) AS sum_bytes,
      CAST(COUNT(DISTINCT upper(substring(hex(payload), 1, 8))) AS BIGINT) AS n_headers,
      CAST(SUM(CASE WHEN upper(substring(hex(payload), 1, 8)) = '89504E47' THEN 1 ELSE 0 END) AS BIGINT) AS n_png
      FROM (SELECT source,
              from_hex(CASE WHEN doc_id % 2 = 0 THEN '89504e47' ELSE '47494638' END)
                || encode(text) AS payload
            FROM documents)
      GROUP BY 1 ORDER BY 1"""))

  /** Multimodal decode PIPELINE with a REAL codec: per-partition ENCODE
    * (deterministic grayscale `BufferedImage`, pixel(x,y) = (x+y) % 256,
    * written through JDK `javax.imageio` as PNG for even doc_ids / BMP for
    * odd — both lossless in the JDK) → opaque binary payload → per-partition
    * DECODE (`ImageIO.read` on the bytes; kind from real magic-byte
    * sniffing) → metadata rollup. Width, height, and the raster pixel sum
    * in the output are read back from the DECODED image, never from the
    * generator's variables, so a broken or fake decode hash-mismatches:
    * the oracle recomputes the same values from the closed-form generative
    * formula (w=16+id%32, h=16+id%24, Σ(x+y) = h·w(w-1)/2 + w·h(h-1)/2,
    * exact because max(x+y)=84 < 256 — the mod never wraps).
    * `mapPartitions` over `Dataset[T]` is the Scala analog of a
    * `mapInPandas` batch UDF: imperative per-record codec work,
    * Encoder-typed batch shape, partition-parallel — the plumbing that
    * carries image/audio/video columns at 100 TB. */
  private val mmDecodePipeline = QueryDef(
    "mm_decode_pipeline",
    (s, dir) => {
      import s.implicits._
      val payloads = Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .mapPartitions { iter =>
          javax.imageio.ImageIO.setUseCache(false)
          iter.map { id =>
            val w = 16 + (id % 32).toInt
            val h = 16 + (id % 24).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) { raster.setSample(x, y, 0, (x + y) % 256); y += 1 }
              x += 1
            }
            val fmt = if (id % 2 == 0) "png" else "bmp"
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, fmt, baos)
            (id, baos.toByteArray)
          }
        }
      val meta = payloads.mapPartitions { iter =>
        javax.imageio.ImageIO.setUseCache(false)
        iter.map { case (id, bytes) =>
          val kind =
            if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
              bytes(2) == 'N' && bytes(3) == 'G') "image/png"
            else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "image/bmp"
            else "unknown"
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var pxSum = 0L
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) { pxSum += raster.getSample(x, y, 0); y += 1 }
            x += 1
          }
          MediaDecoded(id, kind, w.toLong, h.toLong, pxSum)
        }
      }
      meta.groupBy("kind")
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sum_w"),
          sum(col("h")).as("sum_h"), sum(col("px_sum")).as("sum_px"))
        .orderBy("kind")
    },
    Some("""SELECT kind, COUNT(*) AS n,
      CAST(SUM(w) AS BIGINT) AS sum_w,
      CAST(SUM(h) AS BIGINT) AS sum_h,
      CAST(SUM(h * w * (w - 1) / 2 + w * h * (h - 1) / 2) AS BIGINT) AS sum_px
      FROM (SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/bmp' END AS kind,
              16 + doc_id % 32 AS w, 16 + doc_id % 24 AS h
            FROM documents)
      GROUP BY 1 ORDER BY 1"""))
}
