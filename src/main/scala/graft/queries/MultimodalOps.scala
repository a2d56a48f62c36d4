package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Multimodal feature ops beyond sniff+decode ([[TextOps]]): resize, video
  * frame-sampling, and audio feature extraction — the remaining named ops
  * of a training-data media pipeline.
  *
  * Codec reality in this container: the JDK ships a REAL image codec
  * (`javax.imageio`), so the resize path decodes genuine PNG bytes and
  * resamples the decoded raster. There is no video/audio codec on the
  * classpath, so those payloads use a deterministic in-house container
  * (header + raw frames / PCM samples — clearly a STUB for the codec
  * stage per the brief) while everything Spark-side is real: binary
  * column construction, header parsing, per-partition batch decode
  * through typed `Dataset[T]` (`mapPartitions` — the Scala analog of a
  * `mapInPandas` batch UDF), stride sampling, and rollups.
  *
  * Scale shape: all three are row-local codec passes over a binary
  * column followed by a small aggregate — embarrassingly parallel, no
  * shuffle before the final rollup; the partition is the batch. Every
  * output value is read back from DECODED bytes (never the generator's
  * variables), and the oracle recomputes it from the generative formula,
  * so a fake decode hash-mismatches.
  */
object MultimodalOps extends QueryModule {

  def defs: Seq[QueryDef] = Seq(mmResize, mmFrameSample, mmAudioFeatures,
    mmPixelDedup, mmPhashDedup)

  /** One decoded image's perceptual-hash row. */
  case class PhashRow(doc_id: Long, phash: String)

  /** MM: NEAR-duplicate image dedup by perceptual hash — the multimodal
    * twin of `d2_minhash_lsh` where [[mmPixelDedup]] is the twin of d1:
    * a resized + re-encoded copy of an image has different bytes AND
    * different decoded pixels, so neither byte- nor raster-hash grouping
    * can see it; an aHash over a normalized downsample can. Every doc
    * group of three (doc_id div 3) renders one 8×8 block pattern (bits
    * md5-derived from the group id) at three container realities:
    * variant 0 = 32×32 PNG original, variant 1 = the SAME picture
    * resized to 64×48 and re-encoded as BMP, variant 2 = 48×64 PNG with
    * a one-block artifact. The pipeline decodes the container bytes
    * through the real `javax.imageio` codec, downsamples the DECODED
    * raster by block-center sampling to 8×8, thresholds to a 64-bit
    * aHash, then finds near-duplicates with the standard Hamming-LSH
    * discipline: band the 64 bits into 4×16-bit keys, equi-join on
    * (band, value) — NEVER an all-pairs product — and verify candidates
    * at exact Hamming distance ≤ 4. The resized BMP copy lands at
    * distance 0 from its original, the artifact variant at 1; distinct
    * groups sit at ~32 bits and die in the verify stage (band collisions
    * DO produce far candidates, so the verify arm is live).
    *
    * Scale shape: one row-local codec kernel, one explode(4) band join
    * (bucket sizes bounded by group size + 16-bit-band collisions), the
    * verify is per-candidate-pair. The oracle derives hashes from the
    * generator's closed form (the mm_pixel_dedup discipline), so a
    * decode/downsample/threshold that loses fidelity mismatches. */
  private val mmPhashDedup = QueryDef(
    "mm_phash_dedup",
    (s, dir) => {
      import s.implicits._
      val hashes = Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .mapPartitions { iter =>
          javax.imageio.ImageIO.setUseCache(false)
          val md = java.security.MessageDigest.getInstance("MD5")
          iter.map { id =>
            val grp = id / 3
            val v = (id % 3).toInt
            // 64 ground-truth block bits, md5-derived per (group, cell);
            // variant 2 carries a one-block artifact at cell 0
            val bits = Array.tabulate(64) { idx =>
              md.reset()
              val hex = md.digest(s"ph:$grp:$idx".getBytes("UTF-8"))
              val b = ((hex(0) >> 4) & 0xf) >= 8
              if (v == 2 && idx == 0) !b else b
            }
            val (w, h) = v match {
              case 0 => (32, 32)
              case 1 => (64, 48) // resized + BMP re-encode
              case _ => (48, 64) // resized + artifact
            }
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val r0 = img.getRaster
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                val bit = bits((y * 8 / h) * 8 + (x * 8 / w))
                r0.setSample(x, y, 0, if (bit) 220 else 20); y += 1
              }
              x += 1
            }
            val fmt = if (v == 1) "bmp" else "png"
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, fmt, baos)
            // ── decode the container bytes, downsample the DECODED raster
            //    by block-center sampling, threshold → 64-char aHash ──
            val dec = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(baos.toByteArray))
            val dr = dec.getRaster
            val (dw, dh) = (dec.getWidth, dec.getHeight)
            val sb = new java.lang.StringBuilder(64)
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                val sx = (2 * i + 1) * dw / 16
                val sy = (2 * j + 1) * dh / 16
                sb.append(if (dr.getSample(sx, sy, 0) > 120) '1' else '0')
                i += 1
              }
              j += 1
            }
            PhashRow(id, sb.toString)
          }
        }
        // the banded self-join consumes the hash table on BOTH sides:
        // without the persist each side re-runs the full encode→decode
        // codec kernel over every image (the guide-§8 rule — fingerprints
        // are the cheap proxy, compute them once). 64-char hash per doc →
        // tiny cache; harness clears it between queries.
        .persist()
      val bands = hashes.select(col("doc_id"), col("phash"),
          explode(expr("transform(sequence(0, 3), b -> " +
            "struct(b AS band, substring(phash, b * 16 + 1, 16) AS bval))"))
            .as("bk"))
        .select(col("doc_id"), col("phash"),
          col("bk.band").as("band"), col("bk.bval").as("bval"))
      val a = bands.select(col("band"), col("bval"),
        col("doc_id").as("doc_a"), col("phash").as("h_a"))
      val b = bands.select(col("band").as("band_b"), col("bval").as("bval_b"),
        col("doc_id").as("doc_b"), col("phash").as("h_b"))
      a.join(b, col("band") === col("band_b") && col("bval") === col("bval_b") &&
          col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "h_a", "h_b").distinct()
        .withColumn("hamming", expr("size(filter(sequence(1, 64), " +
          "p -> substring(h_a, p, 1) <> substring(h_b, p, 1)))").cast("long"))
        .filter(col("hamming") <= 4)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    },
    Some("""WITH ph AS (
        SELECT doc_id,
          string_agg(CASE WHEN (CASE WHEN doc_id % 3 = 2 AND idx = 0
              THEN NOT bit ELSE bit END) THEN '1' ELSE '0' END, ''
            ORDER BY idx) AS phash
        FROM (
          SELECT d.doc_id, i.i AS idx,
            substring(md5('ph:' || (d.doc_id // 3) || ':' || i.i), 1, 1) >= '8'
              AS bit
          FROM documents d, LATERAL unnest(generate_series(0, 63)) AS i(i))
        GROUP BY doc_id),
      bands AS (
        SELECT doc_id, phash, b.b AS band,
          substring(phash, b.b * 16 + 1, 16) AS bval
        FROM ph, LATERAL unnest(generate_series(0, 3)) AS b(b)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          a.phash AS h_a, b.phash AS h_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, CAST(hamming(h_a, h_b) AS BIGINT) AS hamming
      FROM cand WHERE hamming(h_a, h_b) <= 4
      ORDER BY 1, 2"""))

  /** One decoded image's identity row: the md5 of its decoded pixel
    * array plus its container format. */
  case class PixelHashRow(doc_id: Long, px_hash: String, is_png: Long,
      w: Long, h: Long)

  /** MM: cross-container image dedup — the multimodal twin of
    * `d1_exact_dedup`: duplicates are images with IDENTICAL decoded
    * pixels even when their BYTES differ because the container does
    * (the same picture saved as PNG by one crawler and BMP by another —
    * byte-level dedup cannot see it). Each doc renders the image of its
    * seed (doc_id % 23) and encodes it as PNG or BMP by parity; the
    * pipeline decodes through the real `javax.imageio` codec, hashes the
    * DECODED raster row-major, and groups by pixel hash. The oracle
    * derives the expected groups from the planted seed formula — so a
    * decode that loses pixel fidelity (or a hash that collides/splits)
    * mismatches the group structure, not just a checksum. */
  private val mmPixelDedup = QueryDef(
    "mm_pixel_dedup",
    (s, dir) => {
      import s.implicits._
      val rows = Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .mapPartitions { iter =>
          javax.imageio.ImageIO.setUseCache(false)
          val md = java.security.MessageDigest.getInstance("MD5")
          iter.map { id =>
            val seed = (id % 23).toInt
            val w = 16 + seed
            val h = 16 + (seed * 7) % 24
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                raster.setSample(x, y, 0, (x * 3 + y * 5 + seed) % 251); y += 1
              }
              x += 1
            }
            val fmt = if (id % 2 == 0) "png" else "bmp"
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, fmt, baos)
            // decode the CONTAINER bytes back and hash the decoded raster
            val dec = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(baos.toByteArray))
            val dr = dec.getRaster
            val px = new Array[Byte](dec.getWidth * dec.getHeight)
            var i = 0
            var yy = 0
            while (yy < dec.getHeight) {
              var xx = 0
              while (xx < dec.getWidth) {
                px(i) = dr.getSample(xx, yy, 0).toByte; i += 1; xx += 1
              }
              yy += 1
            }
            md.reset()
            val hex = md.digest(px).map(b => f"$b%02x").mkString
            PixelHashRow(id, hex, if (id % 2 == 0) 1L else 0L,
              dec.getWidth.toLong, dec.getHeight.toLong)
          }
        }
      rows.groupBy("px_hash")
        .agg(min(col("doc_id")).as("min_doc"),
          count(lit(1)).as("n_docs"),
          sum(col("is_png")).as("n_png"),
          (count(lit(1)) - sum(col("is_png"))).as("n_bmp"),
          first(col("w")).as("w"), first(col("h")).as("h"))
        .drop("px_hash")
        .orderBy("min_doc")
    },
    Some("""SELECT MIN(doc_id) AS min_doc, COUNT(*) AS n_docs,
        CAST(SUM(is_png) AS BIGINT) AS n_png,
        CAST(COUNT(*) - SUM(is_png) AS BIGINT) AS n_bmp,
        CAST(16 + seed AS BIGINT) AS w,
        CAST(16 + (seed * 7) % 24 AS BIGINT) AS h
      FROM (SELECT doc_id, doc_id % 23 AS seed,
              CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_png
            FROM documents)
      GROUP BY seed ORDER BY 1"""))

  /** Thumbnail row: dims and pixel sum of the RESIZED image plus a
    * re-decode verification bit (thumbnail re-encoded to PNG, decoded
    * again, sums compared). */
  case class ThumbRow(doc_id: Long, kind: String, w2: Long, h2: Long,
      px_sum2: Long, roundtrip_ok: Boolean)

  /** One sampled video frame: which frame, and the pixel sum decoded
    * from that frame's raw bytes. */
  case class FrameRow(doc_id: Long, n_frames: Long, stride: Long,
      frame_idx: Long, px_sum: Long)

  /** Per-clip audio features, all computed from the decoded PCM bytes. */
  case class AudioRow(doc_id: Long, n_samples: Long, sum_sq: Long,
      zero_cross: Long, peak: Long)

  /** mm: RESIZE. Encode the deterministic grayscale image (pixel(x,y) =
    * (x+y) % 256, w = 16 + id%32, h = 16 + id%24 — the mm_decode_pipeline
    * generator) through the real PNG codec, decode it back, then build a
    * half-scale thumbnail by NEAREST-NEIGHBOR sampling of the DECODED
    * raster (thumb(x,y) = src(2x,2y) — the explicit kernel a resize stage
    * runs when no native library is present), re-encode the thumbnail as
    * PNG and re-decode it to verify the resized raster survives a codec
    * round-trip. Thumb pixel value = (2x+2y) % 256 with max 2·(23+19-2)=80
    * < 256, so the oracle's closed form is exact:
    * Σ thumb = h2·w2·(w2-1) + w2·h2·(h2-1). */
  private val mmResize = QueryDef(
    "mm_resize",
    (s, dir) => {
      import s.implicits._
      val thumbs = Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .mapPartitions { iter =>
          javax.imageio.ImageIO.setUseCache(false)
          iter.map { id =>
            val w = 16 + (id % 32).toInt
            val h = 16 + (id % 24).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val r0 = img.getRaster
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) { r0.setSample(x, y, 0, (x + y) % 256); y += 1 }
              x += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", baos)
            val bytes = baos.toByteArray
            // ── decode (real PNG parse) ──
            val dec = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            val (dw, dh) = (dec.getWidth, dec.getHeight)
            val (w2, h2) = (dw / 2, dh / 2)
            // ── resize: explicit nearest-neighbor kernel over the decoded raster ──
            val thumb = new java.awt.image.BufferedImage(
              w2, h2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val src = dec.getRaster; val dst = thumb.getRaster
            var px2 = 0L
            var tx = 0
            while (tx < w2) {
              var ty = 0
              while (ty < h2) {
                val v = src.getSample(2 * tx, 2 * ty, 0)
                dst.setSample(tx, ty, 0, v)
                px2 += v
                ty += 1
              }
              tx += 1
            }
            // ── verify: thumbnail → PNG → decode → same pixel sum ──
            val b2 = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(thumb, "png", b2)
            val rd = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b2.toByteArray))
            var px3 = 0L
            var vx = 0
            while (vx < rd.getWidth) {
              var vy = 0
              while (vy < rd.getHeight) { px3 += rd.getRaster.getSample(vx, vy, 0); vy += 1 }
              vx += 1
            }
            val kind = if (id % 2 == 0) "even" else "odd"
            ThumbRow(id, kind, w2.toLong, h2.toLong, px2,
              px3 == px2 && rd.getWidth == w2 && rd.getHeight == h2)
          }
        }
      thumbs.groupBy("kind")
        .agg(count(lit(1)).as("n"), sum(col("w2")).as("sum_w2"),
          sum(col("h2")).as("sum_h2"), sum(col("px_sum2")).as("sum_px2"),
          sum(when(col("roundtrip_ok"), 1L).otherwise(0L)).as("n_roundtrip_ok"))
        .orderBy("kind")
    },
    Some("""SELECT kind, COUNT(*) AS n,
      CAST(SUM(w2) AS BIGINT) AS sum_w2,
      CAST(SUM(h2) AS BIGINT) AS sum_h2,
      CAST(SUM(h2 * w2 * (w2 - 1) + w2 * h2 * (h2 - 1)) AS BIGINT) AS sum_px2,
      COUNT(*) AS n_roundtrip_ok
      FROM (SELECT CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS kind,
              (16 + doc_id % 32) // 2 AS w2, (16 + doc_id % 24) // 2 AS h2
            FROM documents)
      GROUP BY 1 ORDER BY 1"""))

  /** mm: video FRAME-SAMPLE. The payload is an in-house raw-frame
    * container (codec stage stubbed deterministically — no video codec in
    * the container): ASCII "GRVID" ‖ u8 n_frames ‖ u8 w ‖ u8 h, then
    * n_frames grayscale frames of w·h raw bytes, frame f pixel (x,y) =
    * (x+y+f) % 256 (max 8+14+14 < 256 — never wraps). The decode stage
    * parses the header FROM THE BYTES, stride-samples every
    * ceil(n_frames/4)-th frame (the "sample ~4 frames per clip" policy of
    * a video training pipeline), and sums each sampled frame's pixels from
    * its raw bytes. One row per sampled frame (the explode), rolled up per
    * stride. */
  private val mmFrameSample = QueryDef(
    "mm_frame_sample",
    (s, dir) => {
      import s.implicits._
      val frames = Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .mapPartitions { iter =>
          iter.flatMap { id =>
            val nf = 4 + (id % 9).toInt // 4..12 frames
            val w = 8 + (id % 8).toInt  // 8..15
            val h = 8 + (id % 7).toInt  // 8..14
            val payload = new Array[Byte](8 + nf * w * h)
            payload(0) = 'G'; payload(1) = 'R'; payload(2) = 'V'
            payload(3) = 'I'; payload(4) = 'D'
            payload(5) = nf.toByte; payload(6) = w.toByte; payload(7) = h.toByte
            var f = 0
            while (f < nf) {
              var x = 0
              while (x < w) {
                var y = 0
                while (y < h) {
                  payload(8 + f * w * h + y * w + x) = ((x + y + f) % 256).toByte
                  y += 1
                }
                x += 1
              }
              f += 1
            }
            // ── decode stage: everything below reads ONLY `payload` ──
            require(payload(0) == 'G' && payload(4) == 'D', "bad magic")
            val dnf = payload(5) & 0xff
            val dw = payload(6) & 0xff
            val dh = payload(7) & 0xff
            val stride = (dnf + 3) / 4
            (0 until dnf by stride).map { fi =>
              val base = 8 + fi * dw * dh
              var sum = 0L
              var i = 0
              while (i < dw * dh) { sum += payload(base + i) & 0xff; i += 1 }
              FrameRow(id, dnf.toLong, stride.toLong, fi.toLong, sum)
            }
          }
        }
      frames.groupBy("stride")
        .agg(count(lit(1)).as("n_sampled"),
          // frame 0 is sampled from EVERY clip (0 % stride == 0), so the
          // clip count is a plain conditional sum — no distinct-aggregate
          // shuffle
          sum(when(col("frame_idx") === 0, 1L).otherwise(0L)).as("n_clips"),
          sum(col("frame_idx")).as("sum_frame_idx"),
          sum(col("px_sum")).as("sum_px"))
        .orderBy("stride")
    },
    // oracle: regenerate per-clip geometry, enumerate sampled frame indices
    // with range(), and apply the same closed-form frame sum
    // Σ frame_f = h·w·(w-1)/2 + w·h·(h-1)/2 + w·h·f
    Some("""WITH clips AS (
        SELECT doc_id, 4 + doc_id % 9 AS nf, 8 + doc_id % 8 AS w,
          8 + doc_id % 7 AS h, (4 + doc_id % 9 + 3) // 4 AS stride
        FROM documents),
      sampled AS (
        SELECT c.*, f.f AS frame_idx
        FROM clips c CROSS JOIN range(12) f(f)
        WHERE f.f < c.nf AND f.f % c.stride = 0)
      SELECT stride, COUNT(*) AS n_sampled,
        CAST(SUM(CASE WHEN frame_idx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clips,
        CAST(SUM(frame_idx) AS BIGINT) AS sum_frame_idx,
        CAST(SUM(h * w * (w - 1) / 2 + w * h * (h - 1) / 2
          + w * h * frame_idx) AS BIGINT) AS sum_px
      FROM sampled GROUP BY 1 ORDER BY 1"""))

  /** mm: AUDIO feature extraction. The payload is unsigned 8-bit mono PCM
    * (codec stage stubbed deterministically — no audio codec in the
    * container): n = 256 + (id % 16)·64 samples, sample(i) =
    * (i·7 + id) % 256. The feature pass reads ONLY the payload bytes:
    * centered amplitude a(i) = s(i) - 128, energy Σa², zero-crossings
    * (sign flips of a, zeros carry the previous sign), and peak |a| — the
    * standard cheap audio-quality features. The oracle recomputes all
    * three from the generative formula via a range() enumeration (no
    * closed form needed on the DuckDB side). */
  private val mmAudioFeatures = QueryDef(
    "mm_audio_features",
    (s, dir) => {
      import s.implicits._
      val feats = Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .mapPartitions { iter =>
          iter.map { id =>
            val n = 256 + (id % 16).toInt * 64
            val pcm = new Array[Byte](n)
            var i = 0
            while (i < n) { pcm(i) = ((i * 7 + id) % 256).toByte; i += 1 }
            // ── feature pass: reads ONLY `pcm` ──
            var sumSq = 0L; var zc = 0L; var peak = 0L
            var prevSign = 0
            i = 0
            while (i < n) {
              val a = (pcm(i) & 0xff) - 128
              sumSq += a.toLong * a
              val sign = Integer.signum(a)
              if (sign != 0) {
                if (prevSign != 0 && sign != prevSign) zc += 1
                prevSign = sign
              }
              if (math.abs(a) > peak) peak = math.abs(a)
              i += 1
            }
            AudioRow(id, n.toLong, sumSq, zc, peak)
          }
        }
      feats.groupBy(expr("n_samples div 64 % 4").as("len_bucket"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_samples")).as("sum_samples"),
          sum(col("sum_sq")).as("sum_energy"),
          sum(col("zero_cross")).as("sum_zc"),
          max(col("peak")).as("max_peak"))
        .orderBy("len_bucket")
    },
    Some("""WITH clips AS (
        SELECT doc_id, 256 + (doc_id % 16) * 64 AS n FROM documents),
      samples AS (
        SELECT c.doc_id, c.n, i.i,
          ((i.i * 7 + c.doc_id) % 256) - 128 AS a
        FROM clips c CROSS JOIN range(1216) i(i)
        WHERE i.i < c.n),
      sgn AS (
        SELECT doc_id, n, i, a, sign(a) AS s,
          CASE WHEN sign(a) = 0 THEN NULL ELSE sign(a) END AS nz
        FROM samples),
      runs AS (
        SELECT doc_id, n, a, nz,
          LAST_VALUE(nz IGNORE NULLS) OVER (
            PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_nz
        FROM sgn),
      feat AS (
        SELECT doc_id, MAX(n) AS n_samples,
          SUM(a * a) AS sum_sq,
          SUM(CASE WHEN nz IS NOT NULL AND prev_nz IS NOT NULL
            AND nz <> prev_nz THEN 1 ELSE 0 END) AS zero_cross,
          MAX(abs(a)) AS peak
        FROM runs GROUP BY 1)
      SELECT n_samples // 64 % 4 AS len_bucket,
        COUNT(*) AS n_clips,
        CAST(SUM(n_samples) AS BIGINT) AS sum_samples,
        CAST(SUM(sum_sq) AS BIGINT) AS sum_energy,
        CAST(SUM(zero_cross) AS BIGINT) AS sum_zc,
        CAST(MAX(peak) AS BIGINT) AS max_peak
      FROM feat GROUP BY 1 ORDER BY 1"""))
}
