package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the Spark-side plumbing for
  * decode / feature-extract / frame-sample stages.
  *
  * IMAGE decode is REAL: `javax.imageio` (JDK built-in — PNG / JPEG /
  * BMP / GIF) drives [[imageFeatures]], which extracts true
  * width/height and 56-bit aHash/dHash perceptual signatures feeding
  * the banded-hamming machinery ([[Dedup.simhashPairs]]) for image
  * near-dup detection ([[imageNearDupPairs]]). AUDIO decode is REAL
  * for RIFF/WAVE PCM: `javax.sound.sampled` (JDK built-in) drives
  * [[audioFeatures]] — true sample rate from the fmt chunk, true
  * sample count from the data chunk, exact integer energy. The VIDEO
  * decode kernel stays STUBBED with a deterministic fake (no video
  * codec exists in this container) — what is real and tested there is
  * everything Spark cares about at 100 TB: the schema contract, the
  * batch shape (mapPartitions over iterators, never per-row JVM
  * setup), partition sizing (media rows are MBs — `maxRecordsPerBatch`/
  * `files.maxPartitionBytes` sized down), and the column pruning that
  * keeps huge binary blobs out of stages that only need metadata.
  */
object Multimodal {

  /** The canonical multimodal record: opaque payload + typed metadata.
    * Real pipelines add a `uri` column and keep `content` nullable so
    * metadata-only scans never touch the bytes.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Wrap a text corpus as fake media rows (deterministic test fixture:
    * payload = utf-8 bytes, metadata derived from content hash).
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        (pmod(xxhash64(col("text")), lit(1920)) + 1).cast(IntegerType).as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(1080)) + 1).cast(IntegerType).as("height"),
        (octet_length(col("content")) * 100L).as("duration_ms")).as("meta"))

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, features: Array[Float])

  /** Feature extraction as a partition-batched kernel: one decoder init
    * per partition (the expensive part for real codecs), then an
    * iterator pass. This is the Scala equivalent of a pandas-UDF
    * `mapInPandas` stage — the batch shape is identical.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // [decoder init would go here: one per partition, NOT per row]
      val decoder = new StubDecoder(dim)
      it.map { m =>
        val feats = decoder.decodeAndEmbed(m.content)
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          decoder.checksum(m.content), feats)
      }
    }
  }

  /** Frame sampling plan for video rows: which frame offsets a real
    * decoder would extract — pure metadata math, no decode needed, so it
    * runs as a codegen'd projection with the binary column pruned away.
    */
  def frameSamplePlan(media: DataFrame, everyMs: Long = 1000, maxFrames: Int = 16): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        least(floor(col("meta.duration_ms") / everyMs) + 1, lit(maxFrames))
          .cast(IntegerType).as("n_frames"),
        transform(
          sequence(lit(0),
            least(floor(col("meta.duration_ms") / everyMs), lit(maxFrames - 1))),
          i => (i * everyMs)).as("frame_offsets_ms"))

  /** pHash canvas: 8 × 7 = 56 cells, one bit each — 56 keeps every
    * signature in bits 0..55 (non-negative longs), the same ceiling
    * discipline as [[Dedup.autoSimhashBits]], so shifts/XOR/bit_count
    * agree across engines and the banded self-join needs no sign
    * handling.
    */
  val PhashW = 8
  val PhashH = 7

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
      ahash: Long, dhash: Long)

  /** REAL image decode + perceptual hashing, partition-batched:
    * `javax.imageio.ImageIO` (JDK built-in; PNG/JPEG/BMP/GIF) decodes
    * each blob, the TRUE pixel dimensions land in (width, height), the
    * image grayscales (integer Rec.601 luma for color; raw raster
    * samples for single-band images — `getRGB` on gray rasters would
    * detour through sRGB), pools onto the fixed [[PhashW]]×[[PhashH]]
    * grid by EXACT integer area-averaging, and emits:
    *
    *   - `ahash`: cell mean-threshold bits (`n·p > Σp` — integer-exact,
    *     no float mean), the re-encode/resize-robust signature;
    *   - `dhash`: wraparound horizontal gradient bits
    *     (`p[r][c] > p[r][(c+1) mod 8]`), the gradient-shape signature.
    *
    * Every step is deterministic integer math on decoded samples, so
    * an engine-independent oracle can recompute the hashes from the
    * same pixel source. Undecodable blobs are SKIPPED (corrupt images
    * are routine in web corpora) — diff input vs output ids for the
    * accounting. Scale shape: one ImageIO init per partition, an
    * iterator pass per batch, output rows are ~40 bytes regardless of
    * image size — the binary column dies at this stage boundary.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one per partition: no disk-backed stream cache inside executors
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.content))
          catch { case _: java.io.IOException => null }
        if (img == null) None
        else {
          val (w, h, px) = grayPixels(img)
          val cells = poolTo(w, h, px, PhashW, PhashH)
          Some(ImageFeatures(m.media_id, w, h,
            aHash(cells), dHash(cells, PhashW, PhashH)))
        }
      }
    }
  }

  /** Image NEAR-DUP pairs within `maxHamming` over the 56-bit aHash —
    * re-encoded / resized / lightly-edited copies land within a few
    * bits of each other while distinct images sit near hamming 28.
    * The pair stage is [[Dedup.simhashPairs]]'s pigeonhole banding:
    * complete recall, no cartesian — the same plan shape that carries
    * text SimHash at corpus scale carries images unchanged.
    */
  def imageNearDupPairs(media: Dataset[MediaRow],
      maxHamming: Int = 6): DataFrame =
    Dedup.simhashPairs(
      imageFeatures(media).toDF()
        .select(col("media_id").as("doc_id"), col("ahash").as("simhash")),
      bits = PhashW * PhashH, maxHamming = maxHamming)

  /** Grayscale plane + true dims from a decoded image. Single-band
    * rasters read raw samples (exact for 8-bit gray PNG/BMP); color
    * images take the integer Rec.601 luma (299R + 587G + 114B) / 1000.
    */
  private[functions] def grayPixels(
      img: java.awt.image.BufferedImage): (Int, Int, Array[Int]) = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](w * h)
    val raster = img.getRaster
    if (raster.getNumBands == 1) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(y * w + x) = (299 * ((rgb >> 16) & 0xff) +
            587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
          x += 1
        }
        y += 1
      }
    }
    (w, h, out)
  }

  /** Exact integer area-average pooling onto a tw×th grid: cell
    * (cx, cy) averages the source block [⌊cx·w/tw⌋, ⌊(cx+1)·w/tw⌋) ×
    * [⌊cy·h/th⌋, ⌊(cy+1)·h/th⌋) with integer division — deterministic
    * on every platform (no Graphics2D interpolation, whose kernels
    * vary by JDK), and EXACT on integer upscales: a k× nearest-
    * neighbor enlargement pools back to the identical cell values, so
    * a resized duplicate hashes identically.
    */
  private[functions] def poolTo(w: Int, h: Int, px: Array[Int],
      tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    var cy = 0
    while (cy < th) {
      val y0 = cy * h / th
      val y1 = math.max(y0 + 1, (cy + 1) * h / th)
      var cx = 0
      while (cx < tw) {
        val x0 = cx * w / tw
        val x1 = math.max(x0 + 1, (cx + 1) * w / tw)
        var s = 0L
        var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += px(y * w + x); n += 1; x += 1 }
          y += 1
        }
        out(cy * tw + cx) = (s / n).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Mean-threshold bits, integer-exact: bit i set iff n·p(i) > Σp —
    * no float mean, so every engine computing from the same cells gets
    * the same 56 bits.
    */
  private[functions] def aHash(cells: Array[Int]): Long = {
    val n = cells.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += cells(i); i += 1 }
    var bits = 0L
    i = 0
    while (i < n) {
      if (n.toLong * cells(i) > sum) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Wraparound horizontal-gradient bits: bit (r·w + c) set iff
    * p[r][c] > p[r][(c+1) mod w] — the classic dHash with the last
    * column compared against the first, so the grid needs no (w+1)-th
    * column and the signature stays exactly w·h bits.
    */
  private[functions] def dHash(cells: Array[Int], w: Int, h: Int): Long = {
    var bits = 0L
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        if (cells(r * w + c) > cells(r * w + (c + 1) % w))
          bits |= (1L << (r * w + c))
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Deterministic PNG image fixtures for the gates: per document, an
    * 8×7 grayscale PNG whose pixel i is byte (i mod 16) of
    * `md5(text)`, PLUS its 2× nearest-neighbor upscale (16×14) — the
    * planted "re-encoded, resized duplicate" that perceptual hashing
    * must find at hamming 0. The md5 pixel source is what makes a
    * DuckDB oracle possible: the oracle recomputes the expected
    * hashes from `md5(text)` in pure SQL, so a Spark-side fault in
    * ImageIO decode, pooling, or hash math fails the gate — a real
    * codec round-trip check, not a mirrored stub. Emitted ids:
    * base = 2·doc_id, upscale = 2·doc_id + 1.
    */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val dig = md5.digest(text.getBytes("UTF-8"))
          def png(scale: Int): Array[Byte] = {
            val img = new java.awt.image.BufferedImage(PhashW * scale,
              PhashH * scale, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < PhashH * scale) {
              var x = 0
              while (x < PhashW * scale) {
                raster.setSample(x, y, 0,
                  dig(((y / scale) * PhashW + x / scale) % 16) & 0xff)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
          Seq((id * 2, "image", png(1)), (id * 2 + 1, "image", png(2)))
        }
      }.toDF("media_id", "kind", "content")
  }

  case class AudioFeatures(media_id: Long, sample_rate: Int,
      n_samples: Long, duration_ms: Long, energy: Long)

  /** REAL audio decode, partition-batched: `javax.sound.sampled`
    * (JDK built-in — RIFF/WAVE with PCM payloads) parses each blob's
    * container for real: the TRUE sample rate comes from the fmt
    * chunk, the TRUE sample count from the data chunk length, and
    * `energy` is the exact integer Σ sample² over the decoded 16-bit
    * PCM stream — deterministic, so an engine-independent oracle can
    * recompute every output from the same sample source (the m05 gate
    * does, from md5-derived fixtures). `duration_ms` is integer
    * `n_samples·1000 / sample_rate`. Undecodable blobs are SKIPPED
    * (corrupt audio is routine in web corpora) — diff input vs output
    * ids for the accounting. Multi-channel input is refused as
    * undecodable rather than silently averaged. Scale shape mirrors
    * [[imageFeatures]]: one iterator pass, ~40-byte output rows, the
    * binary column dies at this stage boundary. VIDEO decode remains
    * the honest [[StubDecoder]] seam (no video codec in the JDK).
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.content))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => null
            case _: java.io.IOException => null
          }
        if (ais == null) None
        else {
          val fmt = ais.getFormat
          val ok = fmt.getChannels == 1 &&
            fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          if (!ok) { ais.close(); None }
          else {
            val bytes = ais.readAllBytes()
            ais.close()
            val n = bytes.length / 2
            var energy = 0L
            var i = 0
            while (i < n) {
              val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
              energy += s.toLong * s
              i += 1
            }
            val rate = math.round(fmt.getSampleRate)
            Some(AudioFeatures(m.media_id, rate, n.toLong,
              n.toLong * 1000L / rate, energy))
          }
        }
      }
    }
  }

  /** Deterministic WAV fixtures for the m05 gate: per document, a real
    * RIFF/WAVE container (PCM16 mono, little-endian) whose sample i is
    * `(b − 128)·256` for b = byte (i mod 16) of `md5(text)`, with
    * sample rate `8000 + (doc_id % 4)·4000` and sample count
    * `64 + (doc_id % 3)·16` — every gated output recomputable from
    * `md5(text)` in pure SQL, so a Spark-side fault in container
    * parsing, PCM decoding, or the energy sum fails the gate. Emitted
    * twice per doc: base = 2·doc_id (minimal RIFF), variant =
    * 2·doc_id + 1 (identical PCM behind an extra LIST/INFO chunk
    * between fmt and data — a container-robustness plant: a reader
    * that assumes chunk offsets instead of walking the chunk list
    * breaks on it, and both ids must gate identical features).
    */
  def syntheticWavs(docs: DataFrame): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val dig = md5.digest(text.getBytes("UTF-8"))
          val rate = 8000 + (id % 4).toInt * 4000
          val n = 64 + (id % 3).toInt * 16
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = ((dig(i % 16) & 0xff) - 128) * 256
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          def u32(v: Int) = Array[Byte](
            (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
            ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
          def u16(v: Int) = Array[Byte](
            (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
          def chunk(tag: String, body: Array[Byte]) =
            tag.getBytes("US-ASCII") ++ u32(body.length) ++ body
          val fmtChunk = chunk("fmt ", u16(1) ++ u16(1) ++ u32(rate) ++
            u32(rate * 2) ++ u16(2) ++ u16(16))
          val dataChunk = chunk("data", pcm)
          def wav(extra: Array[Byte]): Array[Byte] = {
            val body = "WAVE".getBytes("US-ASCII") ++
              fmtChunk ++ extra ++ dataChunk
            "RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body
          }
          val list = chunk("LIST",
            "INFO".getBytes("US-ASCII") ++
              chunk("ICMT", "graft fixture ".getBytes("US-ASCII")))
          Seq((id * 2, "audio", wav(Array.emptyByteArray)),
            (id * 2 + 1, "audio", wav(list)))
        }
      }.toDF("media_id", "kind", "content")
  }

  /** Deterministic fake decode: stable per-content pseudo-features.
    * The `???`-shaped seam a real codec implementation replaces (for
    * VIDEO — images decode for real via [[imageFeatures]], WAV audio
    * via [[audioFeatures]]).
    */
  private[functions] class StubDecoder(dim: Int) extends Serializable {
    def checksum(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }
    def decodeAndEmbed(bytes: Array[Byte]): Array[Float] = {
      // a real implementation decodes pixels/samples; the stub derives
      // deterministic values from the checksum stream
      val out = new Array[Float](dim)
      var h = checksum(bytes)
      var i = 0
      while (i < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = ((h >>> 40).toInt & 0xffff).toFloat / 65536f
        i += 1
      }
      out
    }
  }
}
