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
        decodePcm16Mono(m.content).map { case (rate, bytes) =>
          val n = bytes.length / 2
          var energy = 0L
          var i = 0
          while (i < n) {
            val s = pcmSample(bytes, i)
            energy += s.toLong * s
            i += 1
          }
          AudioFeatures(m.media_id, rate, n.toLong,
            n.toLong * 1000L / rate, energy)
        }
      }
    }
  }

  /** The shared RIFF/WAVE decode behind [[audioFeatures]] and
    * [[audioFingerprints]]: `javax.sound.sampled` container parse,
    * accepting exactly mono 16-bit little-endian signed PCM, returning
    * (sample rate, raw PCM bytes). `None` for undecodable or
    * out-of-contract blobs — corrupt audio is routine in web corpora;
    * multi-channel is refused rather than silently averaged.
    */
  private[functions] def decodePcm16Mono(
      content: Array[Byte]): Option[(Int, Array[Byte])] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
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
        Some((math.round(fmt.getSampleRate), bytes))
      }
    }
  }

  /** Sample i of a little-endian PCM16 byte stream, as a sign-extended
    * Int. */
  private def pcmSample(bytes: Array[Byte], i: Int): Int =
    ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt

  /** [[audioFingerprints]] signature width — 56 bits for the same
    * non-negative-long discipline as the image [[PhashW]]×[[PhashH]]
    * canvas, so the banded-hamming pair machinery carries audio
    * unchanged. */
  val AudioFpBits = 56

  case class AudioFingerprint(media_id: Long, n_samples: Long, fp: Long)

  /** Perceptual audio fingerprint — the aHash analogue over decoded
    * PCM, completing the image/audio near-dup symmetry:
    *
    *   1. decode ([[decodePcm16Mono]] — container-walked, not
    *      offset-assumed);
    *   2. TRIM leading/trailing zero samples: silence padding is the
    *      audio analogue of an image border, and trimming makes a
    *      padded re-post fingerprint-identical to its original
    *      (all-silence audio has no fingerprint — the row is skipped,
    *      like an undecodable blob);
    *   3. pool the trimmed stream's ENERGY (Σ sample², exact integer)
    *      onto [[AudioFpBits]] windows with the same integer-bound
    *      rule as the image [[poolTo]] (window j covers
    *      [⌊j·m/56⌋, max(that+1, ⌊(j+1)·m/56⌋)) of the m trimmed
    *      samples);
    *   4. mean-threshold bits: bit j set iff 56·e(j) > Σe — integer-
    *      exact, and AMPLITUDE-INVARIANT (uniform volume scaling
    *      multiplies every window energy equally, leaving every
    *      comparison unchanged), so a quieter/louder re-encode of the
    *      same signal hashes identically.
    *
    * Exactness bound: 56·Σs² must fit a long — samples are < 2¹⁵, so
    * anything under ~2.5·10⁹ samples (≈ 18 h at 44.1 kHz) is exact;
    * longer streams should be chunked upstream. Deterministic integer
    * math throughout, so an engine-independent oracle recomputes the
    * bits from the same sample source (the m06 gate does, from
    * md5-derived fixtures). Scale shape mirrors [[imageFeatures]]:
    * one iterator pass, ~24-byte output rows, the binary column dies
    * here.
    */
  def audioFingerprints(media: Dataset[MediaRow]): Dataset[AudioFingerprint] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodePcm16Mono(m.content).flatMap { case (_, bytes) =>
          val n = bytes.length / 2
          var f = 0
          while (f < n && pcmSample(bytes, f) == 0) f += 1
          var l = n - 1
          while (l >= f && pcmSample(bytes, l) == 0) l -= 1
          if (l < f) None
          else {
            val m0 = l - f + 1
            val e = new Array[Long](AudioFpBits)
            var tot = 0L
            var j = 0
            while (j < AudioFpBits) {
              val x0 = f + (j.toLong * m0 / AudioFpBits).toInt
              val x1 = f + math.max((j.toLong * m0 / AudioFpBits).toInt + 1,
                ((j + 1).toLong * m0 / AudioFpBits).toInt)
              var s = 0L
              var i = x0
              while (i < x1) {
                val v = pcmSample(bytes, i)
                s += v.toLong * v
                i += 1
              }
              e(j) = s
              tot += s
              j += 1
            }
            var bits = 0L
            j = 0
            while (j < AudioFpBits) {
              if (AudioFpBits.toLong * e(j) > tot) bits |= (1L << j)
              j += 1
            }
            Some(AudioFingerprint(m.media_id, m0.toLong, bits))
          }
        }
      }
    }
  }

  /** Audio NEAR-DUP pairs within `maxHamming` over the 56-bit
    * [[audioFingerprints]] signature — re-encoded, silence-padded, and
    * volume-scaled copies land at hamming 0 while distinct signals sit
    * near hamming 28. The pair stage is [[Dedup.simhashPairs]]'s
    * pigeonhole banding: complete recall, no cartesian — the same plan
    * shape as [[imageNearDupPairs]], closing the image/audio near-dup
    * triad (video remains the declared decode stub).
    */
  def audioNearDupPairs(media: Dataset[MediaRow],
      maxHamming: Int = 4): DataFrame =
    Dedup.simhashPairs(
      audioFingerprints(media).toDF()
        .select(col("media_id").as("doc_id"), col("fp").as("simhash")),
      bits = AudioFpBits, maxHamming = maxHamming)

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
          val pcm = pcm16((0 until n).map(i => ((dig(i % 16) & 0xff) - 128) * 256))
          Seq((id * 2, "audio", wavContainer(pcm, rate, withList = false)),
            (id * 2 + 1, "audio", wavContainer(pcm, rate, withList = true)))
        }
      }.toDF("media_id", "kind", "content")
  }

  /** Little-endian PCM16 bytes from sample values. */
  private def pcm16(samples: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** A real RIFF/WAVE container around a PCM16 mono payload;
    * `withList` inserts a LIST/INFO chunk between fmt and data (the
    * chunk-walking-robustness plant shared by the m05/m06 fixtures).
    */
  private def wavContainer(pcm: Array[Byte], rate: Int,
      withList: Boolean): Array[Byte] = {
    def u32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(tag: String, body: Array[Byte]) =
      tag.getBytes("US-ASCII") ++ u32(body.length) ++ body
    val fmtChunk = chunk("fmt ", u16(1) ++ u16(1) ++ u32(rate) ++
      u32(rate * 2) ++ u16(2) ++ u16(16))
    val extra =
      if (withList)
        chunk("LIST", "INFO".getBytes("US-ASCII") ++
          chunk("ICMT", "graft fixture ".getBytes("US-ASCII")))
      else Array.emptyByteArray
    val body = "WAVE".getBytes("US-ASCII") ++
      fmtChunk ++ extra ++ chunk("data", pcm)
    "RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body
  }

  /** Deterministic WAV fixtures for the m06 NEAR-DUP gate: per
    * document, FOUR containers that must all fingerprint identically
    * under [[audioFingerprints]] -- the planted duplicate classes a
    * perceptual audio hash exists to catch:
    *
    *   - base = 4*doc_id: the m05 PCM (sample i = (md5 byte - 128)*256,
    *     i < 64 + (doc_id % 3)*16), minimal RIFF;
    *   - padded = 4*doc_id + 1: the same PCM behind 7 leading and 9
    *     trailing ZERO samples -- silence padding, defeated by the trim;
    *   - re-encoded = 4*doc_id + 2: identical PCM behind an extra
    *     LIST/INFO chunk -- container change, defeated by real
    *     chunk-walking decode;
    *   - quiet = 4*doc_id + 3: every sample at exactly half amplitude
    *     ((md5 byte - 128)*128 -- integer-exact quartered energies) --
    *     volume scaling, defeated by the mean-threshold's amplitude
    *     invariance.
    *
    * Distinct documents' fingerprints are md5-random 56-bit patterns
    * (expected cross-doc hamming 28), so a small `maxHamming` yields
    * exactly the within-document quartets. Every output is recomputable
    * from `md5(text)` in pure SQL -- the m06 oracle does.
    */
  def syntheticWavVariants(docs: DataFrame): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val dig = md5.digest(text.getBytes("UTF-8"))
          val rate = 8000 + (id % 4).toInt * 4000
          val n = 64 + (id % 3).toInt * 16
          def s(i: Int, scale: Int) = ((dig(i % 16) & 0xff) - 128) * scale
          val base = (0 until n).map(s(_, 256))
          val padded = Seq.fill(7)(0) ++ base ++ Seq.fill(9)(0)
          val quiet = (0 until n).map(s(_, 128))
          Seq(
            (id * 4, "audio", wavContainer(pcm16(base), rate, withList = false)),
            (id * 4 + 1, "audio", wavContainer(pcm16(padded), rate, withList = false)),
            (id * 4 + 2, "audio", wavContainer(pcm16(base), rate, withList = true)),
            (id * 4 + 3, "audio", wavContainer(pcm16(quiet), rate, withList = false)))
        }
      }.toDF("media_id", "kind", "content")
  }

  // ---------- video: YUV4MPEG2 (.y4m) uncompressed container ----------

  case class VideoFrameFeatures(media_id: Long, frame_idx: Int,
      width: Int, height: Int, ahash: Long)

  case class VideoFingerprint(media_id: Long, n_frames: Long, fp: Long)

  /** REAL video decode for the YUV4MPEG2 (`.y4m`) container — the
    * standard UNCOMPRESSED interchange format of the mjpegtools/ffmpeg
    * lineage (public spec: a plain-text stream header
    * `YUV4MPEG2 W<w> H<h> F<n>:<d> [Ip] [A<n>:<d>] [C<space>] [X…]`,
    * then per frame a `FRAME[ params]\n` marker followed by raw
    * planes). Parses the header tokens (geometry from W/H/C; frame
    * rate, interlacing, aspect, and X-extensions are format-legal
    * decoration that must not affect decode), walks the FRAME markers,
    * and returns the LUMA plane per frame — `Cmono` frames are one
    * w·h plane; `C420*` layouts carry w·h/2 trailing chroma bytes per
    * frame, skipped. Truncated or malformed streams → None (corrupt
    * media is routine in web corpora; diff input vs output ids for the
    * accounting, the [[imageFeatures]] convention).
    *
    * COMPRESSED codecs (H.264 & co.) remain the declared
    * [[StubDecoder]] seam — no codec ships in the JDK; this
    * container/raster plumbing is exactly what a JNI codec binding
    * drops into.
    */
  private[functions] def decodeY4m(
      bytes: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] = {
    def eol(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      i
    }
    try {
      val h0 = eol(0)
      if (h0 >= bytes.length) return None
      val toks = new String(bytes, 0, h0, "US-ASCII").split(" ")
      if (toks.isEmpty || toks(0) != "YUV4MPEG2") return None
      var w = 0
      var h = 0
      var chroma = "420jpeg" // the format's documented default
      toks.iterator.drop(1).filter(_.nonEmpty).foreach { t =>
        t.charAt(0) match {
          case 'W' => w = t.substring(1).toInt
          case 'H' => h = t.substring(1).toInt
          case 'C' => chroma = t.substring(1)
          case _   => () // F / Ip / A / X…: no effect on frame geometry
        }
      }
      if (w <= 0 || h <= 0) return None
      val luma = w * h
      val frameLen =
        if (chroma.startsWith("mono")) luma
        else if (chroma.startsWith("420")) luma + luma / 2
        else return None // 422/444 not needed by any caller yet: refuse loudly
      val frames = Array.newBuilder[Array[Byte]]
      var pos = h0 + 1
      while (pos < bytes.length) {
        val fl = eol(pos)
        if (fl >= bytes.length) return None // marker line without newline
        if (fl - pos < 5 ||
          new String(bytes, pos, 5, "US-ASCII") != "FRAME") return None
        val body = fl + 1
        if (body + frameLen > bytes.length) return None // truncated frame
        frames += java.util.Arrays.copyOfRange(bytes, body, body + luma)
        pos = body + frameLen
      }
      val out = frames.result()
      if (out.isEmpty) None else Some((w, h, out))
    } catch { case _: NumberFormatException => None }
  }

  /** Per-frame perceptual hashing over REAL y4m decode: every decoded
    * luma plane pools onto the [[PhashW]]×[[PhashH]] grid by the exact
    * integer area-average ([[poolTo]] — the image path's arithmetic,
    * unchanged) and emits its [[aHash]] bits. The video analogue of
    * [[imageFeatures]], one row per (video, frame): the downstream
    * join key for frame-level near-dup search and sampled-frame
    * captioning. Scale shape: an iterator pass per partition, output
    * rows ~32 bytes — the binary column dies at this stage boundary,
    * and a 2-hour video's frames parallelize as ROWS from here on.
    */
  def videoFrameFeatures(
      media: Dataset[MediaRow]): Dataset[VideoFrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeY4m(m.content).toSeq.flatMap { case (w, h, frames) =>
          frames.iterator.zipWithIndex.map { case (plane, idx) =>
            val px = new Array[Int](plane.length)
            var i = 0
            while (i < plane.length) { px(i) = plane(i) & 0xff; i += 1 }
            VideoFrameFeatures(m.media_id, idx, w, h,
              aHash(poolTo(w, h, px, PhashW, PhashH)))
          }
        }
      }
    }
  }

  /** Temporal video fingerprint — the [[audioFingerprints]] recipe
    * with per-frame TOTAL LUMA as the sample stream:
    *
    *   1. decode ([[decodeY4m]] — header-walked, not offset-assumed);
    *   2. trim leading/trailing all-black frames (black-frame padding
    *      is the video analogue of silence padding; an all-black video
    *      has no fingerprint — skipped like an undecodable blob);
    *   3. pool the trimmed luma-sum sequence onto [[AudioFpBits]]
    *      windows with the identical integer bound rule;
    *   4. WIDTH-NORMALIZED mean-threshold bits: bit j set iff
    *      m·e(j) > Σe·|window j| — i.e. the window's MEAN frame luma
    *      beats the stream's mean frame luma, cross-multiplied so the
    *      comparison stays integer-exact. The audio recipe's
    *      unnormalized `56·e > Σe` is wrong here: luma sums are
    *      all-positive with small relative variance (a frame's total
    *      brightness varies far less than audio window energies), so
    *      with the frame count near 56 the unequal window widths —
    *      identical for every same-length video — would dominate the
    *      bits and distinct videos would collide. Normalizing by width
    *      makes every bit content-driven, and the comparison is still
    *      BRIGHTNESS-INVARIANT (uniform luma scaling multiplies both
    *      sides equally), so a re-graded copy hashes identically.
    *
    * Exactness: Σe ≤ frames·w·h·255 and |window| ≤ frames/56 + 1, so
    * the cross products stay below 2⁶³ for anything up to ~8·10⁸
    * pixel-frames per video (a 2 h 1080p stream is ~3·10¹⁷ — in
    * bounds). Deterministic integer math throughout — the m08 oracle
    * recomputes the bits from md5-derived frames in pure SQL.
    */
  def videoFingerprints(
      media: Dataset[MediaRow]): Dataset[VideoFingerprint] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeY4m(m.content).flatMap { case (_, _, frames) =>
          val sums = frames.map { plane =>
            var s = 0L
            var i = 0
            while (i < plane.length) { s += plane(i) & 0xff; i += 1 }
            s
          }
          var f = 0
          while (f < sums.length && sums(f) == 0L) f += 1
          var l = sums.length - 1
          while (l >= f && sums(l) == 0L) l -= 1
          if (l < f) None
          else {
            val m0 = l - f + 1
            val e = new Array[Long](AudioFpBits)
            val wd = new Array[Long](AudioFpBits)
            var tot = 0L
            var j = 0
            while (j < AudioFpBits) {
              val x0 = f + (j.toLong * m0 / AudioFpBits).toInt
              val x1 = f + math.max((j.toLong * m0 / AudioFpBits).toInt + 1,
                ((j + 1).toLong * m0 / AudioFpBits).toInt)
              var s = 0L
              var i = x0
              while (i < x1) { s += sums(i); i += 1 }
              e(j) = s
              wd(j) = x1 - x0
              tot += s
              j += 1
            }
            var bits = 0L
            j = 0
            while (j < AudioFpBits) {
              if (m0.toLong * e(j) > tot * wd(j)) bits |= (1L << j)
              j += 1
            }
            Some(VideoFingerprint(m.media_id, m0.toLong, bits))
          }
        }
      }
    }
  }

  /** Video NEAR-DUP pairs within `maxHamming` over the 56-bit
    * [[videoFingerprints]] signature — black-padded, header-decorated,
    * and brightness-scaled copies land at hamming 0 while distinct
    * videos sit near hamming 28. Same pigeonhole-banded pair stage as
    * [[imageNearDupPairs]]/[[audioNearDupPairs]]: the near-dup triad
    * (image, audio, video) now shares one plan shape end to end.
    */
  def videoNearDupPairs(media: Dataset[MediaRow],
      maxHamming: Int = 4): DataFrame =
    Dedup.simhashPairs(
      videoFingerprints(media).toDF()
        .select(col("media_id").as("doc_id"), col("fp").as("simhash")),
      bits = AudioFpBits, maxHamming = maxHamming)

  /** Deterministic y4m fixtures for the m07 gate: per document, one
    * `Cmono` 8×7 stream of `56 + (doc_id % 3)·8` frames whose frame-f
    * pixel (x, y) is byte `(f + x + 2y) mod 16` of `md5(text)` masked
    * EVEN (`& 0xfe` — so the m08 half-brightness variant scales
    * exactly). Every gated output recomputes from `md5(text)` in pure
    * SQL, so a Spark-side fault in header parsing, frame walking, or
    * hash math fails the gate. media_id = doc_id.
    */
  def syntheticY4m(docs: DataFrame): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val dig = md5.digest(text.getBytes("UTF-8"))
          val n = 56 + (id % 3).toInt * 8
          (id, "video", y4mContainer(baseFrames(dig, n), decorated = false))
        }
      }.toDF("media_id", "kind", "content")
  }

  /** Deterministic y4m fixtures for the m08 NEAR-DUP gate: per
    * document, FOUR streams that must all fingerprint identically
    * under [[videoFingerprints]] — the planted duplicate classes a
    * temporal video hash exists to catch:
    *
    *   - base = 4·doc_id: the m07 frames, minimal header;
    *   - padded = 4·doc_id + 1: 5 leading and 3 trailing ALL-BLACK
    *     frames — intro/outro padding, defeated by the trim;
    *   - re-encoded = 4·doc_id + 2: identical frames behind a
    *     decorated header (`Ip A1:1 X…` tokens) — container change,
    *     defeated by real token-walking parse;
    *   - dimmed = 4·doc_id + 3: every pixel at exactly half luma
    *     (even base pixels, so integer halving is exact) — brightness
    *     grading, defeated by the mean-threshold's scale invariance.
    */
  def syntheticY4mVariants(docs: DataFrame): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val dig = md5.digest(text.getBytes("UTF-8"))
          val n = 56 + (id % 3).toInt * 8
          val base = baseFrames(dig, n)
          val black = Array.fill[Byte](PhashW * PhashH)(0)
          val padded = Array.fill(5)(black) ++ base ++ Array.fill(3)(black)
          val dimmed = base.map(_.map(b => ((b & 0xff) >> 1).toByte))
          Seq(
            (id * 4, "video", y4mContainer(base, decorated = false)),
            (id * 4 + 1, "video", y4mContainer(padded, decorated = false)),
            (id * 4 + 2, "video", y4mContainer(base, decorated = true)),
            (id * 4 + 3, "video", y4mContainer(dimmed, decorated = false)))
        }
      }.toDF("media_id", "kind", "content")
  }

  /** The m07/m08 fixture frame set: frame f's pixel (x, y) =
    * `md5 byte (f + x + 2y) mod 16`, masked even. */
  private def baseFrames(dig: Array[Byte], n: Int): Array[Array[Byte]] =
    Array.tabulate(n) { f =>
      val plane = new Array[Byte](PhashW * PhashH)
      var y = 0
      while (y < PhashH) {
        var x = 0
        while (x < PhashW) {
          plane(y * PhashW + x) =
            (dig((f + x + 2 * y) % 16) & 0xfe).toByte
          x += 1
        }
        y += 1
      }
      plane
    }

  /** A real YUV4MPEG2 container around mono luma planes; `decorated`
    * adds the format-legal Ip/A/X header tokens (the m05 LIST-chunk
    * analogue: a parser that assumes byte offsets instead of walking
    * tokens breaks on it).
    */
  private def y4mContainer(frames: Array[Array[Byte]],
      decorated: Boolean): Array[Byte] = {
    val header =
      if (decorated)
        s"YUV4MPEG2 W$PhashW H$PhashH F25:1 Ip A1:1 Cmono XGRAFT=fixture\n"
      else s"YUV4MPEG2 W$PhashW H$PhashH F25:1 Cmono\n"
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(header.getBytes("US-ASCII"))
    frames.foreach { f =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(f)
    }
    bos.toByteArray
  }

  /** Deterministic fake decode: stable per-content pseudo-features.
    * The `???`-shaped seam a real codec implementation replaces (for
    * COMPRESSED video — images decode for real via [[imageFeatures]],
    * WAV audio via [[audioFeatures]], uncompressed y4m video via
    * [[videoFrameFeatures]]/[[videoFingerprints]]).
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
