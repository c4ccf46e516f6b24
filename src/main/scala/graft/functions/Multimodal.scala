package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the Spark-side plumbing for
  * decode / feature-extract / frame-sample stages.
  *
  * The decode kernels themselves are STUBBED with a deterministic fake
  * (no image/audio codecs exist in this container) — what is real and
  * tested is everything Spark cares about at 100 TB: the schema contract,
  * the batch shape (mapPartitions over iterators, never per-row JVM
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

  /** Deterministic fake decode: stable per-content pseudo-features.
    * The `???`-shaped seam a real codec implementation replaces.
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
