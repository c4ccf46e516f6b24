package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** REAL y4m video decode (`Multimodal.decodeY4m`) + per-frame hashing
  * and the temporal near-dup fingerprint. The m07/m08 gates prove the
  * arithmetic against the DuckDB oracle; here we pin container
  * robustness (decoration, chroma skipping, truncation), the planted
  * duplicate classes, and determinism.
  */
class MultimodalVideoSpec extends SparkSpec {
  import spark.implicits._

  private def y4m(header: String, frames: Array[Byte]*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write((header + "\n").getBytes("US-ASCII"))
    frames.foreach { f =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(f)
    }
    bos.toByteArray
  }

  private val plane2x2a = Array[Byte](10, 20, 30, 40)
  private val plane2x2b = Array[Byte](50, 60, 70, 80)

  test("decode: mono stream yields luma planes; decoration is ignored") {
    val plain = Multimodal.decodeY4m(
      y4m("YUV4MPEG2 W2 H2 F25:1 Cmono", plane2x2a, plane2x2b))
    assert(plain.isDefined)
    val (w, h, frames) = plain.get
    assert(w == 2 && h == 2 && frames.length == 2)
    assert(frames(0).sameElements(plane2x2a) && frames(1).sameElements(plane2x2b))

    val decorated = Multimodal.decodeY4m(
      y4m("YUV4MPEG2 W2 H2 F30000:1001 Ip A1:1 Cmono XYSCSS=1", plane2x2a))
    assert(decorated.isDefined && decorated.get._3.length == 1)
    assert(decorated.get._3.head.sameElements(plane2x2a))
  }

  test("decode: C420 chroma planes are skipped, luma extracted") {
    // 2x2 luma + 2 chroma bytes (w*h/2) per frame
    val f1 = plane2x2a ++ Array[Byte](99, 98)
    val f2 = plane2x2b ++ Array[Byte](97, 96)
    val out = Multimodal.decodeY4m(y4m("YUV4MPEG2 W2 H2 F25:1 C420jpeg", f1, f2))
    assert(out.isDefined)
    assert(out.get._3(0).sameElements(plane2x2a))
    assert(out.get._3(1).sameElements(plane2x2b))
    // C is optional: the format's default is 420jpeg
    val dflt = Multimodal.decodeY4m(y4m("YUV4MPEG2 W2 H2 F25:1", f1))
    assert(dflt.isDefined && dflt.get._3.head.sameElements(plane2x2a))
  }

  test("decode: corrupt streams are rejected, not mis-parsed") {
    assert(Multimodal.decodeY4m("not a video".getBytes).isEmpty)
    // truncated mid-frame
    val full = y4m("YUV4MPEG2 W2 H2 Cmono", plane2x2a)
    assert(Multimodal.decodeY4m(full.dropRight(2)).isEmpty)
    // zero frames
    assert(Multimodal.decodeY4m("YUV4MPEG2 W2 H2 Cmono\n".getBytes).isEmpty)
    // bad geometry token
    assert(Multimodal.decodeY4m(y4m("YUV4MPEG2 Wx H2 Cmono", plane2x2a)).isEmpty)
  }

  test("fingerprints: all four planted variants collapse to the base hash") {
    val docs = Seq((1L, "alpha doc"), (2L, "beta doc"), (7L, "gamma doc"))
      .toDF("doc_id", "text")
    val fps = Multimodal.videoFingerprints(
        Multimodal.syntheticY4mVariants(docs).as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f.fp).toMap
    assert(fps.size == 12)
    Seq(1L, 2L, 7L).foreach { d =>
      val quartet = (0 to 3).map(v => fps(d * 4 + v)).distinct
      assert(quartet.size == 1, s"doc $d variants diverged: $quartet")
    }
  }

  test("near-dup pairs: exactly the within-doc quartets at tight hamming") {
    val docs = Seq((1L, "alpha doc"), (2L, "beta doc"), (7L, "gamma doc"))
      .toDF("doc_id", "text")
    val pairs = Multimodal.videoNearDupPairs(
        Multimodal.syntheticY4mVariants(docs).as[Multimodal.MediaRow],
        maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.forall(_._3 == 0), s"planted variants must sit at hamming 0")
    val want = for {
      d <- Seq(1L, 2L, 7L); a <- 0 to 3; b <- (a + 1) to 3
    } yield (d * 4 + a, d * 4 + b)
    assert(pairs.map(p => (p._1, p._2)).sorted.toSeq == want.sorted,
      s"got ${pairs.toSeq}")
  }

  test("frame features: hashes match an independent per-frame reference") {
    val docs = Seq((3L, "delta doc")).toDF("doc_id", "text")
    val got = Multimodal.videoFrameFeatures(
        Multimodal.syntheticY4m(docs).as[Multimodal.MediaRow])
      .collect().map(f => f.frame_idx -> (f.width, f.height, f.ahash)).toMap
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest("delta doc".getBytes("UTF-8"))
    val n = 56 + (3 % 3) * 8
    assert(got.size == n)
    (0 until n).foreach { f =>
      val px = Array.tabulate(56)(i => dig((f + i % 8 + 2 * (i / 8)) % 16) & 0xfe)
      val sum = px.map(_.toLong).sum
      var bits = 0L
      px.indices.foreach(i => if (56L * px(i) > sum) bits |= (1L << i))
      assert(got(f) == ((8, 7, bits)), s"frame $f")
    }
  }

  test("deterministic across runs and partitioning") {
    val docs = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("doc_id", "text")
    def run(parts: Int) = Multimodal.videoFingerprints(
        Multimodal.syntheticY4mVariants(docs.repartition(parts))
          .as[Multimodal.MediaRow])
      .collect().map(f => (f.media_id, f.n_frames, f.fp)).sortBy(_._1).toSeq
    assert(run(1) == run(5))
  }
}
