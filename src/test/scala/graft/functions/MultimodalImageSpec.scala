package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Real image decode ([[Multimodal.imageFeatures]], javax.imageio) and
  * perceptual-hash near-dup: true dims, codec round-trip exactness,
  * resize invariance of the pooled hashes, hand-computed hash values,
  * and the banded-hamming pair stage. The m03/m04 gates check the same
  * pipeline against a DuckDB oracle that recomputes the hashes from
  * md5(text) in SQL.
  */
class MultimodalImageSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDs(n: Int) = {
    val docs = Tables.df(spark, sf(), "documents").filter(col("doc_id") < n)
    Multimodal.syntheticImages(docs).as[Multimodal.MediaRow]
  }

  test("imageFeatures: ImageIO decode extracts TRUE dims; a 2x nearest-" +
      "neighbor upscale pools back to identical aHash/dHash") {
    val feats = Multimodal.imageFeatures(mediaDs(12)).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.size == 24, "every planted PNG must decode")
    feats.keys.filter(_ % 2 == 0).foreach { b =>
      val (base, up) = (feats(b), feats(b + 1))
      assert((base.width, base.height) == (8, 7), s"true dims of $b")
      assert((up.width, up.height) == (16, 14), s"true dims of ${b + 1}")
      assert(base.ahash == up.ahash && base.dhash == up.dhash,
        s"resize must not move the perceptual hash (media $b)")
      assert(base.ahash >= 0 && base.ahash < (1L << 56),
        "56-bit signatures stay non-negative")
    }
  }

  test("hash math matches a hand-computed fixture (the oracle's SQL mirror)") {
    // pixels = md5("x") bytes cycled over 56 cells — exactly what
    // syntheticImages renders and what the m03 oracle recomputes
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest("x".getBytes("UTF-8"))
    val cells = Array.tabulate(56)(i => dig(i % 16) & 0xff)
    val sum = cells.map(_.toLong).sum
    var expA = 0L
    var expD = 0L
    for (i <- 0 until 56) {
      if (56L * cells(i) > sum) expA |= (1L << i)
      val r = i / 8
      val c = i % 8
      if (cells(i) > cells(r * 8 + (c + 1) % 8)) expD |= (1L << i)
    }
    assert(Multimodal.aHash(cells) == expA)
    assert(Multimodal.dHash(cells, 8, 7) == expD)
    // and end-to-end through PNG encode -> ImageIO decode -> pool
    val one = Seq((1L, "x")).toDF("doc_id", "text")
    val f = Multimodal.imageFeatures(
      Multimodal.syntheticImages(one).as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    assert(f(2L).ahash == expA && f(2L).dhash == expD,
      "codec round-trip must reproduce the exact pixel-derived hashes")
    assert(f(3L).ahash == expA && f(3L).dhash == expD)
  }

  test("undecodable blobs are skipped, not fatal") {
    val junk = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3)),
      Multimodal.MediaRow(2L, "image", Array.empty[Byte]))
      .toDS()
    val good = mediaDs(3)
    val out = Multimodal.imageFeatures(good.unionByName(junk)).collect()
    assert(out.map(_.media_id).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L),
      "the six real PNGs survive; the two junk blobs drop out")
  }

  test("imageNearDupPairs finds every planted resized duplicate at " +
      "hamming 0, via banded candidates (no cartesian)") {
    val media = mediaDs(20)
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 6)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = (0L until 20L).map(d => (d * 2, d * 2 + 1)).toSet
    val gotSet = got.map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(gotSet),
      s"missed planted dups: ${planted.diff(gotSet)}")
    assert(got.filter(p => planted((p._1, p._2))).forall(_._3 == 0),
      "a lossless re-encode + exact upscale is hamming 0")
    // completeness: banded pairs == brute-force pairs over the hashes
    val feats = Multimodal.imageFeatures(media).collect()
    val brute = (for {
      a <- feats; b <- feats
      if a.media_id < b.media_id
      if java.lang.Long.bitCount(a.ahash ^ b.ahash) <= 6
    } yield (a.media_id, b.media_id)).toSet
    assert(gotSet == brute, "pigeonhole banding must be recall-complete")
  }

  test("audioFeatures: real WAV container parse — true rate/count from " +
      "chunks, exact energy, LIST-chunk variant identical") {
    val docs = Tables.df(spark, sf(), "documents").filter(col("doc_id") < 12)
    val feats = Multimodal.audioFeatures(
        Multimodal.syntheticWavs(docs).as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.size == 24, "every fixture WAV must decode")
    feats.keys.filter(_ % 2 == 0).foreach { b =>
      val (base, variant) = (feats(b), feats(b + 1))
      val id = b / 2
      assert(base.sample_rate == 8000 + (id % 4) * 4000,
        s"true fmt-chunk rate of media $b")
      assert(base.n_samples == 64 + (id % 3) * 16,
        s"true data-chunk sample count of media $b")
      assert(base.duration_ms ==
        base.n_samples * 1000L / base.sample_rate)
      assert(base.energy > 0L)
      // identical PCM behind an extra LIST chunk: the decoder must walk
      // chunks, not assume offsets — all features identical but the id
      assert(variant.copy(media_id = b) == base,
        s"LIST-chunk container variant of media $b must decode equal")
    }
    // hand-check energy for one doc against the md5 derivation the
    // oracle uses: sample i = (md5byte(i%16) - 128) * 256
    val one = docs.filter(col("doc_id") === 0)
      .select(col("text")).collect().head.getString(0)
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(one.getBytes("UTF-8"))
    val n = 64
    val expected = (0 until n).map { i =>
      val s = ((dig(i % 16) & 0xff) - 128) * 256L
      s * s
    }.sum
    assert(feats(0L).energy == expected, "energy must equal the md5 math")
  }

  test("audioFingerprints: padding / container / amplitude invariance, " +
      "silence skipped, distinct signals distinct") {
    val docs = Tables.df(spark, sf(), "documents").filter(col("doc_id") < 12)
    val fps = Multimodal.audioFingerprints(
        Multimodal.syntheticWavVariants(docs).as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    assert(fps.size == 48, "every variant must fingerprint")
    (0L until 12L).foreach { id =>
      val quartet = (0 to 3).map(v => fps(id * 4 + v))
      // base / padded / re-encoded / quiet: identical 56-bit signature
      assert(quartet.map(_.fp).distinct.size == 1,
        s"doc $id: variants diverged: ${quartet.map(_.fp)}")
      // the trim means padded reports the same TRIMMED sample count
      assert(quartet.map(_.n_samples).distinct.size == 1,
        s"doc $id: trimmed counts diverged")
    }
    // distinct documents produce distinct, far-apart signatures
    val distinctFps = (0L until 12L).map(id => fps(id * 4).fp)
    assert(distinctFps.distinct.size == 12)
    for (a <- distinctFps; b <- distinctFps if a < b)
      assert(java.lang.Long.bitCount(a ^ b) > 4,
        "distinct docs must not collide within the near-dup radius")
    // all-silence audio has no fingerprint (skipped like undecodable)
    val silent = Seq(Multimodal.MediaRow(99L, "audio", {
      // reuse the fixture path: an all-zero PCM via a doc whose samples
      // are forced silent is simplest built by hand here
      val pcm = Array.fill[Byte](64)(0)
      def u32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def u16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      val fmt = "fmt ".getBytes("US-ASCII") ++ u32(16) ++ u16(1) ++ u16(1) ++
        u32(8000) ++ u32(16000) ++ u16(2) ++ u16(16)
      val data = "data".getBytes("US-ASCII") ++ u32(pcm.length) ++ pcm
      val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ data
      "RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body
    })).toDS()
    assert(Multimodal.audioFingerprints(silent).count() == 0)
  }

  test("audioNearDupPairs: banding recalls exactly the brute-force " +
      "hamming ball over the fingerprints") {
    val docs = Tables.df(spark, sf(), "documents").filter(col("doc_id") < 12)
    val media = Multimodal.syntheticWavVariants(docs).as[Multimodal.MediaRow]
    val got = Multimodal.audioNearDupPairs(media, maxHamming = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fps = Multimodal.audioFingerprints(media).collect()
    val brute = (for {
      a <- fps; b <- fps
      if a.media_id < b.media_id
      if java.lang.Long.bitCount(a.fp ^ b.fp) <= 4
    } yield (a.media_id, b.media_id)).toSet
    assert(got == brute, "pigeonhole banding must be recall-complete")
    // and the planted quartets are exactly the near-dup clusters
    assert(brute == (for {
      id <- 0L until 12L
      v1 <- 0 to 3; v2 <- 0 to 3 if v1 < v2
    } yield (id * 4 + v1, id * 4 + v2)).toSet)
  }

  test("audioFeatures skips undecodable and refuses multi-channel blobs") {
    val junk = Seq(
      Multimodal.MediaRow(1L, "audio", Array[Byte](1, 2, 3, 4)),
      Multimodal.MediaRow(2L, "audio",
        "RIFF0000WAVEjunk".getBytes("US-ASCII"))).toDS()
    assert(Multimodal.audioFeatures(junk).count() == 0)
    // a stereo WAV parses but is refused (no silent channel averaging)
    val stereo = {
      def u32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def u16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      val pcm = Array.fill[Byte](32)(7)
      val fmt = "fmt ".getBytes("US-ASCII") ++ u32(16) ++ u16(1) ++ u16(2) ++
        u32(8000) ++ u32(8000 * 4) ++ u16(4) ++ u16(16)
      val data = "data".getBytes("US-ASCII") ++ u32(pcm.length) ++ pcm
      val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ data
      "RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body
    }
    val ds = Seq(Multimodal.MediaRow(3L, "audio", stereo)).toDS()
    assert(Multimodal.audioFeatures(ds).count() == 0)
  }
}
