package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class HyperBinarySpec extends SparkSpec {
  import spark.implicits._

  private val artifact = "/root/reference/complaints_by_bank.hyper"

  test("LZ4 block codec round-trips arbitrary and repetitive payloads") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      "abc".getBytes,
      Array.fill(10000)((rnd.nextInt(4) + 'a').toByte), // compressible
      Array.fill(5000)(rnd.nextInt().toByte), // incompressible
      Array.fill(64)(0.toByte),
      ("header" + "x" * 300 + "header" + "y" * 300).getBytes)
    cases.foreach { payload =>
      val comp = Lz4Block.compress(payload)
      val (back, consumed) = Lz4Block.decompress(comp, 0, payload.length)
      assert(back.sameElements(payload), s"round-trip failed at len ${payload.length}")
      assert(consumed == comp.length)
    }
    // repetitive data genuinely compresses (matches emitted, not all-literal)
    val rep = ("the quick brown fox " * 500).getBytes
    assert(Lz4Block.compress(rep).length < rep.length / 10)
  }

  test("committed reference artifact: magic, catalog JSONs, relations") {
    // Everything asserted here is the OBSERVABLE structure the writer
    // mirrors (HYPER_FORMAT.md) — reading the reference's committed
    // extract with our own parser.
    val data = Files.readAllBytes(java.nio.file.Paths.get(artifact))
    assert(new String(data, 0, 5) == "Hyper")
    assert(data(5) == 8 && data(8) == 1)

    val catalogs = HyperBinary.catalogJsons(artifact)
    assert(catalogs.length == 2, "expected live catalog + genesis copy")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val live = mapper.readTree(catalogs.head)
    val genesis = mapper.readTree(catalogs(1))
    assert(live.get("compressionMethod").asText() == "lz4")
    assert(genesis.get("relations").size() == 0, "genesis catalog is empty")

    val rels = live.get("relations")
    assert(rels.size() == 2)
    assert(rels.get(0).get("name").asText() == "complaint_counts_by_company")
    assert(rels.get(1).get("name").asText() == "num_of_complaints_per_company")
    val attrs0 = rels.get(0).get("attributes")
    assert(attrs0.size() == 4)
    assert(attrs0.get(0).get("name").asText() == "index")
    assert(attrs0.get(0).get("type").toString == """["Varchar",1000,"nullable"]""")
    assert(attrs0.get(3).get("name").asText() == "number_of_complaints")
    assert(attrs0.get(3).get("type").toString == """["Integer","nullable"]""")
  }

  test("writer output round-trips schema, rows, and nulls bit-exactly") {
    val ts = java.sql.Timestamp.valueOf("2024-03-05 07:08:09.123456")
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("t", TimestampType),
      StructField("dt", DateType)))
    val rows = Seq(
      Row("héllo ~%{}", 1, 10000000000L, 2.5, true, ts, java.sql.Date.valueOf("2024-03-05")),
      Row(null, null, null, null, null, null, null),
      Row("", 0, -1L, -0.0, false, ts, java.sql.Date.valueOf("1969-12-31")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val small = Seq(("k", 7)).toDF("name", "n")
    val path = Files.createTempDirectory("hyperbin").resolve("out.hyper").toString
    HyperBinary.write(path, Seq("t1" -> df, "t2" -> small))

    val back = HyperBinary.read(path)
    assert(back.map(_._1) == Seq("t1", "t2"))
    val (_, schema1, rows1) = back.head
    assert(schema1.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(rows1.map(_.toSeq).toSeq == rows.map(_.toSeq))
    val (_, schema2, rows2) = back(1)
    assert(schema2.fieldNames.toSeq == Seq("name", "n") &&
      rows2.map(_.toSeq).toSeq == Seq(Seq("k", 7)))

    // nullCounts in the catalog reflect the data (observable-structure
    // fidelity: the artifact records real per-column null counts)
    val live = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(HyperBinary.catalogJsons(path).head)
    assert(live.get("relations").get(0).get("nullCounts").toString == "[1,1,1,1,1,1,1]")
  }

  test("decimal columns round-trip as Numeric(p,s); >18 digits error clearly") {
    val schema = StructType(Seq(
      StructField("k", StringType),
      StructField("amt", DecimalType(18, 2))))
    val rows = Seq(
      Row("a", new java.math.BigDecimal("12345.67")),
      Row("b", null),
      Row("c", new java.math.BigDecimal("-0.01")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val path = Files.createTempDirectory("hyperbin-dec").resolve("dec.hyper").toString
    HyperBinary.write(path, Seq("t" -> df))
    val (_, backSchema, backRows) = HyperBinary.read(path).head
    assert(backSchema("amt").dataType == DecimalType(18, 2))
    assert(backRows.map(_.toSeq).toSeq == rows.map(_.toSeq))
    // catalog carries the inferred Numeric type array
    assert(HyperBinary.catalogJsons(path).head.contains("""["Numeric", 18, 2, "nullable"]"""))

    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(new java.math.BigDecimal("1.5"))), 1),
      StructType(Seq(StructField("x", DecimalType(38, 10)))))
    val err = intercept[IllegalArgumentException] {
      HyperBinary.write(path, Seq("t" -> wide))
    }
    assert(err.getMessage.contains("18-digit"))
  }

  test("row cap: oversized exports error clearly, capped exports still round-trip") {
    import org.apache.spark.sql.functions.col
    val big = spark.range(0, 50).select(col("id"))
    val path = Files.createTempDirectory("hyperbin-cap").resolve("cap.hyper").toString
    val err = intercept[IllegalArgumentException] {
      HyperBinary.write(path, Seq("big" -> big.toDF()), maxRows = 49)
    }
    assert(err.getMessage.contains("export cap") && err.getMessage.contains("parquet"))
    // exactly at the cap is fine, and the bounded collect is a LIMIT —
    // no full materialization happened for the refused table either
    HyperBinary.write(path, Seq("big" -> big.toDF()), maxRows = 50)
    assert(HyperBinary.read(path).head._3.length == 50)
  }

  test("writer catalog matches the artifact's relations for the same schema") {
    // Rebuild the committed extract's two tables from their observed
    // schema (hyperd.log CREATE TABLE trace / golden DDL) and compare
    // our catalog's relation entries field-by-field with the artifact's
    // — oids included, since ours are assigned the same way (10004+i).
    val t1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 1),
      StructType(Seq(
        StructField("index", StringType), StructField("company", StringType),
        StructField("product", StringType),
        StructField("number_of_complaints", IntegerType))))
    val t2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 1),
      StructType(Seq(
        StructField("consumer_complaints.xlsx_company", StringType),
        StructField("consumer_complaints.xlsx_number_of_complaints", IntegerType),
        StructField("consumer_complaints1.xlsx_company", StringType),
        StructField("consumer_complaints1.xlsx_number_of_complaints", IntegerType))))
    val path = Files.createTempDirectory("hyperbin").resolve("golden.hyper").toString
    HyperBinary.write(path,
      Seq("complaint_counts_by_company" -> t1, "num_of_complaints_per_company" -> t2))

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val ours = mapper.readTree(HyperBinary.catalogJsons(path).head).get("relations")
    val theirs = mapper.readTree(HyperBinary.catalogJsons(artifact).head).get("relations")
    for (r <- 0 until 2; field <- Seq("oid", "name", "owner", "parent",
        "attributes", "partitionKey", "partitionedRelation", "type")) {
      assert(ours.get(r).get(field) == theirs.get(r).get(field),
        s"relation $r field $field differs: ${ours.get(r).get(field)} vs ${theirs.get(r).get(field)}")
    }
    // nullCounts: ours are 0 (no rows), artifact's observed are all 0 too
    assert(ours.get(0).get("nullCounts").toString ==
      theirs.get(0).get("nullCounts").toString)
  }

  test("frame algorithm is raw CRC32C: every known artifact frame reproduces") {
    // Round-5 identification (HYPER_FORMAT.md §3): the engine's 32-bit
    // frame values are CRC32C with NO pre/post inversion. Each assertion
    // recomputes a frame from the committed artifact's own bytes with
    // our implementation and compares with the stored value.
    val data = Files.readAllBytes(java.nio.file.Paths.get(artifact))
    val buf = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)

    // header pages are self-verifying: last u32 = crc of first 4092
    // bytes, so the whole 4 KiB page CRCs to zero
    assert(buf.getInt(0x0ffc) == HyperBinary.crc32cRaw(data, 0x0000, 0x0ffc))
    assert(buf.getInt(0x1ffc) == HyperBinary.crc32cRaw(data, 0x1000, 0x1ffc))
    assert(HyperBinary.crc32cRaw(data, 0x0000, 0x1000) == 0)
    assert(HyperBinary.crc32cRaw(data, 0x1000, 0x2000) == 0)

    // live catalog: frame directly after the '~' covers JSON + '~'
    var tilde = 0x2000
    while (data(tilde) != '~') tilde += 1
    assert(buf.getInt(tilde + 1) == HyperBinary.crc32cRaw(data, 0x2000, tilde + 1))

    // first data block: frame covers the u32 length word + LZ4 stream
    val uncompLen = buf.getInt(0x2880)
    val (_, consumed) = Lz4Block.decompress(data, 0x2884, uncompLen)
    assert(buf.getInt(0x2884 + consumed) ==
      HyperBinary.crc32cRaw(data, 0x2880, 0x2884 + consumed))

    // genesis: header-block frame at +0x30 covers the block's first 0x30
    // bytes; the genesis catalog (at +0x40, NO '~') is framed over the
    // JSON alone
    var g = 0
    while (!(data(g) == 'H' && data(g + 1) == 'y' && data(g + 2) == 'p' &&
      data(g + 3) == 'e' && data(g + 4) == 'r' && data(g + 5) == 'D' &&
      data(g + 6) == 'B' && data(g + 7) == 0)) g += 1
    assert(buf.getInt(g + 0x30) == HyperBinary.crc32cRaw(data, g, g + 0x30))
    val gjLen = 1005 // brace-matched genesis JSON length in the artifact
    assert(buf.getInt(g + 0x40 + gjLen) ==
      HyperBinary.crc32cRaw(data, g + 0x40, g + 0x40 + gjLen))

    // and our writer's output satisfies the same page property
    val df = Seq(("a", 1), ("b", 2)).toDF("s", "n")
    val path = Files.createTempDirectory("hyperbin").resolve("crc.hyper").toString
    HyperBinary.write(path, Seq("t" -> df))
    val ours = Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(HyperBinary.crc32cRaw(ours, 0x0000, 0x1000) == 0)
    assert(HyperBinary.crc32cRaw(ours, 0x1000, 0x2000) == 0)
  }

  test("reference artifact's table-1 data block decodes with our LZ4 codec") {
    // The strongest row-level check available without the proprietary
    // directory spec: the artifact's first data block (offset 0x2880,
    // u32 uncompressed-length prefix) decompresses with the public LZ4
    // block algorithm into a payload that starts with the table's row
    // count (6 — matching hyperd.log's COPY rows) and embeds the
    // table's string values.
    val data = Files.readAllBytes(java.nio.file.Paths.get(artifact))
    val buf = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val uncompLen = buf.getInt(0x2880)
    val (payload, _) = Lz4Block.decompress(data, 0x2884, uncompLen)
    assert(java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .getLong(0) == 6L, "block row count")
    val text = new String(payload, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(text.contains("consumer_complaints") && text.contains("consumer_complaints1"))

    // the further 0x100-strided blocks (HYPER_FORMAT.md §3 item 2)
    // decode and frame-verify the same way: 0x2980 carries the
    // product-column dictionary, 0x2a80 the numeric columns
    for ((off, marker) <- Seq(0x2980 -> Some("Mortgage"), 0x2a80 -> None)) {
      val ul = buf.getInt(off)
      val (p, consumed) = Lz4Block.decompress(data, off + 4, ul)
      assert(java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .getLong(0) == 6L, s"row count at $off")
      assert(buf.getInt(off + 4 + consumed) ==
        HyperBinary.crc32cRaw(data, off, off + 4 + consumed), s"frame at $off")
      marker.foreach(m => assert(
        new String(p, java.nio.charset.StandardCharsets.ISO_8859_1).contains(m)))
    }
  }
}
