package graft.sinks

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Native decoder for the column records inside the reference's committed
  * `complaints_by_bank.hyper` — the round-6 follow-up to round 5's frame
  * cracking (see HYPER_FORMAT.md). Everything here was reverse-read from
  * the artifact's own bytes; record grammars are verified structurally
  * (frame checksums where present, dictionary/offset invariants
  * otherwise). This is what upgrades the `.hyper` work from
  * "container reproduces" to "the data itself is readable": it turns the
  * artifact into golden ROWS, which HyperArtifactParitySpec compares
  * against a full Pipeline.run of the reference's committed queries
  * (reference run_main_example.py:14-23).
  *
  * Record grammars identified (HYPER_FORMAT.md §4):
  *
  *   - Varchar column block (LZ4-framed in the directory, or raw when
  *     LZ4 would not shrink it): u64 rowCount; u64 section pointer A at
  *     +0x08; u64 dictCount at A+0x28; dictCount dictionary entries at
  *     A+0x30, each a u32 = (u8 length | u24 heap offset), values in
  *     SORTED order, strings of length <= 3 inlined in the offset bytes;
  *     the per-row dictionary-id stream bit-packed MSB-first with
  *     width = ceil(log2(dictCount)) at the next 16-aligned offset after
  *     the entries; the string heap at the next 16-aligned offset after
  *     the id stream (min value first, max second, rest in sorted order).
  *   - Integer column block: u64 rowCount; type tag 7 at +0x18;
  *     i32 min/max at +0x30/+0x34; u64 distinct-value count at +0x2040;
  *     frame-of-reference deltas (value = min + u8 delta) at +0x2050.
  *   - Constant-string record (single distinct value, stored inline in
  *     the directory): u64 rowCount; tag 0x32 at +0x18; u64 length at
  *     +0x30; UTF-8 bytes at +0x40; raw-CRC32C frame over the record's
  *     first 0x50 bytes at +0x50.
  *
  * What is still inferred rather than identified: the column→block
  * mapping. Blocks appear in column order per table except when a large
  * block overflows the directory into the data-page region (the second
  * company column lands at 0x8540, past the genesis block), so relations
  * are matched to decoded columns by (rowCount group, attribute type,
  * position among same-typed attributes). For the committed artifact the
  * assignment is unambiguous: the two Varchar columns of table 2 are
  * byte-identical, as are its two Integer columns.
  */
object HyperArtifact {

  /** One decoded column record: file offset, row count, and values
    * (String or Int, no nulls — the artifact's nullCounts are all 0; a
    * record with nulls would fail the structural checks and be reported
    * missing rather than silently misdecoded).
    */
  final case class DecodedColumn(offset: Long, rowCount: Int, values: IndexedSeq[Any]) {
    def isString: Boolean = values.headOption.exists(_.isInstanceOf[String])
  }

  /** A column→block binding record from the page region (identified
    * round 6 by searching the file for every block offset as a u64):
    *
    *   u64 0x0004000000000000 | ordinal   (1-based column position)
    *   u32 0                              (reserved, 0 in all 8)
    *   u32 tableIndex                     (0-based catalog relation index)
    *   u64 payloadLength                  (framed record length)
    *   u64 fileOffset                     (where the column block lives)
    *   u64 slotSize                       (allocated span to next block)
    *   u64 flags                          (bit 0 set; bit 8 = LZ4)
    *
    * All 8 of the artifact's blocks have exactly one such record; the
    * (tableIndex, ordinal) pairs reproduce the DDL column order of both
    * relations (table 2's third column is the block that overflowed to
    * 0x8540), the LZ4 flag bit matches the framing of every block, and
    * offset+slotSize tiles onto the next directory-resident block.
    *
    * ROUND 7: these records turned out to be entries of the page-index
    * OBJECT ARENA — see [[readObjectArena]], which supersedes the raw
    * scan whenever the arena validates.
    */
  final case class ColumnBinding(recordAt: Long, tableIndex: Int, ordinal: Int,
      payloadLen: Long, blockOffset: Long, slotSize: Long, lz4: Boolean)

  /** One entry of the object arena — the page/object-store index layer
    * identified in round 7 (HYPER_FORMAT.md §3 item 4, now solved for
    * READING). The artifact's directory index is an open-addressed hash
    * map rooted at header word 0x40:
    *
    *   u64 at 0x40            → arena descriptor offset (0xa540)
    *   u64 at descriptor      = capacity exponent k (8 → 256 slots)
    *   descriptor+8           = slot array, 2^k slots × 0x30 bytes,
    *                            zero slot = empty
    *
    * Each occupied slot holds one record in the round-6 binding grammar
    * `[u64 type<<48|ordinal][u32 0][u32 tableIndex][u64 len][u64 off]
    * [u64 slotSize][u64 flags]`, generalized over OBJECT TYPES:
    *
    *   type 1 = HyperDB genesis header (off 0x5080, len 0x30)
    *   type 2 = catalog JSON (live 0x2000 in the live arena; the
    *            genesis copy 0x50c0 in the genesis arena)
    *   type 3 = per-table aux record `[u64 rowCount][u32 2][u32 crc]`
    *   type 4 = ordinal 0: row-count record; ordinal n ≥ 1: column n's
    *            block (exactly the round-6 ColumnBinding rows)
    *   type 5 = per-table 1-byte state flag (0 in the artifact)
    *
    * Evidence: walking the artifact's live arena yields exactly 16
    * self-consistent records and zero junk slots; the genesis page
    * carries a second arena of the same geometry at 0x54c0 (descriptor
    * value 8 again) holding exactly the genesis-state objects (types 1
    * and 2), and ends precisely at the 0x1ada1ada page record (0x84c8).
    * The SAME key lands in the SAME slot in both arenas (type 1 → slot
    * 175, type 2 → slot 95), so slot choice is a pure hash of the key
    * (type, ordinal, tableIndex) — insertion-order free. The hash
    * function itself is the one field that resists identification from
    * a single sample (the 16 key→slot pairs exclude CRC32/CRC32C [4
    * init/final variants], FNV-1a 32/64, xxHash64 [seeds 0, 1],
    * Murmur2-64A [3 seeds], Murmur3/SplitMix/Fibonacci finalizers,
    * over 7 key serializations × 8-bit windows at every byte shift) —
    * so READING walks all 2^k slots (order-insensitive, complete),
    * while [[writeNative]] places records with its own documented hash:
    * hyperd would have to probe-scan our arena as we scan its.
    */
  final case class ObjectRecord(slot: Int, recordAt: Long, objType: Int,
      ordinal: Int, tableIndex: Int, payloadLen: Long, blockOffset: Long,
      slotSize: Long, lz4: Boolean)

  /** Walk the object arena rooted at header word 0x40. Returns all
    * occupied slots, or empty when the pointer / exponent / any slot
    * fails validation (corrupt or foreign files fall back to the
    * round-6 full scan in [[decodeTables]]).
    */
  def readObjectArena(data: Array[Byte]): Seq[ObjectRecord] = {
    if (data.length < 0x58) return Seq.empty
    val ptr = u64(data, 0x40)
    if (ptr < 0x60 || ptr + 8 >= data.length) return Seq.empty
    // header words 0x48/0x50 (identified r7): frame offset and total
    // size of the arena region — when they look like that (frame
    // inside a sane region that fits the file) the region's raw-CRC32C
    // frame must verify; the artifact's does (0x3070/0x3080,
    // crc@0xd5b0 over [0xa540, 0xd5b0)). Files whose header words
    // don't match the shape (e.g. HyperBinary.write output) skip the
    // check and fall through to per-slot validation.
    val frameOff = u64(data, 0x48)
    val regionSize = u64(data, 0x50)
    if (frameOff > 0x40 && frameOff + 4 <= regionSize &&
        regionSize <= (1 << 24) && ptr + regionSize <= data.length) {
      val at = (ptr + frameOff).toInt
      val want = u32(data, at)
      if (want != 0 &&
          want != HyperBinary.crc32cRaw(data, ptr.toInt, at)) return Seq.empty
    }
    readObjectArenaAt(data, ptr)
  }

  /** Walk an arena whose descriptor (capacity-exponent u64) sits at
    * `ptr` — the live arena via header 0x40, or the genesis arena at
    * its fixed genesis-page position.
    */
  def readObjectArenaAt(data: Array[Byte], ptr: Long): Seq[ObjectRecord] = {
    if (ptr < 0 || ptr + 8 > data.length) return Seq.empty
    val k = u64(data, ptr.toInt)
    if (k < 1 || k > 12) return Seq.empty
    val cap = 1 << k.toInt
    val base = ptr + 8
    if (base + cap.toLong * 0x30 > data.length) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[ObjectRecord]
    var s = 0
    while (s < cap) {
      val p = (base + s * 0x30L).toInt
      val w0 = u64(data, p)
      if (w0 != 0L) {
        val t = ((w0 >>> 48) & 0xffffL).toInt
        val ord = (w0 & 0xffffL).toInt
        val mid = (w0 >>> 16) & 0xffffffffL
        val len = u64(data, p + 0x10)
        val off = u64(data, p + 0x18)
        val slotSz = u64(data, p + 0x20)
        val flags = u64(data, p + 0x28)
        val ok = t >= 1 && t <= 15 && mid == 0 && u32(data, p + 8) == 0 &&
          u32(data, p + 0xc) >= 0 && u32(data, p + 0xc) < (1 << 16) &&
          len > 0 && off > 0 && off + len <= data.length && len <= slotSz &&
          (flags & 1L) == 1L
        // one malformed occupied slot disqualifies the whole arena —
        // better to fall back to the scan than to decode half an index
        if (!ok) return Seq.empty
        out += ObjectRecord(s, p.toLong, t, ord, u32(data, p + 0xc),
          len, off, slotSz, (flags & 0x100L) != 0)
      }
      s += 1
    }
    out.toSeq
  }

  /** Scan for [[ColumnBinding]] records: 8-aligned u64s with the
    * 0x0004 tag whose offset/length/slot words are self-consistent.
    */
  def scanBindings(data: Array[Byte]): Seq[ColumnBinding] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ColumnBinding]
    var pos = 0
    while (pos + 0x30 <= data.length) {
      val w0 = u64(data, pos)
      if ((w0 & 0xffffffffffff0000L) == 0x0004000000000000L && (w0 & 0xffffL) >= 1 &&
          u32(data, pos + 8) == 0 && u32(data, pos + 0xc) >= 0 &&
          u32(data, pos + 0xc) < (1 << 16)) {
        val len = u64(data, pos + 0x10)
        val off = u64(data, pos + 0x18)
        val slot = u64(data, pos + 0x20)
        val flags = u64(data, pos + 0x28)
        if (len > 0 && len <= slot && off > 0 && off + len <= data.length &&
            (flags & 1L) == 1L)
          out += ColumnBinding(pos.toLong, u32(data, pos + 0xc),
            (w0 & 0xffffL).toInt, len, off, slot, (flags & 0x100L) != 0)
      }
      pos += 8
    }
    out.toSeq
  }

  private def u64(b: Array[Byte], o: Int): Long =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong(o)
  private def u32(b: Array[Byte], o: Int): Int =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt(o)
  private def align16(x: Int): Int = (x + 15) / 16 * 16

  /** Parse a varchar column block from `pay` (a decompressed LZ4 payload
    * or a raw in-file region). Returns values plus the payload length
    * actually consumed, or None if the invariants don't hold.
    */
  private def parseVarchar(pay: Array[Byte]): Option[(Int, IndexedSeq[Any], Int)] = {
    if (pay.length < 0x40) return None
    val n = u64(pay, 0)
    // the id stream needs ceil(n·width/8) bytes inside the payload, so
    // any genuine block has n ≤ 8·payload — rejecting larger values here
    // keeps a garbage u64 from driving a huge row-array allocation
    if (n <= 0 || n > pay.length.toLong * 8) return None
    val a = u64(pay, 8)
    if (a < 0x30 || a + 0x38 >= pay.length) return None
    val dictCount = u64(pay, a.toInt + 0x28)
    if (dictCount <= 0 || dictCount > n || dictCount >= (1 << 24)) return None
    val dc = dictCount.toInt
    val entriesAt = a.toInt + 0x30
    if (entriesAt + 4L * dc > pay.length) return None
    val raw = Array.tabulate(dc)(k => u32(pay, entriesAt + 4 * k))
    val idsAt = align16(entriesAt + 4 * dc)
    val width = math.max(1, 32 - Integer.numberOfLeadingZeros(dc - 1))
    // Long arithmetic: n is only bounded by 8·payload (~2^27), so
    // n·width can overflow Int and a garbage candidate would produce a
    // negative idBytes / bogus heapAt instead of a clean rejection
    val idBytesL = (n * width + 7) / 8
    if (idsAt + idBytesL > pay.length) return None
    val idBytes = idBytesL.toInt
    val heapAt = align16(idsAt + idBytes)
    var heapNeed = 0
    raw.foreach { w =>
      val len = w & 0xff
      if (len > 3) heapNeed = math.max(heapNeed, (w >>> 8) + len)
    }
    if (heapAt + heapNeed > pay.length) return None
    val dict = new Array[String](dc)
    var k = 0
    while (k < dc) {
      val w = raw(k)
      val len = w & 0xff
      val s =
        if (len <= 3) {
          val bs = Array.tabulate(len)(i => ((w >>> (8 * (i + 1))) & 0xff).toByte)
          new String(bs, StandardCharsets.UTF_8)
        } else {
          val off = w >>> 8
          new String(pay, heapAt + off, len, StandardCharsets.UTF_8)
        }
      if (k > 0 && dict(k - 1).compareTo(s) > 0) return None // sorted dictionary
      dict(k) = s
      k += 1
    }
    val out = new Array[Any](n.toInt)
    var r = 0
    while (r < n.toInt) {
      var v = 0
      var b = 0
      val bp = r * width
      while (b < width) {
        val bit = (pay(idsAt + (bp + b) / 8) >>> (7 - ((bp + b) % 8))) & 1
        v = (v << 1) | bit
        b += 1
      }
      if (v >= dc) return None
      out(r) = dict(v)
      r += 1
    }
    Some((n.toInt, out.toIndexedSeq, heapAt + heapNeed))
  }

  /** Parse an integer column block (type tag 7, FOR byte deltas). */
  private def parseInt(pay: Array[Byte]): Option[(Int, IndexedSeq[Any], Int)] = {
    if (pay.length < 0x2050) return None
    val n = u64(pay, 0)
    if (n <= 0 || n >= Int.MaxValue) return None
    if (u64(pay, 0x18) != 7) return None
    val min = u32(pay, 0x30)
    val max = u32(pay, 0x34)
    if (min > max) return None
    // only the byte-wide delta stream is observed; wider ranges would
    // need a wider width rule we cannot identify from this artifact
    if (max.toLong - min.toLong > 255) return None
    val distinct = u64(pay, 0x2040)
    if (0x2050L + n > pay.length) return None
    val out = new Array[Any](n.toInt)
    val seen = scala.collection.mutable.HashSet.empty[Int]
    var r = 0
    while (r < n.toInt) {
      val v = min + (pay(0x2050 + r) & 0xff)
      if (v > max) return None
      out(r) = v
      seen += v
      r += 1
    }
    if (seen.size != distinct) return None
    Some((n.toInt, out.toIndexedSeq, 0x2050 + n.toInt))
  }

  /** Parse a constant-string record at file offset `off` (frame-verified:
    * raw CRC32C over the record's first 0x50 bytes).
    */
  private def parseConstString(data: Array[Byte], off: Int): Option[(Int, IndexedSeq[Any])] = {
    if (off + 0x54 > data.length) return None
    val n = u64(data, off)
    if (n <= 0 || n >= Int.MaxValue) return None
    if (u64(data, off + 0x18) != 0x32) return None
    val len = u64(data, off + 0x30)
    if (len <= 0 || off + 0x40 + len > data.length || len > 0x10) return None
    if (u32(data, off + 0x50) != HyperBinary.crc32cRaw(data, off, off + 0x50)) return None
    val s = new String(data, off + 0x40, len.toInt, StandardCharsets.UTF_8)
    Some((n.toInt, IndexedSeq.fill(n.toInt)(s)))
  }

  /** Scan the whole file for decodable column records, in offset order.
    * Tries, at each 16-aligned offset: an LZ4-framed record (frame
    * checksum verified, payload classified varchar-then-int), a
    * frame-verified constant-string record, and a raw (uncompressed)
    * varchar block validated by its structural invariants.
    *
    * `rawWindow` maps a file offset to that record's known payload
    * length (from a [[ColumnBinding]]): a raw block LARGER than the
    * 64 KiB default window — which [[writeNative]] emits whenever LZ4
    * fails to shrink a big block — is only findable through its
    * binding, so [[decodeTables]] scans bindings first and feeds them
    * here. Unknown offsets keep the default window, sized to the
    * committed artifact's biggest raw block.
    */
  def scanColumns(data: Array[Byte]): Seq[DecodedColumn] =
    scanColumns(data, Map.empty)

  def scanColumns(data: Array[Byte],
      rawWindow: Map[Long, Int]): Seq[DecodedColumn] = {
    val cols = scala.collection.mutable.ArrayBuffer.empty[DecodedColumn]
    var pos = 0x2000
    while (pos + 16 < data.length) {
      var advance = 16
      val ln = u32(data, pos)
      var hit: Option[(Int, IndexedSeq[Any], Int)] = None
      if (ln > 0 && ln < (1 << 24) && pos + 8 < data.length) {
        try {
          val (pay, consumed) = Lz4Block.decompress(data, pos + 4, ln)
          val frameAt = pos + 4 + consumed
          if (frameAt + 4 <= data.length &&
              u32(data, frameAt) == HyperBinary.crc32cRaw(data, pos, frameAt) &&
              u32(data, frameAt) != 0) {
            hit = parseVarchar(pay).orElse(parseInt(pay))
            if (hit.isDefined) advance = align16(frameAt + 4) - pos
          }
        } catch { case _: RuntimeException | _: IndexOutOfBoundsException => }
      }
      if (hit.isEmpty) {
        parseConstString(data, pos) match {
          case Some((n, vals)) =>
            hit = Some((n, vals, 0x54))
            advance = 0x60
          case None =>
            // Cheap header plausibility BEFORE materializing a window —
            // without this the scan copies 64 KiB at nearly every
            // 16-byte step through non-record regions (fileSize×64 KiB
            // ≈ quadratic on large writeNative outputs). Both checks
            // are implied by the parsers' own invariants, so no record
            // the old scan found is lost: a varchar block has
            // rowCount > 0 and its section pointer A within the
            // window; an int block carries type tag 7 at +0x18.
            val winLen = math.max(1 << 16, rawWindow.getOrElse(pos.toLong, 0))
            val n0 = u64(data, pos)
            val varcharish = pos + 16 <= data.length && {
              val a0 = u64(data, pos + 8)
              a0 >= 0x30 && a0 + 0x38 < winLen
            }
            val intish = pos + 0x20 <= data.length && u64(data, pos + 0x18) == 7L
            if (n0 > 0 && n0 <= winLen.toLong * 8 && (varcharish || intish)) {
              val window = java.util.Arrays.copyOfRange(
                data, pos, math.min(data.length, pos + winLen))
              hit = parseVarchar(window).orElse(parseInt(window))
              hit.foreach { case (_, _, consumed) => advance = align16(consumed) }
            }
        }
      }
      hit.foreach { case (n, vals, _) =>
        cols += DecodedColumn(pos.toLong, n, vals)
      }
      pos += advance
    }
    cols.toSeq
  }

  /** Decode one column block directly at its arena-recorded offset —
    * the round-7 fast path: with the object arena in hand there is
    * nothing to search for, so decode cost is proportional to the DATA,
    * not the file size. `len` is the record's payloadLength (the raw
    * parse window); `lz4` is the record's flag bit 8.
    */
  private def decodeColumnAt(data: Array[Byte], off: Int, len: Int,
      lz4: Boolean): Option[(Int, IndexedSeq[Any])] = {
    if (off < 0 || off >= data.length) return None
    if (lz4) {
      try {
        val ln = u32(data, off)
        if (ln <= 0 || ln >= (1 << 24)) return None
        val (pay, consumed) = Lz4Block.decompress(data, off + 4, ln)
        val frameAt = off + 4 + consumed
        if (frameAt + 4 > data.length ||
            u32(data, frameAt) != HyperBinary.crc32cRaw(data, off, frameAt))
          return None
        parseVarchar(pay).orElse(parseInt(pay)).map { case (n, v, _) => (n, v) }
      } catch { case _: RuntimeException | _: IndexOutOfBoundsException => None }
    } else {
      parseConstString(data, off).orElse {
        val window = java.util.Arrays.copyOfRange(
          data, off, math.min(data.length, off + math.max(len, 0x60)))
        parseVarchar(window).orElse(parseInt(window)).map { case (n, v, _) => (n, v) }
      }
    }
  }

  // ---- native-encoding writer ------------------------------------------

  /** Encode one STRING column in the artifact's own varchar-block
    * layout (§3 item 2 of HYPER_FORMAT.md): sorted dictionary with
    * (u8 len | u24 offset) entries and ≤3-char strings inlined,
    * MSB-first bit-packed id stream, heap ordered min, max, then the
    * middle entries in sorted order. Everything [[parseVarchar]] reads
    * round-trips; the stats words the artifact carries at +0x30 are
    * left zero (not read by any identified consumer).
    */
  private def encodeVarcharBlock(values: Seq[String]): Array[Byte] = {
    require(values.nonEmpty && values.forall(_ != null),
      "native varchar block: no rows or nulls (no null evidence in the artifact)")
    val dict = values.distinct.sorted
    val dc = dict.size
    require(dc >= 2, "single-value columns use the constant-string record")
    val utf8 = dict.map(_.getBytes(StandardCharsets.UTF_8))
    require(utf8.forall(_.length <= 255),
      "native varchar block: dictionary strings are limited to 255 UTF-8 " +
        "bytes by the (u8 len | u24 offset) entry format")
    // heap order: min, max, then the middle in sorted order
    val heapOrder: Seq[Int] =
      if (dc == 2) Seq(0, 1)
      else 0 +: (dc - 1) +: (1 until dc - 1)
    val heapResident = heapOrder.filter(i => utf8(i).length > 3)
    val heapOffsets = new Array[Int](dc)
    var acc = 0
    heapResident.foreach { i => heapOffsets(i) = acc; acc += utf8(i).length }
    val heapLen = acc
    val idOf = dict.zipWithIndex.toMap
    val a = 0x830
    val entriesAt = a + 0x30
    val idsAt = entriesAt + (4 * dc + 15) / 16 * 16
    val width = math.max(1, 32 - Integer.numberOfLeadingZeros(dc - 1))
    val idBytes = (values.size * width + 7) / 8
    val heapAt = (idsAt + idBytes + 15) / 16 * 16
    val total = (heapAt + heapLen + 15) / 16 * 16
    val pay = new Array[Byte](total)
    val buf = ByteBuffer.wrap(pay).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(0x00, values.size.toLong)
    buf.putLong(0x08, a.toLong)
    buf.putLong(0x10, (a + (4 * dc + 15) / 16 * 16).toLong) // B = id-stream section
    buf.putLong(0x18, 0x2cL) // observed varchar tag family; semantics unidentified
    buf.putLong(0x20, (heapAt - 0x30).toLong) // D = heap section
    buf.putLong(a + 0x28, dc.toLong)
    dict.indices.foreach { k =>
      val bs = utf8(k)
      val w =
        if (bs.length <= 3) {
          var v = bs.length
          bs.indices.foreach(i => v |= (bs(i) & 0xff) << (8 * (i + 1)))
          v
        } else bs.length | (heapOffsets(k) << 8)
      buf.putInt(entriesAt + 4 * k, w)
    }
    values.zipWithIndex.foreach { case (s, r) =>
      val id = idOf(s)
      var b = 0
      while (b < width) {
        if ((id & (1 << (width - 1 - b))) != 0) {
          val bit = r * width + b
          pay(idsAt + bit / 8) = (pay(idsAt + bit / 8) | (1 << (7 - bit % 8))).toByte
        }
        b += 1
      }
    }
    heapResident.foreach(i =>
      System.arraycopy(utf8(i), 0, pay, heapAt + heapOffsets(i), utf8(i).length))
    pay
  }

  /** Encode one INT column in the artifact's integer-block layout:
    * type tag 7, min/max, distinct count, FOR byte deltas. The byte
    * width is the only evidenced delta rule, so value spans over 255
    * are rejected rather than guessed.
    */
  private def encodeIntBlock(values: Seq[Int]): Array[Byte] = {
    require(values.nonEmpty, "native int block: no rows")
    val min = values.min
    val max = values.max
    require(max.toLong - min.toLong <= 255,
      s"native int block: span ${max.toLong - min.toLong} exceeds the " +
        "byte-wide FOR delta stream (the only width evidenced by the artifact)")
    val total = (0x2050 + values.size + 15) / 16 * 16
    val pay = new Array[Byte](total)
    val buf = ByteBuffer.wrap(pay).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(0x00, values.size.toLong)
    buf.putLong(0x08, 0x2020L)
    buf.putLong(0x10, 0x2020L)
    buf.putLong(0x18, 7L)
    buf.putLong(0x20, 0x2030L)
    buf.putInt(0x30, min)
    buf.putInt(0x34, max)
    buf.putLong(0x2040, values.distinct.size.toLong)
    values.zipWithIndex.foreach { case (v, r) => pay(0x2050 + r) = (v - min).toByte }
    pay
  }

  /** Write `tables` (String/Int columns only) as a `.hyper`-structured
    * container whose DATA records use the artifact's NATIVE encodings —
    * the closed loop over everything round 6 identified: the same
    * header/catalog/genesis geometry as [[HyperBinary.write]], per-table
    * row-count records, per-column varchar/int/constant-string blocks
    * (LZ4-framed when that shrinks them, raw otherwise, exactly like the
    * artifact), and a page of [[ColumnBinding]] records so
    * [[decodeTables]] reads the file back through the same EXACT
    * column-assignment path it uses on the committed artifact.
    *
    * This is evidence-bounded: columns beyond the artifact's observed
    * encodings (non-String/Int types, >255-byte dictionary strings,
    * int spans over 255) are rejected — [[HyperBinary.write]] remains
    * the general-purpose container writer.
    */
  def writeNative(path: String, tables: Seq[(String, StructType, Seq[Row])]): Unit = {
    tables.foreach { case (name, schema, rows) =>
      require(schema.fields.forall(f =>
        f.dataType == StringType || f.dataType == IntegerType),
        s"writeNative: table $name: only String and Integer columns have " +
          "evidenced native encodings; use HyperBinary.write for the rest")
      require(rows.nonEmpty, s"writeNative: table $name has no rows")
      require(rows.forall(r => schema.fields.indices.forall(!r.isNullAt(_))),
        s"writeNative: table $name contains nulls — the artifact shows no " +
          "null encoding (nullCounts all 0); use HyperBinary.write instead")
    }
    val withNulls = tables.map { case (name, schema, _) =>
      (name, schema, Array.fill(schema.fields.length)(0L))
    }
    val catalog = HyperBinary.catalogJson(withNulls, compatInt32 = false)
      .getBytes(StandardCharsets.UTF_8)
    val genesis = HyperBinary.catalogJson(Seq.empty, compatInt32 = false)
      .getBytes(StandardCharsets.UTF_8)

    val out = new java.io.ByteArrayOutputStream(1 << 16)
    def pad(to: Int): Unit = while (out.size() < to) out.write(0)
    def align(): Unit = pad((out.size() + 15) / 16 * 16)
    def putU32(v: Int): Unit = out.write(
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    def putU64(v: Long): Unit = out.write(
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array())

    out.write(Array[Byte]('H', 'y', 'p', 'e', 'r', 8, 0, 0, 1))
    pad(0x30)
    putU64(2L)
    pad(0x3a)
    out.write(Array[Byte](1, 0))
    pad(0x40)
    putU64(0L) // patched: object-arena offset (header 0x40, the r7 index root)
    putU64(0L) // patched: data offset
    putU64(0L) // patched: genesis offset
    pad(0x2000)
    out.write(catalog)
    out.write('~')
    putU32(HyperBinary.crc32cRaw(catalog :+ '~'.toByte))
    align()
    val dataOffset = out.size()

    // every object record destined for the live arena:
    // (objType, ordinal, tableIndex, len, off, slotSize, lz4)
    val objects = scala.collection.mutable
      .ArrayBuffer.empty[(Int, Int, Int, Long, Long, Long, Boolean)]
    objects += ((2, 0, 0, (catalog.length + 1).toLong, 0x2000L,
      ((catalog.length + 1 + 4 + 0x3f) / 0x40 * 0x40).toLong, false))

    // per-table: row-count record, aux records, one native block per column
    val bindings = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long, Boolean)]
    tables.zipWithIndex.foreach { case ((_, schema, rows), ti) =>
      val rcAt = out.size()
      putU64(rows.size.toLong)
      val rcBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(rows.size.toLong).array()
      putU32(HyperBinary.crc32cRaw(rcBytes))
      align()
      objects += ((4, 0, ti, 8L, rcAt.toLong, 0x40L, false))
      // type-3 aux record: [u64 rowCount][u32 2][u32 rawCRC32C] — the
      // constant 2 is observed in both of the artifact's records,
      // semantics unidentified
      pad((out.size() + 0x3f) / 0x40 * 0x40)
      val auxAt = out.size()
      val aux = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(rows.size.toLong).putInt(2).array()
      out.write(aux)
      putU32(HyperBinary.crc32cRaw(aux))
      objects += ((3, 0, ti, 12L, auxAt.toLong, 0x40L, false))
      // type-5 per-table state byte (0 in the artifact, no frame)
      pad((out.size() + 0x3f) / 0x40 * 0x40)
      val t5At = out.size()
      out.write(0)
      objects += ((5, 0, ti, 1L, t5At.toLong, 0x40L, false))
      pad((out.size() + 0x3f) / 0x40 * 0x40)
      schema.fields.zipWithIndex.foreach { case (f, c) =>
        val blockAt = out.size()
        if (f.dataType == StringType &&
            rows.iterator.map(_.getString(c)).toSet.size == 1) {
          // constant-string record, uncompressed, self-framed at +0x50
          val s = rows.head.getString(c).getBytes(StandardCharsets.UTF_8)
          require(s.length <= 0x10,
            "writeNative: constant strings over 16 bytes have no evidenced " +
              "record shape; vary the column or use HyperBinary.write")
          val rec = new Array[Byte](0x50)
          val rb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
          rb.putLong(0x00, rows.size.toLong)
          rb.putLong(0x18, 0x32L)
          rb.putLong(0x30, s.length.toLong)
          System.arraycopy(s, 0, rec, 0x40, s.length)
          out.write(rec)
          putU32(HyperBinary.crc32cRaw(rec))
          bindings += ((ti, c + 1, blockAt.toLong, 0x50L, false))
        } else {
          val pay =
            if (f.dataType == StringType)
              encodeVarcharBlock(rows.map(_.getString(c)))
            else encodeIntBlock(rows.map(_.getInt(c)))
          val compressed = Lz4Block.compress(pay)
          if (compressed.length + 8 < pay.length) {
            val lenWord = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
              .putInt(pay.length).array()
            out.write(lenWord)
            out.write(compressed)
            putU32(HyperBinary.crc32cRaw(lenWord ++ compressed))
            bindings += ((ti, c + 1, blockAt.toLong,
              (4 + compressed.length).toLong, true))
          } else {
            out.write(pay)
            bindings += ((ti, c + 1, blockAt.toLong, pay.length.toLong, false))
          }
        }
        align()
      }
    }

    bindings.foreach { case (ti, ordinal, off, len, lz4) =>
      objects += ((4, ordinal, ti, len, off,
        (len + 0x3f) / 0x40 * 0x40, lz4))
    }

    align()
    pad((out.size() + 0x3f) / 0x40 * 0x40)
    val genesisOffset = out.size()
    out.write(Array[Byte]('H', 'y', 'p', 'e', 'r', 'D', 'B', 0))
    out.write(Array[Byte](1, 0, 0, 0, 1, 0, 2, 0))
    out.write(java.util.UUID.nameUUIDFromBytes(catalog).toString
      .replace("-", "").sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray)
    putU64(1L)
    pad(genesisOffset + 0x30)
    putU32(0) // patched below
    pad(genesisOffset + 0x40)
    out.write(genesis)
    putU32(HyperBinary.crc32cRaw(genesis))
    objects += ((1, 0, 0, 0x30L, genesisOffset.toLong, 0x40L, false))

    // genesis arena at the artifact's relative geometry (genesis header
    // slot 0x40 + genesis catalog slot 0x400 → descriptor at +0x440),
    // holding exactly the genesis-state objects: the HyperDB header and
    // the genesis catalog copy
    require(genesis.length + 5 <= 0x400,
      "writeNative: genesis catalog exceeds its 0x400 page slot")
    pad(genesisOffset + 0x440)
    out.write(arenaBytes(Seq(
      (1, 0, 0, 0x30L, genesisOffset.toLong, 0x40L, false),
      (2, 0, 0, genesis.length.toLong, (genesisOffset + 0x40).toLong,
        0x400L, false))))

    // live arena — the index root the reader reaches via header 0x40.
    // Region geometry per the artifact (r7 second pass): the arena
    // descriptor+slots (0x3008 bytes), a trailing 0x1ada1ada extent
    // record, a raw-CRC32C frame over the whole region at +0x3070
    // (header word 0x48), total region size 0x3080 (header word 0x50).
    pad((out.size() + 0x3f) / 0x40 * 0x40)
    val arenaOffset = out.size()
    out.write(arenaBytes(objects.toSeq))
    // extent record, id-1 shape (one (offset, size) pair — the
    // artifact's id-N records carry N pairs): free/span accounting for
    // the genesis→EOF region, magic 0x1ada1ada, then zeros to +0x3070
    putU64(1L)
    putU64(genesisOffset.toLong)
    putU64(0L) // patched: EOF - genesisOffset
    out.write(Array[Byte](0x1a, 0xda.toByte, 0x1a, 0xda.toByte, 0, 0, 0, 0))
    pad(arenaOffset + 0x3070)
    putU32(0) // patched: raw CRC32C over [arenaOffset, arenaOffset+0x3070)
    pad(arenaOffset + 0x3080)

    val bytes = out.toByteArray
    val patch = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    patch.putLong(0x40, arenaOffset.toLong)
    patch.putLong(0x48, 0x3070L) // arena frame offset (identified r7)
    patch.putLong(0x50, 0x3080L) // arena region size (identified r7)
    patch.putLong(0x20, bytes.length.toLong)
    patch.putLong(arenaOffset + 0x3008 + 0x10,
      (bytes.length - genesisOffset).toLong)
    patch.putInt(arenaOffset + 0x3070,
      HyperBinary.crc32cRaw(bytes, arenaOffset, arenaOffset + 0x3070))
    patch.putInt(genesisOffset + 0x30,
      HyperBinary.crc32cRaw(bytes, genesisOffset, genesisOffset + 0x30))
    patch.putInt(0x0ffc, HyperBinary.crc32cRaw(bytes, 0x0000, 0x0ffc))
    patch.putInt(0x1ffc, HyperBinary.crc32cRaw(bytes, 0x1000, 0x1ffc))
    Files.write(Paths.get(path), bytes)
  }

  /** Serialize an object arena: u64 capacity exponent (8, matching the
    * artifact) + 256 slots × 0x30 bytes. Slot choice uses OUR hash
    * (SplitMix64 finalizer of keyLow ^ keyHigh, linear probing) — the
    * geometry and record grammar match the artifact exactly, but
    * hyperd's own slot hash is the one unidentified field of the format
    * (see [[ObjectRecord]]), so slot POSITIONS differ from what hyperd
    * would pick. Our reader never depends on them: it walks all slots.
    */
  private def arenaBytes(
      records: Seq[(Int, Int, Int, Long, Long, Long, Boolean)]): Array[Byte] = {
    val cap = 256
    require(records.size <= cap, s"object arena overflow: ${records.size} > $cap")
    val arena = new Array[Byte](8 + cap * 0x30)
    val buf = ByteBuffer.wrap(arena).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(0, 8L) // capacity exponent
    val used = new Array[Boolean](cap)
    records.foreach { case (t, ord, ti, len, off, slotSz, lz4) =>
      val keyLow = (t.toLong << 48) | (ord.toLong & 0xffffL)
      val keyHigh = ti.toLong << 32
      var slot = (mix64(keyLow ^ keyHigh) & (cap - 1)).toInt
      while (used(slot)) slot = (slot + 1) % cap
      used(slot) = true
      val p = 8 + slot * 0x30
      buf.putLong(p, keyLow)
      buf.putLong(p + 8, keyHigh)
      buf.putLong(p + 0x10, len)
      buf.putLong(p + 0x18, off)
      buf.putLong(p + 0x20, slotSz)
      buf.putLong(p + 0x28, if (lz4) 0x101L else 0x1L)
    }
    arena
  }

  /** SplitMix64 finalizer (public-domain constant set) — writeNative's
    * slot hash. Documented as OURS, not hyperd's.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Decode the artifact into (table name, schema, rows), matching
    * decoded columns to catalog relations. Tables are matched to
    * rowCount groups in first-appearance order. Within a table, columns
    * are assigned by the EXACT ordinals from the [[ColumnBinding]]
    * records when every block in the group has one (the committed
    * artifact does — 8/8); a file without bindings (e.g. not written by
    * hyperd) falls back to the k-th-Varchar/k-th-Integer positional
    * inference, which the parity gate proved equivalent here.
    */
  def decodeTables(path: String): Seq[(String, StructType, Seq[Row])] = {
    val data = Files.readAllBytes(Paths.get(path))
    // round-7 fast path: the object arena (header 0x40) indexes every
    // column block exactly — decode each at its recorded offset, no
    // file scan at all. Falls back to the round-6 full scan when the
    // arena is absent/invalid or any indexed block fails to decode.
    val arenaCols: Option[(Seq[DecodedColumn], Map[Long, ColumnBinding])] = {
      val colRecs = readObjectArena(data)
        .filter(r => r.objType == 4 && r.ordinal >= 1)
      if (colRecs.isEmpty) None
      else {
        val decoded = colRecs.sortBy(_.blockOffset).flatMap { r =>
          decodeColumnAt(data, r.blockOffset.toInt,
            math.min(r.payloadLen, Int.MaxValue.toLong).toInt, r.lz4)
            .map { case (n, v) => (r, DecodedColumn(r.blockOffset, n, v)) }
        }
        if (decoded.size != colRecs.size) None
        else Some((decoded.map(_._2),
          decoded.map { case (r, _) => r.blockOffset -> ColumnBinding(
            r.recordAt, r.tableIndex, r.ordinal, r.payloadLen,
            r.blockOffset, r.slotSize, r.lz4) }.toMap))
      }
    }
    val (cols, bindingOf) = arenaCols.getOrElse {
      // bindings first: their payloadLength sizes the raw-parse window,
      // so a raw block bigger than the 64 KiB default — which
      // writeNative emits when LZ4 cannot shrink it — still round-trips
      val bo: Map[Long, ColumnBinding] =
        scanBindings(data).map(b => b.blockOffset -> b).toMap
      (scanColumns(data,
        bo.collect { case (off, b) if !b.lz4 => off -> b.payloadLen.toInt }), bo)
    }
    require(cols.nonEmpty, s"$path: no decodable column records found")

    val catalog = HyperBinary.catalogJsons(path).head
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(catalog)
    val rels = root.get("relations")

    // table grouping: by the binding records' table index when every
    // decoded block has one (exact, and correct even when two tables
    // share a row count); by row count in first-appearance order
    // otherwise
    val groups: Seq[Seq[DecodedColumn]] =
      if (cols.forall(c => bindingOf.contains(c.offset)) &&
          cols.map(c => bindingOf(c.offset).tableIndex).toSet ==
            (0 until rels.size()).toSet) {
        (0 until rels.size()).map(ti =>
          cols.filter(c => bindingOf(c.offset).tableIndex == ti))
      } else {
        val byCount = scala.collection.mutable.LinkedHashMap
          .empty[Int, scala.collection.mutable.ArrayBuffer[DecodedColumn]]
        cols.foreach(c => byCount.getOrElseUpdate(c.rowCount,
          scala.collection.mutable.ArrayBuffer.empty) += c)
        require(byCount.size == rels.size(),
          s"$path: ${byCount.size} row-count groups but ${rels.size()} catalog relations")
        byCount.values.map(_.toSeq).toSeq
      }

    groups.zipWithIndex.map { case (tableCols, r) =>
      val rowCount = tableCols.head.rowCount
      require(tableCols.forall(_.rowCount == rowCount),
        s"$path: relation $r has blocks with differing row counts")
      val rel = rels.get(r)
      val name = rel.get("name").asText()
      val attrs = (0 until rel.get("attributes").size()).map { a =>
        val at = rel.get("attributes").get(a)
        (at.get("name").asText(), at.get("type").get(0).asText())
      }
      val assigned: Seq[(String, DataType, IndexedSeq[Any])] =
        if (tableCols.forall(c => bindingOf.get(c.offset).exists(_.tableIndex == r)) &&
            tableCols.map(c => bindingOf(c.offset).ordinal).sorted ==
              (1 to attrs.size)) {
          // exact path: the binding records carry (tableIndex, ordinal)
          val byOrdinal = tableCols.sortBy(c => bindingOf(c.offset).ordinal)
          attrs.zip(byOrdinal).map { case ((an, tp), c) =>
            val dt: DataType = if (tp == "Varchar") StringType else IntegerType
            require(c.isString == (tp == "Varchar"),
              s"$path: table $name column $an: binding ordinal points at a " +
                s"block of the wrong type")
            (an, dt, c.values)
          }
        } else {
          // fallback: positional within type
          val strCols = tableCols.filter(_.isString)
          val intCols = tableCols.filterNot(_.isString)
          require(strCols.size == attrs.count(_._2 == "Varchar") &&
            intCols.size == attrs.count(a => a._2 == "Integer" || a._2 == "BigInt"),
            s"$path: table $name attribute types don't match decoded column types")
          var si = 0
          var ii = 0
          attrs.map { case (an, tp) =>
            if (tp == "Varchar") { val c = strCols(si); si += 1; (an, StringType, c.values) }
            else { val c = intCols(ii); ii += 1; (an, IntegerType, c.values) }
          }
        }
      val schema = StructType(assigned.map(c => StructField(c._1, c._2, nullable = true)))
      val rows = (0 until rowCount).map(i => Row.fromSeq(assigned.map(_._3(i))))
      (name, schema, rows)
    }
  }
}
