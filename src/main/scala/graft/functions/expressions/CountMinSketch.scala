package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms '05) as a
  * native `TypedImperativeAggregate` — the bounded-memory POINT-QUERY
  * counter that completes the sketch family: [[KmvDistinct]] answers
  * "how many distinct", [[FrequentItems]] answers "which items are
  * frequent", CMS answers "how often does THIS item occur" for any
  * item, including ones no top-k survivor list retains.
  *
  * The sketch is a `depth × width` counter matrix: each input item
  * increments one counter per row, at column `h_j(item) mod width`;
  * a point estimate reads the MINIMUM of the item's `depth` counters
  * ([[graft.functions.Sketches.cmsEstimate]]). Estimates NEVER
  * undercount (every counter the item touches holds its full count
  * plus non-negative collision mass) and overcount by at most the
  * collision mass in the item's emptiest row — `E[err] ≤ n/width` per
  * the published analysis. CMS is LINEAR: merging two sketches by
  * pointwise addition ([[graft.functions.Sketches.cmsMerge]]) equals
  * sketching the concatenated input, which is also why Spark's partial
  * aggregation (map-side combine, any merge-tree topology) is exact —
  * CountMinSpec pins linearity and topology-independence.
  *
  * Hashes are the repo's PORTABLE 56-bit md5 hash
  * ([[graft.functions.TextFunctions.portableHash64]]) salted per row
  * (`cms:<row>:<item>`), so the x14 DuckDB oracle replays the ENTIRE
  * sketch arithmetic — every bucket sum and every min — not just the
  * estimates' shape. Memory is `depth·width·8` bytes per group,
  * constant in the input; each task ships one matrix per group
  * regardless of input size.
  */
case class CountMinSketch(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && depth <= 16,
    s"cms_sketch: depth must be in [1, 16], got $depth")
  require(width >= 2 && width <= (1 << 20),
    s"cms_sketch: width must be in [2, ${1 << 20}], got $width")

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a string item column, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < depth) {
        buf(j * width + CountMinSketch.bucket(j, s, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf(_): Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CountMinSketch {

  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Row-`j` bucket of `item`: the portable 56-bit hash (first 7 md5
    * bytes, big-endian — identical to
    * [[graft.functions.TextFunctions.portableHash64]]) of the salted
    * key `cms:<j>:<item>`, mod `width`. Always non-negative (the hash
    * is 56-bit, so `%` is `pmod`). Public so
    * [[graft.functions.Sketches.cmsEstimate]]'s column chain and the
    * spec share the exact arithmetic.
    */
  def bucket(j: Int, item: String, width: Int): Int = {
    val dig = Md5.get().digest(
      ("cms:" + j + ":" + item).getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v % width).toInt
  }

  /** Column-level entry point: the `depth × width` CMS counter matrix
    * of `item` per group, row-major `array<bigint>` of length
    * `depth·width`. NULL items are skipped (aggregate-function
    * semantics).
    */
  def apply(item: Column, depth: Int, width: Int): Column =
    GraftExpressionBridge.column(
      CountMinSketch(GraftExpressionBridge.expression(item), depth, width)
        .toAggregateExpression())
}
