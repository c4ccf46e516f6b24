package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (Misra & Gries '82; mergeable form
  * per Agarwal et al., PODS'12) as a native `TypedImperativeAggregate`
  * — the bounded-memory frequent-items counter for 100 TB corpora.
  *
  * The exact "top words / top domains / boilerplate phrases" query is
  * the other classic scale cliff next to `COUNT(DISTINCT)`
  * ([[KmvDistinct]]): a full `GROUP BY word` shuffles every distinct
  * token before the top-k can be cut. This sketch keeps at most `k`
  * (item, counter) pairs per group; Spark runs it with map-side
  * partial aggregation, so each task ships ≤ `k` pairs per group
  * regardless of input size.
  *
  * Guarantees (the PODS'12 mergeable-summaries bound, preserved by any
  * combine tree): every true count `f(x)` is bracketed by the sketch
  * counter `c(x)` as `f(x) − n/(k+1) ≤ c(x) ≤ f(x)` where `n` is the
  * group's total item count — so every item with `f(x) > n/(k+1)` is
  * guaranteed present. With fewer than `k` distinct items in the group
  * no decrement ever fires on any path and the counters are EXACT
  * (the x10 gate pins this regime against DuckDB's `GROUP BY` +
  * `row_number`); FrequentItemsSpec pins the undercount bound and
  * topology-independence in the approximate regime.
  *
  * `update` overflow runs the classic decrement-all: each pass removes
  * `k+1` units of count mass, so total decrement work is O(n) — the
  * amortized per-row cost is O(1). `merge` adds counters pointwise,
  * then subtracts the (k+1)-th largest counter from all (the PODS'12
  * merge), keeping the size bound and the error bound.
  *
  * Output: the top `m` surviving (item, n) pairs ordered by
  * (n desc, item asc) — a deterministic tie-break so the exact regime
  * is hash-stable cross-engine.
  */
case class FrequentItems(child: Expression, k: Int, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {
  require(k >= 4 && k <= (1 << 20),
    s"frequent_items: k must be in [4, ${1 << 20}], got $k")
  require(m >= 1 && m <= k, s"frequent_items: m must be in [1, k], got $m")

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"frequent_items expects a string item column, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != null) { buf.put(s, java.lang.Long.valueOf(cur.longValue() + 1L)); () }
      else if (buf.size() < k) { buf.put(s, FrequentItems.One); () }
      else FrequentItems.decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      val add = e.getValue.longValue()
      buf.put(e.getKey, java.lang.Long.valueOf(
        if (cur == null) add else cur.longValue() + add))
    }
    if (buf.size() > k) {
      // (k+1)-th largest counter = the subtraction that restores the
      // size bound while bracketing every count within n/(k+1)
      val vals = new Array[Long](buf.size())
      val vit = buf.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      FrequentItems.decrementAll(buf, vals(vals.length - k - 1))
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val entries = new Array[(String, Long)](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue.longValue())
      i += 1
    }
    // (n desc, item asc): deterministic, hash-stable cross-engine
    val top = entries.sortBy { case (item, n) => (-n, item) }.take(m)
    new GenericArrayData(top.map { case (item, n) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), n))
    })
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val keys = new Array[Array[Byte]](buf.size())
    val counts = new Array[Long](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.getBytes(StandardCharsets.UTF_8)
      counts(i) = e.getValue.longValue()
      bytes += 4 + keys(i).length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(keys.length)
    i = 0
    while (i < keys.length) {
      bb.putInt(keys(i).length)
      bb.put(keys(i))
      bb.putLong(counts(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val mp = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      mp.put(new String(kb, StandardCharsets.UTF_8),
        java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    mp
  }

  override def withNewMutableAggBufferOffset(o: Int): FrequentItems =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentItems =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FrequentItems {

  private val One = java.lang.Long.valueOf(1L)

  /** Subtract `by` from every counter, dropping non-positive ones. */
  private def decrementAll(
      buf: java.util.HashMap[String, java.lang.Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue.longValue() - by
      if (nv <= 0L) it.remove()
      else e.setValue(java.lang.Long.valueOf(nv))
    }
  }

  /** Column-level entry point: top `m` most frequent values of `item`
    * per group from a `k`-bounded Misra–Gries sketch, as
    * `array<struct<item,n>>` ordered (n desc, item asc). NULL items
    * are skipped (aggregate-function semantics).
    */
  def apply(item: Column, k: Int, m: Int): Column =
    GraftExpressionBridge.column(
      FrequentItems(GraftExpressionBridge.expression(item), k, m)
        .toAggregateExpression())
}
