package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types._

/** Bottom-k hash-sample quantile (the coordinated / bottom-k sampling
  * lineage — Cohen & Kaplan, PODC'07) as the third native
  * `TypedImperativeAggregate` next to [[KmvDistinct]] (distinct) and
  * [[FrequentItems]] (frequency): bounded-memory, MERGEABLE quantiles
  * for 100 TB group-bys.
  *
  * Exact per-group quantiles sort every row of the group; Spark's
  * `percentile` buffers the whole group per aggregation state — the
  * same scale cliff as exact `COUNT(DISTINCT)`. This sketch keeps the
  * `value` of the `k` rows whose `xxhash64(rowId)` is smallest
  * (unsigned): a uniform without-replacement row sample chosen by
  * HASH, not by `rand()` — so it is a pure function of the input SET,
  * identical on any cluster topology, rerun-stable, and associatively
  * mergeable (merge = offer the other side's pairs; any combine tree
  * yields the same sample). Map-side partial aggregation ships at most
  * `k` (hash, value) pairs per group per task.
  *
  * Estimate: `eval` sorts the sampled values and returns the
  * percentile_disc(q) element — the least sampled value whose rank
  * r satisfies r >= q·n (index `ceil(q·n)-1`, clamped). With group
  * size <= k the sample IS the group, so the quantile is EXACT — the
  * gated regime (x12 mirrors the same rank arithmetic in DuckDB SQL).
  * Above k, the sample quantile's rank error is the classic
  * O(1/sqrt(k)) (SampleQuantileSpec pins it empirically).
  *
  * Determinism under hash collision: two row ids hashing equal would
  * make "which value survives" merge-order-dependent, so `offer`
  * resolves equal hashes to the SMALLEST value — associativity
  * restored at a bias of ~n²/2⁶⁴ expected collisions (zero in any
  * realizable corpus, same budget as the d23 span argument).
  *
  * `rowId` must identify the row (a key column); rows with a null id
  * or null value are skipped.
  */
case class SampleQuantile(id: Expression, value: Expression, k: Int,
    q: Double, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, Double]] {
  require(k >= 16 && k <= (1 << 22),
    s"sample_quantile: k must be in [16, ${1 << 22}], got $k")
  require(q >= 0.0d && q <= 1.0d,
    s"sample_quantile: q must be in [0, 1], got $q")

  override def children: Seq[Expression] = id :: value :: Nil

  override def checkInputDataTypes(): TypeCheckResult =
    (id.dataType, value.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (i, v) => TypeCheckResult.TypeCheckFailure(
        "sample_quantile expects (pre-hashed long id, double value), " +
          s"got (${i.sql}, ${v.sql})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, Double] =
    new java.util.TreeMap[java.lang.Long, Double](KmvDistinct.UnsignedOrder)

  override def update(buf: java.util.TreeMap[java.lang.Long, Double],
      input: InternalRow): java.util.TreeMap[java.lang.Long, Double] = {
    val h = id.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      SampleQuantile.offer(buf, h.asInstanceOf[Long],
        v.asInstanceOf[Double], k)
    }
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, Double],
      other: java.util.TreeMap[java.lang.Long, Double]): java.util.TreeMap[java.lang.Long, Double] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      SampleQuantile.offer(buf, e.getKey.longValue(), e.getValue, k)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, Double]): Any = {
    val n = buf.size()
    if (n == 0) null
    else {
      val vs = new Array[Double](n)
      val it = buf.values().iterator()
      var i = 0
      while (it.hasNext) { vs(i) = it.next(); i += 1 }
      java.util.Arrays.sort(vs)
      // percentile_disc: least value with rank >= q·n (1-based), i.e.
      // 0-based index ceil(q·n)-1 clamped into [0, n)
      val idx = math.min(n - 1L,
        math.max(0L, math.ceil(q * n).toLong - 1L)).toInt
      vs(idx)
    }
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue())
      bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val h = bb.getLong
      m.put(java.lang.Long.valueOf(h), bb.getDouble)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): SampleQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SampleQuantile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), value = newChildren(1))
}

/** The bottom-k sample CONTENT — sorted (hash, value) pairs — instead
  * of [[SampleQuantile]]'s point estimate: what [[KmvSketch]] is to
  * [[KmvDistinct]], for quantiles. Two groups' samples COMPOSE: the
  * k smallest hashes of a union are a subset of the union of each
  * side's k smallest, so merging sketches (array concat → sort → keep
  * k) reproduces exactly the sketch a one-shot aggregate over the
  * union would build — cross-group / cross-shard quantile estimates
  * become pure array arithmetic on rows of ≤ k pairs, no re-scan of
  * any input (see [[graft.functions.Sketches.quantileSketchMerge]] /
  * `quantileSketchEstimate`; per-shard distribution cards build one
  * sketch per shard once and combine on demand).
  *
  * The stored hash is FLIPPED (xor Long.MinValue) so the natural
  * signed struct order downstream (`array_sort`) IS the sketch's
  * unsigned hash order. Same bounded buffer, associative merge, and
  * map-side partial aggregation as [[SampleQuantile]]; the array is an
  * INTERMEDIATE representation, never a gate output (the array-free
  * gate rule) — combine to scalar quantiles before emitting.
  */
case class QuantileSketch(id: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, Double]] {
  require(k >= 16 && k <= (1 << 22),
    s"quantile_sketch: k must be in [16, ${1 << 22}], got $k")

  override def children: Seq[Expression] = id :: value :: Nil

  override def checkInputDataTypes(): TypeCheckResult =
    (id.dataType, value.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (i, v) => TypeCheckResult.TypeCheckFailure(
        "quantile_sketch expects (pre-hashed long id, double value), " +
          s"got (${i.sql}, ${v.sql})")
    }

  override def dataType: DataType = QuantileSketch.SketchType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, Double] =
    new java.util.TreeMap[java.lang.Long, Double](KmvDistinct.UnsignedOrder)

  override def update(buf: java.util.TreeMap[java.lang.Long, Double],
      input: InternalRow): java.util.TreeMap[java.lang.Long, Double] = {
    val h = id.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      SampleQuantile.offer(buf, h.asInstanceOf[Long],
        v.asInstanceOf[Double], k)
    }
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, Double],
      other: java.util.TreeMap[java.lang.Long, Double]): java.util.TreeMap[java.lang.Long, Double] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      SampleQuantile.offer(buf, e.getKey.longValue(), e.getValue, k)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, Double]): Any = {
    val rows = new Array[Any](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      rows(i) = InternalRow(e.getKey.longValue() ^ Long.MinValue, e.getValue)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue())
      bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val h = bb.getLong
      m.put(java.lang.Long.valueOf(h), bb.getDouble)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), value = newChildren(1))
}

object QuantileSketch {

  /** array<struct<hf: flipped hash, v: value>>, ascending by `hf` =
    * unsigned hash order. */
  val SketchType: DataType = ArrayType(StructType(Seq(
    StructField("hf", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  /** Column-level entry point: the bottom-k (flipped-hash, value)
    * sample of `value` keyed by `rowId`. Same hash-outside-the-
    * aggregate and null semantics as [[SampleQuantile.apply]]. */
  def apply(rowId: Column, value: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.when
    GraftExpressionBridge.column(
      QuantileSketch(
        GraftExpressionBridge.expression(
          when(rowId.isNotNull, xxhash64(rowId))),
        GraftExpressionBridge.expression(value.cast(DoubleType)),
        k).toAggregateExpression())
  }
}

object SampleQuantile {

  private[expressions] def offer(
      m: java.util.TreeMap[java.lang.Long, Double], h: Long, v: Double,
      k: Int): Unit = {
    val boxed = java.lang.Long.valueOf(h)
    if (m.containsKey(boxed)) {
      // equal-hash tie: keep the smallest value (associativity)
      if (v < m.get(boxed)) { m.put(boxed, v); () }
    } else if (m.size() < k) { m.put(boxed, v); () }
    else if (KmvDistinct.UnsignedOrder.compare(boxed, m.lastKey()) < 0) {
      m.put(boxed, v)
      m.remove(m.lastKey()); ()
    }
  }

  /** Column-level entry point: the percentile_disc(`q`) estimate of
    * `value` from a deterministic k-row bottom-hash sample keyed by
    * `rowId`. Hashing happens in codegen'd projection space (the
    * [[KmvDistinct]] convention); null ids/values are skipped.
    */
  def apply(rowId: Column, value: Column, k: Int, q: Double): Column = {
    import org.apache.spark.sql.functions.when
    GraftExpressionBridge.column(
      SampleQuantile(
        GraftExpressionBridge.expression(
          when(rowId.isNotNull, xxhash64(rowId))),
        GraftExpressionBridge.expression(value.cast(DoubleType)),
        k, q).toAggregateExpression())
  }
}
