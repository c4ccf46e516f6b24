package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types._

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al.,
  * RANDOM'02) as a native `TypedImperativeAggregate` — the
  * bounded-memory, MERGEABLE `COUNT(DISTINCT)` for 100 TB corpora.
  *
  * Exact `COUNT(DISTINCT)` is the classic scale cliff: it shuffles
  * every distinct value. This sketch keeps only the `k` smallest
  * distinct 64-bit hashes per group — `update` and `merge` are both
  * O(log k) against a bounded tree, so Spark runs it with map-side
  * partial aggregation: each task ships AT MOST `k` longs per group
  * regardless of input size, and merges are associative and
  * commutative (any combine tree gives the same sketch).
  *
  * Estimate: with fewer than `k` distinct hashes observed the sketch
  * IS the distinct set — the count is EXACT (the x09 gate pins this
  * regime against DuckDB's `COUNT(DISTINCT)`). At `k` or more, the
  * k-th smallest hash `θ` (unsigned, mapped to (0,1]) estimates the
  * density: `(k-1)/θ`, relative error ~1/√k (~0.4% at k=65536;
  * KmvDistinctSpec pins the error empirically at n≫k).
  *
  * Determinism: the sketch content is a pure function of the input
  * VALUE SET (xxhash64 is deterministic, the k-smallest set is
  * order-free), so results are identical on any cluster topology —
  * unlike sampling-based estimators.
  */
case class KmvDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 16 && k <= (1 << 22),
    s"kmv_distinct: k must be in [16, ${1 << 22}], got $k")

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a pre-hashed long column (xxhash64), got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvDistinct.UnsignedOrder)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvDistinct.offer(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) KmvDistinct.offer(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size()
    if (n < k) n.toLong
    else {
      // θ = the k-th smallest hash as a density in (0, 1]:
      // (θ_unsigned + 1) / 2^64, +1 so θ = the max hash maps to 1
      val theta = buf.last().longValue()
      val tu = if (theta >= 0L) theta.toDouble
               else theta.toDouble + 1.8446744073709552e19d
      val density = (tu + 1.0d) / 1.8446744073709552e19d
      Math.round((k - 1).toDouble / density)
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) { s.add(java.lang.Long.valueOf(bb.getLong)); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** The KMV sketch CONTENT — the sorted (unsigned-ascending) k-minimum
  * hash array — instead of the point estimate. This is what makes KMV a
  * THETA sketch (Dasgupta et al., the DataSketches lineage): two
  * sketches' arrays support SET-OPERATION estimates (union,
  * intersection → corpus-overlap/contamination accounting) as pure
  * array arithmetic, no re-scan of either input — see
  * [[graft.functions.Sketches]]. Same bounded buffer, same associative
  * merge, same map-side partial aggregation as [[KmvDistinct]]; each
  * group's final row carries ≤ k longs.
  *
  * The array is an INTERMEDIATE representation (never a gate output —
  * the array-free gate rule): combine it with
  * [[graft.functions.Sketches.kmvSetEstimates]] into scalar estimates.
  */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 16 && k <= (1 << 22),
    s"kmv_sketch: k must be in [16, ${1 << 22}], got $k")

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a pre-hashed long column (xxhash64), got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvDistinct.UnsignedOrder)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvDistinct.offer(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) KmvDistinct.offer(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) { s.add(java.lang.Long.valueOf(bb.getLong)); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Column-level entry point: the k-minimum-values hash array of
    * `value`, unsigned-ascending. Same hash-outside-the-aggregate and
    * null semantics as [[KmvDistinct.apply]]. */
  def apply(value: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.when
    GraftExpressionBridge.column(
      KmvSketch(GraftExpressionBridge.expression(
          when(value.isNotNull, xxhash64(value))), k)
        .toAggregateExpression())
  }
}

object KmvDistinct {

  /** Unsigned long order — the hash→(0,1] density mapping's order. */
  val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a.longValue(), b.longValue())
    }

  private[expressions] def offer(
      s: java.util.TreeSet[java.lang.Long], h: Long, k: Int): Unit = {
    val boxed = java.lang.Long.valueOf(h)
    if (s.size() < k) { s.add(boxed); () }
    else if (UnsignedOrder.compare(boxed, s.last()) < 0 && s.add(boxed)) {
      s.remove(s.last()); ()
    }
  }

  /** Column-level entry point: distinct count of `value` with a
    * k-bounded sketch. Hashing (xxhash64, any input type) happens in
    * codegen'd projection space; the aggregate sees pre-hashed longs.
    * NULLs are skipped (COUNT(DISTINCT) semantics) — Spark's hash
    * functions map null to the seed, so the null guard must sit
    * OUTSIDE the hash.
    */
  def apply(value: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.when
    GraftExpressionBridge.column(
      KmvDistinct(GraftExpressionBridge.expression(
          when(value.isNotNull, xxhash64(value))), k)
        .toAggregateExpression())
  }
}
