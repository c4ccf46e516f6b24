package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with
  * `right.time <= left.time` within the same partition key — the
  * canonical time-series enrichment operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): tag and union both sides, then one partitioned window pass
  * carrying the last non-null right value forward. Exactly ONE shuffle
  * (on the partition key) and O(n log n) per partition for the sort —
  * never the O(|left|·|right|) range-join explosion a naive
  * `t1 <= t2` theta-join produces. This is the shape that survives
  * 100 TB: shuffle volume = input volume.
  */
object AsOf {

  /** @param left       probe side (kept in full)
    * @param right      reference side (its `rightTime` is carried)
    * @param partition  equality key column name (both sides)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param asOfName   output column: latest rightTime ≤ leftTime, null
    *                   when no prior right row exists
    * Right rows at the exact same instant as a left row DO match
    * (`<=` semantics).
    */
  def asofLatest(left: DataFrame, right: DataFrame, partition: String,
      leftTime: String, rightTime: String, asOfName: String): DataFrame = {
    val leftCols = left.columns
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__rv", lit(null).cast(left.schema(leftTime).dataType))
    val rTagged = right.select(col(partition), col(rightTime).as("__t"))
      .withColumn("__tag", lit(0))
      .withColumn("__rv", col("__t"))
    // align schemas: right side lacks the left payload columns
    val rAligned = leftCols.foldLeft(rTagged) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lTagged.select(
      (leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__rv"))): _*)
      .unionByName(rAligned.select(
        (leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__rv"))): _*))
    // right rows sort before left rows at equal time (__tag 0 < 1), so a
    // same-instant right row is visible to the left row's carry-forward
    val w = Window.partitionBy(col(partition))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asOfName, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) :+ col(asOfName): _*)
  }

  /** Convenience: as-of against a filtered event subset of the same
    * table (e.g. "each event's most recent prior signup").
    */
  def asofSelf(events: DataFrame, partition: String, time: String,
      marker: Column, asOfName: String): DataFrame =
    asofLatest(events, events.filter(marker), partition, time, time, asOfName)

  /** Directional as-of join — the full pandas `merge_asof` surface:
    * for every left row, the matching right time in the requested
    * `direction`, optionally within `tolerance`:
    *
    *   - `"backward"`: latest right ≤ left (the [[asofLatest]]
    *     semantics, plus the tolerance gate);
    *   - `"forward"`: earliest right ≥ left;
    *   - `"nearest"`: the closer of the two; exact-distance ties
    *     resolve BACKWARD (the pandas convention).
    *
    * Same scale shape as [[asofLatest]]: tag-and-union, ONE shuffle on
    * the partition key, then ordered window passes — the forward value
    * is a carry-BACKWARD `first` over the following frame, with the
    * equal-time tag order flipped so a same-instant right row is
    * visible in both directions (`<=`/`>=` semantics). Two in-partition
    * sorts (one per direction), zero extra exchanges — Spark reuses the
    * partitioning across both window operators. Never the
    * O(|left|·|right|) theta-join explosion.
    *
    * `tolerance` is in MICROSECONDS for timestamp time columns (exact
    * integer `unix_micros` arithmetic — no float drift), DAYS for date
    * columns, and the column's own units for numeric time columns.
    * Fractional (double/float/decimal) time columns compare distances
    * in their NATIVE type — never truncated to integers, which would
    * mis-pick nearest ties and mis-gate tolerances by up to one unit.
    * `None` = unbounded.
    */
  def asofNearest(left: DataFrame, right: DataFrame, partition: String,
      leftTime: String, rightTime: String, asOfName: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asofNearest: direction must be backward/forward/nearest, got $direction")
    val leftCols = left.columns
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__rv", lit(null).cast(left.schema(leftTime).dataType))
    val rTagged = right.select(col(partition), col(rightTime).as("__t"))
      .withColumn("__tag", lit(0))
      .withColumn("__rv", col("__t"))
    val rAligned = leftCols.foldLeft(rTagged) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lTagged.select(
      (leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__rv"))): _*)
      .unionByName(rAligned.select(
        (leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__rv"))): _*))
    // distance ticks per time-column type: exact integer micros for
    // timestamps, exact integer days for dates, the raw long for
    // integral columns, and the NATIVE value for fractional/decimal
    // columns (a cast to long would truncate before the distance
    // comparison — nearest ties and tolerance gates off by < 1 unit)
    import org.apache.spark.sql.types._
    def ticks(c: Column): Column =
      left.schema(leftTime).dataType match {
        case TimestampType => unix_micros(c)
        // NTZ ticks assembled from timezone-free datetime FIELDS
        // (date, hour, minute, fractional second are pure wall-clock
        // on NTZ input — verified identical across session zones).
        // Any instant-conversion route (cast(TimestampType), even
        // to_utc_timestamp) coerces NTZ through the session zone,
        // whose DST transitions make the mapping non-linear — nearest
        // ties and tolerance gates off by up to an hour in the
        // fall-back window (AsOfSpec pins the cross-zone invariance)
        case TimestampNTZType =>
          unix_date(c.cast(DateType)).cast("long") * lit(86400000000L) +
            hour(c).cast("long") * lit(3600000000L) +
            minute(c).cast("long") * lit(60000000L) +
            (date_part(lit("SECOND"), c) * lit(1000000L)).cast("long")
        case DateType => unix_date(c).cast("long")
        case ByteType | ShortType | IntegerType | LongType => c.cast("long")
        case _: NumericType => c
        case dt => throw new IllegalArgumentException(
          s"asofNearest: unsupported time column type $dt")
      }
    // backward: right rows (tag 0) sort BEFORE left at equal time →
    // same-instant right visible to the preceding-frame carry
    val wBack = Window.partitionBy(col(partition))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: flip the equal-time tag order so the same-instant right
    // row lands in the FOLLOWING frame instead
    val wFwd = Window.partitionBy(col(partition))
      .orderBy(col("__t"), col("__tag").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val both = unioned
      .withColumn("__back", last(col("__rv"), ignoreNulls = true).over(wBack))
      .withColumn("__fwd", first(col("__rv"), ignoreNulls = true).over(wFwd))
      .filter(col("__tag") === 1)
    val backDist = ticks(col("__t")) - ticks(col("__back"))
    val fwdDist = ticks(col("__fwd")) - ticks(col("__t"))
    val tol = tolerance.map(lit(_).cast("long"))
    val backOk = col("__back").isNotNull &&
      tol.map(backDist <= _).getOrElse(lit(true))
    val fwdOk = col("__fwd").isNotNull &&
      tol.map(fwdDist <= _).getOrElse(lit(true))
    val picked = direction match {
      case "backward" => when(backOk, col("__back"))
      case "forward" => when(fwdOk, col("__fwd"))
      case "nearest" =>
        when(backOk && fwdOk,
          when(backDist <= fwdDist, col("__back")).otherwise(col("__fwd")))
          .when(backOk, col("__back"))
          .when(fwdOk, col("__fwd"))
    }
    both.withColumn(asOfName, picked)
      .select(leftCols.map(col) :+ col(asOfName): _*)
  }
}
