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
}
