package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Binned interval (range) join: match point rows to interval rows where
  * the point's timestamp falls inside `[start, end]` (inclusive — SQL
  * BETWEEN semantics), with optional extra equi-keys.
  *
  * The naive formulation — a theta-join on `t BETWEEN start AND end` —
  * has no equi-condition, so Spark plans a broadcast-nested-loop or (with
  * equi-keys) a per-key cross product filtered after the fact: quadratic
  * in the hot key's row count, the classic range-join blow-up at scale.
  * This operator restores an equi-join: both sides are bucketed into
  * fixed `binSeconds` time bins — each point gets its one bin, each
  * interval explodes to the bins it covers — the join runs on
  * `(keys…, bin)` through the ordinary shuffled/broadcast hash machinery,
  * and the exact `BETWEEN` predicate then prunes the bin-edge false
  * positives. A (point, interval) match appears exactly once (the point's
  * single bin occurs once in the interval's covered-bin list), so no
  * dedup pass is needed. Work scales as points + intervals·binsPerInterval
  * + true matches, never as a per-key cross product.
  *
  * `binSeconds` trades replication for selectivity: pick it near the
  * typical interval length (bins/interval stays ~2) — a too-small bin
  * replicates intervals, a too-large one lets unrelated rows meet in the
  * join. Intervals longer than `maxBins` bins fail IN-PLAN with a clear
  * message (an unbounded `sequence` explode from one corrupt open-ended
  * interval would otherwise OOM an executor at scale); invalid intervals
  * (`end < start`) are dropped, matching the empty BETWEEN.
  *
  * Bins come from `unix_timestamp` (floor to the epoch second):
  * `p >= start` implies `floor(p) >= floor(start)` implies
  * `bin(p) >= bin(start)` (and symmetrically for `end`), so second-floored
  * bins still COVER every full-precision match — the exact predicate
  * keeps sub-second correctness.
  */
object RangeJoin {

  /** @param points     point-side frame
    * @param intervals  interval-side frame (column names must not clash
    *                   with the point side — rename before calling)
    * @param pointTime  timestamp column name on `points`
    * @param start      interval-start column name on `intervals`
    * @param end        interval-end column name on `intervals`
    * @param keys       extra equi-key pairs (pointCol, intervalCol)
    * @param binSeconds time-bin width; ~the typical interval length
    * @param maxBins    in-plan cap on bins per interval
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTime: String, start: String, end: String,
      keys: Seq[(String, String)] = Nil,
      binSeconds: Long = 3600, maxBins: Int = 1000): DataFrame = {
    require(binSeconds > 0, "pointInInterval: binSeconds must be positive")
    require(maxBins > 0, "pointInInterval: maxBins must be positive")

    val p = points.withColumn("__p_bin",
      floor(unix_timestamp(col(pointTime)).cast(LongType) / binSeconds))
    val iv = intervals
      .filter(col(end) >= col(start))
      .withColumn("__bins", sequence(
        floor(unix_timestamp(col(start)).cast(LongType) / binSeconds),
        floor(unix_timestamp(col(end)).cast(LongType) / binSeconds)))
      // fail loudly in-plan instead of exploding an unbounded sequence
      .withColumn("__guard", assert_true(size(col("__bins")) <= maxBins,
        lit(s"pointInInterval: interval covers more than $maxBins bins of " +
          s"$binSeconds s — raise binSeconds or maxBins")))
      .withColumn("__i_bin", explode(col("__bins")))
      .drop("__bins", "__guard")

    val cond = keys.foldLeft(p("__p_bin") === iv("__i_bin")) {
      case (c, (pk, ik)) => c && p(pk) === iv(ik)
    }
    p.join(iv, cond)
      .filter(p(pointTime) >= iv(start) && p(pointTime) <= iv(end))
      .drop("__p_bin", "__i_bin")
  }
}
