package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference engine's own dataflow combinators, re-expressed as pure
  * DataFrame transformations (SURVEY.md §2.A A10–A12).
  *
  * All three operate on per-source *query results* — in the reference these
  * are small aggregates (≤ a few thousand rows), so driver-side orchestration
  * plus narrow Spark plans is the right scale design: the heavy lifting
  * (scan/filter/agg/join over the big tables) happens before these
  * combinators ever see the data.
  */
object Combinators {

  /** Column ref by literal name (backtick-quoted so dots in names — e.g.
    * `consumer_complaints.xlsx_company` — don't parse as struct access).
    */
  private def qcol(name: String): Column = col(s"`$name`")

  /** A10 — rename every column to `{prefix}_{column}`.
    * Reference: query_iterator.py:111-119 (format_column_names).
    * Pure metadata operation: zero shuffle, zero compute.
    */
  def prefixColumns(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.map(c => s"${prefix}_$c").toIndexedSeq: _*)

  /** A11 — vertical "pivot" stack: union per-source results and prepend an
    * `index` provenance column holding the source name.
    * Reference: query_iterator.py:141-158 (_pivot_df).
    *
    * Schema contract (Q12 decision): every result must expose exactly the
    * first result's column set — we fail fast with a clear error instead of
    * the reference's KeyError/ragged-dict crash. Implemented with
    * `unionByName`, which is shuffle-free (pure plan concatenation).
    */
  def pivotStack(results: Seq[(String, DataFrame)]): DataFrame = {
    require(results.nonEmpty, "pivotStack: no results to stack")
    val cols = results.head._2.columns.toSeq
    results.foreach { case (src, d) =>
      require(
        d.columns.toSeq.sorted == cols.sorted,
        s"pivotStack: schema mismatch for source '$src': " +
          s"expected ${cols.mkString(",")} got ${d.columns.mkString(",")}")
    }
    results
      .map { case (src, d) =>
        d.select(lit(src).as("index") +: cols.map(qcol): _*)
      }
      .reduce(_ unionByName _)
  }

  /** A12 — positional horizontal concat: align per-source results by row
    * position (pandas `concat(axis=1)`), pad ragged lengths with NULL.
    * Reference: query_iterator.py:180-181, 207-208.
    *
    * "Position" per part is either the caller's explicit `orderBy`
    * columns (deterministic, oracle-friendly) or — with an EMPTY order —
    * the part's own emitted row order, which is the reference's pandas
    * semantics: it concatenates rows exactly as each query produced them
    * (query_iterator.py:180-181), so a query's own ORDER BY survives.
    * Each part is given a stable `row_id` either way, then parts are
    * full-outer joined on `row_id`.
    *
    * Scale note: an unpartitioned `row_number` funnels each part through a
    * single task — correct here because concat inputs are small per-source
    * aggregates by construction (as in the reference); never use this on a
    * raw fact table.
    */
  def positionalConcat(parts: Seq[(String, DataFrame, Seq[Column])],
      maxRowsPerPart: Long = 1000000L): DataFrame = {
    require(parts.nonEmpty, "positionalConcat: no parts")
    val withIds = parts.map { case (prefix, d, order) =>
      // row_number over the caller's order, computed BEFORE the prefix
      // rename so the order columns still resolve. An EMPTY order means
      // "the query's own emitted order" — the reference's pandas
      // positional-concat semantics (it numbers rows exactly as the
      // query produced them): funnel to one partition (inputs are small
      // per-source aggregates by contract — see scale note above) and
      // number rows in iteration order, which after an ORDER BY query
      // IS that query's output order.
      //
      // NOTE: `partitionBy(lit(0))` is constant-folded away by Catalyst,
      // so Spark 4.1 still logs its "No Partition Defined … single
      // partition" warning — the warning is ACCURATE and intentional
      // here (one partition per part is this operator's contract).
      val withId =
        if (order.nonEmpty)
          d.withColumn("row_id", row_number().over(
            Window.partitionBy(lit(0)).orderBy(order: _*)))
        else
          d.coalesce(1).withColumn("row_id",
            (monotonically_increasing_id() + 1).cast("int"))
      // Misuse guard: each part funnels through ONE task, so a part the
      // size of a fact table must fail loudly, not silently serialize.
      // Expressed as an always-true filter over assert_true (returns
      // NULL on success, raises on violation) — in-plan, zero extra
      // jobs, and not prunable the way an unused projected column is.
      val guarded = withId.filter(
        assert_true(col("row_id") <= maxRowsPerPart,
          lit(s"positionalConcat: part '$prefix' exceeds $maxRowsPerPart " +
            "rows; this operator single-tasks each part by contract — " +
            "it is for small per-source aggregates, never fact tables"))
          .isNull)
      guarded.select(
          col("row_id") +:
            d.columns.toIndexedSeq.map(c =>
              if (prefix.isEmpty) qcol(c) else qcol(c).as(s"${prefix}_$c")): _*)
    }
    withIds
      .reduce { (l, r) => l.join(r, Seq("row_id"), "full_outer") }
      .orderBy(col("row_id"))
  }
}
