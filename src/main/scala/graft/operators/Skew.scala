package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale.
  *
  * A shuffle hash-partitions by key: one pathological key (the empty
  * document, the null user, the default tenant) lands every row on one
  * task and the stage runs at the speed of that straggler. AQE's skew
  * join handles sort-merge spills adaptively; these utilities cover the
  * two patterns AQE does not: broadcast-ineligible dimension joins with
  * hot fact keys, and single-hot-key aggregations.
  */
object Skew {

  /** Salted fact⋈dim equi-join: the fact side spreads each key over
    * `salt` sub-keys (round-robin by a per-row hash — any distribution
    * works, the join key still matches); the dim side is replicated
    * `salt`× with an exploded salt column. Join output is identical to
    * the unsalted join; the hot key now occupies `salt` tasks.
    *
    * Cost model: dim side grows `salt`× — use when |dim| ≪ |fact| but
    * dim is too big (or too wide) to broadcast outright.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column, salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(factKey, monotonically_increasing_id()), lit(salt)))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(saltedDim,
        factKey === dimKey && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Two-phase aggregation for hot grouping keys: COUNT and SUM
    * decompose, so aggregate first by (key, salt) — spreading a hot key
    * over `salt` reducers — then combine partials by key.
    *
    * `sums` are (column → output name); a count is always produced as
    * `n`. Results are identical to the direct groupBy.
    */
  def twoPhaseCountSum(df: DataFrame, key: Column, salt: Int,
      sums: Seq[(Column, String)] = Nil): DataFrame = {
    // salt = hash of the row's own columns mixed with the input
    // partition id. The partition-id component exists to spread fully
    // identical duplicate rows — the exact shape of a hot key — across
    // salt buckets instead of collapsing them into one. (Partials are
    // additionally bit-stable across task retries when the upstream
    // partitioning is deterministic; after e.g. a round-robin
    // repartition() rows may re-deal across salts on retry — results
    // stay correct either way since COUNT/SUM decompose.)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(spark_partition_id() +: df.columns.map(col): _*),
        lit(salt)))
    val partialAggs = count(lit(1)).as("__pn") +:
      sums.zipWithIndex.map { case ((c, _), i) => sum(c).as(s"__ps$i") }
    val partial = salted.groupBy(key.as("__k"), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sum(col("__pn")).as("n") +:
      sums.zipWithIndex.map { case ((_, name), i) =>
        sum(col(s"__ps$i")).as(name)
      }
    partial.groupBy(col("__k"))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
