package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (SURVEY.md §4.3; north_rule "partitioning /
  * shuffle / skew handled explicitly"):
  *
  *  - [[saltedAgg]] — two-phase aggregation: hot keys are split across
  *    `salt` reducers by a deterministic salt column, partially aggregated,
  *    then merged. Works for any algebraic aggregate set.
  *  - [[saltCol]] — the deterministic salt used across the engine
  *    (pmod(xxhash64(cols), S)), e.g. to pre-split a hot url's revisits
  *    before an expensive per-row stage.
  *
  * Where salting cannot apply (order-sensitive windows: sessionization needs
  * the full per-url timeline), the engine bounds per-key work instead: the
  * window stage operates on payload-free rows (FeatureJob keepPayload=false)
  * and the as-of join spreads hot keys across time buckets (AsOfJoin
  * bucketed path). AQE skew-join splitting stays enabled for residual join
  * skew (FeatureJob session config).
  */
object Skew {

  /** Deterministic salt in [0, salt). */
  def saltCol(salt: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salt)).cast("int")

  /** Two-phase salted aggregation. `partial` computes per-(key, salt)
    * aggregates; `merge` combines the partials per key. Example:
    * {{{
    * Skew.saltedAgg(df, Seq("url"), 16)(
    *   partial = d => d.agg(count(lit(1)).as("c"), sum($"bytes").as("b")),
    *   merge = d => d.agg(sum($"c").as("c"), sum($"b").as("b")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int)(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      merge: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    // salt derives from the NON-key columns so a hot key's rows spread
    // deterministically across `salt` reducers (salting by key alone would
    // keep the hot key on one reducer; rand() would break reproducibility)
    val nonKey = df.columns.filterNot(keys.contains).map(col).toSeq
    val salted = df.withColumn("_salt", saltCol(salt, nonKey: _*))
    val partials = partial(salted.groupBy((keys.map(col) :+ col("_salt")): _*))
    merge(partials.drop("_salt").groupBy(keys.map(col): _*))
  }

  /** Convenience: salted distinct-count + row-count per key (the common
    * hot-domain profile query).
    */
  def keyProfile(df: DataFrame, keys: Seq[String], valueCol: String, salt: Int = 16): DataFrame =
    saltedAgg(df, keys, salt)(
      partial = g => g.agg(
        count(lit(1)).as("_rows"),
        approx_count_distinct(col(valueCol)).as("_adist")),
      merge = g => g.agg(
        sum(col("_rows")).as("rows"),
        sum(col("_adist")).as("approx_distinct_upper")))
}
