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

  /** Salted shuffle JOIN for skewed keys when BOTH sides are too big to
    * broadcast: the probe side gets a deterministic per-row salt (derived
    * from `probeIdCol`, NOT rand() — reruns and resume must land rows on
    * the same reducer), the build side replicates each row into all `salt`
    * buckets, and the join runs on (keys..., salt). Semantically identical
    * to `probe.join(build, keys)` — a hot key's probe rows now spread
    * across `salt` reducers instead of piling on one.
    *
    * Cost: build side × salt replication — use for the "millions of probe
    * rows per key against a per-key band/dimension table" shape, where
    * build is orders of magnitude smaller but above the broadcast
    * threshold. (AQE's skew-join split handles moderate skew on its own;
    * this is the explicit tool for the pathological key. For aggregation
    * skew use [[saltedAgg]]; a broadcastable build side needs neither.)
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 probeIdCol: String, salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val p = probe.withColumn("_salt", saltCol(salt, col(probeIdCol)))
    // sequence(int, int) is already array<int>, matching saltCol's type
    val b = build.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, keys :+ "_salt").drop("_salt")
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
