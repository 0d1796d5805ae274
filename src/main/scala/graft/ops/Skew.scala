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

  /** One-row key-skew diagnostic: the "should this groupBy be salted?"
    * report an operator runs BEFORE committing a partitioning at 100 TB.
    * Emits n_rows, n_keys, the heaviest key + its count, its share of all
    * rows, the exact Gini coefficient of the per-key count distribution,
    * and `suggested_salt` = ceil(max_n * n_keys / n_rows) — the smallest
    * split factor that brings the hottest key down to the mean reducer load
    * (1 = no salting needed).
    *
    * Exactness at scale without sorting the key set: Gini needs ranked
    * counts, but ranks within ties are interchangeable, so it is computed
    * from the COUNT-OF-COUNTS histogram — groupBy(key) (combiner-friendly),
    * then groupBy(count) (tiny: one row per DISTINCT count value), and the
    * rank window runs over that histogram, never over the keys. A block of
    * m keys of count c occupying ascending-rank positions p+1..p+m
    * contributes c*(m*p + m*(m+1)/2) to the rank-weighted sum S, and
    * G = 2S/(K*T) - (K+1)/K. The heaviest key is a max(struct) aggregate
    * (deterministic: largest key string breaks count ties). No window ever
    * sees more rows than there are distinct count VALUES.
    */
  def skewReport(df: DataFrame, keys: Seq[String]): DataFrame = {
    val keyStr = concat_ws("", keys.map(col): _*)
    val perKey = df.groupBy(keyStr.as("_key")).agg(count(lit(1)).as("_n"))
    val top = perKey.agg(
      max(struct(col("_n"), col("_key"))).as("_top"),
      count(lit(1)).as("_k"))
    val coc = perKey.groupBy(col("_n")).agg(count(lit(1)).as("_m"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_n"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val s = coc
      .withColumn("_p", coalesce(sum(col("_m")).over(w), lit(0L)))
      // all-bigint rank-weighted sum (m*(m+1) is even, `div` is exact)
      .agg(
        sum(expr("_n * (_m * _p + (_m * (_m + 1)) div 2)")).as("_s"),
        sum(col("_n") * col("_m")).as("_t"))
    s.crossJoin(top).select(
      col("_t").as("n_rows"),
      col("_k").as("n_keys"),
      col("_top._key").as("max_key"),
      col("_top._n").as("max_n"),
      (col("_top._n").cast("double") / col("_t").cast("double")).as("top_share"),
      ((lit(2.0) * col("_s")) / (col("_k") * col("_t")).cast("double") -
        (col("_k") + lit(1.0)) / col("_k").cast("double")).as("gini"),
      expr("(_top._n * _k + _t - 1) div _t").as("suggested_salt"))
  }

  /** EXACT inner-join output-size preflight — run this on the key columns
    * BEFORE a big join to learn whether the join will explode and which
    * keys explode it: |A join B| = sum over matching keys of n_a * n_b,
    * computed from the two per-key count aggregates (key-cardinality-
    * sized, never row-sized). Emits the topN contributing keys (pairs
    * desc, key asc — deterministic at the boundary) plus a '*' total row
    * holding the exact join cardinality and matching-key count. The cost
    * is two combiner aggregates + a key-sized join — orders of magnitude
    * cheaper than discovering the explosion in the shuffle spill.
    *
    * Returns (key, n_left, n_right, pairs); the '*' total row carries
    * (matched-key count, matched-key count, exact total join rows).
    */
  def joinSizeEstimate(left: DataFrame, right: DataFrame, keyCol: String,
                       topN: Int = 10): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val l = left.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_right"))
    val matched = l.join(r, Seq("key"))
      .withColumn("pairs", col("n_left") * col("n_right"))
    val total = matched.agg(
      count(lit(1)).as("_mk"), coalesce(sum(col("pairs")), lit(0L)).as("_tp"))
      .select(lit("*").as("key"), col("_mk").as("n_left"),
        col("_mk").as("n_right"), col("_tp").as("pairs"))
    matched.orderBy(col("pairs").desc, col("key").asc).limit(topN)
      .unionByName(total)
  }

  /** Bloom-prefiltered semi-join — the hand-rolled RUNTIME FILTER: build
    * side folds into ONE Bloom filter (a few MB regardless of row count),
    * the filter broadcasts and drops non-matching probe rows BEFORE the
    * shuffle, and an exact semi-join scrubs the Bloom's false positives.
    * Result is EXACTLY `probe LEFT SEMI JOIN build` — no false negatives
    * by Bloom construction, no false positives past the exact pass — but
    * the exchange moves only ~|matches| + fp·|probe| rows instead of the
    * whole probe table. The win at 100 TB: a selective build side turns a
    * full-corpus shuffle into a trickle; size mBits ≈ 10 bits/key for
    * ~1% fp.
    *
    * Scale shape: build aggregates map-side into one filter row
    * (crossJoin broadcast), probe filter is a narrow codegen'd map, the
    * residual semi-join shuffles only survivors.
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, keyCol: String,
                    mBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val bloom = build.agg(
      graft.functions.bloom_agg(col(keyCol).cast("string"), mBits, k)
        .as("_bf"))
    probe.crossJoin(broadcast(bloom))
      .where(graft.functions.bloom_contains(col("_bf"),
        col(keyCol).cast("string")))
      .drop("_bf")
      .join(build.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
  }
}
