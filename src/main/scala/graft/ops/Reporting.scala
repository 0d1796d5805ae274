package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus reporting and planning operators — the governance outputs a
  * training-data pipeline publishes next to the data itself (dataset cards)
  * and the allocation decisions a crawler derives from corpus mass.
  */
object Reporting {

  /** Dataset-card rollup: counts and additive measures at EVERY prefix
    * granularity of `dims` in one pass — (lang, source), (lang), and the
    * grand total — the summary table a dataset card publishes. Subtotal
    * rows carry the `(all)` sentinel selected by grouping() (NOT by
    * null-coalescing, so a genuinely-null dimension value never
    * masquerades as a subtotal), plus the grouping_id bitmask (first dim =
    * highest bit, the Spark and DuckDB shared convention).
    *
    * `measures` are (inputCol, outputName) pairs summed per cell; n_rows
    * counts. All additive-exact, so an external engine reproduces every
    * cell bit-for-bit.
    *
    * Scale shape: ONE shuffle — Spark expands rollup grouping sets
    * map-side and the partial aggregates combine, the same cost as the
    * finest groupBy alone (plus |dims|x partial rows); no per-level
    * rescans.
    */
  def datasetCard(df: DataFrame, dims: Seq[String],
                  measures: Seq[(String, String)]): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    // grouping()/grouping_id() are only legal INSIDE the Aggregate, so the
    // sentinel labels are computed as agg expressions and re-selected
    val aggs =
      dims.map { d =>
        when(grouping(col(d)) === 1, lit("(all)"))
          .otherwise(col(d).cast("string")).as(s"_lbl_$d")
      } ++ Seq(grouping_id().as("gid"), count(lit(1)).as("n_rows")) ++
        measures.map { case (c, name) => sum(col(c)).as(name) }
    df.rollup(dims.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(dims.map(d => col(s"_lbl_$d").as(d)) ++
        Seq(col("gid"), col("n_rows")) ++
        measures.map { case (_, name) => col(name) }: _*)
  }

  /** Largest-remainder (Hamilton) apportionment of an integer `budget`
    * across keys proportional to an integer weight — the crawl-planning
    * step that turns host mass into per-host fetch quotas, or a sampling
    * budget into per-domain row counts, with NO fractional seats and the
    * total EXACTLY equal to the budget:
    *
    *   base(k)  = (budget * w_k) div W
    *   leftover = budget - sum(base)          (< #keys by construction)
    *   alloc(k) = base(k) + 1 for the `leftover` largest remainders
    *              (budget * w_k) mod W, ties to the smaller key
    *
    * Entirely integer, so the quota table is engine-reproducible; callers
    * must keep budget * max(w) within int64 (at web scale pass weights
    * pre-scaled down — the apportionment is invariant to common factors
    * only up to rounding, which is exactly the point of computing it
    * ONCE here).
    *
    * Output: input columns + base + rem + alloc.
    *
    * Scale shape: the input is a per-key AGGREGATE (hosts/domains), not
    * the corpus — the two 1-row totals ride broadcast cross-joins and the
    * remainder rank is one window over key-count rows. The corpus-sized
    * work (computing the weights) belongs upstream in a groupBy the
    * caller already runs.
    */
  def apportionBudget(df: DataFrame, keyCol: String, weightCol: String,
                      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val w = col(weightCol)
    val tot = df.agg(sum(w).cast("long").as("_W"))
    val based = df.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($budget * $weightCol) div _W"))
      .withColumn("rem", expr(s"($budget * $weightCol) % _W"))
    val spent = based.agg(sum(col("base")).cast("long").as("_SB"))
    val rr = Window.orderBy(col("rem").desc, col(keyCol).asc)
    based.crossJoin(broadcast(spent))
      .withColumn("_rr", row_number().over(rr))
      .withColumn("alloc",
        col("base") + when(col("_rr") <= lit(budget) - col("_SB"), 1L).otherwise(0L))
      .drop("_W", "_SB", "_rr")
  }

  /** k-anonymity suppression over quasi-identifier columns — the release
    * gate a corpus with user-linked metadata passes before publication:
    * every row whose QI combination is shared by fewer than `k` rows gets
    * its QI values masked to `*` (null QI values mask too — null is itself
    * an identifying combination), so every published QI combination is
    * carried by >= k rows or fully redacted. Non-QI columns pass through;
    * `k_group_n` (pre-masking group size) and `k_suppressed` make the
    * decision auditable.
    *
    * Scale shape: one slim groupBy over the QI projection (map-side
    * combined), joined back on the QI keys — the payload shuffles once for
    * the join; with corpus-bounded QI cardinality the count side is small
    * and AQE broadcasts it.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 1, "need QI columns and k >= 1")
    // null-SAFE join back: groupBy put null QI values in their own group,
    // and an equi-join would drop them — letting exactly the rare-null
    // rows (the most identifying ones) escape masking
    val counts = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("k_group_n"))
      .select(qiCols.map(c => col(c).as(s"_qi_$c")) :+ col("k_group_n"): _*)
    val cond = qiCols.map(c => df(c) <=> col(s"_qi_$c")).reduce(_ && _)
    val masked = col("k_group_n") < k
    df.join(counts, cond, "left").select(df.columns.map { c =>
      if (qiCols.contains(c)) when(masked, lit("*"))
        .otherwise(col(c).cast("string")).as(c)
      else df(c)
    } :+ col("k_group_n") :+ masked.as("k_suppressed"): _*)
  }

  /** Simpson concentration/diversity of a categorical dimension per key —
    * the "is this language dominated by one source?" dataset-card metric.
    * Emitted as EXACT int64 parts plus the derived doubles:
    *
    *   n_total   = rows in the key
    *   n_dims    = distinct dimension values
    *   sum_sq    = sum over dims of count^2
    *   simpson   = sum_sq / n_total^2      (concentration; 1 = monoculture)
    *   inv_simpson = n_total^2 / sum_sq    ("effective number of sources")
    *
    * Because the parts are pure integers and the doubles are single
    * int/int divisions, any engine reproduces every value bit-for-bit —
    * unlike Shannon entropy, whose float fold order is engine-specific.
    *
    * Scale shape: two chained slim aggregates ((key, dim) then key), both
    * map-side combined; the payload never moves.
    */
  def simpsonDiversity(df: DataFrame, keyCol: String,
                       dimCol: String): DataFrame = {
    val cell = df.groupBy(col(keyCol), col(dimCol))
      .agg(count(lit(1)).as("_n"))
    cell.groupBy(col(keyCol)).agg(
        sum(col("_n")).as("n_total"),
        count(lit(1)).as("n_dims"),
        sum(col("_n") * col("_n")).as("sum_sq"))
      .select(col(keyCol), col("n_total"), col("n_dims"), col("sum_sq"),
        (col("sum_sq").cast("double") / (col("n_total") * col("n_total")))
          .as("simpson"),
        ((col("n_total") * col("n_total")).cast("double") / col("sum_sq"))
          .as("inv_simpson"))
  }

  /** Declarative data-quality gate (the Deequ-style publish check a
    * pipeline runs before promoting a corpus snapshot): each check is
    * (name, metric, pass) where `metric` is any AGGREGATE expression over
    * the table (completeness = avg(c.isNotNull.cast double), uniqueness =
    * count_distinct/count, bounds = min/max, containment = avg(isin...))
    * and `pass` judges the resulting scalar. Output: one row per check —
    * (constraint, metric double, passed boolean) — small enough to assert
    * on, log, or block a promotion.
    *
    * Scale shape: ALL metrics compute in ONE aggregation pass over the
    * table (partial-combined, single global reduce of one row per metric
    * set); the report explode is driver-trivial. N checks do not cost N
    * scans — the reason the API takes the whole suite at once.
    */
  def constraintReport(df: DataFrame,
                       checks: Seq[(String, org.apache.spark.sql.Column,
                         org.apache.spark.sql.Column => org.apache.spark.sql.Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    require(checks.map(_._1).distinct.size == checks.size,
      "check names must be unique")
    val aggs = checks.zipWithIndex.map { case ((_, m, _), i) =>
      m.cast("double").as(s"_m$i")
    }
    val entries = checks.zipWithIndex.map { case ((n, _, p), i) =>
      struct(lit(n).as("constraint"), col(s"_m$i").as("metric"),
        p(col(s"_m$i")).as("passed"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("_c"))
      .select(col("_c.constraint"), col("_c.metric"), col("_c.passed"))
  }

  /** Exact contingency table (crosstab): counts of `colCol` values per
    * `rowCol`, one output column per entry of `values`, zero-filled. The
    * value list is EXPLICIT by design: schema stays deterministic across
    * runs/engines and Spark skips the extra distinct-discovery job its
    * value-less pivot would run. Unlisted values are ignored (pivot
    * semantics) — pass the full domain, or gate upstream.
    *
    * Scale shape: a pivot with literal values is ONE map-side-combined
    * aggregation shuffling |rowCol domain| x |values| cells — the payload
    * never moves; no per-value scans.
    */
  def crosstab(df: DataFrame, rowCol: String, colCol: String,
               values: Seq[String]): DataFrame = {
    require(values.nonEmpty && values.distinct.size == values.size,
      "values must be non-empty and distinct")
    df.groupBy(col(rowCol)).pivot(colCol, values).agg(count(lit(1)))
      .na.fill(0L, values)
  }

  /** Differentially-private group counts with SEEDED Laplace noise — the
    * publishable companion to [[kAnonymize]]: per-key counts plus
    * Laplace(1/epsilon) noise (count queries have sensitivity 1) satisfy
    * epsilon-DP, and because the noise draw is a pure function of
    * (key, seed) — a 32-bit md5 rank mapped through the Laplace inverse
    * CDF — the "random" release is deterministic: re-running the report
    * reproduces it bit-for-bit, an external engine can replay it, and
    * nobody can average away the noise by re-querying (the classic DP
    * deployment failure; rotate `seed` only when the underlying corpus
    * epoch changes). epsilon is passed as an exact rational
    * epsNum/epsDen so the scale b = epsDen/epsNum is one double division.
    * u = (md5rank + 0.5) / 2^32 keeps the draw strictly inside (0, 1) and
    * every arithmetic step before the single ln() call is dyadic-exact.
    *
    * Scale shape: one combiner-friendly aggregate; the noise is a row-
    * local expression over the (key-bounded) count table. Returns
    * (keys..., n, n_noisy, epsilon).
    */
  def dpCounts(df: DataFrame, keys: Seq[String], epsNum: Long, epsDen: Long,
               seed: String): DataFrame = {
    require(keys.nonEmpty && epsNum > 0 && epsDen > 0,
      "need keys and a positive rational epsilon")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val keyStr = concat_ws("\u0001",
      keys.map(c => col(c).cast("string")) :+ lit(seed): _*)
    val rank = conv(substring(md5(keyStr.cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val u = (rank.cast("double") + lit(0.5)) / lit(4294967296.0)
    val b = lit(epsDen.toDouble) / lit(epsNum.toDouble)
    val centered = u - lit(0.5)
    // Laplace inverse CDF: -b * sign(u-1/2) * ln(1 - 2|u-1/2|); the sign
    // product and negation are rounding-free, so op grouping is immaterial
    val noise = (b * signum(centered)) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    counts
      .withColumn("n_noisy", col("n").cast("double") - noise)
      .withColumn("epsilon", lit(epsNum.toDouble) / lit(epsDen.toDouble))
  }

  /** Exact per-column data profile — the pre-ingest audit a pipeline runs
    * before trusting a new corpus drop: one row per requested column with
    * n, n_null, n_distinct (exact, nulls excluded), and min/max rendered
    * as strings so heterogeneous column types share one schema. String
    * rendering of integers and strings is engine-portable; float columns
    * profile fine but their min_val/max_val text is Java-formatted — keep
    * cross-engine checks to int/string columns or compare numerically.
    *
    * Scale shape: ONE pass — Spark plans the multi-column distinct set via
    * Expand (|cols| replicas of the slim projection, each partially
    * aggregated map-side), so cost is |cols| × scan, not |cols| jobs.
    * Output is |cols| rows. For very wide tables at 100 TB swap the exact
    * distinct for the HLL sketch profile (functions.sketchexpr) — this op
    * is the exact tier of that pair.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"),
        (col(s"_n_$c") + col(s"_nn_$c")).as("n"),
        col(s"_nn_$c").as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_mn_$c").as("min_val"),
        col(s"_mx_$c").as("max_val"))
    }
    one.select(explode(array(stacked: _*)).as("_r")).select(col("_r.*"))
  }

  /** Pareto contribution cut ("which hosts are 80% of the crawl"): keys
    * rank by total integer weight descending (key asc tie-break), carry
    * exact cumulative weights, and a key is IN the cut iff the cumulative
    * weight BEFORE it is still short of `pctNum/pctDen` of the total —
    * compared cross-multiplied in bigints (`(cum − w)·pctDen <
    * pctNum·total`), so the flag is exact and the cut always includes the
    * key that crosses the threshold. `share` is the key's one-division
    * fraction for reporting.
    *
    * Scale shape: the event volume collapses to one combiner aggregate
    * per key FIRST; the rank/cumulative window runs over the key-bounded
    * table only (hosts, languages, sources — not rows). Output per key:
    * key, weight, rank, cum_weight, share, in_cut.
    */
  /** Gini coefficient of a keyed weight distribution — the one-number
    * inequality reading next to [[paretoCut]]'s cut list ("how
    * concentrated is crawl mass across hosts"): with per-key totals w
    * sorted ascending and ranked 1..n,
    *
    *   G = 2·Σ(i·wᵢ) / (n·W) − (n+1)/n
    *
    * Σ(i·wᵢ) is an exact bigint (tie order is irrelevant — equal weights
    * contribute the same sum under any rank permutation), so G is two
    * divisions and a subtract: bit-replayable. 0 = perfectly even,
    * (n−1)/n = one key owns everything.
    *
    * Output one row: n_keys, total_weight, gini (null when n·W = 0).
    * Scale shape: one combiner aggregate per key, then rank/sum windows
    * over the KEY-BOUNDED table only (the [[paretoCut]] caveat). */
  def giniCoefficient(df: DataFrame, keyCol: String,
                      weightCol: String): DataFrame = {
    val perKey = df.groupBy(col(keyCol).as("key"))
      .agg(sum(col(weightCol).cast("long")).as("w"))
    val ranked = perKey.withColumn("_i",
      row_number().over(Window.orderBy(col("w"), col("key"))).cast("long"))
    ranked.agg(count(lit(1)).as("n_keys"), sum(col("w")).as("total_weight"),
        sum(col("_i") * col("w")).as("_s"))
      .withColumn("gini",
        when(col("n_keys") > 0 && col("total_weight") > 0,
          lit(2.0) * col("_s").cast("double") /
            (col("n_keys") * col("total_weight")).cast("double") -
            (col("n_keys") + 1).cast("double") /
              col("n_keys").cast("double")))
      .drop("_s")
  }

  def paretoCut(df: DataFrame, keyCol: String, weightCol: String,
                pctNum: Long = 80L, pctDen: Long = 100L): DataFrame = {
    require(pctNum > 0 && pctDen > 0 && pctNum <= pctDen,
      "need 0 < pctNum <= pctDen")
    // key-bounded aggregate; eager leaf so the total and the ranked pass
    // don't each re-run the corpus aggregate
    val perKey = df.groupBy(col(keyCol).as("key"))
      .agg(sum(col(weightCol).cast("long")).as("weight"))
      .localCheckpoint()
    val tot = perKey.agg(sum(col("weight")).as("_total"))
    val w = Window.orderBy(col("weight").desc, col("key").asc)
    perKey.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_weight", sum(col("weight")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("share",
        col("weight").cast("double") / col("_total").cast("double"))
      .withColumn("in_cut",
        (col("cum_weight") - col("weight")) * pctDen <
          lit(pctNum) * col("_total"))
      .drop("_total")
  }
}
