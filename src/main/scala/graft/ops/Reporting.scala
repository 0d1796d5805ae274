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
}
