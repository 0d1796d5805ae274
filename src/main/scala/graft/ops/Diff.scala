package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the incremental-crawl bookkeeping step: given
  * two snapshots of a keyed corpus (e.g. latest page per url on two crawl
  * days), classify every key as added / removed / changed / unchanged.
  * Downstream, only `added`+`changed` keys re-enter feature extraction and
  * dedup, which is what makes continuous ingestion cheap: the recompute
  * set is the churn, not the corpus.
  */
object Diff {

  /** One row per key present in either snapshot:
    * (keyCol, old_key, new_key, diff_status). Precondition: `keyCol` is
    * unique within each snapshot (run latestSnapshot upstream for raw
    * revisit streams).
    *
    * Scale shape: content is reduced to a 16-byte hash BEFORE the join, so
    * the full-outer join moves only (key, hash) pairs — payloads never
    * shuffle; null-status logic is a codegen'd projection on top.
    */
  def snapshotDiff(old: DataFrame, newer: DataFrame, keyCol: String,
                   contentCol: String,
                   keyFn: Column => Column = c => md5(c.cast("binary"))): DataFrame = {
    val o = old.select(col(keyCol), keyFn(col(contentCol)).as("old_key"))
    val n = newer.select(col(keyCol), keyFn(col(contentCol)).as("new_key"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol), col("old_key"), col("new_key"),
        when(col("old_key").isNull, lit("added"))
          .when(col("new_key").isNull, lit("removed"))
          .when(col("old_key") === col("new_key"), lit("unchanged"))
          .otherwise(lit("changed")).as("diff_status"))
  }
}
