package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: probe rows against an interval table, one output
  * row per (probe, interval) pair with lo <= v <= hi — the IP-to-ASN /
  * value-to-band lookup of crawl enrichment. The as-of join answers
  * "latest snapshot before t"; this answers "which bands contain v", and a
  * naive formulation is a BroadcastNestedLoopJoin (or worse, a cartesian
  * product) that dies at corpus scale.
  *
  * Strategy here is the classic BUCKETED range join: both sides map values
  * into fixed-width buckets — each interval explodes into every bucket it
  * overlaps, each probe value into exactly one — turning the
  * theta-join into an EQUI-join on (keys..., bucket) plus a residual
  * `BETWEEN` filter. Spark then plans an ordinary hash join: shuffled by
  * bucket (co-partitioned, skew handled by AQE) or broadcast when the
  * exploded interval side is small.
  */
object RangeJoin {

  /** Exact floor division of a long column by a positive literal width
    * (`div` truncates toward zero — wrong for negative values; subtracting
    * the nonneg pmod first makes the quotient exact at any magnitude, with
    * no double-precision detour).
    */
  private def floorDiv(c: Column, w: Long): Column = {
    val base = c - pmod(c, lit(w))
    (base / lit(w)).cast("long") // base is an exact multiple of w; the
    // double division is exact for |base/w| < 2^53 — guarded by callers'
    // bucketWidth choice (see scaladoc)
  }

  /** Bucketed inclusive range join.
    *
    * @param probe       rows carrying `valueCol` (long-castable)
    * @param intervals   rows carrying `loCol`/`hiCol` (inclusive ends,
    *                    lo <= hi; rows violating that are dropped — an
    *                    empty interval matches nothing)
    * @param bucketWidth bucket size in value units. Replication of an
    *                    interval is ceil(span/width)+1 buckets, so width
    *                    should be chosen near the TYPICAL interval span:
    *                    too small replicates wide intervals, too large
    *                    piles unrelated intervals into one bucket and the
    *                    residual filter does the work. Quotients must stay
    *                    below 2^53 (any realistic unit does).
    * @param keys        optional equi-key columns present on BOTH sides
    *                    (per-key band tables); joined along with the bucket
    * @param maxBucketsPerInterval loud-failure guard: an interval spanning
    *                    more buckets than this raises an error instead of
    *                    silently exploding the build side (the classic
    *                    "one [0, MAX] interval melts the cluster" failure)
    *
    * Output: probe columns ++ interval columns (names must be disjoint).
    *
    * Scale shape: one narrow explode on the interval side (bounded by the
    * guard), then a single equi-shuffle on (keys, bucket) — never a
    * nested-loop. Matches arriving via different buckets are impossible
    * (a probe owns exactly one bucket), so no post-join dedup is needed.
    */
  def bucketed(probe: DataFrame, intervals: DataFrame, valueCol: String,
               loCol: String, hiCol: String, bucketWidth: Long,
               keys: Seq[String] = Nil,
               maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    val dup = probe.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(dup.isEmpty, s"column name collision across sides: $dup")
    val lo = col(loCol).cast("long")
    val hi = col(hiCol).cast("long")
    val nb = floorDiv(hi, bucketWidth) - floorDiv(lo, bucketWidth) + 1
    val iv = intervals
      .where(lo <= hi)
      .withColumn("_nb", nb)
      .withColumn("_nb_ok",
        when(col("_nb") <= maxBucketsPerInterval, col("_nb"))
          .otherwise(raise_error(concat(
            lit(s"RangeJoin: interval spans more than $maxBucketsPerInterval buckets ("),
            col("_nb").cast("string"),
            lit(s") at bucketWidth=$bucketWidth — raise the width or split the interval")))))
      .withColumn("_b",
        explode(sequence(floorDiv(lo, bucketWidth),
          floorDiv(lo, bucketWidth) + col("_nb_ok") - 1)))
      .drop("_nb", "_nb_ok")
    val pb = probe.withColumn("_b", floorDiv(col(valueCol).cast("long"), bucketWidth))
    pb.join(iv, keys :+ "_b")
      .where(col(valueCol).cast("long").between(lo, hi))
      .drop("_b")
  }

  /** Bucketed interval-OVERLAP join: one output row per (a, b) pair whose
    * CLOSED intervals intersect — a.lo <= b.hi AND b.lo <= a.hi. The
    * sessions-vs-outages / validity-vs-validity companion of [[bucketed]]
    * (which joins points to intervals).
    *
    * Both sides explode into the fixed-width buckets they cover and the
    * theta-join becomes an equi-join on (keys..., bucket) plus the exact
    * overlap residual. An overlapping pair co-occurs in EVERY shared
    * bucket, so duplicates are suppressed without a distinct: the pair is
    * emitted only from the bucket containing max(a.lo, b.lo) — which both
    * sides provably cover when they overlap (it is <= min(a.hi, b.hi)) —
    * i.e. where bucket == greatest(floor(a.lo/w), floor(b.lo/w)).
    *
    * Output: a's columns ++ b's columns (names disjoint apart from
    * `keys`). Same width guidance and per-interval replication guard as
    * [[bucketed]]; the shuffle is one equi-exchange on (keys, bucket),
    * never a nested loop, and AQE handles bucket skew.
    */
  def overlap(a: DataFrame, b: DataFrame, aLoCol: String, aHiCol: String,
              bLoCol: String, bHiCol: String, bucketWidth: Long,
              keys: Seq[String] = Nil,
              maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    val dup = a.columns.toSet.intersect(b.columns.toSet) -- keys
    require(dup.isEmpty, s"column name collision across sides: $dup")
    def exploded(df: DataFrame, loCol: String, hiCol: String): DataFrame = {
      val lo = col(loCol).cast("long")
      val hi = col(hiCol).cast("long")
      val nb = floorDiv(hi, bucketWidth) - floorDiv(lo, bucketWidth) + 1
      df.where(lo <= hi)
        .withColumn("_nb", nb)
        .withColumn("_nb_ok",
          when(col("_nb") <= maxBucketsPerInterval, col("_nb"))
            .otherwise(raise_error(concat(
              lit(s"RangeJoin: interval spans more than $maxBucketsPerInterval buckets ("),
              col("_nb").cast("string"),
              lit(s") at bucketWidth=$bucketWidth — raise the width or split the interval")))))
        .withColumn("_b",
          explode(sequence(floorDiv(lo, bucketWidth),
            floorDiv(lo, bucketWidth) + col("_nb_ok") - 1)))
        .drop("_nb", "_nb_ok")
    }
    val ea = exploded(a, aLoCol, aHiCol)
    val eb = exploded(b, bLoCol, bHiCol)
    val aLo = col(aLoCol).cast("long"); val aHi = col(aHiCol).cast("long")
    val bLo = col(bLoCol).cast("long"); val bHi = col(bHiCol).cast("long")
    ea.join(eb, keys :+ "_b")
      .where(aLo <= bHi && bLo <= aHi &&
        col("_b") === greatest(floorDiv(aLo, bucketWidth),
          floorDiv(bLo, bucketWidth)))
      .drop("_b")
  }
}
