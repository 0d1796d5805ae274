package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every probe row, attach the payload of
  * the LATEST build row with the same key and build_ts <= probe_ts (strictly
  * `<` when `strict`). No feature ever reads data later than its as-of
  * timestamp — the zero-temporal-leakage contract (BASELINE.json north_star;
  * SURVEY.md §2.5 J4).
  *
  * Two implementations with identical semantics:
  *
  *  - [[asOfUnion]] — the correctness oracle. Union-tag trick: tag probe and
  *    build rows, sort (key, ts, tag) in one window, forward-fill the build
  *    payload, keep probes. One shuffle on key; a hot key lands on a single
  *    reducer, so this is the small/medium-scale and testing path.
  *
  *  - [[asOfBucketed]] — the scale path. Both sides are range-bucketed on
  *    time; the in-bucket join runs on (key, bucket) so a hot url's rows
  *    spread across many reducers, and cross-bucket visibility is restored
  *    by a carry table that holds only the LAST build row per (key, bucket)
  *    — bounded replication, as SURVEY.md §7 "hard parts" requires. The
  *    carry forward-fill runs at (key × bucket) granularity, orders of
  *    magnitude smaller than row count. AQE skew-join splitting remains
  *    active on the residual joins.
  *
  * Both append `right`'s payload columns (suffixed when colliding) plus
  * `_asof_matched: boolean`.
  *
  * `toleranceSeconds` (optional) is the feature-store max-staleness bound:
  * a probe only matches when `probe_ts - build_ts <= tolerance` (whole
  * epoch seconds on both sides). Filtering the LATEST candidate is
  * equivalent to bounding the search — every earlier build row is staler —
  * so the tolerance is a pure post-predicate on the found row: too-stale
  * probes come back unmatched with null payload, exactly like no-history
  * probes. No extra pass, no plan change.
  */
object AsOfJoin {

  private def staleGuard(row: Column, probeTs: Column,
                         toleranceSeconds: Option[Long]): Column = {
    val keep = toleranceSeconds.fold(row.isNotNull) { t =>
      row.isNotNull &&
        (Windows.epochSeconds(probeTs) -
          Windows.epochSeconds(row.getField("_bts"))) <= t
    }
    when(keep, row)
  }

  /** Correctness-oracle implementation (window forward-fill). */
  def asOfUnion(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      strict: Boolean = false,
      suffix: String = "_r",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val spark = probe.sparkSession
    import spark.implicits._

    val payloadCols = build.columns.filterNot(c => keys.contains(c) || c == buildTs)
    val outName: Map[String, String] =
      payloadCols.map(c => c -> (if (probe.columns.contains(c)) c + suffix else c)).toMap
    val buildTsOut = if (probe.columns.contains(buildTs)) buildTs + suffix else buildTs

    // tag ordering decides tie behavior at equal ts: inclusive (<=) sorts
    // build rows BEFORE probes at the same instant; strict (<) sorts after.
    val probeTag = if (strict) 0 else 1
    val buildTag = 1 - probeTag

    val pTagged = probe
      .withColumn("_ts", col(probeTs))
      .withColumn("_tag", lit(probeTag))
      .withColumn(buildTsOut, lit(null).cast(build.schema(buildTs).dataType))
      .select(
        (keys.map(col) :+ $"_ts" :+ $"_tag") ++
          probe.columns.filterNot(keys.contains).map(col) ++
          payloadCols.map(c => lit(null).cast(build.schema(c).dataType).as(outName(c))) :+
          col(buildTsOut): _*)

    val bTagged = build
      .withColumn("_ts", col(buildTs))
      .withColumn("_tag", lit(buildTag))
      .select(
        (keys.map(col) :+ $"_ts" :+ $"_tag") ++
          probe.columns.filterNot(keys.contains).map(c => lit(null).cast(probe.schema(c).dataType).as(c)) ++
          payloadCols.map(c => col(c).as(outName(c))) :+
          col(buildTs).as(buildTsOut): _*)

    // deterministic tie-break among equal-ts build rows: ascending payload
    // struct, so the forward-fill picks the MAX payload — same semantics as
    // asOfBucketed's max(struct(ts, payload)).
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy($"_ts".asc, $"_tag".asc,
        struct((col(buildTsOut) +: payloadCols.map(c => col(outName(c)))): _*).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // forward-fill ONE struct per build row (null on probe rows), so the
    // result's payload columns all come from the SAME build row — per-column
    // last(ignoreNulls) would mix an older row's non-null value into a newer
    // build row's null column.
    val buildRowStruct = when($"_tag" === lit(buildTag),
      struct(col(buildTsOut).as("_bts") +: payloadCols.map(c => col(outName(c)).as(c)): _*))

    val filled = pTagged.unionByName(bTagged)
      .withColumn("_f", last(buildRowStruct, ignoreNulls = true).over(w))

    filled
      .where($"_tag" === probeTag)
      .withColumn("_row", staleGuard(col("_f"), $"_ts", toleranceSeconds))
      .select(
        (keys.map(col) ++
          probe.columns.filterNot(keys.contains).map(col) ++
          payloadCols.map(c => col("_row").getField(c).as(outName(c)))) :+
          col("_row").getField("_bts").as(buildTsOut) :+
          col("_row").isNotNull.as("_asof_matched"): _*)
  }

  /** Scale-path implementation: range-bucketed SORT-based as-of.
    * Semantically identical to [[asOfUnion]] (property tested); `bucket` is
    * the time-bucket width in the ts column's native numeric unit (seconds
    * for timestamps).
    *
    * Shape: the union-tag forward-fill of [[asOfUnion]], but windowed over
    * (key, time_bucket) instead of (key) — per-reducer work is bounded by
    * bucket population, so a hot url with 10^6 revisits spreads across
    * (revisit span / bucket) reducers instead of serializing on one.
    * Cross-bucket visibility is restored by a carry table holding only the
    * LAST build row per (key, bucket) (bounded replication), forward-filled
    * at bucket granularity — orders of magnitude below row count — and
    * joined back to probe rows whose in-bucket fill came up empty-or-earlier.
    * Everything is sort/window/aggregate — no pairwise join blowup on dense
    * buckets (the naive (key,bucket) equi-join is O(P x B) per bucket and
    * loses to the plain window by an order of magnitude under skew;
    * measured in BENCH/BASELINE.md).
    */
  def asOfBucketed(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      bucket: Column,
      strict: Boolean = false,
      suffix: String = "_r",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val spark = probe.sparkSession
    import spark.implicits._

    val payloadCols = build.columns.filterNot(c => keys.contains(c) || c == buildTs)
    val outName: Map[String, String] =
      payloadCols.map(c => c -> (if (probe.columns.contains(c)) c + suffix else c)).toMap
    val buildTsOut = if (probe.columns.contains(buildTs)) buildTs + suffix else buildTs

    // epoch seconds for timestamp/ntz inputs, identity for numeric ts
    def bucketOf(ts: Column): Column =
      floor(ts.cast("timestamp").cast("double") / bucket.cast("double")).cast("long")

    // tag ordering decides tie behavior at equal ts (see asOfUnion)
    val probeTag = if (strict) 0 else 1
    val buildTag = 1 - probeTag

    val pTagged = probe
      .withColumn("_ts", col(probeTs))
      .withColumn("_pb", bucketOf(col(probeTs)))
      .withColumn("_tag", lit(probeTag))
      .withColumn(buildTsOut, lit(null).cast(build.schema(buildTs).dataType))
      .select(
        (keys.map(col) :+ $"_ts" :+ $"_pb" :+ $"_tag") ++
          probe.columns.filterNot(keys.contains).map(col) ++
          payloadCols.map(c => lit(null).cast(build.schema(c).dataType).as(outName(c))) :+
          col(buildTsOut): _*)

    val bTagged = build
      .withColumn("_ts", col(buildTs))
      .withColumn("_pb", bucketOf(col(buildTs)))
      .withColumn("_tag", lit(buildTag))
      .select(
        (keys.map(col) :+ $"_ts" :+ $"_pb" :+ $"_tag") ++
          probe.columns.filterNot(keys.contains).map(c => lit(null).cast(probe.schema(c).dataType).as(c)) ++
          payloadCols.map(c => col(c).as(outName(c))) :+
          col(buildTs).as(buildTsOut): _*)

    // (1) in-bucket forward-fill: ONE window over (key, bucket) — the same
    // deterministic max-payload tie-break as asOfUnion
    val w = Window
      .partitionBy((keys.map(col) :+ $"_pb"): _*)
      .orderBy($"_ts".asc, $"_tag".asc,
        struct((col(buildTsOut) +: payloadCols.map(c => col(outName(c)))): _*).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ONE whole-build-row struct forward-filled per (key, bucket) — same
    // field layout as the carry struct so step (4) can pick rows atomically.
    val buildRowStruct = when($"_tag" === lit(buildTag),
      struct(col(buildTsOut).as("_bts") +: payloadCols.map(c => col(outName(c)).as(c)): _*))
    val filled = pTagged.unionByName(bTagged)
      .withColumn("_f", last(buildRowStruct, ignoreNulls = true).over(w))
    val probes = filled.where($"_tag" === probeTag)

    // (2) carry table: last build row per (key, bucket) — bounded to ONE row
    // per bucket. Keys re-aliased (_ck*) so self-as-of lineage stays
    // unambiguous.
    val carryPayload = struct(col(buildTsOut).as("_bts") +: payloadCols.map(c => col(outName(c)).as(c)): _*)
    val carries = bTagged
      .groupBy((keys.zipWithIndex.map { case (k, i) => col(k).as(s"_ck$i") } :+ $"_pb".as("_cb")): _*)
      .agg(max(carryPayload).as("_carry"))

    // (3) forward-fill carries onto DISTINCT probe buckets per key —
    // cardinality (keys x buckets), far below row count. A probe bucket x
    // sees the latest carry from buckets STRICTLY BEFORE x (bucket x itself
    // is covered exactly by the in-bucket fill).
    val probeBuckets = pTagged
      .groupBy((keys.zipWithIndex.map { case (k, i) => col(k).as(s"_ck$i") } :+ $"_pb".as("_cb")): _*)
      .agg(lit(1).as("_isProbe"))
      .withColumn("_carry", lit(null).cast(carries.schema("_carry").dataType))
    val carryTagged = carries.withColumn("_isProbe", lit(0))

    val wCarry = Window
      .partitionBy(keys.indices.map(i => col(s"_ck$i")): _*)
      .orderBy($"_cb".asc, $"_isProbe".desc) // probe marker BEFORE same-bucket carry
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)

    val carryForProbeBucket = probeBuckets.unionByName(carryTagged)
      .withColumn("_prevCarry", last($"_carry", ignoreNulls = true).over(wCarry))
      .where($"_isProbe" === 1)
      .select((keys.indices.map(i => col(s"_ck$i")) :+ $"_cb" :+ $"_prevCarry"): _*)

    // (4) combine: in-bucket fill wins when present (its ts >= any
    // earlier-bucket carry by construction); the whole-row struct coalesce
    // keeps every payload column from ONE build row. The carry side is tiny
    // and AQE broadcast-joins it.
    val joinCond = keys.zipWithIndex.map { case (k, i) => probes(k) === col(s"_ck$i") }
      .reduce(_ && _) && probes("_pb") === col("_cb")
    val joined = probes.join(carryForProbeBucket, joinCond, "left")
      .withColumn("_row",
        staleGuard(coalesce(col("_f"), col("_prevCarry")), col("_ts"), toleranceSeconds))

    joined.select(
      (keys.map(col) ++
        probe.columns.filterNot(keys.contains).map(col) ++
        payloadCols.map(c => col("_row").getField(c).as(outName(c)))) :+
        col("_row").getField("_bts").as(buildTsOut) :+
        col("_row").isNotNull.as("_asof_matched"): _*)
  }

  /** Temporal-leakage audit over an as-of joined output — the "provably
    * zero temporal leakage" contract as a first-class, queryable check
    * rather than a test-only property: per key, how many probe rows
    * matched a build row FROM THE FUTURE (`n_leaks` — must be 0 for any
    * correct point-in-time join; inclusive joins allow build_ts ==
    * probe_ts, strict ones don't) and, when a tolerance is given, how
    * many matches are older than allowed (`n_stale` — must be 0 when the
    * join enforced the same tolerance). Run it over every feature table a
    * training pipeline materializes; a nonzero row is a reproducible
    * pointer at the exact entity that leaked.
    *
    * Output: (keys..., n_rows, n_matched, n_leaks, n_stale). One hash
    * aggregate over (keys, two ts columns) — map-side combined, payload
    * never read.
    */
  /** Point-in-time windowed COUNT join — the as-of family's aggregate
    * member: for every left event, how many RIGHT events the same key
    * produced in the trailing `windowSeconds` ending AT the left event
    * ("clicks in the 7 days before this purchase"), with zero temporal
    * leakage by construction (the RANGE frame ends at the current row —
    * no frame ever sees a later second; same-second right events count,
    * the documented closed upper bound). Implemented by the UNION-MERGE
    * trick: both sides tagged into one keyed stream, ONE range-frame
    * window sums the right-tags, left rows filter back out — never a
    * per-row correlated lookup, never an inequality join.
    *
    * Output: keys…, tsCol, idCol, n_right_in_window. Scale shape: one
    * (key, second)-sorted window over the slim union; `idCol` must be
    * unique on the left. */
  def asOfCount(left: DataFrame, right: DataFrame, keys: Seq[String],
                tsCol: String, idCol: String,
                windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 0, "windowSeconds must be >= 0")
    val ls = left.select(keys.map(col) :+ col(tsCol).as("_ts") :+
        col(idCol).as("_id"): _*)
      .withColumn("_r", lit(0L))
    val rs = right.select(keys.map(col) :+ col(tsCol).as("_ts"): _*)
      .withColumn("_id", lit(null).cast(
        left.schema(left.schema.fieldIndex(idCol)).dataType))
      .withColumn("_r", lit(1L))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").cast("timestamp").cast("long"))
      .rangeBetween(-windowSeconds, 0)
    ls.unionByName(rs)
      .withColumn("_cnt", sum(col("_r")).over(w))
      .where(col("_id").isNotNull)
      .select(keys.map(col) :+ col("_ts").as(tsCol) :+
        col("_id").as(idCol) :+
        col("_cnt").as("n_right_in_window"): _*)
  }

  def leakageAudit(joined: DataFrame, keys: Seq[String], probeTsCol: String,
                   buildTsCol: String, strict: Boolean = false,
                   toleranceSeconds: Option[Long] = None): DataFrame = {
    val b = col(buildTsCol)
    val p = col(probeTsCol)
    val leak = b.isNotNull && (if (strict) b >= p else b > p)
    val stale = toleranceSeconds
      .map(t => b.isNotNull &&
        (Windows.epochSeconds(p) - Windows.epochSeconds(b)) > t)
      .getOrElse(lit(false))
    joined.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum(when(b.isNotNull, 1L).otherwise(0L)).as("n_matched"),
      sum(when(leak, 1L).otherwise(0L)).as("n_leaks"),
      sum(when(stale, 1L).otherwise(0L)).as("n_stale"))
  }

  /** NEAREST-snapshot join: for every probe row, the build row minimizing
    * |probe_ts − build_ts| (microsecond precision), ties going to the
    * EARLIER (backward) row. The enrichment dual of the as-of join: as-of
    * is mandatory for features (no future reads); nearest is for
    * annotation/debugging joins where the closest measurement — either
    * side — is wanted, e.g. pairing a crawl snapshot with the closest
    * render-service capture. NOT leakage-safe by construction; do not
    * feed its output to training features.
    *
    * Same union-tag single-sort shape as [[asOfUnion]]: ONE shuffle on
    * key, then a forward-fill (last preceding build row) and a
    * backward-fill (first following build row) over the same sort, and a
    * per-row argmin. Tie conventions: equal |delta| → backward;
    * equal-ts build rows collapse to max payload struct backward /
    * min payload struct forward (both deterministic).
    *
    * `maxDeltaSeconds` bounds the match like asOf's tolerance: a nearest
    * row farther than the bound (in whole seconds) comes back unmatched.
    * Output mirrors [[asOfUnion]]: probe columns + payload (suffixed on
    * collision) + build ts + `_asof_matched`.
    */
  def nearest(probe: DataFrame, build: DataFrame, keys: Seq[String],
              probeTs: String, buildTs: String, suffix: String = "_r",
              maxDeltaSeconds: Option[Long] = None): DataFrame = {
    val spark = probe.sparkSession
    import spark.implicits._
    val payloadCols = build.columns.filterNot(c => keys.contains(c) || c == buildTs)
    val outName: Map[String, String] =
      payloadCols.map(c => c -> (if (probe.columns.contains(c)) c + suffix else c)).toMap
    val buildTsOut = if (probe.columns.contains(buildTs)) buildTs + suffix else buildTs

    val pTagged = probe
      .withColumn("_ts", col(probeTs))
      .withColumn("_tag", lit(1))
      .select(
        (keys.map(col) :+ $"_ts" :+ $"_tag") ++
          probe.columns.filterNot(keys.contains).map(col) ++
          payloadCols.map(c => lit(null).cast(build.schema(c).dataType).as(outName(c))) :+
          lit(null).cast(build.schema(buildTs).dataType).as(buildTsOut): _*)
    val bTagged = build
      .withColumn("_ts", col(buildTs))
      .withColumn("_tag", lit(0))
      .select(
        (keys.map(col) :+ $"_ts" :+ $"_tag") ++
          probe.columns.filterNot(keys.contains).map(c =>
            lit(null).cast(probe.schema(c).dataType).as(c)) ++
          payloadCols.map(c => col(c).as(outName(c))) :+
          col(buildTs).as(buildTsOut): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy($"_ts".asc, $"_tag".asc,
        struct(col(buildTsOut) +: payloadCols.map(c => col(outName(c))): _*)
          .asc_nulls_first)
    val buildRowStruct = when($"_tag" === 0,
      struct(col(buildTsOut).as("_bts") +:
        payloadCols.map(c => col(outName(c)).as(c)): _*))
    val filled = pTagged.unionByName(bTagged)
      .withColumn("_back", last(buildRowStruct, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_fwd", first(buildRowStruct, ignoreNulls = true)
        .over(w.rowsBetween(0, Window.unboundedFollowing)))

    val pUs = unix_micros($"_ts".cast("timestamp"))
    def bUs(c: Column): Column = unix_micros(c.getField("_bts").cast("timestamp"))
    val backD = pUs - bUs(col("_back"))
    val fwdD = bUs(col("_fwd")) - pUs
    val chosen0 = when(col("_back").isNull, col("_fwd"))
      .when(col("_fwd").isNull, col("_back"))
      .when(backD <= fwdD, col("_back")).otherwise(col("_fwd"))
    val chosen = maxDeltaSeconds.fold(chosen0)(t =>
      when(abs(pUs - bUs(chosen0)) <= t * 1000000L, chosen0))

    filled
      .where($"_tag" === 1)
      .withColumn("_row", chosen)
      .select(
        (keys.map(col) ++
          probe.columns.filterNot(keys.contains).map(col) ++
          payloadCols.map(c => col("_row").getField(c).as(outName(c)))) :+
          col("_row").getField("_bts").as(buildTsOut) :+
          col("_row").isNotNull.as("_asof_matched"): _*)
  }
}
