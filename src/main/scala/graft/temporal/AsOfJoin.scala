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
  */
object AsOfJoin {

  /** Correctness-oracle implementation (window forward-fill). */
  def asOfUnion(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      strict: Boolean = false,
      suffix: String = "_r"): DataFrame = {
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

    val filled = pTagged.unionByName(bTagged)
      .select(
        col("*") +:
          (payloadCols.map(c => last(col(outName(c)), ignoreNulls = true).over(w).as("_f_" + outName(c))) :+
            last(col(buildTsOut), ignoreNulls = true).over(w).as("_f_" + buildTsOut)): _*)

    filled
      .where($"_tag" === probeTag)
      .select(
        (keys.map(col) ++
          probe.columns.filterNot(keys.contains).map(col) ++
          payloadCols.map(c => col("_f_" + outName(c)).as(outName(c)))) :+
          col("_f_" + buildTsOut).as(buildTsOut) :+
          col("_f_" + buildTsOut).isNotNull.as("_asof_matched"): _*)
  }

  /** Scale-path implementation: range-bucketed sort-merge with bounded
    * carry replication. Semantically identical to [[asOfUnion]] (property
    * tested); `bucket` is the time-bucket width.
    *
    * Shuffle shape: build side shuffles twice ((key,bucket) join + tiny
    * carry aggregation), probe side twice ((key,bucket) join + carry join) —
    * but every shuffle key includes the bucket, so hot urls with 10^6
    * revisits split across (revisit span / bucket) reducers instead of one.
    */
  def asOfBucketed(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      bucket: Column,
      strict: Boolean = false,
      suffix: String = "_r"): DataFrame = {
    val spark = probe.sparkSession
    import spark.implicits._

    val payloadCols = build.columns.filterNot(c => keys.contains(c) || c == buildTs)
    val outName: Map[String, String] =
      payloadCols.map(c => c -> (if (probe.columns.contains(c)) c + suffix else c)).toMap
    val buildTsOut = if (probe.columns.contains(buildTs)) buildTs + suffix else buildTs
    val probeOutCols = keys ++ probe.columns.filterNot(keys.contains)

    // epoch seconds for timestamp/ntz inputs, identity for numeric ts
    def bucketOf(ts: Column): Column =
      floor(ts.cast("timestamp").cast("double") / bucket.cast("double")).cast("long")

    // _rid identifies a probe row across the two join branches; mono ids are
    // stable here because both branches share one deterministic lineage.
    val p = probe.withColumn("_pb", bucketOf(col(probeTs)))
      .withColumn("_rid", monotonically_increasing_id())
    // build side fully renamed to unique temp names: probe and build often
    // share lineage (self-as-of), and distinct names sidestep Spark's
    // ambiguous-self-join resolution entirely
    val bKey: Seq[String] = keys.indices.map(i => s"_bk$i")
    val b = build.withColumn("_bb", bucketOf(col(buildTs)))
      .select(
        keys.zipWithIndex.map { case (k, i) => col(k).as(s"_bk$i") } ++
          Seq(col(buildTs).as("_bts0"), col("_bb").as("_bb0")) ++
          payloadCols.map(c => col(c).as(s"_bp_$c")): _*)

    val payloadStruct: Column =
      struct(col("_bts0").as("_bts") +: payloadCols.map(c => col(s"_bp_$c").as(c)): _*)

    // (1) in-bucket candidates: equi-join on (key, bucket), keep the latest
    // build row per probe row. Aggregation by _rid keeps memory bounded.
    val cmp = if (strict) col("_bts0") < col(probeTs) else col("_bts0") <= col(probeTs)
    val inBucket = p.join(b,
        keys.zipWithIndex.map { case (k, i) => p(k) === col(s"_bk$i") }.reduce(_ && _) &&
          p("_pb") === col("_bb0") && cmp,
        "inner")
      .groupBy(col("_rid"))
      .agg(max(payloadStruct).as("_hit"))

    // (2) carry table: last build row per (key, bucket) — bounded to ONE row
    // per bucket, the boundedness guarantee for hot keys.
    val carries = b.groupBy((bKey.map(col) :+ col("_bb0").as("_cb")): _*)
      .agg(max(payloadStruct).as("_carry"))
      .select(keys.zipWithIndex.map { case (k, i) => col(s"_bk$i").as(k) } ++
        Seq(col("_cb"), col("_carry")): _*)

    // (3) forward-fill carries onto the DISTINCT probe buckets per key:
    // cardinality is (keys x buckets), far below row count. A probe bucket x
    // must see the latest carry from buckets STRICTLY BEFORE x (bucket x
    // itself is covered exactly by the in-bucket join, and its carry may be
    // later than a given probe ts) — hence probe markers sort before the
    // same bucket's carry and the frame ends one row early.
    val probeBuckets = p.select((keys.map(col) :+ $"_pb"): _*).distinct()
      .withColumn("_cb", $"_pb")
      .withColumn("_carry", lit(null).cast(carries.schema("_carry").dataType))
      .withColumn("_isProbe", lit(1))
    val carryTagged = carries.withColumn("_pb", lit(null).cast("long")).withColumn("_isProbe", lit(0))

    val wCarry = Window
      .partitionBy(keys.map(col): _*)
      .orderBy($"_cb".asc, $"_isProbe".desc) // probe marker BEFORE same-bucket carry
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)

    val carryForProbeBucket = probeBuckets.unionByName(carryTagged)
      .withColumn("_prevCarry", last($"_carry", ignoreNulls = true).over(wCarry))
      .where($"_isProbe" === 1)
      .select((keys.map(col) :+ $"_pb" :+ $"_prevCarry"): _*)

    // (4) attach carry to probes, combine with in-bucket hit (in-bucket wins
    // when present: its ts is >= any earlier-bucket carry by construction).
    val withCarry = p.join(carryForProbeBucket, keys :+ "_pb", "left")
    val joined = withCarry.join(inBucket, Seq("_rid"), "left")
      .withColumn("_best", coalesce($"_hit", $"_prevCarry"))

    joined.select(
      (probeOutCols.map(col) ++
        payloadCols.map(c => col("_best").getField(c).as(outName(c)))) :+
        col("_best").getField("_bts").as(buildTsOut) :+
        col("_best").isNotNull.as("_asof_matched"): _*)
  }
}
