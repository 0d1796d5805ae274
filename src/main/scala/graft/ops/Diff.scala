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

  /** Population Stability Index between two snapshots of a categorical
    * column — the standard "did the crawl mix drift?" monitor run between
    * crawl days or training-mix versions. One row per category in the
    * UNION of both snapshots: raw counts, add-one-smoothed shares
    * (p = (n+1)/(T+K), K = union category count — keeps every term finite
    * and the arithmetic a pure function of integer counts), the PSI term
    * `(p_ref - p_cur) * ln(p_ref / p_cur)`, and the total `psi` repeated on
    * each row (rule of thumb: < 0.1 stable, > 0.25 drifted).
    *
    * Scale shape: one combiner-friendly aggregate per side, a full-outer
    * join on the category table (category-bounded, not corpus-bounded),
    * and a single-row totals aggregate broadcast back by crossJoin. The
    * corpus itself is never joined or windowed.
    */
  /** Schema drift between two snapshots of a table: one row per column in
    * the union of both schemas with its type on each side and a status ∈
    * {added, removed, type_changed, unchanged} — the first check a
    * pipeline runs when a new corpus drop arrives (a silently retyped
    * column corrupts more downstream state than a missing one). Schema
    * metadata is driver-resident, so this is a pure metadata operation:
    * zero jobs, zero scans; the result is a local literal table.
    */
  def schemaDiff(old: DataFrame, newer: DataFrame): DataFrame = {
    val spark = old.sparkSession
    import spark.implicits._
    val o = old.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val n = newer.schema.map(f => f.name -> f.dataType.simpleString).toMap
    (o.keySet ++ n.keySet).toSeq.sorted.map { c =>
      val status = (o.get(c), n.get(c)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "type_changed"
      }
      (c, o.get(c).orNull, n.get(c).orNull, status)
    }.toDF("column", "old_type", "new_type", "status")
  }

  /** Apply a CDC changelog to a base snapshot (the MERGE INTO a lakehouse
    * runs nightly): `changes` carries (key, seq, op, payload...) with op ∈
    * {"upsert", "delete"}; per key only the row with the HIGHEST seq
    * applies. Keys untouched by the changelog pass through from base;
    * a winning upsert replaces the base row; a winning delete removes it.
    *
    * Determinism contract: `seqCol` must be unique per key (it is a
    * changelog sequence number); ties would make the winner order-
    * dependent, so the highest-seq rule breaks ties by preferring
    * "delete" (documented, deterministic) rather than silently racing.
    *
    * Output: base schema (keyCol + payload columns, which must match
    * between the two inputs). Scale shape: one per-key window over the
    * CHANGELOG (changelog-sized, typically ≪ base), then one left-anti
    * join of base against the touched-key list + a union — the base
    * table is never windowed or widened.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCol: String,
                     seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol)
    require(payload.forall(changes.columns.contains),
      "changes must carry every base payload column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, when(col(opCol) === "delete", 0).otherwise(1))
    val latest = changes
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
    val winners = latest.where(col(opCol) =!= "delete")
      .select(col(keyCol) +: payload.map(col): _*)
    val touched = latest.select(col(keyCol))
    base.join(touched, Seq(keyCol), "left_anti").unionByName(winners)
  }

  /** Slowly-changing-dimension Type 2 history build: turn a changelog of
    * (key, seq, op, payload…) into one validity-interval row per surviving
    * version — `valid_from_seq` (the change's own sequence), `valid_to_seq`
    * (the NEXT change's sequence for the key, null while open) and
    * `is_current`. A `delete` row closes the previous version's interval
    * (it is the lead() successor) but emits no interval of its own, so a
    * deleted key simply has no current row.
    *
    * Determinism contract: `seqCol` must be unique per key (changelog
    * sequence); [[applyChangelog]]'s tie caveat applies unchanged.
    *
    * Scale shape: ONE per-key window over the changelog — no self-join,
    * no base-table touch; output is changelog-sized. The classic
    * warehouse alternative (join each version against the next by
    * seq+1 lookup) is a second shuffle for nothing.
    */
  def scd2(changes: DataFrame, keyCol: String, seqCol: String,
           opCol: String): DataFrame = {
    val payload = changes.columns
      .filterNot(c => c == keyCol || c == seqCol || c == opCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(seqCol))
    changes
      .withColumn("_vt", lead(col(seqCol), 1).over(w))
      .where(col(opCol) =!= "delete")
      .select(col(keyCol) +: payload.map(col) :+
        col(seqCol).cast("long").as("valid_from_seq") :+
        col("_vt").cast("long").as("valid_to_seq") :+
        col("_vt").isNull.as("is_current"): _*)
  }

  /** Range-digest reconciliation ([[snapshotDiff]]'s SCALE path): instead
    * of joining two replicas row-by-row to find drift, each table folds
    * into `nBuckets` order-free bucket digests — bucket = md5(id) mod
    * nBuckets, digest = bit_xor of a 60-bit md5 integer over
    * (id + payload) — and only buckets whose (count, digest) pairs
    * disagree need the expensive row-level comparison. XOR is
    * commutative/associative, so the digest is partition- and fold-
    * order-independent and bit-replayable by any engine; 60 bits keeps
    * the integer inside signed int64 everywhere.
    *
    * Output per bucket present in either table: bucket, n_a, n_b,
    * digest_a, digest_b, matches. Scale shape: one combiner aggregate
    * per side (nBuckets rows out), one tiny bucket join — the tables
    * themselves never co-shuffle. */
  def rangeDigestDiff(a: DataFrame, b: DataFrame, idCol: String,
                      payloadCols: Seq[String],
                      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    require(payloadCols.nonEmpty, "need at least one payload column")
    def digests(df: DataFrame, tag: String) = {
      val rowHash = conv(substring(md5(concat_ws("",
        (col(idCol).cast("string") +:
          payloadCols.map(c => col(c).cast("string"))): _*)
        .cast("binary")), 1, 15), 16, 10).cast("long")
      val bucket = conv(substring(md5(col(idCol).cast("string")
        .cast("binary")), 1, 8), 16, 10).cast("long") % nBuckets
      df.select(bucket.as("bucket"), rowHash.as("_h"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as(s"n_$tag"),
          expr("bit_xor(_h)").as(s"digest_$tag"))
    }
    digests(a, "a").join(digests(b, "b"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("digest_a"), col("digest_b"))
      .withColumn("matches",
        col("n_a") === col("n_b") && col("digest_a") <=> col("digest_b"))
  }

  /** Three-way merge of two divergent snapshots against their common
    * base — the reconciliation step when two crawl/curation branches
    * edited the same table: per key (present in ANY of the three), a
    * side "changed" iff its payload struct differs null-safely from the
    * base (absence counts as a change, so adds and deletes participate),
    * and the outcome is the classic rule — only one side changed → take
    * it; both changed identically → take either (`both_same`); both
    * changed apart → `conflict` (merged payload null, sides preserved
    * for the resolver); neither → `unchanged`.
    *
    * Output: keyCol, status ('unchanged'|'ours'|'theirs'|'both_same'|
    * 'conflict'), merged payload columns (null when the winning side
    * deleted the key, or on conflict). Scale shape: two key equi-joins
    * (base⟗ours⟗theirs), payloads ride as structs, no window.
    */
  def threeWayMerge(base: DataFrame, ours: DataFrame, theirs: DataFrame,
                    keyCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    require(payload.nonEmpty &&
      payload.forall(c => ours.columns.contains(c) &&
        theirs.columns.contains(c)),
      "all three inputs must share the base payload columns")
    def side(df: DataFrame, tag: String) = df.select(
      col(keyCol).as("_k"),
      struct(payload.map(col): _*).as(s"_$tag"))
    val joined = side(base, "b")
      .join(side(ours, "o"), Seq("_k"), "full_outer")
      .join(side(theirs, "t"), Seq("_k"), "full_outer")
    val oursChanged = !(col("_o") <=> col("_b"))
    val theirsChanged = !(col("_t") <=> col("_b"))
    val winner = when(!oursChanged, col("_t"))
      .when(!theirsChanged, col("_o"))
      .when(col("_o") <=> col("_t"), col("_o"))
    val status = when(!oursChanged && !theirsChanged, "unchanged")
      .when(!oursChanged, "theirs")
      .when(!theirsChanged, "ours")
      .when(col("_o") <=> col("_t"), "both_same")
      .otherwise("conflict")
    joined.select(col("_k").as(keyCol) +: status.as("status") +:
      payload.map(c => winner.getField(c).as(c)): _*)
  }

  def psiDrift(ref: DataFrame, cur: DataFrame, catCol: String): DataFrame = {
    val r = ref.groupBy(col(catCol).as("category")).agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(col(catCol).as("category")).agg(count(lit(1)).as("n_cur"))
    val joined = r.join(c, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("_tr"),
      sum(col("n_cur")).as("_tc"), count(lit(1)).as("_k"))
    val pRef = (col("n_ref") + 1).cast("double") / (col("_tr") + col("_k")).cast("double")
    val pCur = (col("n_cur") + 1).cast("double") / (col("_tc") + col("_k")).cast("double")
    val withTerm = joined.crossJoin(tot)
      .withColumn("p_ref", pRef)
      .withColumn("p_cur", pCur)
      .withColumn("psi_term",
        (col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")))
    // the total is a LEFT-TO-RIGHT fold over category-sorted terms, not a
    // float sum (whose value would depend on partition merge order)
    val psiTotal = withTerm.agg(
      expr("""aggregate(sort_array(collect_list(struct(category, psi_term))),
             |cast(0.0 as double), (acc, x) -> acc + x.psi_term)""".stripMargin)
        .as("psi"))
    withTerm.crossJoin(psiTotal)
      .select(col("category"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"), col("psi_term"), col("psi"))
  }

  /** MEMBERSHIP churn between two top-k snapshots — the companion to
    * `Stats.kendallTau` (which measures ORDER churn over the common
    * keys, and is blind to keys entering/leaving the list): set sizes,
    * intersection, additions (in b only), drops (in a only), and the
    * Jaccard overlap as a single integer/integer division. One row out;
    * all integers exact, engine-reproducible.
    *
    * INTENDED FOR TOP-K LISTS (like kendallTau): the full-outer join is
    * list-sized. Feed it rankings, not corpora.
    */
  def topkChurn(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val l = a.select(col(keyCol).cast("string").as("_k")).distinct()
      .withColumn("_ina", lit(1L))
    val r = b.select(col(keyCol).cast("string").as("_k")).distinct()
      .withColumn("_inb", lit(1L))
    l.join(r, Seq("_k"), "full_outer").agg(
        coalesce(sum(col("_ina")), lit(0L)).as("n_a"),
        coalesce(sum(col("_inb")), lit(0L)).as("n_b"),
        coalesce(sum(col("_ina") * col("_inb")), lit(0L)).as("n_common"),
        coalesce(sum(when(col("_ina").isNull, 1L)), lit(0L)).as("n_added"),
        coalesce(sum(when(col("_inb").isNull, 1L)), lit(0L)).as("n_dropped"))
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("n_common") > 0,
          col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double")))
  }
}
