package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Token-budget selection, DSIR importance weights, winnowed partial-dup
  * overlap: brute-force parity, determinism under repartition, and the
  * winnowing detection guarantee.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // ---- selectByTokenBudget ----

  private def budgetInput(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 7 % 19 + 1).toLong, (i * 13 % 6).toLong))
      .toDF("id", "tokens", "score")

  test("selectByTokenBudget matches the driver-side brute force, repartition-stable") {
    val df = budgetInput(200)
    val budget = 700L
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force: global (score desc, id asc) inclusive cumsum
    var cum = 0L
    val expected = rows.sortBy { case (id, _, s) => (-s, id) }.map { case (id, tk, s) =>
      cum += tk
      (id, cum, cum <= budget)
    }.map(t => (t._1, (t._2, t._3))).toMap

    for (d <- Seq(df, df.repartition(7))) {
      val got = Curation.selectByTokenBudget(d, "id", "tokens", "score", budget)
        .select($"id", $"cum_tokens", $"kept").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
      assert(got === expected)
    }
  }

  test("selectByTokenBudget: budget 0 keeps nothing; huge budget keeps everything") {
    val df = budgetInput(30)
    val none = Curation.selectByTokenBudget(df, "id", "tokens", "score", 0L)
    assert(none.where($"kept").count() === 0L)
    assert(none.count() === 30L)
    val all = Curation.selectByTokenBudget(df, "id", "tokens", "score", Long.MaxValue / 2)
    assert(all.where(!$"kept").count() === 0L)
  }

  // ---- importanceWeights ----

  test("importanceWeights matches an independent BigInt reimplementation") {
    val docs = Seq(
      (1L, "apple banana apple cherry", true),
      (2L, "banana banana cherry", true),
      (3L, "xyzzy quux flurb xyzzy", false),
      (4L, "apple xyzzy", false),
      (5L, "", false)
    ).toDF("id", "text", "is_target")
    val nB = 16
    val scale = 1000000L

    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % nB
    }
    val toks = docs.collect().flatMap { r =>
      "[a-z0-9_']+".r.findAllIn(r.getString(1).toLowerCase)
        .map(t => (r.getLong(0), bucket(t), r.getBoolean(2))).toSeq
    }
    val raw = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tgt = toks.groupBy(_._2).view.mapValues(_.count(_._3).toLong).toMap
    val rawTot = toks.size.toLong
    val tgtTot = toks.count(_._3).toLong
    def w(b: Long): Long =
      ((BigInt(scale) * BigInt(tgt(b) + 1) * BigInt(rawTot + nB)) /
        (BigInt(raw(b) + 1) * BigInt(tgtTot + nB))).toLong
    val expected = (1L to 5L).map { id =>
      val mine = toks.filter(_._1 == id)
      (id, (mine.size.toLong, mine.map(t => w(t._2)).sum))
    }.toMap

    for (d <- Seq(docs, docs.repartition(3))) {
      val got = Curation.importanceWeights(d, "id", "text", "is_target", nB, scale)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got === expected)
    }
  }

  test("importanceWeights ranks target-like held-out docs above off-target ones") {
    // target rows use the fruit vocabulary, background uses the junk one;
    // two held-out docs (not target-flagged) are scored by association
    val base = (1 to 20).map(i => (i.toLong, "apple banana cherry date", true)) ++
      (21 to 40).map(i => (i.toLong, "xyzzy quux flurb grault", false))
    val docs = (base ++ Seq(
      (100L, "apple banana date banana", false),
      (101L, "quux flurb xyzzy grault", false))).toDF("id", "text", "is_target")
    val got = Curation.importanceWeights(docs, "id", "text", "is_target", 64)
      .where($"id" >= 100L).collect()
      .map(r => (r.getLong(0), r.getLong(2).toDouble / r.getLong(1))).toMap
    assert(got(100L) > got(101L))
  }

  // ---- winnowedOverlapPairs ----

  private val junk1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val junk2 = "one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
  private val copied = "the quick brown fox jumps over the lazy dog while seven " +
    "wizards brew tonic under moonlight near ancient stone bridges every autumn evening"

  test("winnowing guarantee: a copied run >= windowW + k - 1 tokens is detected") {
    val docs = Seq(
      (1L, junk1 + " " + copied + " " + junk1),
      (2L, junk2 + " " + copied + " " + junk2),
      (3L, junk2 + " " + junk2 + " " + junk2)
    ).toDF("id", "text")
    for (d <- Seq(docs, docs.repartition(5))) {
      val pairs = Dedup.winnowedOverlapPairs(d, "id", "text",
        k = 4, windowW = 5, minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), "shared paragraph must be found")
      // doc 3 (junk2 repeated) legitimately overlaps doc 2's junk2 frame —
      // that IS a partial dup — but shares no 4-gram with doc 1
      assert(!pairs.contains((1L, 3L)), "doc 3 shares no k-gram with doc 1")
      assert(pairs.contains((2L, 3L)), "doc 3's junk2 run is a real partial dup of doc 2")
    }
    // the doc-LEVEL jaccard view is blind to this pair at dedup thresholds
    val j = Dedup.ngramJaccardPairs(docs, "id", "text", n = 4,
      threshold = 0.5, maxShingleDf = 1000)
    assert(j.where($"id_a" === 1L && $"id_b" === 2L).isEmpty,
      "whole-doc jaccard misses the partial overlap winnowing finds")
  }

  test("winnowedOverlapPairs: identical docs share their whole fingerprint set; short docs fingerprint as one min") {
    val docs = Seq((1L, copied), (2L, copied), (3L, "tiny doc here"), (4L, "tiny doc here"))
      .toDF("id", "text")
    val pairs = Dedup.winnowedOverlapPairs(docs, "id", "text",
      k = 4, windowW = 5, minShared = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 2L)
    // 3 words with k=4 -> zero k-grams -> no fingerprints -> no pair
    assert(!pairs.contains((3L, 4L)))
  }

  // ---- nearDupDedup keepBy + nearDupIncremental ----

  test("nearDupDedup keepByCol keeps the best-scored row per cluster, min-id on ties") {
    val docs = Seq(
      (1L, copied, 10L),
      (2L, copied + " extra tail words here", 99L), // same cluster, higher score
      (3L, junk1, 5L),
      (4L, junk1, 5L) // exact dup of 3, tied score -> min id wins
    ).toDF("id", "text", "quality")
    val r = Dedup.nearDupDedup(docs, "id", "text", numHashes = 64,
        numBands = 32, shingleSize = 3, jaccard = 0.8, keepByCol = Some("quality"))
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(r(2L) && !r(1L), "higher quality wins the cluster")
    assert(r(3L) && !r(4L), "score tie falls back to min id")
    // default (no score) keeps min id everywhere
    val d = Dedup.nearDupDedup(docs, "id", "text", numHashes = 64,
        numBands = 32, shingleSize = 3, jaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(d(1L) && !d(2L))
  }

  test("nearDupDedup keepByCol: giant cluster never becomes one sort partition; NULL scores keep min id") {
    // one pathological cluster: the same template row replicated 300x with
    // distinct scores (argmax at id 137), plus an all-NULL-score pair
    val giant = (0 until 300).map(i =>
      (i.toLong, copied, if (i == 137) java.lang.Long.valueOf(1000L)
        else java.lang.Long.valueOf(i % 50L)))
    val nulls = Seq((900L, junk1, null.asInstanceOf[java.lang.Long]),
      (901L, junk1, null.asInstanceOf[java.lang.Long]))
    val docs = (giant ++ nulls).toDF("id", "text", "quality")
    val out = Dedup.nearDupDedup(docs, "id", "text", numHashes = 64,
      numBands = 32, shingleSize = 3, jaccard = 0.8,
      keepByCol = Some("quality"))
    // plan shape: the scored path must contain NO window operator — the
    // canonical pick is aggregates, so a giant cluster spreads like any
    // other groupBy instead of concentrating in one task
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scored keep path uses a window:\n$plan")
    val r = out.collect().map(x => (x.getLong(0), x.getBoolean(3))).toMap
    assert(r(137L), "giant cluster keeps the argmax score row")
    assert((0 until 300).count(i => r(i.toLong)) == 1)
    assert(r(900L) && !r(901L), "all-NULL-score cluster keeps min id")
    val sizes = out.collect().map(x => (x.getLong(0), x.getLong(2))).toMap
    assert(sizes(137L) == 300L && sizes(900L) == 2L)
  }

  test("nearDupIncremental: ledger dups dropped, shard dups canonicalized, ingestion idempotent") {
    val ledger = Seq((1L, copied), (2L, junk1)).toDF("id", "text")
    val incoming = Seq(
      (10L, copied),            // ledger_dup of 1
      (11L, junk2),             // novel -> kept
      (12L, junk2),             // within-shard dup of 11 -> shard_dup
      (13L, junk2 + " y")       // near-dup of 11 -> shard_dup (J high)
    ).toDF("id", "text")
    val r = Dedup.nearDupIncremental(incoming, ledger, "id", "text",
        numHashes = 64, numBands = 32, shingleSize = 3, jaccard = 0.8)
      .collect().map(r => (r.getLong(0), (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(r(10L) === ("ledger_dup", 1L))
    assert(r(11L) === ("kept", -1L))
    assert(r(12L) === ("shard_dup", 11L))
    assert(r(13L)._1 === "shard_dup")
    // idempotence: append the kept row to the ledger, re-ingest the shard
    val ledger2 = ledger.unionByName(Seq((11L, junk2)).toDF("id", "text"))
    val again = Dedup.nearDupIncremental(incoming, ledger2, "id", "text",
        numHashes = 64, numBands = 32, shingleSize = 3, jaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(again(11L) === "ledger_dup" && again(12L) === "ledger_dup")
    assert(!again.values.exists(_ == "kept"))
  }

  // ---- applyUrlPolicy ----

  test("applyUrlPolicy: longest prefix wins, deny beats allow on ties, default allow") {
    val rules = Seq(
      ("a.com", "/", true),
      ("a.com", "/private", false),
      ("a.com", "/private/ok", true),
      ("b.com", "/x", false),
      ("b.com", "/x", true) // tie: deny wins
    ).toDF("host", "path_prefix", "allow")
    val pages = Seq(
      (1L, "a.com", "/index"),          // '/' allow
      (2L, "a.com", "/private/secret"), // '/private' deny
      (3L, "a.com", "/private/ok/doc"), // '/private/ok' allow (longest)
      (4L, "b.com", "/x/thing"),        // tie -> deny
      (5L, "c.com", "/anything")        // no rule -> default allow
    ).toDF("id", "host", "path")
    val r = Curation.applyUrlPolicy(pages, "host", "path", rules)
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(r.fieldIndex("allowed")),
          Option(r.getAs[String]("matched_prefix")).getOrElse("")))).toMap
    assert(r(1L) === ((true, "/")))
    assert(r(2L) === ((false, "/private")))
    assert(r(3L) === ((true, "/private/ok")))
    assert(r(4L) === ((false, "/x")))
    assert(r(5L) === ((true, "")))
  }

  test("winnowedOverlapPairs df pruning drops boilerplate fingerprints") {
    // the same boilerplate sentence in every doc; unique tails
    val docs = (1 to 12).map(i =>
      (i.toLong, junk1 + s" unique$i tail$i marker$i close$i end$i"))
      .toDF("id", "text")
    // boilerplate fps hit df=12 > 3 -> pruned -> no pair reaches minShared
    val pruned = Dedup.winnowedOverlapPairs(docs, "id", "text",
      k = 4, windowW = 5, minShared = 1, maxFpDf = 3)
    assert(pruned.isEmpty)
    // with the cap lifted the boilerplate pairs everything
    val full = Dedup.winnowedOverlapPairs(docs, "id", "text",
      k = 4, windowW = 5, minShared = 1, maxFpDf = 1000)
    assert(full.count() === (12L * 11L) / 2L)
  }

  test("prioritySample: matches an independent JVM md5 recomputation of the DLT cut") {
    val rows = (1L to 60L).map(id => (id, (id * 37 % 19) + 1)) // weights 1..19
    val got = Curation.prioritySample(rows.toDF("id", "w"), "id", "w", k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent recomputation: u = first 15 hex chars of md5(id), pri = u / w
    def pri(id: Long, w: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) / math.max(w, 1L)
    }
    val expected = rows.map { case (id, w) => (id, w, pri(id, w)) }
      .sortBy { case (id, _, p) => (p, id) }.take(7).toSet
    assert(got == expected)
  }

  test("prioritySample: zero/negative weights clamp to 1; exactly k rows; repartition-stable") {
    val df = Seq((1L, 0L), (2L, -5L), (3L, 100L), (4L, 1L), (5L, 50L))
      .toDF("id", "w")
    val r = Curation.prioritySample(df, "id", "w", k = 3).collect()
    assert(r.length == 3)
    val weights = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    weights.get(1L).foreach(w => assert(w == 1L))
    weights.get(2L).foreach(w => assert(w == 1L))
    val again = Curation.prioritySample(df.repartition(4), "id", "w", k = 3)
      .collect().map(x => (x.getLong(0), x.getLong(2))).toSet
    assert(again == r.map(x => (x.getLong(0), x.getLong(2))).toSet)
  }
}
