package graft.ops

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple apple banana common"),
    (2L, "banana banana cherry common"),
    (3L, "cherry common common common")).toDF("id", "text")

  test("tfidfTopK: hand-computed exact-integer scores (N=3, scale=1e6)") {
    // df: apple=1, banana=2, cherry=2, common=3
    // idf_int: apple (3e6/1)=3000000, banana/cherry (3e6/2)=1500000,
    //          common (3e6/3)=1000000
    val r = Relevance.tfidfTopK(docs, "id", "text", k = 10)
      .orderBy("id", "rank")
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (1L, "apple", 3L, 1L, 9000000L, 1L),
      (1L, "banana", 1L, 2L, 1500000L, 2L),
      (1L, "common", 1L, 3L, 1000000L, 3L),
      (2L, "banana", 2L, 2L, 3000000L, 1L),
      (2L, "cherry", 1L, 2L, 1500000L, 2L),
      (2L, "common", 1L, 3L, 1000000L, 3L),
      (3L, "common", 3L, 3L, 3000000L, 1L),
      (3L, "cherry", 1L, 2L, 1500000L, 2L)))
  }

  test("tfidfTopK: k cuts after the deterministic (score desc, term asc) tie-break") {
    // two terms with identical tf and df -> identical score; term asc decides
    val df = Seq((1L, "zzz aaa")).toDF("id", "text")
    val r = Relevance.tfidfTopK(df, "id", "text", k = 1).collect()
    assert(r.length == 1 && r(0).getString(1) == "aaa")
  }

  test("tfidfTopK: partitioning-independent (exact integers, no float fold)") {
    val a = Relevance.tfidfTopK(docs, "id", "text", k = 2)
      .orderBy("id", "rank").collect().toSeq
    val b = Relevance.tfidfTopK(docs.repartition(7), "id", "text", k = 2)
      .orderBy("id", "rank").collect().toSeq
    assert(a == b)
  }

  test("tfidfTopK: custom scale threads through the score") {
    val r = Relevance.tfidfTopK(docs, "id", "text", k = 1, scale = 10L)
      .where($"id" === 1L).collect()
    assert(r(0).getLong(4) == 3L * ((10L * 3) / 1)) // apple: tf=3, df=1
  }

  test("tfidfTopK: zero-token documents emit no rows, others unaffected") {
    val df = Seq((1L, "only words"), (2L, ""), (3L, "   ...   ")).toDF("id", "text")
    val ids = Relevance.tfidfTopK(df, "id", "text", k = 5)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("cooccurrence: hand-computed lift on a 4-doc corpus") {
    // x and y always together (lift > 1e6), x and z never (pair absent);
    // repeated tokens in one doc count once (document-level)
    val df = Seq(
      (1L, "x y y"), (2L, "x y"), (3L, "z w"), (4L, "z w x y")).toDF("id", "text")
    val r = Relevance.cooccurrence(df, "id", "text", vocabSize = 10)
      .orderBy("term_a", "term_b")
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    // marginals: x=3 docs, y=3, z=2, w=2; N=4
    assert(r.toSeq == Seq(
      ("w", "x", 2L, 3L, 1L, 1000000L * 4 * 1 / (2 * 3)),
      ("w", "y", 2L, 3L, 1L, 1000000L * 4 * 1 / (2 * 3)),
      ("w", "z", 2L, 2L, 2L, 1000000L * 4 * 2 / (2 * 2)),
      ("x", "y", 3L, 3L, 3L, 1000000L * 4 * 3 / (3 * 3)),
      ("x", "z", 3L, 2L, 1L, 1000000L * 4 * 1 / (3 * 2)),
      ("y", "z", 3L, 2L, 1L, 1000000L * 4 * 1 / (3 * 2))))
    // perfect co-travelers score above independence (scale), odd pairs below
    assert(r.find(p => p._1 == "w" && p._2 == "z").get._6 == 2000000L)
    assert(r.find(p => p._1 == "x" && p._2 == "y").get._6 > 1000000L)
  }

  test("cooccurrence: vocabulary bound excludes rare terms; minPairCount filters") {
    val df = Seq((1L, "a b rare1"), (2L, "a b rare2"), (3L, "a b")).toDF("id", "text")
    val r = Relevance.cooccurrence(df, "id", "text", vocabSize = 2, minPairCount = 3L)
      .collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "a" && r(0).getString(1) == "b" && r(0).getLong(4) == 3L)
  }

  test("nearDupDedup: end-to-end clusters, sizes, and canonical keep flags") {
    val base = "one two three four five six seven eight nine ten"
    val other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, base), (2L, "x " + base), (3L, "y " + base), // 3-cluster, min id 1
      (5L, other), (6L, "z " + other),                  // 2-cluster, min id 5
      (9L, "totally different words entirely here now okay then")) // singleton
      .toDF("id", "text")
    val r = Dedup.nearDupDedup(df, "id", "text",
        numHashes = 64, numBands = 32, shingleSize = 3, jaccard = 0.8)
      .orderBy("id")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.toSeq == Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (5L, 5L, 2L, true), (6L, 5L, 2L, false),
      (9L, 9L, 1L, true)))
    // exactly one kept row per cluster; kept rows ARE the deduped corpus
    assert(r.count(_._4) == 3)
  }

  test("postingsBlocks: delta-encoded blocks reconstruct exact (doc, tf) postings") {
    import org.apache.spark.sql.Row
    val df = Seq(
      (0L, "apple banana apple"),   // block 0 (span 4): apple tf=2
      (1L, "apple cherry"),
      (3L, "apple"),
      (5L, "apple banana banana"),  // block 1
      (9L, "apple")                 // block 2
    ).toDF("id", "text")
    val out = Relevance.postingsBlocks(df, "id", "text", blockSpan = 4L)
      .orderBy("term", "block").collect()
    def decode(r: Row): (String, Long, Long, Long, Seq[(Long, Long)]) = {
      val base = r.getLong(1) * 4L
      var doc = base
      val entries = r.getSeq[Row](4).map { p =>
        doc += p.getLong(0); (doc, p.getLong(1))
      }
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), entries)
    }
    val decoded = out.map(decode).toSeq
    // hot term spans three blocks, per-block rows bounded by the span
    assert(decoded == Seq(
      ("apple", 0L, 3L, 4L, Seq((0L, 2L), (1L, 1L), (3L, 1L))),
      ("apple", 1L, 1L, 1L, Seq((5L, 1L))),
      ("apple", 2L, 1L, 1L, Seq((9L, 1L))),
      ("banana", 0L, 1L, 1L, Seq((0L, 1L))),
      ("banana", 1L, 1L, 2L, Seq((5L, 2L))),
      ("cherry", 0L, 1L, 1L, Seq((1L, 1L)))))
  }

  test("bm25TopK: hand-computed fixed-point saturation + length normalization") {
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "text")
    // N=2, T=5; df: a->2, b->1, c->1; dl: d1=3, d2=2
    // idf_fp: a = (1e6*1) div 5 = 200000; b = c = (1e6*3) div 3 = 1000000
    // num = tf*2200*1000*5 = tf*11e6
    // den = tf*5e6 + 1200*250*5 + 900000*dl*2
    val r = Relevance.bm25TopK(df, "id", "text", k = 5)
      .orderBy(col("id"), col("rank")).collect()
    assert(r.map(_.toSeq).toSeq == Seq(
      // d1: b = (1e6*11e6) div (5e6+1.5e6+5.4e6) = 924369; a(tf=2) = 260355
      Seq(1L, "b", 1L, 3L, 1L, 924369L, 1L),
      Seq(1L, "a", 2L, 3L, 2L, 260355L, 2L),
      // d2: c = (1e6*11e6) div (5e6+1.5e6+3.6e6) = 1089108; a = 217821
      Seq(2L, "c", 1L, 2L, 1L, 1089108L, 1L),
      Seq(2L, "a", 1L, 2L, 2L, 217821L, 2L)))
  }

  test("bm25TopK: rarer term outranks frequent term; k cuts deterministically") {
    val df = Seq(
      (1L, "common rare common other"),
      (2L, "common other common"),
      (3L, "common thing")
    ).toDF("id", "text")
    val r = Relevance.bm25TopK(df, "id", "text", k = 1)
      .orderBy(col("id")).collect()
    // every doc emits exactly its single best term
    assert(r.length == 3)
    assert(r(0).getString(1) == "rare")   // df=1 beats common (df=3) at tf 2
    assert(r.forall(_.getLong(6) == 1L))
  }

  test("bm25QueryScores: sum of the exact per-term scores, non-matching docs absent") {
    val df = Seq((1L, "a a b"), (2L, "a c"), (3L, "zzz only")).toDF("id", "text")
    val perTerm = Relevance.bm25TopK(df, "id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(5)).toMap
    val r = Relevance.bm25QueryScores(df, "id", "text", Seq("a", "b"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == ((perTerm((1L, "a")) + perTerm((1L, "b")), 2L)))
    assert(r(2L) == ((perTerm((2L, "a")), 1L)))
    assert(!r.contains(3L), "doc without any query term must emit no row")
  }

  test("rrfFuse: exact integer contributions, absent-from-list semantics, rank tie-break") {
    val listA = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L)).toDF("q", "id", "rank")
    val listB = Seq((0L, 11L, 1L), (0L, 13L, 2L)).toDF("q", "id", "rank")
    val r = Relevance.rrfFuse(Seq(listA, listB), "q", "id", "rank")
      .collect().map(x => x.getLong(1) -> (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    val c = (rk: Long) => 1000000000L / (60L + rk)
    assert(r(11L) == ((2L, c(2) + c(1), 1L)))  // both lists -> top
    assert(r(10L) == ((1L, c(1), 2L)))
    assert(r(13L) == ((1L, c(2), 3L)))
    assert(r(12L) == ((1L, c(3), 4L)))
  }

  test("rrfFuse: fuses per query independently") {
    val listA = Seq((0L, 10L, 1L), (7L, 10L, 2L)).toDF("q", "id", "rank")
    val r = Relevance.rrfFuse(Seq(listA), "q", "id", "rank")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(4)).toMap
    assert(r((0L, 10L)) == 1L && r((7L, 10L)) == 1L)
  }

  test("rankingMetrics: hand-computed DCG/IDCG/nDCG/RR; no-relevant query yields NULLs") {
    val run = Seq(
      ("q1", 1L, 0L), ("q1", 2L, 2L), ("q1", 3L, 1L),
      ("q2", 1L, 0L), ("q2", 2L, 0L),
      ("q3", 1L, 1L), ("q3", 4L, 3L)). // rank 4 is beyond k=3
      toDF("q", "rank", "rel")
    val r = Relevance.rankingMetrics(run, "q", "rank", "rel", k = 3)
      .orderBy("query").collect()
    // Spark 4 routes ln through StrictMath (1 ulp off libm at e.g. ln(3))
    def ln(x: Double) = StrictMath.log(x)
    // columns: query, rbp, rr, p_at_k, dcg, idcg, ndcg
    // q1: byrank rel (0,2,1): rbp = .5*(0/1 + 2/2 + 1/4); dcg over ln
    assert(r(0).getString(0) == "q1")
    assert(r(0).getDouble(1) == 0.5 * (0.0 / 1.0 + 2.0 / 2.0 + 1.0 / 4.0))
    assert(r(0).getDouble(2) == 0.5) // first relevant at rank 2
    assert(r(0).getDouble(3) == 2.0 / 3.0)
    val dcg1 = ((0.0 + 0.0 / ln(2.0)) + 2.0 / ln(3.0)) + 1.0 / ln(4.0)
    val idcg1 = ((0.0 + 2.0 / ln(2.0)) + 1.0 / ln(3.0)) + 0.0 / ln(4.0)
    assert(r(0).getDouble(4) == dcg1 && r(0).getDouble(5) == idcg1)
    assert(r(0).getDouble(6) == dcg1 / idcg1)
    // q2: all rel 0 -> rbp 0, rr NULL, p@k 0, idcg 0 -> ndcg NULL
    assert(r(1).getDouble(1) == 0.0 && r(1).isNullAt(2))
    assert(r(1).getDouble(3) == 0.0 && r(1).isNullAt(6))
    // q3: rank-4 row filtered by k; single rank-1 rel 1
    assert(r(2).getDouble(1) == 0.5 && r(2).getDouble(2) == 1.0)
    assert(r(2).getDouble(3) == 1.0 / 3.0 && r(2).getDouble(6) == 1.0)
  }

  test("itemSimilarity: binary cosine, similarity-tie ranks by other asc") {
    val df = Seq(("b1", "x"), ("b1", "y"), ("b1", "z"),
      ("b2", "x"), ("b2", "y"), ("b3", "x"), ("b3", "w"),
      ("b1", "x")) // duplicate incidence collapses
      .toDF("basket", "item")
    val r = Relevance.itemSimilarity(df, "basket", "item", topK = 2)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getDouble(5), x.getLong(6)))
    val m = r.map(t => (t._1, t._5) -> (t._2, t._3, t._4)).toMap
    assert(m(("x", 1L)) == (("y", 2L, 2.0 / math.sqrt(6.0))))
    // z and w tie at 1/sqrt(3): w wins rank 2 by id asc, z is cut by topK
    assert(m(("x", 2L)) == (("w", 1L, 1.0 / math.sqrt(3.0))))
    assert(m(("y", 1L)) == (("x", 2L, 2.0 / math.sqrt(6.0))))
    assert(m(("y", 2L)) == (("z", 1L, 1.0 / math.sqrt(2.0))))
    assert(m(("z", 1L)) == (("y", 1L, 1.0 / math.sqrt(2.0))))
    assert(m(("w", 1L)) == (("x", 1L, 1.0 / math.sqrt(3.0))))
    assert(r.length == 7) // x:2, y:2, z:2, w:1
  }
}
