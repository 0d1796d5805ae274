package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LmSpec extends SparkSpec {
  import spark.implicits._

  test("bigramFluency: self-scored add-one bigram LM, hand-computed") {
    val df = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "x")
    ).toDF("id", "text")
    // c2: "a b"->3, "b a"->1, "b c"->1; c1: a->3, b->2; V = |{a,b,c,x}| = 4
    // p("a b") = 4000000 div 7 = 571428; p("b a") = p("b c") = 2000000 div 6 = 333333
    val r = Lm.bigramFluency(df, "id", "text").orderBy("id").collect()
    assert(r(0).toSeq == Seq(1L, 3L, 2L * 571428 + 333333, 333333L, 0L))
    assert(r(1).toSeq == Seq(2L, 2L, 571428L + 333333, 333333L, 0L))
    assert(r(2).toSeq == Seq(3L, 0L, 0L, 0L, 0L))
  }

  test("bigramFluency: separate LM corpus exercises unseen bigram AND unseen context") {
    val lm = Seq((10L, "a b")).toDF("id", "text")   // c2: "a b"->1; c1: a->1; V=2
    val df = Seq((1L, "a z b")).toDF("id", "text")
    // "a z": unseen bigram, seen context: (1e6*1) div (1+2) = 333333
    // "z b": unseen bigram, unseen context: (1e6*1) div (0+2) = 500000
    val r = Lm.bigramFluency(df, "id", "text", lmDf = Some(lm),
      rareBelow = 400000L).orderBy("id").collect()
    assert(r(0).toSeq == Seq(1L, 2L, 833333L, 333333L, 1L))
  }

  test("bpePairStats: corpus-frequency-weighted adjacent symbol pairs") {
    val df = Seq((1L, "aab aab"), (2L, "ab")).toDF("id", "text")
    // wf: aab->2, ab->1; pairs: aab contributes (a a)x1,(a b)x1 per occurrence
    val r = Lm.bpePairStats(df, "text").orderBy("pair").collect()
    assert(r.map(_.toSeq).toSeq == Seq(Seq("a a", 2L), Seq("a b", 3L)))
  }

  test("bpeTrain: greedy left-to-right merge, no overlap re-use") {
    val df = Seq((1L, "aaa aaa")).toDF("id", "text")
    // wf: aaa->2. round 1: pair "a a" freq 4 -> merge (a,a).
    // "aaa" folds to [aa, a] (the third 'a' must NOT merge with the new
    // 'aa' symbol). round 2: pair "aa a" freq 2 -> merge (aa,a).
    val merges = Lm.bpeTrain(df, "text", nMerges = 2)
    assert(merges == Seq(("a", "a", 4L), ("aa", "a", 2L)))
  }

  test("bpeTrain: frequency ties break by pair text ascending") {
    val df = Seq((1L, "ab cd"), (2L, "ab cd")).toDF("id", "text")
    val merges = Lm.bpeTrain(df, "text", nMerges = 1)
    assert(merges == Seq(("a", "b", 2L)))
  }

  test("bpeTrain: minFreq stops the loop early") {
    val df = Seq((1L, "ab")).toDF("id", "text")
    assert(Lm.bpeTrain(df, "text", nMerges = 5, minFreq = 2L).isEmpty)
  }

  test("bpeSegmentStats: chained merges and greedy fold semantics") {
    val df = Seq((1L, "aaa aaaa"), (2L, ""), (3L, "xy")).toDF("id", "text")
    val merges = Seq(("a", "a"), ("aa", "a"))
    // "aaa": [a,a,a] -> [aa,a] -> [aaa]           (1 subword, 0 singles)
    // "aaaa": [a,a,a,a] -> [aa,aa] -> [aa,aa]     (2 subwords, 0 singles)
    // "xy": merges never fire                     (2 singles)
    val r = Lm.bpeSegmentStats(df, "id", "text", merges).orderBy("id").collect()
    assert(r(0).toSeq == Seq(1L, 2L, 3L, 0L))
    assert(r(1).toSeq == Seq(2L, 0L, 0L, 0L))
    assert(r(2).toSeq == Seq(3L, 1L, 2L, 2L))
  }

  test("linearScore: weighted dot product, featureless docs score zero") {
    val ids = Seq(1L, 2L, 3L).toDF("id")
    val feats = Seq((1L, 0L, 2L), (1L, 1L, -1L), (2L, 9L, 5L))
      .toDF("id", "bucket", "value")
    val weights = Seq((0L, 3L), (1L, 4L)).toDF("bucket", "weight")
    val r = Lm.linearScore(ids, feats, weights, "id").orderBy("id").collect()
    assert(r(0).toSeq == Seq(1L, 2L, true))   // 2*3 + (-1)*4
    assert(r(1).toSeq == Seq(2L, 0L, false))  // bucket 9 has no weight
    assert(r(2).toSeq == Seq(3L, 0L, false))  // no features at all
  }

  test("vocabCoverage: exact mass shares, oversized k clamps to full coverage") {
    val df = Seq("a a a b", "b c").toDF("text")
    // counts: a=3, b=2, c=1; T=6, 3 types
    val r = Lm.vocabCoverage(df, "text", Seq(1, 2, 10))
      .orderBy("vocab_size").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (1L, 3L, 6L, 0.5),
      (2L, 5L, 6L, 5.0 / 6.0),
      (10L, 6L, 6L, 1.0))) // only 3 types exist: full coverage
    // tie at the boundary: b and c both once -> token asc keeps 'b' first
    val tie = Lm.vocabCoverage(Seq("a a b c").toDF("text"), "text", Seq(2))
      .collect().head
    assert(tie.getLong(1) == 3L) // a(2) + b(1)
  }

  private def md5Coin(parts: Seq[String], hexLen: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(parts.mkString("").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, hexLen), 16)
  }

  test("wordDropout: positional md5 coin, JVM-replayed; empty text safe") {
    val df = Seq((42L, "a b  c d e f"), (7L, "")).toDF("id", "text")
    val r = Lm.wordDropout(df, "id", "text", dropOneIn = 3, seed = "wd")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getString(4)))
    val toks = Seq("a", "b", "c", "d", "e", "f")
    val kept = toks.zipWithIndex.collect {
      case (t, i) if md5Coin(Seq("42", i.toString, "wd"), 8) % 3 != 0 => t
    }
    assert(r(1) == ((42L, 6L, kept.length.toLong, kept.mkString(" "))))
    assert(r(0) == ((7L, 0L, 0L, "")))
    assert(kept.length > 0 && kept.length < 6) // coin actually both-sided
  }

  test("negativeSamples: dense-id draws, collision probes to +1 mod n") {
    val df = (0L until 10L).toDF("id")
    val r = Lm.negativeSamples(df, "id", k = 3, seed = "ns")
      .orderBy("id", "neg_rank").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 30)
    r.foreach { case (id, j, neg) =>
      val raw = md5Coin(Seq(id.toString, j.toString, "ns"), 12) % 10
      val want = if (raw == id) (raw + 1) % 10 else raw
      assert(neg == want && neg != id && neg >= 0 && neg < 10)
    }
  }

  // ---- production BPE kernel: min-rank loop vs the sequential reference ----

  /** Reference implementation: apply merges ONE AT A TIME in training
    * order, each as the greedy left-to-right fold (the old encoder's exact
    * semantics, kept here as the spec's oracle).
    */
  private def seqSegment(word: String,
                         merges: Seq[(String, String)]): Seq[String] = {
    val chars: Seq[String] = word.map(_.toString)
    merges.foldLeft(chars) { case (syms, (a, b)) =>
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    }
  }

  test("BpeKernel.segment: bit-identical to the sequential fold on chained merge lists") {
    import graft.functions.BpeKernel
    val merges = Seq(("a", "a"), ("aa", "a"), ("aa", "aa"), ("b", "a"),
      ("ba", "n"), ("aaa", "ban"), ("n", "a"), ("aaaa", "b"))
    val rank = BpeKernel.rankTable(merges)
    val words = Seq("", "a", "aa", "aaa", "aaaa", "aaaaa", "aaaaaa",
      "aaaaaaa", "ban", "bana", "banana", "aaaban", "banaaa", "abanab",
      "nananana", "baaan", "bbaann", "aabanaaabanaa", "xyz", "axbxn")
    words.foreach { w =>
      assert(BpeKernel.segment(w, rank).toSeq == seqSegment(w, merges),
        s"word '$w'")
    }
  }

  test("BpeKernel.segment: trained merges on pseudo-random words equal the fold") {
    import graft.functions.BpeKernel
    // deterministic corpus: md5-derived 'random' words over a tiny alphabet
    // (collision-heavy on purpose so merges chain deep)
    val words = (0 until 160).map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bpe$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(3 + (i % 10)).map(c => "abcd" (c.toInt % 4)).mkString
    }
    val df = words.map(w => (1L, w)).toDF("id", "text")
    val trained = Lm.bpeTrain(df, "text", nMerges = 60).map(m => (m._1, m._2))
    assert(trained.size == 60)
    val rank = BpeKernel.rankTable(trained)
    (words ++ Seq("aaaa", "dcba", "abcdabcd")).foreach { w =>
      assert(BpeKernel.segment(w, rank).toSeq == seqSegment(w, trained),
        s"word '$w' merges $trained")
    }
  }

  test("BpeKernel: training-order contract is enforced loudly") {
    import graft.functions.BpeKernel
    // 'ab' consumed before any merge produces it
    val e = intercept[IllegalArgumentException] {
      BpeKernel.requireTrainingOrdered(Seq(("ab", "c"), ("a", "b")))
    }
    assert(e.getMessage.contains("training-ordered"))
    // valid: producer before consumer
    BpeKernel.requireTrainingOrdered(Seq(("a", "b"), ("ab", "c")))
  }

  test("bpeTrain: driver-local incremental path equals the distributed rounds") {
    val texts = Seq("the cat sat on the mat", "the bat and the rat",
      "banana bandana ananas", "aa aaa aaaa aaaaa",
      "mississippi missive permission", "the the the then them theme")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val local = Lm.bpeTrain(df, "text", nMerges = 25)
    val dist = Lm.bpeTrain(df, "text", nMerges = 25, localizeMaxVocab = 0L)
    assert(local == dist)
    // minFreq stop behaves identically on both paths
    val localMf = Lm.bpeTrain(df, "text", nMerges = 25, minFreq = 4L)
    val distMf = Lm.bpeTrain(df, "text", nMerges = 25, minFreq = 4L,
      localizeMaxVocab = 0L)
    assert(localMf == distMf && localMf.size < 25)
  }

  test("bpeSegmentStats: flat wall against merge-count (rank table, not nested folds)") {
    // 3 real merges + a 200-deep never-firing padding chain: the old
    // per-merge nested-fold encoder would build a 203-deep expression;
    // the kernel holds them all in one rank table
    val pad = (1 to 200).scanLeft(("Z", "Z")) { case ((a, b), _) =>
      (a + b, "Z") }
    val merges = Seq(("t", "h"), ("e", "r"), ("o", "n")) ++ pad
    val df = Seq((1L, "the other one there"), (2L, "zzz")).toDF("id", "text")
    val r = Lm.bpeSegmentStats(df, "id", "text", merges)
      .orderBy("id").collect()
    // same result as the 3-merge list: padding never fires on [a-z] words
    val r3 = Lm.bpeSegmentStats(df, "id", "text",
      Seq(("t", "h"), ("e", "r"), ("o", "n"))).orderBy("id").collect()
    assert(r.map(_.toSeq).toSeq == r3.map(_.toSeq).toSeq)
  }
}
