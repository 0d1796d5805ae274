package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii redacts email/ip/card and counts each kind") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org and 192.168.0.1 plus 4111222233334444 done"),
      (2L, "nothing sensitive here 1.2 or 12345"),
      (3L, "two mails a@b.io c@d.co and ip 10.0.0.255")
    ).toDF("id", "text")
    val r = Curation.scrubPii(df, "text").orderBy("id")
      .select("n_email", "n_ip", "n_card", "text_scrubbed")
      .collect()
    assert(r(0).getInt(0) == 1 && r(0).getInt(1) == 1 && r(0).getInt(2) == 1)
    assert(r(0).getString(3) == "mail <EMAIL> and <IP> plus <CARD> done")
    assert(r(1).getInt(0) == 0 && r(1).getInt(1) == 0 && r(1).getInt(2) == 0)
    assert(r(1).getString(3) == "nothing sensitive here 1.2 or 12345")
    assert(r(2).getInt(0) == 2 && r(2).getInt(1) == 1)
    assert(r(2).getString(3) == "two mails <EMAIL> <EMAIL> and ip <IP>")
  }

  test("urlFeatures: host/domain/path/depth edges") {
    val df = Seq(
      (1L, "https://www.news.example.com/a/b/c?x=1"),
      (2L, "http://example.com"),            // no path, no query
      (3L, "https://localhost/x/"),          // single-label host, trailing slash
      (4L, "ftp://a.b.co/p#frag"),           // fragment excluded from path
      (5L, "not a url at all")               // malformed: everything empty
    ).toDF("id", "url")
    val r = Curation.urlFeatures(df, "url").orderBy("id")
      .select("url_scheme", "url_host", "url_domain", "url_path", "url_depth", "url_has_query")
      .collect()
    assert(r(0).toSeq == Seq("https", "www.news.example.com", "example.com", "/a/b/c", 3L, true))
    assert(r(1).toSeq == Seq("http", "example.com", "example.com", "", 0L, false))
    assert(r(2).toSeq == Seq("https", "localhost", "localhost", "/x/", 1L, false))
    assert(r(3).toSeq == Seq("ftp", "a.b.co", "b.co", "/p", 1L, false))
    assert(r(4).toSeq == Seq("", "", "", "", 0L, false))
  }

  test("repetitionStats: duplicate words/lines and exact means") {
    val df = Seq(
      (1L, "aa bb aa\naa bb aa\ncc"),
      (2L, ""),
      (3L, "x yy zzz")
    ).toDF("id", "text")
    val r = Curation.repetitionStats(df, "text").orderBy("id")
      .select("n_words", "n_distinct_words", "dup_word_frac", "mean_word_len",
        "n_lines", "dup_line_frac")
      .collect()
    // doc 1: words = [aa,bb,aa,aa,bb,aa,cc] -> 7 words, 3 distinct
    assert(r(0).getLong(0) == 7L && r(0).getLong(1) == 3L)
    assert(r(0).getDouble(2) == 1.0 - 3.0 / 7.0)
    assert(r(0).getDouble(3) == 2.0) // every word is 2 chars -> 14/7
    assert(r(0).getLong(4) == 3L && r(0).getDouble(5) == 1.0 - 2.0 / 3.0)
    // doc 2: empty -> zero guards
    assert(r(1).getLong(0) == 0L && r(1).getDouble(2) == 0.0 && r(1).getLong(4) == 0L)
    // doc 3: all distinct, mean word len (1+2+3)/3 = 2.0
    assert(r(2).getLong(0) == 3L && r(2).getLong(1) == 3L)
    assert(r(2).getDouble(2) == 0.0 && r(2).getDouble(3) == 2.0)
  }

  test("markdownStats: headings/fences/lists/links, unterminated flag") {
    val md1 = "# Title\nsome prose\n## Sub\n- a\n- b\n* c\n" +
      "```\ncode\n```\n[x](http://e/) and [y](u)"
    val md2 = "### Deep\n```scala\nunterminated"
    val df = Seq((1L, md1), (2L, md2), (3L, "plain # not a heading"))
      .toDF("id", "text")
    val r = Curation.markdownStats(df, "text").orderBy("id").collect()
      .map(x => (x.getLong(2), x.getLong(3), x.getLong(4),
        x.getBoolean(5), x.getLong(6), x.getLong(7)))
    assert(r(0) == ((2L, 2L, 1L, false, 3L, 2L)))
    assert(r(1) == ((1L, 3L, 0L, true, 0L, 0L)))
    assert(r(2) == ((0L, 0L, 0L, false, 0L, 0L)))
  }

  test("thresholdSweep: exact survivor counts and mass per cutoff") {
    val df = Seq(1L, 3L, 5L, 7L, 9L).toDF("score")
    val r = Curation.thresholdSweep(df, "score", Seq(0L, 4L, 10L))
      .orderBy("threshold").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))
    assert(r.toSeq == Seq(
      (0L, 5L, 5L, 25L, 1.0),
      (4L, 5L, 3L, 21L, 3.0 / 5.0),
      (10L, 5L, 0L, 0L, 0.0)))
  }

  test("luhnFlag: known-valid cards pass, off-by-one fails, length gate") {
    val df = Seq(
      (1L, "4111111111111111"),  // classic valid test PAN
      (2L, "4111111111111112"),  // checksum off by one
      (3L, "79927398713"),       // valid Luhn but 11 digits -> length gate
      (4L, "5555555555554444"),  // valid (sum 60)
      (5L, "1234567890123456"))  // invalid
      .toDF("id", "num")
    val r = Curation.luhnFlag(df, "num").orderBy("id").collect()
      .map(_.getBoolean(2))
    assert(r.toSeq == Seq(true, false, false, true, false))
    // JVM replay of the fold on a fresh number
    def luhn(s: String): Boolean = {
      val d = s.reverse.zipWithIndex.map { case (c, i) =>
        val v = c - '0'
        if (i % 2 == 1) { val t = v * 2; if (t > 9) t - 9 else t } else v
      }.sum
      s.length >= 13 && s.length <= 19 && d % 10 == 0
    }
    assert(luhn("4111111111111111") && !luhn("4111111111111112"))
  }

  test("pathRollup: cumulative prefixes, empty segments drop, counts exact") {
    val df = Seq("/a/b/c", "/a/b", "/a//b/", "/x", "/", "").toDF("path")
    val r = Curation.pathRollup(df, "path").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    // '/a//b/' normalizes to /a/b; '/' and '' contribute nothing
    assert(r == Set(
      ("/a", 1L, 3L), ("/a/b", 2L, 3L), ("/a/b/c", 3L, 1L),
      ("/x", 1L, 1L)))
  }

  test("resolveCanonicalChains: chains resolve, cycles flag, dup edges min") {
    val edges = Seq((1L, 2L), (1L, 9L), // dup outgoing: min target 2 wins
      (2L, 3L), (3L, 4L),               // chain to terminal 4
      (7L, 3L),                         // side entry joins the chain
      (5L, 6L), (6L, 5L))               // 2-cycle: never resolves
      .toDF("f", "t")
    val r = Curation.resolveCanonicalChains(edges, "f", "t")
      .orderBy("url").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
    assert(r.toSeq == Seq(
      (1L, 4L, true), (2L, 4L, true), (3L, 4L, true),
      (5L, 5L, false), (6L, 6L, false), // f^256 on a 2-cycle = identity
      (7L, 4L, true)))
  }

  test("balanceClasses: every class trimmed to the minority size, md5 order") {
    val df = (Seq.tabulate(5)(i => (i.toLong, "big")) ++
      Seq((10L, "small"), (11L, "small")) ++
      Seq.tabulate(3)(i => (20L + i, "mid"))).toDF("id", "cls")
    val r = Curation.balanceClasses(df, "id", "cls", seed = "bal")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getLong(3)))
    // exactly minN = 2 survivors per class; class_n is the PRE-balance size
    val byClass = r.groupBy(_._2)
    assert(byClass.keySet == Set("big", "small", "mid"))
    assert(byClass.values.forall(_.length == 2))
    assert(byClass("big").head._3 == 5L && byClass("mid").head._3 == 3L)
    assert(r.forall(row => row._4 >= 1L && row._4 <= 2L))
    // survivors are the 2 smallest (md5 hex, id) draws — JVM replay
    def hex(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(("bal\u0001" + id).getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expectBig = (0L until 5L).sortBy(i => (hex(i), i)).take(2).toSet
    assert(byClass("big").map(_._1).toSet == expectBig)
    // deterministic across runs
    val r2 = Curation.balanceClasses(df, "id", "cls", "bal")
      .collect().map(_.getLong(0)).toSet
    assert(r2 == r.map(_._1).toSet)
  }

  test("sentenceStats: lookbehind split keeps terminators, empty-safe") {
    val df = Seq(
      (1L, "Hi there. Ok!  Really?"),    // 3 sentences, double space ok
      (2L, "no terminator at all"),      // whole string = 1 sentence
      (3L, ""),                          // zero sentences
      (4L, "One. Two."))                 // trailing terminator, no tail
      .toDF("id", "text")
    val r = Curation.sentenceStats(df, "text").orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4),
        x.getDouble(5)))
    assert(r(0) == ((1L, 3L, 19L, 9L, 19.0 / 3.0))) // "Hi there."=9 "Ok!"=3 "Really?"=7
    assert(r(1) == ((2L, 1L, 20L, 20L, 20.0)))
    assert(r(2) == ((3L, 0L, 0L, 0L, 0.0)))
    assert(r(3) == ((4L, 2L, 8L, 4L, 4.0))) // "One."=4, "Two."=4
  }

  test("stratifiedSample: deterministic, rate-proportional, payload-independent") {
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val kept = Curation.stratifiedSample(df, "id", "lang", Map("en" -> 0.5), defaultRate = 0.1)
    val again = Curation.stratifiedSample(df, "id", "lang", Map("en" -> 0.5), defaultRate = 0.1)
    val k1 = kept.select("id").as[Long].collect().sorted.toSeq
    assert(k1 == again.select("id").as[Long].collect().sorted.toSeq, "must be deterministic")
    val byLang = kept.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 per stratum; md5 rank is uniform so expect ~1000 en, ~200 de
    assert(math.abs(byLang("en") - 1000L) < 100, s"en kept ${byLang("en")}")
    assert(math.abs(byLang("de") - 200L) < 60, s"de kept ${byLang("de")}")
  }

  test("packSequences: per-shard prefix sums and bin boundaries") {
    val df = Seq(
      (0L, 0L, 3000L), (1L, 0L, 3000L), (2L, 0L, 3000L), // shard 0: 0,3000,6000 before
      (3L, 1L, 5000L), (4L, 1L, 100L)                    // shard 1: 0,5000 before
    ).toDF("id", "shard", "toks")
    val r = Curation.packSequences(df, "shard", "id", "toks", 4096L)
      .orderBy("id").select("pack_tokens_before", "pack_bin").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 3000L, 6000L, 0L, 5000L))
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 0L, 1L, 0L, 1L))
  }

  test("passages: overlapping windows, short tail, empty doc dropped") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "")).toDF("id", "text")
    val r = Curation.passages(df, "id", "text", windowWords = 4, strideWords = 3)
      .orderBy("id", "passage_no").collect()
    // starts 0,3,6,9 over 10 words -> 4 passages, last is the 1-word tail
    assert(r.map(_.getLong(0)).forall(_ == 1L), "empty doc yields no passages")
    assert(r.length == 4)
    assert(r(0).getString(2) == "w1 w2 w3 w4")
    assert(r(1).getString(2) == "w4 w5 w6 w7")
    assert(r(2).getString(2) == "w7 w8 w9 w10")
    assert(r(3).getString(2) == "w10")
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("decontaminate drops docs containing a benchmark item, keeps the rest") {
    val bench = Seq((100L, "the secret benchmark question about turtles and rockets ok")).toDF("bid", "text")
    val corpus = Seq(
      (1L, "a web page that quotes the secret benchmark question about turtles and rockets ok verbatim"),
      (2L, "a page about unrelated turtles in the sea"),
      (3L, "rockets are fast and loud machines people like")
    ).toDF("id", "text")
    val pairs = Dedup.contaminationPairs(corpus, bench, "id", "text", "bid", "text",
      n = 3, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 100L)
    assert(pairs(0).getDouble(2) >= 0.5)
    val kept = Dedup.decontaminate(corpus, bench, "id", "text", "bid", "text",
      n = 3, threshold = 0.5).select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("dedupLines strips corpus-common lines, keeps blanks and order") {
    val nav = "NAV: home | about"
    val df = Seq(
      (1L, s"$nav\nunique first body\n\ntail one"),
      (2L, s"$nav\nunique second body\n\ntail two"),
      (3L, s"$nav\nunique third body\n\nshared tail"),
      (4L, s"$nav\nunique fourth body\n\nshared tail"),
      (5L, nav) // all lines boilerplate -> empty result
    ).toDF("id", "text")
    val r = Dedup.dedupLines(df, "id", "text").orderBy("id")
      .select("text_dedup", "n_lines", "n_lines_kept").collect()
    // nav (5 occurrences) and "shared tail" (2) are dropped everywhere;
    // blank separator lines never participate and survive in place
    assert(r(0).getString(0) == "unique first body\n\ntail one")
    assert(r(0).getLong(1) == 4L && r(0).getLong(2) == 3L)
    assert(r(1).getString(0) == "unique second body\n\ntail two")
    assert(r(2).getString(0) == "unique third body\n")
    assert(r(3).getString(0) == "unique fourth body\n")
    assert(r(4).getString(0) == "" && r(4).getLong(1) == 1L && r(4).getLong(2) == 0L)
  }

  test("dedupLines honors maxDf and minLineLen") {
    val df = Seq(
      (1L, "dup\nxx\nkeep a"),
      (2L, "dup\nxx\nkeep b"),
      (3L, "dup\nyy\nkeep c")
    ).toDF("id", "text")
    // maxDf=2: "dup" (3 occurrences) dropped, "xx" (2) kept;
    // minLineLen=3: 2-char lines never participate regardless of count
    val r = Dedup.dedupLines(df, "id", "text", maxDf = 2L, minLineLen = 3)
      .orderBy("id").select("text_dedup").as[String].collect()
    assert(r.toSeq == Seq("xx\nkeep a", "xx\nkeep b", "yy\nkeep c"))
  }

  test("spanDedup cuts the non-owner occurrence of a shared span, exactly") {
    // a 6-token span shared by docs 1 and 2; all surrounding tokens unique,
    // so only the three fully-inside aligned 4-shingles are duplicated and
    // their coverage is exactly the span
    val span = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"a1 a2 a3 $span a4 a5 a6"),
      (2L, s"b1 b2 $span b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8") // nothing shared -> untouched
    ).toDF("id", "text")
    val r = Dedup.spanDedup(df, "id", "text", k = 4).orderBy("id")
      .select("text_span_dedup", "n_tokens", "n_tokens_kept").collect()
    // owner = min (id, pos): doc 1 keeps the span
    assert(r(0).getString(0) == s"a1 a2 a3 $span a4 a5 a6")
    assert(r(0).getLong(1) == 12L && r(0).getLong(2) == 12L)
    assert(r(1).getString(0) == "b1 b2 b3 b4")
    assert(r(1).getLong(1) == 10L && r(1).getLong(2) == 4L)
    assert(r(2).getString(0) == "c1 c2 c3 c4 c5 c6 c7 c8")
  }

  test("spanDedup handles internal repetition, short docs, whitespace") {
    val s = "p q r s" // one 4-shingle
    val df = Seq(
      (1L, s"$s mid1 mid2 $s"),     // same shingle twice IN one doc
      (2L, "u1 u2 u3"),             // < k tokens -> no shingles, untouched
      (3L, "  w1   w2\tw3 \n w4 ")  // whitespace-normalized reassembly
    ).toDF("id", "text")
    val r = Dedup.spanDedup(df, "id", "text", k = 4).orderBy("id")
      .select("text_span_dedup", "n_tokens_kept").collect()
    assert(r(0).getString(0) == s"$s mid1 mid2") // second occurrence cut
    assert(r(0).getLong(1) == 6L)
    assert(r(1).getString(0) == "u1 u2 u3")
    assert(r(2).getString(0) == "w1 w2 w3 w4")
  }

  test("rendezvousShard: deterministic, and adding a shard only moves winners") {
    val df = (0L until 600L).toDF("id")
    val s5 = Curation.rendezvousShard(df, "id", (0 until 5).map(i => s"s$i"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s6 = Curation.rendezvousShard(df, "id", (0 until 6).map(i => s"s$i"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // determinism
    val again = Curation.rendezvousShard(df, "id", (0 until 5).map(i => s"s$i"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == s5)
    // the HRW guarantee: a row changes shard ONLY to the new shard
    val moved = (0L until 600L).filter(i => s5(i) != s6(i))
    assert(moved.forall(i => s6(i) == "s5"),
      s"non-minimal movement: ${moved.filter(i => s6(i) != "s5").take(3)}")
    // expected movement ~ 1/6 of rows; allow wide slack on 600 draws
    assert(moved.size > 40 && moved.size < 180, s"moved=${moved.size}")
    // rough balance across the 5 shards
    val byShard = s5.values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.values.forall(n => n > 60 && n < 180), byShard.toMap.toString)
  }

  test("c4Filter line rules and page verdicts") {
    val clean = "This is a perfectly fine sentence for the corpus.\n" +
      "Another good sentence follows it right here!\n" +
      "And a third one closes the paragraph, carefully."
    val df = Seq(
      (1L, clean),                                        // keep
      (2L, clean + "\nshort line."),                      // <5 words -> line cut, page keeps
      (3L, clean + "\nEnable JavaScript to view content."), // js line cut
      (4L, clean + "\nno terminal punctuation here"),     // line cut
      (5L, clean.replace(".", "").replace("!", "")),      // nothing survives -> few_sentences
      (6L, clean + "\nfunction f() { return 1; }"),       // brace page flag
      (7L, "Lorem ipsum dolor sit amet, consectetur adipiscing elit.\n" + clean)
    ).toDF("id", "text")
    val r = Curation.c4Filter(df, "text").orderBy("id")
      .select("c4_text", "n_lines_kept", "n_sentences", "c4_reasons", "c4_keep")
      .collect()
    assert(r(0).getString(0) == clean && r(0).getBoolean(4))
    assert(r(0).getLong(1) == 3L && r(0).getLong(2) == 3L)
    assert(r(1).getString(0) == clean && r(1).getBoolean(4)) // cut line, kept page
    assert(r(2).getString(0) == clean && r(2).getBoolean(4))
    assert(r(3).getString(0) == clean && r(3).getBoolean(4))
    assert(r(4).getLong(1) == 0L && r(4).getString(3) == "few_sentences")
    assert(r(5).getString(3) == "brace" && !r(5).getBoolean(4))
    assert(r(6).getString(3) == "lorem_ipsum" && !r(6).getBoolean(4))
  }

  test("qualityFilter flags each rule and keeps clean docs") {
    val good = (("the word list " * 10) + "of and that").trim // 43 words, stopwords, alpha
    val df = Seq(
      (1L, good),                                    // clean
      (2L, "tiny doc of the and"),                   // too_few_words
      (3L, good + (" 9" * 40)),                      // low_alpha (+ short_words drag)
      (4L, good + "\nX\nX\nX\nX"),                   // dup_lines
      (5L, ("zz " * 40).trim)                        // few_stopwords
    ).toDF("id", "text")
    val r = Curation.qualityFilter(df, "text", minWords = 30)
      .orderBy("id").select("qf_keep", "qf_reasons").collect()
    assert(r(0).getBoolean(0) && r(0).getString(1) == "")
    assert(!r(1).getBoolean(0) && r(1).getString(1).contains("too_few_words"))
    assert(!r(2).getBoolean(0) && r(2).getString(1).contains("low_alpha"))
    assert(!r(3).getBoolean(0) && r(3).getString(1).contains("dup_lines"))
    assert(!r(4).getBoolean(0) && r(4).getString(1).contains("few_stopwords"))
    // reasons are comma-joined in fixed rule order
    val multi = Curation.qualityFilter(
      Seq((1L, "9 9")).toDF("id", "text"), "text", minWords = 30)
      .select("qf_reasons").as[String].head()
    assert(multi == "too_few_words,short_words,low_alpha,few_stopwords")
  }

  test("exactIncremental: batch-canonical, ledger-unseen, idempotent") {
    val seen = Seq("already ingested").toDF("text")
      .select(md5(col("text").cast("binary")).as("dup_key"))
    val incoming = Seq(
      (10L, "already ingested"), // in ledger -> dropped
      (11L, "fresh one"),        // survives
      (12L, "fresh two"),        // survives (canonical of 12/13)
      (13L, "fresh two")         // batch dup -> dropped
    ).toDF("id", "text")
    val out = Dedup.exactIncremental(incoming, seen, "id", "text")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(11L, 12L))
    // appending the survivors' keys makes re-ingestion a no-op
    val ledger2 = seen.unionByName(out.select("dup_key"))
    assert(Dedup.exactIncremental(incoming, ledger2, "id", "text").isEmpty)
  }

  test("capPerKey keeps k deterministic rows per key with ranks 1..k") {
    val df = (1L to 40L).map(i => (i, s"dom${i % 4}", s"payload $i")).toDF("id", "dom", "text")
    val r = Curation.capPerKey(df, "id", "dom", k = 3)
    val byDom = r.select("dom", "id", "key_rank").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(x => (x.getLong(1), x.getLong(2))).sortBy(_._2))
    assert(byDom.size == 4 && byDom.values.forall(_.length == 3))
    byDom.values.foreach { ks => assert(ks.map(_._2).toSeq == Seq(1L, 2L, 3L)) }
    // deterministic across invocations and payload carried through
    val again = Curation.capPerKey(df, "id", "dom", k = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == r.select("id").as[Long].collect().sorted.toSeq)
    assert(r.columns.contains("text"))
  }

  test("extractHtmlText: golden page — scripts/styles/comments vanish, blocks break, entities decode") {
    val html = "<html><!-- c --><head><title>T</title><style>p{x:1}</style>" +
      "<script>var a = 1 < 2; s(\"</div>ish\");</script></head>" + // bare < and fake tag INSIDE script
      "<body>  <h1>A &amp; B</h1>\n<p>one\ttwo</p><ul><li>item</li></ul>" +
      "<div>x &lt;y&gt; &quot;z&#39;s&quot;&nbsp;w</div><br><br></body></html>"
    val df = Seq((1L, html)).toDF("id", "html")
    val out = Curation.htmlExtract(df, "html").select("extracted_text").head.getString(0)
    assert(out == "T\nA & B\none two\nitem\nx <y> \"z's\" w")
  }

  test("extractHtmlText: binary input decodes as UTF-8; plain text is a fixpoint") {
    val df = Seq((1L, "<p>héllo &amp; wörld</p>".getBytes("UTF-8"))).toDF("id", "html")
    val out = Curation.htmlExtract(df, "html")
      .select("extracted_text").head.getString(0)
    assert(out == "héllo & wörld")
    // already-extracted text passes through unchanged (idempotence on tag-free input)
    val plain = Seq((1L, "line one\nline two")).toDF("id", "html")
    assert(Curation.htmlExtract(plain, "html")
      .select("extracted_text").head.getString(0) == "line one\nline two")
  }

  test("extractLinks: grammar split — absolute kept, relative resolved, junk null, non-matches skipped") {
    val html = """<A HREF="https://a.example/x">1</A><a rel=nofollow href="/rel/p?q=1">2</a>""" +
      """<a href="//proto.example/y">3</a><a href="mailto:a@b.c">4</a><a href="#top">5</a>""" +
      """<a name="anchor">6</a><a href='single.html'>7</a>"""
    val df = Seq((7L, html, "https://host.example:8080/base/page")).toDF("id", "html", "url")
    val r = Curation.extractLinks(df, "id", "html", "url").orderBy("link_no")
      .select("link_no", "href", "target_url").collect()
    assert(r.length == 5) // no-href and single-quoted anchors emit nothing
    assert(r(0).getString(1) == "https://a.example/x" && r(0).getString(2) == "https://a.example/x")
    assert(r(1).getString(1) == "/rel/p?q=1" &&
      r(1).getString(2) == "https://host.example:8080/rel/p?q=1")
    assert(r(2).getString(1) == "//proto.example/y" && r(2).isNullAt(2)) // protocol-relative
    assert(r(3).getString(1) == "mailto:a@b.c" && r(3).isNullAt(2))
    assert(r(4).getString(1) == "#top" && r(4).isNullAt(2))
  }

  test("extractLinks: no anchors -> no rows; malformed base -> relative unresolvable") {
    val df = Seq(
      (1L, "<p>plain text, zero anchors</p>", "https://ok.example"),
      (2L, "<a href=\"/only\">x</a>", "not a url")).toDF("id", "html", "url")
    val r = Curation.extractLinks(df, "id", "html", "url")
      .select("id", "href", "target_url").collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 2L && r(0).getString(1) == "/only" && r(0).isNullAt(2))
  }

  test("shuffleShards: complete deal, dense per-shard positions, seed changes the permutation") {
    val df = (0L until 200L).toDF("id")
    val r = Curation.shuffleShards(df, "id", "ep1", nShards = 4)
      .select("id", "shard", "shard_pos").collect()
    assert(r.length == 200 && r.map(_.getLong(0)).toSet.size == 200) // every row dealt once
    val byShard = r.groupBy(_.getLong(1))
    assert(byShard.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    byShard.values.foreach { rows => // positions are exactly 1..size (dense, no gaps)
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: identical re-deal; different seed: different permutation
    val again = Curation.shuffleShards(df, "id", "ep1", 4)
      .select("id", "shard", "shard_pos").collect().map(_.toSeq).toSet
    assert(again == r.map(_.toSeq).toSet)
    val other = Curation.shuffleShards(df, "id", "ep2", 4)
      .select("id", "shard", "shard_pos").collect().map(_.toSeq).toSet
    assert(other != again)
  }

  test("oovStats: counts occurrences outside the deterministic top-V vocab; empty doc kept") {
    val df = Seq(
      (1L, "aa aa aa bb"),     // aa x3, bb x1
      (2L, "aa bb cc"),        // cc is the rarest
      (3L, "")                 // zero tokens
    ).toDF("id", "text")
    // corpus freq: aa=4, bb=2, cc=1 -> vocabSize=2 keeps {aa, bb}
    val r = Curation.oovStats(df, "id", "text", vocabSize = 2).orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 4L, 0L), (2L, 3L, 1L), (3L, 0L, 0L)))
    // boundary tie-break is token-asc: with freq ties, 'ab' enters before 'ba'
    val tie = Seq((1L, "ab ba zz zz")).toDF("id", "text")
    val t2 = Curation.oovStats(tie, "id", "text", vocabSize = 2).head
    assert(t2.getLong(1) == 4L && t2.getLong(2) == 1L) // vocab = {zz, ab}; 'ba' is OOV
  }

  test("extractHtmlText: no tag survives, any input (property)") {
    val gen = new scala.util.Random(7)
    val frags = Seq("<div a='b'>", "text", "<script>x<y</script>", "&amp;", "<BR>",
      "<style >a{}</style>", "</p>", "<!-- hidden -->", "words here", "<em>i</em>", "\n", "  ")
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until 12).map(_ => frags(gen.nextInt(frags.length))).mkString)
    }
    val out = Curation.htmlExtract(docs.toDF("id", "html"), "html")
      .select("extracted_text").as[String].collect()
    out.foreach { s =>
      assert(!s.contains("<div") && !s.contains("</") && !s.contains("<em>") &&
        !s.contains("script") && !s.contains("hidden") && !s.contains("a{}"),
        s"residual markup in: $s")
      assert(!s.contains("  ") && !s.contains("\n\n"), s"uncollapsed whitespace in: $s")
      assert(s == s.trim, s"untrimmed: '$s'")
    }
  }

  test("bigramCoverage: word salad fails the second-order check that unigrams pass") {
    // three fluent docs share every bigram; the salad doc uses the SAME
    // words in a novel order — unigram coverage full, bigram coverage low
    val fluent = "the cat sat on the mat"
    val df = Seq((1L, fluent), (2L, fluent), (3L, fluent),
      (4L, "mat the on sat cat the"), (5L, ""), (6L, "single")).toDF("id", "text")
    val r = Curation.bigramCoverage(df, "id", "text", vocabSize = 5)
      .orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // fluent docs: 5 bigrams, all in the top-5 vocabulary (each occurs 3x,
    // beating every salad bigram's 1x)
    assert(r(0) == ((1L, 5L, 5L)) && r(1) == ((2L, 5L, 5L)) && r(2) == ((3L, 5L, 5L)))
    // the salad doc: same words, novel pairs -> low coverage
    val (_, saladN, saladIn) = r(3)
    assert(saladN == 5L && saladIn == 0L, s"salad coverage $saladIn/$saladN")
    // zero- and one-word docs survive with zeros
    assert(r(4) == ((5L, 0L, 0L)) && r(5) == ((6L, 0L, 0L)))
  }

  test("upsampleByWeight: integer weights exact, fractional coin deterministic, w=0 drops") {
    val df = Seq((1L, 3000L), (2L, 1000L), (3L, 0L), (4L, 2500L)).toDF("id", "w")
    val r = Curation.upsampleByWeight(df, "id", "w", seed = "s1")
      .orderBy("id", "copy_no")
      .collect().map(x => (x.getLong(0), x.getLong(2)))
    val byId = r.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byId(1L) == Seq(0L, 1L, 2L))        // 3.0x -> exactly 3 copies
    assert(byId(2L) == Seq(0L))                 // 1.0x -> exactly 1
    assert(!byId.contains(3L))                  // 0x -> dropped
    assert(byId(4L).size == 2 || byId(4L).size == 3) // 2.5x -> 2 or 3
    // deterministic: identical re-run, identical under repartition
    val again = Curation.upsampleByWeight(df.repartition(5), "id", "w", seed = "s1")
      .orderBy("id", "copy_no").collect().map(x => (x.getLong(0), x.getLong(2)))
    assert(r.toSeq == again.toSeq)
    // a different seed re-rolls only the fractional coin
    val other = Curation.upsampleByWeight(df, "id", "w", seed = "s2")
      .orderBy("id", "copy_no").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(other(1L) == 3 && other(2L) == 1 && !other.contains(3L))
  }

  test("upsampleByWeight: user columns named pos/col pass through untouched") {
    val df = Seq((1L, 2000L, "p1", "c1"), (2L, 1000L, "p2", "c2"))
      .toDF("id", "w", "pos", "col")
    val r = Curation.upsampleByWeight(df, "id", "w", seed = "s1")
    assert(r.columns.toSeq == Seq("id", "w", "pos", "col", "copy_no"))
    val rows = r.orderBy("id", "copy_no")
      .collect().map(x => (x.getLong(0), x.getString(2), x.getString(3), x.getLong(4)))
    assert(rows.toSeq == Seq((1L, "p1", "c1", 0L), (1L, "p1", "c1", 1L),
      (2L, "p2", "c2", 0L)))
  }

  test("upsampleByWeight: fractional keep rate tracks the weight (law of large numbers)") {
    val df = spark.range(4000).select($"id", lit(500L).as("w")) // 0.5x
    val kept = Curation.upsampleByWeight(df, "id", "w", seed = "lln").count()
    assert(math.abs(kept - 2000L) < 150, s"0.5x of 4000 kept $kept")
  }

  test("mixtureToTarget: exact weights, visible cap, zero-token target, untargeted drop") {
    val df = Seq(
      (1L, "A", 100L), (2L, "A", 100L), // T_A = 200
      (3L, "B", 50L),                   // T_B = 50
      (4L, "C", 10L),                   // T_C = 10 -> cap binds
      (5L, "E", 0L),                    // zero-token target domain
      (6L, "D", 500L)                   // not in targets -> dropped
    ).toDF("id", "dom", "n_tokens")
    val r = Curation.mixtureToTarget(df, "id", "dom", "n_tokens",
        Seq(("A", 350L), ("B", 300L), ("C", 250L), ("E", 100L)),
        budgetTokens = 1000L, seed = "mix", maxWeightMilli = 10000L)
      .select(col("id"), col("dom"), col("w_raw_milli"), col("w_milli"), col("copy_no"))
      .collect().map(_.toSeq).groupBy(_.head.asInstanceOf[Long])
    // B: (300*1000) div 50 = 6000 -> exactly 6 copies
    assert(r(3L).length == 6 && r(3L).forall(x => x(2) == 6000L && x(3) == 6000L))
    // C: raw 25000 capped to 10000 -> 10 copies, raw stays visible
    assert(r(4L).length == 10 && r(4L).forall(x => x(2) == 25000L && x(3) == 10000L))
    // A: 1750 -> 1 copy + md5 coin; replicate the coin exactly
    def rank(id: Long): Long = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(("mix" + id).getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hx, 16) % 1000
    }
    for (id <- Seq(1L, 2L)) {
      val want = 1 + (if (rank(id) < 750) 1 else 0)
      assert(r(id).length == want, s"doc $id expected $want copies")
    }
    // zero-token and untargeted domains emit nothing
    assert(!r.contains(5L) && !r.contains(6L))
  }

  test("blocklistHits: token-boundary L-gram matching, mixed phrase lengths, threshold") {
    val df = Seq(
      (1L, "bad word here bad word"),     // "bad"x2 + "bad word"x2 = 4 hits
      (2L, "nothing wrong classy stuff"), // substring 'ass' must NOT match
      (3L, "bad bad bad"),                // "bad"x3; "bad bad" not listed
      (4L, ""),
      (5L, "one bad apple")               // 1 hit, below blockAt=3
    ).toDF("id", "text")
    val r = Curation.blocklistHits(df, "id", "text",
        Seq("bad word", "BAD", "evil twin", "ass"), blockAt = 3L)
      .orderBy("id").collect()
    assert(r(0).toSeq == Seq(1L, 4L, 2L, true))
    assert(r(1).toSeq == Seq(2L, 0L, 0L, false))
    assert(r(2).toSeq == Seq(3L, 3L, 1L, true))
    assert(r(3).toSeq == Seq(4L, 0L, 0L, false))
    assert(r(4).toSeq == Seq(5L, 1L, 1L, false))
  }

  test("AhoCorasick automaton: counts equal brute-force overlapping counts (nested, overlapping, self-overlapping)") {
    import graft.functions.AhoCorasick
    def brute(text: String, p: String): Long =
      (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong
    val patterns = IndexedSeq("he", "she", "his", "hers", "aa", "aaa", "ba")
    val ac = new AhoCorasick.Automaton(patterns)
    val texts = Seq("ushers", "shehehers", "aaaa", "baaab", "", "x",
      "hishershehisaaa", "ababababa", "aabaaabaaaab", "hehehehe")
    texts.foreach { t =>
      val got = ac.count(t).toSeq
      val want = patterns.map(p => brute(t, p))
      assert(got == want, s"text '$t': got $got want $want")
    }
  }

  test("substringBlocklist: Aho-Corasick gate — per-doc totals, lowercase, threshold; cost independent of list size") {
    val df = Seq(
      (1L, "The THEory of theft"),  // 'the' x3 (lowercased), 'eft' x1
      (2L, "clean words only"),
      (3L, null.asInstanceOf[String]),
      (4L, "aaaa")                  // 'aa' overlaps: 3 hits
    ).toDF("id", "text")
    val patterns = Seq("the", "eft", "aa") ++
      (1 to 500).map(i => s"zzpad$i") // padding: result must not change
    val r = Curation.substringBlocklist(df, "id", "text", patterns,
        blockAt = 3L).orderBy("id").collect()
    assert(r(0).toSeq == Seq(1L, 4L, 2L, true))
    assert(r(1).toSeq == Seq(2L, 0L, 0L, false))
    assert(r(2).toSeq == Seq(3L, 0L, 0L, false))
    assert(r(3).toSeq == Seq(4L, 3L, 1L, true))
    val small = Curation.substringBlocklist(df, "id", "text",
      Seq("the", "eft", "aa"), blockAt = 3L).orderBy("id").collect()
    assert(r.map(_.toSeq).toSeq == small.map(_.toSeq).toSeq)
  }

  test("densityContentStats: 3-line smoothed density, hand-computed; empty and boilerplate-only docs") {
    val doc = Seq(
      "one two three four five six seven eight", // 8w -> smoothed 9
      "nav",                                     // 1w -> smoothed 9 (absorbed)
      "",                                        // 0w -> never content
      "a b c d e",                               // 5w -> smoothed 8
      "f g h",                                   // 3w -> smoothed 8
      "",
      "short"                                    // 1w -> smoothed 1
    ).mkString("\n")
    val df = Seq((1L, doc), (2L, ""), (3L, "a\nb\nc")).toDF("id", "text")
    val r = Curation.densityContentStats(df, "text", minBlockWords = 8)
      .select(col("id"), col("n_lines"), col("n_content_lines"),
        col("total_words"), col("content_words"), col("content_ratio"),
        col("longest_run"))
      .orderBy("id").collect()
    assert(r(0).toSeq == Seq(1L, 5L, 4L, 18L, 17L, 17.0 / 18.0, 2L))
    // empty doc: zero lines/words, NULL ratio
    assert(r(1).getLong(1) == 0L && r(1).getLong(3) == 0L &&
      r(1).isNullAt(5) && r(1).getLong(6) == 0L)
    // boilerplate-only: words exist but nothing passes the smoothed gate
    assert(r(2).toSeq.take(5) == Seq(3L, 3L, 0L, 3L, 0L) &&
      r(2).getDouble(5) == 0.0 && r(2).getLong(6) == 0L)
  }

  test("consistentShard: successor-vnode assignment JVM-replayed; minimal movement on shard add") {
    def pos60(str: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def assignLocal(id: Long, nShards: Int, v: Int): Long = {
      val ring = (for { sh <- 0 until nShards; vi <- 0 until v }
        yield (pos60(s"ring:$sh:$vi"), sh.toLong)).sortBy(_._1)
      val kp = pos60(s"ring#$id")
      ring.find(_._1 >= kp).getOrElse(ring.head)._2
    }
    val ids = (0L until 500L)
    val df = ids.toDF("id")
    val a4 = Curation.consistentShard(df, "id", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    ids.take(50).foreach { id =>
      assert(a4(id) == assignLocal(id, 4, 64), s"id $id")
    }
    assert(a4.values.toSet.size == 4, "all shards own keys")
    // add one shard: only the captured ranges move (~1/5 of keys)
    val a5 = Curation.consistentShard(df, "id", nShards = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val moved = ids.count(id => a4(id) != a5(id)).toDouble / ids.size
    assert(moved > 0.05 && moved < 0.40, s"movement fraction $moved")
    // every moved key moved TO the new shard (ring property)
    ids.filter(id => a4(id) != a5(id)).foreach(id => assert(a5(id) == 4L))
  }
}
