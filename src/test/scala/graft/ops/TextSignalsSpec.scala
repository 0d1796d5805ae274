package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  test("stripHostBoilerplate: host-template lines go, unique body lines stay, order kept") {
    val df = Seq(
      (1L, "h1", "nav\nbody one\n(c) h1"),
      (2L, "h1", "nav\nbody two\n(c) h1"),
      (3L, "h1", "nav\nbody three\n(c) h1"),
      (4L, "h2", "nav\nsolo page")) // h2 has ONE page: below minPages, kept
      .toDF("id", "host", "text")
    val r = Curation.stripHostBoilerplate(df, "id", "host", "text")
      .orderBy("id")
      .collect().map(x => (x.getLong(0), x.getString(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1L, "body one", 2L, 1L),
      (2L, "body two", 2L, 1L),
      (3L, "body three", 2L, 1L),
      (4L, "nav\nsolo page", 0L, 2L)))
  }

  test("stripHostBoilerplate: threshold is doc frequency, repeats inside one page don't count") {
    // 'dup' appears twice in page 1 but on only 1 of 3 pages -> df=1 of 3
    // pages = 33% < 50% -> NOT boilerplate; 'shared' is on 2 of 3 -> 66% -> goes
    val df = Seq(
      (1L, "h", "dup\ndup\nshared\na"),
      (2L, "h", "shared\nb"),
      (3L, "h", "c")).toDF("id", "host", "text")
    val r = Curation.stripHostBoilerplate(df, "id", "host", "text")
      .orderBy("id").collect().map(x => (x.getLong(0), x.getString(2)))
    assert(r.toSeq == Seq((1L, "dup\ndup\na"), (2L, "b"), (3L, "c")))
  }

  test("stripHostBoilerplate: blank lines are structure — never stripped; all-boilerplate doc survives empty") {
    val df = Seq(
      (1L, "h", "x\n\ny"),
      (2L, "h", "x\n\ny")).toDF("id", "host", "text")
    val r = Curation.stripHostBoilerplate(df, "id", "host", "text")
      .orderBy("id").collect().map(x => (x.getString(2), x.getLong(3), x.getLong(4)))
    // x and y are on 2/2 pages -> both go; the blank middle line stays
    assert(r.toSeq == Seq(("", 2L, 1L), ("", 2L, 1L)))
  }

  test("ngramRepetition: hand-checked bigram counts, tie to smallest gram, short docs zeroed") {
    // doc 1: words [a b a b a] -> bigrams: "a b"x2, "b a"x2 (tie -> "a b")
    //   chars = len("a b a b a") = 9; top frac = 2*3/9; dup = (2*3+2*3)/9
    // doc 2: one word -> no bigrams -> zeros
    val df = Seq((1L, "a b a b a"), (2L, "hello")).toDF("id", "text")
    val r = Curation.ngramRepetition(df, "id", "text", n = 2)
      .orderBy("id")
      .collect().map(x => (x.getLong(0), Option(x.getString(1)), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      (1L, Some("a b"), 2L, 6.0 / 9, 12.0 / 9),
      (2L, None, 0L, 0.0, 0.0)))
  }

  test("ngramRepetition: case-folded, whitespace runs collapse, unique grams contribute no dup mass") {
    val df = Seq((1L, "The  THE the x")).toDF("id", "text")
    // words: [the, the, the, x]; bigrams: "the the"x2, "the x"x1
    val r = Curation.ngramRepetition(df, "id", "text", n = 2).collect()(0)
    assert(r.getString(1) == "the the" && r.getLong(2) == 2L)
    // dup mass counts only "the the": 2 * 7 chars / 14 text chars
    assert(r.getDouble(4) == 14.0 / 14)
  }

  test("readability: exact counts and the Flesch formula; empty text yields null score") {
    val df = Seq(
      (1L, "The cat sat. It was happy!"),
      (2L, "")).toDF("id", "text")
    val r = Curation.readability(df, "text").orderBy("id").collect()
    // words: 6; sentences: 2 ('.', '!'); syllable groups in
    // "the cat sat. it was happy!": e,a,a,i,a,a,y -> the(1) cat(1) sat(1)
    // it(1) was(1) happy(2 runs: a, y) = 7
    assert(r(0).getLong(2) == 6L && r(0).getLong(3) == 2L && r(0).getLong(4) == 7L)
    val expected = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0)
    assert(r(0).getDouble(5) == expected)
    assert(r(1).getLong(2) == 0L && r(1).isNullAt(5))
  }

  test("lexicalDiversity: tokens/types/hapax hand-checked, case-folded, wordless doc all-zero") {
    val df = Seq(
      (1L, "a b A c"),   // tokens 4, types 3 (a,b,c), hapax 2 (b,c)
      (2L, "  \t "),     // wordless
      (3L, "x x x")).toDF("id", "text")
    val r = Curation.lexicalDiversity(df, "id", "text").orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getDouble(4), x.getDouble(5)))
    assert(r.toSeq == Seq(
      (1L, 4L, 3L, 2L, 3.0 / 4, 2.0 / 3),
      (2L, 0L, 0L, 0L, 0.0, 0.0),
      (3L, 3L, 1L, 0L, 1.0 / 3, 0.0)))
  }

  test("encodingArtifacts: mojibake literals, U+FFFD, control chars; suspect gates on total>0") {
    val df = Seq(
      (1L, "caffÃ¨ is Ã©lÃ©gant â€” yes"), // Ã¨ + 2x Ã© + â€” = 4
      (2L, "bad�byte\u0001x"),          // 1 replacement + 1 ctrl
      (3L, "clean ascii text, long enough to be sure"),
      (4L, "")).toDF("id", "text")
    val r = Curation.encodingArtifacts(df, "text", perMilli = 5L).orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getBoolean(5)))
    // doc 1: 4 artifacts over 27 chars -> 4000 >= 135 -> suspect
    assert(r.toSeq == Seq(
      (1L, 4L, 0L, 0L, true),
      (2L, 0L, 1L, 1L, true),
      (3L, 0L, 0L, 0L, false),
      (4L, 0L, 0L, 0L, false)))
  }

  test("encodingArtifacts: tab/newline/CR are NOT control artifacts") {
    val df = Seq((1L, "a\tb\nc\rd")).toDF("id", "text")
    val r = Curation.encodingArtifacts(df, "text").collect()(0)
    assert(r.getLong(4) == 0L && !r.getBoolean(5))
  }

  test("htmlTableStats: open-tag counts, th+td cells, prose gives zeros") {
    val df = Seq(
      (1L, "<table class=x><tr><td>a</td><th>b</th></tr><tr><td>c</td></tr></table>"),
      (2L, "<p>just prose with the word table in it</p>"),
      (3L, "<TABLE><TR><TD>caps</TD></TR></TABLE>"))
      .toDF("id", "html")
    val r = Curation.htmlTableStats(df, "html").orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4),
        if (x.isNullAt(5)) None else Some(x.getDouble(5))))
    assert(r.toSeq == Seq(
      (1L, 1L, 2L, 3L, Some(1.5)),
      (2L, 0L, 0L, 0L, None),     // "table" as prose doesn't count
      (3L, 1L, 1L, 1L, Some(1.0))))
  }

  test("htmlMeta: title collapse, description/canonical attrs, NULL when absent") {
    val df = Seq(
      (1L, "<html><head><title> My\n  Page </title>" +
        "<meta name=\"description\" content=\"A summary here\">" +
        "<link rel=\"canonical\" href=\"https://ex.org/p\"></head></html>"),
      (2L, "<TITLE lang='en'>Caps</TITLE>"),      // case-insensitive + attrs
      (3L, "<p>no metadata at all</p>"),
      (4L, "<meta content=\"x\" name=\"description\">")) // wrong attr order
      .toDF("id", "html")
    val r = Curation.htmlMeta(df, "html").orderBy("id").collect()
      .map(x => (x.getLong(0),
        Option(x.getString(2)), Option(x.getString(3)), Option(x.getString(4))))
    assert(r.toSeq == Seq(
      (1L, Some("My Page"), Some("A summary here"), Some("https://ex.org/p")),
      (2L, Some("Caps"), None, None),
      (3L, None, None, None),
      (4L, None, None, None))) // order contract: name before content
  }

  test("csvQuarantine: malformed lines keep the raw text, good rows type") {
    val df = Seq(
      (1L, "7,en,120"),          // clean
      (2L, "8,de,not_an_int"),   // type error -> quarantined
      (3L, "9,fr"),              // short row -> NULL n AND quarantined
      (4L, "\"unclosed,xx,5"))   // broken quoting -> quarantined
      .toDF("row_id", "line")
    val r = Curation.csvQuarantine(df, "line", "id LONG, lang STRING, n INT")
      .orderBy("row_id").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(2)) None else Some(x.getLong(2)),
        if (x.isNullAt(4)) None else Some(x.getInt(4)),
        x.getBoolean(6)))
    assert(r.toSeq == Seq(
      (1L, Some(7L), Some(120), false),
      (2L, Some(8L), None, true),  // partial parse survives, line quarantined
      (3L, Some(9L), None, true),  // short row: parsed prefix + quarantined
      (4L, None, None, true)))
    // the corrupt channel preserves the raw line byte-for-byte
    val corrupt = Curation.csvQuarantine(df, "line", "id LONG, lang STRING, n INT")
      .where(col("quarantined")).select("line", "_corrupt").collect()
    corrupt.foreach(x => assert(x.getString(0) == x.getString(1)))
  }

  test("scriptMix: explicit-range counts and the latin+cyrillic flag") {
    val df = Seq(
      (1L, "Hello мир 123"),        // latin 5, cyrillic 3, digit 3 -> mixed
      (2L, "只是中文"),              // han 4
      (3L, "abc αβγ ٤٥"),           // latin 3, greek 3, arabic 2
      (4L, "")).toDF("id", "text")
    val r = Curation.scriptMix(df, "text").orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5), x.getLong(6), x.getLong(7), x.getBoolean(8)))
    assert(r.toSeq == Seq(
      (1L, 5L, 3L, 3L, 0L, 0L, 0L, true),
      (2L, 0L, 0L, 0L, 0L, 4L, 0L, false),
      (3L, 3L, 0L, 0L, 3L, 0L, 2L, false),
      (4L, 0L, 0L, 0L, 0L, 0L, 0L, false)))
  }

  test("longestRepeatedSubstring: hand cases, overlap, cap, code points, brute parity") {
    import graft.core.TextKernels.{longestRepeatedSubstring => lrs}
    assert(lrs("abcabcabc", 512) == 6L) // overlapping "abcabc"
    assert(lrs("banana", 512) == 3L)    // "ana"
    assert(lrs("abcd", 512) == 0L)
    assert(lrs("aaaa", 512) == 3L)
    assert(lrs("", 512) == 0L && lrs("x", 512) == 0L)
    assert(lrs("xyxy", 2) == 0L)        // cap hides the second "xy"
    assert(lrs("😀a😀a", 512) == 2L) // code points, not chars
    // brute-force parity on deterministic pseudo-random strings
    def brute(s: String): Long = {
      val cps = s.codePoints().toArray
      val n = cps.length
      var best = 0
      for (l <- 1 until n) {
        val seen = scala.collection.mutable.Set[Seq[Int]]()
        var i = 0
        var dup = false
        while (i + l <= n && !dup) {
          if (!seen.add(cps.slice(i, i + l).toSeq)) dup = true
          i += 1
        }
        if (dup) best = l
      }
      best.toLong
    }
    val alphabet = "abc"
    for (seed <- 1 to 8) {
      val s = (0 until 40).map { i =>
        alphabet(((i * 2654435761L + seed * 40503L) % 3).toInt.abs)
      }.mkString
      assert(lrs(s, 512) == brute(s), s"seed=$seed s=$s")
      assert(lrs(s, 10) == brute(s.take(10)), s"capped seed=$seed")
    }
    // SQL registry path, default and explicit cap
    val viaSql = spark.sql(
      "SELECT longest_repeat_len('abcabcabc'), longest_repeat_len('xyxy', 2)")
      .collect()(0)
    assert(viaSql.getLong(0) == 6L && viaSql.getLong(1) == 0L)
    // Column facade
    val viaCol = Seq("mississippi").toDF("t")
      .select(graft.functions.longest_repeat_len(col("t")))
      .collect()(0).getLong(0)
    assert(viaCol == 4L) // "issi"
  }
}
