package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.TextKernels

/** normalizeWebText (the web-page byte-identity contract), assignSplit
  * (entity-safe deterministic splits) and hashedFeatures (hashing trick) —
  * each checked against an independent reimplementation (java.util.regex
  * pipeline / MessageDigest md5), never against themselves.
  */
class WebTextOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- normalizeWebText ---------------------------------------------------

  /** The documented pass list as literal sequential regexes — the same
    * formulation the q110 DuckDB oracle uses; the kernel's single char walk
    * must agree with it on every input.
    */
  private def regexPipeline(s: String): String = {
    val stripped = s.replaceAll("\r\n?", "\n")
      .replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", "")
    java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC)
      .replaceAll("[ \t]+", " ")
      .replaceAll(" *\n *", "\n")
      .replaceAll("\n{3,}", "\n\n")
      .replaceAll("^[ \n]+|[ \n]+$", "")
  }

  test("normalizeWebText: golden cases per pass") {
    val cases = Seq(
      "Café" -> "Café", // NFC combining acute
      "가" -> "가", // NFC Hangul jamo composition
      "a\r\nb\rc" -> "a\nb\nc", // CRLF + lone CR
      "a\u0000bcd" -> "abcd", // C0 / C1 / DEL stripped
      "a \t\t b" -> "a b", // horizontal runs collapse
      "a \n  b" -> "a\nb", // no spaces adjacent to newlines
      "a\n\n\n\n\nb" -> "a\n\nb", // blank-line cap
      "  \n a \n\n \n " -> "a", // full trim
      "" -> "",
      "\r\n \t" -> "")
    cases.foreach { case (in, want) =>
      assert(TextKernels.normalizeWebText(in) == want, s"input=${in.map(_.toInt)}")
    }
  }

  test("normalizeWebText: char walk == sequential regex pipeline (property)") {
    val alphabet = Array(
      'a', 'b', 'c', ' ', ' ', '\t', '\n', '\n', '\r', '', '',
      '', '', '', '', 'e', '́', '̊',
      'ᄀ', 'ᅡ', 'é', 'Z', '0')
    val rnd = new scala.util.Random(20260819)
    (0 until 400).foreach { i =>
      val s = Array.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = TextKernels.normalizeWebText(s)
      val want = regexPipeline(s)
      assert(got == want,
        s"iter $i input=${s.map(_.toInt).mkString(",")} got=${got.map(_.toInt)} want=${want.map(_.toInt)}")
    }
  }

  test("normalizeWebText: idempotent") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab \t\n\ŕe".toCharArray
    (0 until 200).foreach { _ =>
      val s = Array.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val once = TextKernels.normalizeWebText(s)
      assert(TextKernels.normalizeWebText(once) == once)
    }
  }

  test("normalize_webtext reaches SQL through the FunctionRegistry") {
    // the combining acute is embedded directly (Spark's chr() is mod-256)
    val r = spark.sql("SELECT normalize_webtext('Café  x\r\n\n\n\ny') AS t")
      .head().getString(0)
    assert(r == "Café x\n\ny")
  }

  // ---- assignSplit --------------------------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("assignSplit matches an independent MessageDigest reimplementation") {
    val rows = (0L until 200L).map(i => (i, s"host${i % 37}.example")).toDF("id", "key")
    val got = Curation.assignSplit(rows, "key", Seq(("train", 8L), ("val", 1L), ("test", 1L)))
      .select("id", "key", "split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    got.foreach { case (_, key, split) =>
      val bucket = java.lang.Long.parseLong(md5hex(key).substring(0, 8), 16) % 10
      val want = if (bucket < 8) "train" else if (bucket < 9) "val" else "test"
      assert(split == want, s"key=$key bucket=$bucket")
    }
    // entity safety: every key maps to exactly one split
    val perKey = got.groupBy(_._2).view.mapValues(_.map(_._3).distinct.length)
    assert(perKey.values.forall(_ == 1))
  }

  test("assignSplit: growth never moves an existing key; weights validated") {
    val small = (0L until 50L).map(i => (i, s"k${i % 11}")).toDF("id", "key")
    val big = (0L until 500L).map(i => (i, s"k${i % 61}")).toDF("id", "key")
    val splits = Seq(("a", 3L), ("b", 1L))
    val fromSmall = Curation.assignSplit(small, "key", splits)
      .select("key", "split").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val fromBig = Curation.assignSplit(big, "key", splits)
      .select("key", "split").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    fromSmall.foreach { case (k, s) => assert(fromBig(k) == s) }
    intercept[IllegalArgumentException] {
      Curation.assignSplit(small, "key", Seq(("a", 0L)))
    }
    intercept[IllegalArgumentException] {
      Curation.assignSplit(small, "key", Seq(("a", 1L), ("a", 2L)))
    }
  }

  // ---- hashedFeatures -----------------------------------------------------

  private def tokens(text: String): Seq[String] =
    "[a-z0-9_']+".r.findAllIn(text.toLowerCase).toSeq

  test("hashedFeatures matches an independent MessageDigest reimplementation") {
    val docs = Seq(
      (1L, "Apple apple BANANA common's x_1"),
      (2L, "banana cherry cherry common ... !!"),
      (3L, "")).toDF("id", "text")
    val dim = 16
    for (signed <- Seq(true, false)) {
      val got = Relevance.hashedFeatures(docs, "id", "text", dim, signed)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = docs.collect().flatMap { r =>
        tokens(Option(r.getString(1)).getOrElse("")).map { t =>
          val hx = md5hex(t)
          val bucket = java.lang.Long.parseLong(hx.substring(0, 8), 16) % dim
          val sign =
            if (!signed) 1L
            else if (java.lang.Long.parseLong(hx.substring(8, 9), 16) % 2 == 0) 1L
            else -1L
          (r.getLong(0), bucket) -> sign
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(got == want, s"signed=$signed")
      assert(got.keys.forall { case (_, b) => b >= 0 && b < dim })
    }
  }
}
