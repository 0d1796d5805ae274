package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("id", "url")
    Curation.canonicalizeUrl(df, "url")
      .orderBy("id").select("canonical_url")
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("canonicalizeUrl: grammar branches, hand-checked") {
    assert(canon(
      "HTTP://Example.COM:80/Path/Page?b=2&utm_source=x&a=1#frag",
      "https://site.org:443/",
      "https://site.org:8080/x?gclid=1",
      "https://site.org",
      "http://a.b/p?fbclid=9&z=26&ref=feed",
      "https://x.y/p/?q=1&q=0",
      "not a url") == Seq(
      Some("http://example.com/Path/Page?a=1&b=2"),
      Some("https://site.org/"),
      Some("https://site.org:8080/x"),
      Some("https://site.org/"),
      Some("http://a.b/p?z=26"),
      Some("https://x.y/p/?q=0&q=1"),
      None))
  }

  test("canonicalizeUrl: idempotent — canonicalizing a canonical URL is a no-op") {
    val messy = Seq(
      "HTTP://Example.COM:80/Path?b=2&utm_source=x&a=1#f",
      "https://site.org:443/", "https://h.example",
      "http://a.b/p?fbclid=9&z=26", "https://x.y:9443/p/?q=1&q=0&ref=x")
    val once = canon(messy: _*).flatten
    val twice = canon(once: _*).flatten
    assert(once == twice && once.size == messy.size)
  }

  test("canonicalizeUrl: path and case are preserved where semantics require") {
    // path stays case-sensitive, non-default port stays, non-tracking
    // params survive in sorted order
    assert(canon("https://H.example:8443/CaseSensitive/Path?zz=1&aa=2") ==
      Seq(Some("https://h.example:8443/CaseSensitive/Path?aa=2&zz=1")))
  }

  test("canonicalizeUrl: never throws on garbage; output is null or re-canonicalizes to itself (property)") {
    val gen = new scala.util.Random(11)
    val frags = Seq("http://", "https://", "HTTP://", "host", ".com", ":80", ":443",
      ":x9", "/p th", "?a=1", "&utm_x=2", "#f", "??", "//", "%%%", " ", "ftp:/",
      "é", "=", "&&")
    val urls = (0 until 200).map(_ =>
      (0 until 1 + gen.nextInt(6)).map(_ => frags(gen.nextInt(frags.length))).mkString)
    val once = canon(urls: _*)
    val nonNull = once.flatten
    if (nonNull.nonEmpty) {
      val twice = canon(nonNull: _*)
      // idempotence: a canonical form is a fixpoint (and stays parseable)
      assert(twice.flatten == nonNull, "canonical form is not a fixpoint")
    }
  }
}
