package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** extractAnchors grammar + inlinkFeatures host rollup. */
class WebGraphSpec extends SparkSpec {
  import spark.implicits._

  private val page = (10L,
    "<p><a href=\"https://other.example/x\">Other Site</a>" +
      "<a href=\"/rel/path\" rel=\"nofollow\">relative text</a>" +
      "<a href=\"#frag\">fragment</a>" +
      "<a href=\"https://skipme.example/\"><b>markup body</b></a>" +
      "<a href=\"//proto.example/y\">proto-relative</a>" +
      "<a name=\"x\">no href</a>" +
      "<A HREF=\"https://caps.example/\">CASE</A></p>",
    "https://self.example/page")

  test("extractAnchors: grammar branches — absolute, relative, fragment, markup-skip, case-insensitive") {
    val df = Seq(page).toDF("id", "html", "url")
    val r = Curation.extractAnchors(df, "id", "html", "url")
      .orderBy("link_no")
      .collect()
      .map(x => (x.getLong(1), x.getString(2), x.getString(3), x.getString(4)))
    assert(r.toSeq == Seq(
      (0L, "https://other.example/x", "Other Site", "https://other.example/x"),
      (1L, "/rel/path", "relative text", "https://self.example/rel/path"),
      (2L, "#frag", "fragment", null),
      (3L, "//proto.example/y", "proto-relative", null),
      (4L, "https://caps.example/", "CASE", "https://caps.example/")))
  }

  test("extractAnchors: binary html input decodes as UTF-8") {
    val df = Seq((1L, "<a href=\"https://x.example/\">ünïcode</a>", "https://s.example/"))
      .toDF("id", "html", "url")
      .withColumn("html", col("html").cast("binary"))
    val r = Curation.extractAnchors(df, "id", "html", "url").collect()
    assert(r.length == 1 && r(0).getString(3) == "ünïcode")
  }

  test("inlinkFeatures: external vs self split, distinct source hosts, null targets dropped") {
    val edges = Seq(
      // b.example linked by two distinct external hosts (one twice) + itself
      ("https://a1.example/p", "https://b.example/x"),
      ("https://a1.example/q", "https://b.example/y"),
      ("https://a2.example/p", "https://b.example/x"),
      ("https://b.example/p", "https://b.example/self"),
      // c.example only self-links
      ("https://c.example/p", "https://c.example/q"),
      // unresolvable target contributes nothing
      ("https://a1.example/p", null)).toDF("src", "dst")
    val r = Graph.inlinkFeatures(edges, "src", "dst")
      .orderBy("host")
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      ("b.example", 4L, 3L, 3L),
      ("c.example", 1L, 1L, 0L)))
  }

  test("inlinkFeatures: a hostless source URL is the empty-string host and counts as external") {
    val edges = Seq(("nohost-relative", "https://d.example/x")).toDF("src", "dst")
    val r = Graph.inlinkFeatures(edges, "src", "dst").collect()
    assert(r.length == 1)
    assert((r(0).getString(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) ==
      ("d.example", 1L, 1L, 1L))
  }
}
