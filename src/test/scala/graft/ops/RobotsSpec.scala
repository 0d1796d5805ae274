package graft.ops

import graft.SparkSpec

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robotsTxt =
    """# crawl policy
      |Sitemap: https://h.example/sitemap.xml
      |Disallow: /orphan
      |
      |User-agent: otherbot
      |Disallow: /
      |
      |User-agent: GraftBot
      |user-agent: extrabot
      |Allow: /public/   # trailing comment
      |Disallow: /public/private*
      |
      |Disallow: /tmp/
      |Allow: /tmp/keep$
      |Disallow:
      |Crawl-delay: 10
      |
      |User-agent: *
      |Disallow: /star/
      |""".stripMargin.replace("\n", "\r\n")

  test("parse: groups, comments, CRLF, empty patterns, agent selection") {
    val rules = Robots.parse(robotsTxt, "graftbot")
    // pre-group /orphan ignored; otherbot group skipped; * group suppressed;
    // empty Disallow and Crawl-delay no-ops; blank line does NOT close the
    // group, so /tmp/ rules still belong to graftbot
    assert(rules == Seq(
      Robots.Rule("/public/", allow = true),
      Robots.Rule("/public/private*", allow = false),
      Robots.Rule("/tmp/", allow = false),
      Robots.Rule("/tmp/keep$", allow = true)))
    // unknown agent -> the * group
    assert(Robots.parse(robotsTxt, "nobot") == Seq(Robots.Rule("/star/", allow = false)))
    // RFC 9309 ABNF: user-agent lines separated only by blanks merge into
    // ONE group header — lonely and * share the rule here
    val merged = "User-agent: lonely\n\nUser-agent: *\nDisallow: /\n"
    assert(Robots.parse(merged, "lonely") == Seq(Robots.Rule("/", allow = false)))
    // a rule line (even a no-op empty Disallow) closes the header: the
    // named group then exists with zero effective rules and suppresses *
    val emptyGroup = "User-agent: lonely\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    assert(Robots.parse(emptyGroup, "lonely").isEmpty)
    assert(Robots.parse(emptyGroup, "nobot") == Seq(Robots.Rule("/", allow = false)))
    // no groups at all -> empty rule set
    assert(Robots.parse("Sitemap: https://x/s.xml\n", "graftbot").isEmpty)
  }

  test("patternMatches: prefix, wildcards, end anchor") {
    import Robots.patternMatches
    assert(patternMatches("/a/", "/a/b"))          // prefix
    assert(!patternMatches("/a/c", "/a/b"))
    assert(!patternMatches("/a/bcd", "/a/b"))      // path shorter than pattern
    assert(patternMatches("/a*d", "/abcd/e"))      // mid-star, prefix after
    assert(patternMatches("/a*d$", "/abcd"))       // star + anchor
    assert(!patternMatches("/a*d$", "/abcd/e"))    // anchor rejects suffix
    assert(patternMatches("/*/x*y$", "/p/xAAy"))   // multi-star backtracking
    assert(!patternMatches("/*/x*y$", "/p/xAAyz"))
    assert(patternMatches("/tmp/keep$", "/tmp/keep"))
    assert(!patternMatches("/tmp/keep$", "/tmp/keepX"))
    assert(patternMatches("/a$b", "/a$b/c"))       // mid-$ is literal
  }

  test("decide: longest pattern wins, allow wins ties, no match allows") {
    val rules = Seq(
      Robots.Rule("/public/", allow = true),
      Robots.Rule("/public/private*", allow = false),
      Robots.Rule("/tmp/", allow = false),
      Robots.Rule("/tmp/keep$", allow = true))
    assert(Robots.decide("/public/a", rules) == (true, "/public/"))
    assert(Robots.decide("/public/private/x", rules) == (false, "/public/private*"))
    assert(Robots.decide("/tmp/keep", rules) == (true, "/tmp/keep$"))
    assert(Robots.decide("/tmp/keepX", rules) == (false, "/tmp/"))
    assert(Robots.decide("/free", rules) == (true, null))
    // length tie: allow is least restrictive (RFC 9309)
    val tie = Seq(Robots.Rule("/p/a", allow = false), Robots.Rule("/p/b", allow = true))
    assert(Robots.decide("/p/a", Seq(tie.head, Robots.Rule("/p/a", allow = true)))
      == (true, "/p/a"))
  }

  test("applyPolicy: per-host join, missing robots allows everything") {
    val robots = Seq(
      ("h1", robotsTxt),
      ("h2", "User-agent: *\nDisallow: /\nAllow: /ok/\n")
    ).toDF("host", "robots")
    val pages = Seq(
      ("h1", "/public/a"), ("h1", "/public/private/x"), ("h1", "/tmp/keep"),
      ("h2", "/ok/y"), ("h2", "/deny/z"),
      ("h3", "/anything") // no robots row
    ).toDF("host", "path")
    val r = Robots.applyPolicy(pages, "host", "path", robots, "host", "robots", "GraftBot")
      .orderBy("host", "path")
      .select("host", "path", "allowed", "matched_pattern").collect()
    assert(r.map(x => (x.getString(0), x.getString(1), x.getBoolean(2))).toSeq == Seq(
      ("h1", "/public/a", true), ("h1", "/public/private/x", false),
      ("h1", "/tmp/keep", true),
      ("h2", "/deny/z", false), ("h2", "/ok/y", true),
      ("h3", "/anything", true)))
    assert(r(5).isNullAt(3)) // no robots -> null pattern
  }
}
