package graft.pages

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style page row — the engine's mandated input shape
  * (BASELINE.json input_hint): (url, warc_ts, html, text, lang).
  */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Deterministic synthetic pages corpus (FIXTURES.md §1). Generation is
  * CLOSED-FORM per row id: `spark.range(n)` → map, so it scales to any size
  * with no driver-side data and no ordering dependence — the same id always
  * yields the same page at any parallelism (the property the two-cluster-size
  * scaling evidence relies on).
  *
  * Skew is built in: the first `hotUrls` urls get `hotFactor`× the revisits
  * of a normal url, standing in for hot domains (SURVEY.md §4.3 salting /
  * AQE skew-split exercise). Revisit gaps straddle the sessionization
  * threshold; payloads are DIMACS-CNF with whitespace/comment variation so
  * normalization and feature semantics are exercised verbatim.
  */
object PageGen {

  final case class Config(
      urls: Int = 1000,
      revisitsPerUrl: Int = 8,
      hotUrls: Int = 3,
      hotFactor: Int = 50,
      seed: Long = 42L,
      /** sessionization gap threshold the ts gaps straddle */
      sessionGapHours: Int = 6,
      /** payload weight: multiplies clause count (docScale 8 ~ 2-3 KB docs) */
      docScale: Int = 1,
      langs: Seq[String] = Seq("en", "en", "en", "de", "fr", "zz"))

  /** Total rows for a config (hot urls carry hotFactor x revisits). */
  def totalRows(cfg: Config): Long =
    cfg.hotUrls.toLong * cfg.revisitsPerUrl * cfg.hotFactor +
      (cfg.urls - cfg.hotUrls).toLong * cfg.revisitsPerUrl

  // -- splitmix64: tiny, high-quality, allocation-free per-row RNG --------
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  @inline private def rng(seed: Long, a: Long, b: Long, c: Long): Long =
    mix64(mix64(mix64(seed ^ a) ^ b) ^ c)
  @inline private def bounded(r: Long, n: Int): Int = (((r >>> 1) % n).toInt)

  private val epochMs = 1577836800000L // 2020-01-01T00:00:00Z

  /** Decompose a row id into (urlIdx, revisit) under the two-tier layout. */
  def decompose(cfg: Config, id: Long): (Int, Int) = {
    val hotRevisits = cfg.revisitsPerUrl.toLong * cfg.hotFactor
    val hotTotal = cfg.hotUrls * hotRevisits
    if (id < hotTotal) ((id / hotRevisits).toInt, (id % hotRevisits).toInt)
    else {
      val j = id - hotTotal
      (cfg.hotUrls + (j / cfg.revisitsPerUrl).toInt, (j % cfg.revisitsPerUrl).toInt)
    }
  }

  def urlOf(cfg: Config, urlIdx: Int): String = {
    val host = urlIdx % 97
    s"https://host$host.example/p$urlIdx"
  }

  /** warc_ts of a (url, revisit): strictly increasing per url, gaps drawn
    * around the session threshold (some g/3, some 3g).
    */
  def tsOf(cfg: Config, urlIdx: Int, revisit: Int): Long = {
    val gapMs = cfg.sessionGapHours * 3600_000L
    var t = epochMs + bounded(rng(cfg.seed, urlIdx, -1, 7), 86_400_000)
    var r = 0
    while (r < revisit) {
      val roll = bounded(rng(cfg.seed, urlIdx, r, 13), 6)
      val gap = roll match {
        case 0 | 1 | 2 => gapMs / 3 + bounded(rng(cfg.seed, urlIdx, r, 17), (gapMs / 3).toInt) // intra-session
        case 3 | 4 => 3 * gapMs + bounded(rng(cfg.seed, urlIdx, r, 19), gapMs.toInt) // new session
        case _ => gapMs / 6 + 1
      }
      t += gap
      r += 1
    }
    t
  }

  /** Deterministic DIMACS-CNF payload for (urlIdx, revisit): the content
    * drifts over revisits (some revisits identical to the previous one, for
    * dedup exercises), with whitespace/comment/duplicate-literal variation.
    */
  def textOf(cfg: Config, urlIdx: Int, revisit: Int): String = {
    // ~30% of revisits repeat the previous content version (exact-dup rows)
    var version = 0
    var r = 1
    while (r <= revisit) {
      if (bounded(rng(cfg.seed, urlIdx, r, 23), 10) >= 3) version += 1
      r += 1
    }
    val base = rng(cfg.seed, urlIdx, version, 29)
    val nVars = (3 + bounded(base, 18)) * math.max(1, math.min(cfg.docScale, 4))
    val nClauses = (4 + bounded(mix64(base), 40)) * math.max(1, cfg.docScale)
    val sb = new java.lang.StringBuilder(nClauses * 12 + 64)
    if (bounded(mix64(base ^ 2), 4) == 0) sb.append("c synthetic page ").append(urlIdx).append(" v").append(version).append('\n')
    sb.append("p cnf ").append(nVars).append(' ').append(nClauses).append('\n')
    var ci = 0
    while (ci < nClauses) {
      val cr = rng(cfg.seed, base, version.toLong << 20 | ci.toLong, 31)
      val len = 1 + bounded(cr, 5)
      var li = 0
      var rr = cr
      while (li < len) {
        rr = mix64(rr)
        val v = 1 + bounded(rr, nVars)
        val neg = (rr & 1L) == 1L
        if (neg) sb.append('-')
        sb.append(v)
        // occasional duplicate literal / extra whitespace
        if (bounded(mix64(rr ^ 5), 23) == 0) { sb.append(' '); if (neg) sb.append('-'); sb.append(v) }
        sb.append(if (bounded(mix64(rr ^ 7), 11) == 0) "  " else " ")
        li += 1
      }
      sb.append("0\n")
      ci += 1
    }
    sb.toString
  }

  def htmlOf(text: String): Array[Byte] =
    ("<html><body><pre>" + text + "</pre></body></html>").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def langOf(cfg: Config, urlIdx: Int): String =
    cfg.langs(bounded(rng(cfg.seed, urlIdx, -2, 37), cfg.langs.size))

  def pageOf(cfg: Config, id: Long): Page = {
    val (urlIdx, revisit) = decompose(cfg, id)
    val text = textOf(cfg, urlIdx, revisit)
    Page(urlOf(cfg, urlIdx), new Timestamp(tsOf(cfg, urlIdx, revisit)), htmlOf(text), text, langOf(cfg, urlIdx))
  }

  /** Distributed generation: one narrow map over spark.range — no shuffle,
    * no driver data; partitions scale with parallelism.
    */
  def pages(spark: SparkSession, cfg: Config = Config(), numPartitions: Option[Int] = None): Dataset[Page] = {
    import spark.implicits._
    val n = totalRows(cfg)
    val range = numPartitions.fold(spark.range(n))(p => spark.range(0, n, 1, p))
    range.map(id => pageOf(cfg, id))
  }
}
