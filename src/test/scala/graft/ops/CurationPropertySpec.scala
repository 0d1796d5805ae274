package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant checks for the curation operators over a seeded random corpus
  * (messy whitespace, empty docs, repeated tokens).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(2026)

  private def randomDoc(): String = {
    val n = rnd.nextInt(60)
    (0 until n).map { _ =>
      val tok = rnd.nextInt(6) match {
        case 0 => "the"
        case 1 => "tok" + rnd.nextInt(8)
        case _ => "w" + rnd.nextInt(1000)
      }
      val sep = rnd.nextInt(8) match {
        case 0 => "\n"
        case 1 => "  "
        case _ => " "
      }
      tok + sep
    }.mkString
  }

  private lazy val corpus =
    (0L until 150L).map(i => (i, if (i % 29 == 0) "" else randomDoc())).toDF("id", "text").cache()

  test("repetitionStats invariants: fraction bounds, distinct <= words, word lengths") {
    val r = Curation.repetitionStats(corpus, "text").collect()
    assert(r.length == 150)
    r.foreach { row =>
      val nw = row.getAs[Long]("n_words")
      val nd = row.getAs[Long]("n_distinct_words")
      val dwf = row.getAs[Double]("dup_word_frac")
      val mwl = row.getAs[Double]("mean_word_len")
      val dlf = row.getAs[Double]("dup_line_frac")
      assert(nd <= nw && nd >= 0)
      assert(dwf >= 0.0 && dwf <= 1.0, s"dup_word_frac $dwf")
      assert(dlf >= 0.0 && dlf <= 1.0, s"dup_line_frac $dlf")
      if (nw > 0) assert(mwl >= 1.0, s"non-empty words are >= 1 char, got $mwl")
      else assert(mwl == 0.0)
    }
  }

  test("passages invariants: dense numbering, window bound, full word coverage") {
    val window = 7
    val stride = 3
    val out = Curation.passages(corpus, "id", "text", window, stride)
      .collect().groupBy(_.getLong(0))
    val words = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq).toMap
    words.foreach { case (id, ws) =>
      val ps = out.getOrElse(id, Array.empty).sortBy(_.getLong(1))
      if (ws.isEmpty) assert(ps.isEmpty, s"doc $id: empty doc must yield no passages")
      else {
        val expected = (ws.length - 1) / stride + 1
        assert(ps.length == expected, s"doc $id: ${ps.length} passages, expected $expected")
        assert(ps.map(_.getLong(1)).toSeq == (0L until expected.toLong), s"doc $id numbering")
        val covered = ps.flatMap(_.getString(2).split(" ")).toSet
        assert(ws.toSet.subsetOf(covered), s"doc $id: every word must appear in some passage")
        ps.foreach { p =>
          val len = p.getString(2).split(" ").length
          assert(len <= window, s"doc $id passage ${p.getLong(1)}: $len > $window words")
        }
        // stride overlap: consecutive passages share window - stride words
        ps.sliding(2).foreach {
          case Array(p1, p2) =>
            val w1 = p1.getString(2).split(" ")
            val w2 = p2.getString(2).split(" ")
            if (w1.length == window)
              assert(w1.drop(stride).sameElements(w2.take(window - stride)),
                s"doc $id: overlap mismatch between ${p1.getLong(1)} and ${p2.getLong(1)}")
          case _ =>
        }
      }
    }
  }

  test("stratifiedSample monotone in rate: lower-rate sample is a subset") {
    val lo = Curation.stratifiedSample(corpus, "id", "text", Map.empty, defaultRate = 0.25)
      .select("id").as[Long].collect().toSet
    val hi = Curation.stratifiedSample(corpus, "id", "text", Map.empty, defaultRate = 0.5)
      .select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi), "thresholds are nested, so samples must be nested")
    assert(hi.size > lo.size, "higher rate keeps strictly more of a 150-row corpus")
  }

  test("dedupLines invariants: kept lines are a subsequence, counts consistent, global removal") {
    val out = Dedup.dedupLines(corpus, "id", "text").collect()
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // corpus-wide frequency of participating (non-empty) lines
    val freq = texts.values.toSeq.flatMap(_.split("\n", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size)
    out.foreach { row =>
      val id = row.getAs[Long]("id")
      val orig = texts(id).split("\n", -1).toSeq
      val kept = row.getAs[String]("text_dedup") match {
        case "" if row.getAs[Long]("n_lines_kept") == 0 => Seq.empty[String]
        case s => s.split("\n", -1).toSeq
      }
      assert(row.getAs[Long]("n_lines") == orig.length)
      assert(row.getAs[Long]("n_lines_kept") == kept.length)
      // kept is exactly the original minus corpus-common non-empty lines,
      // in original order (subsequence with per-line survival predicate)
      val expected = orig.filter(l => l.isEmpty || freq(l) <= 1)
      assert(kept == expected, s"doc $id: $kept != $expected")
    }
  }

  test("capPerKey invariants: per-key bound, subset, determinism under payload change") {
    val keyed = corpus.withColumn("k", (col("id") % 7).cast("string"))
    val out = Curation.capPerKey(keyed, "id", "k", 5)
    val perKey = out.groupBy("k").count().collect()
    perKey.foreach(r => assert(r.getLong(1) <= 5))
    val ids = out.select("id").as[Long].collect().toSet
    assert(ids.subsetOf(keyed.select("id").as[Long].collect().toSet))
    // the keeper set is a function of (id, key) only — payload is irrelevant
    val shuffledPayload = keyed.withColumn("text", reverse(col("text")))
    val ids2 = Curation.capPerKey(shuffledPayload, "id", "k", 5)
      .select("id").as[Long].collect().toSet
    assert(ids == ids2)
  }

  test("qualityFilter invariants: qf_keep iff no reasons, reasons consistent with signals") {
    val out = Curation.qualityFilter(corpus, "text", minWords = 10).collect()
    out.foreach { row =>
      val reasons = row.getAs[String]("qf_reasons")
      assert(row.getAs[Boolean]("qf_keep") == reasons.isEmpty)
      val nw = row.getAs[Long]("n_words")
      assert(reasons.contains("too_few_words") == (nw < 10))
      assert(reasons.contains("few_stopwords") ==
        (row.getAs[Long]("stopword_hits") < 2))
      assert(reasons.contains("low_alpha") ==
        (row.getAs[Double]("alpha_word_frac") < 0.80))
    }
  }

  test("exactIncremental == exact-survivors minus seen keys, on messy data") {
    val seen = corpus.where(col("id") % 3 === 0)
      .select(md5(col("text").cast("binary")).as("dup_key"))
    val inc = Dedup.exactIncremental(corpus, seen, "id", "text")
      .select("id").as[Long].collect().toSet
    val expected = Dedup.exact(corpus, "id", "text")
      .where(col("is_canonical"))
      .join(seen.withColumnRenamed("dup_key", "k"), col("dup_key") <=> col("k"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(inc == expected)
    assert(inc.nonEmpty, "corpus has unseen unique texts, so survivors exist")
  }
}
