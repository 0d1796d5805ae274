package graft.runtime

import java.nio.file.Files

import graft.SparkSpec
import graft.pages.PageGen

class ResumeSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft_resume").toString

  private lazy val pages = PageGen.pages(spark,
    PageGen.Config(urls = 60, revisitsPerUrl = 4, hotUrls = 2, hotFactor = 6)).toDF()

  test("full run writes every shard with manifest + metrics") {
    val out = freshDir()
    val cfg = FeatureJob.Config(outDir = out, shards = 4)
    val report = FeatureJob.run(spark, pages, cfg)
    assert(report.processedShards == (0 until 4))
    assert(report.skippedShards.isEmpty)
    val fp = FeatureJob.fingerprint(pages)
    val manifest = Manifest.completed(out, fp)
    assert(manifest.keySet == (0 until 4).toSet)
    assert(manifest.values.map(_.rowCount).sum == PageGen.totalRows(PageGen.Config(urls = 60, revisitsPerUrl = 4, hotUrls = 2, hotFactor = 6)))
    assert(Files.exists(java.nio.file.Paths.get(out, "metrics.json")))
    // second run is a no-op: everything resumes
    val report2 = FeatureJob.run(spark, pages, cfg)
    assert(report2.processedShards.isEmpty && report2.skippedShards == (0 until 4))
  }

  test("kill-after-k-shards resume yields identical output, each shard once") {
    val cfgBase = PageGen.Config(urls = 40, revisitsPerUrl = 3, hotUrls = 1, hotFactor = 5)
    val p = PageGen.pages(spark, cfgBase).toDF()

    // reference: uninterrupted run
    val outRef = freshDir()
    FeatureJob.run(spark, p, FeatureJob.Config(outDir = outRef, shards = 4))

    // crashed run: simulate kill by truncating the manifest to 2 shards
    val outCrash = freshDir()
    FeatureJob.run(spark, p, FeatureJob.Config(outDir = outCrash, shards = 4))
    Manifest.truncate(outCrash, keepShards = Set(0, 1))
    val resumed = FeatureJob.run(spark, p, FeatureJob.Config(outDir = outCrash, shards = 4))
    assert(resumed.processedShards == Seq(2, 3), s"resume must process only missing shards, got ${resumed.processedShards}")
    assert(resumed.skippedShards == Seq(0, 1))

    // byte-level equality of the final tables (order-free compare)
    import org.apache.spark.sql.functions.col
    def canon(path: String) = {
      val df = spark.read.parquet(path).drop("shard")
      df.select(df.columns.sorted.map(col): _*).collect().map(_.toString).sorted
    }
    val sa = canon(s"$outRef/data")
    val sb = canon(s"$outCrash/data")
    assert(sa.sameElements(sb), "resumed output must equal uninterrupted output")

    // manifests agree on checksums per shard
    val fp = FeatureJob.fingerprint(p)
    val ma = Manifest.completed(outRef, fp)
    val mb = Manifest.completed(outCrash, fp)
    assert(ma.view.mapValues(e => (e.rowCount, e.checksum)).toMap ==
      mb.view.mapValues(e => (e.rowCount, e.checksum)).toMap)
  }

  test("full run reads the input exactly once (recordsRead == input rows)") {
    val dir = freshDir()
    val cfgBase = PageGen.Config(urls = 50, revisitsPerUrl = 3, hotUrls = 1, hotFactor = 4)
    PageGen.pages(spark, cfgBase).toDF().write.parquet(s"$dir/pages")
    val input = spark.read.parquet(s"$dir/pages")
    val out = s"$dir/out"
    FeatureJob.run(spark, input, FeatureJob.Config(outDir = out, shards = 4))
    val metrics = new String(Files.readAllBytes(java.nio.file.Paths.get(out, "metrics.json")))
    val recordsRead = """"recordsRead":(\d+)""".r.findFirstMatchIn(metrics).get.group(1).toLong
    val n = PageGen.totalRows(cfgBase)
    assert(recordsRead >= n, s"input must be fully scanned: $recordsRead < $n")
    assert(recordsRead <= (n * 1.2).toLong,
      s"recordsRead $recordsRead indicates repeated input scans for $n input rows " +
        "(round-1 per-shard loop read it O(shards) times)")
  }

  test("stale manifest (input changed) triggers reprocessing") {
    val out = freshDir()
    val p1 = PageGen.pages(spark, PageGen.Config(urls = 10, revisitsPerUrl = 2, hotUrls = 1, hotFactor = 2)).toDF()
    FeatureJob.run(spark, p1, FeatureJob.Config(outDir = out, shards = 2))
    val p2 = PageGen.pages(spark, PageGen.Config(urls = 12, revisitsPerUrl = 2, hotUrls = 1, hotFactor = 2)).toDF()
    val r = FeatureJob.run(spark, p2, FeatureJob.Config(outDir = out, shards = 2))
    assert(r.processedShards == Seq(0, 1), "different input fingerprint must not resume")
  }

  test("rewritten same-path parquet input invalidates the resume fingerprint") {
    // the fingerprint folds (path, length, mtime) from the file index: a
    // same-named parquet rewritten with different content must NOT resume
    // over stale outputs (a path-only fingerprint would)
    val dir = freshDir()
    def writeGen(urls: Int): Unit =
      PageGen.pages(spark, PageGen.Config(urls = urls, revisitsPerUrl = 2, hotUrls = 1, hotFactor = 2))
        .toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/pages")
    writeGen(10)
    val fp1 = FeatureJob.fingerprint(spark.read.parquet(s"$dir/pages"))
    val out = s"$dir/out"
    FeatureJob.run(spark, spark.read.parquet(s"$dir/pages"),
      FeatureJob.Config(outDir = out, shards = 2))
    writeGen(14) // same directory, different content (and file length)
    val reread = spark.read.parquet(s"$dir/pages")
    val fp2 = FeatureJob.fingerprint(reread)
    assert(fp1 != fp2, "rewritten content must change the fingerprint")
    val r = FeatureJob.run(spark, reread, FeatureJob.Config(outDir = out, shards = 2))
    assert(r.processedShards == Seq(0, 1), "stale manifest must not be resumed from")
  }

  test("empty todo shard truncates its stale directory (dynamic overwrite gap)") {
    // Run 1 populates both shard dirs. Run 2 has a DIFFERENT fingerprint
    // (all shards todo) but its input only reaches shard 0 — dynamic
    // partition overwrite alone would leave run 1's _shard=1 files on disk
    // while the manifest said rows=0; the pre-delete must clear them.
    val out = freshDir()
    val p1 = PageGen.pages(spark, PageGen.Config(urls = 20, revisitsPerUrl = 2, hotUrls = 1, hotFactor = 2)).toDF()
    FeatureJob.run(spark, p1, FeatureJob.Config(outDir = out, shards = 2))
    val p2full = PageGen.pages(spark, PageGen.Config(urls = 21, revisitsPerUrl = 2, hotUrls = 1, hotFactor = 2)).toDF()
    val p2 = p2full.where(FeatureJob.shardCol(2) === 0)
    val r = FeatureJob.run(spark, p2, FeatureJob.Config(outDir = out, shards = 2))
    assert(r.processedShards == Seq(0, 1))
    val written = spark.read.parquet(s"$out/data")
    val expected = FeatureJob.pipeline(
      p2.withColumn("_shard", FeatureJob.shardCol(2)),
      FeatureJob.Config(outDir = "unused"))
    assert(written.count() == expected.count(), "stale rows from run 1 must not survive")
    assert(written.where(org.apache.spark.sql.functions.col("_shard") === 1).count() == 0)
  }

  test("pipeline output carries identity, features, status, sessions, deltas") {
    val out = FeatureJob.pipeline(pages, FeatureJob.Config(outDir = "unused"))
    val cols = out.columns.toSet
    for (c <- Seq("url", "warc_ts", "instance_id", "features", "status", "session_no", "session_id",
      "clauses_prev", "clauses_delta", "variables_delta"))
      assert(cols.contains(c), s"missing column $c")
    val statuses = out.select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("ok"), s"synthetic corpus must parse clean, got $statuses")
  }

  test("over-budget document gets status=limit (resource envelope), normal docs unaffected") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1700000000000L)
    val big = "c big\np cnf 3 1\n" + ("1 -2 3 0\n" * 500) // ~5 KB, over a 1000-byte budget
    val pages = Seq(
      graft.pages.Page("http://ok.example", ts, Array.emptyByteArray, "p cnf 2 1\n1 -2 0\n", "en"),
      graft.pages.Page("http://big.example", ts, Array.emptyByteArray, big, "en"),
      graft.pages.Page("http://bad.example", ts, Array.emptyByteArray, "p cnf 1 1\nnot a clause\n", "en"))
      .toDS().toDF()
    val out = FeatureJob.pipeline(pages,
      FeatureJob.Config(outDir = "unused", maxDocBytes = 1000))
      .select("url", "status", "instance_id").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.isNullAt(2))).toMap
    assert(out("http://ok.example") == ("ok", false))
    assert(out("http://big.example") == ("limit", true),
      "over-budget doc must complete the stage with a structured limit status")
    assert(out("http://bad.example") == ("parse_error", true))
  }

  test("manifest parses the legacy wallMs wire format (no silent recompute on upgrade)") {
    val legacy = """{"shard":3,"rowCount":42,"checksum":-7,"outputPath":"/x/_shard=3",""" +
      """"inputFingerprint":"abc-f1","wallMs":1234,"completedAtMs":99}"""
    val e = Manifest.fromJson(legacy)
    assert(e.contains(Manifest.Entry(3, 42L, -7L, "/x/_shard=3", "abc-f1", 1234L, 99L)))
    // round trip of the CURRENT format still parses
    val cur = Manifest.Entry(1, 2L, 3L, "/y", "fp", 4L, 5L)
    assert(Manifest.fromJson(Manifest.toJson(cur)).contains(cur))
  }

  test("FeatureJob.run over an xz-compressed corpus equals the plain-corpus run (codec=auto)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{BinaryType, StructType}
    def xz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.tukaani.xz.XZOutputStream(bos, new org.tukaani.xz.LZMA2Options())
      out.write(b); out.finish(); out.close()
      bos.toByteArray
    }
    val plain = PageGen.pages(spark,
      PageGen.Config(urls = 30, revisitsPerUrl = 3, hotUrls = 1, hotFactor = 3)).toDF()
    // same corpus with the text column as compressed BINARY payloads —
    // the shape real gbd corpora (.cnf.xz blobs) arrive in
    val compRows = plain.collect().map { r =>
      org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2),
        xz(r.getString(3).getBytes("UTF-8")), r.get(4))
    }
    val compSchema = StructType(plain.schema.map(f =>
      if (f.name == "text") f.copy(dataType = BinaryType) else f))
    val comp = spark.createDataFrame(
      spark.sparkContext.parallelize(compRows.toIndexedSeq, 4), compSchema)
    val outA = freshDir(); val outB = freshDir()
    FeatureJob.run(spark, plain, FeatureJob.Config(outDir = outA, shards = 2))
    FeatureJob.run(spark, comp, FeatureJob.Config(outDir = outB, shards = 2,
      codec = graft.core.Compression.Auto))
    def canon(path: String) = {
      val df = spark.read.parquet(path).drop("shard")
      df.select(df.columns.sorted.map(col): _*).collect().map(_.toString).sorted
    }
    assert(canon(s"$outA/data").sameElements(canon(s"$outB/data")),
      "compressed-corpus output must be byte-identical to the plain run")
    val statuses = spark.read.parquet(s"$outB/data")
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("ok"))
  }

  test("temporal stage plan: exactly one exchange + one sort feed all windows") {
    val plan = FeatureJob.pipeline(pages, FeatureJob.Config(outDir = "unused"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"window stage must reuse ONE exchange, got $exchanges:\n$plan")
    val sorts = "\\bSort\\b".r.findAllIn(plan).length
    assert(sorts <= 1, s"window stage must reuse one sort, got $sorts")
  }
}
