package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pages.PageGen

class PageTableSpec extends SparkSpec {

  private lazy val path = {
    val dir = Files.createTempDirectory("pagetable").toString + "/pages"
    val pages = PageGen.pages(spark, PageGen.Config(urls = 40, revisitsPerUrl = 4, hotUrls = 2, hotFactor = 4)).toDF()
    PageTable.write(pages, dir, nBuckets = 8)
    dir
  }

  test("round-trip preserves rows; layout columns present") {
    val df = PageTable.read(spark, path)
    assert(df.count() == PageGen.totalRows(PageGen.Config(urls = 40, revisitsPerUrl = 4, hotUrls = 2, hotFactor = 4)))
    assert(df.columns.contains(PageTable.DayCol) && df.columns.contains(PageTable.BucketCol))
  }

  test("bucket pruning reaches the scan as a partition filter") {
    val someUrl = PageGen.urlOf(PageGen.Config(urls = 40), 7)
    val pruned = PageTable.readPruned(spark, path, urls = Seq(someUrl), nBuckets = 8)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(PageTable.BucketCol),
      s"bucket predicate must prune partitions:\n$plan")
    // correctness: only that url's rows, all revisits
    val got = pruned.select("url").distinct().collect().map(_.getString(0)).toSeq
    assert(got == Seq(someUrl))
    assert(pruned.count() == 4)
  }

  test("driver-side bucketOf agrees with the engine's xxhash64 bucket") {
    val engine = PageTable.read(spark, path)
      .select(col("url"), col(PageTable.BucketCol)).distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    engine.foreach { case (url, b) =>
      assert(PageTable.bucketOf(url, 8) == b, s"bucket mismatch for $url")
    }
  }

  test("bucketOf matches xxhash64 for non-ASCII urls (UTF-8 byte length)") {
    // multi-byte UTF-8: 2-byte (é), 3-byte (CJK), 4-byte (emoji), mixed
    val urls = Seq(
      "https://exämple.com/über/straße",
      "https://例え.テスト/ページ",
      "https://site.com/路径/文件?q=中文",
      "https://emoji.dev/🚀/🌍{idx}",
      "http://Ω.gr/φ/ψ-χ") ++ (0 until 50).map(i => s"https://mixed$i.com/日本語/p$i/é")
    import spark.implicits._
    val engine = urls.toDF("url")
      .select(col("url"), pmod(xxhash64(col("url")), lit(8)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    engine.foreach { case (url, b) =>
      assert(PageTable.bucketOf(url, 8) == b, s"bucket mismatch for non-ASCII url $url")
    }
  }

  test("day-range pruning filters partitions") {
    val all = PageTable.read(spark, path)
    val minDay = all.agg(min(col(PageTable.DayCol))).head().getInt(0)
    val pruned = PageTable.readPruned(spark, path, dayFrom = Some(minDay + 1))
    assert(pruned.count() < all.count())
    assert(pruned.agg(min(col(PageTable.DayCol))).head().getInt(0) >= minDay + 1)
  }

  test("mergeDelta upserts by (url, warc_ts) and rewrites ONLY touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pagetable_merge").toString + "/pages"
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    val base = (0 until 60).map(i =>
      (s"https://m$i.com/", ts(100 + i % 3), s"body$i")).toDF("url", "warc_ts", "text")
    PageTable.write(base, dir, nBuckets = 4)

    def fileState(): Map[String, Long] = {
      val root = new java.io.File(dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = fileState()

    // delta: replace url m0 at its existing ts (same partition), insert a
    // new revisit of m1 on a brand-new day (new partition)
    val delta = Seq(
      ("https://m0.com/", ts(100), "REPLACED"),
      ("https://m1.com/", ts(500), "NEWDAY")).toDF("url", "warc_ts", "text")
    PageTable.mergeDelta(spark, dir, delta, nBuckets = 4)

    val after = PageTable.read(spark, dir)
      .select($"url", $"warc_ts", $"text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    val expected = base.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2)))
      .filterNot(t => t._1 == "https://m0.com/" && t._2 == ts(100)).toSet ++
      Set(("https://m0.com/", ts(100), "REPLACED"),
        ("https://m1.com/", ts(500), "NEWDAY"))
    assert(after === expected)

    // untouched partitions keep their exact files; touched ones changed
    val newDayPart = s"${PageTable.DayCol}=500"
    val m0Part = s"${PageTable.DayCol}=100/${PageTable.BucketCol}=${PageTable.bucketOf("https://m0.com/", 4)}"
    val stateAfter = fileState()
    val untouchedBefore = before.filterNot(_._1.contains(m0Part))
    untouchedBefore.foreach { case (p, m) =>
      assert(stateAfter.get(p).contains(m), s"untouched partition file rewritten: $p")
    }
    assert(stateAfter.keys.exists(_.contains(newDayPart)), "new partition written")
    assert(before.keys.filter(_.contains(m0Part)) !=
      stateAfter.keys.filter(_.contains(m0Part)), "touched partition rewritten")
  }

  test("snapshots: time travel across appends and a replace; old versions frozen") {
    import spark.implicits._
    val dir = Files.createTempDirectory("snapshots").toString + "/t"
    val v1 = PageTable.writeSnapshot((1L to 10L).toDF("id"), dir)
    val v2 = PageTable.writeSnapshot((11L to 15L).toDF("id"), dir)
    assert(v1 == 1 && v2 == 2)
    assert(PageTable.latestSnapshotVersion(dir) == 2)
    // v1 is frozen at 10 rows; v2 sees the append; default = latest
    assert(PageTable.readSnapshot(spark, dir, 1).count() == 10L)
    assert(PageTable.readSnapshot(spark, dir, 2).count() == 15L)
    assert(PageTable.readSnapshot(spark, dir).count() == 15L)
    val v1ids = PageTable.readSnapshot(spark, dir, 1)
      .orderBy("id").as[Long].collect()
    assert(v1ids.toSeq == (1L to 10L))
    // replace: v3 starts fresh — and v1/v2 STILL read their old data
    val v3 = PageTable.writeSnapshot(Seq(99L).toDF("id"), dir, append = false)
    assert(v3 == 3 && PageTable.readSnapshot(spark, dir).count() == 1L)
    assert(PageTable.readSnapshot(spark, dir, 2).count() == 15L)
    assert(PageTable.readSnapshot(spark, dir, 1).count() == 10L)
    // no snapshots -> loud failure
    intercept[IllegalArgumentException] {
      PageTable.readSnapshot(spark,
        Files.createTempDirectory("empty").toString)
    }
  }
}
