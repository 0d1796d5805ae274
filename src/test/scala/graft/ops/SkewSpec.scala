package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // one hot key with 10k rows, 50 cold keys
    ((0 until 10000).map(i => ("hot", i.toLong, i * 1.5)) ++
      (0 until 50).flatMap(k => (0 until 10).map(i => (s"cold$k", i.toLong, i * 2.0))))
      .toDF("key", "v", "x")
  }

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy($"key")
      .agg(count(lit(1)).as("c"), sum($"x").cast("decimal(20,4)").as("sx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val salted = Skew.saltedAgg(skewed, Seq("key"), 16)(
      partial = g => g.agg(count(lit(1)).as("c"), sum($"x".cast("decimal(20,4)")).as("sx")),
      merge = g => g.agg(sum($"c").as("c"), sum($"sx").cast("decimal(20,4)").as("sx")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(salted == plain)
  }

  test("salt actually spreads the hot key across buckets") {
    val buckets = skewed.where($"key" === "hot")
      .select(Skew.saltCol(16, $"v", $"x").as("s"))
      .distinct().count()
    assert(buckets >= 12, s"hot key only hit $buckets of 16 salt buckets")
  }

  test("saltedJoin equals the plain equi-join; hot key spreads across salts") {
    val probe = skewed.withColumnRenamed("v", "pid") // (key, pid, x)
    val build = (Seq(("hot", 100L)) ++ (0 until 50).map(k => (s"cold$k", k.toLong)))
      .toDF("key", "dim")
    val plain = probe.join(build, Seq("key"))
      .select($"key", $"pid", $"dim")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(probe, build, Seq("key"), "pid", salt = 8)
      .select($"key", $"pid", $"dim")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain && plain.nonEmpty)
    val spread = probe.where($"key" === "hot")
      .select(Skew.saltCol(8, $"pid").as("s")).distinct().count()
    assert(spread == 8L, s"hot probe rows hit only $spread of 8 salts")
  }

  test("keyProfile reports hot keys") {
    val profile = Skew.keyProfile(skewed, Seq("key"), "v").collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("rows"))).toMap
    assert(profile("hot") == 10000L && profile("cold0") == 10L)
  }

  test("skewReport: hand-computed Gini, top key, suggested salt") {
    // counts a=4 b=2 c=1 d=1: T=8 K=4, ranked-asc S = 1+2+6+16 = 25,
    // G = 50/32 - 5/4 = 0.3125; salt = ceil(4*4/8) = 2
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")).toDF("k")
    val r = Skew.skewReport(df, Seq("k")).collect().head
    assert(r.getLong(r.fieldIndex("n_rows")) == 8L)
    assert(r.getLong(r.fieldIndex("n_keys")) == 4L)
    assert(r.getString(r.fieldIndex("max_key")) == "a")
    assert(r.getLong(r.fieldIndex("max_n")) == 4L)
    assert(r.getDouble(r.fieldIndex("top_share")) == 0.5)
    assert(r.getDouble(r.fieldIndex("gini")) == 0.3125)
    assert(r.getLong(r.fieldIndex("suggested_salt")) == 2L)
  }

  test("skewReport: uniform counts give Gini 0 and salt 1") {
    // the tied-count block path: one count-of-counts row carries all keys
    val df = Seq("a", "a", "b", "b", "c", "c").toDF("k")
    val r = Skew.skewReport(df, Seq("k")).collect().head
    assert(r.getDouble(r.fieldIndex("gini")) == 0.0)
    assert(r.getLong(r.fieldIndex("suggested_salt")) == 1L)
    assert(r.getString(r.fieldIndex("max_key")) == "c") // largest key breaks ties
  }

  test("joinSizeEstimate: exact per-key products, topN cut, '*' total row") {
    val left = (Seq.fill(2)("a") ++ Seq("b") ++ Seq.fill(3)("c")).toDF("k")
    val right = (Seq.fill(3)("a") ++ Seq.fill(5)("b") ++ Seq("d")).toDF("k")
    val all = Skew.joinSizeEstimate(left, right, "k", topN = 10)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSet
    // matched keys: a (2x3=6), b (1x5=5); c/d unmatched; total = 11
    assert(all == Set(("a", 2L, 3L, 6L), ("b", 1L, 5L, 5L), ("*", 2L, 2L, 11L)))
    val top1 = Skew.joinSizeEstimate(left, right, "k", topN = 1)
      .collect().map(_.getString(0)).toSet
    assert(top1 == Set("a", "*")) // biggest contributor + the total row
    // disjoint keys: only the zero total row
    val none = Skew.joinSizeEstimate(Seq("x").toDF("k"), Seq("y").toDF("k"), "k")
      .collect().map(x => (x.getString(0), x.getLong(3)))
    assert(none.toSeq == Seq(("*", 0L)))
  }

  test("bloomSemiJoin: exactly the semi-join at any filter size, even fp-heavy") {
    val probe = (0L until 300L).map(i => (i, s"p$i")).toDF("id", "v")
    val build = (0L until 300L by 7L).map(i => (i, "x")).toDF("id", "b")
    val expect = probe.join(build.select("id").distinct(), Seq("id"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    // roomy filter (fp ~ 0) and a deliberately tiny, collision-heavy one:
    // false positives MUST be scrubbed by the exact pass either way
    for (m <- Seq(1 << 16, 64)) {
      val got = Skew.bloomSemiJoin(probe, build, "id", mBits = m, k = 3)
        .collect().map(_.getLong(0)).toSet
      assert(got == expect, s"mBits=$m")
    }
    // the bloom prefilter is present in the plan (a runtime filter below
    // the exact join), and output columns are the probe's
    val df = Skew.bloomSemiJoin(probe, build, "id")
    assert(df.columns.toSeq == Seq("id", "v"))
    assert(df.queryExecution.executedPlan.toString.contains("bloom_contains"))
  }
}
