package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReportingSpec extends SparkSpec {
  import spark.implicits._

  test("datasetCard: rollup cells hand-checked at every granularity") {
    val df = Seq(
      ("en", "web", 10L), ("en", "web", 20L), ("en", "book", 5L),
      ("de", "web", 7L)).toDF("lang", "source", "n")
    val r = Reporting.datasetCard(df, Seq("lang", "source"), Seq(("n", "sum_n")))
      .orderBy("gid", "lang", "source")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      // gid=0: finest (lang, source) cells
      ("de", "web", 0L, 1L, 7L),
      ("en", "book", 0L, 1L, 5L),
      ("en", "web", 0L, 2L, 30L),
      // gid=1: source rolled up (low bit = last dim)
      ("de", "(all)", 1L, 1L, 7L),
      ("en", "(all)", 1L, 3L, 35L),
      // gid=3: grand total
      ("(all)", "(all)", 3L, 4L, 42L)))
  }

  test("datasetCard: a genuinely-null dim value is NOT confused with a subtotal") {
    val df = Seq(("en", Some("web"), 1L), ("en", None, 2L))
      .toDF("lang", "source", "n")
    val r = Reporting.datasetCard(df, Seq("lang", "source"), Seq(("n", "sum_n")))
      .where(col("gid") === 0)
      .orderBy("source")
      .collect().map(x => (Option(x.getString(1)), x.getLong(4)))
    // the null-source row stays null at gid=0 (not relabeled '(all)')
    assert(r.toSeq == Seq((None, 2L), (Some("web"), 1L)))
    // and the source subtotal for lang=en exists separately with gid=1
    val sub = Reporting.datasetCard(df, Seq("lang", "source"), Seq(("n", "sum_n")))
      .where(col("gid") === 1).collect()
    assert(sub.length == 1 && sub(0).getString(1) == "(all)" &&
      sub(0).getLong(4) == 3L)
  }

  test("apportionBudget: quotas sum exactly to the budget, hand-checked remainders") {
    // W=10, budget=7: base = floor(7w/10) -> a:2(rem1) b:0(rem7) c:4(rem2)
    // spent=6, leftover=1 -> goes to b (largest remainder)
    val df = Seq(("a", 3L), ("b", 1L), ("c", 6L)).toDF("k", "w")
    val r = Reporting.apportionBudget(df, "k", "w", budget = 7L)
      .orderBy("k")
      .collect().map(x => (x.getString(0), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    assert(r.toSeq == Seq(("a", 2L, 1L, 2L), ("b", 0L, 7L, 1L), ("c", 4L, 2L, 4L)))
    assert(r.map(_._4).sum == 7L)
  }

  test("apportionBudget: remainder ties break to the smaller key; total always exact") {
    // W=4, budget=6: base = floor(6w/4): each w=1 -> base 1 rem 2 (all tied)
    // spent=4, leftover=2 -> first two keys alphabetically get +1
    val df = Seq(("d", 1L), ("b", 1L), ("c", 1L), ("a", 1L)).toDF("k", "w")
    val r = Reporting.apportionBudget(df, "k", "w", budget = 6L)
      .orderBy("k").collect().map(x => (x.getString(0), x.getLong(4)))
    assert(r.toSeq == Seq(("a", 2L), ("b", 2L), ("c", 1L), ("d", 1L)))
  }

  test("kAnonymize: small QI groups masked to '*', large ones pass; null QI masks too") {
    val df = Seq(
      (1L, Some("en"), "x"), (2L, Some("en"), "y"), (3L, Some("en"), "z"),
      (4L, Some("de"), "w"),
      (5L, None, "v")).toDF("id", "lang", "payload")
    val r = Reporting.kAnonymize(df, Seq("lang"), k = 2L)
      .orderBy("id")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getLong(3), x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (1L, "en", "x", 3L, false), (2L, "en", "y", 3L, false),
      (3L, "en", "z", 3L, false),
      (4L, "*", "w", 1L, true),
      // the single null-lang row is the MOST identifying — it must mask
      (5L, "*", "v", 1L, true)))
  }

  test("kAnonymize: multi-column QI — the COMBINATION must clear k, not each column") {
    val df = Seq((1L, "en", "a"), (2L, "en", "a"), (3L, "en", "b"))
      .toDF("id", "lang", "region")
    val r = Reporting.kAnonymize(df, Seq("lang", "region"), k = 2L)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getBoolean(4)))
    // lang=en appears 3x but (en, b) only once -> row 3 masks both QI cols
    assert(r.toSeq == Seq((1L, "en", "a", false), (2L, "en", "a", false),
      (3L, "*", "*", true)))
  }

  test("giniCoefficient: even -> 0, monopoly -> (n-1)/n, tie-order-free") {
    val even = Seq(("a", 1L), ("b", 1L), ("c", 1L), ("d", 1L)).toDF("k", "w")
    val re = Reporting.giniCoefficient(even, "k", "w").collect().head
    assert(re.getLong(0) == 4L && re.getLong(1) == 4L)
    assert(re.getDouble(2) == 0.0)
    val mono = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 10L)).toDF("k", "w")
    val rm = Reporting.giniCoefficient(mono, "k", "w").collect().head
    assert(rm.getDouble(2) == 2.0 * 40.0 / 40.0 - 5.0 / 4.0) // (n-1)/n
    // hand case with duplicate-key rows pre-aggregating: a=1+2=3, b=5
    val dup = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "w")
    val rd = Reporting.giniCoefficient(dup, "k", "w").collect().head
    // sorted [3,5]: S = 1*3 + 2*5 = 13; G = 26/16 - 3/2 = 0.125
    assert(rd.getDouble(2) == 2.0 * 13.0 / 16.0 - 3.0 / 2.0)
  }

  test("paretoCut: cross-multiplied threshold, crossing key included") {
    val df = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 5L),
      ("a", 0L)).toDF("host", "w") // duplicate key rows pre-aggregate
    val r = Reporting.paretoCut(df, "host", "w", 80L, 100L)
      .orderBy("rank").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getBoolean(5)))
    assert(r.toSeq == Seq(
      ("a", 50L, 1L, 50L, 0.50, true),   // before-cum 0 < 80
      ("b", 30L, 2L, 80L, 0.30, true),   // before-cum 50 < 80
      ("c", 15L, 3L, 95L, 0.15, false),  // before-cum 80: NOT < 80
      ("d", 5L, 4L, 100L, 0.05, false)))
    // weight ties rank by key asc, deterministically
    val t2 = Seq(("x", 10L), ("y", 10L)).toDF("host", "w")
    val rt = Reporting.paretoCut(t2, "host", "w", 50L, 100L)
      .orderBy("rank").collect().map(x => (x.getString(0), x.getBoolean(5)))
    assert(rt.toSeq == Seq(("x", true), ("y", false)))
  }

  test("simpsonDiversity: integer parts hand-checked; monoculture reads 1.0") {
    val df = Seq(("en", "s1"), ("en", "s1"), ("en", "s2"),
      ("de", "s1")).toDF("lang", "source")
    val r = Reporting.simpsonDiversity(df, "lang", "source")
      .orderBy("lang")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getDouble(4), x.getDouble(5)))
    // en: counts 2,1 -> n=3, sumsq=5, simpson=5/9, inv=9/5
    assert(r.toSeq == Seq(
      ("de", 1L, 1L, 1L, 1.0, 1.0),
      ("en", 3L, 2L, 5L, 5.0 / 9, 9.0 / 5)))
  }

  test("constraintReport: one row per check, exact metrics, pass verdicts") {
    val df = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, None, 30L),
      (3L, Some("d"), 40L)).toDF("id", "txt", "n")
    val r = Reporting.constraintReport(df, Seq(
        ("txt_complete", avg(col("txt").isNotNull.cast("double")), (m: org.apache.spark.sql.Column) => m === 1.0),
        ("id_unique", count_distinct(col("id")).cast("double") / count(lit(1)), (m: org.apache.spark.sql.Column) => m === 1.0),
        ("n_min", min(col("n")).cast("double"), (m: org.apache.spark.sql.Column) => m >= 1.0),
        ("n_max", max(col("n")).cast("double"), (m: org.apache.spark.sql.Column) => m <= 35.0)))
      .collect().map(x => (x.getString(0), x.getDouble(1), x.getBoolean(2))).toSeq
    assert(r == Seq(
      ("txt_complete", 0.75, false),
      ("id_unique", 0.75, false),
      ("n_min", 10.0, true),
      ("n_max", 40.0, false)))
  }

  test("crosstab: explicit value columns, zero-filled, exact counts") {
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"), ("s2", "en"))
      .toDF("source", "lang")
    val r = Reporting.crosstab(df, "source", "lang", Seq("en", "de", "fr"))
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("s1", 2L, 1L, 0L), ("s2", 1L, 0L, 0L)))
  }

  test("apportionBudget: zero budget and zero-weight keys") {
    val df = Seq(("a", 5L), ("z", 0L)).toDF("k", "w")
    val r0 = Reporting.apportionBudget(df, "k", "w", budget = 0L)
      .agg(sum("alloc")).collect()(0).getLong(0)
    assert(r0 == 0L)
    val r = Reporting.apportionBudget(df, "k", "w", budget = 9L)
      .orderBy("k").collect().map(x => (x.getString(0), x.getLong(4)))
    assert(r.toSeq == Seq(("a", 9L), ("z", 0L)))
  }

  test("dpCounts: seeded Laplace noise replays bit-exactly from (key, seed)") {
    val df = (Seq.fill(3)("a") ++ Seq.fill(5)("b")).toDF("k")
    val got = Reporting.dpCounts(df, Seq("k"), epsNum = 1L, epsDen = 2L,
        seed = "s1").orderBy("k").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    // independent replay of the whole chain in plain JVM arithmetic
    def expected(key: String, n: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((key + "\u0001" + "s1").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val rank = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val u = (rank.toDouble + 0.5) / 4294967296.0
      val b = 2.0 / 1.0
      val noise = (b * math.signum(u - 0.5)) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      n.toDouble - noise
    }
    assert(got.map(x => (x._1, x._2)).toSeq == Seq(("a", 3L), ("b", 5L)))
    assert(got(0)._3 == expected("a", 3L) && got(1)._3 == expected("b", 5L))
    assert(got.forall(_._4 == 0.5)) // epsilon = 1/2
    // determinism: a second run is identical; a new seed moves the noise
    val again = Reporting.dpCounts(df, Seq("k"), 1L, 2L, "s1").orderBy("k")
      .collect().map(_.getDouble(2))
    assert(again.toSeq == got.map(_._3).toSeq)
    val reseeded = Reporting.dpCounts(df, Seq("k"), 1L, 2L, "s2").orderBy("k")
      .collect().map(_.getDouble(2))
    assert(reseeded.toSeq != got.map(_._3).toSeq)
  }

  test("columnProfile: exact nulls/distincts/min/max per column, one row each") {
    val df = Seq((1L, Some("x"), 10L), (2L, None, 10L), (3L, Some("a"), 30L),
      (4L, Some("x"), 20L)).toDF("id", "s", "v")
    val r = Reporting.columnProfile(df, Seq("id", "s", "v")).orderBy("column")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getString(4), x.getString(5)))
    assert(r.toSeq == Seq(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "x"),   // null excluded from distinct & min/max
      ("v", 4L, 0L, 3L, "10", "30")))
  }
}
