package graft.ops

import org.apache.spark.sql.functions.{col, lit}
import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("quantilesDisc: element rule max(1, ceil(q*n)), hand-checked") {
    // group a: n=4 sorted [10,20,30,40]; group b: n=3 sorted [5,6,7]
    val df = Seq(("a", 40L), ("a", 10L), ("a", 30L), ("a", 20L),
      ("b", 7L), ("b", 5L), ("b", 6L)).toDF("k", "v")
    val r = Stats.quantilesDisc(df, Seq("k"), "v", Seq(0.25, 0.5, 0.75, 1.0))
      .orderBy("k", "q")
      .collect().map(x => (x.getString(0), x.getDouble(1), x.getLong(2)))
    assert(r.toSeq == Seq(
      ("a", 0.25, 10L), ("a", 0.5, 20L), ("a", 0.75, 30L), ("a", 1.0, 40L),
      ("b", 0.25, 5L), ("b", 0.5, 6L), ("b", 0.75, 7L), ("b", 1.0, 7L)))
  }

  test("quantilesDisc: q=0 clamps to the minimum; single-row group returns itself everywhere") {
    val df = Seq(("a", 9L), ("a", 1L), ("s", 42L)).toDF("k", "v")
    val r = Stats.quantilesDisc(df, Seq("k"), "v", Seq(0.0, 0.5))
      .orderBy("k", "q")
      .collect().map(x => (x.getString(0), x.getDouble(1), x.getLong(2)))
    assert(r.toSeq == Seq(("a", 0.0, 1L), ("a", 0.5, 1L), ("s", 0.0, 42L), ("s", 0.5, 42L)))
  }

  test("quantilesDisc: result is always an actual group element under ties") {
    val df = Seq.tabulate(10)(i => ("t", (i / 3).toLong)).toDF("k", "v") // 0,0,0,1,1,1,2,2,2,3
    val vals = Stats.quantilesDisc(df, Seq("k"), "v", Seq(0.25, 0.5, 0.75))
      .select("v_q").as[Long].collect().toSet
    assert(vals.subsetOf(Set(0L, 1L, 2L, 3L)))
  }

  test("binByQuantiles: quartile bins, hand-checked; group minimum lands in bin 0") {
    // group a sorted: [10,20,30,40] -> thresholds q25=10, q50=20, q75=30
    // bins (strict >): 10->0, 20->1, 30->2, 40->3
    val df = Seq(("a", 1L, 40L), ("a", 2L, 10L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("b", 5L, 7L)).toDF("k", "id", "v")
    val r = Stats.binByQuantiles(df, Seq("k"), "v", Seq(0.25, 0.5, 0.75))
      .orderBy("id")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((1L, 40L, 3L), (2L, 10L, 0L), (3L, 30L, 2L),
      (4L, 20L, 1L), (5L, 7L, 0L))) // singleton group: its own value, bin 0
  }

  test("binByQuantiles: bins match the brute-force rank definition on random-ish data") {
    val df = Seq.tabulate(97)(i => (s"k${i % 3}", i.toLong, ((i * 37) % 101).toLong))
      .toDF("k", "id", "v")
    val qs = Seq(0.25, 0.5, 0.75)
    val th = Stats.quantilesDisc(df, Seq("k"), "v", qs)
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sorted).toMap
    val expected = df.collect()
      .map(x => (x.getLong(1), th(x.getString(0)).count(_ < x.getLong(2)).toLong))
      .toMap
    val got = Stats.binByQuantiles(df, Seq("k"), "v", qs)
      .collect().map(x => (x.getLong(1), x.getLong(3))).toMap
    assert(got == expected)
  }

  test("binByQuantiles: carries every input column and is partitioning-independent") {
    val df = Seq.tabulate(30)(i => (s"k${i % 2}", i.toLong, i.toLong % 7, s"p$i"))
      .toDF("k", "id", "v", "payload")
    val out = Stats.binByQuantiles(df, Seq("k"), "v", Seq(0.5))
    assert(out.columns.toSeq == Seq("k", "id", "v", "payload", "v_bin"))
    val a = out.orderBy("id").collect().toSeq
    val b = Stats.binByQuantiles(df.repartition(7), Seq("k"), "v", Seq(0.5))
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("madOutliers: hand-checked med/mad, robust to the heavy tail, k boundary strict") {
    // group a: values [10,10,12,14,1000] -> med=12 (pos ceil(2.5)=3),
    // absdev sorted [0,2,2,2,988] -> mad=2; k=2 -> boundary 4:
    // 1000 (dev 988) flags; 10/14 (dev 2) do not; 12 (dev 0) does not
    val df = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 12L),
      ("a", 4L, 14L), ("a", 5L, 1000L),
      // group b: all equal -> mad=0, no row deviates, none flag
      ("b", 6L, 7L), ("b", 7L, 7L),
      // group c: mad=0 with ONE deviator -> it must flag (no-spread rule)
      ("c", 8L, 5L), ("c", 9L, 5L), ("c", 10L, 6L)).toDF("k", "id", "v")
    val r = Stats.madOutliers(df, Seq("k"), "v", k = 2L)
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("med"), x.getAs[Long]("abs_dev"), x.getAs[Long]("mad"),
          x.getAs[Boolean]("is_outlier"))).toMap
    assert(r(5L) == ((12L, 988L, 2L, true)))
    assert(r(1L) == ((12L, 2L, 2L, false)) && r(4L) == ((12L, 2L, 2L, false)))
    assert(r(3L) == ((12L, 0L, 2L, false)))
    assert(r(6L) == ((7L, 0L, 0L, false)) && r(7L) == ((7L, 0L, 0L, false)))
    assert(r(10L) == ((5L, 1L, 0L, true)), "mad=0 group must flag any deviation")
    // the median itself is untouched by the 1000 outlier (robustness claim)
    assert(r(5L)._1 == 12L)
  }

  test("madOutliers: carries input columns and is partitioning-independent") {
    val df = Seq.tabulate(40)(i => (s"k${i % 3}", i.toLong, (i * i).toLong % 23, s"p$i"))
      .toDF("k", "id", "v", "payload")
    val a = Stats.madOutliers(df, Seq("k"), "v").orderBy("id").collect().toSeq
    val b = Stats.madOutliers(df.repartition(11), Seq("k"), "v")
      .orderBy("id").collect().toSeq
    assert(a == b)
    assert(a.head.schema.fieldNames.toSeq ==
      Seq("k", "id", "v", "payload", "med", "abs_dev", "mad", "is_outlier"))
  }

  test("percentileRank: hand-checked ranks per group, ties broken by id, pct = rank/n") {
    val df = Seq(("en", 1L, 30L), ("en", 2L, 10L), ("en", 3L, 30L), ("en", 4L, 20L),
      ("de", 5L, 7L)).toDF("lang", "id", "len")
    val r = Stats.percentileRank(df, Seq("lang"), "len", tieBreak = Seq("id"))
      .orderBy("id")
      .collect().map(x => (x.getLong(1), x.getLong(3), x.getLong(4), x.getDouble(5)))
    // en sorted (len, id): (10,2) (20,4) (30,1) (30,3) -> ranks 1..4
    assert(r.toSeq == Seq(
      (1L, 3L, 4L, 0.75), (2L, 1L, 4L, 0.25), (3L, 4L, 4L, 1.0),
      (4L, 2L, 4L, 0.5), (5L, 1L, 1L, 1.0)))
  }

  test("percentileRank: repartition-stable; top-x selection keeps an exact count") {
    val df = (1L to 40L).map(i => ("k", i, (i * 17) % 23)).toDF("g", "id", "v")
    val a = Stats.percentileRank(df, Seq("g"), "v", Seq("id"))
      .select("id", "rank").as[(Long, Long)].collect().toSet
    val b = Stats.percentileRank(df.repartition(7), Seq("g"), "v", Seq("id"))
      .select("id", "rank").as[(Long, Long)].collect().toSet
    assert(a == b)
    val kept = Stats.percentileRank(df, Seq("g"), "v", Seq("id"))
      .where(col("pct_rank") > 0.75).count()
    assert(kept == 10L) // exactly the top quarter, despite value ties
  }

  test("zipfTable: exact counts, (freq desc, word asc) rank order, ratio to rank-1") {
    val df = Seq("x y", "y X", "z", "x").toDF("text") // x=3 (case-fold), y=2, z=1
    val r = Stats.zipfTable(df, "text", topN = 3).orderBy("rank")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      (1L, "x", 3L, 3L, 1.0),
      (2L, "y", 2L, 4L, 2.0 / 3),
      (3L, "z", 1L, 3L, 1.0 / 3)))
  }

  test("zipfTable: topN cut is deterministic on frequency ties (word asc)") {
    val df = Seq("b a", "a b", "c").toDF("text") // a=2, b=2, c=1
    val r = Stats.zipfTable(df, "text", topN = 2)
      .select("rank", "word").as[(Long, String)].collect().toSeq.sorted
    assert(r == Seq((1L, "a"), (2L, "b")))
    // repartition-stable
    val r2 = Stats.zipfTable(df.repartition(5), "text", topN = 2)
      .select("rank", "word").as[(Long, String)].collect().toSeq.sorted
    assert(r2 == r)
  }

  // ---- exact-integer binary-classifier evaluation ----

  /** Brute-force pair-counting AUC in PPM (floor), the textbook
    * definition binaryEval's rank-sum must agree with.
    */
  private def bruteAucPpm(rows: Seq[(Long, Int)]): Long = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    var num2 = BigInt(0) // doubled: 2 per concordant pair, 1 per tie
    for (p <- pos; n <- neg) {
      if (p > n) num2 += 2 else if (p == n) num2 += 1
    }
    ((num2 * 1000000) / (BigInt(2) * pos.size * neg.size)).toLong
  }

  test("binaryEval: AUC equals brute-force pair counting under heavy ties") {
    val rows = (0 until 300).map { i =>
      val label = if (i % 3 == 0) 1 else 0
      val score = (i * 7 % 40).toLong + (if (label == 1) 15 else 0)
      (score, label)
    }
    val df = rows.toDF("score", "label")
    val r = Stats.binaryEval(df, "score", "label", binWidth = 10)
    val aucPpm = r.select("auc_ppm").head().getLong(0)
    assert(aucPpm == bruteAucPpm(rows), s"rank-sum $aucPpm vs brute force")
    // calibration bins: replay one bin by hand
    val b0 = r.where(col("bin") === 0)
      .select("n", "n_pos", "mean_score_ppm", "pos_rate_ppm").head()
    val in0 = rows.filter(_._1 < 10)
    assert(b0.getLong(0) == in0.size)
    assert(b0.getLong(1) == in0.count(_._2 == 1))
    assert(b0.getLong(2) ==
      (BigInt(in0.map(_._1).sum) * 1000000 / in0.size).toLong)
    assert(b0.getLong(3) ==
      (BigInt(in0.count(_._2 == 1)) * 1000000 / in0.size).toLong)
  }

  test("binaryEval: perfect separation -> 1.0; label-independent scores with all ties -> 0.5") {
    val perfect = (0 until 100).map(i => (if (i < 50) 10L else 20L, if (i < 50) 0 else 1))
    assert(Stats.binaryEval(perfect.toDF("score", "label"), "score", "label", 10)
      .select("auc_ppm").head().getLong(0) == 1000000L)
    val flat = (0 until 100).map(i => (7L, i % 2))
    assert(Stats.binaryEval(flat.toDF("score", "label"), "score", "label", 10)
      .select("auc_ppm").head().getLong(0) == 500000L)
  }

  test("binaryEval: partitioning-independent and floor bins for negative scores") {
    val rows = (0 until 200).map(i => ((i % 30).toLong - 10, if (i % 4 == 0) 1 else 0))
    val a = Stats.binaryEval(rows.toDF("score", "label"), "score", "label", 10)
      .orderBy("bin").collect().toSeq
    val b = Stats.binaryEval(rows.toDF("score", "label").repartition(17),
        "score", "label", 10)
      .orderBy("bin").collect().toSeq
    assert(a == b)
    // scores -10..-1 -> bin -1; 0..9 -> 0; 10..19 -> 1 (floor, not trunc)
    assert(a.map(_.getLong(0)) == Seq(-1L, 0L, 1L))
  }

  test("kendallTau: hand-computed pair counts over the common keys") {
    // a ranks A,B,C = 1,2,3; b ranks B,A,C = 1,2,3; D only in a, E only in b
    val a = Seq(("A", 1), ("B", 2), ("C", 3), ("D", 4)).toDF("k", "rnk")
    val b = Seq(("B", 1), ("A", 2), ("C", 3), ("E", 4)).toDF("k", "rnk")
    val r = Stats.kendallTau(a, b, "k", "rnk").collect().head
    // common {A,B,C}: (A,B) discordant, (A,C)+(B,C) concordant
    assert(r.getLong(r.fieldIndex("n_common")) == 3L)
    assert(r.getLong(r.fieldIndex("concordant")) == 2L)
    assert(r.getLong(r.fieldIndex("discordant")) == 1L)
    assert(r.getDouble(r.fieldIndex("tau")) == 1.0 / 3.0)
  }

  test("lagAutocorr: exact +1/-1 on aligned rhythms, null on flat series") {
    def events(key: String, dayCounts: Seq[(Int, Int)]) =
      dayCounts.flatMap { case (d, n) =>
        Seq.fill(n)((key, new java.sql.Timestamp(d * 86400000L))) }
    // a: x=[1,2] vs y=[1,2] -> r=1; b: x=[2,1] vs y=[1,2] -> r=-1;
    // c: single pair, zero variance -> null
    val df = (events("a", Seq(0 -> 1, 1 -> 2, 7 -> 1, 8 -> 2)) ++
      events("b", Seq(0 -> 1, 1 -> 2, 7 -> 2, 8 -> 1)) ++
      events("c", Seq(0 -> 1, 7 -> 1))).toDF("key", "ts")
    val r = Stats.lagAutocorr(df, "key", "ts", 7).orderBy("key").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(r(0).getDouble(2) == 1.0 && r(1).getDouble(2) == -1.0)
    assert(r(2).isNullAt(2) && r(2).getLong(1) == 1L)
    // day-EXACT alignment: a gap day must not shift pairs (no day-6 pair)
    val gap = events("g", Seq(0 -> 1, 2 -> 3, 7 -> 5)).toDF("key", "ts")
    val g = Stats.lagAutocorr(gap, "key", "ts", 7).collect().head
    assert(g.getLong(1) == 1L) // only (7, 0) aligns at lag 7
  }

  test("linearTrend: exact line, rebased flat series, noisy hand-check, single day") {
    def events(key: String, dayCounts: Seq[(Int, Int)]) =
      dayCounts.flatMap { case (d, n) =>
        Seq.fill(n)((key, new java.sql.Timestamp(d * 86400000L))) }
    // a: perfect line counts 2,3,4 on days 0,1,2 -> slope 1, icpt 2, r2 1
    // b: flat 5,5,5 on days 100..102 (rebase!) -> slope 0, icpt 5, r2 null
    // c: single day -> all null
    // d: days 0,1,2 counts 1,3,2 -> sums n=3 sx=3 sy=6 sxy=7 sxx=5 syy=14
    //    num=3 den=6 -> slope .5, icpt (6-.5*3)/3=1.5, r2=.5*(3/6)=.25
    val df = (events("a", Seq(0 -> 2, 1 -> 3, 2 -> 4)) ++
      events("b", Seq(100 -> 5, 101 -> 5, 102 -> 5)) ++
      events("c", Seq(9 -> 4)) ++
      events("d", Seq(0 -> 1, 1 -> 3, 2 -> 2))).toDF("key", "ts")
    val r = Stats.linearTrend(df, "key", "ts").orderBy("key").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b", "c", "d"))
    assert(r(0).getDouble(2) == 1.0 && r(0).getDouble(3) == 2.0 &&
      r(0).getDouble(4) == 1.0)
    assert(r(1).getDouble(2) == 0.0 && r(1).getDouble(3) == 5.0 &&
      r(1).isNullAt(4)) // zero count-variance: r2 undefined, slope exact 0
    assert(r(2).isNullAt(2) && r(2).isNullAt(3) && r(2).isNullAt(4) &&
      r(2).getLong(1) == 1L)
    assert(r(3).getDouble(2) == 0.5 && r(3).getDouble(3) == 1.5 &&
      r(3).getDouble(4) == 0.25)
  }

  test("chiSquared: independent table gives 0; zero cells enter the grid") {
    // independent 2x2: counts (a,0)=2 (a,1)=4 (b,0)=3 (b,1)=6 -> chi2=0
    val ind = (Seq.fill(2)(("a", 0L)) ++ Seq.fill(4)(("a", 1L)) ++
      Seq.fill(3)(("b", 0L)) ++ Seq.fill(6)(("b", 1L))).toDF("r", "c")
    val r1 = Stats.chiSquared(ind, "r", "c").orderBy("row_cat", "col_cat").collect()
    assert(r1.length == 4 && r1.forall(_.getDouble(5) == 0.0) &&
      r1.forall(_.getLong(6) == 1L))
    assert(r1.map(x => (x.getString(0), x.getLong(1), x.getLong(2),
      x.getDouble(3))).toSeq ==
      Seq(("a", 0L, 2L, 2.0), ("a", 1L, 4L, 4.0),
          ("b", 0L, 3L, 3.0), ("b", 1L, 6L, 6.0)))
    // diagonal 2x2 with zero off-cells: every e=0.5, every term 0.5, chi2=2
    val diag = Seq(("a", 0L), ("b", 1L)).toDF("r", "c")
    val r2 = Stats.chiSquared(diag, "r", "c").orderBy("row_cat", "col_cat").collect()
    assert(r2.length == 4) // the two zero-observed cells are present
    assert(r2.forall(_.getDouble(3) == 0.5) && r2.forall(_.getDouble(4) == 0.5))
    assert(r2.forall(_.getDouble(5) == 2.0))
    assert(r2.map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("a", 0L, 1L), ("a", 1L, 0L), ("b", 0L, 0L), ("b", 1L, 1L)))
  }

  test("frequentItems: equals brute-force HAVING under any partitioning and tiny summaries") {
    // Zipf-ish multiset: value i appears 200/i times for i in 1..40
    val rows = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"v$i"))
    val brute = rows.groupBy(identity).collect {
      case (v, xs) if xs.size >= 25 => (v, xs.size.toLong) }.toSet
    assert(brute.nonEmpty && brute.size < 40)
    for (parts <- Seq(1, 7, 32); k <- Seq(4, 64)) {
      val df = rows.toDF("tok").repartition(parts)
      val got = Stats.frequentItems(df, "tok", minCount = 25L, summaryK = k)
        .collect().map(x => (x.getString(0), x.getLong(1))).toSet
      assert(got == brute, s"parts=$parts summaryK=$k")
    }
    // exact boundary: a value with count == minCount is kept
    val edge = Stats.frequentItems(
      (Seq.fill(5)("hit") ++ Seq.fill(4)("miss")).toDF("tok"), "tok", 5L, 2)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSet
    assert(edge == Set(("hit", 5L)))
  }

  test("corrMatrix: +1/-1 on linear columns, NULL on zero variance, full triangle") {
    // x = 1..4, y = 2x (r=1), z = 5-x (r=-1), w = 7 (zero variance)
    val df = (1 to 4).map(x => (x.toLong, 2L * x, 5L - x, 7L))
      .toDF("x", "y", "z", "w")
    val r = Stats.corrMatrix(df, Seq("x", "y", "z", "w"))
      .orderBy("col_a", "col_b").collect()
      .map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), if (x.isNullAt(3)) None else Some(x.getDouble(3))))).toMap
    assert(r.size == 10) // 4*5/2 upper-triangle cells
    assert(r.forall(_._2._1 == 4L))
    def near(p: (String, String), v: Double) =
      assert(math.abs(r(p)._2.get - v) < 1e-12, s"$p -> ${r(p)._2}")
    near(("x", "x"), 1.0); near(("x", "y"), 1.0); near(("x", "z"), -1.0)
    near(("y", "y"), 1.0); near(("y", "z"), -1.0); near(("z", "z"), 1.0)
    // every pair touching the constant column is NULL, diagonal included
    Seq(("w", "w"), ("x", "w"), ("y", "w"), ("z", "w")).foreach { p =>
      assert(r(p)._2.isEmpty, s"$p should be NULL")
    }
  }

  test("welchTest: hand-computed t and Welch dof; degenerate groups yield NULLs") {
    // a: 1,2,3 (mean 2, var 1); b: 4,6 (mean 5, var 2)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 6L),
      ("zz", 99L)).toDF("g", "v") // 'zz' rows are ignored
    val r = Stats.welchTest(df, "g", "v", "a", "b").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 2.0)
    val seA = 1.0 / 3.0; val seB = 2.0 / 2.0; val se = seA + seB
    assert(r.getDouble(6) == (2.0 - 5.0) / math.sqrt(se))
    assert(r.getDouble(7) == (se * se) / (seA * seA / 2.0 + seB * seB / 1.0))
    // n_b = 1: variance undefined -> t/dof/var_b NULL, means still real
    val deg = Stats.welchTest(Seq(("a", 1L), ("a", 3L), ("b", 7L)).toDF("g", "v"),
      "g", "v", "a", "b").collect().head
    assert(deg.getDouble(3) == 7.0 && deg.isNullAt(5) && deg.isNullAt(6) &&
      deg.isNullAt(7))
  }

  test("winsorizedMean: clamp at exact p25/p75 elements, hand-checked") {
    // group a: 1..8 -> p25 element = 2, p75 element = 6
    // clamped: 2,2,3,4,5,6,6,6 -> sum 34; raw sum 36
    val df = ((1 to 8).map(v => ("a", v.toLong)) :+ (("b", 10L))).toDF("k", "v")
    val r = Stats.winsorizedMean(df, Seq("k"), "v", 0.25, 0.75)
      .orderBy("k").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5)))
    assert(r.toSeq == Seq(
      ("a", 2L, 6L, 8L, 36.0 / 8.0, 34.0 / 8.0),
      ("b", 10L, 10L, 1L, 10.0, 10.0))) // single row: lo = hi = the value
  }

  test("classificationReport: hand-built confusion matrix, NULL on absent axes") {
    // labels:  a a a a b b c      preds: a a b a b a c
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("a", "a"),
      ("b", "b"), ("b", "a"), ("c", "c"), ("d", "x")).toDF("y", "p")
    val r = Stats.classificationReport(df, "y", "p").orderBy("clazz")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3),
        if (x.isNullAt(4)) None else Some(x.getDouble(4)),
        if (x.isNullAt(5)) None else Some(x.getDouble(5)),
        if (x.isNullAt(6)) None else Some(x.getDouble(6))))
    assert(r.toSeq == Seq(
      // clazz, n_true, n_pred, tp, precision, recall, f1=2tp/(nt+np)
      ("a", 4L, 4L, 3L, Some(3.0 / 4.0), Some(3.0 / 4.0), Some(6.0 / 8.0)),
      ("b", 2L, 2L, 1L, Some(1.0 / 2.0), Some(1.0 / 2.0), Some(2.0 / 4.0)),
      ("c", 1L, 1L, 1L, Some(1.0), Some(1.0), Some(1.0)),
      ("d", 1L, 0L, 0L, None, Some(0.0), Some(0.0)), // never predicted
      ("x", 0L, 1L, 0L, Some(0.0), None, Some(0.0)))) // never a label
  }

  test("permutationTestMean: bit-exact JVM replay; null effect gives high p") {
    // clear effect: A = 100s, B = 1s
    val df = ((1L to 10L).map(i => (i, 100L, "A")) ++
      (11L to 20L).map(i => (i, 1L, "B"))).toDF("id", "v", "g")
    val r = Stats.permutationTestMean(df, "id", "v", "g", "A", "B",
      b = 32, seed = "s").collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 99.0)
    // independent JVM replay of the whole chain
    def coinA(id: Long, rep: Int): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((id.toString + "\u0001" + rep + "\u0001s")
        .getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2 == 0
    }
    val rows = (1L to 10L).map((_, 100L)) ++ (11L to 20L).map((_, 1L))
    val diffs = (1 to 32).flatMap { rep =>
      val (a, b2) = rows.partition { case (id, _) => coinA(id, rep) }
      if (a.isEmpty || b2.isEmpty) None
      else Some(a.map(_._2).sum.toDouble / a.size -
        b2.map(_._2).sum.toDouble / b2.size)
    }
    val nExtreme = diffs.count(d => math.abs(d) >= 99.0)
    assert(r.getLong(3) == nExtreme.toLong)
    assert(r.getDouble(4) == (nExtreme + 1).toDouble / (diffs.size + 1).toDouble)
    // no real effect: p far from significant
    val flat = (1L to 40L).map(i => (i, i % 5, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "v", "g")
    val rf = Stats.permutationTestMean(flat, "id", "v", "g", "A", "B",
      b = 64, seed = "s2").collect().head
    assert(rf.getDouble(4) > 0.2)
  }

  test("sprt: crossings at the JVM-replayed trial, continue when inside") {
    val (cs, cf) = Stats.sprtWeights(0.5, 0.8)
    // A: all successes; B: all failures; C: alternating (stays inside)
    val rows =
      (1 to 10).map(t => ("A", t.toLong, true)) ++
        (1 to 6).map(t => ("B", t.toLong, false)) ++
        (1 to 4).map(t => ("C", t.toLong, t % 2 == 1))
    val df = rows.toDF("key", "ts", "ok")
    val r = Stats.sprt(df, Seq("key"), "ts", "ok", 0.5, 0.8, -2.0, 2.0)
      .orderBy("key").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]), x.getString(4)))
    // independent JVM replay of the crossing rule
    def firstCross(seq: Seq[Boolean]): Option[(Long, String)] = {
      var k = 0
      seq.zipWithIndex.foreach { case (s, i) =>
        if (s) k += 1
        val llr = k * cs + (i + 1 - k) * cf
        if (llr >= 2.0) return Some(((i + 1).toLong, "accept_h1"))
        if (llr <= -2.0) return Some(((i + 1).toLong, "accept_h0"))
      }
      None
    }
    val a = firstCross(Seq.fill(10)(true)).get
    val b = firstCross(Seq.fill(6)(false)).get
    assert(r(0) == (("A", 10L, 10L, Some(a._1), a._2)))
    assert(r(1) == (("B", 6L, 0L, Some(b._1), b._2)))
    assert(r(2) == (("C", 4L, 2L, None, "continue")))
    assert(firstCross(Seq(true, false, true, false)).isEmpty)
  }

  test("calibrationBins: exact fixed-point bins, top edge closed") {
    val df = Seq(
      (50L, false), (100L, false),   // bin 0 (s*4 div 1000)
      (250L, true), (300L, false),   // bin 1
      (990L, true), (1000L, true))   // 990 -> 3; 1000 -> 4 capped to 3
      .toDF("score_milli", "y")
    val r = Stats.calibrationBins(df, "score_milli", "y", bins = 4)
      .orderBy("bin").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5), x.getDouble(6)))
    assert(r(0) == ((0L, 2L, 150L, 0L, 150.0 / 2000.0, 0.0, -150.0 / 2000.0)))
    assert(r(1) == ((1L, 2L, 550L, 1L, 550.0 / 2000.0, 0.5, 0.5 - 550.0 / 2000.0)))
    assert(r(2) == ((3L, 2L, 1990L, 2L, 1990.0 / 2000.0, 1.0, 1.0 - 1990.0 / 2000.0)))
    assert(r.length == 3) // empty bin 2 absent
  }

  test("twoByTwo: exact cells, RR and OR single-division, zero guards") {
    // exposed: 3 pos, 1 neg; control: 1 pos, 3 neg
    val df = Seq((true, true), (true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false), (false, false))
      .toDF("e", "o")
    val r = Stats.twoByTwo(df, "e", "o").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 1L, 1L, 3L)))
    assert(r.getDouble(4) == 0.75 && r.getDouble(5) == 0.25)
    assert(r.getDouble(6) == 0.75 / 0.25)
    assert(r.getDouble(7) == (3.0 * 3.0) / (1.0 * 1.0))
    // control arm with zero positives -> RR null, OR null (c = 0)
    val r0 = Stats.twoByTwo(df.where(!(col("e") === false &&
      col("o") === true)), "e", "o").collect().head
    assert(r0.isNullAt(6) && r0.isNullAt(7))
  }

  test("cohensD: pooled-variance replay; degenerate groups null") {
    val df = Seq(("A", 10L), ("A", 14L), ("B", 6L), ("B", 8L), ("B", 10L))
      .toDF("g", "v")
    val r = Stats.cohensD(df, "g", "v", "A", "B").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 3L)))
    assert(r.getDouble(2) == 12.0 && r.getDouble(3) == 8.0)
    // ssA = 296 - 576/2 = 8 ; ssB = 200 - 576/3 = 8 ; pooled = 16/3
    val d = (12.0 - 8.0) / math.sqrt((296.0 - 24.0 * 24.0 / 2.0 +
      (200.0 - 24.0 * 24.0 / 3.0)) / 3.0)
    assert(r.getDouble(4) == d)
    // single-row group -> null d
    val r1 = Stats.cohensD(df.where(col("v") =!= 14L), "g", "v", "A", "B")
      .collect().head
    assert(r1.isNullAt(4))
  }

  test("mcc: textbook confusion algebra; zero-marginal null") {
    val df = Seq((true, true), (true, true), (true, false),
      (false, false), (false, false), (false, true))
      .toDF("y", "p")
    val r = Stats.mcc(df, "y", "p").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 1L, 1L)))
    val want = (2.0 * 2.0 - 1.0 * 1.0) /
      math.sqrt(3.0 * 3.0 * 3.0 * 3.0)
    assert(r.getDouble(4) == want)
    // never-positive predictor: a zero marginal -> null
    val r0 = Stats.mcc(df.withColumn("p", lit(false)), "y", "p")
      .collect().head
    assert(r0.isNullAt(4))
  }

  test("emd1d: shifted distribution moves exactly the shift; identity 0") {
    val a = Seq(0L, 0L, 10L, 10L).toDF("v")
    val b = Seq(3L, 3L, 13L, 13L).toDF("v") // a shifted by +3
    val r = Stats.emd1d(a, b, "v").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 4L)))
    assert(r.getDouble(3) == 3.0) // W1 of a pure +3 shift is 3
    // identical distributions: 0, even with different row multiplicities
    val r0 = Stats.emd1d(a, a.unionAll(a), "v").collect().head
    assert(r0.getDouble(3) == 0.0)
    // unequal masses normalize: {0} vs {0,1,1}: F_a=1 at 0; F_b=1/3 at 0
    // -> gap 0..1 contributes |1 - 1/3| * 1 = 2/3
    val r1 = Stats.emd1d(Seq(0L).toDF("v"),
      Seq(0L, 1L, 1L).toDF("v"), "v").collect().head
    assert(r1.getDouble(3) == 2.0 / 3.0)
  }

  test("runsTest: exact run counts, closed-form z, constant-series null") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // alternating TFTFTF: 6 runs of 6 (max oscillation, z > 0)
    // streaky TTTFFF: 2 runs (z < 0); constant TTTT: null z
    val df = (Seq.tabulate(6)(i => ("alt", t(i.toLong), i.toLong,
      i % 2 == 0)) ++
      Seq.tabulate(6)(i => ("str", t(i.toLong), i.toLong, i < 3)) ++
      Seq.tabulate(4)(i => ("con", t(i.toLong), i.toLong, true)))
      .toDF("k", "ts", "eid", "f")
    val r = Stats.runsTest(df, Seq("k"), "ts", "f", Seq("eid"))
      .orderBy("k").collect()
    val byK = r.map(x => x.getString(0) ->
      (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(byK("alt") == ((6L, 3L, 6L)))
    assert(byK("str") == ((6L, 3L, 2L)))
    assert(byK("con") == ((4L, 4L, 1L)))
    val zAlt = {
      val mu = 2.0 * 9.0 / 6.0 + 1.0 // = 4
      (6.0 - mu) / math.sqrt((mu - 1.0) * (mu - 2.0) / 5.0)
    }
    assert(r(0).getDouble(4) == zAlt && zAlt > 0)
    assert(r(2).getDouble(4) < 0)   // streaky
    assert(r(1).isNullAt(4))        // constant
  }

  test("acfTable: lag-2 cycle shows up; exact moment replay at lag 1") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // period-2 series 1,5,1,5,... -> r(lag 2) = 1, r(lag 1) = -1
    val df = Seq.tabulate(8)(i => ("k", t(i.toLong), i.toLong,
      if (i % 2 == 0) 1L else 5L)).toDF("g", "ts", "eid", "v")
    val r = Stats.acfTable(df, Seq("g"), "ts", "v", maxLag = 3, Seq("eid"))
      .orderBy("lag").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r(0) == ((1L, 7L, r(0)._3)) && math.abs(r(0)._3 + 1.0) < 1e-9)
    assert(r(1)._1 == 2L && math.abs(r(1)._3 - 1.0) < 1e-9)
    // pairs shrink with lag: n - k
    assert(r.map(_._2).toSeq == Seq(7L, 6L, 5L))
  }

  test("pinballLoss: asymmetric integer terms, P75 penalizes underforecast") {
    // tau = 3/4: over-forecast (a<p) costs (qDen-qNum)=1 per unit,
    // under-forecast costs qNum=3 per unit (scaled by qDen=4)
    val df = Seq(("g", 10L, 12L), ("g", 10L, 7L), ("g", 5L, 5L))
      .toDF("k", "a", "p")
    val r = Stats.pinballLoss(df, Seq("k"), "a", "p", 3L, 4L)
      .collect().head
    // e=-2: max(-6, 2)=2 ; e=3: max(9, -3)=9 ; e=0: 0 -> sum 11
    assert(r.getLong(1) == 3L && r.getLong(2) == 11L)
    assert(r.getDouble(3) == 11.0 / 12.0)
    // ungrouped form returns one global row
    val g = Stats.pinballLoss(df, Nil, "a", "p", 1L, 2L).collect().head
    // tau=1/2: |e| scaled by 1 each: 2 + 3 + 0 = 5 over qDen 2
    assert(g.getLong(0) == 3L && g.getLong(1) == 5L)
    assert(g.getDouble(2) == 5.0 / 6.0)
  }

  test("referencePercentile: exact ECDF lookup, below-min reads zero") {
    val ref = Seq(10L, 20L, 20L, 30L).toDF("v") // N=4
    val df = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 30L), (5L, 99L))
      .toDF("id", "v")
    val r = Stats.referencePercentile(ref, df, "id", "v")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))
    assert(r.toSeq == Seq(
      (1L, 5L, 0L, 4L, 0.0),        // below reference min
      (2L, 10L, 1L, 4L, 0.25),
      (3L, 25L, 3L, 4L, 0.75),      // 10, 20, 20
      (4L, 30L, 4L, 4L, 1.0),
      (5L, 99L, 4L, 4L, 1.0)))      // above max clamps to N
  }

  test("kneePoint: max integer chord distance, x-asc tie break") {
    // convex drop: chord from (0,100) to (10,0); knee at the bend (2,20)
    val df = Seq((0L, 100L), (1L, 50L), (2L, 20L), (5L, 10L), (10L, 0L))
      .toDF("x", "y")
    val r = Stats.kneePoint(df, "x", "y").collect().head
    // d(x,y) = |10*(100-y) - (0-x)*(0-100)| = |1000 - 10y - 100x|
    // (1,50): |1000-500-100|=400; (2,20): |1000-200-200|=600; (5,10):
    // |1000-100-500|=400 -> knee (2,20)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 20L, 600L)))
    // straight line: every interior distance 0 -> tie to smallest x
    val line = Seq((0L, 0L), (1L, 10L), (2L, 20L)).toDF("x", "y")
    assert(Stats.kneePoint(line, "x", "y").collect().head.getLong(0) == 0L)
  }

  test("ece: exact-rational numerator over the calibration bins") {
    val df = Seq(
      (50L, false), (100L, false),   // bin0: |0 - 150|     = 150
      (250L, true), (300L, false),   // bin1: |1000 - 550|  = 450
      (990L, true), (1000L, true))   // bin3: |2000 - 1990| = 10
      .toDF("score_milli", "y")
    val r = Stats.ece(df, "score_milli", "y", bins = 4).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 610.0 / 6000.0)
    // a perfectly calibrated constant: score 500, half positive -> ece 0
    val p = Seq((500L, true), (500L, false)).toDF("score_milli", "y")
    assert(Stats.ece(p, "score_milli", "y", 4).collect().head
      .getDouble(2) == 0.0)
  }

  test("forecastEval: exact MAEs vs naive, first rows excluded, null MASE") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      // k: actual 10,12,11; pred 9,11,13 -> scored rows 2 (ts 2,3):
      // |12-11|+|11-13| = 3 ; naive |12-10|+|11-12| = 3 -> mase 1.0
      ("k", t(1), 10L, 9L), ("k", t(2), 12L, 11L), ("k", t(3), 11L, 13L),
      // c: constant series -> naive MAE 0 -> mase null
      ("c", t(1), 5L, 6L), ("c", t(2), 5L, 5L))
      .toDF("g", "ts", "a", "p")
    val r = Stats.forecastEval(df, Seq("g"), "ts", "a", "p")
      .orderBy("g").collect()
    assert(r(1).getLong(1) == 2L && r(1).getLong(2) == 3L &&
      r(1).getLong(3) == 3L)
    assert(r(1).getDouble(4) == 1.5 && r(1).getDouble(5) == 1.5)
    assert(r(1).getDouble(6) == 1.0)
    assert(r(0).getLong(1) == 1L && r(0).getLong(3) == 0L && r(0).isNullAt(6))
  }

  test("mannWhitney: doubled-rank U, Cliff's delta, tie correction") {
    // complete separation: A = {3,5} all above B = {1,2} -> delta = 1
    val df = Seq(("A", 3L), ("A", 5L), ("B", 1L), ("B", 2L))
      .toDF("g", "v")
    val r = Stats.mannWhitney(df, "g", "v", "A", "B").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 8L)))
    assert(r.getDouble(3) == 1.0)
    // ties: A={1,2}, B={1,3} -> U_A = 1.5 -> u2 = 3, delta = -0.25
    val t = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 3L)).toDF("g", "v")
    val rt = Stats.mannWhitney(t, "g", "v", "A", "B").collect().head
    assert(rt.getLong(2) == 3L)
    assert(rt.getDouble(3) == 3.0 / 4.0 - 1.0)
    // z replay: tcorr = 2^3-2 = 6, n = 4
    val prod = 4.0
    val varU = prod / 12.0 * (5.0 - 6.0 / 12.0)
    val zExp = (3.0 / 2.0 - prod / 2.0) / math.sqrt(varU)
    assert(rt.getDouble(4) == zExp)
    // identical groups: delta 0, z 0
    val e = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L)).toDF("g", "v")
    val re = Stats.mannWhitney(e, "g", "v", "A", "B").collect().head
    assert(re.getDouble(3) == 0.0 && re.getDouble(4) == 0.0)
  }

  test("diffInDiff: four exact cell means; empty cell nulls the estimate") {
    val df = Seq(
      (true, false, 10L), (true, false, 12L), // T,pre mean 11
      (true, true, 20L),                      // T,post mean 20
      (false, false, 5L),                     // C,pre mean 5
      (false, true, 7L), (false, true, 9L))   // C,post mean 8
      .toDF("treated", "post", "y")
    val r = Stats.diffInDiff(df, "treated", "post", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 2L)))
    assert(r.getDouble(4) == 11.0 && r.getDouble(5) == 20.0)
    assert(r.getDouble(6) == 5.0 && r.getDouble(7) == 8.0)
    assert(r.getDouble(8) == (20.0 - 11.0) - (8.0 - 5.0))
    // no control-post rows -> did null, other cells intact
    val r2 = Stats.diffInDiff(df.where(!(col("treated") === false &&
      col("post") === true)), "treated", "post", "y").collect().head
    assert(r2.isNullAt(7) && r2.isNullAt(8) && r2.getDouble(5) == 20.0)
  }

  test("wilsonLowerBound: formula replay; 1-of-1 ranks below 480-of-500") {
    val df = (Seq.tabulate(500)(i => ("big", i < 480)) ++
      Seq(("tiny", true))).toDF("grp", "ok")
    val r = Stats.wilsonLowerBound(df, Seq("grp"), "ok").orderBy("grp")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))
    def wilson(k: Long, n: Long): Double = {
      val z = 1.96; val z2 = z * z
      val nn = n.toDouble; val p = k.toDouble / nn
      (p + z2 / (2.0 * nn) -
        z * math.sqrt(p * (1.0 - p) / nn + z2 / (4.0 * nn * nn))) /
        (1.0 + z2 / nn)
    }
    assert(r(0) == (("big", 500L, 480L, 480.0 / 500.0, wilson(480, 500))))
    assert(r(1) == (("tiny", 1L, 1L, 1.0, wilson(1, 1))))
    assert(wilson(1, 1) < wilson(480, 500)) // the point of the bound
  }

  test("kaplanMeier: textbook risk sets and fold product, censoring exact") {
    val df = Seq(("k", 1L, true), ("k", 2L, true), ("k", 2L, false),
      ("k", 3L, true), ("k", 5L, false),
      ("j", 4L, true)) // second key folds independently
      .toDF("g", "dur", "ev")
    val r = Stats.kaplanMeier(df, Seq("g"), "dur", "ev")
      .orderBy("g", "t").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5)))
    val s1 = 4.0 / 5.0
    val s2 = s1 * (3.0 / 4.0)
    val s3 = s2 * (1.0 / 2.0)
    assert(r.toSeq == Seq(
      ("j", 4L, 1L, 1L, 0L, 0.0),
      ("k", 1L, 5L, 1L, 0L, s1),
      ("k", 2L, 4L, 1L, 1L, s2),
      ("k", 3L, 2L, 1L, 0L, s3),
      ("k", 5L, 1L, 0L, 1L, s3 * 1.0)))
  }

  test("burstiness: periodic reads -1, exact moment arithmetic, null guards") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val df = (Seq(0L, 10L, 20L, 30L).map(s => ("per", t(s), s)) ++
      Seq(0L, 1L, 2L, 100L).map(s => ("bur", t(s), s)) ++
      Seq(0L, 7L).map(s => ("two", t(s), s)) ++
      Seq(("one", t(0), 0L))).toDF("k", "ts", "eid")
    val r = Stats.burstiness(df, Seq("k"), "ts", Seq("eid"))
      .orderBy("k").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("bur", 3L, 100L), ("per", 3L, 30L),
      ("two", 1L, 7L))) // single-event key absent entirely
    val m = Stats.burstiness(df, Seq("k"), "ts", Seq("eid"))
      .orderBy("k").collect()
    // per: var 0 -> B = -1 exactly
    assert(m(1).getDouble(4) == 0.0 && m(1).getDouble(5) == -1.0)
    // bur: replay the fixed formula
    val mu = 100.0 / 3.0
    val vr = 9606.0 / 3.0 - mu * mu
    val sd = math.sqrt(vr)
    assert(m(0).getDouble(4) == sd)
    assert(m(0).getDouble(5) == (sd - mu) / (sd + mu))
    // two: one gap -> std/burstiness null
    assert(m(2).isNullAt(4) && m(2).isNullAt(5))
  }

  test("quantileNormalize: integer midpoint rule against hand-computed map") {
    // pooled sorted: [1,2,3,10,20,30,100], N=7
    val df = Seq(
      (1L, "g1", 10L), (2L, "g1", 20L), (3L, "g1", 30L),
      (4L, "g2", 1L), (5L, "g2", 2L), (6L, "g2", 3L), (7L, "g2", 100L))
      .toDF("id", "g", "v")
    val r = Stats.quantileNormalize(df, "g", "v", "id")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    // g1 (n=3): idx = (2r-1)*7 div 6 -> 1, 3, 5 -> 2, 10, 30
    // g2 (n=4): idx = (2r-1)*7 div 8 -> 0, 2, 4, 6 -> 1, 3, 20, 100
    assert(r.toSeq == Seq((1L, 10L, 2L), (2L, 20L, 10L), (3L, 30L, 30L),
      (4L, 1L, 1L), (5L, 2L, 3L), (6L, 3L, 20L), (7L, 100L, 100L)))
    // identical distributions stay fixed: one group == pooled
    val one = Seq((1L, "g", 5L), (2L, "g", 7L), (3L, "g", 9L))
      .toDF("id", "g", "v")
    val ro = Stats.quantileNormalize(one, "g", "v", "id")
      .orderBy("id").collect().map(x => (x.getLong(2), x.getLong(3)))
    assert(ro.forall { case (v, nv) => v == nv })
  }

  test("captureRecapture: Chapman and Lincoln-Petersen, duplicate ids collapse") {
    // A: {1..10}, B: {6..17} -> na=10, nb=12, m=5
    // Chapman: 11*13 div 6 - 1 = 23 - 1 = 22; LP: 120/5 = 24
    val a = ((1L to 10L) ++ Seq(3L, 3L)).toDF("id") // dup ids don't inflate
    val b = (6L to 17L).toDF("id")
    val r = Stats.captureRecapture(a, b, "id").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 12L, 5L)))
    assert(r.getLong(3) == 11L * 13L / 6L - 1L)
    assert(r.getDouble(4) == 120.0 / 5.0)
    // disjoint captures: LP undefined, Chapman still finite
    val d = Stats.captureRecapture((1L to 4L).toDF("id"),
      (10L to 13L).toDF("id"), "id").collect().head
    assert(d.getLong(2) == 0L && d.getLong(3) == 5L * 5L - 1L && d.isNullAt(4))
  }

  test("wilcoxonSignedRank: doubled tie ranks, zero diffs drop, hand z") {
    // diffs: +1, -1, +2, +2, 0(drops) -> |d| ranks: 1:{1,2} r2 = 2*1+2-1 = 3;
    // 2:{3,4} r2 = 2*3+2-1 = 7. W'+ = 3 + 7 + 7 = 17; n=4, mu' = 10
    // ties: t=2 twice -> tc = (8-2)*2 = 12; var' = (2*4*5*9 - 12)/12 = 348/12
    val df = Seq((10L, 11L), (10L, 9L), (10L, 12L), (5L, 7L), (3L, 3L))
      .toDF("before", "after")
    val r = Stats.wilcoxonSignedRank(df, "before", "after").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 17L)
    assert(r.getDouble(2) == (17.0 - 10.0) / math.sqrt(348.0 / 12.0))
    // all diffs equal: single tie group, var' = (2n(n+1)(2n+1) - (n^3-n))/12
    val same = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("before", "after")
    val rs = Stats.wilcoxonSignedRank(same, "before", "after").collect().head
    // n=3: ranks all r2 = 2*1+3-1 = 4 -> W'+ = 12; mu'=6; tc = 27-3 = 24
    // var' = (2*3*4*7 - 24)/12 = 144/12 = 12
    assert(rs.getLong(1) == 12L && rs.getDouble(2) == 6.0 / math.sqrt(12.0))
    // no nonzero differences: z NULL
    val z = Stats.wilcoxonSignedRank(
      Seq((1L, 1L)).toDF("before", "after"), "before", "after").collect()
    assert(z.head.getLong(0) == 0L && z.head.isNullAt(2))
  }

  test("ksTest: exact integer numerator, ties absorbed, identical dists give 0") {
    // A: 1,2,3  B: 1,2,3 -> D = 0
    val same = (Seq(1L, 2L, 3L).map(("g", _, "A")) ++
      Seq(1L, 2L, 3L).map(("g", _, "B"))).toDF("k", "v", "side")
    val r0 = Stats.ksTest(same, Seq("k"), "v", "side", "A", "B").collect().head
    assert(r0.getLong(3) == 0L && r0.getDouble(4) == 0.0)
    // A: 1,1,2 (na=3)  B: 2,3 (nb=2); distinct v: 1,2,3
    // cum: v=1 (2,0) |2*2-0*3|=4; v=2 (3,1) |6-3|=3; v=3 (3,2) |6-6|=0
    // D = 4/6
    val df = (Seq(1L, 1L, 2L).map(("g", _, "A")) ++
      Seq(2L, 3L).map(("g", _, "B"))).toDF("k", "v", "side")
    val r = Stats.ksTest(df, Seq("k"), "v", "side", "A", "B").collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L && r.getLong(3) == 4L)
    assert(r.getDouble(4) == 4.0 / 6.0)
    // completely separated: D = na*nb
    val sep = (Seq(1L, 2L).map(("g", _, "A")) ++
      Seq(9L, 10L, 11L).map(("g", _, "B"))).toDF("k", "v", "side")
    val rs = Stats.ksTest(sep, Seq("k"), "v", "side", "A", "B").collect().head
    assert(rs.getLong(3) == 6L && rs.getDouble(4) == 1.0)
    // one side empty -> NULL stat
    val emp = Seq(("g", 1L, "A")).toDF("k", "v", "side")
    assert(Stats.ksTest(emp, Seq("k"), "v", "side", "A", "B")
      .collect().head.isNullAt(4))
  }

  test("theilSen: robust slope ignores the outlier OLS would chase") {
    def ts(i: Int) = i.toLong
    // y = 2t except one wild outlier at t=4 (y=100)
    val df = (1 to 6).map(t => ("k", ts(t), if (t == 4) 100L else 2L * t))
      .toDF("k", "t", "x")
    val r = Stats.theilSen(df, Seq("k"), "t", "x").collect().head
    assert(r.getLong(1) == 15L) // 6*5/2 pairs
    assert(r.getDouble(2) == 2.0) // the median slope is the clean one
    // single-point series: no pairs, NULL slope
    val one = Stats.theilSen(Seq(("s", 1L, 5L)).toDF("k", "t", "x"),
      Seq("k"), "t", "x").collect().head
    assert(one.getLong(1) == 0L && one.isNullAt(2))
    // exact two-point slope: (7-4)/(3-1) = 1.5
    val two = Stats.theilSen(Seq(("d", 1L, 4L), ("d", 3L, 7L))
      .toDF("k", "t", "x"), Seq("k"), "t", "x").collect().head
    assert(two.getDouble(2) == 3.0 / 2.0)
  }

  test("chiSquareKeyness: hand-computed 2x2 chi2, direction, minCount gate") {
    val a = Seq("apple apple apple banana", "apple cherry").toDF("text")
    val b = Seq("banana banana cherry", "banana cherry cherry").toDF("text")
    // counts: A: apple 4, banana 1, cherry 1 (ta=6); B: banana 3, cherry 3 (tb=6)
    val r = Stats.chiSquareKeyness(a, b, "text", minCount = 2L)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getLong(4)))).toMap
    // apple: a=4 b=0 c=2 d=6 -> det=24, chi2 = 12*576/(4*8*6*6)
    val det = 4.0 * 6.0 - 0.0 * 2.0
    assert(r("apple") == ((4L, 0L,
      (12.0 * (det * det)) / ((4.0 + 0.0) * (2.0 + 6.0) * ((4.0 + 2.0) * (0.0 + 6.0))),
      1L)))
    // banana over-indexes in B -> direction -1
    assert(r("banana")._1 == 1L && r("banana")._2 == 3L && r("banana")._4 == -1L)
    // cherry: a=1 b=3? no — cherry a=1, b=3 -> direction -1; total 4 >= 2 kept
    assert(r.contains("cherry") && r.size == 3)
  }

  test("mannKendall: hand-computed S, tie-corrected variance, z sign convention") {
    def ts(i: Int) = new java.sql.Timestamp(i * 1000L)
    // key u: x = 1,2,2,4 over t=1..4: pairs (i<j): signs
    // (1,2)+ (1,2)+ (1,4)+ (2,2)0 (2,4)+ (2,4)+ -> S = 5
    // ties: one group of 2 -> corr = 2*1*9 = 18; n=4:
    // var = (4*3*13 - 18)/18 = (156-18)/18 = 138/18
    val df = Seq(("u", 1, 1L), ("u", 2, 2L), ("u", 3, 2L), ("u", 4, 4L),
      // key d: strictly decreasing 3,2,1 -> S=-3, no ties:
      // var = (3*2*11)/18 = 66/18
      ("d", 1, 3L), ("d", 2, 2L), ("d", 3, 1L),
      // key c: constant -> S=0, var=0 -> z NULL
      ("c", 1, 7L), ("c", 2, 7L))
      .map { case (k, t, x) => (k, ts(t), x) }.toDF("k", "t", "x")
    val r = Stats.mannKendall(df, Seq("k"), "t", "x").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3),
        if (x.isNullAt(4)) None else Some(x.getDouble(4))))).toMap
    assert(r("u") == ((4L, 5L, 138.0 / 18.0, Some(4.0 / math.sqrt(138.0 / 18.0)))))
    assert(r("d") == ((3L, -3L, 66.0 / 18.0, Some(-2.0 / math.sqrt(66.0 / 18.0)))))
    assert(r("c")._2 == 0L && r("c")._3 == 0.0 && r("c")._4.isEmpty)
  }

  test("benfordReport: exact digit counts, literal expectations, zero-row digits") {
    // values: 10,11,199 -> digit 1 x3; 25 -> 2; 0 and -5 excluded
    val df = Seq(10L, 11L, 199L, 25L, 0L, -5L).toDF("v")
    val r = Stats.benfordReport(df, "v").orderBy("digit").collect()
    assert(r.length == 9)
    assert(r(0).getLong(1) == 3L && r(0).getDouble(2) == 0.75)
    assert(r(1).getLong(1) == 1L && r(1).getDouble(2) == 0.25)
    assert((2 until 9).forall(i => r(i).getLong(1) == 0L && r(i).getDouble(2) == 0.0))
    assert(r(0).getDouble(3) == 0.3010299956639812)
    assert(r(0).getDouble(4) == 0.75 - 0.3010299956639812)
    // expectations sum to ~1 (literal sanity)
    assert(math.abs(r.map(_.getDouble(3)).sum - 1.0) < 1e-12)
  }

  test("giniSplits: pure split scores 0, hand-computed mixed split, multi-feature") {
    // feature f separates labels perfectly at the median; g not at all
    // f: 1,2,3,4 labels a,a,b,b; g: constant 5
    val df = Seq((1L, 5L, "a"), (2L, 5L, "a"), (3L, 5L, "b"), (4L, 5L, "b"))
      .toDF("f", "g", "y")
    val r = Stats.giniSplits(df, "y", Seq("f", "g"), Seq(0.5))
      .collect().map(x => x.getString(0) -> ((x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5)))).toMap // feature -> (thr, nL, nR, gini)
    // f: thr = element at ceil(0.5*4)=2 -> 2; L={a,a} R={b,b} pure -> 0
    assert(r("f") == ((2L, 2L, 2L, 0.0)))
    // g: thr 5 -> all 4 rows left: gini = (16 - (4+4))/4 / 4 = 0.5
    assert(r("g") == ((5L, 4L, 0L, ((16.0 - 8.0) / 4.0 + 0.0) / 4.0)))
    // hand-computed mixed split: values 1..6, labels a,a,a,b,a,b, thr=3
    // L={a,a,a} pure; R={b,a,b}: (9 - (1+4))/3 = 4/3; weighted /6
    val mixed = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "a"),
      (6L, "b")).toDF("f", "y")
    val m = Stats.giniSplits(mixed, "y", Seq("f"), Seq(0.5)).collect().head
    assert(m.getLong(3) == 3L && m.getLong(4) == 3L)
    assert(m.getDouble(5) == (0.0 + (9.0 - 5.0) / 3.0) / 6.0)
  }

  test("cusum: recursive definition via prefix identity, resets, alarm crossing") {
    // target=10, slack=0: d = x-10. series for k:
    // x: 10,25,5,9,30,30 -> d: 0,15,-5,-1,20,20
    // S: 0,15,10,9,29,49 (recursive max(0, S+d))
    val df = Seq(("k", 1L, 10L), ("k", 2L, 25L), ("k", 3L, 5L),
      ("k", 4L, 9L), ("k", 5L, 30L), ("k", 6L, 30L),
      // independent key: deep dip then rise — the max(0,·) floor resets
      // x: 1,1,30 -> d: -9,-9,20 -> S: 0,0,20
      ("z", 7L, 1L), ("z", 8L, 1L), ("z", 9L, 30L))
      .toDF("key", "t", "x")
    val r = Stats.cusum(df, Seq("key"), "t", "x", target = 10L, slack = 0L,
        threshold = 25L)
      .orderBy("t").collect()
      .map(x => (x.getLong(1), x.getLong(3), x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (1L, 0L, false), (2L, 15L, false), (3L, 10L, false), (4L, 9L, false),
      (5L, 29L, true), (6L, 49L, true),
      (7L, 0L, false), (8L, 0L, false), (9L, 20L, false)))
    // recursive brute parity on a pseudo-random series
    val xs = (1 to 60).map(i => (i.toLong, ((i * 37) % 23).toLong))
    val brute = xs.scanLeft(0L) { case (s, (_, x)) =>
      math.max(0L, s + (x - 11L - 1L)) }.tail
    val got = Stats.cusum(xs.map(x => ("g", x._1, x._2)).toDF("key", "t", "x"),
        Seq("key"), "t", "x", target = 11L, slack = 1L, threshold = 9L)
      .orderBy("t").collect().map(_.getLong(3))
    assert(got.toSeq == brute)
  }

  test("bootstrapMeanCI: bit-exact JVM replay of the whole chain; seed moves it") {
    val df = (1L to 40L).map(i => (i, i * 3L)).toDF("id", "v")
    val r = Stats.bootstrapMeanCI(df, "id", "v", b = 16, seed = "s1",
      loQ = 0.125, hiQ = 0.875).collect().head
    // independent replay in plain JVM arithmetic
    def weight(id: Long, rep: Int, seed: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((s"$id\u0001$rep\u0001$seed").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.substring(0, 8), 16).toDouble + 0.5) /
        4294967296.0
      val k = Stats.PoissonCdf1.indexWhere(u < _)
      if (k < 0) Stats.PoissonCdf1.size.toLong else k.toLong
    }
    val means = (1 to 16).flatMap { rep =>
      val ws = (1L to 40L).map(i => (weight(i, rep, "s1"), i * 3L))
      val n = ws.map(_._1).sum
      if (n == 0) None else Some(ws.map(x => x._1 * x._2).sum.toDouble / n.toDouble)
    }.sorted
    def disc(q: Double): Double =
      means(math.max(1, math.ceil(q * means.size).toInt) - 1)
    assert(r.getLong(0) == 40L)
    assert(r.getDouble(1) == (1L to 40L).map(_ * 3L).sum.toDouble / 40.0)
    assert(r.getDouble(2) == disc(0.125) && r.getDouble(3) == disc(0.875))
    assert(r.getLong(4) == means.size.toLong)
    assert(r.getDouble(2) <= r.getDouble(3))
    // deterministic rerun; different seed shifts the interval
    val again = Stats.bootstrapMeanCI(df, "id", "v", 16, "s1").collect().head
    assert(again.getDouble(2) == r.getDouble(2) && again.getDouble(3) == r.getDouble(3))
    val moved = Stats.bootstrapMeanCI(df, "id", "v", 16, "s2").collect().head
    assert((moved.getDouble(2), moved.getDouble(3)) !=
      (r.getDouble(2), r.getDouble(3)))
  }

  test("weightedQuantilesDisc: cumulative-weight rule, unit weights reduce to quantilesDisc") {
    // key a: values 1(w=1), 2(w=1), 10(w=8): W=10
    // q=0.5 -> ceil(5)=5 -> first cum>=5 is 10; q=0.25 -> ceil(2.5)=3...
    // dyadic only: 0.25*10=2.5 exact, ceil=3 -> value 10 (cum 1,2,10)
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 10L, 8L),
      ("b", 5L, 3L), ("b", 7L, 1L)).toDF("k", "v", "w")
    val r = Stats.weightedQuantilesDisc(df, Seq("k"), "v", "w",
        Seq(0.125, 0.25, 0.5, 1.0))
      .orderBy("k", "q").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getLong(2)))
    assert(r.toSeq == Seq(
      ("a", 0.125, 2L),  // ceil(1.25)=2 -> cum 2 at value 2
      ("a", 0.25, 10L),  // ceil(2.5)=3 -> first cum>=3 is value 10
      ("a", 0.5, 10L), ("a", 1.0, 10L),
      ("b", 0.125, 5L), ("b", 0.25, 5L), ("b", 0.5, 5L),
      ("b", 1.0, 7L)))   // ceil(4)=4 -> cum 4 at value 7
    // unit weights == quantilesDisc on the same data
    val vals = Seq(("g", 3L), ("g", 1L), ("g", 4L), ("g", 1L), ("g", 5L))
      .toDF("k", "v")
    val wq = Stats.weightedQuantilesDisc(
      vals.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
        Seq("k"), "v", "w", Seq(0.25, 0.5, 0.75))
      .orderBy("q").collect().map(x => (x.getDouble(1), x.getLong(2)))
    val uq = Stats.quantilesDisc(vals, Seq("k"), "v", Seq(0.25, 0.5, 0.75))
      .orderBy("q").collect().map(x => (x.getDouble(1), x.getLong(2)))
    assert(wq.toSeq == uq.toSeq)
    // duplicate values merge their weights (tie-order-proof)
    val dup = Seq(("d", 2L, 3L), ("d", 2L, 3L), ("d", 9L, 4L))
      .toDF("k", "v", "w")
    val rd = Stats.weightedQuantilesDisc(dup, Seq("k"), "v", "w", Seq(0.5))
      .collect().map(x => x.getLong(2))
    assert(rd.toSeq == Seq(2L)) // W=10, ceil(5)=5, cum(2)=6 >= 5
  }

  test("spearman: monotone ±1, tie-aware hand value, constant gives NULL") {
    // any monotone map is rho = 1 regardless of linearity
    val mono = (1 to 7).map(x => (x.toLong, x.toLong * x * x)).toDF("x", "y")
    assert(Stats.spearman(mono, "x", "y").collect().head.getDouble(1) == 1.0)
    val anti = (1 to 7).map(x => (x.toLong, -x.toLong)).toDF("x", "y")
    assert(Stats.spearman(anti, "x", "y").collect().head.getDouble(1) == -1.0)
    // ties: x=(1,2,2,3) doubled ranks (2,5,5,8); y=(1,2,3,4) -> (2,4,6,8)
    // num=72, dx=72, dy=80 -> rho = 72/(sqrt72*sqrt80) = sqrt(0.9)
    val tied = Seq((1L, 1L), (2L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    val r = Stats.spearman(tied, "x", "y").collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 72.0 / (math.sqrt(72.0) * math.sqrt(80.0)))
    // constant column: zero rank variance -> NULL, and null rows drop
    val cst = Seq((1L, Some(5L)), (2L, Some(5L)), (3L, None))
      .toDF("x", "y")
    val c = Stats.spearman(cst, "x", "y").collect().head
    assert(c.getLong(0) == 2L && c.isNullAt(1))
  }

  test("agreementStats: closed-form kappa; constant raters yield NULL") {
    // 2x2: n=100, agree=80; margins true(a)=60,true(b)=40,
    // pred(a)=50, pred(b)=50 -> pe=(60*50+40*50)/10000=0.5, kappa=0.6
    val rows = Seq.fill(45)(("a", "a")) ++ Seq.fill(15)(("a", "b")) ++
      Seq.fill(5)(("b", "a")) ++ Seq.fill(35)(("b", "b"))
    val r = Stats.agreementStats(rows.toDF("y", "p"), "y", "p").collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 80L)
    assert(r.getDouble(2) == 0.8 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == (0.8 - 0.5) / 0.5)
    // both raters constant: pe = 1 -> kappa NULL, accuracy still real
    val cst = Stats.agreementStats(
      Seq.fill(4)(("a", "a")).toDF("y", "p"), "y", "p").collect().head
    assert(cst.getDouble(2) == 1.0 && cst.getDouble(3) == 1.0 && cst.isNullAt(4))
  }

  test("samples-contract guard: trips loudly over maxRows, passes at the bound") {
    val big = spark.range(0, 51).selectExpr("id AS x", "id * 2 AS y")
    val e = intercept[IllegalArgumentException] {
      Stats.spearman(big, "x", "y", maxRows = 50L)
    }
    assert(e.getMessage.contains("samples-and-lists contract breached"))
    // exactly at the bound: runs fine (and the guard probe is row-limited)
    val ok = Stats.spearman(spark.range(0, 50).selectExpr("id AS x", "id * 3 AS y"),
      "x", "y", maxRows = 50L).collect().head
    assert(ok.getLong(0) == 50L && math.abs(ok.getDouble(1) - 1.0) < 1e-12)
    // every guarded op trips the same way
    val two = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(intercept[IllegalArgumentException] {
      Stats.wilcoxonSignedRank(two, "a", "b", maxRows = 1L)
    }.getMessage.contains("wilcoxonSignedRank"))
    assert(intercept[IllegalArgumentException] {
      Stats.kendallTau(two, two, "a", "b", maxRows = 1L)
    }.getMessage.contains("kendallTau"))
    assert(intercept[IllegalArgumentException] {
      Stats.mannKendall(two, Seq.empty, "a", "b", maxRows = 1L)
    }.getMessage.contains("mannKendall"))
    assert(intercept[IllegalArgumentException] {
      Stats.theilSen(two, Seq.empty, "a", "b", maxRows = 1L)
    }.getMessage.contains("theilSen"))
  }

  test("frequentItems: nulls are excluded on BOTH paths (partition-layout independent)") {
    // 6 nulls + values: 'a' x5, 'b' x2 — null would be a heavy hitter if counted
    val rows = Seq.fill(6)(null.asInstanceOf[String]) ++
      Seq.fill(5)("a") ++ Seq.fill(2)("b")
    for (parts <- Seq(1, 7); k <- Seq(1, 2, 64)) {
      val df = spark.createDataset(rows).repartition(parts).toDF("v")
      val got = Stats.frequentItems(df, "v", minCount = 2L, summaryK = k)
        .orderBy("value").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq == Seq(("a", 5L), ("b", 2L)),
        s"parts=$parts summaryK=$k got ${got.toSeq}")
    }
  }

  test("emd1d: decimal accumulator survives a value range that wraps int64") {
    // n_a = n_b = 100k via weights... construct small-row / huge-dx case:
    // two values 0 and 2^40 with 3 rows a-side, 3 rows b-side shifted —
    // per-gap term = |cuma*n_b - cumb*n_a| * dx; make counts large enough
    // that the plain int64 product of a BIG synthetic case would overflow.
    // Here we verify exactness on a wide grid (dx = 2^40) and the known
    // closed form: shift by d moves exactly d.
    val d = 1L << 40
    val a = Seq(0L, d).toDF("v")
    val b = Seq(0L + 7L, d + 7L).toDF("v")
    val r = Stats.emd1d(a, b, "v").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(3) == 7.0)
  }

  test("targetEncodeLFO: out-of-fold means with smoothing, JVM-replayed; own fold never leaks") {
    def fold(seed: String, id: Long, k: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % k
    }
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (5L, "b", 100L), (6L, "b", 200L), (7L, "c", 7L), (8L, "b", 300L))
    val df = rows.toDF("id", "cat", "y")
    val k = 3
    val m = 2L
    val total = rows.map(_._3).sum
    val prior = total * 1000L / rows.size
    val r = Stats.targetEncodeLFO(df, "id", "cat", "y", nFolds = k,
        smoothing = m, seed = "te")
      .collect().map(x => (x.getLong(0), (x.getString(1), x.getLong(2),
        x.getLong(3)))).toMap
    rows.foreach { case (id, cat, _) =>
      val f = fold("te", id, k)
      val inCat = rows.filter(_._2 == cat)
      val out = inCat.filter(x => fold("te", x._1, k) != f)
      val want = (out.map(_._3).sum * 1000L + m * prior) / (out.size + m)
      assert(r(id) == ((cat, f, want)), s"id $id: ${r(id)} vs $want")
      // the leakage guarantee: the row's own target is excluded
      assert(!out.exists(_._1 == id))
    }
    // a category confined to one fold degrades to the pure prior
    val cOnly = rows.filter(_._2 == "c")
    assert(cOnly.size == 1)
    val (cid, _, _) = cOnly.head
    assert(r(cid)._3 == (0L * 1000L + m * prior) / (0L + m))
  }
}
