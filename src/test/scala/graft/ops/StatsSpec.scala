package graft.ops

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
}
