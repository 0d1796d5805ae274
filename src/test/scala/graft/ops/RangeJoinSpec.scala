package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(probeRows: Seq[(Long, Long)], ivRows: Seq[(Long, Long, Long)],
                  width: Long): Set[(Long, Long, Long)] =
    RangeJoin.bucketed(
        probeRows.toDF("pid", "v"), ivRows.toDF("iv", "lo", "hi"),
        "v", "lo", "hi", bucketWidth = width)
      .select("pid", "v", "iv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("bucketed equals the brute-force theta-join, overlaps yield all matches") {
    val probe = (0L until 60L).map(i => (i, (i * 37) % 200 - 50)) // negatives too
    val iv = Seq((1L, -60L, -20L), (2L, -25L, 10L), (3L, 0L, 0L),
      (4L, 5L, 180L), (5L, 150L, 160L))
    val expected = (for {
      (pid, v) <- probe; (ivId, lo, hi) <- iv if lo <= v && v <= hi
    } yield (pid, v, ivId)).toSet
    for (w <- Seq(1L, 7L, 32L, 1000L))
      assert(run(probe, iv, w) == expected, s"width=$w")
  }

  test("empty intervals (lo > hi) match nothing; boundary values inclusive") {
    val r = run(Seq((1L, 10L), (2L, 20L), (3L, 15L)),
      Seq((7L, 10L, 20L), (8L, 19L, 11L)), width = 4)
    assert(r == Set((1L, 10L, 7L), (2L, 20L, 7L), (3L, 15L, 7L)))
  }

  test("over-wide interval raises loudly instead of exploding the build side") {
    val ex = intercept[Exception] {
      RangeJoin.bucketed(Seq((1L, 5L)).toDF("pid", "v"),
          Seq((1L, 0L, 1000000L)).toDF("iv", "lo", "hi"),
          "v", "lo", "hi", bucketWidth = 2, maxBucketsPerInterval = 64)
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("plans an equi-join, never a nested loop or cartesian product") {
    val plan = RangeJoin.bucketed(
        Seq((1L, 5L)).toDF("pid", "v"),
        Seq((1L, 0L, 10L), (2L, 4L, 6L)).toDF("iv", "lo", "hi"),
        "v", "lo", "hi", bucketWidth = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("overlap: matches the naive theta-join exactly, no duplicate pairs") {
    // deterministic pseudo-random intervals, many spanning several buckets
    val as = (0L until 40L).map(i => (i, (i * 13) % 100, (i * 13) % 100 + i % 17))
      .toDF("a_id", "a_lo", "a_hi")
    val bs = (0L until 40L).map(i => (i, (i * 29) % 100, (i * 29) % 100 + i % 11))
      .toDF("b_id", "b_lo", "b_hi")
    val naive = as.crossJoin(bs)
      .where(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(naive.length == naive.toSet.size && naive.nonEmpty)
    for (w <- Seq(1L, 4L, 32L, 1000L)) {
      val got = RangeJoin.overlap(as, bs, "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.toSet.size, s"dup pairs at width=$w")
      assert(got.toSet == naive.toSet, s"mismatch at width=$w")
    }
    // touching endpoints count (closed intervals); disjoint do not
    val t = RangeJoin.overlap(
      Seq((1L, 0L, 5L)).toDF("a_id", "a_lo", "a_hi"),
      Seq((9L, 5L, 8L), (10L, 6L, 8L)).toDF("b_id", "b_lo", "b_hi"),
      "a_lo", "a_hi", "b_lo", "b_hi", 4L)
      .select("b_id").collect().map(_.getLong(0)).toSet
    assert(t == Set(9L))
    // still an equi-join in the plan
    val plan = RangeJoin.overlap(as, bs, "a_lo", "a_hi", "b_lo", "b_hi", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
