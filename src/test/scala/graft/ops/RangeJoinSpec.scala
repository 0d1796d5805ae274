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
}
