package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.zorder_key

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Naive bit-loop reference for the mask-spread implementation. */
  private def naive(a: Long, b: Long): Long = {
    var k = 0L
    for (i <- 0 until 31) {
      k |= ((a >> i) & 1L) << (2 * i)
      k |= ((b >> i) & 1L) << (2 * i + 1)
    }
    k
  }

  test("interleave matches the naive bit-loop reference across the range") {
    val samples = Seq(0L, 1L, 2L, 3L, 63L, 64L, 1023L, 65535L, 123456789L,
      ZOrder.MaxDim, ZOrder.MaxDim - 1)
    for (a <- samples; b <- samples) {
      assert(ZOrder.interleave(a, b) == naive(a, b), s"($a, $b)")
    }
    // hand-checked corner: a=0b101, b=0b011 -> 0b011011 read as
    // (b2 a2 b1 a1 b0 a0) = 0,1,1,0,1,1
    assert(ZOrder.interleave(5L, 3L) == 27L)
  }

  test("monotone in each dimension when the other is fixed; key < 2^62") {
    val vals = Seq(0L, 1L, 7L, 100L, 5000L, 1000000L, ZOrder.MaxDim)
    for (fix <- vals) {
      val alongA = vals.map(ZOrder.interleave(_, fix))
      assert(alongA == alongA.sorted, s"not monotone in a at b=$fix")
      val alongB = vals.map(ZOrder.interleave(fix, _))
      assert(alongB == alongB.sorted, s"not monotone in b at a=$fix")
    }
    assert(ZOrder.interleave(ZOrder.MaxDim, ZOrder.MaxDim) == (1L << 62) - 1)
  }

  test("z-range buckets bound BOTH dimension spans (the data-skipping property)") {
    // full 1024 x 512 grid; shift-14 buckets carry 7 low bits of each dim,
    // so within any bucket a spans <= 127 and b spans <= 127
    val grid = for (a <- 0L until 1024L by 3; b <- 0L until 512L by 3) yield (a, b)
    val spans = grid.groupBy { case (a, b) => ZOrder.interleave(a, b) >> 14 }
      .values.map { pts =>
        val as = pts.map(_._1); val bs = pts.map(_._2)
        (as.max - as.min, bs.max - bs.min)
      }
    assert(spans.nonEmpty)
    for ((aSpan, bSpan) <- spans) {
      assert(aSpan <= 127 && bSpan <= 127, s"spans ($aSpan, $bSpan)")
    }
  }

  test("codegen path agrees with the interpreted path and stays whole-stage") {
    val df = spark.range(20000)
      .select(($"id" % 1024).as("a"), (($"id" * 7) % 512).as("b"))
      .select($"a", $"b", zorder_key($"a", $"b").as("k"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getLong(2) == naive(r.getLong(0), r.getLong(1))))
    // the mask-spread must be INLINED in the generated Java of the fused
    // stage (doGenCode ran, not an eval fallback)
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("0x0000ffff0000ffffL"), gen.take(2000))
  }

  test("SQL registry path + out-of-range dimensions error") {
    assert(spark.sql("SELECT zorder_key(5, 3)").head().getLong(0) == 27L)
    val ex = intercept[Exception] {
      spark.range(1).select(zorder_key(lit(-1L), lit(0L))).collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("zorder_key dimensions")), msgs.mkString(" | "))
    val ex2 = intercept[Exception] {
      spark.range(1).select(zorder_key(lit(1L << 31), lit(0L))).collect()
    }
    val msgs2 = Iterator.iterate[Throwable](ex2)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs2.exists(_.contains("zorder_key dimensions")), msgs2.mkString(" | "))
  }
}

class HilbertSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.functions.Hilbert

  test("hilbert: order-1 and order-2 curves match the canonical visit sequence") {
    assert(Hilbert.xy2d(1, 0, 0) == 0L && Hilbert.xy2d(1, 0, 1) == 1L &&
      Hilbert.xy2d(1, 1, 1) == 2L && Hilbert.xy2d(1, 1, 0) == 3L)
    val visit2 = Seq((0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3),
      (1, 2), (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1), (2, 0), (3, 0))
    visit2.zipWithIndex.foreach { case ((x, y), d) =>
      assert(Hilbert.xy2d(2, x, y) == d.toLong, s"($x,$y)")
    }
  }

  test("hilbert: consecutive indexes are always grid neighbors (the locality Z-order lacks)") {
    val order = 4
    val n = 1 << order
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield Hilbert.xy2d(order, x, y) -> ((x, y))).toMap
    assert(byD.size == n * n, "bijective")
    (0 until n * n - 1).foreach { d =>
      val (x1, y1) = byD(d.toLong)
      val (x2, y2) = byD(d.toLong + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$d and ${d + 1}")
    }
    // Morton DOES jump (e.g. d=3 -> 4 crosses the space): the property is
    // not vacuous
    val mort = (for (x <- 0 until n; y <- 0 until n)
      yield graft.functions.ZOrder.interleave(x, y) -> ((x, y))).toMap
    val jumps = (0 until n * n - 1).count { d =>
      val (x1, y1) = mort(d.toLong); val (x2, y2) = mort(d.toLong + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(jumps > 0)
  }

  test("hilbert_key expression: column API, out-of-range errors loudly") {
    val df = Seq((0L, 0L), (3L, 2L)).toDF("x", "y")
    val r = df.select(graft.functions.hilbert_key(col("x"), col("y"), 2)
      .as("d")).orderBy("d").collect().map(_.getLong(0))
    assert(r.toSeq == Seq(0L, 11L))
    val bad = Seq((4L, 0L)).toDF("x", "y")
    assertThrows[Exception] {
      bad.select(graft.functions.hilbert_key(col("x"), col("y"), 2)).collect()
    }
  }
}
