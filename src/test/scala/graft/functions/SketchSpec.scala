package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{hll_distinct, hll_estimate, hll_merge, hll_sketch}

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hash32 equals the SQL contract ('0x' || first 8 md5 hex)") {
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592 -> 0x5d41402a
    assert(HllSketch.hash32("hello".getBytes("UTF-8")) == 0x5d41402aL)
    assert(HllSketch.hash32("".getBytes("UTF-8")) ==
      java.lang.Long.parseLong("d41d8cd9", 16)) // md5('') = d41d8cd9...
  }

  test("estimate: single-value register array, formula replayed by hand (p=4)") {
    // one register at rho r: zNum = 15*2^29 + 2^(29-r); est = (673*256*2^29)/(1000*zNum)
    val regs = new Array[Byte](16)
    regs(3) = 5
    val zNum = BigInt(15) * (BigInt(1) << 29) + (BigInt(1) << 24)
    val expected = ((BigInt(673) * 256 << 29) / (BigInt(1000) * zNum)).toLong
    assert(HllSketch.estimate(regs) == expected)
    // all-zero registers encode cardinality exactly 0 (special-cased past
    // the raw estimator's alpha*m empty-sketch bias)
    assert(HllSketch.estimate(new Array[Byte](16)) == 0L)
  }

  test("hll_distinct: duplicates never move the estimate; exact small-set invariants") {
    val uniq = Seq.tabulate(64)(i => s"v$i").toDF("v")
    val dup = Seq.tabulate(640)(i => s"v${i % 64}").toDF("v")
    val e1 = uniq.agg(hll_distinct($"v", 12)).as[Long].head()
    val e2 = dup.agg(hll_distinct($"v", 12)).as[Long].head()
    assert(e1 == e2)
  }

  test("hll_distinct: within ~3% at p=12 over 100k distinct values (raw-estimator regime)") {
    val n = 100000L
    val df = spark.range(n).select(md5($"id".cast("string").cast("binary")).as("v"))
    val est = df.agg(hll_distinct($"v", 12)).as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.03, s"estimate $est vs $n")
  }

  test("merge of per-shard sketches is BIT-IDENTICAL to the whole-corpus sketch") {
    val df = spark.range(5000)
      .select(($"id" % 7).as("shard"), md5($"id".cast("string").cast("binary")).as("v"))
    val whole = df.agg(hll_sketch($"v", 10)).as[Array[Byte]].head()
    val merged = df.groupBy($"shard").agg(hll_sketch($"v", 10).as("sk"))
      .agg(hll_merge($"sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("estimate is partitioning-independent (register max is commutative)") {
    val df = spark.range(20000).select(md5($"id".cast("string").cast("binary")).as("v"))
    val a = df.agg(hll_distinct($"v", 12)).as[Long].head()
    val b = df.repartition(13).agg(hll_distinct($"v", 12)).as[Long].head()
    assert(a == b)
  }

  test("SQL registry path: hll_sketch/hll_merge/hll_estimate usable from SQL text") {
    spark.range(1000).select(($"id" % 4).as("g"),
      md5($"id".cast("string").cast("binary")).as("v"))
      .createOrReplaceTempView("sketch_input")
    try {
      val perG = spark.sql(
        "SELECT g, hll_estimate(hll_sketch(v, 12)) AS e FROM sketch_input GROUP BY g")
      assert(perG.count() == 4 && perG.agg(min($"e")).as[Long].head() > 0)
      val rolled = spark.sql(
        """SELECT hll_estimate(hll_merge(sk)) FROM
          |  (SELECT g, hll_sketch(v) AS sk FROM sketch_input GROUP BY g)""".stripMargin)
        .as[Long].head()
      val direct = spark.sql("SELECT hll_estimate(hll_sketch(v)) FROM sketch_input")
        .as[Long].head()
      assert(rolled == direct)
    } finally spark.catalog.dropTempView("sketch_input")
  }

  test("null values are skipped; all-null and empty groups estimate 0") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val withNulls = df.agg(hll_distinct($"v", 8)).as[Long].head()
    val withoutNulls = Seq("a", "b").toDF("v").agg(hll_distinct($"v", 8)).as[Long].head()
    assert(withNulls == withoutNulls)
    val allNull = Seq[Option[String]](None, None).toDF("v")
      .agg(hll_distinct($"v", 8)).as[Long].head()
    assert(allNull == 0L)
  }

  test("merging sketches of different precision fails loudly") {
    val a = Seq("x").toDF("v").agg(hll_sketch($"v", 8).as("sk"))
    val b = Seq("y").toDF("v").agg(hll_sketch($"v", 9).as("sk"))
    val ex = intercept[Exception] {
      a.unionByName(b).agg(hll_merge($"sk")).collect()
    }
    assert(ex.getMessage != null)
  }
}
