package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{bloom_agg, bloom_contains, bloom_merge, cms_merge, cms_query, cms_sketch, hll_distinct, hll_estimate, hll_merge, hll_sketch, qsketch_agg, qsketch_count, qsketch_merge, qsketch_quantile}

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

  // ---- count-min sketch ----

  test("cms: NEVER underestimates, and is exact on a wide sketch with no collisions") {
    val df = Seq.tabulate(300)(i => s"tok${i % 9}").toDF("v")
    val exact = df.groupBy($"v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = df.agg(cms_sketch($"v", 4096, 4).as("sk"))
    val wide = exact.keys.toSeq.sorted.map { t =>
      t -> sk.select(cms_query($"sk", lit(t))).as[Long].head()
    }
    wide.foreach { case (t, est) => assert(est == exact(t), s"wide cms wrong for $t") }
    // tight sketch: collisions force overestimates but never underestimates
    val tight = df.agg(cms_sketch($"v", 4, 2).as("sk"))
    exact.keys.foreach { t =>
      val est = tight.select(cms_query($"sk", lit(t))).as[Long].head()
      assert(est >= exact(t), s"cms UNDERestimated $t: $est < ${exact(t)}")
    }
    // absent value on the wide sketch: zero
    assert(sk.select(cms_query($"sk", lit("absent"))).as[Long].head() == 0L)
  }

  test("cms: partitioning-independent (merge is elementwise sum) and bit-identical") {
    val df = spark.range(4000).select(($"id" % 131).cast("string").as("v"))
    val a = df.agg(cms_sketch($"v", 64, 4)).as[Array[Byte]].head()
    val b = df.repartition(11).agg(cms_sketch($"v", 64, 4)).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(a, b))
  }

  test("cms_merge / bloom_merge: per-shard rollup equals whole-corpus, BIT-IDENTICAL") {
    val df = spark.range(3000)
      .select(($"id" % 5).as("shard"), ($"id" % 211).cast("string").as("v"))
    val wholeCms = df.agg(cms_sketch($"v", 64, 4)).as[Array[Byte]].head()
    val rolledCms = df.groupBy($"shard").agg(cms_sketch($"v", 64, 4).as("sk"))
      .agg(cms_merge($"sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(wholeCms, rolledCms))
    val wholeBloom = df.agg(bloom_agg($"v", 1024, 3)).as[Array[Byte]].head()
    val rolledBloom = df.groupBy($"shard").agg(bloom_agg($"v", 1024, 3).as("bl"))
      .agg(bloom_merge($"bl")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(wholeBloom, rolledBloom))
  }

  test("cms_merge / bloom_merge: shape mismatches fail loudly") {
    val c1 = Seq("x").toDF("v").agg(cms_sketch($"v", 8, 2).as("sk"))
    val c2 = Seq("y").toDF("v").agg(cms_sketch($"v", 8, 3).as("sk"))
    assert(intercept[Exception] {
      c1.unionByName(c2).agg(cms_merge($"sk")).collect()
    }.toString.nonEmpty)
    val b1 = Seq("x").toDF("v").agg(bloom_agg($"v", 256, 3).as("bl"))
    val b2 = Seq("y").toDF("v").agg(bloom_agg($"v", 512, 3).as("bl"))
    assert(intercept[Exception] {
      b1.unionByName(b2).agg(bloom_merge($"bl")).collect()
    }.toString.nonEmpty)
  }

  test("cms: SQL registry path") {
    spark.range(100).select(($"id" % 5).cast("string").as("v"))
      .createOrReplaceTempView("cms_input")
    try {
      val est = spark.sql(
        "SELECT cms_query(cms_sketch(v, 1024, 4), '3') FROM cms_input").as[Long].head()
      assert(est == 20L)
    } finally spark.catalog.dropTempView("cms_input")
  }

  // ---- bloom filter ----

  test("bloom: ZERO false negatives over every member; empty filter contains nothing") {
    val members = Seq.tabulate(200)(i => s"member-$i")
    val df = members.toDF("v")
    val bloom = df.agg(bloom_agg($"v", 2048, 5).as("bl"))
    val misses = bloom
      .crossJoin(members.toDF("m"))
      .select(bloom_contains($"bl", $"m")).as[Boolean].collect()
    assert(misses.forall(identity), "bloom false negative")
    val empty = Seq.empty[String].toDF("v").agg(bloom_agg($"v", 256, 3).as("bl"))
    assert(!empty.select(bloom_contains($"bl", lit("anything"))).as[Boolean].head())
  }

  test("bloom: partitioning-independent (merge is bitwise OR) and bit-identical") {
    val df = spark.range(1000).select($"id".cast("string").as("v"))
    val a = df.agg(bloom_agg($"v", 4096, 3)).as[Array[Byte]].head()
    val b = df.repartition(13).agg(bloom_agg($"v", 4096, 3)).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(a, b))
  }

  test("bloom: false-positive rate at the design point is near theory, and deterministic") {
    // n=256 members in m=4096 bits, k=3: (1 - e^(-kn/m))^k ~ 0.5%
    val members = spark.range(256).select(concat(lit("m"), $"id").as("v"))
    val bloom = members.agg(bloom_agg($"v", 4096, 3).as("bl"))
    val probes = spark.range(10000).select(concat(lit("p"), $"id").as("q"))
    val fp = bloom.crossJoin(probes)
      .select(bloom_contains($"bl", $"q").as("hit"))
      .where($"hit").count()
    assert(fp < 200, s"false-positive count $fp out of 10000 is far above theory")
    val fp2 = bloom.crossJoin(probes.repartition(7))
      .select(bloom_contains($"bl", $"q").as("hit"))
      .where($"hit").count()
    assert(fp == fp2, "false positives must be deterministic")
  }

  test("bloom/cms: SQL registry path for bloom, malformed sketch fails loudly") {
    spark.range(50).select($"id".cast("string").as("v"))
      .createOrReplaceTempView("bloom_input")
    try {
      val r = spark.sql(
        """SELECT bool_and(bloom_contains(bl, '7')) FROM
          |  (SELECT bloom_agg(v, 512, 3) AS bl FROM bloom_input)""".stripMargin)
        .as[Boolean].head()
      assert(r)
    } finally spark.catalog.dropTempView("bloom_input")
    val ex = intercept[Exception] {
      Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("bl")
        .select(bloom_contains($"bl", lit("x"))).collect()
    }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(messages.exists(_.contains("malformed bloom filter")), messages.mkString(" | "))
  }

  // ---- log2-histogram quantile sketch ----

  test("qsketch bucket grammar: exact below 2^(s+1), then (h-s)*2^s + v>>(h-s); lowerBound inverts") {
    val s = 5
    // exact region: every value is its own bucket
    for (v <- 0L until 64L) assert(QSketch.bucketOf(v, s) == v.toInt)
    // first log region boundary
    assert(QSketch.bucketOf(64L, s) == 64)   // h=6: (6-5)*32 + 64>>1 = 32+32
    assert(QSketch.bucketOf(65L, s) == 64)   // 65>>1 = 32 -> same bucket
    assert(QSketch.bucketOf(127L, s) == 95)  // 32 + 63
    assert(QSketch.bucketOf(128L, s) == 96)  // h=7: 64 + 32
    // lowerBound is the true lower edge of every bucket the values map to
    for (v <- Seq(1L, 63L, 64L, 65L, 100L, 1000L, 123456L, Long.MaxValue)) {
      val i = QSketch.bucketOf(v, s)
      val lb = QSketch.lowerBound(i, s)
      assert(lb <= v, s"lowerBound($i)=$lb > $v")
      assert(QSketch.bucketOf(lb, s) == i, s"lowerBound($i)=$lb not in bucket $i")
      // relative value error bound 2^-s
      assert(v - lb <= math.max(1L, lb >> s), s"v=$v lb=$lb exceeds 2^-s width")
    }
  }

  test("qsketch quantile: rank target is ceil(n*q/1000) over bucket lower bounds") {
    val s = 5
    val counts = new Array[Long](QSketch.numBuckets(s))
    // values 1..100 once each: quantiles are exact below 64, bucketed above
    for (v <- 1L to 100L) counts(QSketch.bucketOf(v, s)) += 1
    assert(QSketch.quantile(counts, s, 500).contains(50L))   // rank 50 -> value 50
    assert(QSketch.quantile(counts, s, 10).contains(1L))     // rank 1
    assert(QSketch.quantile(counts, s, 1000).contains(100L)) // rank 100 -> bucket lb of 100
    assert(QSketch.quantile(new Array[Long](QSketch.numBuckets(s)), s, 500).isEmpty)
  }

  test("qsketch merge of per-shard sketches is BIT-IDENTICAL to the whole-corpus sketch") {
    val df = spark.range(5000).select(($"id" % 7).as("shard"), ($"id" * 37 % 9001).as("v"))
    val whole = df.agg(qsketch_agg($"v", 5)).as[Array[Byte]].head()
    val merged = df.groupBy($"shard").agg(qsketch_agg($"v", 5).as("sk"))
      .agg(qsketch_merge($"sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("qsketch quantile error is within the 2^-s relative bound vs exact percentiles") {
    val n = 20000L
    val df = spark.range(n).select((($"id" * 2654435761L) % 1000003L).as("v"))
    val sk = df.agg(qsketch_agg($"v", 5)).as[Array[Byte]].head()
    val exact = df.selectExpr("percentile(v, array(0.5, 0.9, 0.99))")
      .as[Seq[Double]].head()
    for ((qp, ex) <- Seq(500, 900, 990).zip(exact)) {
      val (s, counts) = QSketch.decode(sk)
      val est = QSketch.quantile(counts, s, qp).get
      // lower bound of the true value's bucket: est <= true < est * (1 + 2^-s) + 1
      assert(est <= ex + 1, s"q$qp: est $est above exact $ex")
      assert(ex <= est * (1.0 + 1.0 / 32) + 1, s"q$qp: est $est too far below exact $ex")
    }
  }

  test("qsketch is partitioning-independent and duplicate-stable counters") {
    val df = spark.range(10000).select((($"id" % 997) + 1).as("v"))
    val a = df.agg(qsketch_agg($"v", 5)).as[Array[Byte]].head()
    val b = df.repartition(13).agg(qsketch_agg($"v", 5)).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(a, b))
  }

  test("qsketch SQL registry path + negative value and resolution-mismatch errors") {
    spark.range(100).select(($"id" + 1).as("v")).createOrReplaceTempView("qsk_t")
    val row = spark.sql(
      """SELECT qsketch_quantile(qsketch_agg(v, 5), 500) AS p50,
        |       qsketch_count(qsketch_agg(v, 5)) AS n FROM qsk_t""".stripMargin).head()
    assert(row.getLong(0) == 50L && row.getLong(1) == 100L)
    val neg = intercept[Exception] {
      spark.range(3).select(($"id" - 1).as("v")).agg(qsketch_agg($"v", 5)).collect()
    }
    val msgs = Iterator.iterate[Throwable](neg)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("non-negative")), msgs.mkString(" | "))
    val mix = intercept[Exception] {
      spark.range(100)
        .select(($"id" % 2).as("g"), ($"id" + 1).as("v"))
        .groupBy($"g")
        .agg((when($"g" === 0, qsketch_agg($"v", 4)).otherwise(qsketch_agg($"v", 5))).as("sk"))
        .agg(qsketch_merge($"sk")).collect()
    }
    val mmsgs = Iterator.iterate[Throwable](mix)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(mmsgs.exists(_.contains("different resolution")), mmsgs.mkString(" | "))
  }
}
