package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.json north_rule): the same
  * feature-extraction job over the SAME parquet input at N and 4N
  * parallelism (local[8] vs local[32] stands in for N->4N executors in this
  * sandbox). Reports throughput at both plus efficiency
  * (T_N / T_4N) / 4 and appends the measurement to BENCH/BASELINE.md.
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def runOnce(spark: SparkSession, inputPath: String, partitions: Int): Double = {
    // no repartition: shuffling the multi-GB payload corpus before extract
    // would swamp the measurement; parallelism comes from the input's file
    // splits (written with ample partitions) + maxPartitionBytes
    val pages = spark.read.parquet(inputPath)
    val df = graft.runtime.FeatureJob.pipeline(
      pages,
      graft.runtime.FeatureJob.Config(outDir = "unused"))
    val t0 = System.nanoTime()
    Bench.exhaust(df)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nSmall = if (args.length > 0) args(0).toInt else 8
    val nBig = if (args.length > 1) args(1).toInt else 32
    val urls = if (args.length > 2) args(2).toInt else 20000
    val docScale = if (args.length > 3) args(3).toInt else 8

    // materialize one shared input corpus (generation excluded from timing).
    // docScale makes per-row kernel work dominate scheduling overheads, the
    // regime a real multi-hundred-KB web page corpus lives in.
    val input = Files.createTempDirectory("graft_scaling").resolve("pages").toString
    val cfg = graft.pages.PageGen.Config(urls = urls, revisitsPerUrl = 8,
      hotUrls = 10, hotFactor = 50, docScale = docScale)
    val nPages = graft.pages.PageGen.totalRows(cfg)
    locally {
      val s = session(nBig)
      graft.pages.PageGen.pages(s, cfg, Some(nBig * 4)).toDF()
        .write.mode("overwrite").parquet(input)
      s.stop()
    }

    def measure(cores: Int): Double = {
      val s = session(cores)
      try {
        val w = runOnce(s, input, cores * 4) // warmup (JIT + code cache), not timed
        System.err.println(f"[scaling] cores=$cores warmup=$w%.1fs")
        val timed = runOnce(s, input, cores * 4)
        System.err.println(f"[scaling] cores=$cores timed=$timed%.1fs")
        timed
      } finally s.stop()
    }

    val tSmall = measure(nSmall)
    val tBig = measure(nBig)
    val ratio = nBig.toDouble / nSmall.toDouble
    val efficiency = (tSmall / tBig) / ratio
    val thrSmall = nPages / tSmall
    val thrBig = nPages / tBig

    val json =
      f"""{"pages":$nPages,"cores_small":$nSmall,"cores_big":$nBig,""" +
        f""""sec_small":$tSmall%.2f,"sec_big":$tBig%.2f,""" +
        f""""pages_per_sec_small":$thrSmall%.1f,"pages_per_sec_big":$thrBig%.1f,""" +
        f""""scaling_efficiency":$efficiency%.3f}"""
    println(json)

    val md =
      f"""
         |## Scaling run (${java.time.Instant.now} UTC)
         |
         |Same job (full feature pipeline: gbd_hash + cnf_features + range
         |repartition + sessionize + lag/delta), same parquet input
         |($nPages%,d pages, hot-url skew built in), two parallelism levels:
         |
         || cores | wall sec | pages/sec |
         || --- | --- | --- |
         || $nSmall | $tSmall%.2f | $thrSmall%.1f |
         || $nBig | $tBig%.2f | $thrBig%.1f |
         |
         |Scaling efficiency (T_$nSmall / T_$nBig) / ${ratio.toInt} = **$efficiency%.3f**
         |(target >= 0.8, BASELINE.json north_rule).
         |""".stripMargin

    val benchDir = Paths.get("BENCH")
    Files.createDirectories(benchDir)
    val target = benchDir.resolve("BASELINE.md")
    val existing = if (Files.exists(target)) new String(Files.readAllBytes(target), StandardCharsets.UTF_8) else
      "# BENCH/BASELINE.md — measured numbers for the graft engine\n"
    Files.write(target, (existing + md).getBytes(StandardCharsets.UTF_8))
  }
}
