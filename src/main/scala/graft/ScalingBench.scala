package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.json north_rule): the same
  * feature-extraction job over the SAME parquet input at N and 4N
  * parallelism (local[8] vs local[32] stands in for N->4N executors in this
  * sandbox). Each parallelism level runs in its OWN JVM — like separate
  * executor sets — because a shared JVM accumulates heap state across
  * sessions and poisons the second measurement.
  *
  * Subcommands (driven by scripts/scaling.sh or manually):
  *   gen <urls> <docScale> <path>          — materialize the shared corpus
  *   run <cores> <path>                    — warmup + timed run, prints JSON
  *   report <pages> <n1> <t1> <n2> <t2>    — append BENCH/BASELINE.md
  *
  * No-arg main runs gen+report inline and shells out run legs via the
  * current JVM only when spawning is impossible; prefer the script.
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      // heavy-doc corpora compress well; cap split size so the scan stage
      // yields enough tasks for 32 cores even on a ~1-2 GB input
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def runOnce(spark: SparkSession, inputPath: String): Double = {
    val pages = spark.read.parquet(inputPath)
    val df = graft.runtime.FeatureJob.pipeline(
      pages, graft.runtime.FeatureJob.Config(outDir = "unused"))
    val t0 = System.nanoTime()
    Bench.exhaust(df)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("gen") =>
      val urls = args(1).toInt
      val docScale = args(2).toInt
      val path = args(3)
      val cfg = graft.pages.PageGen.Config(urls = urls, revisitsPerUrl = 8,
        hotUrls = 10, hotFactor = 50, docScale = docScale)
      val s = session(32)
      graft.pages.PageGen.pages(s, cfg, Some(256)).toDF()
        .write.mode("overwrite").parquet(path)
      println(s"""{"generated":${graft.pages.PageGen.totalRows(cfg)},"path":"$path"}""")
      s.stop()

    case Some("run") =>
      val cores = args(1).toInt
      val path = args(2)
      val s = session(cores)
      val warm = runOnce(s, path) // JIT + page cache, not reported
      val timed = runOnce(s, path)
      println(f"""{"cores":$cores,"warmupSec":$warm%.2f,"sec":$timed%.2f}""")
      s.stop()

    case Some("report") =>
      val pages = args(1).toLong
      val nSmall = args(2).toInt
      val tSmall = args(3).toDouble
      val nBig = args(4).toInt
      val tBig = args(5).toDouble
      val ratio = nBig.toDouble / nSmall
      val efficiency = (tSmall / tBig) / ratio
      val thrSmall = pages / tSmall
      val thrBig = pages / tBig
      println(f"""{"pages":$pages,"cores_small":$nSmall,"cores_big":$nBig,""" +
        f""""sec_small":$tSmall%.2f,"sec_big":$tBig%.2f,""" +
        f""""pages_per_sec_small":$thrSmall%.1f,"pages_per_sec_big":$thrBig%.1f,""" +
        f""""scaling_efficiency":$efficiency%.3f}""")
      val md =
        f"""
           |## Scaling run (${java.time.Instant.now} UTC)
           |
           |Same job (full feature pipeline: gbd_hash + cnf_features + hash
           |repartition on url + sessionize + lag/delta), same parquet input
           |($pages%,d pages, hot-url skew built in), each parallelism level
           |in its own JVM:
           |
           || cores | wall sec | pages/sec |
           || --- | --- | --- |
           || $nSmall | $tSmall%.2f | $thrSmall%.1f |
           || $nBig | $tBig%.2f | $thrBig%.1f |
           |
           |Scaling efficiency (T_$nSmall / T_$nBig) / ${ratio.toInt} = **$efficiency%.3f**
           |(target >= 0.8, BASELINE.json north_rule).
           |""".stripMargin
      Files.createDirectories(Paths.get("BENCH"))
      val target = Paths.get("BENCH", "BASELINE.md")
      val existing = if (Files.exists(target)) new String(Files.readAllBytes(target), StandardCharsets.UTF_8)
        else "# BENCH/BASELINE.md — measured numbers for the graft engine\n"
      Files.write(target, (existing + md).getBytes(StandardCharsets.UTF_8))

    case _ =>
      System.err.println("usage: ScalingBench gen|run|report ... (see scripts/scaling.sh)")
      sys.exit(2)
  }
}
