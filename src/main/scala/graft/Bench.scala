package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every SparkEntry query
  * on SPARK_GRAFT_SF_DIR plus the feature-extraction pipeline throughput on
  * a deterministic synthetic pages corpus, printing ONE JSON line.
  */
object Bench {

  /** Force full computation without disk I/O. */
  def exhaust(df: org.apache.spark.sql.DataFrame): Long = {
    df.write.format("noop").mode("overwrite").save()
    0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the sf tables are single parquet files; the 128 MB default split
      // size would make every scan (and the kernel work fused above it) a
      // single task on one core — cap split size so small files still fan
      // out across the 32 cores
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      // AQE coalesces post-shuffle stages by BYTE size, but the kernel
      // queries (q21-q25) run hundreds of ops per input byte above the
      // exchange — size-based coalescing would fold their compute onto 1-2
      // cores. Keep post-shuffle partitions small enough to stay fanned out.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (256L << 10).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT/classloading warmup on the smallest SF (excluded from timings)
    try SparkEntry.queries.values.foreach(fn => exhaust(fn(spark, "/root/testdata/sf0.001")))
    catch { case _: Throwable => () }

    // noop-write exhaust (NOT .count()): count lets Catalyst prune projected
    // columns, eliding the very expression work a projection query times.
    //
    // Per-query timing is the MEDIAN of three ALTERNATING reps: this host
    // shows episodic multi-second contention windows (BENCH_r02 recorded
    // 18.7 s for a query that re-measures at 0.45 s on a quiet draw), and a
    // single-shot artifact of record is hostage to one bad window. Round-
    // robin reps (q01..qNN, q01..qNN, ...) decorrelate a contention window
    // from any single query; the median then discards it entirely.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val reps = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    // a failing query must be VISIBLE in the artifact: its wall time is the
    // time-to-throw (misleadingly fast), so failures are reported alongside
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    for (_ <- 1 to 3; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try exhaust(fn(spark, sfDir))
      catch {
        case e: Throwable => errors.getOrElseUpdate(name,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
      reps(name) = ((System.nanoTime() - t0) / 1e9) :: reps(name)
    }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    names.foreach { name => results(name) = reps(name).sorted.apply(1) }

    // feature-extraction pipeline throughput (pages/sec) on a deterministic
    // synthetic corpus — the BASELINE.json headline metric
    val cfg = graft.pages.PageGen.Config(urls = 6000, revisitsPerUrl = 8, hotUrls = 6, hotFactor = 50)
    val nPages = graft.pages.PageGen.totalRows(cfg)
    val pages = graft.pages.PageGen.pages(spark, cfg, Some(cpus.toInt * 2)).toDF()
    // warm with the FULL pipeline once (the first pass after 25 queries
    // pays their heap/JIT debris, measured 2.4x on an otherwise 1.7 s job),
    // then report the MEDIAN of three timed passes — the host shows
    // episodic 2x contention noise and the headline metric should not be
    // hostage to a single draw
    def pipeOnce(): Double = {
      val t0 = System.nanoTime()
      exhaust(graft.runtime.FeatureJob.pipeline(pages, graft.runtime.FeatureJob.Config(outDir = "unused")))
      (System.nanoTime() - t0) / 1e9
    }
    pipeOnce() // warm
    // median of FIVE for the headline metric: a sustained contention
    // stretch can cover three consecutive reps (observed), five raises the
    // odds at least three land quiet for a few extra seconds of runtime
    val featSec = Seq.fill(5)(pipeOnce()).sorted.apply(2)
    results("feature_pipeline") = featSec
    val pagesPerSec = nPages / featSec

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.sum
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString(""","errors":{""", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"pages_per_sec":$pagesPerSec%.1f,"feature_pages":$nPages$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
