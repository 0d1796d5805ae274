package graft.runtime

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.pages.PageGen
import graft.temporal.Windows

/** The end-to-end feature pipeline (SURVEY.md §2.9), spark-submit-able:
  *
  *   pages(url, warc_ts, html, text, lang)
  *     -> instance_id = gbd_hash(text)            [N2, streaming md5]
  *     -> features    = cnf_features(text)        [A1-A4 fused, one pass/row]
  *     -> status      = ok | parse_error | null_text
  *     -> ONE range repartition on (url, warc_ts) feeds the whole window
  *        stage exchange-free: sessionize [W4], lag/delta [W1], backfill [W2]
  *     -> per-shard parquet + atomic lineage manifest + metrics
  *
  * Scale design: work is split into `shards` by url hash; every shard is an
  * independent idempotent write (mode=overwrite into its own directory) and
  * is recorded in the manifest only after the write is durable, so a killed
  * job resumes by processing exactly the missing shards (ResumeSpec proves
  * output equality). Hot-url skew inside a shard is handled by AQE; the
  * shard split itself spreads urls uniformly (xxhash64). On a real Iceberg
  * layout the shard predicate becomes a storage-partition prune instead of
  * a scan filter — the facade keeps that swap local to `shardFilter`.
  */
object FeatureJob {

  final case class Config(
      outDir: String,
      shards: Int = 8,
      sessionGapSeconds: Long = 6 * 3600,
      lagFeatures: Seq[String] = Seq("clauses", "variables"),
      resume: Boolean = true,
      /** document grammar: cnf | wcnf | opb (S2 format dispatch) */
      format: String = "cnf",
      /** carry raw html/text through to the output table (default off: the
        * feature table needs identity + features, not payload — dragging
        * multi-KB payloads through the window exchange dominates runtime)
        */
      keepPayload: Boolean = false)

  final case class RunReport(
      processedShards: Seq[Int],
      skippedShards: Seq[Int],
      rows: Long,
      wallMs: Long)

  /** Deterministic shard of a url. */
  def shardCol(shards: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("url")), lit(shards)).cast("int")

  /** The per-row feature stage — no shuffle, fully parallel. */
  def extractStage(pages: DataFrame): DataFrame = extractStage(pages, "cnf")

  def extractStage(pages: DataFrame, format: String): DataFrame = format match {
    case "cnf" =>
      // fused hot path: one expression evaluation per row for hash+features
      pages
        .withColumn("_x", cnf_extract(col("text")))
        .withColumn("instance_id", col("_x.instance_id"))
        .withColumn("features", col("_x.features"))
        .withColumn("status",
          when(col("text").isNull, "null_text")
            .when(!col("_x.parse_ok"), "parse_error")
            .otherwise("ok"))
        .drop("_x")
    case _ =>
      val (hash, features) = format match {
        case "wcnf" => (gbd_hash_wcnf(col("text")), wcnf_features(col("text")))
        case _ => (gbd_hash_opb(col("text")), opb_features(col("text")))
      }
      pages
        .withColumn("instance_id", hash)
        .withColumn("features", features)
        .withColumn("status",
          when(col("text").isNull, "null_text")
            .when(col("features").isNull, "parse_error")
            .otherwise("ok"))
  }

  /** The corpus stage: sessionization + revisit features. One explicit HASH
    * repartition on url serves every window below it (all window specs are
    * partitionBy(url) orderBy(warc_ts)), and the sortWithinPartitions
    * satisfies their sort order — check with .explain: a single Exchange,
    * a single Sort, shared by the whole window stage. Payload columns are
    * dropped first unless keepPayload: shuffling multi-KB html/text through
    * the window exchange would dominate the stage.
    */
  def temporalStage(extracted: DataFrame, cfg: Config): DataFrame = {
    val slim =
      if (cfg.keepPayload) extracted
      else extracted.drop("html", "text")
    val partitioned = slim
      .repartition(col("url"))
      .sortWithinPartitions(col("url"), col("warc_ts"))
    val sessionized = Windows.sessionize(partitioned, Seq("url"), "warc_ts", cfg.sessionGapSeconds)
    // revisit deltas over selected features (limited to fields the format's
    // schema actually has); lag carries the previous snapshot value
    // (leakage-free: trailing frame)
    val available = extracted.schema("features").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    cfg.lagFeatures.filter(available.contains).foldLeft(sessionized) { (df, f) =>
      val c = col(s"features.$f")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("url")).orderBy(col("warc_ts").asc)
      df.withColumn(s"${f}_prev", lag(c, 1).over(w))
        .withColumn(s"${f}_delta", c - lag(c, 1).over(w))
    }
  }

  def pipeline(pages: DataFrame, cfg: Config): DataFrame =
    temporalStage(extractStage(pages, cfg.format), cfg)

  /** Unordered content checksum of a shard output (resume equality proof):
    * sum of per-row xxhash64 over the identity columns.
    */
  private def checksumOf(df: DataFrame): Long =
    // decimal accumulation: exact under ANSI mode (long sum would overflow)
    df.select(sum(xxhash64(col("url"), col("warc_ts"), coalesce(col("instance_id"), lit("")))
        .cast("decimal(20,0)")).as("c"))
      .head().getAs[Any]("c") match {
      case null => 0L
      case x: java.math.BigDecimal => x.longValue()
      case x: Long => x
    }

  /** Fingerprint of the input relation: schema + row count (cheap; a real
    * Iceberg table would use its snapshot id here).
    */
  def fingerprint(pages: DataFrame): String = {
    val schemaHash = java.lang.Integer.toHexString(pages.schema.simpleString.hashCode)
    s"$schemaHash-${pages.count()}"
  }

  /** Run resumably: process every shard missing from the manifest. */
  def run(spark: SparkSession, pages: DataFrame, cfg: Config): RunReport = {
    val t0 = System.currentTimeMillis()
    val listener = new GraftMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val fp = fingerprint(pages)
      val done = if (cfg.resume) Manifest.completed(cfg.outDir, fp) else Map.empty[Int, Manifest.Entry]
      val todo = (0 until cfg.shards).filterNot(done.contains)
      var totalRows = 0L
      val withShard = pages.withColumn("_shard", shardCol(cfg.shards))

      todo.foreach { shard =>
        val s0 = System.currentTimeMillis()
        val shardPages = withShard.where(col("_shard") === shard).drop("_shard")
        val out = pipeline(shardPages, cfg)
        val path = s"${cfg.outDir}/data/shard=$shard"
        out.write.mode("overwrite").parquet(path)
        val written = spark.read.parquet(path)
        val rows = written.count()
        val checksum = checksumOf(written)
        totalRows += rows
        Manifest.commit(cfg.outDir, Manifest.Entry(
          shard, rows, checksum, path, fp,
          System.currentTimeMillis() - s0, System.currentTimeMillis()))
      }

      Files.createDirectories(Paths.get(cfg.outDir))
      Files.write(Paths.get(cfg.outDir, "metrics.json"),
        listener.toJson.getBytes(StandardCharsets.UTF_8))
      RunReport(todo, done.keys.toSeq.sorted, totalRows, System.currentTimeMillis() - t0)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  /** spark-submit entry:
    *   FeatureJob <pagesParquetPath|gen:N> <outDir> [shards] [gapSeconds]
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FeatureJob <pagesPath|gen:urls> <outDir> [shards] [gapSeconds]")
    val builder = SparkSession.builder()
      .appName("graft-feature-job")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // under spark-submit the master arrives via system properties; fall back
    // to all local cores for direct JVM launches (sbt runMain, tests)
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")))
      .getOrCreate()
    val pages =
      if (args(0).startsWith("gen:"))
        PageGen.pages(spark, PageGen.Config(urls = args(0).stripPrefix("gen:").toInt)).toDF()
      else spark.read.parquet(args(0))
    val cfg = Config(
      outDir = args(1),
      shards = if (args.length > 2) args(2).toInt else 8,
      sessionGapSeconds = if (args.length > 3) args(3).toLong else 6 * 3600)
    val report = run(spark, pages, cfg)
    // single-line machine-readable report
    println(s"""{"processed":${report.processedShards.size},"skipped":${report.skippedShards.size},""" +
      s""""rows":${report.rows},"wallMs":${report.wallMs}}""")
    spark.stop()
  }
}
