package graft

import org.apache.spark.sql.SparkSession

/** Targeted measurement harness for optimization work (guide §1: isolate the
  * query, noop sink, label jobs, capture plans). NOT the driver contract —
  * [[Bench]] stays frozen; this main exists so per-query before/after numbers
  * and `.explain("formatted")` plan files can be produced without paying a
  * full 289-query sweep per iteration.
  *
  * Usage: `sbt "runMain graft.BenchExtra q100_neardup_incremental q92_neardup_dedup"`
  *  - env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench
  *  - env SPARK_GRAFT_PLAN_DIR: if set, writes <dir>/<query>.txt with the
  *    formatted plan of each named query (the plans/r06 artifact source)
  *  - env SPARK_GRAFT_REPS (default 3): timed reps per query; the median is
  *    reported, same methodology as Bench (alternating reps, noop exhaust)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names, e.g. q100_neardup_incremental")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (256L << 10).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = args.toSeq
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query $n"))

    // plan capture (pre-execution formatted plan; with AQE the initial plan)
    planDir.foreach { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      names.foreach { n =>
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"$n.txt"),
          plan.getBytes("UTF-8"))
      }
    }

    // warmup on the smallest SF (JIT/classloading, excluded from timings)
    names.foreach { n =>
      try Bench.exhaust(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    final case class Rep(wall: Double, cpu: Double)
    val all = scala.collection.mutable.Map[String, List[Rep]]().withDefaultValue(Nil)
    for (_ <- 1 to reps; n <- names) {
      spark.sparkContext.setJobDescription(s"benchextra: $n")
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      Bench.exhaust(SparkEntry.queries(n)(spark, sfDir))
      val r = Rep((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      all(n) = r :: all(n)
    }
    val out = names.map { n =>
      val rs = all(n).reverse
      val med = rs.map(_.wall).sorted.apply(rs.length / 2)
      f""""$n":{"median":$med%.3f,"wall":[${rs.map(r => f"${r.wall}%.3f").mkString(",")}],"cpu":[${rs.map(r => f"${r.cpu}%.3f").mkString(",")}]}"""
    }.mkString("{", ",", "}")
    println(s"""{"benchextra":$out,"sf":"$sfDir"}""")
    spark.stop()
  }
}
