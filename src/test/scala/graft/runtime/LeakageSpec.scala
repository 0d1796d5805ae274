package graft.runtime

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pages.{Page, PageGen}

/** Zero-temporal-leakage property (BASELINE.json north_star: "no feature
  * reads data later than its as-of ts"): inject future-dated poison revisits
  * carrying pathological content; every output row at-or-before the poison
  * horizon must be byte-identical to the clean run.
  */
class LeakageSpec extends SparkSpec {
  import spark.implicits._

  test("future-dated poison pages change no feature at earlier timestamps") {
    val cfg = PageGen.Config(urls = 30, revisitsPerUrl = 4, hotUrls = 2, hotFactor = 4)
    val clean = PageGen.pages(spark, cfg).toDF()
    val horizon = clean.agg(max(col("warc_ts"))).head().getTimestamp(0)

    // poison: one future revisit per url with degenerate content
    val poisonRows = (0 until cfg.urls).map { u =>
      Page(PageGen.urlOf(cfg, u), new Timestamp(horizon.getTime + 1000L * 3600 * 24 * (u + 1)),
        Array.emptyByteArray, "p cnf 1 1\n1 0\n", "xx")
    }
    val poisoned = clean.unionByName(poisonRows.toDF())

    val jobCfg = FeatureJob.Config(outDir = "unused")
    def canon(df: org.apache.spark.sql.DataFrame) = {
      val past = df.where(col("warc_ts") <= lit(horizon))
      past.select(past.columns.sorted.map(col): _*).collect().map(_.toString).sorted
    }
    val a = canon(FeatureJob.pipeline(clean, jobCfg))
    val b = canon(FeatureJob.pipeline(poisoned, jobCfg))
    assert(a.length == b.length)
    assert(a.sameElements(b), "pipeline output before the poison horizon must be unchanged")
  }

  test("every pipeline window is trailing: no column depends on later rows") {
    // structural check: drop the LAST revisit of every url; all remaining
    // rows must be unchanged (a leaking window would shift)
    val cfg = PageGen.Config(urls = 20, revisitsPerUrl = 5, hotUrls = 1, hotFactor = 2)
    val all = PageGen.pages(spark, cfg).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("warc_ts").desc)
    val truncated = all.withColumn("_rn", row_number().over(w)).where(col("_rn") > 1).drop("_rn")

    val jobCfg = FeatureJob.Config(outDir = "unused")
    val full = FeatureJob.pipeline(all, jobCfg)
    val truncOut = FeatureJob.pipeline(truncated, jobCfg)
    // align on rows present in the truncated run
    val keyCols = Seq("url", "warc_ts")
    val joined = full.as("f").join(truncOut.as("t"), keyCols)
    val cols = truncOut.columns.filterNot(keyCols.contains)
    val diffs = cols.map(c =>
      sum(when(col(s"f.$c") <=> col(s"t.$c"), 0).otherwise(1)).as(c))
    val row = joined.agg(diffs.head, diffs.tail: _*).head()
    cols.zipWithIndex.foreach { case (c, i) =>
      assert(row.getLong(i) == 0L, s"column $c depends on later rows (${row.getLong(i)} diffs)")
    }
  }
}
