package graft.functions

import org.apache.spark.sql.functions._
import graft.{Fixtures, SparkSpec}
import graft.core.{CnfBase, Dimacs}
import graft.pages.PageGen

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cnfDoc = new String(Fixtures.resourceBytes("/gbdc/cnf_test.cnf.xz"), "UTF-8")

  test("cnf_features expression replays the golden record through SQL") {
    val golden = Fixtures.goldenRecord("/gbdc/expected_records/cnf_base.txt")
    val df = Seq(cnfDoc).toDF("text").select(cnf_features(col("text")).as("f"))
    val row = df.select(col("f.*")).head()
    val names = CnfBase.featureNames
    var i = 0
    while (i < names.length) {
      val g = golden(names(i))
      val a = row.getDouble(i)
      assert(Fixtures.fequal(a, g), s"${names(i)}: engine=$a golden=$g")
      i += 1
    }
  }

  test("gbd_hash expression == md5(normalize) built-in composition") {
    val df = Seq(cnfDoc).toDF("text")
      .select(
        gbd_hash(col("text")).as("h1"),
        md5(normalize_cnf(col("text")).cast("binary")).as("h2"))
    val r = df.head()
    assert(r.getString(0) == r.getString(1))
  }

  test("expressions work on the binary html column via SQL registration") {
    val pages = PageGen.pages(spark, PageGen.Config(urls = 20, revisitsPerUrl = 2, hotUrls = 1, hotFactor = 4))
    pages.createOrReplaceTempView("pages_tmp")
    // text and its html wrapper must normalize to DIFFERENT things (html tags
    // are not CNF) — but text-through-binary == text-through-string:
    val r = spark.sql(
      """select gbd_hash(text) a, gbd_hash(cast(text as binary)) b from pages_tmp limit 5""").collect()
    r.foreach(row => assert(row.getString(0) == row.getString(1)))
  }

  test("malformed document yields null, not task failure") {
    val df = Seq("not a cnf at all!", cnfDoc).toDF("text")
      .select(cnf_features(col("text")).as("f"), gbd_hash(col("text")).as("h"))
    val rows = df.collect()
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(rows.exists(r => !r.isNullAt(0)))
  }

  test("null input yields null output") {
    val df = Seq(Option.empty[String]).toDF("text").select(gbd_hash(col("text")))
    assert(df.head().isNullAt(0))
  }

  test("instance identity across the synthetic corpus: md5 parity + determinism") {
    val cfg = PageGen.Config(urls = 50, revisitsPerUrl = 3, hotUrls = 2, hotFactor = 5)
    val a = PageGen.pages(spark, cfg, Some(2)).select(gbd_hash($"text").as("h")).as[String].collect().sorted
    val b = PageGen.pages(spark, cfg, Some(7)).select(gbd_hash($"text").as("h")).as[String].collect().sorted
    assert(a.sameElements(b), "generation must be partitioning-invariant")
  }

  test("kernel and expression agree on normalized text byte-for-byte") {
    val pages = PageGen.pages(spark, PageGen.Config(urls = 10, revisitsPerUrl = 2, hotUrls = 1, hotFactor = 3))
    val rows = pages.select($"text", normalize_cnf($"text").as("norm")).collect()
    rows.foreach { r =>
      val sink = new graft.core.BufferSink
      Dimacs.normalizeCnf(r.getString(0).getBytes("UTF-8"), sink)
      assert(r.getString(1) == sink.result)
    }
  }

  test("sanicheck struct via SQL") {
    val r = spark.sql(s"select cnf_sanicheck('p cnf 2 2\\n1 -1 0\\n1 1 0\\n') s")
      .select("s.has_tautological_clause", "s.has_duplicate_literals", "s.sani_clauses").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0)
  }

  test("cnf_clauses exposes raw clause structure") {
    val r = spark.sql("select cnf_clauses('p cnf 3 2\\n1 -2 0\\n2 3 0\\n') c").head()
    val arr = r.getSeq[scala.collection.Seq[Int]](0)
    assert(arr == Seq(Seq(1, -2), Seq(2, 3)))
  }
}
