package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.{Compression, DocParseException}
import graft.functions.warc_records

class WarcSpec extends SparkSpec {

  private def rec(uri: String, payload: Array[Byte], date: String = "2020-09-13T12:26:40Z") =
    Warc.Record("response", s"<urn:test:$uri>", date, uri, payload.length.toLong, payload)

  private val tricky = Seq(
    rec("https://a.example/", "hello world".getBytes("UTF-8")),
    // payload containing the record magic and CRLF framing bytes — only
    // Content-Length framing survives this, not delimiter scanning
    rec("https://b.example/x?y=1", "WARC/1.0\r\n\r\nnot a header\r\n\r\n".getBytes("UTF-8")),
    rec("https://c.example/", Array.emptyByteArray), // empty payload
    rec("https://d.example/é", "café ☃".getBytes("UTF-8"))) // non-ASCII

  test("build/parse round trip (plain and gzip member-per-record)") {
    for (gz <- Seq(false, true)) {
      val parsed = Warc.parse(Warc.build(tricky, gzipPerRecord = gz))
      assert(parsed.length == tricky.length)
      parsed.zip(tricky).foreach { case (p, t) =>
        assert(p.targetUri == t.targetUri && p.warcType == t.warcType &&
          p.recordId == t.recordId && p.date == t.date &&
          p.contentLength == t.payload.length &&
          java.util.Arrays.equals(p.payload, t.payload), s"gz=$gz uri=${t.targetUri}")
      }
    }
  }

  test("whole-file xz wrapping and unknown headers parse; order preserved") {
    val withExtra = Warc.build(tricky).patch(0,
      ("WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: <urn:test:info>\r\n" +
        "WARC-Date: 2020-01-01T00:00:00Z\r\nX-Custom-Header: zzz\r\n" +
        "Content-Length: 3\r\n\r\nabc\r\n\r\n").getBytes("UTF-8"), 0)
    val parsed = Warc.parse(Compression.compress(withExtra, Compression.Xz))
    assert(parsed.head.warcType == "warcinfo" && parsed.head.targetUri == "")
    assert(parsed.tail.map(_.targetUri) == tricky.map(_.targetUri))
  }

  test("malformed containers fail the row loudly") {
    val good = Warc.build(tricky)
    intercept[DocParseException](Warc.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes))
    intercept[DocParseException](Warc.parse(good.dropRight(8))) // truncated tail
    intercept[DocParseException](Warc.parse(
      "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes)) // no Content-Length
    // oversized declared payload = truncation, not a buffer overrun
    intercept[DocParseException](Warc.parse(
      "WARC/1.0\r\nContent-Length: 999\r\n\r\nshort".getBytes))
  }

  test("warc_records expression: explode to record rows; malformed -> null") {
    import spark.implicits._
    val df = Seq(("f1", Warc.build(tricky, gzipPerRecord = true)),
      ("bad", "not a warc".getBytes("UTF-8")))
      .toDF("file", "bytes")
      .select(col("file"), warc_records(col("bytes")).as("recs"))
    assert(df.where(col("file") === "bad").select(col("recs").isNull).head().getBoolean(0))
    val rows = df.where(col("file") === "f1")
      .select(posexplode(col("recs")).as(Seq("pos", "r")))
      .select(col("pos"), col("r.target_uri"), col("r.content_length"),
        length(col("r.payload")).as("n"))
      .orderBy(col("pos")).collect()
    assert(rows.map(_.getString(1)).toSeq == tricky.map(_.targetUri))
    rows.foreach(r => assert(r.getLong(2) == r.getInt(3).toLong))
    // SQL registry path
    spark.createDataFrame(Seq(Tuple1(Warc.build(tricky)))).toDF("b").createOrReplaceTempView("warc_t")
    assert(spark.sql("SELECT size(warc_records(b)) FROM warc_t").head().getInt(0) == tricky.length)
    spark.catalog.dropTempView("warc_t")
  }
}
