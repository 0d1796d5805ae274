package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.{Compression, DocParseException}

class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private val doc = "c test\np cnf 3 2\n1 -2 0\n2 3 0\n".getBytes("UTF-8")

  private def xz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.tukaani.xz.XZOutputStream(bos, new org.tukaani.xz.LZMA2Options())
    out.write(b); out.finish(); out.close()
    bos.toByteArray
  }
  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(b); out.finish(); out.close()
    bos.toByteArray
  }
  private def bz2(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos)
    out.write(b); out.close()
    bos.toByteArray
  }
  private def zstd(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new com.github.luben.zstd.ZstdOutputStream(bos)
    out.write(b); out.close()
    bos.toByteArray
  }

  test("magic detection + round trip for every codec; plain bytes pass through") {
    val cases = Seq(
      Compression.Xz -> xz(doc), Compression.Gzip -> gz(doc),
      Compression.Bzip2 -> bz2(doc), Compression.Zstd -> zstd(doc))
    for ((codec, blob) <- cases) {
      assert(Compression.detect(blob) == codec, s"detect $codec")
      assert(Compression.decompress(blob, Compression.Auto).sameElements(doc), s"auto $codec")
      assert(Compression.decompress(blob, codec).sameElements(doc), s"explicit $codec")
    }
    assert(Compression.detect(doc) == Compression.None)
    assert(Compression.decompress(doc, Compression.Auto) eq doc, "plain bytes pass through")
  }

  test("corrupt stream and decompressed-size budget fail the ROW (DocParseException)") {
    val corrupt = xz(doc).clone()
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x5a).toByte
    intercept[DocParseException](Compression.decompress(corrupt, Compression.Auto))
    intercept[DocParseException](Compression.decompress(xz(doc), Compression.Auto, maxBytes = 8))
    // truncated header: decoder construction itself fails
    intercept[DocParseException](Compression.decompress(xz(doc).take(7), Compression.Xz))
  }

  test("decompress fuses below the hash kernel: compressed bytes == plain text hash") {
    val df = Seq(
      (1L, xz(doc)), (2L, gz(doc)), (3L, bz2(doc)), (4L, zstd(doc)), (5L, doc))
      .toDF("id", "payload")
    val hashed = df.select($"id", gbd_hash(decompress_auto($"payload")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = graft.core.Dimacs.gbdHashCnf(doc)
    assert(hashed.values.toSet == Set(expected))
    // corrupt payload nulls the row, never the task
    val bad = xz(doc).clone(); bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x5a).toByte
    val r = Seq((9L, bad)).toDF("id", "payload")
      .select(decompress_auto($"payload")).head()
    assert(r.isNullAt(0))
  }

  test("SQL registry path: decompress_xz usable from SQL text") {
    graft.GraftExtensions.register(spark)
    Seq((1L, xz(doc))).toDF("id", "payload").createOrReplaceTempView("comp_docs")
    val r = spark.sql(
      "SELECT gbd_hash(decompress_xz(payload)) AS h FROM comp_docs").head().getString(0)
    assert(r == graft.core.Dimacs.gbdHashCnf(doc))
    spark.catalog.dropTempView("comp_docs")
  }
}
