package graft.core

import java.io.{ByteArrayInputStream, InputStream}

/** Compressed-payload ingestion (SURVEY.md §2.1 S1 completion).
  *
  * The reference streams every instance file through libarchive with
  * `archive_read_support_filter_all` + raw format
  * (/root/reference/src/util/StreamBuffer.h:106-124) — i.e. the compression
  * codec is AUTO-DETECTED from the byte stream and the parsers only ever see
  * decompressed bytes. Real gbd corpora are `.cnf.xz` blobs, so an engine
  * that assumes pre-decompressed text has a gap at the very first stage.
  *
  * This kernel re-expresses that contract JVM-side: codec detection by magic
  * bytes (the same signatures libarchive's filter bidding checks), then the
  * matching stream decoder from jars already on the Spark classpath
  * (xz-java, commons-compress, zstd-jni, java.util.zip). Unknown magic =
  * plain bytes passed through unchanged — exactly libarchive's raw-format
  * fallback.
  *
  * A decompressed-size budget guards the 100-TB path: a hostile or corrupt
  * blob (zip bomb) must fail the ROW, not the executor — callers surface the
  * DocParseException as a null/status column like every other doc kernel.
  */
object Compression {

  val Auto = "auto"
  val Xz = "xz"
  val Gzip = "gzip"
  val Bzip2 = "bzip2"
  val Zstd = "zstd"
  val None = "none"
  val codecs: Seq[String] = Seq(Auto, Xz, Gzip, Bzip2, Zstd, None)

  /** Default decompressed-size budget: 1 GiB per document. */
  val DefaultMaxBytes: Int = 1 << 30

  /** Magic-byte codec detection (returns [[None]] for unrecognized bytes). */
  def detect(buf: Array[Byte]): String = {
    @inline def b(i: Int): Int = buf(i) & 0xff
    if (buf.length >= 6 && b(0) == 0xfd && b(1) == '7' && b(2) == 'z' &&
      b(3) == 'X' && b(4) == 'Z' && b(5) == 0x00) Xz
    else if (buf.length >= 2 && b(0) == 0x1f && b(1) == 0x8b) Gzip
    else if (buf.length >= 4 && b(0) == 'B' && b(1) == 'Z' && b(2) == 'h' &&
      b(3) >= '1' && b(3) <= '9') Bzip2
    else if (buf.length >= 4 && b(0) == 0x28 && b(1) == 0xb5 && b(2) == 0x2f &&
      b(3) == 0xfd) Zstd
    else None
  }

  private def decoder(codec: String, in: InputStream): InputStream = codec match {
    case Xz => new org.tukaani.xz.XZInputStream(in)
    case Gzip => new java.util.zip.GZIPInputStream(in)
    case Bzip2 =>
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(in)
    case Zstd => new com.github.luben.zstd.ZstdInputStream(in)
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  private def encoder(codec: String, out: java.io.OutputStream,
                      inputLen: Int): java.io.OutputStream = codec match {
    case Xz =>
      // Size the LZMA2 dictionary to the input: the default preset allocates
      // an 8 MiB dictionary PER CALL, which for typical web documents
      // (hundreds of bytes) is pure GC churn — a compressed sink writing
      // millions of small rows per executor would spend more time allocating
      // dictionaries than compressing. A dictionary >= the input is lossless
      // for ratio (nothing beyond the window can be referenced anyway).
      val opts = new org.tukaani.xz.LZMA2Options()
      opts.setDictSize(math.min(opts.getDictSize,
        math.max(org.tukaani.xz.LZMA2Options.DICT_SIZE_MIN,
          java.lang.Integer.highestOneBit(math.max(1, inputLen - 1)) << 1)))
      new org.tukaani.xz.XZOutputStream(out, opts)
    case Gzip => new java.util.zip.GZIPOutputStream(out)
    case Bzip2 =>
      // same reasoning: block size in 100 kB units, smallest block that
      // still holds the whole input (bzip2 allocates ~10x block size)
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(
        out, math.max(1, math.min(9, (inputLen + 99999) / 100000)))
    case Zstd => new com.github.luben.zstd.ZstdOutputStream(out)
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  /** Compress `buf` with `codec` — the write-side inverse of [[decompress]]
    * (compressed-sink utility; also what tests and the driver harness use to
    * manufacture ingestion payloads). [[Auto]] is a read-side concept and is
    * rejected; [[None]] passes bytes through.
    */
  def compress(buf: Array[Byte], codec: String): Array[Byte] = {
    if (codec == None) return buf
    val bos = new java.io.ByteArrayOutputStream(math.max(64, buf.length / 2))
    val out = encoder(codec, bos, buf.length)
    out.write(buf)
    out.close()
    bos.toByteArray
  }

  /** Decompress `buf` with `codec` (resolving [[Auto]] by magic bytes).
    * Plain/unrecognized bytes pass through under auto/none; corrupt streams
    * and budget violations raise [[DocParseException]] (row-level failure).
    */
  def decompress(buf: Array[Byte], codec: String,
                 maxBytes: Int = DefaultMaxBytes): Array[Byte] = {
    val resolved = if (codec == Auto) detect(buf) else codec
    if (resolved == None) return buf
    val in = try decoder(resolved, new ByteArrayInputStream(buf))
    catch {
      case e: Exception => throw new DocParseException(
        s"bad $resolved stream: ${e.getMessage}")
    }
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(maxBytes, buf.length * 4))
      val chunk = new Array[Byte](64 << 10)
      var n = in.read(chunk)
      while (n >= 0) {
        if (out.size().toLong + n > maxBytes)
          throw new DocParseException(s"decompressed size exceeds budget $maxBytes")
        out.write(chunk, 0, n)
        n = in.read(chunk)
      }
      out.toByteArray
    } catch {
      case e: DocParseException => throw e
      case e: Exception => throw new DocParseException(
        s"corrupt $resolved stream: ${e.getMessage}")
    } finally in.close()
  }
}
