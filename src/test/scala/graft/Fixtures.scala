package graft

import java.io.{ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets

/** Test fixture loading: the reference's own regression inputs + golden
  * records (replayed per BASELINE.json:6), xz-decoded via the xz lib that
  * ships on Spark's classpath.
  */
object Fixtures {

  def resourceBytes(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    try readAll(if (path.endsWith(".xz")) new org.tukaani.xz.XZInputStream(in) else in)
    finally in.close()
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](1 << 14)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  def resourceText(path: String): String =
    new String(resourceBytes(path), StandardCharsets.UTF_8)

  /** Parse a golden record of `key=value` lines
    * (/root/reference/test/Util.h:71-92 semantics).
    */
  def goldenRecord(path: String): Map[String, Double] =
    resourceText(path).linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.substring(0, i) -> l.substring(i + 1).toDouble
      }
      .toMap

  /** Relative-tolerance compare, the reference's fequal
    * (/root/reference/test/Util.h:56-60): eps = 1e-5 * max(|a|,|b|).
    */
  def fequal(a: Double, b: Double, eps: Double = 1e-5): Boolean = {
    val scale = math.max(math.abs(a), math.abs(b))
    math.abs(a - b) <= eps * scale
  }

  /** Load a file from the read-only reference checkout if present (used for
    * the large scramble corpus we do not vendor); None when unavailable.
    */
  def referenceFile(rel: String): Option[Array[Byte]] = {
    val p = java.nio.file.Paths.get("/root/reference", rel)
    if (java.nio.file.Files.isReadable(p)) {
      val raw = java.nio.file.Files.readAllBytes(p)
      if (rel.endsWith(".xz")) {
        val in = new org.tukaani.xz.XZInputStream(new java.io.ByteArrayInputStream(raw))
        try Some(readAll(in))
        finally in.close()
      } else Some(raw)
    } else None
  }
}
