package graft.runtime

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Per-partition lineage manifest — the checkpoint-resume ledger
  * (SURVEY.md §4.4; BASELINE.json north_rule "resumable from checkpoint with
  * per-partition lineage + metrics"). One JSON file per completed work
  * shard, written atomically (temp file + rename) AFTER the shard's output
  * is durable, so a crash between write and manifest leaves an orphan
  * output that the idempotent overwrite replaces on resume.
  *
  * This doubles as the "Iceberg-style" snapshot record for the plain-Parquet
  * layout (no Iceberg runtime jar offline — SURVEY.md §7): each entry pins
  * (input fingerprint, shard, row count, content checksum, output path).
  */
object Manifest {

  final case class Entry(
      shard: Int,
      rowCount: Long,
      checksum: Long,
      outputPath: String,
      inputFingerprint: String,
      /** Wall time of the JOB that produced this shard, not per-shard time:
        * the single-pass runner lands all missing shards in one write, so
        * every entry from the same run records the same value.
        */
      jobWallMs: Long,
      completedAtMs: Long)

  private def dir(outDir: String): Path = Paths.get(outDir, "_manifest")

  private def fileFor(outDir: String, shard: Int): Path =
    dir(outDir).resolve(f"shard-$shard%05d.json")

  def toJson(e: Entry): String =
    s"""{"shard":${e.shard},"rowCount":${e.rowCount},"checksum":${e.checksum},""" +
      s""""outputPath":"${e.outputPath}","inputFingerprint":"${e.inputFingerprint}",""" +
      s""""jobWallMs":${e.jobWallMs},"completedAtMs":${e.completedAtMs}}"""

  // accepts both the current `jobWallMs` key and the pre-rename `wallMs`
  // wire format: entries written by an older build must stay resumable —
  // silently failing to parse them would recompute every completed shard
  // on upgrade without telling the operator
  private val Pattern =
    """\{"shard":(\d+),"rowCount":(\d+),"checksum":(-?\d+),"outputPath":"([^"]*)","inputFingerprint":"([^"]*)","(?:jobWallMs|wallMs)":(\d+),"completedAtMs":(\d+)\}""".r

  def fromJson(s: String): Option[Entry] = s.trim match {
    case Pattern(sh, rc, ck, op, fp, wm, ca) =>
      Some(Entry(sh.toInt, rc.toLong, ck.toLong, op, fp, wm.toLong, ca.toLong))
    case _ =>
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"manifest entry failed to parse (will be recomputed): ${s.take(120)}")
      None
  }

  /** Atomically record a completed shard. */
  def commit(outDir: String, e: Entry): Unit = {
    Files.createDirectories(dir(outDir))
    val target = fileFor(outDir, e.shard)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, toJson(e).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Completed shards for this output (the resume set). Entries whose input
    * fingerprint differs are treated as stale and ignored (the shard will be
    * reprocessed and overwritten).
    */
  def completed(outDir: String, inputFingerprint: String): Map[Int, Entry] = {
    val d = dir(outDir)
    if (!Files.isDirectory(d)) return Map.empty
    val it = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .filter(_.getFileName.toString.matches("shard-\\d+\\.json"))
        .flatMap(p => fromJson(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
        .filter(_.inputFingerprint == inputFingerprint)
        .map(e => e.shard -> e)
        .toMap
    } finally it.close()
  }

  /** Drop manifest entries (test helper: simulates a crash after k shards). */
  def truncate(outDir: String, keepShards: Set[Int]): Unit = {
    val d = dir(outDir)
    if (!Files.isDirectory(d)) return
    val it = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala.toList.foreach { p =>
        val name = p.getFileName.toString
        if (name.matches("shard-\\d+\\.json")) {
          val shard = name.stripPrefix("shard-").stripSuffix(".json").toInt
          if (!keepShards.contains(shard)) Files.delete(p)
        }
      }
    } finally it.close()
  }
}
