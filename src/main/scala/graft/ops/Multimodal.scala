package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in per-partition batches.
  *
  * The Spark-side machinery here is REAL and tested: schemas, typed batch
  * iteration (mapPartitions over a case-class Dataset with bounded batch
  * buffers — the Scala analog of mapInPandas' batch shape), partition
  * sizing by payload bytes, and deterministic content addressing.
  *
  * Codecs: PNG/JPEG (javax.imageio, JDK-native, headless-safe), WAV (RIFF
  * header parse) and MP4/MOV (ISO BMFF box walk — mvhd duration, tkhd
  * dimensions; container metadata, no frame decode) are REAL — payloads
  * carrying those magic bytes decode to actual dimensions/channels/
  * duration ([[RealCodec]]). Unrecognized formats fall back to the
  * clearly-marked [[FakeCodec]] stub, which derives deterministic
  * pseudo-metadata from the bytes; FRAME decoding (no video codec ships
  * in the JDK) remains behind that stub, and swapping in a real one
  * touches exactly one dispatch arm.
  */
object Multimodal {

  /** Typed media row: payload + envelope. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class DecodedMeta(
      media_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, channels: Int,
      duration_ms: Long, content_sha: String, ok: Boolean)

  final case class MediaFeature(media_id: Long, feature: Array[Float], frames_sampled: Int)

  /** One decoded video FRAME's raster statistics ([[videoFrameStats]]). */
  final case class FrameStats(
      media_id: Long, frame_idx: Long, byte_len: Long,
      width: Int, height: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long,
      declared_frames: Long, us_per_frame: Long, ok: Boolean)

  /** One ISO-BMFF track's sample-table summary ([[mp4SampleTables]]):
    * everything is exact integers read from stts/stsz/stsc/stco + mdhd —
    * frame counts, durations and byte sizes with NO codec dependency.
    */
  final case class TrackTable(
      media_id: Long, track_id: Long, handler: String,
      timescale: Long, mdhd_ticks: Long, duration_ms: Long,
      n_samples: Long, sample_bytes: Long, stts_ticks: Long,
      n_stts_entries: Long, n_stsc_entries: Long, n_chunks: Long, ok: Boolean)

  /** STUB codec — deterministic fake. A real implementation replaces these
    * three functions with actual decode / resize / frame-sample calls.
    */
  object FakeCodec {
    def decodeMeta(kind: String, payload: Array[Byte]): (Int, Int, Int, Long) = {
      val h = graft.core.TextKernels.mix64(java.util.Arrays.hashCode(payload).toLong)
      kind match {
        case "image" => (64 + (math.abs(h) % 1920).toInt, 64 + (math.abs(h >> 12) % 1080).toInt, 3, 0L)
        case "audio" => (0, 0, if ((h & 1) == 0) 1 else 2, 500 + math.abs(h % 60000))
        case _ => (320 + (math.abs(h) % 1600).toInt, 240 + (math.abs(h >> 8) % 840).toInt, 3, 1000 + math.abs(h % 120000))
      }
    }

    /** Deterministic pseudo-embedding of the payload (stand-in for a model
      * forward pass over decoded pixels/samples).
      */
    def extractFeature(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < payload.length) { h = graft.core.TextKernels.mix64(h ^ payload(i)); i += 1 }
      var d = 0
      while (d < dim) {
        h = graft.core.TextKernels.mix64(h)
        out(d) = ((h >> 11).toDouble / (1L << 52).toDouble).toFloat
        d += 1
      }
      out
    }

    def frameCount(kind: String, durationMs: Long, sampleEveryMs: Long): Int =
      if (kind == "image") 1 else math.max(1, (durationMs / math.max(1, sampleEveryMs)).toInt)
  }

  /** Real decoders for the formats the JDK ships: PNG/JPEG via
    * javax.imageio (headless-safe — no display dependency for reading) and
    * WAV via a direct RIFF chunk walk (little-endian; fmt -> channels +
    * byte rate, data -> payload size; duration = data bytes * 1000 / byte
    * rate). Dispatch is by MAGIC BYTES, not the caller's `kind` string —
    * a mislabeled payload decodes by what it actually is.
    */
  object RealCodec {
    final val Png = "png"
    final val Jpeg = "jpeg"
    final val Wav = "wav"
    final val Mp4 = "mp4"
    final val Gif = "gif"
    final val Bmp = "bmp"
    final val Webp = "webp"
    final val Flac = "flac"
    final val Mp3 = "mp3"

    /** Container sniff by magic bytes; "" = no real decoder for this blob. */
    def sniff(p: Array[Byte]): String =
      if (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') Png
      else if (p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff) Jpeg
      else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') Wav
      else if (p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p') Mp4
      else if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
        (p(4) == '7' || p(4) == '9') && p(5) == 'a') Gif
      else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'E' && p(10) == 'B' && p(11) == 'P') Webp
      else if (p.length >= 4 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C') Flac
      else if (p.length >= 3 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') Mp3
      else if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xe0) == 0xe0) Mp3
      else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') Bmp
      else ""

    /** (width, height, channels, duration_ms) for a recognized container;
      * None when the magic doesn't match any shipped decoder. A recognized
      * but CORRUPT payload raises (the caller's ok=false channel).
      */
    def decode(p: Array[Byte]): Option[(Int, Int, Int, Long)] = sniff(p) match {
      case Png | Jpeg =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
        if (img == null) throw new java.io.IOException("undecodable image payload")
        Some((img.getWidth, img.getHeight, img.getColorModel.getNumComponents, 0L))
      case Wav =>
        val (channels, durationMs) = parseWav(p)
        Some((0, 0, channels, durationMs))
      case Mp4 =>
        val (w, h, durationMs) = parseMp4(p)
        Some((w, h, 0, durationMs))
      case Gif =>
        val (w, h) = parseGif(p)
        Some((w, h, 3, 0L))
      case Webp =>
        val (w, h, channels) = parseWebp(p)
        Some((w, h, channels, 0L))
      case Flac =>
        val (channels, durationMs) = parseFlac(p)
        Some((0, 0, channels, durationMs))
      case Mp3 =>
        val (channels, durationMs) = parseMp3(p)
        Some((0, 0, channels, durationMs))
      case Bmp =>
        val (w, h, channels) = parseBmp(p)
        Some((w, h, channels, 0L))
      case _ => None
    }

    /** FLAC STREAMINFO (the mandatory first metadata block): 20-bit
      * sample rate, 3-bit channels−1, 36-bit total samples →
      * duration_ms = samples · 1000 / rate (floor — exact integer).
      */
    private def parseFlac(p: Array[Byte]): (Int, Long) = {
      if (p.length < 42) throw new java.io.IOException("truncated flac")
      if ((p(4) & 0x7f) != 0) // block type STREAMINFO = 0
        throw new java.io.IOException("first flac block is not STREAMINFO")
      val b0 = p(18) & 0xff; val b1 = p(19) & 0xff; val b2 = p(20) & 0xff
      val rate = (b0 << 12) | (b1 << 4) | (b2 >> 4)
      if (rate == 0) throw new java.io.IOException("flac sample rate 0")
      val channels = ((b2 >> 1) & 0x7) + 1
      // total samples = bits 28..63 of the 64-bit field (low 4 bits of
      // byte 21 are the top of the 36-bit count)
      val total = ((p(21) & 0x0fL) << 32) | ((p(22) & 0xffL) << 24) |
        ((p(23) & 0xffL) << 16) | ((p(24) & 0xffL) << 8) | (p(25) & 0xffL)
      (channels, total * 1000L / rate)
    }

    /** MP3: skip an ID3v2 tag (syncsafe 28-bit size), read the first
      * MPEG-1 Layer III frame header (bitrate + sample-rate tables,
      * channel mode) and estimate duration from the remaining byte count
      * at that constant bitrate — exact for CBR files, the standard
      * header-only estimate otherwise.
      */
    private def parseMp3(p: Array[Byte]): (Int, Long) = {
      var off = 0
      if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
        val size = ((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
          ((p(8) & 0x7f) << 7) | (p(9) & 0x7f)
        off = 10 + size
      }
      if (off + 4 > p.length)
        throw new java.io.IOException("no mp3 frame after id3 tag")
      val h0 = p(off) & 0xff; val h1 = p(off + 1) & 0xff
      val h2 = p(off + 2) & 0xff; val h3 = p(off + 3) & 0xff
      if (h0 != 0xff || (h1 & 0xfe) != 0xfa) // MPEG-1 Layer III, sync
        throw new java.io.IOException("unsupported mp3 frame header")
      val bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320) // kbit/s, MPEG-1 Layer III
      val rates = Array(44100, 48000, 32000, 0)
      val br = bitrates((h2 >> 4) & 0xf)
      val sr = rates((h2 >> 2) & 0x3)
      if (br == 0 || sr == 0)
        throw new java.io.IOException("free/bad mp3 bitrate or rate")
      val channels = if (((h3 >> 6) & 0x3) == 3) 1 else 2
      val audioBytes = (p.length - off).toLong
      (channels, audioBytes * 8L / br) // bytes*8 / (kbit/s) == ms
    }

    /** WebP first chunk after the RIFF/WEBP header — all three container
      * grammars: VP8X (extended: 24-bit LE minus-one dims, alpha flag
      * 0x10), VP8L (lossless: 0x2f signature then 14+14 packed minus-one
      * dims + alpha bit 28), "VP8 " (lossy: 0x9d012a sync then 14-bit LE
      * dims). Unknown chunk or broken signature raises (ok=false).
      */
    private def parseWebp(p: Array[Byte]): (Int, Int, Int) = {
      if (p.length < 20) throw new java.io.IOException("truncated webp")
      val four = new String(p, 12, 4, "US-ASCII")
      four match {
        case "VP8X" =>
          if (p.length < 30) throw new java.io.IOException("truncated vp8x")
          val w = (le16(p, 24) | ((p(26) & 0xff) << 16)) + 1
          val h = (le16(p, 27) | ((p(29) & 0xff) << 16)) + 1
          val alpha = (p(20) & 0x10) != 0
          (w, h, if (alpha) 4 else 3)
        case "VP8L" =>
          if (p.length < 25 || (p(20) & 0xff) != 0x2f)
            throw new java.io.IOException("malformed vp8l signature")
          val b = le32(p, 21)
          val w = (b & 0x3fff).toInt + 1
          val h = ((b >> 14) & 0x3fff).toInt + 1
          val alpha = ((b >> 28) & 1L) != 0L
          (w, h, if (alpha) 4 else 3)
        case "VP8 " =>
          if (p.length < 30 || (p(23) & 0xff) != 0x9d ||
            (p(24) & 0xff) != 0x01 || (p(25) & 0xff) != 0x2a)
            throw new java.io.IOException("malformed vp8 sync code")
          ((le16(p, 26) & 0x3fff), (le16(p, 28) & 0x3fff), 3)
        case other =>
          throw new java.io.IOException(s"unsupported webp chunk $other")
      }
    }

    /** EXIF orientation (tag 0x0112, values 1-8) from a JPEG's APP1
      * segment — the REAL JPEG segment walk + TIFF IFD0 grammar (both II
      * and MM byte orders), no pixel decode. None (not an error) when the
      * payload is not a JPEG, carries no EXIF, lacks the tag, or the TIFF
      * structure is malformed — absent orientation is the normal case on
      * the web, so the channel is Optional, not ok=false.
      */
    def exifOrientation(p: Array[Byte]): Option[Int] = {
      if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
        return None
      var off = 2
      while (off + 4 <= p.length) {
        if ((p(off) & 0xff) != 0xff) return None
        val marker = p(off + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS
        val len = ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
        if (len < 2 || off + 2 + len > p.length) return None
        if (marker == 0xe1 && len >= 10 &&
          p(off + 4) == 'E' && p(off + 5) == 'x' && p(off + 6) == 'i' &&
          p(off + 7) == 'f' && p(off + 8) == 0 && p(off + 9) == 0)
          return tiffOrientation(p, off + 10, off + 2 + len)
        off += 2 + len
      }
      None
    }

    private def tiffOrientation(p: Array[Byte], tiff: Int, end: Int): Option[Int] = {
      if (tiff + 8 > end) return None
      val le = p(tiff) == 'I' && p(tiff + 1) == 'I'
      if (!le && !(p(tiff) == 'M' && p(tiff + 1) == 'M')) return None
      def u16(o: Int): Int =
        if (le) (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
        else ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
      def u32(o: Int): Long =
        if (le) le32(p, o)
        else be32(p, o)
      if (u16(tiff + 2) != 42) return None
      val ifdOff = u32(tiff + 4)
      if (ifdOff < 0 || tiff + ifdOff + 2 > end) return None
      val ifd = tiff + ifdOff.toInt
      val n = u16(ifd)
      var i = 0
      while (i < n) {
        val e = ifd + 2 + i * 12
        if (e + 12 > end) return None
        if (u16(e) == 0x0112) {
          val v = u16(e + 8) // SHORT value lives in the field's first 2 bytes
          return if (v >= 1 && v <= 8) Some(v) else None
        }
        i += 1
      }
      None
    }

    /** GIF87a/89a logical screen descriptor: canvas dims, little-endian
      * 16-bit at offsets 6/8. A zero dimension raises (corrupt header).
      */
    private def parseGif(p: Array[Byte]): (Int, Int) = {
      if (p.length < 10) throw new java.io.IOException("truncated gif header")
      val w = le16(p, 6); val h = le16(p, 8)
      if (w == 0 || h == 0) throw new java.io.IOException("malformed gif dims")
      (w, h)
    }

    /** BMP BITMAPINFOHEADER (and later variants — header size >= 40):
      * little-endian signed 32-bit width/height at offsets 18/22 (height
      * may be negative for top-down rows), bit depth at 28 → channels.
      * The ancient BITMAPCOREHEADER (size 12, 16-bit dims) also parses.
      */
    private def parseBmp(p: Array[Byte]): (Int, Int, Int) = {
      if (p.length < 26) throw new java.io.IOException("truncated bmp header")
      val dibSize = le32(p, 14)
      val (w, h, bpp) =
        if (dibSize == 12L) (le16(p, 18), le16(p, 20), le16(p, 24))
        else if (dibSize >= 40L && p.length >= 30)
          (le32(p, 18).toInt, math.abs(le32(p, 22).toInt), le16(p, 28))
        else throw new java.io.IOException(s"unsupported bmp dib header $dibSize")
      if (w <= 0 || h == 0) throw new java.io.IOException("malformed bmp dims")
      (w, h, math.max(1, bpp / 8))
    }

    @inline private def le16(p: Array[Byte], o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    @inline private def le32(p: Array[Byte], o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) | ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)

    private def parseWav(p: Array[Byte]): (Int, Long) = {
      var off = 12L // past RIFF<size>WAVE
      var channels = -1
      var byteRate = -1L
      var dataLen = -1L
      var walking = true
      while (walking && off + 8 <= p.length && (channels < 0 || dataLen < 0)) {
        val o = off.toInt
        val id = new String(p, o, 4, "US-ASCII")
        val len = le32(p, o + 4)
        if (id == "fmt " && o + 16 + 8 <= p.length) {
          channels = le16(p, o + 8 + 2)
          byteRate = le32(p, o + 8 + 8)
        } else if (id == "data") {
          // tolerate a truncated final chunk: duration reflects actual bytes
          dataLen = math.min(len, (p.length - o - 8).toLong)
        }
        val next = off + 8L + len + (len & 1L) // chunks are 2-byte aligned
        if (next <= off) walking = false else off = next // corrupt length guard
      }
      if (channels < 0 || dataLen < 0 || byteRate <= 0)
        throw new java.io.IOException("malformed wav header")
      (channels, dataLen * 1000L / byteRate)
    }

    @inline private def be32(p: Array[Byte], o: Int): Long =
      ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) | ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    @inline private def be64(p: Array[Byte], o: Int): Long =
      (be32(p, o) << 32) | be32(p, o + 4)

    /** ISO BMFF (MP4/MOV) box walk — the REAL container grammar, no frame
      * decode: presentation duration from `moov/mvhd` (version 0 and 1
      * layouts), track dimensions from the largest `moov/trak/tkhd`
      * (16.16 fixed-point). Box sizes are big-endian; size==1 means a
      * 64-bit largesize follows, size==0 means to-end-of-parent. A `ftyp`
      * magic with no parsable moov raises — the caller's ok=false channel.
      */
    private def parseMp4(p: Array[Byte]): (Int, Int, Long) = {
      var width = 0; var height = 0
      var durationMs = -1L
      def walk(from: Long, to: Long, depth: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val o = off.toInt
          var size = be32(p, o)
          val typ = new String(p, o + 4, 4, "US-ASCII")
          var hdr = 8L
          if (size == 1L && off + 16 <= to) { size = be64(p, o + 8); hdr = 16L }
          else if (size == 0L) size = to - off
          if (size < hdr || off + size > to) throw new java.io.IOException(
            s"malformed mp4 box '$typ' (size=$size)")
          val body = off + hdr
          typ match {
            case "moov" | "trak" if depth < 4 => walk(body, off + size, depth + 1)
            case "mvhd" =>
              val b = body.toInt
              val version = p(b) & 0xff
              val (ts, dur) =
                if (version == 1) (be32(p, b + 20), be64(p, b + 24))
                else (be32(p, b + 12), be32(p, b + 16))
              if (ts <= 0) throw new java.io.IOException("mp4 mvhd timescale <= 0")
              durationMs = dur * 1000L / ts
            case "tkhd" =>
              val b = body.toInt
              val wh = if ((p(b) & 0xff) == 1) b + 88 else b + 76
              val w = (be32(p, wh) >> 16).toInt     // 16.16 fixed point
              val h = (be32(p, wh + 4) >> 16).toInt
              if (w * h > width * height) { width = w; height = h }
            case _ => ()
          }
          off += size
        }
      }
      walk(0L, p.length.toLong, 0)
      if (durationMs < 0) throw new java.io.IOException("mp4 without mvhd")
      (width, height, durationMs)
    }

    /** ISO-BMFF sample-table walk (moov/trak/mdia/minf/stbl): per track,
      * the EXACT sample count, total sample bytes, and media duration —
      * tkhd track_ID, hdlr handler 4CC, mdhd timescale/duration (v0+v1),
      * stts run-length decode (Σ count, Σ count·delta), stsz (constant
      * sample_size or the per-sample u32 list — stz2's 4/8/16-bit variant
      * included), stsc entry count and stco/co64 chunk count. This is the
      * codec-free path to per-track frame counts/durations for video and
      * audio containers — the frame-PIXEL decode stays behind [[FakeCodec]].
      * Malformed boxes raise (caller maps to ok=false).
      */
    def parseMp4Tracks(p: Array[Byte]): Seq[(Long, String, Long, Long, Long, Long, Long, Long, Long, Long)] = {
      val tracks = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Long, Long, Long, Long, Long, Long, Long, Long)]
      var sawMoov = false
      // per-trak accumulator
      var trackId = -1L; var handler = ""; var timescale = 0L; var mdhdDur = -1L
      var nSamples = -1L; var sampleBytes = -1L
      var sttsTicks = -1L; var nStts = -1L; var nStsc = -1L; var nChunks = -1L
      def fail(msg: String): Nothing = throw new java.io.IOException(msg)
      def walk(from: Long, to: Long, depth: Int, inTrak: Boolean): Unit = {
        var off = from
        while (off + 8 <= to) {
          val o = off.toInt
          var size = be32(p, o)
          val typ = new String(p, o + 4, 4, "US-ASCII")
          var hdr = 8L
          if (size == 1L && off + 16 <= to) { size = be64(p, o + 8); hdr = 16L }
          else if (size == 0L) size = to - off
          if (size < hdr || off + size > to) fail(s"malformed mp4 box '$typ' (size=$size)")
          val body = off + hdr
          val b = body.toInt
          typ match {
            case "moov" if depth < 6 =>
              sawMoov = true
              walk(body, off + size, depth + 1, inTrak)
            case "trak" if depth < 6 =>
              trackId = -1L; handler = ""; timescale = 0L; mdhdDur = -1L
              nSamples = -1L; sampleBytes = -1L
              sttsTicks = -1L; nStts = -1L; nStsc = -1L; nChunks = -1L
              walk(body, off + size, depth + 1, inTrak = true)
              if (trackId < 0 || timescale <= 0) fail("trak without tkhd/mdhd")
              tracks += ((trackId, handler, timescale, mdhdDur,
                nSamples.max(0L), sampleBytes.max(0L), sttsTicks.max(0L),
                nStts.max(0L), nStsc.max(0L), nChunks.max(0L)))
            case "mdia" | "minf" | "stbl" if depth < 6 && inTrak =>
              walk(body, off + size, depth + 1, inTrak)
            case "tkhd" if inTrak =>
              trackId =
                if ((p(b) & 0xff) == 1) be32(p, b + 20) else be32(p, b + 12)
            case "mdhd" if inTrak =>
              if ((p(b) & 0xff) == 1) {
                timescale = be32(p, b + 20); mdhdDur = be64(p, b + 24)
              } else {
                timescale = be32(p, b + 12); mdhdDur = be32(p, b + 16)
              }
            case "hdlr" if inTrak =>
              handler = new String(p, b + 8, 4, "US-ASCII")
            case "stts" if inTrak =>
              val n = be32(p, b + 4)
              if (body + 8 + n * 8 > off + size) fail("stts overruns its box")
              var i = 0; var cnt = 0L; var ticks = 0L
              while (i < n) {
                val c = be32(p, b + 8 + i * 8)
                val d = be32(p, b + 12 + i * 8)
                cnt += c; ticks += c * d
                i += 1
              }
              nStts = n; sttsTicks = ticks
              if (nSamples < 0) nSamples = cnt
            case "stsz" if inTrak =>
              val const = be32(p, b + 4)
              val n = be32(p, b + 8)
              nSamples = n
              if (const != 0L) sampleBytes = const * n
              else {
                if (body + 12 + n * 4 > off + size) fail("stsz overruns its box")
                var i = 0; var tot = 0L
                while (i < n) { tot += be32(p, b + 12 + i * 4); i += 1 }
                sampleBytes = tot
              }
            case "stz2" if inTrak =>
              val bits = p(b + 7) & 0xff
              val n = be32(p, b + 8)
              if (bits != 4 && bits != 8 && bits != 16) fail(s"stz2 field size $bits")
              nSamples = n
              var i = 0; var tot = 0L
              while (i < n) {
                tot += (bits match {
                  case 16 => ((p(b + 12 + i * 2) & 0xff) << 8) | (p(b + 13 + i * 2) & 0xff)
                  case 8 => p(b + 12 + i) & 0xff
                  case _ =>
                    val by = p(b + 12 + i / 2) & 0xff
                    if (i % 2 == 0) by >> 4 else by & 0xf
                })
                i += 1
              }
              sampleBytes = tot
            case "stsc" if inTrak =>
              val n = be32(p, b + 4)
              if (body + 8 + n * 12 > off + size) fail("stsc overruns its box")
              nStsc = n
            case "stco" if inTrak => nChunks = be32(p, b + 4)
            case "co64" if inTrak => nChunks = be32(p, b + 4)
            case _ => ()
          }
          off += size
        }
      }
      walk(0L, p.length.toLong, 0, inTrak = false)
      if (!sawMoov) fail("mp4 without moov")
      tracks.toSeq
    }

    /** AVI (RIFF) container walk: avih main header (declared frame count,
      * frame period, dimensions) + every video frame chunk payload from
      * the movi list ('00dc'/'00db'; RIFF chunks pad to even sizes).
      * Returns (declaredFrames, usPerFrame, width, height, framePayloads).
      * Malformed structure raises (caller maps to ok=false).
      */
    def parseAviFrames(p: Array[Byte]): (Long, Long, Int, Int, Seq[Array[Byte]]) = {
      def fail(msg: String): Nothing = throw new java.io.IOException(msg)
      if (p.length < 12 || new String(p, 0, 4, "US-ASCII") != "RIFF" ||
          new String(p, 8, 4, "US-ASCII") != "AVI ") fail("not an AVI")
      var declared = -1L; var usf = -1L; var w = 0; var h = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(from: Int, to: Int, depth: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = new String(p, off, 4, "US-ASCII")
          val size = le32(p, off + 4).toInt
          val body = off + 8
          if (size < 0 || body + size > to) fail(s"chunk '$id' overruns")
          id match {
            case "LIST" if depth < 6 =>
              walk(body + 4, body + size, depth + 1) // skip list type 4cc
            case "avih" =>
              if (size < 40) fail("short avih")
              usf = le32(p, body)
              declared = le32(p, body + 16)
              w = le32(p, body + 32).toInt
              h = le32(p, body + 36).toInt
            case c if c.matches("[0-9]{2}d[bc]") => // '##dc'/'##db' stream frames
              frames += java.util.Arrays.copyOfRange(p, body, body + size)
            case _ => ()
          }
          off = body + size + (size & 1) // even padding
        }
      }
      walk(12, p.length, 0)
      if (declared < 0) fail("AVI without avih")
      (declared, usf, w, h, frames.toSeq)
    }
  }

  /** Decode stage: per-partition batched processing of binary payloads.
    * Batches are bounded by `batchBytes` so a partition of large blobs never
    * materializes more than one batch of decoded intermediates at a time —
    * the same contract a mapInPandas batch gives.
    */
  def decode(media: Dataset[MediaRow], batchBytes: Long = 64L << 20): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      new Iterator[DecodedMeta] {
        private val batch = new scala.collection.mutable.Queue[DecodedMeta]()
        override def hasNext: Boolean = batch.nonEmpty || it.hasNext
        override def next(): DecodedMeta = {
          if (batch.isEmpty) {
            var bytes = 0L
            while (it.hasNext && (bytes == 0L || bytes < batchBytes)) {
              val row = it.next()
              bytes += row.payload.length
              batch.enqueue(decodeOne(row))
            }
          }
          batch.dequeue()
        }
      }
    }
  }

  /** ISO-BMFF sample-table summaries: one [[TrackTable]] row per
    * (media, track) with exact per-track sample counts, byte totals and
    * durations from the stts/stsz(stz2)/stsc/stco tables — the codec-free
    * answer to "how many frames, how long, how many bytes" for video and
    * audio containers (frame-PIXEL decode alone stays behind the
    * documented [[FakeCodec]] stub). Malformed movies emit one ok=false
    * row; a valid movie with zero tracks emits one ok=true placeholder.
    *
    * Scale shape: narrow flatMap — only header/stbl bytes are touched,
    * one movie per task row, no shuffle; output is tracks-sized, never
    * sample-sized (the run-length stts stays run-length).
    */
  def mp4SampleTables(media: Dataset[MediaRow]): Dataset[TrackTable] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { row =>
      try {
        val ts = RealCodec.parseMp4Tracks(row.payload)
        if (ts.isEmpty)
          Seq(TrackTable(row.media_id, -1L, "", 0L, 0L, 0L, 0L, 0L, 0L, 0L,
            0L, 0L, ok = true))
        else ts.map { case (tid, h, tsc, dur, n, bytes, ticks, nstts, nstsc, nch) =>
          TrackTable(row.media_id, tid, h, tsc, dur.max(0L),
            if (tsc > 0) dur.max(0L) * 1000L / tsc else 0L,
            n, bytes, ticks, nstts, nstsc, nch, ok = true)
        }
      } catch {
        case _: Exception =>
          Seq(TrackTable(row.media_id, -1L, "", 0L, 0L, 0L, 0L, 0L, 0L, 0L,
            0L, 0L, ok = false))
      }
    }
  }

  /** REAL video FRAME-CONTENT decode for intra-frame codecs: walk the
    * AVI (RIFF) container, pull every video frame chunk, and decode each
    * frame's raster with the JDK image codecs (PNG/MJPEG-style frames —
    * any payload javax.imageio understands), emitting exact integer
    * channel sums per frame next to the container's declared frame count
    * and frame period. This moves video decode from "container metadata
    * only" to REAL per-frame pixels wherever frames are self-contained;
    * inter-frame codecs (H.264 etc. — no JDK codec exists) remain behind
    * the documented [[FakeCodec]] stub, and an undecodable frame emits
    * its row with ok=false rather than failing the stage.
    *
    * Scale shape: narrow flatMap, one movie per task row, one frame
    * raster in memory at a time; output is frames-sized.
    */
  def videoFrameStats(media: Dataset[MediaRow]): Dataset[FrameStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { row =>
      try {
        val (declared, usf, _, _, frames) =
          RealCodec.parseAviFrames(row.payload)
        frames.zipWithIndex.map { case (f, i) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(f))
            if (img == null) throw new java.io.IOException("undecodable frame")
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val v = img.getRGB(x, y)
                sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
                x += 1
              }
              y += 1
            }
            FrameStats(row.media_id, i.toLong, f.length.toLong,
              img.getWidth, img.getHeight,
              img.getWidth.toLong * img.getHeight, sr, sg, sb,
              declared, usf, ok = true)
          } catch {
            case _: Exception =>
              FrameStats(row.media_id, i.toLong, f.length.toLong,
                0, 0, 0L, 0L, 0L, 0L, declared, usf, ok = false)
          }
        }
      } catch {
        case _: Exception =>
          Seq(FrameStats(row.media_id, -1L, row.payload.length.toLong,
            0, 0, 0L, 0L, 0L, 0L, -1L, -1L, ok = false))
      }
    }
  }

  private def decodeOne(row: MediaRow): DecodedMeta = {
    try {
      val (w, h, ch, dur) = RealCodec.decode(row.payload)
        .getOrElse(FakeCodec.decodeMeta(row.kind, row.payload))
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(row.payload).take(8).map(b => f"${b & 0xff}%02x").mkString
      DecodedMeta(row.media_id, row.kind, row.payload.length.toLong, w, h, ch, dur, sha, ok = true)
    } catch {
      case _: Exception =>
        DecodedMeta(row.media_id, row.kind, row.payload.length.toLong, 0, 0, 0, 0L, "", ok = false)
    }
  }

  /** Feature-extract stage (frame-sampled for video/audio): one feature
    * vector per media id, dimension `dim`.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
                      sampleEveryMs: Long = 1000L): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { row =>
      val (_, _, _, dur) = FakeCodec.decodeMeta(row.kind, row.payload)
      val frames = FakeCodec.frameCount(row.kind, dur, sampleEveryMs)
      // frame-sample: fold per-frame features (stub: seed varies per frame)
      val acc = new Array[Float](dim)
      var f = 0
      while (f < frames) {
        val feat = FakeCodec.extractFeature(row.payload :+ f.toByte, dim)
        var d = 0
        while (d < dim) { acc(d) += feat(d) / frames; d += 1 }
        f += 1
      }
      MediaFeature(row.media_id, acc, frames)
    }
  }

  final case class PixelStats(
      media_id: Long, width: Int, height: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, ok: Boolean)

  /** REAL image feature extraction (no stub in this path): decode the full
    * pixel raster via javax.imageio and emit exact integer channel sums —
    * the decode-verify / brightness signals a curation pipeline derives
    * from image payloads. For LOSSLESS formats (PNG) the raster is
    * bit-exact by spec, so an external oracle recomputes the sums
    * CLOSED-FORM from the generator's fill function without consulting the
    * engine; JPEG rasters are decoder-dependent, so drivers pin PNG and
    * specs exercise JPEG structurally (ok + dimensions). Undecodable
    * payloads emit ok=false zeros rather than failing the stage.
    *
    * Scale shape: row-local mapPartitions work — one decoded raster in
    * memory per task at a time, no shuffle; pair with
    * [[repartitionByBytes]] upstream so blob-size skew doesn't serialize
    * the stage.
    */
  /** EXIF orientation per media row (nullable — see
    * [[RealCodec.exifOrientation]]): the pre-resize normalization input
    * (orientations 5-8 transpose width/height; ignoring them corrupts
    * every downstream aspect-ratio feature).
    */
  def exifOrientations(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r => (r.media_id, RealCodec.exifOrientation(r.payload)))
      .toDF("media_id", "orientation")
  }

  def imagePixelStats(media: Dataset[MediaRow]): Dataset[PixelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { row =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.payload))
        if (img == null) throw new java.io.IOException("undecodable image")
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v = img.getRGB(x, y)
            sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
            x += 1
          }
          y += 1
        }
        PixelStats(row.media_id, img.getWidth, img.getHeight,
          img.getWidth.toLong * img.getHeight, sr, sg, sb, ok = true)
      } catch {
        case _: Exception =>
          PixelStats(row.media_id, 0, 0, 0L, 0L, 0L, 0L, ok = false)
      }
    }
  }

  final case class AudioStats(
      media_id: Long, channels: Int, sample_rate: Long, n_samples: Long,
      peak_abs: Long, sum_abs: Long, sum_sq: Long, ok: Boolean)

  /** REAL audio feature extraction: walk the RIFF chunk grammar, decode the
    * PCM16LE sample stream, and emit exact integer energy statistics —
    * peak / L1 / L2 mass, the loudness-and-clipping signals an audio
    * curation pipeline gates on. PCM is lossless, so an external oracle
    * recomputes every stat closed-form from the generator's sample
    * function without consulting the engine. Only uncompressed PCM16
    * (fmtTag 1, 16 bits) decodes; anything else — or a malformed/truncated
    * container — emits ok=false zeros rather than failing the stage.
    *
    * `n_samples` counts channel-interleaved PCM frames' individual samples
    * (stereo second = 2 x sample_rate samples). `sum_sq` is exact in int64
    * up to ~8.6e9 samples per payload (32767^2 per sample); a payload
    * beyond that (~17 h of 48 kHz stereo in ONE blob) belongs in chunked
    * form long before arithmetic is the problem.
    *
    * Scale shape: row-local map, one payload in memory per task, no
    * shuffle; pair with [[repartitionByBytes]] for blob-size skew.
    */
  final case class G711Stats(
      media_id: Long, codec: String, channels: Int, sample_rate: Long,
      n_samples: Long, peak_abs: Long, sum_abs: Long, sum_sq: Long,
      ok: Boolean)

  /** Canonical ITU-T G.711 expansions (the public-domain Sun ulaw.c /
    * alaw.c arithmetic) — closed-form integer chains, validated
    * byte-for-byte against javax.sound's own ULAW/ALAW converters in
    * MultimodalSpec.
    */
  object G711 {
    @inline def ulawToLinear(b: Byte): Int = {
      val u = ~b & 0xff
      var t = ((u & 0xf) << 3) + 0x84
      t <<= (u & 0x70) >> 4
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }
    @inline def alawToLinear(b: Byte): Int = {
      val a = (b ^ 0x55) & 0xff
      val seg = (a & 0x70) >> 4
      var t = (a & 0xf) << 4
      if (seg == 0) t += 8
      else if (seg == 1) t += 0x108
      else { t += 0x108; t <<= seg - 1 }
      if ((a & 0x80) != 0) t else -t
    }
  }

  /** COMPRESSED-audio SAMPLE-CONTENT decode for the G.711 telephony
    * codecs: WAV containers with fmtTag 7 (mu-law) or 6 (A-law) carry one
    * encoded byte per sample; the ITU expansion is a closed-form integer
    * chain ([[G711]]), so the decoded energy statistics (peak / L1 / L2)
    * are EXACT and an external engine replays them from the generator's
    * byte function without consulting the engine — the same contract as
    * [[audioPcmStats]], now for genuinely compressed payloads. Anything
    * that is not an 8-bit G.711 WAV emits ok=false zeros.
    *
    * Scale shape: narrow map, one payload per row, O(bytes) decode.
    */
  def audioG711Stats(media: Dataset[MediaRow]): Dataset[G711Stats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { row =>
      try {
        val p = row.payload
        if (p.length < 12 || new String(p, 0, 4, "US-ASCII") != "RIFF" ||
          new String(p, 8, 4, "US-ASCII") != "WAVE")
          throw new java.io.IOException("not a wav")
        @inline def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
        @inline def le32(o: Int): Long =
          (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
            ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
        var off = 12L
        var fmtTag = -1; var channels = -1; var rate = -1L; var bits = -1
        var dataOff = -1; var dataLen = -1L
        var walking = true
        while (walking && off + 8 <= p.length) {
          val o = off.toInt
          val id = new String(p, o, 4, "US-ASCII")
          val len = le32(o + 4)
          if (id == "fmt " && o + 8 + 16 <= p.length) {
            fmtTag = le16(o + 8); channels = le16(o + 10)
            rate = le32(o + 12); bits = le16(o + 22)
          } else if (id == "data") {
            dataOff = o + 8
            dataLen = math.min(len, (p.length - o - 8).toLong)
          }
          val next = off + 8L + len + (len & 1L)
          if (next <= off) walking = false else off = next
        }
        if ((fmtTag != 7 && fmtTag != 6) || bits != 8 || channels <= 0 ||
          rate <= 0 || dataOff < 0)
          throw new java.io.IOException("not an 8-bit G.711 wav")
        val codec = if (fmtTag == 7) "ulaw" else "alaw"
        var i = 0L
        var peak = 0L; var sumAbs = 0L; var sumSq = 0L
        while (i < dataLen) {
          val b = p(dataOff + i.toInt)
          val v = (if (fmtTag == 7) G711.ulawToLinear(b)
                   else G711.alawToLinear(b)).toLong
          val a = math.abs(v)
          if (a > peak) peak = a
          sumAbs += a
          sumSq += v * v
          i += 1
        }
        G711Stats(row.media_id, codec, channels, rate, dataLen, peak,
          sumAbs, sumSq, ok = true)
      } catch {
        case _: Exception =>
          G711Stats(row.media_id, "", 0, 0L, 0L, 0L, 0L, 0L, ok = false)
      }
    }
  }

  def audioPcmStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { row =>
      try {
        val p = row.payload
        if (p.length < 12 || new String(p, 0, 4, "US-ASCII") != "RIFF" ||
          new String(p, 8, 4, "US-ASCII") != "WAVE")
          throw new java.io.IOException("not a wav")
        @inline def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
        @inline def le32(o: Int): Long =
          (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
            ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
        var off = 12L
        var fmtTag = -1; var channels = -1; var rate = -1L; var bits = -1
        var dataOff = -1; var dataLen = -1L
        var walking = true
        while (walking && off + 8 <= p.length) {
          val o = off.toInt
          val id = new String(p, o, 4, "US-ASCII")
          val len = le32(o + 4)
          if (id == "fmt " && o + 8 + 16 <= p.length) {
            fmtTag = le16(o + 8); channels = le16(o + 10)
            rate = le32(o + 12); bits = le16(o + 22)
          } else if (id == "data") {
            dataOff = o + 8
            dataLen = math.min(len, (p.length - o - 8).toLong)
          }
          val next = off + 8L + len + (len & 1L)
          if (next <= off) walking = false else off = next
        }
        if (fmtTag != 1 || bits != 16 || channels <= 0 || rate <= 0 || dataOff < 0)
          throw new java.io.IOException("not PCM16")
        val n = dataLen / 2
        var i = 0L
        var peak = 0L; var sumAbs = 0L; var sumSq = 0L
        while (i < n) {
          val o = dataOff + 2 * i.toInt
          val s = ((p(o) & 0xff) | (p(o + 1) << 8)).toShort.toLong
          val a = math.abs(s)
          if (a > peak) peak = a
          sumAbs += a
          sumSq += s * s
          i += 1
        }
        AudioStats(row.media_id, channels, rate, n, peak, sumAbs, sumSq, ok = true)
      } catch {
        case _: Exception =>
          AudioStats(row.media_id, 0, 0L, 0L, 0L, 0L, 0L, ok = false)
      }
    }
  }

  final case class DHash(media_id: Long, width: Int, height: Int,
                         dhash_hi: Long, dhash_lo: Long, ok: Boolean)

  /** Perceptual difference-hash (dHash) over the REAL decoded raster — the
    * standard cheap image near-dup signature (two images within a few
    * hamming bits are crops/recompressions of each other; pair via the
    * q17 banded hamming join). Deterministic integer pipeline so lossless
    * formats verify closed-form:
    *
    *   gray(x,y) = (r+g+b) div 3
    *   cell(x,y) = (x*9 div W, y*8 div H)   — every pixel in exactly one
    *                                          of 9x8 boxes, no resampling
    *   avg(cx,cy) = sum(gray) div count
    *   bit(cy*8+cx) = avg(cx,cy) > avg(cx+1,cy)
    *
    * emitted as two 32-bit halves (hi = bits 32..63) so external engines
    * never touch the int64 sign bit. Images narrower than 9 or shorter
    * than 8 pixels have empty cells and emit ok=false (a thumbnail that
    * small has no useful perceptual signature).
    *
    * Scale shape: row-local map, no shuffle.
    */
  def imageDHash(media: Dataset[MediaRow]): Dataset[DHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { row =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.payload))
        if (img == null) throw new java.io.IOException("undecodable image")
        val w = img.getWidth; val h = img.getHeight
        if (w < 9 || h < 8) throw new java.io.IOException("below 9x8")
        val sums = Array.ofDim[Long](9, 8)
        val counts = Array.ofDim[Long](9, 8)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val v = img.getRGB(x, y)
            val gray = (((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)) / 3
            val cx = x * 9 / w
            sums(cx)(cy) += gray; counts(cx)(cy) += 1
            x += 1
          }
          y += 1
        }
        var hi = 0L; var lo = 0L
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            val l = sums(cx)(cy) / counts(cx)(cy)
            val r = sums(cx + 1)(cy) / counts(cx + 1)(cy)
            if (l > r) {
              val idx = cy * 8 + cx
              if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
            }
            cx += 1
          }
          cy += 1
        }
        DHash(row.media_id, w, h, hi, lo, ok = true)
      } catch {
        case _: Exception => DHash(row.media_id, 0, 0, 0L, 0L, ok = false)
      }
    }
  }

  /** Deterministic real-container fixtures (tests + driver oracles): actual
    * PNG/JPEG streams from javax.imageio over a fixed pixel pattern, and a
    * hand-assembled canonical 44-byte-header PCM WAV. Dimensions, channel
    * counts and durations are closed-form by construction, so an oracle can
    * hard-code them without consulting the engine.
    */
  object MediaGen {
    private def image(w: Int, h: Int, imgType: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, 0xff000000 | ((x * 31 + y * 17) & 0xffffff))
          x += 1
        }
        y += 1
      }
      img
    }

    private def encode(img: java.awt.image.BufferedImage, format: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }

    def pngBytes(w: Int, h: Int, alpha: Boolean = false): Array[Byte] =
      encode(image(w, h,
        if (alpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
        else java.awt.image.BufferedImage.TYPE_INT_RGB), "png")

    def jpegBytes(w: Int, h: Int): Array[Byte] =
      encode(image(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB), "jpg")

    /** PCM WAV: canonical RIFF/fmt/data layout; samples are a deterministic
      * sawtooth. duration_ms = dataBytes * 1000 / (sampleRate * channels * 2).
      */
    def wavBytes(channels: Int, sampleRate: Int, dataBytes: Int): Array[Byte] = {
      val byteRate = sampleRate * channels * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(byteRate).putShort((channels * 2).toShort).putShort(16)
      out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      var i = 0
      while (i < dataBytes / 2) { out.putShort(((i * 257) % 32768).toShort); i += 1 }
      out.array()
    }

    /** G.711 WAV: fmtTag 7 (mu-law) / 6 (A-law), 8 bits per sample, raw
      * encoded bytes as the data chunk — the [[audioG711Stats]] input.
      */
    def wavG711Bytes(codec: String, channels: Int, sampleRate: Int,
                     samples: Array[Byte]): Array[Byte] = {
      require(codec == "ulaw" || codec == "alaw", s"unknown codec $codec")
      val fmtTag = if (codec == "ulaw") 7 else 6
      val byteRate = sampleRate * channels
      val out = java.nio.ByteBuffer.allocate(44 + samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(fmtTag.toShort).putShort(channels.toShort).putInt(sampleRate)
        .putInt(byteRate).putShort(channels.toShort).putShort(8)
      out.put("data".getBytes("US-ASCII")).putInt(samples.length)
      out.put(samples)
      out.array()
    }

    /** Minimal valid ISO BMFF movie: ftyp + moov(mvhd v0 + trak(tkhd v0)).
      * timescale 1000, so mvhd duration == durationMs; dimensions are the
      * tkhd 16.16 fixed-point fields. Header-only (no mdat) — exactly the
      * part of the container the metadata walk reads.
      */
    def mp4Bytes(w: Int, h: Int, durationMs: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + 216) // big-endian default
      def ascii(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
      bb.putInt(16); ascii("ftyp"); ascii("isom"); bb.putInt(0)
      bb.putInt(216); ascii("moov")
      bb.putInt(108); ascii("mvhd")
      bb.putInt(0)                        // version 0 + flags
      bb.putInt(0).putInt(0)              // creation, modification
      bb.putInt(1000)                     // timescale
      bb.putInt(durationMs)               // duration (in timescale units)
      bb.putInt(0x00010000)               // rate 1.0
      bb.putShort(0x0100.toShort).putShort(0) // volume 1.0 + reserved
      bb.putLong(0L)                      // reserved
      bb.putInt(0x00010000).putInt(0).putInt(0) // identity matrix
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(2)                        // next_track_ID
      bb.putInt(100); ascii("trak")
      bb.putInt(92); ascii("tkhd")
      bb.putInt(7)                        // version 0 + flags (enabled|in movie|in preview)
      bb.putInt(0).putInt(0)              // creation, modification
      bb.putInt(1)                        // track_ID
      bb.putInt(0)                        // reserved
      bb.putInt(durationMs)               // duration
      bb.putLong(0L)                      // reserved
      bb.putShort(0).putShort(0)          // layer, alternate_group
      bb.putShort(0).putShort(0)          // volume (video: 0), reserved
      bb.putInt(0x00010000).putInt(0).putInt(0) // identity matrix
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      bb.putInt(w << 16).putInt(h << 16)  // 16.16 fixed-point dimensions
      bb.array()
    }

    /** Minimal AVI container carrying the given frame payloads as
      * '00dc' chunks (an intra-frame "codec" — each payload is a
      * self-contained image the JDK can decode): RIFF('AVI ') with a
      * hdrl list (avih main header: usPerFrame, declared frame count,
      * dims; one 'vids' strl) and a movi list. Exactly the grammar
      * [[RealCodec.parseAviFrames]] walks, incl. even-size padding.
      */
    def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
                 usPerFrame: Int): Array[Byte] = {
      def le(i: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
        id.getBytes("US-ASCII") ++ le(body.length) ++ body ++ pad
      }
      def list(typ: String, bodies: Array[Byte]*): Array[Byte] =
        chunk("LIST", typ.getBytes("US-ASCII") ++ bodies.flatten)
      val avih = chunk("avih", le(usPerFrame) ++ le(0) ++ le(0) ++ le(0x10) ++
        le(frames.size) ++ le(0) ++ le(1) ++ le(0) ++ le(w) ++ le(h) ++
        le(0) ++ le(0) ++ le(0) ++ le(0))
      val strh = chunk("strh", "vids".getBytes("US-ASCII") ++
        "MJPG".getBytes("US-ASCII") ++ le(0) ++ le(0) ++ le(0) ++
        le(1) ++ le(1000000 / math.max(1, usPerFrame)) ++ le(0) ++
        le(frames.size) ++ le(0) ++ le(0) ++ le(0) ++ le(0) ++ le(0))
      val strf = chunk("strf", le(40) ++ le(w) ++ le(h) ++
        Array[Byte](1, 0, 24, 0) ++ le(0x47504a4d) ++ le(w * h * 3) ++
        le(0) ++ le(0) ++ le(0) ++ le(0))
      val hdrl = list("hdrl", avih, list("strl", strh, strf))
      val movi = list("movi", frames.map(f => chunk("00dc", f)): _*)
      val riff = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("US-ASCII") ++ le(riff.length) ++ riff
    }

    /** One generated track's parameters for [[mp4SampleTableBytes]]:
      * sttsRuns are (sample_count, delta_ticks) pairs; sampleSizes is
      * Left(constantSize) or Right(perSampleSizes); mdhdV1 exercises the
      * 64-bit mdhd layout. mdhd duration is derived = Σ count·delta.
      */
    final case class GenTrack(trackId: Int, handler: String, timescale: Int,
        sttsRuns: Seq[(Int, Int)], sampleSizes: Either[Int, Seq[Int]],
        nChunks: Int, mdhdV1: Boolean = false)

    /** ISO BMFF movie with full per-track sample tables
      * (stts/stsz/stsc/stco) — exactly the boxes
      * [[RealCodec.parseMp4Tracks]] walks; closed-form by construction.
      */
    def mp4SampleTableBytes(tracks: Seq[GenTrack]): Array[Byte] = {
      def be(i: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(i).array()
      def be64(l: Long): Array[Byte] = java.nio.ByteBuffer.allocate(8).putLong(l).array()
      def box(typ: String, body: Array[Byte]*): Array[Byte] = {
        val len = 8 + body.map(_.length).sum
        val bb = java.nio.ByteBuffer.allocate(len)
        bb.putInt(len).put(typ.getBytes("US-ASCII"))
        body.foreach(bb.put)
        bb.array()
      }
      def tkhd(t: GenTrack): Array[Byte] = box("tkhd",
        be(7), be(0), be(0), be(t.trackId), be(0), be(0), be64(0L),
        be(0), be(0),                                 // layer/alt, volume/res
        be(0x00010000), be(0), be(0), be(0), be(0x00010000), be(0),
        be(0), be(0), be(0x40000000), be(0), be(0))   // matrix + 0x0 dims
      def mdhd(t: GenTrack): Array[Byte] = {
        val dur = t.sttsRuns.map { case (c, d) => c.toLong * d }.sum
        if (t.mdhdV1)
          box("mdhd", Array[Byte](1, 0, 0, 0), be64(0L), be64(0L),
            be(t.timescale), be64(dur), be(0x55c40000))
        else box("mdhd", be(0), be(0), be(0), be(t.timescale),
          be(dur.toInt), be(0x55c40000))
      }
      def hdlr(t: GenTrack): Array[Byte] = box("hdlr",
        be(0), be(0), t.handler.getBytes("US-ASCII"),
        be(0), be(0), be(0), Array[Byte](0))
      def stbl(t: GenTrack): Array[Byte] = {
        val stts = box("stts", be(0) +: be(t.sttsRuns.size) +:
          t.sttsRuns.flatMap { case (c, d) => Seq(be(c), be(d)) }: _*)
        val nSamples = t.sttsRuns.map(_._1).sum
        val stsz = t.sampleSizes match {
          case Left(const) => box("stsz", be(0), be(const), be(nSamples))
          case Right(sizes) =>
            require(sizes.size == nSamples, "per-sample sizes must match stts")
            box("stsz", be(0) +: be(0) +: be(sizes.size) +: sizes.map(be): _*)
        }
        val stsc = box("stsc", be(0), be(1), be(1),
          be(math.max(1, nSamples / math.max(1, t.nChunks))), be(1))
        val stco = box("stco", be(0) +: be(t.nChunks) +:
          (0 until t.nChunks).map(i => be(4096 * (i + 1))): _*)
        box("stbl", stts, stsz, stsc, stco)
      }
      def trak(t: GenTrack): Array[Byte] =
        box("trak", tkhd(t), box("mdia", mdhd(t), hdlr(t),
          box("minf", stbl(t))))
      val mvhd = box("mvhd", be(0), be(0), be(0), be(1000), be(0),
        be(0x00010000), be(0x01000000), be64(0L),
        be(0x00010000), be(0), be(0), be(0), be(0x00010000), be(0),
        be(0), be(0), be(0x40000000),
        be(0), be(0), be(0), be(0), be(0), be(0),
        be(tracks.map(_.trackId).maxOption.getOrElse(0) + 1))
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be(0))
      val moov = box("moov", mvhd +: tracks.map(trak): _*)
      ftyp ++ moov
    }

    /** Minimal JPEG carrying ONLY an EXIF APP1 segment with the
      * orientation tag — SOI + APP1(TIFF IFD0, one entry) + EOI. Exactly
      * the part of the container [[RealCodec.exifOrientation]] walks.
      */
    def jpegExifBytes(orientation: Int, littleEndian: Boolean = true): Array[Byte] = {
      val tiff = java.nio.ByteBuffer.allocate(26).order(
        if (littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
      tiff.put((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
      tiff.putShort(42).putInt(8)           // magic + IFD0 offset
      tiff.putShort(1)                      // one entry
      tiff.putShort(0x0112).putShort(3).putInt(1) // tag, SHORT, count
      tiff.putShort(orientation.toShort).putShort(0)
      tiff.putInt(0)                        // next IFD
      val app1Body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff.array()
      val len = app1Body.length + 2
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ app1Body ++
        Array[Byte](0xff.toByte, 0xd9.toByte)
    }

    /** Minimal WebP container with one header chunk of the given grammar
      * ("VP8X" | "VP8L" | "VP8 ") — exactly what
      * [[RealCodec.decode]]'s webp walk reads; no image body.
      */
    def webpBytes(chunk: String, w: Int, h: Int,
                  alpha: Boolean = false): Array[Byte] = {
      val payload: Array[Byte] = chunk match {
        case "VP8X" =>
          val b = new Array[Byte](10)
          b(0) = (if (alpha) 0x10 else 0x00).toByte
          val wm = w - 1; val hm = h - 1
          b(4) = (wm & 0xff).toByte; b(5) = ((wm >> 8) & 0xff).toByte
          b(6) = ((wm >> 16) & 0xff).toByte
          b(7) = (hm & 0xff).toByte; b(8) = ((hm >> 8) & 0xff).toByte
          b(9) = ((hm >> 16) & 0xff).toByte
          b
        case "VP8L" =>
          val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
            (if (alpha) 1L << 28 else 0L)
          Array[Byte](0x2f.toByte, (bits & 0xff).toByte,
            ((bits >> 8) & 0xff).toByte, ((bits >> 16) & 0xff).toByte,
            ((bits >> 24) & 0xff).toByte)
        case "VP8 " =>
          val b = new Array[Byte](10)
          b(3) = 0x9d.toByte; b(4) = 0x01; b(5) = 0x2a
          b(6) = (w & 0xff).toByte; b(7) = ((w >> 8) & 0x3f).toByte
          b(8) = (h & 0xff).toByte; b(9) = ((h >> 8) & 0x3f).toByte
          b
        case other => throw new IllegalArgumentException(s"chunk $other")
      }
      val bb = java.nio.ByteBuffer.allocate(20 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(12 + payload.length)
        .put("WEBP".getBytes("US-ASCII"))
        .put(chunk.getBytes("US-ASCII")).putInt(payload.length)
        .put(payload)
      bb.array()
    }

    /** Minimal FLAC: magic + last-flag STREAMINFO block with the given
      * rate/channels/total-samples (bps fixed at 16); no audio frames.
      */
    def flacBytes(sampleRate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
      val b = new Array[Byte](42)
      b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
      b(4) = 0x80.toByte // last-metadata-block | type 0 (STREAMINFO)
      b(7) = 34          // block length
      b(18) = ((sampleRate >> 12) & 0xff).toByte
      b(19) = ((sampleRate >> 4) & 0xff).toByte
      b(20) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 7) << 1) |
        ((16 - 1) >> 4)).toByte
      b(21) = ((((16 - 1) & 0xf) << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte
      b(22) = ((totalSamples >> 24) & 0xff).toByte
      b(23) = ((totalSamples >> 16) & 0xff).toByte
      b(24) = ((totalSamples >> 8) & 0xff).toByte
      b(25) = (totalSamples & 0xff).toByte
      b
    }

    /** Minimal MP3: optional ID3v2 tag (syncsafe size = `id3Pad`), then
      * one MPEG-1 Layer III frame header at 44.1 kHz and `audioBytes`
      * of filler — the CBR shape [[RealCodec.decode]]'s estimate reads.
      */
    def mp3Bytes(bitrateKbps: Int, stereo: Boolean, audioBytes: Int,
                 id3Pad: Int = 0): Array[Byte] = {
      val bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320)
      val idx = bitrates.indexOf(bitrateKbps)
      require(idx > 0, s"unsupported bitrate $bitrateKbps")
      require(audioBytes >= 4 && id3Pad >= 0, "need a frame header")
      val tag = if (id3Pad > 0) {
        val t = new Array[Byte](10 + id3Pad)
        t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 4
        t(6) = ((id3Pad >> 21) & 0x7f).toByte
        t(7) = ((id3Pad >> 14) & 0x7f).toByte
        t(8) = ((id3Pad >> 7) & 0x7f).toByte
        t(9) = (id3Pad & 0x7f).toByte
        t
      } else Array.empty[Byte]
      val audio = new Array[Byte](audioBytes)
      audio(0) = 0xff.toByte
      audio(1) = 0xfb.toByte // MPEG-1 Layer III, no CRC
      audio(2) = ((idx << 4) | (0 << 2)).toByte // 44.1 kHz
      audio(3) = (if (stereo) 0x00 else 0xc0).toByte
      tag ++ audio
    }

    /** GIF89a via ImageIO (real encoder): palette image, real LZW body. */
    def gifBytes(w: Int, h: Int): Array[Byte] =
      encode(image(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB), "gif")

    /** BMP via ImageIO: BITMAPINFOHEADER, 24-bit pixels. */
    def bmpBytes(w: Int, h: Int): Array[Byte] =
      encode(image(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR), "bmp")
  }

  /** Partition a media table so each task sees ~targetBytes of payload:
    * binary workloads are sized by bytes, not rows.
    */
  def repartitionByBytes(df: DataFrame, payloadCol: String, targetBytes: Long): DataFrame = {
    val stats = df.select(sum(length(col(payloadCol))).cast("long")).head()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (total / math.max(1L, targetBytes)).toInt)
    df.repartition(parts)
  }
}
