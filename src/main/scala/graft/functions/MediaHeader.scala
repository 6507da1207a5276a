package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-format HEADER decode for multimodal binary columns — the
  * real (non-stub) half of media handling that needs no codec: PNG
  * IHDR, JPEG SOF marker scan, and RIFF/WAVE fmt+data chunks are pure
  * byte arithmetic over the payload's first bytes.
  *
  * One native codegen expression (`binary -> struct`), so header
  * extraction over a 100 TB media column stays inside whole-stage
  * codegen with zero UDF/serialization cost — and, because only
  * leading bytes are touched, pairs naturally with a source that
  * stores payloads in their own column chunk: decode dimensions /
  * sample rates for a trillion files without reading payload bodies.
  *
  * Reference behavior target: the pipeline treats media as opaque
  * blobs with typed metadata (SURVEY.md multimodal north star); this
  * expression materializes that metadata from the bytes themselves.
  *
  * Fields are NULL where the format doesn't define them (e.g.
  * `sample_rate` for images); unrecognized/truncated payloads parse
  * as format="unknown" with all fields NULL — malformed bytes in a
  * web-scale crawl are data, not errors.
  */
case class MediaHeaderExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaHeader.schema
  override def prettyName: String = "media_header"

  override protected def nullSafeEval(input: Any): Any =
    MediaHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaHeader.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderExpr =
    copy(child = newChild)
}

object MediaHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("bit_depth", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("bitrate_kbps", IntegerType, nullable = true)))

  /** `media_header(bytes)` as a Column. */
  def headerOf(bytes: Column): Column =
    GraftColumnShim.column(MediaHeaderExpr(GraftColumnShim.expression(bytes)))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], i: Int): Int = be32(b, i) // 4CC compare as BE int

  private def row(format: String, width: java.lang.Integer = null,
                  height: java.lang.Integer = null, bitDepth: java.lang.Integer = null,
                  channels: java.lang.Integer = null, sampleRate: java.lang.Integer = null,
                  bitsPerSample: java.lang.Integer = null, nFrames: java.lang.Long = null,
                  bitrateKbps: java.lang.Integer = null): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(format), width, height,
      bitDepth, channels, sampleRate, bitsPerSample, nFrames, bitrateKbps))

  private val Unknown = "unknown"

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b.length >= 8 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a) parsePng(b)
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) parseJpeg(b)
    else if (b.length >= 12 && tag(b, 0) == 0x52494646 /* RIFF */ &&
             tag(b, 8) == 0x57415645 /* WAVE */) parseWav(b)
    else if (b.length >= 12 && tag(b, 4) == 0x66747970 /* ftyp */) parseMp4(b)
    else if (b.length >= 8 && tag(b, 0) == 0x664c6143 /* fLaC */) parseFlac(b)
    else if (b.length >= 4 &&
             ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
              ((b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0))) parseMp3(b)
    else row(Unknown)
  }

  /** MP3 (ISO 11172-3 / 13818-3, Layer III): an optional ID3v2 tag —
    * "ID3", version (2), flags (1), then a 28-bit SYNCSAFE size (4
    * bytes, 7 payload bits each; a set high bit is malformed) — is
    * skipped (footer flag adds 10 more), then the first MPEG frame
    * header must sit immediately after: 11-bit sync, 2-bit version
    * id (11 = MPEG1, 10 = MPEG2, 00 = MPEG2.5, 01 reserved), 2-bit
    * layer (01 = III — other layers out of declared scope), 4-bit
    * bitrate index resolved through the per-version Layer III kbps
    * table (0 = free and 15 = bad → unknown), 2-bit sample-rate
    * index into the per-version rate table (3 reserved), and the
    * channel mode (11 = mono). No n_frames: a header alone cannot
    * know the stream length (VBR), and guessing is not decoding. */
  private def parseMp3(b: Array[Byte]): InternalRow = {
    var pos = 0L
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      if (b.length < 10) return row(Unknown)
      if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return row(Unknown)
      val tagSize = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      pos = 10L + tagSize + (if ((b(5) & 0x10) != 0) 10L else 0L)
    }
    if (pos + 4 > b.length) return row(Unknown)
    val p = pos.toInt
    if ((b(p) & 0xff) != 0xff || (b(p + 1) & 0xe0) != 0xe0) return row(Unknown)
    val verId = (b(p + 1) >> 3) & 0x3
    val layer = (b(p + 1) >> 1) & 0x3
    if (layer != 1 /* Layer III */ || verId == 1 /* reserved */) return row(Unknown)
    val bIdx = (b(p + 2) >> 4) & 0xf
    val srIdx = (b(p + 2) >> 2) & 0x3
    if (bIdx == 0 || bIdx == 15 || srIdx == 3) return row(Unknown)
    val mode = (b(p + 3) >> 6) & 0x3
    val sr = verId match {
      case 3 => Array(44100, 48000, 32000)(srIdx)
      case 2 => Array(22050, 24000, 16000)(srIdx)
      case _ => Array(11025, 12000, 8000)(srIdx) // MPEG2.5
    }
    // Layer III kbps tables; MPEG2 and 2.5 share the low-rate table.
    val br =
      if (verId == 3) Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(bIdx)
      else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(bIdx)
    row("mp3", channels = if (mode == 3) 1 else 2, sampleRate = sr, bitrateKbps = br)
  }

  /** FLAC (RFC 9639): "fLaC" then metadata blocks — 1-byte header
    * (bit 7 = last-block flag, bits 0–6 = type) + BE24 length. The
    * spec mandates STREAMINFO (type 0) first; the walk skips
    * non-STREAMINFO blocks anyway (robustness over trust, the MP4
    * rule). STREAMINFO's packed 8 bytes at data offset 10: sample
    * rate 20 bits, channels−1 3 bits, bits-per-sample−1 5 bits,
    * total inter-channel samples 36 bits → n_frames. The cursor is
    * Long and strictly advances (the WAV adversarial-size rule). */
  private def parseFlac(b: Array[Byte]): InternalRow = {
    var pos = 4L
    while (pos + 4 <= b.length) {
      val p = pos.toInt
      val last = (b(p) & 0x80) != 0
      val btype = b(p) & 0x7f
      val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      if (btype == 0) {
        if (p + 22 > b.length) return row(Unknown) // truncated STREAMINFO
        val sr = ((b(p + 14) & 0xff) << 12) | ((b(p + 15) & 0xff) << 4) | ((b(p + 16) & 0xff) >> 4)
        val ch = ((b(p + 16) >> 1) & 0x7) + 1
        val bps = (((b(p + 16) & 1) << 4) | ((b(p + 17) & 0xff) >> 4)) + 1
        val tot = ((b(p + 17) & 0x0fL) << 32) |
          ((b(p + 18) & 0xffL) << 24) | ((b(p + 19) & 0xffL) << 16) |
          ((b(p + 20) & 0xffL) << 8) | (b(p + 21) & 0xffL)
        return row("flac", channels = ch, sampleRate = sr,
          bitsPerSample = bps, nFrames = tot)
      }
      if (last) return row(Unknown) // last block reached, no STREAMINFO
      pos += 4L + len
    }
    row(Unknown)
  }

  /** MP4 / ISO-BMFF (ISO 14496-12): top-level box walk (size BE32 +
    * 4CC) to `moov`, then children — `mvhd` v0 carries timescale
    * (offset +20 from box start) and duration (+24); the first `trak`
    * whose `tkhd` v0 declares a non-zero width gives the video
    * dimensions (16.16 fixed point at +84/+88). Field mapping into
    * the shared schema: sample_rate := mvhd timescale, n_frames :=
    * mvhd duration (in timescale units) — duration_ms derives as
    * n_frames·1000/sample_rate, the same closing arithmetic as WAV.
    * Version-1 (64-bit) headers and size==1 largesize boxes are out
    * of declared scope → unknown. The walk trusts DECLARED sizes
    * (header-only blobs parse fully) and advances in Long (the WAV
    * rule: an adversarial size must stop the walk, never loop it). */
  private def parseMp4(b: Array[Byte]): InternalRow = {
    var timescale: java.lang.Integer = null
    var duration: java.lang.Long = null
    var width: java.lang.Integer = null
    var height: java.lang.Integer = null
    var pos = 0L
    while (pos + 8 <= b.length) {
      val p = pos.toInt
      val size = be32(b, p).toLong & 0xffffffffL
      if (size < 8) return row(Unknown) // size==1 largesize: out of scope
      if (tag(b, p + 4) == 0x6d6f6f76 /* moov */) {
        val end = math.min(pos + size, b.length.toLong)
        var cpos = pos + 8
        while (cpos + 8 <= end) {
          val c = cpos.toInt
          val csize = be32(b, c).toLong & 0xffffffffL
          if (csize < 8) return row(Unknown)
          tag(b, c + 4) match {
            case 0x6d766864 /* mvhd */ if c + 28 <= b.length && b(c + 8) == 0 =>
              timescale = be32(b, c + 20)
              duration = java.lang.Long.valueOf(be32(b, c + 24).toLong & 0xffffffffL)
            case 0x7472616b /* trak */ if width == null =>
              val tend = math.min(cpos + csize, b.length.toLong)
              var gpos = cpos + 8
              while (gpos + 8 <= tend && width == null) {
                val g = gpos.toInt
                val gsize = be32(b, g).toLong & 0xffffffffL
                if (gsize < 8) return row(Unknown)
                if (tag(b, g + 4) == 0x746b6864 /* tkhd */ &&
                    g + 92 <= b.length && b(g + 8) == 0) {
                  val w = be32(b, g + 84) >>> 16
                  val h = be32(b, g + 88) >>> 16
                  if (w > 0 && h > 0) { width = w; height = h }
                }
                gpos += gsize
              }
            case _ => ()
          }
          cpos += csize
        }
      }
      pos += size
    }
    if (timescale == null) row(Unknown)
    else row("mp4", width, height, sampleRate = timescale, nFrames = duration)
  }

  /** PNG (RFC 2083): 8-byte signature, then the IHDR chunk — length
    * (4, BE), "IHDR" (4), width (4, BE), height (4, BE), bit depth
    * (1), color type (1). Channels derive from the color type. */
  private def parsePng(b: Array[Byte]): InternalRow = {
    if (b.length < 26 || tag(b, 12) != 0x49484452 /* IHDR */ ) return row(Unknown)
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val channels: java.lang.Integer = (b(25) & 0xff) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // indexed
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => null
    }
    if (width <= 0 || height <= 0) row(Unknown)
    else row("png", width, height, bitDepth, channels)
  }

  /** JPEG (ITU-T T.81): scan marker segments from after SOI until a
    * start-of-frame marker (0xC0-0xCF minus the non-frame 0xC4 DHT /
    * 0xC8 JPG / 0xCC DAC); SOF payload is precision (1), height (2,
    * BE), width (2, BE), component count (1). Standalone markers
    * (RSTn/SOI/EOI/TEM) carry no length field and are stepped over;
    * fill bytes (0xFF padding before a marker) are legal and skipped. */
  private def parseJpeg(b: Array[Byte]): InternalRow = {
    var pos = 2
    while (pos + 1 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return row(Unknown) // lost marker sync
      // skip fill bytes: any number of 0xFF may pad before the marker id
      var p = pos
      while (p + 1 < b.length && (b(p + 1) & 0xff) == 0xff) p += 1
      if (p + 1 >= b.length) return row(Unknown)
      val marker = b(p + 1) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (p + 9 >= b.length) return row(Unknown)
        val precision = b(p + 4) & 0xff
        val height = be16(b, p + 5)
        val width = be16(b, p + 7)
        val nComp = b(p + 9) & 0xff
        return if (width <= 0 || height <= 0) row(Unknown)
               else row("jpeg", width, height, precision, nComp)
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        pos = p + 2 // standalone marker: no length field
      } else {
        if (p + 3 >= b.length) return row(Unknown)
        val segLen = be16(b, p + 2)
        if (segLen < 2) return row(Unknown)
        pos = p + 2 + segLen
      }
    }
    row(Unknown)
  }

  /** RIFF/WAVE: chunk walk from offset 12 — each chunk is a 4CC id +
    * LE32 size + payload (word-aligned). "fmt " gives channels /
    * sample rate / block align / bits per sample; "data" gives the
    * payload size, hence frame count = size / block_align. The walk
    * trusts DECLARED sizes, so a header-only blob (metadata extraction
    * without fetching the payload body) still parses fully. */
  private def parseWav(b: Array[Byte]): InternalRow = {
    // Cursor and advance are Long: a declared chunk size is unsigned
    // 32-bit, so an Int advance can stall (adv truncates to 0) or go
    // negative on adversarial sizes >= 2^31 — the walk must strictly
    // advance or stop, never loop or index below 0.
    var pos = 12L
    var channels: java.lang.Integer = null
    var sampleRate: java.lang.Integer = null
    var bits: java.lang.Integer = null
    var blockAlign = 0
    var dataSize = -1L
    while (pos + 8 <= b.length && (channels == null || dataSize < 0)) {
      val p = pos.toInt // safe: pos + 8 <= b.length <= Int.MaxValue
      val id = tag(b, p)
      val size = le32(b, p + 4).toLong & 0xffffffffL
      if (id == 0x666d7420 /* "fmt " */ && p + 8 + 16 <= b.length) {
        channels = le16(b, p + 10)
        sampleRate = le32(b, p + 12)
        blockAlign = le16(b, p + 20)
        bits = le16(b, p + 22)
      } else if (id == 0x64617461 /* "data" */ ) {
        dataSize = size
      }
      pos += 8L + size + (size & 1L) // chunks are word-aligned; always >= 8
    }
    if (channels == null) row(Unknown)
    else {
      val nFrames: java.lang.Long =
        if (dataSize >= 0 && blockAlign > 0) java.lang.Long.valueOf(dataSize / blockAlign) else null
      row("wav", channels = channels, sampleRate = sampleRate,
        bitsPerSample = bits, nFrames = nFrames)
    }
  }
}
