package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column conventions: media payloads travel as opaque
  * `binary` columns next to typed metadata, and decode/feature steps
  * run batched per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but the Spark-side plumbing
  * (schema, binary payloads, partition-batched processing, feature
  * schema) is real and tested. On a real cluster the stub body is
  * replaced by an Arrow-batched decode (mapInPandas / a JNI codec);
  * the dataflow shape is identical.
  */
object Multimodal {

  /** One media item: payload + typed metadata. */
  case class MediaItem(media_id: Long, kind: String, bytes: Array[Byte], n_bytes: Long)

  /** Extracted features (stub schema: byte stats stand in for pixels/
    * samples). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           byte_sum: Long, byte_mean: Double, head_word: Long)

  /** Wrap a text corpus as media rows: payload = UTF-8 bytes. Stands
    * in for image/audio blobs in this container. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      octet_length(col("text")).cast("long").as("n_bytes")
    )

  /** FRAME SAMPLING over the raw payload: a `frameSize`-byte frame
    * every `stride` bytes — the video-style every-nth-frame access
    * pattern, expressed on the binary column itself (substring on
    * binary is codegen'd; no codec needed to LOCATE frames when the
    * container format is fixed-rate, which is exactly when frame
    * sampling is cheap). Output: (media_id, frame_idx, frame) with
    * one row per sampled frame; the final short frame is kept
    * truncated (substring clamps). Scale shape: pure map-side
    * explode — a 100 TB payload column never shuffles, and column
    * pruning keeps un-sampled bytes unread where the source splits
    * frames across files/row groups. */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    media
      .filter(col("n_bytes") > 0)
      .select(col("media_id"),
        posexplode(expr(
          s"transform(sequence(0, int((n_bytes - 1) DIV $stride)), i -> substring(bytes, i * $stride + 1, $frameSize))")))
      .select(col("media_id"), col("pos").cast("long").as("frame_idx"), col("col").as("frame"))
  }

  // ---- container-header fixtures + decode (REAL, no codec needed) ----

  private def hx(s: String): Column = unhex(lit(s))
  private def beInt(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  private def beShort(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
  private def leInt(c: Column): Column = {
    val h = lpad(hex(c), 8, "0")
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2)))
  }
  private def leShort(c: Column): Column = {
    val h = lpad(hex(c), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** PLANTED media fixtures: real PNG / JPEG / WAV container headers
    * (correct magics, chunk/segment layouts, endianness) whose field
    * values derive arithmetically from `doc_id` — so a cross-engine
    * oracle can predict every parsed field without itself parsing
    * bytes. Construction is pure SQL byte assembly (hex/unhex/concat —
    * codegen'd, distributed, no UDF); kind cycles doc_id % 3 over
    * png/jpeg/wav. The JPEG plants a JFIF APP0 plus a VARIABLE-length
    * comment segment ahead of SOF0, so decoding must genuinely walk
    * the marker chain; the WAV declares its data size without
    * materializing the payload — the header-only regime a metadata
    * crawl over 100 TB of audio would run in. */
  def headerFixtures(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    // png: width/height planted from doc_id; 8-bit RGBA
    val pngBytes = concat(
      hx("89504E470D0A1A0A"),                    // signature
      hx("0000000D"), hx("49484452"),            // IHDR length + tag
      beInt(d % 997 + 1), beInt(d % 491 + 1),    // width, height (BE)
      hx("0806000000"),                          // depth 8, color 6, comp/filter/interlace
      hx("00000000"),                            // CRC (not validated)
      hx("0000000049454E44AE426082"))            // empty IEND
    // jpeg: SOI, JFIF APP0, variable-length COM, SOF0, EOI
    val comPayload = expr("repeat('A', int(doc_id % 7 + 1))")
    val jpegBytes = concat(
      hx("FFD8"),                                // SOI
      hx("FFE00010"), hx("4A46494600"),          // APP0 len 16, "JFIF\0"
      hx("010100004800480000"),                  // v1.1, density 72x72, no thumb
      hx("FFFE"), beShort(d % 7 + 3),            // COM, len = payload + 2
      encode(comPayload, "UTF-8"),
      hx("FFC00011"), hx("08"),                  // SOF0 len 17, precision 8
      beShort(d % 257 + 1), beShort(d % 509 + 1), // height, width (BE)
      hx("03"), hx("011100021101031101"),        // 3 components
      hx("FFD9"))                                // EOI
    // wav: RIFF/WAVE with fmt + data chunk headers, sizes declared only
    val ch = d % 2 + 1
    val rate = d % 5 * 1000 + 8000
    val blockAlign = ch * 2 // 16-bit PCM
    val nFrames = d % 1000 + 1
    val dataSize = blockAlign * nFrames
    val wavBytes = concat(
      hx("52494646"), leInt(dataSize + 36), hx("57415645"), // RIFF size WAVE
      hx("666D7420"), leInt(lit(16)), leShort(lit(1)),      // "fmt " 16 PCM
      leShort(ch), leInt(rate), leInt(rate * blockAlign),   // channels, rate, byte rate
      leShort(blockAlign), leShort(lit(16)),                // block align, bits
      hx("64617461"), leInt(dataSize))                      // "data" + declared size
    docs.select(
      d.as("media_id"),
      when(d % 3 === 0, pngBytes).when(d % 3 === 1, jpegBytes).otherwise(wavBytes).as("bytes"))
  }

  /** MP4/ISO-BMFF fixtures: a minimal-but-correct box layout per doc —
    * ftyp(16) + moov(8 + mvhd v0 108 + trak(8 + tkhd v0 92)) with
    * timescale / duration / width / height planted from doc_id
    * (width/height in tkhd's 16.16 fixed point). Assembled
    * distributed in SQL bytes like [[headerFixtures]]; the q171
    * oracle predicts every field arithmetically, so the decode is
    * only right if [[MediaHeader]]'s box walk actually reads the
    * planted headers. */
  def mp4Fixtures(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val timescale = d % 4 * 600 + 600
    val duration = d % 9000 + 1
    val width = d % 640 + 16
    val height = d % 360 + 16
    val mvhd = concat(
      hx("0000006C"), hx("6D766864"),    // size 108, 'mvhd'
      hx("00000000"),                    // version 0 + flags
      hx("00000000"), hx("00000000"),    // ctime, mtime
      beInt(timescale), beInt(duration), // timescale, duration
      hx("00010000"), hx("0100"),        // rate 1.0, volume 1.0
      hx("0000" + "00" * 8),             // reserved (2 + 8)
      hx("000100000000000000000000000000000001000000000000000000000000000040000000"), // unity matrix
      hx("00" * 24),                     // pre_defined
      hx("00000002"))                    // next_track_ID
    val tkhd = concat(
      hx("0000005C"), hx("746B6864"),    // size 92, 'tkhd'
      hx("00000007"),                    // version 0 + flags (enabled|in-movie|in-preview)
      hx("00000000"), hx("00000000"),    // ctime, mtime
      hx("00000001"), hx("00000000"),    // track_ID 1, reserved
      beInt(duration),                   // duration
      hx("00" * 8),                      // reserved
      hx("0000"), hx("0000"), hx("0000"), hx("0000"), // layer, alt_group, volume, reserved
      hx("000100000000000000000000000000000001000000000000000000000000000040000000"), // unity matrix
      beShort(width), hx("0000"),        // width 16.16: integer high, fraction 0
      beShort(height), hx("0000"))       // height 16.16
    docs.select(
      d.as("media_id"),
      concat(
        hx("00000010"), hx("66747970"), hx("69736F6D"), hx("00000200"), // ftyp isom
        hx("000000D8"), hx("6D6F6F76"),                                 // moov size 216
        mvhd,
        hx("00000064"), hx("7472616B"),                                 // trak size 100
        tkhd).as("bytes"))
  }

  /** FLAC fixtures: a real "fLaC" + STREAMINFO metadata block whose
    * bit-packed fields (RFC 9639 §8.2: sample rate 20 bits,
    * channels−1 3 bits, bits-per-sample−1 5 bits, total samples 36
    * bits) are assembled DISTRIBUTED from per-row arithmetic — the
    * oracle predicts the decode output from the same arithmetic, so
    * the test is that the SQL byte packing and the expression's bit
    * unpacking are exact inverses. */
  def flacFixtures(docs: DataFrame): DataFrame = {
    // integer byte arithmetic stays in DIV/% (Column `/` is IEEE
    // double division — wrong tool for bit packing)
    val srE  = "(doc_id % 4 * 8000 + 16000)" // < 2^20
    val chE  = "(doc_id % 2 + 1)"
    val bpsE = "(doc_id % 3 * 4 + 16)"
    val totE = "(doc_id % 100000 + 1)"       // < 2^36
    def byte1(c: Column): Column = unhex(lpad(hex(c), 2, "0"))
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        hx("664C6143"),                  // "fLaC"
        hx("80"), hx("000022"),          // last-block | type 0, length 34
        beShort(lit(4096)), beShort(lit(4096)), // min/max block size
        hx("000000"), hx("000000"),      // min/max frame size (unknown)
        byte1(expr(s"$srE DIV 4096")),                     // sr >> 12
        byte1(expr(s"$srE DIV 16 % 256")),                 // (sr >> 4) & 0xFF
        byte1(expr(s"$srE % 16 * 16 + ($chE - 1) * 2 + ($bpsE - 1) DIV 16")),
        byte1(expr(s"($bpsE - 1) % 16 * 16 + $totE DIV 4294967296")),
        beInt(expr(s"$totE % 4294967296")), // low 32 bits of total samples
        hx("00" * 16)                    // MD5 signature (unchecked)
      ).as("bytes"))
  }

  /** MP3 fixtures: an ID3v2 tag whose 28-bit SYNCSAFE size varies per
    * row (doc_id % 300 filler bytes — sizes crossing the 7-bit byte
    * boundary exercise the 7-bits-per-byte unpacking), then one MPEG
    * Layer III frame header with per-row version (MPEG1/MPEG2),
    * bitrate index, sample-rate index, and channel mode. The oracle
    * predicts channels / sample rate / bitrate from the SAME
    * arithmetic through the version-specific tables, so the hash
    * match proves the packing and the table-driven unpacking are
    * exact inverses. */
  def mp3Fixtures(docs: DataFrame): DataFrame = {
    val verE  = "(doc_id % 2)"        // 1 = MPEG1, 0 = MPEG2
    val bIdxE = "(doc_id % 14 + 1)"   // 1..14: always a valid table row
    val srIdxE = "(doc_id % 3)"       // 0..2: index 3 is reserved
    val modeE = "(doc_id % 4)"        // 3 = mono
    val tagE  = "(doc_id % 300)"      // syncsafe: 00 00 (tag DIV 128) (tag % 128)
    def byte1(e: String): Column = unhex(lpad(hex(expr(e)), 2, "0"))
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        hx("494433"), hx("0300"), hx("00"),          // "ID3" v2.3, no footer
        hx("0000"), byte1(s"$tagE DIV 128"), byte1(s"$tagE % 128"),
        unhex(expr(s"repeat('00', CAST($tagE AS INT))")), // tag body (skipped)
        hx("FF"),
        byte1(s"CASE WHEN $verE = 1 THEN 251 ELSE 243 END"), // sync|ver|layer III|prot
        byte1(s"$bIdxE * 16 + $srIdxE * 4"),
        byte1(s"$modeE * 64")
      ).as("bytes"))
  }

  /** Parse container headers off the binary column —
    * [[MediaHeader.headerOf]] flattened to typed metadata columns.
    * All-codegen; touches only leading bytes of each payload. */
  def decodeHeaders(media: DataFrame): DataFrame =
    media.withColumn("h", MediaHeader.headerOf(col("bytes")))
      .select(col("media_id"), col("h.format").as("format"),
        col("h.width").cast("long").as("width"),
        col("h.height").cast("long").as("height"),
        col("h.bit_depth").cast("long").as("bit_depth"),
        col("h.channels").cast("long").as("channels"),
        col("h.sample_rate").cast("long").as("sample_rate"),
        col("h.bits_per_sample").cast("long").as("bits_per_sample"),
        col("h.n_frames").as("n_frames"))

  /** The MP3 projection: the fields a Layer III frame header can
    * actually carry (channels / rate / bitrate — no n_frames: VBR
    * makes stream length unknowable from one header). Kept separate
    * so [[decodeHeaders]]'s column contract — which q103/q171/q206
    * emit unprojected — stays frozen. */
  def decodeMp3Headers(media: DataFrame): DataFrame =
    media.withColumn("h", MediaHeader.headerOf(col("bytes")))
      .select(col("media_id"), col("h.format").as("format"),
        col("h.channels").cast("long").as("channels"),
        col("h.sample_rate").cast("long").as("sample_rate"),
        col("h.bitrate_kbps").cast("long").as("bitrate_kbps"))

  /** STUB decode / feature extraction — deterministic fake features
    * (byte histogram stats) in place of a real codec. Runs batched per
    * partition via mapPartitions: the executor-side iteration shape a
    * real decoder needs (amortized codec init per partition, no
    * per-row dispatch). */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      // real impl: init codec once per partition here
      it.map { m =>
        var sum = 0L
        var i = 0
        while (i < m.bytes.length) { sum += (m.bytes(i) & 0xff); i += 1 }
        val mean = if (m.bytes.length == 0) 0d else sum.toDouble / m.bytes.length
        var head = 0L
        var j = 0
        while (j < math.min(4, m.bytes.length)) { head = (head << 8) | (m.bytes(j) & 0xff); j += 1 }
        MediaFeatures(m.media_id, m.kind, m.n_bytes, sum, mean, head)
      }
    }
  }
}
