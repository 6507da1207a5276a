package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{MediaHeader, Multimodal}

/** Container-header decode: known-good real-file byte vectors parse to
  * their documented fields; planted fixtures round-trip to the
  * arithmetic the oracle predicts; malformed bytes degrade to
  * "unknown", never errors. */
class MediaHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def un(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(bytes: Array[Byte]): Row =
    Seq(Tuple1(bytes)).toDF("bytes")
      .select(MediaHeader.headerOf($"bytes").as("h")).select("h.*").collect().head

  test("PNG: a real 1x1 RGBA8 file's IHDR fields") {
    // the smallest standard PNG: signature, IHDR(1x1, depth 8, color 6),
    // IDAT with one zlib-deflated filter byte + RGBA pixel, IEND
    val png = un(
      "89504E470D0A1A0A 0000000D 49484452 00000001 00000001 08 06 00 00 00 1F15C489" +
      "0000000D 49444154 789C626001000000FFFF 03000006 000557BFABD4" +
      "00000000 49454E44 AE426082")
    val r = parse(png)
    assert(r.getString(0) == "png")
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) == ((1, 1, 8, 4)))
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7), "audio fields must be NULL for png")
  }

  test("JPEG: SOF0 found behind APP0 and a comment segment; fill bytes legal") {
    // SOI, JFIF APP0, COM("hi"), fill byte, SOF0(h=2, w=3, 3 components), EOI
    val jpeg = un(
      "FFD8" +
      "FFE00010 4A46494600 0101 00 0048 0048 00 00" +
      "FFFE0004 6869" +
      "FF" + // fill byte before next marker
      "FFC00011 08 0002 0003 03 011100 021101 031101" +
      "FFD9")
    val r = parse(jpeg)
    assert(r.getString(0) == "jpeg")
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) == ((3, 2, 8, 3)))
  }

  test("WAV: the canonical 44-byte PCM header example") {
    // 22050 Hz mono 16-bit, 2048 data bytes -> 1024 frames
    val wav = un(
      "52494646 24080000 57415645 666D7420 10000000 0100 0100" +
      "22560000 44AC0000 0200 1000 64617461 00080000")
    val r = parse(wav)
    assert(r.getString(0) == "wav")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3), "image fields must be NULL for wav")
    assert((r.getInt(4), r.getInt(5), r.getInt(6), r.getLong(7)) == ((1, 22050, 16, 1024L)))
  }

  test("MP4: hand-assembled ISO-BMFF boxes parse mvhd/tkhd; v1 and largesize degrade to unknown") {
    // independent of Multimodal.mp4Fixtures: assembled here by hand
    // per ISO 14496-12 so builder and parser can't share a layout bug.
    // mvhd v0: timescale 1000, duration 30000; tkhd v0: 320x240.
    val matrix = "00010000 00000000 00000000 00000000 00010000 00000000 00000000 00000000 40000000"
    val mvhd = "0000006C 6D766864 00000000 00000000 00000000 000003E8 00007530" +
      "00010000 0100 0000 0000000000000000" + matrix + "00" * 24 + "00000002"
    val tkhd = "0000005C 746B6864 00000007 00000000 00000000 00000001 00000000 00007530" +
      "00" * 8 + "0000 0000 0000 0000" + matrix + "01400000 00F00000"
    val mp4 = un(
      "00000014 66747970 69736F6D 00000200 6D703431" + // 20-byte ftyp with a compat brand
      "000000D8 6D6F6F76" + mvhd + "00000064 7472616B" + tkhd)
    val r = parse(mp4)
    assert(r.getString(0) == "mp4", s"got $r")
    assert((r.getInt(1), r.getInt(2)) == ((320, 240)), s"dims: $r")
    assert(r.getInt(5) == 1000 && r.getLong(7) == 30000L, s"timescale/duration: $r")
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(6), "unused fields NULL for mp4")
    // version-1 mvhd (64-bit times) is out of declared scope
    val v1 = un("00000010 66747970 69736F6D 00000200" +
      "00000018 6D6F6F76 00000010 6D766864 01000000 00000000")
    assert(parse(v1).getString(0) == "unknown")
    // a size<8 box must stop the walk as unknown, never loop
    val bad = un("00000010 66747970 69736F6D 00000200 00000001 6D6F6F76")
    assert(parse(bad).getString(0) == "unknown")
  }

  test("MP4 planted fixtures round-trip to the arithmetic the q171 oracle predicts") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val got = Multimodal.decodeHeaders(Multimodal.mp4Fixtures(docs)).collect()
    assert(got.length == docs.count())
    got.foreach { r =>
      val d = r.getLong(0)
      assert(r.getString(1) == "mp4", s"doc $d")
      assert(r.getLong(2) == d % 640 + 16 && r.getLong(3) == d % 360 + 16, s"doc $d dims")
      assert(r.getLong(6) == d % 4 * 600 + 600, s"doc $d timescale")
      assert(r.getLong(8) == d % 9000 + 1, s"doc $d duration")
    }
  }

  test("FLAC: hand-assembled STREAMINFO unpacks the bit-packed fields; degradations to unknown") {
    // sample rate 44100, stereo, 16-bit, total samples 0x123456789
    // (exercises the 36-bit span across the byte-13 nibble):
    // b10 = 0x0A, b11 = 0xC4, b12 = (4<<4)|(1<<1)|0 = 0x42,
    // b13 = (15<<4)|1 = 0xF1, b14..17 = 0x23456789
    val streaminfo = "03E8 03E8 000000 000000 0A C4 42 F1 23456789 " + "00" * 16
    val flac = un("664C6143 80 000022 " + streaminfo)
    val r = parse(flac)
    assert(r.getString(0) == "flac", s"format: $r")
    assert(r.getInt(4) == 2 && r.getInt(5) == 44100 && r.getInt(6) == 16, s"fields: $r")
    assert(r.getLong(7) == 0x123456789L, s"36-bit total samples: $r")
    // a VORBIS_COMMENT block ahead of STREAMINFO is skipped (the
    // walk does not TRUST the spec's ordering mandate)
    val reordered = un("664C6143 04 000004 DEADBEEF 80 000022 " + streaminfo)
    val r2 = parse(reordered)
    assert(r2.getString(0) == "flac" && r2.getInt(5) == 44100, s"skip failed: $r2")
    // truncated STREAMINFO and a last-flag block with no STREAMINFO
    // both degrade to unknown, never throw
    assert(parse(un("664C6143 80 000022 03E8 03E8 000000")).getString(0) == "unknown")
    assert(parse(un("664C6143 81 000000")).getString(0) == "unknown")
    // adversarial declared length: strictly advancing Long cursor stops
    assert(parse(un("664C6143 04 FFFFFF DEAD")).getString(0) == "unknown")
  }

  test("MP3: syncsafe ID3 skip + table-driven frame decode; degradations to unknown") {
    // ID3v2.3 tag, syncsafe size 200 = 0x00 0x00 0x01 0x48 (crosses
    // the 7-bit byte boundary), then MPEG1 Layer III: byte1 0xFB,
    // byte2 0x90 = bitrate idx 9 (128 kbps) | rate idx 0 (44100),
    // byte3 0x00 = stereo.
    val tagged = un("494433 0300 00 00000148 " + "00" * 200 + " FFFB9000")
    val r = parse(tagged)
    assert(r.getString(0) == "mp3", s"format: $r")
    assert(r.getInt(4) == 2 && r.getInt(5) == 44100 && r.getInt(8) == 128, s"fields: $r")
    assert(r.isNullAt(6) && r.isNullAt(7), "no bps/n_frames from a lossy frame header")
    // raw frame with no tag; MPEG2 indexes the LOW-rate table and
    // mono mode gives one channel
    val raw = parse(un("FFFB9000"))
    assert(raw.getString(0) == "mp3" && raw.getInt(8) == 128, s"raw: $raw")
    val mpeg2 = parse(un("FFF390C0"))
    assert(mpeg2.getInt(4) == 1 && mpeg2.getInt(5) == 22050 && mpeg2.getInt(8) == 80,
      s"MPEG2 mono: $mpeg2")
    // footer flag (b5 = 0x10) skips 10 more bytes past the body
    val footed = parse(un("494433 0300 10 00000000 " + "00" * 10 + " FFFB9000"))
    assert(footed.getString(0) == "mp3" && footed.getInt(5) == 44100, s"footer: $footed")
    // degradations: free bitrate, bad bitrate 15, reserved rate idx 3,
    // Layer II, reserved version, malformed syncsafe (high bit set),
    // tag shorter than its declared size
    for (bad <- Seq("FFFB0000", "FFFBF000", "FFFB9C00", "FFFD9000", "FFEB9000",
        "494433 0300 00 80000000 FFFB9000", "494433 0300 00 00000105 0000"))
      assert(parse(un(bad)).getString(0) == "unknown", s"must degrade: $bad")
  }

  test("malformed payloads parse as unknown, never throw") {
    for (bad <- Seq(
      Array.empty[Byte],
      "not media at all".getBytes("UTF-8"),
      un("89504E470D0A1A0A 0000000D 494844"),     // PNG truncated mid-IHDR tag
      un("FFD8 FFE000"),                           // JPEG truncated mid-segment
      un("FFD8 FFE00001"),                         // JPEG segment length < 2
      un("52494646 00000000 57415645 666D74"))) {  // WAV truncated mid-chunk
      assert(parse(bad).getString(0) == "unknown", s"bytes ${bad.length}")
    }
  }

  test("WAV with adversarial oversized declared chunk sizes terminates, never throws") {
    // Declared chunk sizes are UNSIGNED 32-bit and the walk trusts
    // them: an Int-truncated advance would stall at 0 (infinite loop)
    // or go negative (ArrayIndexOutOfBounds). The Long cursor must
    // strictly advance past them instead.
    // size 0xFFFFFFF8 on an unknown chunk: Int advance would be 0
    val stall = un("52494646 24080000 57415645 6A756E6B F8FFFFFF 00000000")
    assert(parse(stall).getString(0) == "unknown")
    // size 0x80000000: Int advance would drive pos negative
    val neg = un("52494646 24080000 57415645 6A756E6B 00000080 00000000")
    assert(parse(neg).getString(0) == "unknown")
    // fmt parsed first, THEN an oversized data-size declaration: the
    // walk keeps the fields it has and stops cleanly past the end
    val fmtThenHuge = un(
      "52494646 24080000 57415645 666D7420 10000000 0100 0100" +
      "22560000 44AC0000 0200 1000 64617461 FFFFFFFF")
    val r = parse(fmtThenHuge)
    assert(r.getString(0) == "wav")
    assert((r.getInt(4), r.getInt(5), r.getInt(6)) == ((1, 22050, 16)))
    // declared data size is taken at face value (header-only contract):
    // 0xFFFFFFFF / blockAlign 2
    assert(r.getLong(7) == 0xFFFFFFFFL / 2)
  }

  test("planted fixtures round-trip to the arithmetic the oracle predicts") {
    val docs = spark.range(0, 300).select($"id".as("doc_id"))
    val got = Multimodal.decodeHeaders(Multimodal.headerFixtures(docs))
      .orderBy("media_id").collect()
    assert(got.length == 300)
    got.foreach { r =>
      val d = r.getLong(0)
      def L(i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (d % 3) match {
        case 0 =>
          assert(r.getString(1) == "png", s"doc $d")
          assert(L(2) == Some(d % 997 + 1) && L(3) == Some(d % 491 + 1), s"doc $d dims")
          assert(L(4) == Some(8L) && L(5) == Some(4L), s"doc $d depth/channels")
          assert(L(6).isEmpty && L(7).isEmpty && L(8).isEmpty, s"doc $d audio fields")
        case 1 =>
          assert(r.getString(1) == "jpeg", s"doc $d")
          assert(L(2) == Some(d % 509 + 1) && L(3) == Some(d % 257 + 1), s"doc $d dims")
          assert(L(4) == Some(8L) && L(5) == Some(3L), s"doc $d depth/channels")
        case _ =>
          assert(r.getString(1) == "wav", s"doc $d")
          assert(L(2).isEmpty && L(3).isEmpty && L(4).isEmpty, s"doc $d image fields")
          assert(L(5) == Some(d % 2 + 1), s"doc $d channels")
          assert(L(6) == Some(d % 5 * 1000 + 8000), s"doc $d rate")
          assert(L(7) == Some(16L), s"doc $d bits")
          assert(L(8) == Some(d % 1000 + 1), s"doc $d frames")
      }
    }
  }
}
