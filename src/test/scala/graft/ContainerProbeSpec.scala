package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.ContainerProbe
import org.apache.spark.sql.graftext.ContainerMeta

/** The decoder-free MP3/MP4 container-structure leg: parsers pinned
  * against independent format constants (not just their own encoder),
  * corruption turned into None (never guessed numbers), and the
  * oracle-gated query shape. */
class ContainerProbeSpec extends AnyFunSuite {
  import TestSession._

  // ------------------------------------------------------------- MP3

  test("mp3 frame size matches the published constant: 128 kbps @ 44100 Hz = 417 bytes") {
    // floor(144 * 128000 / 44100) = 417 — the canonical CBR-128 frame
    // size every MP3 reference cites; independent of our encoder
    assert(ContainerProbe.mp3FrameBytes(bitrateIdx = 9, srIdx = 0, padding = 0) === 417)
    assert(ContainerProbe.Mp3BitrateKbps(9) === 128)
    // 320 kbps @ 32000 Hz = floor(144*320000/32000) = 1440
    assert(ContainerProbe.mp3FrameBytes(14, 2, 0) === 1440)
  }

  test("mp3 encode/parse round trip recovers every construction parameter") {
    for (frames <- Seq(1, 2, 9); bIdx <- Seq(1, 9, 14); sIdx <- 0 to 2; pad <- Seq(0, 17)) {
      val bytes = ContainerProbe.encodeMp3(frames, bIdx, sIdx, pad)
      val m = ContainerProbe.parseMp3(bytes).get
      assert(m.frames === frames)
      assert(m.bitrateKbps === ContainerProbe.Mp3BitrateKbps(bIdx))
      assert(m.sampleRate === ContainerProbe.Mp3SampleRates(sIdx))
      assert(m.id3Bytes === 10 + pad, "full tag length: 10-byte header + content")
      assert(m.durationMs === frames.toLong * 1152 * 1000 / m.sampleRate)
      assert(bytes.length === 10 + pad +
        frames * ContainerProbe.mp3FrameBytes(bIdx, sIdx, 0))
    }
  }

  test("mp3 parser counts variable-bitrate frames by each frame's own header") {
    // splice a 64 kbps frame after a 128 kbps frame (same sample rate)
    val a = ContainerProbe.encodeMp3(1, 9, 0, 0).drop(10) // strip ID3
    val b = ContainerProbe.encodeMp3(1, 5, 0, 0).drop(10)
    val m = ContainerProbe.parseMp3(a ++ b).get
    assert(m.frames === 2)
    assert(m.bitrateKbps === 128, "reported bitrate is the first frame's")
    assert(m.id3Bytes === 0, "bare streams (no ID3 tag) parse too")
  }

  test("mp3 corruption is None or fewer frames, never guessed numbers") {
    val good = ContainerProbe.encodeMp3(3, 9, 0, 5)
    // corrupt the first frame's sync
    val badSync = good.clone(); badSync(15) = 0x00
    assert(ContainerProbe.parseMp3(badSync).isEmpty)
    // MPEG-2 version bits are out of scope -> None, not wrong duration
    val mpeg2 = good.clone(); mpeg2(16) = 0xF3.toByte
    assert(ContainerProbe.parseMp3(mpeg2).isEmpty)
    // free-format (bitrate idx 0) and invalid (15) are rejected
    val free = good.clone(); free(17) = (free(17) & 0x0F).toByte
    assert(ContainerProbe.parseMp3(free).isEmpty)
    // truncation drops the incomplete trailing frame
    val m = ContainerProbe.parseMp3(good.dropRight(1)).get
    assert(m.frames === 2)
    assert(ContainerProbe.parseMp3(Array.empty[Byte]).isEmpty)
    assert(ContainerProbe.parseMp3(null).isEmpty)
  }

  // ------------------------------------------------------------- MP4

  test("mp4 encode/parse round trip recovers brand, timing, and track handlers") {
    val bytes = ContainerProbe.encodeMp4("isom", timescale = 600,
      durationTicks = 7500L, handlers = Seq("vide", "soun"))
    val m = ContainerProbe.parseMp4(bytes).get
    assert(m.majorBrand === "isom")
    assert(m.timescale === 600)
    assert(m.durationTicks === 7500L)
    assert(m.durationMs === 12500L) // 7500 / 600 * 1000
    assert(m.tracks === 2)
    assert(m.handlers === Seq("vide", "soun"))
  }

  test("mp4 mvhd version 1 (64-bit times) parses — ISO 14496-12 layout, not our encoder's") {
    // hand-build: ftyp + moov{mvhd v1} with the v1 field layout
    // (creation u64, modification u64, timescale u32, duration u64)
    val bos = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = { bos.write(((v >> 24) & 0xFF).toInt); bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt); bos.write((v & 0xFF).toInt) }
    def be64(v: Long): Unit = { be32(v >>> 32); be32(v & 0xFFFFFFFFL) }
    // ftyp (16 bytes)
    be32(16); bos.write("ftyp".getBytes); bos.write("mp42".getBytes); be32(0)
    // mvhd v1 payload: 4 + 8 + 8 + 4 + 8 = 32 bytes -> box 40
    val mvhd = { val b = new java.io.ByteArrayOutputStream()
      def w32(v: Long) = { b.write(((v >> 24) & 0xFF).toInt); b.write(((v >> 16) & 0xFF).toInt); b.write(((v >> 8) & 0xFF).toInt); b.write((v & 0xFF).toInt) }
      def w64(v: Long) = { w32(v >>> 32); w32(v & 0xFFFFFFFFL) }
      w32(0x01000000L) // version 1, flags 0
      w64(0L); w64(0L) // creation, modification
      w32(90000L)      // timescale
      w64(450000L)     // duration
      b.toByteArray }
    be32(8L + 8 + mvhd.length); bos.write("moov".getBytes)
    be32(8L + mvhd.length); bos.write("mvhd".getBytes); bos.write(mvhd)
    val m = ContainerProbe.parseMp4(bos.toByteArray).get
    assert(m.majorBrand === "mp42")
    assert(m.timescale === 90000 && m.durationTicks === 450000L)
    assert(m.durationMs === 5000L)
    assert(m.tracks === 0)
  }

  test("mp4 structural damage is None: overrun box, missing moov, short buffer") {
    val good = ContainerProbe.encodeMp4("isom", 1000, 1000L, Seq("vide"))
    // inflate the moov box size past the buffer
    val overrun = good.clone()
    val moovOff = {
      var o = 0; var found = -1
      while (found < 0 && o + 8 <= overrun.length) {
        val sz = ((overrun(o) & 0xFF) << 24) | ((overrun(o + 1) & 0xFF) << 16) |
          ((overrun(o + 2) & 0xFF) << 8) | (overrun(o + 3) & 0xFF)
        if (new String(overrun, o + 4, 4) == "moov") found = o else o += sz
      }
      found
    }
    overrun(moovOff) = 0x7F
    assert(ContainerProbe.parseMp4(overrun).isEmpty)
    // ftyp alone (no moov)
    assert(ContainerProbe.parseMp4(good.take(moovOff)).isEmpty)
    assert(ContainerProbe.parseMp4(good.take(5)).isEmpty)
    assert(ContainerProbe.parseMp4(null).isEmpty)
  }

  // ------------------------------------------------------------ EBML

  test("ebml encode/parse round trip recovers doctype, timing, and codec inventory") {
    val bytes = ContainerProbe.encodeEbml("webm", timestampScale = 1000000,
      duration = 12345.0, codecs = Seq("V_VP9", "A_OPUS"))
    val m = ContainerProbe.parseEbml(bytes).get
    assert(m.docType === "webm")
    assert(m.timestampScale === 1000000)
    assert(m.durationMs === 12345L) // scale 1e6 ns => ticks are ms
    assert(m.tracks === 2 && m.codecs === Seq("V_VP9", "A_OPUS"))
    // zero tracks: the Tracks element is simply absent
    val none = ContainerProbe.parseEbml(
      ContainerProbe.encodeEbml("matroska", 500000, 100.0, Seq.empty)).get
    assert(none.tracks === 0 && none.codecs.isEmpty)
    assert(none.durationMs === 50L) // 100 ticks x 0.5ms/tick
  }

  test("ebml: missing TimestampScale defaults to 1e6 ns per the Matroska spec, not our encoder") {
    // hand-build header + Segment{Info{Duration only}} — the default
    // comes from the SPEC, so this fixture must omit the element
    val dur = java.lang.Double.doubleToLongBits(750.0)
    val durBytes = Array.tabulate(8)(i => ((dur >> (8 * (7 - i))) & 0xFF).toByte)
    def el(id: Seq[Int], payload: Array[Byte]): Array[Byte] =
      (id.map(_.toByte) ++ Seq((0x80 | payload.length).toByte)).toArray ++ payload
    val bytes =
      el(Seq(0x1A, 0x45, 0xDF, 0xA3), el(Seq(0x42, 0x82), "webm".getBytes)) ++
      el(Seq(0x18, 0x53, 0x80, 0x67),
        el(Seq(0x15, 0x49, 0xA9, 0x66), el(Seq(0x44, 0x89), durBytes)))
    val m = ContainerProbe.parseEbml(bytes).get
    assert(m.timestampScale === 1000000 && m.durationMs === 750L)
  }

  test("ebml structural damage is None: bad vint, size overrun, missing duration") {
    val good = ContainerProbe.encodeEbml("webm", 1000000, 10.0, Seq("V_VP9"))
    val zeroVint = good.clone(); zeroVint(0) = 0 // 0x00 is not a valid VINT
    assert(ContainerProbe.parseEbml(zeroVint).isEmpty)
    assert(ContainerProbe.parseEbml(good.dropRight(1)).isEmpty,
      "a truncated last element overruns its declared size")
    assert(ContainerProbe.parseEbml(
      ContainerProbe.encodeEbml("webm", 1000000, 10.0, Seq.empty)
        .patch(0, Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA4.toByte), 4)).isEmpty,
      "wrong header id")
    assert(ContainerProbe.parseEbml(null).isEmpty)
    assert(ContainerProbe.parseEbml(Array[Byte](1, 2)).isEmpty)
  }

  test("ebml: an unknown-size Segment (all-ones size VINT) extends to region end — RFC 8794 layout, not our encoder") {
    // live-muxed WebM writes the Segment with size 0x01FFFFFFFFFFFFFF
    // (8-byte all-ones VINT) because the final size is unknowable at
    // mux time; the element then runs to EOF. Hand-build: take a good
    // payload and replace the Segment's minimal-length size VINT with
    // the all-ones 8-byte form (same payload, size now "unknown").
    val good = ContainerProbe.encodeEbml("webm", 1000000, 250.0, Seq("V_VP9"))
    // locate the Segment: id 0x18538067 (4 bytes), then its size VINT
    val segIdx = good.indices.find(i => i + 4 <= good.length &&
      (good(i) & 0xFF) == 0x18 && (good(i + 1) & 0xFF) == 0x53 &&
      (good(i + 2) & 0xFF) == 0x80 && (good(i + 3) & 0xFF) == 0x67).get
    val szFirst = good(segIdx + 4) & 0xFF
    val szLen = Integer.numberOfLeadingZeros(szFirst) - 24 + 1
    val unknown = good.take(segIdx + 4) ++
      (Array(0x01.toByte) ++ Array.fill(7)(0xFF.toByte)) ++
      good.drop(segIdx + 4 + szLen)
    val m = ContainerProbe.parseEbml(unknown).get
    assert(m.docType === "webm" && m.durationMs === 250L &&
      m.codecs === Seq("V_VP9"),
      "unknown-size Segment must parse identically to the sized form")
    // the 1-byte all-ones form (0xFF) means unknown too
    val oneByte = good.take(segIdx + 4) ++ Array(0xFF.toByte) ++
      good.drop(segIdx + 4 + szLen)
    assert(ContainerProbe.parseEbml(oneByte).exists(_.docType == "webm"))
  }

  // ------------------------------------------------------------ FLAC

  test("flac encode/parse round trip recovers every STREAMINFO field") {
    for (sr <- Seq(44100, 48000, 22050); ch <- Seq(1, 2, 8);
         bps <- Seq(8, 16, 24); pad <- Seq(0, 18)) {
      val ts = 441000L
      val bytes = ContainerProbe.encodeFlac(sr, ch, bps, ts, pad)
      val m = ContainerProbe.parseFlac(bytes).get
      assert(m.sampleRate === sr && m.channels === ch &&
        m.bitsPerSample === bps && m.totalSamples === ts)
      assert(m.durationMs === ts * 1000L / sr)
      assert(m.metaBlocks === 2, "STREAMINFO + PADDING")
      assert(bytes.length === 46 + pad)
    }
    // a 36-bit total-samples value survives the packed split
    val big = ContainerProbe.parseFlac(
      ContainerProbe.encodeFlac(44100, 2, 16, (1L << 36) - 1, 0)).get
    assert(big.totalSamples === (1L << 36) - 1)
  }

  test("flac hand-built fixture: published STREAMINFO bit layout, not our encoder's") {
    // CD audio: 44100 Hz, stereo, 16-bit, 1 000 000 samples.
    // sr=44100=0x0AC44 (20 bits); ch-1=1 (3 bits); bps-1=15 (5 bits);
    // ts=1000000=0x0F4240 (36 bits). Packed bytes 10..17:
    //   b10 = sr>>12        = 0x0A
    //   b11 = (sr>>4)&0xFF  = 0xC4
    //   b12 = (sr&0xF)<<4 | (ch-1)<<1 | (bps-1)>>4 = 0x40|0x02|0x00 = 0x42
    //   b13 = ((bps-1)&0xF)<<4 | ts>>32 = 0xF0
    //   b14..b17 = 0x00 0x0F 0x42 0x40
    val b = new Array[Byte](4 + 4 + 34)
    b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
    b(4) = 0x80.toByte; b(5) = 0; b(6) = 0; b(7) = 34 // last, type 0, len 34
    b(8 + 10) = 0x0A; b(8 + 11) = 0xC4.toByte; b(8 + 12) = 0x42
    b(8 + 13) = 0xF0.toByte; b(8 + 14) = 0x00; b(8 + 15) = 0x0F
    b(8 + 16) = 0x42; b(8 + 17) = 0x40
    val m = ContainerProbe.parseFlac(b).get
    assert(m.sampleRate === 44100 && m.channels === 2 && m.bitsPerSample === 16)
    assert(m.totalSamples === 1000000L)
    assert(m.durationMs === 22675L) // floor(1e6 * 1000 / 44100)
    assert(m.metaBlocks === 1)
  }

  test("flac structural damage is None: bad magic, STREAMINFO not first, overrun, zero rate") {
    val good = ContainerProbe.encodeFlac(48000, 2, 16, 48000L, 7)
    val badMagic = good.clone(); badMagic(0) = 'g'
    assert(ContainerProbe.parseFlac(badMagic).isEmpty)
    // PADDING promoted to first block (type swap) -> STREAMINFO not first
    val swapped = good.clone(); swapped(4) = 1 // type 1, not last
    assert(ContainerProbe.parseFlac(swapped).isEmpty)
    // padding length inflated past the buffer
    val overrun = good.clone(); overrun(4 + 4 + 34 + 2) = 0x7F
    assert(ContainerProbe.parseFlac(overrun).isEmpty)
    // sample rate 0 is invalid per spec (and would divide by zero)
    val zeroRate = ContainerProbe.encodeFlac(1, 1, 8, 0L, 0)
    zeroRate(8 + 10) = 0; zeroRate(8 + 11) = 0; zeroRate(8 + 12) = 0
    assert(ContainerProbe.parseFlac(zeroRate).isEmpty)
    assert(ContainerProbe.parseFlac(good.dropRight(1)).isEmpty,
      "a truncated metadata chain overruns its declared length")
    assert(ContainerProbe.parseFlac(null).isEmpty)
    assert(ContainerProbe.parseFlac(Array[Byte]('f', 'L', 'a', 'C')).isEmpty)
  }

  // ------------------------------------------------------------- Ogg

  test("ogg encode/parse round trip: pages, streams, flags, granule, payload") {
    for (streams <- Seq(1, 2); pps <- Seq(2, 5); ppp <- Seq(0, 17, 254)) {
      val step = 960L
      val bytes = ContainerProbe.encodeOgg(streams, pps, ppp, step)
      val m = ContainerProbe.parseOgg(bytes).get
      assert(m.pages === streams * pps)
      assert(m.streams === streams)
      assert(m.bosPages === streams && m.eosPages === streams)
      assert(m.lastGranule === pps * step)
      assert(m.payloadBytes === streams.toLong * pps * ppp)
      assert(bytes.length === streams * pps * (28 + ppp))
      // filler BOS payloads carry no mapping magic: truthfully unknown
      assert(m.codecs === Seq.fill(streams)("unknown"))
    }
  }

  test("ogg codec inventory: id-header BOS pages sniff to opus/vorbis/flac in file order") {
    val bytes = ContainerProbe.encodeOgg(3, 2, 10, 960L,
      codecs = Seq("opus", "vorbis", "flac"))
    val m = ContainerProbe.parseOgg(bytes).get
    assert(m.codecs === Seq("opus", "vorbis", "flac"))
    assert(m.streams === 3 && m.bosPages === 3)
    // BOS pages carry the padded id header, the rest the filler payload
    assert(bytes.length === 3 * (28 + ContainerProbe.OggIdHeaderBytes + (28 + 10)))
    assert(m.payloadBytes === 3L * (ContainerProbe.OggIdHeaderBytes + 10))
  }

  test("ogg codec sniff: hand-built OpusHead BOS page per RFC 7845 offsets, not our encoder's") {
    // one BOS page whose payload is a literal 19-byte OpusHead: magic,
    // version 1, channels 2, pre-skip LE16, rate 48000 LE32, gain,
    // mapping family 0
    val head = "OpusHead".getBytes ++ Array[Byte](1, 2) ++
      Array[Byte](0x38, 0x01) ++ // pre-skip 312 LE
      Array[Byte](0x80.toByte, 0xBB.toByte, 0, 0) ++ // 48000 LE
      Array[Byte](0, 0, 0)
    assert(head.length === 19)
    val b = new java.io.ByteArrayOutputStream()
    b.write("OggS".getBytes); b.write(0); b.write(0x06) // BOS|EOS
    (0 until 8 + 4 + 4 + 4).foreach(_ => b.write(0))
    b.write(1); b.write(head.length); b.write(head)
    val m = ContainerProbe.parseOgg(b.toByteArray).get
    assert(m.codecs === Seq("opus"))
  }

  test("ogg hand-built fixture: RFC 3533 field offsets, not our encoder's") {
    // one page: granule 0x1234 LE at offset 6, serial 0xCAFE LE at 14,
    // two lacing segments (3 + 2 bytes of payload)
    val b = new Array[Byte](27 + 2 + 5)
    b(0) = 'O'; b(1) = 'g'; b(2) = 'g'; b(3) = 'S'
    b(4) = 0    // version
    b(5) = 0x06 // BOS|EOS
    b(6) = 0x34; b(7) = 0x12 // granule LE
    b(14) = 0xFE.toByte; b(15) = 0xCA.toByte // serial LE
    b(26) = 2   // two lacing values
    b(27) = 3; b(28) = 2
    val m = ContainerProbe.parseOgg(b).get
    assert(m.pages === 1 && m.streams === 1)
    assert(m.bosPages === 1 && m.eosPages === 1)
    assert(m.lastGranule === 0x1234L)
    assert(m.payloadBytes === 5L)
  }

  test("ogg structural damage is None: bad capture, bad version, overrun lacing") {
    val good = ContainerProbe.encodeOgg(1, 2, 10, 100L)
    val badCap = good.clone(); badCap(0) = 'X'
    assert(ContainerProbe.parseOgg(badCap).isEmpty)
    val badVer = good.clone(); badVer(4) = 1
    assert(ContainerProbe.parseOgg(badVer).isEmpty)
    // lacing value inflated past the buffer
    val overrun = good.clone(); overrun(27) = 0xFF.toByte
    assert(ContainerProbe.parseOgg(overrun).isEmpty)
    assert(ContainerProbe.parseOgg(good.dropRight(1)).isEmpty)
    assert(ContainerProbe.parseOgg(null).isEmpty)
    assert(ContainerProbe.parseOgg(Array[Byte]('O', 'g', 'g', 'S')).isEmpty)
  }

  test("fuzz: parsers never throw — random bytes and mutated valid payloads give None or truthful prefixes") {
    // deterministic fuzz (fixed seed): parser code walking attacker-
    // shaped bytes must be total — any exception here would become a
    // task failure on row N of a 100 TB scan
    val rnd = new scala.util.Random(20260814L)
    (1 to 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      ContainerProbe.parseMp3(junk) // must not throw
      ContainerProbe.parseMp4(junk)
      ContainerProbe.parseEbml(junk)
      ContainerProbe.parseFlac(junk)
      ContainerProbe.parseOgg(junk)
    }
    val validMp3 = ContainerProbe.encodeMp3(4, 9, 1, 12)
    val validMp4 = ContainerProbe.encodeMp4("isom", 1000, 4000L, Seq("vide", "soun"))
    (1 to 300).foreach { _ =>
      def mutate(src: Array[Byte]): Array[Byte] = {
        val b = src.clone()
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
        if (rnd.nextBoolean()) b.take(rnd.nextInt(b.length + 1)) else b
      }
      val m3 = ContainerProbe.parseMp3(mutate(validMp3))
      // when a mutated stream still parses, the values must stay
      // inside the format's own domain — never fabricated indices
      m3.foreach { m =>
        assert(ContainerProbe.Mp3SampleRates.contains(m.sampleRate))
        assert(ContainerProbe.Mp3BitrateKbps.contains(m.bitrateKbps))
        assert(m.frames > 0 && m.durationMs >= 0)
      }
      val m4 = ContainerProbe.parseMp4(mutate(validMp4))
      m4.foreach { m =>
        assert(m.timescale > 0 && m.durationMs >= 0 && m.tracks >= 0)
        assert(m.handlers.size === m.tracks)
      }
    }
    val validEbml = ContainerProbe.encodeEbml("webm", 1000000, 500.0, Seq("V_VP9"))
    (1 to 300).foreach { _ =>
      val b = validEbml.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
      ContainerProbe.parseEbml(
        if (rnd.nextBoolean()) b.take(rnd.nextInt(b.length + 1)) else b)
        .foreach { m =>
          assert(m.timestampScale > 0 && m.tracks >= 0)
          assert(m.codecs.size === m.tracks)
        }
    }
    val validFlac = ContainerProbe.encodeFlac(44100, 2, 16, 441000L, 9)
    val validOgg = ContainerProbe.encodeOgg(2, 3, 11, 960L)
    (1 to 300).foreach { _ =>
      def mutate(src: Array[Byte]): Array[Byte] = {
        val b = src.clone()
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
        if (rnd.nextBoolean()) b.take(rnd.nextInt(b.length + 1)) else b
      }
      ContainerProbe.parseFlac(mutate(validFlac)).foreach { m =>
        assert(m.sampleRate > 0 && m.durationMs >= 0 && m.metaBlocks >= 1)
      }
      ContainerProbe.parseOgg(mutate(validOgg)).foreach { m =>
        assert(m.pages >= 1 && m.streams >= 1 && m.payloadBytes >= 0)
        assert(m.bosPages <= m.pages && m.eosPages <= m.pages)
      }
    }
  }

  // ----------------------------------------------------------- query

  test("mm_container_probe parses what the payload expressions emit; nulls only on damage") {
    val df = ContainerProbe.probeQuery(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.anyNull), "every synthesized payload must parse")
    // spot-check one row against the construction arithmetic
    import spark.implicits._
    val one = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("L"))
      .orderBy(col("doc_id")).head()
    val (id, l) = (one.getLong(0), one.getInt(1))
    val r = rows.find(_.getLong(0) == id).get
    assert(r.getAs[Int]("mp3_frames") === l % 7 + 2)
    assert(r.getAs[Int]("mp3_sample_rate") ===
      ContainerProbe.Mp3SampleRates(l % 3))
    assert(r.getAs[Int]("mp4_tracks") === l % 3 + 1)
    // the meta expressions return NULL on a damaged payload (the
    // curation quarantine contract), inside a query too
    val damaged = Seq(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)).toDF("data")
      .select(ContainerMeta.mp3Meta(col("data")).as("m3"),
        ContainerMeta.mp4Meta(col("data")).as("m4"))
      .head()
    assert(damaged.isNullAt(0) && damaged.isNullAt(1))
  }

  test("mm_container_probe_audio parses what the payload expressions emit; nulls only on damage") {
    val df = ContainerProbe.audioProbeQuery(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.anyNull), "every synthesized payload must parse")
    import spark.implicits._
    val one = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("L"))
      .orderBy(col("doc_id")).head()
    val (id, l) = (one.getLong(0), one.getInt(1))
    val r = rows.find(_.getLong(0) == id).get
    assert(r.getAs[Int]("flac_sample_rate") ===
      Array(44100, 48000, 32000, 22050)(l % 4))
    assert(r.getAs[Int]("flac_channels") === l % 8 + 1)
    assert(r.getAs[Long]("flac_total_samples") === (l + 41L) * 1000L)
    assert(r.getAs[Int]("flac_byte_len") === 46 + l % 19)
    assert(r.getAs[Int]("ogg_pages") === (l % 2 + 1) * (l % 5 + 2))
    assert(r.getAs[Long]("ogg_last_granule") === (l % 5 + 2).toLong * (l % 9 + 1) * 960L)
    assert(r.getAs[Int]("ogg_byte_len") === (l % 2 + 1) *
      (28 + ContainerProbe.OggIdHeaderBytes + (l % 5 + 1) * (28 + l % 17 + 1)))
    assert(r.getAs[String]("ogg_codecs") ===
      (0 until l % 2 + 1).map(s => Seq("opus", "vorbis", "flac")((l + s) % 3))
        .mkString(","))
    val damaged = Seq(Array[Byte](9, 9, 9, 9, 9)).toDF("data")
      .select(ContainerMeta.flacMeta(col("data")).as("mf"),
        ContainerMeta.oggMeta(col("data")).as("mo"))
      .head()
    assert(damaged.isNullAt(0) && damaged.isNullAt(1))
  }
}
