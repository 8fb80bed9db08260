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
}
