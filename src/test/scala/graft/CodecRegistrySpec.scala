package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{CodecRegistry, Multimodal}
import graft.multimodal.Multimodal.{MediaCodec, MediaDecoded, MediaRecord}

/** The codec-registry seam (r9 verdict item 8): a format the JDK
  * cannot decode wires in as ONE registered function and flows
  * through decode-once, features, and downsample with no other
  * change. */
class CodecRegistrySpec extends AnyFunSuite {
  import TestSession._

  /** A minimal ISO-BMFF-magic payload ('ftyp' at offset 4). */
  private def mp4Bytes(seed: Int): Array[Byte] = {
    val b = new Array[Byte](64)
    b(4) = 'f'; b(5) = 't'; b(6) = 'y'; b(7) = 'p'
    b(8) = 'i'; b(9) = 's'; b(10) = 'o'; b(11) = 'm'
    (12 until 64).foreach(i => b(i) = ((seed * 31 + i) % 251).toByte)
    b
  }

  private def mp3Bytes: Array[Byte] = {
    val b = new Array[Byte](32)
    b(0) = 'I'; b(1) = 'D'; b(2) = '3'
    b
  }

  test("sniffer names mp4/mp3 truthfully; without a decoder they fall back, container kept") {
    assert(MediaCodec.sniffContainer(mp4Bytes(1)) === "mp4")
    assert(MediaCodec.sniffContainer(mp3Bytes) === "mp3")
    // the remaining major media magics are named, not "unknown" —
    // a coverage gap must be a queryable fact
    def magic(bs: Int*): Array[Byte] =
      (bs.map(_.toByte) ++ Seq.fill(16)(0.toByte)).toArray
    assert(MediaCodec.sniffContainer(magic('f', 'L', 'a', 'C')) === "flac")
    assert(MediaCodec.sniffContainer(magic('O', 'g', 'g', 'S')) === "ogg")
    assert(MediaCodec.sniffContainer(magic(0x1A, 0x45, 0xDF, 0xA3)) === "ebml")
    assert(MediaCodec.sniffContainer(magic(0, 1, 2, 3)) === "unknown")
    val d = MediaCodec.decodeFull(
      MediaRecord(1L, "u", "video/mp4", "video", mp4Bytes(1)))
    assert(d.container_format === "mp4",
      "coverage gap must be a queryable fact, not 'unknown'")
    assert(d.byte_len === 64)
    assert(d.content_sha.matches("[0-9a-f]{64}"))
  }

  test("an injected fake mp4 decoder flows through decode-once, features, downsample unchanged") {
    val fake: CodecRegistry.Decoder = r => MediaDecoded(
      r.media_id, r.uri, r.mime, r.kind, "mp4",
      byte_len = r.data.length, content_sha = "f" * 64,
      width = 640, height = 480,
      histogram = Array.fill(16)(0.0625),
      img_mean_intensity = None, audio_rms = None,
      audio_zero_crossings = None,
      video_frames = Some(7), video_mean_intensity = Some(0.5),
      frame_digests = Array.tabulate(7)(_.toLong),
      downsample16 = Array.tabulate(16)(_ / 16.0))
    // an audio-modality registration too: the downsample leg covers
    // image/audio kinds by contract (video strides through framesFrom)
    val fakeMp3: CodecRegistry.Decoder = r => MediaDecoded(
      r.media_id, r.uri, r.mime, r.kind, "mp3",
      byte_len = r.data.length, content_sha = "e" * 64,
      width = 8000, height = 1,
      histogram = Array.fill(16)(0.0625),
      img_mean_intensity = None, audio_rms = Some(0.25),
      audio_zero_crossings = Some(42),
      video_frames = None, video_mean_intensity = None,
      frame_digests = Array.empty,
      downsample16 = Array.tabulate(16)(_ / 32.0))
    CodecRegistry.register("mp4", fake)
    CodecRegistry.register("mp3", fakeMp3)
    try {
      import spark.implicits._
      val media = Seq(
        MediaRecord(10L, "a.mp4", "video/mp4", "video", mp4Bytes(3)),
        MediaRecord(12L, "c.mp3", "audio/mpeg", "audio", mp3Bytes),
        MediaRecord(11L, "b.png", "image/png",  "image",
          MediaCodec.encodePng(Multimodal.pixelBytes("hello world")))).toDF()
      val decoded = Multimodal.decodeAll(media).cache()
      val mp4 = decoded.filter(_.media_id == 10L).head()
      assert(mp4.container_format === "mp4" && mp4.width === 640 &&
        mp4.video_frames === Some(7) && mp4.frame_digests.length === 7)
      // the built-in leg is untouched by the registration
      val png = decoded.filter(_.media_id == 11L).head()
      assert(png.container_format === "png" &&
        png.width === Multimodal.ImgW && png.img_mean_intensity.isDefined)
      // downstream consumers project the registered decoder's columns
      // with no special-casing
      val feats = Multimodal.featuresFrom(decoded.toDF())
      assert(feats.filter(col("media_id") === 10L)
        .select("width").head().getInt(0) === 640)
      val ds = Multimodal.downsampleFrom(decoded.toDF())
      val mp3row = ds.filter(col("media_id") === 12L)
      assert(mp3row.count() === 1,
        "the audio-kind registered decoder must flow through downsample")
      assert(mp3row.select("d_01").head().getDouble(0) === 1 / 32.0)
      val frames = Multimodal.framesFrom(decoded.toDF(), stride = 2)
      assert(frames.filter(col("media_id") === 10L).count() > 0,
        "frame sampling must stride the fake decoder's digests")
    } finally {
      CodecRegistry.unregister("mp4")
      CodecRegistry.unregister("mp3")
    }
    // after unregistration the same payload falls back again
    val d = MediaCodec.decodeFull(
      MediaRecord(13L, "d.mp4", "video/mp4", "video", mp4Bytes(3)))
    assert(d.container_format === "mp4" && d.video_frames.isEmpty)
  }

  test("built-in codecs are the oracle surface: overriding them is refused") {
    intercept[IllegalArgumentException] {
      CodecRegistry.register("png", r => null)
    }
  }

  test("mp3 probe: decoder absence is environment-bounded and the registry stays truthful") {
    // the probe itself must run everywhere (enumerate, not guess)
    val readers = CodecRegistry.audioSpiReaders
    assert(readers.nonEmpty, "the JDK always ships at least the stock readers")
    val bins = CodecRegistry.decoderBinariesOnPath
    assert(bins.keySet === Set("ffmpeg", "ffprobe", "lame", "mpg123", "sox"))
    info(s"audio SPI readers: ${readers.mkString(", ")}")
    info(s"decoder binaries on PATH: $bins")
    // does ANY SPI reader claim an MP3 payload? (stock JDK: no)
    val mp3SpiAvailable =
      try {
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(mp3Bytes ++ Array.fill(512)(0xAA.toByte)))
        true
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => false
      }
    // truthfulness contract: no decoder may be CLAIMED beyond what the
    // environment can actually decode — when no MP3 SPI exists, the
    // snapshot has no "mp3" entry and the payload falls through to the
    // fallback with its sniffed name kept (queryable coverage gap)
    if (!mp3SpiAvailable) {
      assert(!CodecRegistry.snapshot.decoders.contains("mp3"),
        "no environment decoder => the registry must not claim mp3")
      val d = MediaCodec.decodeFull(
        MediaRecord(99L, "x.mp3", "audio/mpeg", "audio", mp3Bytes))
      assert(d.container_format === "mp3" && d.audio_rms.isEmpty)
    }
  }
}
