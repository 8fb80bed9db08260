package graft.multimodal

/** Structural (container-level) parsers for the compressed formats
  * the sandbox has no decoder for — MP3 (ISO/IEC 11172-3 frame
  * headers), MP4 (ISO/IEC 14496-12 ISO-BMFF boxes), EBML
  * (RFC 8794 / Matroska — WebM's envelope), FLAC (RFC 9639
  * STREAMINFO + metadata-block walk), and Ogg (RFC 3533 page walk).
  * Each format's container
  * layer is plain public bit-layout, decodable with zero codec
  * dependencies, and carries exactly the metadata a 100 TB
  * media-curation pipeline filters and budgets on BEFORE any decode:
  * duration, bitrate, sample rate, track/codec inventory. (You do
  * not decode 100 TB of video to count minutes of footage.)
  *
  * Part of the SURVEY §7.5 multimodal EXTENSION surface (beyond the
  * reference's own operators). It narrows the standing
  * environment-bounded decoder gap (sandbox has no ffmpeg/MP3 SPI —
  * probe committed in
  * [[CodecRegistry.audioSpiReaders]]): the SAMPLE-decode legs stay
  * behind the registry seam, but the metadata legs are now real —
  * `mp3Meta`/`mp4Meta` work on any BINARY column of genuine files.
  *
  * Scope is explicit and honest: MP3 = MPEG-1 Layer III (the format
  * of the name); anything else returns None rather than guessed
  * numbers. MP4 = top-level box walk + moov/mvhd + trak/mdia/hdlr;
  * malformed structure (truncated box, overrun size) returns None.
  *
  * Deterministic test-payload ENCODERS live here too — the lossy-leg
  * gating pattern (same as the JPEG envelope oracle): payloads built
  * from known parameters, parsed back, and the DuckDB oracle
  * recomputes the expected metadata from the construction arithmetic
  * alone, never touching bytes — a bug in either encode or parse
  * flips the gate.
  */
object ContainerProbe {

  // ---------------------------------------------------------------- MP3

  /** MPEG-1 Layer III bitrate table, kbps, index 1-14 (0 = free
    * format, 15 = invalid — both rejected). ISO/IEC 11172-3 tab. B.2. */
  val Mp3BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates, Hz, index 0-2 (3 = reserved). */
  val Mp3SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val Mp3SamplesPerFrame = 1152

  final case class Mp3Meta(
      sampleRate: Int, bitrateKbps: Int, frames: Int,
      durationMs: Long, id3Bytes: Int)

  /** Layer III frame byte length: floor(144 × bitrate / sampleRate)
    * + padding (144 = 1152 samples / 8 bits). */
  def mp3FrameBytes(bitrateIdx: Int, srIdx: Int, padding: Int): Int =
    144 * (Mp3BitrateKbps(bitrateIdx) * 1000) / Mp3SampleRates(srIdx) + padding

  /** ID3v2 tag length (0 when absent): "ID3" + version(2) + flags(1)
    * + 4 SYNCSAFE size bytes (7 bits each) at offsets 6-9, total
    * 10 + size. */
  private def id3v2Length(d: Array[Byte]): Int =
    if (d.length >= 10 && d(0) == 'I' && d(1) == 'D' && d(2) == '3') {
      val size = ((d(6) & 0x7F) << 21) | ((d(7) & 0x7F) << 14) |
        ((d(8) & 0x7F) << 7) | (d(9) & 0x7F)
      10 + size
    } else 0

  /** Parse an MP3 payload's frame structure: skip any ID3v2 tag, then
    * walk MPEG-1 Layer III frames, each sized by ITS OWN header (so
    * variable-bitrate streams count correctly); reported bitrate and
    * sample rate are the first frame's. Only COMPLETE frames count —
    * a truncated trailing frame is ignored, not guessed at. Returns
    * None for anything that is not MPEG-1 Layer III at the first
    * sync (free-format, reserved, MPEG-2, other layers). */
  def parseMp3(data: Array[Byte]): Option[Mp3Meta] = {
    if (data == null) return None
    val id3 = id3v2Length(data)
    var off = id3
    if (off + 4 > data.length) return None
    def header(o: Int): Option[(Int, Int, Int)] = {
      // sync 11 bits; version bits 4-3 of byte1 == 11 (MPEG-1);
      // layer bits 2-1 == 01 (Layer III)
      if ((data(o) & 0xFF) != 0xFF || (data(o + 1) & 0xE0) != 0xE0) None
      else if ((data(o + 1) & 0x18) != 0x18 || (data(o + 1) & 0x06) != 0x02) None
      else {
        val bIdx = (data(o + 2) & 0xF0) >>> 4
        val sIdx = (data(o + 2) & 0x0C) >>> 2
        val pad = (data(o + 2) & 0x02) >>> 1
        if (bIdx == 0 || bIdx == 15 || sIdx == 3) None
        else Some((bIdx, sIdx, pad))
      }
    }
    val first = header(off).getOrElse(return None)
    val sampleRate = Mp3SampleRates(first._2)
    var frames = 0
    var cont = true
    while (cont && off + 4 <= data.length) {
      header(off) match {
        case Some((b, s, p)) =>
          val len = mp3FrameBytes(b, s, p)
          if (off + len <= data.length) { frames += 1; off += len }
          else cont = false
        case None => cont = false
      }
    }
    if (frames == 0) None
    else Some(Mp3Meta(sampleRate, Mp3BitrateKbps(first._1), frames,
      frames.toLong * Mp3SamplesPerFrame * 1000L / sampleRate, id3))
  }

  /** Deterministic MPEG-1 Layer III test payload: an ID3v2.3 tag of
    * `id3Pad` content bytes followed by `nFrames` no-CRC frames at
    * the given table indices (padding bit 0). Filler bytes are a
    * fixed byte fold of the position — fully reproducible. */
  def encodeMp3(nFrames: Int, bitrateIdx: Int, srIdx: Int, id3Pad: Int): Array[Byte] = {
    require(nFrames > 0 && bitrateIdx >= 1 && bitrateIdx <= 14 &&
      srIdx >= 0 && srIdx <= 2 && id3Pad >= 0 && id3Pad < (1 << 28))
    val frameLen = mp3FrameBytes(bitrateIdx, srIdx, padding = 0)
    val out = new Array[Byte](10 + id3Pad + nFrames * frameLen)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 3 // v2.3.0
    out(6) = ((id3Pad >> 21) & 0x7F).toByte
    out(7) = ((id3Pad >> 14) & 0x7F).toByte
    out(8) = ((id3Pad >> 7) & 0x7F).toByte
    out(9) = (id3Pad & 0x7F).toByte
    var i = 10
    while (i < 10 + id3Pad) { out(i) = (i * 31 % 251).toByte; i += 1 }
    var f = 0
    while (f < nFrames) {
      val o = 10 + id3Pad + f * frameLen
      out(o) = 0xFF.toByte
      out(o + 1) = 0xFB.toByte // MPEG-1, Layer III, no CRC
      out(o + 2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte
      out(o + 3) = 0xC4.toByte // mono, no emphasis (parser-ignored)
      var j = o + 4
      while (j < o + frameLen) { out(j) = (j * 17 % 249).toByte; j += 1 }
      f += 1
    }
    out
  }

  // ---------------------------------------------------------------- MP4

  final case class Mp4Meta(
      majorBrand: String, timescale: Int, durationTicks: Long,
      durationMs: Long, tracks: Int, handlers: Seq[String])

  private def be32(d: Array[Byte], o: Int): Long =
    ((d(o) & 0xFFL) << 24) | ((d(o + 1) & 0xFFL) << 16) |
      ((d(o + 2) & 0xFFL) << 8) | (d(o + 3) & 0xFFL)

  private def be64(d: Array[Byte], o: Int): Long =
    (be32(d, o) << 32) | be32(d, o + 4)

  private def fourcc(d: Array[Byte], o: Int): String =
    new String(d, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the boxes of `d[from, until)`: yields (type, payloadStart,
    * payloadEnd) or None on structural damage (box shorter than its
    * header, size overrunning the region). size==1 reads a 64-bit
    * largesize; size==0 extends to the region end. */
  private def walkBoxes(d: Array[Byte], from: Int, until: Int):
      Option[Seq[(String, Int, Int)]] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var off = from
    while (off < until) {
      if (off + 8 > until) return None
      val size32 = be32(d, off)
      val typ = fourcc(d, off + 4)
      val (payloadStart, end) =
        if (size32 == 1) {
          if (off + 16 > until) return None
          val large = be64(d, off + 8)
          if (large < 16 || off + large > until) return None
          (off + 16, off + large.toInt)
        } else if (size32 == 0) (off + 8, until)
        else {
          if (size32 < 8 || off + size32 > until) return None
          (off + 8, off + size32.toInt)
        }
      acc += ((typ, payloadStart, end))
      off = end
    }
    Some(acc.toSeq)
  }

  /** Parse an ISO-BMFF payload's structure: ftyp major brand, mvhd
    * timescale/duration (versions 0 and 1), trak count, and each
    * track's mdia/hdlr handler 4cc (in file order). None when the
    * box tree is structurally damaged or ftyp/moov/mvhd is absent. */
  def parseMp4(data: Array[Byte]): Option[Mp4Meta] = {
    if (data == null || data.length < 8) return None
    for {
      top <- walkBoxes(data, 0, data.length)
      ftyp <- top.find(_._1 == "ftyp").filter(b => b._3 - b._2 >= 8)
      moov <- top.find(_._1 == "moov")
      inMoov <- walkBoxes(data, moov._2, moov._3)
      mvhd <- inMoov.find(_._1 == "mvhd").filter(b => b._3 - b._2 >= 4)
      tsDur <- {
        val o = mvhd._2
        val version = data(o) & 0xFF
        if (version == 0 && mvhd._3 - o >= 4 + 16)
          Some((be32(data, o + 12).toInt, be32(data, o + 16)))
        else if (version == 1 && mvhd._3 - o >= 4 + 28)
          Some((be32(data, o + 20).toInt, be64(data, o + 24)))
        else None
      }
      if tsDur._1 > 0
      handlers <- {
        val traks = inMoov.filter(_._1 == "trak")
        val hs = traks.map { t =>
          for {
            inTrak <- walkBoxes(data, t._2, t._3)
            mdia <- inTrak.find(_._1 == "mdia")
            inMdia <- walkBoxes(data, mdia._2, mdia._3)
            hdlr <- inMdia.find(_._1 == "hdlr").filter(b => b._3 - b._2 >= 12)
          } yield fourcc(data, hdlr._2 + 8) // verflags(4) + pre_defined(4)
        }
        if (hs.exists(_.isEmpty)) None else Some(hs.map(_.get))
      }
    } yield Mp4Meta(fourcc(data, ftyp._2), tsDur._1, tsDur._2,
      tsDur._2 * 1000L / tsDur._1, handlers.size, handlers)
  }

  // ---------------------------------------------------------------- EBML

  final case class EbmlMeta(
      docType: String, timestampScale: Int, durationMs: Long,
      tracks: Int, codecs: Seq[String])

  // Element IDs (IETF RFC 8794 / Matroska spec, public): the EBML
  // header + the Segment subset a metadata probe needs.
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdCodecId = 0x86L

  /** EBML VINT at `o`: (value, byteLen) — `keepMarker` for element
    * IDs (IDs are compared with the length-marker bit kept), masked
    * for sizes. None on malformed/truncated. */
  private def vint(d: Array[Byte], o: Int, keepMarker: Boolean): Option[(Long, Int)] = {
    if (o >= d.length) return None
    val first = d(o) & 0xFF
    if (first == 0) return None
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len > 8 || o + len > d.length) return None
    var v = if (keepMarker) first.toLong else (first & (0xFF >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (d(o + i) & 0xFF); i += 1 }
    Some((v, len))
  }

  /** Walk EBML elements of `d[from, until)`: (id, payloadStart,
    * payloadEnd) per element, None on structural damage. A size VINT
    * whose VINT_DATA is all ones is "unknown size" (RFC 8794 §6.2 —
    * legal, and common for the Segment of live-muxed Matroska/WebM):
    * the element extends to the end of its enclosing region, and by
    * construction nothing can follow it at this level. */
  private def ebmlChildren(d: Array[Byte], from: Int, until: Int):
      Option[Seq[(Long, Int, Int)]] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    var off = from
    while (off < until) {
      val (id, idLen) = vint(d, off, keepMarker = true).getOrElse(return None)
      val (size, szLen) = vint(d, off + idLen, keepMarker = false).getOrElse(return None)
      val start = off + idLen + szLen
      if (size == (1L << (7 * szLen)) - 1) { // all-ones VINT_DATA
        acc += ((id, start, until))
        return Some(acc.toSeq)
      }
      if (size < 0 || start + size > until) return None
      acc += ((id, start, start + size.toInt))
      off = start + size.toInt
    }
    Some(acc.toSeq)
  }

  private def beUint(d: Array[Byte], from: Int, until: Int): Long = {
    var v = 0L
    var i = from
    while (i < until) { v = (v << 8) | (d(i) & 0xFF); i += 1 }
    v
  }

  /** Parse an EBML (WebM/Matroska) payload's structure: header
    * DocType, Segment/Info TimestampScale (default 1 000 000 ns) and
    * float Duration, Tracks/TrackEntry CodecID inventory.
    * durationMs = duration × timestampScale / 10⁶ (exact for the
    * integral constructions the gate uses). None on structural
    * damage or when Duration/DocType are absent. */
  def parseEbml(data: Array[Byte]): Option[EbmlMeta] = {
    if (data == null || data.length < 4) return None
    for {
      top <- ebmlChildren(data, 0, data.length)
      header <- top.find(_._1 == IdEbml)
      inHeader <- ebmlChildren(data, header._2, header._3)
      docTypeEl <- inHeader.find(_._1 == IdDocType)
      segment <- top.find(_._1 == IdSegment)
      inSeg <- ebmlChildren(data, segment._2, segment._3)
      info <- inSeg.find(_._1 == IdInfo)
      inInfo <- ebmlChildren(data, info._2, info._3)
      durEl <- inInfo.find(_._1 == IdDuration)
        .filter(e => e._3 - e._2 == 8 || e._3 - e._2 == 4)
      codecs <- {
        val tracks = inSeg.find(_._1 == IdTracks)
        tracks match {
          case None => Some(Seq.empty[String])
          case Some(t) => ebmlChildren(data, t._2, t._3).flatMap { entries =>
            val cs = entries.filter(_._1 == IdTrackEntry).map { te =>
              ebmlChildren(data, te._2, te._3)
                .flatMap(_.find(_._1 == IdCodecId))
                .map(c => new String(data, c._2, c._3 - c._2,
                  java.nio.charset.StandardCharsets.US_ASCII))
            }
            if (cs.exists(_.isEmpty)) None else Some(cs.map(_.get))
          }
        }
      }
      ts = inInfo.find(_._1 == IdTimestampScale)
        .map(e => beUint(data, e._2, e._3)).getOrElse(1000000L)
      if ts > 0 && ts <= Int.MaxValue
    } yield {
      val duration =
        if (durEl._3 - durEl._2 == 8)
          java.lang.Double.longBitsToDouble(beUint(data, durEl._2, durEl._3))
        else java.lang.Float.intBitsToFloat(beUint(data, durEl._2, durEl._3).toInt).toDouble
      EbmlMeta(
        new String(data, docTypeEl._2, docTypeEl._3 - docTypeEl._2,
          java.nio.charset.StandardCharsets.US_ASCII),
        ts.toInt, (duration * ts / 1e6).toLong,
        codecs.size, codecs)
    }
  }

  private def ebmlId(b: java.io.ByteArrayOutputStream, id: Long): Unit = {
    val len = if (id <= 0xFFL) 1 else if (id <= 0xFFFFL) 2
      else if (id <= 0xFFFFFFL) 3 else 4
    var i = len - 1
    while (i >= 0) { b.write(((id >> (8 * i)) & 0xFF).toInt); i -= 1 }
  }

  /** Size as a minimal-length VINT (marker bit in the first byte). */
  private def ebmlSize(b: java.io.ByteArrayOutputStream, size: Long): Unit = {
    var len = 1
    while (len < 8 && size >= (1L << (7 * len)) - 1) len += 1
    var i = len - 1
    val v = size | (1L << (7 * len))
    while (i >= 0) { b.write(((v >> (8 * i)) & 0xFF).toInt); i -= 1 }
  }

  private def ebmlEl(id: Long, payload: Array[Byte]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    ebmlId(b, id); ebmlSize(b, payload.length.toLong); b.write(payload)
    b.toByteArray
  }

  /** Deterministic EBML test payload: header{DocType} +
    * Segment{ Info{TimestampScale, Duration(float64)} +
    * Tracks{TrackEntry{CodecID}*} }. */
  def encodeEbml(docType: String, timestampScale: Int, duration: Double,
                 codecs: Seq[String]): Array[Byte] = {
    require(timestampScale > 0 && duration >= 0)
    def uintBytes(v: Long): Array[Byte] = {
      var len = 1
      while (len < 8 && v >= (1L << (8 * len))) len += 1
      Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xFF).toByte)
    }
    val durBits = java.lang.Double.doubleToLongBits(duration)
    val durBytes = Array.tabulate(8)(i => ((durBits >> (8 * (7 - i))) & 0xFF).toByte)
    val header = ebmlEl(IdEbml,
      ebmlEl(IdDocType, docType.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
    val info = ebmlEl(IdInfo,
      ebmlEl(IdTimestampScale, uintBytes(timestampScale.toLong)) ++
        ebmlEl(IdDuration, durBytes))
    val tracks =
      if (codecs.isEmpty) Array.empty[Byte]
      else ebmlEl(IdTracks, codecs.flatMap(c =>
        ebmlEl(IdTrackEntry, ebmlEl(IdCodecId,
          c.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))).toArray)
    header ++ ebmlEl(IdSegment, info ++ tracks)
  }

  // ---------------------------------------------------------------- FLAC

  final case class FlacMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, durationMs: Long, metaBlocks: Int)

  /** Parse a FLAC payload's metadata section (RFC 9639 / xiph spec):
    * "fLaC" magic, then the METADATA_BLOCK chain — STREAMINFO
    * (mandatory first block, 34 bytes) carries sample rate (20 bits),
    * channels−1 (3), bits-per-sample−1 (5) and total samples (36);
    * duration = totalSamples / sampleRate. The remaining blocks are
    * walked structurally (counted, bounds-checked) up to the
    * last-block flag. None on structural damage: missing magic,
    * STREAMINFO not first or mis-sized, a block overrunning the
    * buffer, duplicate STREAMINFO, reserved block type 127, or
    * sample rate 0. Audio frames after the metadata chain are out of
    * scope (that is the decode seam) and ignored. */
  def parseFlac(data: Array[Byte]): Option[FlacMeta] = {
    if (data == null || data.length < 4 + 4 + 34) return None
    if (!(data(0) == 'f' && data(1) == 'L' && data(2) == 'a' && data(3) == 'C'))
      return None
    var off = 4
    var blocks = 0
    var info: Option[(Int, Int, Int, Long)] = None
    var last = false
    while (!last) {
      if (off + 4 > data.length) return None
      val hdr = data(off) & 0xFF
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7F
      val len = ((data(off + 1) & 0xFF) << 16) | ((data(off + 2) & 0xFF) << 8) |
        (data(off + 3) & 0xFF)
      val p = off + 4
      if (p + len > data.length) return None
      if (blocks == 0) {
        if (btype != 0 || len != 34) return None // STREAMINFO must lead
        // packed 64 bits at STREAMINFO offset 10: sr(20) ch-1(3)
        // bps-1(5) totalSamples(36)
        val sr = ((data(p + 10) & 0xFF) << 12) | ((data(p + 11) & 0xFF) << 4) |
          ((data(p + 12) & 0xF0) >>> 4)
        val ch = ((data(p + 12) & 0x0E) >>> 1) + 1
        val bps = (((data(p + 12) & 0x01) << 4) | ((data(p + 13) & 0xF0) >>> 4)) + 1
        val ts = ((data(p + 13) & 0x0FL) << 32) | ((data(p + 14) & 0xFFL) << 24) |
          ((data(p + 15) & 0xFFL) << 16) | ((data(p + 16) & 0xFFL) << 8) |
          (data(p + 17) & 0xFFL)
        if (sr == 0) return None
        info = Some((sr, ch, bps, ts))
      } else if (btype == 0 || btype == 127) return None
      blocks += 1
      off = p + len
    }
    info.map { case (sr, ch, bps, ts) =>
      FlacMeta(sr, ch, bps, ts, ts * 1000L / sr, blocks) }
  }

  /** Deterministic FLAC test payload: magic + STREAMINFO + a PADDING
    * block of `padLen` zero bytes (so the block WALK is exercised,
    * not just the first block). Blocksize/framesize/MD5 fields are
    * zeroed — structurally legal, ignored by the probe. Total length
    * = 4 + 38 + 4 + padLen. */
  def encodeFlac(sampleRate: Int, channels: Int, bitsPerSample: Int,
                 totalSamples: Long, padLen: Int): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20) &&
      channels >= 1 && channels <= 8 &&
      bitsPerSample >= 1 && bitsPerSample <= 32 &&
      totalSamples >= 0 && totalSamples < (1L << 36) && padLen >= 0)
    val out = new Array[Byte](4 + 4 + 34 + 4 + padLen)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    // STREAMINFO header: not-last, type 0, length 34
    out(5) = 0; out(6) = 0; out(7) = 34
    val p = 8
    out(p + 10) = ((sampleRate >> 12) & 0xFF).toByte
    out(p + 11) = ((sampleRate >> 4) & 0xFF).toByte
    out(p + 12) = (((sampleRate & 0x0F) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    out(p + 13) = ((((bitsPerSample - 1) & 0x0F) << 4) |
      ((totalSamples >> 32) & 0x0F)).toInt.toByte
    out(p + 14) = ((totalSamples >> 24) & 0xFF).toByte
    out(p + 15) = ((totalSamples >> 16) & 0xFF).toByte
    out(p + 16) = ((totalSamples >> 8) & 0xFF).toByte
    out(p + 17) = (totalSamples & 0xFF).toByte
    // PADDING header: LAST block, type 1, length padLen (zero body)
    val q = p + 34
    out(q) = (0x80 | 1).toByte
    out(q + 1) = ((padLen >> 16) & 0xFF).toByte
    out(q + 2) = ((padLen >> 8) & 0xFF).toByte
    out(q + 3) = (padLen & 0xFF).toByte
    out
  }

  // ----------------------------------------------------------------- Ogg

  final case class OggMeta(
      pages: Int, streams: Int, bosPages: Int, eosPages: Int,
      lastGranule: Long, payloadBytes: Long, codecs: Seq[String])

  /** Codec of one BOS page's payload, from the mapping magics each
    * codec's Ogg embedding spec publishes: "OpusHead" (RFC 7845
    * §5.1), 0x01"vorbis" (Vorbis I spec §4.2.2), 0x7F"FLAC"
    * (Ogg-FLAC mapping §2), 0x80"theora" (Theora spec §6.2). Anything
    * else is truthfully "unknown" — never a guessed name. */
  private def bosCodec(d: Array[Byte], off: Int, len: Int): String = {
    def is(prefix: Array[Byte]): Boolean =
      len >= prefix.length && prefix.indices.forall(i => d(off + i) == prefix(i))
    if (is("OpusHead".getBytes(java.nio.charset.StandardCharsets.US_ASCII))) "opus"
    else if (is(0x01.toByte +: "vorbis".getBytes(java.nio.charset.StandardCharsets.US_ASCII))) "vorbis"
    else if (is(0x7F.toByte +: "FLAC".getBytes(java.nio.charset.StandardCharsets.US_ASCII))) "flac"
    else if (is(0x80.toByte +: "theora".getBytes(java.nio.charset.StandardCharsets.US_ASCII))) "theora"
    else "unknown"
  }

  private def le32(d: Array[Byte], o: Int): Long =
    (d(o) & 0xFFL) | ((d(o + 1) & 0xFFL) << 8) |
      ((d(o + 2) & 0xFFL) << 16) | ((d(o + 3) & 0xFFL) << 24)

  private def le64(d: Array[Byte], o: Int): Long =
    le32(d, o) | (le32(d, o + 4) << 32)

  /** Walk an Ogg payload's page structure (RFC 3533): every page is
    * "OggS" + version 0 + header_type + granule(LE64) + serial(LE32)
    * + seq + crc + segment count + lacing table + payload. Yields the
    * page count, the distinct-serial stream inventory, BOS/EOS flag
    * counts, the final page's granule position (codec-units —
    * codec-agnostic by design, so no ms conversion is fabricated),
    * total payload bytes, and the per-stream codec inventory sniffed
    * from each BOS page's mapping magic ([[bosCodec]]: opus / vorbis
    * / flac / theora / unknown, in file order — the Ogg analogue of
    * the EBML CodecID walk). The CRC is NOT verified — this is a
    * structural walk, valid on genuine files whose CRCs a decode
    * step would check. None on structural damage: bad capture
    * pattern, non-zero version, page overrunning the buffer. */
  def parseOgg(data: Array[Byte]): Option[OggMeta] = {
    if (data == null || data.length < 27) return None
    var off = 0
    var pages = 0
    var bos = 0
    var eos = 0
    var payload = 0L
    var lastGranule = 0L
    val serials = scala.collection.mutable.Set.empty[Long]
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
    while (off < data.length) {
      if (off + 27 > data.length) return None
      if (!(data(off) == 'O' && data(off + 1) == 'g' &&
            data(off + 2) == 'g' && data(off + 3) == 'S')) return None
      if (data(off + 4) != 0) return None // stream_structure_version
      val htype = data(off + 5) & 0xFF
      val granule = le64(data, off + 6)
      val serial = le32(data, off + 14)
      val nsegs = data(off + 26) & 0xFF
      if (off + 27 + nsegs > data.length) return None
      var plen = 0
      var i = 0
      while (i < nsegs) { plen += data(off + 27 + i) & 0xFF; i += 1 }
      val end = off + 27 + nsegs + plen
      if (end > data.length) return None
      pages += 1
      if ((htype & 0x02) != 0) {
        bos += 1
        codecs += bosCodec(data, off + 27 + nsegs, plen)
      }
      if ((htype & 0x04) != 0) eos += 1
      serials += serial
      lastGranule = granule
      payload += plen
      off = end
    }
    if (pages == 0) None
    else Some(OggMeta(pages, serials.size, bos, eos, lastGranule, payload,
      codecs.toSeq))
  }

  /** Length of every codec identification header [[encodeOgg]] puts
    * in a BOS page when a codec is named: the real id header (19-byte
    * OpusHead / 30-byte Vorbis id / 9-byte Ogg-FLAC mapping prefix)
    * zero-padded to one fixed lacing value, so the oracle's byte
    * arithmetic is codec-independent. */
  val OggIdHeaderBytes = 47

  /** One codec identification header, real field layouts: OpusHead
    * v1 (RFC 7845 §5.1: magic, version, channels, pre-skip LE16,
    * input rate LE32, gain, mapping family 0), Vorbis id (spec
    * §4.2.2: 0x01"vorbis", version 0, channels, rate LE32, 3
    * bitrates, blocksizes, framing 1), Ogg-FLAC mapping prefix
    * (0x7F"FLAC", major 1, minor 0, header count, native "fLaC").
    * Zero-padded to [[OggIdHeaderBytes]]. */
  private def codecIdHeader(codec: String, channels: Int, rate: Long): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit =
      b.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def le16(v: Long): Unit = { b.write((v & 0xFF).toInt); b.write(((v >> 8) & 0xFF).toInt) }
    def le32(v: Long): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    codec match {
      case "opus" =>
        ascii("OpusHead"); b.write(1); b.write(channels)
        le16(312) // pre-skip
        le32(rate); le16(0) // output gain
        b.write(0) // channel mapping family
      case "vorbis" =>
        b.write(0x01); ascii("vorbis")
        le32(0) // vorbis_version
        b.write(channels); le32(rate)
        le32(0); le32(0); le32(0) // max/nominal/min bitrate
        b.write(0xB8) // blocksizes 2^8/2^11
        b.write(1)    // framing bit
      case "flac" =>
        b.write(0x7F); ascii("FLAC"); b.write(1); b.write(0)
        b.write(0); b.write(0) // number of header packets (unknown)
        ascii("fLaC")
      case other => throw new IllegalArgumentException(s"no id header for $other")
    }
    val head = b.toByteArray
    require(head.length <= OggIdHeaderBytes)
    head ++ new Array[Byte](OggIdHeaderBytes - head.length)
  }

  /** Deterministic Ogg test payload: `streams` logical streams
    * (serials 1001..), written sequentially, each of `pagesPerStream`
    * pages (first BOS, last EOS — so ≥2 required) of one
    * `payloadPerPage`-byte lacing segment each; granule of page k
    * (1-based) = k × granuleStep. When `codecs` names stream s's
    * codec, its BOS page instead carries that codec's real id header
    * padded to [[OggIdHeaderBytes]] (so BOS page length =
    * 28 + OggIdHeaderBytes). CRC fields are zero (the probe is
    * structural; see [[parseOgg]]). Non-BOS page length =
    * 28 + payloadPerPage. */
  def encodeOgg(streams: Int, pagesPerStream: Int, payloadPerPage: Int,
                granuleStep: Long, codecs: Seq[String] = Seq.empty): Array[Byte] = {
    require(streams >= 1 && pagesPerStream >= 2 &&
      payloadPerPage >= 0 && payloadPerPage <= 254 && granuleStep >= 0)
    val out = new java.io.ByteArrayOutputStream()
    var s = 0
    while (s < streams) {
      val serial = 1001L + s
      var k = 0
      while (k < pagesPerStream) {
        val bosHeader: Option[Array[Byte]] =
          if (k == 0) codecs.lift(s).map(c => codecIdHeader(c, s % 2 + 1, 48000L))
          else None
        out.write('O'); out.write('g'); out.write('g'); out.write('S')
        out.write(0) // version
        out.write(if (k == 0) 0x02 else if (k == pagesPerStream - 1) 0x04 else 0x00)
        val granule = (k + 1) * granuleStep
        var i = 0
        while (i < 8) { out.write(((granule >> (8 * i)) & 0xFF).toInt); i += 1 }
        i = 0
        while (i < 4) { out.write(((serial >> (8 * i)) & 0xFF).toInt); i += 1 }
        i = 0
        while (i < 4) { out.write((k >> (8 * i)) & 0xFF); i += 1 } // page seq
        out.write(0); out.write(0); out.write(0); out.write(0) // crc (unverified)
        out.write(1) // one lacing segment
        bosHeader match {
          case Some(h) =>
            out.write(h.length)
            out.write(h)
          case None =>
            out.write(payloadPerPage)
            var j = 0
            while (j < payloadPerPage) { out.write((j * 23 + k) % 253); j += 1 }
        }
        k += 1
      }
      s += 1
    }
    out.toByteArray
  }

  // -------------------------------------------------- oracle-gated query

  /** mm_container_probe: every document synthesizes one MP3 and one
    * MP4 payload with parameters derived from its text length, and
    * the engine recovers the metadata by PARSING THE BYTES — the
    * DuckDB oracle recomputes every expected field from `strlen`
    * arithmetic alone, so any disagreement between the construction,
    * the bit-layout emitted, and the parser flips the gate. byte_len
    * comes from `length(payload)`, pinning the encoder's size
    * arithmetic independently of the parser. The probe WORK is one
    * codegen'd map-only projection over the documents scan (zero
    * shuffle, linear at any corpus size); the trailing
    * `orderBy(doc_id)` exists only so the dumped rows line up with
    * the oracle's ORDER BY for the hash compare — a production
    * curation pass would not sort. */
  def probeQuery(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftext.ContainerMeta
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        ContainerMeta.mp3TestPayload(col("text")).as("p3"),
        ContainerMeta.mp4TestPayload(col("text")).as("p4"),
        ContainerMeta.ebmlTestPayload(col("text")).as("pw"))
      .select(col("doc_id"),
        ContainerMeta.mp3Meta(col("p3")).as("m3"),
        length(col("p3")).as("mp3_byte_len"),
        ContainerMeta.mp4Meta(col("p4")).as("m4"),
        ContainerMeta.ebmlMeta(col("pw")).as("mw"))
      .select(col("doc_id"),
        col("m3.sample_rate").as("mp3_sample_rate"),
        col("m3.bitrate_kbps").as("mp3_bitrate_kbps"),
        col("m3.frames").as("mp3_frames"),
        col("m3.duration_ms").as("mp3_duration_ms"),
        col("m3.id3_bytes").as("mp3_id3_bytes"),
        col("mp3_byte_len"),
        col("m4.major_brand").as("mp4_major_brand"),
        col("m4.timescale").as("mp4_timescale"),
        col("m4.duration_ticks").as("mp4_duration_ticks"),
        col("m4.duration_ms").as("mp4_duration_ms"),
        col("m4.tracks").as("mp4_tracks"),
        col("m4.handlers").as("mp4_handlers"),
        col("mw.doc_type").as("webm_doctype"),
        col("mw.timestamp_scale").as("webm_timescale"),
        col("mw.duration_ms").as("webm_duration_ms"),
        col("mw.tracks").as("webm_tracks"),
        col("mw.codecs").as("webm_codecs"))
      .orderBy(col("doc_id"))
  }

  /** The construction arithmetic in DuckDB — no byte parsing: the
    * oracle is an INDEPENDENT statement of what the parsed metadata
    * must be. Integer division floors on both engines (all operands
    * non-negative). ASCII corpus ⇒ strlen == numChars (the same
    * convention every mm_* oracle relies on). */
  val oracleSql: String =
    s"""WITH p AS (
      |  SELECT doc_id, strlen(text) AS L FROM documents
      |), d AS (
      |  SELECT doc_id, L,
      |    [32,40,48,56,64,80,96,112,128,160,192,224,256,320][CAST(L % 14 AS INT) + 1] AS br,
      |    [44100,48000,32000][CAST(L % 3 AS INT) + 1] AS sr,
      |    L % 7 + 2 AS fr,
      |    600 * (L % 4 + 1) AS ts,
      |    (L + 7) * 125 AS dt,
      |    L % 3 + 1 AS tracks
      |  FROM p
      |)
      |SELECT doc_id,
      |  CAST(sr AS INT) AS mp3_sample_rate,
      |  CAST(br AS INT) AS mp3_bitrate_kbps,
      |  CAST(fr AS INT) AS mp3_frames,
      |  CAST(fr * $Mp3SamplesPerFrame * 1000 // sr AS BIGINT) AS mp3_duration_ms,
      |  CAST(10 + L % 33 AS INT) AS mp3_id3_bytes,
      |  CAST(10 + L % 33 + fr * (144 * br * 1000 // sr) AS INT) AS mp3_byte_len,
      |  'isom' AS mp4_major_brand,
      |  CAST(ts AS INT) AS mp4_timescale,
      |  CAST(dt AS BIGINT) AS mp4_duration_ticks,
      |  CAST(dt * 1000 // ts AS BIGINT) AS mp4_duration_ms,
      |  CAST(tracks AS INT) AS mp4_tracks,
      |  CASE tracks WHEN 1 THEN 'vide' WHEN 2 THEN 'vide,soun'
      |       ELSE 'vide,soun,vide' END AS mp4_handlers,
      |  CASE WHEN L % 2 = 0 THEN 'webm' ELSE 'matroska' END AS webm_doctype,
      |  CAST(500000 * (L % 3 + 1) AS INT) AS webm_timescale,
      |  CAST(125 * (L + 3) * (L % 3 + 1) AS BIGINT) AS webm_duration_ms,
      |  CAST(L % 4 AS INT) AS webm_tracks,
      |  ['','V_VP9','V_VP9,A_OPUS','V_VP9,A_OPUS,V_VP9'][CAST(L % 4 AS INT) + 1]
      |    AS webm_codecs
      |FROM d
      |ORDER BY doc_id""".stripMargin

  private def putBe32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    b.write(((v >> 24) & 0xFF).toInt); b.write(((v >> 16) & 0xFF).toInt)
    b.write(((v >> 8) & 0xFF).toInt); b.write((v & 0xFF).toInt)
  }

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    putBe32(b, 8L + payload.length)
    b.write(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    b.write(payload)
    b.toByteArray
  }

  /** Deterministic ISO-BMFF test payload: ftyp(majorBrand, isom) +
    * moov{ mvhd v0(timescale, duration) + trak{mdia{hdlr(h)}}* }. */
  def encodeMp4(majorBrand: String, timescale: Int, durationTicks: Long,
                handlers: Seq[String]): Array[Byte] = {
    require(majorBrand.length == 4 && timescale > 0 && durationTicks >= 0 &&
      durationTicks <= 0xFFFFFFFFL && handlers.forall(_.length == 4))
    val ftypP = new java.io.ByteArrayOutputStream()
    ftypP.write(majorBrand.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    putBe32(ftypP, 0L) // minor_version
    ftypP.write("isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mvhdP = new java.io.ByteArrayOutputStream()
    putBe32(mvhdP, 0L)            // version 0 + flags
    putBe32(mvhdP, 0L)            // creation_time
    putBe32(mvhdP, 0L)            // modification_time
    putBe32(mvhdP, timescale.toLong)
    putBe32(mvhdP, durationTicks)
    putBe32(mvhdP, 0x00010000L)   // rate 1.0
    // volume(2) + reserved(2) + reserved(8) + matrix(36) +
    // pre_defined(24) + next_track_ID(4) — zeros suffice structurally
    mvhdP.write(new Array[Byte](2 + 2 + 8 + 36 + 24 + 4))
    val traks = handlers.map { h =>
      val hdlrP = new java.io.ByteArrayOutputStream()
      putBe32(hdlrP, 0L) // version + flags
      putBe32(hdlrP, 0L) // pre_defined
      hdlrP.write(h.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      hdlrP.write(new Array[Byte](12)) // reserved[3]
      hdlrP.write(0) // empty name, NUL
      box("trak", box("mdia", box("hdlr", hdlrP.toByteArray)))
    }
    val moovP = new java.io.ByteArrayOutputStream()
    moovP.write(box("mvhd", mvhdP.toByteArray))
    traks.foreach(moovP.write)
    val out = new java.io.ByteArrayOutputStream()
    out.write(box("ftyp", ftypP.toByteArray))
    out.write(box("moov", moovP.toByteArray))
    out.toByteArray
  }

  /** mm_container_probe_audio: the FLAC + Ogg legs of the family,
    * same gating pattern as [[probeQuery]] — payload parameters
    * derive from the text's char length, the engine parses the bytes
    * back, and the DuckDB oracle recomputes every field from strlen
    * arithmetic. Work shape identical: one codegen'd map-only
    * projection; the trailing sort exists only for the oracle's
    * row-order compare. */
  def audioProbeQuery(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftext.ContainerMeta
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        ContainerMeta.flacTestPayload(col("text")).as("pf"),
        ContainerMeta.oggTestPayload(col("text")).as("po"))
      .select(col("doc_id"),
        ContainerMeta.flacMeta(col("pf")).as("mf"),
        length(col("pf")).as("flac_byte_len"),
        ContainerMeta.oggMeta(col("po")).as("mo"),
        length(col("po")).as("ogg_byte_len"))
      .select(col("doc_id"),
        col("mf.sample_rate").as("flac_sample_rate"),
        col("mf.channels").as("flac_channels"),
        col("mf.bits_per_sample").as("flac_bits_per_sample"),
        col("mf.total_samples").as("flac_total_samples"),
        col("mf.duration_ms").as("flac_duration_ms"),
        col("mf.meta_blocks").as("flac_meta_blocks"),
        col("flac_byte_len"),
        col("mo.pages").as("ogg_pages"),
        col("mo.streams").as("ogg_streams"),
        col("mo.bos_pages").as("ogg_bos_pages"),
        col("mo.eos_pages").as("ogg_eos_pages"),
        col("mo.last_granule").as("ogg_last_granule"),
        col("mo.payload_bytes").as("ogg_payload_bytes"),
        col("mo.codecs").as("ogg_codecs"),
        col("ogg_byte_len"))
      .orderBy(col("doc_id"))
  }

  /** The FLAC/Ogg construction arithmetic in DuckDB — the independent
    * statement of what the parsed metadata must be (see [[oracleSql]]
    * for the convention). Byte lengths pin the encoders' size
    * arithmetic: FLAC = magic(4) + STREAMINFO(38) + PADDING(4+pad);
    * Ogg = per stream, one BOS page of 28+$OggIdHeaderBytes bytes (the
    * padded codec id header) + (pps−1) pages of 28+payload bytes. The
    * codec list mirrors the (L+s)%3 derivation in
    * `ContainerMeta.oggPayload`. */
  val audioOracleSql: String =
    s"""WITH p AS (
      |  SELECT doc_id, strlen(text) AS L FROM documents
      |), d AS (
      |  SELECT doc_id, L,
      |    [44100,48000,32000,22050][CAST(L % 4 AS INT) + 1] AS sr,
      |    L % 8 + 1 AS ch,
      |    [8,16,24][CAST(L % 3 AS INT) + 1] AS bps,
      |    (L + 41) * 1000 AS ts,
      |    L % 19 AS pad,
      |    L % 2 + 1 AS streams,
      |    L % 5 + 2 AS pps,
      |    L % 17 + 1 AS ppp,
      |    (L % 9 + 1) * 960 AS step,
      |    ['opus','vorbis','flac'][CAST(L % 3 AS INT) + 1] AS c0,
      |    ['opus','vorbis','flac'][CAST((L + 1) % 3 AS INT) + 1] AS c1
      |  FROM p
      |)
      |SELECT doc_id,
      |  CAST(sr AS INT) AS flac_sample_rate,
      |  CAST(ch AS INT) AS flac_channels,
      |  CAST(bps AS INT) AS flac_bits_per_sample,
      |  CAST(ts AS BIGINT) AS flac_total_samples,
      |  CAST(ts * 1000 // sr AS BIGINT) AS flac_duration_ms,
      |  CAST(2 AS INT) AS flac_meta_blocks,
      |  CAST(46 + pad AS INT) AS flac_byte_len,
      |  CAST(streams * pps AS INT) AS ogg_pages,
      |  CAST(streams AS INT) AS ogg_streams,
      |  CAST(streams AS INT) AS ogg_bos_pages,
      |  CAST(streams AS INT) AS ogg_eos_pages,
      |  CAST(pps * step AS BIGINT) AS ogg_last_granule,
      |  CAST(streams * ($OggIdHeaderBytes + (pps - 1) * ppp) AS BIGINT)
      |    AS ogg_payload_bytes,
      |  CASE WHEN streams = 1 THEN c0 ELSE c0 || ',' || c1 END AS ogg_codecs,
      |  CAST(streams * (28 + $OggIdHeaderBytes + (pps - 1) * (28 + ppp)) AS INT)
      |    AS ogg_byte_len
      |FROM d
      |ORDER BY doc_id""".stripMargin
}
