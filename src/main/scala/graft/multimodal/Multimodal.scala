package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing (north-star scope, SURVEY §7.5 (c)):
  * media as opaque BINARY columns + typed metadata, with
  * decode / feature-extract / frame-sample as partition-batched
  * Dataset transforms.
  *
  * ALL THREE codec legs are REAL JDK container codecs: image-mime
  * rows carry an actual PNG payload (16×16 grayscale, pixels = the
  * doc's text bytes cycled to 256 — built with `javax.imageio`),
  * audio-mime rows an actual WAV (8 kHz mono unsigned 8-bit PCM, same
  * sample construction — `javax.sound.sampled`), and video-mime rows
  * an actual multi-frame ANIMATED GIF (16×16 frames on an 8-bit
  * indexed gray palette, one frame per 256-byte chunk of the text,
  * last chunk space-padded — `javax.imageio`'s GIF sequence writer).
  * [[MediaCodec.decodeReal]] parses each container back to
  * dimensions/format + samples. All three codecs are lossless at
  * these settings (PNG by definition, 8-bit PCM WAV by definition,
  * GIF because a 256-entry gray palette covers every 8-bit sample
  * exactly), so the decoded samples equal the source construction —
  * which is what makes the decode DuckDB-oracle-checkable without a
  * SQL codec. The batch shape (mapPartitions iterator — the contract
  * a JNI/FFI decoder needs) is identical for all three.
  *
  * Scale: media rows are wide (MBs per row at production sizes) —
  * the feature extraction is a per-partition map with NO shuffle, and
  * downstream analytics select only the small typed columns, so
  * column pruning drops the binary payload right after decode.
  */
object Multimodal {

  /** Typed record for the media table: the Dataset boundary gives the
    * decode step a stable compile-checked batch element. */
  case class MediaRecord(media_id: Long, uri: String, mime: String, data: Array[Byte])

  case class MediaFeatures(
      media_id: Long, uri: String, mime: String, byte_len: Int,
      content_sha: String, width: Int, height: Int, histogram: Array[Double])

  /** Fixed raster geometry of the synthesized PNG payloads. */
  val ImgW = 16
  val ImgH = 16

  /** The image payload's pixel bytes: the doc text's UTF-8 bytes
    * cycled to exactly ImgW×ImgH samples (empty text → one space, so
    * the cycle is well-defined). The DuckDB twin is
    * `substr(repeat(text, ceil(256/len)), 1, 256)` — ASCII corpus, so
    * chars == bytes. */
  def pixelBytes(text: String): Array[Byte] = {
    val src = if (text == null || text.isEmpty) " " else text
    val b = src.getBytes("UTF-8")
    Array.tabulate(ImgW * ImgH)(i => b(i % b.length))
  }

  /** Samples-per-frame of the synthesized video payloads (one full
    * ImgW×ImgH raster per frame). */
  val FrameLen: Int = ImgW * ImgH

  /** The video payload's frame rasters: consecutive 256-byte chunks
    * of the text's UTF-8 bytes, the last chunk right-padded with
    * spaces (empty text → one all-space frame). The DuckDB twin pads
    * with `rpad(text, 256*nframes, ' ')` and slices — ASCII corpus,
    * so chars == bytes. */
  def videoFrameRasters(text: String): Seq[Array[Byte]] = {
    val src = if (text == null || text.isEmpty) " " else text
    val b = src.getBytes("UTF-8")
    val nframes = (b.length + FrameLen - 1) / FrameLen
    (0 until nframes).map { f =>
      Array.tabulate(FrameLen) { i =>
        val idx = f * FrameLen + i
        if (idx < b.length) b(idx) else ' '.toByte
      }
    }
  }

  /** Deterministic media table derived from `documents` (the driver
    * testdata ships no binary columns — FIXTURES §4): every row
    * carries a REAL container — PNG for image mime, WAV for audio,
    * multi-frame animated GIF for video — encoded per-partition with
    * JDK codecs. Mime assigned round-robin on doc_id. */
  def mediaTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val mime = element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    // real PNG / WAV / GIF encode, partition-batched (one encoder
    // context per partition — same lifecycle as a native codec handle)
    documents.select(
        col("doc_id").as("media_id"),
        concat(lit("mem://doc/"), col("doc_id")).as("uri"),
        mime.as("mime"),
        col("text"))
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, uri, mime, text) =>
          val payload = mime match {
            case "image/png" => MediaCodec.encodePng(pixelBytes(text))
            case "audio/wav" => MediaCodec.encodeWav(pixelBytes(text))
            case _           => MediaCodec.encodeGif(videoFrameRasters(text))
          }
          (id, uri, mime, payload)
        }
      }
      .toDF("media_id", "uri", "mime", "data")
  }

  object MediaCodec {

    /** Encode a gray sample array as a real PNG via `javax.imageio`
      * (JDK built-in, no external jars). Direct raster sample writes —
      * no color management — so the encode/decode round trip is
      * byte-exact. */
    def encodePng(pixels: Array[Byte], w: Int = ImgW, h: Int = ImgH): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < w * h) {
        raster.setSample(i % w, i / w, 0, pixels(i) & 0xFF)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** The synthesized WAV payload's audio format: 8 kHz mono unsigned
      * 8-bit PCM — one byte per sample, so the decoded sample stream
      * equals the input byte array exactly (the audio counterpart of
      * the PNG losslessness contract). */
    private def wavFormat = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)

    /** Encode a sample array as a real WAV via `javax.sound.sampled`
      * (JDK built-in): RIFF/fmt/data chunks written by the platform's
      * actual audio file writer, not a hand-rolled header. */
    def encodeWav(samples: Array[Byte]): Array[Byte] = {
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), wavFormat, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** 256-entry gray palette: every 8-bit sample maps to its own
      * palette slot, which is what makes the GIF leg lossless. */
    private lazy val grayPalette: java.awt.image.IndexColorModel = {
      val g = Array.tabulate(256)(_.toByte)
      new java.awt.image.IndexColorModel(8, 256, g, g, g)
    }

    /** Encode frame rasters as a real multi-frame animated GIF via
      * `javax.imageio`'s sequence writer (JDK built-in): GIF89a
      * header, logical screen descriptor and per-frame image blocks
      * written by the platform codec, not hand-rolled. Indexed 8-bit
      * gray frames ⇒ the LZW round trip is byte-exact. */
    def encodeGif(frames: Seq[Array[Byte]], w: Int = ImgW, h: Int = ImgH): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0, px(i) & 0xFF)
          i += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      writer.dispose()
      ios.close()
      bos.toByteArray
    }

    /** Parse a GIF container back to (width, height, frame rasters) —
      * the real video decode leg: the platform reader walks the block
      * structure and LZW-decompresses every frame; samples come from
      * the decoded palette lookups (gray palette ⇒ low byte of the
      * RGB is the original sample). */
    def decodeGif(data: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(data))
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      require(n > 0, "undecodable GIF payload: no frames")
      var (w, h) = (0, 0)
      val frames = Array.tabulate(n) { f =>
        val img = reader.read(f)
        w = img.getWidth
        h = img.getHeight
        val px = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) {
          px(i) = (img.getRGB(i % w, i / w) & 0xFF).toByte
          i += 1
        }
        px
      }
      reader.dispose()
      iis.close()
      (w, h, frames)
    }

    /** Parse a WAV container back to its PCM sample bytes + format —
      * the real audio decode leg (`AudioSystem.getAudioInputStream`
      * validates the RIFF structure and locates the data chunk). */
    def decodeWav(data: Array[Byte]): (Array[Byte], javax.sound.sampled.AudioFormat) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(data))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      (out.toByteArray, in.getFormat)
    }

    /** REAL decoder entry point — all three mime legs parse their
      * actual container: `javax.imageio` for PNG (signature, IHDR,
      * zlib-inflated IDAT) and animated GIF (block walk +
      * per-frame LZW), `javax.sound.sampled` for WAV (RIFF chunks).
      * Features come from the decoded samples — dimensions from the
      * container header, content identity + histogram from the
      * decoded pixels/PCM (content-addressing by DECODED content, so
      * a re-encoded container dedups to the same sha — the property a
      * multimodal dedup pipeline actually wants).
      *
      * Production formats beyond the JDK codecs (JPEG is in ImageIO
      * too; MP3/MP4/H.264 are not) wire in the same way (public
      * options, in preference order):
      *  1. JVM-native: TwelveMonkeys ImageIO (more image formats) /
      *     JAVE or a bundled ffmpeg binary driven per-partition. Drop
      *     the implementation into the match arms below — the
      *     `mapPartitions` callers batch records through one codec
      *     instance per partition, which is exactly the lifecycle a
      *     native-library context wants (init once, stream records,
      *     close on iterator exhaustion).
      *  2. `mapInPandas` + Pillow/torchaudio/decord on a PySpark
      *     driver: same schema contract (binary `data` in, struct of
      *     width/height/duration/histogram out), with
      *     `spark.sql.execution.arrow.maxRecordsPerBatch` sized so a
      *     batch of decoded frames fits executor memory (media rows
      *     are MBs, not KBs — 64–256 rows/batch, not the 10k default).
      *  3. External service: partition-batched async calls from
      *     `mapPartitions` with bounded in-flight requests.
      * In every case column pruning still drops `data` before any
      * stage that only needs metadata — keep feature extraction and
      * metadata queries in separate projections as done here. */
    def decodeReal(r: MediaRecord): MediaFeatures = r.mime match {
      case "image/png" =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
        require(img != null, s"undecodable PNG payload for media_id=${r.media_id}")
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val px = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) {
          px(i) = raster.getSample(i % w, i / w, 0).toByte
          i += 1
        }
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(px).map("%02x".format(_)).mkString
        val hist = new Array[Double](16)
        px.foreach(b => hist((b & 0xFF) / 16) += 1.0)
        val n = math.max(1, w * h)
        MediaFeatures(r.media_id, r.uri, r.mime, w * h, sha, w, h,
          hist.map(v => math.floor(v / n * 10000) / 10000))
      case "audio/wav" =>
        // real WAV parse: sample count + channel count from the
        // decoded stream, identity + histogram over the PCM samples
        // (unsigned 8-bit ⇒ samples == the source byte construction)
        val (samples, fmt) = decodeWav(r.data)
        val n = math.max(1, samples.length)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(samples).map("%02x".format(_)).mkString
        val hist = new Array[Double](16)
        samples.foreach(b => hist((b & 0xFF) / 16) += 1.0)
        MediaFeatures(r.media_id, r.uri, r.mime, samples.length, sha,
          width = samples.length, height = fmt.getChannels,
          histogram = hist.map(v => math.floor(v / n * 10000) / 10000))
      case "video/mp4" =>
        // real GIF parse: dimensions from the decoded frames, identity
        // + histogram over the concatenation of every frame's samples
        // (lossless palette ⇒ samples == the padded-chunk source
        // construction)
        val (w, h, frames) = decodeGif(r.data)
        val all = frames.flatten
        val n = math.max(1, all.length)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(all).map("%02x".format(_)).mkString
        val hist = new Array[Double](16)
        all.foreach(b => hist((b & 0xFF) / 16) += 1.0)
        MediaFeatures(r.media_id, r.uri, r.mime, all.length, sha, w, h,
          hist.map(v => math.floor(v / n * 10000) / 10000))
      case _ => decodeFake(r) // unknown mime: deterministic fallback
    }

    /** Modulus keeping the byte folds inside non-overflowing BIGINT
      * range in ANY engine (acc < 2³⁰ ⇒ acc*31+255 < 2³⁵): the folds
      * stay cross-engine portable — 64-bit wrap-around would be silent
      * in the JVM but an overflow error in ANSI SQL engines. */
    val FoldMod = 1000000007L

    def foldBytes(bytes: Array[Byte], init: Long): Long =
      bytes.foldLeft(init)((acc, b) => (acc * 31 + (b & 0xFF)) % FoldMod)

    /** Deterministic fake decode exercising the same signature and
      * batch shape: "dimensions" from a stable byte fold, features =
      * 16-bin normalized byte histogram (floor-quantized to 4 dp —
      * floor is bit-portable across engines where round-half ties are
      * not). */
    def decodeFake(r: MediaRecord): MediaFeatures = {
      val bytes = r.data
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(bytes).map("%02x".format(_)).mkString
      val hist = new Array[Double](16)
      bytes.foreach(b => hist((b & 0xFF) / 16) += 1.0)
      val n = math.max(1, bytes.length)
      val norm = hist.map(v => math.floor(v / n * 10000) / 10000)
      val fold = foldBytes(bytes, 17L)
      MediaFeatures(r.media_id, r.uri, r.mime, bytes.length, sha,
        width = (fold % 1280 + 1).toInt,
        height = ((fold >> 16) % 720 + 1).toInt,
        histogram = norm)
    }
  }

  /** Feature extraction as a partition-batched transform: one decoder
    * instantiation per partition (the expensive part for real codecs),
    * then a streaming map over the partition's records. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      // per-partition decoder setup would go here (real codec handles);
      // decodeReal dispatches per mime: PNG rows run the real
      // javax.imageio decode, audio/video fall back to the fake
      records.map(MediaCodec.decodeReal)
    }
  }

  /** Frame sampling for video payloads: decode the GIF container and
    * emit every `stride`-th REAL frame's raster as a row (real impl:
    * keyframe extraction — same decode-then-stride shape).
    * Demonstrates the explode-to-frames pattern that keeps frames
    * co-partitioned with their parent video; the digest is over the
    * DECODED samples, so a re-encoded container yields identical
    * frame rows. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("mime") === "video/mp4").as[MediaRecord]
      .flatMap { r =>
        val (_, _, frames) = MediaCodec.decodeGif(r.data)
        frames.iterator.zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (px, i) => (r.media_id, i, px.length,
            MediaCodec.foldBytes(px, 0L)) }
      }
      .toDF("media_id", "frame_index", "frame_bytes", "frame_digest")
  }

  /** Scalar-only metadata view (oracle-friendly: no arrays/binary). */
  def mediaMeta(documents: DataFrame): DataFrame =
    extractFeatures(mediaTable(documents))
      .toDF()
      .select("media_id", "uri", "mime", "byte_len", "content_sha")
      .orderBy(col("media_id"))

  def mediaMetaQuery(s: SparkSession, dir: String): DataFrame =
    mediaMeta(Tables.documents(s, dir))

  /** The image rows' decoded pixel string as a DuckDB expression:
    * text bytes cycled to ImgW×ImgH chars (PNG round trip is lossless,
    * so decoded samples == this construction). */
  private val padTextSql: String = {
    val n = ImgW * ImgH
    s"""substr(repeat(CASE WHEN strlen(text) = 0 THEN ' ' ELSE text END,
       |      CAST(ceil($n.0 / greatest(strlen(text), 1)) AS INT)), 1, $n)""".stripMargin
  }

  /** The video rows' decoded sample string as a DuckDB expression:
    * text space-padded to a whole number of $FrameLen-sample frames
    * (the GIF round trip is lossless, so the concatenation of every
    * decoded frame's samples == this construction). */
  private val padVidSql: String =
    s"""rpad(CASE WHEN strlen(text) = 0 THEN ' ' ELSE text END,
       |     CAST($FrameLen * ceil(greatest(strlen(text), 1) / $FrameLen.0) AS INT), ' ')""".stripMargin

  /** DuckDB oracle for the scalar metadata. EVERY row is identified
    * by its DECODED content (sha over the pixel / PCM / frame
    * samples — which the lossless PNG/WAV/GIF round trips make
    * recomputable from text; ASCII corpus, so chars == bytes). */
  val mediaMetaSql: String =
    s"""SELECT
      |  doc_id AS media_id,
      |  concat('mem://doc/', CAST(doc_id AS VARCHAR)) AS uri,
      |  ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
      |  CASE WHEN doc_id % 3 = 2 THEN CAST(strlen($padVidSql) AS INT)
      |       ELSE ${ImgW * ImgH} END AS byte_len,
      |  CASE WHEN doc_id % 3 = 2 THEN sha256($padVidSql)
      |       ELSE sha256($padTextSql) END AS content_sha
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Feature query with the histogram projected to 16 scalar columns
    * (hist_00…hist_15): arrays are not sortable/hashable by generic
    * result-diff harnesses, and the flat layout is also the
    * feature-store serving shape. */
  def featuresQuery(s: SparkSession, dir: String): DataFrame = {
    val histCols = (0 until 16).map(i =>
      element_at(col("histogram"), i + 1).as(f"hist_$i%02d"))
    extractFeatures(mediaTable(Tables.documents(s, dir))).toDF()
      .select(Seq(col("media_id"), col("uri"), col("mime"), col("byte_len"),
        col("content_sha"), col("width"), col("height")) ++ histCols: _*)
      .orderBy(col("media_id"))
  }

  /** DuckDB oracle for the full feature extraction. Every row (all
    * three REAL decode legs) is recomputed from the sample
    * construction the lossless PNG/WAV/GIF round trips preserve:
    * sha + 16-bin histogram over the decoded samples; dimensions
    * ImgW×ImgH for image and video frames, (frames, channels=1) for
    * audio; video byte_len = frames × $FrameLen (space-padded). */
  val featuresSql: String = {
    val n = ImgW * ImgH
    val histCols = (0 until 16).map(i =>
      s"""  CASE WHEN mime = 'video/mp4'
         |    THEN floor(CAST(len(list_filter(vbytes, b -> b // 16 = $i)) AS DOUBLE) / len(vbytes) * 10000) / 10000
         |    ELSE floor(CAST(len(list_filter(pbytes, b -> b // 16 = $i)) AS DOUBLE) / $n * 10000) / 10000
         |  END AS hist_${"%02d".format(i)}""".stripMargin)
      .mkString(",\n")
    s"""WITH base AS (
      |  SELECT
      |    doc_id AS media_id,
      |    concat('mem://doc/', CAST(doc_id AS VARCHAR)) AS uri,
      |    ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
      |    sha256($padTextSql) AS px_sha,
      |    sha256($padVidSql) AS vid_sha,
      |    list_transform(string_split($padTextSql, ''), c -> ord(c)) AS pbytes,
      |    list_transform(string_split($padVidSql, ''), c -> ord(c)) AS vbytes
      |  FROM documents
      |)
      |SELECT media_id, uri, mime,
      |  CASE WHEN mime = 'video/mp4' THEN CAST(len(vbytes) AS INT) ELSE $n END AS byte_len,
      |  CASE WHEN mime = 'video/mp4' THEN vid_sha ELSE px_sha END AS content_sha,
      |  CASE WHEN mime = 'audio/wav' THEN $n ELSE $ImgW END AS width,
      |  CASE WHEN mime = 'audio/wav' THEN 1 ELSE $ImgH END AS height,
      |$histCols
      |FROM base
      |ORDER BY media_id""".stripMargin
  }

  def framesQuery(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(Tables.documents(s, dir)))
      .orderBy(col("media_id"), col("frame_index"))

  /** Per-modality typed stats — the mime-dispatched decode shape (a
    * real pipeline runs a different codec per modality; every branch
    * here parses its actual container and computes over the DECODED
    * samples, which the lossless codecs make oracle-checkable).
    * Columns are NULL off-modality:
    *  - image: mean intensity (mean sample / 255, floor-quantized 4 dp)
    *  - audio: RMS of the 128-centered samples + zero-crossing count
    *  - video: decoded frame count + mean decoded intensity
    * Same partition-batched single pass as [[extractFeatures]]. */
  def modalityStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.map { r =>
        def q4(v: Double): Double = math.floor(v * 10000) / 10000
        val (imgMean, audioRms, audioZc, vidFrames, vidMeanInt) = r.mime match {
          case "image/png" =>
            // real decode: mean intensity over the PNG's decoded samples
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            var s = 0L
            var i = 0
            while (i < w * h) {
              s += raster.getSample(i % w, i / w, 0)
              i += 1
            }
            val mean = s.toDouble / math.max(1, w * h) / 255.0
            (Some(q4(mean)), None, None, None, None)
          case "audio/wav" =>
            // real decode: RMS + zero crossings over the WAV's PCM
            // samples, not the container bytes
            val (samples, _) = MediaCodec.decodeWav(r.data)
            val ns = math.max(1, samples.length)
            val sq = samples.foldLeft(0L)((a, b) =>
              a + (((b & 0xFF) - 128).toLong * ((b & 0xFF) - 128)))
            val zc = samples.sliding(2).count(p =>
              p.length == 2 && ((p(0) & 0xFF) < 128) != ((p(1) & 0xFF) < 128))
            (None, Some(q4(math.sqrt(sq.toDouble / ns))), Some(zc), None, None)
          case _ =>
            // real decode: frame count from the GIF block walk, mean
            // intensity over every decoded frame's samples
            val (_, _, frames) = MediaCodec.decodeGif(r.data)
            val all = frames.flatten
            val s = all.foldLeft(0L)((a, b) => a + (b & 0xFF))
            val mean = s.toDouble / math.max(1, all.length) / 255.0
            (None, None, None, Some(frames.length), Some(q4(mean)))
        }
        (r.media_id, r.mime, imgMean, audioRms, audioZc, vidFrames, vidMeanInt)
      }
    }.toDF("media_id", "mime", "img_mean_intensity", "audio_rms",
      "audio_zero_crossings", "video_frames", "video_mean_intensity")
  }

  def modalityStatsQuery(s: SparkSession, dir: String): DataFrame =
    modalityStats(mediaTable(Tables.documents(s, dir)))
      .orderBy(col("media_id"))

  /** DuckDB oracle: every branch replayed over the decoded-sample
    * construction its lossless codec preserves (identical IEEE
    * division/sqrt; floor quantization is bit-portable). */
  val modalityStatsSql: String =
    s"""WITH base AS (
      |  SELECT doc_id AS media_id,
      |    ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
      |    list_transform(string_split($padTextSql, ''), c -> ord(c)) AS pbytes,
      |    list_transform(string_split($padVidSql, ''), c -> ord(c)) AS vbytes
      |  FROM documents
      |)
      |SELECT media_id, mime,
      |  CASE WHEN mime = 'image/png' THEN
      |    floor(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), pbytes), (a,b) -> a + b) AS DOUBLE)
      |      / ${ImgW * ImgH} / 255.0 * 10000) / 10000 END AS img_mean_intensity,
      |  CASE WHEN mime = 'audio/wav' THEN
      |    floor(sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(pbytes, b -> (b - 128) * (b - 128))), (a,b) -> a + b) AS DOUBLE)
      |      / ${ImgW * ImgH}) * 10000) / 10000 END AS audio_rms,
      |  CASE WHEN mime = 'audio/wav' THEN
      |    CAST(len(list_filter(range(${ImgW * ImgH} - 1),
      |      i -> (pbytes[i + 1] < 128) <> (pbytes[i + 2] < 128))) AS INT)
      |  END AS audio_zero_crossings,
      |  CASE WHEN mime = 'video/mp4' THEN CAST(len(vbytes) // $FrameLen AS INT) END AS video_frames,
      |  CASE WHEN mime = 'video/mp4' THEN
      |    floor(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), vbytes), (a,b) -> a + b) AS DOUBLE)
      |      / len(vbytes) / 255.0 * 10000) / 10000
      |  END AS video_mean_intensity
      |FROM base
      |ORDER BY media_id""".stripMargin

  /** DuckDB oracle for strided frame sampling: $FrameLen-char chunks
    * of the space-padded video-mime docs (== the decoded GIF frame
    * rasters, by losslessness), every 4th chunk, digest = the same
    * mod-prime byte fold over the chunk's samples. */
  val framesSql: String =
    s"""WITH media AS (
      |  SELECT doc_id AS media_id, $padVidSql AS padded
      |  FROM documents WHERE doc_id % 3 = 2
      |), frames AS (
      |  SELECT media_id, CAST(i AS INT) AS frame_index,
      |    substr(padded, CAST(i * $FrameLen + 1 AS INT), $FrameLen) AS chunk
      |  FROM media, unnest(range(strlen(padded) // $FrameLen)) AS t(i)
      |  WHERE i % 4 = 0
      |)
      |SELECT media_id, frame_index,
      |  CAST(strlen(chunk) AS INT) AS frame_bytes,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(chunk, ''), c -> ord(c))),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS frame_digest
      |FROM frames
      |ORDER BY media_id, frame_index""".stripMargin
}
