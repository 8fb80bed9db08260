package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing (north-star scope, SURVEY §7.5 (c)):
  * media as opaque BINARY columns + typed metadata, with
  * decode / feature-extract / frame-sample as partition-batched
  * Dataset transforms.
  *
  * The IMAGE and AUDIO codec legs are REAL: image-mime rows carry an
  * actual PNG payload (16×16 grayscale, pixels = the doc's text bytes
  * cycled to 256 — built with `javax.imageio`, JDK built-in) and
  * audio-mime rows an actual WAV (8 kHz mono unsigned 8-bit PCM, same
  * sample construction — `javax.sound.sampled`, JDK built-in);
  * [[MediaCodec.decodeReal]] parses both containers back to
  * dimensions/format + samples. Both codecs are lossless at these
  * settings, so the decoded samples equal the source bytes — which is
  * what makes the decode DuckDB-oracle-checkable without a SQL codec.
  * Video decode still falls back to the deterministic fake (no ffmpeg
  * in this environment — wiring documented at
  * [[MediaCodec.decodeReal]]); the batch shape (mapPartitions
  * iterator — the contract a JNI/FFI decoder needs) is identical for
  * all three.
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

  /** Deterministic media table derived from `documents` (the driver
    * testdata ships no binary columns — FIXTURES §4): image-mime rows
    * carry a REAL PNG (encoded per-partition with `javax.imageio`);
    * audio/video rows carry the raw UTF-8 text bytes. Mime assigned
    * round-robin on doc_id. */
  def mediaTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val mime = element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val base = documents.select(
      col("doc_id").as("media_id"),
      concat(lit("mem://doc/"), col("doc_id")).as("uri"),
      mime.as("mime"),
      col("text"))
    val video = base.filter(col("mime") === "video/mp4")
      .select(col("media_id"), col("uri"), col("mime"),
        encode(col("text"), "UTF-8").cast("binary").as("data"))
    // real PNG / WAV encode, partition-batched (one encoder context
    // per partition — same lifecycle as a native codec handle)
    val coded = base.filter(col("mime") =!= "video/mp4")
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, uri, mime, text) =>
          val payload =
            if (mime == "image/png") MediaCodec.encodePng(pixelBytes(text))
            else MediaCodec.encodeWav(pixelBytes(text))
          (id, uri, mime, payload)
        }
      }
      .toDF("media_id", "uri", "mime", "data")
    video.unionByName(coded)
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

    /** REAL decoder entry point. The image leg IS real: `javax.imageio`
      * parses the PNG container (signature, IHDR, zlib-inflated IDAT)
      * and the features come from the decoded raster — dimensions from
      * the header, content identity + histogram from the pixel samples
      * (content-addressing by DECODED content, so a re-encoded
      * container dedups to the same sha — the property a multimodal
      * dedup pipeline actually wants).
      *
      * Audio/video fall back to the deterministic fake — no ffmpeg in
      * this environment. Deployment wiring for those (public options,
      * in preference order):
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
      case _ => decodeFake(r) // video: see ffmpeg wiring options above
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

  /** Frame sampling for video payloads: every `stride`-th 64-byte
    * chunk becomes a "frame" row (real impl: keyframe extraction).
    * Demonstrates the explode-to-frames shape that keeps frames
    * co-partitioned with their parent video. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("mime") === "video/mp4").as[MediaRecord]
      .flatMap { r =>
        r.data.grouped(64).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (chunk, i) => (r.media_id, i, chunk.length,
            MediaCodec.foldBytes(chunk, 0L)) }
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

  /** DuckDB oracle for the scalar metadata. Image and audio rows are
    * identified by their DECODED content (sha over the pixel / PCM
    * samples — which the lossless PNG/WAV round trips make
    * recomputable from text); video rows by their raw payload (ASCII,
    * so chars == bytes). */
  val mediaMetaSql: String =
    s"""SELECT
      |  doc_id AS media_id,
      |  concat('mem://doc/', CAST(doc_id AS VARCHAR)) AS uri,
      |  ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
      |  CASE WHEN doc_id % 3 = 2 THEN CAST(strlen(text) AS INT)
      |       ELSE ${ImgW * ImgH} END AS byte_len,
      |  CASE WHEN doc_id % 3 = 2 THEN sha256(text)
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

  /** DuckDB oracle for the full feature extraction. Image and audio
    * rows (the REAL `javax.imageio` / `javax.sound.sampled` decode
    * legs) are recomputed from the sample construction the lossless
    * PNG/WAV round trips preserve: sha + 16-bin histogram over the
    * decoded samples, image dimensions ImgW×ImgH, audio dimensions
    * (frames, channels=1). Video rows replay the deterministic fake
    * decode (byte-fold dimensions, raw-payload sha) — identical byte
    * math (list_reduce = the sequential byte fold). */
  val featuresSql: String = {
    val n = ImgW * ImgH
    val histCols = (0 until 16).map(i =>
      s"""  CASE WHEN mime = 'video/mp4'
         |    THEN floor(CAST(len(list_filter(bytes, b -> b // 16 = $i)) AS DOUBLE) / nb * 10000) / 10000
         |    ELSE floor(CAST(len(list_filter(pbytes, b -> b // 16 = $i)) AS DOUBLE) / $n * 10000) / 10000
         |  END AS hist_${"%02d".format(i)}""".stripMargin)
      .mkString(",\n")
    s"""WITH base AS (
      |  SELECT
      |    doc_id AS media_id,
      |    concat('mem://doc/', CAST(doc_id AS VARCHAR)) AS uri,
      |    ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
      |    CAST(strlen(text) AS INT) AS text_len,
      |    sha256(text) AS text_sha,
      |    sha256($padTextSql) AS px_sha,
      |    list_transform(string_split(text, ''), c -> ord(c)) AS bytes,
      |    list_transform(string_split($padTextSql, ''), c -> ord(c)) AS pbytes,
      |    greatest(strlen(text), 1) AS nb
      |  FROM documents
      |), folded AS (
      |  SELECT *,
      |    list_reduce(list_prepend(CAST(17 AS BIGINT), bytes),
      |                (a, b) -> (a * 31 + b) % 1000000007) AS fold
      |  FROM base
      |)
      |SELECT media_id, uri, mime,
      |  CASE WHEN mime = 'video/mp4' THEN text_len ELSE $n END AS byte_len,
      |  CASE WHEN mime = 'video/mp4' THEN text_sha ELSE px_sha END AS content_sha,
      |  CASE WHEN mime = 'image/png' THEN $ImgW
      |       WHEN mime = 'audio/wav' THEN $n
      |       ELSE CAST(fold % 1280 + 1 AS INT) END AS width,
      |  CASE WHEN mime = 'image/png' THEN $ImgH
      |       WHEN mime = 'audio/wav' THEN 1
      |       ELSE CAST((fold // 65536) % 720 + 1 AS INT) END AS height,
      |$histCols
      |FROM folded
      |ORDER BY media_id""".stripMargin
  }

  def framesQuery(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(Tables.documents(s, dir)))
      .orderBy(col("media_id"), col("frame_index"))

  /** Per-modality typed stats — the mime-dispatched decode shape (a
    * real pipeline runs a different codec per modality; here each
    * branch is deterministic byte math on the payload, so the whole
    * dispatch is oracle-checkable). Columns are NULL off-modality:
    *  - image: mean intensity (mean byte / 255, floor-quantized 4 dp)
    *  - audio: RMS of the 128-centered samples + zero-crossing count
    *  - video: 64-byte frame count + mean frame length
    * Same partition-batched single pass as [[extractFeatures]]. */
  def modalityStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.map { r =>
        val bytes = r.data
        val n = math.max(1, bytes.length)
        def q4(v: Double): Double = math.floor(v * 10000) / 10000
        val (imgMean, audioRms, audioZc, vidFrames, vidMeanLen) = r.mime match {
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
            val frames = (bytes.length + 63) / 64
            (None, None, None, Some(frames),
              Some(q4(bytes.length.toDouble / math.max(1, frames))))
        }
        (r.media_id, r.mime, imgMean, audioRms, audioZc, vidFrames, vidMeanLen)
      }
    }.toDF("media_id", "mime", "img_mean_intensity", "audio_rms",
      "audio_zero_crossings", "video_frames", "video_mean_frame_len")
  }

  def modalityStatsQuery(s: SparkSession, dir: String): DataFrame =
    modalityStats(mediaTable(Tables.documents(s, dir)))
      .orderBy(col("media_id"))

  /** DuckDB oracle: every branch replayed over the ASCII payload's
    * byte list (identical IEEE division/sqrt; floor quantization is
    * bit-portable). */
  val modalityStatsSql: String =
    s"""WITH base AS (
      |  SELECT doc_id AS media_id,
      |    ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
      |    list_transform(string_split(text, ''), c -> ord(c)) AS bytes,
      |    list_transform(string_split($padTextSql, ''), c -> ord(c)) AS pbytes,
      |    greatest(strlen(text), 1) AS n,
      |    CAST(strlen(text) AS INT) AS len
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
      |  CASE WHEN mime = 'video/mp4' THEN CAST((len + 63) // 64 AS INT) END AS video_frames,
      |  CASE WHEN mime = 'video/mp4' THEN
      |    floor(CAST(len AS DOUBLE) / greatest((len + 63) // 64, 1) * 10000) / 10000
      |  END AS video_mean_frame_len
      |FROM base
      |ORDER BY media_id""".stripMargin

  /** DuckDB oracle for strided frame sampling: 64-char chunks of the
    * video-mime docs, every 4th chunk, digest = the same mod-prime
    * byte fold. */
  val framesSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id, text
      |  FROM documents WHERE doc_id % 3 = 2
      |), frames AS (
      |  SELECT media_id, CAST(i AS INT) AS frame_index,
      |    substr(text, CAST(i * 64 + 1 AS INT), 64) AS chunk
      |  FROM media, unnest(range((strlen(text) + 63) // 64)) AS t(i)
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
