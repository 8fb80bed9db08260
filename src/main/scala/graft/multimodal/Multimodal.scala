package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing (north-star scope, SURVEY §7.5 (c)):
  * media as opaque BINARY columns + typed metadata, with
  * decode / feature-extract / frame-sample as partition-batched
  * Dataset transforms.
  *
  * The actual codec step is STUBBED (no image/audio libs in this
  * environment — see [[MediaCodec.decodeReal]]); everything around it
  * is real: the schema, the binary column handling, the
  * mapPartitions batch shape (records stream through an iterator one
  * partition at a time — the same contract a JNI/FFI decoder or a
  * `mapInPandas`-style batch UDF needs), and the deterministic fake
  * decode used to test the plumbing end-to-end.
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

  /** Deterministic media table derived from `documents` (the driver
    * testdata ships no binary columns — FIXTURES §4): payload = UTF-8
    * bytes of the text, mime assigned round-robin. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      concat(lit("mem://doc/"), col("doc_id")).as("uri"),
      element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
      encode(col("text"), "UTF-8").cast("binary").as("data"))

  object MediaCodec {
    /** REAL decoder entry point — requires platform codec libraries
      * that are absent here. Wire libjpeg/ffmpeg/etc. bindings in at
      * deployment; the pipeline shape does not change.
      *
      * Deployment wiring (three public options, in preference order):
      *  1. JVM-native: TwelveMonkeys ImageIO (images) / JAVE or a
      *     bundled ffmpeg binary driven per-partition (audio/video).
      *     Drop the implementation straight into this method — the
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
    def decodeReal(record: MediaRecord): MediaFeatures =
      ??? // stub: no codec libs in this environment (see scaladoc)

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
      // per-partition decoder setup would go here (real codec handles)
      records.map(MediaCodec.decodeFake)
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

  /** DuckDB oracle for the scalar metadata: sha256/byte length are
    * recomputable from the source text (ASCII, so chars == bytes);
    * width/height replicate the deterministic byte fold. */
  val mediaMetaSql: String =
    """SELECT
      |  doc_id AS media_id,
      |  concat('mem://doc/', CAST(doc_id AS VARCHAR)) AS uri,
      |  ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
      |  CAST(strlen(text) AS INT) AS byte_len,
      |  sha256(text) AS content_sha
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

  /** DuckDB oracle for the full feature extraction: the fake decode is
    * deterministic byte math over ASCII text, so every output —
    * byte fold dimensions, sha, floor-quantized histogram bins — is
    * recomputable in SQL (list_reduce = the sequential byte fold). */
  val featuresSql: String = {
    val histCols = (0 until 16).map(i =>
      s"  floor(CAST(len(list_filter(bytes, b -> b // 16 = $i)) AS DOUBLE) / n * 10000) / 10000 AS hist_${"%02d".format(i)}")
      .mkString(",\n")
    s"""WITH base AS (
      |  SELECT
      |    doc_id AS media_id,
      |    concat('mem://doc/', CAST(doc_id AS VARCHAR)) AS uri,
      |    ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
      |    CAST(strlen(text) AS INT) AS byte_len,
      |    sha256(text) AS content_sha,
      |    list_transform(string_split(text, ''), c -> ord(c)) AS bytes,
      |    greatest(strlen(text), 1) AS n
      |  FROM documents
      |), folded AS (
      |  SELECT *,
      |    list_reduce(list_prepend(CAST(17 AS BIGINT), bytes),
      |                (a, b) -> (a * 31 + b) % 1000000007) AS fold
      |  FROM base
      |)
      |SELECT media_id, uri, mime, byte_len, content_sha,
      |  CAST(fold % 1280 + 1 AS INT) AS width,
      |  CAST((fold // 65536) % 720 + 1 AS INT) AS height,
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
            val mean = bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / n / 255.0
            (Some(q4(mean)), None, None, None, None)
          case "audio/wav" =>
            val sq = bytes.foldLeft(0L)((a, b) =>
              a + (((b & 0xFF) - 128).toLong * ((b & 0xFF) - 128)))
            val zc = bytes.sliding(2).count(p =>
              p.length == 2 && ((p(0) & 0xFF) < 128) != ((p(1) & 0xFF) < 128))
            (None, Some(q4(math.sqrt(sq.toDouble / n))), Some(zc), None, None)
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
    """WITH base AS (
      |  SELECT doc_id AS media_id,
      |    ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
      |    list_transform(string_split(text, ''), c -> ord(c)) AS bytes,
      |    greatest(strlen(text), 1) AS n,
      |    CAST(strlen(text) AS INT) AS len
      |  FROM documents
      |)
      |SELECT media_id, mime,
      |  CASE WHEN mime = 'image/png' THEN
      |    floor(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), bytes), (a,b) -> a + b) AS DOUBLE)
      |      / n / 255.0 * 10000) / 10000 END AS img_mean_intensity,
      |  CASE WHEN mime = 'audio/wav' THEN
      |    floor(sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(bytes, b -> (b - 128) * (b - 128))), (a,b) -> a + b) AS DOUBLE)
      |      / n) * 10000) / 10000 END AS audio_rms,
      |  CASE WHEN mime = 'audio/wav' THEN
      |    CAST(len(list_filter(range(len - 1),
      |      i -> (bytes[i + 1] < 128) <> (bytes[i + 2] < 128))) AS INT)
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
