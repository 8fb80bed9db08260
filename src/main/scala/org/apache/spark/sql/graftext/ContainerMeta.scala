package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.multimodal.ContainerProbe

/** Container-structure metadata as native codegen'd expressions over
  * BINARY columns — the decoder-free metadata leg of the MP3/MP4 gap
  * ([[graft.multimodal.ContainerProbe]] has the parsers and the
  * scope/why; part of the SURVEY §7.5 multimodal extension surface,
  * beyond the reference's own operators).
  * `mp3_meta`/`mp4_meta` return a typed struct, or
  * NULL when the payload is not well-formed for the declared scope —
  * never guessed numbers; a curation filter can `WHERE meta IS NULL`
  * to quarantine undecodable rows.
  *
  * The `*TestPayload` expressions are the oracle-side construction:
  * deterministic payloads whose parameters derive from the text's
  * character length, so a DuckDB oracle recomputes every expected
  * metadata field from `strlen` arithmetic alone (the lossy-leg
  * gating pattern — see mm_container_probe).
  *
  * All four inline into whole-stage codegen via static calls (same
  * pattern as [[NgramStats]]): per-row cost is one linear pass over
  * the payload's header bytes, no shuffle, no UDF. */
object ContainerMeta {

  val mp3Type: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bitrate_kbps", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("id3_bytes", IntegerType, nullable = false)))

  val mp4Type: StructType = StructType(Seq(
    StructField("major_brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ticks", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("tracks", IntegerType, nullable = false),
    StructField("handlers", StringType, nullable = false)))

  val ebmlType: StructType = StructType(Seq(
    StructField("doc_type", StringType, nullable = false),
    StructField("timestamp_scale", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("tracks", IntegerType, nullable = false),
    StructField("codecs", StringType, nullable = false)))

  val flacType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("total_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("meta_blocks", IntegerType, nullable = false)))

  val oggType: StructType = StructType(Seq(
    StructField("pages", IntegerType, nullable = false),
    StructField("streams", IntegerType, nullable = false),
    StructField("bos_pages", IntegerType, nullable = false),
    StructField("eos_pages", IntegerType, nullable = false),
    StructField("last_granule", LongType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("codecs", StringType, nullable = false)))

  def flacRow(data: Array[Byte]): InternalRow =
    ContainerProbe.parseFlac(data) match {
      case Some(m) => new GenericInternalRow(Array[Any](
        m.sampleRate, m.channels, m.bitsPerSample, m.totalSamples,
        m.durationMs, m.metaBlocks))
      case None => null
    }

  def oggRow(data: Array[Byte]): InternalRow =
    ContainerProbe.parseOgg(data) match {
      case Some(m) => new GenericInternalRow(Array[Any](
        m.pages, m.streams, m.bosPages, m.eosPages, m.lastGranule,
        m.payloadBytes, UTF8String.fromString(m.codecs.mkString(","))))
      case None => null
    }

  def flacPayload(text: UTF8String): Array[Byte] = {
    val L = text.numChars()
    ContainerProbe.encodeFlac(
      sampleRate = Array(44100, 48000, 32000, 22050)(L % 4),
      channels = L % 8 + 1,
      bitsPerSample = Array(8, 16, 24)(L % 3),
      totalSamples = (L + 41L) * 1000L,
      padLen = L % 19)
  }

  def oggPayload(text: UTF8String): Array[Byte] = {
    val L = text.numChars()
    ContainerProbe.encodeOgg(
      streams = L % 2 + 1,
      pagesPerStream = L % 5 + 2,
      payloadPerPage = L % 17 + 1,
      granuleStep = (L % 9 + 1) * 960L,
      codecs = (0 until L % 2 + 1).map(s =>
        Seq("opus", "vorbis", "flac")((L + s) % 3)))
  }

  def ebmlRow(data: Array[Byte]): InternalRow =
    ContainerProbe.parseEbml(data) match {
      case Some(m) => new GenericInternalRow(Array[Any](
        UTF8String.fromString(m.docType), m.timestampScale, m.durationMs,
        m.tracks, UTF8String.fromString(m.codecs.mkString(","))))
      case None => null
    }

  def ebmlPayload(text: UTF8String): Array[Byte] = {
    val L = text.numChars()
    ContainerProbe.encodeEbml(
      docType = if (L % 2 == 0) "webm" else "matroska",
      timestampScale = 500000 * (L % 3 + 1),
      duration = ((L + 3) * 250).toDouble,
      codecs = (0 until L % 4).map(i => if (i % 2 == 0) "V_VP9" else "A_OPUS"))
  }

  /** Static kernel: parse or NULL (shared by eval and codegen). */
  def mp3Row(data: Array[Byte]): InternalRow =
    ContainerProbe.parseMp3(data) match {
      case Some(m) => new GenericInternalRow(Array[Any](
        m.sampleRate, m.bitrateKbps, m.frames, m.durationMs, m.id3Bytes))
      case None => null
    }

  def mp4Row(data: Array[Byte]): InternalRow =
    ContainerProbe.parseMp4(data) match {
      case Some(m) => new GenericInternalRow(Array[Any](
        UTF8String.fromString(m.majorBrand), m.timescale, m.durationTicks,
        m.durationMs, m.tracks, UTF8String.fromString(m.handlers.mkString(","))))
      case None => null
    }

  /** Test-payload parameter derivation from the text's char length —
    * mirrored literally by the DuckDB oracle's strlen arithmetic. */
  def mp3Payload(text: UTF8String): Array[Byte] = {
    val L = text.numChars()
    ContainerProbe.encodeMp3(
      nFrames = L % 7 + 2, bitrateIdx = L % 14 + 1,
      srIdx = L % 3, id3Pad = L % 33)
  }

  def mp4Payload(text: UTF8String): Array[Byte] = {
    val L = text.numChars()
    ContainerProbe.encodeMp4(
      majorBrand = "isom", timescale = 600 * (L % 4 + 1),
      durationTicks = (L + 7L) * 125L,
      handlers = (0 until (L % 3 + 1)).map(i => if (i % 2 == 0) "vide" else "soun"))
  }

  private def structExpr(ev: ExprCode, fn: String)(a: String): String =
    s"""${ev.value} = org.apache.spark.sql.graftext.ContainerMeta.$fn($a);
       |${ev.isNull} = ${ev.value} == null;""".stripMargin

  case class Mp3Meta(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = mp3Type
    override def nullable: Boolean = true
    override def prettyName: String = "mp3_meta"
    override def nullSafeEval(input: Any): Any =
      mp3Row(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, structExpr(ev, "mp3Row"))
    override protected def withNewChildInternal(newChild: Expression): Mp3Meta =
      copy(child = newChild)
  }

  case class Mp4Meta(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = mp4Type
    override def nullable: Boolean = true
    override def prettyName: String = "mp4_meta"
    override def nullSafeEval(input: Any): Any =
      mp4Row(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, structExpr(ev, "mp4Row"))
    override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
      copy(child = newChild)
  }

  case class Mp3TestPayload(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "mp3_test_payload"
    override def nullSafeEval(input: Any): Any =
      mp3Payload(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graftext.ContainerMeta.mp3Payload($a);")
    override protected def withNewChildInternal(newChild: Expression): Mp3TestPayload =
      copy(child = newChild)
  }

  case class Mp4TestPayload(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "mp4_test_payload"
    override def nullSafeEval(input: Any): Any =
      mp4Payload(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graftext.ContainerMeta.mp4Payload($a);")
    override protected def withNewChildInternal(newChild: Expression): Mp4TestPayload =
      copy(child = newChild)
  }

  case class EbmlMeta(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = ebmlType
    override def nullable: Boolean = true
    override def prettyName: String = "ebml_meta"
    override def nullSafeEval(input: Any): Any =
      ebmlRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, structExpr(ev, "ebmlRow"))
    override protected def withNewChildInternal(newChild: Expression): EbmlMeta =
      copy(child = newChild)
  }

  case class EbmlTestPayload(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "ebml_test_payload"
    override def nullSafeEval(input: Any): Any =
      ebmlPayload(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graftext.ContainerMeta.ebmlPayload($a);")
    override protected def withNewChildInternal(newChild: Expression): EbmlTestPayload =
      copy(child = newChild)
  }

  case class FlacMeta(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = flacType
    override def nullable: Boolean = true
    override def prettyName: String = "flac_meta"
    override def nullSafeEval(input: Any): Any =
      flacRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, structExpr(ev, "flacRow"))
    override protected def withNewChildInternal(newChild: Expression): FlacMeta =
      copy(child = newChild)
  }

  case class OggMeta(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = oggType
    override def nullable: Boolean = true
    override def prettyName: String = "ogg_meta"
    override def nullSafeEval(input: Any): Any =
      oggRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, structExpr(ev, "oggRow"))
    override protected def withNewChildInternal(newChild: Expression): OggMeta =
      copy(child = newChild)
  }

  case class FlacTestPayload(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "flac_test_payload"
    override def nullSafeEval(input: Any): Any =
      flacPayload(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graftext.ContainerMeta.flacPayload($a);")
    override protected def withNewChildInternal(newChild: Expression): FlacTestPayload =
      copy(child = newChild)
  }

  case class OggTestPayload(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "ogg_test_payload"
    override def nullSafeEval(input: Any): Any =
      oggPayload(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graftext.ContainerMeta.oggPayload($a);")
    override protected def withNewChildInternal(newChild: Expression): OggTestPayload =
      copy(child = newChild)
  }

  def ebmlMeta(data: Column): Column =
    ExpressionUtils.column(EbmlMeta(ExpressionUtils.expression(data)))
  def ebmlTestPayload(text: Column): Column =
    ExpressionUtils.column(EbmlTestPayload(ExpressionUtils.expression(text)))

  def flacMeta(data: Column): Column =
    ExpressionUtils.column(FlacMeta(ExpressionUtils.expression(data)))
  def flacTestPayload(text: Column): Column =
    ExpressionUtils.column(FlacTestPayload(ExpressionUtils.expression(text)))
  def oggMeta(data: Column): Column =
    ExpressionUtils.column(OggMeta(ExpressionUtils.expression(data)))
  def oggTestPayload(text: Column): Column =
    ExpressionUtils.column(OggTestPayload(ExpressionUtils.expression(text)))

  def mp3Meta(data: Column): Column =
    ExpressionUtils.column(Mp3Meta(ExpressionUtils.expression(data)))
  def mp4Meta(data: Column): Column =
    ExpressionUtils.column(Mp4Meta(ExpressionUtils.expression(data)))
  def mp3TestPayload(text: Column): Column =
    ExpressionUtils.column(Mp3TestPayload(ExpressionUtils.expression(text)))
  def mp4TestPayload(text: Column): Column =
    ExpressionUtils.column(Mp4TestPayload(ExpressionUtils.expression(text)))
}
