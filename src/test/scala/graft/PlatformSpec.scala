package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.ops.Incremental
import graft.sink.ServingSink
import graft.sources.Tables
import graft.streaming.StreamingEvents

/** Multimodal plumbing, streaming facade, serving sink, incremental
  * wrapper — the platform pieces around the query library. */
class PlatformSpec extends AnyFunSuite {
  import TestSession._

  test("multimodal: features preserve rows, histogram normalized, sha stable") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf)).cache()
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() === media.count())
    val r = feats.head()
    assert(r.histogram.length === 16)
    assert(math.abs(r.histogram.sum - 1.0) < 0.01)
    assert(r.content_sha.matches("[0-9a-f]{64}"))
    assert(r.width >= 1 && r.height >= 1)
    // determinism: second run produces identical shas
    val again = Multimodal.extractFeatures(media)
    assert(feats.toDF().select("media_id", "content_sha")
      .except(again.toDF().select("media_id", "content_sha")).count() === 0)
  }

  test("multimodal: PNG and WAV round trips are lossless — decoded samples == source construction") {
    import graft.multimodal.Multimodal.MediaCodec
    val text = "the quick brown fox jumps over the lazy dog 0123456789"
    val px = Multimodal.pixelBytes(text)
    // PNG: javax.imageio parse recovers dimensions and exact samples
    val png = MediaCodec.encodePng(px)
    assert(new String(png.slice(1, 4), "US-ASCII") === "PNG") // real container
    val imgFeat = MediaCodec.decodeReal(
      Multimodal.MediaRecord(1L, "u", "image/png", "image", png))
    assert(imgFeat.width === Multimodal.ImgW && imgFeat.height === Multimodal.ImgH)
    val pxSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(px).map("%02x".format(_)).mkString
    assert(imgFeat.content_sha === pxSha)
    // WAV: javax.sound.sampled parse recovers format and exact samples
    val wav = MediaCodec.encodeWav(px)
    assert(new String(wav.take(4), "US-ASCII") === "RIFF") // real container
    val (samples, fmt) = MediaCodec.decodeWav(wav)
    assert(samples.toSeq === px.toSeq)
    assert(fmt.getChannels === 1 && fmt.getSampleSizeInBits === 8)
    val audFeat = MediaCodec.decodeReal(
      Multimodal.MediaRecord(2L, "u", "audio/wav", "audio", wav))
    assert(audFeat.content_sha === pxSha) // same decoded-content identity
    assert(audFeat.byte_len === px.length)
  }

  test("multimodal: GIF round trip is lossless — decoded frames == padded chunk construction") {
    import graft.multimodal.Multimodal.MediaCodec
    val text = "x" * 300 + "the quick brown fox"
    val rasters = Multimodal.videoFrameRasters(text)
    assert(rasters.length === 2)
    assert(rasters.last.drop(text.length - Multimodal.FrameLen).forall(_ == ' '.toByte))
    val gif = MediaCodec.encodeGif(rasters)
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8")) // real container
    val (w, h, frames) = MediaCodec.decodeGif(gif)
    assert(w === Multimodal.ImgW && h === Multimodal.ImgH)
    assert(frames.length === rasters.length)
    frames.zip(rasters).foreach { case (f, r) => assert(f.toSeq === r.toSeq) }
    // decodeReal video leg: identity over the concatenated DECODED samples
    val feat = MediaCodec.decodeReal(Multimodal.MediaRecord(3L, "u", "image/gif", "video", gif))
    val all = rasters.flatten.toArray
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(all).map("%02x".format(_)).mkString
    assert(feat.content_sha === sha)
    assert(feat.byte_len === 2 * Multimodal.FrameLen)
    assert(feat.width === Multimodal.ImgW && feat.height === Multimodal.ImgH)
  }

  test("multimodal: frame sampling only from video kind, strided") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf))
    val frames = Multimodal.sampleFrames(media).cache()
    val videoIds = media.filter(col("kind") === "video")
      .select(col("media_id")).distinct()
    assert(frames.select("media_id").distinct()
      .join(videoIds, Seq("media_id"), "left_anti").count() === 0)
    assert(frames.filter(col("frame_index") % 4 =!= 0).count() === 0)
  }

  test("multimodal: sniffed container agrees with the mime label on every row") {
    import graft.multimodal.Multimodal.MediaCodec
    // the mime column must tell the truth about the payload: sniff the
    // magic bytes of every row and require label↔content agreement
    // (the r8 defect was video rows labeled video/mp4 over GIF bytes)
    val decoded = Multimodal.decodeAll(
      Multimodal.mediaTable(Tables.documents(spark, sf))).toDF().cache()
    val mimeOf = Map("png" -> "image/png", "wav" -> "audio/wav", "gif" -> "image/gif")
    val disagree = decoded.filter(
      col("mime") =!= coalesce(element_at(
        typedLit(mimeOf), col("container_format")), lit("UNSNIFFABLE")))
    assert(disagree.count() === 0, "mime label must match sniffed container")
    // kind is the modality, independent of container
    assert(decoded.filter(col("kind") === "video" and col("container_format") =!= "gif")
      .count() === 0)
    // sniffer unit pins: each codec's output identifies as itself
    val px = Multimodal.pixelBytes("sniff me")
    assert(MediaCodec.sniffContainer(MediaCodec.encodePng(px)) === "png")
    assert(MediaCodec.sniffContainer(MediaCodec.encodeWav(px)) === "wav")
    assert(MediaCodec.sniffContainer(MediaCodec.encodeJpeg(px)) === "jpeg")
    assert(MediaCodec.sniffContainer(
      MediaCodec.encodeGif(Seq(px))) === "gif")
    assert(MediaCodec.sniffContainer("not a container".getBytes) === "unknown")
  }

  test("multimodal: decode-once frame reproduces the per-query decode results") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf)).cache()
    val decoded = Multimodal.decodeAll(media).toDF().cache()
    // features projection == direct extractFeatures
    val viaFrame = Multimodal.featuresFrom(decoded)
      .select("media_id", "content_sha", "width", "height")
    val direct = Multimodal.extractFeatures(media).toDF()
      .select("media_id", "content_sha", "width", "height")
    assert(viaFrame.except(direct).count() === 0)
    assert(direct.except(viaFrame).count() === 0)
    // frame digests in the decoded frame == re-decoded strided frames
    val viaDigests = Multimodal.framesFrom(decoded, 4)
    assert(viaDigests.count() > 0)
    assert(viaDigests.filter(col("frame_bytes") =!= Multimodal.FrameLen).count() === 0)
  }

  test("multimodal: downsample — image block means and audio envelope replay the construction") {
    val decoded = Multimodal.decodeAll(
      Multimodal.mediaTable(Tables.documents(spark, sf))).toDF().cache()
    val ds = Multimodal.downsampleFrom(decoded).cache()
    // one row per image/audio medium, every cell in [0,1]
    assert(ds.count() === decoded.filter(col("kind").isin("image", "audio")).count())
    val cells = (0 until 16).map(i => f"d_$i%02d")
    cells.foreach(c =>
      assert(ds.filter(col(c) < 0 or col(c) > 1).count() === 0, c))
    // hand-pinned: a constant raster downsamples to the constant
    val constPx = Array.fill(256)('A'.toByte) // 65
    val thumb = Multimodal.MediaCodec.blockMeans4x4(constPx, 16, 16)
    val expect = math.floor(65.0 / 255.0 * 10000) / 10000
    assert(thumb.length === 16 && thumb.forall(_ === expect))
    // block membership: pixel (row, col) lands in block (row/4)*4+col/4
    val px = Array.tabulate(256)(i => if (i < 4 && i / 16 == 0) 100.toByte else 0.toByte)
    val t2 = Multimodal.MediaCodec.blockMeans4x4(px, 16, 16)
    assert(t2(0) > 0 && t2.drop(1).forall(_ === 0.0))
    // envelope windows are consecutive 16-sample runs
    val env = Multimodal.MediaCodec.envelope16(
      Array.tabulate(256)(i => if (i < 16) 100.toByte else 0.toByte))
    assert(env(0) > 0 && env.drop(1).forall(_ === 0.0))
    // non-canonical geometry degrades to empty, not garbage
    assert(Multimodal.MediaCodec.blockMeans4x4(Array.fill(64)(0.toByte), 8, 8).isEmpty)
  }

  test("multimodal: JPEG round trip stays within the error envelope; corruption is caught") {
    import graft.multimodal.Multimodal.MediaCodec
    val gate = Multimodal.jpegEnvelope(Tables.documents(spark, sf)).cache()
    assert(gate.count() > 0)
    assert(gate.filter(!col("within_envelope")).count() === 0,
      "every image-kind doc must round-trip JPEG within the envelope")
    assert(gate.filter(col("width") =!= 16 or col("height") =!= 16).count() === 0)
    // envelope calibration: measure the actual max error on a raster
    // and require real headroom under the pinned tolerance
    val px = Multimodal.pixelBytes("The quick brown fox jumps over the lazy dog! " * 8)
    val (w, h, dec) = MediaCodec.decodeGrayImage(MediaCodec.encodeJpeg(px))
    assert(w === 16 && h === 16)
    val maxErr = px.zip(dec).map { case (a, b) =>
      math.abs((a & 0xFF) - (b & 0xFF)) }.max
    assert(maxErr > 0, "JPEG at q=0.95 on a text raster is genuinely lossy")
    assert(maxErr <= Multimodal.JpegMaxAbsErr,
      s"calibration: observed $maxErr vs envelope ${Multimodal.JpegMaxAbsErr}")
    // negative 1: corrupted payload must not decode quietly
    val jpeg = MediaCodec.encodeJpeg(px)
    val truncated = jpeg.take(8)
    intercept[Throwable] { MediaCodec.decodeGrayImage(truncated) }
    // negative 2: the gate has teeth — comparing against the WRONG
    // source raster (offset by 128) lands far outside the envelope
    val wrong = px.map(b => ((b + 128) & 0xFF).toByte)
    val wrongErr = wrong.zip(dec).map { case (a, b) =>
      math.abs((a & 0xFF) - (b & 0xFF)) }.max
    assert(wrongErr > Multimodal.JpegMaxAbsErr)
  }

  test("streaming: AvailableNow backlog run matches batch transform") {
    val tmp = Files.createTempDirectory("graft_stream_").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(s"$tmp/in")
    val stream = StreamingEvents.readStream(spark, s"$tmp/in")
    assert(stream.isStreaming)
    val q = StreamingEvents.backlogWriter(stream)
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("stream_out").start()
    q.awaitTermination(120000)
    val got = spark.table("stream_out")
      .select("window_start", "window_end", "event_type", "event_count", "window_revenue")
    // Append mode only emits windows closed by the final watermark
    // (max event ts - 1h horizon); compare that closed subset.
    val maxTs = Tables.events(spark, sf).agg(max(col("ts"))).first().getTimestamp(0)
    val horizon = date_format(
      lit(maxTs).cast("timestamp") - expr("INTERVAL 1 HOUR"), "yyyy-MM-dd HH:mm:ss")
    val expected = StreamingEvents.hourlyAgg(Tables.events(spark, sf))
      .filter(col("window_end") <= horizon)
      .select("window_start", "window_end", "event_type", "event_count", "window_revenue")
    assert(got.count() === expected.count())
    assert(got.except(expected).count() === 0)
  }

  test("foreachBatch incremental serving: compacted partials match the batch mart") {
    val tmp = Files.createTempDirectory("graft_fb_").toString
    // two separate input loads -> at least two batches of partials
    val ev = Tables.events(spark, sf)
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    ev.filter(col("ts") <= cut).write.mode("overwrite").parquet(s"$tmp/in")
    val w1 = StreamingEvents.incrementalDailySalesWriter(
        StreamingEvents.readStream(spark, s"$tmp/in"), s"$tmp/gold")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    w1.awaitTermination(120000)
    ev.filter(col("ts") > cut).write.mode("append").parquet(s"$tmp/in")
    val w2 = StreamingEvents.incrementalDailySalesWriter(
        StreamingEvents.readStream(spark, s"$tmp/in"), s"$tmp/gold")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    w2.awaitTermination(120000)
    val compacted = StreamingEvents.compactDailySales(spark, s"$tmp/gold", s"$tmp/serving")
    val expected = SparkEntry.queries("gold_daily_sales")(spark, sf)
    assert(compacted.count() === expected.count())
    // additive metrics fold exactly
    val j = compacted.as("c").join(expected.as("e"), Seq("event_date")).cache()
    assert(j.filter(col("c.total_events") =!= col("e.total_events")).count() === 0)
    assert(j.filter(col("c.purchase_count") =!= col("e.purchase_count")).count() === 0)
    assert(j.filter(abs(col("c.total_revenue") - col("e.total_revenue")) > 0.001).count() === 0)
    // sketch-merged distincts land within HLL error of the exact counts
    assert(j.filter(abs(col("c.unique_users") - col("e.unique_users")) >
      col("e.unique_users") * 0.05 + 3).count() === 0)
  }

  test("streaming incremental dedup: two deliveries, batch-parity with the index op") {
    import graft.streaming.StreamingDedup
    import graft.dedup.NearDup
    val tmp = Files.createTempDirectory("graft_sdd_").toString
    val docs = Tables.documents(spark, sf)
    val d1 = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val d2 = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    d1.write.mode("overwrite").parquet(s"$tmp/in")
    val w1 = StreamingDedup.incrementalDedupWriter(
        StreamingDedup.readDocumentsStream(spark, s"$tmp/in"),
        s"$tmp/index", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    w1.awaitTermination(120000)
    d2.write.mode("append").parquet(s"$tmp/in")
    val w2 = StreamingDedup.incrementalDedupWriter(
        StreamingDedup.readDocumentsStream(spark, s"$tmp/in"),
        s"$tmp/index", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    w2.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/out").cache()
    // delivery 1 ran against an empty index: one survivor per distinct fingerprint
    val b0 = out.filter(col("batch_id") === 0)
    assert(b0.count() === NearDup.exactGroups(d1).count())
    // delivery 2's survivors equal the BATCH incremental-dedup operator
    val b1 = out.filter(col("batch_id") > 0)
      .select("doc_id", "fingerprint", "batch_copies")
    val expected = NearDup.incrementalDedup(d1, d2)
    assert(b1.count() === expected.count())
    assert(b1.except(expected).count() === 0)
    // the index holds exactly every emitted fingerprint, once
    val idx = spark.read.parquet(s"$tmp/index")
    assert(idx.count() === idx.distinct().count())
    assert(idx.count() === out.count())
  }

  test("streaming minhash near-dup dedup: two deliveries, batch-parity, dedup'd index") {
    import graft.streaming.StreamingDedup
    import graft.dedup.NearDup
    val tmp = Files.createTempDirectory("graft_smh_").toString
    val docs = Tables.documents(spark, sf)
    val d1 = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val d2 = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    def run(): Unit = {
      val w = StreamingDedup.minhashDedupWriter(
          StreamingDedup.readDocumentsStream(spark, s"$tmp/in"),
          s"$tmp/sets", s"$tmp/bands", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt").start()
      w.awaitTermination(180000)
    }
    d1.write.mode("overwrite").parquet(s"$tmp/in")
    run()
    d2.write.mode("append").parquet(s"$tmp/in")
    run()
    val out = spark.read.parquet(s"$tmp/out").cache()
    // delivery 1 ran against an empty index: its flags are exactly the
    // batch-oriented minhash pairs WITHIN d1
    val b0 = out.filter(col("batch_id") === 0)
      .select("doc_id", "dup_of", "src", "jaccard")
    val d1Expected = NearDup.incrementalMinhashDedup(d1.limit(0), d1)
    assert(b0.count() === d1Expected.count())
    assert(b0.except(d1Expected).count() === 0)
    // delivery 2's flags equal the batch operator against d1's
    // SURVIVOR corpus (the index never admitted d1's dups)
    val d1Survivors = d1.join(
      d1Expected.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val b1 = out.filter(col("batch_id") > 0)
      .select("doc_id", "dup_of", "src", "jaccard")
    val d2Expected = NearDup.incrementalMinhashDedup(d1Survivors, d2)
    assert(b1.count() === d2Expected.count())
    assert(b1.except(d2Expected).count() === 0)
    // the state holds each surviving doc once, bands ≍ sets × 4
    val sets = spark.read.parquet(s"$tmp/sets")
    assert(sets.select("doc_id").distinct().count() === sets.count())
    assert(spark.read.parquet(s"$tmp/bands").count() === sets.count() * 4)
  }

  test("dropDuplicatesWithinWatermark suppresses replayed duplicates") {
    val tmp = Files.createTempDirectory("graft_ddw_").toString
    val ev = Tables.events(spark, sf)
    // replay: the same events land twice (duplicate event_ids)
    ev.write.mode("overwrite").parquet(s"$tmp/in")
    ev.write.mode("append").parquet(s"$tmp/in")
    val q = StreamingEvents.deduppedWithinWatermark(
        StreamingEvents.readStream(spark, s"$tmp/in"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("ddw_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("ddw_out").count() === ev.count())
    assert(spark.table("ddw_out").select("event_id").distinct().count() === ev.count())
  }

  test("runtime bloom filter prunes a selective fact-fact join") {
    val conf = spark.conf
    val old = (conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "true"),
      conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB"),
      conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test-scale scans are tiny; drop the application-side threshold
      // AND disable auto-broadcast (the injection rule skips joins it
      // could broadcast) so the rewrite fires like on a 100 TB fact join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter_agg"),
        "expected a runtime bloom filter on the probe side")
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", old._1)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", old._2)
      conf.set("spark.sql.autoBroadcastJoinThreshold", old._3)
    }
  }

  test("streaming session_window: emitted sessions agree with batch") {
    val tmp = Files.createTempDirectory("graft_ssw_").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(s"$tmp/in")
    val fmt = "yyyy-MM-dd HH:mm:ss"
    val stream = StreamingEvents.readStream(spark, s"$tmp/in")
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("session_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), fmt).as("session_start"),
        date_format(col("session_window.end"), fmt).as("session_end"),
        col("session_events"))
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("ssw_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val got = spark.table("ssw_out").cache()
    val batch = SparkEntry.queries("q_session_windows")(spark, sf)
      .select("user_id", "session_start", "session_end", "session_events").cache()
    // append mode emits only watermark-closed sessions: every emitted
    // session must exist verbatim in the batch result, and everything
    // comfortably before the final watermark must have been emitted
    assert(got.count() > 0)
    assert(got.except(batch).count() === 0)
    val maxTs = Tables.events(spark, sf).agg(max(col("ts"))).first().getTimestamp(0)
    val safeHorizon = date_format(
      lit(maxTs).cast("timestamp") - expr("INTERVAL 65 MINUTES"), fmt)
    assert(batch.filter(col("session_end") <= safeHorizon)
      .except(got).count() === 0)
  }

  test("stream-static broadcast enrichment matches the batch formulation") {
    val tmp = Files.createTempDirectory("graft_ssd_").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(s"$tmp/in")
    val part = Tables.part(spark, sf)
    val q = StreamingEvents.enrichedPurchases(
        StreamingEvents.readStream(spark, s"$tmp/in"), part)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("ssd_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("ssd_out")
    val batch = StreamingEvents.enrichedPurchases(Tables.events(spark, sf), part)
    assert(got.count() === batch.count())
    assert(got.except(batch).count() === 0)
    // enrichment really happened: some rows carry dimension values
    assert(got.filter(col("p_name").isNotNull).count() > 0)
  }

  test("stream-stream interval join matches the batch formulation") {
    val tmp = Files.createTempDirectory("graft_ssj_").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(s"$tmp/in")
    val stream = StreamingEvents.readStream(spark, s"$tmp/in")
    val q = StreamingEvents.purchaseSignupJoin(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("ssj_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val got = spark.table("ssj_out")
    val batch = StreamingEvents.purchaseSignupJoin(Tables.events(spark, sf))
    // inner interval join: a single AvailableNow pass emits complete results
    assert(got.count() === batch.count())
    assert(got.except(batch).count() === 0)
  }

  test("serving sink: monthly partition dirs, rows sorted within files") {
    val tmp = Files.createTempDirectory("graft_sink_").toString
    val daily = SparkEntry.queries("gold_daily_sales")(spark, sf)
    ServingSink.writeDateMart(daily, s"$tmp/daily", "event_date")
    val dirs = new java.io.File(s"$tmp/daily").listFiles()
      .filter(_.getName.startsWith("part_month=")).map(_.getName)
    assert(dirs.nonEmpty)
    val back = spark.read.parquet(s"$tmp/daily")
    assert(back.count() === daily.count())
    // sort-within-file: per input split, event_date must be nondecreasing
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    val viol = back
      .withColumn("prev", lag(col("event_date"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > col("event_date"))
    assert(viol.count() === 0)
  }

  test("incremental appendNew: merge mode excludes existing keys") {
    val ev = Tables.events(spark, sf)
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    val target = ev.filter(col("ts") <= cut)
    // overlap: source includes some already-present rows
    val source = ev.filter(col("ts") > lit("2024-01-10 00:00:00").cast("timestamp"))
    val appended = Incremental.pastWatermark(source, target, "ts", "ts")
    assert(appended.filter(col("ts") <= cut).count() === 0)
    val merged = Incremental.appendNew(source, target, "ts", Seq("event_id"), merge = true)
    assert(merged.join(target, Seq("event_id"), "inner").count() === 0)
    // full rebuild equivalence: target ∪ appended == all events
    assert(target.count() + appended.count() === ev.count())
  }

  test("incremental rebuild diff: no spurious rows, late drops are exactly the held-back slice") {
    import graft.ops.IncrementalRebuild
    val diff = SparkEntry.queries("incremental_rebuild_diff")(spark, sf).cache()
    // idempotence: the re-delivered 3-day overlap never double-appends
    assert(diff.filter(col("diff_kind") === "spurious").count() === 0)
    // the wart is exactly the late slice: event_id % 20 == 0, before the split
    val late = diff.filter(col("diff_kind") === "late_dropped")
    assert(late.count() > 0)
    assert(late.filter(pmod(col("event_id"), lit(20)) =!= 0).count() === 0)
    assert(late.filter(col("event_time_str") >= IncrementalRebuild.SplitTs).count() === 0)
    // and nothing else from that slice survives into the incremental table
    val inc = IncrementalRebuild.incrementalSilver(Tables.events(spark, sf))
    val silverLate = graft.marts.SilverEvents.build(Tables.events(spark, sf))
      .filter(pmod(col("event_id"), lit(20)) === 0 &&
        col("event_time_str") < IncrementalRebuild.SplitTs)
    assert(late.count() === silverLate.count())
    assert(inc.join(late.select("event_unique_id"), Seq("event_unique_id"), "left_semi")
      .count() === 0)
  }

  test("merge upsert: update, insert, passthrough, and source-NULL-wins semantics") {
    import spark.implicits._
    import graft.ops.MergeUpsert
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val source = Seq((2L, "B2", 99.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val merged = MergeUpsert.upsert(target, source, Seq("k"))
      .orderBy("k").collect()
    assert(merged.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // UPDATE SET * semantics: a NULL in a matched source row overwrites
    val srcNull = Seq((1L, null.asInstanceOf[String], 11.0)).toDF("k", "name", "v")
    val m2 = MergeUpsert.upsert(target, srcNull, Seq("k")).orderBy("k").collect()
    assert(m2(0).isNullAt(1) && m2(0).getDouble(2) === 11.0)
    assert(m2.length === 3)
  }

  test("z-order layout keeps per-file ranges tight on BOTH columns") {
    val tmp = Files.createTempDirectory("graft_z_").toString
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    // linear: sorted by the first column only
    li.repartitionByRange(16, col("l_partkey")).sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(s"$tmp/linear")
    ServingSink.writeZOrdered(li, s"$tmp/zorder", "l_partkey", "l_suppkey")
    def meanSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("span"))
      spans.agg(avg(col("span"))).head().getDouble(0)
    }
    // same file count, same rows
    assert(spark.read.parquet(s"$tmp/zorder").count() === li.count())
    // the second column's per-file range collapses under z-order
    val linearB = meanSpan(s"$tmp/linear", "l_suppkey")
    val zB = meanSpan(s"$tmp/zorder", "l_suppkey")
    assert(zB < linearB * 0.7, s"z-order span $zB not tighter than linear $linearB")
    // and the first column's range stays bounded (not degenerate)
    val fullA = li.agg(max(col("l_partkey")) - min(col("l_partkey"))).head().getLong(0)
    assert(meanSpan(s"$tmp/zorder", "l_partkey") < fullA * 0.8)
  }

  test("jdbc sink: round-trip through embedded Derby") {
    // Derby ships on the Spark classpath and Spark has a DerbyDialect —
    // a real JDBC round-trip, standing in for the ClickHouse target.
    val url = "jdbc:derby:memory:graft_jdbc;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val daily = SparkEntry.queries("gold_daily_sales")(spark, sf)
      .select("event_date", "total_events", "purchase_count", "total_revenue")
    ServingSink.writeJdbc(daily, url, "daily_sales", opts)
    val back = ServingSink.readJdbc(spark, url, "daily_sales", opts)
    assert(back.count() === daily.count())
    assert(back.select("event_date", "total_events", "purchase_count", "total_revenue")
      .except(daily).count() === 0)
  }

  test("snapshots: versioned round-trip, schema evolution, time travel") {
    import graft.sources.Snapshots
    val table = Files.createTempDirectory("graft_snaptest_").toString + "/t"
    val ev = Tables.events(spark, sf).limit(100).cache()
    val v1 = Snapshots.writeSnapshot(ev.select("event_id", "user_id"), table)
    val v2 = Snapshots.writeSnapshot(
      ev.select("event_id", "user_id").withColumn("src", lit("backfill")), table)
    assert((v1, v2) === (1L, 2L))
    // time travel: each version keeps its own schema and content
    assert(Snapshots.readAsOf(spark, table, 1).columns.toSeq === Seq("event_id", "user_id"))
    assert(Snapshots.readAsOf(spark, table, 2).columns.length === 3)
    assert(Snapshots.readLatest(spark, table).count() === 100)
    assert(Snapshots.readAsOf(spark, table, 1)
      .except(ev.select("event_id", "user_id")).count() === 0)
    val snaps = Snapshots.snapshots(spark, table).collect()
    assert(snaps.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(snaps.forall(_.getLong(2) === 100L))
    assert(snaps.map(_.getInt(3)).toSeq === Seq(2, 3))
    // immutability: a version directory is never rewritten
    intercept[Exception] {
      ev.write.mode("errorifexists").parquet(s"$table/v=1")
    }
  }

  test("snapshots diff: CDC change feed between two versions") {
    import graft.sources.Snapshots
    import spark.implicits._
    val table = Files.createTempDirectory("graft_diff_").toString + "/t"
    Snapshots.writeSnapshot(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v"), table)
    // v2: delete id=1, update id=2, keep id=3, insert id=4
    Snapshots.writeSnapshot(
      Seq((2L, "b2", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "name", "v"), table)
    val changes = Snapshots.diff(spark, table, 1L, 2L, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes === Map(1L -> "DELETE", 2L -> "UPDATE", 4L -> "INSERT"))
    // diff against self is empty; reversed diff flips INSERT/DELETE
    assert(Snapshots.diff(spark, table, 2L, 2L, Seq("id")).isEmpty)
    val rev = Snapshots.diff(spark, table, 2L, 1L, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rev === Map(1L -> "INSERT", 2L -> "UPDATE", 4L -> "DELETE"))
  }

  test("snapshots mergeInto: upsert as a new immutable version") {
    import graft.sources.Snapshots
    import spark.implicits._
    val table = Files.createTempDirectory("graft_merge_").toString + "/t"
    Snapshots.writeSnapshot(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v"), table)
    // update id=2, insert id=4
    val v = Snapshots.mergeInto(spark, table,
      Seq((2L, "b2", 25.0), (4L, "d", 40.0)).toDF("id", "name", "v"), Seq("id"))
    assert(v === 2L)
    val now = Snapshots.readLatest(spark, table)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(now === Map(1L -> ("a", 10.0), 2L -> ("b2", 25.0),
      3L -> ("c", 30.0), 4L -> ("d", 40.0)))
    // time travel still sees the pre-merge state
    assert(Snapshots.readAsOf(spark, table, 1).count() === 3)
    val ops = Snapshots.snapshots(spark, table).collect().map(_.getString(1)).toSeq
    assert(ops === Seq("overwrite", "merge"))
  }

  test("incremental: empty target means full load (dbt first-run semantics)") {
    val ev = Tables.events(spark, sf)
    val empty = ev.filter(lit(false))
    assert(Incremental.pastWatermark(ev, empty, "ts", "ts").count() === ev.count())
    assert(Incremental.appendNew(ev, empty, "ts", Seq("event_id")).count() === ev.count())
  }
}
