package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Targeted timing harness for iterating on individual queries without
  * paying for a full Bench board: same session config and
  * materialization discipline as [[Bench]], times each named query
  * `reps` times with stage eviction between repeats (full-work
  * samples, not cache hits).
  *
  * Usage: runMain graft.TimeQueries [sfDir] [reps] query [query ...]
  */
object TimeQueries {
  private def materialize(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(2)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: TimeQueries sfDir reps query...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Mirror Bench's warmup pool so first-consumer staging isn't
    // billed — PER STAGE (r10 verdict #5): one try whose first
    // statement read lineitem silently aborted the WHOLE pool at dirs
    // without TPC tables (target/scale/sf1, exactly where targeted
    // timing is most needed). A stage whose input table the dir lacks
    // is skipped by probe; any other failure is logged; the warmed and
    // skipped sets are printed so "mirrors Bench" is checkable.
    def hasTable(t: String): Boolean =
      new java.io.File(s"$sfDir/$t.parquet").exists()
    val warmed = scala.collection.mutable.ArrayBuffer.empty[String]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    def warm(stage: String, needs: Seq[String])(body: => Unit): Unit =
      if (!needs.forall(hasTable)) skipped += stage
      else try { body; warmed += stage }
      catch { case scala.util.control.NonFatal(e) =>
        skipped += stage
        // stderr like Bench's warmup failures — stdout stays the
        // parseable timing stream (r11 ADVICE)
        System.err.println(s"[time] warmup stage $stage FAILED: ${e.getMessage}")
      }
    warm("lineitem_listing", Seq("lineitem")) {
      graft.sources.Tables.lineitem(spark, sfDir).count(); () }
    warm("silver_events", Seq("events")) {
      materialize(SparkEntry.queries("silver_events")(spark, sfDir)) }
    Seq("dedup_ngram_jaccard", "dedup_clusters",
        "dedup_minhash_lsh", "dedup_simhash").foreach(q =>
      warm(q, Seq("documents")) {
        materialize(SparkEntry.queries(q)(spark, sfDir)) })
    warm("mm_media_meta", Seq("documents")) {
      materialize(SparkEntry.queries("mm_media_meta")(spark, sfDir)) }
    // r18 added gold_daily staging to Bench's warmup; mirror it here so
    // targeted timings of the ~29 staged-mart consumers match the board
    warm("gold_daily_staged", Seq("events")) {
      SparkEntry.stageGoldDaily(spark, sfDir); () }
    // r19: mirror Bench's curation-verdict staging (3 consumers)
    warm("curation_verdicts", Seq("documents")) {
      materialize(SparkEntry.queries("text_curation_verdicts")(spark, sfDir)) }
    System.err.println(s"[time] warmed: ${warmed.mkString(", ")}" +
      (if (skipped.nonEmpty) s"; skipped (missing inputs): ${skipped.mkString(", ")}" else ""))
    names.foreach { name =>
      (1 to reps).foreach { i =>
        val before = SparkEntry.stageNames(spark, sfDir)
        val t0 = System.nanoTime()
        materialize(SparkEntry.queries(name)(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        SparkEntry.evictStages(spark, sfDir,
          SparkEntry.stageNames(spark, sfDir) -- before)
        println(f"[time] $name%-36s rep$i $sec%8.2f s")
      }
    }
    spark.stop()
  }
}
