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
    // mirror Bench's warmup pool so first-consumer staging isn't billed
    try {
      graft.sources.Tables.lineitem(spark, sfDir).count()
      Seq("silver_events", "dedup_ngram_jaccard", "dedup_clusters",
          "dedup_minhash_lsh", "dedup_simhash", "mm_media_meta")
        .foreach(q => materialize(SparkEntry.queries(q)(spark, sfDir)))
    } catch { case _: Throwable => }
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
