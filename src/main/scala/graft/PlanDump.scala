package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Construction-plan dump utility (r18): the ANN/audit queries are
  * served from staged localCheckpoint frames, so `graft.Explain` on
  * the query surface shows only the checkpoint scan — this main dumps
  * `explain("formatted")` of the UNDERLYING construction DataFrames
  * (the plans the stage build actually runs), which is where the
  * optimization evidence lives. Usage:
  *   runMain graft.PlanDump <outDir> <tag> [sfDir]
  * writes <name>_construction_<tag>.txt per entry. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val entries: Seq[(String, () => DataFrame)] = Seq(
      "pq" -> (() => graft.sim.ProductQuantAnn.pqTopK(emb)),
      "ivfpq" -> (() => graft.sim.IvfPqAnn.ivfPqTopK(emb)),
      "neardup" -> (() => graft.sim.EmbeddingSim.nearDupPairs(emb)),
      "lsh" -> (() => graft.sim.EmbeddingSim.lshTopK(emb)),
      "ewma_audit" -> (() => graft.ops.EwmaScan.auditMaxima(spark, dir)),
      // r18 batch 2: the minhash signature/banding and the 2-gram
      // repetition constructions (their query-surface dumps are
      // staged-checkpoint scans)
      "minhash_pairs" -> (() => graft.dedup.NearDup.minhashPairs(
        graft.sources.Tables.documents(spark, dir))),
      "repetition" -> (() => graft.text.QualityFilters.repetitionProfileQuery(spark, dir)),
      "bigram_lm" -> (() => graft.text.QualityFilters.bigramLmScoresQuery(spark, dir)))
    entries.foreach { case (name, f) =>
      val df = f()
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos)) { df.explain("formatted") }
      val w = new java.io.PrintWriter(s"$outDir/${name}_construction_$tag.txt")
      try w.write(bos.toString) finally w.close()
      System.err.println(s"[plandump] $name -> ${bos.size()} bytes")
    }
    spark.stop()
  }
}
