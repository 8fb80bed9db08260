package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonlShards

/** JSONL interchange: byte-exact round trip through the hostile
  * corners of JSON string encoding, and the FAILFAST ingest
  * contract. */
class JsonlShardsSpec extends AnyFunSuite {
  import TestSession._

  test("round trip preserves hostile text byte-for-byte") {
    import spark.implicits._
    // newlines, quotes, backslashes, tabs, control chars, non-BMP
    // unicode, empty string — everything JSONL encoding must escape
    val nasty = Seq(
      (1L, "line one\nline two\r\nthree", "en", "web", 23L),
      (2L, "quote \" backslash \\ slash /", "en", "web", 27L),
      (3L, "tab\there ctrl done", "en", "books", 19L),
      (4L, "emoji 😀 CJK 中文 accents éè", "zh", "web", 20L),
      (5L, "", "en", "empty", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("jsonl_spec_").toString
    JsonlShards.writeShards(nasty, dir, nShards = 2)
    val back = JsonlShards.readShards(spark, dir)
    assert(back.schema === JsonlShards.docSchema)
    val diff = back.exceptAll(nasty).union(nasty.exceptAll(back))
    assert(diff.count() === 0, "JSONL round trip must be lossless")
  }

  test("failfast ingest rejects a corrupt line loudly") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_bad_").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\n{not json at all\n".getBytes("UTF-8"))
    val ex = intercept[org.apache.spark.SparkException] {
      JsonlShards.readShards(spark, dir).collect()
    }
    assert(ex.getMessage != null)
  }

  test("manifest matches the parquet-direct manifest (lossless corpus cycle)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val viaJsonl = JsonlShards.roundTripManifest(spark, docs)
    val h = graft.dedup.NearDup.h60(
      concat(col("doc_id").cast("string"), lit("|"), col("text")))
    val direct = docs.withColumn("h", h)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("doc_count"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        sum(col("n_chars")).as("total_n_chars"),
        expr("bit_xor(h)").as("content_xor"))
    val diff = viaJsonl.exceptAll(direct).union(direct.exceptAll(viaJsonl))
    assert(diff.count() === 0, "JSONL cycle flipped a provenance fingerprint")
  }
}
