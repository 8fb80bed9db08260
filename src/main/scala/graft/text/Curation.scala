package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.NearDup
import graft.sources.Tables

/** The end-to-end training-data curation verdict — the composition a
  * 100 TB text pipeline actually runs, as ONE relational query:
  *
  *  1. eval holdout: the benchmark slice never trains;
  *  2. quality gate: Gopher-style accept flags
  *     ([[QualityFilters.filterFlags]]);
  *  3. decontamination: docs leaking eval 5-grams
  *     ([[NearDup.decontamination]]);
  *  4. dedup keep-list: near-duplicate cluster members drop unless
  *     representative ([[NearDup.duplicateClusters]]).
  *
  * One verdict per document, first matching reason wins. Everything
  * composes as left joins on doc_id over per-doc flag frames — each
  * stage stays independently testable, and the composed plan is
  * stage-parallel (the flag frames build concurrently, the verdict is
  * a 4-way co-keyed join).
  */
object Curation {

  def verdicts(documents: DataFrame, pairs: DataFrame): DataFrame =
    verdictsWith(documents, NearDup.duplicateClusters(pairs))

  /** [[verdicts]] over a pre-staged cluster frame (the driver shares
    * one clustering across its three consumers). */
  def verdictsWith(documents: DataFrame, clusters: DataFrame): DataFrame = {
    val flags = QualityFilters.filterFlags(documents)
      .select(col("doc_id"), col("pass_all"))
    val comp = clusters
      .select(col("doc_id"), col("is_kept"))
    val contam = NearDup.decontamination(documents)
      .select(col("doc_id")).withColumn("is_contam", lit(true))
    documents.select(col("doc_id"), col("source"))
      .join(flags, Seq("doc_id"), "left")
      .join(comp, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("verdict",
        when(pmod(col("doc_id"), lit(50)) === 0, "eval_holdout")
          .when(col("pass_all") === false, "quality_reject")
          .when(col("is_contam") === true, "contaminated")
          .when(col("is_kept") === false, "duplicate")
          .otherwise("kept"))
      .select("doc_id", "source", "verdict")
      .orderBy(col("doc_id"))
  }

  def verdictsQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    verdicts(docs, NearDup.jaccardPairs(docs))
  }

  val verdictsSql: String = {
    def indent(sql: String) = sql.replace("\n", "\n  ")
    s"""WITH flags AS (
       |  SELECT doc_id, pass_all FROM (${indent(QualityFilters.filterFlagsSql)})
       |), comp AS (
       |  SELECT doc_id, is_kept FROM (${indent(NearDup.clustersSql)})
       |), contam AS (
       |  SELECT doc_id FROM (${indent(NearDup.decontaminationSql)})
       |)
       |SELECT d.doc_id, d.source,
       |  CASE WHEN d.doc_id % 50 = 0 THEN 'eval_holdout'
       |       WHEN f.pass_all = FALSE THEN 'quality_reject'
       |       WHEN c2.doc_id IS NOT NULL THEN 'contaminated'
       |       WHEN c.is_kept = FALSE THEN 'duplicate'
       |       ELSE 'kept' END AS verdict
       |FROM documents d
       |LEFT JOIN flags f ON d.doc_id = f.doc_id
       |LEFT JOIN comp c ON d.doc_id = c.doc_id
       |LEFT JOIN contam c2 ON d.doc_id = c2.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}
