package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Blocked fuzzy matching (entity resolution): near-duplicate part
  * names by Levenshtein edit distance INSIDE (brand, size) blocks.
  * The blocking key turns the quadratic all-pairs into per-block
  * pairs — the standard ER architecture (block → compare → score):
  * the self-join shuffles once on the block key, and pair generation
  * is quadratic only within a block (same containment story as the
  * LSH band buckets in [[NearDup]]; a skewed block would get the same
  * salt-split cap). Distance 0 (identical names) is excluded — that
  * is [[NearDup.exactGroups]]' job. `levenshtein` is codegen'd in
  * both engines and identically defined, so the query is fully
  * oracle-checkable. */
object FuzzyMatch {

  def fuzzyPartPairs(s: SparkSession, dir: String,
                     maxDist: Int = 3): DataFrame = {
    val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size", "p_name")
    p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
        col("a.p_size") === col("b.p_size") &&
        col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("edit_dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("edit_dist").between(1, maxDist))
      .select(col("a.p_brand").as("brand"), col("a.p_size").as("size"),
        col("a.p_partkey").as("part_a"), col("b.p_partkey").as("part_b"),
        col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        col("edit_dist"))
      .orderBy(col("brand"), col("size"), col("part_a"), col("part_b"))
  }

  val fuzzyPartPairsSql: String =
    """SELECT a.p_brand AS brand, a.p_size AS size,
      |  a.p_partkey AS part_a, b.p_partkey AS part_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
      | AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
      |ORDER BY brand, size, part_a, part_b""".stripMargin

  /** The same blocked ER pass scored with the native Jaro-Winkler
    * expression ([[org.apache.spark.sql.graftext.JaroWinkler]]) — the
    * record-linkage scorer Levenshtein misses (prefix-weighted,
    * length-normalized). Identical names are excluded (exactGroups'
    * job); both engines filter on the ROUNDED score so boundary ties
    * agree, and the oracle's `jaro_winkler_similarity` is the same
    * standard parameterization (verified bit-for-bit on the corpus). */
  def jwPartPairs(s: SparkSession, dir: String,
                  minSim: Double = 0.92): DataFrame = {
    import org.apache.spark.sql.graftext.JaroWinkler.jaroWinkler
    val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size", "p_name")
    p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
        col("a.p_size") === col("b.p_size") &&
        col("a.p_partkey") < col("b.p_partkey"))
      .filter(col("a.p_name") =!= col("b.p_name"))
      .withColumn("jw_sim", graft.ops.ConditionalAgg.roundPortable(
        jaroWinkler(col("a.p_name"), col("b.p_name")), 6))
      .filter(col("jw_sim") >= minSim)
      .select(col("a.p_brand").as("brand"), col("a.p_size").as("size"),
        col("a.p_partkey").as("part_a"), col("b.p_partkey").as("part_b"),
        col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        col("jw_sim"))
      .orderBy(col("brand"), col("size"), col("part_a"), col("part_b"))
  }

  val jwPartPairsSql: String = {
    val sim = graft.ops.ConditionalAgg.roundPortableSql(
      "jaro_winkler_similarity(a.p_name, b.p_name)", 6)
    s"""SELECT a.p_brand AS brand, a.p_size AS size,
       |  a.p_partkey AS part_a, b.p_partkey AS part_b,
       |  a.p_name AS name_a, b.p_name AS name_b,
       |  $sim AS jw_sim
       |FROM part a JOIN part b
       |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       | AND a.p_partkey < b.p_partkey
       |WHERE a.p_name <> b.p_name AND $sim >= 0.92
       |ORDER BY brand, size, part_a, part_b""".stripMargin
  }
}
