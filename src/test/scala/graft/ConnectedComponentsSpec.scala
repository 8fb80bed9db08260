package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.{ConnectedComponents, NearDup}
import graft.sources.Tables

/** Large-star/small-star CC must agree exactly with the min-label
  * propagation CC on every input (they share the DuckDB recursive-CTE
  * oracle), and must converge in logarithmic rounds on the worst-case
  * shape for label propagation — a long chain. */
class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def toPairs(edges: Seq[(Long, Long)]) =
    edges.toDF("doc_a", "doc_b")

  test("star CC equals label-propagation CC on the real duplicate pairs") {
    val pairs = NearDup.jaccardPairs(Tables.documents(spark, sf))
      .select("doc_a", "doc_b").localCheckpoint()
    val star = ConnectedComponents.duplicateClustersStar(pairs).collect().toSeq
    val prop = NearDup.duplicateClusters(pairs
      .withColumn("jaccard", lit(1.0))).collect().toSeq
    assert(star.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))) ===
      prop.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))))
  }

  test("long chain collapses to one component rooted at the minimum") {
    val chain = toPairs((1L until 60L).map(i => (i, i + 1)))
    val out = ConnectedComponents.duplicateClustersStar(chain).collect()
    assert(out.length === 60)
    assert(out.forall(_.getLong(1) === 1L))
    assert(out.count(_.getBoolean(2)) === 1)
  }

  test("disjoint cliques and a bridge keep separate/merged reps correctly") {
    // clique {10,11,12}, clique {20,21,22}, chain {30-31}, bridge joins 12-20
    val edges = Seq((10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (21L, 22L), (20L, 22L), (12L, 20L), (30L, 31L))
    val out = ConnectedComponents.duplicateClustersStar(toPairs(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L, 20L, 21L, 22L).forall(out(_) === 10L))
    assert(out(30L) === 30L && out(31L) === 30L)
  }

  test("random graphs: star CC equals label-propagation CC (100 nodes, 3 seeds)") {
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(120)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val star = ConnectedComponents.duplicateClustersStar(toPairs(edges))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val prop = NearDup.duplicateClusters(toPairs(edges))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(star === prop, s"divergence at seed $seed")
    }
  }

  test("order of pair endpoints does not matter") {
    val fwd = toPairs(Seq((1L, 5L), (5L, 9L), (2L, 9L)))
    val rev = toPairs(Seq((5L, 1L), (9L, 5L), (9L, 2L)))
    val a = ConnectedComponents.duplicateClustersStar(fwd).collect().toSeq
    val b = ConnectedComponents.duplicateClustersStar(rev).collect().toSeq
    assert(a.map(_.toSeq) === b.map(_.toSeq))
  }
}
