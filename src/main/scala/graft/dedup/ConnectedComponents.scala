package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-star / small-star connected components — the alternating
  * star-contraction algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14; public algorithm). Where the
  * min-label propagation in [[NearDup.duplicateClusters]] needs
  * O(log d) rounds in the component DIAMETER (with pointer doubling),
  * star contraction converges in O(log n) rounds worst-case with a
  * per-round cost of two self-aggregations over the edge set — the
  * shape used for web-graph-scale dedup where components can be long
  * chains rather than near-cliques.
  *
  * Each round:
  *  - large-star: every node connects its strictly-LARGER neighbours
  *    to the minimum of its neighbourhood (incl. itself);
  *  - small-star: edges oriented toward the larger endpoint; every
  *    node connects its ≤ neighbours and itself to the neighbourhood
  *    minimum.
  * Both steps preserve connectivity; the fixed point is a forest of
  * depth-1 stars rooted at each component's minimum id. One hash
  * shuffle per aggregation, edges never materialize on the driver.
  */
object ConnectedComponents {

  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(min(col("dst")).as("nbr_min"))
      .select(col("src"), least(col("src"), col("nbr_min")).as("m"))
    sym.join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
    val mins = oriented.groupBy("src").agg(min(col("dst")).as("m"))
    oriented.join(mins, "src")
      .select(col("dst").as("v"), col("m"))
      .union(mins.select(col("src").as("v"), col("m")))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Order-independent edge-set fingerprint for the convergence test —
    * one tiny aggregate per round instead of a full set compare. */
  private def fingerprint(edges: DataFrame): (Long, Long, Long) = {
    val r = edges.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("src")), lit(0L)).as("s"),
      coalesce(sum(col("src") * 31 + col("dst")), lit(0L)).as("h")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Cluster duplicate pairs into components: same contract as
    * [[NearDup.duplicateClusters]] — (doc_id, cluster_rep = component
    * min, is_kept = doc is the representative) for every node that
    * appears in some pair. */
  def duplicateClustersStar(pairs: DataFrame, maxIters: Int = 30): DataFrame = {
    // checkpoint the (possibly expensive) pair source ONCE — nodes and
    // edges both derive from it, and without the materialization point
    // each derivation re-evaluates the whole upstream pair query
    val p = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    val nodes = p.select(col("doc_a").as("doc_id"))
      .union(p.select(col("doc_b").as("doc_id"))).distinct()
    var edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    var fp = fingerprint(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      edges = smallStar(largeStar(edges)).localCheckpoint()
      val fp2 = fingerprint(edges)
      converged = fp2 == fp
      fp = fp2
      i += 1
    }
    require(converged,
      s"duplicateClustersStar did not converge in $maxIters rounds — raise maxIters")
    // Fixed point = depth-1 stars: every non-root points at its
    // component's min. Roots (and only roots) never appear as src.
    nodes.join(edges, col("doc_id") === col("src"), "left")
      .select(col("doc_id"), coalesce(col("dst"), col("doc_id")).as("cluster_rep"))
      .withColumn("is_kept", col("doc_id") === col("cluster_rep"))
      .orderBy(col("doc_id"))
  }
}
