package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative Dataset-based connected components (hash-partitioned min-label
  * propagation) — the scalable replacement for the reference's in-memory
  * disjoint set (/root/reference/CloneSet.cpp:22-84; SURVEY.md §7.1.3).
  *
  * Correctness argument for recall (SURVEY.md §7.1.3): the reference only
  * unions verified pairs, so every reference co-cluster pair is connected by
  * verified edges; CC over the full verified-edge set therefore reproduces
  * every reference co-cluster relation → dup-pair recall 1.0 by construction.
  *
  * Labels are the STRING image_id itself (component label = lexicographic
  * min member id). Identity is collision-free by construction — no 64-bit
  * hash stands in for a 10^12-row key space, where the birthday bound gives
  * tens of thousands of colliding pairs, each a silent cluster merge.
  *
  * Algorithm: each round (1) propagates the min label across edges in both
  * directions, then (2) path-compresses: since every label IS a vertex id,
  * a vertex can jump to its current label's label — convergence in
  * O(log diameter) rounds instead of O(diameter). Each round materializes
  * via persist + one count (a driver-side barrier only; all data stays
  * distributed).
  */
object Clustering {

  /** @param labels    (image_id, cluster_id: string = min member image_id)
    * @param iterations rounds run
    * @param converged  false iff maxIter was hit with labels still changing —
    *                   the component partition may then be SPLIT (never
    *                   over-merged); callers must surface this.
    */
  final case class CCResult(labels: DataFrame, iterations: Int, converged: Boolean)

  /** @param edges  (a, b) string-id pairs, each pair once in either order
    * @param vertices single-column "image_id" frame of ALL rows to label
    *                 (singletons keep their own label)
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 30): CCResult = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Only vertices incident to an edge participate in propagation; the
    // (overwhelmingly more numerous, at production dup rates) singletons
    // keep their own label and never enter the loop.
    var labels = sym.select(col("src").as("vid")).distinct()
      .withColumn("label", col("vid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // (1) min label among (self, neighbors' labels)
      val neighborMin = sym
        .join(labels.select(col("vid").as("src"), col("label")), "src")
        .groupBy(col("dst").as("vid"))
        .agg(min("label").as("nmin"))
      val propagated = labels
        .join(neighborMin, Seq("vid"), "left")
        .select(col("vid"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // (2) pointer jump: label := label-of-label (labels are vertex ids, so
      // chains halve every round — large-star-style logarithmic convergence)
      val next = propagated
        .join(propagated.select(col("vid").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("vid"), col("old"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // one action per round: materializes `next` AND counts changed labels
      val changed = next.filter(col("label") =!= col("old")).count()
      labels.unpersist(false)
      labels = next
      // break lineage growth: local checkpoint every few rounds
      if (iter % 5 == 4) labels = labels.localCheckpoint(true)
      converged = changed == 0
      iter += 1
    }
    sym.unpersist(false)
    if (!converged)
      System.err.println(s"[graft] WARNING: connectedComponents hit maxIter=$maxIter " +
        "with labels still changing — components with diameter > 2^maxIter may be " +
        "returned SPLIT (recall, not precision, is at risk). Raise maxIter.")
    // Re-attach: every input vertex gets a label; non-edge vertices label
    // themselves (singleton clusters).
    val out = vertices
      .select(col("image_id"))
      .join(labels.select(col("vid").as("image_id"), col("label")), Seq("image_id"), "left")
      .select(col("image_id"), coalesce(col("label"), col("image_id")).as("cluster_id"))
    CCResult(out, iter, converged)
  }

  /** Cluster statistics (SURVEY.md §2.5 A2): per-cluster member count and
    * span stats — analogue of CloneSetSInfo min/max/avg/total
    * (/root/reference/CloneSet.cpp:292-322).
    */
  def clusterStats(clusters: DataFrame, fps: DataFrame): DataFrame =
    clusters.join(fps.select("image_id", "span"), "image_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        min("span").as("min_span"), max("span").as("max_span"),
        avg("span").as("avg_span"), sum("span").as("total_span"))

  /** Cluster-size histogram (A3): size → number of clusters, analogue of
    * nblockAmountMap/hblockAmountMap (/root/reference/CloneSet.cpp:172-231).
    */
  def sizeHistogram(clusters: DataFrame): DataFrame =
    clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))

  /** Two-tier clustering surface (reference high-sim vs normal-sim clone-set
    * lists, /root/reference/CloneSet.cpp:86-165, CloneSet.h:59-92): one
    * component run per (tier, edge set), stacked with a `tier` column. The
    * shipped reference config has sigma_normal = -1 (normal tier matches
    * nothing — dif_config.txt:3); callers pass a positive sigma to light the
    * tier up. Tier-split size histogram = groupBy(tier, size) downstream.
    */
  def tieredClusters(vertices: DataFrame,
                     edgesByTier: Seq[(String, DataFrame)]): DataFrame =
    edgesByTier.map { case (tier, edges) =>
      connectedComponents(vertices, edges).labels.withColumn("tier", lit(tier))
    }.reduce(_.unionByName(_))
}
