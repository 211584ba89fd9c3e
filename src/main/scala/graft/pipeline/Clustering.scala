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
  * Algorithm: vertices carry a candidate label = min(xxhash-stable numeric id)
  * seen so far; each round propagates labels across edges in both directions
  * and keeps the min; stops when no label changed. Rounds are O(component
  * diameter) — near-dup families have tiny diameters; a cap + audit guards
  * adversarial chains. Each round materializes via persist + count (a
  * driver-side barrier only; all data stays distributed).
  */
object Clustering {

  /** @param edges  (a, b) string-id pairs, each pair once in either order
    * @param vertices single-column "image_id" frame of ALL rows to label
    *                 (singletons keep their own label)
    * @return (image_id, cluster_id) — cluster_id = min stable id of component
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 30): (DataFrame, Int) = {
    val spark = vertices.sparkSession
    // Stable numeric vertex ids: xxhash64 of the string id. Collision odds at
    // 10^12 rows are ~3e-5 per Birthday bound with 64 bits — acceptable for
    // cluster labels (ids remain strings; only labels are numeric).
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .select(xxhash64(col("a")).as("src"), xxhash64(col("b")).as("dst"))
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
      // min label among (self, neighbors' labels)
      val neighborMin = sym
        .join(labels.select(col("vid").as("src"), col("label")), "src")
        .groupBy(col("dst").as("vid"))
        .agg(min("label").as("nmin"))
      val next = labels
        .join(neighborMin, Seq("vid"), "left")
        .withColumn("newLabel", least(col("label"), coalesce(col("nmin"), col("label"))))
        .select(col("vid"), col("newLabel").as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.select(col("vid"), col("label").as("old")), "vid")
        .filter(col("label") < col("old")).count()
      labels.unpersist(false)
      labels = next
      // break lineage growth: local checkpoint every few rounds
      if (iter % 5 == 4) labels = labels.localCheckpoint(true)
      converged = changed == 0
      iter += 1
    }
    sym.unpersist(false)
    // Re-attach: every input vertex gets a label; non-edge vertices label
    // themselves (singleton clusters).
    val out = vertices
      .select(col("image_id"), xxhash64(col("image_id")).as("vid"))
      .join(labels.select(col("vid"), col("label")), Seq("vid"), "left")
      .select(col("image_id"), coalesce(col("label"), col("vid")).as("cluster_id"))
    (out, iter)
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
}
