package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Murmur3x64.splitmix64

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (`Queries.sim_cosine_topk`) — exact,
  * O(Q x N), the verification oracle. Scale path: random-hyperplane LSH
  * (Charikar, STOC'02 — public): sign-pattern buckets shrink the candidate
  * set to same-bucket rows; exact cosine re-ranks within the bucket. At
  * 10^12 rows the bucket join is an equi-join on the signature key and the
  * brute-force pass never happens.
  */
object SimilarityOps {

  /** Deterministic Rademacher (+1/-1) hyperplanes: plane p, dim i. */
  @inline private def planeSign(p: Int, i: Int, seed: Long): Double =
    if ((splitmix64(seed ^ (p.toLong << 32) ^ i.toLong) & 1L) == 0L) 1.0 else -1.0

  def signatureOf(emb: Array[Float], nPlanes: Int, seed: Long): Int = {
    var sig = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < emb.length) { dot += emb(i) * planeSign(p, i, seed); i += 1 }
      if (dot > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** LSH-bucketed cosine top-k: queries are vec_id % 50 == 0 (same query
    * set as the brute-force baseline so recall is directly measurable).
    */
  def annLsh(embeddings: DataFrame, nPlanes: Int, topK: Int, seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sigged = embeddings
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, emb) => (id, emb, signatureOf(emb, nPlanes, seed)) }
      .toDF("vec_id", "embedding", "bucket")

    val norm = sqrt(aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val withNorm = sigged.withColumn("nrm", norm)

    val q = withNorm.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val dot = aggregate(
      zip_with(col("qe"), col("embedding"), (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)

    val cand = q.join(withNorm, Seq("bucket")) // equi-join on signature bucket
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(dot / (col("qn") * col("nrm")), 6).as("sim"))

    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
  }
}
