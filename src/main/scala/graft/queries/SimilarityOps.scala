package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Murmur3x64.splitmix64

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (`Queries.sim_cosine_topk`) — exact,
  * O(Q x N), the verification oracle. Scale path: MULTI-TABLE random-
  * hyperplane LSH (Charikar, STOC'02; multi-probe per Lv et al., VLDB'07 —
  * both public): L independent sign-pattern tables, each query probing its
  * own bucket plus every Hamming-1 neighbor bucket, candidates unioned
  * across tables and re-ranked by exact cosine. A single table leaves most
  * query buckets empty (round-1 failure mode: 12 planes → 4096 buckets over
  * 500 rows → ~2% recall); with L tables and (P+1) probes the per-neighbor
  * miss probability is (1 - p^P - P·p^(P-1)(1-p))^L for per-plane agreement
  * p — ≥0.95 recall at the defaults for the ~0.5+ cosine neighbors that
  * matter.
  *
  * Scale shape at 10^12 rows: the data side is keyed ONCE per (table,
  * bucket) — L rows per vector, an equi-join key, no all-pairs path; probe
  * expansion multiplies only the (tiny) query side by L·(P+1). Re-rank cost
  * is |candidates|, bounded by L·(P+1)·bucket-size per query, with bucket
  * size ~ n/2^P controlled by P.
  */
object SimilarityOps {

  /** Deterministic Rademacher (+1/-1) hyperplanes: table t, plane p, dim i. */
  @inline private def planeSign(t: Int, p: Int, i: Int, seed: Long): Double =
    if ((splitmix64(seed ^ (t.toLong << 40) ^ (p.toLong << 20) ^ i.toLong) & 1L) == 0L)
      1.0 else -1.0

  /** Sign-pattern bucket of `emb` in table `t`. */
  def signatureOf(emb: Array[Float], t: Int, nPlanes: Int, seed: Long): Int = {
    var sig = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < emb.length) { dot += emb(i) * planeSign(t, p, i, seed); i += 1 }
      if (dot > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** L2 norm with left-to-right summation — bit-identical to the SQL
    * `sqrt(list_sum(list_transform(e, x -> x*x)))` the DuckDB oracle runs.
    */
  def l2(emb: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < emb.length) { s += emb(i).toDouble * emb(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Exact cosine, rounded EXACTLY like Spark's round(col, 6) (Catalyst uses
    * BigDecimal.valueOf(double) + HALF_UP) so results stay hash-identical to
    * the previous HOF expression and to the DuckDB oracle. Dot is summed in
    * index order — same IEEE sequence as the SQL list_sum. A compiled loop
    * over primitive arrays: the interpreted per-element HOF lambdas this
    * replaces cost ~220 s on 2M pairs x 64 dims (BENCH_r01).
    */
  def roundedCosine(ae: Array[Float], an: Double, be: Array[Float], bn: Double): Double = {
    var dot = 0.0
    var i = 0
    while (i < ae.length) { dot += ae(i).toDouble * be(i).toDouble; i += 1 }
    java.math.BigDecimal.valueOf(dot / (an * bn))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** (vec_id, embedding, nrm) with the norm computed in a typed map. */
  private[queries] def withNorm(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // scanFloor: the sf embeddings parquet is ONE scan split, and this frame
    // feeds the stream side of the BroadcastNestedLoopJoin cosine passes —
    // without it the whole O(n²) cosine loop runs in a single task
    TextOps.scanFloor(embeddings.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .map { case (id, emb) => (id, emb, l2(emb)) }
      .toDF("vec_id", "embedding", "nrm")
  }

  /** Exact cosine over an (a, ae, an, b, be, bn) pair frame via a typed map. */
  private[queries] def pairCosine(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("a"), col("ae"), col("an"), col("b"), col("be"), col("bn"))
      .as[(Long, Array[Float], Double, Long, Array[Float], Double)]
      .map { case (a, ae, an, b, be, bn) => (a, b, roundedCosine(ae, an, be, bn)) }
      .toDF("a", "b", "cos")
  }

  /** All bucket signatures within Hamming `radius` of `sig` (multi-probe
    * set, Lv et al. VLDB'07). radius 2 over P planes = 1 + P + P(P-1)/2
    * probes — query-side only.
    */
  private[queries] def probeSet(sig: Int, nPlanes: Int, radius: Int): Seq[Int] = {
    val r1 = (0 until nPlanes).map(p => sig ^ (1 << p))
    val r2 =
      if (radius >= 2)
        for { p <- 0 until nPlanes; q <- (p + 1) until nPlanes }
          yield sig ^ (1 << p) ^ (1 << q)
      else Seq.empty
    (sig +: (if (radius >= 1) r1 else Seq.empty)) ++ r2
  }

  /** Multi-table, multi-probe LSH cosine top-k of each query vector against
    * the embeddings corpus. `queries` is any (vec_id, embedding) frame — a
    * filtered subset of the corpus (self-search, a query's own row is
    * excluded by id) or an external query set.
    *
    * Parameter note: per-plane agreement for a neighbor at angle θ is
    * p = 1 − θ/π; per-table hit with radius-2 probing is
    * Σ_{k≤2} C(P,k) p^(P−k)(1−p)^k, and overall recall 1−(1−p_t)^L. The
    * sandbox default (P=6, L=8, radius 2) gives ≥0.99 for the synthetic
    * corpus's weak cos≈0.27 neighbors; production data with cos≥0.7
    * neighbors sustains much larger P (smaller buckets) at the same L.
    */
  def annLsh(embeddings: DataFrame, queries: DataFrame, nPlanes: Int,
             topK: Int, nTables: Int = 8,
             probeRadius: Int = 2, seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]

    // data side: L bucket keys per vector — key-only rows into the join
    val dataKeys = base.flatMap { case (id, emb) =>
      (0 until nTables).map(t => (id, t, signatureOf(emb, t, nPlanes, seed)))
    }.toDF("vec_id", "t", "bucket")

    // query side: own bucket + all Hamming-1 probe buckets per table
    val queryKeys = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        (0 until nTables).flatMap { t =>
          val sig = signatureOf(emb, t, nPlanes, seed)
          probeSet(sig, nPlanes, probeRadius).distinct.map(b => (id, t, b))
        }
      }.toDF("qid", "t", "bucket")

    val cand = queryKeys.join(dataKeys, Seq("t", "bucket"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"))
      .dropDuplicates("qid", "vec_id") // same pair may collide in many tables

    // exact cosine re-rank of the candidate set only
    val e = withNorm(embeddings)
    val eq = withNorm(queries)
    val scored = pairCosine(cand
        .join(eq.select(col("vec_id").as("qid"), col("embedding").as("ae"),
          col("nrm").as("an")), "qid")
        .join(e.select(col("vec_id"), col("embedding").as("be"), col("nrm").as("bn")),
          "vec_id")
        .select(col("qid").as("a"), col("ae"), col("an"),
          col("vec_id").as("b"), col("be"), col("bn")))
      .select(col("a").as("qid"), col("b").as("cid"), col("cos").as("sim"))

    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topK)
  }
}
