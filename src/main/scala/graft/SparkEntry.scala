package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The flagship is the graft's end-to-end near-duplicate clustering job
  * (SimHash + MinHash/LSH candidate joins → verify → connected components)
  * run over the documents corpus presented in the image-pipeline input
  * shape; the full image+caption pipeline is exercised by the scalatest E2E
  * suite and the scaling bench on the synthetic corpus (FIXTURES.md §A).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * every fingerprinted document with its near-dup cluster id + size.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val clusters = queries("dedup_clusters")(spark, dir)
    val sizes = clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    clusters.join(sizes, "cluster_id")
      .select("doc_id", "cluster_id", "cluster_size")
      .orderBy("doc_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Murmur/LSH-based operators are omitted
    * (rows-only check) — DuckDB cannot express murmur3_x64_128; those are
    * verified against the in-repo sequential oracle by scalatest instead.
    */
  def oracleSql: Map[String, String] = graft.queries.Queries.oracleSql
}
