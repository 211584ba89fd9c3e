package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operators over the `documents` corpus — the
  * training-data-pipeline operations (dedup, quality, token stats, language
  * heuristics, fingerprinting) expressed as Catalyst column algebra so every
  * step stays inside WholeStageCodegen (no UDFs on these paths).
  *
  * All operators read (doc_id, text[, n_chars]) only — column pruning keeps
  * the scan minimal — and scale by doc count: gram explosion is linear in
  * corpus size and the pair joins are equi-joins on gram/bucket keys.
  */
object TextOps {

  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Word tokens column (whitespace split of the raw text). */
  def toks: Column = split(col("text"), " ")

  /** Sliding word n-grams as an array column, built with pure column math:
    * transform over 0..len-n of slice+join (codegen'd, no UDF).
    */
  def wordNgrams(tokens: Column, n: Int): Column = {
    // sequence(1, greatest(1, size-n+1)) positions; slice(tokens, p, n) joined
    transform(
      sequence(lit(1), greatest(lit(1), size(tokens) - (n - 1))),
      p => concat_ws(" ", slice(tokens, p, lit(n)))
    )
  }

  /** Exploded distinct (doc_id, gram) pairs for word n-grams. */
  def gramTable(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(wordNgrams(toks, n))).as("gram"))

  /** Exact n-gram Jaccard pairs >= tau: equi-join on gram, count the
    * intersection per pair, derive |A∪B| = |A|+|B|-∩ from per-doc gram
    * counts (broadcast if small, shuffled equi-join otherwise).
    * This is the exact-verification dedup path; LSH variants produce the
    * same pairs from a candidate superset.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, tau: Double): DataFrame = {
    val grams = gramTable(docs, n)
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val inter = grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n_grams", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n_grams", "nb"), "db")
      .withColumn("j", round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("j") >= tau)
      .select("da", "db", "j")
  }
}
