package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraftConfig

/** Exact caption-substring duplicate pass (SURVEY.md §2.4 J5; optional per
  * north_rule). Detects pairs where one row's normalized caption is a
  * verbatim word-aligned substring of another's.
  *
  * Scale shape: a brute-force contains() is O(n²). Instead the SHORTER
  * side's first word-k-gram is its anchor: if norm(A) is a word-aligned
  * substring of norm(B), then A's first k words appear as a consecutive
  * k-gram of B. So an equi-join of A.anchor against B's exploded gram set
  * gives a complete candidate superset, and `contains` verifies — the same
  * candidates→verify shape as the LSH passes, with the anchor playing the
  * role of the bucket key. Skew note: a hot anchor (e.g. captions starting
  * with the same phrase) is bounded by the gram join's bucket size; the
  * contains() verify is a codegen'd string op.
  */
object Substring {

  /** @param rows (image_id, caption_norm, span) — caption already normalized
    * @param k     anchor gram width in words (same as cfg.shingleK)
    * @return (a, b): a's caption is a proper word-aligned substring of b's
    */
  def substringPairs(rows: DataFrame, cfg: GraftConfig): DataFrame = {
    val k = cfg.shingleK
    val toks = split(col("caption_norm"), " ")
    // anchors: first k words of each sufficiently long caption
    val anchors = rows
      .filter(col("span") > cfg.minSpan)
      .select(col("image_id").as("a"), col("caption_norm").as("a_text"),
        col("span").as("a_span"),
        concat_ws(" ", slice(toks, 1, k)).as("gram"))
    // haystack grams: every word k-gram of every caption
    val grams = rows
      .select(col("image_id").as("b"), col("caption_norm").as("b_text"),
        col("span").as("b_span"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(lit(1), size(toks) - (k - 1))),
          p => concat_ws(" ", slice(toks, p, lit(k)))))).as("gram"))
    anchors.join(grams, "gram")
      .filter(col("a") =!= col("b") && col("a_span") < col("b_span") &&
        // word-aligned verbatim containment of the full shorter caption:
        // prefix+space, space-wrapped infix, or space+suffix
        (col("b_text").startsWith(concat(col("a_text"), lit(" "))) ||
         col("b_text").contains(concat(lit(" "), col("a_text"), lit(" "))) ||
         col("b_text").endsWith(concat(lit(" "), col("a_text")))))
      .select(col("a"), col("b"))
      .dropDuplicates("a", "b")
  }
}
