package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraftConfig

/** Exact caption-substring duplicate pass (SURVEY.md §2.4 J5; optional per
  * north_rule). Detects pairs where one row's normalized caption is a
  * verbatim word-aligned substring of another's.
  *
  * Scale shape: a brute-force contains() is O(n²). Instead the SHORTER
  * side's leading word-gram is its anchor: if norm(A) is a word-aligned
  * substring of norm(B), then A's first min(k, |A|) words appear as a
  * consecutive gram of the same width in B. So an equi-join of A's anchor
  * against B's exploded gram set, keyed by (width, gram), gives a complete
  * candidate superset — including captions with FEWER than k words, whose
  * anchor is their whole text at width |A| — and `contains` verifies. Same
  * candidates→verify shape as the LSH passes, with the anchor playing the
  * role of the bucket key.
  *
  * Scale notes: the haystack emits grams at widths 1..k (k ≤ 3), a constant
  * ×k row amplification on top of the single-width design; width is part of
  * the join key so buckets stay as selective as the anchor text itself. A
  * hot anchor (captions sharing a leading phrase) is bounded by the gram
  * join's bucket size; the contains() verify is a codegen'd string op.
  */
object Substring {

  /** @param rows (image_id, caption_norm, span) — caption already normalized
    * @param cfg   anchor gram width in words = cfg.shingleK
    * @return (a, b): a's caption is a proper word-aligned substring of b's
    */
  def substringPairs(rows: DataFrame, cfg: GraftConfig): DataFrame = {
    val k = cfg.shingleK
    val toks = split(col("caption_norm"), " ")
    // anchors: first min(k, |toks|) words of each sufficiently long caption —
    // ONE row per caption, so carrying the full text/span costs nothing extra
    val anchors = rows
      .filter(col("span") > cfg.minSpan)
      .select(col("image_id").as("a"), col("caption_norm").as("a_text"),
        col("span").as("a_span"),
        least(lit(k), size(toks)).as("width"),
        concat_ws(" ", slice(toks, lit(1), least(lit(k), size(toks)))).as("gram"))
    // haystack grams: every word w-gram of every caption, for w = 1..k.
    // The full text+span ride on every exploded gram row ON PURPOSE: the
    // containment verify then runs INLINE on the join output (same stage,
    // no candidate materialization). The tempting alternative — key-only
    // gram rows + joining text back onto candidates — was measured 2x
    // WORSE (389 → 827 MB shuffle, +80% task time): the anchor-gram
    // candidate superset is ~200x larger than the verified output (common
    // leading phrases), and re-shuffling that fat candidate list costs far
    // more than the text amplification on the gram side, which compresses
    // well (repeated phrases) in the shuffle codec.
    val widthGrams = (1 to k).map { w =>
      struct(lit(w).as("width"),
        array_distinct(transform(
          sequence(lit(1), greatest(lit(1), size(toks) - (w - 1))),
          p => concat_ws(" ", slice(toks, p, lit(w))))).as("grams"))
    }
    val grams = rows
      .select(col("image_id").as("b"), col("caption_norm").as("b_text"),
        col("span").as("b_span"),
        explode(array(widthGrams: _*)).as("wg"))
      .select(col("b"), col("b_text"), col("b_span"),
        col("wg.width").as("width"), explode(col("wg.grams")).as("gram"))
    // each (a, b) joins at most once — `a` has exactly one (width, gram)
    // anchor and b's per-width gram set is array_distinct'ed — so the
    // output is distinct by construction: no pair-level dedup pass
    anchors.join(grams, Seq("width", "gram"))
      .filter(col("a") =!= col("b") && col("a_span") < col("b_span") &&
        // word-aligned verbatim containment of the full shorter caption:
        // prefix+space, space-wrapped infix, or space+suffix
        (col("b_text").startsWith(concat(col("a_text"), lit(" "))) ||
         col("b_text").contains(concat(lit(" "), col("a_text"), lit(" "))) ||
         col("b_text").endsWith(concat(lit(" "), col("a_text")))))
      .select(col("a"), col("b"))
  }
}
