package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.GraftConfig
import graft.pipeline.{DedupPipeline, Substring}

class SubstringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val cfg = GraftConfig()

  private def rows(caps: (String, String)*) =
    caps.toDF("image_id", "caption_norm")
      .withColumn("span", length(col("caption_norm")))

  test("word-aligned substring pairs: prefix, infix, suffix positions") {
    val r = rows(
      "short" -> "alpha beta gamma delta",
      "pre" -> "alpha beta gamma delta and more words here",
      "inf" -> "lead in words alpha beta gamma delta tail words",
      "suf" -> "some leading words alpha beta gamma delta",
      "other" -> "totally unrelated caption about nothing at all")
    val pairs = Substring.substringPairs(r, cfg)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(pairs === Set(("short", "pre"), ("short", "inf"), ("short", "suf")))
  }

  test("non-word-aligned containment is NOT a match") {
    val r = rows(
      "a" -> "eta beta gamma",
      "b" -> "zeta beta gamma delta") // 'eta beta gamma' is a char substring, not word-aligned
    assert(Substring.substringPairs(r, cfg).count() === 0)
  }

  test("min-span gate applies to the shorter side") {
    val r = rows(
      "tiny" -> "ab cd", // span 5 <= 12: gated
      "big" -> "ab cd plus many other following words")
    assert(Substring.substringPairs(r, cfg).count() === 0)
  }

  test("anchor shorter than k words still matches (short-anchor gap fix)") {
    // k=3 (docCfg): a 2-word 13+-char caption contained in a longer one had
    // no width-3 anchor gram and was silently missed before round 2.
    val k3 = GraftConfig(shingleK = 3)
    val r = rows(
      "two" -> "extraordinary hippopotamus",
      "host" -> "we saw an extraordinary hippopotamus at the river today",
      "one" -> "antidisestablishmentarianism",
      "onehost" -> "the word antidisestablishmentarianism is famously long")
    val pairs = Substring.substringPairs(r, k3)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(pairs === Set(("two", "host"), ("one", "onehost")))
  }

  test("short anchor must still be word-aligned and verbatim") {
    val k3 = GraftConfig(shingleK = 3)
    val r = rows(
      "two" -> "ordinary hippopotamus",
      "host" -> "we saw an extraordinary hippopotamus at the river") // char substring only
    assert(Substring.substringPairs(r, k3).count() === 0)
  }

  test("pipeline catches a substring pair invisible to SimHash and MinHash") {
    val noise1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val noise2 = (31 to 60).map(i => s"w$i").mkString(" ")
    val img = Seq(
      ("needle", "alpha beta gamma delta epsilon", 1L),
      ("haystack", s"$noise1 alpha beta gamma delta epsilon $noise2", 2L),
      ("bystander", "completely different text with its own words", 3L)
    ).toDF("image_id", "caption", "phash")
    val res = DedupPipeline.run(img, cfg.copy(weights = cfg.weights + ("PHASH" -> 0)))
    val labels = res.clusters.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // Jaccard(needle, haystack) = 4/65 << tau and Hamming is far: only J5 links them
    assert(labels("needle") === labels("haystack"))
    assert(labels("bystander") !== labels("needle"))
    assert(res.edges.filter(col("source") === "substring").count() >= 1)
  }
}
