package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class ShinglingSpec extends AnyFunSuite {
  val cfg = GraftConfig()

  test("normalize: NFC, lowercase, punctuation->space, whitespace collapse") {
    assert(Shingling.normalize("  Hello,   WORLD!! ") === "hello world")
    assert(Shingling.normalize("a\tb\nc") === "a b c")
    assert(Shingling.normalize("") === "")
    assert(Shingling.normalize(null) === "")
    assert(Shingling.normalize("café") === Shingling.normalize("café")) // NFC
  }

  test("word k-grams: sliding, short inputs collapse to one gram") {
    assert(Shingling.wordGrams(Array("a", "b", "c", "d"), 2).toSeq ===
      Seq("a b", "b c", "c d"))
    assert(Shingling.wordGrams(Array("a", "b"), 3).toSeq === Seq("a b"))
    assert(Shingling.wordGrams(Array.empty[String], 3).toSeq === Seq.empty)
  }

  test("phash nibble tokens: 16 positional tokens; b-bit flip changes <= b tokens") {
    val t1 = Shingling.phashTokens(0x0123456789abcdefL)
    assert(t1.length === 16 && t1.distinct.length === 16)
    val t2 = Shingling.phashTokens(0x0123456789abcdefL ^ (1L << 17))
    assert(t1.zip(t2).count { case (a, b) => a != b } === 1)
  }

  test("shingle stream: kinds carry configured weights; zero-weight kinds stay") {
    val sh = Shingling.shingles("the quick fox jumps", 0xffL, cfg)
    assert(sh.exists(_.kind == "CAPGRAM"))
    assert(sh.exists(_.kind == "PHASH"))
    assert(sh.filter(_.kind == "CAPGRAM").forall(_.weight === cfg.weightOf("CAPGRAM")))
    assert(sh.filter(_.kind == "PHASH").forall(_.weight === cfg.weightOf("PHASH")))
  }

  test("span is the normalized caption length (m_token_num analogue)") {
    assert(Shingling.span(Shingling.normalize(" A  B ")) === 3)
  }

  test("weight lookup falls back to DEFAULT like the reference table") {
    assert(cfg.weightOf("NO_SUCH_KIND") === cfg.weights(GraftConfig.Default))
    assert(cfg.weightOf("NOISE") === 0)
  }
}
