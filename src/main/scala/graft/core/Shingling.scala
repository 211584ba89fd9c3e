package graft.core

import java.text.Normalizer

/** Caption/text canonicalization + weighted shingle emission.
  *
  * Graft analogue of the reference's two-stage front end (SURVEY.md §2.3):
  *  - G1 AST normalization (/root/reference/FixedChecker.cpp:12-427) →
  *    deterministic text canonicalization ("same structure ⇒ same words");
  *  - G2 per-node weighted EigenWord emission
  *    (/root/reference/EigenWordGenerate.cpp:23-267) → caption word k-grams
  *    fused with phash nibble tokens, each tagged with a weight kind looked
  *    up like the reference's bare-node-name weight table
  *    (/root/reference/EigenWord.cpp:28-37).
  */
object Shingling {

  /** Deterministic canonical form: unicode NFC, lowercase, punctuation →
    * space, whitespace collapsed + trimmed. Pure and order-free so it is
    * identical on driver (oracle) and executors (pipeline).
    */
  def normalize(caption: String): String = {
    if (caption == null) ""
    else {
      val nfc = Normalizer.normalize(caption, Normalizer.Form.NFC).toLowerCase
      val sb = new StringBuilder(nfc.length)
      var lastSpace = true
      var i = 0
      while (i < nfc.length) {
        val c = nfc.charAt(i)
        val keep = Character.isLetterOrDigit(c)
        if (keep) { sb.append(c); lastSpace = false }
        else if (!lastSpace) { sb.append(' '); lastSpace = true }
        i += 1
      }
      sb.toString.trim
    }
  }

  def tokens(normalized: String): Array[String] =
    if (normalized.isEmpty) Array.empty else normalized.split(' ')

  /** Word k-grams (sliding, joined by a single space). Shorter-than-k token
    * lists yield the single whole-string gram so tiny captions still
    * fingerprint (subject to the min-span gate).
    */
  def wordGrams(toks: Array[String], k: Int): Array[String] = {
    if (toks.isEmpty) Array.empty
    else if (toks.length <= k) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" "))
  }

  /** phash → 16 positional nibble tokens. A b-bit phash perturbation flips
    * at most b nibble tokens of 16, keeping near-image variants within a
    * small SimHash Hamming radius (payload fusion per BASELINE.json
    * north_star).
    */
  def phashTokens(phash: Long): Array[String] =
    Array.tabulate(16) { i =>
      val nib = (phash >>> (i * 4)) & 0xfL
      s"ph$i:${nib.toHexString}"
    }

  /** One weighted shingle: the analogue of an EigenWord
    * (/root/reference/EigenWord.h:72-95).
    */
  final case class Shingle(word: String, kind: String, weight: Int)

  /** Full shingle stream for one row: caption k-grams + single words +
    * phash nibble tokens, weighted by config kind.
    */
  def shingles(normalizedCaption: String, phash: Long, cfg: GraftConfig): Array[Shingle] = {
    val toks = tokens(normalizedCaption)
    val grams = wordGrams(toks, cfg.shingleK)
      .map(g => Shingle("g:" + g, "CAPGRAM", cfg.weightOf("CAPGRAM")))
    val words = toks.distinct
      .map(w => Shingle("w:" + w, "CAPWORD", cfg.weightOf("CAPWORD")))
    val ph = phashTokens(phash)
      .map(p => Shingle(p, "PHASH", cfg.weightOf("PHASH")))
    grams ++ words ++ ph
  }

  /** Char span of the canonical caption — the analogue of the reference's
    * `m_token_num` offset span (/root/reference/EigenWordGenerate.cpp:90-99).
    */
  def span(normalizedCaption: String): Int = normalizedCaption.length

  /** Token-hash set for MinHash/Jaccard: murmur base hash of each distinct
    * caption word k-gram (set semantics — resemblance is over sets,
    * Broder '97).
    */
  def minhashTokenHashes(normalizedCaption: String, cfg: GraftConfig): Array[Long] = {
    val grams = wordGrams(tokens(normalizedCaption), cfg.shingleK)
    grams.distinct.map(g => Murmur3x64.hash64(g, SimHashCore.Seed))
  }
}
