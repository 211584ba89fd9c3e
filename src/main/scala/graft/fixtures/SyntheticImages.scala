package graft.fixtures

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.core.Murmur3x64.splitmix64

/** Deterministic synthetic image+caption corpus (FIXTURES.md §A).
  *
  * Schema is exactly BASELINE.json `input_hint`:
  * (image_id STRING, bytes BINARY, w INT, h INT, fmt STRING,
  *  caption STRING, phash BIGINT), plus a sidecar `truth` table
  * (image_id, family_id, kind) used only by tests and the recall bench.
  *
  * Everything derives from splitmix64(seed ^ rowIdx) — no wall clock, no
  * external data; generation is distributed (spark.range → mapPartitions)
  * so the 50k bench table builds in parallel.
  *
  * Families plant known duplicate structure (expected detection paths in
  * FIXTURES.md): exact | near_caption | near_image | substring | distinct |
  * hot_key.
  */
object SyntheticImages {

  val Vocab: Array[String] = {
    // 512 deterministic pseudo-words
    val syll = Array("ka", "to", "ri", "mu", "sa", "lo", "ve", "ni", "pa", "ze",
      "du", "fi", "go", "he", "ja", "ky")
    Array.tabulate(512) { i =>
      val a = syll(i % 16); val b = syll((i / 16) % 16); val c = syll((i / 256) % 16)
      if (i < 256) a + b else a + b + c
    }
  }

  private val Stopwords = Array("the", "a", "of", "in", "with", "and")

  final case class Gen(seed: Long) {
    private def rnd(rowIdx: Long, stream: Int): Long =
      splitmix64(seed ^ (rowIdx * 0x9e3779b97f4a7c15L) ^ (stream.toLong << 56))
    def int(rowIdx: Long, stream: Int, bound: Int): Int = {
      val r = rnd(rowIdx, stream) >>> 1
      (r % bound).toInt
    }
    def long(rowIdx: Long, stream: Int): Long = rnd(rowIdx, stream)
  }

  /** Base caption: 8-24 words from the vocab with stopword sprinkling. */
  def caption(g: Gen, family: Long): String = {
    val n = 8 + g.int(family, 1, 17)
    val words = (0 until n).map { i =>
      val r = g.long(family, 10 + i)
      if ((r & 7) == 0) Stopwords(((r >>> 8) % Stopwords.length).toInt.abs)
      else Vocab(((r >>> 8) % Vocab.length).toInt.abs)
    }
    words.mkString(" ")
  }

  /** 1-2 word substitutions — the near_caption perturbation. */
  def perturbCaption(g: Gen, family: Long, variant: Int, cap: String): String = {
    val words = cap.split(' ')
    val nSub = 1 + (variant % 2)
    var out = words.clone()
    (0 until nSub).foreach { s =>
      val pos = g.int(family * 31 + variant, 20 + s, words.length)
      out(pos) = Vocab(g.int(family * 37 + variant, 30 + s, Vocab.length))
    }
    out.mkString(" ")
  }

  /** Deterministic pixel field: seeded gradient + per-family low-frequency
    * (8x8 block) noise. Block noise keeps lossy re-encodes within the
    * PSNR >= 40 dB per-row invariant (input_hint) and keeps the aHash
    * stable across JPEG qualities — the property near_image relies on.
    */
  def pixels(g: Gen, family: Long, w: Int, h: Int): Array[Int] = {
    val px = new Array[Int](w * h)
    val base = g.long(family, 2)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val grad = ((x * 255) / w + (y * 255) / h) / 2
        val noise = (splitmix64(base ^ ((x / 8).toLong << 32) ^ (y / 8).toLong) & 0x3fL).toInt
        val v = math.min(255, grad + noise)
        px(y * w + x) = (v << 16) | (v << 8) | v
        x += 1
      }
      y += 1
    }
    px
  }

  def encode(px: Array[Int], w: Int, h: Int, fmt: String, quality: Float = 0.85f): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    fmt match {
      case "jpeg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        val ios = new MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), p)
        ios.close(); writer.dispose()
      case f => ImageIO.write(img, f, bos)
    }
    bos.toByteArray
  }

  /** 64-bit aHash of the DECODED bytes (8x8 grayscale mean threshold) — so
    * lossy re-encodes land within a few bits of the original, exactly the
    * property the near_image family exercises.
    */
  def aHash(bytes: Array[Byte]): Long = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val cell = new Array[Double](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = ((rgb >> 16) & 0xff) * 0.299 + ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114
        cell((y * 8 / h) * 8 + (x * 8 / w)) += gray
        x += 1
      }
      y += 1
    }
    // normalize by true per-cell pixel counts
    val cnt = new Array[Int](64)
    y = 0
    while (y < h) { var x = 0; while (x < w) { cnt((y * 8 / h) * 8 + (x * 8 / w)) += 1; x += 1 }; y += 1 }
    var mean = 0.0
    var i = 0
    while (i < 64) { cell(i) /= math.max(1, cnt(i)); mean += cell(i); i += 1 }
    mean /= 64
    var bits = 0L
    i = 0
    while (i < 64) { if (cell(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  final case class Row(image_id: String, bytes: Array[Byte], w: Int, h: Int,
                       fmt: String, caption: String, phash: Long)
  final case class Truth(image_id: String, family_id: Long, kind: String)

  private val Sizes = Array(16, 32, 64)
  private val Fmts = Array("png", "bmp", "jpeg")

  /** Generate one family (base row + its planted variants). Kind mix per
    * FIXTURES.md: ~5% hot_key; remaining families rotate through
    * exact/near_caption/near_image/substring/distinct.
    */
  def family(g: Gen, familyIdx: Long): (Seq[Row], Seq[Truth]) = {
    val kinds = Array("exact", "near_caption", "near_image", "substring", "distinct")
    val kindPick = g.int(familyIdx, 0, 100)
    val kind: String =
      if (kindPick < 5) "hot_key"
      else kinds(g.int(familyIdx, 99, kinds.length))

    val w = Sizes(g.int(familyIdx, 3, 3))
    val h = Sizes(g.int(familyIdx, 4, 3))
    val fmt = Fmts(g.int(familyIdx, 5, 3))
    val px = pixels(g, familyIdx, w, h)
    val bytes = encode(px, w, h, fmt)
    val ph = aHash(bytes)
    // Hot-key caption is identical across ~5% of families → one mega LSH
    // bucket (FIXTURES.md). Long enough to pass the min-span gate so the
    // skew actually reaches the join.
    val cap = if (kind == "hot_key") "a photo of a nice day" else caption(g, familyIdx)
    def id(v: Int) = f"img${familyIdx}%09d_$v%02d"

    val base = Row(id(0), bytes, w, h, fmt, cap, ph)
    val variants: Seq[Row] = kind match {
      case "exact" =>
        Seq(Row(id(1), bytes, w, h, fmt, cap, ph))
      case "near_caption" =>
        (1 to 2).map(v => Row(id(v), bytes, w, h, fmt, perturbCaption(g, familyIdx, v, cap), ph))
      case "near_image" =>
        (1 to 2).map { v =>
          val q = if (v == 1) 0.80f else 0.90f
          val b2 = encode(px, w, h, "jpeg", q)
          Row(id(v), b2, w, h, "jpeg", cap, aHash(b2))
        }
      case "substring" =>
        // one row's caption is a verbatim substring of the other's
        Seq(Row(id(1), bytes, w, h, fmt,
          cap.split(' ').drop(2).mkString(" "), ph))
      case "hot_key" =>
        Seq.empty // many families share caption "photo" — the mega bucket
      case _ => Seq.empty // distinct
    }
    val rows = base +: variants
    (rows, rows.map(r => Truth(r.image_id, familyIdx, kind)))
  }

  /** Distributed generation of `nFamilies` families → (images, truth). */
  def generate(spark: SparkSession, nFamilies: Long, seed: Long = 42L): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parts = math.max(1, math.min(64, nFamilies / 64)).toInt
    val fams = spark.range(0, nFamilies, 1, parts)
    val rows = fams.mapPartitions { it =>
      val g = Gen(seed)
      it.flatMap(f => family(g, f)._1)
    }
    val truth = fams.mapPartitions { it =>
      val g = Gen(seed)
      it.flatMap(f => family(g, f)._2)
    }
    (rows.toDF(), truth.toDF())
  }

  /** Write (or reuse) a generated corpus under dir/{images,truth}. */
  def materialize(spark: SparkSession, dir: String, nFamilies: Long,
                  seed: Long = 42L): (DataFrame, DataFrame) = {
    val imgPath = s"$dir/images"
    val truthPath = s"$dir/truth"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$imgPath/_SUCCESS"))) {
      val (img, truth) = generate(spark, nFamilies, seed)
      img.write.mode(SaveMode.Overwrite).parquet(imgPath)
      truth.write.mode(SaveMode.Overwrite).parquet(truthPath)
    }
    (spark.read.parquet(imgPath), spark.read.parquet(truthPath))
  }
}
