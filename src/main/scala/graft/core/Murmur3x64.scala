package graft.core

/** MurmurHash3 x64 128-bit variant (Austin Appleby, public domain).
  *
  * Reimplemented from the published algorithm; behaviourally equivalent to
  * the reference's vendored copy (/root/reference/MurmurHash3.cpp:260-337),
  * which the reference feeds every feature shingle through with seed
  * 0x97c29b3a (/root/reference/EigenWord.h:23, EigenWord.cpp:17-26).
  *
  * Spark's built-in `hash()`/`xxhash64()` are different functions
  * (murmur3_x86_32 / xxHash64), so fingerprint parity with the reference
  * config requires this exact hash (SURVEY.md §2.3 G3, §2.11).
  */
object Murmur3x64 {

  @inline private def rotl64(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  private val C1 = 0x87c37b91114253d5L
  private val C2 = 0x4cf5ad432745937fL

  /** Full 128-bit hash → (h1, h2) as two signed Longs (bit-identical to the
    * C `uint64_t out[2]`). `seed` is zero-extended like the C `uint32_t`.
    */
  def hash128(data: Array[Byte], seed: Long): (Long, Long) =
    hash128(data, 0, data.length, seed)

  /** Range variant — hashes `data[off, off+len)`; bit-identical to hashing a
    * copy of that range. Lets hot paths (per-shingle hashing over a reusable
    * encode buffer) avoid a byte[] allocation per hash call.
    */
  def hash128(data: Array[Byte], off: Int, len: Int, seed: Long): (Long, Long) = {
    val nblocks = len / 16
    var h1 = seed & 0xffffffffL
    var h2 = seed & 0xffffffffL

    @inline def getLong(i0: Int): Long = {
      val i = off + i0
      // little-endian 8-byte read at offset i
      (data(i) & 0xffL) |
        ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) |
        ((data(i + 3) & 0xffL) << 24) |
        ((data(i + 4) & 0xffL) << 32) |
        ((data(i + 5) & 0xffL) << 40) |
        ((data(i + 6) & 0xffL) << 48) |
        ((data(i + 7) & 0xffL) << 56)
    }

    var b = 0
    while (b < nblocks) {
      var k1 = getLong(b * 16)
      var k2 = getLong(b * 16 + 8)
      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }

    // tail
    val tail = off + nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      if (rem >= 15) k2 ^= (data(tail + 14) & 0xffL) << 48
      if (rem >= 14) k2 ^= (data(tail + 13) & 0xffL) << 40
      if (rem >= 13) k2 ^= (data(tail + 12) & 0xffL) << 32
      if (rem >= 12) k2 ^= (data(tail + 11) & 0xffL) << 24
      if (rem >= 11) k2 ^= (data(tail + 10) & 0xffL) << 16
      if (rem >= 10) k2 ^= (data(tail + 9) & 0xffL) << 8
      k2 ^= data(tail + 8) & 0xffL
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem >= 1) {
      if (rem >= 8) k1 ^= (data(tail + 7) & 0xffL) << 56
      if (rem >= 7) k1 ^= (data(tail + 6) & 0xffL) << 48
      if (rem >= 6) k1 ^= (data(tail + 5) & 0xffL) << 40
      if (rem >= 5) k1 ^= (data(tail + 4) & 0xffL) << 32
      if (rem >= 4) k1 ^= (data(tail + 3) & 0xffL) << 24
      if (rem >= 3) k1 ^= (data(tail + 2) & 0xffL) << 16
      if (rem >= 2) k1 ^= (data(tail + 1) & 0xffL) << 8
      k1 ^= data(tail) & 0xffL
      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= len.toLong
    h2 ^= len.toLong
    h1 += h2
    h2 += h1
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 += h2
    h2 += h1
    (h1, h2)
  }

  /** 64-bit slice (h1) of the 128-bit hash — the graft's shingle hash. */
  def hash64(data: Array[Byte], seed: Long): Long = hash128(data, seed)._1

  def hash128(s: String, seed: Long): (Long, Long) =
    hash128(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  def hash64(s: String, seed: Long): Long = hash128(s, seed)._1

  /** splitmix64 — deterministic per-index PRNG stream used for fixture
    * generation and MinHash permutation parameters (public algorithm,
    * Steele et al., "Fast Splittable Pseudorandom Number Generators").
    */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
