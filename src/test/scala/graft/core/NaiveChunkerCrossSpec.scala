package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks the optimized phase-split production chunkers against naive
  * single-loop re-implementations of the same published cut rules.
  *
  * Why this exists (SURVEY.md C11): the reference validates FastCDC against
  * the third-party fastcdc crate (`src/chunking/tests.rs:13-27`) — though its
  * test file is a dead scratch module with no `#[test]`s and never asserts
  * equality. The crate's published v2020 vectors are pinned to a binary test
  * image that is not present in this offline container, so byte-exact import
  * is impossible here; the crate's algorithm also differs from the
  * reference's variant (different gear table and mask selection), so its
  * vectors would not validate these cut rules anyway. The strongest
  * available independent check is below: the cut rules re-stated in the most
  * literal per-byte form (no cut-point skipping via index jumps, no
  * phase-split mask regimes, independently-derived mask-bit width), compared
  * boundary-for-boundary against the production loops. ChunkerGoldenSpec
  * then freezes the agreed behavior against regression.
  */
class NaiveChunkerCrossSpec extends AnyFunSuite {

  /** FastCDC, literal per-byte form of `fastcdc.rs:98-105`: once `minSize`
    * bytes are in the chunk, roll `hash = (hash << 1) + gear(b)` and cut
    * after the current byte when the regime mask (strict below
    * `expectedSize`, loose at/after) hits, or when the chunk reaches
    * `maxSize` (that byte included, unhashed — the decision precedes it).
    */
  private def naiveFastCdc(data: Array[Byte], expected: Int, seed: Long): Array[Int] = {
    val min = expected / 4
    val max = expected * 8
    // Independent gear derivation: 256 successive Knuth-MMIX LCG states.
    val gear = {
      var x = seed
      Array.fill(256) { x = x * 6364136223846793005L + 1442695040888963407L; x }
    }
    // Independent mask-width derivation: ceil(log2(expected)) one-bits ± 1,
    // grown by the same OR-1-rotate walk; 13-bit case = published paper masks.
    val bits = if (expected <= 1) 1 else 32 - Integer.numberOfLeadingZeros(expected - 1)
    val (shortMask, longMask) =
      if (bits == 13) (0x0003590703530000L, 0x0000d90003530000L)
      else {
        var m = 0L
        var x = seed
        def grow(target: Int): Long = {
          while (java.lang.Long.bitCount(m) < target) {
            x = x * 6364136223846793005L + 1442695040888963407L
            m = java.lang.Long.rotateLeft(m | 1L, (x & 0x3f).toInt)
          }
          m
        }
        val lo = grow(bits - 1)
        (grow(bits + 1), lo)
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val n = data.length
    if (n == 0) return Array.emptyIntArray
    var start = 0
    var hash = 0L
    var i = 0
    while (i < n) {
      val pos = i - start
      if (pos == max) { // forced cut: include this byte, don't hash it
        out += i + 1; start = i + 1; hash = 0L
      } else {
        if (pos >= min) {
          hash = (hash << 1) + gear(data(i) & 0xff)
          val mask = if (pos < expected) shortMask else longMask
          if ((hash & mask) == 0L) { out += i + 1; start = i + 1; hash = 0L }
        }
      }
      i += 1
    }
    if (out.isEmpty || out.last != n) out += n
    out.toArray
  }

  /** Rabin, literal per-byte form of `rabin.rs:148-214`: roll
    * `hash = hash * alpha + b` (u32 wrap), evict the byte leaving the
    * window via `b * alpha^window`, cut after the current byte once the
    * chunk holds at least `minSize` bytes and `((hash ^ seed) & mask) == 0`;
    * forced cut at `maxSize` decided before hashing the current byte.
    */
  private def naiveRabin(data: Array[Byte], expected: Int, seed: Int): Array[Int] = {
    val window = expected / 4 - 1
    val min = expected / 4
    val max = expected * 4
    val alpha = 1664525
    val bits = if (expected <= 1) 1 else 32 - Integer.numberOfLeadingZeros(expected - 1)
    val mask = (1 << bits) - 1
    val alphaPowWindow = Iterator.fill(window)(alpha).foldLeft(1)(_ * _) // wraps like u32
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val n = data.length
    if (n == 0) return Array.emptyIntArray
    var start = 0
    var hash = 0
    var i = 0
    while (i < n) {
      val pos = i - start
      if (pos == max) { // forced cut: include this byte, don't hash it
        out += i + 1; start = i + 1; hash = 0
      } else {
        hash = hash * alpha + (data(i) & 0xff)
        if (pos >= window) hash -= (data(i - window) & 0xff) * alphaPowWindow
        if (pos >= min && ((hash ^ seed) & mask) == 0) {
          out += i + 1; start = i + 1; hash = 0
        }
      }
      i += 1
    }
    if (out.isEmpty || out.last != n) out += n
    out.toArray
  }

  private def rndBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  private val corpora: Seq[(String, Array[Byte])] =
    Seq(
      "zeros" -> Array.fill[Byte](5000)(0),
      "ones" -> Array.fill[Byte](3000)(1),
      "saw" -> Array.tabulate[Byte](8192)(i => ((i * 31) % 256).toByte),
      "ascii" -> ("the quick brown fox jumps over the lazy dog " * 200).getBytes,
      "empty" -> Array.emptyByteArray,
      "one-byte" -> Array[Byte](42)) ++
      (1 to 40).map(k => s"rnd$k" -> rndBytes(37 * k * k % 50021 + k, 1000L + k))

  private val params = Seq((64, 42L), (256, 99L), (1024, 7L), (300, 0L), (8192, 5L))

  test("FastCDC phase-split production loop == naive per-byte rule") {
    for ((sz, seed) <- params; (cn, data) <- corpora) {
      val prod = FastCdcChunker(sz, seed).boundaries(data)
      val naive = naiveFastCdc(data, sz, seed)
      assert(prod.sameElements(naive), s"fastcdc/$sz/$seed/$cn")
    }
  }

  test("Rabin phase-split production loop == naive per-byte rule") {
    for ((sz, seed) <- params; (cn, data) <- corpora) {
      val prod = RabinChunker(sz, seed.toInt).boundaries(data)
      val naive = naiveRabin(data, sz, seed.toInt)
      assert(prod.sameElements(naive), s"rabin/$sz/$seed/$cn")
    }
  }
}
