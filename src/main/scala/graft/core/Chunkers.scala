package graft.core

/** Pure-JVM content-defined chunking (CDC) cores — zero Spark dependencies.
  *
  * Re-derives the *semantics* (cut rules, constants, state machines) of the four
  * chunkers in the reference repo `letit6E/cdc-algorithms`; the implementation is
  * new Scala written for JIT-friendly single-pass scans over `Array[Byte]`.
  *
  * Boundary convention: [[Chunker.boundaries]] returns the EXCLUSIVE end offset of
  * every chunk over the input, strictly increasing, final element == `data.length`
  * (the trailing remainder is always emitted as a — possibly short — final chunk,
  * matching the reference's streaming protocol where EOF flushes the tail:
  * reference `src/chunking/chunker.rs:3-7` Working/Finished pull protocol).
  *
  * Algorithms and their reference counterparts:
  *  - [[FixedChunker]]   — `src/chunking/fixed.rs:5-53`
  *  - [[AeChunker]]      — `src/chunking/ae.rs:96-149` (streaming), `ae.rs:31-53` (batch)
  *  - [[FastCdcChunker]] — `src/chunking/fastcdc.rs:50-134`, gear table `fastcdc.rs:9-21`,
  *                         masks `fastcdc.rs:23-48`
  *  - [[RabinChunker]]   — `src/chunking/rabin.rs:131-216` (streaming), `rabin.rs:61-90`
  *                         (batch), parameter block `rabin.rs:11-33`
  */
sealed trait Chunker extends Serializable {

  /** Exclusive end offsets of each chunk; empty input => empty result. */
  def boundaries(data: Array[Byte]): Array[Int]

  /** (offset, length) pairs derived from [[boundaries]]. */
  final def chunks(data: Array[Byte]): Array[(Int, Int)] = {
    val bs = boundaries(data)
    val out = new Array[(Int, Int)](bs.length)
    var last = 0
    var i = 0
    while (i < bs.length) {
      out(i) = (last, bs(i) - last)
      last = bs(i)
      i += 1
    }
    out
  }
}

object Chunker {

  /** Named algorithm registry used by the Spark layer ("fixed"|"ae"|"fastcdc"|"rabin"). */
  def apply(algo: String, expectedSize: Int, seed: Long = 0L): Chunker = algo match {
    case "fixed"   => FixedChunker(expectedSize)
    case "ae"      => AeChunker(expectedSize)
    case "fastcdc" => FastCdcChunker(expectedSize, seed)
    case "rabin"   => RabinChunker(expectedSize, seed.toInt)
    case other     => throw new IllegalArgumentException(s"unknown chunker algo: $other")
  }
}

/** Fixed-size splitting every `chunkSize` bytes; the content-insensitive baseline.
  * Reference: `src/chunking/fixed.rs:20-52` (byte-counter with remainder tail).
  */
final case class FixedChunker(chunkSize: Int) extends Chunker {
  require(chunkSize > 0, "chunkSize must be positive")

  override def boundaries(data: Array[Byte]): Array[Int] = {
    val n = data.length
    if (n == 0) return Array.emptyIntArray
    val full = (n + chunkSize - 1) / chunkSize
    val out = new Array[Int](full)
    var i = 0
    while (i < full) {
      val end = (i + 1).toLong * chunkSize
      out(i) = if (end > n) n else end.toInt
      i += 1
    }
    out
  }
}

/** AE — Asymmetric Extremum CDC ("AE: An Asymmetric Extremum Content Defined
  * Chunking Algorithm for Fast and Bandwidth-Efficient Data Deduplication").
  *
  * Cut rule: scanning left to right within the current chunk, track the maximum
  * byte value and its position; when the scan reaches `window` bytes past the
  * current maximum without a new maximum appearing, cut AFTER the current byte.
  * Reference: streaming `src/chunking/ae.rs:112-141`; window constant
  * `ae.rs:26` (`expected_size - 256` — the repo's variant; the paper formula
  * `expected/(e-1)` is commented out at `ae.rs:27` and available here via
  * [[AeChunker.paper]]).
  */
final case class AeChunker(window: Int) extends Chunker {
  require(window > 0, "window must be positive")

  override def boundaries(data: Array[Byte]): Array[Int] = {
    val n = data.length
    if (n == 0) return Array.emptyIntArray
    val out = new IntVec
    // Chunk-local state (reset after every cut) — mirrors ae.rs:101-103.
    var maxVal = 0
    var maxPos = 0
    var pos = 0
    var i = 0
    while (i < n) {
      val v = data(i) & 0xff
      if (v > maxVal) {
        maxVal = v
        maxPos = pos
      } else if (pos == maxPos + window) {
        out += i + 1
        maxVal = 0
        maxPos = 0
        pos = -1 // incremented to 0 below: next byte starts the next chunk
      }
      pos += 1
      i += 1
    }
    if (out.isEmpty || out.last != n) out += n
    out.toArray
  }

  /** Batch boundary scan over `[left, right)` with `window` lookback before `left`,
    * for split-invariant parallel chunking. Returns INCLUSIVE cut indices
    * (chunk = bytes `(prev, idx]`), appending `n-1` when `right == n`.
    * Reference: `src/chunking/ae.rs:31-53` (lookback `ae.rs:33`, forced tail
    * `ae.rs:49-51`). Note the deliberate semantic quirks replicated from the
    * reference batch variant: the extremum is seeded from the byte at the scan
    * start (not a zero sentinel), and after a cut at `i` the extremum re-seeds
    * from `i+1` directly.
    */
  def boundsInRange(data: Array[Byte], left: Int, right: Int): Array[Int] = {
    val out = new IntVec
    val start = math.max(0, left - window)
    if (start >= right) {
      if (right == data.length && data.length > 0) out += data.length - 1
      return out.toArray
    }
    var maxVal = data(start) & 0xff
    var maxPos = start
    var i = start
    while (i < right) {
      val v = data(i) & 0xff
      if (v > maxVal) {
        maxVal = v
        maxPos = i
      } else if (i == maxPos + window) {
        out += i
        if (i + 1 != right) {
          maxVal = data(i + 1) & 0xff
          maxPos = i + 1
        }
      }
      i += 1
    }
    if (right == data.length) out += data.length - 1
    out.toArray
  }
}

object AeChunker {

  /** Repo-variant window: `expected - 256` (reference `ae.rs:26`). */
  def apply(expectedSize: Int): AeChunker = {
    require(expectedSize > 256, s"AE repo-variant needs expectedSize > 256, got $expectedSize")
    new AeChunker(expectedSize - 256)
  }

  /** Paper-variant window: `round(expected / (e - 1))` (reference `ae.rs:27`, commented out). */
  def paper(expectedSize: Int): AeChunker =
    new AeChunker(math.round(expectedSize / (math.E - 1)).toInt)
}

/** FastCDC — gear-hash CDC with normalized chunking ("FastCDC: a Fast and
  * Efficient Content-Defined Chunking Approach for Data Deduplication").
  *
  * Per byte (only once `minSize` bytes are in the chunk — cut-point skipping):
  * `hash = (hash << 1) + gear(b)`; cut when
  *   - before `expectedSize`: `(hash & shortMask) == 0` (strict mask), or
  *   - at/after `expectedSize`: `(hash & longMask) == 0` (loose mask), or
  *   - the chunk reached `maxSize`.
  * Reference: `src/chunking/fastcdc.rs:98-105`; min/max = expected/4 and
  * expected*8 (`fastcdc.rs:68-69`); masks `fastcdc.rs:23-48` (hard-coded paper
  * masks for the 13-bit/8KiB case at `fastcdc.rs:25-28`); gear table from a
  * Knuth-MMIX LCG (`fastcdc.rs:9-21`).
  */
final case class FastCdcChunker(expectedSize: Int, seed: Long) extends Chunker {
  require(expectedSize >= 4, "expectedSize must be >= 4")

  val minSize: Int = expectedSize / 4
  val maxSize: Int = expectedSize * 8
  private val gear: Array[Long] = FastCdcChunker.gearTable(seed)
  val (shortMask: Long, longMask: Long) = FastCdcChunker.masks(expectedSize, 1, seed)

  override def boundaries(data: Array[Byte]): Array[Int] = {
    val n = data.length
    if (n == 0) return Array.emptyIntArray
    val out = new IntVec
    val g = gear
    // Phase-split scan (cut semantics identical to the single-loop form,
    // pinned by ChunkerGoldenSpec): the min-size region is skipped by
    // advancing the index instead of branching per byte, and the
    // short-mask / long-mask regimes run as separate tight loops, so each
    // inner loop carries one mask test and no position comparisons.
    var start = 0
    var done = false
    while (!done) {
      var cut = -1
      var p = start + minSize // cut-point skipping: no hashing below minSize
      if (p < n) {
        var hash = 0L
        val e1 = math.min(start.toLong + expectedSize, n.toLong).toInt
        while (cut < 0 && p < e1) {
          hash = (hash << 1) + g(data(p) & 0xff)
          if ((hash & shortMask) == 0L) cut = p + 1
          p += 1
        }
        if (cut < 0) {
          val e2 = math.min(start.toLong + maxSize, n.toLong).toInt
          while (cut < 0 && p < e2) {
            hash = (hash << 1) + g(data(p) & 0xff)
            if ((hash & longMask) == 0L) cut = p + 1
            p += 1
          }
          // pos == maxSize: forced cut including the current byte
          if (cut < 0 && p < n) cut = p + 1
        }
      }
      if (cut < 0) { out += n; done = true }
      else { out += cut; start = cut; if (cut == n) done = true }
    }
    out.toArray
  }
}

object FastCdcChunker {
  private val LcgAlpha = 6364136223846793005L // Knuth MMIX multiplier
  private val LcgGamma = 1442695040888963407L // Knuth MMIX increment

  /** 256-entry gear table: successive states of the MMIX LCG seeded by `seed`.
    * Reference: `src/chunking/fastcdc.rs:9-21`.
    */
  def gearTable(seed: Long): Array[Long] = {
    val t = new Array[Long](256)
    var cur = seed
    var i = 0
    while (i < 256) {
      cur = cur * LcgAlpha + LcgGamma // Long arithmetic wraps like u64
      t(i) = cur
      i += 1
    }
    t
  }

  /** (shortMask, longMask) with `bits ± noice` one-bits, built by OR-1-then-rotate
    * driven by the same LCG; the 13-bit (8 KiB) case returns the published paper
    * masks. Reference: `src/chunking/fastcdc.rs:23-48`.
    */
  def masks(expectedSize: Int, noice: Int, seed: Long): (Long, Long) = {
    val bits = java.lang.Long.bitCount(nextPowerOfTwo(expectedSize) - 1L)
    if (bits == 13) return (0x0003590703530000L, 0x0000d90003530000L)
    var mask = 0L
    var cur = seed
    while (java.lang.Long.bitCount(mask) < bits - noice) {
      cur = cur * LcgAlpha + LcgGamma
      mask = java.lang.Long.rotateLeft(mask | 1L, (cur & 0x3f).toInt)
    }
    val longMask = mask
    while (java.lang.Long.bitCount(mask) < bits + noice) {
      cur = cur * LcgAlpha + LcgGamma
      mask = java.lang.Long.rotateLeft(mask | 1L, (cur & 0x3f).toInt)
    }
    (mask, longMask)
  }

  private[core] def nextPowerOfTwo(v: Int): Long = {
    require(v >= 0)
    if (v <= 1) 1L
    else java.lang.Long.highestOneBit((v - 1).toLong) << 1
  }
}

/** Rabin — classic rolling-fingerprint CDC over a sliding byte window in
  * 32-bit wrapping arithmetic.
  *
  * Per byte: `hash = hash * alpha + b` (u32 wrap); once the window is full the
  * byte leaving the window is removed in O(1) via `powTable(b) = b * alpha^window`;
  * cut when the chunk has at least `minSize` bytes and
  * `((hash ^ seed) & mask) == 0`; forced cut when the chunk reaches `maxSize`
  * (checked before the hash update, so a forced chunk spans `maxSize + 1` bytes).
  * Reference: streaming `src/chunking/rabin.rs:148-214`; constants window =
  * expected/4 - 1, min = expected/4, max = expected*4, alpha = 1664525
  * (`rabin.rs:46-49`); parameter block + mask `rabin.rs:11-33`.
  */
final case class RabinChunker(expectedSize: Int, seed: Int) extends Chunker {
  require(expectedSize >= 8, "expectedSize must be >= 8")

  val windowSize: Int = expectedSize / 4 - 1
  val minSize: Int = expectedSize / 4
  val maxSize: Int = expectedSize * 4
  val alpha: Int = 1664525
  val mask: Int = (FastCdcChunker.nextPowerOfTwo(expectedSize) - 1L).toInt
  // powTable(b) = b * alpha^windowSize in wrapping Int arithmetic (rabin.rs:21-24).
  private val powTable: Array[Int] = {
    var a = 1
    var e = windowSize
    var base = alpha
    while (e > 0) { // wrapping pow by squaring
      if ((e & 1) == 1) a *= base
      base *= base
      e >>= 1
    }
    Array.tabulate(256)(b => b * a)
  }

  override def boundaries(data: Array[Byte]): Array[Int] = {
    val n = data.length
    if (n == 0) return Array.emptyIntArray
    val out = new IntVec
    val pt = powTable
    // Phase-split scan (cut semantics identical to the single-loop form,
    // pinned by ChunkerGoldenSpec): roll-in (no eviction), one fill step at
    // pos == windowSize (eviction, no cut test — windowSize == minSize - 1),
    // then the steady loop with one eviction + one mask test per byte and no
    // position comparisons; forced cut at pos == maxSize hashes nothing
    // (rabin.rs:157-174 cuts before updating).
    // Hot-loop shape, chosen by measurement (r8): field reads hoisted to
    // locals, the mask test strength-reduced ((h ^ seed) & mask == 0 ⇔
    // (h & mask) == (seed & mask) precomputed), the leaving byte tracked by
    // a second running index, and ONE loop condition — a found cut shrinks
    // the end sentinel instead of adding a per-byte `cut < 0` test. More
    // aggressive reformulations were tried and did NOT beat this on the
    // bench host: 4×-unrolled serial, dual independent even/odd chains
    // (h[x+2] = α²·h[x] + …), a four-step carried recurrence with
    // tree-summed table terms, and 8-byte long loads all measured equal or
    // slower — the host is ALU/load-throughput-bound, so rabin's per-byte
    // op count (two byte streams + table eviction + imul) sets a ~0.6 GB/s
    // single-thread ceiling there (fastcdc's single-stream shift/add runs
    // ~2× for the same reason). Throughput at scale comes from blob
    // parallelism, not this loop.
    val al = alpha
    val mk = mask
    val tgt = seed & mask
    val win = windowSize
    var start = 0
    var done = false
    while (!done) {
      var cut = -1
      var hash = 0
      val rollEnd = math.min(start.toLong + win, n.toLong).toInt
      var i = start
      while (i < rollEnd) {
        hash = hash * al + (data(i) & 0xff)
        i += 1
      }
      if (i < n && i == start + win) {
        // fill step @ q0 (eviction, no cut test — windowSize == minSize - 1)
        hash = hash * al + (data(i) & 0xff) - pt(data(start) & 0xff)
        i += 1
        val steadyEnd = math.min(start.toLong + maxSize, n.toLong).toInt
        var j = i - win
        var h = hash
        var iEnd = steadyEnd
        while (i < iEnd) {
          h = h * al + (data(i) & 0xff) - pt(data(j) & 0xff)
          i += 1
          j += 1
          if ((h & mk) == tgt) {
            cut = i // after the increment, i IS the exclusive cut offset
            iEnd = i
          }
        }        // pos == maxSize: forced cut including the (unhashed) current byte
        if (cut < 0 && i < n) cut = i + 1
      }
      if (cut < 0) { out += n; done = true }
      else { out += cut; start = cut; if (cut == n) done = true }
    }
    out.toArray
  }

  /** Batch boundary scan over `[left, right)` with window lookback; INCLUSIVE cut
    * indices, no forced max-size cut, no tail append — replicating the reference
    * batch variant's quirks exactly (including `lastPos = i - 1` after a cut,
    * which restarts the window two bytes earlier than the streaming form).
    * Reference: `src/chunking/rabin.rs:61-90`.
    */
  def boundsInRange(data: Array[Byte], left: Int, right: Int): Array[Int] = {
    val out = new IntVec
    val start = math.max(0, left - windowSize)
    var hash = 0
    var lastPos = start
    // The reference re-creates its window deque after each cut; we track the
    // index window implicitly: bytes (i - windowSize) .. i - 1 once filled.
    var windowStart = start // index of the oldest byte currently in the window
    var i = start
    while (i < right) {
      val v = data(i) & 0xff
      hash = hash * alpha + v
      if (i >= lastPos + windowSize) {
        val leaving = data(windowStart) & 0xff
        windowStart += 1
        hash -= powTable(leaving)
        if (i >= lastPos + minSize && ((hash ^ seed) & mask) == 0) {
          out += i
          lastPos = i - 1
          hash = 0
          // The cut byte is NOT pushed into the next window (the reference
          // `continue`s past its push_back at rabin.rs:86-88).
          windowStart = i + 1
        }
      }
      i += 1
    }
    out.toArray
  }
}

/** Minimal growable int buffer (avoids boxing in the per-byte hot path). */
private[core] final class IntVec {
  private var arr = new Array[Int](16)
  private var n = 0
  def +=(v: Int): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
    arr(n) = v
    n += 1
  }
  def isEmpty: Boolean = n == 0
  def last: Int = arr(n - 1)
  def toArray: Array[Int] = java.util.Arrays.copyOf(arr, n)
}
