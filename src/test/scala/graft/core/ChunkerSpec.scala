package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests over deterministic pseudo-random corpora (seeded, so
  * failures are reproducible; the scalatest/scalacheck bridge artifact is not
  * available offline, hence hand-rolled generators).
  */
class ChunkerSpec extends AnyFunSuite {

  private def rndBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  /** 60 corpora: assorted sizes incl. 0, 1, tiny, and multi-chunk; plus
    * low-entropy (constant / repetitive) inputs that stress cut-rule edges.
    */
  private val corpora: Seq[Array[Byte]] = {
    val sizes = Seq(0, 1, 2, 5, 17, 255, 256, 257, 1023, 1024, 1025, 4096, 20000, 65537)
    val random = sizes.zipWithIndex.map { case (n, i) => rndBytes(n, 1000 + i) }
    val zeros = Seq(Array.fill[Byte](5000)(0))
    val const = Seq(Array.fill[Byte](5000)(77))
    val saw = Seq(Array.tabulate[Byte](5000)(i => (i % 251).toByte))
    val repeated = Seq(Array.tabulate[Byte](8192)(i => ((i * 31) % 256).toByte))
    val moreRandom = (0 until 40).map(i => rndBytes(100 + i * 487, 2000 + i))
    random ++ zeros ++ const ++ saw ++ repeated ++ moreRandom
  }

  private val allChunkers: Seq[(String, Chunker)] = Seq(
    "fixed"   -> FixedChunker(1024),
    "ae"      -> AeChunker(1024 + 256), // window 1024
    "fastcdc" -> FastCdcChunker(1024, 7L),
    "rabin"   -> RabinChunker(1024, 7)
  )

  test("boundaries are strictly increasing, end at data.length, empty on empty input") {
    for (data <- corpora; (name, c) <- allChunkers) {
      val bs = c.boundaries(data)
      if (data.isEmpty) assert(bs.isEmpty, name)
      else {
        assert(bs.last == data.length, s"$name last boundary (n=${data.length})")
        assert(bs.head > 0, s"$name first boundary positive")
        bs.sliding(2).foreach {
          case Array(a, b) => assert(a < b, s"$name monotone")
          case _           =>
        }
      }
    }
  }

  test("chunkers are deterministic") {
    val data = rndBytes(50000, 42L)
    allChunkers.foreach { case (name, c) =>
      assert(c.boundaries(data).sameElements(c.boundaries(data)), name)
    }
  }

  test("fixed chunker equals the arithmetic oracle") {
    for (data <- corpora; sz <- Seq(1, 7, 64, 1000, 4096)) {
      val got = FixedChunker(sz).boundaries(data).toSeq
      val want = (sz to data.length by sz) ++
        (if (data.length % sz != 0 && data.nonEmpty) Seq(data.length) else Nil)
      assert(got == want, s"sz=$sz n=${data.length}")
    }
  }

  test("AE non-final chunks are at least window+1 bytes") {
    val c = AeChunker(512 + 256)
    for (data <- corpora) {
      val lens = c.chunks(data).map(_._2)
      lens.dropRight(1).foreach(l => assert(l >= c.window + 1))
    }
  }

  test("FastCDC non-final chunk lengths lie in [min+1, max+1]") {
    val c = FastCdcChunker(256, 99L)
    for (data <- corpora) {
      val lens = c.chunks(data).map(_._2)
      lens.dropRight(1).foreach { l =>
        assert(l >= c.minSize + 1 && l <= c.maxSize + 1, s"len $l")
      }
    }
  }

  test("Rabin non-final chunk lengths lie in [min+1, max+1]") {
    val c = RabinChunker(256, 99)
    for (data <- corpora) {
      val lens = c.chunks(data).map(_._2)
      lens.dropRight(1).foreach { l =>
        assert(l >= c.minSize + 1 && l <= c.maxSize + 1, s"len $l")
      }
    }
  }

  test("FastCDC 8KiB expected size uses the published paper masks") {
    val c = FastCdcChunker(8192, 0L)
    assert(c.shortMask == 0x0003590703530000L)
    assert(c.longMask == 0x0000d90003530000L)
  }

  test("FastCDC generated masks have bits±noice one-bits (non-13-bit case)") {
    val (short, long) = FastCdcChunker.masks(1024, 1, 5L) // 10 bits
    assert(java.lang.Long.bitCount(long) == 9)
    assert(java.lang.Long.bitCount(short) == 11)
  }

  test("gear table is the MMIX LCG orbit and differs by seed") {
    val t1 = FastCdcChunker.gearTable(1L)
    val t2 = FastCdcChunker.gearTable(2L)
    assert(t1.length == 256 && t2.length == 256)
    assert(!t1.sameElements(t2))
    assert(t1(0) == 1L * 6364136223846793005L + 1442695040888963407L)
  }

  test("nextPowerOfTwo matches Rust next_power_of_two") {
    assert(FastCdcChunker.nextPowerOfTwo(0) == 1L)
    assert(FastCdcChunker.nextPowerOfTwo(1) == 1L)
    assert(FastCdcChunker.nextPowerOfTwo(2) == 2L)
    assert(FastCdcChunker.nextPowerOfTwo(3) == 4L)
    assert(FastCdcChunker.nextPowerOfTwo(8192) == 8192L)
    assert(FastCdcChunker.nextPowerOfTwo(8193) == 16384L)
  }

  test("AE batch boundsInRange over the full range matches the streaming scan") {
    val c = AeChunker(300 + 256)
    for (data <- corpora if data.nonEmpty) {
      val streaming = c.boundaries(data).toSeq
      // Batch emits inclusive indices and force-appends len-1; convert and dedupe.
      val batch = c.boundsInRange(data, 0, data.length).map(_ + 1).distinct.toSeq
      assert(batch == streaming, s"n=${data.length}")
    }
  }

  test("content shift-locality: FastCDC boundaries resynchronize after an edit") {
    val c = FastCdcChunker(512, 42L)
    val data = rndBytes(40000, seed = 7L)
    val edited = data.clone()
    edited(10) = (edited(10) ^ 0x55).toByte
    val a = c.boundaries(data).filter(_ > 20000).toSet
    val b = c.boundaries(edited).filter(_ > 20000).toSet
    // Far from the edit the cut points must coincide (content-defined property).
    assert(a == b && a.nonEmpty)
  }

  test("duplicate content yields duplicate chunks (the dedup premise)") {
    val block = rndBytes(8192, seed = 11L)
    val doubled = block ++ block
    val c = FastCdcChunker(512, 42L)
    val chunkBytes = c.chunks(doubled).map { case (off, len) => doubled.slice(off, off + len).toSeq }
    val distinct = chunkBytes.toSet
    // Most chunks from the second copy re-occur from the first copy.
    assert(distinct.size < chunkBytes.length * 3 / 4)
  }

  test("Rabin batch boundsInRange invariants: increasing cuts inside [left-window, right)") {
    val c = RabinChunker(256, 3)
    val data = rndBytes(30000, seed = 3L)
    val bs = c.boundsInRange(data, 1000, 20000)
    assert(bs.nonEmpty)
    bs.sliding(2).foreach {
      case Array(a, b) => assert(a < b)
      case _           =>
    }
    bs.foreach(b => assert(b >= 1000 - c.windowSize && b < 20000))
  }

  test("AE paper-variant window formula") {
    assert(AeChunker.paper(1024).window == math.round(1024 / (math.E - 1)).toInt)
  }
}
