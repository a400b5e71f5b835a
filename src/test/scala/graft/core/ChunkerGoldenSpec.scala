package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Frozen cut points: FNV-1a hashes of the exact boundary arrays on fixed
  * corpora, captured from the audited implementation. Any rewrite of a
  * chunker hot loop must reproduce these bit-for-bit — invariant tests
  * (sizes, monotonicity) can't catch an off-by-one that shifts every cut.
  */
class ChunkerGoldenSpec extends AnyFunSuite {

  private def fnv(bs: Array[Int]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bs.length) {
      h ^= bs(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def rndBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  private val corpora: Map[String, Array[Byte]] = Map(
    "rnd64k" -> rndBytes(65537, 11L),
    "rnd20k" -> rndBytes(20000, 12L),
    "rnd1k" -> rndBytes(1023, 13L),
    "zeros" -> Array.fill[Byte](5000)(0),
    "saw" -> Array.tabulate[Byte](8192)(i => ((i * 31) % 256).toByte))

  // (algo, expectedSize, seed, corpus) -> (boundary count, FNV-1a of boundaries)
  private val golden: Map[(String, Int, Long, String), (Int, Long)] = Map(
    ("ae", 1280, 0L, "rnd64k") -> (51, 0x893ab0154037900eL),
    ("ae", 1280, 0L, "rnd20k") -> (15, 0x2df34e7ef186e3bbL),
    ("ae", 1280, 0L, "rnd1k") -> (1, 0xaf61724c85fdd26eL),
    ("ae", 1280, 0L, "zeros") -> (5, 0xe4e3462b8926daefL),
    ("ae", 1280, 0L, "saw") -> (7, 0x3a4ea58d1b2661dfL),
    ("ae", 512, 0L, "rnd64k") -> (163, 0xd201c3823f1bb59eL),
    ("ae", 512, 0L, "rnd20k") -> (52, 0x2246adadc9aff5b9L),
    ("ae", 512, 0L, "rnd1k") -> (3, 0xe952a316303c6682L),
    ("ae", 512, 0L, "zeros") -> (20, 0x7d2d7a1823ab0ff9L),
    ("ae", 512, 0L, "saw") -> (17, 0xabb3d4fd85008fdfL),
    ("fastcdc", 1024, 7L, "rnd64k") -> (55, 0x51ba069b4d478f68L),
    ("fastcdc", 1024, 7L, "rnd20k") -> (19, 0x8b0a13382d48773eL),
    ("fastcdc", 1024, 7L, "rnd1k") -> (2, 0x406c907b1629dd3L),
    ("fastcdc", 1024, 7L, "zeros") -> (1, 0xaf71454c8618b5f7L),
    ("fastcdc", 1024, 7L, "saw") -> (17, 0xabd986d793b8e0fL),
    ("fastcdc", 256, 99L, "rnd64k") -> (216, 0xf5fa8c07f13bb4c2L),
    ("fastcdc", 256, 99L, "rnd20k") -> (66, 0xf502a7231b6aad32L),
    ("fastcdc", 256, 99L, "rnd1k") -> (5, 0xe89e83ade972c189L),
    ("fastcdc", 256, 99L, "zeros") -> (3, 0x52f5db3fd575f446L),
    ("fastcdc", 256, 99L, "saw") -> (18, 0xc287182b2fa85317L),
    ("rabin", 1024, 7L, "rnd64k") -> (56, 0xdb5560e0508b5de0L),
    ("rabin", 1024, 7L, "rnd20k") -> (14, 0xb327abad11140ecfL),
    ("rabin", 1024, 7L, "rnd1k") -> (1, 0xaf61724c85fdd26eL),
    ("rabin", 1024, 7L, "zeros") -> (2, 0x3e9e9a07e33565acL),
    ("rabin", 1024, 7L, "saw") -> (2, 0x3e6f2207e2e4bcc4L),
    ("rabin", 256, 99L, "rnd64k") -> (221, 0x6ffc41212458c1aaL),
    ("rabin", 256, 99L, "rnd20k") -> (58, 0x381d05586d602407L),
    ("rabin", 256, 99L, "rnd1k") -> (7, 0xff9653c43ea949a2L),
    ("rabin", 256, 99L, "zeros") -> (5, 0xe4e3462b8926daefL),
    ("rabin", 256, 99L, "saw") -> (33, 0xa6b54f9d3b17783fL))

  test("cut points match the frozen golden hashes") {
    for (((algo, sz, seed, cn), (wantN, wantH)) <- golden) {
      val bs = Chunker(algo, sz, seed).boundaries(corpora(cn))
      assert(bs.length == wantN, s"$algo/$sz/$cn boundary count")
      assert(fnv(bs) == wantH, s"$algo/$sz/$cn boundary hash")
    }
  }
}
