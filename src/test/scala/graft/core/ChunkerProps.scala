package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over arbitrary (including adversarial low-entropy)
  * inputs — the invariant layer under the example-based ChunkerSpec
  * (SURVEY.md §7.8).
  */
object ChunkerProps extends Properties("Chunker") {

  private val algos = Seq("fixed", "ae", "fastcdc", "rabin")

  /** Mix of random, constant, and short-period payloads, length 0..16384. */
  private val payloads: Gen[Array[Byte]] = Gen.frequency(
    4 -> (for {
      n <- Gen.choose(0, 16384)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield {
      val a = new Array[Byte](n)
      new java.util.Random(seed).nextBytes(a)
      a
    }),
    1 -> (for {
      n <- Gen.choose(0, 16384)
      b <- Gen.choose(0, 255)
    } yield Array.fill(n)(b.toByte)),
    1 -> (for {
      n <- Gen.choose(0, 16384)
      p <- Gen.choose(1, 7)
    } yield Array.tabulate(n)(i => (i % p).toByte)))

  private val sizes: Gen[Int] = Gen.oneOf(512, 1024, 4096)

  property("boundaries strictly increasing, last == length, empty iff empty") =
    forAll(payloads, sizes) { (data, sz) =>
      algos.forall { algo =>
        val bs = Chunker(algo, sz, 42L).boundaries(data)
        if (data.isEmpty) bs.isEmpty
        else bs.zip(bs.tail).forall { case (a, b) => a < b } &&
          bs.head > 0 && bs.last == data.length
      }
    }

  property("deterministic across invocations") =
    forAll(payloads, sizes) { (data, sz) =>
      algos.forall { algo =>
        val c = Chunker(algo, sz, 42L)
        c.boundaries(data).sameElements(c.boundaries(data))
      }
    }

  property("chunks reconstruct the payload exactly") =
    forAll(payloads, sizes) { (data, sz) =>
      algos.forall { algo =>
        val spans = Chunker(algo, sz, 42L).chunks(data)
        spans.map(_._2.toLong).sum == data.length &&
          spans.foldLeft(0) { case (expect, (off, len)) =>
            if (off == expect) off + len else Int.MinValue
          } == data.length || data.isEmpty
      }
    }

  property("fixed == arithmetic oracle") =
    forAll(payloads, sizes) { (data, sz) =>
      val bs = FixedChunker(sz).boundaries(data).toSeq
      val oracle = (sz to data.length by sz) ++
        (if (data.length % sz != 0 && data.nonEmpty) Seq(data.length) else Nil)
      bs == oracle
    }

  property("FastCDC non-final chunks lie within [min+1, max+1]") =
    forAll(payloads, sizes) { (data, sz) =>
      val c = FastCdcChunker(sz, 42L)
      val lens = c.chunks(data).dropRight(1).map(_._2)
      lens.forall(l => l >= c.minSize + 1 && l <= c.maxSize + 1)
    }

  // The dedup-enabling invariant, stated deterministically: chunkers are
  // CAUSAL — a cut depends only on bytes at or before it — so two streams
  // sharing a prefix produce identical cuts inside that prefix. (The
  // previous form of this property asserted that a 3x-repeated random block
  // must yield duplicate chunk spans; that is only probabilistically true —
  // cut sequences of shifted repeats merge only when a cut lands on the
  // exact relative offset of an earlier one — and flaked roughly once per
  // few hundred random blocks.)
  property("prefix causality: shared prefix ⇒ identical cuts inside it (dedup premise)") =
    forAll(payloads, payloads, sizes) { (prefix, suffix, sz) =>
      algos.forall { algo =>
        val c = Chunker(algo, sz, 42L)
        val whole = c.boundaries(prefix ++ suffix).filter(_ < prefix.length).toSeq
        val alone = c.boundaries(prefix).filter(_ < prefix.length).toSeq
        whole == alone
      }
    }

  property("repeated blocks eventually resync to duplicate chunk spans (fixed corpus)") =
    forAll(Gen.oneOf(2000, 3000, 5000, 8000)) { n =>
      val block = new Array[Byte](n)
      new java.util.Random(5L).nextBytes(block)
      val data = block ++ block ++ block ++ block ++ block ++ block
      val c = FastCdcChunker(512, 42L)
      val hashes = c.chunks(data).map { case (off, len) =>
        java.util.Arrays.hashCode(java.util.Arrays.copyOfRange(data, off, off + len))
      }
      hashes.distinct.length < hashes.length
    }

  property("seed changes FastCDC cut points on random data") =
    forAll(Gen.choose(4096, 16384)) { n =>
      val a = new Array[Byte](n)
      new java.util.Random(7L).nextBytes(a)
      val b1 = FastCdcChunker(512, 1L).boundaries(a).toSeq
      val b2 = FastCdcChunker(512, 2L).boundaries(a).toSeq
      b1 != b2 || b1.size <= 2
    }

  property("edit locality: boundaries far after a point edit are unchanged") = Prop.forAll(
    Gen.choose(8192, 16384)) { n =>
    val a = new Array[Byte](n)
    new java.util.Random(13L).nextBytes(a)
    val b = a.clone()
    b(100) = (b(100) ^ 0x5a).toByte
    val c = FastCdcChunker(256, 42L)
    val ba = c.boundaries(a).filter(_ > n / 2).toSeq
    val bb = c.boundaries(b).filter(_ > n / 2).toSeq
    ba == bb // resynchronized well before the midpoint
  }
}
