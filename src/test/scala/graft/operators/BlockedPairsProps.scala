package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The salted two-stage pair emission (blockUnits → unitRows) must
  * reproduce the naive single-pass emission EXACTLY as a multiset — same
  * ordered pairs, same (id, -1) size markers — for any group size,
  * including groups far beyond one block (the hot-shingle fan-out path).
  */
object BlockedPairsProps extends Properties("BlockedPairs") {

  // group sizes straddle the 64-id block: empty, single, sub-block, exact
  // multiples, and several-blocks-plus-remainder
  private val groups: Gen[Array[Long]] = for {
    n <- Gen.frequency(3 -> Gen.choose(0, 70), 2 -> Gen.choose(120, 300),
      1 -> Gen.oneOf(64, 128, 192))
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield {
    val r = new java.util.Random(seed)
    // non-negative ids with duplicates possible (several shingle groups can
    // list the same doc once each — within one group ids are unique in the
    // real pipeline, but the emission must not care)
    Array.fill(n)(r.nextLong() >>> 1)
  }

  private def naive(a0: Array[Long]): Seq[(Long, Long)] = {
    val a = a0.clone()
    java.util.Arrays.sort(a)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < a.length) {
      out += ((a(i), -1L))
      var j = i + 1
      while (j < a.length) { out += ((a(i), a(j))); j += 1 }
      i += 1
    }
    out.toSeq
  }

  property("blocked emission == naive emission, as a multiset") =
    forAll(groups) { a =>
      val want = naive(a).groupBy(identity).view.mapValues(_.size).toMap
      val got = Dedup.blockUnits(a.clone())
        .flatMap { case (bi, bj, diag) => Dedup.unitRows(bi, bj, diag) }
        .toSeq.groupBy(identity).view.mapValues(_.size).toMap
      got == want
    }

  property("every unit stays within the block-pair bound") =
    forAll(groups) { a =>
      Dedup.blockUnits(a.clone()).forall { case (bi, bj, diag) =>
        val rows = Dedup.unitRows(bi, bj, diag).size
        rows <= 64 * 65 // <= JaccardBlock * (JaccardBlock + 1)
      }
    }
}
