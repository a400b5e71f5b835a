package graft.core

/** Suffix-array machinery for EXACT substring-level dedup (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better" — the
  * suffix-array formulation, vs the stride-aligned approximation in
  * `Dedup.dedup_repeated_spans`). Built per DOCUMENT inside a task: the
  * corpus-scale structure distributes as (per-doc SA) + (cross-doc hash
  * join on the grams the SA enumerates), never as one global array.
  *
  * Prefix-doubling construction — O(n log² n) with plain sorts, ample for
  * bounded documents (the 100 TB production choice for multi-MB blobs
  * would be SA-IS; the interface is the same). LCP by Kasai's algorithm.
  */
object SuffixArrays {

  /** Suffix array of `s`: start offsets of all suffixes in lexicographic
    * order, by prefix doubling over rank pairs.
    */
  def suffixArray(s: String): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    var rank = Array.tabulate(n)(i => s.charAt(i).toInt)
    var sa = Array.tabulate(n)(identity)
    var step = 1
    while (step < n) {
      val k = step
      val r = rank
      def key(i: Int): (Int, Int) = (r(i), if (i + k < n) r(i + k) else -1)
      sa = sa.sortBy(key)
      val next = new Array[Int](n)
      next(sa(0)) = 0
      var i = 1
      while (i < n) {
        next(sa(i)) = next(sa(i - 1)) + (if (key(sa(i)) == key(sa(i - 1))) 0 else 1)
        i += 1
      }
      rank = next
      if (rank(sa(n - 1)) == n - 1) step = n // all ranks distinct — done
      else step <<= 1
    }
    sa
  }

  /** Kasai LCP array: lcp(i) = common-prefix length of suffixes sa(i-1) and
    * sa(i); lcp(0) = 0.
    */
  def lcpArray(s: String, sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s.charAt(i + h) == s.charAt(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** Every DISTINCT k-gram of `text` with all its start offsets (ascending),
    * enumerated from one SA walk: suffixes with the same k-prefix occupy a
    * consecutive SA range (running-min LCP ≥ k), so each distinct gram is
    * materialized exactly once — the SA's win over hashing all n positions
    * into a per-doc map. Suffixes shorter than k are skipped without
    * breaking the LCP chain (the running min carries across them).
    */
  def kgramGroups(text: String, k: Int): Seq[(String, Array[Int])] = {
    val n = text.length
    if (n < k || k <= 0) return Seq.empty
    val sa = suffixArray(text)
    val lc = lcpArray(text, sa)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Int])]
    var cur = scala.collection.mutable.ArrayBuffer.empty[Int]
    def flush(): Unit = if (cur.nonEmpty) {
      val offs = cur.toArray.sorted
      out += ((text.substring(offs(0), offs(0) + k), offs))
      cur = scala.collection.mutable.ArrayBuffer.empty[Int]
    }
    var acc = Int.MaxValue // min LCP since the previous VALID (len >= k) suffix
    var i = 0
    while (i < n) {
      if (i > 0) acc = math.min(acc, lc(i))
      val off = sa(i)
      if (off + k <= n) {
        if (cur.isEmpty || acc >= k) cur += off else { flush(); cur += off }
        acc = Int.MaxValue
      }
      i += 1
    }
    flush()
    out.toSeq
  }
}
