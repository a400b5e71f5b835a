package graft.core

import java.nio.ByteBuffer
import scala.collection.mutable

/** The reference's two cross-partition boundary-reconciliation strategies,
  * re-derived as pure functions (the Spark layer distributes them; these are
  * also the ground truth for equivalence tests).
  *
  * Strategy A — overlap + min-distance merge (reference
  * `src/chunking/ae.rs:55-92`, `src/chunking/rabin.rs:92-128`): each of `parts`
  * contiguous ranges is scanned with a `window` lookback before its left edge
  * (split-invariance), then candidate cut points are merged sequentially,
  * accepting a cut only if it is at least `window` bytes past the previously
  * accepted one.
  *
  * Strategy B — edge-chunk re-chunking (reference
  * `src/chunking/parallel.rs:29-86`): each range is chunked independently;
  * interior chunks are deduplicated locally; one edge chunk per range is held
  * back, edge chunks of adjacent ranges are stitched pairwise and re-chunked
  * into the global set.
  *
  * Neither strategy reproduces the sequential cut points exactly near range
  * edges; the reference's contract is the resulting *metrics* (dedup
  * coefficient, average chunk size), not the cut points — see SURVEY.md §2.3.
  */
object ParallelChunking {

  /** Dedup metrics as the reference defines them.
    *
    * @param dedupCoeff   unique chunk bytes / total input bytes (`ae.rs:91`)
    * @param avgChunkSize denominator-convention depends on strategy: strategy A
    *                     uses accepted-bytes / distinct (`ae.rs:91`), strategy B
    *                     uses unique-bytes / distinct (`parallel.rs:118`)
    */
  final case class Metrics(
      dedupCoeff: Double,
      avgChunkSize: Double,
      distinctChunks: Long,
      totalBytes: Long,
      uniqueBytes: Long)

  /** Strategy A candidate collection + merge, returning EXCLUSIVE chunk end
    * offsets (the reference's merge loop keeps inclusive indices; chunk i spans
    * `(prev, cur]` — `ae.rs:68-88`).
    */
  def overlapMergedBoundaries(
      data: Array[Byte],
      parts: Int,
      boundsInRange: (Array[Byte], Int, Int) => Array[Int],
      window: Int): Array[Int] = {
    require(parts > 0)
    val n = data.length
    if (n == 0) return Array.emptyIntArray
    val out = new IntVec
    var last = -1L
    var p = 0
    while (p < parts) {
      // Intended range split; the reference Rabin driver has an upper-bound bug
      // (`rabin.rs:101` uses len/t instead of i*len/t) which we do NOT replicate
      // (SURVEY.md §2.3 P2).
      val left = (p.toLong * n / parts).toInt
      val right = ((p + 1).toLong * n / parts).toInt
      val cand = boundsInRange(data, left, right)
      var i = 0
      while (i < cand.length) {
        val e = cand(i)
        if (e - last >= window) {
          out += e + 1
          last = e
        }
        i += 1
      }
      p += 1
    }
    out.toArray
  }

  /** Strategy A end-to-end metrics (chunk, hash, exact dedup, coefficient).
    * Chunk identity here is full content equality — a deliberate strengthening
    * of the reference's process-seeded SipHash (`ae.rs:76-78`), which is not
    * reproducible run-to-run; the Spark layer uses xxhash64 instead.
    */
  def overlapMetrics(
      data: Array[Byte],
      parts: Int,
      boundsInRange: (Array[Byte], Int, Int) => Array[Int],
      window: Int): Metrics = {
    val ends = overlapMergedBoundaries(data, parts, boundsInRange, window)
    val seen = mutable.HashSet.empty[ByteBuffer]
    var uniqueBytes = 0L
    var acceptedBytes = 0L
    var last = 0
    var i = 0
    while (i < ends.length) {
      val e = ends(i)
      val len = e - last
      if (seen.add(ByteBuffer.wrap(data, last, len).slice())) uniqueBytes += len
      acceptedBytes += len
      last = e
      i += 1
    }
    Metrics(
      dedupCoeff = if (data.length == 0) 0.0 else uniqueBytes.toDouble / data.length,
      avgChunkSize = if (seen.isEmpty) 0.0 else acceptedBytes.toDouble / seen.size,
      distinctChunks = seen.size.toLong,
      totalBytes = data.length.toLong,
      uniqueBytes = uniqueBytes)
  }

  /** Strategy B (edge re-chunking) end-to-end metrics, replicating the
    * reference's exact accounting: per-range local dedup (so a chunk repeated
    * in two different ranges is counted twice in `uniqueBytes`), even ranges
    * hold back their last chunk / odd ranges their first (`parallel.rs:38-43`),
    * adjacent edge chunks are stitched pairwise and re-chunked into the global
    * set (`parallel.rs:61-86` — with an odd trailing edge chunk dropped, as the
    * reference's `while i < len - 1, i += 2` loop does), and
    * avg = uniqueBytes / distinct (`parallel.rs:118`).
    */
  def edgeRechunkMetrics(data: Array[Byte], parts: Int, chunker: Chunker): Metrics = {
    require(parts > 0)
    val n = data.length
    if (n == 0) return Metrics(0.0, 0.0, 0L, 0L, 0L)
    val globalSet = mutable.HashSet.empty[ByteBuffer]
    val remainders = mutable.ArrayBuffer.empty[Array[Byte]]
    var uniqueBytes = 0L
    var p = 0
    while (p < parts) {
      val left = (p.toLong * n / parts).toInt
      val right = ((p + 1).toLong * n / parts).toInt
      val slice = java.util.Arrays.copyOfRange(data, left, right)
      val cs = chunker.chunks(slice)
      val (lo, hi) = if (p % 2 == 0) (0, cs.length - 1) else (1, cs.length)
      val localSet = mutable.HashSet.empty[ByteBuffer]
      var i = lo
      while (i < hi) {
        val (off, len) = cs(i)
        val bb = ByteBuffer.wrap(slice, off, len).slice()
        if (localSet.add(bb)) uniqueBytes += len
        i += 1
      }
      globalSet ++= localSet
      val (eo, el) = if (p % 2 == 0) cs.last else cs.head
      remainders += java.util.Arrays.copyOfRange(slice, eo, eo + el)
      p += 1
    }
    // Stitch adjacent edge chunks pairwise and re-chunk into the global set.
    var i = 0
    while (i < remainders.length - 1) {
      val stitched = remainders(i) ++ remainders(i + 1)
      for ((off, len) <- chunker.chunks(stitched)) {
        val bb = ByteBuffer.wrap(stitched, off, len).slice()
        if (globalSet.add(bb)) uniqueBytes += len
      }
      i += 2
    }
    Metrics(
      dedupCoeff = uniqueBytes.toDouble / n,
      avgChunkSize = if (globalSet.isEmpty) 0.0 else uniqueBytes.toDouble / globalSet.size,
      distinctChunks = globalSet.size.toLong,
      totalBytes = n.toLong,
      uniqueBytes = uniqueBytes)
  }

  /** Sequential (single-range) metrics — the ground truth the parallel
    * strategies approximate. Uses strategy-A accounting over the streaming
    * chunker's own boundaries.
    */
  def sequentialMetrics(data: Array[Byte], chunker: Chunker): Metrics = {
    val seen = mutable.HashSet.empty[ByteBuffer]
    var uniqueBytes = 0L
    for ((off, len) <- chunker.chunks(data)) {
      if (seen.add(ByteBuffer.wrap(data, off, len).slice())) uniqueBytes += len
    }
    Metrics(
      dedupCoeff = if (data.length == 0) 0.0 else uniqueBytes.toDouble / data.length,
      avgChunkSize = if (seen.isEmpty) 0.0 else data.length.toDouble / seen.size,
      distinctChunks = seen.size.toLong,
      totalBytes = data.length.toLong,
      uniqueBytes = uniqueBytes)
  }
}
