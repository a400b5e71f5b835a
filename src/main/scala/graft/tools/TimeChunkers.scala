package graft.tools

/** Scratch: standalone chunker-core throughput, replicating
  * Bench.chunkerThroughput (64 MiB pseudorandom, 16 KiB expected, best-of-3
  * after a JIT warmup pass). No Spark session — pure JVM loop timing.
  */
object TimeChunkers {
  def main(args: Array[String]): Unit = {
    val algos = if (args.nonEmpty) args.toSeq else Seq("fixed", "ae", "fastcdc", "rabin")
    val data = new Array[Byte](64 << 20)
    new java.util.Random(42L).nextBytes(data)
    for (algo <- algos) {
      val c = graft.core.Chunker(algo, 16 * 1024, 42L)
      c.boundaries(data) // warmup
      val best = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        require(c.boundaries(data).length > 0)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"CHUNKER $algo%-8s ${data.length / 1e6 / best}%.1f MB/s")
    }
  }
}
