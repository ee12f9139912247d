package graft

import graft.index.Codec

/** In-JVM decode microbenchmark: vbyte vs FOR on realistic posting shapes,
  * interleaved (A/B/A/B within one JVM) so JIT and host noise hit both
  * sides equally. Run: sbt "Test/runMain graft.CodecBench"
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val rng = new scala.util.Random(7)
    // realistic block shapes: 128 docIds with xxhash64-spaced gaps
    // (≈2^64/df apart for df in {1e3, 1e6, 1e9} of 2^64 keyspace),
    // small tfs, two-digit dls — the exact mix the WAND cursor decodes
    val shapes = Seq(
      ("sparse gaps (df~1e3)", 1L << 54),
      ("mid gaps (df~1e6)", 1L << 44),
      ("dense gaps (df~1e9)", 1L << 34))
    for ((name, gapScale) <- shapes) {
      val n = 128
      // >>> 2 keeps cur + 128 * gapScale below Long.MaxValue: accumulation
      // must never wrap signed-negative or forEncode's monotonicity require
      // would trip on an unrelated seed/shape edit
      var cur = rng.nextLong() >>> 2
      val ids = Array.fill(n) { cur += (rng.nextDouble() * gapScale).toLong.max(1); cur }
      val tfs = Array.fill(n)((rng.nextInt(7) + 1).toLong)
      val dls = Array.fill(n)((rng.nextInt(90) + 10).toLong)
      val encV = (Codec.encode(Codec.Vbyte, ids, deltas = true),
        Codec.encode(Codec.Vbyte, tfs, deltas = false),
        Codec.encode(Codec.Vbyte, dls, deltas = false))
      val encF = (Codec.encode(Codec.For, ids, deltas = true),
        Codec.encode(Codec.For, tfs, deltas = false),
        Codec.encode(Codec.For, dls, deltas = false))
      def decodeAll(codec: String, e: (Array[Byte], Array[Byte], Array[Byte])): Long = {
        val a = Codec.decode(codec, e._1, n, deltas = true)
        val b = Codec.decode(codec, e._2, n, deltas = false)
        val c = Codec.decode(codec, e._3, n, deltas = false)
        a(n - 1) + b(n - 1) + c(n - 1) // keep the JIT honest
      }
      // warm both paths
      var sink = 0L
      for (_ <- 1 to 20000) { sink += decodeAll(Codec.Vbyte, encV); sink += decodeAll(Codec.For, encF) }
      // interleaved timed passes, min-of-5
      val reps = 200000
      def time(codec: String, e: (Array[Byte], Array[Byte], Array[Byte])): Double = {
        val t0 = System.nanoTime()
        var i = 0
        while (i < reps) { sink += decodeAll(codec, e); i += 1 }
        (System.nanoTime() - t0) / 1e6
      }
      var (bestV, bestF) = (Double.MaxValue, Double.MaxValue)
      for (_ <- 1 to 5) {
        bestV = math.min(bestV, time(Codec.Vbyte, encV))
        bestF = math.min(bestF, time(Codec.For, encF))
      }
      val perPostV = bestV * 1e6 / (reps.toDouble * 3 * n)
      val perPostF = bestF * 1e6 / (reps.toDouble * 3 * n)
      val bytesV = encV._1.length + encV._2.length + encV._3.length
      val bytesF = encF._1.length + encF._2.length + encF._3.length
      println(f"[codecbench] $name: vbyte $perPostV%.2f ns/value ($bytesV B/block), " +
        f"for $perPostF%.2f ns/value ($bytesF B/block), " +
        f"speedup ${perPostV / perPostF}%.2fx, size ${bytesF * 100.0 / bytesV}%.0f%%")
      if (sink == 42) println("") // defeat dead-code elimination
    }
  }
}
