package graft.ops

import graft.analysis.Analyzer
import graft.index.IndexBuilder

/** Training-data text operators beyond the reference's own set (prompt
  * requirement): simhash fingerprints, hamming near-dup, rolling-hash
  * document fingerprints. Pure Scala cores, applied via UDF/mapPartitions.
  */
object TextOps {

  /** 64-bit SimHash over tokens; per-token 64-bit hash = first 8 md5 bytes
    * (portable/deterministic), bit-majority vote.
    */
  def simhash64(tokens: Iterable[String]): Long = {
    val v = new Array[Int](64)
    for (t <- tokens) {
      val h = IndexBuilder.stableId(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (v(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhashOfText(text: String): Long = simhash64(Analyzer.tokenize(text))

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Rolling (polynomial) hash fingerprint of the first n tokens — cheap
    * order-sensitive document fingerprint.
    */
  def rollingFingerprint(tokens: Iterable[String], n: Int = 32): Long = {
    var h = 1125899906842597L
    val it = tokens.iterator.take(n)
    while (it.hasNext) {
      val t = it.next()
      var i = 0
      while (i < t.length) { h = 31 * h + t.charAt(i); i += 1 }
      h = 131 * h + 7
    }
    h
  }
}
