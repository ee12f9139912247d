package graft.ops

/** Integer MinHash (64 permutations, 16 bands x 4 rows) over 32-bit shingle
  * hashes. One md5 per shingle (its 8-hex-char prefix as an integer); the
  * permutations are pure modular arithmetic, so the scheme is reproducible
  * exactly in any SQL dialect that can do 64-bit integer math:
  *
  *   h0     = int(md5(shingle)[0:8], 16)                  (in [0, 2^32))
  *   sig_i  = min over shingles of (A_i * h0 + B_i) mod P  (P = 2^31 - 1)
  *
  * A_i <= P - 1 < 2^31 and h0 < 2^32 keep A_i * h0 + B_i < 2^63: no signed
  * overflow on either engine. At 10^12-doc scale this is the standard
  * shingle -> minhash -> banded-LSH dedup path: signatures are a narrow map,
  * and only the (band, doc) pairs shuffle.
  */
object Minhash {
  val NumPerms = 64
  val NumBands = 16
  val RowsPerBand: Int = NumPerms / NumBands
  val P = 2147483647L // 2^31 - 1

  /** Permutation constants; deterministic, embedded verbatim in the DuckDB
    * oracle SQL so both engines share them.
    */
  val A: Array[Long] = Array.tabulate(NumPerms)(i => ((i * 2654435761L + 1013904223L) % (P - 1)) + 1L)
  val B: Array[Long] = Array.tabulate(NumPerms)(i => (i * 1103515245L + 12345L) % P)

  /** 64 minhash values for one doc's shingle hashes; all -1 when empty. */
  def signature(hs: Array[Long]): Array[Long] = {
    if (hs == null || hs.isEmpty) return Array.fill(NumPerms)(-1L)
    val out = Array.fill(NumPerms)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < NumPerms) {
        val v = (A(i) * h + B(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    out
  }

  /** Band key strings: "band:sig0:sig1:sig2:sig3" per band. */
  def bands(sig: Array[Long]): Array[String] =
    Array.tabulate(NumBands) { b =>
      val sb = new StringBuilder
      sb.append(b)
      var r = 0
      while (r < RowsPerBand) {
        sb.append(':').append(sig(b * RowsPerBand + r))
        r += 1
      }
      sb.toString
    }
}
