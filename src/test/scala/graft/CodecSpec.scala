package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.Codec

/** Property-style roundtrip tests with a fixed seed (scalacheck's
  * scalatest bridge is not in the offline cache, so plain seeded loops).
  */
class CodecSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)

  test("vbyte roundtrip: arbitrary non-negative values") {
    for (_ <- 1 to 200) {
      val n = rng.nextInt(300)
      val arr = Array.fill(n)(rng.nextLong().abs)
      val enc = Codec.vbyteEncode(arr, deltas = false)
      assert(Codec.vbyteDecode(enc, n, deltas = false).toSeq == arr.toSeq)
    }
  }

  test("vbyte delta roundtrip: sorted ids incl. negative first values") {
    for (_ <- 1 to 200) {
      val n = rng.nextInt(300)
      val arr = Array.fill(n)(rng.nextLong()).distinct.sorted
      val enc = Codec.vbyteEncode(arr, deltas = true)
      assert(Codec.vbyteDecode(enc, arr.length, deltas = true).toSeq == arr.toSeq)
    }
  }

  test("block build/decode roundtrip + block max") {
    for (_ <- 1 to 50) {
      val n = 1 + rng.nextInt(500)
      val scale = 1 + rng.nextInt(1000000)
      val ids = Array.tabulate(n)(i => i.toLong * scale - 500000L)
      val tfs = Array.tabulate(n)(i => (i % 7 + 1).toLong)
      val dls = Array.tabulate(n)(i => (i % 90 + 10).toLong)
      val norms = Array.tabulate(n)(i => tfs(i).toDouble / (tfs(i) + dls(i)))
      val blocks = Codec.buildBlocks(ids, tfs, dls, norms, blockSize = 64)
      assert(blocks.flatMap(Codec.decodeBlockDocs) == ids.toSeq)
      assert(blocks.flatMap(Codec.decodeBlockTfs) == tfs.toSeq)
      assert(blocks.flatMap(Codec.decodeBlockDls) == dls.toSeq)
      var off = 0
      for (b <- blocks) {
        val mx = norms.slice(off, off + b.n).max
        assert(math.abs(b.maxTfNorm - mx) < 1e-15)
        assert(b.firstDoc <= b.lastDoc)
        off += b.n
      }
    }
  }

  test("compression is effective on dense ascending ids") {
    val ids = Array.tabulate(10000)(i => 1000000L + i * 3L)
    val tfs = Array.fill(10000)(2L)
    val dls = Array.fill(10000)(60L)
    val norms = Array.fill(10000)(0.5)
    val blocks = Codec.buildBlocks(ids, tfs, dls, norms)
    val bytes = blocks.map(b => b.docs.length + b.tfs.length + b.dls.length).sum
    assert(bytes < 10000 * 4, s"expected <4B/posting, got ${bytes / 10000.0}")
  }
}
