package graft.analysis

import scala.collection.mutable

/** Port of CPython's `difflib.SequenceMatcher` over character sequences —
  * just enough surface (find_longest_match, get_matching_blocks, ratio) for
  * reference-exact `fuzzy_match_bonus` (reference scoring.py:197-257).
  *
  * Semantics follow the published CPython implementation (public docs +
  * source): autojunk marks elements of `b` occurring more than 1% of the
  * time when len(b) >= 200 as "popular" and excludes them from matching.
  */
final class SequenceMatcher(a: String, b: String, autojunk: Boolean = true) {

  case class Match(a: Int, b: Int, size: Int)

  // b2j: element -> positions in b (junk/popular excluded)
  private val b2j: mutable.HashMap[Char, mutable.ArrayBuffer[Int]] = {
    val m = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < b.length) {
      m.getOrElseUpdate(b.charAt(i), mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }
    if (autojunk && b.length >= 200) {
      val ntest = b.length / 100 + 1
      val popular = m.iterator.collect { case (c, idxs) if idxs.length > ntest => c }.toList
      popular.foreach(m.remove)
    }
    m
  }

  def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): Match = {
    var besti = alo
    var bestj = blo
    var bestsize = 0
    // j2len: for each j in b, length of longest match ending at a[i-1], b[j-1]
    var j2len = mutable.HashMap.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      val newj2len = mutable.HashMap.empty[Int, Int]
      b2j.get(a.charAt(i)) match {
        case Some(indices) =>
          val it = indices.iterator
          var continue = true
          while (it.hasNext && continue) {
            val j = it.next()
            if (j >= blo) {
              if (j >= bhi) continue = false
              else {
                val k = j2len.getOrElse(j - 1, 0) + 1
                newj2len(j) = k
                if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
              }
            }
          }
        case None =>
      }
      j2len = newj2len
      i += 1
    }
    // With isjunk=None, CPython's bjunk set is empty ("popular" autojunk
    // elements live in bpopular, not bjunk), so isbjunk is always false:
    // the non-junk extension loops extend on any equal char and the junk
    // extension loops never fire.
    while (besti > alo && bestj > blo && a.charAt(besti - 1) == b.charAt(bestj - 1)) {
      besti -= 1; bestj -= 1; bestsize += 1
    }
    while (besti + bestsize < ahi && bestj + bestsize < bhi &&
           a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
      bestsize += 1
    }
    Match(besti, bestj, bestsize)
  }

  def getMatchingBlocks: List[Match] = {
    val queue = mutable.Stack[(Int, Int, Int, Int)]((0, a.length, 0, b.length))
    val matchingBlocks = mutable.ArrayBuffer.empty[Match]
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val m = findLongestMatch(alo, ahi, blo, bhi)
      if (m.size > 0) {
        matchingBlocks += m
        if (alo < m.a && blo < m.b) queue.push((alo, m.a, blo, m.b))
        if (m.a + m.size < ahi && m.b + m.size < bhi)
          queue.push((m.a + m.size, ahi, m.b + m.size, bhi))
      }
    }
    val sorted = matchingBlocks.sortBy(m => (m.a, m.b))
    // merge adjacent blocks
    var i1 = 0; var j1 = 0; var k1 = 0
    val nonAdjacent = mutable.ArrayBuffer.empty[Match]
    for (m <- sorted) {
      if (i1 + k1 == m.a && j1 + k1 == m.b) k1 += m.size
      else {
        if (k1 > 0) nonAdjacent += Match(i1, j1, k1)
        i1 = m.a; j1 = m.b; k1 = m.size
      }
    }
    if (k1 > 0) nonAdjacent += Match(i1, j1, k1)
    nonAdjacent += Match(a.length, b.length, 0)
    nonAdjacent.toList
  }

  /** 2*M / T ratio, as CPython. */
  def ratio: Double = {
    val matches = getMatchingBlocks.map(_.size).sum
    val total = a.length + b.length
    if (total == 0) 1.0 else 2.0 * matches / total
  }
}
