package graft

import graft.corpus.{ChunkMeta, ChunkRow}
import graft.query.{LocalBackend, Pipeline, PipelineConfig}

/** Library-surface sample: build a corpus, run queries end-to-end through
  * the public API, print results — used by /verify (not a unit test).
  */
object SampleDrive {
  def main(args: Array[String]): Unit = {
    val texts = Seq(
      "Abstract We propose a distributed inverted index for web search engines. " +
        "The quick brown fox jumps over the lazy dog in this corpus.",
      "Sharding and partitioning strategies for BM25 ranking at scale. " +
        "An inverted index maps terms to posting lists of document identifiers.",
      "Cooking recipes for pasta: boil water, add salt, simmer the sauce gently.",
      "The lazy dog sleeps while the quick brown fox jumps over fences all day.",
      "Conclusion: partition strategies with salting defuse head-term skew in shuffles.")
    val chunks = texts.zipWithIndex.map { case (t, i) =>
      ChunkRow(i.toLong, (i / 2).toLong, s"site$i.html", 1, i, t,
        ChunkMeta(title = if (i == 0) Some("Distributed Inverted Index") else None,
          authors = Seq("Doe, Jane"), year = Some(2020),
          citekey = if (i % 2 == 0) Some(s"doe$i") else None))
    }.toIndexedSeq
    val backend = new LocalBackend(chunks)
    val cfg = PipelineConfig(k = 3)

    for (q <- args.toSeq match {
           case Nil => Seq("inverted index partitioning", "quick brown fox",
                           "", "!!! ???", "nonexistent zebra quantum")
           case qs  => qs.toSeq
         }) {
      val out = Pipeline.searchTopK(backend, q, cfg)
      println(s"QUERY: '$q'  confidence=${out.confidence.level}(${out.confidence.score})")
      out.results.foreach(r =>
        println(f"  ${r.score.getOrElse(0.0)}%8.3f  ${r.citation}%-22s ${r.text.take(60)}"))
    }

    // empty-corpus path
    val empty = Pipeline.searchTopK(new LocalBackend(Vector.empty), "anything", cfg)
    println(s"EMPTY CORPUS: results=${empty.results.size} confidence=${empty.confidence}")
  }
}
