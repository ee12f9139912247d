package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import graft.corpus.{ChunkMeta, ChunkRow}

/** Loader for the reference-derived golden vectors in
  * src/test/resources/goldens (produced by tools/make_goldens.py, which
  * RUNS the reference implementation).
  */
object Goldens {
  private val mapper = new ObjectMapper()

  def load(name: String): JsonNode = {
    val in = getClass.getResourceAsStream(s"/goldens/$name")
    require(in != null, s"missing golden $name")
    try mapper.readTree(in) finally in.close()
  }

  def strSeq(n: JsonNode): Seq[String] = n.elements().asScala.map(_.asText()).toSeq
  def optStr(n: JsonNode, f: String): Option[String] = {
    val v = n.get(f)
    if (v == null || v.isNull) None else Some(v.asText())
  }
  def optInt(n: JsonNode, f: String): Option[Int] = {
    val v = n.get(f)
    if (v == null || v.isNull) None else Some(v.asInt())
  }

  lazy val corpus: JsonNode = load("corpus.json")

  lazy val chunks: IndexedSeq[ChunkRow] =
    corpus.get("chunks").elements().asScala.zipWithIndex.map { case (c, i) =>
      ChunkRow(
        chunkId = c.get("chunk_id").asLong(),
        docId = c.get("doc_id").asLong(),
        source = c.get("source").asText(),
        page = c.get("page").asInt(),
        chunkIdx = i,
        text = c.get("text").asText(),
        meta = ChunkMeta(
          title = optStr(c, "title"),
          authors = strSeq(c.get("authors")),
          year = optInt(c, "year"),
          doi = optStr(c, "doi"),
          startPage = optInt(c, "start_page"),
          citekey = optStr(c, "citekey")))
    }.toIndexedSeq
}
