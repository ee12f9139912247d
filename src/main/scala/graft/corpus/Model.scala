package graft.corpus

import java.sql.Timestamp

/** Input table row — BASELINE.json input_hint shape. */
case class WebPage(url: String, warc_ts: Timestamp, html: Array[Byte],
                   text: String, lang: String)

/** Per-document metadata — reference models.py:12-27 (engine-relevant subset
  * plus the full optional surface; enrichment happens via pre-joined tables,
  * never in-engine I/O).
  */
case class ChunkMeta(
    title: Option[String] = None,
    authors: Seq[String] = Nil,
    year: Option[Int] = None,
    doi: Option[String] = None,
    startPage: Option[Int] = None,
    endPage: Option[Int] = None,
    citekey: Option[String] = None,
    venue: Option[String] = None,
    publisher: Option[String] = None,
    oaUrl: Option[String] = None)

/** The indexed unit — reference models.py:30-38 Chunk.
  * `chunkId` is engine-assigned and deterministic; ordering-sensitive
  * operations tie-break on (source, page, chunkIdx).
  */
case class ChunkRow(
    chunkId: Long,
    docId: Long,
    source: String,
    page: Int,
    chunkIdx: Int,
    text: String,
    meta: ChunkMeta)

/** Formatted output row — reference diversity.py:247-305. */
case class SourceRef(file: String, page: Int, doi: Option[String],
                     title: Option[String], citekey: Option[String])
case class ResultRow(text: String, citation: String, source: SourceRef,
                     pandoc: Option[String], score: Option[Double])

case class Confidence(level: String, score: Double, spread: Double,
                      stability: Double, reason: Option[String] = None)
