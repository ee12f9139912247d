package graft.index

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Thin snapshot/manifest seam (SURVEY §7.5): the sandbox has no Iceberg
  * runtime, so snapshot metadata, lineage, and per-partition checkpoints are
  * emulated with atomic JSON files next to the parquet tables. Where an
  * Iceberg catalog exists this seam maps to table properties + snapshots.
  */
object TableIO {

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Atomically write a flat string map as JSON (tmp + rename). */
  def writeManifest(path: String, fields: Map[String, String]): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val json = fields.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n  ", ",\n  ", "\n}\n")
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def readManifest(path: String): Option[Map[String, String]] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(Files.readString(p))
    Some(node.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
  }

  /** Append-only checkpoint log: one JSON line per completed partition. */
  def appendCheckpoint(path: String, fields: Map[String, String]): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val json = fields.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}\n")
    Files.writeString(p, json,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  def readCheckpoints(path: String): Seq[Map[String, String]] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Nil
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Files.readAllLines(p).asScala.filter(_.nonEmpty).map { line =>
      val node = mapper.readTree(line)
      node.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.toSeq
  }
}
