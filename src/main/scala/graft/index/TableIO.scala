package graft.index

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** Thin snapshot/manifest seam (SURVEY §7.5): the sandbox has no Iceberg
  * runtime, so snapshot metadata, lineage, and per-partition checkpoints are
  * emulated with atomic JSON files next to the parquet tables. Where an
  * Iceberg catalog exists this seam maps to table properties + snapshots.
  *
  * DEPLOYMENT BOUNDARY: this emulation is java.nio-based and therefore
  * LOCAL-FILESYSTEM ONLY — it is the one seam that must be swapped for the
  * real catalog on hdfs://s3a:// roots (atomic rename and O_APPEND, which
  * the manifest/checkpoint contracts rely on, do not exist on object
  * stores; Iceberg's metadata tree is the production answer, not a Hadoop
  * FileSystem port of this file). The parquet tables and the Hadoop-FS
  * existence checks around them are already cluster-addressable.
  */
object TableIO {

  /** Clustered `partitionBy` write that never trades parallelism away:
    * the frame is clustered on the partition columns (an unclustered
    * partitionBy write opens tasks × dirs parquet writers) PLUS a bounded
    * salt, so each of the `nDirs` partition dirs is spread over at most
    * `salt` writer tasks / files and the commit stays parallel even when
    * nDirs < shufflePartitions. The salt hash is SEEDED (extra lit
    * column): an unseeded `pmod(xxhash64(x), salt)` is functionally
    * dependent on any partition key derived as `pmod(xxhash64(x), n)`
    * from the same column whenever the moduli share factors — the
    * power-of-two common case — which silently collapses the write back
    * to nDirs tasks. `dynamic` = overwrite only the partitions present
    * in the frame (the incremental contract).
    */
  def saltedPartitionWrite(df: DataFrame, partCols: Seq[String], nDirs: Int,
                           saltSrc: Column, shufflePartitions: Int,
                           dest: String, dynamic: Boolean): Unit = {
    val salt = math.max(1, shufflePartitions / math.max(1, nDirs))
    val keys = partCols.map(col) ++
      (if (salt > 1) Seq(pmod(xxhash64(lit("salt"), saltSrc), lit(salt))) else Nil)
    val w = df.repartition(nDirs * salt, keys: _*).write.mode(SaveMode.Overwrite)
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy(partCols: _*).parquet(dest)
  }

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Atomically write a flat string map as JSON (unique tmp + rename: a
    * SHARED tmp name would race concurrent writers — one move steals the
    * other's tmp and the second move throws NoSuchFile; with unique tmps
    * the last rename wins and every observed manifest is complete).
    */
  def writeManifest(path: String, fields: Map[String, String]): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val json = fields.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n  ", ",\n  ", "\n}\n")
    val tmp = Paths.get(path + ".tmp." +
      java.lang.Long.toHexString(Thread.currentThread.getId) + "." +
      java.lang.Long.toHexString(System.nanoTime()))
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

  private val appendLock = new Object

  /** Append-only checkpoint log: one JSON line per completed partition.
    * JVM-level lock serializes in-process appenders (O_APPEND makes each
    * single write atomic cross-process; the lock removes any reliance on
    * the JVM issuing one syscall per line).
    */
  def appendCheckpoint(path: String, fields: Map[String, String]): Unit =
    appendLock.synchronized {
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
    Files.readAllLines(p).asScala.filter(_.nonEmpty).flatMap { line =>
      // a crash mid-append can leave a torn final line; a torn checkpoint
      // means "this partition did not complete" — skip it (the bucket
      // re-runs on resume) instead of aborting the whole resume
      scala.util.Try {
        val node = mapper.readTree(line)
        node.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.toOption match {
        case some @ Some(_) => some
        case None =>
          System.err.println(s"[tableio] skipping torn checkpoint line in $path")
          None
      }
    }.toSeq
  }
}
