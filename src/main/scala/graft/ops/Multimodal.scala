package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs batched in
  * `mapPartitions` tasks (the JVM analog of `mapInPandas` batches).
  *
  * The actual media decode is STUBBED — image/audio codecs are not in this
  * container — behind [[decodeStub]], which produces deterministic fake
  * dimensions from the payload bytes. The Spark-side plumbing (binary
  * schema, batching, partition-local feature extraction, output schema) is
  * real and tested; swapping [[decodeStub]] for a JNI/javacv decoder is the
  * only change needed where codecs exist.
  */
object Multimodal {

  case class MediaFeatures(id: Long, kind: String, n_bytes: Long, sha: String,
                           width: Int, height: Int, sample_hex: String)

  /** STUB decode seam: deterministic fake dimensions derived from payload
    * length (a real build links an image decoder here).
    */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val len = payload.length.toLong
    (((len % 640) + 16).toInt, ((len * 31 % 480) + 16).toInt)
  }

  private def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Batched feature extraction over (id, payload) rows. */
  def extractFeatures(rows: Dataset[(Long, Array[Byte])], kind: String): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // batch loop: decode amortizes per-partition setup (codec init, etc.)
      it.map { case (id, payload) =>
        val (w, h) = decodeStub(payload)
        MediaFeatures(id, kind, payload.length.toLong, sha256Hex(payload), w, h,
          payload.take(8).map("%02x".format(_)).mkString)
      }
    }
  }
}
