package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs batched in
  * `mapPartitions` tasks (the JVM analog of `mapInPandas` batches).
  *
  * Image decode is REAL for formats the JDK ships readers for (PNG, JPEG,
  * BMP, GIF via `javax.imageio` — header-only reads, no full-pixel decode
  * in the metadata path). Payloads no reader accepts (audio/video, or the
  * text-as-binary testdata) fall back to [[decodeStub]]'s deterministic
  * fake dimensions so the driver oracle stays byte-stable; an
  * audio/video-capable build swaps the fallback for a JNI/javacv decoder.
  */
object Multimodal {

  case class MediaFeatures(id: Long, kind: String, n_bytes: Long, sha: String,
                           width: Int, height: Int, sample_hex: String,
                           decoded: Boolean)

  /** STUB fallback: deterministic fake dimensions derived from payload
    * length, for payloads with no JDK image reader.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val len = payload.length.toLong
    (((len % 640) + 16).toInt, ((len * 31 % 480) + 16).toInt)
  }

  /** (width, height, reallyDecoded): JDK ImageIO header read when a reader
    * claims the payload, stub dimensions otherwise.
    */
  def decode(payload: Array[Byte]): (Int, Int, Boolean) = {
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (readers.hasNext) {
          val r = readers.next()
          try {
            r.setInput(in)
            (r.getWidth(0), r.getHeight(0), true)
          } finally r.dispose()
        } else {
          val (w, h) = decodeStub(payload); (w, h, false)
        }
      } finally if (in != null) in.close()
    } catch {
      case _: Exception =>
        val (w, h) = decodeStub(payload); (w, h, false)
    }
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
        val (w, h, real) = decode(payload)
        MediaFeatures(id, kind, payload.length.toLong, sha256Hex(payload), w, h,
          payload.take(8).map("%02x".format(_)).mkString, real)
      }
    }
  }
}
