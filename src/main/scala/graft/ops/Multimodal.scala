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

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte], n: Int): String = {
    val len = math.min(n, bytes.length)
    val out = new Array[Char](len * 2)
    var i = 0
    while (i < len) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  private def sha256Hex(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    val d = md.digest(bytes)
    hex(d, d.length)
  }

  /** Batched feature extraction over (id, payload) rows. */
  def extractFeatures(rows: Dataset[(Long, Array[Byte])], kind: String): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition setup amortized over the batch: ImageIO's default
      // disk cache writes+deletes a temp file per createImageInputStream
      // call — a syscall pair per ROW; header probes never need it, so use
      // the in-memory cache. One SHA-256 digest instance per task, and
      // table-driven hex instead of a String.format per byte.
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { case (id, payload) =>
        val (w, h, real) = decode(payload)
        MediaFeatures(id, kind, payload.length.toLong, sha256Hex(md, payload), w, h,
          hex(payload, 8), real)
      }
    }
  }
}
