package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) ride through the
  * engine as opaque `binary` columns with typed metadata, and
  * decode/feature-extract runs as a partition-parallel kernel over the
  * bytes. The actual codec is STUBBED (no media libraries in this
  * environment): [[stubDecode]] derives deterministic fake
  * width/height/frame metadata from an md5 of the payload, standing in for
  * a real libjpeg/ffmpeg call. Everything around it — the binary schema,
  * the batch shape (one JVM call per row batch inside a partition, no
  * driver involvement), the metadata struct — is the real design.
  */
object Multimodal {

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * Replace the body with a real codec; the signature (bytes in, struct
    * out, executed inside executors via a UDF over binary) is the
    * production shape.
    */
  val stubDecode: Array[Byte] => (Long, Long, Long, Long) = { bytes =>
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    def hx(from: Int, len: Int): Long = java.lang.Long.parseLong(hex.substring(from, from + len), 16)
    val width = 16L * (1L + hx(0, 2) % 64L)
    val height = 16L * (1L + hx(2, 2) % 64L)
    val nFrames = 1L + hx(4, 2) % 32L
    (width, height, nFrames, bytes.length.toLong)
  }

  /** `binary` payload column + decoded metadata struct for a DataFrame.
    * `payload` must be BinaryType (use `encode(textCol, 'UTF-8')` or a
    * real media scan).
    */
  def decodeMeta(payload: Column): Column = {
    val f = udf { (bytes: Array[Byte]) => stubDecode(bytes) }
    val s = f(payload)
    struct(
      s.getField("_1").as("width"),
      s.getField("_2").as("height"),
      s.getField("_3").as("n_frames"),
      s.getField("_4").as("n_bytes"))
  }

  /** Demo pipeline over a text table: text → binary payload → decoded
    * metadata columns. At production scale the payload column comes from a
    * binary-file or Parquet BLOB scan instead.
    */
  def mediaMeta(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.select(col(idCol), decodeMeta(payload).as("m"))
      .select(col(idCol), col("m.width").as("width"), col("m.height").as("height"),
        col("m.n_frames").as("n_frames"), col("m.n_bytes").as("n_bytes"))
  }
}
