package graft.pipeline

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted media metadata row. `width`/`height` come from the STUB
  * decoder — deterministic fakes derived from the byte payload, because
  * real image/audio codecs are not in this container. The Spark-side
  * plumbing (binary column, typed output schema, partition-preserving
  * mapPartitions, per-partition decoder reuse) is the real article.
  */
final case class MediaMeta(
    media_id: Long,
    byte_size: Long,
    sha: String,
    width: Long,
    height: Long,
    format: String)

/** Multimodal column plumbing (SURVEY §2.7 row 54): media as opaque
  * `binary` columns + typed metadata, processed by a partition-mapped
  * decode. At 100 TB the pattern is: keep payloads in parquet binary
  * columns (or pointers to object storage), never collect them, decode
  * inside `mapPartitions` where a real deployment would amortize one
  * decoder/model handle per partition, and emit narrow typed metadata.
  */
object Multimodal {

  /** Attach a binary payload column. For the testdata the payload is the
    * UTF-8 text bytes standing in for an encoded image.
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** STUB DECODE — deterministic fake: a real deployment would parse the
    * codec header here (e.g. JPEG SOF dims). Fakes are pure functions of
    * the payload length so the oracle can replicate them.
    */
  private def stubDecode(bytes: Array[Byte]): (Long, Long, String) = {
    val w = 1L + bytes.length % 1024
    val h = 1L + (bytes.length * 7L) % 768
    (w, h, "fake/raw")
  }

  private def sha256Hex(bytes: Array[Byte]): String = {
    // MessageDigest is not thread-safe / cheap-ish to create: one per call
    // is fine here; a throughput-critical decoder would pool per partition.
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  /** Decode + feature-extract over the binary column via mapPartitions.
    * Output is a narrow typed Dataset — the payload does not survive the
    * operator, so downstream stages shuffle metadata, not media bytes.
    */
  def extractMeta(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would go here (decoder/model handle)
        it.map { case (id, bytes) =>
          val (w, h, fmt) = stubDecode(bytes)
          MediaMeta(id, bytes.length.toLong, sha256Hex(bytes), w, h, fmt)
        }
      }
  }

  /** Resize: STUB — a real deployment decodes, scales to (targetW,
    * targetH) and re-encodes; the fake derives a deterministic payload
    * of exactly the "resized" byte budget so batch shape and schema
    * plumbing are testable. Same partition-mapped, payload-in →
    * payload-out contract a codec UDF would have.
    */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
      targetW: Int, targetH: Int): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val budget = targetW * targetH / 256 + 8 // fake "encoded" size
        it.map { case (id, bytes) =>
          val out = new Array[Byte](budget)
          var i = 0
          while (i < budget) { out(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length); i += 1 }
          (id, out)
        }
      }
  }

  /** Frame sampling: STUB — treats the payload as a "video" of
    * byte_size/frameBytes fixed-size frames and emits every `stride`-th
    * one as (media_id, frame_idx, frame_payload). The real article
    * would demux containers; the fan-out shape (one row in, k rows
    * out, payload never collected) is what matters at 100 TB.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
      frameBytes: Int = 64, stride: Int = 2): Dataset[(Long, Long, Array[Byte])] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            (id, f.toLong, java.util.Arrays.copyOfRange(bytes, f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
  }
}
