package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus a decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE decoder — but everything around it is
  * the real production shape:
  *   - schema: (id, blob BINARY, meta STRUCT<n_bytes BIGINT, mime STRING>)
  *   - cheap metadata ops (size, digest) stay codegen'd column exprs;
  *   - the decode stage runs as a typed `mapPartitions` over an iterator —
  *     the same per-partition batch shape a real decoder (or a Pandas UDF
  *     in PySpark) would use, so swapping in a real codec touches ONE
  *     function;
  *   - partitioning: blobs are heavy, so repartition by size bucket before
  *     decode to level batch memory (`spark.sql.files.maxPartitionBytes`
  *     governs the scan side; the explicit repartition governs decode).
  */
object Multimodal {

  case class MediaRow(id: Long, blob: Array[Byte], mime: String)
  case class DecodedRow(id: Long, width: Int, height: Int, channels: Int,
                        feature: Long)

  /** Wrap a text corpus as opaque media blobs (utf-8 bytes) with metadata —
    * the ingestion shape for real media files. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      encode(col(textCol), "utf-8").as("blob"),
      struct(
        octet_length(encode(col(textCol), "utf-8")).cast("long").as("n_bytes"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** Codegen'd metadata pass: byte size + content digest, no decode. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("id"), col("meta.n_bytes").as("n_bytes"),
      sha2(col("blob"), 256).as("sha256"))

  /** STUB decoder: deterministic fake "image dimensions" derived from the
    * blob bytes. A real deployment replaces the body with an actual codec
    * call; the iterator-in/iterator-out shape (and the schema) stay. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("id"), col("blob"), col("meta.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          // ??? real codec goes here; fake dims derived from content:
          val len = r.blob.length
          val head = r.blob.take(8).foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
          DecodedRow(r.id, 64 + (len % 512), 64 + ((len / 7) % 512), 3, head)
        }
      }
  }

  /** Frame-sample shape: pick every `stride`-th character code as a fake
    * "frame", exploded to (id, frame_no, frame_code) — the row-multiplying
    * stage a video pipeline needs, as a codegen'd posexplode. A real codec
    * would sample decoded frames; the sampling/explode plumbing is real. */
  def frameSample(docs: DataFrame, idCol: String, textCol: String, stride: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      posexplode(transform(
        sequence(lit(0), ((length(col(textCol)) - 1) / stride).cast("int")),
        i => ascii(col(textCol).substr(i * stride + 1, lit(1))).cast("long"))))
      .select(col("id"), col("pos").cast("long").as("frame_no"), col("col").as("frame_code"))
}
