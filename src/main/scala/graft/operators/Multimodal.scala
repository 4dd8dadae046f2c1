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

  /** REAL feature extraction over the opaque blob (no codec needed): a
    * 4-bucket byte-value histogram, computed codegen'd via the hex
    * rendering of the binary column (BinaryType has no element access in
    * Spark SQL; 2-hex-char slices do the indexing). The shape — binary in,
    * fixed-width numeric feature vector out, no shuffle — is exactly what
    * a real embedding/feature stage produces. */
  def byteHistogram(media: DataFrame): DataFrame = {
    val hx = hex(col("blob"))
    val n = (length(hx) / 2).cast("int")
    val codes = transform(sequence(lit(1), n),
      i => conv(hx.substr((i - lit(1)) * 2 + 1, lit(2)), 16, 10).cast("long"))
    // Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — guard.
    val safe = when(n > 0, codes).otherwise(array().cast("array<bigint>"))
    val buckets = (0 until 4).map { b =>
      size(filter(safe, c => c >= b * 64 && c < (b + 1) * 64)).cast("long").as(s"h$b")
    }
    media.select(col("id") +: buckets: _*)
  }

  /** STUB resize: deterministic fake downsample keeping every 4th byte of
    * the blob (marked fake like [[decodeStub]] — a real deployment calls a
    * codec resize; the binary-in/binary-out column shape and the metadata
    * update are the production plumbing). */
  def resizeStub(media: DataFrame, factor: Int = 4): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val hx = hex(col("blob"))
    val n = (length(hx) / 2).cast("int")
    val kept = transform(sequence(lit(0), ((n - 1) / factor).cast("int")),
      i => hx.substr(i * lit(factor) * 2 + 1, lit(2)))
    val resized = unhex(concat_ws("", when(n > 0, kept).otherwise(array().cast("array<string>"))))
    // Two-step projection on purpose: aliasing the result as `blob` in the
    // SAME select would make the metadata expression's inner col("blob")
    // resolve as a lateral column alias against the NEW (resized) blob.
    media.select(col("id"), resized.as("__resized"), col("meta.mime").as("__mime"))
      .select(col("id"), col("__resized").as("blob"),
        struct(octet_length(col("__resized")).cast("long").as("n_bytes"),
          col("__mime").as("mime")).as("meta"))
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
