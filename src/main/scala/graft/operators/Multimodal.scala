package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: media as opaque `binary` payloads plus typed
  * metadata, with per-partition batch "decode".
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — what is real (and tested) is the
  * Spark-side shape a 100 TB media pipeline needs:
  *   - binary payload column + struct metadata schema,
  *   - partition-parallel decode via `mapPartitions` on a typed Dataset
  *     (the Scala analogue of `mapInPandas`: one batch-iterator per
  *     partition, so a real decoder would amortize codec init per partition,
  *     not per row),
  *   - decoded features land as columns, keeping everything downstream
  *     (filters, joins, dedup) in Catalyst.
  */
/** A decoded media record: what a real image decoder would emit.
  * (Top-level, non-private: encoder codegen cannot access private nested
  * case classes — janino "Private member cannot be accessed".) */
final case class MediaFeatures(
    doc_id: Long, byte_len: Int, header: String, width: Int, height: Int)

final case class MediaRow(doc_id: Long, payload: Array[Byte])

final case class ResizedMedia(doc_id: Long, payload: Array[Byte], byte_len: Int)

final case class Frame(doc_id: Long, frame_idx: Int, byte_len: Int, payload: Array[Byte])

object Multimodal {

  /** Model the documents table as a media table: payload = utf8 bytes of
    * `text` (stands in for image bytes), metadata carried alongside. */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("source"), col("lang"), col("n_chars")).as("meta"))

  /** STUB decode kernel. A production build would replace the body with a
    * real codec call (e.g. TwelveMonkeys/JavaCV) — the signature, batching
    * and determinism contract are the real interface.
    */
  private def decodeStub(payload: Array[Byte]): (Int, String, Int, Int) = {
    // ??? <- real codec goes here; deterministic fake below keeps tests honest
    val len = payload.length
    val header = payload.take(4).map(b => f"${b & 0xff}%02X").mkString
    // FIRST CODEPOINT of the UTF-8 payload (0 when empty) — the same basis
    // as the SQL twin's ascii(cast(payload AS string)): a payload starting
    // with a multibyte character (zh text) must decode identically on the
    // typed and declarative paths.
    val cp0 =
      if (len == 0) 0
      else new String(payload, java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
    (len, header, 1 + cp0 % 64, 1 + len % 64)
  }

  /** Partition-parallel decode: `mapPartitions` over the typed payload
    * Dataset — one iterator per partition (batch shape), codegen resumes
    * after the resulting typed columns. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (len, header, w, h) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, len, header, w, h)
        }
      }
  }

  /** STUB resize kernel: binary→binary with target dims carried in the
    * features. Real build: a codec resize; here payload truncation keeps
    * the batch/partition shape honest and deterministic. */
  def resize(spark: SparkSession, media: DataFrame,
             maxBytes: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          // ??? <- real resize; deterministic stand-in: byte-truncate
          ResizedMedia(r.doc_id, r.payload.take(maxBytes),
            math.min(r.payload.length, maxBytes))
        }
      }
  }

  /** STUB frame-sample kernel: one "video" payload → every k-th fixed-size
    * chunk as a frame row (explode shape: rows multiply, schema typed). */
  def frameSample(spark: SparkSession, media: DataFrame,
                  frameBytes: Int, everyK: Int): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .flatMap { r =>
        // ??? <- real demux/decode; chunking stands in for frame extraction
        r.payload.grouped(frameBytes).zipWithIndex
          .filter { case (_, i) => i % everyK == 0 }
          .map { case (bytes, i) => Frame(r.doc_id, i, bytes.length, bytes) }
      }
  }

  /** Pure-SQL twin of the decode (possible because the stub is arithmetic):
    * lets the DuckDB oracle verify the plumbing end-to-end. */
  def decodeSql(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      length(col("payload")).cast("int").as("byte_len"),
      hex(substring(col("payload"), 1, 4)).as("header"),
      (lit(1) + pmod(ascii(col("payload").cast("string")), lit(64))).as("width"),
      (lit(1) + pmod(length(col("payload")), lit(64))).cast("int").as("height"))
}
