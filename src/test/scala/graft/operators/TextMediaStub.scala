package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** TEST-ONLY text-as-media decode stub. The production multimodal path is
  * all real codecs ([[Multimodal.decodeImageHeader]], `decodeWavHeader`,
  * `javax.imageio` resize) — this object keeps the original stub-kernel
  * interface alive purely as spec machinery: it pins the `mapPartitions`
  * batch shape, the typed-vs-SQL parity contract, and the
  * first-CODEPOINT determinism rule for text payloads, without shipping a
  * `???`-style stub in src/main.
  *
  * BMP-ONLY contract: the first-character basis is `codePointAt(0)`,
  * which for a payload starting with a SUPPLEMENTARY character (emoji)
  * returns the full code point while the SQL twin's `ascii()` (Spark)
  * returns the first UTF-16 code unit (duck's `unicode()` returns the
  * code point). The engines themselves disagree outside the BMP, so the
  * contract is pinned where they agree: BMP text (all fixture corpora).
  */
object TextMediaStub {

  /** Model the documents table as a media table: payload = utf8 bytes of
    * `text` (stands in for image bytes), metadata carried alongside. */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("source"), col("lang"), col("n_chars")).as("meta"))

  /** Deterministic fake decode for TEXT payloads — the signature, batching
    * and determinism contract of a real codec kernel. */
  private def decodeStub(payload: Array[Byte]): (Int, String, Int, Int) = {
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

  /** Pure-SQL twin of the decode (possible because the stub is arithmetic):
    * the parity assertion between this and [[decode]] is what the specs
    * pin. */
  def decodeSql(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      length(col("payload")).cast("int").as("byte_len"),
      hex(substring(col("payload"), 1, 4)).as("header"),
      (lit(1) + pmod(ascii(col("payload").cast("string")), lit(64))).as("width"),
      (lit(1) + pmod(length(col("payload")), lit(64))).cast("int").as("height"))
}

/** A decoded media record: what a real image decoder would emit.
  * (Top-level, non-private: encoder codegen cannot access private nested
  * case classes — janino "Private member cannot be accessed".) */
final case class MediaFeatures(
    doc_id: Long, byte_len: Int, header: String, width: Int, height: Int)
