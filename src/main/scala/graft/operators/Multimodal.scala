package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * No image/audio codecs exist in this environment, so the *decode*
  * step is a clearly-marked deterministic stub — but everything
  * Spark-side is real: the binary column type, the metadata schema,
  * the batched per-partition processing shape ([[decodeBatched]],
  * where a JNI/codec library would plug in), and the partitioning
  * story (payloads never shuffle; all stages are map-only).
  *
  * Payloads here are the UTF-8 bytes of `documents.text` (ASCII), so
  * the DuckDB oracle can reproduce byte lengths, hashes and slices
  * through the text functions.
  */
object Multimodal {

  /** documents -> (doc_id, payload binary, meta struct) — the
    * canonical multimodal frame. */
  def payloads(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        col("source").as("origin"),
        col("lang").as("lang")).as("meta"))

  // ---------------------------------------------------------------
  // metadata + stub decode + resize + frame sampling, one projection.
  def qDecodeStub(s: SparkSession, dir: String): DataFrame = {
    val p = payloads(s, dir).withColumn("n_bytes", length(col("payload")))
    // STUB decode: real codecs would read the header; the fake derives
    // dimensions deterministically from the byte length.
    val width = lit(64) + col("n_bytes") % 577
    val height = lit(64) + (col("n_bytes") * 31) % 417
    // frame slices decode the payload itself — no join back to the
    // source table; the whole query stays one map-only projection.
    p.withColumn("text", decode(col("payload"), "utf-8"))
      .select(
        col("doc_id"),
        col("n_bytes"),
        sha2(col("payload"), 256).as("sha256"),
        col("meta.mime").as("mime"),
        width.as("width"),
        height.as("height"),
        floor(width / 2).cast("int").as("resized_w"),
        floor(height / 2).cast("int").as("resized_h"),
        md5(substring(col("text"), 1, 32)).as("frame_0"),
        md5(substring(col("text"), floor(col("n_bytes") / 4).cast("int") + 1, lit(32))).as("frame_1"),
        md5(substring(col("text"), floor(col("n_bytes") / 2).cast("int") + 1, lit(32))).as("frame_2"),
        md5(substring(col("text"), floor(col("n_bytes") * 3 / 4).cast("int") + 1, lit(32))).as("frame_3"))
      .orderBy(col("doc_id"))
  }

  val qDecodeStubSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS sha256,
      |  'application/octet-stream' AS mime,
      |  64 + octet_length(encode(text)) % 577 AS width,
      |  64 + (octet_length(encode(text)) * 31) % 417 AS height,
      |  CAST(floor((64 + octet_length(encode(text)) % 577) / 2) AS INT) AS resized_w,
      |  CAST(floor((64 + (octet_length(encode(text)) * 31) % 417) / 2) AS INT) AS resized_h,
      |  md5(substr(text, 1, 32)) AS frame_0,
      |  md5(substr(text, CAST(floor(octet_length(encode(text)) / 4) AS INT) + 1, 32)) AS frame_1,
      |  md5(substr(text, CAST(floor(octet_length(encode(text)) / 2) AS INT) + 1, 32)) AS frame_2,
      |  md5(substr(text, CAST(floor(octet_length(encode(text)) * 3 / 4) AS INT) + 1, 32)) AS frame_3
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // The batched per-partition decode surface: the shape a real codec
  // integration uses (one library handle per partition, batch loop
  // over payloads, typed output). Deterministic fake features stand
  // in for pixel decoding. Exposed as a rows-only query (no SQL
  // oracle — mapPartitions is deliberately outside SQL).
  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature_sum", LongType)))

  def qDecodeBatched(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    val src = payloads(s, dir).select(col("doc_id"), col("payload"))
    val out = src.mapPartitions { it =>
      // per-partition setup: a real impl opens the codec here, once.
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = bytes.length
        // STUB: byte-sum stands in for decoded pixel features.
        var sum = 0L
        var i = 0
        while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
        Row(id, 64 + n % 577, 64 + (n * 31) % 417, sum)
      }
    }(enc)
    out.orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stub" -> (qDecodeStub _),
    "mm_decode_batched" -> (qDecodeBatched _), // rows-only: no oracle entry
  )

  val oracles: Map[String, String] = Map(
    "mm_decode_stub" -> qDecodeStubSql)
}
