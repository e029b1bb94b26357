package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat payloads as opaque `binary` columns
  * with typed metadata, and run batched per-partition "decode / feature
  * extract" over them — the Spark-side shape (schema, partitioning,
  * batching) is real; the decoder itself is a clearly-marked deterministic
  * STUB because no image/audio codecs exist in this environment.
  *
  * At scale this is the mapInPandas/mapPartitions pattern: one decoder
  * instance per partition, vectorized batches, metadata kept columnar so
  * Catalyst can prune/push down around the opaque blob.
  */
object Multimodal {

  final case class BinaryDoc(doc_id: Long, payload: Array[Byte], byte_len: Long)
  final case class DecodedFeatures(
      doc_id: Long, byte_len: Long, sha_prefix: String,
      head_byte: Int, tail_byte: Int, decoder: String)

  /** documents.text reinterpreted as an opaque binary payload column —
    * stands in for image/audio/video bytes.
    */
  def binaryDocs(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))

  /** STUB DECODER — deterministic fake standing in for e.g. JPEG decode.
    * Real per-partition batch processing over binary payloads; the
    * "features" are reproducible byte-level stats so the oracle can verify
    * the plumbing end-to-end.
    */
  def decodeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    binaryDocs(spark, sfDir)
      .select(col("doc_id"), col("payload"), col("byte_len"))
      .as[BinaryDoc]
      .mapPartitions { it =>
        // one "decoder" per partition (models codec init cost)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { d =>
          md.reset()
          val sha = md.digest(d.payload).take(4).map(b => f"${b & 0xff}%02x").mkString
          DecodedFeatures(
            d.doc_id, d.byte_len, sha,
            if (d.payload.nonEmpty) d.payload.head & 0xff else -1,
            if (d.payload.nonEmpty) d.payload.last & 0xff else -1,
            "stub-v1")
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
}
