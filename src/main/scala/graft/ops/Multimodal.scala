package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat payloads as opaque `binary` columns
  * with typed metadata, and run batched per-partition decode / feature
  * extract over them.
  *
  * Two decoders:
  *  - [[decodePgmFeatures]] — a REAL image decoder: payloads are genuine
  *    binary PGM (netpbm P5) images, and the decoder parses the byte-level
  *    header (magic, ASCII dimensions, maxval) and raw pixel plane with no
  *    external codec library — netpbm is pure byte arithmetic, so the
  *    decode step is no longer a stub. The oracle cross-checks the decoded
  *    width/height/min/max/mean from the image CONSTRUCTION (it never
  *    parses), so a parser bug cannot self-verify.
  *  - [[decodeFeatures]] — the deterministic stub kept for opaque formats
  *    this environment has no codec for (JPEG/audio/video).
  *
  * At scale this is the mapInPandas/mapPartitions pattern: one decoder
  * instance per partition, vectorized batches, metadata kept columnar so
  * Catalyst can prune/push down around the opaque blob.
  */
object Multimodal {

  /** Fixed PGM raster width; height grows with the payload. */
  val PgmWidth = 32
  /** Pad byte filling the final raster row (ASCII space). */
  val PgmPad = 32

  final case class PgmDoc(doc_id: Long, payload: Array[Byte])
  final case class PgmFeatures(
      doc_id: Long, width: Int, height: Int,
      min_gray: Int, max_gray: Int, mean_gray_r: Double, decoder: String)

  /** Encode each document's bytes as a REAL binary PGM (P5) image:
    * `P5\n<w> <h>\n255\n` header + row-major 8-bit pixels (text bytes,
    * space-padded to the raster). Stands in for an image ingest column.
    */
  def pgmDocs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TextOps.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[PgmDoc]
      .map { d =>
        val n = d.payload.length
        val h = math.max(1, (n + PgmWidth - 1) / PgmWidth)
        val pixels = java.util.Arrays.copyOf(d.payload, PgmWidth * h)
        java.util.Arrays.fill(pixels, n, pixels.length, PgmPad.toByte)
        val header = s"P5\n$PgmWidth $h\n255\n".getBytes("US-ASCII")
        PgmDoc(d.doc_id, header ++ pixels)
      }
      .toDF("doc_id", "payload")
  }

  /** REAL PGM decode: parse the binary header byte-by-byte (magic,
    * whitespace-separated ASCII width/height/maxval) and the raw pixel
    * plane; emit per-image features. Malformed payloads yield a
    * `decoder = "error"` row instead of failing the batch (the 404-analog
    * of P7: bad blobs are recorded, not fatal).
    */
  def decodePgmFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pgmDocs(spark, sfDir)
      .as[PgmDoc]
      .mapPartitions { it =>
        it.map { d =>
          parsePgm(d.payload) match {
            case Some((w, h, px)) =>
              var mn = 255; var mx = 0; var sum = 0L
              var i = 0
              while (i < px.length) {
                val v = px(i) & 0xff
                if (v < mn) mn = v
                if (v > mx) mx = v
                sum += v
                i += 1
              }
              val mean = sum.toDouble / px.length
              PgmFeatures(d.doc_id, w, h, mn, mx,
                math.floor(mean * 1e6 + 0.5) / 1e6, "pgm-v1")
            case None =>
              PgmFeatures(d.doc_id, -1, -1, -1, -1, -1.0, "error")
          }
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Byte-level P5 parser: returns (width, height, pixels) or None. */
  private[graft] def parsePgm(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    var i = 0
    def eof = i >= b.length
    def skipWs(): Unit = { while (!eof && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1 }
    def readInt(): Option[Int] = {
      skipWs()
      var v = 0L; var any = false
      while (!eof && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); any = true; i += 1; if (v > Int.MaxValue) return None }
      if (any) Some(v.toInt) else None
    }
    if (b.length < 2 || b(0) != 'P' || b(1) != '5') return None
    i = 2
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    (readInt(), readInt(), readInt()) match {
      case (Some(w), Some(h), Some(maxval))
          if w > 0 && h > 0 && maxval == 255 && !eof && isWs(b(i)) =>
        i += 1 // the single (verified) whitespace byte after maxval
        // Long arithmetic: Int w*h could wrap (e.g. 65536×65536 → 0) and
        // accept an absurd-dimension header against an empty pixel plane
        if ((b.length - i).toLong == w.toLong * h.toLong)
          Some((w, h, java.util.Arrays.copyOfRange(b, i, b.length)))
        else None
      case _ => None
    }
  }

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
