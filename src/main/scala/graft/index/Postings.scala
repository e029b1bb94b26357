package graft.index

import graft.score.BM25
import scala.collection.mutable.ArrayBuffer

/** One encoded posting list as stored in a segment / the global index.
  *
  * The engine analog of the reference's `links: [uid] @count @reverse`
  * predicate (`pkg/database/relationship/dgraph.go:45`): a term's edge list
  * to its documents, with the `@count` index materialized as `df` and
  * block-max metadata added for WAND (north rule).
  *
  * - `postings`: delta+varint (docId gaps, then tfs) — [[Varint]] format
  * - `dls`: varint run of per-posting doc lengths (posting order) — makes
  *   scoring self-contained, no doc-table join on the query hot path
  * - `blockMax`: per-[[Postings.BlockSize]]-postings max of the BM25 tf
  *   normalization `tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`; query-time upper
  *   bound for a block is `idf * blockMax` since idf is per-term constant
  */
final case class EncodedPostings(
    term: String,
    df: Long,
    sumTf: Long,
    postings: Array[Byte],
    dls: Array[Byte],
    blockMax: Array[Double])

object Postings {
  val BlockSize: Int = 128

  /** Encode postings sorted strictly by docId, with per-block max tfNorm. */
  def encode(term: String, docIds: Array[Long], tfs: Array[Int], dls: Array[Long], avgdl: Double): EncodedPostings = {
    val bytes = Varint.encode(docIds, tfs)
    val dlBuf = new ArrayBuffer[Byte](dls.length * 2)
    var i = 0
    while (i < dls.length) { Varint.writeUnsigned(dlBuf, dls(i)); i += 1 }
    val nBlocks = (docIds.length + BlockSize - 1) / BlockSize
    val bm = new Array[Double](nBlocks)
    var sumTf = 0L
    i = 0
    while (i < docIds.length) {
      val tfn = tfNorm(tfs(i), dls(i), avgdl)
      val b = i / BlockSize
      if (tfn > bm(b)) bm(b) = tfn
      sumTf += tfs(i)
      i += 1
    }
    EncodedPostings(term, docIds.length.toLong, sumTf, bytes, dlBuf.toArray, bm)
  }

  /** Decode to (docIds, tfs, dls). */
  def decode(postings: Array[Byte], dls: Array[Byte]): (Array[Long], Array[Int], Array[Long]) = {
    val (docIds, tfs) = Varint.decode(postings)
    val r = new Varint.Reader(dls)
    val out = new Array[Long](docIds.length)
    var i = 0
    while (i < out.length) { out(i) = r.readUnsigned(); i += 1 }
    (docIds, tfs, out)
  }

  /** Scalar BM25 tf normalization — MUST mirror [[BM25.tfNorm]]'s Column
    * expression tree op-for-op so index-path scores are bit-identical to the
    * naive Catalyst plan.
    */
  @inline def tfNorm(tf: Int, dl: Long, avgdl: Double): Double =
    (tf.toDouble * BM25.K1Plus1) /
      (tf.toDouble + BM25.K1 * (BM25.OneMinusB + (BM25.B * dl.toDouble) / avgdl))

  /** Scalar idf — mirrors [[BM25.idf]]. */
  @inline def idf(df: Long, n: Long): Double =
    math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
}
