package graft.index

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator

/** The core index-build aggregate (SURVEY.md §2.5 A6): builds one term's
  * delta+varint-compressed posting list with block-max metadata, directly
  * from `(doc_id, tf, dl)` rows — no giant `collect_list` array ever
  * materializes in the Catalyst plan.
  *
  * `avgdl` is a constructor constant: corpus stats are a cheap separate
  * pass that runs before posting build (the reference similarly persists
  * nodes before edges, `pkg/crawl/crawl.go:148-166`).
  *
  * Used as `groupBy("term").agg(udaf(new PostingAggregator(avgdl))(...))`;
  * ObjectHashAggregate does map-side partial merge, and falls back to
  * sort-based aggregation automatically when groups exceed memory. The
  * buffer is [[PostingBuf]] — primitive growable arrays with a compact
  * Kryo wire form (an ArrayBuffer[Long] buffer boxed every id and was the
  * GC bottleneck of the sf0.1 build).
  */
final class PostingAggregator(avgdl: Double)
    extends Aggregator[Row, PostingBuf, Row] {

  override def zero: PostingBuf = new PostingBuf

  override def reduce(b: PostingBuf, in: Row): PostingBuf = {
    b.add(in.getLong(0), in.getLong(1).toInt, in.getLong(2))
    b
  }

  override def merge(a: PostingBuf, b: PostingBuf): PostingBuf = {
    a.addAll(b)
    a
  }

  override def finish(b: PostingBuf): Row = PostingAggregator.finishRow(b, avgdl)

  override def bufferEncoder: Encoder[PostingBuf] = Encoders.kryo[PostingBuf]
  override def outputEncoder: Encoder[Row] = PostingAggregator.outputRowEncoder
}

object PostingAggregator {
  import org.apache.spark.sql.types._

  val outputSchema: StructType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("sum_tf", LongType, nullable = false),
    StructField("postings", BinaryType, nullable = false),
    StructField("dls", BinaryType, nullable = false),
    StructField("block_max", ArrayType(DoubleType, containsNull = false), nullable = false)))

  def outputRowEncoder: Encoder[Row] = Encoders.row(outputSchema)

  /** Sort the buffer by docId and encode — shared by build and merge. */
  def finishRow(b: PostingBuf, avgdl: Double): Row = {
    val n = b.size
    val idx = Array.range(0, n).sortBy(b.docIds(_))
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
    val dls = new Array[Long](n)
    var i = 0
    while (i < n) {
      docIds(i) = b.docIds(idx(i)); tfs(i) = b.tfs(idx(i)); dls(i) = b.dls(idx(i))
      i += 1
    }
    val e = Postings.encode("", docIds, tfs, dls, avgdl)
    Row(e.df, e.sumTf, e.postings, e.dls, e.blockMax)
  }
}
