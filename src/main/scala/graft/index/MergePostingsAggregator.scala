package graft.index

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator

/** Segment → global index merge aggregate (SURVEY.md §2.4 J2 analog of the
  * reference's conditional edge upsert): combines one term's per-salt
  * sub-posting lists into the single global posting list.
  *
  * Sub-lists come from disjoint docId salt shards, so the merged list is a
  * union of disjoint sorted runs; we re-sort on finish (O(df log df)) —
  * simpler than a k-way heap merge and identical output. Memory is bounded
  * by one term's global df; at 10^12-doc scale the query path can read the
  * salted segments directly (WAND does), so the global merge is an
  * optimization for small/medium dfs, not a correctness requirement.
  */
final class MergePostingsAggregator(avgdl: Double)
    extends Aggregator[Row, PostingBuf, Row] {

  override def zero: PostingBuf = new PostingBuf

  override def reduce(b: PostingBuf, in: Row): PostingBuf = {
    val (docIds, tfs, dls) = Postings.decode(in.getAs[Array[Byte]](0), in.getAs[Array[Byte]](1))
    var i = 0
    while (i < docIds.length) {
      b.add(docIds(i), tfs(i), dls(i))
      i += 1
    }
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
