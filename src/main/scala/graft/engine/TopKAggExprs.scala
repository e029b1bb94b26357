package graft.engine

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Bounded per-group top-k aggregation — the ranking tail of every query
  * path (T3/T4 of SURVEY.md §2.6).
  *
  * Replaces `row_number().over(Window.partitionBy("query_id"))`: a window
  * rank serializes each query's ENTIRE candidate set through one task (a hot
  * term = the whole corpus through ≤|queries| tasks), while this aggregate
  * keeps a k-bounded heap per group with map-side partial aggregation —
  * every task reduces its slice to ≤k rows before the shuffle, so the
  * exchange moves O(tasks × k) rows regardless of corpus size. This is the
  * engine analog of the reference's `display_depth` result bound
  * (`pkg/query/query.go:40-52`) done scale-correctly.
  *
  * Ordering is the pinned oracle total order: quantized score DESC, then the
  * payload struct ASC (natural-key tiebreak, bytewise string comparison —
  * identical to DuckDB's `ORDER BY score_r DESC, key ASC`). The caller
  * passes the ALREADY-quantized score so the aggregate and the oracle rank
  * the same grid.
  */
object TopKAggExprs {

  private def toExpr(c: Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)
  private def toCol(e: Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  /** `array<struct<score_r: double, …payload fields>>` of the top-k rows of
    * the group, best-first. `k` must be constant within a group (it is: it
    * comes from the query row).
    */
  def topK(k: Column, scoreR: Column, payload: Column): Column =
    toCol(TopKByScore(toExpr(k), toExpr(scoreR), toExpr(payload)).toAggregateExpression())
}

/** Aggregation buffer: a worst-on-top heap of (score, payload) capped at k. */
final class TopKBuf(val ord: Ordering[(Double, InternalRow)]) {
  var k: Int = Int.MaxValue
  /** head = WORST kept entry (ord ranks worse = greater). */
  val heap: mutable.PriorityQueue[(Double, InternalRow)] =
    mutable.PriorityQueue.empty[(Double, InternalRow)](ord)

  def offer(score: Double, row: InternalRow): Unit = {
    if (heap.size < k) heap.enqueue((score, row))
    else if (k > 0 && ord.compare((score, row), heap.head) < 0) {
      heap.dequeue(); heap.enqueue((score, row))
    }
  }

  /** The worst kept score, or -inf below capacity — the no-allocation
    * reject gate: a row scoring strictly below this can never enter
    * (+inf for k = 0, where nothing ever enters).
    */
  def floorScore: Double =
    if (k <= 0) Double.PositiveInfinity
    else if (heap.size < k) Double.NegativeInfinity
    else heap.head._1

  def recap(): Unit = while (heap.size > k) heap.dequeue()
}

/** groupBy(query) aggregate: `(k, score_r, payload-struct)` rows → the top-k
  * `array<struct<score_r, …payload>>` by (score_r desc, payload asc).
  */
case class TopKByScore(
    k: Expression, score: Expression, payload: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  // lazy: payload is unresolved at construction; resolution replaces children
  // via withNewChildrenInternal and only then is the struct type known
  private lazy val payloadType: StructType = payload.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(k, score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(StructField("score_r", DoubleType, nullable = false) +: payloadType.fields),
    containsNull = false)

  @transient private lazy val payloadOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(payloadType)

  /** worse = lower score, or equal score and payload GREATER (so the pinned
    * ascending-key tiebreak keeps the smaller key).
    */
  @transient private lazy val worseOrd: Ordering[(Double, InternalRow)] =
    new Ordering[(Double, InternalRow)] {
      override def compare(x: (Double, InternalRow), y: (Double, InternalRow)): Int = {
        val c = java.lang.Double.compare(y._1, x._1)
        if (c != 0) c else payloadOrd.compare(x._2, y._2)
      }
    }

  @transient private lazy val proj: UnsafeProjection = UnsafeProjection.create(payloadType)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(worseOrd)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val kk = k.eval(input).asInstanceOf[Int]
    if (kk < b.k) { b.k = kk; b.recap() }
    val s = score.eval(input).asInstanceOf[Double]
    // Reject-by-score fast path: with a full heap, a row scoring strictly
    // below the worst kept entry can never enter — skip the payload eval +
    // UnsafeProjection + copy entirely. On a hot-term candidate set (~N
    // rows funneling into a k=10 heap) this removes one row-sized
    // allocation per rejected row; ties at the floor still take the full
    // compare below (the ascending-key tiebreak needs the payload).
    val floor = b.floorScore
    if (s < floor) return b
    val p = payload.eval(input).asInstanceOf[InternalRow]
    val u = proj(p)
    // Tie at the floor (the common case for ultra-hot terms, whose scores
    // collapse onto a few quantized grid points): compare keys BEFORE
    // copying — only a row that actually displaces the worst entry pays the
    // copy. `floor` finite ⇒ the heap is at capacity and head exists.
    if (s == floor && !floor.isInfinite && b.ord.compare((s, u), b.heap.head) >= 0) return b
    // copy through an UnsafeProjection: the eval row may alias reused buffers
    b.offer(s, u.copy())
    b
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    if (b.k < a.k) { a.k = b.k; a.recap() }
    b.heap.foreach { case (s, r) => a.offer(s, r) }
    a
  }

  override def eval(b: TopKBuf): Any = {
    val best = b.heap.toSeq.sorted(worseOrd) // ascending worseOrd = best-first
    val n = payloadType.fields.length
    val rows = best.map { case (s, r) =>
      val vals = new Array[Any](n + 1)
      vals(0) = s
      var i = 0
      while (i < n) { vals(i + 1) = r.get(i, payloadType.fields(i).dataType); i += 1 }
      new GenericInternalRow(vals)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    val entries = b.heap.toSeq.map { case (s, r) => (s, r.asInstanceOf[UnsafeRow].getBytes) }
    val bb = ByteBuffer.allocate(8 + entries.map(_._2.length + 12).sum)
    bb.putInt(b.k)
    bb.putInt(entries.length)
    entries.foreach { case (s, bytes) =>
      bb.putDouble(s); bb.putInt(bytes.length); bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKBuf(worseOrd)
    b.k = bb.getInt()
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(payloadType.fields.length)
      row.pointTo(arr, len)
      b.offer(s, row)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(k = c(0), score = c(1), payload = c(2))
  override def prettyName: String = "top_k_by_score"
}
