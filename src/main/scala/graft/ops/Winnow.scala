package graft.ops

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm) as a native Catalyst expression.
  *
  * The v6 implementation computed one sha256 PER CHARACTER POSITION through
  * a Column `transform` plus an O(L·w) windowed-min over 16-char hex
  * strings — oracle-exact, but ~two orders of magnitude more arithmetic
  * than the textbook Rabin–Karp scan, and at 100 TB the winnow pass would
  * have dominated the pipeline. This version is the textbook scan: one
  * O(L) pass per document computing the rolling polynomial k-gram hash and
  * the per-window minima via a monotonic deque, inside a scalar
  * [[WinnowFingerprints]] expression (CodegenFallback: the per-row work is
  * character-loop-bound, not dispatch-bound).
  *
  * Hash (pinned here AND in the DuckDB oracle, [[OpsOracleSql]]):
  * `h(i) = Σ_{j<K} code(i+j)·B^(K-1-j) mod M` with B = [[Base]],
  * M = [[Mod]] (2^31−1, Mersenne — all intermediates fit a 64-bit long,
  * and DuckDB evaluates the same polynomial in BIGINT without overflow).
  * The oracle computes the polynomial form per position; the rolling update
  * here is algebraically identical, so the two engines produce bit-equal
  * fingerprints. Positions are UTF-16 code units on this side and
  * characters on the DuckDB side — identical on ASCII text, which the
  * `documents` table guarantees.
  *
  * Winnowing guarantee (unchanged): any shared substring of length
  * ≥ K + W − 1 yields at least one shared fingerprint. Docs shorter than K
  * yield an empty set; docs with fewer than W grams collapse to the single
  * global minimum (same boundary semantics as v6, WinnowSpec pins them).
  */
object Winnow {

  /** k-gram size. */
  val K: Int = 8

  /** window width. */
  val W: Int = 4

  /** Hash modulus: 2^31 − 1 (Mersenne prime). Small enough that every
    * intermediate of both the rolling update and the oracle's 8-term
    * polynomial fits a 64-bit integer; fingerprint collisions only ever ADD
    * dedup candidates, and candidates are verified exactly downstream.
    */
  val Mod: Long = 2147483647L

  /** Polynomial base (any value > max code point mod M works; 131 is the
    * conventional Rabin–Karp choice).
    */
  val Base: Long = 131L

  /** B^e mod M — the oracle inlines pow(K-1-j) as literal coefficients. */
  def pow(e: Int): Long = {
    var p = 1L
    var i = 0
    while (i < e) { p = p * Base % Mod; i += 1 }
    p
  }

  private val BaseK1: Long = pow(K - 1)

  /** Sorted distinct winnowing fingerprints of `s` — one O(L) pass:
    * rolling k-gram hashes and sliding-window minima (monotonic deque).
    */
  def fingerprints(s: String): Array[Long] = {
    val n = s.length
    if (n < K) return Array.emptyLongArray
    val m = n - K + 1
    val h = new Array[Long](m)
    var cur = 0L
    var i = 0
    while (i < K) { cur = (cur * Base + s.charAt(i)) % Mod; i += 1 }
    h(0) = cur
    i = 1
    while (i < m) {
      // drop s(i-1), shift, add s(i+K-1); (cur - out·B^(K-1)) kept positive
      cur = ((cur - s.charAt(i - 1) * BaseK1 % Mod + Mod) * Base + s.charAt(i + K - 1)) % Mod
      h(i) = cur
      i += 1
    }
    val mins = new java.util.TreeSet[java.lang.Long]()
    if (m < W) {
      var min = h(0); i = 1
      while (i < m) { if (h(i) < min) min = h(i); i += 1 }
      mins.add(min)
    } else {
      // monotonic deque of indices with increasing hash values
      val deque = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail)
      i = 0
      while (i < m) {
        while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - W) head += 1
        if (i >= W - 1) mins.add(h(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](mins.size)
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Column form: `array<bigint>` of sorted distinct fingerprints. */
  def fingerprintsCol(text: Column): Column =
    GraftColumnBridge.column(WinnowFingerprints(GraftColumnBridge.expression(text)))
}

/** Scalar expression wrapping [[Winnow.fingerprints]] — a unary
  * string → array<long> map, null-safe. CodegenFallback on purpose: the
  * per-row cost is the O(L) character loop, not the dispatch, and a
  * generated-code version would duplicate the deque logic for no
  * measurable win.
  */
final case class WinnowFingerprints(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(Winnow.fingerprints(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
