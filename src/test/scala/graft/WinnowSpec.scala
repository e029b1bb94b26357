package graft

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The winnowing guarantee (Schleimer/Wilkerson/Aiken): any substring match
  * of length ≥ k + w − 1 yields at least one SHARED fingerprint — that is
  * the property that makes min-per-window selection a sound dedup blocking
  * key. Cross-engine value identity is pinned by the `text_winnow` /
  * `dedup_winnow` oracles; this spec pins the guarantee itself plus the
  * short-document edges.
  */
class WinnowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fps(texts: (Long, String)*): Map[Long, Set[Long]] = {
    val s = spark
    import s.implicits._
    TextOps.winnow(texts.toSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSet }
  }

  test("rolling hash + deque minima == direct polynomial + naive minima (the oracle form)") {
    import graft.ops.Winnow
    val k = Winnow.K; val w = Winnow.W
    for (s <- Seq(
        "the quick brown fox 0123456789 zqxjkvwpbmf jumps",
        "aaaaaaaaaaaaaaaaaa",         // degenerate: all-equal hashes
        "abcdefghij",                 // m = 3 < w: global-min branch
        "package parser import buffer cust_7")) {
      // what DuckDB computes: the polynomial per position, naive window mins
      val direct = (0 to s.length - k).map { i =>
        (0 until k).map(j => s.charAt(i + j).toLong * Winnow.pow(k - 1 - j)).sum % Winnow.Mod
      }
      val naive =
        if (direct.size < w) Set(direct.min)
        else (0 to direct.size - w).map(i => direct.slice(i, i + w).min).toSet
      val got = Winnow.fingerprints(s)
      assert(got.toSet === naive, s"fingerprint set diverged for: $s")
      assert(got.toSeq === got.toSeq.sorted, "fingerprints must come out sorted")
    }
  }

  test("guarantee: a shared substring of length >= k + w - 1 shares a fingerprint") {
    val shared = "zqxjkvwpbmf" // k + w - 1 = 11 chars, unlikely elsewhere
    assert(shared.length == TextOps.WinnowK + TextOps.WinnowW - 1)
    val m = fps(
      1L -> s"left context aaa $shared end one",
      2L -> s"completely different prefix $shared and tail")
    assert((m(1L) intersect m(2L)).nonEmpty,
      "winnowing guarantee violated: no shared fingerprint for a k+w-1 match")
  }

  test("short-document edges: < k chars -> no fingerprints; < w grams -> global min") {
    val m = fps(1L -> "short", 2L -> "abcdefgh", 3L -> "abcdefghi")
    assert(!m.contains(1L), "doc shorter than k must have no fingerprints")
    assert(m(2L).size == 1 && m(3L).size == 1, "sub-window docs collapse to the global min")
  }

  test("near-identical docs pair up; unrelated docs do not") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again and again"
    val docs = Seq(
      (1L, base), (2L, base + " tail"), // near-identical
      (3L, "totally unrelated content with nothing in common whatsoever here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "near-identical docs must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }
}
