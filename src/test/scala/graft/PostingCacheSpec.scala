package graft

import graft.engine.PostingCache
import graft.index.Postings
import org.scalatest.funsuite.AnyFunSuite

/** Striped-cache invariants: concurrent opens of the same key converge on
  * one shared handle with intact content, eviction under a tiny budget
  * never corrupts reads, and prefix invalidation drops only its root.
  */
class PostingCacheSpec extends AnyFunSuite {

  private def encoded(term: String, n: Int): (Long, Array[Byte], Array[Byte], Array[Byte]) = {
    val ids = Array.tabulate(n)(i => (i * 3 + 1).toLong)
    val tfs = Array.tabulate(n)(i => 1 + (i % 5))
    val dls = Array.tabulate(n)(i => 10L + (i % 7))
    val e = Postings.encode(term, ids, tfs, dls, avgdl = 12.0)
    (n.toLong, e.postings, e.dls, e.blockDir)
  }

  test("concurrent opens: one shared handle per key, content intact under stripe contention") {
    val keys = (0 until 64).map(t => (s"t$t", encoded(s"t$t", 200 + t)))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Postings.PostingsBlocks]
    val threads = (0 until 16).map { ti =>
      new Thread(() => {
        try {
          val rnd = new scala.util.Random(ti)
          (0 until 2000).foreach { _ =>
            val (term, (cnt, p, d, dir)) = keys(rnd.nextInt(keys.size))
            val h = PostingCache.open("cacheSpecRoot@v1", 0, term, cnt, p, d, dir)
            val prev = seen.putIfAbsent(term, h)
            if (prev != null) assert(prev eq h, s"two live handles for $term")
            // spot-check content through the lazy decode path
            assert(h.id(0) === 1L && h.count === cnt.toInt)
            assert(h.tf(h.count - 1) === 1 + ((h.count - 1) % 5))
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent open failed: ${Option(errors.peek()).map(_.toString)}")
    PostingCache.invalidatePrefix("cacheSpecRoot")
  }

  test("eviction budget is GLOBAL: a lone hot stripe may hold the whole budget") {
    // round-3 advice: with a per-stripe budget of maxPostings/16, a hot-term
    // set hashing into one stripe starts thrashing at 1/16 of the configured
    // size. Craft keys that all land in one stripe and verify they ALL stay
    // resident as long as the GLOBAL total fits.
    val prev = PostingCache.maxPostings
    PostingCache.invalidatePrefix("") // drain: the global counter must start ~0
    try {
      PostingCache.maxPostings = 4000
      val stripeOf = (term: String) =>
        math.floorMod(s"hotStripeRoot@v1#7#$term".hashCode, 16)
      val target = stripeOf("probe0") // whichever stripe — all keys must share it
      val hotTerms = Iterator.from(0).map(i => s"probe$i")
        .filter(t => stripeOf(t) == target).take(10).toSeq
      val handles = hotTerms.map { t =>
        val (cnt, p, d, dir) = encoded(t, 300) // 10 × 300 = 3000 < 4000 global
        t -> PostingCache.open("hotStripeRoot@v1", 7, t, cnt, p, d, dir)
      }
      // 3000 postings in ONE stripe >> old per-stripe budget (4000/16 = 250):
      // with the global budget none may have been evicted
      handles.foreach { case (t, h) =>
        val (cnt, p, d, dir) = encoded(t, 300)
        assert(PostingCache.open("hotStripeRoot@v1", 7, t, cnt, p, d, dir) eq h,
          s"hot-stripe entry $t was evicted below the global budget")
      }
    } finally {
      PostingCache.maxPostings = prev
      PostingCache.invalidatePrefix("hotStripeRoot")
    }
  }

  test("tiny budget: eviction churns but reads stay correct; invalidatePrefix is scoped") {
    val prev = PostingCache.maxPostings
    try {
      PostingCache.maxPostings = 2048 // << 64 lists × ~200 postings
      (0 until 200).foreach { i =>
        val term = s"e${i % 64}"
        val (cnt, p, d, dir) = encoded(term, 300)
        val h = PostingCache.open("cacheSpecEvict@v1", 1, term, cnt, p, d, dir)
        assert(h.id(0) === 1L && h.dl(5) === 15L)
      }
      // other-root entries survive an unrelated invalidation
      val (cnt, p, d, dir) = encoded("keep", 100)
      val kept = PostingCache.open("cacheSpecOther@v1", 0, "keep", cnt, p, d, dir)
      PostingCache.invalidatePrefix("cacheSpecEvict")
      val again = PostingCache.open("cacheSpecOther@v1", 0, "keep", cnt, p, d, dir)
      assert(kept eq again, "unrelated root was invalidated")
      PostingCache.invalidatePrefix("cacheSpecOther")
    } finally PostingCache.maxPostings = prev
  }
}
