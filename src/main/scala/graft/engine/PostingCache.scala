package graft.engine

import graft.index.Postings
import java.util.{LinkedHashMap => JLinkedHashMap, Map => JMap}

/** Executor-local decoded-postings cache — the engine analog of a search
  * engine's block cache (the reference holds its Dgraph LRU cache resident,
  * `deployments/docker-compose.yaml --lru_mb`).
  *
  * Round 1 re-decoded every hot posting list on EVERY query (q01 "func" =
  * ~600k postings × 16 shards per call — the 73 s WAND p99 in BENCH_r01).
  * Decoding is one-time work per (index, salt, term) on an executor; this
  * memoizes it with an LRU bounded by total postings held, so a steady-state
  * query stream pays decode only on first touch. On a multi-executor
  * cluster each executor caches the shards it serves; the key embeds the
  * index root + build stats, so a rebuild (different stats) cannot serve
  * stale arrays.
  */
object PostingCache {

  /** Max decoded postings held (≈24 B each → ~400 MB at the default). */
  @volatile var maxPostings: Long = 16L * 1024 * 1024

  private final case class Entry(ids: Array[Long], tfs: Array[Int], dls: Array[Long])

  private var held: Long = 0L

  private val lru = new JLinkedHashMap[String, Entry](1024, 0.75f, true) {
    override def removeEldestEntry(e: JMap.Entry[String, Entry]): Boolean = false // manual eviction
  }

  def decode(tag: String, salt: Int, term: String,
      postings: Array[Byte], dls: Array[Byte]): (Array[Long], Array[Int], Array[Long]) = {
    val key = s"$tag#$salt#$term"
    lru.synchronized {
      val hit = lru.get(key)
      if (hit != null) return (hit.ids, hit.tfs, hit.dls)
    }
    val (ids, tfs, ds) = Postings.decode(postings, dls)
    lru.synchronized {
      if (!lru.containsKey(key)) {
        lru.put(key, Entry(ids, tfs, ds))
        held += ids.length
        val it = lru.entrySet().iterator()
        while (held > maxPostings && it.hasNext) {
          val e = it.next()
          if (e.getKey != key) { held -= e.getValue.ids.length; it.remove() }
        }
      }
    }
    (ids, tfs, ds)
  }

  /** Drop every entry of one index root (called on rebuild/invalidate). */
  def invalidatePrefix(rootPrefix: String): Unit = lru.synchronized {
    val it = lru.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(rootPrefix)) { held -= e.getValue.ids.length; it.remove() }
    }
  }
}
