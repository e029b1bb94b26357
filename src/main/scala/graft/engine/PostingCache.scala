package graft.engine

import graft.index.Postings
import java.util.{LinkedHashMap => JLinkedHashMap, Map => JMap}

/** Executor-local posting-list cache — the engine analog of a search
  * engine's block cache (the reference holds its Dgraph LRU cache resident,
  * `deployments/docker-compose.yaml --lru_mb`).
  *
  * Round 1 re-decoded every hot posting list on EVERY query (q01 "func" =
  * ~600k postings × 16 shards per call — the 73 s WAND p99 in BENCH_r01).
  * This memoizes block-lazy [[Postings.PostingsBlocks]] handles per
  * (index, salt, term): a block is decompressed at most once per executor,
  * and only if a query's WAND cursor actually lands in it. The LRU is
  * bounded by total postings HELD (decoded or not, an upper bound on the
  * decoded footprint); the key embeds the index root + build stats, so a
  * rebuild (different stats) cannot serve stale arrays. On a multi-executor
  * cluster each executor caches the shards it serves.
  */
object PostingCache {

  /** Max postings held across cached lists (≈24 B each decoded → ~400 MB). */
  @volatile var maxPostings: Long = 16L * 1024 * 1024

  private final case class Entry(blocks: Postings.PostingsBlocks)

  private var held: Long = 0L

  private val lru = new JLinkedHashMap[String, Entry](1024, 0.75f, true) {
    override def removeEldestEntry(e: JMap.Entry[String, Entry]): Boolean = false // manual eviction
  }

  /** Memoized block-lazy handle for one (index, salt, term) sub-list. */
  def open(tag: String, salt: Int, term: String, count: Long,
      postings: Array[Byte], dls: Array[Byte], blockDir: Array[Byte]): Postings.PostingsBlocks = {
    val key = s"$tag#$salt#$term"
    lru.synchronized {
      val hit = lru.get(key)
      if (hit != null) return hit.blocks
    }
    val blocks = Postings.PostingsBlocks.fromEncoded(count, postings, dls, blockDir)
    lru.synchronized {
      val race = lru.get(key)
      if (race != null) return race.blocks
      lru.put(key, Entry(blocks))
      held += blocks.count
      val it = lru.entrySet().iterator()
      while (held > maxPostings && it.hasNext) {
        val e = it.next()
        if (e.getKey != key) { held -= e.getValue.blocks.count; it.remove() }
      }
      blocks
    }
  }

  /** Drop every entry of one index root (called on rebuild/invalidate). */
  def invalidatePrefix(rootPrefix: String): Unit = lru.synchronized {
    val it = lru.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(rootPrefix)) { held -= e.getValue.blocks.count; it.remove() }
    }
  }
}
