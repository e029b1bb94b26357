package graft.ops

import graft.score.BM25
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact (hash
  * groupBy), n-gram Jaccard, MinHash+LSH, and SimHash near-dup detection.
  * All shapes are the scalable ones (explode → equi-join on
  * shingle/band/chunk keys, never an unbounded cross join), demonstrated on
  * the `documents` table and mirrored term-for-term by [[OpsOracleSql]].
  */
object Dedup {

  val ShingleSize = 3          // token 3-grams
  val MinhashK = 16            // hash functions
  val MinhashBandRows = 4      // → 4 bands of 4 rows
  val JaccardThreshold = 0.8
  /** Blocking cap: shingles with df above this are too common to be useful
    * candidate-generation keys — ONE ubiquitous shingle ("the quick brown")
    * makes its join group quadratic at corpus scale. Capped shingles still
    * count toward the EXACT Jaccard of candidate pairs (verification uses
    * full shingle sets); they just can't be the only link that nominates a
    * pair. Standard MinHash/LSH practice; the oracle mirrors the same cap.
    */
  val MaxShingleDf = 50
  val SimhashBits = 48         // keep sign bit clear of Long
  val SimhashChunks = 4        // 12-bit chunks; hamming ≤ 3 → pigeonhole hit
  val SimhashMaxHamming = 3
  val CosineThreshold = 0.35

  /** Exact dedup: sha256(text) groupBy — the A2 visited-set analog at
    * training-data scale. Emits every hash group with its canonical doc.
    *
    * Group labels come from a groupBy + hash-join back, NOT a
    * `Window.partitionBy(text_sha)`: a window (even without ORDER BY)
    * funnels each partition key through ONE task, and dedup's target case
    * is exactly the pathological key — 10^7 copies of the same README hash
    * at 100 TB. Both the aggregate and the join here hash-partition, so a
    * mass-duplicated group spreads across the cluster.
    */
  def exact(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), sha2(col("text"), 256).as("text_sha"))
    val groups = hashed.groupBy("text_sha")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("group_size"))
    hashed.join(groups, "text_sha")
      .select("doc_id", "text_sha", "canonical_id", "group_size")
      .orderBy("doc_id")
  }

  /** Distinct token 3-gram shingles per doc: (doc_id, shingle). */
  def shingles(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val sh = when(size(toks) >= ShingleSize,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (ShingleSize - 1)),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), explode(sh).as("shingle"))
  }

  /** Exact Jaccard over FULL shingle sets, restricted to the given
    * candidate pairs — the shared verification tail of the n-gram and LSH
    * paths. Cost is O(|candidates| × avg shingles), never a corpus-wide
    * self-join: the intersection count comes from joining candidates to
    * each side's shingles on (doc, shingle).
    */
  private[ops] def jaccardOnCandidates(ex: DataFrame, candidates: DataFrame): DataFrame = {
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = ex.toDF("ida", "shingle")
    val b = ex.toDF("idb", "shingle")
    val inter = candidates.join(a, "ida").join(b, Seq("idb", "shingle"))
      .groupBy("ida", "idb")
      .agg(count(lit(1)).as("n_common"))
    val jac = col("n_common").cast("double") /
      (col("na") + col("nb") - col("n_common")).cast("double")
    inter
      .join(sizes.toDF("ida", "na"), "ida")
      .join(sizes.toDF("idb", "nb"), "idb")
      .filter(jac >= JaccardThreshold)
      .select(col("ida"), col("idb"), BM25.quantize(jac).as("jac_r"))
  }

  /** n-gram Jaccard pairs ≥ threshold, with BLOCKED candidate generation.
    * Candidates are pairs sharing ≥1 non-ubiquitous shingle (df ≤
    * [[MaxShingleDf]] — the blocking key); verification then computes the
    * EXACT Jaccard over the candidates' full shingle sets (hot shingles
    * included).
    *
    * RECALL BOUND, not exact-recall: a duplicate cluster in which EVERY
    * shared shingle has df > [[MaxShingleDf]] (i.e. the same content
    * duplicated to more than ~MaxShingleDf docs) is never nominated by
    * this path — the blocking cap that keeps candidate generation
    * non-quadratic is exactly what hides it. Mass-duplicated content is
    * therefore routed to [[minhashLshPairs]], whose band keys are MIN-hash
    * values (one row per doc per band, df-independent) and are unaffected
    * by the cap, or to [[exact]]/[[TextOps.fingerprint]] for verbatim
    * copies. Verified pairs themselves are exact (no false positives).
    */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    // the exploded shingle relation feeds five plan branches (df filter,
    // both candidate sides, both verification sides + sizes) — without a
    // persist each branch re-tokenizes and re-explodes the corpus (r6:
    // ~5× of this entry's wall at sf0.01)
    // lifetime: like NaiveSearch's per-call persists, released by session
    // end / the caller's unpersist-all (the returned frame's lineage
    // references the cache, so this function cannot release it itself)
    val ex = shingles(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rare = ex.join(
      ex.groupBy("shingle").agg(count(lit(1)).as("sdf"))
        .filter(col("sdf") <= MaxShingleDf).select("shingle"),
      "shingle")
    val a = rare.as("a"); val b = rare.as("b")
    val candidates = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    jaccardOnCandidates(ex, candidates).orderBy("ida", "idb")
  }

  /** Winnowing near-dup pairs: MOSS-style fingerprints
    * ([[TextOps.winnowFingerprints]]) as the blocking key — pairs sharing
    * ≥1 non-ubiquitous fingerprint (df ≤ [[MaxShingleDf]]) are verified
    * with the exact Jaccard over FULL fingerprint sets. Same scale shape as
    * the n-gram path (equi-join blocking, candidates-only verification),
    * but substring-based instead of token-based: robust to tokenization
    * differences and partial overlaps ≥ k + w − 1 chars.
    */
  def winnowPairs(docs: DataFrame): DataFrame = {
    // persisted for the same five-consumer reason as [[ngramJaccardPairs]]
    val ex = docs.select(col("doc_id"),
      explode(TextOps.winnowFingerprints(col("text"))).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rare = ex.join(
      ex.groupBy("shingle").agg(count(lit(1)).as("sdf"))
        .filter(col("sdf") <= MaxShingleDf).select("shingle"),
      "shingle")
    val a = rare.as("a"); val b = rare.as("b")
    val candidates = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    jaccardOnCandidates(ex, candidates).orderBy("ida", "idb")
  }

  /** MinHash signatures: K min-sha256 values per doc (portable "hash
    * functions": min over sha256(k + ":" + shingle) hex strings — a
    * lexicographic min of hex IS a numeric min of the 256-bit hash).
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSignaturesOf(shingles(docs))

  private def minhashSignaturesOf(ex: DataFrame): DataFrame = {
    val aggs = (0 until MinhashK).map(k =>
      min(sha2(concat(lit(s"$k:"), col("shingle")), 256)).as(s"mh$k"))
    ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH near-dup pairs: band signatures → bucket equi-join →
    * verify candidates with exact Jaccard ≥ threshold. Probabilistic
    * candidate recall (that's the point of LSH); the oracle runs the same
    * banding, so results match deterministically.
    */
  def minhashLshPairs(docs: DataFrame): DataFrame = {
    // ONE persisted shingle relation feeds the signature aggregation AND
    // the verification tail (previously two independent re-derivations)
    val ex = shingles(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = minhashSignaturesOf(ex)
    val nBands = MinhashK / MinhashBandRows
    val bands = sig.select(col("doc_id"), explode(array((0 until nBands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        concat_ws("|", (0 until MinhashBandRows).map(r => col(s"mh${bIdx * MinhashBandRows + r}")): _*).as("key"))
    }: _*)).as("b")).select(col("doc_id"), col("b.band"), col("b.key"))
    val x = bands.as("x"); val y = bands.as("y")
    val candidates = x.join(y,
      col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
      .distinct()
    // verify ONLY the candidate pairs with the exact full-set Jaccard —
    // never the corpus-wide shingle self-join LSH exists to avoid
    jaccardOnCandidates(ex, candidates)
      .orderBy("ida", "idb")
  }

  /** 48-bit SimHash per doc from per-token sha256 nibbles (bit j of a token
    * = bit (3−j%4) of hex nibble j/4; doc bit j = sign of Σ_tokens (2·bit−1),
    * ties → 1). Returns (doc_id, simhash).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("t"))
      .withColumn("h", sha2(col("t"), 256))
    val bitSums = (0 until SimhashBits).map { j =>
      val nib = conv(substring(col("h"), 1 + j / 4, 1), 16, 10).cast("int")
      val bit = shiftright(nib, 3 - j % 4) % 2
      sum(bit * 2 - 1).as(s"s$j")
    }
    tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until SimhashBits).map { j =>
          when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming ≤ [[SimhashMaxHamming]], candidate
    * generation by the pigeonhole chunk join: split 48 bits into 4 12-bit
    * chunks — any pair within hamming 3 shares ≥1 identical chunk, so the
    * equi-join on (chunk index, chunk value) finds all of them without a
    * cross join.
    */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val sh = simhash(docs)
    val chunkBits = SimhashBits / SimhashChunks
    val chunks = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimhashChunks).map { c =>
        struct(lit(c).as("c"),
          (shiftrightunsigned(col("simhash"), c * chunkBits) % (1L << chunkBits)).as("v"))
      }: _*)).as("ck")).select(col("doc_id"), col("simhash"), col("ck.c"), col("ck.v"))
    val x = chunks.as("x"); val y = chunks.as("y")
    x.join(y, col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= SimhashMaxHamming)
      .select("ida", "idb", "hamming")
      .orderBy("ida", "idb")
  }
}
