package graft.ops

import graft.score.BM25
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`): exact cosine near-dup pairs,
  * brute-force top-k (the correctness baseline), and an IVF-style
  * partitioned variant (the scale path: centroid assignment bounds each
  * query to nprobe posting lists instead of the whole table).
  *
  * Dot products are `zip_with` + `aggregate` higher-order functions in
  * double precision — sequential left-to-right fold, matching the oracle's
  * `list_sum(list_transform(...))` order, so quantized cosines agree.
  */
object Ann {

  val Dim = 64
  val NumQueries = 8    // query vectors: vec_id < 8
  val NumCentroids = 8  // IVF: centroids are the vectors with vec_id < 8
  val NProbe = 2
  val TopK = 10
  val LshBits = 16      // random-hyperplane signature bits
  val LshBandBits = 4   // → 4 bands of 4 bits

  /** Deterministic ±1 random-hyperplane components — a pure-integer LCG on
    * the flat index (j·Dim + i), reproducible verbatim in DuckDB SQL (no
    * engine RNG, no float seed drift). Charikar random-hyperplane LSH:
    * P(bit match) = 1 − θ/π.
    */
  def hyperplane(j: Int): IndexedSeq[Double] = (0 until Dim).map { i =>
    val idx = j.toLong * Dim + i + 1
    val r = (1103515245L * idx + 12345L) % 2147483648L
    if (((r >> 16) & 1L) == 1L) 1.0 else -1.0
  }

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Σ aᵢ·bᵢ in double, sequential. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine near-dup pairs ≥ [[Dedup.CosineThreshold]].
    * All-pairs at test scale; the LSH/IVF candidates below are the scale
    * path (SURVEY-level note: at 10^12 rows you never run this join raw).
    */
  def cosinePairs(emb: DataFrame): DataFrame = {
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val cos = cosine(col("ea"), col("eb"))
    a.join(b, col("ia") < col("ib"))
      .filter(cos >= Dedup.CosineThreshold)
      .select(col("ia"), col("ib"), BM25.quantize(cos).as("cos_r"))
      .orderBy("ia", "ib")
  }

  /** Brute-force cosine top-k per query vector — the ANN oracle.
    * Output (query_id, rank, vec_id, cos_r), rank by quantized cos desc
    * then vec_id asc; self-matches excluded.
    *
    * Ranking tail is the k-bounded heap aggregate ([[graft.engine.TopKAggExprs]]),
    * not a `Window.partitionBy(query_id)`: with few queries a window funnels
    * the whole scored corpus through ≤|queries| tasks; the aggregate reduces
    * map-side to ≤k rows per task before the shuffle.
    */
  def bruteForceTopK(emb: DataFrame): DataFrame = {
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cos = cosine(col("qe"), col("embedding"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), BM25.quantize(cos).as("cos_r"))
    rankTopK(scored)
  }

  /** Shared ANN ranking tail: (query_id, vec_id, cos_r) → bounded top-k
    * rows (query_id, rank, vec_id, cos_r) in the pinned oracle order.
    */
  private def rankTopK(scored: DataFrame): DataFrame =
    scored
      .groupBy("query_id")
      .agg(graft.engine.TopKAggExprs.topK(lit(TopK), col("cos_r"),
        struct(col("vec_id"))).as("hits"))
      .select(col("query_id"), posexplode(col("hits")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.vec_id"), col("col.score_r").as("cos_r"))
      .orderBy("query_id", "rank")

  /** Near-dup cosine pairs via random-hyperplane LSH blocking — the scale
    * path that replaces the all-pairs join of [[cosinePairs]] (kept only as
    * the tiny-sf oracle cross-check): 16 sign bits per vector, banded into
    * 4×4-bit bucket keys; candidates are pairs sharing a band bucket
    * (equi-join — never a cross join), then verified with the exact cosine.
    * Probabilistic recall by design; the oracle runs the identical
    * hyperplanes + banding, so outputs match deterministically.
    */
  def cosineLshPairs(emb: DataFrame): DataFrame = {
    val nBands = LshBits / LshBandBits
    val bits = (0 until LshBits).map { j =>
      val h = array(hyperplane(j).map(lit): _*)
      dot(h, col("embedding")) >= 0.0
    }
    val bandKeys = (0 until nBands).map { b =>
      (0 until LshBandBits).map { r =>
        when(bits(b * LshBandBits + r), lit(1 << r)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    val banded = emb.select(col("vec_id"), posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
    val x = banded.as("x"); val y = banded.as("y")
    val candidates = x.join(y,
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("ia"), col("y.vec_id").as("ib"))
      .distinct()
    val ea = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val eb = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val cos = cosine(col("ea"), col("eb"))
    candidates.join(ea, "ia").join(eb, "ib")
      .filter(cos >= Dedup.CosineThreshold)
      .select(col("ia"), col("ib"), BM25.quantize(cos).as("cos_r"))
      .orderBy("ia", "ib")
  }

  /** IVF assignment: every vector → its nearest centroid (argmax raw
    * cosine, ties to the smaller centroid id). Centroids are the
    * deterministic seed vectors vec_id < [[NumCentroids]].
    */
  def ivfAssign(emb: DataFrame): DataFrame = {
    val cents = emb.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))
    val cos = cosine(col("embedding"), col("ce"))
    val w = Window.partitionBy("vec_id").orderBy(cos.desc, col("centroid_id").asc)
    emb.crossJoin(broadcast(cents))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** IVF top-k: probe the [[NProbe]] nearest centroids per query, score
    * only vectors assigned to them. Approximate by design — the oracle
    * runs the identical probe, so outputs match exactly.
    */
  def ivfTopK(emb: DataFrame): DataFrame = {
    val assigned = ivfAssign(emb)
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cents = emb.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))
    val qcos = cosine(col("qe"), col("ce"))
    val wq = Window.partitionBy("query_id").orderBy(qcos.desc, col("centroid_id").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= NProbe)
      .select(col("query_id"), col("qe"), col("centroid_id"))
    val cos = cosine(col("qe"), col("embedding"))
    val scored = assigned.join(broadcast(probes), "centroid_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), BM25.quantize(cos).as("cos_r"))
    rankTopK(scored)
  }
}
