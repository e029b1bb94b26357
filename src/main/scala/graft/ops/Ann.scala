package graft.ops

import graft.score.BM25
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`): exact cosine near-dup pairs,
  * brute-force top-k (the correctness baseline), and an IVF-style
  * partitioned variant (the scale path: centroid assignment bounds each
  * query to nprobe posting lists instead of the whole table).
  *
  * Dot products are sequential left-to-right double folds (native
  * [[DotSequential]], the exact IEEE sequence of the zip_with + aggregate
  * formulation it replaced), matching the oracle's
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

  /** Σ aᵢ·bᵢ in double, sequential. r6: a native expression
    * ([[DotSequential]]) replacing the interpreted
    * `aggregate(zip_with(...))` fold — it performs the IDENTICAL
    * left-to-right IEEE sequence (`acc = acc + (aᵢ.toDouble * bᵢ.toDouble)`),
    * so every float-path cosine is bit-identical to the previous
    * formulation and to the DuckDB `list_sum(list_transform(...))` the
    * oracles pin (the summation ORDER is the cross-engine contract here,
    * unlike the exact micro-int path of [[cosineM]]).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(DotSequential(
      org.apache.spark.sql.GraftColumnBridge.expression(a),
      org.apache.spark.sql.GraftColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Hard cap on [[cosinePairs]] input size — the all-pairs join is the
    * tiny-sf ORACLE cross-check only; [[cosineLshPairs]]/[[ivfTopK]] are the
    * scale paths. The guard makes "never run this raw at scale" enforced,
    * not advisory.
    */
  val MaxBruteRows: Long = 10000

  /** Exact cosine near-dup pairs ≥ [[Dedup.CosineThreshold]].
    * All-pairs at test scale; the LSH/IVF candidates below are the scale
    * path (SURVEY-level note: at 10^12 rows you never run this join raw).
    * Guarded: refuses inputs above [[MaxBruteRows]] rows so a future caller
    * cannot run the O(n²) BroadcastNestedLoopJoin against a real corpus.
    */
  def cosinePairs(emb: DataFrame): DataFrame = {
    // limit-bounded probe: the guard itself must not pay a full O(n) pass
    // over a possibly-expensive lineage just to count it
    if (emb.limit(MaxBruteRows.toInt + 1).count() > MaxBruteRows)
      throw new IllegalArgumentException(
        s"cosinePairs is the all-pairs oracle path, capped at $MaxBruteRows rows " +
          "— use cosineLshPairs (blocked candidates) at scale")
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

  // ---------- IVF with trained centroids (deterministic Lloyd) ----------
  //
  // All k-means arithmetic runs in MICRO-INTEGER space: embeddings quantize
  // to floor(x·1e6 + 0.5) bigints, so every dot product is a sum of exact
  // ≤2^42 integers (≤2^48 total < 2^53) — EXACTLY representable in double
  // regardless of summation order, and centroid means are exact integer
  // sums followed by one floor-division. That makes training bit-identical
  // across engines (Spark vs the DuckDB oracle) with no float-accumulation
  // drift — the property the raw-float path could only get per-expression.

  /** Lloyd iterations, unrolled (fixed count ⇒ SQL-expressible oracle). */
  val KMeansIters = 2

  /** `array<float>` → `array<bigint>` micro quantization. */
  def microCol(e: Column): Column =
    transform(e, x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))

  /** Cosine over micro-int arrays. r6: a native long-array dot
    * ([[DotLongArrays]]) replaces the interpreted zip_with+aggregate fold —
    * micro components are ≤ ~2^21, so every product is ≤ ~2^42 and a
    * 64-term sum stays ≪ 2^53: the sum is EXACT in both a long and a
    * left-to-right double fold, hence bit-identical to the previous
    * formulation AND to the oracle's `list_sum(list_transform(...))`
    * (the float-path [[cosine]] keeps the sequential fold — there the
    * summation order IS the contract).
    */
  def cosineM(a: Column, b: Column): Column = {
    def d(x: Column, y: Column): Column =
      org.apache.spark.sql.GraftColumnBridge.column(DotLongArrays(
        org.apache.spark.sql.GraftColumnBridge.expression(x),
        org.apache.spark.sql.GraftColumnBridge.expression(y)))
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  /** Nearest-centroid assignment over micro vectors: argmax cosine, ties to
    * the smaller centroid id — `max_by` over a (cos, −id) ordering struct,
    * NOT a row_number window (a per-vec_id window would funnel the scored
    * relation through one task per vector group; max_by reduces map-side).
    */
  private def assignM(m: DataFrame, cents: DataFrame): DataFrame = {
    val cos = cosineM(col("m"), col("cm"))
    m.crossJoin(broadcast(cents))
      .groupBy("vec_id", "m")
      .agg(max_by(col("centroid_id"),
        struct(cos.as("c"), (-col("centroid_id")).as("nid"))).as("centroid_id"))
  }

  /** Trained IVF centroids `(centroid_id, cm: array<bigint>)`: init = the
    * seed vectors vec_id < [[NumCentroids]], then [[KMeansIters]] Lloyd
    * steps (assign → exact integer mean per component, floor-divided; an
    * emptied cluster keeps its previous centroid). Deterministic end to end
    * — the DuckDB oracle unrolls the identical iterations.
    *
    * Scale shape: assignment is a broadcast cross-join + map-side-combining
    * aggregate; the mean is a (centroid, pos) sum/count groupBy — 512
    * groups with partial aggregation, no skew risk, no windows.
    */
  def kmeansCentroids(emb: DataFrame): DataFrame =
    kmeansCentroidsOf(emb.select(col("vec_id"), microCol(col("embedding")).as("m")))

  private def kmeansCentroidsOf(m: DataFrame): DataFrame = {
    val spark = m.sparkSession
    import spark.implicits._
    // Materialize each iteration's centroids to the driver (k × Dim longs —
    // tiny by construction) and feed the next step a LITERAL relation:
    // without this, iteration i's lineage references iteration i−1 TWICE
    // (assign cross-join + the empty-cluster left join) and every
    // downstream consumer re-runs the whole 2^iters training chain.
    var cents: Seq[(Long, Seq[Long])] = m.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id"), col("m")).as[(Long, Seq[Long])].collect().toSeq
      .sortBy(_._1)
    for (_ <- 1 to KMeansIters) {
      val centsDf = cents.toDF("centroid_id", "cm")
      val next = assignM(m, centsDf)
        .select(col("centroid_id"), posexplode(col("m")).as(Seq("pos", "v")))
        .groupBy("centroid_id", "pos")
        .agg(floor(sum("v").cast("double") / count(lit(1))).cast("long").as("cv"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
          s => s.getField("cv")).as("cm2"))
        .as[(Long, Seq[Long])].collect().toMap
      // an emptied cluster keeps its previous centroid
      cents = cents.map { case (id, cm) => (id, next.getOrElse(id, cm)) }
    }
    cents.toDF("centroid_id", "cm")
  }

  /** IVF top-k with TRAINED centroids: assign every vector to its nearest
    * trained centroid, probe the [[NProbe]] nearest centroids per query
    * (k-bounded heap aggregate, not a window), score only vectors in the
    * probed cells. Approximate by design — the oracle runs the identical
    * training + probe, so outputs match exactly; AnnSpec reports recall@k
    * against the brute-force baseline.
    */
  def ivfTopK(emb: DataFrame): DataFrame = {
    // one persisted micro view serves training (2 collect iterations), the
    // final assignment, and the query probes — previously each action
    // re-read the parquet and re-quantized
    val m = emb.select(col("vec_id"), microCol(col("embedding")).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = kmeansCentroidsOf(m)
    val assigned = assignM(m, cents)
    val q = m.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("m").as("qm"))
    val qcos = cosineM(col("qm"), col("cm"))
    val probes = q.crossJoin(broadcast(cents))
      .groupBy("query_id", "qm")
      .agg(graft.engine.TopKAggExprs.topK(lit(NProbe), qcos,
        struct(col("centroid_id"))).as("hits"))
      .select(col("query_id"), col("qm"), explode(col("hits")).as("h"))
      .select(col("query_id"), col("qm"), col("h.centroid_id").as("centroid_id"))
    val cos = cosineM(col("qm"), col("m"))
    val scored = assigned.join(broadcast(probes), "centroid_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), BM25.quantize(cos).as("cos_r"))
    rankTopK(scored)
  }
}

/** Native dot product of two `array<bigint>` columns as a double — exact
  * for micro-quantized inputs (see [[Ann.cosineM]]): products ≤ ~2^42 and
  * sums ≪ 2^53, so the long accumulator equals any double fold bit-for-bit.
  * CodegenFallback like the other scalar loops here: per-row cost is the
  * element loop, not dispatch.
  */
final case class DotLongArrays(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> columns, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_long_arrays"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // mismatched lengths / null elements yield null, mirroring the
    // zip_with+aggregate fold this replaced (zip_with's null padding or a
    // null element poisons the whole sum) — see [[DotSequential]]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): DotLongArrays =
    copy(left = newLeft, right = newRight)
}

/** Native sequential dot product over float/double arrays — the exact IEEE
  * operation sequence of `aggregate(zip_with(a, b, (x, y) => x.cast(double)
  * * y.cast(double)), 0.0, _ + _)`: left-to-right, one multiply then one
  * add per element, float widened to double first (exact). Mismatched
  * lengths yield null, mirroring zip_with's null padding poisoning the sum.
  */
final case class DotSequential(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._

  private def elem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> columns, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_sequential"

  @transient private lazy val leftIsFloat = elem(left.dataType).contains(FloatType)
  @transient private lazy val rightIsFloat = elem(right.dataType).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element poisons the whole sum, as in the fold it replaces
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc = acc + xi * yi
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): DotSequential =
    copy(left = newLeft, right = newRight)
}
