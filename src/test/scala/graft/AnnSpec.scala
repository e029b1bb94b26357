package graft

import graft.ops.Ann
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Trained-IVF quality: Lloyd training actually moves the centroids, and
  * the probed search recovers a healthy fraction of the brute-force top-k
  * (recall@k, reported for BASELINE.md). Determinism of the training is
  * pinned cross-engine by the `ann_ivf_topk` oracle; this spec pins the
  * QUALITY claim that makes IVF worth its approximation.
  */
class AnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("k-means training moves centroids off their seeds") {
    import org.apache.spark.sql.functions._
    val emb = Ann.embeddings(spark, sfDir)
    val seeds = emb.filter(col("vec_id") < Ann.NumCentroids)
      .select(col("vec_id").as("centroid_id"), Ann.microCol(col("embedding")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val trained = Ann.kmeansCentroids(emb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(trained.keySet === seeds.keySet)
    val moved = trained.count { case (id, cm) => cm != seeds(id) }
    assert(moved > 0, "no centroid moved — training is a no-op")
  }

  test("IVF recall@k vs brute force (reported)") {
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val emb = Ann.embeddings(spark, sfDir)
    val brute = hits(Ann.bruteForceTopK(emb))
    val ivf = hits(Ann.ivfTopK(emb))
    val recalls = brute.map { case (q, want) =>
      val got = ivf.getOrElse(q, Set.empty)
      (want intersect got).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    info(f"IVF recall@${Ann.TopK} over ${recalls.size} queries, nprobe=${Ann.NProbe}/${Ann.NumCentroids}: $recall%.3f")
    System.err.println(f"[ann] ivf recall@${Ann.TopK} = $recall%.3f (nprobe=${Ann.NProbe} of ${Ann.NumCentroids} cells)")
    assert(recall >= 0.4, f"recall collapsed: $recall%.3f")
  }

  test("cosinePairs is capped: the all-pairs oracle path refuses big inputs") {
    import org.apache.spark.sql.functions._
    val big = spark.range(Ann.MaxBruteRows + 1)
      .select(col("id").as("vec_id"), array(lit(1.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException](Ann.cosinePairs(big))
    assert(e.getMessage.contains("cosineLshPairs"), "guard must route callers to the scale path")
    // and the real (tiny) embeddings table still passes the guard
    assert(Ann.cosinePairs(Ann.embeddings(spark, sfDir)).columns.toSeq ===
      Seq("ia", "ib", "cos_r"))
  }
}
