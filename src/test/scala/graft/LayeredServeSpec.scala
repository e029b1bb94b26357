package graft

import graft.engine.{IndexReader, IndexSearch, QueryMetrics, Wand}
import graft.index.{Incremental, IndexBuilder, IndexPaths, Snapshots}
import graft.model.Query
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Query serving OVER the layered (incremental) index — the round-3
  * flagship: an LSM index you can't query is half an LSM index. Pins:
  *
  *  1. IndexSearch and WAND over a layered snapshot root are rank- AND
  *     score-identical to the naive full-scoring plan on the full corpus
  *     (the reference serves queries over whatever has been upserted,
  *     `pkg/database/relationship/dgraph.go:62-92`);
  *  2. the delta batch RAISES avgdl, so the base layer's block-max bounds
  *     are stale-low and WAND is only sound through the documented
  *     `max(1, avgdl_new/avgdl_base)` rescale — this corpus would drop
  *     true hits without it;
  *  3. an EMPTY replay layer (no parquet files) is servable;
  *  4. compaction folds the snapshot back to ONE layer with exact bounds
  *     (boundScale == 1), identical query results, and decode-level
  *     equality with a from-scratch rebuild;
  *  5. per-query metrics (candidates / blocks decoded) populate.
  */
class LayeredServeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = "target/graft-index/test-layered"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.deleteTree(root)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // base: 40 SHORT docs; delta: 20 LONG docs → avgdl roughly quadruples,
  // so base-layer block-max bounds are stale-LOW after the add (the unsound
  // direction without the rescale). Terms: "common" spans both layers (its
  // merged list lives in the DELTA layer), "basetail" is base-only (served
  // from the BASE layer with scaled bounds), "deltaword" is delta-only.
  private def baseDocs: Seq[(String, String, String, String, String)] =
    (0 until 40).map { i =>
      val tail = if (i % 3 == 0) " basetail" else ""
      val mix = if (i % 4 == 0) " mix mix" else ""
      ("repo-l", f"base$i%02d.go", "c0ffee000000", "go",
        s"common alpha$i beta${i % 7}$tail$mix")
    }

  private def deltaDocs: Seq[(String, String, String, String, String)] =
    (0 until 20).map { i =>
      val dw = if (i % 2 == 0) " deltaword deltaword deltaword" else ""
      val mix = if (i % 5 == 0) " mix" else ""
      val filler = (0 until 24).map(j => s"pad${(i + j) % 11}").mkString(" ")
      ("repo-l", f"delta$i%02d.go", "c0ffee000000", "go",
        s"common common $filler$dw$mix gamma$i")
    }

  private def corpusOf(rows: Seq[(String, String, String, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("repo", "path", "commit", "lang", "content")
  }

  private val queries: Seq[Query] = Seq(
    Query("s1", Seq("common"), 5),
    Query("s2", Seq("basetail", "deltaword"), 10),
    Query("s3", Seq("mix", "common"), 7),
    Query("s4", Seq("basetail"), 25),  // k > df: full list, base layer only
    Query("s5", Seq("nosuch"), 10),
    // CROSS-LAYER same-doc summation: "basetail" serves from the BASE
    // layer, "common" from the DELTA layer, and base docs with i%3==0
    // match both — their scores are correct only if the doc lands in the
    // SAME salt shard in both layers (pins the delta-segments salt
    // function == the build's doc-salt function)
    Query("s6", Seq("basetail", "common"), 15))

  private def queriesDf: DataFrame = {
    val s = spark
    import s.implicits._
    queries.flatMap(q => q.terms.map(t => (q.queryId, t, q.k)))
      .toDF("query_id", "term", "k")
  }

  private def rows(df: DataFrame): Seq[(String, Int, String, String, String, Double)] =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
      r.getString(3), r.getString(4), r.getDouble(5))).toSeq.sortBy(t => (t._1, t._2))

  private def decodeCounts(df: DataFrame): Map[String, (Long, Long)] =
    df.select("term", "postings", "dls").collect().map { r =>
      val (ids, tfs, _) = graft.index.Postings.decode(
        r.getAs[Array[Byte]]("postings"), r.getAs[Array[Byte]]("dls"))
      r.getString(0) -> ((ids.length.toLong, tfs.map(_.toLong).sum))
    }.toMap

  test("layered root serves: index + WAND rank/score-identical to naive; empty layer ok; compaction exact") {
    val all = baseDocs ++ deltaDocs
    val basePaths = IndexPaths(s"$root/base")
    val outPaths = IndexPaths(s"$root/out")
    IndexBuilder.build(spark, corpusOf(baseDocs), basePaths, buildArgs = "layered-spec-base")
    Incremental.addBatch(spark, basePaths, corpusOf(all), outPaths)

    val naive = rows(graft.engine.NaiveSearch.topK(spark, corpusOf(all), queriesDf))
    assert(naive.nonEmpty)

    // 2 layers; the base layer's bounds must be rescaled (avgdl grew ~4×)
    val reader = IndexReader.get(spark, outPaths)
    assert(reader.layers.size === 2)
    assert(reader.layers(0).boundScale > 1.5,
      s"base boundScale ${reader.layers(0).boundScale} — avgdl shift not captured")
    assert(reader.layers(1).boundScale === 1.0)

    // term routing: base-only term → layer 0, merged/delta terms → layer 1
    val meta = reader.termMeta(Seq("basetail", "common", "deltaword", "nosuch"))
    assert(meta("basetail")._2 === 0)
    assert(meta("common")._2 === 1)
    assert(meta("deltaword")._2 === 1)
    assert(!meta.contains("nosuch"))
    // newest-wins df is the FULL merged df for cross-layer terms
    assert(meta("common")._1 === 60L)

    assert(rows(IndexSearch.topKAt(spark, outPaths, queriesDf)) === naive)
    assert(rows(Wand.topKAt(spark, outPaths, queries)) === naive)

    // empty replay layer (no parquet files in its dirs) is servable, and
    // metrics accumulate on a cold WAND pass
    val out2 = IndexPaths(s"$root/out2")
    Incremental.addBatch(spark, outPaths, corpusOf(all), out2)
    assert(IndexReader.get(spark, out2).layers.size === 3)
    val m = QueryMetrics(spark)
    val viaEmpty = rows(Wand.topKAt(spark, out2, queries, Some(m)))
    assert(viaEmpty === naive)
    assert(m.candidates.value > 0, "no candidates counted")
    assert(m.blocksDecoded.value > 0, "cold pass decoded no blocks")

    // in-place compaction: single exact layer, same results, decode-level
    // identity with a from-scratch rebuild, old layers unreferenced
    Incremental.compact(spark, outPaths.root)
    val snap = Snapshots.read(outPaths.root).get
    assert(snap.version === 3)
    assert(snap.indexDirs.size === 1 && snap.segmentsDirs.size === 1)
    assert(!snap.indexDirs.contains(basePaths.indexDir),
      "compacted snapshot still references the base layer")
    val cReader = IndexReader.get(spark, outPaths)
    assert(cReader.layers.size === 1 && cReader.newest.boundScale === 1.0)
    assert(rows(IndexSearch.topKAt(spark, outPaths, queriesDf)) === naive)
    assert(rows(Wand.topKAt(spark, outPaths, queries)) === naive)

    val fullPaths = IndexPaths(s"$root/full")
    IndexBuilder.build(spark, corpusOf(all), fullPaths, buildArgs = "layered-spec-full")
    assert(decodeCounts(cReader.newest.index) ===
      decodeCounts(spark.read.parquet(fullPaths.indexDir)))
  }

  test("addBatchCompacting bounds the layer count and keeps query identity") {
    val basePaths = IndexPaths(s"$root/pol-base")
    IndexBuilder.build(spark, corpusOf(baseDocs), basePaths, buildArgs = "policy-base")
    // first add: 2 layers ≤ maxLayers=2 → stays layered
    val o1 = IndexPaths(s"$root/pol-1")
    Incremental.addBatchCompacting(spark, basePaths, corpusOf(baseDocs ++ deltaDocs.take(10)), o1, maxLayers = 2)
    assert(Snapshots.read(o1.root).get.indexDirs.size === 2)
    // second add: would be 3 layers > maxLayers → auto-compacts to 1
    val o2 = IndexPaths(s"$root/pol-2")
    Incremental.addBatchCompacting(spark, o1, corpusOf(baseDocs ++ deltaDocs), o2, maxLayers = 2)
    assert(Snapshots.read(o2.root).get.indexDirs.size === 1)
    val naive = rows(graft.engine.NaiveSearch.topK(spark, corpusOf(baseDocs ++ deltaDocs), queriesDf))
    assert(rows(Wand.topKAt(spark, o2, queries)) === naive)
  }
}
