package graft

import graft.index.{Incremental, IndexBuilder, IndexPaths, Snapshots}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Delta-layer invariants of the incremental add (SURVEY.md §2.4 J1/J2 +
  * the LSM layout):
  *
  *  1. untouched base index FILES are byte-identical after an add — a
  *     delta never rewrites, decodes, or re-encodes terms it doesn't touch;
  *  2. the delta layer contains ONLY the delta's terms;
  *  3. the layered read-back equals a from-scratch full build, including
  *     stats over token-bearing docs only (dead docs excluded — P7);
  *  4. replaying the same batch on the merged root is a no-op delta
  *     (J1 idempotency, incl. zero-token docs' dl=0 lineage rows).
  */
class IncrementalDeltaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = "target/graft-index/test-delta"

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

  private def doc(path: String, content: String): (String, String, String, String, String) =
    ("repo-t", path, "c0ffee000000", "go", content)

  private def corpusOf(rows: Seq[(String, String, String, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("repo", "path", "commit", "lang", "content")
  }

  private def fileBytes(dir: String): Map[String, Long] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.size(p)).toMap

  private def fileSha(dir: String): Map[String, String] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        p.toString -> md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap

  private def decodeCounts(df: DataFrame): Map[String, (Long, Long)] =
    df.select("term", "postings", "dls").collect().map { r =>
      val (ids, tfs, _) = graft.index.Postings.decode(
        r.getAs[Array[Byte]]("postings"), r.getAs[Array[Byte]]("dls"))
      r.getString(0) -> ((ids.length.toLong, tfs.map(_.toLong).sum))
    }.toMap

  test("delta add: base files untouched, delta terms only, merged == full rebuild, replay no-op") {
    val base = Seq(
      doc("a.go", "alpha beta gamma alpha"),
      doc("b.go", "beta delta"),
      doc("dead.go", "!!! ??? ..."))          // zero-token doc: dl=0 lineage row
    val add = Seq(
      doc("a.go", "alpha beta gamma alpha"),  // overlap: must be J1-filtered
      doc("c.go", "beta epsilon"),
      doc("dead2.go", "###"))                 // fresh zero-token doc

    val basePaths = IndexPaths(s"$root/base")
    val outPaths = IndexPaths(s"$root/out")
    IndexBuilder.build(spark, corpusOf(base), basePaths, buildArgs = "delta-spec-base")
    val baseShas = fileSha(basePaths.indexDir)

    // (base ++ add).distinct: the engine contract is a key-deduped corpus
    // (Corpus.corpus dedups upstream); the a.go overlap still exercises J1.
    val stats = Incremental.addBatch(spark, basePaths, corpusOf((base ++ add).distinct), outPaths)

    // 1. untouched base files byte-identical
    assert(fileSha(basePaths.indexDir) === baseShas)

    // 2. delta layer holds only the fresh docs' terms
    val deltaTerms = spark.read.parquet(outPaths.indexDir).select("term")
      .collect().map(_.getString(0)).toSet
    assert(deltaTerms === Set("beta", "epsilon"))

    // 3a. merged view == from-scratch full build (decode-level equality)
    val fullPaths = IndexPaths(s"$root/full")
    IndexBuilder.build(spark, corpusOf((base ++ add).distinct), fullPaths, buildArgs = "delta-spec-full")
    val merged = decodeCounts(Incremental.readMergedIndex(spark, outPaths.root))
    val full = decodeCounts(spark.read.parquet(fullPaths.indexDir))
    assert(merged === full)

    // 3b. stats count token-bearing docs only (2 base + 1 fresh; dead docs excluded)
    assert(stats.nDocs === 3)
    val fullStats = IndexBuilder.readStats(fullPaths).get
    assert(stats.nDocs === fullStats.nDocs && stats.totalTokens === fullStats.totalTokens)
    assert(math.abs(stats.avgdl - fullStats.avgdl) < 1e-12)

    // 3c. fresh zero-token doc landed in the delta docs sidecar with dl=0
    val deadRows = spark.read.parquet(outPaths.docsDir)
      .filter(col("path") === "dead2.go").select("dl").collect()
    assert(deadRows.map(_.getLong(0)).toSeq === Seq(0L))

    // 4. replay the same batch against the merged root: no fresh docs
    // (dead2.go's dl=0 lineage row blocks re-admission), empty delta,
    // unchanged stats.
    val out2 = IndexPaths(s"$root/out2")
    val stats2 = Incremental.addBatch(spark, outPaths, corpusOf((base ++ add).distinct), out2)
    assert(stats2 === stats.copy(version = stats2.version))
    assert(spark.read.schema(IndexBuilder.IndexSchema).parquet(out2.indexDir).count() === 0)
    assert(decodeCounts(Incremental.readMergedIndex(spark, out2.root)) === full)
    assert(Snapshots.read(out2.root).get.version === 3)
  }
}

/** r6: the replay no-op path — re-running the SAME addBatch(base → out) must
  * skip the delta rewrite (artifact files untouched, byte-identical) while
  * publishing a fresh snapshot version; a DIFFERENT batch over the same
  * (base, out) pair must NOT be skipped (the fingerprint guard).
  */
class ReplayNoOpSpec extends org.scalatest.funsuite.AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  import graft.index._
  import java.nio.file.{Files, Paths}
  import scala.jdk.CollectionConverters._

  private var spark: org.apache.spark.sql.SparkSession = _
  private val root = "target/graft-index/test-replay-noop"

  override def beforeAll(): Unit = {
    spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.deleteTree(root)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpusOf(rows: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (p, c) => ("repo-t", p, "c0ffee000000", "go", c) }
      .toDF("repo", "path", "commit", "lang", "content")
  }

  private def artifactShas(paths: IndexPaths): Map[String, String] =
    Seq(paths.indexDir, paths.segmentsDir, paths.docsDir, paths.edgesDir, paths.fastDir)
      .flatMap { d =>
        Files.walk(Paths.get(d)).iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          .map { p =>
            val md = java.security.MessageDigest.getInstance("SHA-256")
            p.toString -> md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
          }
      }.toMap

  test("identical replay skips the rewrite; a different batch does not") {
    val base = Seq("a.go" -> "alpha beta gamma", "b.go" -> "beta delta epsilon")
    val add1 = base ++ Seq("c.go" -> "zeta eta theta alpha")
    val basePaths = IndexPaths(s"$root/base")
    val outPaths = IndexPaths(s"$root/out")
    IndexBuilder.build(spark, corpusOf(base), basePaths, buildArgs = "replay-noop-base")
    Incremental.addBatch(spark, basePaths, corpusOf(add1), outPaths)
    val v1 = Snapshots.read(outPaths.root).get.version
    val sha1 = artifactShas(outPaths)
    val mtimes1 = Files.walk(Paths.get(outPaths.indexDir)).iterator().asScala
      .filter(Files.isRegularFile(_)).map(p => p.toString -> Files.getLastModifiedTime(p)).toMap

    // identical replay → rewrite skipped: same artifact bytes AND same file
    // mtimes (the phases never ran), snapshot version bumped
    Incremental.addBatch(spark, basePaths, corpusOf(add1), outPaths)
    val snap2 = Snapshots.read(outPaths.root).get
    assert(snap2.version == v1 + 1, "replay must still publish a new snapshot version")
    assert(artifactShas(outPaths) == sha1, "replay no-op must leave artifact bytes identical")
    val mtimes2 = Files.walk(Paths.get(outPaths.indexDir)).iterator().asScala
      .filter(Files.isRegularFile(_)).map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
    assert(mtimes2 == mtimes1, "replay no-op must not rewrite the delta index files")

    // a DIFFERENT batch over the same (base, out) pair must not be skipped —
    // and the served content must reflect the new batch
    val add2 = base ++ Seq("c.go" -> "zeta eta theta alpha", "d.go" -> "iota kappa")
    Incremental.addBatch(spark, basePaths, corpusOf(add2), outPaths)
    val docs = Incremental.readMergedDocs(spark, outPaths.root)
      .select("path").collect().map(_.getString(0)).toSet
    assert(docs == Set("a.go", "b.go", "c.go", "d.go"),
      s"different batch must rewrite the delta, got $docs")
  }
}
