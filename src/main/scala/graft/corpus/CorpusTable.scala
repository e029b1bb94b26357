package graft.corpus

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Iceberg-style SOURCE table for the corpus — the input side of
  * BASELINE.json's `input_hint` ("input: Iceberg table of source-code
  * repositories with columns (repo, path, commit, lang, content)"), using
  * the same current-snapshot protocol as the index-side [[graft.index.Snapshots]]
  * (Iceberg HadoopCatalog: immutable `metadata/v<N>.metadata.json` files +
  * a `version-hint.text` pointing at the current one).
  *
  * Semantics (the three Iceberg properties the engine depends on):
  *  - **append-without-rewrite**: `append` writes a NEW data directory and
  *    publishes a snapshot referencing old dirs + new — committed data files
  *    are never modified ([[graft.CorpusTableSpec]] pins file immutability);
  *  - **snapshot isolation / time travel**: `read(root, asOf = Some(v))`
  *    returns exactly snapshot v's rows regardless of later appends — a
  *    long-running index build keeps reading ITS snapshot while ingest
  *    appends continue (the 10^12-file crawl shape: the corpus grows while
  *    builds run);
  *  - **atomic publish**: snapshot JSON and hint move into place with
  *    ATOMIC_MOVE — a reader never observes a half-written snapshot; a
  *    crash mid-append leaves the previous snapshot current.
  *
  * Scale: a snapshot is O(#appends) metadata; `read` is a union of parquet
  * scans that Catalyst plans as one multi-directory FileScan (partition
  * pruning and predicate pushdown apply per file as usual). No driver-side
  * data movement anywhere.
  */
object CorpusTable {

  /** The pinned input-table schema (`input_hint`). Explicit on every read:
    * an empty append has no files to infer from.
    */
  val Schema: StructType = StructType(Seq(
    StructField("repo", StringType), StructField("path", StringType),
    StructField("commit", StringType), StructField("lang", StringType),
    StructField("content", StringType)))

  final case class TableSnapshot(version: Int, dataDirs: Seq[String])

  def metadataDir(root: String): String = s"$root/metadata"

  // the snapshot-protocol primitives (JSON string escaping, escape-aware
  // array parsing, atomic tmp+move publish) are SHARED with the index-side
  // graft.index.Snapshots — one implementation, so the two sides can't drift
  private def writeSnapshot(root: String, snap: TableSnapshot): Unit = {
    val dir = Paths.get(metadataDir(root))
    Files.createDirectories(dir)
    val body =
      s"""{"format_version": 1, "snapshot_version": ${snap.version},
         | "data_dirs": ${snap.dataDirs.map(graft.index.Snapshots.jstr).mkString("[", ", ", "]")}}""".stripMargin
    graft.index.Snapshots.atomicWrite(dir.resolve(s"v${snap.version}.metadata.json"), body)
    graft.index.Snapshots.atomicWrite(dir.resolve("version-hint.text"), snap.version.toString)
  }

  /** The current snapshot version per the hint file, if the table exists.
    * A corrupt hint THROWS (same semantics as the index-side protocol) —
    * returning None here would let `create` silently build v1 over an
    * existing table's data dirs.
    */
  def currentVersion(root: String): Option[Int] = {
    val hint = Paths.get(metadataDir(root), "version-hint.text")
    if (Files.exists(hint)) Some(Files.readString(hint).trim.toInt) else None
  }

  /** Load one immutable snapshot's metadata. */
  def snapshot(root: String, version: Int): TableSnapshot = {
    val p = Paths.get(metadataDir(root), s"v$version.metadata.json")
    if (!Files.exists(p))
      throw new IllegalArgumentException(s"corpus table $root has no snapshot v$version")
    TableSnapshot(version,
      graft.index.Snapshots.readArr(Files.readString(p), "data_dirs"))
  }

  /** Drop the table, crash-safely: the version hint goes FIRST (an
    * interrupted drop leaves "no table" — the hint is the existence
    * predicate — never a hint pointing at partially-deleted data).
    */
  def drop(root: String): Unit = {
    Files.deleteIfExists(Paths.get(metadataDir(root), "version-hint.text"))
    graft.index.IndexBuilder.deleteRecursively(Paths.get(root))
  }

  private def writeDataDir(df: DataFrame, root: String, version: Int): String = {
    val dir = s"$root/data/v$version"
    df.select(Schema.fieldNames.map(col): _*).write.mode("overwrite").parquet(dir)
    dir
  }

  /** Create the table at snapshot v1 from `df`. Refuses an existing table
    * (append to grow one; there is no overwrite mutation — Iceberg-style
    * tables evolve by snapshot, not in place).
    */
  def create(spark: SparkSession, df: DataFrame, root: String): Int = {
    require(currentVersion(root).isEmpty, s"corpus table already exists at $root")
    val dir = writeDataDir(df, root, 1)
    writeSnapshot(root, TableSnapshot(1, Seq(dir)))
    1
  }

  /** Append `df` as a new snapshot: one new data dir, previous dirs
    * referenced untouched. Returns the new version.
    */
  def append(spark: SparkSession, df: DataFrame, root: String): Int = {
    val cur = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no corpus table at $root — create() first"))
    val prev = snapshot(root, cur)
    val next = cur + 1
    val dir = writeDataDir(df, root, next)
    writeSnapshot(root, TableSnapshot(next, prev.dataDirs :+ dir))
    next
  }

  /** Snapshot-isolated read: the current snapshot, or `asOf` for time
    * travel. Schema pinned ([[Schema]]); the plan is one multi-directory
    * parquet scan (no unions of single-file jobs).
    */
  def read(spark: SparkSession, root: String, asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(currentVersion(root)).getOrElse(
      throw new IllegalStateException(s"no corpus table at $root"))
    val snap = snapshot(root, v)
    spark.read.schema(Schema).parquet(snap.dataDirs: _*)
  }
}
