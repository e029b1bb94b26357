package graft.index

import java.nio.file.{Files, Paths}

/** Iceberg-style snapshot metadata for an index root (SURVEY.md §1.3 /
  * BASELINE.json input_hint "Iceberg table"): each index root carries a
  * `metadata/` directory with immutable `v<N>.metadata.json` snapshot files
  * and a `version-hint.text` pointing at the current one — the same
  * current-snapshot protocol Iceberg's HadoopCatalog uses.
  *
  * A snapshot lists the LAYERED data directories that make up the logical
  * table: a full build is one layer; an incremental add appends a delta
  * layer on top of its parent's layers (LSM-style), so un-merged base files
  * are referenced, never rewritten. Readers resolve a root to its layer
  * list and apply newest-wins per term / union per doc.
  */
final case class Snapshot(
    version: Int,
    indexDirs: Seq[String],    // oldest → newest; newest wins per term
    docsDirs: Seq[String],     // disjoint docId sets; union
    segmentsDirs: Seq[String], // per layer, aligned with indexDirs: salted shards for WAND
    statsPaths: Seq[String],   // per layer, aligned: each layer's encode-time stats (avgdl)
    statsPath: String,         // CURRENT stats (the newest layer's)
    parentRoot: Option[String])

object Snapshots {

  /** JSON string literal — shared with [[graft.corpus.CorpusTable]] so the
    * two snapshot protocols (index side, corpus-source side) cannot drift.
    */
  private[graft] def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Atomic publish: write tmp, ATOMIC_MOVE into place — a reader never
    * observes a half-written file. Shared protocol primitive.
    */
  private[graft] def atomicWrite(path: java.nio.file.Path, body: String): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def jarr(xs: Seq[String]): String = xs.map(jstr).mkString("[", ", ", "]")

  def metadataDir(root: String): String = s"$root/metadata"

  /** Atomically publish a snapshot and move the version hint to it. */
  def write(root: String, snap: Snapshot): Unit = {
    val dir = Paths.get(metadataDir(root))
    Files.createDirectories(dir)
    val body =
      s"""{"format_version": 2, "snapshot_version": ${snap.version},
         | "index_dirs": ${jarr(snap.indexDirs)},
         | "docs_dirs": ${jarr(snap.docsDirs)},
         | "segments_dirs": ${jarr(snap.segmentsDirs)},
         | "stats_paths": ${jarr(snap.statsPaths)},
         | "stats_path": ${jstr(snap.statsPath)},
         | "parent_root": ${snap.parentRoot.map(jstr).getOrElse("null")}}""".stripMargin
    atomicWrite(dir.resolve(s"v${snap.version}.metadata.json"), body)
    atomicWrite(dir.resolve("version-hint.text"), snap.version.toString)
  }

  def currentVersion(root: String): Option[Int] = {
    val hint = Paths.get(metadataDir(root), "version-hint.text")
    if (Files.exists(hint)) Some(Files.readString(hint).trim.toInt) else None
  }

  /** Escape-aware quoted-string-array extraction (shared with
    * [[graft.corpus.CorpusTable]] — a naive comma-split would break paths
    * containing commas or escaped quotes).
    */
  private[graft] def readArr(txt: String, key: String): Seq[String] = {
    val m = ("\"" + key + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
    m.findFirstMatchIn(txt).map(_.group(1)).toSeq
      .flatMap(inner => "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(inner).map(_.group(1)))
  }

  def read(root: String): Option[Snapshot] =
    currentVersion(root).map { v =>
      val txt = Files.readString(Paths.get(metadataDir(root), s"v$v.metadata.json"))
      val parent = "\"parent_root\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(txt).map(_.group(1))
      val stats = "\"stats_path\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(txt).map(_.group(1)).get
      Snapshot(v, readArr(txt, "index_dirs"), readArr(txt, "docs_dirs"),
        readArr(txt, "segments_dirs"), readArr(txt, "stats_paths"), stats, parent)
    }
}
