package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the engine's input table — an Iceberg-style
  * corpus of source-code documents `(repo, path, commit, lang, content)`
  * (BASELINE.json `input_hint`) — as pure column transforms of the
  * driver-provided TPC-H parquet (`lineitem ⋈ orders`). No RNG, no external
  * data: DuckDB reproduces the identical corpus from the same parquet via
  * [[OracleSql.corpusCte]], which is generated from the same vocab constants,
  * so the two sides cannot drift independently.
  *
  * The raw join contains duplicate `(repo, path, commit)` keys (the testdata
  * lineitem has duplicate primary keys); the corpus therefore ends with an
  * explicit dedup — the analog of the reference's upsert-guarded unique key
  * `url @index(hash) @upsert` (`pkg/database/relationship/dgraph.go:41`) and
  * its global visited-set (`pkg/crawl/crawl.go:211-220`).
  */
object Corpus {

  // Shared vocab — single source of truth for BOTH the Spark plan and the
  // DuckDB oracle SQL. Tokens are lowercase [a-z0-9_]+ so the tokenizer
  // maps each word to exactly one term.
  val KwA: Seq[String] = Seq("buffer", "schema", "vector", "column", "shuffle", "stream", "segment", "catalog")
  val KwB: Seq[String] = Seq("parser", "planner", "executor", "scanner", "merger", "codec")
  val KwC: Seq[String] = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel", "india", "juliet")
  val KwD: Seq[String] = Seq("read", "write", "scan")
  val Langs: Seq[String] = Seq("go", "scala", "py", "md")

  /** 1-indexed vocab pick: `vocab[(expr % vocab.size) + 1]`. */
  private def pick(vocab: Seq[String], expr: Column): Column =
    element_at(array(vocab.map(lit): _*), (expr % vocab.size).cast("int") + 1)

  /** The pre-dedup corpus projection over `lineitem ⋈ orders`. */
  def raw(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    // The test input is one small parquet file = ONE scan task; without an
    // explicit exchange the whole heavy synthesis (string building, repeat,
    // vocab CASEs) runs single-threaded before the first shuffle. Explicit
    // partition count so AQE does not coalesce the small exchange back to 1.
    // (At real corpus scale the source has many splits and this is a no-op
    // cost: one narrow shuffle of the raw keys.)
    val p = spark.sparkContext.defaultParallelism
    // Only the columns the synthesis needs — Catalyst prunes the scan.
    val j = li
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag")
      .repartition(p, col("l_orderkey"))
      .join(ord.select("o_orderkey", "o_custkey"), li("l_orderkey") === ord("o_orderkey"))

    val kwA = pick(KwA, col("l_partkey"))
    val kwB = pick(KwB, col("l_suppkey"))
    val kwC = pick(KwC, col("l_orderkey") + col("l_linenumber"))
    val kwD = pick(KwD, col("l_partkey") % 3)

    val line = concat(
      lit("func handler_"), col("l_orderkey").cast("string"),
      lit("_"), col("l_linenumber").cast("string"),
      lit(" ctx "), kwA, lit(" "), kwB,
      lit(" return "), kwC, lit(" "), kwD, lit(" "))

    val content = concat(
      repeat(line, (lit(1) + col("l_linenumber") % 3).cast("int")),
      lit("package "), kwB, lit(" import "), kwA,
      lit(" cust_"), (col("o_custkey") % 20).cast("string"))

    j.select(
      concat(lit("repo-"), (col("l_suppkey") % 50).cast("string")).as("repo"),
      concat(lit("src/"), lower(col("l_returnflag")), lit("/"),
        col("l_orderkey").cast("string"), lit("/"),
        col("l_linenumber").cast("string"), lit(".go")).as("path"),
      substring(sha2(col("l_orderkey").cast("string"), 256), 1, 12).as("commit"),
      pick(Langs, col("l_partkey") % 4).as("lang"),
      content.as("content"))
  }

  /** The deduped corpus: unique `(repo, path, commit)`, deterministic
    * representative row (`min`) for duplicate keys — identical semantics on
    * the DuckDB side. This is operator A2/J1 of SURVEY.md §2.
    */
  def corpus(spark: SparkSession, sfDir: String): DataFrame =
    raw(spark, sfDir)
      .groupBy("repo", "path", "commit")
      .agg(min("lang").as("lang"), min("content").as("content"))

  /** Corpus plus the engine's stable 64-bit docId — the analog of the
    * reference's store-assigned node uid (`pkg/page/page.go:23`), made
    * deterministic (`xxhash64` of the natural key) because resume +
    * rank-identity forbid nondeterministic id allocation.
    */
  def withDocId(c: DataFrame): DataFrame =
    c.withColumn("doc_id", xxhash64(concat_ws(" ", col("repo"), col("path"), col("commit"))))

  /** The deterministic ~80% doc-hash slice used as the BASE of every
    * incremental fixture (Verify entries, LsmBench): one definition so the
    * correctness fixtures and the benchmarks can never silently diverge.
    */
  def baseSlice(full: DataFrame): DataFrame =
    withDocId(full)
      .filter(pmod(xxhash64(col("doc_id")), lit(5)) =!= 0)
      .select("repo", "path", "commit", "lang", "content")
}
