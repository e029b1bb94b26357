package graft.engine

import graft.index.IndexPaths
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The validated query entry point — the engine analog of the reference
  * API's request validation matrix (`clamber/cmd/api/http_test.go:88-154`,
  * `api/http.go:38-44`):
  *
  *  - empty / blank term list  → `IllegalArgumentException` (HTTP 400 analog)
  *  - k ≤ 0                    → `IllegalArgumentException` (HTTP 400 analog)
  *  - k above [[MaxK]]         → clamped, like the reference's
  *                               default+clamp of `display_depth`
  *                               (`pkg/query/query.go:44-48`)
  *  - unknown term             → EMPTY result, not an error (the reference
  *                               returns 404 with `results: null` for an
  *                               unreachable root, `api/http.go:87-91`)
  *  - serving an incomplete index already throws from
  *    [[graft.index.IndexBuilder.open]] (the 503 analog).
  */
object SearchApi {

  /** Result-size clamp (the reference's display_depth default is 10). */
  val MaxK: Int = 1000

  /** Validated ad-hoc search over a built index. `conjunctive = true`
    * requires every term (§2.7 intersection); default is OR semantics.
    */
  def search(
      spark: SparkSession,
      paths: IndexPaths,
      terms: Seq[String],
      k: Int,
      conjunctive: Boolean = false): DataFrame = {
    if (terms == null || terms.isEmpty)
      throw new IllegalArgumentException("search: empty term list (400 analog: http_test.go:117-129)")
    if (terms.exists(t => t == null || t.trim.isEmpty))
      throw new IllegalArgumentException("search: blank term (400 analog)")
    if (k <= 0)
      throw new IllegalArgumentException(s"search: k must be >= 1, got $k (400 analog: http_test.go:131-141)")
    val kk = math.min(k, MaxK)
    import spark.implicits._
    val distinct = terms.distinct
    if (conjunctive) {
      val q = distinct.map(t => ("adhoc", t, kk, distinct.size))
        .toDF("query_id", "term", "k", "n_terms")
      IndexSearch.topKAndAt(spark, paths, q)
    } else {
      val q = distinct.map(t => ("adhoc", t, kk)).toDF("query_id", "term", "k")
      IndexSearch.topKAt(spark, paths, q)
    }
  }
}
