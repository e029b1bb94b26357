package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The BM25 rank-identity contract, pinned in ONE place (SURVEY.md §2.8 F11).
  *
  * Classic Robertson BM25 (no Lucene BM25+ floor), k1 = 1.2, b = 0.75 as the
  * north rule mandates:
  *
  *   idf(df)       = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfNorm(tf,dl) = tf * (k1+1) / (tf + k1 * (1 - b + b * dl / avgdl))
  *   score         = Σ_terms idf * tfNorm
  *
  * All four constants are written as double literals on BOTH engines (Spark
  * Column ops here, DuckDB SQL in [[graft.corpus.OracleSql]]) so the float
  * expression trees are identical.
  */
object BM25 {
  val K1: Double = 1.2
  val B: Double = 0.75
  val K1Plus1: Double = 2.2 // literal, NOT computed: 1.2+1.0 at runtime is a different expression tree
  val OneMinusB: Double = 0.25

  def idf(df: Column, n: Column): Column =
    log(lit(1.0) + (n.cast("double") - df.cast("double") + lit(0.5)) / (df.cast("double") + lit(0.5)))

  def tfNorm(tf: Column, dl: Column, avgdl: Column): Column =
    (tf.cast("double") * lit(K1Plus1)) /
      (tf.cast("double") + lit(K1) * (lit(OneMinusB) + (lit(B) * dl.cast("double")) / avgdl))

  def score(tf: Column, df: Column, dl: Column, n: Column, avgdl: Column): Column =
    idf(df, n) * tfNorm(tf, dl, avgdl)

  /** Score quantizer used in every oracle-compared output AND in rank
    * ordering: `floor(x*1e6+0.5)/1e6`. Unlike Spark's `round` (BigDecimal
    * HALF_UP) this float formula is bit-identical on Spark and DuckDB.
    */
  def quantize(score: Column): Column =
    floor(score * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Same quantizer for driver-side doubles (WAND heap thresholds, tests). */
  def quantize(score: Double): Double =
    math.floor(score * 1000000.0 + 0.5) / 1000000.0
}
