package graft

import graft.corpus.Corpus
import graft.engine.{NaiveSearch, Wand}
import graft.index.IndexBuilder
import graft.queries.QuerySet
import org.apache.spark.sql.Row

/** Scale-parity smoke: the SERVING path (fast prefixes + hybrid union +
  * WAND) must be rank- and score-identical to the naive full-scoring
  * oracle plan at ANY scale — including the sf where prefix truncation
  * actually bites (df(hot) ≫ FastK). The DuckDB oracle pins this at
  * sf0.001/sf0.01 (driver Verify); this main pins it Spark-vs-Spark at
  * whatever `SPARK_GRAFT_SF_DIR` points to (sf0.1 takes ~1 min after the
  * index exists). Exits nonzero on any divergence.
  */
object CrossCheck {

  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val spark = Config.session()
    def key(r: Row) =
      (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getDouble(5))
    val (paths, _) = IndexBuilder.ensure(spark, sfDir)
    // sort both sides by (query_id, rank) BEFORE comparing: rankByKeys ends
    // without an ORDER BY, so collect() order is partition-iteration order —
    // rank-identical results must not diverge on plan-dependent row order
    val serve = Wand.topKAt(spark, paths, QuerySet.all).collect().map(key)
      .sortBy(r => (r._1, r._2))
    val naive = NaiveSearch.topK(spark, Corpus.corpus(spark, sfDir), QuerySet.df(spark))
      .collect().map(key).sortBy(r => (r._1, r._2))
    val ok = serve.toSeq == naive.toSeq
    println(s"""{"metric":"crosscheck","rows":${serve.length},"naive_rows":${naive.length},"identical":$ok,"sf":"$sfDir"}""")
    if (!ok) {
      serve.zipAll(naive, null, null).zipWithIndex.collect {
        case ((s, n), i) if s != n => s"row $i: serve=$s naive=$n"
      }.take(5).foreach(System.err.println)
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
