package graft

import graft.corpus.Corpus
import graft.tokenize.Tokenizer
import org.apache.spark.sql.functions._

/** Round-6 one-off attribution runs (guide §1: measure first). Times the
  * sub-steps of the two dominant bench components (index build phases and
  * the naive set) through the noop sink so each cost is isolated from its
  * sink. NOT part of the driver contract; numbers cited in
  * OPTIMIZATION_r06.md only.
  */
object ProfileR06 {

  def t(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val spark = Config.session()
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription("profile: corpus synthesis")
    t("corpus synth (dedup) noop")(noop(Corpus.corpus(spark, sfDir)))
    val c = Corpus.withDocId(Corpus.corpus(spark, sfDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("corpus persist+count")(c.count(): Unit)

    t("sha2 only")(noop(c.select(sha2(col("content"), 256).as("s"))))
    t("dl via size(tokensCol)")(noop(c.select(size(Tokenizer.tokensCol(col("content"))).as("dl"))))
    t("cust regex only")(noop(c.select(graft.index.LinkIndex.custCol(col("content")).as("cu"))))
    t("docs-sidecar full projection")(noop(c.select(col("doc_id"), col("repo"), col("path"),
      col("commit"), col("lang"),
      size(Tokenizer.tokensCol(col("content"))).cast("long").as("dl"),
      sha2(col("content"), 256).as("content_sha"),
      graft.index.LinkIndex.custCol(col("content")).as("cust"))))

    t("termFreqsWithDl (map-side tokenize)")(noop(Tokenizer.termFreqsWithDl(c)))
    t("termFreqs (explode+groupBy)")(noop(Tokenizer.termFreqs(c)))

    val stats = graft.index.IndexStats(7, 598902L, 29.0, 17000000L, 16, 32)
    val prev = spark.conf.getOption("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
    val tfd = Tokenizer.termFreqsWithDl(c)
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16)).cast("int"))
    t("segments agg noop (groupBy salt,term + BuildPostings)")(noop(
      tfd.groupBy("salt", "term")
        .agg(graft.index.PostingAggExprs.buildPostings(29.0, col("doc_id"), col("tf"), col("dl")).as("p"))))
    t("segments agg + repartition(salt,bucket) noop")(noop(
      tfd.groupBy("salt", "term")
        .agg(graft.index.PostingAggExprs.buildPostings(29.0, col("doc_id"), col("tf"), col("dl")).as("p"))
        .select(col("salt"), col("term"),
          pmod(xxhash64(col("term")), lit(32)).cast("int").as("bucket"),
          col("p.df"), col("p.sum_tf"), col("p.postings"), col("p.dls"), col("p.block_max"), col("p.block_dir"))
        .repartition(col("salt"), col("bucket"))))

    // merge attribution against the existing bench index root (if present)
    val segDir = "target/graft-index/bench-cpus32/segments"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(segDir))) {
      val segs = spark.read.parquet(segDir)
      t("segments re-read count")(segs.count(): Unit)
      t("merge agg noop (groupBy term + MergePostings)")(noop(
        segs.groupBy("term")
          .agg(graft.index.PostingAggExprs.mergePostings(29.0, col("postings"), col("dls")).as("p"))))
    }
    prev match {
      case Some(v) => spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
      case None => spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }

    // naive attribution
    val q = graft.queries.QuerySet.df(spark)
    t("naive topK full")(noop(graft.engine.NaiveSearch.topK(spark, Corpus.corpus(spark, sfDir), q)))
    spark.stop()
  }
}

/** Second-pass attribution: are the segments/merge phase walls write-bound? */
object ProfileWriteR06 {
  import ProfileR06.t
  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val spark = Config.session()
    val tmp = "/tmp/graft-profile-write"
    graft.index.IndexBuilder.deleteRecursively(java.nio.file.Paths.get(tmp))
    val c = Corpus.withDocId(Corpus.corpus(spark, sfDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    c.count()
    val prev = spark.conf.getOption("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
    val tfd = Tokenizer.termFreqsWithDl(c)
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16)).cast("int"))
    val segOut = tfd.groupBy("salt", "term")
      .agg(graft.index.PostingAggExprs.buildPostings(29.0, col("doc_id"), col("tf"), col("dl")).as("p"))
      .select(col("salt"), col("term"),
        pmod(xxhash64(col("term")), lit(32)).cast("int").as("bucket"),
        col("p.df"), col("p.sum_tf"), col("p.postings"), col("p.dls"), col("p.block_max"), col("p.block_dir"))
    t("segments WRITE partitionBy(salt,bucket)")(
      segOut.repartition(col("salt"), col("bucket"))
        .write.mode("overwrite").partitionBy("salt", "bucket").parquet(s"$tmp/segments"))
    val segs = spark.read.parquet(s"$tmp/segments")
    val mergeOut = segs.groupBy("term")
      .agg(graft.index.PostingAggExprs.mergePostings(29.0, col("postings"), col("dls")).as("p"))
      .select(col("term"),
        pmod(xxhash64(col("term")), lit(32)).cast("int").as("bucket"),
        col("p.df"), col("p.sum_tf"), col("p.postings"), col("p.dls"), col("p.block_max"), col("p.block_dir"))
    t("merge WRITE partitionBy(bucket)")(
      mergeOut.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$tmp/index"))
    t("merge agg FULL from tmp segments (noop)")(
      mergeOut.write.format("noop").mode("overwrite").save())
    prev match {
      case Some(v) => spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
      case None => spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }
    println("[profile] sizes: " + Seq("segments", "index").map { d =>
      val p = java.nio.file.Paths.get(s"$tmp/$d")
      var n = 0L
      java.nio.file.Files.walk(p).forEach(f => if (java.nio.file.Files.isRegularFile(f)) n += java.nio.file.Files.size(f))
      s"$d=${n / 1024 / 1024}MB"
    }.mkString(" "))
    spark.stop()
  }
}

/** Graph BFS attribution (r6): where do graph_reach_bfs' 65 s at sf0.01 go? */
object ProfileGraphR06 {
  import ProfileR06.t
  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val spark = Config.session()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val corpus = Corpus.corpus(spark, sfDir)
    t("docNodes noop")(noop(graft.ops.Graph.docNodes(corpus)))
    t("linkEdges noop")(noop(graft.ops.Graph.linkEdges(corpus)))
    t("reachBfs FULL")(noop(graft.ops.Graph.reachBfs(spark, corpus)))
    t("reachBfs FULL again")(noop(graft.ops.Graph.reachBfs(spark, corpus)))
    spark.stop()
  }
}

/** Per-hop attribution of the BFS machinery (r6). */
object ProfileGraph2R06 {
  import ProfileR06.t
  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val spark = Config.session()
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val corpus = Corpus.corpus(spark, sfDir)
    val nodes = graft.ops.Graph.docNodes(corpus).persist(lvl)
    t("nodes count")(nodes.count(): Unit)
    val edges0 = graft.index.LinkIndex.edgesOf(nodes)
    val edges = edges0.repartition(col("src_id")).sortWithinPartitions("src_id").persist(lvl)
    t("edges count")(edges.count(): Unit)
    val canon = graft.ops.Graph.canonicalProviders(nodes)
    val roots = canon.filter(col("cust") === 0 && col("repo").isin(graft.ops.Graph.RootRepos: _*))
      .select(col("canon_id").as("root_id"), col("canon_id").as("doc_id"))
    var visited = roots.select(col("root_id"), col("doc_id")).distinct()
      .withColumn("depth", lit(0)).persist(lvl)
    t("roots count")(visited.count(): Unit)
    var frontier: org.apache.spark.sql.DataFrame = visited
    for (d <- 1 to 3) {
      val next = frontier.select(col("root_id"), col("doc_id").as("src_id"))
        .join(edges, "src_id")
        .select(col("root_id"), col("dst_id").as("doc_id"))
        .distinct()
        .join(visited.select("root_id", "doc_id"), Seq("root_id", "doc_id"), "left_anti")
        .withColumn("depth", lit(d))
        .persist(lvl)
      t(s"hop $d count")(next.count(): Unit)
      visited = visited.unionByName(next).persist(lvl)
      t(s"hop $d visited count")(visited.count(): Unit)
      frontier = next
    }
    spark.stop()
  }
}

/** Full reachBoth step attribution (r6). */
object ProfileGraph3R06 {
  import ProfileR06.t
  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val spark = Config.session()
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val corpus = Corpus.corpus(spark, sfDir)
    val nodes = graft.ops.Graph.docNodes(corpus).persist(lvl)
    t("nodes persist+count")(nodes.count(): Unit)
    val edges = graft.index.LinkIndex.edgesOf(nodes).persist(lvl)
    t("edges persist+count")(edges.count(): Unit)
    val fwdEdges = graft.engine.IndexReader.persistPartitioned(
      edges.repartition(col("src_id")).sortWithinPartitions("src_id"))
    val revEdges = graft.engine.IndexReader.persistPartitioned(
      edges.select(col("dst_id").as("src_id"), col("src_id").as("dst_id"))
        .repartition(col("src_id")).sortWithinPartitions("src_id"))
    t("fwd/rev edges materialize")({ fwdEdges.count(); revEdges.count() }: Unit)
    val canon = graft.ops.Graph.canonicalProviders(nodes)
    val roots = canon.filter(col("cust") === 0 && col("repo").isin(graft.ops.Graph.RootRepos: _*))
      .select(col("canon_id").as("root_id"), col("canon_id").as("doc_id")).persist(lvl)
    t("roots persist+count")(roots.count(): Unit)
    var fwd: org.apache.spark.sql.DataFrame = null
    var rev: org.apache.spark.sql.DataFrame = null
    t("fwd reach")({ fwd = graft.ops.Graph.reach(fwdEdges, roots, 3) })
    t("rev reach")({ rev = graft.ops.Graph.reach(revEdges, roots, 3) })
    val rootKeys = nodes.select(col("doc_id").as("root_id"),
      col("repo").as("root_repo"), col("path").as("root_path"))
    val nodeKeys = nodes.select(col("doc_id"), col("path"))
    val out = fwd.withColumn("direction", lit("out"))
      .unionByName(rev.withColumn("direction", lit("in")))
      .join(rootKeys, "root_id")
      .join(nodeKeys, "doc_id")
      .select(col("direction"), col("root_repo"), col("root_path"), col("path"), col("depth"))
      .orderBy("direction", "root_repo", "root_path", "path")
    t("final join+orderBy+count")(out.persist(lvl).count(): Unit)
    t("reachBfs FULL (current impl)")(
      graft.ops.Graph.reachBfs(spark, corpus).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

/** Fast-sidecar build attribution (r6 late): decode+prune vs join vs agg. */
object ProfileFastR06 {
  import ProfileR06.t
  def main(args: Array[String]): Unit = {
    val spark = Config.session()
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val root = "target/graft-index/bench-cpus32"
    val stats = graft.index.IndexBuilder.readStats(graft.index.IndexPaths(root)).get
    val idx = spark.read.parquet(s"$root/index")
    val docs = spark.read.schema(graft.index.IndexBuilder.DocsSchema).parquet(s"$root/docs")
    val n = stats.nDocs; val avgdl = stats.avgdl
    val fastK = graft.index.IndexBuilder.FastK
    val hot = idx
      .filter(col("df") >= graft.index.IndexBuilder.FastMinDf)
      .select("term", "df", "postings", "dls", "block_max", "block_dir", "bucket")
      .as[(String, Long, Array[Byte], Array[Byte], Seq[Double], Array[Byte], Int)]
      .flatMap { case (term, df, p, d, bm, dir, bucket) =>
        graft.index.Postings.topCandidatesByScore(df, p, d, bm.toArray, dir, n, avgdl, fastK, 1.0)
          .map { case (id, tf, dl) => (term, df, bucket, id, tf, dl) }
      }
      .toDF("term", "df", "bucket", "doc_id", "tf", "dl")
    t("fast: decode+prune flatMap noop")(noop(hot))
    println("[profile] candidate rows: " + hot.count())
    val docKeys = docs.select("doc_id", "repo", "path", "commit")
    t("fast: + docKeys join noop")(noop(hot.join(docKeys, "doc_id")))
    val scoreR = graft.score.BM25.quantize(graft.score.BM25.score(
      col("tf"), col("df"), col("dl"), lit(n), lit(avgdl)))
    t("fast: + topK agg noop")(noop(
      hot.join(docKeys, "doc_id")
        .groupBy("term", "df", "bucket")
        .agg(graft.engine.TopKAggExprs.topK(lit(fastK), scoreR,
          struct(col("repo"), col("path"), col("commit"),
            col("doc_id"), col("tf"), col("dl"))).as("hits"))))
    spark.stop()
  }
}
