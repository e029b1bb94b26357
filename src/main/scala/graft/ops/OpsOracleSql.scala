package graft.ops

/** DuckDB twins of the training-data ops, generated from the SAME constants
  * as the Spark plans ([[TextOps]], [[Dedup]], [[Ann]]) — thresholds, list
  * sizes, stopword lists, quality formula, banding, chunking all come from
  * one place. Same conventions as [[graft.corpus.OracleSql]]: MATERIALIZED
  * CTEs, `floor(x*1e6+0.5)/1e6` quantization, `stripMargin('#')`.
  */
object OpsOracleSql {

  private def q(e: String) = s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"
  private def list(ws: Seq[String]) = ws.mkString("['", "','", "']")

  val tokensCte: String =
    s"""toks AS MATERIALIZED (
       #  SELECT doc_id, text,
       #         list_filter(string_split_regex(lower(text), '${graft.tokenize.Tokenizer.SplitRegex}'), x -> x <> '') AS tokens
       #  FROM documents
       #)""".stripMargin('#')

  val shinglesCte: String = {
    val n = Dedup.ShingleSize
    s"""sh AS MATERIALIZED (
       #  SELECT doc_id,
       #         CASE WHEN len(tokens) >= $n THEN
       #           list_distinct(list_transform(generate_series(1, len(tokens) - ${n - 1}),
       #             i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]))
       #         ELSE CAST([] AS VARCHAR[]) END AS shingles
       #  FROM toks
       #),
       #shex AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS shingle FROM sh)""".stripMargin('#')
  }

  val textStats: String = {
    val stop = list(TextOps.EnStopwords)
    s"""WITH $tokensCte
       #SELECT doc_id,
       #  CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
       #  CAST(len(tokens) AS BIGINT) AS n_terms,
       #  CAST(length(text) AS BIGINT) AS n_chars_measured,
       #  ${q("CAST(length(regexp_replace(text, '[a-zA-Z0-9_\\s]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE)")} AS punct_ratio_r,
       #  ${q(s"CAST(len(list_filter(tokens, x -> list_contains($stop, x))) AS DOUBLE) / CAST(greatest(len(tokens), 1) AS DOUBLE)")} AS stopword_ratio_r,
       #  ${q(s"0.4 * least(1.0, CAST(len(tokens) AS DOUBLE) / 100.0)" +
           s" + 0.4 * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9_\\s]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))" +
           s" + 0.2 * (1.0 - CAST(len(list_filter(tokens, x -> list_contains($stop, x))) AS DOUBLE) / CAST(greatest(len(tokens), 1) AS DOUBLE))")} AS quality_r
       #FROM toks ORDER BY doc_id""".stripMargin('#')
  }

  val langId: String = {
    val hits = TextOps.LangStopwords.map { case (l, ws) =>
      s"CAST(len(list_filter(tokens, x -> list_contains(${list(ws)}, x))) AS BIGINT) AS ${l}_hits"
    }.mkString(",\n#  ")
    s"""WITH $tokensCte,
       #h AS MATERIALIZED (
       #  SELECT doc_id,
       #  $hits
       #  FROM toks
       #)
       #SELECT doc_id, de_hits, en_hits, es_hits, fr_hits,
       #  CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und'
       #       WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
       #       WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
       #       WHEN es_hits >= fr_hits THEN 'es'
       #       ELSE 'fr' END AS predicted
       #FROM h ORDER BY doc_id""".stripMargin('#')
  }

  val fingerprint: String =
    s"""WITH $tokensCte,
       #fp AS MATERIALIZED (
       #  SELECT doc_id, sha256(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS fingerprint
       #  FROM toks
       #)
       #SELECT doc_id, fingerprint,
       #       min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
       #       count(*) OVER (PARTITION BY fingerprint) AS group_size
       #FROM fp ORDER BY doc_id""".stripMargin('#')

  val dedupExact: String =
    s"""WITH s AS MATERIALIZED (SELECT doc_id, sha256(text) AS text_sha FROM documents)
       #SELECT doc_id, text_sha,
       #       min(doc_id) OVER (PARTITION BY text_sha) AS canonical_id,
       #       count(*) OVER (PARTITION BY text_sha) AS group_size
       #FROM s ORDER BY doc_id""".stripMargin('#')

  /** Winnowing fingerprints (mirrors [[TextOps.winnowFingerprints]]): the
    * Rabin–Karp polynomial k-gram hash per position (the SAME
    * `Σ code·B^(k-1-j) mod M` the Spark side computes by rolling update —
    * coefficients `B^e mod M` inlined from [[Winnow.pow]], every
    * intermediate < 2^42 so plain BIGINT arithmetic suffices), then min per
    * w-window, distinct + sorted. DuckDB list slicing `h[i : i+w-1]` is
    * INCLUSIVE both ends = Spark `slice(h, i, w)`; `range(1, x)` is
    * end-exclusive = Spark `sequence(1, x-1)`.
    */
  private val winnowCtes: String = {
    val k = TextOps.WinnowK
    val w = TextOps.WinnowW
    val m = Winnow.Mod
    // h(i) = (Σ_j ord(s[i+j]) * B^(k-1-j)) % M, j = 0..k-1
    val poly = (0 until k).map { j =>
      val off = if (j == 0) "CAST(i AS INTEGER)" else s"CAST(i + $j AS INTEGER)"
      s"CAST(ascii(substr(text, $off, 1)) AS BIGINT) * ${Winnow.pow(k - 1 - j)}"
    }.mkString(" + ")
    s"""wh AS MATERIALIZED (
       #  SELECT doc_id,
       #    CASE WHEN length(text) >= $k
       #      THEN list_transform(range(1, CAST(length(text) - ${k - 1} + 1 AS BIGINT)),
       #                          i -> ($poly) % $m)
       #      ELSE [] END AS h
       #  FROM documents
       #),
       #wfp AS MATERIALIZED (
       #  SELECT doc_id,
       #    CASE WHEN len(h) >= $w
       #      THEN list_sort(list_distinct(list_transform(range(1, CAST(len(h) - ${w - 1} + 1 AS BIGINT)),
       #                          i -> list_aggregate(h[CAST(i AS INTEGER):CAST(i + ${w - 1} AS INTEGER)], 'min'))))
       #      WHEN len(h) > 0 THEN [list_aggregate(h, 'min')]
       #      ELSE [] END AS fps
       #  FROM wh
       #),
       #wex AS MATERIALIZED (SELECT doc_id, unnest(fps) AS fp FROM wfp)""".stripMargin('#')
  }

  val textWinnow: String =
    s"""WITH $winnowCtes
       #SELECT doc_id, fp AS fingerprint FROM wex ORDER BY doc_id, fingerprint""".stripMargin('#')

  val dedupWinnow: String =
    s"""WITH $winnowCtes,
       #wrare AS MATERIALIZED (
       #  SELECT s.doc_id, s.fp FROM wex s
       #  JOIN (SELECT fp FROM wex GROUP BY fp HAVING count(*) <= ${Dedup.MaxShingleDf}) r
       #  USING (fp)
       #),
       #wcand AS MATERIALIZED (
       #  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
       #  FROM wrare a JOIN wrare b ON a.fp = b.fp AND a.doc_id < b.doc_id
       #),
       #winter AS MATERIALIZED (
       #  SELECT c.ida, c.idb, count(*) AS n_common
       #  FROM wcand c
       #  JOIN wex a ON a.doc_id = c.ida
       #  JOIN wex b ON b.doc_id = c.idb AND b.fp = a.fp
       #  GROUP BY c.ida, c.idb
       #),
       #wsz AS MATERIALIZED (SELECT doc_id, len(fps) AS n FROM wfp),
       #wjac AS MATERIALIZED (
       #  SELECT ida, idb,
       #         CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jacv
       #  FROM winter JOIN wsz sa ON sa.doc_id = ida JOIN wsz sb ON sb.doc_id = idb
       #)
       #SELECT ida, idb, ${q("jacv")} AS jac_r FROM wjac
       #WHERE jacv >= ${Dedup.JaccardThreshold}
       #ORDER BY ida, idb""".stripMargin('#')

  /** Exact full-set Jaccard restricted to a `cand(ida, idb)` CTE — mirrors
    * [[Dedup.jaccardOnCandidates]]: verification never re-runs the
    * corpus-wide shingle self-join.
    */
  private val jaccardVerifyCtes: String =
    s"""inter AS MATERIALIZED (
       #  SELECT c.ida, c.idb, count(*) AS n_common
       #  FROM cand c
       #  JOIN shex a ON a.doc_id = c.ida
       #  JOIN shex b ON b.doc_id = c.idb AND b.shingle = a.shingle
       #  GROUP BY c.ida, c.idb
       #),
       #sz AS MATERIALIZED (SELECT doc_id, len(shingles) AS n FROM sh),
       #jac AS MATERIALIZED (
       #  SELECT ida, idb,
       #         CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jacv
       #  FROM inter JOIN sz sa ON sa.doc_id = ida JOIN sz sb ON sb.doc_id = idb
       #)""".stripMargin('#')

  /** Blocking-capped candidate generation — mirrors [[Dedup.MaxShingleDf]]. */
  private val rareShingleCandCtes: String =
    s"""rare AS MATERIALIZED (
       #  SELECT s.doc_id, s.shingle FROM shex s
       #  JOIN (SELECT shingle FROM shex GROUP BY shingle HAVING count(*) <= ${Dedup.MaxShingleDf}) r
       #  USING (shingle)
       #),
       #cand AS MATERIALIZED (
       #  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
       #  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       #)""".stripMargin('#')

  val ngramJaccard: String =
    s"""WITH $tokensCte, $shinglesCte, $rareShingleCandCtes, $jaccardVerifyCtes
       #SELECT ida, idb, ${q("jacv")} AS jac_r FROM jac
       #WHERE jacv >= ${Dedup.JaccardThreshold}
       #ORDER BY ida, idb""".stripMargin('#')

  val minhashLsh: String = {
    val mh = (0 until Dedup.MinhashK)
      .map(k => s"min(sha256('$k:' || shingle)) AS mh$k").mkString(",\n#    ")
    val nBands = Dedup.MinhashK / Dedup.MinhashBandRows
    val bandRows = (0 until nBands).map { b =>
      val key = (0 until Dedup.MinhashBandRows)
        .map(r => s"mh${b * Dedup.MinhashBandRows + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n#  UNION ALL ")
    s"""WITH $tokensCte, $shinglesCte,
       #sig AS MATERIALIZED (
       #  SELECT doc_id,
       #    $mh
       #  FROM shex GROUP BY doc_id
       #),
       #bands AS MATERIALIZED (
       #  $bandRows
       #),
       #cand AS MATERIALIZED (
       #  SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
       #  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
       #),
       #$jaccardVerifyCtes
       #SELECT ida, idb, ${q("jacv")} AS jac_r
       #FROM jac
       #WHERE jacv >= ${Dedup.JaccardThreshold}
       #ORDER BY ida, idb""".stripMargin('#')
  }

  val simhashPairs: String = {
    val bitSums = (0 until Dedup.SimhashBits).map { j =>
      s"sum((((strpos('0123456789abcdef', substr(h, ${1 + j / 4}, 1)) - 1) >> ${3 - j % 4}) & 1) * 2 - 1) AS s$j"
    }.mkString(",\n#    ")
    val shExpr = (0 until Dedup.SimhashBits)
      .map(j => s"CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    val chunkBits = Dedup.SimhashBits / Dedup.SimhashChunks
    val chunkRows = (0 until Dedup.SimhashChunks).map { c =>
      s"SELECT doc_id, simhash, $c AS c, (simhash >> ${c * chunkBits}) % ${1L << chunkBits} AS v FROM sh2"
    }.mkString("\n#  UNION ALL ")
    s"""WITH $tokensCte,
       #tokx AS MATERIALIZED (
       #  SELECT doc_id, unnest(tokens) AS t FROM toks
       #),
       #tokh AS MATERIALIZED (
       #  SELECT doc_id, sha256(t) AS h FROM tokx
       #),
       #bits AS MATERIALIZED (
       #  SELECT doc_id,
       #    $bitSums
       #  FROM tokh GROUP BY doc_id
       #),
       #sh2 AS MATERIALIZED (SELECT doc_id, CAST($shExpr AS BIGINT) AS simhash FROM bits),
       #chunks AS MATERIALIZED (
       #  $chunkRows
       #),
       #cand AS MATERIALIZED (
       #  SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb, x.simhash AS ha, y.simhash AS hb
       #  FROM chunks x JOIN chunks y ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id
       #)
       #SELECT ida, idb, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
       #FROM cand WHERE bit_count(xor(ha, hb)) <= ${Dedup.SimhashMaxHamming}
       #ORDER BY ida, idb""".stripMargin('#')
  }

  // ---------- embeddings ----------

  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(generate_series(1, ${Ann.Dim}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def cosSql(a: String, b: String) =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  val cosinePairs: String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       #p AS MATERIALIZED (
       #  SELECT a.vec_id AS ia, b.vec_id AS ib, ${cosSql("a.embedding", "b.embedding")} AS cosv
       #  FROM e a JOIN e b ON a.vec_id < b.vec_id
       #)
       #SELECT ia, ib, ${q("cosv")} AS cos_r FROM p WHERE cosv >= ${Dedup.CosineThreshold}
       #ORDER BY ia, ib""".stripMargin('#')

  /** Mirrors [[Ann.cosineLshPairs]]: identical LCG hyperplanes (literal ±1
    * lists generated from the same Scala constants), identical banding.
    */
  val cosineLsh: String = {
    val nBands = Ann.LshBits / Ann.LshBandBits
    def hpList(j: Int): String = Ann.hyperplane(j).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    val sigBits = (0 until Ann.LshBits).map { j =>
      s"(list_sum(list_transform(generate_series(1, ${Ann.Dim}), i -> (${hpList(j)})[i] * CAST(embedding[i] AS DOUBLE))) >= 0) AS s$j"
    }.mkString(",\n#    ")
    val bandRows = (0 until nBands).map { b =>
      val key = (0 until Ann.LshBandBits)
        .map(r => s"CASE WHEN s${b * Ann.LshBandBits + r} THEN ${1 << r} ELSE 0 END")
        .mkString(" + ")
      s"SELECT vec_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n#  UNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       #sig AS MATERIALIZED (
       #  SELECT vec_id,
       #    $sigBits
       #  FROM e
       #),
       #bands AS MATERIALIZED (
       #  $bandRows
       #),
       #cand AS MATERIALIZED (
       #  SELECT DISTINCT x.vec_id AS ia, y.vec_id AS ib
       #  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
       #),
       #p AS MATERIALIZED (
       #  SELECT c.ia, c.ib, ${cosSql("a.embedding", "b.embedding")} AS cosv
       #  FROM cand c JOIN e a ON a.vec_id = c.ia JOIN e b ON b.vec_id = c.ib
       #)
       #SELECT ia, ib, ${q("cosv")} AS cos_r FROM p WHERE cosv >= ${Dedup.CosineThreshold}
       #ORDER BY ia, ib""".stripMargin('#')
  }

  val bruteTopK: String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       #qv AS MATERIALIZED (SELECT vec_id AS query_id, embedding AS qe FROM e WHERE vec_id < ${Ann.NumQueries}),
       #scored AS MATERIALIZED (
       #  SELECT q.query_id, e.vec_id, ${q(s"${cosSql("q.qe", "e.embedding")}")} AS cos_r
       #  FROM e CROSS JOIN qv q WHERE e.vec_id <> q.query_id
       #),
       #r AS MATERIALIZED (
       #  SELECT query_id, vec_id, cos_r,
       #         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, vec_id ASC) AS INTEGER) AS rank
       #  FROM scored
       #)
       #SELECT query_id, rank, vec_id, cos_r FROM r WHERE rank <= ${Ann.TopK}
       #ORDER BY query_id, rank""".stripMargin('#')

  /** Trained IVF — mirrors [[Ann.ivfTopK]]: the SAME unrolled Lloyd
    * iterations over micro-quantized (×1e6, floor+0.5) bigint vectors.
    * Micro-space dot products are sums of exact ≤2^42 integers (< 2^53
    * total), hence bit-identical doubles in both engines regardless of
    * summation order; centroid means are exact integer sums floor-divided.
    * The oracle uses windows for argmax/top-n (fine in DuckDB — only the
    * Spark plan has the no-window rule).
    */
  val ivfTopK: String = {
    // one Lloyd step: cent$i := component-wise floor-mean of vectors
    // assigned (argmax micro-cosine, ties to smaller id) to cent${i-1};
    // emptied clusters keep the previous centroid
    def lloyd(i: Int): String = {
      val prev = s"cent${i - 1}"
      s"""asg$i AS MATERIALIZED (
         #  SELECT vec_id, m, centroid_id FROM (
         #    SELECT t.vec_id, t.m, c.centroid_id,
         #           row_number() OVER (PARTITION BY t.vec_id ORDER BY ${cosSql("t.m", "c.cm")} DESC, c.centroid_id ASC) AS rn
         #    FROM em t CROSS JOIN $prev c
         #  ) WHERE rn = 1
         #),
         #comp$i AS MATERIALIZED (
         #  SELECT centroid_id, pos, CAST(floor(CAST(sum(m[pos]) AS DOUBLE) / count(*)) AS BIGINT) AS cv
         #  FROM asg$i CROSS JOIN (SELECT unnest(generate_series(1, ${Ann.Dim})) AS pos) p
         #  GROUP BY centroid_id, pos
         #),
         #cnew$i AS MATERIALIZED (
         #  SELECT centroid_id, list(cv ORDER BY pos) AS cm2 FROM comp$i GROUP BY centroid_id
         #),
         #cent$i AS MATERIALIZED (
         #  SELECT c.centroid_id, coalesce(n.cm2, c.cm) AS cm
         #  FROM cent${i - 1} c LEFT JOIN cnew$i n USING (centroid_id)
         #)""".stripMargin('#')
    }
    val last = s"cent${Ann.KMeansIters}"
    s"""WITH em AS MATERIALIZED (
       #  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS m
       #  FROM embeddings
       #),
       #cent0 AS MATERIALIZED (SELECT vec_id AS centroid_id, m AS cm FROM em WHERE vec_id < ${Ann.NumCentroids}),
       #${(1 to Ann.KMeansIters).map(lloyd).mkString(",\n#")},
       #assign AS MATERIALIZED (
       #  SELECT vec_id, m, centroid_id FROM (
       #    SELECT t.vec_id, t.m, c.centroid_id,
       #           row_number() OVER (PARTITION BY t.vec_id ORDER BY ${cosSql("t.m", "c.cm")} DESC, c.centroid_id ASC) AS rn
       #    FROM em t CROSS JOIN $last c
       #  ) WHERE rn = 1
       #),
       #qv AS MATERIALIZED (SELECT vec_id AS query_id, m AS qm FROM em WHERE vec_id < ${Ann.NumQueries}),
       #probes AS MATERIALIZED (
       #  SELECT query_id, qm, centroid_id FROM (
       #    SELECT q.query_id, q.qm, c.centroid_id,
       #           row_number() OVER (PARTITION BY q.query_id ORDER BY ${cosSql("q.qm", "c.cm")} DESC, c.centroid_id ASC) AS rn
       #    FROM qv q CROSS JOIN $last c
       #  ) WHERE rn <= ${Ann.NProbe}
       #),
       #scored AS MATERIALIZED (
       #  SELECT p.query_id, a.vec_id, ${q(s"${cosSql("p.qm", "a.m")}")} AS cos_r
       #  FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
       #  WHERE a.vec_id <> p.query_id
       #),
       #r AS MATERIALIZED (
       #  SELECT query_id, vec_id, cos_r,
       #         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, vec_id ASC) AS INTEGER) AS rank
       #  FROM scored
       #)
       #SELECT query_id, rank, vec_id, cos_r FROM r WHERE rank <= ${Ann.TopK}
       #ORDER BY query_id, rank""".stripMargin('#')
  }

  /** Mirrors [[Multimodal.decodePgmFeatures]] from the image CONSTRUCTION
    * (w=[[Multimodal.PgmWidth]], space-padded final row): the oracle never
    * parses the binary, so it independently checks the engine's real
    * byte-level PGM parser. `ascii()` per char == byte (documents text is
    * pure ASCII by construction).
    */
  val mmPgmDecode: String = {
    val w = Multimodal.PgmWidth
    val pad = Multimodal.PgmPad
    s"""WITH m AS MATERIALIZED (
       #  SELECT doc_id, length(text) AS len,
       #         list_transform(generate_series(1, length(text)), i -> ascii(substr(text, i, 1))) AS bytes
       #  FROM documents
       #),
       #g AS MATERIALIZED (
       #  SELECT doc_id, len,
       #         CAST(greatest(1, floor((len + ${w - 1}) / $w.0)) AS BIGINT) AS h,
       #         coalesce(list_sum(bytes), 0) AS sumb,
       #         list_min(bytes) AS mnb, list_max(bytes) AS mxb
       #  FROM m
       #)
       #SELECT doc_id,
       #       CAST($w AS INTEGER) AS width,
       #       CAST(h AS INTEGER) AS height,
       #       CAST(CASE WHEN $w*h > len THEN least(coalesce(mnb, $pad), $pad) ELSE mnb END AS INTEGER) AS min_gray,
       #       CAST(CASE WHEN $w*h > len THEN greatest(coalesce(mxb, $pad), $pad) ELSE mxb END AS INTEGER) AS max_gray,
       #       ${q(s"CAST(sumb + ($w*h - len) * $pad AS DOUBLE) / ($w*h)")} AS mean_gray_r,
       #       'pgm-v1' AS decoder
       #FROM g ORDER BY doc_id""".stripMargin('#')
  }

  val mmBinaryMeta: String =
    s"""SELECT doc_id,
       #       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       #       substr(sha256(text), 1, 8) AS sha_prefix,
       #       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS head_byte,
       #       CAST(ascii(substr(text, length(text), 1)) AS INTEGER) AS tail_byte,
       #       'stub-v1' AS decoder
       #FROM documents ORDER BY doc_id""".stripMargin('#')
}
