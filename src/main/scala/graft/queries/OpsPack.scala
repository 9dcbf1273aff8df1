package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Bpe, Dedup, Diff, LanguageModel, Multimodal, Profiler, Sampling, Similarity, Sketches, TextAnalysis, TextSearch, ZOrder}

/** Similarity search, text analysis, multimodal plumbing — oracle-checked. */
object OpsPack extends QueryPack {

  /** DuckDB sequential-fold dot product (mirrors Similarity.dot exactly:
    * same index order, same double ops). */
  private def duckDot(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
       |            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
       |            (x, y) -> x + y)""".stripMargin

  private def duckCosine(a: String, b: String): String =
    s"(${duckDot(a, b)}) / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  /** DuckDB hyperplane bit: same md5-nibble weights as
    * Similarity.planeWeights (w(p,d) = nibble(md5('p|d')) − 7.5). */
  private def duckPlaneBit(p: Int, v: String): String =
    s"""CASE WHEN list_reduce(list_transform(generate_series(1, len($v)),
       |  i -> CAST($v[i] AS DOUBLE) *
       |       (CAST('0x' || substr(md5($p || '|' || i), 1, 1) AS INTEGER) - 7.5)),
       |  (x, y) -> x + y) >= 0 THEN '1' ELSE '0' END""".stripMargin

  private def duckSignature(v: String, planes: Int): String =
    (0 until planes).map(p => duckPlaneBit(p, v)).mkString(" || ")

  /** DuckDB twin of Similarity.randomProjection's output dim `p`: the
    * sequential-fold dot with the md5-nibble weights (same index order,
    * same double ops as the Spark side, so values are bit-identical). */
  private def duckProjection(p: Int, v: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($v)),
       |  i -> CAST($v[i] AS DOUBLE) *
       |       (CAST('0x' || substr(md5($p || '|' || i), 1, 1) AS INTEGER) - 7.5)),
       |  (x, y) -> x + y)""".stripMargin

  /** DuckDB replay of the ENTIRE quantized k-means fit (KMeansQ): the
    * iteration chain — assign (exact integer distances, smallest-id
    * ties), update (truncating integer-division means, empty clusters
    * keep their center) — unrolled as CTEs. Everything is integer
    * arithmetic, so the replay is bit-exact, not approximately equal. */
  /** DuckDB twin of Sampling.deterministicSample's predicate on vec_id
    * (md5-prefix threshold) — the fit-sample filter shared by the engine
    * and the fit-replay oracles, derived from the same thresholdHex so
    * the two sides cannot drift. */
  private def duckSampleWhere(rate: Double): String =
    s"substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) < " +
      s"'${graft.ops.Sampling.thresholdHex(rate)}'"

  private def duckKmeansCtes(k: Int, iters: Int, scale: Long,
      fitWhere: String = ""): String = {
    val half = scale / 32 // KMeansQ.initialCenters' spread divisor
    // sampled fit (s28 at fitSampleRate < 1): the iteration chain reads
    // qfit, the FINAL assignment still reads the full q — every vector is
    // cell-assigned, only the fit input is rate-bounded
    val fitSrc = if (fitWhere.isEmpty) "q" else "qfit"
    val fitCte =
      if (fitWhere.isEmpty) ""
      else s"qfit AS (SELECT * FROM q WHERE $fitWhere),\n"
    def distCte(i: Int, cPrev: String) =
      s"""d$i AS (
         |  SELECT q.vec_id, c.cl, SUM((q.qv - c.c) * (q.qv - c.c)) AS dist
         |  FROM $fitSrc q JOIN $cPrev c ON q.dim = c.dim GROUP BY 1, 2),
         |a$i AS (
         |  SELECT vec_id, cl AS cluster FROM (
         |    SELECT vec_id, cl,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
         |    FROM d$i) WHERE rn = 1)""".stripMargin
    def updateCte(i: Int, cPrev: String) =
      s"""m$i AS (
         |  SELECT a.cluster, q.dim, CAST(SUM(q.qv) AS BIGINT) AS s, COUNT(*) AS n
         |  FROM $fitSrc q JOIN a$i a USING (vec_id) GROUP BY 1, 2),
         |c$i AS (
         |  SELECT c.cl, c.dim, COALESCE(m.s // m.n, c.c) AS c
         |  FROM $cPrev c LEFT JOIN m$i m ON m.cluster = c.cl AND m.dim = c.dim)""".stripMargin
    val chain = (1 to iters).map(i =>
      distCte(i, s"c${i - 1}") + ",\n" + updateCte(i, s"c${i - 1}"))
      .mkString(",\n")
    // the WITH body ends with `af(vec_id, cluster)` — the final
    // assignment — so composing queries (t36, t37) append their own select
    s"""q AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
       |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * $scale) AS BIGINT) AS qv
       |  FROM embeddings),
       |${fitCte}c0 AS (
       |  SELECT p.cl, d.dim,
       |         CAST((2 * CAST('0x' || substr(md5('c|' || p.cl || '|' || d.dim), 1, 1) AS INTEGER) - 15) * $half AS BIGINT) AS c
       |  FROM range(0, $k) p(cl), range(1, 65) d(dim)),
       |$chain,
       |dF AS (
       |  SELECT q.vec_id, c.cl, SUM((q.qv - c.c) * (q.qv - c.c)) AS dist
       |  FROM q JOIN c$iters c ON q.dim = c.dim GROUP BY 1, 2),
       |af AS (
       |  SELECT vec_id, cl AS cluster FROM (
       |    SELECT vec_id, cl,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
       |    FROM dF) WHERE rn = 1)""".stripMargin
  }

  /** [[duckKmeansCtes]] generalized to a SUBSPACE: the same quantized
    * k-means replay over `embedding[offset+1 .. offset+subDims]`, every
    * CTE name suffixed so several subspace fits compose in one WITH —
    * the oracle for product quantization (each PQ codebook is one
    * KMeansQ fit on a contiguous slice). Ends with `af$sfx(vec_id,
    * cluster)`; the per-iteration centers are `c<i>$sfx`. */
  private def duckSubKmeansCtes(k: Int, iters: Int, scale: Long,
      subDims: Int, offset: Int, sfx: String,
      fitWhere: String = "", srcSql: String = ""): String = {
    val half = scale / 32
    // sampled fit (s27 at fitSampleRate < 1): iteration chain over
    // qfit$sfx, final per-vector codes still over the full q$sfx
    val fitSrc = if (fitWhere.isEmpty) s"q$sfx" else s"qfit$sfx"
    val fitCte =
      if (fitWhere.isEmpty) ""
      else s"qfit$sfx AS (SELECT * FROM q$sfx WHERE $fitWhere),\n"
    def distCte(i: Int, cPrev: String) =
      s"""d$i$sfx AS (
         |  SELECT q.vec_id, c.cl, SUM((q.qv - c.c) * (q.qv - c.c)) AS dist
         |  FROM $fitSrc q JOIN $cPrev c ON q.dim = c.dim GROUP BY 1, 2),
         |a$i$sfx AS (
         |  SELECT vec_id, cl AS cluster FROM (
         |    SELECT vec_id, cl,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
         |    FROM d$i$sfx) WHERE rn = 1)""".stripMargin
    def updateCte(i: Int, cPrev: String) =
      s"""m$i$sfx AS (
         |  SELECT a.cluster, q.dim, CAST(SUM(q.qv) AS BIGINT) AS s, COUNT(*) AS n
         |  FROM $fitSrc q JOIN a$i$sfx a USING (vec_id) GROUP BY 1, 2),
         |c$i$sfx AS (
         |  SELECT c.cl, c.dim, COALESCE(m.s // m.n, c.c) AS c
         |  FROM $cPrev c LEFT JOIN m$i$sfx m ON m.cluster = c.cl AND m.dim = c.dim)""".stripMargin
    val chain = (1 to iters).map(i =>
      distCte(i, s"c${i - 1}$sfx") + ",\n" + updateCte(i, s"c${i - 1}$sfx"))
      .mkString(",\n")
    // srcSql overrides the quantized-slice source — the residual-PQ fit
    // (s38) feeds the SAME iteration chain from a residual table instead
    // of a raw embedding slice; it must yield (vec_id, dim in 1..subDims,
    // qv) rows
    val srcBody = if (srcSql.nonEmpty) srcSql else
      s"""  SELECT e.vec_id, r.dim,
         |         CAST(round(CAST(e.embedding[r.dim + $offset] AS DOUBLE) * $scale) AS BIGINT) AS qv
         |  FROM embeddings e, range(1, ${subDims + 1}) r(dim)""".stripMargin
    s"""q$sfx AS (
       |$srcBody),
       |${fitCte}c0$sfx AS (
       |  SELECT p.cl, d.dim,
       |         CAST((2 * CAST('0x' || substr(md5('c|' || p.cl || '|' || d.dim), 1, 1) AS INTEGER) - 15) * $half AS BIGINT) AS c
       |  FROM range(0, $k) p(cl), range(1, ${subDims + 1}) d(dim)),
       |$chain,
       |af$sfx AS (
       |  SELECT vec_id, cl AS cluster FROM (
       |    SELECT q.vec_id, c.cl,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY SUM((q.qv - c.c) * (q.qv - c.c)), c.cl) AS rn
       |    FROM q$sfx q JOIN c$iters$sfx c ON q.dim = c.dim GROUP BY 1, 2)
       |  WHERE rn = 1)""".stripMargin
  }

  /** DuckDB twin of Sketches.hash60: first 15 hex chars of md5(expr),
    * folded base-16 (same value as Spark's conv(..., 16, 10)). */
  private def duckHash60(expr: String): String =
    s"""list_reduce(list_transform(string_split(substr(md5($expr), 1, 15), ''),
       |  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
       |  (a, b) -> a * 16 + b)""".stripMargin

  /** DuckDB twin of Sampling.hash48 (12 hex chars — exact in a double). */
  private def duckHash48(expr: String): String =
    s"""list_reduce(list_transform(string_split(substr(md5($expr), 1, 12), ''),
       |  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
       |  (a, b) -> a * 16 + b)""".stripMargin

  /** DuckDB oracle for the t34 BPE encode: each word becomes a
    * separator-wrapped symbol string (`␟t␟␟h␟␟e␟␟</w>␟`), the 24
    * [[graft.ops.Bpe.FixedMerges]] apply as rank-ordered replace() calls
    * (wrapping makes every match an exact symbol-pair occurrence, and
    * left-to-right non-overlapping replacement matches the merge
    * semantics), then per-doc token streams hash. Built FROM the constant
    * merge table, so the two sides cannot drift. */
  /** The rank-ordered replace chain over a separator-wrapped symbol
    * string for an arbitrary merge table — the SQL-expressible form of
    * BPE encoding (see t34's equivalence-law comment). Shared by the t34
    * (24 fixed merges) and t22 (106 corpus-trained merges) oracles. */
  private def bpeChainSql(merges: Seq[graft.ops.Bpe.Merge]): String = {
    val sep = "\u001f" // unit separator: absent from the documents corpus
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    // NOTE: no stripMargin anywhere near generated SQL — `||` at a line
    // start would lose a pipe to margin stripping
    val wrapped =
      s"list_aggregate(list_transform(string_split_regex(w, ''),\n" +
        s"      x -> ${lit(sep)} || x || ${lit(sep)}), 'string_agg', '') || " +
        lit(sep + graft.ops.Bpe.Eow + sep)
    merges.foldLeft(wrapped) { (acc, m) =>
      s"replace($acc,\n      ${lit(sep + m.a + sep + sep + m.b + sep)}, " +
        lit(sep + m.a + m.b + sep) + ")"
    }
  }

  /** t22's oracle, GENERATED from the frozen sf0.01-trained merge table
    * ([[graft.ops.Bpe.CorpusMergesSf001]]): per-doc token counts via the
    * replace chain, then the per-lang aggregate. The live query trains
    * from the corpus, so the sf0.01 hash-match proves the training loop
    * reproduces the frozen table — training itself is now hash-proven,
    * not just ScalaTest-pinned. LEFT JOIN keeps empty-text docs (0
    * tokens), matching the engine's encode-everything semantics.
    *
    * SF CONTRACT: this oracle is valid ONLY at the driver's correctness
    * scale factor (sf0.01) — at any other SF the live query trains a
    * DIFFERENT merge table and a hash mismatch here means "oracle frozen
    * at the wrong SF", not an engine defect. If the correctness SF ever
    * changes, regenerate the frozen table with `runMain
    * graft.tools.FreezeBpe <new-sf-dir>` and update
    * Bpe.CorpusMergesSf001. (t34 is the SF-independent sibling: its
    * FixedMerges table is constant at every scale.) */
  private def bpeT22OracleSql: String = {
    val sep = "\u001f"
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val chain = bpeChainSql(graft.ops.Bpe.CorpusMergesSf001)
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |), enc AS (
       |  SELECT doc_id,
       |    len(string_split(trim($chain, ${lit(sep)}), ${lit(sep + sep)})) AS n_tok
       |  FROM words WHERE length(w) > 0
       |), per_doc AS (
       |  SELECT doc_id, sum(n_tok) AS n_tokens FROM enc GROUP BY doc_id
       |)
       |SELECT d.lang, count(*) AS n_docs,
       |       CAST(sum(coalesce(p.n_tokens, 0)) AS BIGINT) AS total_bpe_tokens,
       |       CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
       |       round(CAST(sum(d.n_chars) AS DOUBLE)
       |             / CAST(sum(coalesce(p.n_tokens, 0)) AS DOUBLE), 3) AS chars_per_token
       |FROM documents d LEFT JOIN per_doc p USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  private def bpeEncodeOracleSql: String = {
    val sep = "\u001f"
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val replaced = bpeChainSql(graft.ops.Bpe.FixedMerges)
    s"""WITH words AS (
       |  SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
       |), enc AS (
       |  SELECT doc_id, i,
       |    replace(trim($replaced, ${lit(sep)}), ${lit(sep + sep)}, ' ') AS tokstr
       |  FROM words WHERE length(w) > 0
       |), streams AS (
       |  SELECT doc_id, string_agg(tokstr, ' ' ORDER BY i) AS stream
       |  FROM enc GROUP BY doc_id
       |)
       |SELECT doc_id, CAST(len(string_split(stream, ' ')) AS BIGINT) AS n_tokens,
       |       md5(stream) AS stream_md5
       |FROM streams ORDER BY doc_id""".stripMargin
  }

  /** s38/s42/s43 shared oracle: the whole IVFPQ composition (coarse fit,
    * residual codebook fits, codes, probes, per-cell ADC tables, exact
    * refine) as one DuckDB CTE chain. The persisted-layout path (s42)
    * must hash-match it exactly: build+query never changes the math.
    * `fitWhere` restricts the FIT inputs (coarse + every residual
    * codebook) to a subset while assignment/codes still cover the full
    * corpus — the incremental-append path (s43: build on half, append
    * the rest under the frozen model) replays as exactly that. */
  /** The four residual-subspace codebook fits of the IVFPQ oracle (each
    * ends in centers `c1_<i>`), shared by the search chain and the s45
    * drift monitor. */
  private def ivfpqSubFits(fitWhere: String): String =
    (0 until 4).map { i =>
      val off = i * 16
      duckSubKmeansCtes(k = 8, iters = 1, scale = 1000000L,
        subDims = 16, offset = off, sfx = s"_$i", fitWhere = fitWhere,
        srcSql = s"""  SELECT vec_id, dim - $off AS dim, rv AS qv
                    |  FROM res WHERE dim > $off AND dim <= ${off + 16}"""
          .stripMargin)
    }.mkString(",\n")

  private def ivfpqOracleSql(fitWhere: String = ""): String = {
        val subFits = ivfpqSubFits(fitWhere)
        val qds = (0 until 4).map { i =>
          val off = i * 16
          s"""qd$i AS (
             |  SELECT r.q, r.pcl, cb.cl,
             |         CAST(SUM((r.rv - cb.c) * (r.rv - cb.c)) AS BIGINT) AS d
             |  FROM qres r JOIN c1_$i cb ON cb.dim = r.dim - $off
             |  WHERE r.dim > $off AND r.dim <= ${off + 16}
             |  GROUP BY 1, 2, 3)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${duckKmeansCtes(k = 4, iters = 2, scale = 1000000L,
                fitWhere = fitWhere)},
           |res AS (
           |  SELECT q.vec_id, q.dim, q.qv - c.c AS rv
           |  FROM q JOIN af a USING (vec_id)
           |  JOIN c2 c ON c.cl = a.cluster AND c.dim = q.dim),
           |$subFits,
           |codes AS (
           |  SELECT a.vec_id, a.cluster AS cell, a0.cluster AS k0,
           |         a1.cluster AS k1, a2.cluster AS k2, a3.cluster AS k3
           |  FROM af a JOIN af_0 a0 USING (vec_id) JOIN af_1 a1 USING (vec_id)
           |       JOIN af_2 a2 USING (vec_id) JOIN af_3 a3 USING (vec_id)),
           |qcs AS (
           |  SELECT q.vec_id, c.cl, SUM((q.qv - c.c) * (q.qv - c.c)) AS d
           |  FROM q JOIN c2 c ON q.dim = c.dim
           |  WHERE q.vec_id < 5 GROUP BY 1, 2),
           |probes AS (
           |  SELECT vec_id AS q, cl FROM (
           |    SELECT vec_id, cl,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
           |    FROM qcs) WHERE rn <= 2),
           |qres AS (
           |  SELECT p.q, p.cl AS pcl, q.dim, q.qv - c.c AS rv
           |  FROM probes p JOIN q ON q.vec_id = p.q
           |  JOIN c2 c ON c.cl = p.cl AND c.dim = q.dim),
           |$qds,
           |scored AS (
           |  SELECT p.q, v.vec_id AS v, d0.d + d1.d + d2.d + d3.d AS adc
           |  FROM codes v
           |  JOIN probes p ON p.cl = v.cell AND p.q <> v.vec_id
           |  JOIN qd0 d0 ON d0.q = p.q AND d0.pcl = p.cl AND d0.cl = v.k0
           |  JOIN qd1 d1 ON d1.q = p.q AND d1.pcl = p.cl AND d1.cl = v.k1
           |  JOIN qd2 d2 ON d2.q = p.q AND d2.pcl = p.cl AND d2.cl = v.k2
           |  JOIN qd3 d3 ON d3.q = p.q AND d3.pcl = p.cl AND d3.cl = v.k3),
           |sl AS (
           |  SELECT q, v FROM (
           |    SELECT q, v, row_number() OVER (PARTITION BY q ORDER BY adc, v) AS rank
           |    FROM scored) WHERE rank <= 10),
           |qfull AS (
           |  SELECT e.vec_id, r.dim,
           |         CAST(round(CAST(e.embedding[r.dim] AS DOUBLE) * 1000000) AS BIGINT) AS qv
           |  FROM embeddings e, range(1, 65) r(dim)),
           |ref AS (
           |  SELECT s.q, s.v, CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d2
           |  FROM sl s JOIN qfull a ON a.vec_id = s.q
           |  JOIN qfull b ON b.vec_id = s.v AND b.dim = a.dim
           |  GROUP BY 1, 2),
           |rr AS (
           |  SELECT q, v, d2,
           |         row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rank
           |  FROM ref)
           |SELECT q, rank, v, d2 FROM rr WHERE rank <= 5 ORDER BY q, rank""".stripMargin
  }

  override def entries: Seq[QueryDef] = Seq(

    // ---- similarity search ---------------------------------------------
    QueryDef(
      "s5_ann_bruteforce",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), k = 10)
          .orderBy(col("q"), col("rank"))
      },
      Some(
        s"""WITH j AS (
           |  SELECT q.vec_id AS q, v.vec_id AS v,
           |         ${duckCosine("q.embedding", "v.embedding")} AS c
           |  FROM embeddings q JOIN embeddings v ON q.vec_id < 5 AND q.vec_id <> v.vec_id),
           |r AS (
           |  SELECT q, v, c,
           |         row_number() OVER (PARTITION BY q ORDER BY round(c, 6) DESC, v) AS rank
           |  FROM j)
           |SELECT q, rank, v, round(c, 4) AS cos_sim
           |FROM r WHERE rank <= 10 ORDER BY q, rank""".stripMargin)),

    QueryDef(
      "s6_ann_lsh",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.lshTopK(e, e.where(col("vec_id") < 5), k = 5, planes = 4)
          .orderBy(col("q"), col("rank"))
      },
      Some(
        s"""WITH b AS (
           |  SELECT vec_id, embedding, ${duckSignature("embedding", 4)} AS bucket
           |  FROM embeddings),
           |j AS (
           |  SELECT q.vec_id AS q, v.vec_id AS v,
           |         ${duckCosine("q.embedding", "v.embedding")} AS c
           |  FROM b q JOIN b v ON q.bucket = v.bucket
           |   AND q.vec_id < 5 AND q.vec_id <> v.vec_id),
           |r AS (
           |  SELECT q, v, c,
           |         row_number() OVER (PARTITION BY q ORDER BY round(c, 6) DESC, v) AS rank
           |  FROM j)
           |SELECT q, rank, v, round(c, 4) AS cos_sim
           |FROM r WHERE rank <= 5 ORDER BY q, rank""".stripMargin)),

    // ANN RECALL AUDIT — the evaluation every approximate index needs
    // before it replaces the exact scan: per probe, |LSH top-k ∩ brute
    // top-k| / k, plus the bucket's candidate count (the speedup side of
    // the trade). Both rankings are the s5/s6 pipelines verbatim, so this
    // quantifies in-engine the approximation the suite otherwise only
    // spot-checks; the oracle recomputes both and intersects them.
    QueryDef(
      "s32_ann_recall",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val probes = e.where(col("vec_id") < 5)
        val brute = Similarity.bruteForceTopK(e, probes, k = 10)
          .select(col("q"), col("v"))
        val lsh = Similarity.lshTopK(e, probes, k = 10, planes = 4)
          .select(col("q"), col("v"), lit(1).as("hit"))
        val cand = e.select(col("vec_id"),
            Similarity.lshSignature(col("embedding"), 4, 64).as("bucket"))
        val nCand = cand.where(col("vec_id") < 5)
          .select(col("vec_id").as("q"), col("bucket"))
          .join(cand.select(col("vec_id").as("v"), col("bucket")), Seq("bucket"))
          .where(col("q") =!= col("v"))
          .groupBy(col("q")).agg(count(lit(1)).as("n_candidates"))
        brute.join(lsh, Seq("q", "v"), "left")
          .groupBy(col("q"))
          .agg((sum(coalesce(col("hit"), lit(0))) / 10.0).as("recall_at_10"))
          .join(nCand, Seq("q"))
          .orderBy(col("q"))
      },
      Some(
        s"""WITH b AS (
           |  SELECT vec_id, embedding, ${duckSignature("embedding", 4)} AS bucket
           |  FROM embeddings),
           |bj AS (
           |  SELECT q.vec_id AS q, v.vec_id AS v,
           |         ${duckCosine("q.embedding", "v.embedding")} AS c
           |  FROM embeddings q JOIN embeddings v
           |    ON q.vec_id < 5 AND q.vec_id <> v.vec_id),
           |brute AS (
           |  SELECT q, v FROM (
           |    SELECT q, v, row_number() OVER (PARTITION BY q
           |      ORDER BY round(c, 6) DESC, v) AS rank FROM bj)
           |  WHERE rank <= 10),
           |lj AS (
           |  SELECT q.vec_id AS q, v.vec_id AS v,
           |         ${duckCosine("q.embedding", "v.embedding")} AS c
           |  FROM b q JOIN b v ON q.bucket = v.bucket
           |   AND q.vec_id < 5 AND q.vec_id <> v.vec_id),
           |lsh AS (
           |  SELECT q, v FROM (
           |    SELECT q, v, row_number() OVER (PARTITION BY q
           |      ORDER BY round(c, 6) DESC, v) AS rank FROM lj)
           |  WHERE rank <= 10),
           |cand AS (
           |  SELECT p.vec_id AS q, count(*) AS n_candidates
           |  FROM b p JOIN b v ON p.bucket = v.bucket
           |   AND p.vec_id < 5 AND p.vec_id <> v.vec_id
           |  GROUP BY 1)
           |SELECT br.q,
           |       SUM(CASE WHEN l.v IS NOT NULL THEN 1 ELSE 0 END) / 10.0
           |         AS recall_at_10,
           |       any_value(c.n_candidates) AS n_candidates
           |FROM brute br
           |LEFT JOIN lsh l ON l.q = br.q AND l.v = br.v
           |JOIN cand c ON c.q = br.q
           |GROUP BY br.q ORDER BY br.q""".stripMargin)),

    // Filtered ANN on the IVF path: the s31 filter-then-search discipline
    // applied to the coarse-quantizer index. The metadata predicate is
    // applied BELOW the cell probe — it reaches the corpus parquet scan
    // (PlanSpec asserts PushedFilters) and non-matching vectors are never
    // quantized, cell-assigned, or scored. Assignment is a per-vector map
    // with plan-literal centers, so filtering before assignment yields
    // identical cells for survivors — which is what makes the DuckDB
    // oracle (full-corpus assignment CTE, then the predicate at candidate
    // time) replay it exactly.
    QueryDef(
      "s33_filtered_ivf_ann",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.ivfqTopKFiltered(e, e.where(col("vec_id") < 3), k = 5,
            corpusFilter = col("label").isin(2, 5) && col("vec_id") >= 3,
            keep = Seq("label"), fitSampleRate = 0.5)
          .orderBy(col("q"), col("rank"))
      },
      Some(
        s"""WITH ${duckKmeansCtes(k = 4, iters = 2, scale = 1000000L,
               fitWhere = duckSampleWhere(0.5))},
           |qs AS (
           |  SELECT q.vec_id, c.cl, SUM((q.qv - c.c) * (q.qv - c.c)) AS d
           |  FROM q q JOIN c2 c ON q.dim = c.dim
           |  WHERE q.vec_id < 3 GROUP BY 1, 2),
           |probe AS (
           |  SELECT vec_id, cl FROM (
           |    SELECT vec_id, cl,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
           |    FROM qs) WHERE rn <= 2),
           |cand AS (
           |  SELECT p.vec_id AS q, a.vec_id AS v, em.label
           |  FROM probe p
           |  JOIN af a ON a.cluster = p.cl AND a.vec_id <> p.vec_id
           |  JOIN embeddings em ON em.vec_id = a.vec_id
           |  WHERE em.label IN (2, 5) AND em.vec_id >= 3),
           |jx AS (
           |  SELECT cand.q, cand.v, cand.label,
           |         ${duckCosine("qe.embedding", "ve.embedding")} AS c
           |  FROM cand JOIN embeddings qe ON qe.vec_id = cand.q
           |            JOIN embeddings ve ON ve.vec_id = cand.v),
           |r AS (
           |  SELECT q, v, label, c,
           |         row_number() OVER (PARTITION BY q ORDER BY round(c, 6) DESC, v) AS rank
           |  FROM jx)
           |SELECT q, rank, v, label, round(c, 4) AS cos_sim
           |FROM r WHERE rank <= 5 ORDER BY q, rank""".stripMargin)),

    // SQ8 quantized ANN: int8 scalar quantization (FAISS-SQ shape) cuts
    // vector bytes 4x — at 100 TB the brute-force scan is bandwidth-bound,
    // so the quantized scan reads a quarter of the data. The quantized
    // cosine uses only integer sums (per-vector scales cancel), which is
    // order-independent exact arithmetic: the approximate score itself is
    // hash-checkable against DuckDB, not just "roughly right".
    QueryDef(
      "s21_sq8_ann",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.sq8TopK(e, e.where(col("vec_id") < 5), k = 10)
          .orderBy(col("q"), col("rank"))
      },
      Some(
        """WITH sc AS (
          |  SELECT vec_id, embedding,
          |         greatest(list_max(list_transform(embedding,
          |           y -> abs(CAST(y AS DOUBLE)))), 1e-12) / 127.0 AS s
          |  FROM embeddings),
          |qz AS (
          |  SELECT vec_id,
          |         list_transform(embedding,
          |           x -> CAST(round(CAST(x AS DOUBLE) / s) AS BIGINT)) AS qvec
          |  FROM sc),
          |n AS (
          |  SELECT vec_id, qvec,
          |         sqrt(CAST(list_reduce(list_transform(qvec, x -> x * x),
          |           (a, b) -> a + b) AS DOUBLE)) AS nrm
          |  FROM qz),
          |j AS (
          |  SELECT q.vec_id AS q, v.vec_id AS v,
          |         CAST(list_reduce(list_transform(generate_series(1, len(q.qvec)),
          |                i -> q.qvec[i] * v.qvec[i]), (a, b) -> a + b) AS DOUBLE)
          |           / (q.nrm * v.nrm) AS c
          |  FROM n q JOIN n v ON q.vec_id < 5 AND q.vec_id <> v.vec_id),
          |r AS (
          |  SELECT q, v, c,
          |         row_number() OVER (PARTITION BY q ORDER BY round(c, 6) DESC, v) AS rank
          |  FROM j)
          |SELECT q, rank, v, round(c, 4) AS cos_q
          |FROM r WHERE rank <= 10 ORDER BY q, rank""".stripMargin)),

    // PRODUCT-QUANTIZATION ANN (the FAISS PQ shape minus IVF): 4 subspace
    // codebooks fit with the deterministic integer k-means, the corpus
    // scanned as 4 codes/vector (64x fewer bytes than the floats), queries
    // broadcast with per-subspace exact-integer distance tables, scoring =
    // 4 lookups + adds. The oracle replays ALL FOUR codebook fits, the
    // encoding, and the ADC scores — bit-exact integer arithmetic end to
    // end, so the approximation itself is hash-proven, not eyeballed.
    QueryDef(
      "s27_pq_ann",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.pqTopK(e, e.where(col("vec_id") < 5), k = 10,
            fitSampleRate = 0.5)
          .orderBy(col("q"), col("rank"))
      },
      Some {
        val fits = (0 until 4).map(i =>
          duckSubKmeansCtes(k = 8, iters = 1, scale = 1000000L,
            subDims = 16, offset = i * 16, sfx = s"_$i",
            fitWhere = duckSampleWhere(0.5))).mkString(",\n")
        val qds = (0 until 4).map(i =>
          s"""qd$i AS (
             |  SELECT q.vec_id, c.cl, CAST(SUM((q.qv - c.c) * (q.qv - c.c)) AS BIGINT) AS d
             |  FROM q_$i q JOIN c1_$i c ON q.dim = c.dim
             |  WHERE q.vec_id < 5 GROUP BY 1, 2)""".stripMargin).mkString(",\n")
        s"""WITH $fits,
           |codes AS (
           |  SELECT a0.vec_id, a0.cluster AS k0, a1.cluster AS k1,
           |         a2.cluster AS k2, a3.cluster AS k3
           |  FROM af_0 a0 JOIN af_1 a1 USING (vec_id)
           |       JOIN af_2 a2 USING (vec_id) JOIN af_3 a3 USING (vec_id)),
           |$qds,
           |scored AS (
           |  SELECT d0.vec_id AS q, v.vec_id AS v,
           |         d0.d + d1.d + d2.d + d3.d AS adc
           |  FROM codes v
           |  JOIN qd0 d0 ON d0.cl = v.k0
           |  JOIN qd1 d1 ON d1.cl = v.k1 AND d1.vec_id = d0.vec_id
           |  JOIN qd2 d2 ON d2.cl = v.k2 AND d2.vec_id = d0.vec_id
           |  JOIN qd3 d3 ON d3.cl = v.k3 AND d3.vec_id = d0.vec_id
           |  WHERE v.vec_id <> d0.vec_id),
           |r AS (
           |  SELECT q, v, adc,
           |         row_number() OVER (PARTITION BY q ORDER BY adc, v) AS rank
           |  FROM scored)
           |SELECT q, rank, v, adc FROM r WHERE rank <= 10 ORDER BY q, rank""".stripMargin
      }),

    // PQ + EXACT REFINE (the FAISS RefineFlat recipe): stage 1 is s27's
    // compressed ADC scan retrieving kCand=10 candidates per query; stage
    // 2 re-ranks ONLY those rows with the exact quantized-integer squared
    // distance over the full 64-dim vectors (BIGINT Σ(a−b)² — L2SqLong),
    // keeping top-5. The oracle replays the codebook fits, the ADC
    // shortlist, AND the integer refine — the two-stage result is
    // hash-proven end to end, recall recovered at kCand/corpus of the
    // exact-distance cost.
    QueryDef(
      "s34_pq_refine_ann",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.pqRefineTopK(e, e.where(col("vec_id") < 5), k = 5,
            kCand = 10, fitSampleRate = 0.5)
          .orderBy(col("q"), col("rank"))
      },
      Some {
        val fits = (0 until 4).map(i =>
          duckSubKmeansCtes(k = 8, iters = 1, scale = 1000000L,
            subDims = 16, offset = i * 16, sfx = s"_$i",
            fitWhere = duckSampleWhere(0.5))).mkString(",\n")
        val qds = (0 until 4).map(i =>
          s"""qd$i AS (
             |  SELECT q.vec_id, c.cl, CAST(SUM((q.qv - c.c) * (q.qv - c.c)) AS BIGINT) AS d
             |  FROM q_$i q JOIN c1_$i c ON q.dim = c.dim
             |  WHERE q.vec_id < 5 GROUP BY 1, 2)""".stripMargin).mkString(",\n")
        s"""WITH $fits,
           |codes AS (
           |  SELECT a0.vec_id, a0.cluster AS k0, a1.cluster AS k1,
           |         a2.cluster AS k2, a3.cluster AS k3
           |  FROM af_0 a0 JOIN af_1 a1 USING (vec_id)
           |       JOIN af_2 a2 USING (vec_id) JOIN af_3 a3 USING (vec_id)),
           |$qds,
           |scored AS (
           |  SELECT d0.vec_id AS q, v.vec_id AS v,
           |         d0.d + d1.d + d2.d + d3.d AS adc
           |  FROM codes v
           |  JOIN qd0 d0 ON d0.cl = v.k0
           |  JOIN qd1 d1 ON d1.cl = v.k1 AND d1.vec_id = d0.vec_id
           |  JOIN qd2 d2 ON d2.cl = v.k2 AND d2.vec_id = d0.vec_id
           |  JOIN qd3 d3 ON d3.cl = v.k3 AND d3.vec_id = d0.vec_id
           |  WHERE v.vec_id <> d0.vec_id),
           |sl AS (
           |  SELECT q, v FROM (
           |    SELECT q, v, row_number() OVER (PARTITION BY q ORDER BY adc, v) AS rank
           |    FROM scored) WHERE rank <= 10),
           |qfull AS (
           |  SELECT e.vec_id, r.dim,
           |         CAST(round(CAST(e.embedding[r.dim] AS DOUBLE) * 1000000) AS BIGINT) AS qv
           |  FROM embeddings e, range(1, 65) r(dim)),
           |ref AS (
           |  SELECT s.q, s.v, CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d2
           |  FROM sl s JOIN qfull a ON a.vec_id = s.q
           |  JOIN qfull b ON b.vec_id = s.v AND b.dim = a.dim
           |  GROUP BY 1, 2),
           |rr AS (
           |  SELECT q, v, d2,
           |         row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rank
           |  FROM ref)
           |SELECT q, rank, v, d2 FROM rr WHERE rank <= 5 ORDER BY q, rank""".stripMargin
      }),

    // REFINE-RECALL AUDIT (completes the s32 pattern for the two-stage
    // path): per query, top-5 recall of the raw ADC ranking vs the
    // refined ranking, both against the EXACT quantized-integer ground
    // truth — the number that justifies paying the refine stage. On this
    // fixture ADC alone recalls 0–0.2 while re-ranking a 50-of-500
    // shortlist (10% of the corpus at full-vector cost) lifts it to
    // 0.2–0.8 — the quantization error lives in the RANKING, not the
    // candidate set, which is exactly what RefineFlat exploits. Every
    // leg is replayed relationally, so the audit itself is hash-proven.
    QueryDef(
      "s35_refine_recall",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val probes = e.where(col("vec_id") < 5)
        val qv = org.apache.spark.sql.graft.QuantOps
        val exW = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q")).orderBy(col("d2"), col("v"))
        val exact = probes.select(col("vec_id").as("q"),
            qv.quantize(col("embedding"), 64, 1000000L).as("qa"))
          .crossJoin(e.select(col("vec_id").as("v"),
            qv.quantize(col("embedding"), 64, 1000000L).as("qb")))
          .where(col("q") =!= col("v"))
          .withColumn("d2", qv.l2sq(col("qa"), col("qb")))
          // same mandatory guard as pqRefineTopK: ascending NULLS FIRST
          // would crown a malformed/overflowed vector the nearest neighbor
          .where(col("d2").isNotNull)
          .withColumn("rank", row_number().over(exW))
          .where(col("rank") <= 5)
          .select(col("q"), col("v"))
        val adc = Similarity.pqTopK(e, probes, k = 5, fitSampleRate = 0.5)
          .select(col("q"), col("v"), lit(1).as("hit_a"))
        val ref = Similarity.pqRefineTopK(e, probes, k = 5, kCand = 50,
            fitSampleRate = 0.5)
          .select(col("q"), col("v"), lit(1).as("hit_r"))
        exact.join(adc, Seq("q", "v"), "left")
          .join(ref, Seq("q", "v"), "left")
          .groupBy(col("q"))
          .agg((sum(coalesce(col("hit_a"), lit(0))) / 5.0).as("recall_adc"),
            (sum(coalesce(col("hit_r"), lit(0))) / 5.0).as("recall_refined"))
          .orderBy(col("q"))
      },
      Some {
        val fits = (0 until 4).map(i =>
          duckSubKmeansCtes(k = 8, iters = 1, scale = 1000000L,
            subDims = 16, offset = i * 16, sfx = s"_$i",
            fitWhere = duckSampleWhere(0.5))).mkString(",\n")
        val qds = (0 until 4).map(i =>
          s"""qd$i AS (
             |  SELECT q.vec_id, c.cl, CAST(SUM((q.qv - c.c) * (q.qv - c.c)) AS BIGINT) AS d
             |  FROM q_$i q JOIN c1_$i c ON q.dim = c.dim
             |  WHERE q.vec_id < 5 GROUP BY 1, 2)""".stripMargin).mkString(",\n")
        s"""WITH $fits,
           |codes AS (
           |  SELECT a0.vec_id, a0.cluster AS k0, a1.cluster AS k1,
           |         a2.cluster AS k2, a3.cluster AS k3
           |  FROM af_0 a0 JOIN af_1 a1 USING (vec_id)
           |       JOIN af_2 a2 USING (vec_id) JOIN af_3 a3 USING (vec_id)),
           |$qds,
           |scored AS (
           |  SELECT d0.vec_id AS q, v.vec_id AS v,
           |         d0.d + d1.d + d2.d + d3.d AS adc
           |  FROM codes v
           |  JOIN qd0 d0 ON d0.cl = v.k0
           |  JOIN qd1 d1 ON d1.cl = v.k1 AND d1.vec_id = d0.vec_id
           |  JOIN qd2 d2 ON d2.cl = v.k2 AND d2.vec_id = d0.vec_id
           |  JOIN qd3 d3 ON d3.cl = v.k3 AND d3.vec_id = d0.vec_id
           |  WHERE v.vec_id <> d0.vec_id),
           |ranked AS (
           |  SELECT q, v, row_number() OVER (PARTITION BY q ORDER BY adc, v) AS rank
           |  FROM scored),
           |adc5 AS (SELECT q, v FROM ranked WHERE rank <= 5),
           |sl AS (SELECT q, v FROM ranked WHERE rank <= 50),
           |qfull AS (
           |  SELECT e.vec_id, r.dim,
           |         CAST(round(CAST(e.embedding[r.dim] AS DOUBLE) * 1000000) AS BIGINT) AS qv
           |  FROM embeddings e, range(1, 65) r(dim)),
           |refd AS (
           |  SELECT s.q, s.v, SUM((a.qv - b.qv) * (a.qv - b.qv)) AS d2
           |  FROM sl s JOIN qfull a ON a.vec_id = s.q
           |  JOIN qfull b ON b.vec_id = s.v AND b.dim = a.dim
           |  GROUP BY 1, 2),
           |ref5 AS (
           |  SELECT q, v FROM (
           |    SELECT q, v, row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rank
           |    FROM refd) WHERE rank <= 5),
           |ex AS (
           |  SELECT a.vec_id AS q, b.vec_id AS v,
           |         SUM((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS d2
           |  FROM embeddings a JOIN embeddings b
           |    ON a.vec_id < 5 AND b.vec_id <> a.vec_id
           |  JOIN qfull qa ON qa.vec_id = a.vec_id
           |  JOIN qfull qb ON qb.vec_id = b.vec_id AND qb.dim = qa.dim
           |  GROUP BY 1, 2),
           |exact AS (
           |  SELECT q, v FROM (
           |    SELECT q, v, row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rank
           |    FROM ex) WHERE rank <= 5)
           |SELECT e.q,
           |       SUM(CASE WHEN a.v IS NOT NULL THEN 1 ELSE 0 END) / 5.0 AS recall_adc,
           |       SUM(CASE WHEN r.v IS NOT NULL THEN 1 ELSE 0 END) / 5.0 AS recall_refined
           |FROM exact e
           |LEFT JOIN adc5 a ON a.q = e.q AND a.v = e.v
           |LEFT JOIN ref5 r ON r.q = e.q AND r.v = e.v
           |GROUP BY e.q ORDER BY e.q""".stripMargin
      }),

    // MMR-DIVERSIFIED retrieval (Carbonell & Goldstein 1998): after the
    // top-20 relevance shortlist, 5 greedy rounds of
    // `λ·rel − (1−λ)·max_sim(picked)` pick the answer set — near-dup
    // results can't crowd it. Everything runs in the quantized INTEGER
    // domain with cross-multiplied λ = 7/10, ties to the smallest id, so
    // the ENTIRE greedy trajectory (shortlist, candidate-pair distances,
    // all five argmax rounds) replays in DuckDB as unrolled CTEs — the
    // KMeansQ iteration-chain discipline applied to greedy selection.
    // Post-shortlist cost is queries × kCand² pairs per round, corpus-
    // size-independent.
    QueryDef(
      "s37_mmr_diversified",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.mmrTopK(e, e.where(col("vec_id") < 5), k = 5,
          kCand = 20, lambdaNum = 7, lambdaDen = 10)
          .orderBy(col("q"), col("round"))
      },
      Some {
        val rounds = (2 to 5).map { i =>
          s"""p$i AS (SELECT q, $i AS round, v FROM (
             |  SELECT c.q, c.v,
             |         row_number() OVER (PARTITION BY c.q
             |           ORDER BY (-7 * c.rel + 3 * m.min_d) DESC, c.v) AS rn
             |  FROM cands c
             |  JOIN (SELECT pd.q, pd.d AS v, min(pd.dist) AS min_d
             |        FROM pd JOIN s${i - 1} sp
             |          ON sp.q = pd.q AND sp.v = pd.s
             |        GROUP BY 1, 2) m ON m.q = c.q AND m.v = c.v
             |  WHERE NOT EXISTS (SELECT 1 FROM s${i - 1} sx
             |                    WHERE sx.q = c.q AND sx.v = c.v)
             |  ) WHERE rn = 1),
             |s$i AS (SELECT * FROM s${i - 1} UNION ALL SELECT * FROM p$i)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH qfull AS (
           |  SELECT e.vec_id, r.dim,
           |         CAST(round(CAST(e.embedding[r.dim] AS DOUBLE) * 1000000)
           |              AS BIGINT) AS qv
           |  FROM embeddings e, range(1, 65) r(dim)),
           |relv AS (
           |  SELECT a.vec_id AS q, b.vec_id AS v,
           |         SUM((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS rel
           |  FROM embeddings a
           |  JOIN embeddings b ON a.vec_id < 5 AND b.vec_id <> a.vec_id
           |  JOIN qfull qa ON qa.vec_id = a.vec_id
           |  JOIN qfull qb ON qb.vec_id = b.vec_id AND qb.dim = qa.dim
           |  GROUP BY 1, 2),
           |cands AS (
           |  SELECT q, v, rel FROM (
           |    SELECT q, v, rel,
           |           row_number() OVER (PARTITION BY q ORDER BY rel, v) AS rn
           |    FROM relv) WHERE rn <= 20),
           |pd AS (
           |  SELECT a.q, a.v AS d, b.v AS s,
           |         SUM((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS dist
           |  FROM cands a JOIN cands b ON a.q = b.q AND a.v <> b.v
           |  JOIN qfull qa ON qa.vec_id = a.v
           |  JOIN qfull qb ON qb.vec_id = b.v AND qb.dim = qa.dim
           |  GROUP BY 1, 2, 3),
           |s1 AS (SELECT q, 1 AS round, v FROM (
           |  SELECT q, v, row_number() OVER (PARTITION BY q ORDER BY rel, v) AS rn
           |  FROM cands) WHERE rn = 1),
           |$rounds
           |SELECT q, round, v FROM s5 ORDER BY q, round""".stripMargin
      }),

    // HARD-NEGATIVE MINING (the DPR/contrastive triplet recipe,
    // Karpukhin et al. 2020): per anchor, exact integer distances split
    // candidates into near-dups (excluded — a verbatim copy is a false
    // positive for contrastive loss), the positive band (nearest wins),
    // and the k closest HARD negatives beyond it — close enough to be
    // hard, far enough to be wrong. Thresholds are data-scale constants
    // on the quantized d² axis; the fixture places some anchors' nearest
    // neighbor INSIDE the dup band, so the exclusion path runs. The
    // oracle replays the banding relationally; every row hash-matches.
    QueryDef(
      "s40_hard_negatives",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.hardNegatives(e, e.where(col("vec_id") < 5), k = 3,
            dupMaxD2 = 1250000000000L, posMaxD2 = 1700000000000L)
          .orderBy(col("q"), col("role"), col("rank"))
      },
      Some(
        """WITH qfull AS (
          |  SELECT e.vec_id, r.dim,
          |         CAST(round(CAST(e.embedding[r.dim] AS DOUBLE) * 1000000) AS BIGINT) AS qv
          |  FROM embeddings e, range(1, 65) r(dim)),
          |d AS (
          |  SELECT a.vec_id AS q, b.vec_id AS v,
          |         CAST(SUM((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS BIGINT) AS d2
          |  FROM embeddings a
          |  JOIN embeddings b ON a.vec_id < 5 AND b.vec_id <> a.vec_id
          |  JOIN qfull qa ON qa.vec_id = a.vec_id
          |  JOIN qfull qb ON qb.vec_id = b.vec_id AND qb.dim = qa.dim
          |  GROUP BY 1, 2
          |  HAVING SUM((qa.qv - qb.qv) * (qa.qv - qb.qv)) > 1250000000000),
          |pos AS (
          |  SELECT q, 'positive' AS role, 1 AS rank, v, d2 FROM (
          |    SELECT q, v, d2,
          |           row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rn
          |    FROM d WHERE d2 <= 1700000000000) WHERE rn = 1),
          |negs AS (
          |  SELECT q, 'negative' AS role, rn AS rank, v, d2 FROM (
          |    SELECT q, v, d2,
          |           row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rn
          |    FROM d WHERE d2 > 1700000000000) WHERE rn <= 3)
          |SELECT q, role, rank, v, d2 FROM pos
          |UNION ALL SELECT q, role, rank, v, d2 FROM negs
          |ORDER BY q, role, rank""".stripMargin)),

    // HARD NEGATIVES OVER A PQ+REFINE SHORTLIST — s40's estate-scale
    // form (the s39 composition discipline): stage 1 is the two-stage
    // compressed search (ADC top-40, exact integer refine to top-20),
    // stage 2 bands THAT pool into near-dups / positive / hard negatives
    // — the corpus pays only the code scan, never a per-anchor exact
    // pass, and the shortlist broadcasts onto one corpus scan (PlanSpec:
    // no cartesian). d² is recomputed BIGINT-exact on the pool, so the
    // whole composition — codebook fits, ADC, refine, banding —
    // hash-replays as one CTE chain.
    QueryDef(
      "s41_hard_negatives_refined",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val anchors = e.where(col("vec_id") < 5)
        val sl = Similarity.pqRefineTopK(e, anchors, k = 20, kCand = 40,
          fitSampleRate = 0.5).select(col("q"), col("v"))
        Similarity.hardNegatives(e, anchors, k = 3,
            dupMaxD2 = 1250000000000L, posMaxD2 = 1700000000000L,
            shortlist = Some(sl))
          .orderBy(col("q"), col("role"), col("rank"))
      },
      Some {
        val fits = (0 until 4).map(i =>
          duckSubKmeansCtes(k = 8, iters = 1, scale = 1000000L,
            subDims = 16, offset = i * 16, sfx = s"_$i",
            fitWhere = duckSampleWhere(0.5))).mkString(",\n")
        val qds = (0 until 4).map(i =>
          s"""qd$i AS (
             |  SELECT q.vec_id, c.cl, CAST(SUM((q.qv - c.c) * (q.qv - c.c)) AS BIGINT) AS d
             |  FROM q_$i q JOIN c1_$i c ON q.dim = c.dim
             |  WHERE q.vec_id < 5 GROUP BY 1, 2)""".stripMargin).mkString(",\n")
        s"""WITH $fits,
           |codes AS (
           |  SELECT a0.vec_id, a0.cluster AS k0, a1.cluster AS k1,
           |         a2.cluster AS k2, a3.cluster AS k3
           |  FROM af_0 a0 JOIN af_1 a1 USING (vec_id)
           |       JOIN af_2 a2 USING (vec_id) JOIN af_3 a3 USING (vec_id)),
           |$qds,
           |scored AS (
           |  SELECT d0.vec_id AS q, v.vec_id AS v,
           |         d0.d + d1.d + d2.d + d3.d AS adc
           |  FROM codes v
           |  JOIN qd0 d0 ON d0.cl = v.k0
           |  JOIN qd1 d1 ON d1.cl = v.k1 AND d1.vec_id = d0.vec_id
           |  JOIN qd2 d2 ON d2.cl = v.k2 AND d2.vec_id = d0.vec_id
           |  JOIN qd3 d3 ON d3.cl = v.k3 AND d3.vec_id = d0.vec_id
           |  WHERE v.vec_id <> d0.vec_id),
           |sl AS (
           |  SELECT q, v FROM (
           |    SELECT q, v, row_number() OVER (PARTITION BY q ORDER BY adc, v) AS rank
           |    FROM scored) WHERE rank <= 40),
           |qfull AS (
           |  SELECT e.vec_id, r.dim,
           |         CAST(round(CAST(e.embedding[r.dim] AS DOUBLE) * 1000000) AS BIGINT) AS qv
           |  FROM embeddings e, range(1, 65) r(dim)),
           |ref AS (
           |  SELECT s.q, s.v, CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d2
           |  FROM sl s JOIN qfull a ON a.vec_id = s.q
           |  JOIN qfull b ON b.vec_id = s.v AND b.dim = a.dim
           |  GROUP BY 1, 2),
           |cands AS (
           |  SELECT q, v, d2 FROM (
           |    SELECT q, v, d2,
           |           row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rank
           |    FROM ref) WHERE rank <= 20),
           |pool AS (SELECT q, v, d2 FROM cands WHERE d2 > 1250000000000),
           |pos AS (
           |  SELECT q, 'positive' AS role, 1 AS rank, v, d2 FROM (
           |    SELECT q, v, d2,
           |           row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rn
           |    FROM pool WHERE d2 <= 1700000000000) WHERE rn = 1),
           |negs AS (
           |  SELECT q, 'negative' AS role, rn AS rank, v, d2 FROM (
           |    SELECT q, v, d2,
           |           row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rn
           |    FROM pool WHERE d2 > 1700000000000) WHERE rn <= 3)
           |SELECT q, role, rank, v, d2 FROM pos
           |UNION ALL SELECT q, role, rank, v, d2 FROM negs
           |ORDER BY q, role, rank""".stripMargin
      }),

    // MMR OVER A PQ+REFINE SHORTLIST — the composed retrieve-then-
    // diversify pipeline a real RAG/training-data stack runs (FAISS
    // shortlist, then MMR): stage 1 is s34's two-stage search (ADC top-20,
    // exact integer refine to top-10), stage 2 is s37's greedy MMR over
    // THAT pool instead of an exact corpus-wide top-k — so the corpus
    // pays only the compressed code scan, never a per-query exact pass.
    // The supplied-shortlist path broadcasts the (queries × 10)-row pool
    // against one corpus scan (PlanSpec: no cartesian), and rel is
    // recomputed BIGINT-exact on the pool, so the entire composition —
    // codebook fits, ADC, refine, five greedy rounds — hash-replays in
    // DuckDB as one CTE chain.
    QueryDef(
      "s39_mmr_over_refine",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val probes = e.where(col("vec_id") < 5)
        val sl = Similarity.pqRefineTopK(e, probes, k = 10, kCand = 20,
          fitSampleRate = 0.5).select(col("q"), col("v"))
        Similarity.mmrTopK(e, probes, k = 5, kCand = 10,
            lambdaNum = 7, lambdaDen = 10, shortlist = Some(sl))
          .orderBy(col("q"), col("round"))
      },
      Some {
        val fits = (0 until 4).map(i =>
          duckSubKmeansCtes(k = 8, iters = 1, scale = 1000000L,
            subDims = 16, offset = i * 16, sfx = s"_$i",
            fitWhere = duckSampleWhere(0.5))).mkString(",\n")
        val qds = (0 until 4).map(i =>
          s"""qd$i AS (
             |  SELECT q.vec_id, c.cl, CAST(SUM((q.qv - c.c) * (q.qv - c.c)) AS BIGINT) AS d
             |  FROM q_$i q JOIN c1_$i c ON q.dim = c.dim
             |  WHERE q.vec_id < 5 GROUP BY 1, 2)""".stripMargin).mkString(",\n")
        val rounds = (2 to 5).map { i =>
          s"""p$i AS (SELECT q, $i AS round, v FROM (
             |  SELECT c.q, c.v,
             |         row_number() OVER (PARTITION BY c.q
             |           ORDER BY (-7 * c.rel + 3 * m.min_d) DESC, c.v) AS rn
             |  FROM cands c
             |  JOIN (SELECT pd.q, pd.d AS v, min(pd.dist) AS min_d
             |        FROM pd JOIN s${i - 1} sp
             |          ON sp.q = pd.q AND sp.v = pd.s
             |        GROUP BY 1, 2) m ON m.q = c.q AND m.v = c.v
             |  WHERE NOT EXISTS (SELECT 1 FROM s${i - 1} sx
             |                    WHERE sx.q = c.q AND sx.v = c.v)
             |  ) WHERE rn = 1),
             |s$i AS (SELECT * FROM s${i - 1} UNION ALL SELECT * FROM p$i)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH $fits,
           |codes AS (
           |  SELECT a0.vec_id, a0.cluster AS k0, a1.cluster AS k1,
           |         a2.cluster AS k2, a3.cluster AS k3
           |  FROM af_0 a0 JOIN af_1 a1 USING (vec_id)
           |       JOIN af_2 a2 USING (vec_id) JOIN af_3 a3 USING (vec_id)),
           |$qds,
           |scored AS (
           |  SELECT d0.vec_id AS q, v.vec_id AS v,
           |         d0.d + d1.d + d2.d + d3.d AS adc
           |  FROM codes v
           |  JOIN qd0 d0 ON d0.cl = v.k0
           |  JOIN qd1 d1 ON d1.cl = v.k1 AND d1.vec_id = d0.vec_id
           |  JOIN qd2 d2 ON d2.cl = v.k2 AND d2.vec_id = d0.vec_id
           |  JOIN qd3 d3 ON d3.cl = v.k3 AND d3.vec_id = d0.vec_id
           |  WHERE v.vec_id <> d0.vec_id),
           |sl AS (
           |  SELECT q, v FROM (
           |    SELECT q, v, row_number() OVER (PARTITION BY q ORDER BY adc, v) AS rank
           |    FROM scored) WHERE rank <= 20),
           |qfull AS (
           |  SELECT e.vec_id, r.dim,
           |         CAST(round(CAST(e.embedding[r.dim] AS DOUBLE) * 1000000) AS BIGINT) AS qv
           |  FROM embeddings e, range(1, 65) r(dim)),
           |ref AS (
           |  SELECT s.q, s.v, CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d2
           |  FROM sl s JOIN qfull a ON a.vec_id = s.q
           |  JOIN qfull b ON b.vec_id = s.v AND b.dim = a.dim
           |  GROUP BY 1, 2),
           |cands AS (
           |  SELECT q, v, d2 AS rel FROM (
           |    SELECT q, v, d2,
           |           row_number() OVER (PARTITION BY q ORDER BY d2, v) AS rank
           |    FROM ref) WHERE rank <= 10),
           |pd AS (
           |  SELECT a.q, a.v AS d, b.v AS s,
           |         SUM((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS dist
           |  FROM cands a JOIN cands b ON a.q = b.q AND a.v <> b.v
           |  JOIN qfull qa ON qa.vec_id = a.v
           |  JOIN qfull qb ON qb.vec_id = b.v AND qb.dim = qa.dim
           |  GROUP BY 1, 2, 3),
           |s1 AS (SELECT q, 1 AS round, v FROM (
           |  SELECT q, v, row_number() OVER (PARTITION BY q ORDER BY rel, v) AS rn
           |  FROM cands) WHERE rn = 1),
           |$rounds
           |SELECT q, round, v FROM s5 ORDER BY q, round""".stripMargin
      }),

    // IVF-FLAT over DETERMINISTIC integer-k-means cells: each query probes
    // its 2 nearest cells (exact integer center distances) and scores only
    // those cells' vectors with the exact cosine — the cluster-pruned scan
    // shape (each query touches ~nProbe/kCells of the corpus; cells are
    // the persisted layout at scale). Unlike the float-centroid ivfTopK
    // (recall-tested in OpsSpec), every stage here — fit, cell assignment,
    // probe selection, candidate set, scores — replays in DuckDB and the
    // result hash-matches.
    QueryDef(
      "s28_ivfq_ann",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.ivfqTopK(e, e.where(col("vec_id") < 5), k = 10,
            fitSampleRate = 0.5)
          .orderBy(col("q"), col("rank"))
      },
      Some(
        s"""WITH ${duckKmeansCtes(k = 4, iters = 2, scale = 1000000L,
               fitWhere = duckSampleWhere(0.5))},
           |qs AS (
           |  SELECT q.vec_id, c.cl, SUM((q.qv - c.c) * (q.qv - c.c)) AS d
           |  FROM q q JOIN c2 c ON q.dim = c.dim
           |  WHERE q.vec_id < 5 GROUP BY 1, 2),
           |probe AS (
           |  SELECT vec_id, cl FROM (
           |    SELECT vec_id, cl,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
           |    FROM qs) WHERE rn <= 2),
           |cand AS (
           |  SELECT p.vec_id AS q, a.vec_id AS v
           |  FROM probe p JOIN af a ON a.cluster = p.cl AND a.vec_id <> p.vec_id),
           |jx AS (
           |  SELECT cand.q, cand.v,
           |         ${duckCosine("qe.embedding", "ve.embedding")} AS c
           |  FROM cand JOIN embeddings qe ON qe.vec_id = cand.q
           |            JOIN embeddings ve ON ve.vec_id = cand.v),
           |r AS (
           |  SELECT q, v, c,
           |         row_number() OVER (PARTITION BY q ORDER BY round(c, 6) DESC, v) AS rank
           |  FROM jx)
           |SELECT q, rank, v, round(c, 4) AS cos_sim
           |FROM r WHERE rank <= 10 ORDER BY q, rank""".stripMargin)),

    // IVFPQ (the FAISS `IVF4,PQ4` composition — s28's coarse cells +
    // s34's PQ codebooks, fit on RESIDUALS): each vector stores cell id +
    // 4 codes; a query probes its 2 nearest cells, ADC-scans only those
    // cells' codes with per-(query,cell) residual distance tables, and
    // exact-integer-refines the top-10 shortlist to top-5. The index
    // shape a 100 TB vector estate actually runs: the only wide pass is
    // the code scan of the probed cells (~nProbe/kCells of m-int rows).
    // Every stage — coarse fit, residuals, residual codebook fits, codes,
    // probes, ADC, refine — is deterministic integer arithmetic, replayed
    // below as one DuckDB CTE chain, so the whole composition
    // hash-matches, not approximately.
    QueryDef(
      "s38_ivfpq_ann",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.ivfpqTopK(e, e.where(col("vec_id") < 5), k = 5,
            kCand = 10)
          .orderBy(col("q"), col("rank"))
      },
      Some(ivfpqOracleSql())),

    // IVFPQ AS THE PERSISTED LAYOUT (s38's build/query split — the way a
    // real estate runs it): ivfpqBuild writes the codes table PARTITIONED
    // BY cell plus the model artifacts (coarse centers, residual
    // codebooks, meta); ivfpqTopKIndexed reloads both and never refits,
    // and the probe becomes a PARTITION FILTER on the codes scan — zero
    // bytes of non-probed cells are read (PlanSpec pins PartitionFilters
    // with exactly nProbe cells for a single query). The deterministic
    // fits make build+query ≡ the one-shot s38 composition, so the SAME
    // oracle CTE chain hash-checks the persisted path.
    QueryDef(
      "s42_ivfpq_persisted",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val ix = Fixtures.tmp(dir, "ivfpq_index")
        Similarity.ivfpqBuild(e, ix)
        Similarity.ivfpqTopKIndexed(s, ix, e, e.where(col("vec_id") < 5),
            k = 5, kCand = 10)
          .orderBy(col("q"), col("rank"))
      },
      Some(ivfpqOracleSql())),

    // IVFPQ INCREMENTAL APPEND (the streaming half of the persisted
    // layout — FAISS's `add` vs `train` distinction): build the index on
    // HALF the corpus, then append the held-out half in two micro-batch
    // slices under the FROZEN model — new vectors coarse-assign to the
    // existing cells, their codes land in the same cell-partitioned
    // layout, nothing refits. The oracle replays the identical math with
    // the FIT inputs (coarse + residual codebooks) restricted to the
    // build half while codes cover the full corpus — so the incremental
    // index hash-matches a one-shot encode under the same frozen model,
    // and the probe's file-level partition pruning survives appends
    // (PlanSpec pins PartitionFilters on the appended layout).
    QueryDef(
      "s43_ivfpq_incremental",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val ix = Fixtures.tmp(dir, "ivfpq_incr_index")
        Similarity.ivfpqBuild(e.where(col("vec_id") % 2 === 0), ix)
        // the maintenance-lane shape: the frozen model loads ONCE and
        // serves every append (ivfpqAppend's model pass-through)
        val model = Some(Similarity.ivfpqLoad(s, ix))
        Similarity.ivfpqAppend(
          e.where(col("vec_id") % 4 === 1), ix, model)
        Similarity.ivfpqAppend(
          e.where(col("vec_id") % 4 === 3), ix, model)
        Similarity.ivfpqTopKIndexed(s, ix, e, e.where(col("vec_id") < 5),
            k = 5, kCand = 10)
          .orderBy(col("q"), col("rank"))
      },
      Some(ivfpqOracleSql(fitWhere = "vec_id % 2 = 0"))),

    // IVFPQ INDEX COMPACTION — the lifecycle's third verb (build →
    // append → compact): each append lands one parquet file per touched
    // cell, so a maintained index accrues files linearly with batch
    // count; probing becomes file-count-bound (footers, opens) instead
    // of byte-bound. ivfpqCompact rewrites every cell partition back to
    // ONE file under a staged atomic swap; the requires pin the file
    // count falling to 1 per cell and the model artifacts surviving
    // byte-identical, while the query hash-matches s43's frozen-model
    // oracle — maintenance invisible to results, pruning preserved
    // (PlanSpec pins the partition filter on the compacted layout).
    QueryDef(
      "s44_ivfpq_compacted",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val ix = Fixtures.tmp(dir, "ivfpq_cmp_index")
        Similarity.ivfpqBuild(e.where(col("vec_id") % 2 === 0), ix)
        val modelBefore = Similarity.ivfpqLoad(s, ix)
        Similarity.ivfpqAppend(e.where(col("vec_id") % 4 === 1), ix,
          Some(modelBefore))
        Similarity.ivfpqAppend(e.where(col("vec_id") % 4 === 3), ix,
          Some(modelBefore))
        def filesPerCell: Seq[Int] =
          Similarity.codesFilesPerCell(ix).values.toSeq
        require(filesPerCell.max >= 2,
          s"appends must accrue files per cell: $filesPerCell")
        Similarity.ivfpqCompact(s, ix)
        require(filesPerCell.forall(_ == 1),
          s"compaction must leave ONE file per cell: $filesPerCell")
        require(Similarity.ivfpqLoad(s, ix) == modelBefore,
          "compaction must never touch the model artifacts")
        Similarity.ivfpqTopKIndexed(s, ix, e, e.where(col("vec_id") < 5),
            k = 5, kCand = 10)
          .orderBy(col("q"), col("rank"))
      },
      Some(ivfpqOracleSql(fitWhere = "vec_id % 2 = 0"))),

    // QUANTIZATION-ERROR DRIFT MONITOR — the refit trigger a frozen
    // model needs (FAISS's operational stats): the model fits on the
    // EVEN half only; the exact integer reconstruction error (per
    // subspace, the MINIMUM assignment distance — no reconstruction
    // materialized) is then aggregated per cohort. The build cohort
    // encodes tightly, the streamed cohort loosely — that gap, here as
    // integer error masses per half, is what an operator alerts on
    // before recall quietly decays. The oracle replays residuals +
    // min-distance per subspace against the same fit chain.
    QueryDef(
      "s45_ivfpq_drift",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val ix = Fixtures.tmp(dir, "ivfpq_drift_index")
        Similarity.ivfpqBuild(e.where(col("vec_id") % 2 === 0), ix)
        val model = Similarity.ivfpqLoad(s, ix)
        Similarity.ivfpqQuantizationError(e, model)
          .withColumn("half", (col("v") % 2 === 0).cast("int"))
          .groupBy(col("half"))
          .agg(count(lit(1)).as("n_vecs"), sum(col("err")).as("total_err"),
            max(col("err")).as("max_err"))
          .orderBy(col("half"))
      },
      Some {
        val errCtes = (0 until 4).map { i =>
          val off = i * 16
          s"""err$i AS (
             |  SELECT vec_id, MIN(d) AS e FROM (
             |    SELECT r.vec_id, cb.cl,
             |           CAST(SUM((r.rv - cb.c) * (r.rv - cb.c)) AS BIGINT) AS d
             |    FROM res r JOIN c1_$i cb ON cb.dim = r.dim - $off
             |    WHERE r.dim > $off AND r.dim <= ${off + 16}
             |    GROUP BY 1, 2) GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${duckKmeansCtes(k = 4, iters = 2, scale = 1000000L,
                fitWhere = "vec_id % 2 = 0")},
           |res AS (
           |  SELECT q.vec_id, q.dim, q.qv - c.c AS rv
           |  FROM q JOIN af a USING (vec_id)
           |  JOIN c2 c ON c.cl = a.cluster AND c.dim = q.dim),
           |${ivfpqSubFits("vec_id % 2 = 0")},
           |$errCtes,
           |errs AS (
           |  SELECT e0.vec_id, e0.e + e1.e + e2.e + e3.e AS err
           |  FROM err0 e0 JOIN err1 e1 USING (vec_id)
           |       JOIN err2 e2 USING (vec_id) JOIN err3 e3 USING (vec_id))
           |SELECT CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS half,
           |       count(*) AS n_vecs,
           |       CAST(SUM(err) AS BIGINT) AS total_err,
           |       CAST(MAX(err) AS BIGINT) AS max_err
           |FROM errs GROUP BY 1 ORDER BY half""".stripMargin
      }),

    // embedding near-dup, scale path: LSH bucket join instead of the O(n^2)
    // cross product (d5) — only same-bucket pairs are scored
    QueryDef(
      "d6_embed_lsh_dup",
      (s, dir) => {
        val sim = Similarity
        val e = Tables.load(s, dir, "embeddings")
        val b = e.select(col("vec_id"), col("embedding"),
          sim.norm(col("embedding")).as("nrm"),
          sim.lshSignature(col("embedding"), 4, 64).as("bucket"))
        val l = b.select(col("vec_id").as("a"), col("embedding").as("ea"),
          col("nrm").as("na"), col("bucket"))
        val r = b.select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("nrm").as("nb"), col("bucket"))
        l.join(r, Seq("bucket")).where(col("a") < col("b"))
          .withColumn("c", sim.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
          .where(col("c") >= 0.2)
          .select(col("a"), col("b"), round(col("c"), 4).as("cos_sim"))
          .orderBy(col("a"), col("b"))
      },
      Some(
        s"""WITH b AS (
           |  SELECT vec_id, embedding, ${duckSignature("embedding", 4)} AS bucket
           |  FROM embeddings),
           |pairs AS (
           |  SELECT l.vec_id AS a, r.vec_id AS b,
           |         ${duckCosine("l.embedding", "r.embedding")} AS c
           |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
           |SELECT a, b, round(c, 4) AS cos_sim
           |FROM pairs WHERE c >= 0.2 ORDER BY a, b""".stripMargin)),

    // Semantic benchmark decontamination — the embedding twin of d8's
    // n-gram check: does a training vector sit too close (cosine) to any
    // benchmark vector? The tiny probe side BROADCASTS onto the corpus's
    // LSH buckets (one narrow corpus pass, the d8 scale contract); cosine
    // verifies only same-bucket candidates, never corpus × probes.
    QueryDef(
      "d13_semantic_contamination",
      (s, dir) => {
        val sim = Similarity
        val e = Tables.load(s, dir, "embeddings")
        val b = e.select(col("vec_id"), col("embedding"),
          sim.norm(col("embedding")).as("nrm"),
          sim.lshSignature(col("embedding"), 4, 64).as("bucket"))
        val probes = b.where(col("vec_id") < 5)
          .select(col("vec_id").as("p"), col("embedding").as("ep"),
            col("nrm").as("np"), col("bucket"))
        val corpus = b.where(col("vec_id") >= 5)
          .select(col("vec_id").as("c_vec"), col("embedding").as("ec"),
            col("nrm").as("nc"), col("bucket"))
        corpus.join(broadcast(probes), Seq("bucket"))
          .withColumn("cs", sim.dot(col("ec"), col("ep")) / (col("nc") * col("np")))
          .where(col("cs") >= 0.2)
          .select(col("c_vec"), col("p"), round(col("cs"), 4).as("cos_sim"))
          .orderBy(col("c_vec"), col("p"))
      },
      Some(
        s"""WITH b AS (
           |  SELECT vec_id, embedding, ${duckSignature("embedding", 4)} AS bucket
           |  FROM embeddings),
           |pairs AS (
           |  SELECT c.vec_id AS c_vec, p.vec_id AS p,
           |         ${duckCosine("c.embedding", "p.embedding")} AS cs
           |  FROM b c JOIN b p ON c.bucket = p.bucket
           |   AND c.vec_id >= 5 AND p.vec_id < 5)
           |SELECT c_vec, p, round(cs, 4) AS cos_sim
           |FROM pairs WHERE cs >= 0.2 ORDER BY c_vec, p""".stripMargin)),

    // FILTERED vector search (every vector store's "metadata filter"
    // feature): the label predicate cuts the corpus BEFORE any scoring —
    // pushed below the LSH bucket join, so the probe side joins against
    // only the filtered slice's buckets, never post-filtering a top-k
    // that the predicate would starve. Same LSH approximation contract
    // as s6/d6; the oracle replays filter, buckets, and ranking.
    QueryDef(
      "s31_filtered_ann",
      (s, dir) => {
        val sim = Similarity
        val e = Tables.load(s, dir, "embeddings")
        val b = e.select(col("vec_id"), col("embedding"), col("label"),
          sim.norm(col("embedding")).as("nrm"),
          sim.lshSignature(col("embedding"), 4, 64).as("bucket"))
        val probes = b.where(col("vec_id") < 3)
          .select(col("vec_id").as("q"), col("embedding").as("ep"),
            col("nrm").as("np"), col("bucket"))
        val corpus = b.where(col("label").isin(2, 5) && col("vec_id") >= 3)
          .select(col("vec_id").as("v"), col("label"),
            col("embedding").as("ec"), col("nrm").as("nc"), col("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q"))
          .orderBy(round(col("cs"), 6).desc, col("v"))
        corpus.join(broadcast(probes), Seq("bucket"))
          .withColumn("cs",
            sim.dot(col("ec"), col("ep")) / (col("nc") * col("np")))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 5)
          .select(col("q"), col("rank"), col("v"), col("label"),
            round(col("cs"), 4).as("cos_sim"))
          .orderBy(col("q"), col("rank"))
      },
      Some(
        s"""WITH b AS (
           |  SELECT vec_id, embedding, label,
           |         ${duckSignature("embedding", 4)} AS bucket
           |  FROM embeddings),
           |j AS (
           |  SELECT p.vec_id AS q, c.vec_id AS v, c.label,
           |         ${duckCosine("c.embedding", "p.embedding")} AS cs
           |  FROM b c JOIN b p ON c.bucket = p.bucket
           |  WHERE p.vec_id < 3 AND c.vec_id >= 3 AND c.label IN (2, 5)),
           |r AS (
           |  SELECT q, v, label, cs, row_number() OVER (
           |    PARTITION BY q ORDER BY round(cs, 6) DESC, v) AS rank
           |  FROM j)
           |SELECT q, rank, v, label, round(cs, 4) AS cos_sim
           |FROM r WHERE rank <= 5 ORDER BY q, rank""".stripMargin)),

    // Continuously-maintained ANN index: documents stream through the
    // checkpointed drain, each micro-batch embeds (deterministic synthetic
    // encoder seam) and appends LSH bucket rows to a parquet index with a
    // doc-keyed replay guard; retrieval probes ONLY same-bucket candidates
    // against the accumulated index. The oracle recomputes vectors,
    // signatures, and bucket-pruned top-5 cosine over the whole corpus in
    // one shot — the streamed index ≡ the batch index, the vector twin of
    // e18's streaming dedup.
    QueryDef(
      "e20_stream_vector_index",
      (s, dir) => {
        import s.implicits._
        val root = graft.kfs.KfsSeed.seededDocsRoot(s, dir)
        // "v2" names: the index schema gained the stored vec column — a
        // stale pre-vec index directory must never be resumed
        val index = Fixtures.tmp(dir, "vindex_v2")
        val ckpt = Fixtures.tmp(dir, "vindex_v2_ckpt")
        val nSegs = math.max(1,
          math.ceil(Tables.load(s, dir, "documents").count() / 250.0).toInt)
        graft.streaming.StreamDrive.narrow(s) {
          graft.etl.VectorIndex.run(s, root, index, ckpt, planes = 4, dims = 16,
            maxSegmentsPerTrigger = Some(math.max(1, (nSegs + 1) / 2)))
        }
        val probes = Seq(0L, 1L, 2L).toDF("doc")
        graft.etl.VectorIndex.topK(s, index, probes, k = 5)
          .orderBy(col("q"), col("rank"))
      },
      Some(
        s"""WITH ids AS (SELECT doc_id AS doc FROM documents),
           |vec AS (
           |  SELECT doc, list_transform(generate_series(1, 16),
           |    j -> CAST('0x' || substr(md5('v|' || CAST(doc AS VARCHAR) || '|' || j), 1, 1) AS INTEGER) - 7.5) AS v
           |  FROM ids),
           |sig AS (SELECT doc, v, ${duckSignature("v", 4)} AS bucket FROM vec),
           |j AS (
           |  SELECT p.doc AS q, c.doc AS v2, ${duckCosine("p.v", "c.v")} AS c
           |  FROM sig p JOIN sig c
           |    ON p.bucket = c.bucket AND p.doc < 3 AND p.doc <> c.doc),
           |r AS (
           |  SELECT q, v2, c,
           |         row_number() OVER (PARTITION BY q ORDER BY round(c, 6) DESC, v2) AS rank
           |  FROM j)
           |SELECT q, rank, v2 AS v, round(c, 4) AS cos_sim
           |FROM r WHERE rank <= 5 ORDER BY q, rank""".stripMargin)),

    // STREAMING IVFPQ INDEX MAINTENANCE — e20's quantized sibling: the
    // persisted cell-partitioned IVFPQ layout (s42) as the STREAMING
    // lane's index. The model builds once on the even half (frozen);
    // document ids then stream through the checkpointed drain, each
    // micro-batch resolves its ids against the embeddings corpus, drops
    // already-coded ids (the replay guard — it also skips the seed half,
    // and a crash-replayed batch appends nothing), and appends the rest
    // into the same partitioned codes table. The query hash-matches the
    // s43 oracle (fit on the even half, codes over everything): batch
    // cadence is invisible, and the probe's partition pruning survives.
    QueryDef(
      "e46_stream_ivfpq_index",
      (s, dir) => {
        val root = graft.kfs.KfsSeed.seededDocsRoot(s, dir)
        val e = Tables.load(s, dir, "embeddings")
        val ix = Fixtures.tmp(dir, "ivfpq_stream_ix")
        val ckpt = Fixtures.tmp(dir, "ivfpq_stream_ckpt")
        // the build WIPES the codes table, so a stale checkpoint would
        // replay-skip the streamed half: fresh state, full work, per run
        graft.etl.TableSink.deleteRecursive(java.nio.file.Paths.get(ix))
        graft.etl.TableSink.deleteRecursive(java.nio.file.Paths.get(ckpt))
        Similarity.ivfpqBuild(e.where(col("vec_id") % 2 === 0), ix)
        val nSegs = math.max(1,
          math.ceil(Tables.load(s, dir, "documents").count() / 250.0).toInt)
        graft.streaming.StreamDrive.narrow(s) {
          graft.etl.VectorIndex.runIvfPq(s, root, ix, ckpt, e,
            maxSegmentsPerTrigger = Some(math.max(1, (nSegs + 1) / 2)))
        }
        Similarity.ivfpqTopKIndexed(s, ix, e, e.where(col("vec_id") < 5),
            k = 5, kCand = 10)
          .orderBy(col("q"), col("rank"))
      },
      Some(ivfpqOracleSql(fitWhere = "vec_id % 2 = 0"))),

    // SemDeDup-shaped semantic dedup: LSH buckets bound the candidate set
    // (never an all-pairs cosine), same-bucket pairs >= threshold become
    // edges, transitive closure picks one representative (min id) per
    // semantic cluster, singletons keep themselves. The per-cluster
    // n_labels column audits cluster purity against the ground-truth
    // label. At 100 TB this is d6's bucket join + d7's adaptive connected
    // components — no new shuffle shape, composed end to end.
    QueryDef(
      "d10_semdedup",
      (s, dir) => {
        val sim = Similarity
        val e = Tables.load(s, dir, "embeddings")
        val b = e.select(col("vec_id"), col("embedding"),
          sim.norm(col("embedding")).as("nrm"),
          sim.lshSignature(col("embedding"), 4, 64).as("bucket"))
        val l = b.select(col("vec_id").as("a"), col("embedding").as("ea"),
          col("nrm").as("na"), col("bucket"))
        val r = b.select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("nrm").as("nb"), col("bucket"))
        val pairs = l.join(r, Seq("bucket")).where(col("a") < col("b"))
          .withColumn("c",
            sim.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
          .where(col("c") >= 0.2)
          .select(col("a"), col("b"))
        val cc = Dedup.duplicateClusters(pairs)
        e.join(cc, col("vec_id") === col("node"), "left")
          .select(col("vec_id"),
            coalesce(col("cluster"), col("vec_id")).as("cluster"),
            col("label"))
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_members"),
            (count(lit(1)) - 1).as("n_dropped"),
            countDistinct(col("label")).as("n_labels"))
          .where(col("n_members") > 1)
          .orderBy(col("cluster"))
      },
      Some(
        s"""WITH RECURSIVE b AS (
           |  SELECT vec_id, embedding, ${duckSignature("embedding", 4)} AS bucket
           |  FROM embeddings),
           |pairs AS (
           |  SELECT l.vec_id AS a, r.vec_id AS b
           |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
           |  WHERE ${duckCosine("l.embedding", "r.embedding")} >= 0.2),
           |edges AS (SELECT a AS src, b AS dst FROM pairs
           |          UNION ALL SELECT b, a FROM pairs),
           |cc AS (
           |  SELECT DISTINCT src AS node, src AS label FROM edges
           |  UNION
           |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node),
           |labels AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node),
           |m AS (
           |  SELECT em.vec_id, COALESCE(l.cluster, em.vec_id) AS cluster, em.label
           |  FROM embeddings em LEFT JOIN labels l ON em.vec_id = l.node)
           |SELECT cluster, count(*) AS n_members,
           |       CAST(count(*) - 1 AS BIGINT) AS n_dropped,
           |       CAST(count(DISTINCT label) AS BIGINT) AS n_labels
           |FROM m GROUP BY cluster HAVING count(*) > 1
           |ORDER BY cluster""".stripMargin)),

    // bucket histogram — shows the LSH partitioning is balanced enough to
    // cut each probe to ~1/2^planes of the corpus
    QueryDef(
      "s7_lsh_buckets",
      (s, dir) => Tables.load(s, dir, "embeddings")
        .select(Similarity.lshSignature(col("embedding"), 4, 64).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")),
      Some(
        s"""SELECT ${duckSignature("embedding", 4)} AS bucket, count(*) AS n
           |FROM embeddings GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- text analysis --------------------------------------------------
    QueryDef(
      "t1_langid",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.languageGuess(col("text")).as("guess"))
        .groupBy(col("guess")).agg(count(lit(1)).as("n"))
        .orderBy(col("guess")),
      Some(
        """WITH g AS (
          |  SELECT doc_id,
          |         CASE WHEN len(list_filter(string_split(text, ' '),
          |                w -> w IN ('the','a','of','and','in','to'))) * 1.0
          |              / len(string_split(text, ' ')) >= 0.04
          |         THEN 'en' ELSE 'und' END AS guess
          |  FROM documents)
          |SELECT guess, count(*) AS n FROM g GROUP BY guess ORDER BY guess""".stripMargin)),

    QueryDef(
      "t2_quality",
      (s, dir) => TextAnalysis.quality(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .where(col("doc") < 50)
        .orderBy(col("doc")),
      Some(
        """SELECT doc_id AS doc,
          |       CAST(length(text) AS INTEGER) AS n_chars,
          |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
          |       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
          |       round(length(replace(text, ' ', '')) * 1.0
          |             / len(string_split(text, ' ')), 4) AS avg_token_len,
          |       round(len(list_filter(string_split(text, ' '),
          |               w -> w IN ('the','a','of','and','in','to'))) * 1.0
          |             / len(string_split(text, ' ')), 4) AS stopword_ratio,
          |       CAST((length(text) + 3) // 4 AS INTEGER) AS est_bpe_tokens
          |FROM documents WHERE doc_id < 50 ORDER BY doc""".stripMargin)),

    QueryDef(
      "t3_token_stats",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
            sum(TextAnalysis.estBpeTokens(col("text")).cast("long")).as("total_bpe"),
            max(length(col("text"))).as("max_chars"))
          .orderBy(col("lang"))
      },
      Some(
        """SELECT lang, count(*) AS n_docs,
          |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
          |       CAST(SUM((length(text) + 3) // 4) AS BIGINT) AS total_bpe,
          |       CAST(MAX(length(text)) AS INTEGER) AS max_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      "t4_fingerprint",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val fp = docs.select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        fp.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
          .where(col("n_docs") >= 1)
          .agg(count(lit(1)).as("n_fingerprints"),
            sum(col("n_docs")).as("n_docs"),
            count(when(col("n_docs") > 1, 1)).as("n_collisions"),
            min(col("fp")).as("min_fp"))
      },
      Some(
        """SELECT count(*) AS n_fingerprints,
          |       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
          |       count(*) FILTER (n_docs > 1) AS n_collisions,
          |       min(fp) AS min_fp
          |FROM (SELECT md5(array_to_string(list_sort(list_distinct(
          |               string_split(text, ' '))), ' ')) AS fp,
          |             count(*) AS n_docs
          |      FROM documents GROUP BY 1)""".stripMargin)),

    // rolling-hash fingerprint (Rabin-Karp fold; order-sensitive, unlike t4)
    QueryDef(
      "t5_rolling_fingerprint",
      (s, dir) => Tables.load(s, dir, "documents")
        .where(col("doc_id") < 40)
        .select(col("doc_id"),
          TextAnalysis.rollingFingerprint(col("text")).as("rfp"))
        .orderBy(col("doc_id")),
      Some(
        s"""SELECT doc_id,
           |       list_reduce(list_transform(generate_series(1, length(text)),
           |                   i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
           |                   (a, c) -> (a * ${TextAnalysis.RollB} + c) % ${TextAnalysis.RollP}) AS rfp
           |FROM documents WHERE doc_id < 40 ORDER BY doc_id""".stripMargin)),

    // BPE-ish regex tokenization vs whitespace tokens (both engines run
    // the same portable regex: letter runs, digit runs, single glyphs)
    QueryDef(
      "t7_regex_tokens",
      (s, dir) => Tables.load(s, dir, "documents")
        .where(col("doc_id") < 50)
        .select(col("doc_id"),
          TextAnalysis.regexTokenCount(col("text")).as("n_regex_tokens"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.estBpeTokens(col("text")).as("n_bpe_est"))
        .orderBy(col("doc_id")),
      Some(
        s"""SELECT doc_id,
           |       CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeTokenPattern}')) AS INTEGER) AS n_regex_tokens,
           |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
           |       CAST((length(text) + 3) // 4 AS INTEGER) AS n_bpe_est
           |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin)),

    // Repetition quality metrics (Gopher-style): top-word frequency ratio
    // + duplicate-2-gram ratio flag degenerate/boilerplate text that
    // length/stopword gates miss
    QueryDef(
      "t8_repetition",
      (s, dir) => TextAnalysis.repetition(
        Tables.load(s, dir, "documents").where(col("doc_id") < 50),
        "doc_id", "text")
        .orderBy(col("doc")),
      Some(
        """WITH wc AS (
          |  SELECT doc, word, count(*) AS c FROM (
          |    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS word
          |    FROM documents WHERE doc_id < 50)
          |  WHERE word <> '' GROUP BY doc, word),
          |ws AS (SELECT doc, max(c) AS top_cnt, CAST(SUM(c) AS BIGINT) AS n_tok
          |       FROM wc GROUP BY doc),
          |g2 AS (
          |  SELECT doc, count(*) AS n2 FROM (
          |    SELECT DISTINCT doc_id AS doc, s FROM (
          |      SELECT doc_id,
          |             unnest(list_transform(generate_series(1, len(w) - 1),
          |                                   i -> w[i] || ' ' || w[i+1])) AS s
          |      FROM (SELECT doc_id, string_split(text, ' ') AS w
          |            FROM documents WHERE doc_id < 50))
          |    WHERE s <> '') GROUP BY doc)
          |SELECT ws.doc, n_tok,
          |       round(CAST(top_cnt AS DOUBLE) / n_tok, 4) AS top_word_ratio,
          |       round(1.0 - CAST(n2 AS DOUBLE) / (n_tok - 1), 4) AS dup_2gram_ratio
          |FROM ws JOIN g2 ON ws.doc = g2.doc
          |WHERE n_tok > 1
          |ORDER BY ws.doc""".stripMargin)),

    // PII redaction (training-data scrub): the synthetic corpus has no
    // natural PII, so a deterministic contact line (email + phone derived
    // from doc_id) is appended on BOTH sides — same technique as the
    // events-topic CTE — then scrubbed with TextAnalysis.redactPii. The
    // aggregate proves every injected email/phone was caught and nothing
    // else was touched.
    QueryDef(
      "t9_pii_redact",
      (s, dir) => {
        val withPii = Tables.load(s, dir, "documents")
          .withColumn("contact",
            concat(col("text"), lit(" reach user"), col("doc_id"),
              lit("@mail.example.com or 555-010-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        withPii
          .select(col("doc_id"),
            TextAnalysis.redactPii(col("contact")).as("clean"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("clean").contains("<EMAIL>") &&
              col("clean").contains("<PHONE>"), 1L).otherwise(0L)).as("n_redacted"),
            sum(when(col("clean").rlike("@|[0-9]{3}-[0-9]{3}-[0-9]{4}"), 1L)
              .otherwise(0L)).as("n_leaked"))
      },
      Some(
        s"""WITH withpii AS (
           |  SELECT doc_id,
           |         text || ' reach user' || CAST(doc_id AS VARCHAR) ||
           |         '@mail.example.com or 555-010-' ||
           |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS contact
           |  FROM documents),
           |clean AS (
           |  SELECT doc_id,
           |         regexp_replace(
           |           regexp_replace(contact, '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
           |           '${TextAnalysis.PhonePattern}', '<PHONE>', 'g') AS clean
           |  FROM withpii)
           |SELECT count(*) AS n_docs,
           |       CAST(SUM(CASE WHEN clean LIKE '%<EMAIL>%' AND clean LIKE '%<PHONE>%'
           |                THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
           |       CAST(SUM(CASE WHEN regexp_matches(clean, '@|[0-9]{3}-[0-9]{3}-[0-9]{4}')
           |                THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
           |FROM clean""".stripMargin)),

    // Deterministic stratified sampling (class rebalancing): downsample the
    // over-represented language by md5-hex-prefix thresholding — a pure
    // function of doc_id, so DuckDB recomputes the EXACT same membership
    // (cross-engine reproducibility is the point of the design; see
    // ops/Sampling.scala for why RNG-based df.sample can't give this).
    QueryDef(
      "t10_stratified_sample",
      (s, dir) => Sampling.stratified(
        Tables.load(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.25, "zh" -> 0.5))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("lang")),
      Some(
        """SELECT lang, count(*) AS kept,
          |       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
          |FROM documents
          |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          |      CASE lang WHEN 'en' THEN '4000' WHEN 'zh' THEN '8000'
          |           ELSE 'g' END
          |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- end-to-end curation pipeline -----------------------------------
    // The flagship training-data flow composed from the real operators:
    // exact dedup (keep min doc_id per normalized content hash) → quality
    // gate (length + stopword-ratio thresholds) → language tally of the
    // surviving corpus. Every stage is the same op the standalone queries
    // check (d1/t2/t1) — this proves they compose; at 100 TB this plan is
    // two hash shuffles (dedup groupBy + final tally) with everything else
    // map-side.
    QueryDef(
      "t6_curation_pipeline",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // dedup via hash aggregate + semi-join back on the kept ids: one
        // shuffle on the content hash (partial agg map-side) + one hash
        // semi-join on doc_id — NO sort anywhere. A window min over
        // md5(text) would shuffle AND SORT the whole corpus on a
        // near-unique key, which is the scale-killer at 100 TB; the
        // aggregate form is hash-only. Then all text metrics come from ONE
        // split projection (_words) — the text is split exactly once per
        // doc, and the stopword count is computed once and shared by the
        // quality gate and the language guess.
        val keepers = docs
          .groupBy(md5(lower(trim(col("text")))).as("_h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        val w = col("_words")
        val nTok = size(w)
        docs
          .join(keepers, Seq("doc_id"), "left_semi")
          .select(split(col("text"), " ").as("_words"))
          .withColumn("_swc", TextAnalysis.stopwordCountOf(w))
          .where(nTok >= 30 &&
            round(col("_swc").cast("double") / nTok, 4) >= 0.02)
          .select(
            when(col("_swc").cast("double") / nTok >= 0.04, lit("en"))
              .otherwise(lit("und")).as("lang_guess"),
            nTok.as("_n"))
          .groupBy(col("lang_guess"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("_n").cast("long")).as("total_tokens"))
          .orderBy(col("lang_guess"))
      },
      Some(
        """WITH keepers AS (
          |  SELECT min(doc_id) AS doc_id FROM documents
          |  GROUP BY md5(lower(trim(text)))),
          |d AS (SELECT documents.* FROM documents JOIN keepers USING (doc_id)),
          |q AS (
          |  SELECT doc_id FROM d
          |  WHERE len(string_split(text, ' ')) >= 30
          |    AND round(len(list_filter(string_split(text, ' '),
          |            w -> w IN ('the','a','of','and','in','to'))) * 1.0
          |          / len(string_split(text, ' ')), 4) >= 0.02),
          |kept AS (SELECT d.* FROM d JOIN q USING (doc_id))
          |SELECT CASE WHEN len(list_filter(string_split(text, ' '),
          |              w -> w IN ('the','a','of','and','in','to'))) * 1.0
          |            / len(string_split(text, ' ')) >= 0.04
          |       THEN 'en' ELSE 'und' END AS lang_guess,
          |       count(*) AS n_docs,
          |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
          |FROM kept GROUP BY 1 ORDER BY lang_guess""".stripMargin)),

    // Deterministic weighted corpus mixing: per-class keep-rates derived
    // so the OUTPUT proportions match the target weights (binding class
    // keeps all, others downsample); membership is the same md5-threshold
    // function as t10, so DuckDB recomputes the rates AND the exact kept
    // set — mixing a 100 TB pretraining corpus stays auditable
    // TOKEN-BUDGET MIXTURE — the "take ~B tokens from each source"
    // training-mix primitive (t13 rebalances by DOC RATES; real mixes are
    // specified in TOKENS): per funded source, docs admit in
    // deterministic hash order until the budget fills, straddler kept,
    // unfunded sources dropped. No per-class global sort: the hash's high
    // 12 bits stratify each class into ordered buckets, one aggregate +
    // a tiny cumulative window finds the single cutoff bucket, and only
    // that ~1/4096 slice pays a row-level window (the t47 histogram
    // discipline applied to sampling). The oracle replays the DIRECT
    // formulation — exclusive running token sum in (hash, id) order under
    // the budget — so the stratified plan is proven ≡ the naive sort.
    QueryDef(
      "t49_token_budget_mix",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Sampling.tokenBudgetSample(docs, "doc_id", "source",
            graft.ops.TextAnalysis.tokenCount(col("text")),
            Map("src0" -> 600L, "src1" -> 900L, "src7" -> 1200L,
              "src19" -> 999999L,
              // zero-funded: listed but admits nothing (the exclusive-
              // prefix law — the oracle's WHERE excl < 0 agrees)
              "src2" -> 0L))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))
              .as("tok_sum"),
            sum(col("doc_id")).as("id_sum"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH t AS (
           |  SELECT source, doc_id,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
           |         ${duckHash48("CAST(doc_id AS VARCHAR)")} AS h
           |  FROM documents),
           |b(source, budget) AS (VALUES ('src0', 600), ('src1', 900),
           |                             ('src7', 1200), ('src19', 999999),
           |                             ('src2', 0)),
           |r AS (
           |  SELECT t.*, b.budget,
           |         COALESCE(SUM(toks) OVER (PARTITION BY t.source
           |           ORDER BY h, doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |           0) AS excl
           |  FROM t JOIN b USING (source))
           |SELECT source, count(*) AS n_kept,
           |       CAST(SUM(toks) AS BIGINT) AS tok_sum,
           |       CAST(SUM(doc_id) AS BIGINT) AS id_sum
           |FROM r WHERE excl < budget
           |GROUP BY source ORDER BY source""".stripMargin
      }),

    // WITHIN-DOCUMENT REPETITION SIGNALS (Gopher's repetition filter
    // family, Rae et al. 2021 Table A1): per doc, the character mass of
    // the most frequent 2-gram and of all duplicated 3-grams — the stage
    // that catches boilerplate loops and degenerate generations. All
    // BIGINT (occurrences x gram length; flags by cross-multiplied
    // thresholds — top-2-gram >20% of chars, dup-3-grams >10%), so the
    // per-source rollup hash-replays exactly. Shuffle mass ∝ token
    // count, keyed (doc, gram) — no corpus-wide hot key at 100 TB.
    QueryDef(
      "t50_repetition_signals",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sig = graft.ops.QualityRules.repetitionSignals(
          docs, "doc_id", "text")
        docs.select(col("doc_id"), col("source"))
          .join(sig, Seq("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("top2_chars")).as("top2_sum"),
            sum(col("dup3_chars")).as("dup3_sum"),
            sum((col("top2_chars") * 5 > col("text_chars"))
              .cast("long")).as("n_top2_flagged"),
            sum((col("dup3_chars") * 10 > col("text_chars"))
              .cast("long")).as("n_dup3_flagged"))
          .orderBy(col("source"))
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id, source, length(text) AS chars,
          |         string_split(text, ' ') AS w
          |  FROM documents),
          |g2 AS (
          |  SELECT doc_id, unnest(list_transform(
          |    generate_series(1, len(w) - 1),
          |    i -> w[i] || ' ' || w[i + 1])) AS gram
          |  FROM t WHERE len(w) >= 2),
          |c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
          |top2 AS (
          |  SELECT doc_id, cnt * length(gram) AS top2_chars FROM (
          |    SELECT doc_id, gram, cnt,
          |           row_number() OVER (PARTITION BY doc_id
          |                              ORDER BY cnt DESC, gram) AS rn
          |    FROM c2) WHERE rn = 1),
          |g3 AS (
          |  SELECT doc_id, unnest(list_transform(
          |    generate_series(1, len(w) - 2),
          |    i -> array_to_string(w[i:i+2], ' '))) AS gram
          |  FROM t WHERE len(w) >= 3),
          |c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2),
          |dup3 AS (
          |  SELECT doc_id,
          |         CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram)
          |                       ELSE 0 END) AS BIGINT) AS dup3_chars
          |  FROM c3 GROUP BY 1)
          |SELECT source, count(*) AS n_docs,
          |       CAST(SUM(COALESCE(top2_chars, 0)) AS BIGINT) AS top2_sum,
          |       CAST(SUM(COALESCE(dup3_chars, 0)) AS BIGINT) AS dup3_sum,
          |       CAST(SUM(CASE WHEN COALESCE(top2_chars, 0) * 5 > chars
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_top2_flagged,
          |       CAST(SUM(CASE WHEN COALESCE(dup3_chars, 0) * 10 > chars
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dup3_flagged
          |FROM t LEFT JOIN top2 USING (doc_id) LEFT JOIN dup3 USING (doc_id)
          |GROUP BY source ORDER BY source""".stripMargin)),

    QueryDef(
      "t13_corpus_mixture",
      (s, dir) => Sampling.mixture(
        Tables.load(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.4, "zh" -> 0.4, "de" -> 0.2))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("lang")),
      Some(
        """WITH sz AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
          |r0 AS (
          |  SELECT lang,
          |         CAST(CASE lang WHEN 'en' THEN 0.4 WHEN 'zh' THEN 0.4
          |              WHEN 'de' THEN 0.2 END AS DOUBLE) / n AS ratio
          |  FROM sz WHERE lang IN ('en', 'zh', 'de')),
          |rates AS (SELECT lang, ratio / (SELECT max(ratio) FROM r0) AS rate FROM r0),
          |thr AS (
          |  SELECT lang,
          |         CASE WHEN CAST(round(rate * 65536) AS BIGINT) >= 65536 THEN 'g'
          |              WHEN CAST(round(rate * 65536) AS BIGINT) <= 0 THEN ''
          |              ELSE printf('%04x', CAST(round(rate * 65536) AS BIGINT)) END AS t
          |  FROM rates)
          |SELECT d.lang, count(*) AS kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
          |FROM documents d JOIN thr ON d.lang = thr.lang
          |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < t
          |GROUP BY d.lang ORDER BY d.lang""".stripMargin)),

    // Temperature-sampled corpus mix: keep-rates derived from
    // (n_c/N)^(1/T) with T=2 — the standard multilingual rebalance that
    // upweights low-resource classes (the smallest language keeps 100%,
    // the dominant one is thinned). Same deterministic md5-threshold
    // membership as t13, so DuckDB recomputes the exact kept set.
    QueryDef(
      "t32_temperature_mix",
      (s, dir) => Sampling.temperatureMixture(
        Tables.load(s, dir, "documents"), "doc_id", "lang", temperature = 2.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("lang")),
      Some(
        """WITH sz AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
          |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM sz),
          |r0 AS (SELECT lang, pow(n / tot.t, 0.5) / n AS ratio FROM sz, tot),
          |rates AS (SELECT lang, ratio / (SELECT max(ratio) FROM r0) AS rate FROM r0),
          |thr AS (
          |  SELECT lang,
          |         CASE WHEN CAST(round(rate * 65536) AS BIGINT) >= 65536 THEN 'g'
          |              WHEN CAST(round(rate * 65536) AS BIGINT) <= 0 THEN ''
          |              ELSE printf('%04x', CAST(round(rate * 65536) AS BIGINT)) END AS t
          |  FROM rates)
          |SELECT d.lang, count(*) AS kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
          |FROM documents d JOIN thr ON d.lang = thr.lang
          |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < t
          |GROUP BY d.lang ORDER BY d.lang""".stripMargin)),

    // Character-class quality metrics (the Gopher/C4 composition rules):
    // alpha/digit/symbol ratios + mean word length, all codegen'd
    // regexp-strip length arithmetic — both engines compute the identical
    // counts, so the ratios hash-match exactly
    QueryDef(
      "t12_char_classes",
      (s, dir) => TextAnalysis.charClassStats(
        Tables.load(s, dir, "documents").where(col("doc_id") < 50),
        "doc_id", "text")
        .orderBy(col("doc")),
      Some(
        """SELECT doc_id AS doc,
          |       CAST(length(text) AS INTEGER) AS n_chars,
          |       round((length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
          |             * 1.0 / length(text), 4) AS alpha_ratio,
          |       round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
          |             * 1.0 / length(text), 4) AS digit_ratio,
          |       round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
          |             * 1.0 / length(text), 4) AS symbol_ratio,
          |       round(length(replace(text, ' ', '')) * 1.0
          |             / len(string_split(text, ' ')), 4) AS mean_word_len
          |FROM documents WHERE doc_id < 50 ORDER BY doc""".stripMargin)),

    // Sequence packing (concatenate-then-chunk): deterministic shard-local
    // cumsum layout — the DuckDB oracle reproduces the EXACT packing with
    // the same window arithmetic, proving reruns and audits see identical
    // sequences. One hash shuffle on the shard key; per-shard sorts run in
    // parallel and never a global sort.
    QueryDef(
      "t11_sequence_pack",
      (s, dir) => {
        val packed = graft.ops.Packing.packSequences(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          seqLen = 512, shards = 8)
        graft.ops.Packing.sequenceStats(packed, "doc_id")
          .orderBy(col("shard"), col("seq_idx"))
      },
      Some(
        """WITH p AS (
          |  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
          |              ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
          |              AND 1 PRECEDING), 0) AS tok_start
          |  FROM p),
          |a AS (
          |  -- tok_start is HUGEINT (DuckDB SUM over BIGINT); cast the
          |  -- division back to BIGINT or the hash compare sees 2.0 vs 2
          |  SELECT shard, CAST(tok_start // 512 AS BIGINT) AS seq_idx,
          |         doc_id, n_tokens,
          |         (tok_start % 512) + n_tokens > 512 AS straddles
          |  FROM c)
          |SELECT shard, seq_idx, count(*) AS n_docs,
          |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
          |       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
          |       CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
          |FROM a GROUP BY shard, seq_idx
          |ORDER BY shard, seq_idx""".stripMargin)),

    // Materialized packing: the actual 512-token training rows, digest-
    // checked token-for-token — DuckDB rebuilds every sequence's
    // space-joined stream and the md5s must agree, proving the straddle
    // split (a doc's tail tokens landing in the NEXT row) is identical in
    // both engines. One bounded per-shard cumsum + one hash shuffle on
    // (shard, seq); every aggregate group is <= 512 tokens, so no skew.
    QueryDef(
      "t24_packed_rows",
      (s, dir) => graft.ops.Packing.packedRows(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        seqLen = 512, shards = 8)
        .orderBy(col("shard"), col("seq_idx")),
      Some(
        """WITH p AS (
          |  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
          |         string_split(text, ' ') AS toks,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
          |              ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
          |              AND 1 PRECEDING), 0) AS tok_start
          |  FROM p),
          |tok AS (
          |  SELECT doc_id, shard,
          |         UNNEST(list_transform(range(1, CAST(n_tokens AS INTEGER) + 1),
          |                i -> {'gpos': tok_start + i - 1, 'tok': toks[i]})) AS u
          |  FROM c),
          |t2 AS (
          |  SELECT doc_id, shard, CAST(u.gpos AS BIGINT) AS gpos, u.tok AS tok
          |  FROM tok)
          |SELECT shard, CAST(gpos // 512 AS BIGINT) AS seq_idx,
          |       count(*) AS n_tokens,
          |       count(DISTINCT doc_id) AS n_docs,
          |       md5(string_agg(tok, ' ' ORDER BY gpos)) AS seq_md5
          |FROM t2 GROUP BY shard, seq_idx
          |ORDER BY shard, seq_idx""".stripMargin)),

    // Epoch-deterministic global shuffle: the dataloader permutation as a
    // pure function of (epoch, doc_id) — DuckDB recomputes both epochs'
    // full (shard, pos) layouts and the position-sensitive digests must
    // agree, proving byte-identical read order cross-engine AND that each
    // epoch is an independent reshuffle. The digest is a commutative sum
    // of per-row hashes (exact in DECIMAL(38,0)), so auditing a 100 TB
    // layout is one hash aggregate — no ordered agg over a whole shard.
    QueryDef(
      "t25_epoch_shuffle",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val both = graft.ops.Shuffling.assign(docs, "doc_id", epoch = 1, shards = 8)
          .unionByName(
            graft.ops.Shuffling.assign(docs, "doc_id", epoch = 2, shards = 8))
        graft.ops.Shuffling.shardManifest(both, "doc_id")
          .withColumn("digest", col("digest").cast("string"))
          .orderBy(col("epoch"), col("shard"))
      },
      Some {
        val h60 =
          """list_reduce(list_transform(string_split(
            |  substr(md5(CAST(pos AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 15), ''),
            |  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
            |  (a, b) -> a * 16 + b)""".stripMargin
        s"""WITH e AS (SELECT UNNEST([1, 2]) AS epoch),
           |r AS (
           |  SELECT epoch, doc_id,
           |         md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS rank
           |  FROM documents CROSS JOIN e),
           |s AS (
           |  SELECT epoch, doc_id, rank,
           |         CAST(CAST('0x' || substr(rank, 1, 4) AS INTEGER) % 8 AS INTEGER) AS shard
           |  FROM r),
           |p AS (
           |  SELECT epoch, shard, doc_id,
           |         row_number() OVER (PARTITION BY epoch, shard
           |                            ORDER BY rank, doc_id) - 1 AS pos
           |  FROM s)
           |SELECT epoch, shard, count(*) AS n_docs,
           |       CAST(SUM($h60) AS VARCHAR) AS digest
           |FROM p GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin
      }),

    // Leakage-free train/valid split: a deterministic md5-threshold
    // holdout, then every train doc sharing >= 3 distinct 3-grams with
    // any holdout doc is EXCLUDED (the decontamination gate applied to
    // your own eval split — the step that keeps the benchmark honest).
    // Composition of Sampling.deterministicSample + Dedup.contamination:
    // the holdout side broadcasts, the corpus is touched in one narrow
    // pass, and the verdict is a per-(lang, split) tally. DuckDB
    // recomputes membership, overlap, and exclusion exactly.
    QueryDef(
      "t26_leakfree_split",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val thr = Sampling.thresholdHex(0.05, 4)
        val tagged = docs.withColumn("is_valid",
          Sampling.hashBucket(col("doc_id")) < lit(thr))
        val excl = Dedup.contamination(
          tagged.filter(!col("is_valid")), tagged.filter(col("is_valid")),
          "doc_id", "text", n = 3, minShared = 3)
          .select(col("c_doc").as("doc_id")).distinct()
          .withColumn("is_excl", lit(true))
        tagged.join(excl, Seq("doc_id"), "left")
          .withColumn("split",
            when(col("is_valid"), "valid")
              .when(col("is_excl"), "excluded")
              .otherwise("train"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("long")).as("n_chars"))
          .orderBy(col("lang"), col("split"))
      },
      Some(
        """WITH sh AS (
          |  SELECT DISTINCT doc_id AS doc, s AS sh FROM (
          |    SELECT doc_id,
          |           unnest(list_transform(generate_series(1, len(w) - 2),
          |                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
          |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
          |  WHERE s <> ''),
          |v AS (SELECT doc_id FROM documents
          |      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccd'),
          |cv AS (SELECT doc, sh FROM sh WHERE doc IN (SELECT doc_id FROM v)),
          |ct AS (SELECT doc, sh FROM sh WHERE doc NOT IN (SELECT doc_id FROM v)),
          |excl AS (SELECT DISTINCT doc FROM (
          |  SELECT c.doc FROM ct c JOIN cv p USING (sh)
          |  GROUP BY c.doc, p.doc HAVING count(*) >= 3))
          |SELECT lang,
          |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccd' THEN 'valid'
          |       WHEN doc_id IN (SELECT doc FROM excl) THEN 'excluded'
          |       ELSE 'train' END AS split,
          |  count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
          |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin)),

    // Multimodal resize: stride-resample to 16 bytes inside the decode
    // stage (no shuffle); DuckDB reconstructs the identical sample from the
    // raw text bytes, so the resample arithmetic is hash-checked.
    QueryDef(
      "m3_media_resize",
      (s, dir) => {
        val media = Multimodal.asMedia(
          Tables.load(s, dir, "documents").where(col("doc_id") < 40),
          "doc_id", "text", "text/plain")
        Multimodal.resize(s, media, target = 16)
          .select(col("id"), col("src_bytes"), col("out_bytes"),
            hex(col("media")).as("resized_hex"))
          .orderBy(col("id"))
      },
      Some(
        // the corpus is ASCII, so char positions == byte positions (same
        // equivalence m1 relies on); DuckDB substring has no BLOB overload
        """WITH p AS (
          |  SELECT doc_id, text, length(text) AS len,
          |         greatest(1, length(text) // 16) AS stride,
          |         least(16, length(text)) AS n_out
          |  FROM documents WHERE doc_id < 40)
          |SELECT doc_id AS id, CAST(len AS INTEGER) AS src_bytes,
          |       CAST(n_out AS INTEGER) AS out_bytes,
          |       array_to_string(list_transform(range(0, n_out),
          |         i -> hex(CAST(substr(text, CAST(least(i * stride, len - 1) AS INTEGER) + 1, 1) AS BLOB))),
          |         '') AS resized_hex
          |FROM p ORDER BY id""".stripMargin)),

    // ---- multimodal plumbing (stubbed decode, real Spark shape) ---------
    QueryDef(
      "m1_media_features",
      (s, dir) => {
        val media = Multimodal.asMedia(
          Tables.load(s, dir, "documents"), "doc_id", "text", "text/plain")
        Multimodal.extractFeatures(s, media)
          .where(col("id") < 40)
          .select(col("id"), col("n_bytes"), col("digest"),
            upper(col("head_hex")).as("head_hex"),
            round(col("brightness"), 4).as("brightness"),
            col("content_type"))
          .orderBy(col("id"))
      },
      Some(
        """SELECT doc_id AS id,
          |       CAST(length(text) AS BIGINT) AS n_bytes,
          |       md5(text) AS digest,
          |       hex(CAST(substr(text, 1, 8) AS BLOB)) AS head_hex,
          |       round(list_reduce(list_transform(generate_series(1, length(text)),
          |               i -> ascii(substr(text, i, 1)) * 1.0), (x, y) -> x + y)
          |             / length(text), 4) AS brightness,
          |       'text/plain' AS content_type
          |FROM documents WHERE doc_id < 40 ORDER BY id""".stripMargin)),

    // REAL audio path: each doc's text bytes are synthesized into an
    // actual RIFF/PCM16 mono WAV (sample i = ((byte*37+i*11)%256-128)*256)
    // on executors, then a real RIFF chunk-list parser recovers the rate
    // and samples and computes the standard audio-curation features (RMS
    // energy, zero-crossing count, peak, duration). DuckDB recomputes
    // every feature from the synthesis formula over the text characters —
    // so the WAV encode→parse round trip is hash-verified end to end.
    // Both stages are narrow mapPartitions (no shuffle) — the only shape
    // that survives a 100 TB media scan.
    QueryDef(
      "m5_audio_features",
      (s, dir) => {
        val media = Multimodal.asMedia(
          Tables.load(s, dir, "documents").where(col("doc_id") < 40),
          "doc_id", "text", "text/plain")
        Multimodal.audioFeatures(s, Multimodal.synthesizeWav(s, media))
          .select(col("id"), col("n_samples"), col("sample_rate"),
            col("duration_ms"), round(col("rms"), 4).as("rms"),
            col("zero_crossings"), col("peak"))
          .orderBy(col("id"))
      },
      Some(
        """WITH p AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
          |s AS (
          |  SELECT doc_id,
          |         UNNEST(list_transform(generate_series(1, length(text)),
          |                i -> {'i': i,
          |                      'smp': ((ascii(substr(text, i, 1)) * 37 + (i - 1) * 11) % 256 - 128) * 256})) AS u
          |  FROM p),
          |t AS (SELECT doc_id, u.i AS i, u.smp AS smp FROM s),
          |c AS (
          |  SELECT doc_id, i, smp,
          |         CASE WHEN i > 1 AND ((smp >= 0) <>
          |              (lag(smp) OVER (PARTITION BY doc_id ORDER BY i) >= 0))
          |              THEN 1 ELSE 0 END AS x
          |  FROM t)
          |SELECT doc_id AS id, count(*) AS n_samples, 8000 AS sample_rate,
          |       CAST(count(*) * 1000 // 8000 AS BIGINT) AS duration_ms,
          |       round(sqrt(CAST(SUM(CAST(smp AS BIGINT) * smp) AS DOUBLE)
          |                  / count(*)), 4) AS rms,
          |       CAST(SUM(x) AS BIGINT) AS zero_crossings,
          |       CAST(MAX(abs(smp)) AS INTEGER) AS peak
          |FROM c GROUP BY doc_id ORDER BY id""".stripMargin)),

    // REAL video keyframe extraction: each doc gets a deterministic
    // 6-frame animated gray GIF (frame f pixel i = (id*31+f*13+i*7)%127+1)
    // and the REAL multi-frame ImageIO reader samples 3 evenly-spaced
    // frames (stride 6/3=2 -> video frames 0,2,4), decoding each to gray8
    // pixels. DuckDB reproduces every sampled frame's pixel buffer from
    // the generative formula (values 1..127 round-trip as ASCII) — so the
    // GIF encode -> multi-frame decode -> sample pipeline is hash-checked
    // end to end. Narrow mapPartitions, one reader per medium, no shuffle.
    QueryDef(
      "m6_video_keyframes",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 25)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids
          .map(id => (id, Multimodal.gifFixture(id, 8, 8, frames = 6), "image/gif"))
          .toDF("id", "media", "content_type")
        Multimodal.videoKeyFrames(s, media, n = 3)
          .select(col("id"), col("frame_idx"), col("n_frames"), col("n_bytes"),
            col("frame_digest"), round(col("brightness"), 4).as("brightness"))
          .orderBy(col("id"), col("frame_idx"))
      },
      Some(
        """WITH fr AS (
          |  SELECT doc_id AS id, s * 2 AS frame_idx,
          |         list_transform(range(0, 64),
          |           i -> ((doc_id * 31 + (s * 2) * 13 + i * 7) % 127) + 1) AS vals
          |  FROM documents, unnest(generate_series(0, 2)) AS t(s)
          |  WHERE doc_id < 25)
          |SELECT id, CAST(frame_idx AS INTEGER) AS frame_idx,
          |       6 AS n_frames, CAST(64 AS BIGINT) AS n_bytes,
          |       md5(array_to_string(list_transform(vals, v -> chr(CAST(v AS INTEGER))), '')) AS frame_digest,
          |       round(list_reduce(list_transform(vals, v -> CAST(v AS DOUBLE)),
          |                         (a, b) -> a + b) / 64, 4) AS brightness
          |FROM fr ORDER BY id, frame_idx""".stripMargin)),

    // REAL image decode (javax.imageio) through the Decoder seam: each doc
    // gets a deterministic 16x16 gray PNG (pixel i = (id*31+i*7)%127+1),
    // decoded to actual pixel bytes on executors; features (byte count,
    // md5 of the pixel buffer, mean brightness) are recomputed by DuckDB
    // from the generative formula — pixel values are 1..127, so the buffer
    // round-trips as single-byte UTF-8 text for the oracle's md5
    QueryDef(
      "m4_image_decode",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 40)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids
          .map(id => (id, Multimodal.pngFixture(id, 16, 16), "image/png"))
          .toDF("id", "media", "content_type")
        Multimodal.extractFeatures(s, media, Multimodal.ImageIoDecoder)
          .select(col("id"), col("n_bytes"), col("digest"),
            round(col("brightness"), 4).as("brightness"))
          .orderBy(col("id"))
      },
      Some(
        """WITH px AS (
          |  SELECT doc_id AS id,
          |         list_transform(range(0, 256),
          |           i -> ((doc_id * 31 + i * 7) % 127) + 1) AS vals
          |  FROM documents WHERE doc_id < 40)
          |SELECT id, CAST(256 AS BIGINT) AS n_bytes,
          |       md5(array_to_string(list_transform(vals, v -> chr(CAST(v AS INTEGER))), '')) AS digest,
          |       round(list_reduce(list_transform(vals, v -> CAST(v AS DOUBLE)),
          |                         (a, b) -> a + b) / 256, 4) AS brightness
          |FROM px ORDER BY id""".stripMargin)),

    // Image near-dup dedup by PERCEPTUAL HASH over real decoded pixels:
    // PNGs decode via javax.imageio on executors, the average-hash (8x8
    // block means vs global mean, pure integer arithmetic) is computed in
    // the same pass, and near-dups surface via 4x16-bit pigeonhole bands
    // + exact hamming verify (codegen'd conv/xor/bit_count). The fixture
    // makes ids sharing doc_id div 4 near-identical images (hamming 0-1)
    // and different seeds far (>= 4); DuckDB recomputes pixels from the
    // generative formula and must reproduce every hash and distance.
    QueryDef(
      "m7_image_ahash_dedup",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 40)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids
          .map(id => (id, Multimodal.pngFixtureVariant(id / 4, id % 4, 16, 16),
            "image/png"))
          .toDF("id", "media", "content_type")
        val hashes = Multimodal.imageHashes(s, media,
          Multimodal.ImageIoDecoder, 16, 16)
        Multimodal.aHashNearDups(hashes, maxDist = 3)
          .orderBy(col("a"), col("b"))
      },
      Some(
        """WITH px AS (
          |  SELECT doc_id AS id,
          |         list_transform(range(0, 256),
          |           i -> ((doc_id // 4 * 31 + i * 7) % 120) + 1 +
          |                CASE WHEN i % 37 = doc_id % 4 THEN 4 ELSE 0 END) AS vals
          |  FROM documents WHERE doc_id < 40),
          |tot AS (SELECT id, vals, list_reduce(vals, (a, b) -> a + b) AS total FROM px),
          |bits AS (
          |  SELECT id, array_to_string(list_transform(range(0, 64), b ->
          |    CASE WHEN (
          |      vals[CAST((b // 8) * 32 + (b % 8) * 2 + 1 AS INT)] +
          |      vals[CAST((b // 8) * 32 + (b % 8) * 2 + 2 AS INT)] +
          |      vals[CAST((b // 8) * 32 + 16 + (b % 8) * 2 + 1 AS INT)] +
          |      vals[CAST((b // 8) * 32 + 16 + (b % 8) * 2 + 2 AS INT)]) * 256 > total * 4
          |    THEN '1' ELSE '0' END), '') AS ahash
          |  FROM tot),
          |bands AS (
          |  SELECT id, ahash, b AS band, substr(ahash, CAST(b * 16 + 1 AS INT), 16) AS bucket
          |  FROM bits, unnest(generate_series(0, 3)) AS t(b)),
          |cand AS (
          |  SELECT DISTINCT l.id AS a, r.id AS b2, l.ahash AS ha, r.ahash AS hb
          |  FROM bands l JOIN bands r
          |    ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
          |ham AS (
          |  SELECT a, b2, CAST(list_sum(list_transform(range(1, 65), i ->
          |    CASE WHEN substr(ha, CAST(i AS INT), 1) <> substr(hb, CAST(i AS INT), 1)
          |         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
          |  FROM cand)
          |SELECT a, b2 AS b, hamming FROM ham
          |WHERE hamming <= 3 ORDER BY a, b""".stripMargin)),

    // IMAGE-TEXT PAIR DEDUP (LAION-style curation): near-dup image
    // clusters (m7's perceptual-hash pairs → connected components)
    // collapse to one pair each, keeping the member with the longest
    // caption (ties to smallest id); unmatched images survive as their
    // own cluster. The oracle replays the pixel ahash, the banded
    // candidate join, the hamming verify, the transitive closure, AND the
    // caption argmax — the whole curation decision is hash-proven.
    QueryDef(
      "m10_pair_dedup",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 40)
        val ids = docs.select(col("doc_id").cast("long")).as[Long]
        val media = ids
          .map(id => (id, Multimodal.pngFixtureVariant(id / 4, id % 4, 16, 16),
            "image/png"))
          .toDF("id", "media", "content_type")
        val pairs = Multimodal.aHashNearDups(
          Multimodal.imageHashes(s, media, Multimodal.ImageIoDecoder, 16, 16),
          maxDist = 3)
        Multimodal.captionAwareKeepers(pairs, docs, "doc_id", "text")
          .orderBy(col("cluster"))
      },
      Some(
        """WITH RECURSIVE px AS (
          |  SELECT doc_id AS id,
          |         list_transform(range(0, 256),
          |           i -> ((doc_id // 4 * 31 + i * 7) % 120) + 1 +
          |                CASE WHEN i % 37 = doc_id % 4 THEN 4 ELSE 0 END) AS vals
          |  FROM documents WHERE doc_id < 40),
          |tot AS (SELECT id, vals, list_reduce(vals, (a, b) -> a + b) AS total FROM px),
          |bits AS (
          |  SELECT id, array_to_string(list_transform(range(0, 64), b ->
          |    CASE WHEN (
          |      vals[CAST((b // 8) * 32 + (b % 8) * 2 + 1 AS INT)] +
          |      vals[CAST((b // 8) * 32 + (b % 8) * 2 + 2 AS INT)] +
          |      vals[CAST((b // 8) * 32 + 16 + (b % 8) * 2 + 1 AS INT)] +
          |      vals[CAST((b // 8) * 32 + 16 + (b % 8) * 2 + 2 AS INT)]) * 256 > total * 4
          |    THEN '1' ELSE '0' END), '') AS ahash
          |  FROM tot),
          |bands AS (
          |  SELECT id, ahash, b AS band, substr(ahash, CAST(b * 16 + 1 AS INT), 16) AS bucket
          |  FROM bits, unnest(generate_series(0, 3)) AS t(b)),
          |cand AS (
          |  SELECT DISTINCT l.id AS a, r.id AS b2, l.ahash AS ha, r.ahash AS hb
          |  FROM bands l JOIN bands r
          |    ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
          |ham AS (
          |  SELECT a, b2, CAST(list_sum(list_transform(range(1, 65), i ->
          |    CASE WHEN substr(ha, CAST(i AS INT), 1) <> substr(hb, CAST(i AS INT), 1)
          |         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
          |  FROM cand),
          |pr AS (SELECT a, b2 AS b FROM ham WHERE hamming <= 3),
          |edges AS (SELECT a AS src, b AS dst FROM pr
          |          UNION ALL SELECT b, a FROM pr),
          |cc AS (
          |  SELECT DISTINCT src AS node, src AS label FROM edges
          |  UNION
          |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node),
          |labels AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node),
          |alld AS (
          |  SELECT d.doc_id AS node, CAST(length(d.text) AS BIGINT) AS cap_len,
          |         COALESCE(l.cluster, d.doc_id) AS cluster
          |  FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
          |  WHERE d.doc_id < 40),
          |pick AS (
          |  SELECT cluster, node, cap_len,
          |         row_number() OVER (PARTITION BY cluster
          |           ORDER BY cap_len DESC, node) AS rn,
          |         count(*) OVER (PARTITION BY cluster) AS n_members
          |  FROM alld)
          |SELECT cluster, n_members, node AS keeper, cap_len AS keeper_cap_len
          |FROM pick WHERE rn = 1 ORDER BY cluster""".stripMargin)),

    // CLIP-SCORE pair-alignment filter (the other LAION gate, beside
    // m10's dedup): each pair i couples an "image" embedding (vec i) with
    // a "text" embedding (vec (i*7+3) mod 500 — a deterministic
    // misalignment shuffle, so scores span the whole range); pairs whose
    // cosine clears the threshold survive. One equi-join on the pair id
    // (the only corpus-sized shuffle) + the codegen'd dot kernel; the
    // oracle replays the identical sequential-fold float math.
    QueryDef(
      "m11_pair_alignment",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings").where(col("vec_id") < 500)
        val img = e.select(col("vec_id").as("pair"),
          col("embedding").as("img_emb"))
        val txt = e.select(col("vec_id").as("tkey"),
          col("embedding").as("txt_emb"))
        val pairs = img
          .withColumn("tkey", pmod(col("pair") * 7 + 3, lit(500L)))
          .join(txt, Seq("tkey"))
        graft.ops.Multimodal
          .alignmentFilter(pairs, "img_emb", "txt_emb", threshold = 0.2)
          .select(col("pair"), round(col("alignment"), 4).as("alignment"))
          .orderBy(col("pair"))
      },
      Some(
        s"""WITH img AS (
           |  SELECT vec_id AS pair, embedding AS img_emb,
           |         (vec_id * 7 + 3) % 500 AS tkey
           |  FROM embeddings WHERE vec_id < 500),
           |sc AS (
           |  SELECT img.pair,
           |         ${duckCosine("img.img_emb", "t.embedding")} AS alignment
           |  FROM img JOIN embeddings t ON t.vec_id = img.tkey)
           |SELECT pair, round(alignment, 4) AS alignment
           |FROM sc WHERE alignment >= 0.2 ORDER BY pair""".stripMargin)),

    // VAD-STYLE SILENCE SEGMENTATION (trim-silence for audio corpus
    // prep): real WAVs decode on executors, 50-sample frames score an
    // integer energy, frames strictly above the clip-mean merge into
    // speech segments — decode, threshold AND the gaps-and-islands merge
    // all in-row inside ONE mapPartitions pass, so the operator is
    // shuffle-free at any corpus size. Fixture: every third 200-sample
    // block is silence; the oracle recomputes every sample from the
    // formula, then replays framing, the cross-multiplied threshold, and
    // the island numbering relationally.
    QueryDef(
      "m12_speech_segments",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 30)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids
          .map(id => (id, Multimodal.wavSpeechFixture(id, 2400), "audio/wav"))
          .toDF("id", "media", "content_type")
        Multimodal.speechSegments(s, media, frameLen = 50)
          .orderBy(col("id"), col("seg"))
      },
      Some(
        """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 30),
          |sm AS (
          |  SELECT id, i,
          |         CASE WHEN ((i // 200 + id) % 3) = 0 THEN 0
          |              ELSE ((i * 13 + id * 31) % 256 - 128) * 200
          |         END AS s
          |  FROM ids, range(0, 2400) r(i)),
          |fr AS (SELECT id, i // 50 AS f, SUM(s * s) AS fe FROM sm GROUP BY 1, 2),
          |tt AS (SELECT id, SUM(fe) AS tot, count(*) AS nf FROM fr GROUP BY 1),
          |fl AS (SELECT fr.id, f, fe, fe * nf > tot AS speech
          |       FROM fr JOIN tt USING (id)),
          |br AS (SELECT id, f, fe, speech,
          |         CASE WHEN speech AND COALESCE(
          |             lag(speech) OVER (PARTITION BY id ORDER BY f), false)
          |             = false
          |           THEN 1 ELSE 0 END AS brk
          |       FROM fl),
          |sg AS (SELECT id, f, fe, speech,
          |         SUM(brk) OVER (PARTITION BY id ORDER BY f
          |                        ROWS UNBOUNDED PRECEDING) AS seg
          |       FROM br)
          |SELECT id, CAST(seg AS INT) AS seg,
          |       CAST(min(f) AS INT) AS start_frame,
          |       CAST(max(f) AS INT) AS end_frame,
          |       CAST(count(*) AS INT) AS n_frames,
          |       CAST(SUM(fe) AS BIGINT) AS energy
          |FROM sg WHERE speech GROUP BY id, seg
          |ORDER BY id, seg""".stripMargin)),

    // VIDEO SCENE-CUT SEGMENTATION — the shot-boundary step of video
    // corpus prep (sample one frame per SHOT before captioning/dedup,
    // not one per second): consecutive decoded GIF frames score an
    // integer sum-of-absolute-differences; mean |Δ| above 1/2
    // (cross-multiplied, float-free) is a cut, frames between cuts merge
    // into shots — decode, diff, threshold, and island merge all in-row
    // (shuffle-free at any corpus size). The fixture's scene structure —
    // identical frames within a scene, a pixel re-base at every cut —
    // replays from its formula, so the oracle recomputes every pixel,
    // every frame diff, and the same gaps-and-islands fold.
    QueryDef(
      "m14_video_scene_cuts",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 20)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids
          .map(id => (id, Multimodal.gifSceneFixture(id, 8, 8, frames = 9),
            "image/gif"))
          .toDF("id", "media", "content_type")
        Multimodal.sceneCuts(s, media)
          .orderBy(col("id"), col("scene"))
      },
      Some(
        """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 20),
          |mkr AS (
          |  SELECT id, f,
          |         CASE WHEN f > 0 AND (f + id) % 3 = 0 THEN 1 ELSE 0 END AS c
          |  FROM ids, range(0, 9) t(f)),
          |scn AS (
          |  SELECT id, f, SUM(c) OVER (PARTITION BY id ORDER BY f) AS scene
          |  FROM mkr),
          |px AS (
          |  SELECT s.id, s.f, i.i,
          |         ((s.id * 31 + s.scene * 57 + i.i * 7) % 127) + 1 AS p
          |  FROM scn s, range(0, 64) i(i)),
          |dif AS (
          |  SELECT b.id, b.f, SUM(abs(a.p - b.p)) AS sad
          |  FROM px b JOIN px a ON a.id = b.id AND a.i = b.i AND a.f = b.f - 1
          |  GROUP BY 1, 2),
          |brk AS (
          |  SELECT id, f, CASE WHEN sad * 2 > 1 * 64 THEN 1 ELSE 0 END AS c
          |  FROM dif),
          |sg AS (
          |  SELECT m.id, m.f,
          |         COALESCE(SUM(b.c) OVER (PARTITION BY m.id ORDER BY m.f), 0)
          |           AS scene
          |  FROM (SELECT id, f FROM ids, range(0, 9) t(f)) m
          |  LEFT JOIN brk b ON b.id = m.id AND b.f = m.f)
          |SELECT id, CAST(scene AS INT) AS scene,
          |       CAST(min(f) AS INT) AS start_frame,
          |       CAST(max(f) AS INT) AS end_frame,
          |       CAST(count(*) AS INT) AS n_frames
          |FROM sg GROUP BY id, scene ORDER BY id, scene""".stripMargin)),

    // AUDIO QUERY-BY-SNIPPET via landmark constellation (the Shazam index
    // shape, Wang 2003): 40 deterministic PCM16 tracks land as a landmark
    // inverted index — per 64-sample frame, the argmax-energy band of 8
    // is the frame's PEAK; landmarks pair each peak with the next 3
    // frames' peaks. Five frame-aligned snippets (1024 samples cut from
    // the middle of five tracks) probe the index: matched landmark keys
    // VOTE on (track, aligned offset), and the true source wins with its
    // votes piled on ONE offset while chance key collisions scatter —
    // offset-robust retrieval that m5's whole-clip fingerprint cannot do.
    // Decode -> frames -> peaks -> pairing run in-row (shuffle-free index
    // build); the snippet side broadcasts; the only shuffle is the vote
    // aggregate over matched rows. The oracle recomputes every sample
    // from the fixture formula and replays peaks, landmarks, and the
    // vote argmax — integer arithmetic end to end.
    QueryDef(
      "m13_audio_landmark_match",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 40)
          .select(col("doc_id").cast("long")).as[Long]
        val tracks = ids
          .map(id => (id, Multimodal.wavTrackFixture(id, 2400), "audio/wav"))
          .toDF("id", "media", "content_type")
        val snips = Seq((0L, 3L, 320), (1L, 7L, 512), (2L, 11L, 640),
          (3L, 19L, 960), (4L, 23L, 1280))
        val queries = snips
          .map { case (q, src, off) =>
            (q, Multimodal.wavTrackFixture(src, 1024, from = off), "audio/wav")
          }
          .toDF("id", "media", "content_type")
        Multimodal.landmarkMatches(
          Multimodal.audioLandmarks(s, tracks),
          Multimodal.audioLandmarks(s, queries))
          .orderBy(col("q"))
      },
      Some(
        """WITH tids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 40),
          |csm AS (
          |  SELECT id, i,
          |         ((i % 64) * ((i // 64) % 7 + id % 5 + 3) + (i // 64) * (17 + id % 11)
          |          + id * 29) % 256 - 128 AS v
          |  FROM tids, range(0, 2400) r(i)),
          |cbe AS (
          |  SELECT id, i // 64 AS t, (i % 64) // 8 AS b,
          |         SUM((v * 200) * (v * 200)) AS e
          |  FROM csm GROUP BY 1, 2, 3),
          |cpk AS (SELECT id, t, b FROM (
          |  SELECT id, t, b,
          |         row_number() OVER (PARTITION BY id, t ORDER BY e DESC, b) AS rn
          |  FROM cbe) WHERE rn = 1),
          |fans AS (SELECT unnest(generate_series(1, 3)) AS dt),
          |clm AS (
          |  SELECT a.id, a.t AS t1, a.b AS b1, c.b AS b2, d.dt
          |  FROM cpk a JOIN fans d ON true
          |  JOIN cpk c ON c.id = a.id AND c.t = a.t + d.dt),
          |qdef(q, src, off) AS (
          |  VALUES (0, 3, 320), (1, 7, 512), (2, 11, 640),
          |         (3, 19, 960), (4, 23, 1280)),
          |qsm AS (
          |  SELECT d.q, r.i,
          |         (((r.i + d.off) % 64) * (((r.i + d.off) // 64) % 7 + d.src % 5 + 3)
          |          + ((r.i + d.off) // 64) * (17 + d.src % 11)
          |          + d.src * 29) % 256 - 128 AS v
          |  FROM qdef d, range(0, 1024) r(i)),
          |qbe AS (
          |  SELECT q, i // 64 AS t, (i % 64) // 8 AS b,
          |         SUM((v * 200) * (v * 200)) AS e
          |  FROM qsm GROUP BY 1, 2, 3),
          |qpk AS (SELECT q, t, b FROM (
          |  SELECT q, t, b,
          |         row_number() OVER (PARTITION BY q, t ORDER BY e DESC, b) AS rn
          |  FROM qbe) WHERE rn = 1),
          |qlm AS (
          |  SELECT a.q, a.t AS t1, a.b AS b1, c.b AS b2, d.dt
          |  FROM qpk a JOIN fans d ON true
          |  JOIN qpk c ON c.q = a.q AND c.t = a.t + d.dt),
          |votes AS (
          |  SELECT ql.q, c.id AS track, c.t1 - ql.t1 AS "offset",
          |         count(*) AS votes
          |  FROM clm c JOIN qlm ql
          |    ON c.b1 = ql.b1 AND c.b2 = ql.b2 AND c.dt = ql.dt
          |  GROUP BY 1, 2, 3)
          |SELECT q, track, "offset", votes FROM (
          |  SELECT q, track, "offset", votes,
          |         row_number() OVER (PARTITION BY q
          |           ORDER BY votes DESC, track, "offset") AS rn
          |  FROM votes) WHERE rn = 1
          |ORDER BY q""".stripMargin)),

    // Audio near-dup dedup by ACOUSTIC FINGERPRINT over real PCM: WAVs
    // parse through the real RIFF codec on executors, the 64-frame
    // energy-envelope fingerprint is computed in the same pass (integer
    // cross-multiplication), and near-dups ride the SAME 4x16-bit banding
    // + hamming verifier as the image hash — one shuffle on the band
    // bucket, samples never leave the fingerprint pass. Fixture: ids
    // sharing doc_id div 4 are the same signal with a tiny perturbation
    // (hamming 0-2), different seeds have a different period structure
    // (>= 4); DuckDB recomputes every fingerprint from the sample formula.
    QueryDef(
      "m8_audio_fingerprint_dedup",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 40)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids
          .map(id => (id, Multimodal.wavFixtureVariant(id / 4, id % 4, 1024),
            "audio/wav"))
          .toDF("id", "media", "content_type")
        val prints = Multimodal.audioFingerprint(s, media)
        Multimodal.aHashNearDups(prints, maxDist = 3)
          .orderBy(col("a"), col("b"))
      },
      Some(
        """WITH sm AS (
          |  SELECT doc_id AS id,
          |         list_transform(range(0, 1024),
          |           i -> CAST((((i * 11 + doc_id // 4 * 97) * (doc_id // 4 % 7 + 3)) % 256 - 128) * 250 +
          |                CASE WHEN i % 97 = doc_id % 4 THEN 512 ELSE 0 END AS BIGINT)) AS vals
          |  FROM documents WHERE doc_id < 40),
          |tot AS (
          |  SELECT id, vals,
          |         list_reduce(list_transform(vals, v -> v * v), (a, b) -> a + b) AS total
          |  FROM sm),
          |bits AS (
          |  SELECT id, array_to_string(list_transform(range(0, 64), f ->
          |    CASE WHEN list_reduce(list_transform(vals[CAST(f * 16 + 1 AS INT):CAST(f * 16 + 16 AS INT)],
          |                                         v -> v * v), (a, b) -> a + b) * 64 > total
          |    THEN '1' ELSE '0' END), '') AS ahash
          |  FROM tot),
          |bands AS (
          |  SELECT id, ahash, b AS band, substr(ahash, CAST(b * 16 + 1 AS INT), 16) AS bucket
          |  FROM bits, unnest(generate_series(0, 3)) AS t(b)),
          |cand AS (
          |  SELECT DISTINCT l.id AS a, r.id AS b2, l.ahash AS ha, r.ahash AS hb
          |  FROM bands l JOIN bands r
          |    ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
          |ham AS (
          |  SELECT a, b2, CAST(list_sum(list_transform(range(1, 65), i ->
          |    CASE WHEN substr(ha, CAST(i AS INT), 1) <> substr(hb, CAST(i AS INT), 1)
          |         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
          |  FROM cand)
          |SELECT a, b2 AS b, hamming FROM ham
          |WHERE hamming <= 3 ORDER BY a, b""".stripMargin)),

    // Video near-dup dedup over REAL multi-frame decode: animated GIFs
    // decode through the multi-frame ImageIO reader, 3 evenly-spaced
    // keyframes hash in the same pass, and two videos match only when
    // EVERY sampled frame pair is within hamming 3 (frame-level banding +
    // codegen'd verify + an all-frames aggregate). Completes the
    // image/audio/video perceptual-dedup triad on one shared verifier.
    QueryDef(
      "m9_video_fingerprint_dedup",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 40)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids
          .map(id => (id, Multimodal.gifFixtureVariant(id / 4, id % 4, 16, 16,
            frames = 6), "image/gif"))
          .toDF("id", "media", "content_type")
        val prints = Multimodal.videoFingerprints(s, media, n = 3, 16, 16)
        Multimodal.videoNearDups(prints, nFrames = 3, maxDist = 3)
          .orderBy(col("a"), col("b"))
      },
      Some(
        """WITH fr AS (
          |  SELECT doc_id AS id, s * 2 AS f,
          |         list_transform(range(0, 256),
          |           i -> ((doc_id // 4 * 31 + s * 2 * 13 + i * 7) % 120) + 1 +
          |                CASE WHEN i % 37 = doc_id % 4 THEN 4 ELSE 0 END) AS vals
          |  FROM documents, unnest(generate_series(0, 2)) AS t(s)
          |  WHERE doc_id < 40),
          |tot AS (SELECT id, f, vals, list_reduce(vals, (a, b) -> a + b) AS total FROM fr),
          |bits AS (
          |  SELECT id, f, array_to_string(list_transform(range(0, 64), b ->
          |    CASE WHEN (
          |      vals[CAST((b // 8) * 32 + (b % 8) * 2 + 1 AS INT)] +
          |      vals[CAST((b // 8) * 32 + (b % 8) * 2 + 2 AS INT)] +
          |      vals[CAST((b // 8) * 32 + 16 + (b % 8) * 2 + 1 AS INT)] +
          |      vals[CAST((b // 8) * 32 + 16 + (b % 8) * 2 + 2 AS INT)]) * 256 > total * 4
          |    THEN '1' ELSE '0' END), '') AS ahash
          |  FROM tot),
          |p AS (
          |  SELECT l.id AS a, r.id AS b2, l.f AS f,
          |         CAST(list_sum(list_transform(range(1, 65), i ->
          |           CASE WHEN substr(l.ahash, CAST(i AS INT), 1) <>
          |                     substr(r.ahash, CAST(i AS INT), 1)
          |                THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
          |  FROM bits l JOIN bits r ON l.f = r.f AND l.id < r.id)
          |SELECT a, b2 AS b, max(hamming) AS max_hamming
          |FROM p GROUP BY a, b2
          |HAVING max(hamming) <= 3
          |ORDER BY a, b""".stripMargin)),

    // multimodal frame sampling: 1 media row -> n deterministic "frames"
    // (stubbed keyframe decode, real UDTF-shaped explosion)
    QueryDef(
      "m2_frame_sample",
      (s, dir) => {
        val media = Multimodal.asMedia(
          Tables.load(s, dir, "documents").where(col("doc_id") < 30),
          "doc_id", "text", "video/fake")
        Multimodal.frameSample(s, media, n = 4)
          .select(col("id"), col("frame_idx"),
            length(col("frame")).as("n_bytes"), col("frame_digest"))
          .orderBy(col("id"), col("frame_idx"))
      },
      Some(
        """WITH f AS (
          |  SELECT doc_id AS id, i AS frame_idx,
          |         substr(text, CAST(i * (length(text) // 4) + 1 AS INTEGER),
          |                CAST(length(text) // 4 AS INTEGER)) AS frame_txt
          |  FROM documents, unnest(generate_series(0, 3)) AS t(i)
          |  WHERE doc_id < 30)
          |SELECT id, CAST(frame_idx AS INTEGER) AS frame_idx,
          |       CAST(length(frame_txt) AS INTEGER) AS n_bytes,
          |       md5(frame_txt) AS frame_digest
          |FROM f ORDER BY id, frame_idx""".stripMargin)),

    // LM-perplexity quality scoring (the CCNet/KenLM filter stage): score
    // every doc's NLL under the corpus's own char-bigram LM. The LM is a
    // bounded-cardinality aggregate broadcast back to the scan; per-doc
    // sums are sequential IN-ROW folds over 6dp-rounded log-probs so both
    // engines add identical doubles in identical order (ln is not
    // correctly-rounded across libms — rounding per TERM, not per sum,
    // is what makes this hash-match).
    QueryDef(
      "t14_lm_perplexity",
      (s, dir) => LanguageModel.bigramNll(
        Tables.load(s, dir, "documents").where(col("doc_id") < 60),
        "doc_id", "text")
        .orderBy(col("doc")),
      Some(
        """WITH g0 AS (
          |  SELECT doc_id AS doc,
          |         UNNEST(list_transform(generate_series(1, length(text) - 1),
          |                i -> {'pos': i, 'g': substr(text, i, 2)})) AS u
          |  FROM documents WHERE doc_id < 60 AND length(text) >= 2),
          |grams AS (SELECT doc, u.pos AS pos, u.g AS g FROM g0),
          |lm AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
          |t AS (SELECT CAST(SUM(c) AS DOUBLE) AS tot FROM lm),
          |lmp AS (SELECT g, round(ln(CAST(c AS DOUBLE) / tot), 6) AS logp FROM lm, t),
          |d AS (
          |  SELECT doc, count(*) AS n,
          |         list_reduce(list(logp ORDER BY pos), (a, x) -> a + x) AS s
          |  FROM grams JOIN lmp USING (g) GROUP BY doc)
          |SELECT doc, CAST(n AS INTEGER) AS n_bigrams,
          |       round(-s / n, 4) AS nll, round(exp(round(-s / n, 4)), 2) AS ppl
          |FROM d ORDER BY doc""".stripMargin)),

    // BM25 ranked retrieval (the "find every document about X" corpus
    // audit primitive): tiny query set broadcast against the corpus, so
    // the whole search is one narrow postings pass + a broadcast
    // semi-filter — document frequencies come from the already-filtered
    // postings, never a full-vocabulary aggregate. Score sums fold in
    // term order (collect_list -> array_sort -> aggregate) and idf is
    // 6dp-rounded at birth, so both engines add identical doubles in
    // identical order — same determinism discipline as t14.
    QueryDef(
      "t15_bm25_search",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((0, "hash join merge"), (1, "stream window data"),
          (2, "vector scan filter")).toDF("qid", "qtext")
        TextSearch.bm25TopK(Tables.load(s, dir, "documents"),
            "doc_id", "text", qs, k = 5)
          .orderBy(col("q"), col("rank"))
      },
      Some(
        """WITH q(qid, qtext) AS (VALUES (0, 'hash join merge'),
          |    (1, 'stream window data'), (2, 'vector scan filter')),
          |d AS (SELECT doc_id AS doc,
          |             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
          |      FROM documents),
          |p AS (SELECT doc, dl, term, count(*) AS tf
          |      FROM (SELECT doc, len(w) AS dl, unnest(w) AS term FROM d)
          |      GROUP BY doc, dl, term),
          |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl
          |          FROM (SELECT doc, any_value(dl) AS dl FROM p GROUP BY doc)),
          |qt AS (SELECT DISTINCT qid, unnest(string_split(lower(qtext), ' ')) AS term
          |       FROM q),
          |m AS (SELECT qt.qid, p.doc, p.dl, p.term, p.tf
          |      FROM p JOIN qt USING (term)),
          |dfreq AS (SELECT term, count(DISTINCT doc) AS df FROM m GROUP BY term),
          |contrib AS (
          |  SELECT m.qid, m.doc, m.term,
          |         round(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)), 6) *
          |         (m.tf * (1.2 + 1.0) /
          |          (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl))) AS c
          |  FROM m JOIN dfreq f USING (term) CROSS JOIN stats s),
          |scored AS (
          |  SELECT qid, doc,
          |         list_reduce(list_transform(
          |           list_sort(list(struct_pack(t := term, c := c))), x -> x.c),
          |           (a, b) -> a + b) AS score
          |  FROM contrib GROUP BY qid, doc),
          |r AS (SELECT qid AS q, doc, score,
          |             row_number() OVER (PARTITION BY qid
          |               ORDER BY round(score, 6) DESC, doc) AS rank
          |      FROM scored)
          |SELECT q, rank, doc, round(score, 4) AS score
          |FROM r WHERE rank <= 5 ORDER BY q, rank""".stripMargin)),

    // TF-IDF keyword extraction ("what is this document about"): corpus
    // document frequencies are one term-keyed shuffle (map-side partial
    // aggs — the inverted-index build every engine pays once), the tiny
    // (term, idf) table broadcasts back onto the postings, and the
    // ranking window partitions on doc — no global sort anywhere.
    QueryDef(
      "t16_tfidf_keywords",
      (s, dir) =>
        TextSearch.tfidfTopTerms(Tables.load(s, dir, "documents"),
            "doc_id", "text", m = 3)
          .where(col("doc") < 10)
          .orderBy(col("doc"), col("rank")),
      Some(
        """WITH d AS (SELECT doc_id AS doc,
          |             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
          |           FROM documents),
          |p AS (SELECT doc, dl, term, count(*) AS tf
          |      FROM (SELECT doc, len(w) AS dl, unnest(w) AS term FROM d)
          |      GROUP BY doc, dl, term),
          |stats AS (SELECT count(*) AS n_docs FROM d),
          |dfreq AS (SELECT term,
          |                 round(ln(CAST(s.n_docs AS DOUBLE) / count(DISTINCT doc)), 6) AS idf
          |          FROM p CROSS JOIN stats s GROUP BY term, s.n_docs),
          |scored AS (SELECT doc, term,
          |                  CAST(tf AS DOUBLE) / dl * idf AS tfidf
          |           FROM p JOIN dfreq USING (term)),
          |r AS (SELECT doc, term, tfidf,
          |             row_number() OVER (PARTITION BY doc
          |               ORDER BY round(tfidf, 6) DESC, term) AS rank
          |      FROM scored)
          |SELECT doc, rank, term, round(tfidf, 5) AS tfidf
          |FROM r WHERE rank <= 3 AND doc < 10 ORDER BY doc, rank""".stripMargin)),

    // HYBRID RETRIEVAL with reciprocal-rank fusion: the BM25 lexical leg
    // (t15's machinery) and a dense cosine leg over the feature-hashed
    // bag-of-words embedding, each contributing 1/(60+rank) for its
    // top-10, fused to a final top-5 — the standard RAG retrieval stack.
    // Embedding components are integer-exact (±1 bucket increments), so
    // the dense scores are bit-identical cross-engine with no rounding
    // guard; the oracle replays both legs and the fusion relationally.
    QueryDef(
      "s30_hybrid_rrf",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((0, "hash join merge"), (1, "stream window data"),
          (2, "vector scan filter")).toDF("qid", "qtext")
        TextSearch.hybridTopK(Tables.load(s, dir, "documents"),
            "doc_id", "text", qs, k = 5)
          .orderBy(col("q"), col("rank"))
      },
      Some {
        val embed = (toks: String) =>
          s"""list_transform(generate_series(0, 15), dd ->
             |  list_reduce([CAST(0 AS DOUBLE)] || list_transform($toks, t ->
             |    CAST(CASE WHEN CAST('0x' || substr(md5(t), 1, 2) AS INTEGER) % 16 = dd
             |         THEN CASE WHEN CAST('0x' || substr(md5(t), 3, 1) AS INTEGER) < 8
             |                   THEN 1 ELSE -1 END
             |         ELSE 0 END AS DOUBLE)),
             |    (a, b) -> a + b))""".stripMargin
        s"""WITH q(qid, qtext) AS (VALUES (0, 'hash join merge'),
           |    (1, 'stream window data'), (2, 'vector scan filter')),
           |d AS (SELECT doc_id AS doc,
           |             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           |      FROM documents),
           |p AS (SELECT doc, dl, term, count(*) AS tf
           |      FROM (SELECT doc, len(w) AS dl, unnest(w) AS term FROM d)
           |      GROUP BY doc, dl, term),
           |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl
           |          FROM (SELECT doc, any_value(dl) AS dl FROM p GROUP BY doc)),
           |qt AS (SELECT DISTINCT qid, unnest(string_split(lower(qtext), ' ')) AS term
           |       FROM q),
           |m AS (SELECT qt.qid, p.doc, p.dl, p.term, p.tf
           |      FROM p JOIN qt USING (term)),
           |dfreq AS (SELECT term, count(DISTINCT doc) AS df FROM m GROUP BY term),
           |contrib AS (
           |  SELECT m.qid, m.doc, m.term,
           |         round(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)), 6) *
           |         (m.tf * (1.2 + 1.0) /
           |          (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl))) AS c
           |  FROM m JOIN dfreq f USING (term) CROSS JOIN stats s),
           |scored AS (
           |  SELECT qid, doc,
           |         list_reduce(list_transform(
           |           list_sort(list(struct_pack(t := term, c := c))), x -> x.c),
           |           (a, b) -> a + b) AS score
           |  FROM contrib GROUP BY qid, doc),
           |lex AS (SELECT qid AS q, doc, lex_rank FROM (
           |          SELECT qid, doc,
           |                 row_number() OVER (PARTITION BY qid
           |                   ORDER BY round(score, 6) DESC, doc) AS lex_rank
           |          FROM scored) WHERE lex_rank <= 10),
           |emb AS (SELECT doc, ${embed("w")} AS v FROM d),
           |qemb AS (SELECT qid,
           |                ${embed("list_filter(string_split(lower(qtext), ' '), x -> x <> '')")} AS v
           |         FROM q),
           |cosj AS (SELECT qe.qid AS q, e.doc, ${duckCosine("e.v", "qe.v")} AS cs
           |         FROM emb e CROSS JOIN qemb qe
           |         WHERE (${duckDot("e.v", "e.v")}) > 0
           |           AND (${duckDot("qe.v", "qe.v")}) > 0),
           |sem AS (SELECT q, doc, sem_rank FROM (
           |          SELECT q, doc,
           |                 row_number() OVER (PARTITION BY q
           |                   ORDER BY round(cs, 6) DESC, doc) AS sem_rank
           |          FROM cosj) WHERE sem_rank <= 10),
           |f AS (SELECT COALESCE(l.q, se.q) AS q, COALESCE(l.doc, se.doc) AS doc,
           |             l.lex_rank, se.sem_rank,
           |             COALESCE(CAST(1 AS DOUBLE) / (60 + l.lex_rank), 0) +
           |             COALESCE(CAST(1 AS DOUBLE) / (60 + se.sem_rank), 0) AS rrf
           |      FROM lex l FULL OUTER JOIN sem se
           |        ON l.q = se.q AND l.doc = se.doc),
           |fr AS (SELECT q, doc, lex_rank, sem_rank, rrf,
           |              row_number() OVER (PARTITION BY q
           |                ORDER BY round(rrf, 6) DESC, doc) AS rank
           |       FROM f)
           |SELECT q, rank, doc, lex_rank, sem_rank, round(rrf, 5) AS rrf
           |FROM fr WHERE rank <= 5 ORDER BY q, rank""".stripMargin
      }),

    // RAG/context-window chunking: 64-token windows, 16-token overlap
    // (stride 48). A pure shuffle-free projection (split once → explode
    // chunk index → slice) whose layout law the DuckDB oracle recomputes
    // EXACTLY — chunk boundaries and text bytes both hash-checked, so
    // retrieval provenance (doc, span) is auditable cross-engine.
    QueryDef(
      "t17_rag_chunks",
      (s, dir) => graft.ops.Chunking.chunk(
        Tables.load(s, dir, "documents").where(col("doc_id") < 40),
        "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
        .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
          col("end_tok"), col("n_chunk_tokens"),
          md5(col("chunk")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some(
        """WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS toks,
          |         len(string_split(text, ' ')) AS n
          |  FROM documents WHERE doc_id < 40),
          |i AS (
          |  SELECT doc_id, toks, n,
          |         unnest(range(0, CAST(greatest(1,
          |           ceil((n - 16) / 48.0)) AS BIGINT))) AS i
          |  FROM t),
          |c AS (
          |  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx, toks,
          |         CAST(i * 48 AS BIGINT) AS start_tok,
          |         CAST(least(i * 48 + 64, n) AS BIGINT) AS end_tok
          |  FROM i)
          |SELECT doc_id, chunk_idx, start_tok, end_tok,
          |       end_tok - start_tok AS n_chunk_tokens,
          |       md5(array_to_string(list_slice(toks,
          |         CAST(start_tok + 1 AS INTEGER), CAST(end_tok AS INTEGER)),
          |         ' ')) AS chunk_md5
          |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // One-pass feature assembly: every per-doc quality feature in a SINGLE
    // scan + SINGLE split (production curation shape — at 100 TB the scan
    // is the cost; one-op-at-a-time feature jobs re-read the corpus per
    // feature). OpsSpec asserts one scan + zero exchanges; here every
    // feature value is hash-checked against DuckDB recomputing all of them.
    QueryDef(
      "t18_quality_features",
      (s, dir) => TextAnalysis.featureFrame(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .where(col("doc") < 50)
        .orderBy(col("doc")),
      Some(
        """SELECT doc_id AS doc,
          |       CAST(length(text) AS INTEGER) AS n_chars,
          |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
          |       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
          |       round(len(list_filter(string_split(text, ' '),
          |               w -> w IN ('the','a','of','and','in','to'))) * 1.0
          |             / len(string_split(text, ' ')), 4) AS stopword_ratio,
          |       round((length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
          |             * 1.0 / length(text), 4) AS alpha_ratio,
          |       round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
          |             * 1.0 / length(text), 4) AS symbol_ratio,
          |       CASE WHEN len(list_filter(string_split(text, ' '),
          |               w -> w IN ('the','a','of','and','in','to'))) * 1.0
          |             / len(string_split(text, ' ')) >= 0.04
          |       THEN 'en' ELSE 'und' END AS lang_guess,
          |       CAST((length(text) + 3) // 4 AS INTEGER) AS est_bpe_tokens,
          |       md5(array_to_string(list_sort(list_distinct(
          |         string_split(text, ' '))), ' ')) AS fp
          |FROM documents WHERE doc_id < 50 ORDER BY doc""".stripMargin)),

    // KMV distinct-count sketch (Bar-Yossef k-minimum-values): per
    // event_type, the 32 smallest 60-bit md5 hashes of user_id estimate
    // the distinct-user count as (k−1)/R_k. The rank filter compiles to
    // WindowGroupLimit (per-task partial top-k before the exchange), so
    // the shuffle carries ≤ k rows per group per task — at 100 TB the
    // sketch shuffle is O(k·groups), not O(values), and per-day sketches
    // union-merge without re-reading raw data (Sketches.kmvMerge;
    // mergeability is property-tested in SketchSpec). The exact
    // countDistinct runs alongside purely to hash-check the estimate and
    // expose the error the sketch trades for that scalability.
    QueryDef(
      "u8_kmv_distinct",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val k = 32
        val sk = Sketches.kmvSketch(ev, col("event_type"), col("user_id"), k)
          .select(col("grp").as("event_type"),
            Sketches.kmvEstimate(col("kmv"), col("n_kept"), k).as("kmv_distinct"))
        val exact = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_distinct"))
        sk.join(exact, Seq("event_type"))
          .select(col("event_type"), col("exact_distinct"), col("kmv_distinct"),
            round(abs(col("kmv_distinct") - col("exact_distinct")).cast("double")
              * lit(100.0) / col("exact_distinct").cast("double"), 2).as("err_pct"))
          .orderBy(col("event_type"))
      },
      Some(
        s"""WITH h AS (
           |  SELECT DISTINCT event_type AS grp, ${duckHash60("CAST(user_id AS VARCHAR)")} AS h
           |  FROM events),
           |r AS (
           |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM h),
           |s AS (
           |  SELECT grp, max(rn) AS n_kept, max(CASE WHEN rn = 32 THEN h END) AS hk
           |  FROM r WHERE rn <= 32 GROUP BY grp),
           |est AS (
           |  SELECT grp, CASE WHEN n_kept < 32 THEN n_kept
           |         ELSE CAST(floor(31.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)) AS BIGINT)
           |         END AS kmv_distinct
           |  FROM s),
           |x AS (
           |  SELECT event_type AS grp, count(DISTINCT user_id) AS exact_distinct
           |  FROM events GROUP BY 1)
           |SELECT grp AS event_type, exact_distinct, kmv_distinct,
           |       round(CAST(abs(kmv_distinct - exact_distinct) AS DOUBLE) * 100.0
           |             / CAST(exact_distinct AS DOUBLE), 2) AS err_pct
           |FROM est JOIN x USING (grp) ORDER BY event_type""".stripMargin)),

    // Count-min heavy hitters (Cormode-Muthukrishnan): hot-token detection
    // whose state is a 4×512 counter grid NO MATTER the corpus size —
    // map-side partial aggregation compresses each task's contribution to
    // ≤ d·w cells before the shuffle, vs a full-vocabulary count shuffle.
    // Candidates probe the broadcast grid (est = min over the d rows; CMS
    // never under-counts), the top 20 by estimate are then verified with
    // exact counts computed ONLY for those 20 (semi-join → count), so the
    // expensive exact aggregation touches 20 keys, not the vocabulary.
    QueryDef(
      "t19_heavy_hitters",
      (s, dir) => {
        val (d, w) = (4, 512)
        // ONE corpus token pass: the (tok, cnt) aggregate is the natural
        // shuffle output, and it feeds all three consumers — the weighted
        // grid build, the probe vocabulary, and the exact audit — so the
        // corpus explode never re-runs (it previously ran 3x: grid,
        // distinct, exact; 2.3s -> this). Pinned eagerly because the
        // three consumers sit in one plan whose optimizer wouldn't
        // otherwise share the aggregate subtree.
        val tokCounts = Tables.load(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .where(length(col("tok")) > 0)
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val grid = Sketches.cmsBuildWeighted(tokCounts, d, w)
        val est = Sketches.cmsProbe(grid, tokCounts.select(col("tok")), d, w)
        // global top-20 via TakeOrderedAndProject (per-partition heaps +
        // driver merge), never a single-partition global sort
        val top = est.orderBy(col("est_count").desc, col("tok")).limit(20)
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("est_count").desc, col("tok"))))
        top.join(tokCounts.select(col("tok"), col("cnt").as("exact_count")), Seq("tok"))
          .select(col("rank"), col("tok"), col("est_count"), col("exact_count"))
          .orderBy(col("rank"))
      },
      Some(
        s"""WITH t AS (
           |  SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok
           |                   FROM documents) WHERE length(tok) > 0),
           |g AS (
           |  SELECT j, ${duckHash60("CAST(j AS VARCHAR) || '|' || tok")} % 512 AS bucket,
           |         count(*) AS cnt
           |  FROM t CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) js
           |  GROUP BY 1, 2),
           |vocab AS (SELECT DISTINCT tok FROM t),
           |probe AS (
           |  SELECT tok, j, ${duckHash60("CAST(j AS VARCHAR) || '|' || tok")} % 512 AS bucket
           |  FROM vocab CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) js),
           |est AS (
           |  SELECT p.tok, min(g.cnt) AS est_count
           |  FROM probe p JOIN g ON g.j = p.j AND g.bucket = p.bucket
           |  GROUP BY 1),
           |top AS (
           |  SELECT tok, est_count,
           |         row_number() OVER (ORDER BY est_count DESC, tok) AS rank
           |  FROM est QUALIFY rank <= 20),
           |x AS (
           |  SELECT tok, count(*) AS exact_count FROM t
           |  WHERE tok IN (SELECT tok FROM top) GROUP BY 1)
           |SELECT rank, tok, est_count, exact_count
           |FROM top JOIN x USING (tok) ORDER BY rank""".stripMargin)),

    // Z-order (Morton) layout: interleave the bits of (user_id, ts_ms)
    // ranks so each output file covers a compact hyper-rectangle of the
    // 2-D key space — per-file min/max then prunes on EITHER dimension
    // (a ts-only sort prunes only ts). The query materializes the
    // would-be per-file stats so the curve AND the resulting envelopes
    // hash-check against DuckDB computing the identical interleave. File
    // assignment here uses ntile over the z order (deterministic for the
    // oracle); the production write path is ZOrder.cluster —
    // repartitionByRange on z (sampled range shuffle, no global
    // single-task sort), pruning-gain asserted in ZOrderSpec.
    QueryDef(
      "t20_zorder_layout",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts_ms"))
        ZOrder.withZ(ev, Seq("user_id", "ts_ms"), bits = 16)
          .withColumn("file_id", ntile(16).over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("z"), col("event_id"))))
          .groupBy(col("file_id"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("user_id")).as("u_min"), max(col("user_id")).as("u_max"),
            min(col("ts_ms")).as("t_min"), max(col("ts_ms")).as("t_max"))
          .orderBy(col("file_id"))
      },
      Some(
        s"""WITH b AS (
           |  SELECT min(user_id) AS umin, max(user_id) AS umax,
           |         min(epoch_ms(ts)) AS tmin, max(epoch_ms(ts)) AS tmax
           |  FROM events),
           |z AS (
           |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
           |         ${ZOrder.duckZ(Seq(("user_id", "umin", "umax"),
                        ("epoch_ms(ts)", "tmin", "tmax")), 16)} AS z
           |  FROM events, b),
           |f AS (
           |  SELECT user_id, ts_ms,
           |         ntile(16) OVER (ORDER BY z, event_id) AS file_id
           |  FROM z)
           |SELECT file_id, count(*) AS n_rows,
           |       min(user_id) AS u_min, max(user_id) AS u_max,
           |       min(ts_ms) AS t_min, max(ts_ms) AS t_max
           |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin)),

    // Table profiler (ANALYZE statistics): per-column row/null counts,
    // value-length envelope, and a KMV NDV estimate. Columns melt to a
    // (col_name, val) stack projection, so the whole profile is two
    // passes over that pruned frame (counts aggregate + NDV sketch) no
    // matter how many columns are profiled — the per-column-job
    // alternative re-reads the table once per column; at 100 TB the scan
    // is the cost. The NDV sketch shuffles ≤ k hashes per column instead
    // of every distinct value. Doubles are excluded (engine-specific
    // string formatting would poison the hash domain — the profiler
    // contract documents this).
    QueryDef(
      "t21_table_profile",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        Profiler.profile(ev, Seq("event_id", "user_id", "event_type", "props"))
          .orderBy(col("col_name"))
      },
      Some(
        s"""WITH prof AS (
           |  SELECT 'event_id' AS col_name, CAST(event_id AS VARCHAR) AS val FROM events
           |  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
           |  UNION ALL SELECT 'event_type', event_type FROM events
           |  UNION ALL SELECT 'props', props FROM events),
           |counts AS (
           |  SELECT col_name, count(*) AS n_rows,
           |         count(*) - count(val) AS n_nulls,
           |         min(length(val)) AS min_len, max(length(val)) AS max_len
           |  FROM prof GROUP BY 1),
           |h AS (
           |  SELECT DISTINCT col_name, ${duckHash60("val")} AS h
           |  FROM prof WHERE val IS NOT NULL),
           |r AS (
           |  SELECT col_name, h,
           |         row_number() OVER (PARTITION BY col_name ORDER BY h) AS rn
           |  FROM h),
           |s AS (
           |  SELECT col_name, max(rn) AS n_kept,
           |         max(CASE WHEN rn = 64 THEN h END) AS hk
           |  FROM r WHERE rn <= 64 GROUP BY 1),
           |ndv AS (
           |  SELECT col_name,
           |         CASE WHEN n_kept < 64 THEN CAST(n_kept AS BIGINT)
           |         ELSE CAST(floor(63.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)) AS BIGINT)
           |         END AS ndv_kmv
           |  FROM s)
           |SELECT c.col_name, n_rows, n_nulls, min_len, max_len,
           |       coalesce(ndv_kmv, 0) AS ndv_kmv
           |FROM counts c LEFT JOIN ndv USING (col_name)
           |ORDER BY col_name""".stripMargin)),

    // REAL BPE tokenization (vs the chars/4 estimate): train the merge
    // table from the corpus's own word histogram (one distributed shuffle
    // + TakeOrdered vocabulary cap; the classic merge loop then runs on
    // that tiny capped dictionary driver-side, exactly how production BPE
    // trainers work), then encode every document with the broadcast merge
    // ranks. HASH-CHECKED end to end: training is deterministic, so the
    // oracle is generated from the FROZEN sf0.01-trained table
    // (Bpe.CorpusMergesSf001) — a hash match means the live training loop
    // reproduced the frozen table bit-for-bit AND the encode matched the
    // rank-ordered replace chain (the t34 equivalence law, BpeSpec-fuzzed).
    // BpeSpec additionally locks textbook merge order, lossless
    // round-trip, determinism, driver≡distributed encoding, and the
    // frozen-table reproduction itself.
    QueryDef(
      "t22_bpe_tokens",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val merges = Bpe.learnMerges(
          Bpe.wordHistogram(docs, "text", maxVocab = 2000), numMerges = 200)
        val enc = Bpe.encode(
          s, docs.select(col("doc_id"), col("text")), "doc_id", "text", merges)
        enc.join(docs.select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_bpe_tokens"),
            sum(col("n_chars")).as("total_chars"),
            round(sum(col("n_chars")).cast("double")
              / sum(col("n_tokens")).cast("double"), 3).as("chars_per_token"))
          .orderBy(col("lang"))
      },
      Some(bpeT22OracleSql),
      oracleSfPin = Some("sf0.01")),

    // BPE ENCODE with a FIXED merge table, hash-checked per document: the
    // encode stage is SQL-expressible for a bounded merge count because
    // applying merges in RANK ORDER (one global replace per merge over a
    // separator-wrapped symbol string) equals the lowest-rank-first merge
    // loop — any pair involving a composite symbol necessarily has a
    // later rank than the merge that formed it, so earlier merges can
    // never become applicable again (BpeSpec pins this equivalence law
    // with a fuzz loop). The table is Bpe.FixedMerges — trained from a
    // constant seed dictionary, identical at every scale factor — and the
    // oracle SQL derives its 24 nested replace() calls from the very same
    // constant. Training itself stays rows-only (t22).
    QueryDef(
      "t34_bpe_encode",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Bpe.encode(s, docs.select(col("doc_id"), col("text")),
            "doc_id", "text", Bpe.FixedMerges)
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
            md5(concat_ws(" ", col("tokens"))).as("stream_md5"))
          .orderBy(col("doc_id"))
      },
      Some(bpeEncodeOracleSql)),

    // RANDOM PROJECTION (Johnson–Lindenstrauss dimensionality reduction):
    // 64-dim embeddings project to 8 dims through the md5-nibble weight
    // family — the cheap preprocessing step before clustering/ANN at
    // corpus scale (projection is a narrow per-row map, no shuffle; the
    // 8 weight vectors are plan literals). Both engines compute the SAME
    // sequential-fold dot per output dim, so the doubles are
    // bit-identical and the oracle hash-checks every projected value.
    QueryDef(
      "t35_random_projection",
      (s, dir) => {
        val proj = graft.ops.Similarity.randomProjection(
          col("embedding"), 8, 64)
        Tables.load(s, dir, "embeddings")
          .withColumn("proj", proj)
          .select(col("vec_id") +:
            (0 until 8).map(p => col("proj")(p).as(s"p$p")): _*)
          .orderBy(col("vec_id"))
      },
      Some(
        s"""SELECT vec_id,
           |${(0 until 8).map(p => s"  ${duckProjection(p, "embedding")} AS p$p")
               .mkString(",\n")}
           |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // Deterministic QUANTIZED K-MEANS over the embedding corpus (topic
    // balancing / semantic grouping): integer quantization makes every
    // step exact — no float summation order anywhere — so the oracle
    // replays the WHOLE fit (2 iterations: integer-distance argmin with
    // smallest-id ties, truncating-division means, empty-cluster
    // carryover) and the final per-vector assignment hash-matches
    // bit-exactly. Per iteration the engine runs one narrow assignment
    // map (centers are plan literals) + one k·dims-row aggregate — the
    // 100 TB shape: no joins, no shuffled centers.
    QueryDef(
      "t36_kmeans_embeddings",
      (s, dir) => {
        val (assigned, _) = graft.ops.KMeansQ.fitPredict(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 4, iters = 2, dims = 64)
        assigned.orderBy(col("vec_id"))
      },
      Some(s"""WITH ${duckKmeansCtes(k = 4, iters = 2, scale = 1000000L)}
              |SELECT vec_id, cluster FROM af ORDER BY vec_id""".stripMargin)),

    // CLUSTER-BALANCED SAMPLING (clustering → curation composition): the
    // k-means assignment feeds a per-cluster deterministic downsample to
    // the smallest cluster's size — the semantic-diversity rebalance
    // (uniform sampling over-represents dense regions; per-cluster caps
    // equalize them). Ranking is md5-deterministic and the rank<=target
    // window truncates map-side (WindowGroupLimit), so at corpus scale
    // this is one key shuffle, not a global sort. The oracle replays the
    // fit AND the rebalance.
    QueryDef(
      "t37_cluster_balanced_sample",
      (s, dir) => {
        val (assigned, _) = graft.ops.KMeansQ.fitPredict(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 4, iters = 2, dims = 64)
        val a = assigned.persist()
        try {
          val target = a.groupBy(col("cluster"))
            .agg(count(lit(1)).as("n"))
            .agg(min(col("n"))).collect()(0).getLong(0)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("cluster"))
            .orderBy(md5(concat(lit("cb|"), col("vec_id"))), col("vec_id"))
          a.withColumn("rk", row_number().over(w))
            .where(col("rk") <= target)
            .groupBy(col("cluster"))
            .agg(count(lit(1)).as("kept"),
              sum(col("vec_id")).as("id_sum"),
              min(col("vec_id")).as("id_min"),
              max(col("vec_id")).as("id_max"))
            .orderBy(col("cluster"))
        } finally a.unpersist()
      },
      Some(
        s"""WITH ${duckKmeansCtes(k = 4, iters = 2, scale = 1000000L)},
           |target AS (
           |  SELECT min(n) AS t FROM (
           |    SELECT cluster, count(*) AS n FROM af GROUP BY 1)),
           |ranked AS (
           |  SELECT vec_id, cluster,
           |         row_number() OVER (PARTITION BY cluster
           |           ORDER BY md5('cb|' || vec_id), vec_id) AS rk
           |  FROM af)
           |SELECT cluster, count(*) AS kept,
           |       CAST(SUM(vec_id) AS BIGINT) AS id_sum,
           |       min(vec_id) AS id_min, max(vec_id) AS id_max
           |FROM ranked, target WHERE rk <= target.t
           |GROUP BY cluster ORDER BY cluster""".stripMargin)),

    // Row-level version diff (corpus audit): v2 of events drops all
    // purchases, doubles every click's value, and appends 100 synthetic
    // rows — the diff must classify exactly those as delete / update /
    // insert and nothing else. Map-side row hashing means only (key,
    // 16-byte hash) pairs shuffle into the one full-outer join, so diff
    // cost at 100 TB is a key shuffle, not a payload shuffle; the oracle
    // reconstructs the classification relationally (IS DISTINCT FROM),
    // proving the hash classification exact.
    QueryDef(
      "t23_version_diff",
      (s, dir) => {
        val v1 = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val v2 = v1.where(col("event_type") =!= "purchase")
          .withColumn("value",
            when(col("event_type") === "click", col("value") * 2)
              .otherwise(col("value")))
          .unionByName(v1.where(col("event_id") < 100)
            .select((col("event_id") + 10000000L).as("event_id"),
              col("user_id"), lit("synthetic").as("event_type"),
              col("value")))
        Diff.diff(v1, v2, Seq("event_id"),
            Seq("user_id", "event_type", "value"))
          .groupBy(col("_diff_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("event_id")).as("sum_key"))
          .orderBy(col("_diff_type"))
      },
      Some(
        """WITH v1 AS (
          |  SELECT event_id, user_id, event_type, value FROM events),
          |v2 AS (
          |  SELECT event_id, user_id, event_type,
          |         CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS value
          |  FROM v1 WHERE event_type <> 'purchase'
          |  UNION ALL
          |  SELECT event_id + 10000000, user_id, 'synthetic', value
          |  FROM v1 WHERE event_id < 100),
          |d AS (
          |  SELECT coalesce(a.event_id, b.event_id) AS event_id,
          |         CASE WHEN b.event_id IS NULL THEN 'delete'
          |              WHEN a.event_id IS NULL THEN 'insert'
          |              WHEN (a.user_id, a.event_type, a.value) IS DISTINCT FROM
          |                   (b.user_id, b.event_type, b.value) THEN 'update'
          |         END AS _diff_type
          |  FROM v1 a FULL OUTER JOIN v2 b USING (event_id))
          |SELECT _diff_type, count(*) AS cnt,
          |       CAST(SUM(event_id) AS BIGINT) AS sum_key
          |FROM d WHERE _diff_type IS NOT NULL
          |GROUP BY 1 ORDER BY _diff_type""".stripMargin)),

    // Per-source contribution caps (the C4/RefinedWeb "no single domain
    // dominates" rule): keep at most 15 docs per source, selected by a
    // deterministic md5 priority so reruns/audits pick the identical set
    // on any cluster layout. The rank filter compiles to WindowGroupLimit
    // — map tasks pre-limit to 15 per source BEFORE the shuffle, so a
    // celebrity domain's rows never converge on one reducer at full size
    // (PlanSpec locks the shape).
    QueryDef(
      "t27_source_caps",
      (s, dir) => graft.ops.Curation.capAudit(
        Tables.load(s, dir, "documents"), "doc_id", "source", cap = 15)
        .orderBy(col("source")),
      Some(
        """WITH r AS (
          |  SELECT source, doc_id,
          |         row_number() OVER (PARTITION BY source
          |             ORDER BY md5(source || '|' || CAST(doc_id AS VARCHAR)),
          |                      doc_id) AS rnk
          |  FROM documents),
          |k AS (
          |  SELECT source, count(*) AS n_kept,
          |         CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
          |         min(doc_id) AS min_kept, max(doc_id) AS max_kept
          |  FROM r WHERE rnk <= 15 GROUP BY source),
          |t AS (SELECT source, count(*) AS n_total FROM documents GROUP BY source)
          |SELECT t.source, t.n_total, k.n_kept, k.kept_id_sum,
          |       k.min_kept, k.max_kept
          |FROM t JOIN k USING (source)
          |ORDER BY source""".stripMargin)),

    // Multinomial Naive Bayes classifier (the fastText-class linear text
    // classifier of curation pipelines): train language ID on 2/3 of the
    // corpus, predict the held-out 1/3. Every log-prob is 6dp-rounded and
    // integer-scaled at model build, so document scores are EXACT integer
    // sums — the argmax is partitioning-independent and DuckDB reproduces
    // every prediction bit-for-bit. Training state is |vocab|x|labels|
    // (corpus-size-independent, map-side partials); the fitted model
    // broadcasts back onto a single narrow corpus pass.
    QueryDef(
      "t28_nb_classifier",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val train = docs.where(col("doc_id") % 3 =!= 0)
        val test = docs.where(col("doc_id") % 3 === 0)
        val model = graft.ops.NaiveBayes.fit(train, "doc_id", "text", "lang")
        graft.ops.NaiveBayes.classify(model, test, "doc_id", "text")
          .join(test.select(col("doc_id").as("doc"), col("lang").as("actual")), "doc")
          .withColumn("correct", col("predicted") === col("actual"))
          .select(col("doc"), col("predicted"), col("actual"),
            col("correct"), col("score"))
          .orderBy(col("doc"))
      },
      Some(
        """WITH train AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 <> 0),
          |test AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 0),
          |ttoks AS (
          |  SELECT doc_id, lang, w AS tok, count(*) AS cnt
          |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM train)
          |  WHERE w <> '' GROUP BY 1, 2, 3),
          |counts AS (SELECT lang AS label, tok, CAST(SUM(cnt) AS BIGINT) AS c
          |           FROM ttoks GROUP BY 1, 2),
          |vocab AS (SELECT DISTINCT tok FROM counts),
          |v AS (SELECT count(*) AS v FROM vocab),
          |nl AS (SELECT label, CAST(SUM(c) AS BIGINT) AS n_l FROM counts GROUP BY 1),
          |model AS (
          |  SELECT vocab.tok, nl.label,
          |         CAST(round(ln((COALESCE(c.c, 0) + 1) * 1.0 / (nl.n_l + v.v))
          |                    * 1000000) AS BIGINT) AS lp
          |  FROM vocab CROSS JOIN nl CROSS JOIN v
          |  LEFT JOIN counts c ON c.tok = vocab.tok AND c.label = nl.label),
          |dt AS (SELECT lang AS label, count(*) AS n_docs FROM train GROUP BY 1),
          |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM dt),
          |priors AS (
          |  SELECT label, CAST(round(ln(n_docs * 1.0 / tot.n) * 1000000) AS BIGINT) AS prior
          |  FROM dt, tot),
          |qtoks AS (
          |  SELECT doc_id AS doc, w AS tok, count(*) AS cnt
          |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM test)
          |  WHERE w <> '' GROUP BY 1, 2),
          |sc AS (
          |  SELECT q.doc, m.label, CAST(SUM(q.cnt * m.lp) AS BIGINT) AS ts
          |  FROM qtoks q JOIN model m USING (tok) GROUP BY 1, 2),
          |fin AS (
          |  SELECT sc.doc, sc.label, sc.ts + p.prior AS score,
          |         row_number() OVER (PARTITION BY sc.doc
          |             ORDER BY sc.ts + p.prior DESC, sc.label) AS rnk
          |  FROM sc JOIN priors p USING (label))
          |SELECT f.doc, f.label AS predicted, t.lang AS actual,
          |       f.label = t.lang AS correct, f.score
          |FROM fin f JOIN test t ON t.doc_id = f.doc
          |WHERE f.rnk = 1
          |ORDER BY doc""".stripMargin)),

    // Conversation threading (SFT corpus construction): the event log
    // becomes per-user sessions split on >1h inactivity, each with its
    // time-ordered turn transcript and audit digest. One shuffle on the
    // actor key; session islands via lag+cumsum (per-actor bounded sort);
    // transcripts assembled IN-ROW (collect → array_sort → join), never a
    // second shuffle or an ordered aggregate over a whole partition.
    QueryDef(
      "t29_sft_threads",
      (s, dir) => graft.ops.Conversations.threads(
        Tables.events(s, dir), "user_id", "ts_ms", "event_id",
        col("event_type"), gapMs = 3600000L)
        .orderBy(col("user_id"), col("session_idx")),
      Some(
        """WITH e AS (
          |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events),
          |w AS (
          |  SELECT *, lag(ts_ms) OVER (PARTITION BY user_id
          |                             ORDER BY ts_ms, event_id) AS prev
          |  FROM e),
          |s AS (
          |  SELECT *, CAST(SUM(CASE WHEN prev IS NULL OR ts_ms - prev > 3600000
          |                          THEN 1 ELSE 0 END)
          |       OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
          |             ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
          |  FROM w)
          |SELECT user_id, session_idx, count(*) AS n_turns,
          |       min(ts_ms) AS first_ms, max(ts_ms) AS last_ms,
          |       string_agg(event_type, ' ' ORDER BY ts_ms, event_id) AS convo,
          |       md5(string_agg(event_type, ' ' ORDER BY ts_ms, event_id)) AS convo_md5
          |FROM s GROUP BY user_id, session_idx
          |ORDER BY user_id, session_idx""".stripMargin)),

    // Length-bucketed batching audit: group documents into fixed-width
    // token-length buckets (the pad-efficient batching layout — batch
    // within a bucket and padding is bounded by the width) and measure
    // the padding each bucket would cost. Pure integer bucket math (no
    // float log2 whose ceil could disagree across engines at exact
    // powers), one narrow projection + one small aggregate.
    QueryDef(
      "t31_length_buckets",
      (s, dir) => {
        val width = 32
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
          .withColumn("bucket",
            (((col("n_tokens") - 1) / width).cast("long") + 1) * width)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("sum_tokens"),
            min(col("n_tokens")).as("min_tokens"),
            max(col("n_tokens")).as("max_tokens"))
          .withColumn("pad_tokens",
            col("bucket") * col("n_docs") - col("sum_tokens"))
          .withColumn("pad_ratio",
            round(col("pad_tokens") / (col("bucket") * col("n_docs")), 4))
          .orderBy(col("bucket"))
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |b AS (SELECT doc_id, n_tokens,
          |             ((n_tokens - 1) // 32 + 1) * 32 AS bucket FROM t),
          |g AS (
          |  SELECT bucket, count(*) AS n_docs,
          |         CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
          |         min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
          |  FROM b GROUP BY bucket)
          |SELECT bucket, n_docs, sum_tokens, min_tokens, max_tokens,
          |       CAST(bucket * n_docs - sum_tokens AS BIGINT) AS pad_tokens,
          |       round((bucket * n_docs - sum_tokens) * 1.0 / (bucket * n_docs), 4) AS pad_ratio
          |FROM g ORDER BY bucket""".stripMargin)),

    // Corpus datasheet: the one-row audit summary a dataset card ships
    // with — sizes, diversity, token mass, short-doc and exact-dup rates —
    // computed in ONE corpus scan (multi-aggregate) plus the exact-dedup
    // hash aggregate, joined as two 1-row frames. Every figure is integer
    // arithmetic, so the datasheet is reproducible to the digit.
    QueryDef(
      "t33_corpus_datasheet",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          sum(when(TextAnalysis.tokenCount(col("text")) < 10, 1L)
            .otherwise(0L)).as("short_docs"))
        val dup = Dedup.exactGroups(docs, "doc_id", "text")
          .agg(
            count(when(col("n_docs") > 1, 1)).as("dup_groups"),
            coalesce(sum(when(col("n_docs") > 1, col("n_docs"))), lit(0L))
              .as("docs_in_dup_groups"))
        base.crossJoin(dup)
          .withColumn("dup_rate",
            round((col("docs_in_dup_groups") - col("dup_groups")) /
              col("n_docs"), 4))
      },
      Some(
        """WITH base AS (
          |  SELECT count(*) AS n_docs,
          |         count(DISTINCT source) AS n_sources,
          |         count(DISTINCT lang) AS n_langs,
          |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
          |         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          |         CAST(SUM(CASE WHEN len(string_split(text, ' ')) < 10
          |                       THEN 1 ELSE 0 END) AS BIGINT) AS short_docs
          |  FROM documents),
          |dup AS (
          |  SELECT count(*) FILTER (n_docs > 1) AS dup_groups,
          |         CAST(COALESCE(SUM(n_docs) FILTER (n_docs > 1), 0) AS BIGINT)
          |           AS docs_in_dup_groups
          |  FROM (SELECT count(*) AS n_docs
          |        FROM documents GROUP BY md5(lower(trim(text)))))
          |SELECT base.*, dup.*,
          |       round((docs_in_dup_groups - dup_groups) * 1.0 / n_docs, 4) AS dup_rate
          |FROM base, dup""".stripMargin)),

    // Capstone corpus build: the full pretraining-data path in ONE plan —
    // exact dedup (hash-aggregate keepers + semi-join, never a window
    // sort), quality gate (codegen'd token count), per-source caps
    // (WindowGroupLimit), then packing into 512-token training sequences
    // (sharded cumsum). Every stage is the scale shape its standalone
    // query locks; the oracle chains the same four stages relationally,
    // so the END-TO-END composition is hash-checked, not just the parts.
    QueryDef(
      "t30_corpus_build",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val keepers = docs
          .groupBy(md5(lower(trim(col("text")))).as("h"))
          .agg(min(col("doc_id")).as("doc_id"))
        val unique = docs.join(keepers.select(col("doc_id")), Seq("doc_id"), "left_semi")
        val gated = unique.where(TextAnalysis.tokenCount(col("text")) >= 10)
        val capped = graft.ops.Curation.capPerKey(gated, "doc_id", "source", cap = 20)
        graft.ops.Packing.sequenceStats(
          graft.ops.Packing.packSequences(capped, "doc_id", "text",
            seqLen = 512, shards = 8), "doc_id")
          .orderBy(col("shard"), col("seq_idx"))
      },
      Some(
        """WITH dd AS (
          |  SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keeper
          |  FROM documents GROUP BY 1),
          |k1 AS (SELECT d.* FROM documents d JOIN dd ON d.doc_id = dd.keeper),
          |k2 AS (SELECT * FROM k1 WHERE len(string_split(text, ' ')) >= 10),
          |r AS (
          |  SELECT *, row_number() OVER (PARTITION BY source
          |      ORDER BY md5(source || '|' || CAST(doc_id AS VARCHAR)), doc_id) AS rnk
          |  FROM k2),
          |k3 AS (SELECT doc_id, text FROM r WHERE rnk <= 20),
          |p AS (
          |  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM k3),
          |c AS (
          |  SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
          |              ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
          |              AND 1 PRECEDING), 0) AS tok_start
          |  FROM p),
          |a AS (
          |  SELECT shard, CAST(tok_start // 512 AS BIGINT) AS seq_idx,
          |         doc_id, n_tokens,
          |         (tok_start % 512) + n_tokens > 512 AS straddles
          |  FROM c)
          |SELECT shard, seq_idx, count(*) AS n_docs,
          |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
          |       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
          |       CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
          |FROM a GROUP BY shard, seq_idx
          |ORDER BY shard, seq_idx""".stripMargin)),

    // TIME-SERIES RESAMPLE + FORWARD FILL (gap filling): each user's event
    // stream regularized onto a daily grid spanning that user's OWN
    // [first, last] activity, empty days synthesized and carrying the
    // user's last non-empty day's value forward. Grid-from-own-span means
    // one long-lived key can't explode every key's grid; the fill is a
    // per-key running window (per-shard sort, never global); decimal sums
    // make the values bit-reproducible. The oracle replays grid + fill
    // with generate_series and IGNORE NULLS.
    QueryDef(
      "t38_resample_ffill",
      (s, dir) => {
        val ev = Tables.eventsTopic(s, dir)
          .where(col("user_id") < 40)
          .select(col("user_id"), col("_ts_ms"), col("value"))
        graft.ops.Resample.ffill(ev, "user_id", "_ts_ms", "value",
          intervalMs = 86400000L)
          .withColumn("val", round(col("val"), 4))
          .orderBy(col("user_id"), col("bucket"))
      },
      Some(Tables.withEventsTopic(
        """, b AS (
          |  SELECT user_id, _ts_ms // 86400000 AS bucket,
          |         SUM(CAST(value AS DECIMAL(18,4))) AS v
          |  FROM events_topic WHERE user_id < 40 GROUP BY 1, 2),
          |spans AS (
          |  SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
          |  FROM b GROUP BY 1),
          |grid AS (
          |  SELECT user_id, unnest(generate_series(lo, hi)) AS bucket
          |  FROM spans),
          |j AS (
          |  SELECT g.user_id, g.bucket, b.v
          |  FROM grid g LEFT JOIN b ON g.user_id = b.user_id
          |   AND g.bucket = b.bucket)
          |SELECT user_id, bucket, v IS NULL AS filled,
          |       round(CAST(last_value(v IGNORE NULLS) OVER (
          |         PARTITION BY user_id ORDER BY bucket
          |         ROWS UNBOUNDED PRECEDING) AS DOUBLE), 4) AS val
          |FROM j ORDER BY user_id, bucket""".stripMargin))),

    // LINK-GRAPH PAGERANK (integer, oracle-replayed): the navigation graph
    // is rebuilt from raw events (per-user lag over view/click pages), then
    // ranked with 3 rounds of deterministic INTEGER PageRank — truncating
    // divisions and integer sums only, so the ranks are bit-identical on
    // any engine and the oracle unrolls all 3 rounds relationally. Scale
    // shape: edges partition once on src, each round shuffles O(nodes) not
    // O(edges), rank frames are eagerly checkpointed (lineage never
    // compounds) — the crawl-graph quality-weighting pass of a pretraining
    // corpus, as a Spark loop.
    QueryDef(
      "t39_pagerank",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val edges = Tables.load(s, dir, "events")
          .where(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("page"))
          .withColumn("prev", lag(col("page"), 1).over(w))
          .where(col("prev").isNotNull && col("prev") =!= col("page"))
          .select(col("prev").as("src"), col("page").as("dst"))
        val pr = graft.ops.Graph.pagerank(edges, "src", "dst", iters = 3)
        val rw = org.apache.spark.sql.expressions.Window
          .orderBy(col("pr").desc, col("node"))
        pr.orderBy(col("pr").desc, col("node")).limit(20)
          .withColumn("rank", row_number().over(rw))
          .select(col("rank"), col("node"), col("pr"))
          .orderBy(col("rank"))
      },
      Some {
        val rounds = (1 to 3).map { i =>
          val prev = if (i == 1) "pr0" else s"it${i - 1}"
          s"""it$i AS (
             |  SELECT nd.node,
             |         ((15 * CAST(1000000000 AS BIGINT) // 100) // p.n)
             |           + (85 * COALESCE(fl.inflow, 0)) // 100 AS pr
             |  FROM nodes nd CROSS JOIN params p
             |  LEFT JOIN (
             |    SELECT e.dst AS node,
             |           CAST(SUM(r.pr // o.outdeg) AS BIGINT) AS inflow
             |    FROM $prev r JOIN edges e ON e.src = r.node
             |    JOIN outdeg o ON o.src = e.src
             |    GROUP BY 1) fl ON fl.node = nd.node)""".stripMargin
        }.mkString(",\n")
        s"""WITH ev AS (
           |  SELECT user_id, ts, event_id,
           |         CAST(json_extract_string(props, '$$.k') AS INTEGER) AS page
           |  FROM events WHERE event_type IN ('view', 'click')),
           |nav AS (
           |  SELECT page, lag(page) OVER (
           |    PARTITION BY user_id ORDER BY ts, event_id) AS prev
           |  FROM ev),
           |edges AS (
           |  SELECT DISTINCT prev AS src, page AS dst FROM nav
           |  WHERE prev IS NOT NULL AND prev <> page),
           |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
           |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
           |params AS (SELECT count(*) AS n FROM nodes),
           |pr0 AS (SELECT node, 1000000000 // p.n AS pr
           |        FROM nodes CROSS JOIN params p),
           |$rounds
           |SELECT rank, node, pr FROM (
           |  SELECT node, pr,
           |         row_number() OVER (ORDER BY pr DESC, node) AS rank
           |  FROM it3)
           |WHERE rank <= 20 ORDER BY rank""".stripMargin
      }),

    // SEQUENTIAL POISSON WEIGHTED SAMPLING (Ohlsson): fixed-size per-class
    // samples with inclusion probability ∝ n_chars — the survey-statistics
    // way to length-weight a corpus sample with NO RNG: priority u/w uses
    // a 48-bit hash (exact in a double, so the one IEEE division is
    // bit-identical cross-engine) and the rank filter compiles to
    // WindowGroupLimit — per-task truncation to n rows per class before
    // the exchange, so the shuffle is O(n·classes) at any corpus size.
    QueryDef(
      "t40_weighted_sample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Sampling.weightedSampleGrouped(docs, "doc_id", "n_chars",
          "source", n = 5)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some(
        s"""WITH p AS (
           |  SELECT source, doc_id, n_chars,
           |         CAST(${duckHash48("CAST(doc_id AS VARCHAR)")} AS DOUBLE)
           |           / CAST(n_chars AS DOUBLE) AS pri
           |  FROM documents),
           |r AS (
           |  SELECT source, doc_id, n_chars, row_number() OVER (
           |    PARTITION BY source ORDER BY pri, doc_id) AS rn
           |  FROM p)
           |SELECT source, doc_id, n_chars FROM r WHERE rn <= 5
           |ORDER BY source, doc_id""".stripMargin)),

    // HYPERLOGLOG distinct sketch (Flajolet 2007), exact-arithmetic form:
    // 64 registers per group — state is 2^p rows NO MATTER the corpus
    // size, registers merge across shards/days with a plain max (property-
    // tested) — and the estimate's harmonic denominator is the INTEGER
    // Σ 2^(55−M_j), so the one double division at the end is IEEE-
    // identical on both engines and the approximation itself hash-checks.
    // The exact countDistinct runs alongside only to expose the error the
    // sketch trades for mergeable O(m) state.
    QueryDef(
      "u11_hll_distinct",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val est = Sketches.hllEstimate(
          Sketches.hllSketch(ev, col("event_type"), col("user_id"), p = 6),
          p = 6)
          .select(col("grp").as("event_type"), col("hll_distinct"))
        val exact = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_distinct"))
        est.join(exact, Seq("event_type"))
          .select(col("event_type"), col("exact_distinct"), col("hll_distinct"),
            round(abs(col("hll_distinct") - col("exact_distinct")).cast("double")
              * lit(100.0) / col("exact_distinct").cast("double"), 2)
              .as("err_pct"))
          .orderBy(col("event_type"))
      },
      Some(
        s"""WITH h AS (
           |  SELECT event_type AS grp,
           |         ${duckHash60("CAST(user_id AS VARCHAR)")} AS h
           |  FROM events),
           |reg AS (
           |  SELECT grp, h % 64 AS bucket,
           |         MAX(CASE WHEN h // 64 = 0 THEN 55
           |             ELSE 55 - length(bin(h // 64)) END) AS reg
           |  FROM h GROUP BY 1, 2),
           |t AS (
           |  SELECT grp,
           |         CAST(SUM(1::BIGINT << (55 - reg)) AS BIGINT)
           |           + (64 - count(*)) * (1::BIGINT << 55) AS t
           |  FROM reg GROUP BY 1),
           |est AS (
           |  SELECT grp,
           |         CAST(floor(CAST(0.709 AS DOUBLE) * 64 * 64
           |           * CAST(1::BIGINT << 55 AS DOUBLE)
           |           / CAST(t AS DOUBLE)) AS BIGINT) AS hll_distinct
           |  FROM t),
           |x AS (
           |  SELECT event_type AS grp,
           |         count(DISTINCT user_id) AS exact_distinct
           |  FROM events GROUP BY 1)
           |SELECT grp AS event_type, exact_distinct, hll_distinct,
           |       round(CAST(abs(hll_distinct - exact_distinct) AS DOUBLE)
           |             * 100.0 / CAST(exact_distinct AS DOUBLE), 2) AS err_pct
           |FROM est JOIN x USING (grp) ORDER BY event_type""".stripMargin)),

    // HASHED N-GRAM IMPORTANCE WEIGHTING (the DSIR data-selection family):
    // every document scored by how much its hashed-bigram distribution
    // resembles a target domain's vs the raw corpus — integer ratio
    // weights with add-one smoothing instead of DSIR's log-likelihood sums
    // (logs are libm-dependent; these scores are bit-exact cross-engine).
    // One gram explode projected to ~16-byte rows feeds both the
    // 1024-row bucket table (broadcast back) and the per-doc scorer; the
    // bucket table is corpus-size-independent, which is the entire point
    // of hashing the grams.
    QueryDef(
      "t41_importance_weights",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sc = graft.ops.Importance.importanceScores(docs, "doc_id", "text",
          isTarget = col("source").isin("src1", "src2", "src3"))
        val rw = org.apache.spark.sql.expressions.Window
          .orderBy(col("importance").desc, col("doc"))
        sc.orderBy(col("importance").desc, col("doc")).limit(30)
          .withColumn("rank", row_number().over(rw))
          .select(col("rank"), col("doc"), col("n_grams"), col("importance"))
          .orderBy(col("rank"))
      },
      Some(
        s"""WITH d AS (
           |  SELECT doc_id, source IN ('src1', 'src2', 'src3') AS tgt,
           |         string_split(text, ' ') AS w
           |  FROM documents),
           |g0 AS (
           |  SELECT doc_id AS doc, tgt,
           |         unnest(list_transform(generate_series(1, len(w) - 1),
           |                               i -> w[i] || ' ' || w[i+1])) AS g
           |  FROM d),
           |g AS (
           |  SELECT doc, tgt, ${duckHash60("g")} % 1024 AS bucket FROM g0),
           |stats AS (
           |  SELECT bucket, CAST(count(*) AS BIGINT) AS raw,
           |         CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS t
           |  FROM g GROUP BY 1),
           |wgt AS (
           |  SELECT doc, ((s.t + 1) * 1000000) // (s.raw + 1) AS wgt
           |  FROM g JOIN stats s USING (bucket)),
           |sc AS (
           |  SELECT doc, CAST(count(*) AS BIGINT) AS n_grams,
           |         CAST(SUM(wgt) AS BIGINT) // CAST(count(*) AS BIGINT)
           |           AS importance
           |  FROM wgt GROUP BY 1),
           |r AS (
           |  SELECT doc, n_grams, importance, row_number() OVER (
           |    ORDER BY importance DESC, doc) AS rank
           |  FROM sc)
           |SELECT rank, doc, n_grams, importance FROM r
           |WHERE rank <= 30 ORDER BY rank""".stripMargin)),

    // QUALITY-RULE BANK (C4 + Gopher/MassiveText document filters) with
    // per-rule attrition accounting: every named rule's rejection count
    // plus the surviving-document total, from ONE scan and one
    // conditional-sum hash aggregate. Integer-exact thresholds (cross-
    // multiplied, token arithmetic) so the DuckDB replay lands on
    // identical counts.
    QueryDef(
      "t46_quality_rules",
      (s, dir) => graft.ops.QualityRules.attrition(
        Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some(
        """WITH f AS (
          |  SELECT text,
          |         len(string_split(text, ' ')) AS n,
          |         length(replace(text, ' ', '')) AS totlen,
          |         len(list_distinct(string_split(text, ' '))) AS dst,
          |         (CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 1 ELSE 0 END
          |          + CASE WHEN list_contains(string_split(text, ' '), 'a') THEN 1 ELSE 0 END
          |          + CASE WHEN list_contains(string_split(text, ' '), 'of') THEN 1 ELSE 0 END
          |          + CASE WHEN list_contains(string_split(text, ' '), 'and') THEN 1 ELSE 0 END
          |          + CASE WHEN list_contains(string_split(text, ' '), 'in') THEN 1 ELSE 0 END
          |          + CASE WHEN list_contains(string_split(text, ' '), 'to') THEN 1 ELSE 0 END) AS stop
          |  FROM documents),
          |g AS (
          |  SELECT
          |    CASE WHEN n < 40 THEN 1 ELSE 0 END AS r1,
          |    CASE WHEN n > 5000 THEN 1 ELSE 0 END AS r2,
          |    CASE WHEN totlen < n * 3 OR totlen > n * 10 THEN 1 ELSE 0 END AS r3,
          |    CASE WHEN stop < 2 THEN 1 ELSE 0 END AS r4,
          |    CASE WHEN dst * 10 < n * 3 THEN 1 ELSE 0 END AS r5,
          |    CASE WHEN contains(text, '{')
          |           OR contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END AS r6
          |  FROM f),
          |s AS (
          |  SELECT CAST(SUM(r1) AS BIGINT) AS r1, CAST(SUM(r2) AS BIGINT) AS r2,
          |         CAST(SUM(r3) AS BIGINT) AS r3, CAST(SUM(r4) AS BIGINT) AS r4,
          |         CAST(SUM(r5) AS BIGINT) AS r5, CAST(SUM(r6) AS BIGINT) AS r6,
          |         CAST(SUM(CASE WHEN r1 + r2 + r3 + r4 + r5 + r6 = 0
          |                       THEN 1 ELSE 0 END) AS BIGINT) AS pass
          |  FROM g)
          |SELECT 'r1_too_short' AS rule, r1 AS docs FROM s
          |UNION ALL SELECT 'r2_too_long', r2 FROM s
          |UNION ALL SELECT 'r3_word_len', r3 FROM s
          |UNION ALL SELECT 'r4_stopword_poor', r4 FROM s
          |UNION ALL SELECT 'r5_low_diversity', r5 FROM s
          |UNION ALL SELECT 'r6_boilerplate', r6 FROM s
          |UNION ALL SELECT 'z_survivors', pass FROM s
          |ORDER BY rule""".stripMargin)),

    // T5 SPAN CORRUPTION (denoising-objective data prep): every full
    // 20-token block masks one hash-placed 3-token run (15% corruption,
    // runs never overlap by construction); the input stream collapses
    // each run to its <extra_id_K> sentinel, the target stream is
    // sentinel-then-masked-tokens. Every choice is a pure function of
    // (doc, block), so BOTH streams' order-sensitive digests hash-replay
    // in DuckDB — a training batch and its denoising targets are
    // auditable cross-engine byte for byte.
    QueryDef(
      "t48_span_corruption",
      (s, dir) => graft.ops.Packing.spanCorruption(
        Tables.load(s, dir, "documents").where(col("doc_id") < 100),
        "doc_id", "text")
        .orderBy(col("doc")),
      Some(
        """WITH t AS (
          |  SELECT doc_id AS doc, string_split(text, ' ') AS toks
          |  FROM documents WHERE doc_id < 100),
          |e0 AS (
          |  SELECT doc, unnest(range(0, len(toks))) AS pos, toks,
          |         len(toks) AS n
          |  FROM t),
          |e AS (
          |  SELECT doc, pos, toks[CAST(pos + 1 AS INT)] AS tok, n
          |  FROM e0),
          |b AS (
          |  SELECT doc, pos, tok, n, pos // 20 AS blk, (pos // 20) * 20 AS bs,
          |         (pos // 20) * 20 + 20 <= n AS refull
          |  FROM e),
          |o AS (
          |  SELECT *, CAST('0x' || substr(md5(CAST(doc AS VARCHAR) || ':' ||
          |           CAST(blk AS VARCHAR)), 1, 15) AS BIGINT) % 18 AS off
          |  FROM b),
          |f AS (
          |  SELECT *,
          |         refull AND pos - bs >= off AND pos - bs < off + 3 AS inrun,
          |         refull AND pos - bs = off AS runstart,
          |         '<extra_id_' || CAST(blk AS VARCHAR) || '>' AS sentinel
          |  FROM o),
          |inp AS (
          |  SELECT doc, pos * 2 AS k,
          |         CASE WHEN runstart THEN sentinel ELSE tok END AS piece
          |  FROM f WHERE NOT inrun OR runstart),
          |tgt AS (
          |  SELECT doc, pos * 2 AS k, sentinel AS piece FROM f WHERE runstart
          |  UNION ALL
          |  SELECT doc, pos * 2 + 1 AS k, tok FROM f WHERE inrun),
          |cnt AS (
          |  SELECT doc, count(*) AS n_tokens,
          |         CAST(count(*) FILTER (WHERE runstart) AS BIGINT) AS n_blocks,
          |         CAST(count(*) FILTER (WHERE inrun) AS BIGINT) AS n_masked
          |  FROM f GROUP BY doc),
          |di AS (SELECT doc, md5(string_agg(piece, ' ' ORDER BY k)) AS input_md5
          |       FROM inp GROUP BY doc),
          |dt AS (SELECT doc, md5(string_agg(piece, ' ' ORDER BY k)) AS target_md5
          |       FROM tgt GROUP BY doc)
          |SELECT cnt.doc, n_tokens, n_blocks, n_masked, input_md5,
          |       COALESCE(target_md5, md5('')) AS target_md5
          |FROM cnt JOIN di USING (doc) LEFT JOIN dt USING (doc)
          |ORDER BY doc""".stripMargin)),

    // CALIBRATED quality gate: find the lexical-diversity cutoff that
    // keeps (at least) 70% of the corpus — threshold-from-budget instead
    // of budget-from-threshold, re-runnable per crawl as the distribution
    // drifts. Exact WITHOUT a global row sort: scores are bounded
    // integers (0..10000), so calibration runs on the score histogram
    // (<= 10001 rows) + one cumulative window over that tiny frame + a
    // broadcast 1-row cutoff back onto the corpus pass. Keep-all-ties at
    // the boundary score — no nondeterministic boundary row.
    QueryDef(
      "t47_calibrated_gate",
      (s, dir) => graft.ops.QualityRules.calibratedGate(
        Tables.load(s, dir, "documents"), "doc_id", "lang", "text",
        targetNum = 7, targetDen = 10)
        .orderBy(col("lang")),
      Some(
        """WITH sc AS (
          |  SELECT lang,
          |         (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
          |          * 10000)
          |         // greatest(len(string_split(text, ' ')), 1) AS score
          |  FROM documents),
          |hist AS (SELECT score, count(*) AS cnt FROM sc GROUP BY score),
          |cum AS (
          |  SELECT score, SUM(cnt) OVER (ORDER BY score DESC
          |                               ROWS UNBOUNDED PRECEDING) AS cum
          |  FROM hist),
          |tot AS (SELECT count(*) AS n FROM sc),
          |cut AS (SELECT max(score) AS threshold FROM cum, tot
          |        WHERE cum >= (n * 7 + 9) // 10)
          |SELECT lang, count(*) AS n_docs,
          |       CAST(count(*) FILTER (WHERE score >= threshold) AS BIGINT)
          |         AS n_kept,
          |       threshold
          |FROM sc, cut GROUP BY lang, threshold ORDER BY lang""".stripMargin)),

    // TRIANGLE COUNTING over the navigation graph (t39's edges): the
    // degree-ordered node-iterator builds every wedge at its lowest-rank
    // apex — the O(m^{3/2}) bound that keeps a hub's d² wedge set from
    // detonating — and each triangle lands exactly once before exploding
    // to its three corners. The oracle re-derives orientation, wedges,
    // and closure relationally, so the count AND its per-node attribution
    // hash-check.
    QueryDef(
      "t45_triangle_count",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val edges = Tables.load(s, dir, "events")
          .where(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("page"))
          .withColumn("prev", lag(col("page"), 1).over(w))
          .where(col("prev").isNotNull && col("prev") =!= col("page"))
          .select(col("prev").as("src"), col("page").as("dst"))
        val rw = org.apache.spark.sql.expressions.Window
          .orderBy(col("triangles").desc, col("node"))
        graft.ops.Graph.triangles(edges, "src", "dst")
          .orderBy(col("triangles").desc, col("node")).limit(20)
          .withColumn("rank", row_number().over(rw))
          .select(col("rank"), col("node"), col("triangles"))
          .orderBy(col("rank"))
      },
      Some(
        """WITH nav AS (
          |  SELECT user_id, ts, event_id,
          |         CAST(json_extract_string(props, '$.k') AS INTEGER) AS page,
          |         lag(CAST(json_extract_string(props, '$.k') AS INTEGER))
          |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |  FROM events WHERE event_type IN ('view', 'click')),
          |e AS (SELECT prev AS src, page AS dst FROM nav
          |      WHERE prev IS NOT NULL AND prev <> page),
          |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |        FROM e WHERE src <> dst),
          |deg AS (SELECT n, count(*) AS c FROM (
          |          SELECT a AS n FROM und UNION ALL SELECT b FROM und)
          |        GROUP BY n),
          |o AS (SELECT
          |        CASE WHEN (da.c, a) < (db.c, b) THEN a ELSE b END AS u,
          |        CASE WHEN (da.c, a) < (db.c, b) THEN b ELSE a END AS v,
          |        CASE WHEN (da.c, a) < (db.c, b) THEN db.c ELSE da.c END AS cv
          |      FROM und JOIN deg da ON da.n = a JOIN deg db ON db.n = b),
          |tri AS (
          |  SELECT e1.u AS apex, e1.v AS x, e2.v AS y
          |  FROM o e1 JOIN o e2 ON e1.u = e2.u
          |   AND (e1.cv, e1.v) < (e2.cv, e2.v)
          |  JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
          |pn AS (SELECT n, count(*) AS triangles FROM (
          |         SELECT apex AS n FROM tri
          |         UNION ALL SELECT x FROM tri
          |         UNION ALL SELECT y FROM tri)
          |       GROUP BY n),
          |r AS (SELECT n AS node, triangles, row_number() OVER (
          |        ORDER BY triangles DESC, n) AS rank
          |      FROM pn)
          |SELECT rank, node, triangles FROM r
          |WHERE rank <= 20 ORDER BY rank""".stripMargin)),

    // PREFERENCE-PAIR CONSTRUCTION (reward-model / DPO data prep): per
    // source group, the most corpus-typical document (lowest bigram NLL)
    // becomes 'chosen' and the least typical 'rejected', with the score
    // margin carried for curriculum/thresholding. Scoring is t14's
    // deterministic LM; pairing is ONE hash aggregate via min/max over
    // (score, doc) structs — no window, no per-group sort, ties broken on
    // the 4dp-rounded score then doc id so both engines pick identical
    // pairs.
    QueryDef(
      "t44_preference_pairs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").where(col("doc_id") < 80)
        val sc = LanguageModel.bigramNll(docs, "doc_id", "text")
        docs.select(col("doc_id").as("doc"), col("source"))
          .join(sc, Seq("doc"))
          .groupBy(col("source"))
          .agg(min(struct(col("nll"), col("doc"))).as("ch"),
            max(struct(col("nll"), col("doc"))).as("rj"),
            count(lit(1)).as("n_candidates"))
          .select(col("source"),
            col("ch.doc").as("chosen_doc"), col("ch.nll").as("chosen_nll"),
            col("rj.doc").as("rejected_doc"), col("rj.nll").as("rejected_nll"),
            round(col("rj.nll") - col("ch.nll"), 4).as("margin"),
            col("n_candidates"))
          .orderBy(col("source"))
      },
      Some(
        """WITH g0 AS (
          |  SELECT doc_id AS doc,
          |         UNNEST(list_transform(generate_series(1, length(text) - 1),
          |                i -> {'pos': i, 'g': substr(text, i, 2)})) AS u
          |  FROM documents WHERE doc_id < 80 AND length(text) >= 2),
          |grams AS (SELECT doc, u.pos AS pos, u.g AS g FROM g0),
          |lm AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
          |t AS (SELECT CAST(SUM(c) AS DOUBLE) AS tot FROM lm),
          |lmp AS (SELECT g, round(ln(CAST(c AS DOUBLE) / tot), 6) AS logp FROM lm, t),
          |d AS (
          |  SELECT doc, count(*) AS n,
          |         list_reduce(list(logp ORDER BY pos), (a, x) -> a + x) AS s
          |  FROM grams JOIN lmp USING (g) GROUP BY doc),
          |sc AS (SELECT doc, round(-s / n, 4) AS nll FROM d),
          |j AS (SELECT dd.source, sc.doc, sc.nll
          |      FROM sc JOIN documents dd ON dd.doc_id = sc.doc),
          |r AS (SELECT source, doc, nll,
          |        row_number() OVER (PARTITION BY source
          |          ORDER BY nll, doc) AS rk_asc,
          |        row_number() OVER (PARTITION BY source
          |          ORDER BY nll DESC, doc DESC) AS rk_desc,
          |        count(*) OVER (PARTITION BY source) AS n_candidates
          |      FROM j)
          |SELECT a.source, a.doc AS chosen_doc, a.nll AS chosen_nll,
          |       b.doc AS rejected_doc, b.nll AS rejected_nll,
          |       round(b.nll - a.nll, 4) AS margin, a.n_candidates
          |FROM r a JOIN r b ON a.source = b.source
          |WHERE a.rk_asc = 1 AND b.rk_desc = 1
          |ORDER BY a.source""".stripMargin)),

    // SFT LOSS-MASK PACKING: the event log becomes per-user conversations
    // (turns in event_id order), serialized into 64-token training
    // sequences where every token carries its turn's trainable bit —
    // loss on assistant turns (purchase/error), masked on user turns
    // (click/view/scroll). Both the token stream AND the mask bits are
    // digest-checked per sequence, so the training rows and their loss
    // masks are byte-auditable cross-engine — the step between t29's
    // threading and the trainer's dataloader.
    QueryDef(
      "t43_sft_loss_masks",
      (s, dir) => {
        val ev = Tables.eventsTopic(s, dir).select(
          col("user_id"), col("event_id"),
          concat_ws(" ", col("event_type"),
            get_json_object(col("_value"), "$.k")).as("turn"),
          col("event_type").isin("purchase", "error").as("assistant"))
        graft.ops.Packing.packWithMasks(ev, "user_id", Seq("event_id"),
            "turn", col("assistant"), seqLen = 64, shards = 8)
          .orderBy(col("shard"), col("seq_idx"))
      },
      Some(Tables.withEventsTopic(
        """, base AS (
          |  SELECT user_id AS conv, CAST(user_id % 8 AS INTEGER) AS shard,
          |         event_id,
          |         string_split(event_type || ' ' ||
          |           json_extract_string(_value, '$.k'), ' ') AS toks,
          |         CASE WHEN event_type IN ('purchase', 'error')
          |              THEN 1 ELSE 0 END AS trainable
          |  FROM events_topic),
          |c AS (
          |  SELECT *, CAST(len(toks) AS BIGINT) AS n_tokens,
          |         COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (
          |           PARTITION BY shard ORDER BY conv, event_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |           AS tok_start
          |  FROM base),
          |tok AS (
          |  SELECT conv, shard, trainable,
          |         UNNEST(list_transform(range(1, CAST(n_tokens AS INTEGER) + 1),
          |                i -> {'gpos': tok_start + i - 1, 'tok': toks[i]})) AS u
          |  FROM c),
          |t2 AS (
          |  SELECT conv, shard, trainable,
          |         CAST(u.gpos AS BIGINT) AS gpos, u.tok AS tok
          |  FROM tok)
          |SELECT shard, CAST(gpos // 64 AS BIGINT) AS seq_idx,
          |       count(*) AS n_tokens,
          |       CAST(SUM(trainable) AS BIGINT) AS n_train_tokens,
          |       count(DISTINCT conv) AS n_convos,
          |       md5(string_agg(tok, ' ' ORDER BY gpos)) AS seq_md5,
          |       md5(string_agg(CAST(trainable AS VARCHAR), '' ORDER BY gpos))
          |         AS mask_md5
          |FROM t2 GROUP BY shard, seq_idx
          |ORDER BY shard, seq_idx""".stripMargin))),

    // ROLLING Z-SCORE INGEST MONITORING: each record's metric is tested
    // against the mean/variance of its partition's previous 10 values,
    // with the z-test cross-multiplied into pure BIGINT arithmetic
    // ((n·v−s)²(n−1) > z²n(n·q−s²)) so the SAME rows flag in any engine —
    // float stddev (Welford vs naive) flips boundary flags. Faults are
    // injected deterministically (a +500 spike every offset % 97 == 0,
    // the t9-PII pattern) so the monitor has real positives to find; the
    // hash checks flag placement, not just counts.
    QueryDef(
      "t42_rolling_anomaly",
      (s, dir) => {
        val ev = Tables.eventsTopic(s, dir).select(
          col("_partition").as("partition"),
          col("_offset").as("offset"),
          (get_json_object(col("_value"), "$.k").cast("long") +
            when(col("_offset") % 97 === 0, 500L).otherwise(0L)).as("v"))
        graft.ops.Anomaly.rollingZ(ev, Seq("partition"), "offset", "v",
            n = 10, z = 3)
          .groupBy(col("partition"))
          .agg(sum(when(col("n_prior") === 10, 1L).otherwise(0L)).as("n_tested"),
            sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"),
            sum(when(col("is_anomaly"), col("offset"))).as("sum_anom_off"))
          .orderBy(col("partition"))
      },
      Some(Tables.withEventsTopic(
        """, base AS (
          |  SELECT _partition AS p, _offset AS o,
          |         CAST(json_extract_string(_value, '$.k') AS BIGINT) +
          |         CASE WHEN _offset % 97 = 0 THEN 500 ELSE 0 END AS v
          |  FROM events_topic),
          |w AS (
          |  SELECT p, o, v,
          |         CAST(COALESCE(sum(v) OVER win, 0) AS BIGINT) AS s,
          |         CAST(COALESCE(sum(v * v) OVER win, 0) AS BIGINT) AS q,
          |         count(v) OVER win AS np
          |  FROM base
          |  WINDOW win AS (PARTITION BY p ORDER BY o
          |                 ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
          |f AS (
          |  SELECT p, o, np,
          |         np = 10 AND
          |         (10 * v - s) * (10 * v - s) * 9 > 9 * 10 * (10 * q - s * s)
          |           AS is_anomaly
          |  FROM w)
          |SELECT p AS partition,
          |       CAST(SUM(CASE WHEN np = 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_tested,
          |       CAST(SUM(CASE WHEN is_anomaly THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
          |       CAST(SUM(CASE WHEN is_anomaly THEN o END) AS BIGINT) AS sum_anom_off
          |FROM f GROUP BY p ORDER BY partition""".stripMargin)))
  )
}
