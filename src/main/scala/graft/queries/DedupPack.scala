package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Deduplication operators over `documents`, each mirrored by a DuckDB
  * oracle that re-implements the identical hash pipeline in SQL (md5-hex is
  * the shared deterministic hash).
  */
object DedupPack extends QueryPack {

  /** Shared shingle CTE (distinct word 3-grams per doc) for oracle SQL. */
  private[queries] val shinglesCte =
    """sh AS (
      |  SELECT DISTINCT doc_id AS doc, s AS sh FROM (
      |    SELECT doc_id,
      |           unnest(list_transform(generate_series(1, len(w) - 2),
      |                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
      |  WHERE s <> ''
      |)""".stripMargin

  private val k = 16
  private val nBands = 4

  private[queries] def sigsCte: String = {
    import graft.ops.Dedup.{minhashA, minhashB, MinhashPrime}
    val mins = (0 until k).map(i =>
      s"min((${minhashA(i)} * h + ${minhashB(i)}) % $MinhashPrime) AS m$i").mkString(", ")
    s"""sigs AS (SELECT doc, $mins FROM (
       |  SELECT doc, CAST('0x' || substr(md5(sh), 1, 7) AS BIGINT) AS h FROM sh)
       |GROUP BY doc)""".stripMargin
  }

  private[queries] def bandsCte: String = {
    val rows = (0 until nBands).map { b =>
      val ms = (0 until k / nBands).map(r =>
        s"CAST(m${b * (k / nBands) + r} AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT doc, $b AS band, md5($ms) AS bucket FROM sigs"
    }
    s"bands AS (${rows.mkString(" UNION ALL ")})"
  }

  private[queries] val jaccardCtes =
    """counts AS (SELECT doc, count(*) AS n FROM sh GROUP BY doc),
      |inter AS (
      |  SELECT c.a, c.b, count(*) AS inter
      |  FROM cands c
      |  JOIN sh sa ON sa.doc = c.a
      |  JOIN sh sb ON sb.doc = c.b AND sb.sh = sa.sh
      |  GROUP BY c.a, c.b)""".stripMargin

  override def entries: Seq[QueryDef] = Seq(

    // exact dedup: content hash (normalized) — one shuffle on md5
    QueryDef(
      "d1_exact_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val g = Dedup.exactGroups(docs, "doc_id", "text")
        g.agg(count(lit(1)).as("n_groups"),
          sum(col("n_docs")).as("n_docs"),
          count(when(col("n_docs") > 1, 1)).as("n_dup_groups"),
          min(col("content_hash")).as("min_hash"))
      },
      Some(
        """SELECT count(*) AS n_groups,
          |       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
          |       count(*) FILTER (n_docs > 1) AS n_dup_groups,
          |       min(content_hash) AS min_hash
          |FROM (SELECT md5(lower(trim(text))) AS content_hash, count(*) AS n_docs
          |      FROM documents GROUP BY 1)""".stripMargin)),

    // MinHash + LSH banding + exact-Jaccard verify (threshold 0.5)
    QueryDef(
      "d2_minhash_lsh",
      (s, dir) => Dedup.nearDuplicates(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5, k = k, bands = nBands)
        .orderBy(col("a"), col("b")),
      Some(
        s"""WITH $shinglesCte,
           |$sigsCte,
           |$bandsCte,
           |cands AS (
           |  SELECT DISTINCT l.doc AS a, r.doc AS b
           |  FROM bands l JOIN bands r
           |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc < r.doc),
           |$jaccardCtes
           |SELECT i.a, i.b, round(i.inter / (ca.n + cb.n - i.inter), 4) AS jac
           |FROM inter i
           |JOIN counts ca ON ca.doc = i.a
           |JOIN counts cb ON cb.doc = i.b
           |WHERE i.inter / (ca.n + cb.n - i.inter) >= 0.5
           |ORDER BY a, b""".stripMargin)),

    // exhaustive n-gram Jaccard via inverted-index join (threshold 0.5)
    QueryDef(
      "d3_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5)
        .orderBy(col("a"), col("b")),
      Some(
        s"""WITH $shinglesCte,
           |counts AS (SELECT doc, count(*) AS n FROM sh GROUP BY doc),
           |inter AS (
           |  SELECT l.doc AS a, r.doc AS b, count(*) AS inter
           |  FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc < r.doc
           |  GROUP BY 1, 2)
           |SELECT i.a, i.b, i.inter, ca.n AS na, cb.n AS nb,
           |       round(i.inter / (ca.n + cb.n - i.inter), 4) AS jac
           |FROM inter i
           |JOIN counts ca ON ca.doc = i.a
           |JOIN counts cb ON cb.doc = i.b
           |WHERE i.inter / (ca.n + cb.n - i.inter) >= 0.5
           |ORDER BY a, b""".stripMargin)),

    // SimHash: 60-bit vote-vector fingerprint per doc (first 25 docs shown)
    QueryDef(
      "d4_simhash",
      (s, dir) => Dedup.simhash(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .where(col("doc") < 25)
        .orderBy(col("doc")),
      Some {
        val votes = (0 until 60).map(j =>
          s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(", ")
        val bits = (0 until 60).map(j =>
          s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
        s"""WITH words AS (
           |  SELECT DISTINCT doc_id AS doc, w FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
           |  WHERE w <> ''),
           |hashed AS (
           |  SELECT doc, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM words),
           |votes AS (SELECT doc, $votes FROM hashed GROUP BY doc)
           |SELECT doc, CAST($bits AS BIGINT) AS simhash
           |FROM votes WHERE doc < 25 ORDER BY doc""".stripMargin
      }),

    // embedding-cosine near-dup pairs (double-precision sequential fold on
    // both sides -> bit-identical cosines)
    QueryDef(
      "d5_embed_cosine_dup",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val sim = graft.ops.Similarity
        val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"),
          sim.norm(col("embedding")).as("na"))
        val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"),
          sim.norm(col("embedding")).as("nb"))
        a.join(b, col("a") < col("b"))
          .withColumn("c", sim.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
          .where(col("c") >= 0.4)
          .select(col("a"), col("b"), round(col("c"), 4).as("cos_sim"))
          .orderBy(col("a"), col("b"))
      },
      Some(
        """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          |pairs AS (
          |  SELECT a.vec_id AS a, b.vec_id AS b,
          |         list_reduce(list_transform(generate_series(1, len(a.embedding)),
          |                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y)
          |         / (sqrt(list_reduce(list_transform(generate_series(1, len(a.embedding)),
          |                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x, y) -> x + y)) *
          |            sqrt(list_reduce(list_transform(generate_series(1, len(b.embedding)),
          |                  i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y))) AS c
          |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
          |SELECT a, b, round(c, 4) AS cos_sim
          |FROM pairs WHERE c >= 0.4 ORDER BY a, b""".stripMargin)),

    // transitive duplicate clusters: connected components over the MinHash-
    // LSH near-dup pairs (min-label propagation ≙ recursive CTE closure)
    QueryDef(
      "d7_dup_clusters",
      (s, dir) => {
        val pairs = Dedup.nearDuplicates(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5, k = k, bands = nBands)
        // duplicateClusters consumes the pair list eagerly, so the
        // checkpoint-backed pairs frame can be released immediately
        val cc = Dedup.duplicateClusters(pairs)
        Dedup.release(pairs)
        cc.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_docs"), max(col("node")).as("max_doc"))
          .orderBy(col("cluster"))
      },
      Some(
        s"""WITH RECURSIVE $shinglesCte,
           |$sigsCte,
           |$bandsCte,
           |cands AS (
           |  SELECT DISTINCT l.doc AS a, r.doc AS b
           |  FROM bands l JOIN bands r
           |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc < r.doc),
           |$jaccardCtes,
           |pairs AS (
           |  SELECT i.a, i.b FROM inter i
           |  JOIN counts ca ON ca.doc = i.a
           |  JOIN counts cb ON cb.doc = i.b
           |  WHERE i.inter / (ca.n + cb.n - i.inter) >= 0.5),
           |edges AS (SELECT a AS src, b AS dst FROM pairs
           |          UNION ALL SELECT b, a FROM pairs),
           |cc AS (
           |  SELECT DISTINCT src AS node, src AS label FROM edges
           |  UNION
           |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node),
           |labels AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node)
           |SELECT cluster, count(*) AS n_docs, max(node) AS max_doc
           |FROM labels GROUP BY cluster ORDER BY cluster""".stripMargin)),

    // SOFT dedup (duplication-aware sampling): every member of a size-c
    // near-dup cluster keeps with probability 1/c via the deterministic
    // hash48 coin — expected mass per cluster is one document, variants
    // stay sampled instead of annihilated (the data-constrained-scaling
    // posture: repeated content has diminishing, not zero, value). The
    // oracle replays the full LSH+verify+cluster pipeline of d7 PLUS the
    // integer keep arithmetic, and pins per-cluster-size counts AND the
    // kept-membership id sum.
    QueryDef(
      "d16_soft_dedup",
      (s, dir) => {
        val r = Dedup.dupWeightedKeep(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5, k = k, bands = nBands)
        r.groupBy(col("c"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("kept").cast("long")).as("n_kept"),
            sum(when(col("kept"), col("doc_id"))).as("kept_id_sum"))
          .orderBy(col("c"))
      },
      Some(
        s"""WITH RECURSIVE $shinglesCte,
           |$sigsCte,
           |$bandsCte,
           |cands AS (
           |  SELECT DISTINCT l.doc AS a, r.doc AS b
           |  FROM bands l JOIN bands r
           |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc < r.doc),
           |$jaccardCtes,
           |pairs AS (
           |  SELECT i.a, i.b FROM inter i
           |  JOIN counts ca ON ca.doc = i.a
           |  JOIN counts cb ON cb.doc = i.b
           |  WHERE i.inter / (ca.n + cb.n - i.inter) >= 0.5),
           |edges AS (SELECT a AS src, b AS dst FROM pairs
           |          UNION ALL SELECT b, a FROM pairs),
           |cc AS (
           |  SELECT DISTINCT src AS node, src AS label FROM edges
           |  UNION
           |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node),
           |labels AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node),
           |sizes AS (SELECT cluster, count(*) AS c FROM labels GROUP BY 1),
           |m AS (SELECT l.node, s.c FROM labels l JOIN sizes s USING (cluster)),
           |alld AS (
           |  SELECT d.doc_id, COALESCE(m.c, 1) AS c
           |  FROM documents d LEFT JOIN m ON m.node = d.doc_id),
           |kk AS (
           |  SELECT doc_id, c,
           |         list_reduce(list_transform(string_split(substr(
           |             md5(CAST(doc_id AS VARCHAR)), 1, 12), ''),
           |           x -> CAST(strpos('0123456789abcdef', x) - 1 AS BIGINT)),
           |           (a, b) -> a * 16 + b) <= 281474976710655 // c AS kept
           |  FROM alld)
           |SELECT c, count(*) AS n_docs,
           |       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |       CAST(SUM(CASE WHEN kept THEN doc_id END) AS BIGINT) AS kept_id_sum
           |FROM kk GROUP BY c ORDER BY c""".stripMargin)),

    // Benchmark decontamination: docs 0-9 stand in as the held-out
    // benchmark; corpus docs sharing >= 3 distinct 3-grams with any of
    // them are flagged. One shingle pass per side + a broadcast equi-join
    // on the n-gram — never a corpus self-join.
    QueryDef(
      "d8_contamination",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.contamination(
          docs.where(col("doc_id") >= 10), docs.where(col("doc_id") < 10),
          "doc_id", "text", n = 3, minShared = 3)
          .orderBy(col("c_doc"), col("p_doc"))
      },
      Some(
        s"""WITH $shinglesCte,
           |c AS (SELECT doc, sh FROM sh WHERE doc >= 10),
           |p AS (SELECT doc, sh FROM sh WHERE doc < 10)
           |SELECT c.doc AS c_doc, p.doc AS p_doc, count(*) AS shared
           |FROM c JOIN p USING (sh)
           |GROUP BY 1, 2 HAVING count(*) >= 3
           |ORDER BY c_doc, p_doc""".stripMargin)),

    // Bloom-prefiltered decontamination — d8's 100 TB form for a LARGE
    // probe side: the benchmark n-grams compress into a 2048-row bitmap
    // (65536 bits / 32 per word) that always broadcasts; the corpus gram
    // stream takes k=4 map-side broadcast joins and one per-doc combine,
    // never a gram shuffle. No false negatives by construction; the
    // oracle replays the identical build + probe bit-for-bit.
    QueryDef(
      "d17_bloom_decontamination",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.bloomContamination(
          docs.where(col("doc_id") >= 10), docs.where(col("doc_id") < 10),
          "doc_id", "text", n = 3, mBits = 1 << 16, k = 4, minHits = 3)
          .orderBy(col("doc"))
      },
      Some(
        s"""WITH $shinglesCte,
           |c AS (SELECT doc, sh FROM sh WHERE doc >= 10),
           |p AS (SELECT DISTINCT sh FROM sh WHERE doc < 10),
           |bpos AS (
           |  SELECT DISTINCT
           |    CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || sh), 1, 15)
           |         AS BIGINT) % 65536 AS pos
           |  FROM p CROSS JOIN range(4) t(j)),
           |bloom AS (
           |  SELECT pos // 32 AS word,
           |         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
           |  FROM bpos GROUP BY 1),
           |cpos AS (
           |  SELECT c.doc, c.sh,
           |    CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || sh), 1, 15)
           |         AS BIGINT) % 65536 AS pos
           |  FROM c CROSS JOIN range(4) t(j)),
           |gram AS (
           |  SELECT doc, sh,
           |         count(*) FILTER (
           |           WHERE ((bits >> CAST(pos % 32 AS INT)) & 1) = 1) AS setbits
           |  FROM cpos LEFT JOIN bloom ON cpos.pos // 32 = bloom.word
           |  GROUP BY doc, sh)
           |SELECT doc, CAST(count(*) AS BIGINT) AS n_grams,
           |       CAST(count(*) FILTER (WHERE setbits = 4) AS BIGINT) AS bloom_hits
           |FROM gram GROUP BY doc
           |HAVING count(*) FILTER (WHERE setbits = 4) >= 3
           |ORDER BY doc""".stripMargin)),

    // Inter-document span dedup (the Falcon/RefinedWeb line-dedup stage;
    // spans = consecutive 8-word windows since these documents carry no
    // newlines): a span instance is dropped when the same text occurred
    // earlier (smaller doc id / earlier position); docs are rebuilt from
    // their surviving spans. One hash shuffle on md5(span) + one per-doc
    // aggregate with an IN-ROW position sort — never a global sort, never
    // a pairwise compare. The oracle re-runs the identical ownership rule.
    QueryDef(
      "d9_span_dedup",
      (s, dir) => graft.ops.SpanDedup.dedupSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text", chunkWords = 8)
        .where(col("n_dropped") > 0)
        .orderBy(col("doc")),
      Some(
        """WITH w AS (
          |  SELECT doc_id AS doc, string_split(text, ' ') AS words FROM documents),
          |s AS (
          |  SELECT doc,
          |         UNNEST(list_transform(range(CAST(ceil(len(words) / 8.0) AS BIGINT)),
          |                i -> {'pos': i, 'span': array_to_string(
          |                        words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')})) AS u
          |  FROM w),
          |inst AS (SELECT doc, u.pos AS pos, u.span AS span, md5(u.span) AS h,
          |                doc * 1000000 + u.pos AS inst FROM s),
          |owners AS (SELECT h, min(inst) AS owner FROM inst GROUP BY h),
          |j AS (SELECT i.*, o.owner FROM inst i JOIN owners o USING (h))
          |SELECT doc, CAST(count(*) AS INTEGER) AS n_spans,
          |       CAST(SUM(CASE WHEN inst = owner THEN 0 ELSE 1 END) AS INTEGER) AS n_dropped,
          |       round(SUM(CASE WHEN inst = owner THEN 0 ELSE 1 END) * 1.0 / count(*), 4) AS dup_ratio,
          |       COALESCE(string_agg(CASE WHEN inst = owner THEN span END, ' ' ORDER BY pos), '') AS cleaned_text
          |FROM j GROUP BY doc
          |HAVING SUM(CASE WHEN inst = owner THEN 0 ELSE 1 END) > 0
          |ORDER BY doc""".stripMargin)),

    // EXACT-SUBSTRING dedup (Lee et al. 2022 semantics, d9's stride-1
    // upgrade): 10-token windows slide at stride 1, any window whose text
    // occurred strictly earlier removes ALL its tokens — duplicated runs
    // are caught at ANY alignment, the suffix-array property, done
    // relationally (window hashing replaces suffix sorting; removal
    // explode ∝ duplicated volume × window length). The oracle replays
    // windows, ownership, interval union, and the rebuilt-text digest.
    QueryDef(
      "d18_substring_dedup",
      (s, dir) => graft.ops.SpanDedup.substringDedup(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        windowTokens = 10)
        .orderBy(col("doc")),
      Some(
        """WITH w AS (
          |  SELECT doc_id AS doc, string_split(text, ' ') AS words
          |  FROM documents),
          |st AS (
          |  SELECT doc, words,
          |         unnest(range(1, greatest(len(words) - 9, 0) + 1)) AS u
          |  FROM w),
          |win AS (
          |  SELECT doc, u - 1 AS pos,
          |         md5(array_to_string(
          |           words[CAST(u AS INT):CAST(u + 9 AS INT)], ' ')) AS h
          |  FROM st),
          |inst AS (SELECT doc, pos, h, doc * 1000000 + pos AS inst FROM win),
          |own AS (SELECT h, min(inst) AS owner FROM inst GROUP BY h),
          |dup AS (SELECT i.doc, i.pos FROM inst i JOIN own USING (h)
          |        WHERE i.inst <> own.owner),
          |rem AS (SELECT DISTINCT doc, pos + off AS tokpos
          |        FROM dup, range(0, 10) t(off)),
          |tp AS (
          |  SELECT doc, words, unnest(range(1, len(words) + 1)) AS u
          |  FROM w),
          |toks AS (SELECT doc, u - 1 AS pos, words[CAST(u AS INT)] AS tok
          |         FROM tp),
          |j AS (SELECT t.doc, t.pos, t.tok, r.tokpos IS NOT NULL AS rm
          |      FROM toks t LEFT JOIN rem r
          |        ON r.doc = t.doc AND r.tokpos = t.pos)
          |SELECT doc, CAST(count(*) AS BIGINT) AS n_tokens,
          |       CAST(count(*) FILTER (WHERE rm) AS BIGINT) AS n_removed,
          |       md5(COALESCE(string_agg(CASE WHEN NOT rm THEN tok END, ' '
          |                               ORDER BY pos), '')) AS cleaned_md5
          |FROM j GROUP BY doc ORDER BY doc""".stripMargin)),

    // Incremental first-occurrence dedup: the corpus arrives as two
    // batches (split at max(doc_id) div 2); batch 1 is admitted against
    // nothing, its FULL index (every seen doc, accepted or not) persists,
    // and batch 2 is admitted against index + earlier batch-2 docs. A doc
    // is rejected iff some strictly earlier doc LSH-collides AND verifies
    // at Jaccard >= 0.5. The oracle recomputes the global pair set once
    // and applies the same "exists earlier near-dup" rule — proving the
    // incremental path equals the one-shot semantics (history never
    // re-shingled; per-increment cost is batch x (index ∪ batch)).
    QueryDef(
      "d11_incremental_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val half = docs.agg(expr("max(doc_id) div 2").as("thr"))
        val b1 = docs.crossJoin(broadcast(half))
          .where(col("doc_id") < col("thr")).drop("thr")
        val b2 = docs.crossJoin(broadcast(half))
          .where(col("doc_id") >= col("thr")).drop("thr")
        // batch 1's index serves BOTH its own admission and phase 2's
        // history — shingled once, released after the (eager) admits
        val ix = Dedup.nearDupIndex(b1, "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val a1 = Dedup.admitAgainstIndex(None, b1, "doc_id", "text",
            threshold = 0.5, precomputedAgg = Some(ix))
          val a2 = Dedup.admitAgainstIndex(Some(ix), b2, "doc_id", "text",
            threshold = 0.5)
          a1.withColumn("phase", lit(1))
            .unionByName(a2.withColumn("phase", lit(2)))
            .select(col("doc"), col("phase"), col("accepted"))
            .orderBy(col("doc"))
        } finally ix.unpersist(false)
      },
      Some(
        s"""WITH $shinglesCte,
           |$sigsCte,
           |$bandsCte,
           |cands AS (
           |  SELECT DISTINCT l.doc AS a, r.doc AS b
           |  FROM bands l JOIN bands r
           |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc < r.doc),
           |$jaccardCtes,
           |dups AS (
           |  SELECT i.b
           |  FROM inter i
           |  JOIN counts ca ON ca.doc = i.a
           |  JOIN counts cb ON cb.doc = i.b
           |  WHERE i.inter / (ca.n + cb.n - i.inter) >= 0.5),
           |thr AS (SELECT max(doc_id) // 2 AS t FROM documents)
           |SELECT d.doc_id AS doc,
           |       CASE WHEN d.doc_id < thr.t THEN 1 ELSE 2 END AS phase,
           |       NOT EXISTS (SELECT 1 FROM dups WHERE dups.b = d.doc_id) AS accepted
           |FROM documents d, thr
           |ORDER BY doc""".stripMargin)),

    // Quality-aware cluster representatives: within each transitive dup
    // cluster keep the LONGEST member (ties -> larger id), not the
    // first-by-id — min-id dedup can systematically keep a truncated
    // variant. Hash-only argmax (max over (score, id) structs keyed on
    // the cluster label), never a per-cluster sort window; the oracle
    // resolves the same closure recursively and re-runs the argmax.
    QueryDef(
      "d15_best_of_cluster",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
          threshold = 0.5, k = k, bands = nBands)
        val best = Dedup.bestPerCluster(docs, "doc_id", pairs,
          size(split(col("text"), " ")).cast("long"))
        Dedup.release(pairs)
        best.where(col("n_members") > 1) // dup clusters only (focused diff)
          .orderBy(col("cluster"))
      },
      Some(
        s"""WITH RECURSIVE $shinglesCte,
           |$sigsCte,
           |$bandsCte,
           |cands AS (
           |  SELECT DISTINCT l.doc AS a, r.doc AS b
           |  FROM bands l JOIN bands r
           |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc < r.doc),
           |$jaccardCtes,
           |pairs AS (
           |  SELECT i.a, i.b FROM inter i
           |  JOIN counts ca ON ca.doc = i.a
           |  JOIN counts cb ON cb.doc = i.b
           |  WHERE i.inter / (ca.n + cb.n - i.inter) >= 0.5),
           |edges AS (SELECT a AS src, b AS dst FROM pairs
           |          UNION ALL SELECT b, a FROM pairs),
           |cc AS (
           |  SELECT DISTINCT src AS node, src AS label FROM edges
           |  UNION
           |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node),
           |labels AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node),
           |scored AS (
           |  SELECT COALESCE(l.cluster, d.doc_id) AS cluster, d.doc_id AS doc,
           |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS score
           |  FROM documents d LEFT JOIN labels l ON l.node = d.doc_id),
           |r AS (
           |  SELECT *, count(*) OVER (PARTITION BY cluster) AS n_members,
           |         row_number() OVER (PARTITION BY cluster
           |             ORDER BY score DESC, doc DESC) AS rnk
           |  FROM scored)
           |SELECT cluster, doc, score, CAST(n_members AS BIGINT) AS n_members
           |FROM r WHERE rnk = 1 AND n_members > 1
           |ORDER BY cluster""".stripMargin)),

    // n-gram CONTAINMENT pairs: metric = inter / min(na, nb) — the
    // asymmetric dedup check that catches a small document living inside
    // a big one (quotes, excerpts), which symmetric Jaccard structurally
    // misses. Same capped inverted-index machinery and exactness contract
    // as d3; containment is monotone in the intersection so the DF-cap
    // bound filter stays sound.
    QueryDef(
      "d14_containment",
      (s, dir) => Dedup.ngramContainmentPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.8)
        .orderBy(col("a"), col("b")),
      Some(
        s"""WITH $shinglesCte,
           |counts AS (SELECT doc, count(*) AS n FROM sh GROUP BY doc),
           |inter AS (
           |  SELECT l.doc AS a, r.doc AS b, count(*) AS inter
           |  FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc < r.doc
           |  GROUP BY 1, 2)
           |SELECT i.a, i.b, i.inter, ca.n AS na, cb.n AS nb,
           |       round(i.inter / least(ca.n, cb.n), 4) AS containment
           |FROM inter i
           |JOIN counts ca ON ca.doc = i.a
           |JOIN counts cb ON cb.doc = i.b
           |WHERE i.inter / least(ca.n, cb.n) >= 0.8
           |ORDER BY a, b""".stripMargin)),

    // Blocked entity resolution: same-block (8-char normalized prefix)
    // candidate pairs verified by exact Levenshtein on the 200-char
    // normalized prefix, kept when distance <= 20% of the longer side.
    // Both engines run the identical codegen'd edit distance, so the
    // distances hash-match bit-for-bit. Blocks above the size cap are
    // dropped (boilerplate guard), so pair generation is bounded per
    // block and there is never an all-pairs product.
    QueryDef(
      "d12_entity_resolution",
      (s, dir) => graft.ops.EntityResolution.matchPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        prefixLen = 8, verifyPrefixLen = 200, maxRelDist = 0.2,
        maxBlockSize = 1000)
        .orderBy(col("a"), col("b")),
      Some(
        """WITH n AS (
          |  SELECT doc_id AS doc,
          |         substr(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), 1, 200) AS t
          |  FROM documents),
          |b AS (SELECT doc, t, substr(t, 1, 8) AS blk FROM n),
          |c AS (SELECT blk, count(*) AS bn FROM b GROUP BY blk),
          |bb AS (SELECT b.* FROM b JOIN c USING (blk) WHERE bn <= 1000),
          |p AS (
          |  SELECT l.doc AS a, r.doc AS b2, levenshtein(l.t, r.t) AS lev,
          |         greatest(len(l.t), len(r.t)) AS mx
          |  FROM bb l JOIN bb r ON l.blk = r.blk AND l.doc < r.doc)
          |SELECT a, b2 AS b, CAST(lev AS BIGINT) AS lev,
          |       round(lev * 1.0 / mx, 4) AS rel
          |FROM p WHERE lev <= 0.2 * mx
          |ORDER BY a, b""".stripMargin)),

    // THE FULL CURATION FUNNEL — the Dolma/DataComp pre-training pipeline
    // in one plan, including the two expensive stages t30's capstone
    // omits: language gate -> heuristic quality gate -> exact dedup
    // (hash keepers) -> MinHash NEAR-dedup (the e18 exists-earlier rule)
    // -> n-gram DECONTAMINATION against a held-out suite (docs < 10).
    // The observable is the funnel audit itself: one row per stage with
    // survivor count, id-sum (a set fingerprint), and token volume — so
    // every INTERMEDIATE stage is hash-proven, not just the final set.
    // Scale shape: each gate is a narrow codegen filter; exact dedup is
    // one hash shuffle + semi-join; near-dedup shingles only stage-3
    // SURVIVORS (banding explodes compact signatures, candidates join on
    // (band, bucket)); decontamination broadcasts the benchmark's grams.
    // Nothing is all-pairs; every shuffle is on a key that shrinks as the
    // funnel narrows.
    QueryDef(
      "d19_curation_funnel",
      (s, dir) => {
        import graft.ops.TextAnalysis
        val all = Tables.load(s, dir, "documents")
        val bench = all.where(col("doc_id") < 10) // the held-out suite
        val corpus = all.where(col("doc_id") >= 10)
        val s1 = corpus.where(TextAnalysis.languageGuess(col("text")) === "en")
        val toks = split(col("text"), " ")
        // integer-exact quality rules: >= 5 tokens, >= 30% distinct
        val s2 = s1.where(TextAnalysis.tokenCount(col("text")) >= 5 &&
          size(array_distinct(toks)) * 10 >= size(toks) * 3)
        val keepers = s2.groupBy(md5(lower(trim(col("text")))).as("h"))
          .agg(min(col("doc_id")).as("doc_id"))
        val s3 = s2.join(keepers.select("doc_id"), Seq("doc_id"), "left_semi")
        val pairs = Dedup.nearDuplicates(s3, "doc_id", "text",
          threshold = 0.5, k = k, bands = nBands)
        val s4 = s3.join(pairs.select(col("b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        val contaminated = Dedup.contamination(s4, bench, "doc_id", "text",
          n = 3, minShared = 3)
          .select(col("c_doc").as("doc_id")).distinct()
        val s5 = s4.join(contaminated, Seq("doc_id"), "left_anti")
        def stage(order: Int, gate: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"),
            coalesce(sum(TextAnalysis.tokenCount(col("text")).cast("long")),
              lit(0L)).as("tok_sum"))
            .select(lit(order).as("stage"), lit(gate).as("gate"),
              col("n_docs"), col("id_sum"), col("tok_sum"))
        stage(0, "corpus", corpus)
          .unionAll(stage(1, "lang", s1))
          .unionAll(stage(2, "quality", s2))
          .unionAll(stage(3, "exact_dedup", s3))
          .unionAll(stage(4, "near_dedup", s4))
          .unionAll(stage(5, "decontaminated", s5))
          .orderBy(col("stage"))
      },
      Some {
        val stages = Seq("corp" -> (0, "corpus"), "f1" -> (1, "lang"),
          "f2" -> (2, "quality"), "f3" -> (3, "exact_dedup"),
          "f4" -> (4, "near_dedup"), "f5" -> (5, "decontaminated"))
          .map { case (cte, (i, gate)) =>
            s"""SELECT $i AS stage, '$gate' AS gate, count(*) AS n_docs,
               |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS id_sum,
               |  CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT) AS tok_sum
               |FROM $cte""".stripMargin
          }.mkString("\nUNION ALL\n")
        s"""WITH corp AS (SELECT * FROM documents WHERE doc_id >= 10),
           |f1 AS (
           |  SELECT * FROM corp
           |  WHERE len(list_filter(string_split(text, ' '),
           |          w -> w IN ('the','a','of','and','in','to'))) * 1.0
           |        / len(string_split(text, ' ')) >= 0.04),
           |f2 AS (
           |  SELECT * FROM f1
           |  WHERE len(string_split(text, ' ')) >= 5
           |    AND len(list_distinct(string_split(text, ' '))) * 10
           |        >= len(string_split(text, ' ')) * 3),
           |dd AS (
           |  SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keeper
           |  FROM f2 GROUP BY 1),
           |f3 AS (SELECT d.* FROM f2 d JOIN dd ON d.doc_id = dd.keeper),
           |sh AS (
           |  SELECT DISTINCT doc_id AS doc, s AS sh FROM (
           |    SELECT doc_id,
           |           unnest(list_transform(generate_series(1, len(w) - 2),
           |                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM f3))
           |  WHERE s <> ''),
           |$sigsCte,
           |$bandsCte,
           |cands AS (
           |  SELECT DISTINCT l.doc AS a, r.doc AS b
           |  FROM bands l JOIN bands r
           |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc < r.doc),
           |$jaccardCtes,
           |dups AS (
           |  SELECT DISTINCT i.b
           |  FROM inter i
           |  JOIN counts ca ON ca.doc = i.a
           |  JOIN counts cb ON cb.doc = i.b
           |  WHERE i.inter / (ca.n + cb.n - i.inter) >= 0.5),
           |f4 AS (SELECT * FROM f3
           |       WHERE NOT EXISTS (SELECT 1 FROM dups WHERE dups.b = doc_id)),
           |shb AS (
           |  SELECT DISTINCT doc_id AS doc, s AS sh FROM (
           |    SELECT doc_id,
           |           unnest(list_transform(generate_series(1, len(w) - 2),
           |                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           |    FROM (SELECT doc_id, string_split(text, ' ') AS w
           |          FROM documents WHERE doc_id < 10))
           |  WHERE s <> ''),
           |cont AS (
           |  SELECT DISTINCT c.doc FROM (
           |    SELECT c4.doc, p.doc AS pd, count(*) AS n
           |    FROM (SELECT sh.doc, sh.sh FROM sh
           |          WHERE sh.doc IN (SELECT doc_id FROM f4)) c4(doc, sh)
           |    JOIN shb p USING (sh)
           |    GROUP BY 1, 2 HAVING count(*) >= 3) c),
           |f5 AS (SELECT * FROM f4
           |       WHERE doc_id NOT IN (SELECT doc FROM cont))
           |SELECT * FROM (
           |$stages
           |) ORDER BY stage""".stripMargin
      })
  )
}
