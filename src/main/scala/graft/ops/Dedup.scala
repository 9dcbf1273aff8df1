package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines — the
  * beyond-reference superset (SURVEY §7.3). All are DataFrame-in/out and
  * avoid O(n²) work:
  *
  *   - exact: content-hash groupBy — one shuffle on md5(text)
  *   - MinHash+LSH: shingle → k-permutation signature → banded buckets →
  *     candidate join → exact-Jaccard verify. Work is O(docs × shingles)
  *     plus a join keyed on (band, bucket) that only materializes candidate
  *     pairs, never the full cross product (the classic MMDS ch.3 scheme).
  *   - SimHash: 60-bit vote vector over word hashes, near-dups via
  *     bit_count(xor) under a banded pre-filter (pigeonhole on 4 chunks).
  *   - n-gram Jaccard: inverted-index self-join with per-shingle postings.
  *
  * Determinism note: every hash is md5-hex (lowercase, same in DuckDB), so
  * all of these are oracle-checkable; min() over hex strings is a valid
  * uniform minhash because md5 is uniform and hex compare is bytewise.
  *
  * 100 TB notes: the shingle explode is the dominant shuffle; salt-free
  * because shingle keys are near-uniform. Hot shingles (stopword runs)
  * should be document-frequency-capped — see `maxShinglePostings` — which
  * bounds any posting list and hence the candidate-pair blowup.
  */
object Dedup {

  /** Word n-gram shingles, distinct per doc. (Guarded sequence: Spark's
    * sequence(1, 0) would *descend*, so short docs get an empty array.)
    *
    * `split` is materialized as its own projected column BEFORE the gram
    * lambda: subexpression elimination does not reach inside higher-order-
    * function lambdas, so inlining `split(text)` into the `element_at`
    * calls re-splits the text n times per gram — ~10× the scan cost. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val words = col("_words")
    val cnt = size(words) - (n - 1)
    val grams = when(cnt >= 1,
      transform(sequence(lit(1), greatest(cnt, lit(1))),
        i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol).as("doc"), split(col(textCol), " ").as("_words"))
      .select(col("doc"), explode(array_distinct(grams)).as("sh"))
      .where(col("sh") =!= "")
  }

  /** Same output as [[shingles]] for long ids, built with a typed flatMap:
    * higher-order array functions are CodegenFallback (interpreted,
    * allocation-heavy per row), while this is one tight JVM loop per
    * document — the shingle build is the widest narrow stage of every dedup
    * pipeline, worth the non-Catalyst hop. */
  def shinglesFlat(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null id/text rows are silently dropped — same as the Catalyst path
    // (split(null)→null, explode drops); without the filter a single null
    // row would fail the job (NPE in the closure / long deserialization)
    docs.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (doc, text) =>
        val w = text.split(" ", -1)
        if (w.length < n) Iterator.empty
        else {
          val seen = new scala.collection.mutable.HashSet[String]
          val sb = new StringBuilder(64)
          (0 to w.length - n).iterator.flatMap { i =>
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(w(i + j)); j += 1
            }
            val s = sb.toString
            if (s.nonEmpty && seen.add(s)) Iterator.single((doc, s))
            else Iterator.empty
          }
        }
      }
      .toDF("doc", "sh")
  }

  /** [[shinglesFlat]] when the id column is integral (cast back to its
    * original type), [[shingles]] otherwise — same rows either way. */
  def shinglesAuto(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val dt = docs.schema(docs.schema.fieldIndex(idCol)).dataType
    dt match {
      case org.apache.spark.sql.types.LongType => shinglesFlat(docs, idCol, textCol, n)
      case org.apache.spark.sql.types.IntegerType =>
        shinglesFlat(docs, idCol, textCol, n)
          .withColumn("doc", col("doc").cast("int"))
      case _ => shingles(docs, idCol, textCol, n)
    }
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minShared` distinct n-grams with any probe ("benchmark") document —
    * the test-set-overlap check every training-data pipeline runs before a
    * corpus ships. Returns (c_doc, p_doc, shared) per contaminated pair.
    *
    * Shape at 100 TB: shingle both sides (distinct n-grams per doc), one
    * equi-join keyed on the n-gram, one count aggregate. The probe side
    * (the benchmark suite) is tiny, so Spark broadcasts it and the corpus
    * is touched in a single narrow pass — no corpus self-join anywhere.
    * `maxShinglePostings` drops ubiquitous n-grams by corpus document
    * frequency first (stop-gram skew cap) — at the cost of missing pairs
    * whose only shared grams are ubiquitous, which is the standard
    * decontamination trade. */
  def contamination(corpus: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minShared: Long = 5,
      maxShinglePostings: Option[Int] = None): DataFrame = {
    val c = shinglesAuto(corpus, idCol, textCol, n)
      .select(col("doc").as("c_doc"), col("sh"))
    val p = shinglesAuto(probes, idCol, textCol, n)
      .select(col("doc").as("p_doc"), col("sh"))
    maxShinglePostings match {
      case Some(cap) =>
        // single pass over the corpus explode: the per-shingle posting
        // list doubles as the DF filter (size <= cap) AND the join payload,
        // so no persist and no second corpus scan. The capped list bounds
        // the row, so the array form is safe; uncapped stays row-shaped
        // below (a ubiquitous shingle's array would be one giant row).
        val postings = c.groupBy(col("sh"))
          .agg(collect_list(col("c_doc")).as("cs"))
          .where(size(col("cs")) <= cap)
        postings.join(org.apache.spark.sql.functions.broadcast(p), "sh")
          .select(explode(col("cs")).as("c_doc"), col("p_doc"))
          .groupBy(col("c_doc"), col("p_doc"))
          .agg(count(lit(1)).as("shared"))
          .where(col("shared") >= minShared)
      case None =>
        c.join(org.apache.spark.sql.functions.broadcast(p), "sh")
          .groupBy(col("c_doc"), col("p_doc"))
          .agg(count(lit(1)).as("shared"))
          .where(col("shared") >= minShared)
    }
  }

  /** Bloom-prefiltered decontamination: flag corpus documents whose
    * distinct n-grams hit a Bloom filter built over the probe set's
    * n-grams at least `minHits` times. The 100 TB form of [[contamination]]
    * for a LARGE probe side: d8 broadcasts the benchmark n-grams raw,
    * which stops working when the held-out suite is itself millions of
    * documents — the Bloom compresses the probe set ~50–100× into a
    * ≤ mBits/32-row bitmap ([[Sketches.bloomBuild]]) that always
    * broadcasts.
    *
    * Plan shape: the corpus gram stream gets k (word, mask) probe columns,
    * then k broadcast-hash left joins against the bitmap — every join is
    * map-side, the corpus NEVER shuffles on the gram; the only exchange is
    * the final per-doc count combine. A gram "hits" iff all k bits are
    * set, so a flagged doc is contaminated up to the filter's
    * false-positive rate ((1−e^(−k·n/mBits))^k per gram) and a clean doc
    * is PROVABLY clean — Bloom filters have no false negatives, which is
    * the direction decontamination must never err. Feed flagged docs to
    * [[contamination]] for exact confirmation when the FPR matters.
    *
    * Returns (doc, n_grams, bloom_hits) for docs with
    * bloom_hits >= minHits. */
  def bloomContamination(corpus: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, n: Int = 3, mBits: Int = 1 << 16, k: Int = 4,
      minHits: Long = 5): DataFrame = {
    val p = shinglesAuto(probes, idCol, textCol, n).select(col("sh")).distinct()
    // materialize the bitmap ONCE: it is bounded (≤ mBits/32 rows — 32 KB
    // of longs at 2^16 bits, 4 MB at 2^30) and re-enters the plan as a
    // local relation, so the k probe joins below never recompute the
    // probe-side build k times
    val spark = corpus.sparkSession
    import spark.implicits._
    val bloom = Sketches.bloomBuild(p, col("sh"), mBits, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("word", "bits")
    val grams = shinglesAuto(corpus, idCol, textCol, n)
    val withPos = grams.select(
      col("doc") +: (0 until k).map { j =>
        pmod(Sketches.hash60(col("sh"), salt = s"$j|"), lit(mBits.toLong))
          .cast("int").as(s"p$j")
      }: _*)
      .select(
        col("doc") +: (0 until k).flatMap(j => Seq(
          shiftright(col(s"p$j"), 5).cast("long").as(s"w$j"),
          expr(s"shiftleft(CAST(1 AS BIGINT), p$j & 31)").as(s"m$j"))): _*)
    val joined = (0 until k).foldLeft(withPos) { (df, j) =>
      df.join(
        org.apache.spark.sql.functions.broadcast(
          bloom.select(col("word").as(s"w$j"), col("bits").as(s"b$j"))),
        Seq(s"w$j"), "left")
    }
    val hit = (0 until k).map(j =>
      coalesce(col(s"b$j").bitwiseAND(col(s"m$j")) === col(s"m$j"), lit(false)))
      .reduce(_ && _)
    joined.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(hit, 1L).otherwise(0L)).as("bloom_hits"))
      .where(col("bloom_hits") >= minHits)
  }

  /** Exact duplicate groups by content hash (optionally normalized). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String,
      normalized: Boolean = true): DataFrame = {
    val t = if (normalized) lower(trim(col(textCol))) else col(textCol)
    docs.groupBy(md5(t).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
  }

  /** MinHash permutation family: one 28-bit base hash per shingle
    * (md5-derived, so the DuckDB oracle reproduces it via hex cast), then k
    * cheap linear permutations m_i = min((a_i·h + b_i) mod p). One md5 per
    * shingle instead of k — at 100 TB the hash is the dominant CPU cost of
    * the signature stage. All values fit well inside int64 (32·2^28 < 2^34),
    * so the arithmetic is overflow-free and engine-portable. */
  val MinhashPrime = 268435399L // largest prime < 2^28
  def minhashA(i: Int): Long = 2L * i + 1
  def minhashB(i: Int): Long = 12582917L * i + 1

  def shingleHash28(sh: Column): Column =
    conv(substring(md5(sh), 1, 7), 16, 10).cast("long")

  /** k-permutation MinHash signature — one aggregate over the shingle
    * explode, no extra shuffle beyond the groupBy(doc). */
  def minhashSignatures(sh: DataFrame, k: Int = 16): DataFrame = {
    val withH = sh.withColumn("h", shingleHash28(col("sh")))
    def perm(i: Int) =
      min((lit(minhashA(i)) * col("h") + lit(minhashB(i))) % MinhashPrime).as(s"m$i")
    withH.groupBy(col("doc")).agg(perm(0), (1 until k).map(perm): _*)
  }

  /** LSH banding: band hash = md5 of its row minhashes; docs sharing any
    * (band, hash) bucket become candidates. */
  def lshBands(sigs: DataFrame, bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => col(s"m${b * rowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("bucket"))
    }
    sigs.select(col("doc"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs (a < b) sharing any LSH bucket. */
  def lshCandidates(bandsDf: DataFrame): DataFrame = {
    val l = bandsDf.select(col("doc").as("a"), col("band"), col("bucket"))
    val r = bandsDf.select(col("doc").as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Exact Jaccard for given pairs from the shingle postings. Verification
    * is array-side: pack each doc's (distinct) shingles into one array, hash
    * join the pairs to the two arrays, and count `array_intersect` — two
    * narrow joins keyed on doc id instead of re-joining pairs against the
    * full shingle explode. At 100 TB candidate pairs ≪ shingle instances,
    * so shuffling pair×array rows is far cheaper than pair×posting rows,
    * and the intersect itself is a map-side hash-set probe per row.
    * Zero-intersection pairs are emitted with jac=0 (callers threshold). */
  def jaccard(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val docSets = sh.groupBy(col("doc")).agg(collect_list(col("sh")).as("shs"))
    pairs
      .join(docSets.select(col("doc").as("a"), col("shs").as("sha")), "a")
      .join(docSets.select(col("doc").as("b"), col("shs").as("shb")), "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("na", size(col("sha")).cast("long"))
      .withColumn("nb", size(col("shb")).cast("long"))
      .withColumn("jac", col("inter") / (col("na") + col("nb") - col("inter")))
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"), col("jac"))
  }

  /** End-to-end MinHash-LSH near-dup detection with exact verify.
    *
    * Single pass over the shingle explode: ONE groupBy(doc) produces both
    * the k-permutation signature and the per-doc (distinct) shingle array
    * used by the exact-Jaccard verify. The explode — the widest intermediate
    * at 100 TB — is consumed exactly once and never cached; what persists is
    * the compact per-doc aggregate (signature + array ≈ corpus size), which
    * three consumers share (banding, verify side a, verify side b).
    * Candidate pairs are small, so Catalyst/AQE broadcast them against the
    * per-doc table and the verify is a map-side array intersect.
    *
    * Storage discipline: the op runs EAGERLY — the thresholded pair list is
    * materialized (localCheckpoint) while the per-doc aggregate is hot, and
    * the aggregate's MEMORY_AND_DISK blocks are released before returning.
    * A long-lived session (pg-wire, streaming) therefore never accumulates
    * per-call storage; only the compact result frame holds blocks, freed
    * with [[release]] once the caller is done with it. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 16, bands: Int = 4): DataFrame = {
    val withH = shinglesAuto(docs, idCol, textCol)
      .withColumn("h", shingleHash28(col("sh")))
    def perm(i: Int) =
      min((lit(minhashA(i)) * col("h") + lit(minhashB(i))) % MinhashPrime).as(s"m$i")
    val docAgg = withH.groupBy(col("doc"))
      .agg(perm(0), ((1 until k).map(perm) :+ collect_list(col("sh")).as("shs")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cands = lshCandidates(lshBands(docAgg.drop("shs"), bands, k / bands))
      val docSets = docAgg.select(col("doc"), col("shs"))
      cands
        .join(docSets.select(col("doc").as("a"), col("shs").as("sha")), "a")
        .join(docSets.select(col("doc").as("b"), col("shs").as("shb")), "b")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
        .withColumn("na", size(col("sha")).cast("long"))
        .withColumn("nb", size(col("shb")).cast("long"))
        .withColumn("jac", col("inter") / (col("na") + col("nb") - col("inter")))
        .where(col("jac") >= threshold)
        .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
        .localCheckpoint() // eager: materializes before docAgg is released
    } finally docAgg.unpersist(false)
  }

  /** Compact per-doc near-dup index: MinHash signature + distinct-shingle
    * array per document — the state a CONTINUOUS ingest pipeline persists
    * between batches so history is never re-shingled. One aggregate over
    * the shingle explode (same single-pass shape as [[nearDuplicates]]);
    * size ∝ corpus docs, not corpus bytes. Writable as a plain table and
    * unioned across batches. */
  def nearDupIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16): DataFrame = {
    val withH = shinglesAuto(docs, idCol, textCol)
      .withColumn("h", shingleHash28(col("sh")))
    def perm(i: Int) =
      min((lit(minhashA(i)) * col("h") + lit(minhashB(i))) % MinhashPrime).as(s"m$i")
    withH.groupBy(col("doc"))
      .agg(perm(0), ((1 until k).map(perm) :+ collect_list(col("sh")).as("shs")): _*)
  }

  /** Incremental first-occurrence dedup: which docs of `batch` survive
    * against an accumulated history index ([[nearDupIndex]] of every doc
    * seen so far) plus earlier docs of the same batch?
    *
    * Contract (deterministic, order-defined): a batch doc `b` is REJECTED
    * iff some strictly earlier doc `a` — any indexed doc, or a batch doc
    * with smaller id — is an LSH candidate of `b` AND verifies at exact
    * Jaccard ≥ `threshold`. Ids must be globally monotone across batches
    * (arrival order). Feeding batches through this and unioning
    * [[nearDupIndex]] of each full batch into the index reproduces EXACTLY
    * the one-shot result over the concatenated corpus (DedupSpec law;
    * `d11_incremental_dedup` hash-checks it against a DuckDB oracle) —
    * dedup of a growing corpus costs one batch×(index∪batch) candidate
    * join per increment, never a full recompute.
    *
    * Returns (doc, accepted) for every batch doc. Scale shape: banding
    * explodes only compact signatures; the candidate join is keyed on
    * (band, bucket); verification joins candidate pairs against the two
    * compact shingle-array sides — the batch is touched once, the history
    * only through its index. */
  def admitAgainstIndex(index: Option[DataFrame], batch: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.5,
      k: Int = 16, bands: Int = 4,
      precomputedAgg: Option[DataFrame] = None): DataFrame = {
    // callers that already hold the batch's index (admitting a batch THEN
    // extending the index with it) pass it in and own its lifecycle —
    // otherwise the batch would be shingled twice
    val ownAgg = precomputedAgg.isEmpty
    val batchAgg = precomputedAgg.getOrElse(
      nearDupIndex(batch, idCol, textCol, k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      val all = index match {
        case Some(ix) => ix.withColumn("is_new", lit(false))
          .unionByName(batchAgg.withColumn("is_new", lit(true)))
        case None => batchAgg.withColumn("is_new", lit(true))
      }
      val bb = lshBands(all.drop("shs", "is_new"), bands, k / bands)
        .join(all.select(col("doc"), col("is_new")), "doc")
      val l = bb.select(col("doc").as("a"), col("is_new").as("na_new"),
        col("band"), col("bucket"))
      val r = bb.where(col("is_new"))
        .select(col("doc").as("b"), col("band"), col("bucket"))
      // a =!= b guards the replay case: if a crash-replayed batch already
      // appended itself to the index, a doc must not "collide" with its
      // own indexed copy and self-reject
      val cands = l.join(r, Seq("band", "bucket"))
        .where(((!col("na_new")) && col("a") =!= col("b")) ||
          (col("na_new") && col("a") < col("b")))
        .select(col("a"), col("b")).distinct()
      val docSets = all.select(col("doc"), col("shs"))
      val rejected = cands
        .join(docSets.select(col("doc").as("a"), col("shs").as("sha")), "a")
        .join(docSets.select(col("doc").as("b"), col("shs").as("shb")), "b")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
        .withColumn("jac", col("inter") /
          (size(col("sha")) + size(col("shb")) - col("inter")))
        .where(col("jac") >= threshold)
        .select(col("b")).distinct()
      // seed from the raw batch, not batchAgg: a doc too short to shingle
      // has no index row but is still a (trivially accepted) batch member
      batch.select(col(idCol).as("doc"))
        .join(rejected.withColumn("rej", lit(true)),
          col("doc") === col("b"), "left")
        .select(col("doc"), col("rej").isNull.as("accepted"))
        .localCheckpoint() // eager: materializes before batchAgg is released
    } finally if (ownAgg) batchAgg.unpersist(false)
  }

  /** Default document-frequency cap for [[ngramJaccardPairs]]: a shingle in
    * more than this many documents generates > cap²/2 candidate pairs while
    * carrying essentially no dedup signal (it is boilerplate by definition).
    * Uncapped pair generation is m(m−1)/2 per posting list — one hot
    * stop-gram run shared by 1 M docs is 5·10¹¹ pairs, a job-killer at any
    * scale. Pass `maxShinglePostings = None` for the exact exhaustive mode
    * (oracle comparisons on small corpora). */
  val DefaultShinglePostingsCap = 1000

  /** All (a<b) pair occurrences generated in-array from posting lists
    * (column `ds`, sorted): no self-join, one row per (pair, shingle).
    * Typed flatMap when ids are integral — the nested-lambda column
    * version is CodegenFallback (interpreted, allocates a struct per
    * pair), which dominated this operator's wall time. */
  private def postingPairOccurrences(postings: DataFrame,
      docType: org.apache.spark.sql.types.DataType): DataFrame = {
    val integral = docType == org.apache.spark.sql.types.LongType ||
      docType == org.apache.spark.sql.types.IntegerType
    if (integral) {
      val spark = postings.sparkSession
      import spark.implicits._
      val pairs = postings.select(col("ds").cast("array<long>")).as[Seq[Long]]
        .flatMap { ds =>
          val arr = ds.toArray
          Iterator.range(0, arr.length - 1).flatMap(i =>
            Iterator.range(i + 1, arr.length).map(j => (arr(i), arr(j))))
        }
        .toDF("a", "b")
      if (docType == org.apache.spark.sql.types.IntegerType)
        pairs.select(col("a").cast("int").as("a"), col("b").cast("int").as("b"))
      else pairs
    } else {
      val ds = col("ds")
      val pairsArr = flatten(transform(ds, (x, i) =>
        transform(
          slice(ds, i + lit(2), greatest(size(ds) - i - lit(1), lit(0))),
          y => struct(x.as("a"), y.as("b")))))
      postings.select(explode(pairsArr).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
    }
  }

  /** Inverted-index exact n-gram Jaccard over all pairs sharing a shingle.
    *
    * Capped mode (the DEFAULT — [[DefaultShinglePostingsCap]]): the grouped
    * pair explosion runs over the CAPPED posting lists only, giving each
    * candidate pair a LOWER bound `inter_lo` on its true intersection;
    * per-doc hot-shingle counts give the UPPER bound
    * `inter_lo + min(hot_a, hot_b)` (a shared hot shingle is shared by both
    * docs, so at most min survives). Jaccard is monotone in the
    * intersection, so pairs whose upper-bound jaccard misses the threshold
    * are dropped WITHOUT ever touching their shingle sets, and only the few
    * bound-survivors get the exact verify (map-side `array_intersect` on
    * the full per-doc sets). Reported counts are therefore exact; the only
    * loss vs uncapped is pairs whose EVERY shared shingle is hotter than
    * the cap (they never become candidates) — the standard DF-pruning
    * trade. The first capped design joined the full shingle arrays onto
    * every raw candidate (millions of rows × KB arrays): 30 s at sf0.1 vs
    * ~4 s for this shape.
    *
    * Uncapped mode: the grouped pair explosion *is* the intersection count
    * (groupBy pair), exact and exhaustive — m(m−1)/2 per posting list, for
    * oracle comparisons on corpora without hot shingles.
    *
    * Storage discipline: same as [[nearDuplicates]] — the shingle explode
    * is persisted only inside the call, the result is materialized eagerly,
    * and the intermediate blocks are released before returning ([[release]]
    * frees the result). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxShinglePostings: Option[Int] = Some(DefaultShinglePostingsCap)): DataFrame =
    ngramPairsByMetric(docs, idCol, textCol, n, threshold, maxShinglePostings,
      (i, na, nb) => i / (na + nb - i), "jac")

  /** CONTAINMENT variant: metric = inter / min(na, nb) — "is the smaller
    * document's n-gram set (mostly) inside the larger's?" Catches
    * quote/subset duplication that symmetric Jaccard misses entirely (a
    * 100-gram doc fully inside a 10,000-gram doc has jaccard ~0.01 but
    * containment 1.0 — the RefinedWeb/quote-detection case). Same capped
    * posting-list machinery and exactness contract as
    * [[ngramJaccardPairs]]; containment is likewise monotone in the
    * intersection, so the DF-cap upper-bound filter stays sound. */
  def ngramContainmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxShinglePostings: Option[Int] = Some(DefaultShinglePostingsCap)): DataFrame =
    ngramPairsByMetric(docs, idCol, textCol, n, threshold, maxShinglePostings,
      (i, na, nb) => i / least(na, nb), "containment")

  private def ngramPairsByMetric(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShinglePostings: Option[Int],
      metric: (Column, Column, Column) => Column, metricName: String): DataFrame = {
    val sh0 = shinglesAuto(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val docType = sh0.schema(sh0.schema.fieldIndex("doc")).dataType
      val postings = sh0.groupBy(col("sh"))
        .agg(array_sort(collect_list(col("doc"))).as("ds"))
        .where(size(col("ds")) > 1)
      val counts = sh0.groupBy(col("doc")).agg(count(lit(1)).as("n"))
      val result = maxShinglePostings match {
        case Some(cap) =>
          val interLo = postingPairOccurrences(
            postings.where(size(col("ds")) <= cap), docType)
            .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter_lo"))
          val hotCounts = postings.where(size(col("ds")) > cap)
            .select(explode(col("ds")).as("doc"))
            .groupBy(col("doc")).agg(count(lit(1)).as("h"))
          val bounded = interLo
            .join(counts.select(col("doc").as("a"), col("n").as("na")), "a")
            .join(counts.select(col("doc").as("b"), col("n").as("nb")), "b")
            .join(hotCounts.select(col("doc").as("a"), col("h").as("ha")), Seq("a"), "left")
            .join(hotCounts.select(col("doc").as("b"), col("h").as("hb")), Seq("b"), "left")
            .withColumn("hi", col("inter_lo") +
              least(coalesce(col("ha"), lit(0L)), coalesce(col("hb"), lit(0L))))
            .where(metric(col("hi"), col("na"), col("nb")) >= threshold)
          val docSets = sh0.groupBy(col("doc")).agg(collect_list(col("sh")).as("shs"))
          bounded.select(col("a"), col("b"))
            .join(docSets.select(col("doc").as("a"), col("shs").as("sha")), "a")
            .join(docSets.select(col("doc").as("b"), col("shs").as("shb")), "b")
            .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
            .withColumn("na", size(col("sha")).cast("long"))
            .withColumn("nb", size(col("shb")).cast("long"))
        case None =>
          postingPairOccurrences(postings, docType)
            .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
            .join(counts.select(col("doc").as("a"), col("n").as("na")), "a")
            .join(counts.select(col("doc").as("b"), col("n").as("nb")), "b")
      }
      result
        .withColumn(metricName, metric(col("inter"), col("na"), col("nb")))
        .where(col(metricName) >= threshold)
        .select(col("a"), col("b"), col("inter"), col("na"), col("nb"),
          round(col(metricName), 4).as(metricName))
        .localCheckpoint() // eager: materializes before sh0 is released
    } finally sh0.unpersist(false)
  }

  /** Deduplicated corpus: given near-dup pairs (a < b), keep the lowest id
    * of each overlap chain ("keep-first" greedy — standard for training-data
    * curation; full connected-components clustering would need iterative
    * joins and rarely changes the kept set on real near-dup data). */
  def dropNearDuplicates(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = pairs.select(col("b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Connected components over near-dup pairs (a < b): transitive duplicate
    * clusters, labelled by the minimum doc id reachable. The greedy
    * [[dropNearDuplicates]] can over-keep on chains (a~b, b~c keeps a and c
    * even though all three are one dup cluster); this resolves the closure.
    *
    * Algorithm: min-label propagation with path halving (Pregel-style
    * supersteps as DataFrame joins). Each round every node takes the min of
    * its own label, its neighbours' labels, AND its label's label — the
    * pointer-doubling hop that turns O(diameter) convergence into
    * O(log diameter) (the MapReduce-CC trick of Kiveris et al.). Per round:
    * two shuffle joins keyed on doc id + one groupBy(node) min-aggregate.
    *
    * Every round is EAGERLY `localCheckpoint`ed: iterative DataFrame jobs
    * otherwise accumulate lineage, and one evicted/unpersisted ancestor
    * recomputes the entire upstream pipeline (the LSH candidate generation)
    * once per remaining round — that, not the propagation itself, dominated
    * the round-1 bench. Checkpointing makes each round read exactly one
    * materialized RDD; convergence is one scalar aggregate per round
    * (labels only ever decrease, so an unchanged sum(label) is a fixpoint).
    *
    * `reliable = true` uses HDFS-backed `checkpoint` instead of
    * `localCheckpoint` (requires `sparkContext.setCheckpointDir`): on a real
    * cluster a lost executor invalidates local checkpoints and fails the
    * job, while reliable checkpoints survive — the right trade at 100 TB
    * where the loop runs minutes and executor churn is routine.
    *
    * Returns (node, cluster) for every node that appears in a pair;
    * singletons are absent (their cluster is trivially themselves). */
  /** Free a checkpointed frame's MEMORY_AND_DISK blocks — call when done
    * with a frame returned by [[nearDuplicates]], [[ngramJaccardPairs]] or
    * [[duplicateClusters]] (their results are localCheckpoint-backed so the
    * heavy intermediates could be released inside the op). The frame is not
    * usable after release. `Dataset.unpersist` cannot do this —
    * `localCheckpoint` persists at the RDD layer beneath a `LogicalRDD`,
    * which the Dataset cache manager does not track — so reach through the
    * plan to the backing RDD. No-op for reliable checkpoints (files,
    * cleaned by the ContextCleaner) and non-checkpoint plans. */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** Duplication-aware SOFT dedup: instead of keeping one member per
    * near-dup cluster (hard dedup deletes every paraphrase/mirror of
    * over-represented content), each member of a size-`c` cluster is kept
    * with probability 1/c — the expected mass per cluster is exactly one
    * document, so over-represented content is flattened while the corpus
    * still samples the VARIANTS (the practical middle ground the
    * data-constrained-scaling literature argues for: repeated content has
    * sharply diminishing value, but nonzero — Muennighoff et al. 2023 —
    * so down-weight, don't annihilate).
    *
    * Keep decisions are the house deterministic coin, written in the
    * overflow-free division form: `hash48(id) ≤ (2^48 − 1) div c`
    * (algebraically identical to `hash48 · c < 2^48` for integers, but a
    * boilerplate cluster of c > 2^15 members would overflow the product —
    * and over-represented content is exactly where c explodes).
    * Membership is a pure function of (id, cluster size), no RNG,
    * replayable on any engine in exact BIGINT arithmetic. Docs in no
    * cluster have c = 1 and always survive.
    *
    * Returns (idCol, c, kept). Cost on top of the LSH pipeline: one
    * cluster-size aggregate and a broadcast-sized join back to the corpus
    * — clusters are the small side at any scale. */
  def dupWeightedKeep(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 16, bands: Int = 4): DataFrame = {
    val pairs = nearDuplicates(docs, idCol, textCol, threshold, k, bands)
    val cc = duplicateClusters(pairs)
    release(pairs)
    val member = cc.join(
        cc.groupBy(col("cluster")).agg(count(lit(1)).as("_c")), "cluster")
      .select(col("node").as(idCol), col("_c"))
    docs.select(col(idCol)).join(broadcast(member), Seq(idCol), "left")
      .withColumn("c", coalesce(col("_c"), lit(1L)))
      .withColumn("kept",
        Sampling.hash48(col(idCol)) <= expr("281474976710655 div c"))
      .select(col(idCol), col("c"), col("kept"))
  }

  /** Edge-count threshold below which connected components runs as
    * driver-side union-find instead of the distributed label-propagation
    * loop. The near-dup EDGE set is orders of magnitude smaller than the
    * corpus (it is the thresholded output of LSH + exact verify), so even
    * 100 TB corpora routinely produce component graphs that fit in a few
    * hundred MB on the driver — and the iterative loop costs ~3 Spark jobs
    * per round (join, hop-join, fixpoint aggregate), which is pure
    * scheduling overhead when the graph is this small. 2M edges collect as
    * ~2M boxed (Long, Long) tuples ≈ 100-150 MB transient on the driver —
    * well under a typical driver heap, ~instant union-find. Callers on
    * small drivers (or who know their graphs are huge and want to skip the
    * sizing count job) can pass `driverEdgeLimit = 0` to always take the
    * distributed loop. */
  val DriverCcEdgeLimit = 2000000L

  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20,
      reliable: Boolean = false,
      driverEdgeLimit: Long = DriverCcEdgeLimit): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // persist the pair list BEFORE mirroring it: edges scans it twice, and
    // upstream is typically a whole LSH+verify pipeline we must not re-run.
    // Null endpoints are dropped HERE, before the algorithm split, so the
    // driver union-find and the distributed label-propagation loop see the
    // same edge set (a pair with a null side is not an edge; previously the
    // distributed path emitted such nodes as self-labeled singletons while
    // the driver path dropped them).
    val p = pairs.select(col("a"), col("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .persist(MEMORY_AND_DISK)
    // adaptive algorithm choice: the count also materializes the persisted
    // pair list, which the big-graph path needs anyway before mirroring
    val aType = p.schema(0).dataType
    val sameKeyTypes = aType == p.schema(1).dataType
    val isIntegral = aType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    if (sameKeyTypes && isIntegral && driverEdgeLimit > 0 &&
        p.count() <= driverEdgeLimit) {
      val spark = pairs.sparkSession
      import spark.implicits._
      // min-root union with path compression: the root IS the min label
      val parent = new scala.collection.mutable.LongMap[Long]
      def find(x0: Long): Long = {
        var x = x0
        var pp = parent.getOrElse(x, x)
        while (pp != x) { // path halving
          val gp = parent.getOrElse(pp, pp)
          parent(x) = gp; x = pp; pp = gp
        }
        x
      }
      val nodes = scala.collection.mutable.LongMap.empty[Unit]
      // typed collect: primitive-friendly tuples instead of 10×-overhead
      // Row objects (nulls already filtered above, before the path split)
      p.select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)]
        .collect().foreach { case (a, b) =>
          nodes(a) = (); nodes(b) = ()
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
      p.unpersist()
      val rows = nodes.keysIterator.map(n => (n, find(n))).toSeq
      val out0 = rows.toDF("node", "cluster")
      val out =
        if (aType == org.apache.spark.sql.types.IntegerType)
          out0.select(col("node").cast("int").as("node"),
            col("cluster").cast("int").as("cluster"))
        else out0
      return out
    }
    // eager checkpoint cuts the whole upstream lineage out of the loop
    val edges = ckpt(p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst"))))
    p.unpersist()
    var labels = ckpt(edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    var t0 = System.nanoTime()
    var prevSum = labelSum(labels)
    if (debug) println(f"[cc] init ${(System.nanoTime() - t0) / 1e9}%.2fs")
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      t0 = System.nanoTime()
      val viaEdges = edges
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .select(col("dst").as("node"), col("label"))
      val viaHop = labels.select(col("node"), col("label").as("l"))
        .join(labels.select(col("node").as("l"), col("label")), "l")
        .select(col("node"), col("label"))
      val next = ckpt(viaEdges.union(viaHop).union(labels)
        .groupBy(col("node")).agg(min(col("label")).as("label")))
        // eager: one materialization, zero lineage
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      // superseded round's checkpoint is dead the moment `next` is
      // materialized (ckpt is eager) — drop its MEMORY_AND_DISK blocks now
      // instead of letting every round accumulate until the ContextCleaner
      // happens to run (storage-memory pressure in long convergence loops)
      release(labels)
      labels = next
      i += 1
      if (debug) println(f"[cc] round $i ${(System.nanoTime() - t0) / 1e9}%.2fs sum=$s")
    }
    // edges' checkpoint is no longer reachable from the result (the final
    // round's labels checkpoint backs it alone) — release it here; the last
    // labels checkpoint stays persisted as the returned frame's store
    release(edges)
    labels.select(col("node"), col("label").as("cluster"))
  }

  /** Deduplicated corpus via transitive clusters: keep exactly the cluster
    * label (= min doc id) of every component. Unlike [[dropNearDuplicates]]
    * this never over-keeps on chains: a~b, b~c keeps only a. One left-anti
    * join against the non-representative members. */
  def dropDuplicateClusters(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = duplicateClusters(pairs)
      .where(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware cluster representative: within each transitive dup
    * cluster keep the HIGHEST-scoring member (ties → larger id), not the
    * first-by-id — real curation keeps the best copy (longest, cleanest,
    * highest classifier score), and min-id can systematically keep the
    * truncated variant. Singleton documents are their own cluster.
    * Returns (cluster, doc, score) — one row per cluster.
    *
    * Scale shape: the argmax is `max(struct(score, id))` — an
    * ObjectHashAggregate, hash-partitioned on the cluster label, never a
    * per-cluster sort window over the corpus; the cluster labels come
    * from the adaptive [[duplicateClusters]] (edge set ≪ corpus). */
  def bestPerCluster(docs: DataFrame, idCol: String, pairs: DataFrame,
      score: Column): DataFrame = {
    val cc = duplicateClusters(pairs).select(col("node"), col("cluster"))
    docs.select(col(idCol).as("doc"), score.as("score"))
      .join(cc, col("doc") === col("node"), "left")
      .select(coalesce(col("cluster"), col("doc")).as("cluster"),
        col("doc"), col("score"))
      .groupBy(col("cluster"))
      .agg(max(struct(col("score"), col("doc"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), col("best.doc").as("doc"),
        col("best.score").as("score"), col("n_members"))
  }

  /** 60-bit word hash from md5 (identical in DuckDB via hex cast). */
  def wordHash60(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  /** Per-doc 60-bit SimHash over distinct words: bit j set when the sum of
    * votes sign(bit_j(h)·2−1) is positive. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc"),
      explode(array_distinct(split(col(textCol), " "))).as("w"))
      .where(col("w") =!= "")
      .withColumn("h", wordHash60(col("w")))
    val votes = (0 until 60).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j"))
    val agg = words.groupBy(col("doc")).agg(votes.head, votes.tail: _*)
    val hash = (0 until 60).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a + b)
    agg.select(col("doc"), hash.as("simhash"))
  }

  /** SimHash near-dup pairs: banded pre-filter (4 chunks of 15 bits —
    * hamming ≤ 3 guarantees an equal chunk), then exact hamming ≤ maxDist. */
  def simhashNearDups(sim: DataFrame, maxDist: Int = 3): DataFrame = {
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * 15).bitwiseAND((1L << 15) - 1).as("ck")))
    val banded = sim.select(col("doc"), col("simhash"),
      explode(array(chunks: _*)).as("cb"))
      .select(col("doc"), col("simhash"), col("cb.chunk").as("chunk"), col("cb.ck").as("ck"))
    val l = banded.select(col("doc").as("a"), col("simhash").as("sa"), col("chunk"), col("ck"))
    val r = banded.select(col("doc").as("b"), col("simhash").as("sb"), col("chunk"), col("ck"))
    l.join(r, Seq("chunk", "ck")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
