package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.functions.TextAnalysis

/** Training-data pipeline operators over the documents/embeddings tables:
  * dedup (exact fingerprint, MinHash+LSH, SimHash, n-gram Jaccard),
  * similarity search (brute-force + LSH-bucketed ANN), text analysis
  * (lang-ID, quality, token counts, fingerprints), multimodal plumbing.
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(

    // Exact dedup by bag-of-words fingerprint (hash groupBy — one shuffle)
    Q.df("q_dedup_exact",
      """SELECT md5(array_to_string(list_sort(list_distinct(
        |         string_split(lower(text), ' '))), ' ')) AS dup_key,
        |       min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY dup_key ORDER BY dup_key""".stripMargin) {
      (s, dir) =>
        Dedup.exact(Tables.load(s, dir, "documents"), "doc_id",
            TextAnalysis.fingerprint(col("text")))
          .orderBy("dup_key")
    },

    // MinHash+LSH near-dup pairs, exact-Jaccard-verified (oracle = exact
    // pairwise Jaccard; LSH recall at J>=0.8 with 16 bands x 4 rows ~ 1.0
    // so the candidate pruning must not lose a single true pair)
    Q.df("q_dedup_minhash",
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    [string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |       || ' ' || string_split(text,' ')[i+2]
        |     for i in range(1, greatest(len(string_split(text,' ')) - 1, 2))])
        |    AS s
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(len(list_intersect(a.s, b.s))::DOUBLE /
        |             len(list_distinct(a.s || b.s)), 6) AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id < b.doc_id
        |  AND len(list_intersect(a.s, b.s))::DOUBLE /
        |      len(list_distinct(a.s || b.s)) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.minhashPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", shingleK = 3, numHashes = 64, bands = 16,
          threshold = 0.8)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // Character n-gram Jaccard similarity (ref ngramDistance,
    // src/Functions/FunctionsStringSimilarity.cpp) — small id range only
    Q.df("q_ngram_jaccard",
      """WITH g AS (
        |  SELECT doc_id, list_distinct(
        |    [text[i:i+2] for i in range(1, greatest(length(text) - 1, 2))]) AS ng
        |  FROM documents WHERE doc_id < 40)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(len(list_intersect(a.ng, b.ng))::DOUBLE /
        |             len(list_distinct(a.ng || b.ng)), 6) AS sim
        |FROM g a, g b WHERE a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), Dedup.charNgrams(col("text"), 3).as("ng"))
      val a = docs.select(col("doc_id").as("id_a"), col("ng").as("ng_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("ng").as("ng_b"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Dedup.jaccard(col("ng_a"), col("ng_b")), 6).as("sim"))
        .orderBy("id_a", "id_b")
    },

    // SimHash 64-bit fingerprints — bit-vote semantics aren't pure SQL;
    // the oracle pins the engine constants for the sf0.01 fixtures
    // (string-typed; DedupSpec pins exact values on crafted inputs)
    Q.df("q_simhash",
      """SELECT * FROM (VALUES
        |  (0, '-3877179158341346154'), (1, '-2669756905684424048'),
        |  (2, '-8367344732522435339'), (3, '-332965667243122992'),
        |  (4, '-368959280402690384'), (5, '8836402756518586897'),
        |  (6, '6908845519846562918'), (7, '4242741031637913138'),
        |  (8, '-4908576916958503184'), (9, '-4980640968990355791'),
        |  (10, '-2602742565291557248'), (11, '-6151507947000059707'),
        |  (12, '3096002768143354288'), (13, '-332965667772645871'),
        |  (14, '-386969280898225583'), (15, '7647456578045193909'))
        |  v(doc_id, simhash64)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents").filter(col("doc_id") < 16)
        .select(col("doc_id").cast("int").as("doc_id"),
          Dedup.simhash(split(col("text"), " ")).cast("string").as("simhash64"))
        .orderBy("doc_id")
    },

    // Brute-force exact ANN: top-3 cosine neighbors for 10 query vectors
    Q.df("q_ann_topk",
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |     c AS (SELECT vec_id, embedding FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         round(list_sum(list_transform(range(1, 65),
        |                 i -> CAST(q.embedding[i] AS DOUBLE) *
        |                      CAST(c.embedding[i] AS DOUBLE))) /
        |           (sqrt(list_sum(list_transform(range(1, 65),
        |                 i -> CAST(q.embedding[i] AS DOUBLE) *
        |                      CAST(q.embedding[i] AS DOUBLE)))) *
        |            sqrt(list_sum(list_transform(range(1, 65),
        |                 i -> CAST(c.embedding[i] AS DOUBLE) *
        |                      CAST(c.embedding[i] AS DOUBLE)))))
        |           , 6) AS cos_sim
        |  FROM q, c WHERE q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos_sim,
        |         row_number() OVER (PARTITION BY query_id
        |             ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rank
        |FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 10), emb,
          "vec_id", "vec_id", "embedding", k = 3)
        .withColumn("rank", col("rank").cast("bigint"))
        .orderBy("query_id", "rank")
    },

    // LSH-bucketed ANN (the 100TB scale path) — approximate by design →
    // rows-only; SimilaritySpec checks recall against brute force.
    Q.dfOnly("q_ann_lsh") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.lshBucketTopK(
        emb.filter(col("vec_id") < 10), emb,
        "vec_id", "vec_id", "embedding", dim = 64, k = 3, nPlanes = 4)
    },

    // int8 scalar-quantized ANN (FAISS-SQ8 layout): quarter the
    // scan/shuffle bytes; recall vs float brute force in Int8AnnSpec.
    // Deterministic end-to-end (per-vector maxabs scale → round-half-away
    // int8 codes → exact integer dot products → 6-dp rounded cosine), so
    // the oracle recomputes the SAME quantization in DuckDB — a real
    // hash-compared oracle, not rows-only (r11 verdict #6).
    Q.df("q_ann_int8",
      """WITH z AS (
        |  SELECT vec_id,
        |         greatest(CAST(list_max(list_transform(embedding,
        |                    x -> abs(x))) AS FLOAT),
        |                  CAST(1e-30 AS FLOAT)) AS s,
        |         embedding
        |  FROM embeddings),
        |codes AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) / CAST(s AS DOUBLE)
        |                  * 127.0) AS BIGINT)) AS code
        |  FROM z),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         round(
        |           CAST(list_sum(list_transform(range(1, 65),
        |                  i -> q.code[i] * c.code[i])) AS DOUBLE) /
        |           (sqrt(CAST(list_sum(list_transform(q.code,
        |                   x -> x * x)) AS DOUBLE)) *
        |            sqrt(CAST(list_sum(list_transform(c.code,
        |                   x -> x * x)) AS DOUBLE))), 6) AS cos_sim
        |  FROM codes q, codes c
        |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos_sim,
        |         row_number() OVER (PARTITION BY query_id
        |             ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rank
        |FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopKInt8(
          emb.filter(col("vec_id") < 10), emb,
          "vec_id", "vec_id", "embedding", k = 3)
        .withColumn("rank", col("rank").cast("bigint"))
        .orderBy("query_id", "rank")
    },

    // IVF ANN (k-means coarse quantizer + nprobe cell search) — the
    // FAISS-IVF-style scale path; recall asserted vs brute force in spec
    Q.dfOnly("q_ann_ivf") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 10), emb,
        "vec_id", "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4)
    },

    // PQ ANN (product quantization + asymmetric-distance shortlist +
    // exact refine — the FAISS PQ/IVFPQ+refine layout): the corpus moves
    // as m-byte codes; recall vs brute force pinned in PqAnnSpec. The
    // refine stage is deterministic exact L2 over the ADC shortlist, so
    // it gets a REAL oracle: the run records the (bounded, queries×k×
    // rerank = 240-row) shortlist and the dynamic oracle SQL embeds it
    // as a VALUES list for DuckDB to recompute the refine bit-for-bit;
    // only the approximate ADC stage itself stays spec-verified (recall).
    Q.dfDynOracle("q_ann_pq")(() => PqOracle.oracleSql) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val books = Similarity.pqTrain(emb, "embedding", m = 16, ksub = 32)
      val queries = emb.filter(col("vec_id") < 10)
      val shortlist = Similarity.pqAdcShortlist(
        queries, emb, "vec_id", "vec_id", "embedding", k = 3, books,
        rerank = 8)
      // bounded collect (10 queries × 24 candidates), justified: it is
      // the oracle parameter, not part of the distributed data path —
      // Similarity.pqTopK itself stays collect-free
      PqOracle.shortlist = shortlist.collect().toSeq
        .map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong))
      Similarity.pqRefine(shortlist, queries, emb,
          "vec_id", "vec_id", "embedding", k = 3)
        .withColumn("rank", col("rank").cast("bigint"))
        .orderBy("query_id", "rank")
    },

    // Language ID + quality + token counts (ref detectLanguage,
    // FunctionsLanguageClassification.cpp). On this fixture only English
    // stopwords occur, which the oracle encodes directly.
    Q.df("q_text_analysis",
      """SELECT doc_id,
        |       CASE WHEN len(list_intersect(string_split(lower(text), ' '),
        |              ['the','a','of','and','to','in','is','that','it','for'])) > 0
        |            THEN 'en' ELSE 'und' END AS lang_guess,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |       CAST(list_sum(list_transform(string_split(text, ' '),
        |              w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT)
        |         AS bpe_tokens,
        |       md5(array_to_string(list_sort(list_distinct(
        |           string_split(lower(text), ' '))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // single-pass TextStats expression; semantics pinned equal to the
      // composed TextAnalysis forms by TextStatsSpec.
      // r15: the ORDER BY sits BELOW the projection — a range-partitioned
      // sort executes its child twice (partition-boundary sampling pass +
      // real pass), so an expensive projection under the sort runs 2×.
      // Sorting the raw (doc_id, text) rows first and projecting above
      // the Sort evaluates TextStats exactly once; rows and order are
      // identical (Project preserves order).
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(col("doc_id"),
          graft.functions.TextStats(col("text")).as("ts"))
        .select(col("doc_id"), col("ts.lang_guess").as("lang_guess"),
          col("ts.n_tokens").as("n_tokens"),
          col("ts.bpe_tokens").as("bpe_tokens"), col("ts.fp").as("fp"))
    },

    // Quality scoring (cheap web-text pre-filter) — formula mirrored in SQL
    Q.df("q_text_quality",
      """SELECT doc_id,
        |  round(least(1.0,
        |    0.25 * (CASE WHEN len(string_split(text,' ')) BETWEEN 5 AND 1000
        |                 THEN 1.0 ELSE 0.5 END) +
        |    0.25 * least((length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE /
        |                  greatest(length(text)::DOUBLE, 1.0)) * 1.2, 1.0) +
        |    0.25 * least((len(list_intersect(list_transform(string_split(text,' '), w -> lower(w)),
        |                  ['the','a','of','and','to','in','is','that','it','for']))::DOUBLE /
        |                  greatest(len(string_split(text,' '))::DOUBLE, 1.0)) * 5.0, 1.0) +
        |    0.25 * (CASE WHEN length(text)::DOUBLE /
        |                      greatest(len(string_split(text,' '))::DOUBLE, 1.0)
        |                      BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.4 END)), 6)
        |    AS quality
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // same sort-before-project rationale as q_text_analysis (r15):
      // the quality formula is several interpreted passes per row and
      // must not run twice for the range-sampling pass
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
    },

    // Rolling (order-sensitive) token hash — xxhash64 has no DuckDB
    // twin, so the oracle pins the engine constants for the sf0.01
    // fixtures (string-typed; TextStatsSpec pins the semantics on
    // crafted inputs)
    Q.df("q_rolling_hash",
      """SELECT * FROM (VALUES
        |  (0, '8325305193068954406'), (1, '3941495364288317855'),
        |  (2, '-4583632831326186144'), (3, '-4831962165210643515'),
        |  (4, '-2360800584118289190'), (5, '7858669749942823308'),
        |  (6, '2305218086097332321'), (7, '1034796940973078566'),
        |  (8, '-1998975502364590370'), (9, '-7330682503430044662'),
        |  (10, '-7940514342657877315'), (11, '5015547925056289213'),
        |  (12, '4942538195840755746'), (13, '7671833811299639150'),
        |  (14, '-4009066732140627260'), (15, '-8474620142584453007'))
        |  v(doc_id, rhash)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents").filter(col("doc_id") < 16)
        .select(col("doc_id").cast("int").as("doc_id"),
          TextAnalysis.rollingHash(col("text")).cast("string").as("rhash"))
        .orderBy("doc_id")
    },

    // Multimodal metadata plumbing: fake blobs with typed metadata
    Q.df("q_multimodal_meta",
      """SELECT doc_id,
        |       ['image','audio','video'][(doc_id % 3) + 1] AS media_kind,
        |       CAST(length(sha256(CAST(doc_id AS VARCHAR)) ||
        |               sha256(CAST(doc_id AS VARCHAR) || 'x')) AS INT) AS n_bytes,
        |       substring(sha256(CAST(doc_id AS VARCHAR)), 1, 8) AS head,
        |       CASE WHEN doc_id % 3 = 2 THEN (doc_id % 100) + 1 END AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Multimodal.attachFakeMedia(Tables.load(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("media_kind"),
          length(col("media_bytes")).cast("int").as("n_bytes"),
          substring(col("media_bytes").cast("string"), 1, 8).as("head"),
          col("media_meta").getField("n_frames").cast("long").as("n_frames"))
        .orderBy("doc_id")
    },

    // Video frame sampling work units: every 5th frame
    Q.df("q_frame_sampling",
      """SELECT doc_id, CAST((doc_id % 100) // 5 + 1 AS BIGINT) AS n_sampled
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        Multimodal.sampleFrames(
            Multimodal.attachFakeMedia(Tables.load(s, dir, "documents"), "doc_id"),
            "doc_id", stride = 5)
          .groupBy("doc_id").agg(count(lit(1)).as("n_sampled"))
          .orderBy("doc_id")
    },

    // Feature extraction through the stub decoder (mapPartitions batch
    // path). The stub is deterministic and therefore DuckDB-expressible:
    // media_bytes is the 128-char hex text of two sha256s cast to binary,
    // so its ASCII bytes land only in histogram bins 1 ('0'-'9', 48-57)
    // and 3 ('a'-'f', 97-102) — the oracle counts hex-digit classes.
    Q.df("q_multimodal_features",
      """WITH h AS (
        |  SELECT doc_id,
        |    sha256(CAST(doc_id AS VARCHAR)) ||
        |      sha256(CAST(doc_id AS VARCHAR) || 'x') AS hx
        |  FROM documents
        |)
        |SELECT doc_id, concat_ws(',',
        |  '0.000000',
        |  CAST(CAST(ROUND(length(regexp_replace(hx, '[a-f]', '', 'g'))
        |    / 128.0, 6) AS DECIMAL(16,6)) AS VARCHAR),
        |  '0.000000',
        |  CAST(CAST(ROUND(length(regexp_replace(hx, '[0-9]', '', 'g'))
        |    / 128.0, 6) AS DECIMAL(16,6)) AS VARCHAR),
        |  '0.000000','0.000000','0.000000','0.000000') AS features
        |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // features array projected to a comma-joined string so the driver's
      // rows-only comparator (which still sorts values) can handle the column
      Multimodal.extractFeatures(s,
          Multimodal.attachFakeMedia(Tables.load(s, dir, "documents"), "doc_id"),
          "doc_id")
        .select(col("doc_id"),
          array_join(transform(col("features"),
            // decimal(16,6), not (10,6): the stub keeps features in [0,1],
            // but a real decoder could emit values >= 10^4, which (10,6)
            // would NULL out on overflow and array_join would then drop
            x => round(x.cast("double"), 6).cast("decimal(16,6)").cast("string")),
            ",").as("features"))
        .orderBy("doc_id")
    },

    // C4-style corpus cleaning (public C4 pipeline rules re-expressed):
    // language gate → word-count gate → mean-word-length gate → token
    // blocklist → exact dedup (one md5 shuffle) → per-source survival
    // stats. The oracle replays every rule in DuckDB.
    Q.df("q_corpus_clean",
      """WITH base AS (
        |  SELECT *, len(string_split(text, ' ')) AS wc,
        |         (length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
        |           / len(string_split(text, ' ')) AS mwl
        |  FROM documents WHERE lang = 'en'),
        |filt AS (
        |  SELECT * FROM base
        |  WHERE wc BETWEEN 40 AND 75 AND mwl BETWEEN 3.0 AND 10.0
        |    AND NOT list_contains(string_split(text, ' '), 'crash')
        |    AND NOT list_contains(string_split(text, ' '), 'error')),
        |ded AS (
        |  SELECT *, row_number() OVER (PARTITION BY md5(text)
        |                               ORDER BY doc_id) AS rn
        |  FROM filt)
        |SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
        |       CAST(sum(wc) AS BIGINT) AS total_words,
        |       round(avg(wc), 2) AS avg_words
        |FROM ded WHERE rn = 1
        |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      graft.operators.CorpusClean.clean(
        Tables.load(s, dir, "documents"), keepLang = "en",
        minWords = 40, maxWords = 75, blocked = Seq("crash", "error"))
    }
  )
}
