package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Graph, Similarity, TextCorpus}

import Catalog.Q
import GateSupport._

/** Deduplication gates: exact / minhash / simhash / n-gram / containment / tf-idf / edit-distance / semantic / span / CDC-chunk families with their persisted-index incrementals and cluster post-passes.
  *
  * Split from the monolithic Catalog (round 16) — same `Q` registrations,
  * re-aggregated by [[Catalog.all]]; shared fixture readers and oracle
  * fragments live in [[GateSupport]]. */
private[queries] object CatalogDedup {
  val gates: Seq[Q] = Seq(
    Q("dedup_exact",
      (s, d) => Dedup.exact(t(s, d, "documents"), "doc_id", "text"),
      Some(s"""SELECT md5($normSql) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
        count(*) AS dupes FROM documents GROUP BY 1""")),

    // Edit-distance fuzzy-dedup join: exact Levenshtein ≤ 10 over the corpus
    // (length banding + q-gram count filter + banded DP); the oracle brute-
    // forces the same band with DuckDB's levenshtein — identical pair set
    // AND distances, since every pruning layer is recall-complete
    Q("dedup_editdist",
      (s, d) => Dedup.editDistancePairs(t(s, d, "documents"), "doc_id", "text", maxDist = 10),
      Some("""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        FROM documents a JOIN documents b
          ON a.doc_id < b.doc_id
         AND length(a.text) <= length(b.text) + 10
         AND length(b.text) <= length(a.text) + 10
        WHERE levenshtein(a.text, b.text) <= 10""")),

    // INCREMENTAL edit distance: corpus indexed once (stored rare-prefix
    // postings + sorted q-gram hashes + the one text copy the banded DP
    // needs), round-trips through parquet with its build params in column
    // metadata, then a batch of every-7th-doc copies is verified against
    // the index WITHOUT re-scanning corpus text — the batch posts ALL its
    // q-grams, so no canonical-order agreement is needed (pigeonhole
    // recall argument in Dedup.editDistanceIncremental). Oracle is the
    // exact batch×corpus levenshtein truth
    Q("dedup_editdist_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-ed-idx")
        Dedup.editDistanceIndex(corpus, "doc_id", "text", maxDist = 10)
          .write.mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.editDistanceIncremental(batch, index, "doc_id", "text")
          .localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some("""SELECT a.doc_id AS id_a, CAST(b.doc_id + 1000000 AS BIGINT) AS id_b,
          CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        FROM documents a JOIN documents b
          ON b.doc_id % 7 = 0
         AND abs(length(a.text) - length(b.text)) <= 10
        WHERE levenshtein(a.text, b.text) <= 10""")),

    // Exact substring (span) dedup: every maximal token span covered by
    // 8-token windows occurring more than once in the corpus (Lee et al.
    // 2021 suffix-array dedup re-expressed as hashed positional k-gram
    // postings). The oracle recomputes spans from RAW k-gram strings, so
    // the operator's hash-prefilter + string-verify layering is proven
    // collision-exact, and the interval merges must agree token-for-token
    Q("dedup_spans",
      (s, d) => Dedup.duplicateSpans(t(s, d, "documents"), "doc_id", "text", k = 8),
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, i - 1 AS p, array_to_string(t[i:i+7], ' ') AS gr
          FROM s, unnest(range(1, len(t) - 6)) AS r(i)),
        dup AS (SELECT gr FROM g GROUP BY gr HAVING count(*) > 1),
        hit AS (SELECT doc_id, p FROM g JOIN dup USING (gr)),
        m AS (SELECT doc_id, p,
            CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
              THEN 0 ELSE 1 END AS ni
          FROM hit),
        isl AS (SELECT doc_id, p,
            sum(ni) OVER (PARTITION BY doc_id ORDER BY p) AS il FROM m)
        SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
          CAST(max(p) + 7 AS BIGINT) AS span_end
        FROM isl GROUP BY doc_id, il""")),

    // The APPLY side of span dedup: cut every duplicated span out of the
    // corpus and rejoin — detect (dedup_spans) and apply must compose to
    // the exact token-filtered text the oracle rebuilds positionally
    Q("dedup_spans_apply",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.removeSpans(docs, "doc_id", "text",
          Dedup.duplicateSpans(docs, "doc_id", "text", k = 8))
      },
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, i - 1 AS p, array_to_string(t[i:i+7], ' ') AS gr
          FROM s, unnest(range(1, len(t) - 6)) AS r(i)),
        dup AS (SELECT gr FROM g GROUP BY gr HAVING count(*) > 1),
        hit AS (SELECT doc_id, p FROM g JOIN dup USING (gr)),
        m AS (SELECT doc_id, p,
            CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
              THEN 0 ELSE 1 END AS ni
          FROM hit),
        isl AS (SELECT doc_id, p,
            sum(ni) OVER (PARTITION BY doc_id ORDER BY p) AS il FROM m),
        sp AS (SELECT doc_id, min(p) AS a, max(p) + 7 AS b
          FROM isl GROUP BY doc_id, il),
        tk AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
          FROM s, unnest(range(1, len(t) + 1)) AS r(i)),
        kept AS (SELECT tk.doc_id, tk.p, tk.tok FROM tk
          WHERE NOT EXISTS (SELECT 1 FROM sp
            WHERE sp.doc_id = tk.doc_id AND tk.p BETWEEN sp.a AND sp.b))
        SELECT s.doc_id,
          coalesce(string_agg(kept.tok, ' ' ORDER BY kept.p), '') AS clean_text
        FROM s LEFT JOIN kept ON s.doc_id = kept.doc_id GROUP BY s.doc_id""")),

    // Content-defined chunking dedup: variable-length token chunks whose
    // boundaries are a pure function of local content (md5 gear rule —
    // IDENTICAL in Spark and DuckDB, so the oracle replays the exact
    // chunking), then a corpus-wide exact-content duplicate census. The
    // operator's hash-prefilter + raw-verify layering must reproduce the
    // oracle's direct group-by-chunk-text counts integer-exactly
    Q("dedup_cdc_chunks",
      (s, d) => Dedup.cdcChunkStats(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        tk AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
          FROM s, unnest(range(1, len(t) + 1)) AS r(i)),
        c AS (SELECT doc_id, p, tok,
            coalesce(sum(CASE WHEN substr(md5(tok), 1, 1) < '1' THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
          FROM tk),
        ch AS (SELECT doc_id, cid, count(*) AS n_toks,
            string_agg(tok, ' ' ORDER BY p) AS chunk
          FROM c GROUP BY doc_id, cid),
        occ AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(*) > 1)
        SELECT ch.doc_id, count(*) AS n_chunks,
          CAST(sum(CASE WHEN occ.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS dup_chunks,
          CAST(coalesce(sum(CASE WHEN occ.chunk IS NOT NULL THEN n_toks ELSE 0 END), 0)
            AS BIGINT) AS dup_tokens
        FROM ch LEFT JOIN occ ON ch.chunk = occ.chunk
        GROUP BY ch.doc_id""")),

    // INCREMENTAL CDC dedup: the corpus is chunk-indexed once (one narrow
    // md5 row per distinct chunk, round-tripped through parquet), then a
    // batch of every-7th-doc copies EDITED with a prefix token is checked
    // against the index without touching corpus text. The prefix edit is
    // the point: content-defined boundaries resynchronize after it, so the
    // copies' unchanged tails still produce the corpus's chunk md5s (a
    // fixed-stride chunker would report near-zero dups here). Identity is
    // md5 on BOTH sides, so the oracle verifies the exact deployed contract
    Q("dedup_cdc_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-cdc-idx")
        Dedup.cdcChunkIndex(corpus, "doc_id", "text").write
          .mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("graftpfx "), col("text")).as("text"))
        val out = Dedup.cdcChunkStatsIncremental(batch, index, "doc_id", "text")
          .localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        tk AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
          FROM s, unnest(range(1, len(t) + 1)) AS r(i)),
        c AS (SELECT doc_id, p, tok,
            coalesce(sum(CASE WHEN substr(md5(tok), 1, 1) < '1' THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
          FROM tk),
        idx AS (SELECT DISTINCT md5(string_agg(tok, ' ' ORDER BY p)) AS m
          FROM c GROUP BY doc_id, cid),
        bs AS (SELECT doc_id + 1000000 AS doc_id,
            string_split('graftpfx ' || text, ' ') AS t
          FROM documents WHERE doc_id % 7 = 0),
        btk AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
          FROM bs, unnest(range(1, len(t) + 1)) AS r(i)),
        bc AS (SELECT doc_id, p, tok,
            coalesce(sum(CASE WHEN substr(md5(tok), 1, 1) < '1' THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
          FROM btk),
        bch AS (SELECT doc_id, cid, count(*) AS n_toks,
            md5(string_agg(tok, ' ' ORDER BY p)) AS m
          FROM bc GROUP BY doc_id, cid),
        occ AS (SELECT m, count(*) AS n FROM bch GROUP BY m)
        SELECT bch.doc_id, count(*) AS n_chunks,
          CAST(sum(CASE WHEN idx.m IS NOT NULL OR occ.n > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS dup_chunks,
          CAST(coalesce(sum(CASE WHEN idx.m IS NOT NULL OR occ.n > 1
            THEN n_toks ELSE 0 END), 0) AS BIGINT) AS dup_tokens
        FROM bch LEFT JOIN idx ON bch.m = idx.m JOIN occ ON bch.m = occ.m
        GROUP BY bch.doc_id""")),

    // MinHash-LSH against EXACT ground truth: the DuckDB oracle brute-forces
    // true Jaccard ≥ 0.5 pairs via an unnest-shingle self-join; the gate is
    // green iff LSH recall is total on this corpus (it is — deterministic
    // hash seeds, verified at sf0.001/sf0.01) and the verify step's Jaccard
    // matches the oracle's bit-for-bit (integer per-mille on both sides)
    Q("dedup_minhash_lsh",
      (s, d) => Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.5),
      Some(jaccardTruthSql(500))),

    // INCREMENTAL near-dedup: the corpus is indexed once (band buckets +
    // sorted shingle hashes), the index round-trips through parquet to
    // prove storability, and a "daily batch" (copies of every 7th doc
    // under fresh ids — identical signatures make recall structural: the
    // copy collides wherever its source does, and the full-corpus gate
    // proves sources collide with all their J≥0.5 partners) is deduped
    // against the index WITHOUT touching corpus text. Oracle recomputes
    // exact batch×corpus Jaccard truth
    Q("dedup_minhash_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-mh-idx")
        Dedup.minhashIndex(corpus, "doc_id", "text").write
          .mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        // localCheckpoint materializes the (small) pair set so the temp
        // index backing the plan can be deleted before returning
        val out = Dedup.minhashLshIncremental(batch, index, "doc_id", "text",
          threshold = 0.5).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks)-1),
                i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
          FROM base),
        batch AS (SELECT doc_id + 1000000 AS doc_id, sh FROM sets WHERE doc_id % 7 = 0),
        pa AS (SELECT doc_id, unnest(sh) AS s FROM sets),
        pb AS (SELECT doc_id, unnest(sh) AS s FROM batch),
        sa AS (SELECT doc_id, len(sh) AS sz FROM sets),
        sb AS (SELECT doc_id, len(sh) AS sz FROM batch),
        inter AS (SELECT pa.doc_id AS id_a, pb.doc_id AS id_b, count(*) AS i
          FROM pa JOIN pb ON pa.s = pb.s GROUP BY 1, 2)
        SELECT id_a, id_b, CAST((i*1000) // (sa.sz + sb.sz - i) AS BIGINT) AS jaccard_x1000
        FROM inter JOIN sa ON sa.doc_id = id_a JOIN sb ON sb.doc_id = id_b
        WHERE (i*1000) // (sa.sz + sb.sz - i) >= 500""")),

    // SimHash candidates (8×8-bit chunks: pigeonhole-complete for hamming
    // ≤ 7) verified at Jaccard ≥ 0.9. The gate uses the SQL-mirrorable
    // poly61 token hash so the ORACLE recomputes the signatures and tests
    // the operator's true contract — output ≡ {hamming ≤ 7 ∧ J ≥ 0.9} —
    // exactly, at ANY corpus scale (at sf0.1 two J ≥ 0.9 pairs sit at
    // hamming 8/10: a pure-Jaccard oracle would demand pairs no hamming
    // method can see)
    Q("dedup_simhash",
      (s, d) => Dedup.simhashVerifiedPairs(t(s, d, "documents"), "doc_id", "text",
        maxHamming = 7, threshold = 0.9, numChunks = 8, polyHash = true),
      Some(simhashTruthSql(7, 900))),

    // INCREMENTAL SimHash against a persisted (id, sig) index: the batch
    // (docs %7, re-keyed +1M) pairs against the full-corpus index without
    // re-reading history text; recall is pigeonhole-exact, so the oracle
    // is the FULL brute-force cross check over recomputed signatures
    Q("dedup_simhash_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-sh-idx")
        Dedup.simhashIndex(corpus, "doc_id", "text",
            numChunks = 8, polyHash = true)
          .write.mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.simhashIncremental(batch, index, "doc_id", "text",
          maxHamming = 7).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH sg AS ($polySigSql),
        b AS (SELECT doc_id + 1000000 AS id_b, sig FROM sg WHERE doc_id % 7 = 0)
        SELECT sg.doc_id AS id_a, b.id_b,
          CAST(bit_count(xor(sg.sig, b.sig)) AS BIGINT) AS hamming
        FROM sg, b
        WHERE sg.doc_id <> b.id_b AND bit_count(xor(sg.sig, b.sig)) <= 7""")),

    // CONTAINMENT pairs — the asymmetric quote/boilerplate detector:
    // |A∩B| / min(|A|,|B|) ≥ 0.8 with the documented ≥ 10-shingle floor
    // on the smaller side (the prefix filter's recall bound); the oracle
    // brute-forces the identical contract, so recall AND the integer
    // per-mille values must match exactly. Parameters come from the
    // shared ContainmentGate* constants so the sf1 sweep (which re-runs
    // this query with a candidate-audit observation attached) provably
    // runs the same parameterization the oracle grades.
    Q("dedup_containment",
      (s, d) => Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = ContainmentGateThreshold,
        minShingles = ContainmentGateMinShingles),
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks)-1),
                i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
          FROM base),
        sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
        posting AS (SELECT doc_id, unnest(sh) AS s FROM sets),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST((i*1000) // least(sa.sz, sb.sz) AS BIGINT) AS containment_x1000
        FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE least(sa.sz, sb.sz) >= ${ContainmentGateMinShingles}
          AND (i*1000) // least(sa.sz, sb.sz) >= ${(ContainmentGateThreshold * 1000).toInt}""")),

    // INCREMENTAL containment: corpus indexed once (stored prefixes under
    // the build-time canonical order + sorted shingle hashes), round-trips
    // through parquet, then a batch of every-7th-doc copies is checked
    // against the index WITHOUT touching corpus text — the batch posts ALL
    // its shingles, so no canonical-order agreement is needed (the
    // pigeonhole recall argument in Dedup.containmentIncremental). Oracle
    // recomputes exact batch×corpus containment truth with the same floor
    Q("dedup_containment_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-ct-idx")
        Dedup.containmentIndex(corpus, "doc_id", "text",
          threshold = 0.8, minShingles = 10).write
          .mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.containmentIncremental(batch, index, "doc_id", "text",
          threshold = 0.8, minShingles = 10).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks)-1),
                i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
          FROM base),
        batch AS (SELECT doc_id + 1000000 AS doc_id, sh FROM sets WHERE doc_id % 7 = 0),
        pa AS (SELECT doc_id, unnest(sh) AS s FROM sets),
        pb AS (SELECT doc_id, unnest(sh) AS s FROM batch),
        sa AS (SELECT doc_id, len(sh) AS sz FROM sets),
        sb AS (SELECT doc_id, len(sh) AS sz FROM batch),
        inter AS (SELECT pa.doc_id AS id_a, pb.doc_id AS id_b, count(*) AS i
          FROM pa JOIN pb ON pa.s = pb.s GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST((i*1000) // least(sa.sz, sb.sz) AS BIGINT) AS containment_x1000
        FROM inter JOIN sa ON sa.doc_id = id_a JOIN sb ON sb.doc_id = id_b
        WHERE least(sa.sz, sb.sz) >= 10
          AND (i*1000) // least(sa.sz, sb.sz) >= 800""")),

    // TF-IDF weighted cosine near-dup from RAW text ("embedding cosine"
    // with the embedding computed in-engine): saturating-tf × capped
    // rational-idf weights over 3-gram shingles, candidates from the
    // sub-df-cap inverted index, verify = exact integer cos²·1e6 over the
    // FULL vectors (dot²·1e6 DIV n2a·n2b — HUGEINT in DuckDB, DECIMAL(38)
    // + IntegralDivide in Spark, identical truncation). The df cap (50)
    // binds nothing at gate vocabulary (max shingle df = 7 at sf0.01), so
    // the oracle's shared-term candidate rule is provably identical
    Q("dedup_tfidf_cosine",
      (s, d) => Dedup.tfidfCosinePairs(t(s, d, "documents"), "doc_id", "text",
        threshold = TfidfGateThreshold,
        maxDocFreq = Some(TfidfGateMaxDocFreq)),
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        nn AS (SELECT count(*) AS nd FROM documents),
        g AS (SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
            ELSE list_transform(range(1, len(toks)-1),
              i -> array_to_string(toks[i:i+2], ' ')) END) AS gr
          FROM base),
        tf AS (SELECT doc_id, gr, count(*) AS c FROM g GROUP BY 1, 2),
        dfq AS (SELECT gr, count(*) AS df FROM tf GROUP BY gr),
        w AS (SELECT doc_id, gr, df,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // df, 10000) AS w
          FROM tf JOIN dfq USING (gr)),
        n2 AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM w GROUP BY doc_id),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM w a JOIN w b ON a.gr = b.gr AND a.doc_id < b.doc_id
          WHERE a.df <= ${TfidfGateMaxDocFreq}),
        dot AS (SELECT id_a, id_b, sum(CAST(wa.w AS HUGEINT) * wb.w) AS dot
          FROM cand JOIN w wa ON wa.doc_id = id_a
          JOIN w wb ON wb.doc_id = id_b AND wb.gr = wa.gr
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(dot*dot*1000000 // (na.n2 * nb.n2) AS BIGINT) AS cos2_x1e6
        FROM dot JOIN n2 na ON na.doc_id = id_a JOIN n2 nb ON nb.doc_id = id_b
        WHERE dot*dot*1000000 // (na.n2 * nb.n2) >=
          ${math.round(TfidfGateThreshold * TfidfGateThreshold * 1e6)}""")),

    // INCREMENTAL tf-idf cosine: corpus indexed once (sorted weighted
    // vectors, self-contained stats), round-trips through parquet, then a
    // batch of every-7th-doc copies is cosine-checked against the index
    // under the FROZEN-IDF serving convention (batch weights use the
    // index's N and df — recovered from the stored vectors, corpus text
    // untouched). Oracle replays corpus weights, frozen batch weights,
    // the sub-cap candidate rule, and the exact integer cos² predicate
    Q("dedup_tfidf_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-tfidf-idx")
        Dedup.tfidfIndex(corpus, "doc_id", "text",
          threshold = TfidfGateThreshold).write
          .mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.tfidfCosineIncremental(batch, index, "doc_id", "text",
          threshold = TfidfGateThreshold,
          maxDocFreq = Some(TfidfGateMaxDocFreq)).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        nn AS (SELECT count(*) AS nd FROM documents),
        g AS (SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
            ELSE list_transform(range(1, len(toks)-1),
              i -> array_to_string(toks[i:i+2], ' ')) END) AS gr
          FROM base),
        tf AS (SELECT doc_id, gr, count(*) AS c FROM g GROUP BY 1, 2),
        dfq AS (SELECT gr, count(*) AS df FROM tf GROUP BY gr),
        wc AS (SELECT doc_id, gr, df,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // df, 10000) AS w
          FROM tf JOIN dfq USING (gr)),
        n2c AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM wc GROUP BY doc_id),
        wb AS (SELECT doc_id + 1000000 AS doc_id, gr,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // coalesce(df, 1), 10000) AS w
          FROM tf LEFT JOIN dfq USING (gr) WHERE doc_id % 7 = 0),
        n2b AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM wb GROUP BY doc_id),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM wc a JOIN wb b ON a.gr = b.gr
          WHERE a.df <= ${TfidfGateMaxDocFreq}),
        dot AS (SELECT id_a, id_b, sum(CAST(wa.w AS HUGEINT) * wb2.w) AS dot
          FROM cand JOIN wc wa ON wa.doc_id = id_a
          JOIN wb wb2 ON wb2.doc_id = id_b AND wb2.gr = wa.gr
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(dot*dot*1000000 // (na.n2 * nb.n2) AS BIGINT) AS cos2_x1e6
        FROM dot JOIN n2c na ON na.doc_id = id_a JOIN n2b nb ON nb.doc_id = id_b
        WHERE dot*dot*1000000 // (na.n2 * nb.n2) >=
          ${math.round(TfidfGateThreshold * TfidfGateThreshold * 1e6)}""")),

    // the OPERATIONAL shape of the incremental: the (th, df) census lives
    // in a VersionedTable (tfidfStats run once at index build), and the
    // ingest passes the STORED census — no per-ingest derivation scan over
    // the index postings. Same oracle as dedup_tfidf_incremental: the
    // stored census must change nothing
    Q("dedup_tfidf_census_store",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val idxDir = java.nio.file.Files.createTempDirectory("graft-tfidf-idx2")
        Dedup.tfidfIndex(corpus, "doc_id", "text",
          threshold = TfidfGateThreshold).write
          .mode("overwrite").parquet(idxDir.toString)
        val index = s.read.parquet(idxDir.toString)
        val statsDir = java.nio.file.Files.createTempDirectory("graft-tfidf-census")
        val tbl = new graft.store.VersionedTable(s, statsDir.toString)
        tbl.overwrite(Dedup.tfidfStats(index))
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.tfidfCosineIncremental(batch, index, "doc_id", "text",
          threshold = TfidfGateThreshold,
          maxDocFreq = Some(TfidfGateMaxDocFreq),
          stats = Some(tbl.read())).localCheckpoint(true)
        deleteDir(idxDir.toFile)
        deleteDir(statsDir.toFile)
        out
      },
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        nn AS (SELECT count(*) AS nd FROM documents),
        g AS (SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
            ELSE list_transform(range(1, len(toks)-1),
              i -> array_to_string(toks[i:i+2], ' ')) END) AS gr
          FROM base),
        tf AS (SELECT doc_id, gr, count(*) AS c FROM g GROUP BY 1, 2),
        dfq AS (SELECT gr, count(*) AS df FROM tf GROUP BY gr),
        wc AS (SELECT doc_id, gr, df,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // df, 10000) AS w
          FROM tf JOIN dfq USING (gr)),
        n2c AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM wc GROUP BY doc_id),
        wb AS (SELECT doc_id + 1000000 AS doc_id, gr,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // coalesce(df, 1), 10000) AS w
          FROM tf LEFT JOIN dfq USING (gr) WHERE doc_id % 7 = 0),
        n2b AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM wb GROUP BY doc_id),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM wc a JOIN wb b ON a.gr = b.gr
          WHERE a.df <= ${TfidfGateMaxDocFreq}),
        dot AS (SELECT id_a, id_b, sum(CAST(wa.w AS HUGEINT) * wb2.w) AS dot
          FROM cand JOIN wc wa ON wa.doc_id = id_a
          JOIN wb wb2 ON wb2.doc_id = id_b AND wb2.gr = wa.gr
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(dot*dot*1000000 // (na.n2 * nb.n2) AS BIGINT) AS cos2_x1e6
        FROM dot JOIN n2c na ON na.doc_id = id_a JOIN n2b nb ON nb.doc_id = id_b
        WHERE dot*dot*1000000 // (na.n2 * nb.n2) >=
          ${math.round(TfidfGateThreshold * TfidfGateThreshold * 1e6)}""")),

    // direct inverted-index n-gram Jaccard — guaranteed-total recall (any
    // J > 0 pair shares a shingle), so spark output ≡ oracle by construction
    Q("dedup_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.3),
      Some(jaccardTruthSql(300))),

    // the tfidf cosine pair set closed into duplicate CLUSTERS — the
    // weighted-similarity family composes with the same min-label
    // propagation the Jaccard pairs use; oracle = recursive-CTE
    // reachability over the tfidf pair truth
    Q("dedup_tfidf_clusters",
      (s, d) => Dedup.duplicateClusters(
          Dedup.tfidfCosinePairs(t(s, d, "documents"), "doc_id", "text",
            threshold = TfidfGateThreshold,
            maxDocFreq = Some(TfidfGateMaxDocFreq)).select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("cluster_id")),
      Some(s"""WITH RECURSIVE base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
          nn AS (SELECT count(*) AS nd FROM documents),
          g AS (SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks)-1),
                i -> array_to_string(toks[i:i+2], ' ')) END) AS gr
            FROM base),
          tf AS (SELECT doc_id, gr, count(*) AS c FROM g GROUP BY 1, 2),
          dfq AS (SELECT gr, count(*) AS df FROM tf GROUP BY gr),
          w AS (SELECT doc_id, gr, df,
              least(c, 15) * least(100 * (SELECT nd FROM nn) // df, 10000) AS w
            FROM tf JOIN dfq USING (gr)),
          n2 AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM w GROUP BY doc_id),
          cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM w a JOIN w b ON a.gr = b.gr AND a.doc_id < b.doc_id
            WHERE a.df <= ${TfidfGateMaxDocFreq}),
          dot AS (SELECT id_a, id_b, sum(CAST(wa.w AS HUGEINT) * wb.w) AS dot
            FROM cand JOIN w wa ON wa.doc_id = id_a
            JOIN w wb ON wb.doc_id = id_b AND wb.gr = wa.gr GROUP BY 1, 2),
          tp AS (SELECT id_a, id_b
            FROM dot JOIN n2 na ON na.doc_id = id_a JOIN n2 nb ON nb.doc_id = id_b
            WHERE dot*dot*1000000 // (na.n2 * nb.n2) >=
              ${math.round(TfidfGateThreshold * TfidfGateThreshold * 1e6)}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM tp
            UNION SELECT id_b, id_a FROM tp),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
        SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id""")),

    // transitive closure of the (total-recall) pair set into duplicate
    // CLUSTERS: min-label propagation joins vs a DuckDB recursive-CTE
    // reachability truth — cluster_id = component minimum on both sides
    Q("dedup_clusters",
      (s, d) => Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
            threshold = 0.3).select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("cluster_id")),
      Some(s"""WITH RECURSIVE tp AS (${jaccardTruthSql(300)}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM tp
            UNION SELECT id_b, id_a FROM tp),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
        SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id""")),

    // INCREMENTAL clustering: half the duplicate pairs cluster first,
    // the labels round-trip through parquet as star edges, the other
    // half folds in — cost scales with |labels| + |new pairs|, never the
    // historical pair set; min-id labels must equal the one-shot
    // clustering over everything (same recursive-reach oracle)
    Q("dedup_clusters_incremental",
      (s, d) => {
        val pairs = Dedup.ngramJaccardPairs(t(s, d, "documents"),
            "doc_id", "text", threshold = 0.3)
          .select("id_a", "id_b").localCheckpoint(true)
        val dir = java.nio.file.Files.createTempDirectory("graft-cc-state")
        Dedup.duplicateClusters(
            pairs.filter((col("id_a") + col("id_b")) % 2 === 0))
          .write.mode("overwrite").parquet(dir.toString)
        val labels = s.read.parquet(dir.toString)
        val out = Dedup.clustersIncremental(labels,
            pairs.filter((col("id_a") + col("id_b")) % 2 === 1))
          .select(col("id").as("doc_id"), col("cluster_id"))
          .localCheckpoint(true)
        deleteDir(dir.toFile)
        Dedup.releaseIntermediates()
        out
      },
      Some(s"""WITH RECURSIVE tp AS (${jaccardTruthSql(300)}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM tp
            UNION SELECT id_b, id_a FROM tp),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
        SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id""")),

    // same truth through the alternating large-star/small-star contraction
    // (O(log n) rounds — the star-heavy/high-degree-graph option)
    Q("dedup_clusters_stars",
      (s, d) => Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
            threshold = 0.3).select("id_a", "id_b"), algorithm = "stars")
        .select(col("id").as("doc_id"), col("cluster_id")),
      Some(s"""WITH RECURSIVE tp AS (${jaccardTruthSql(300)}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM tp
            UNION SELECT id_b, id_a FROM tp),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
        SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id""")),

    // cluster representative by QUALITY (keep the longest copy, not the
    // min id): clusters from the total-recall Jaccard truth, then one
    // keyed window picks (n_chars desc, id asc) per cluster — the oracle
    // replays reachability + the same QUALIFY
    Q("dedup_cluster_keep_best",
      (s, d) => {
        val docs = t(s, d, "documents")
        val clusters = Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3)
            .select("id_a", "id_b"))
        Dedup.clusterRepresentatives(clusters,
          docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars")
      },
      Some(s"""WITH RECURSIVE tp AS (${jaccardTruthSql(300)}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM tp
            UNION SELECT id_b, id_a FROM tp),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
          cl AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
            FROM reach GROUP BY id)
        SELECT cluster_id, doc_id AS keep_id
        FROM cl JOIN documents USING (doc_id)
        QUALIFY row_number() OVER (PARTITION BY cluster_id
          ORDER BY n_chars DESC, doc_id) = 1""")),

    // the synthetic embeddings have no true near-dups (max pairwise cosine
    // ≈ 0.51), so the gate plants them: each vector unioned with a ×2-scaled
    // copy (float-exact, cosine 1.0, and — since sign(dot(2v, p)) ≡
    // sign(dot(v, p)) — IDENTICAL hyperplane signature, making LSH recall
    // of planted pairs structural, not probabilistic). Oracle brute-forces
    // cosine ≥ 0.95 over the same constructed corpus.
    Q("dedup_embedding",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val pert = emb.select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => (x * lit(2.0f)).cast("float")).as("embedding"))
        val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(pert)
        Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding",
          threshold = 0.95, planes = 8, tables = 4)
      },
      Some("""WITH corpus AS (SELECT vec_id AS id, embedding AS v FROM embeddings
          UNION ALL SELECT vec_id + 100000,
            list_transform(embedding, x -> CAST(x*2 AS FLOAT)) FROM embeddings)
        SELECT a.id AS id_a, b.id AS id_b FROM corpus a, corpus b
        WHERE a.id < b.id AND list_cosine_similarity(a.v, b.v) >= 0.95""")),

    // SemDeDup (cluster-then-prune semantic dedup): plant IDENTICAL copies
    // of every 3rd vector under new ids — an identical vector is
    // structurally co-cell with its source (deterministic L2 argmin over
    // the same centroid table), and the fixtures' max NATURAL pairwise
    // cosine is ≈0.60 (sf0.1; lower at smaller sf) << the 0.95 threshold —
    // so the kept set is provably independent of where k-means put the
    // cluster boundaries, and the oracle needs no clustering at all: a doc
    // is dropped iff a smaller-id member of the union has cosine ≥ 0.95
    Q("dedup_semantic",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id"), col("embedding"))
          .unionByName(emb.filter(col("vec_id") % 3 === 0)
            .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
        val out = Dedup.semanticDedup(corpus, "vec_id", "embedding",
          threshold = 0.95, k = 16, iters = 2).localCheckpoint(true)
        Dedup.releaseIntermediates()
        out
      },
      Some("""WITH corpus AS (SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id + 100000, embedding
            FROM embeddings WHERE vec_id % 3 = 0)
        SELECT c.vec_id AS id FROM corpus c WHERE NOT EXISTS (
          SELECT 1 FROM corpus o WHERE o.vec_id < c.vec_id
            AND list_cosine_similarity(o.embedding, c.embedding) >= 0.95)""")),

    // INCREMENTAL SemDeDup: the daily embedding batch deduped against a
    // PERSISTED cell index (ivfAssign round-tripped through parquet,
    // partitionBy(cell) — only touched cells load). Batch = identical
    // copies of every 4th vector (structurally co-cell with their source;
    // die on the corpus side) + NEGATED every-5th vectors (cosine to
    // everything is the negation of a ≤0.60 natural cosine, and −1 to
    // their own source — never ≥ 0.95; survive). Kept set is provably
    // cluster-independent, so the oracle needs no clustering
    Q("dedup_semantic_incremental",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val centroids = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 16, iters = 2)
        val dir = java.nio.file.Files.createTempDirectory("graft-sem-idx")
        Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
          .transform(Similarity.clusterForIndexWrite).write.partitionBy("cell").mode("overwrite").parquet(dir.toString)
        val batch = emb.filter(col("vec_id") % 4 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
          .unionByName(emb.filter(col("vec_id") % 5 === 0)
            .select((col("vec_id") + 200000L).as("vec_id"),
              transform(col("embedding"), x => (-x).cast("float")).as("embedding")))
        val out = Dedup.semanticDedupIncremental(batch, "vec_id", "embedding",
            s.read.parquet(dir.toString), centroids, threshold = 0.95)
          .localCheckpoint(true)
        Dedup.releaseIntermediates()
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH batch AS (
          SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0
          UNION ALL SELECT vec_id + 200000,
            list_transform(embedding, x -> CAST(-x AS FLOAT))
            FROM embeddings WHERE vec_id % 5 = 0)
        SELECT b.vec_id AS id FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM embeddings c
            WHERE list_cosine_similarity(c.embedding, b.embedding) >= 0.95)
          AND NOT EXISTS (SELECT 1 FROM batch o WHERE o.vec_id < b.vec_id
            AND list_cosine_similarity(o.embedding, b.embedding) >= 0.95)""")),

    // INCREMENTAL EXACT DEDUP, history-probe strategies: the same daily
    // batch (exact copies of every 7th doc = dupes, order-reversed every
    // 13th = novel) deduped against the persisted fingerprint history —
    // once via the broadcast semi-probe (zero shuffle of the history) and
    // once via the driver bloom prefilter (constant-size probe; false
    // positives are re-checked exactly, so all three strategies are
    // result-identical). One oracle text serves both gates.
    Q("dedup_exact_probe",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val seen = Dedup.exact(corpus, "doc_id", "text").select("fp")
        val out = Dedup.exactIncremental(ingestBatch(corpus), "doc_id", "text",
            seen, strategy = "probe")
          .select("doc_id").localCheckpoint(true)
        Dedup.releaseIntermediates()
        out
      },
      Some(incrementalExactOracle)),

    Q("dedup_exact_bloom",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val seen = Dedup.exact(corpus, "doc_id", "text").select("fp")
        val out = Dedup.exactIncremental(ingestBatch(corpus), "doc_id", "text",
            seen, strategy = "bloom", bloomFpp = 0.01)
          .select("doc_id").localCheckpoint(true)
        Dedup.releaseIntermediates()
        out
      },
      Some(incrementalExactOracle)))
}
