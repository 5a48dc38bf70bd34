package graft.queries

import graft.api.Df
import graft.operators.{Curation, TextAnalytics}
import org.apache.spark.sql.functions._
import QueryUtil._
import ExtensionQueries.toksSql

/** Training-pipeline suite, wave 3 (q168–q174): frequency-based
  * boilerplate line removal, DSIR importance weights, PMI collocation
  * mining, corpus snapshot diff, interpolated bigram NLL,
  * length-stratified batch assembly, and deterministic negative
  * sampling.
  *
  * Oracle conventions are the CurationQueries ones: deterministic
  * doc_id-derived augmentation where the synthetic corpus lacks the
  * structure an operator targets, md5-prefix hashes, decimal-cast log
  * sums, ROUND-absorbed libm ulps, total-order output sorts.
  */
object PipelineQueries {

  /** deterministic line structure for the boilerplate rule: every doc
    * gets the universal footer (df = all docs), every third doc a
    * mid-frequency promo line (df ≈ n/3 — still over threshold), every
    * doc a unique line (df = 1, always kept). Base texts contribute
    * their own lines (df = exact-dup group size, under threshold). */
  private val boilerAug =
    """concat(text, chr(10), 'shared boilerplate footer',
      |CASE WHEN doc_id % 3 = 0
      |  THEN concat(chr(10), 'subscribe to our newsletter') ELSE '' END,
      |chr(10), 'doc specific ', CAST(doc_id AS STRING))""".stripMargin
  private val boilerAugSql =
    "text || chr(10) || 'shared boilerplate footer' || " +
      "(CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter' " +
      "ELSE '' END) || chr(10) || 'doc specific ' || doc_id::VARCHAR"

  private val dsirBuckets = 1024
  private val nllLambda = 0.7
  private val sbAlpha = 0.4
  private val wfBudget = 10000.0

  val defs: Map[String, Q] = Map(
    // ---- frequency-based boilerplate line removal: the footer
    // (df = 500) and the promo line (df ≈ 167) are stripped from EVERY
    // doc; unique lines and base-text lines (df ≤ exact-dup group
    // size) survive ----
    "q168_boilerplate_lines" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.sdf.selectExpr("doc_id", s"$boilerAug AS text"))
      Curation.stripBoilerplateLines(aug, "text", "doc_id", minDocFreq = 100)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- DSIR hashed-unigram importance weights, target = English
    // docs: en-like docs score positive, others negative; the add-1
    // smoothed bucket distributions make every token finite ----
    "q169_dsir_weights" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.sdf.selectExpr("doc_id", "text", "lang = 'en' AS is_tgt"))
      Curation.dsirLogWeights(aug, "text", "doc_id", "is_tgt",
        buckets = dsirBuckets)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- PMI collocations over adjacent-token pairs (minCount 5):
    // the full above-threshold table, margins counted over bigram
    // positions ----
    "q170_pmi_collocations" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      TextAnalytics.pmiCollocations(d, "text", minCount = 5)
        .sortValues(Seq("w1", "w2")).sdf
    }),

    // ---- corpus snapshot diff: new = old minus the %7 wave (removed),
    // with the %5 wave's text edited (changed) and 20 fresh ids
    // appended (added); everything else unchanged ----
    "q171_corpus_diff" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val newer = new Df(d.sdf.where(expr("doc_id % 7 <> 0")).selectExpr("doc_id",
        "CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v2') ELSE text END AS text")
        .union(d.sdf.where(col("doc_id") < 20)
          .selectExpr("doc_id + 10000 AS doc_id", "text")))
      Curation.corpusDiff(d, newer, "doc_id", "text")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- interpolated bigram NLL (λ = 0.7), corpus as its own model:
    // every doc has ≥ 2 tokens, so all 500 score ----
    "q172_bigram_nll" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      TextAnalytics.bigramNll(d, "text", "doc_id", lambda = nllLambda)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- length-stratified batches: quartile buckets × 8 hash shards,
    // batches of 16 in (n_tokens, id) order within each cell ----
    "q173_length_batches" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Curation.lengthBucketBatches(d, "text", "doc_id",
        nBuckets = 4, batchSize = 16, shards = 8)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- deterministic negative sampling: 3 negatives per anchor
    // under seed 7 over a 200-doc slice — the oracle replays the
    // permutation AND the hash draws exactly ----
    "q174_negative_samples" -> ((s, dir) => {
      val d = T(s, dir, "documents").where(col("doc_id") < 200)
      Curation.negativeSamples(d, "doc_id", k = 3, seed = 7L)
        .sortValues(Seq("anchor_id", "neg_rank")).sdf
    }),

    // ---- content-defined chunking: 4-token rolling hash, cut where
    // hash % 8 == 0 (≈8-token chunks over ~25-token docs) — the
    // oracle replays every boundary and slice ----
    "q175_cdc_chunks" -> ((s, dir) => {
      val d = T(s, dir, "documents").where(col("doc_id") < 200)
      TextAnalytics.cdcChunks(d, "text", "doc_id", window = 4, modulus = 8)
        .sortValues(Seq("doc_id", "chunk_idx")).sdf
    }),

    // ---- Gumbel-top-k importance sampling: weight = ln(n_chars),
    // 100 of 500 docs selected ∝ weight, byte-reproducible draws ----
    "q176_importance_sample" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val scored = new Df(d.sdf.selectExpr("doc_id",
        "ROUND(LN(CAST(n_chars AS DOUBLE)), 6) AS log_weight"))
      Curation.importanceSample(scored, "log_weight", "doc_id",
        n = 100, seed = 7L)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- corpus n-gram diversity profile at n = 1, 2, 3 ----
    "q177_ngram_diversity" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      TextAnalytics.ngramDiversity(d, "text", Seq(1, 2, 3))
        .sortValues(Seq("n")).sdf
    }),

    // ---- winsorize l_extendedprice at the exact [5%, 95%] corpus
    // quantiles — broadcast cuts, map-side clip ----
    "q178_winsorize" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      Curation.winsorize(
        new Df(li.sdf.select("l_orderkey", "l_linenumber", "l_extendedprice")),
        "l_extendedprice", lo = 0.05, hi = 0.95)
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }),

    // ---- per-group z-scores from exact decimal moments: quantity
    // standardized within each return-flag cohort ----
    "q180_standardize" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      Curation.standardizeBy(
        new Df(li.sdf.select("l_orderkey", "l_linenumber", "l_returnflag",
          "l_quantity")),
        "l_quantity", Seq("l_returnflag"))
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }),

    // ---- match-key text normalization: case folded, punctuation
    // stripped, whitespace collapsed — exercised on augmented text
    // carrying all three noise classes ----
    "q181_normalize_text" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.sdf.selectExpr("doc_id",
        "concat(upper(substring(text, 1, 10)), '  ', text, ' !!! Mixed-CASE, punct.') AS text"))
      Curation.withNormalizedText(aug, "text", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- one-row corpus duplication report (the corpus's inherent
    // exact dups: 500 docs, 446 unique) ----
    "q182_dedup_report" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      graft.operators.Dedup.dedupReport(d, "text").sdf
    }),

    // ---- 20-bin equal-width histogram of l_extendedprice ----
    "q183_histogram" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      graft.operators.Profiling.histogram(li, "l_extendedprice", bins = 20)
        .sortValues(Seq("bucket")).sdf
    }),

    // ---- pairwise Pearson correlations from exact decimal moments.
    // Small-magnitude columns on purpose: their moment sums stay under
    // 2^53 decimal quanta, so BOTH engines' decimal→double casts are
    // exact (price² sums would round) ----
    "q184_correlation" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      graft.operators.Profiling.correlation(li,
        Seq("l_quantity", "l_discount", "l_tax"))
        .sortValues(Seq("col_a", "col_b")).sdf
    }),

    // ---- c-TF-IDF cluster labels: top-10 terms per language ----
    "q186_class_tfidf" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      TextAnalytics.classTfidf(d, "text", "lang", k = 10)
        .sortValues(Seq("lang", "rank")).sdf
    }),

    // ---- three-way deterministic split (10% val / 10% test), exact
    // per-doc assignment replayed ----
    "q187_split3" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      d.splitByHash3("doc_id", valFraction = 0.1, testFraction = 0.1)
        .select("doc_id", "split").sortValues(Seq("doc_id")).sdf
    }),

    // ---- dedup on the normalized-text key: injected case/punct
    // variants (doc_id+5000 = UPPER(text) + ' !!!') collapse with
    // their originals; survivors keep ORIGINAL text ----
    "q188_normalized_dedup" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.sdf.select(col("doc_id"), col("text"))
        .union(d.sdf.where(col("doc_id") < 100)
          .selectExpr("doc_id + 5000 AS doc_id",
            "concat(upper(text), ' !!!') AS text")))
      Curation.dedupByNormalizedText(aug, "text", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- vocabulary coverage curve at V = 100 / 1000 / 5000:
    // frequency-ranked top-V occupancy of total token occurrences ----
    "q189_vocab_coverage" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      TextAnalytics.vocabCoverage(d, "text", Seq(100, 1000, 5000))
        .sortValues(Seq("v")).sdf
    }),

    // ---- per-doc OOV rate against the corpus's own top-1000 vocab ----
    "q190_oov_rate" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      TextAnalytics.oovRate(d, "text", "doc_id", vocabSize = 1000)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- Zipf slope over the top-500 ranked terms: the one-row
    // corpus-health fit, decimal moments replayed exactly ----
    "q191_zipf_slope" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      TextAnalytics.zipfSlope(d, "text", topK = 500).sdf
    }),

    // ---- reciprocal-rank fusion of three scale-incompatible quality
    // signals (chars, tokens, distinct-token ratio) — every rank and
    // the fused score replayed exactly ----
    "q192_rank_fusion" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val d = T(s, dir, "documents")
      val sigs = d.sdf.select(col("doc_id"),
        length(col("text")).as("s_chars"),
        size(tokens(col("text"))).as("s_tokens"),
        round(size(array_distinct(tokens(col("text")))).cast("double") /
          size(tokens(col("text"))), 6).as("s_distinct"))
      Curation.rankFusion(new Df(sigs),
          Seq("s_chars", "s_tokens", "s_distinct"), "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- Okapi BM25 weights (corpus-wide stats, output bounded to
    // doc_id < 100 — the q104 convention) ----
    "q193_bm25" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      new Df(TextAnalytics.bm25(d, "text", "doc_id").sdf
        .where(col("doc_id") < 100))
        .sortValues(Seq("doc_id", "term")).sdf
    }),

    // ---- BM25 top-20 search for a 3-term query: the domain-seed
    // corpus selection shape, deterministic (score, id) cut ----
    "q194_bm25_search" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      TextAnalytics.bm25Search(d, "text", "doc_id",
        query = Seq("hash", "join", "scan"), topN = 20).sdf
    }),

    // ---- trigram stupid-backoff NLL: model counted on even doc_ids,
    // odd doc_ids scored — the heldout split makes all three backoff
    // levels reachable (unseen trigrams/bigrams actually back off) ----
    "q202_backoff_nll" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val train = new Df(d.sdf.where(col("doc_id") % 2 === 0))
      val score = new Df(d.sdf.where(col("doc_id") % 2 === 1))
      TextAnalytics.stupidBackoffNll(train, score, "text", "doc_id",
        alpha = sbAlpha)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- order-independent dataset fingerprint: the reproducibility
    // receipt (count + xor/sum/min/max of 60-bit row hashes) over
    // integer/string key columns — the oracle recomputes every hash ----
    "q204_fingerprint_ds" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      graft.operators.Profiling.datasetFingerprint(li,
        Seq("l_orderkey", "l_linenumber", "l_returnflag")).sdf
    }),

    // ---- MAD robust outliers on order totals (threshold 2.0 so the
    // uniform-ish synthetic distribution still flags its tails) ----
    "q206_robust_outliers" -> ((s, dir) => {
      val o = T(s, dir, "orders").select("o_orderkey", "o_totalprice")
      Curation.robustOutliers(o, "o_totalprice", threshold = 2.0)
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- incremental aggregate maintenance: state from even order
    // keys + raw delta of odd ones; the oracle does the FULL rescan —
    // proving merge ≡ recompute without ever rescanning history ----
    "q210_incremental_agg" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val spec = Seq("l_quantity" -> "sum", "l_quantity" -> "count",
        "l_extendedprice" -> "max")
      val prev = Curation.aggState(
        new Df(li.sdf.where(col("l_orderkey") % 2 === 0)),
        Seq("l_returnflag"), spec)
      // decimal-absorbed sum back to DOUBLE for the gate: the merged
      // DECIMAL(38,6) is exact, and the value is double-representable,
      // but decimal128(38,x) canonicalizes differently across engines
      new Df(Curation.incrementalAgg(prev,
        new Df(li.sdf.where(col("l_orderkey") % 2 === 1)),
        Seq("l_returnflag"), spec).sdf
        .withColumn("l_quantity_sum", col("l_quantity_sum").cast("double")))
        .sortValues(Seq("l_returnflag")).sdf
    }),

    // ---- equi-depth histogram of order totals: 8 quantile buckets,
    // the q173 strictly-greater bucket convention ----
    "q211_equidepth_hist" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      graft.operators.Profiling.equiDepthHistogram(o, "o_totalprice", 8)
        .sortValues(Seq("bucket")).sdf
    }),

    // ---- UniMax water-filling: per-source token availability vs a
    // 10k-token budget — small sources keep all, big ones cap at the
    // common level; the oracle replays the prefix-scan level search ----
    "q213_budget_fill" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val avail = new Df(d.sdf.groupBy(col("source"))
        .agg(sum(graft.functions.TextFunctions.tokenCount(col("text")))
          .cast("double").as("avail")))
      Curation.waterFillBudget(avail, "source", "avail", budget = wfBudget)
        .sortValues(Seq("source")).sdf
    }))

  val oracles: Map[String, String] = Map(
    // line pipeline exactly as q121, but the kill rule is document
    // frequency (COUNT(DISTINCT doc_id) ≥ 100 → the line dies
    // everywhere) instead of keep-first
    "q168_boilerplate_lines" ->
      s"""WITH src AS (SELECT doc_id, $boilerAugSql AS t FROM documents),
         |ls0 AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM src),
         |lx AS (SELECT doc_id, UNNEST(range(len(ls))) AS p, ls FROM ls0),
         |l AS (SELECT doc_id, p::INT AS pos, ls[(p+1)::INT] AS line FROM lx),
         |h AS (SELECT doc_id, pos, line,
         |  ('0x' || substr(md5(line),1,8))::BIGINT AS lh FROM l),
         |boiler AS (SELECT lh FROM (SELECT lh, COUNT(DISTINCT doc_id) AS df
         |  FROM h GROUP BY lh) WHERE df >= 100),
         |kept AS (SELECT * FROM h WHERE lh NOT IN (SELECT lh FROM boiler)),
         |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
         |  string_agg(line, chr(10) ORDER BY pos) AS text
         |  FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM h GROUP BY doc_id)
         |SELECT tot.doc_id, tot.n_lines,
         |COALESCE(reb.n_kept, 0)::BIGINT AS n_kept,
         |COALESCE(reb.text, '') AS text
         |FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id
         |ORDER BY tot.doc_id""".stripMargin,

    // bucket = md5-hash32 % buckets (the q163 convention); smoothed
    // log-ratio per bucket cast DECIMAL(18,8) BEFORE the per-doc sum
    // (order-independent), mean-free sum rounded 4dp
    "q169_dsir_weights" ->
      s"""WITH toks AS (SELECT doc_id, COALESCE(lang = 'en', false) AS tgt,
         |  UNNEST(${toksSql()}) AS tok FROM documents),
         |b AS (SELECT doc_id, tgt,
         |  ('0x' || substr(md5(tok),1,8))::BIGINT % $dsirBuckets AS bucket
         |  FROM toks),
         |c AS (SELECT bucket, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct_t,
         |  COUNT(*) AS ct_r FROM b GROUP BY bucket),
         |t AS (SELECT SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tot_t,
         |  COUNT(*) AS tot_r FROM b),
         |r AS (SELECT bucket,
         |  CAST(LN((ct_t + 1)::DOUBLE / (tot_t + $dsirBuckets)) -
         |       LN((ct_r + 1)::DOUBLE / (tot_r + $dsirBuckets))
         |    AS DECIMAL(18,8)) AS lr
         |  FROM c CROSS JOIN t)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |ROUND(CAST(SUM(lr) AS DOUBLE), 4) AS log_weight
         |FROM b JOIN r USING (bucket) GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // margins over bigram POSITIONS (left/right member counts), total
    // N over all bigram events; pmi = ln(c·N/(cl·cr)) rounded 6dp
    "q170_pmi_collocations" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql()} AS toks FROM documents),
         |g AS (SELECT UNNEST(range(len(toks) - 1)) AS i, toks
         |  FROM t WHERE len(toks) >= 2),
         |bi AS (SELECT toks[(i+1)::INT] AS w1, toks[(i+2)::INT] AS w2 FROM g),
         |pair AS (SELECT w1, w2, COUNT(*) AS n_pair FROM bi GROUP BY w1, w2),
         |l AS (SELECT w1, COUNT(*) AS n_w1 FROM bi GROUP BY w1),
         |r AS (SELECT w2, COUNT(*) AS n_w2 FROM bi GROUP BY w2),
         |n AS (SELECT COUNT(*) AS n FROM bi)
         |SELECT p.w1, p.w2, p.n_pair, l.n_w1, r.n_w2,
         |ROUND(LN(p.n_pair::DOUBLE * (SELECT n FROM n)
         |  / (l.n_w1::DOUBLE * r.n_w2)), 6) + 0.0 AS pmi
         |FROM pair p JOIN l USING (w1) JOIN r USING (w2)
         |WHERE p.n_pair >= 5 ORDER BY w1, w2""".stripMargin,

    // both sides reduce to (id, md5) before a FULL JOIN; null-safe
    // fingerprint compare (IS NOT DISTINCT FROM ≡ Spark's <=>)
    "q171_corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS f FROM documents),
        |n AS (SELECT doc_id,
        |  md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS f
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000, md5(text) FROM documents WHERE doc_id < 20)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |CASE WHEN o.doc_id IS NULL THEN 'added'
        |     WHEN n.doc_id IS NULL THEN 'removed'
        |     WHEN o.f IS NOT DISTINCT FROM n.f THEN 'unchanged'
        |     ELSE 'changed' END AS status
        |FROM o FULL JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // p = λ·cb/cl + (1−λ)·cu/N with the λ literals PRINTED FROM SCALA
    // (1 − 0.7 is 0.30000000000000004 in both engines only if both
    // parse the same literal); −ln terms DECIMAL(18,8)-cast, mean 4dp
    "q172_bigram_nll" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql()} AS toks FROM documents),
         |u AS (SELECT UNNEST(toks) AS w FROM t),
         |uni AS (SELECT w, COUNT(*) AS cu FROM u GROUP BY w),
         |nu AS (SELECT COUNT(*) AS nu FROM u),
         |g AS (SELECT doc_id, UNNEST(range(len(toks) - 1)) AS i, toks
         |  FROM t WHERE len(toks) >= 2),
         |bi AS (SELECT doc_id, toks[(i+1)::INT] AS w1, toks[(i+2)::INT] AS w2
         |  FROM g),
         |pc AS (SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY w1, w2),
         |lc AS (SELECT w1, COUNT(*) AS cl FROM bi GROUP BY w1),
         |s AS (SELECT bi.doc_id,
         |  CAST(-LN($nllLambda::DOUBLE * pc.cb::DOUBLE / lc.cl
         |    + ${1 - nllLambda}::DOUBLE * uni.cu::DOUBLE / (SELECT nu FROM nu))
         |    AS DECIMAL(18,8)) AS nll
         |  FROM bi JOIN pc USING (w1, w2) JOIN lc USING (w1)
         |  JOIN uni ON bi.w2 = uni.w)
         |SELECT doc_id, COUNT(*) AS n_transitions,
         |ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 4) AS avg_nll
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // quartile cuts via quantile_cont (≡ Spark exact percentile,
    // the q152 equivalence), rounded 6dp; bucket = 1 + #cuts below;
    // batch = per-(bucket, shard) ordinal div batchSize
    "q173_length_batches" ->
      s"""WITH d AS (SELECT doc_id, len(${toksSql()})::BIGINT AS n_tokens
         |  FROM documents),
         |c AS (SELECT ROUND(quantile_cont(n_tokens, ${1.0 / 4}::DOUBLE), 6) AS t1,
         |  ROUND(quantile_cont(n_tokens, ${2.0 / 4}::DOUBLE), 6) AS t2,
         |  ROUND(quantile_cont(n_tokens, ${3.0 / 4}::DOUBLE), 6) AS t3 FROM d),
         |b AS (SELECT doc_id, n_tokens,
         |  1 + (CASE WHEN n_tokens::DOUBLE > t1 THEN 1 ELSE 0 END)
         |    + (CASE WHEN n_tokens::DOUBLE > t2 THEN 1 ELSE 0 END)
         |    + (CASE WHEN n_tokens::DOUBLE > t3 THEN 1 ELSE 0 END) AS bucket,
         |  (('0x' || substr(md5(doc_id::VARCHAR),1,8))::BIGINT % 8)::INT AS shard
         |  FROM d CROSS JOIN c),
         |r AS (SELECT doc_id, n_tokens, bucket, shard,
         |  ROW_NUMBER() OVER (PARTITION BY bucket, shard
         |    ORDER BY n_tokens, doc_id) - 1 AS rn FROM b)
         |SELECT doc_id, n_tokens, bucket, shard, (rn // 16)::BIGINT AS batch
         |FROM r ORDER BY doc_id""".stripMargin,

    // moments from EXACT decimal sums (order-independent), then the
    // identical double formula on both engines; ROUND 6 for belt and
    // braces though the inputs are bit-equal
    "q180_standardize" ->
      """WITH st AS (SELECT l_returnflag, COUNT(l_quantity) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS s2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber, l.l_quantity,
        |CASE WHEN st.n >= 2 AND (s2 - s1 * s1 / n) / (n - 1) > 0 THEN
        |  ROUND((l.l_quantity - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)
        |  + 0.0 END AS l_quantity_z
        |FROM lineitem l JOIN st USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // same augmentation, same ASCII-safe regex chain with the 'g' flag
    "q181_normalize_text" ->
      """WITH src AS (SELECT doc_id,
        |  upper(substr(text, 1, 10)) || '  ' || text
        |    || ' !!! Mixed-CASE, punct.' AS t FROM documents)
        |SELECT doc_id, length(t)::INT AS n_chars,
        |trim(regexp_replace(regexp_replace(lower(t),
        |  '[^a-z0-9\s]+', ' ', 'g'), '\s+', ' ', 'g')) AS text_norm,
        |length(trim(regexp_replace(regexp_replace(lower(t),
        |  '[^a-z0-9\s]+', ' ', 'g'), '\s+', ' ', 'g')))::INT AS n_chars_norm
        |FROM src ORDER BY doc_id""".stripMargin,

    "q182_dedup_report" ->
      """WITH g AS (SELECT md5(text) AS fp, COUNT(*) AS ct
        |  FROM documents GROUP BY md5(text))
        |SELECT CAST(SUM(ct) AS BIGINT) AS n_docs, COUNT(*) AS n_unique,
        |CAST(SUM(CASE WHEN ct > 1 THEN ct ELSE 0 END) AS BIGINT)
        |  AS n_in_dup_groups,
        |MAX(ct) AS max_group,
        |ROUND((SUM(ct) - COUNT(*))::DOUBLE / SUM(ct), 6) AS removable_fraction
        |FROM g""".stripMargin,

    // same double arithmetic, same association order as the operator
    // (the Layout z-bucket convention)
    "q183_histogram" ->
      """WITH mm AS (SELECT MIN(l_extendedprice::DOUBLE) AS mn,
        |  MAX(l_extendedprice::DOUBLE) AS mx FROM lineitem),
        |b AS (SELECT CASE WHEN mx = mn THEN 0 ELSE
        |  LEAST(GREATEST(CAST(FLOOR((l_extendedprice::DOUBLE - mn)
        |    / (mx - mn) * 20) AS INT), 0), 19) END AS bucket
        |  FROM lineitem CROSS JOIN mm WHERE l_extendedprice IS NOT NULL),
        |c AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket)
        |SELECT bucket, ROUND(mn + bucket * (mx - mn) / 20, 6) AS lo,
        |ROUND(mn + (bucket + 1) * (mx - mn) / 20, 6) AS hi, n
        |FROM c CROSS JOIN mm ORDER BY bucket""".stripMargin,

    // five exact-decimal moments per pair → the identical double
    // formula; listwise NULL exclusion fixes one common support
    "q184_correlation" ->
      """WITH m AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s0,
        |  CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS q0,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_discount*l_discount AS DECIMAL(28,4))) AS DOUBLE) AS q1,
        |  CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS s2,
        |  CAST(SUM(CAST(l_tax*l_tax AS DECIMAL(28,4))) AS DOUBLE) AS q2,
        |  CAST(SUM(CAST(l_quantity*l_discount AS DECIMAL(28,4))) AS DOUBLE) AS p01,
        |  CAST(SUM(CAST(l_quantity*l_tax AS DECIMAL(28,4))) AS DOUBLE) AS p02,
        |  CAST(SUM(CAST(l_discount*l_tax AS DECIMAL(28,4))) AS DOUBLE) AS p12
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL)
        |SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b,
        |  CASE WHEN n*q0 - s0*s0 > 0 AND n*q1 - s1*s1 > 0 THEN
        |    ROUND((n*p01 - s0*s1) / (sqrt(n*q0 - s0*s0) * sqrt(n*q1 - s1*s1)), 6) + 0.0
        |  END AS corr FROM m
        |UNION ALL
        |SELECT 'l_quantity', 'l_tax',
        |  CASE WHEN n*q0 - s0*s0 > 0 AND n*q2 - s2*s2 > 0 THEN
        |    ROUND((n*p02 - s0*s2) / (sqrt(n*q0 - s0*s0) * sqrt(n*q2 - s2*s2)), 6) + 0.0
        |  END FROM m
        |UNION ALL
        |SELECT 'l_discount', 'l_tax',
        |  CASE WHEN n*q1 - s1*s1 > 0 AND n*q2 - s2*s2 > 0 THEN
        |    ROUND((n*p12 - s1*s2) / (sqrt(n*q1 - s1*s1) * sqrt(n*q2 - s2*s2)), 6) + 0.0
        |  END FROM m
        |ORDER BY col_a, col_b""".stripMargin,

    // adjacent bucket ranges off the q118 hash rule; thresholds
    // ROUND(f·buckets) exactly like the operator
    "q187_split3" ->
      """SELECT doc_id, CASE
        |WHEN ('0x' || substr(md5(doc_id::VARCHAR),1,8))::BIGINT % 10000 < 1000
        |  THEN 'val'
        |WHEN ('0x' || substr(md5(doc_id::VARCHAR),1,8))::BIGINT % 10000 < 2000
        |  THEN 'test'
        |ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the q181 normalization chain as an md5 MATCH KEY (never a
    // rewrite): min-id survivor per key, original text joined back
    "q188_normalized_dedup" ->
      """WITH src AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 5000, upper(text) || ' !!!'
        |  FROM documents WHERE doc_id < 100),
        |k AS (SELECT doc_id, text,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]+', ' ', 'g'), '\s+', ' ', 'g'))) AS nk FROM src),
        |g AS (SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |  FROM k GROUP BY nk)
        |SELECT g.doc_id, g.n_copies, k2.text
        |FROM g JOIN k k2 ON g.doc_id = k2.doc_id
        |ORDER BY g.doc_id""".stripMargin,

    // frequency rank with term tiebreak (1-based ROW_NUMBER <= v ≡ the
    // Spark side's 0-based scalable ordinal < v); coverage = exact
    // integer division rounded 6dp
    "q189_vocab_coverage" ->
      s"""WITH toks AS (SELECT UNNEST(${toksSql()}) AS term FROM documents),
         |cnt AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
         |rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS r
         |  FROM cnt),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM cnt),
         |vs AS (SELECT UNNEST([100, 1000, 5000]) AS v)
         |SELECT v::INT AS v, CAST(COUNT(*) AS BIGINT) AS vocab_terms,
         |CAST(SUM(c) AS BIGINT) AS covered, tot.total,
         |ROUND(CAST(SUM(c) AS DOUBLE) / tot.total, 6) AS coverage
         |FROM rk CROSS JOIN vs CROSS JOIN tot WHERE rk.r <= vs.v
         |GROUP BY vs.v, tot.total ORDER BY v""".stripMargin,

    "q190_oov_rate" ->
      s"""WITH toks AS (SELECT doc_id, UNNEST(${toksSql()}) AS term
         |  FROM documents),
         |cnt AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
         |vocab AS (SELECT term FROM (SELECT term,
         |  ROW_NUMBER() OVER (ORDER BY c DESC, term) AS r FROM cnt)
         |  WHERE r <= 1000),
         |pd AS (SELECT doc_id, COUNT(*) AS n_tokens FROM toks GROUP BY doc_id),
         |iv AS (SELECT doc_id, COUNT(*) AS n_in FROM toks
         |  JOIN vocab USING (term) GROUP BY doc_id)
         |SELECT pd.doc_id, pd.n_tokens,
         |CAST(pd.n_tokens - COALESCE(iv.n_in, 0) AS BIGINT) AS n_oov,
         |ROUND(CAST(pd.n_tokens - COALESCE(iv.n_in, 0) AS DOUBLE)
         |  / pd.n_tokens, 6) AS oov_rate
         |FROM pd LEFT JOIN iv USING (doc_id)
         |ORDER BY pd.doc_id""".stripMargin,

    // ln() DECIMAL(18,8)-cast per point (libm-ulp absorption), exact
    // decimal moment sums (order-independent ≡ the distributed sums),
    // closed-form fit in double on the exact sums; 1-based LN(r) ≡ the
    // Spark side's ln(0-based rank + 1)
    "q191_zipf_slope" ->
      s"""WITH toks AS (SELECT UNNEST(${toksSql()}) AS term FROM documents),
         |cnt AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
         |rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS r
         |  FROM cnt QUALIFY r <= 500),
         |pts AS (SELECT CAST(LN(r) AS DECIMAL(18,8)) AS x,
         |  CAST(LN(c) AS DECIMAL(18,8)) AS y FROM rk),
         |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         |  SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM pts)
         |SELECT n AS n_terms,
         |ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
         |  / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0 AS slope,
         |ROUND((CAST(sy AS DOUBLE)
         |  - (CAST(n * sxy - sx * sy AS DOUBLE)
         |     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         |  / CAST(n AS DOUBLE), 6) + 0.0 AS intercept
         |FROM m""".stripMargin,

    // per-signal ROW_NUMBER (DESC, doc_id tiebreak) ≡ the Spark side's
    // scalable ordinal on (-signal, doc_id); the fused sum adds terms
    // in the same fixed signal order, so the doubles match bitwise
    // before the ROUND
    "q192_rank_fusion" ->
      s"""WITH s AS (SELECT doc_id, LENGTH(text)::INT AS s_chars,
         |  len(toks)::INT AS s_tokens,
         |  ROUND(len(list_distinct(toks))::DOUBLE / len(toks), 6) AS s_distinct
         |  FROM (SELECT doc_id, text, ${toksSql()} AS toks FROM documents)),
         |f AS (SELECT * FROM s WHERE s_chars IS NOT NULL
         |  AND s_tokens IS NOT NULL AND s_distinct IS NOT NULL),
         |r1 AS (SELECT doc_id, ROW_NUMBER() OVER
         |  (ORDER BY s_chars DESC, doc_id) AS rank_s_chars FROM f),
         |r2 AS (SELECT doc_id, ROW_NUMBER() OVER
         |  (ORDER BY s_tokens DESC, doc_id) AS rank_s_tokens FROM f),
         |r3 AS (SELECT doc_id, ROW_NUMBER() OVER
         |  (ORDER BY s_distinct DESC, doc_id) AS rank_s_distinct FROM f)
         |SELECT doc_id, rank_s_chars, rank_s_tokens, rank_s_distinct,
         |ROUND(1.0 / (60 + rank_s_chars) + 1.0 / (60 + rank_s_tokens)
         |  + 1.0 / (60 + rank_s_distinct), 6) AS rrf_score
         |FROM r1 JOIN r2 USING (doc_id) JOIN r3 USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // every fractional literal is ::DOUBLE (a bare 0.5 is DECIMAL in
    // DuckDB and would shift the arithmetic off Spark's double path);
    // idf DECIMAL(18,8)-cast after LN (libm-ulp absorption); the
    // score's association order mirrors the Spark expression exactly
    "q193_bm25" ->
      s"""WITH toks AS (SELECT doc_id, UNNEST(${toksSql()}) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |l AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY 1),
         |st AS (SELECT COUNT(*) AS n, SUM(len) AS total FROM l),
         |d AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |i AS (SELECT term, CAST(LN(1.0::DOUBLE +
         |  ((n - df)::DOUBLE + 0.5::DOUBLE) / (df::DOUBLE + 0.5::DOUBLE))
         |  AS DECIMAL(18,8)) AS idf FROM d CROSS JOIN st)
         |SELECT tf.doc_id, tf.term, tf.tf,
         |ROUND(CAST(i.idf AS DOUBLE) * ((tf.tf * 2.2::DOUBLE) /
         |  (tf.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE *
         |    (l.len / (CAST(st.total AS DOUBLE) / st.n))))), 6) AS bm25
         |FROM tf JOIN i USING (term) JOIN l USING (doc_id) CROSS JOIN st
         |WHERE tf.doc_id < 100 ORDER BY tf.doc_id, tf.term""".stripMargin,

    "q194_bm25_search" ->
      s"""WITH toks AS (SELECT doc_id, UNNEST(${toksSql()}) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |l AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY 1),
         |st AS (SELECT COUNT(*) AS n, SUM(len) AS total FROM l),
         |d AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |i AS (SELECT term, CAST(LN(1.0::DOUBLE +
         |  ((n - df)::DOUBLE + 0.5::DOUBLE) / (df::DOUBLE + 0.5::DOUBLE))
         |  AS DECIMAL(18,8)) AS idf FROM d CROSS JOIN st),
         |s AS (SELECT tf.doc_id,
         |  ROUND(CAST(i.idf AS DOUBLE) * ((tf.tf * 2.2::DOUBLE) /
         |    (tf.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE *
         |      (l.len / (CAST(st.total AS DOUBLE) / st.n))))), 6) AS bm25
         |  FROM tf JOIN i USING (term) JOIN l USING (doc_id) CROSS JOIN st
         |  WHERE tf.term IN ('hash', 'join', 'scan'))
         |SELECT doc_id, COUNT(*) AS n_matched,
         |ROUND(CAST(SUM(CAST(bm25 AS DECIMAL(18,8))) AS DOUBLE), 6) AS score
         |FROM s GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // c-TF-IDF: tf_c · ln(1 + A/f_t), A = avg tokens per class;
    // ROUND-6 scores + term tiebreak make the top-10 cut a total order
    "q186_class_tfidf" ->
      s"""WITH toks AS (SELECT lang, UNNEST(${toksSql()}) AS term
         |  FROM documents WHERE lang IS NOT NULL),
         |tf AS (SELECT lang, term, COUNT(*) AS tf FROM toks GROUP BY lang, term),
         |ft AS (SELECT term, COUNT(*) AS ft FROM toks GROUP BY term),
         |a AS (SELECT CAST(SUM(ct) AS DOUBLE) / COUNT(*) AS A FROM
         |  (SELECT lang, COUNT(*) AS ct FROM toks GROUP BY lang)),
         |s AS (SELECT tf.lang, tf.term, tf.tf,
         |  ROUND(tf.tf * LN(1.0 + (SELECT A FROM a) / ft.ft), 6) AS score
         |  FROM tf JOIN ft USING (term)),
         |r AS (SELECT lang, term, tf, score, ROW_NUMBER() OVER (
         |  PARTITION BY lang ORDER BY score DESC, term) AS rank FROM s)
         |SELECT lang, rank::INT AS rank, term, tf, score FROM r
         |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,

    // the exact permutation (q146's md5-key ROW_NUMBER) + the exact
    // hash draws: cand = hash32('seed:anchor:rank') mod n, bumped one
    // slot on self-collision, then joined back ordinal → id
    // boundary i+4 wherever window-hash i hits 0 mod 8; cuts =
    // [0] ++ bounds ++ [n]; chunk k = toks[cuts[k]+1 .. cuts[k+1]]
    // (1-based inclusive slices on both engines)
    "q175_cdc_chunks" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql()} AS toks
         |  FROM documents WHERE doc_id < 200),
         |t2 AS (SELECT doc_id, toks, CASE WHEN len(toks) >= 4 THEN
         |    list_transform(range(len(toks) - 3), i ->
         |      ('0x' || substr(md5(array_to_string(toks[i+1:i+4], ' ')),1,8))::BIGINT)
         |  ELSE []::BIGINT[] END AS whs FROM t WHERE len(toks) >= 1),
         |b AS (SELECT doc_id, toks,
         |  list_filter(list_transform(range(len(whs)), i ->
         |    CASE WHEN whs[(i+1)::INT] % 8 = 0 THEN i + 4 ELSE -1 END),
         |    x -> x > 0 AND x < len(toks)) AS bounds FROM t2),
         |c AS (SELECT doc_id, toks, list_concat(list_concat(
         |  [0::BIGINT], bounds), [len(toks)::BIGINT]) AS cuts FROM b),
         |kk AS (SELECT doc_id, toks, cuts,
         |  UNNEST(range(len(cuts) - 1)) AS k FROM c),
         |ch AS (SELECT doc_id, k::INT AS chunk_idx,
         |  (cuts[(k+2)::INT] - cuts[(k+1)::INT])::BIGINT AS n_tokens,
         |  array_to_string(
         |    toks[(cuts[(k+1)::INT]+1)::INT : (cuts[(k+2)::INT])::INT], ' ') AS text
         |  FROM kk)
         |SELECT doc_id, chunk_idx, n_tokens,
         |('0x' || substr(md5(text),1,8))::BIGINT AS chunk_hash, text
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    // u = (hash32 + 0.5)/2^32, g = −ln(−ln u), key = ROUND(lw + g, 6);
    // top-100 by (key DESC, id) — the rounded key makes the cut
    // engine-exact
    "q176_importance_sample" ->
      """WITH s AS (SELECT doc_id,
        |  ROUND(LN(n_chars::DOUBLE), 6) AS log_weight FROM documents),
        |k AS (SELECT doc_id, log_weight,
        |  ROUND(log_weight + -LN(-LN(
        |    ((('0x' || substr(md5(concat_ws(':', 7, doc_id)),1,8))::BIGINT + 0.5)
        |      / 4294967296.0))), 6) + 0.0 AS gumbel_key FROM s)
        |SELECT doc_id, log_weight, gumbel_key FROM k
        |ORDER BY gumbel_key DESC, doc_id LIMIT 100""".stripMargin,

    "q177_ngram_diversity" ->
      s"""WITH t AS (SELECT ${toksSql()} AS toks FROM documents),
         |g AS (
         |  SELECT 1 AS n, UNNEST(toks) AS g FROM t
         |  UNION ALL
         |  SELECT 2, UNNEST(list_transform(range(len(toks) - 1),
         |    i -> array_to_string(toks[i+1:i+2], ' ')))
         |  FROM t WHERE len(toks) >= 2
         |  UNION ALL
         |  SELECT 3, UNNEST(list_transform(range(len(toks) - 2),
         |    i -> array_to_string(toks[i+1:i+3], ' ')))
         |  FROM t WHERE len(toks) >= 3)
         |SELECT n, COUNT(*) AS total, COUNT(DISTINCT g) AS n_distinct,
         |ROUND(COUNT(DISTINCT g)::DOUBLE / COUNT(*), 6) AS distinct_ratio
         |FROM g GROUP BY n ORDER BY n""".stripMargin,

    // quantile_cont ≡ Spark exact percentile (the q152 equivalence);
    // cuts ROUND 6 on both sides, then a plain double clip
    "q178_winsorize" ->
      s"""WITH c AS (SELECT
         |  ROUND(quantile_cont(l_extendedprice, ${0.05}::DOUBLE), 6) AS lo,
         |  ROUND(quantile_cont(l_extendedprice, ${0.95}::DOUBLE), 6) AS hi
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber, l_extendedprice,
         |LEAST(GREATEST(l_extendedprice::DOUBLE, lo), hi) AS l_extendedprice_w
         |FROM lineitem CROSS JOIN c
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q174_negative_samples" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |ord AS (SELECT doc_id, ROW_NUMBER() OVER (
        |    ORDER BY md5(concat_ws(':', 7, doc_id)), doc_id) - 1 AS ord
        |  FROM ids),
        |n AS (SELECT COUNT(*) AS n FROM ids),
        |a AS (SELECT o.doc_id AS anchor_id, o.ord, j.j,
        |  ('0x' || substr(md5(concat_ws(':', 7, o.doc_id, j.j)),1,8))::BIGINT
        |    % (SELECT n FROM n) AS cand
        |  FROM ord o CROSS JOIN (SELECT UNNEST(range(3)) AS j) j),
        |p AS (SELECT anchor_id, j,
        |  CASE WHEN cand = ord THEN (cand + 1) % (SELECT n FROM n)
        |  ELSE cand END AS pord FROM a)
        |SELECT p.anchor_id, p.j::INT AS neg_rank, o2.doc_id AS neg_id
        |FROM p JOIN ord o2 ON p.pord = o2.ord
        |ORDER BY anchor_id, neg_rank""".stripMargin,

    // stupid backoff with the α / α² literals PRINTED FROM SCALA (the
    // q172 convention — 0.4·0.4 is 0.16000000000000002 in both engines
    // only when both parse the same printed double); trigram-seen ⇒
    // its prefix bigram is seen, so ct/cb never divides by NULL;
    // unseen unigram takes the 0.5 floor; −ln DECIMAL(18,8), mean 4dp
    "q202_backoff_nll" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql()} AS toks FROM documents),
         |tr AS (SELECT * FROM t WHERE doc_id % 2 = 0),
         |sc AS (SELECT * FROM t WHERE doc_id % 2 = 1),
         |u AS (SELECT UNNEST(toks) AS w FROM tr),
         |uni AS (SELECT w, COUNT(*) AS c FROM u GROUP BY w),
         |n AS (SELECT COUNT(*) AS n FROM u),
         |bi AS (SELECT toks[(i+1)::INT] AS w1, toks[(i+2)::INT] AS w2
         |  FROM (SELECT UNNEST(range(len(toks) - 1)) AS i, toks
         |        FROM tr WHERE len(toks) >= 2)),
         |bic AS (SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY w1, w2),
         |tri AS (SELECT toks[(i+1)::INT] AS w1, toks[(i+2)::INT] AS w2,
         |  toks[(i+3)::INT] AS w3
         |  FROM (SELECT UNNEST(range(len(toks) - 2)) AS i, toks
         |        FROM tr WHERE len(toks) >= 3)),
         |tric AS (SELECT w1, w2, w3, COUNT(*) AS ct FROM tri GROUP BY 1, 2, 3),
         |g AS (SELECT doc_id, toks[(i+1)::INT] AS w1, toks[(i+2)::INT] AS w2,
         |  toks[(i+3)::INT] AS w3
         |  FROM (SELECT doc_id, UNNEST(range(len(toks) - 2)) AS i, toks
         |        FROM sc WHERE len(toks) >= 3)),
         |s AS (SELECT g.doc_id, CAST(-LN(
         |  CASE WHEN tc.ct IS NOT NULL THEN tc.ct::DOUBLE / bc.cb
         |  WHEN b23.cb IS NOT NULL THEN $sbAlpha::DOUBLE * b23.cb::DOUBLE / u2.c
         |  ELSE ${sbAlpha * sbAlpha}::DOUBLE * COALESCE(u3.c::DOUBLE, 0.5)
         |    / (SELECT n FROM n) END) AS DECIMAL(18,8)) AS nll
         |  FROM g
         |  LEFT JOIN tric tc ON g.w1 = tc.w1 AND g.w2 = tc.w2 AND g.w3 = tc.w3
         |  LEFT JOIN bic bc ON g.w1 = bc.w1 AND g.w2 = bc.w2
         |  LEFT JOIN bic b23 ON g.w2 = b23.w1 AND g.w3 = b23.w2
         |  LEFT JOIN uni u2 ON g.w2 = u2.w
         |  LEFT JOIN uni u3 ON g.w3 = u3.w)
         |SELECT doc_id, COUNT(*) AS n_trigrams,
         |ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 4) AS avg_nll
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same md5-prefix row hash (unit-separator joined, chr(0) NULL
    // sentinel), xor/sum/min/max all order-independent
    "q204_fingerprint_ds" ->
      """SELECT COUNT(*) AS n_rows, BIT_XOR(h) AS xor_sig,
        |CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS sum_sig,
        |MIN(h) AS min_sig, MAX(h) AS max_sig
        |FROM (SELECT ('0x' || substr(md5(concat_ws(chr(31),
        |  COALESCE(l_orderkey::VARCHAR, chr(0)),
        |  COALESCE(l_linenumber::VARCHAR, chr(0)),
        |  COALESCE(l_returnflag::VARCHAR, chr(0)))), 1, 15))::BIGINT AS h
        |FROM lineitem)""".stripMargin,

    // quantile_cont ≡ Spark exact percentile (q152/q178 equivalence);
    // med/MAD ROUND 6, modified z ROUND 6, MAD=0 ⇒ NULL z / false flag
    "q206_robust_outliers" ->
      """WITH m AS (SELECT ROUND(quantile_cont(o_totalprice, 0.5::DOUBLE), 6)
        |  AS med FROM orders),
        |a AS (SELECT ROUND(quantile_cont(ABS(o_totalprice::DOUBLE - med),
        |  0.5::DOUBLE), 6) AS mad FROM orders CROSS JOIN m),
        |z AS (SELECT o_orderkey, o_totalprice,
        |  CASE WHEN mad > 0 THEN
        |    ROUND(0.6745::DOUBLE * (o_totalprice::DOUBLE - med) / mad, 6)
        |    + 0.0 END AS robust_z FROM orders CROSS JOIN m CROSS JOIN a)
        |SELECT o_orderkey, o_totalprice, robust_z,
        |COALESCE(ABS(robust_z) > 2.0::DOUBLE, FALSE) AS is_outlier
        |FROM z ORDER BY o_orderkey""".stripMargin,

    // the oracle rescans everything the merged state never touched
    "q210_incremental_agg" ->
      """SELECT l_returnflag,
        |CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DECIMAL(38,6))
        |  AS DOUBLE) AS l_quantity_sum,
        |COUNT(l_quantity) AS l_quantity_count,
        |MAX(l_extendedprice) AS l_extendedprice_max
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // quantile_cont cuts ROUND 6 (q152/q178 equivalence), bucket =
    // #cuts strictly below (the q173 convention)
    "q211_equidepth_hist" ->
      s"""WITH c AS (SELECT ${(1 until 8).map(k =>
            s"ROUND(quantile_cont(o_totalprice, ${k / 8.0}::DOUBLE), 6) AS c$k")
            .mkString(", ")} FROM orders),
         |b AS (SELECT ${(1 until 8).map(k =>
            s"(CASE WHEN o_totalprice::DOUBLE > c$k THEN 1 ELSE 0 END)")
            .mkString(" + ")} AS bucket,
         |  o_totalprice::DOUBLE AS v
         |  FROM orders CROSS JOIN c WHERE o_totalprice IS NOT NULL)
         |SELECT bucket, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // the exact prefix-scan: L_k = (B − prefix_{k−1})/(n−k+1), first k
    // with L_k ≤ avail_k sets the level; NULL level = budget not
    // binding (the padded-row trick mirrors the operator)
    "q213_budget_fill" ->
      s"""WITH a AS (SELECT source,
         |  CAST(SUM(len(${toksSql()})) AS DOUBLE) AS available
         |  FROM documents GROUP BY source),
         |o AS (SELECT source, available,
         |  ROW_NUMBER() OVER (ORDER BY available, source) AS rn,
         |  SUM(available) OVER (ORDER BY available, source
         |    ROWS UNBOUNDED PRECEDING) AS cum,
         |  COUNT(*) OVER () AS n FROM a),
         |c AS (SELECT source, available, rn,
         |  ($wfBudget::DOUBLE - (cum - available)) / (n - rn + 1) AS cand
         |  FROM o),
         |lvl AS (SELECT cand AS level FROM c WHERE cand <= available
         |  ORDER BY rn LIMIT 1),
         |l2 AS (SELECT level FROM
         |  (SELECT level FROM lvl UNION ALL SELECT NULL)
         |  ORDER BY level ASC NULLS LAST LIMIT 1)
         |SELECT a.source, a.available,
         |ROUND(CASE WHEN l2.level IS NOT NULL AND a.available > l2.level
         |  THEN l2.level ELSE a.available END, 4) AS alloc,
         |(l2.level IS NOT NULL AND a.available > l2.level) AS capped
         |FROM a CROSS JOIN l2 ORDER BY a.source""".stripMargin)
}
