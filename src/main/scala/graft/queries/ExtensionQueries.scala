package graft.queries

import graft.api.Df
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Layout, Similarity}
import org.apache.spark.sql.functions._
import QueryUtil._

/** LLM-training-data pipeline suite (north star extensions, beyond the
  * reference's surface): deduplication (exact / MinHash-LSH / SimHash /
  * n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  * multimodal metadata plumbing. q60–q70.
  *
  * The source tables have no duplicates, so dedup queries first build a
  * corpus = documents ∪ deterministic mutated copies — the same
  * construction appears in the DuckDB oracle, so candidate generation
  * and verification are compared end-to-end, not just on toy input.
  *
  * Several oracles are program-generated SQL replicas of the full
  * pipeline (MinHash signatures, SimHash bit sums) — the strongest
  * correctness check available for non-relational operators.
  */
object ExtensionQueries {

  /** documents plus near-duplicate copies (id+10000, one appended token) */
  private def mutatedCorpus(s: org.apache.spark.sql.SparkSession, dir: String): Df = {
    val d = T(s, dir, "documents").select("doc_id", "text")
    val mut = d.where(col("doc_id") % 10 === 0)
      .selectExpr("doc_id + 10000 AS doc_id", "text || ' zzz' AS text")
    Df.concat(Seq(d, mut))
  }
  private val corpusSql =
    """(SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' zzz' AS text
      |FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  val defs: Map[String, Q] = Map(
    // ---- exact dedup by canonical fingerprint ----
    "q60_dedup_exact" -> ((s, dir) => {
      val d = T(s, dir, "documents").select("doc_id", "text")
      val copies = d.where(col("doc_id") % 7 === 0)
        .selectExpr("doc_id + 10000 AS doc_id", "text")
      Dedup.exactByFingerprint(Df.concat(Seq(d, copies)), "text", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- incremental dedup: new batch vs existing corpus, two-sided
    // bloom semi-join reduction; result ≡ the exact anti-join ----
    "q141_bloom_dedup" -> ((s, dir) => {
      val d = T(s, dir, "documents").select("doc_id", "text")
      val corpus = d.where(col("doc_id") % 10 < 7)
      val fresh = Df.concat(Seq(
        d.where(col("doc_id") % 10 >= 7),
        corpus.where(col("doc_id") % 5 === 0)
          .selectExpr("doc_id + 20000 AS doc_id", "text")))
      // sketch sized to the corpus (~tens of KB), not the 100 TB
      // default — the operator scaladoc's sizing rule
      Dedup.bloomDedupNew(fresh, corpus, "text", "doc_id",
        expectedCorpusItems = 1L << 16)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- z-order (Morton) clustering key over two order dimensions ----
    "q142_zorder_key" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      Layout.withZValue(o, Seq("o_totalprice", "o_custkey"), bits = 8)
        .select("o_orderkey", "zval").sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- Hilbert clustering key over the same two order dimensions
    // as q142 — every unrolled rotate/reflect step SQL-replayed ----
    "q212_hilbert_key" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      Layout.withHilbertValue(o, Seq("o_totalprice", "o_custkey"), bits = 8)
        .select("o_orderkey", "hval").sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- per-document text statistics + quality score ----
    "q61_text_stats" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      d.where(d("doc_id") < 100)
        .assign("n_tokens", tokenCount(col("text")))
        .assign("n_chars", charCount(col("text")))
        .assign("avg_token_len", round(avgTokenLen(col("text")), 6))
        .assign("stop_ratio", round(stopwordRatio(col("text"), Seq("the", "a")), 6))
        .assign("quality", qualityScore(col("text")))
        .select("doc_id", "n_tokens", "n_chars", "avg_token_len", "stop_ratio", "quality")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- heuristic language ID (marker words) vs corpus truth ----
    "q62_langid" -> ((s, dir) => {
      T(s, dir, "documents")
        .assign("lang_pred", langId(col("text")))
        .groupby("lang_pred").size()
        .sortValues(Seq("lang_pred")).sdf
    }),

    // ---- BPE-ish token counting + rolling-hash fingerprint (order-
    // sensitive Rabin-Karp over the token stream) ----
    "q89_token_fingerprint" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      d.where(d("doc_id") < 200)
        .assign("n_bpe", bpeTokenCount(col("text")))
        .assign("rfp", rollingFingerprint(col("text")))
        .select("doc_id", "n_bpe", "rfp")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- fingerprint cardinality (dup detection summary) ----
    "q63_fingerprint" -> ((s, dir) => {
      T(s, dir, "documents")
        .assign("fp", fingerprint(col("text")))
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("fp")).as("n_fingerprints")).sdf
    }),

    // ---- MinHash-LSH near-dup pairs, exact-jaccard verified ----
    "q64_minhash_pairs" -> ((s, dir) => {
      Dedup.minhashPairs(mutatedCorpus(s, dir), "text", "doc_id",
        shingleN = 3, bands = 3, r = 4, minJaccard = 0.5)
        .sortValues(Seq("id_a", "id_b")).sdf
    }),

    // ---- LSH recall audit: a 21-copy family whose buckets overflow
    // the cap (pairs lost) plus 4-copy families inside it (pairs kept)
    // make recall land strictly informative; the md5 doc-id sample is
    // deterministic so the oracle replays the EXACT subset ----
    "q140_lsh_recall_audit" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val base = d.where(col("doc_id") < 60).sdf.select(col("doc_id"), col("text"))
      val famBig = d.where(col("doc_id") < 6).sdf
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(19))).as("v"))
        .select((lit(1000) + col("doc_id") * 100 + col("v")).as("doc_id"), col("text"))
      val famMed = d.where(col("doc_id") >= 6 && col("doc_id") < 12).sdf
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(2))).as("v"))
        .select((lit(2000) + col("doc_id") * 100 + col("v")).as("doc_id"), col("text"))
      Dedup.lshRecallAudit(new Df(base.union(famBig).union(famMed)),
        "text", "doc_id", sampleFraction = 0.6, maxBucket = 8).sdf
    }),

    // ---- SimHash signatures (60-bit, portable bit sums) ----
    "q65_simhash" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Dedup.simhash(d.where(d("doc_id") < 200), "text", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- SimHash near-dup pairs: pigeonhole bands guarantee recall up
    // to maxHamming (subject to the documented bucket cap); the oracle
    // replays signatures, banding, cap, and Hamming verify in full ----
    "q99_simhash_pairs" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val base = d.where(col("doc_id") < 200).select("doc_id", "text")
      val mut = base.where(col("doc_id") % 10 === 0)
        .selectExpr("doc_id + 10000 AS doc_id", "text || ' zzz' AS text")
      Dedup.simhashPairs(Df.concat(Seq(base, mut)), "text", "doc_id",
        maxHamming = 6)
        .sortValues(Seq("id_a", "id_b")).sdf
    }),

    // ---- exact n-gram Jaccard pairs via inverted index ----
    "q66_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(mutatedCorpus(s, dir), "text", "doc_id",
        n = 3, minJaccard = 0.5)
        .sortValues(Seq("id_a", "id_b")).sdf
    }),

    // ---- TF-IDF term weighting (smoothed idf, sklearn convention):
    // tf shuffle + vocabulary-sized df join + broadcast N scalar ----
    "q104_tfidf" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      graft.operators.TextAnalytics.tfidf(
        d.where(col("doc_id") < 100), "text", "doc_id")
        .sortValues(Seq("doc_id", "term")).sdf
    }),

    // ---- top-k TF-IDF terms per doc (keyword extraction): rank-per-key
    // window over the rounded weights, lexical tie-break ----
    "q108_top_terms" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      graft.operators.TextAnalytics.topTerms(
        d.where(col("doc_id") < 100), "text", "doc_id", k = 3)
        .sortValues(Seq("doc_id", "rank")).sdf
    }),

    // ---- token-window chunking (context-length splitting with
    // overlap): size 20, overlap 5 → stride 15; exact SQL replay ----
    "q112_chunk_tokens" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      graft.operators.TextAnalytics.chunkTokens(
        d.where(col("doc_id") < 100), "text", "doc_id", size = 20, overlap = 5)
        .sortValues(Seq("doc_id", "chunk_id")).sdf
    }),

    // ---- per-group exact-n sampling (pandas groupby.sample): the draw
    // is engine-RNG, the COUNT contract is exact — every group yields
    // LEAST(n, group size) rows, all present in an independently-
    // scanned copy of the source (a same-lineage anti-join would be
    // vacuous) ----
    "q109_group_sample" -> ((s, dir) => {
      val o = T(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      val samp = o.groupby("o_orderpriority").sampleN(40, seed = 11L)
      val src = o.sdf.groupBy("o_orderpriority").agg(count(lit(1)).as("n_src"))
      val got = samp.sdf.groupBy("o_orderpriority").agg(count(lit(1)).as("n_samp"))
      val freshScan = T(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      val outside = samp.sdf
        .join(freshScan.sdf, Seq("o_orderkey", "o_orderpriority"), "left_anti")
        .agg(count(lit(1)).as("n_outside"))
      src.join(got, Seq("o_orderpriority"), "left")
        .withColumn("ok",
          coalesce(col("n_samp"), lit(0L)) === least(lit(40L), col("n_src")))
        .agg(count(lit(1)).as("n_groups"),
          (min(col("ok").cast("int")) === 1).as("counts_exact"))
        .crossJoin(outside)
    }),

    // ---- per-label mean embedding (mean-pool centroids), long format;
    // decimal-summed so the nondeterministic partial-agg order can't
    // move a bit — replayed exactly in SQL ----
    "q110_mean_pool" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      graft.operators.Similarity.meanPool(e, "embedding", "label")
        .sortValues(Seq("label", "pos")).sdf
    }),

    // ---- L2 normalization (unit vectors), long format; ascending-fold
    // norm replayed bit-for-bit like every cosine oracle ----
    "q111_l2_normalize" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      e.where(e("vec_id") < 20).sdf
        .select(col("vec_id"),
          posexplode(graft.functions.VectorFunctions.l2Normalize(col("embedding")))
            .as(Seq("pos", "v")))
        .select(col("vec_id"), col("pos"), round(col("v"), 6).as("v"))
        .orderBy("vec_id", "pos")
    }),

    // ---- stratified sampling: per-stratum fractions; RNGs differ
    // across engines, so the oracle checks DERIVED INVARIANTS — only
    // requested strata appear, and every stratum's size sits inside
    // exact 6σ Bernoulli bounds from the replayed source counts ----
    "q105_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      val o = T(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      val fr = Map[Any, Double]("1-URGENT" -> 0.2, "2-HIGH" -> 0.1, "3-MEDIUM" -> 0.05)
      val samp = o.sampleBy("o_orderpriority", fr, seed = 7L)
      val frDf = fr.toSeq.map { case (k, v) => (k.toString, v) }
        .toDF("o_orderpriority", "f")
      val src = o.sdf.groupBy("o_orderpriority").agg(count(lit(1)).as("n_src"))
      val got = samp.sdf.groupBy("o_orderpriority").agg(count(lit(1)).as("n_samp"))
      val sd = sqrt(col("n_src") * col("f") * (lit(1.0) - col("f")))
      val joined = src.join(frDf, Seq("o_orderpriority"))
        .join(got, Seq("o_orderpriority"), "left")
        .withColumn("n_s", coalesce(col("n_samp"), lit(0L)))
        .withColumn("ok",
          col("n_s") >= col("n_src") * col("f") - lit(6.0) * sd &&
            col("n_s") <= col("n_src") * col("f") + lit(6.0) * sd)
      val unexpected = got.join(frDf, Seq("o_orderpriority"), "left_anti")
        .agg(count(lit(1)).as("n_unexpected"))
      joined.agg(count(lit(1)).as("n_strata"),
          (min(col("ok").cast("int")) === 1).as("all_within_bounds"))
        .crossJoin(unexpected)
    }),

    // ---- approximate quantile sketch (percentile_approx, mergeable
    // single-pass — the 100 TB path); invariant oracle: the sketch
    // value must land between the exact 48th and 52nd percentiles
    // (rank error ≤ n/accuracy = n/1000 ≪ 2% of n), with the exact
    // median itself replayed ----
    "q106_quantile_sketch" -> ((s, dir) => {
      T(s, dir, "lineitem").sdf
        .select(col("l_quantity").cast("double").as("q"))
        .agg(
          percentile_approx(col("q"), lit(0.5), lit(1000)).as("approx"),
          expr("percentile(q, 0.5)").as("exact_raw"),
          expr("percentile(q, 0.48)").as("lo"),
          expr("percentile(q, 0.52)").as("hi"))
        .select(round(col("exact_raw"), 4).as("exact_median"),
          (col("approx") >= col("lo") && col("approx") <= col("hi"))
            .as("within_rank_bound"))
    }),

    // ---- near-dup connected components: exact ngram-Jaccard pairs
    // over a THREE-generation mutated corpus (base ↔ +zzz ↔ +zzz yyy —
    // real multi-node components), min-label propagation to fixpoint;
    // oracle = recursive-CTE transitive closure over the same edges ----
    "q107_dedup_components" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val base = d.where(col("doc_id") < 300).select("doc_id", "text")
      val g1 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 10000 AS doc_id", "text || ' zzz' AS text")
      val g2 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 20000 AS doc_id", "text || ' zzz yyy' AS text")
      val pairs = Dedup.ngramJaccardPairs(Df.concat(Seq(base, g1, g2)),
        "text", "doc_id", n = 3, minJaccard = 0.5)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .sortValues(Seq("id")).sdf
    }),

    // ---- q107 FORCED through the above-gate shuffle rounds
    // (broadcastMaxNodes = 0): keeps the corpus-scale CC join path —
    // the one a 100 TB run takes — oracle-checked per round rather
    // than only spec/fuzz-pinned; labels must equal q107's by the
    // gate-equivalence contract, so the oracle is the same closure ----
    "q269_components_shuffle" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val base = d.where(col("doc_id") < 300).select("doc_id", "text")
      val g1 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 10000 AS doc_id", "text || ' zzz' AS text")
      val g2 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 20000 AS doc_id", "text || ' zzz yyy' AS text")
      val pairs = Dedup.ngramJaccardPairs(Df.concat(Seq(base, g1, g2)),
        "text", "doc_id", n = 3, minJaccard = 0.5)
      Dedup.connectedComponents(pairs, "id_a", "id_b",
        broadcastMaxNodes = 0L)
        .sortValues(Seq("id")).sdf
    }),

    // ---- bpeMerges FORCED through the distributed rounds
    // (driverMaxVocab = 0): the above-gate count-argmax-merge path
    // stays oracle-checked per round; merges must equal q200's by the
    // driver≡distributed differential, so the oracle is the same
    // 8-round SQL replay ----
    "q271_bpe_merges_dist" -> ((s, dir) => {
      graft.operators.TextAnalytics.bpeMerges(
        T(s, dir, "documents"), "text", nMerges = 8, driverMaxVocab = 0L)
        .sortValues(Seq("merge_rank")).sdf
    }),

    // ---- incremental component maintenance (the batch-dedup path):
    // phase 1 labels the two-generation corpus; phase 2 folds in ONLY
    // the pairs the third generation brings (labels-as-star-edges merge,
    // never re-deriving the old pair graph). The oracle is the ONE-SHOT
    // recursive closure over the full three-generation edge set — the
    // exactness claim IS that the two-phase result equals it ----
    "q263_incremental_cc" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val base = d.where(col("doc_id") < 300).select("doc_id", "text")
      val g1 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 10000 AS doc_id", "text || ' zzz' AS text")
      val g2 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 20000 AS doc_id", "text || ' zzz yyy' AS text")
      val oldPairs = Dedup.ngramJaccardPairs(Df.concat(Seq(base, g1)),
        "text", "doc_id", n = 3, minJaccard = 0.5)
      val oldLabels = Dedup.connectedComponents(oldPairs, "id_a", "id_b")
      // the batch's pair delta: everything that touches generation 2
      // (pairwise jaccard is corpus-independent, so old-old pairs are
      // untouched by the batch and excluded — that is the saving)
      val newPairs = Dedup.ngramJaccardPairs(Df.concat(Seq(base, g1, g2)),
        "text", "doc_id", n = 3, minJaccard = 0.5)
        .where(col("id_a") >= 20000 || col("id_b") >= 20000)
      Dedup.incrementalComponents(oldLabels, newPairs)
        .sortValues(Seq("id")).sdf
    }),

    // ---- quality-ranked dedup representatives over the q107 cluster
    // corpus: score = token count, so the ' zzz yyy' variants outrank
    // their originals — each cluster's keeper is the argmax(score, id),
    // singletons keep themselves ----
    "q149_dedup_rep_by_quality" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val base = d.where(col("doc_id") < 300).select("doc_id", "text")
      val g1 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 10000 AS doc_id", "text || ' zzz' AS text")
      val g2 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 20000 AS doc_id", "text || ' zzz yyy' AS text")
      val corpus = Df.concat(Seq(base, g1, g2))
        .assign("score", size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
        n = 3, minJaccard = 0.5)
      Dedup.keepRepresentativesBy(corpus, pairs, "doc_id", "score")
        .select("doc_id", "score", "representative")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- cross-corpus MinHash join (incremental dedup: new batch vs
    // existing corpus, A×B never A×A); both band indexes replayed ----
    "q113_minhash_join" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val corpus = d.where(col("doc_id") < 200).select("doc_id", "text")
      val batch = corpus.where(col("doc_id") % 10 === 0)
        .selectExpr("doc_id + 10000 AS doc_id", "text || ' zzz' AS text")
      Dedup.minhashJoin(corpus, batch, "text", "doc_id", minJaccard = 0.5)
        .sortValues(Seq("id_a", "id_b")).sdf
    }),

    // ---- benchmark contamination sweep (shared word n-grams between
    // the corpus and a held-out benchmark set) ----
    "q114_contamination" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val bench = d.where(col("doc_id") % 50 === 0).select("doc_id", "text")
      graft.operators.TextAnalytics.ngramContamination(d, bench, "text", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- decontamination REMOVAL: drop docs whose contaminated-ngram
    // fraction exceeds 10%; the survivors carry the audit fraction ----
    "q154_decontaminate" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val bench = d.where(col("doc_id") % 50 === 0).select("doc_id", "text")
      graft.operators.TextAnalytics.decontaminate(d, bench, "text", "doc_id",
        n = 3, maxFraction = 0.1)
        .select("doc_id", "contaminated_fraction")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- unigram LM negative log-likelihood (CCNet-style quality
    // signal; corpus as its own model); decimal-summed ln terms so the
    // per-doc sum is order-independent ----
    "q115_unigram_nll" -> ((s, dir) => {
      graft.operators.TextAnalytics.unigramLogLoss(
        T(s, dir, "documents"), "text", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- CCNet perplexity buckets: per-lang head/middle/tail at the
    // exact NLL terciles; NULL-lang docs get a NULL bucket ----
    "q152_perplexity_buckets" -> ((s, dir) => {
      graft.operators.TextAnalytics.perplexityBuckets(
        T(s, dir, "documents"), "text", "doc_id", "lang")
        .select("doc_id", "lang", "avg_nll", "bucket")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- embedding near-dup for UNLABELED corpora: LSH-signature
    // blocks + in-block cosine; every bucket bit replayed in SQL ----
    "q117_embedding_lsh_dedup" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val copies = e.where(col("vec_id") % 20 === 0)
        .selectExpr("vec_id + 10000 AS vec_id",
          "transform(embedding, x -> x * cast(0.5 as float)) AS embedding")
      val corpus = Df.concat(Seq(e.select("vec_id", "embedding"), copies))
      Dedup.embeddingLshPairs(corpus, "embedding", "vec_id",
        minCosine = 0.99, planes = 8, dim = 64)
        .sortValues(Seq("id_a", "id_b")).sdf
    }),

    // ---- incremental semantic dedup: a new batch (half-scaled copies
    // that must collide + negated vectors that must not) joined against
    // the full corpus on hyperplane-LSH buckets, cosine-gated ----
    "q155_embedding_join" -> ((s, dir) => {
      val e = T(s, dir, "embeddings").select("vec_id", "embedding")
      val batch = Df.concat(Seq(
        e.where(col("vec_id") % 20 === 0)
          .selectExpr("vec_id + 10000 AS vec_id",
            "transform(embedding, x -> x * cast(0.5 as float)) AS embedding"),
        e.where(col("vec_id") % 20 === 7)
          .selectExpr("vec_id + 20000 AS vec_id",
            "transform(embedding, x -> -x) AS embedding")))
      Dedup.embeddingJoin(e, batch, "embedding", "vec_id", minCosine = 0.99)
        .sortValues(Seq("id_a", "id_b")).sdf
    }),

    // ---- leakage-free split over the q107 cluster corpus: each
    // near-dup component hashes ONE md5 split key (its min-id label),
    // so a cluster lands whole on one side; singletons key on their
    // own id ----
    "q156_cluster_safe_split" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val base = d.where(col("doc_id") < 300).select("doc_id", "text")
      val g1 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 10000 AS doc_id", "text || ' zzz' AS text")
      val g2 = base.where(col("doc_id") % 5 === 0)
        .selectExpr("doc_id + 20000 AS doc_id", "text || ' zzz yyy' AS text")
      val corpus = Df.concat(Seq(base, g1, g2))
      val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
        n = 3, minJaccard = 0.5)
      Dedup.clusterSafeSplit(corpus, pairs, "doc_id", fraction = 0.1,
        matchLabel = "holdout", restLabel = "train")
        .select("doc_id", "split_key", "split")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- BPE merge statistics: adjacent char-pair counts weighted by
    // word frequency over distinct words (the tokenizer-training
    // step); top-50 by (count desc, pair) — a total order ----
    "q157_bpe_pair_counts" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      graft.operators.TextAnalytics.bpePairCounts(
        d.where(col("doc_id") < 200), "text", "doc_id", k = 50).sdf
    }),

    // ---- MERGE-style upsert: every 10th order gets a price bump
    // (update), every 7th re-keys past the id space (insert), the rest
    // pass through ----
    "q167_upsert" -> ((s, dir) => {
      val o = T(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val updates = Df.concat(Seq(
        o.where(col("o_orderkey") % 10 === 0)
          .selectExpr("o_orderkey", "o_totalprice + 1.0 AS o_totalprice"),
        o.where(col("o_orderkey") % 7 === 0)
          .selectExpr("o_orderkey + 10000000 AS o_orderkey", "o_totalprice")))
      o.upsert(updates, Seq("o_orderkey"))
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- per-column profile of documents: one aggregation pass,
    // exact distincts, long format ----
    "q165_profile" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      graft.operators.Profiling.profile(d)
        .rename(Map("column" -> "col_name"))
        .sortValues(Seq("col_name")).sdf
    }),

    // ---- key-skew diagnostics for a prospective join key ----
    "q166_skew_stats" -> ((s, dir) => {
      graft.operators.Profiling.skewStats(T(s, dir, "lineitem"), "l_orderkey")
        .sdf
    }),

    // ---- int8 symmetric quantization of the embedding corpus, long
    // format: scale = max|v|/127, q = round(v/scale) — max component
    // hits ±127 exactly, every step IEEE-replayable ----
    "q161_quantize_int8" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      graft.operators.Similarity.quantizeInt8(e, "embedding", "vec_id")
        .sortValues(Seq("vec_id", "pos")).sdf
    }),

    // ---- quantized ANN: top-3 neighbors for 5 probe vectors by
    // reconstructed int8 inner product (exact integer dot × scales) ----
    "q162_int8_topk" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      graft.operators.Similarity.int8TopK(
        e.where(col("vec_id") < 5), e, "embedding", "vec_id", k = 3)
        .sortValues(Seq("query_id", "rank")).sdf
    }),

    // ---- deterministic Lloyd k-means over the embedding corpus:
    // lowest-id init, 6dp-rounded argmin with index tie-break, decimal
    // centroid means — every step exact-replayable in SQL ----
    "q158_kmeans" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      graft.operators.Similarity.kMeans(e, "embedding", "vec_id",
        k = 4, iters = 2)
        .sortValues(Seq("vec_id")).sdf
    }),

    // ---- full BPE merge learning: 8 rounds of count-argmax-merge
    // over the distinct-word vocabulary; output = the merges.txt
    // table, every round SQL-replayed in the oracle ----
    "q200_bpe_merges" -> ((s, dir) => {
      graft.operators.TextAnalytics.bpeMerges(
        T(s, dir, "documents"), "text", nMerges = 8)
        .sortValues(Seq("merge_rank")).sdf
    }),

    // ---- BPE encoding with the 8 learned merges: per-doc token
    // accounting; the oracle re-learns the same merges AND re-applies
    // every replace per word ----
    "q208_bpe_encode" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val merges = graft.operators.TextAnalytics
        .bpeMerges(d, "text", nMerges = 8)
        .sdf.orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
      graft.api.Df.releaseRetained()
      graft.operators.TextAnalytics.bpeEncode(d, "text", "doc_id", merges)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- leakage-free temporal split: last 20% of distinct event
    // days = holdout; per-split day ranges in the output PROVE the
    // no-overlap property (holdout first_day > train last_day) ----
    "q199_time_split" -> ((s, dir) => {
      graft.operators.Curation.timeSplit(events(s, dir), "ts",
        holdoutFrac = 0.2)
        .groupby("split")
        .agg(count(lit(1)).as("n"),
          sum(col("event_id")).cast("long").as("id_sum"),
          min(date_trunc("DAY", col("ts"))).as("first_day"),
          max(date_trunc("DAY", col("ts"))).as("last_day"))
        .sortValues(Seq("split")).sdf
    }),

    // ---- exact heavy hitters over a high-cardinality key, CMS
    // prefilter + exact verify: result identical to GROUP BY/HAVING
    // (CMS only over-estimates), shuffle sees candidates only ----
    "q197_heavy_hitters" -> ((s, dir) => {
      graft.operators.Profiling.heavyHitters(
        T(s, dir, "events"), "user_id", minCount = 75)
        .sortValues(Seq("user_id")).sdf
    }),

    // ---- product quantization encode: per-subspace deterministic
    // Lloyd codebooks (m=2 subspaces × 4 codes, the kMeans rules), long
    // format (vec_id, subspace, code) — every step SQL-replayable ----
    "q195_pq_encode" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      graft.operators.Similarity.pqEncode(e, "embedding", "vec_id",
        m = 2, codes = 4, iters = 2)
        .sortValues(Seq("vec_id", "subspace")).sdf
    }),

    // ---- PQ asymmetric-distance top-3 for 5 probe vectors: per-query
    // m×codes distance tables, approx d2 = sum of table lookups over
    // the corpus codes, rank ascending with id tie-break ----
    "q196_pq_topk" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      graft.operators.Similarity.pqTopK(
        e.where(col("vec_id") < 5), e, "embedding", "vec_id",
        k = 3, m = 2, codes = 4, iters = 2)
        .sortValues(Seq("query_id", "rank")).sdf
    }),

    // ---- semantic dedup endgame over the q117 corpus: half-scaled
    // copies collide with their originals (sign bits are scale-
    // invariant); score = first embedding component, so the keeper per
    // cluster is the argmax(e[0], id) — every step SQL-replayed ----
    "q153_semantic_dedup" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val copies = e.where(col("vec_id") % 20 === 0)
        .selectExpr("vec_id + 10000 AS vec_id",
          "transform(embedding, x -> x * cast(0.5 as float)) AS embedding")
      val corpus = Df.concat(Seq(e.select("vec_id", "embedding"), copies))
        .assign("score",
          round(element_at(col("embedding"), 1).cast("double"), 6))
      Dedup.semanticDedup(corpus, "embedding", "vec_id", "score",
        minCosine = 0.99, planes = 8, dim = 64)
        .select("vec_id", "score")
        .sortValues(Seq("vec_id")).sdf
    }),

    // ---- deterministic hash split (train/holdout): md5-bucketed, so
    // the EXACT assignment replays in DuckDB — counts AND key checksums ----
    "q118_hash_split" -> ((s, dir) => {
      T(s, dir, "orders")
        .splitByHash("o_orderkey", 0.1, matchLabel = "val", restLabel = "train")
        .groupby("split")
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).cast("long").as("key_sum"))
        .sortValues(Seq("split")).sdf
    }),

    // ---- Gopher-style n-gram repetition stats (boilerplate signal) ----
    "q116_repetition" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      graft.operators.TextAnalytics.repetitionStats(
        d.where(col("doc_id") < 200), "text", "doc_id", n = 2)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- embedding-cosine near-dup pairs (bucketed by label) ----
    "q67_embedding_dedup" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val copies = e.where(col("vec_id") % 20 === 0)
        .selectExpr("vec_id + 10000 AS vec_id",
          "transform(embedding, x -> x * cast(0.5 as float)) AS embedding", "label")
      val corpus = Df.concat(Seq(e.select("vec_id", "embedding", "label"), copies))
      Dedup.embeddingCosinePairs(corpus, "embedding", "vec_id", "label", 0.99)
        .sortValues(Seq("id_a", "id_b")).sdf
    }),

    // ---- brute-force cosine top-k (ANN correctness baseline) ----
    "q68_similarity_topk" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val q = e.where(e("vec_id") < 5)
      Similarity.bruteForceTopK(q, e, "embedding", "vec_id", k = 3)
        .sortValues(Seq("query_id", "rank")).sdf
    }),

    // ---- LSH ANN top-k: random-hyperplane buckets + exact rerank.
    // Deterministic hash-derived planes make a full SQL replica
    // possible — the oracle recomputes every signature bit. ----
    "q87_lsh_topk" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val q = e.where(e("vec_id") < 5)
      Similarity.lshTopK(q, e, "embedding", "vec_id", k = 3,
        planes = 8, dim = 64)
        .sortValues(Seq("query_id", "rank")).sdf
    }),

    // ---- multimodal: opaque binary payload + typed metadata ----
    "q69_multimodal_meta" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      d.where(d("doc_id") < 100)
        .assign("payload", col("text").cast("binary"))
        .assign("n_bytes", length(col("payload")))
        .assign("digest", sha2(col("payload"), 256))
        .select("doc_id", "n_bytes", "digest")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- multimodal decode-to-features. The codec is a STUB (no
    // image/audio libs in this container) but a DETERMINISTIC one
    // (byte-histogram moments in float32), so even the mapPartitions
    // path gets a DuckDB oracle: the SQL replays the exact float32
    // accumulation (ascii bytes at stride-8 offsets; DuckDB FLOAT
    // arithmetic is single-precision, proven bit-identical) ----
    "q71_multimodal_features" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val media = graft.operators.Multimodal.packMedia(
        d.where(d("doc_id") < 50), "doc_id", "text", "text/plain")
      graft.operators.Multimodal.extractFeatures(media, dim = 8)
        .selectExpr("media_id", "n_bytes",
          "round(cast(feature[0] AS double), 4) AS f0")
        .sortValues(Seq("media_id")).sdf
    }),

    // ---- full training-data pipeline composition: quality filter →
    // language ID → exact dedup → per-language token statistics.
    // The shape every data-curation job at 100 TB takes: each stage is
    // one of the verified operators, fused by Catalyst into two
    // aggregation stages total ----
    "q85_pipeline" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val scored = d
        .assign("quality", qualityScore(col("text")))
        .assign("lang_pred", langId(col("text")))
        .assign("fp", fingerprint(col("text")))
        .assign("n_tokens", tokenCount(col("text")))
      val filtered = scored.where(col("quality") >= 0.4)
      // exact-dedup: keep min doc_id per fingerprint
      val keep = filtered.groupby("fp")
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      filtered.semiJoin(keep, Seq("doc_id"))
        .groupby("lang_pred")
        .agg(count(lit(1)).as("n_docs"),
             intSum(col("n_tokens")).as("total_tokens"),
             round(avg(col("quality")), 6).as("avg_quality"))
        .sortValues(Seq("lang_pred")).sdf
    }),

    // ---- composite pipeline: quality-filter → per-lang counts ----
    "q70_quality_filter" -> ((s, dir) => {
      T(s, dir, "documents")
        .assign("quality", qualityScore(col("text")))
        .where(col("quality") >= 0.5)
        .groupby("lang").agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("quality")), 6).as("avg_quality"))
        .sortValues(Seq("lang")).sdf
    }))

  // ---------------- oracles ----------------

  /** DuckDB mirror of TextFunctions.tokens: whitespace-RUN split with
    * empty tokens dropped. A bare `string_split(text, ' ')` would
    * silently diverge from the Spark side on any tab, newline, double
    * space, or leading/trailing whitespace — oracle parity must not
    * depend on the corpus being single-space-separated. */
  private[queries] def toksSql(e: String = "text") =
    s"list_filter(regexp_split_to_array($e, '\\s+'), w -> w <> '')"
  private[queries] val fpSql =
    s"md5(array_to_string(list_sort(list_distinct(${toksSql()})), ' '))"

  /** Program-generated replay of [[Layout.withZValue]] over
    * (o_totalprice, o_custkey) at bits=8: uniform buckets from data
    * min/max — `floor((v-min)/(max-min)*256)` clamped to [0,255], the
    * SAME double arithmetic in the same association order as the Spark
    * side — then explicit bit-interleave terms. `+` instead of `|` is
    * safe: every term occupies a disjoint bit lane. */
  private val zorderSql: String = {
    val bits = 8
    def bucket(v: String, mn: String, mx: String) =
      s"""(CASE WHEN $mx = $mn THEN 0 ELSE
         |LEAST(GREATEST(CAST(FLOOR((CAST($v AS DOUBLE) - $mn) / ($mx - $mn)
         |  * 256.0) AS BIGINT), 0), 255) END)""".stripMargin
    val lanes = Seq(bucket("o_totalprice", "b.mn1", "b.mx1"),
      bucket("o_custkey", "b.mn2", "b.mx2"))
    val terms = (for { j <- 0 until bits; (bk, i) <- lanes.zipWithIndex }
      yield s"((($bk >> $j) & 1) << ${j * lanes.size + i})").mkString(" + ")
    s"""WITH b AS (SELECT
       |  MIN(CAST(o_totalprice AS DOUBLE)) AS mn1,
       |  MAX(CAST(o_totalprice AS DOUBLE)) AS mx1,
       |  MIN(CAST(o_custkey AS DOUBLE)) AS mn2,
       |  MAX(CAST(o_custkey AS DOUBLE)) AS mx2 FROM orders)
       |SELECT o_orderkey, $terms AS zval FROM orders, b
       |ORDER BY o_orderkey""".stripMargin
  }
  private def shinglesSql(textExpr: String = "text") =
    s"""list_distinct(list_transform(range(len(${toksSql(textExpr)}) - 2),
       |i -> array_to_string(${toksSql(textExpr)}[i+1:i+3], ' ')))""".stripMargin
  private val stopFilterSql =
    s"len(list_filter(${toksSql()}, s -> s IN ('the','a')))"
  /** sum of token lengths — NOT the `length(text) - n + 1` identity,
    * which only holds for single-space-separated text. */
  private def tokLenSumSql(e: String = "text") =
    s"list_aggregate(list_transform(${toksSql(e)}, x -> length(x)), 'sum')"
  /** mirrors TextFunctions.qualityScore incl. the NULL-for-token-less
    * contract (the Spark ratio terms are NULL-guarded for ANSI). */
  private val qualitySql =
    s"""(CASE WHEN len(${toksSql()}) = 0 THEN NULL ELSE
      |ROUND(LEAST(len(${toksSql()}) / 100.0, 1.0) * 0.4 +
      |LEAST(($stopFilterSql
      |  / CAST(len(${toksSql()}) AS DOUBLE)) * 5.0, 1.0) * 0.3 +
      |LEAST((${tokLenSumSql()}
      |  / CAST(len(${toksSql()}) AS DOUBLE)) / 10.0, 1.0) * 0.3, 6) END)""".stripMargin

  /** SimHash signature CTE chain (program-generated 60-term bit-sum SQL
    * replica) over `fromSql` — ends in `sigs(doc_id, simhash)`, shared
    * by the q65 signature oracle and the q99 pairs oracle. */
  private def simhashCtes(fromSql: String): String = {
    val bitSums = (0 until 60).map(i =>
      s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(",\n")
    val packed = (0 until 60).map(i =>
      s"CASE WHEN b$i > 0 THEN (1::BIGINT << $i) ELSE 0 END").mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, UNNEST(list_distinct(${toksSql()})) AS tok
       |  FROM $fromSql),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tok),1,15))::BIGINT AS h FROM toks),
       |sums AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
       |sigs AS (SELECT doc_id, $packed AS simhash FROM sums)""".stripMargin
  }

  private val simhashSql: String =
    s"""WITH ${simhashCtes("documents WHERE doc_id < 200")}
       |SELECT doc_id, simhash FROM sigs ORDER BY doc_id""".stripMargin

  /** simhashPairs oracle: signatures → pigeonhole bands (maxHamming=6 →
    * 7 disjoint 9-bit bands) → bucket cap → candidate equi-join → exact
    * Hamming verification, each stage mirroring Dedup.simhashPairs. */
  private val simhashPairsSql: String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 200
       |  UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' zzz' AS text
       |  FROM documents WHERE doc_id < 200 AND doc_id % 10 = 0),
       |${simhashCtes("corpus")},
       |banded AS (SELECT doc_id, simhash, b, (simhash >> (b*9)) & 511 AS key
       |  FROM sigs, range(7) t(b)
       |  QUALIFY COUNT(*) OVER (PARTITION BY b, key) <= 100000),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.simhash AS sig_a, b.simhash AS sig_b
       |  FROM banded a JOIN banded b ON a.b = b.b AND a.key = b.key
       |  WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
       |FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 6
       |ORDER BY id_a, id_b""".stripMargin

  /** shared exact-jaccard verification tail over a `pairs` CTE carrying
    * (id_a, id_b, sh_a, sh_b). Constants in [[minhashSideCtes]] mirror
    * graft.functions.VectorFunctions (a_j = 2^30-ish, b_j, p). */
  private val jaccardVerifySql: String =
    s"""scored AS (SELECT id_a, id_b,
       |  ROUND(len(list_filter(sh_a, x -> list_contains(sh_b, x))) /
       |    (CAST(len(sh_a) + len(sh_b) AS DOUBLE) -
       |     len(list_filter(sh_a, x -> list_contains(sh_b, x)))), 6) AS jaccard
       |  FROM pairs)
       |SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  /** MinHash self-join oracle: one banded chain ([[minhashSideCtes]]),
    * self-join, verify. */
  private val minhashSql: String =
    s"""WITH corpus AS $corpusSql,
       |${minhashSideCtes("", "corpus")},
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.shingles AS sh_a, b.shingles AS sh_b
       |  FROM banded a JOIN banded b ON a.b = b.b AND a.key = b.key
       |  WHERE a.doc_id < b.doc_id),
       |$jaccardVerifySql""".stripMargin

  /** lshRecallAudit oracle: replay the md5 doc-id sample, the full
    * signature/banding chain UNCAPPED (cap audit), the cap-filtered
    * candidate join, and all-pairs exact-jaccard ground truth — same
    * round-then-filter convention as [[jaccardVerifySql]]. */
  private val lshRecallAuditSql: String = {
    val inter = "len(list_filter(sh_a, x -> list_contains(sh_b, x)))"
    val jacc =
      s"ROUND($inter / (CAST(len(sh_a) + len(sh_b) AS DOUBLE) - $inter), 6)"
    s"""WITH corpus0 AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 60
       |  UNION ALL
       |  SELECT 1000 + doc_id*100 + v AS doc_id, text
       |    FROM documents, range(20) t(v) WHERE doc_id < 6
       |  UNION ALL
       |  SELECT 2000 + doc_id*100 + v AS doc_id, text
       |    FROM documents, range(3) t(v) WHERE doc_id >= 6 AND doc_id < 12),
       |corpus AS (SELECT doc_id, text FROM corpus0
       |  WHERE ('0x' || substr(md5(doc_id::VARCHAR),1,8))::BIGINT % 10000 < 6000),
       |sh AS (SELECT doc_id, ${shinglesSql()} AS shingles FROM corpus
       |  WHERE len(${shinglesSql()}) > 0),
       |hashed AS (SELECT doc_id, shingles,
       |  list_transform(shingles, s -> ('0x' || substr(md5(s),1,8))::BIGINT) AS hs FROM sh),
       |sigs AS (SELECT doc_id, shingles,
       |  list_transform(range(12), j -> list_min(list_transform(hs,
       |    h -> ((1073741789 - 7919*j) * h + (15485863 * (j+1)) % 4294967311) % 4294967311))) AS sig
       |  FROM hashed),
       |bandedall AS (SELECT doc_id, shingles, b,
       |  array_to_string(sig[b*4+1:b*4+4], '_') AS key
       |  FROM sigs, range(3) t(b)),
       |bstats AS (SELECT b, key, COUNT(*) AS bs FROM bandedall GROUP BY 1, 2),
       |capstats AS (SELECT
       |  COALESCE(SUM(CASE WHEN bs > 8 THEN 1 END), 0)::BIGINT AS overcap_buckets,
       |  COALESCE(SUM(CASE WHEN bs > 8 THEN bs END), 0)::BIGINT AS rows_in_overcap_buckets
       |  FROM bstats),
       |banded AS (SELECT ba.doc_id, ba.shingles, ba.b, ba.key
       |  FROM bandedall ba JOIN bstats USING (b, key) WHERE bs <= 8),
       |lshp AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.shingles AS sh_a, b.shingles AS sh_b
       |  FROM banded a JOIN banded b ON a.b = b.b AND a.key = b.key
       |  WHERE a.doc_id < b.doc_id),
       |lshc AS (SELECT COUNT(*) AS lsh_pairs FROM lshp WHERE $jacc >= 0.5),
       |truthp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.shingles AS sh_a, b.shingles AS sh_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
       |truthc AS (SELECT COUNT(*) AS true_pairs FROM truthp WHERE $jacc >= 0.5),
       |sc AS (SELECT COUNT(*) AS sampled_docs FROM corpus)
       |SELECT sampled_docs, true_pairs, lsh_pairs,
       |CASE WHEN true_pairs > 0
       |  THEN ROUND(lsh_pairs / CAST(true_pairs AS DOUBLE), 6)
       |  ELSE CAST(1.0 AS DOUBLE) END AS recall,
       |overcap_buckets, rows_in_overcap_buckets
       |FROM sc, truthc, lshc, capstats""".stripMargin
  }

  /** n-gram Jaccard CTE chain mirroring Dedup.ngramJaccardPairs exactly
    * (sorted hashed shingles, prefix-filtered inverted index, full-set
    * verification) over a CTE named `corpus` — ends in
    * `scored(id_a, id_b, jaccard)` with the 6dp-rounded score; shared
    * by the q66 pairs oracle and the q107 components oracle. */
  private def ngramJaccardCtes(thr: Double): String =
    s"""sh AS (SELECT doc_id, list_sort(list_distinct(list_transform(${shinglesSql()},
       |  s -> ('0x' || substr(md5(s),1,8))::BIGINT))) AS shingles FROM corpus),
       |sized AS (SELECT doc_id, shingles, len(shingles) AS nsh FROM sh),
       |inv0 AS (SELECT doc_id,
       |  UNNEST(shingles[1:(nsh - CEIL(nsh * $thr - 1e-9) + 1)::INT]) AS g FROM sized),
       |inv AS (SELECT doc_id, g FROM inv0
       |  QUALIFY COUNT(*) OVER (PARTITION BY g) <= 100000),
       |candidates AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id),
       |jpairs AS (SELECT id_a, id_b, fa.shingles AS sh_a, fa.nsh AS n_a,
       |  fb.shingles AS sh_b, fb.nsh AS n_b
       |  FROM candidates
       |  JOIN sized fa ON fa.doc_id = id_a
       |  JOIN sized fb ON fb.doc_id = id_b),
       |inters AS (SELECT id_a, id_b,
       |  len(list_filter(sh_a, x -> list_contains(sh_b, x))) AS inter,
       |  n_a, n_b FROM jpairs),
       |scored AS (SELECT id_a, id_b,
       |  ROUND(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
       |  FROM inters)""".stripMargin

  private val ngramJaccardSql: String =
    s"""WITH corpus AS $corpusSql,
       |${ngramJaccardCtes(0.5)}
       |SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  /** connectedComponents oracle: the exact ngram-Jaccard edge set over a
    * three-generation mutated corpus, then min-reachable-node per node
    * via a recursive transitive closure — ground truth for the
    * min-label-propagation operator, whatever the edge structure. */
  private val componentsSql: String =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 300
       |  UNION ALL SELECT doc_id + 10000, text || ' zzz'
       |    FROM documents WHERE doc_id < 300 AND doc_id % 5 = 0
       |  UNION ALL SELECT doc_id + 20000, text || ' zzz yyy'
       |    FROM documents WHERE doc_id < 300 AND doc_id % 5 = 0),
       |${ngramJaccardCtes(0.5)},
       |edges AS (SELECT id_a AS src, id_b AS dst FROM scored WHERE jaccard >= 0.5
       |  UNION SELECT id_b, id_a FROM scored WHERE jaccard >= 0.5),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
       |SELECT id, MIN(r) AS cluster FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** componentsSql's cluster labels + the quality-argmax keeper rule:
    * ROW_NUMBER over (score DESC, id DESC) ≡ Spark's
    * max(struct(score, id)); singletons (no component row) keep
    * themselves via the COALESCE fallbacks. */
  private val repByQualitySql: String =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 300
       |  UNION ALL SELECT doc_id + 10000, text || ' zzz'
       |    FROM documents WHERE doc_id < 300 AND doc_id % 5 = 0
       |  UNION ALL SELECT doc_id + 20000, text || ' zzz yyy'
       |    FROM documents WHERE doc_id < 300 AND doc_id % 5 = 0),
       |${ngramJaccardCtes(0.5)},
       |edges AS (SELECT id_a AS src, id_b AS dst FROM scored WHERE jaccard >= 0.5
       |  UNION SELECT id_b, id_a FROM scored WHERE jaccard >= 0.5),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
       |comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
       |scorec AS (SELECT doc_id,
       |  len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> ''))::BIGINT
       |    AS score FROM corpus),
       |members AS (SELECT s.doc_id, s.score, comp.cluster
       |  FROM scorec s JOIN comp ON s.doc_id = comp.id),
       |reps AS (SELECT cluster, doc_id AS representative FROM (
       |  SELECT cluster, doc_id, ROW_NUMBER() OVER (PARTITION BY cluster
       |    ORDER BY score DESC, doc_id DESC) AS rn FROM members) WHERE rn = 1)
       |SELECT s.doc_id, s.score,
       |  COALESCE(reps.representative, s.doc_id) AS representative
       |FROM scorec s
       |LEFT JOIN comp ON s.doc_id = comp.id
       |LEFT JOIN reps ON comp.cluster = reps.cluster
       |ORDER BY s.doc_id""".stripMargin

  /** One side's MinHash CTE chain (shingles → hashes → signatures →
    * capped banded index) with prefixed names, for the cross-corpus
    * join oracle — each side capped independently, exactly like
    * Dedup.minhashJoin. */
  private def minhashSideCtes(p: String, from: String): String =
    s"""${p}sh AS (SELECT doc_id, ${shinglesSql()} AS shingles FROM $from
       |  WHERE len(${shinglesSql()}) > 0),
       |${p}hashed AS (SELECT doc_id, shingles,
       |  list_transform(shingles, s -> ('0x' || substr(md5(s),1,8))::BIGINT) AS hs FROM ${p}sh),
       |${p}sigs AS (SELECT doc_id, shingles,
       |  list_transform(range(12), j -> list_min(list_transform(hs,
       |    h -> ((1073741789 - 7919*j) * h + (15485863 * (j+1)) % 4294967311) % 4294967311))) AS sig
       |  FROM ${p}hashed),
       |${p}banded AS (SELECT doc_id, shingles, b,
       |  array_to_string(sig[b*4+1:b*4+4], '_') AS key
       |  FROM ${p}sigs, range(3) t(b)
       |  QUALIFY COUNT(*) OVER (PARTITION BY b, key) <= 100000)""".stripMargin

  private val minhashJoinSql: String =
    s"""WITH corpus_a AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
       |corpus_b AS (SELECT doc_id + 10000 AS doc_id, text || ' zzz' AS text
       |  FROM documents WHERE doc_id < 200 AND doc_id % 10 = 0),
       |${minhashSideCtes("a_", "corpus_a")},
       |${minhashSideCtes("b_", "corpus_b")},
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.shingles AS sh_a, b.shingles AS sh_b
       |  FROM a_banded a JOIN b_banded b ON a.b = b.b AND a.key = b.key),
       |$jaccardVerifySql""".stripMargin

  /** the full hyperplane-signature computation as SQL — every plane's
    * dot an ascending-index sum over the SAME shortest-roundtrip double
    * weights the Spark expression folds, so the sign bits (and hence
    * buckets) match bit-for-bit; shared by the q87 ANN oracle and the
    * q117 LSH-bucketed dedup oracle. */
  private def lshSigSql(e: String): String = (0 until 8).map { j =>
    val ws = graft.operators.Similarity.planeWeights(j, 64)
    val dot = ws.zipWithIndex
      .map { case (w, i) => s"$e[${i + 1}]*($w)" }.mkString(" + ")
    s"CASE WHEN ($dot) > 0 THEN ${1L << j} ELSE 0 END"
  }.mkString(" + ")

  /** kMeans oracle: the Lloyd recipe replayed CTE-by-CTE — lowest-id
    * init (ROW_NUMBER rank = cluster index), per-round argmin over the
    * 6dp-rounded squared L2 (list_reduce folds dims left-to-right like
    * Spark's `aggregate`), decimal centroid means re-assembled into
    * arrays ordered by position. k=4, iters=2 to match q158. */
  private val kmeansSql: String = {
    def dist(v: String, c: String) =
      s"""ROUND(list_reduce(list_transform(range(1, len($v) + 1),
         |    i -> ($v[i::INT] - $c[i::INT]) * ($v[i::INT] - $c[i::INT])),
         |    (x, y) -> x + y), 6)""".stripMargin
    s"""WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(list_filter(embedding,
       |    x -> x IS NULL OR isnan(x) OR abs(x) >= 1e18)) = 0),
       |c0 AS (SELECT (ROW_NUMBER() OVER (ORDER BY vec_id) - 1)::INT AS cluster,
       |  v AS cvec FROM corpus ORDER BY vec_id LIMIT 4),
       |a0 AS (SELECT vec_id, v, cluster FROM (
       |  SELECT e.vec_id, e.v, c.cluster,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${dist("e.v", "c.cvec")}, c.cluster) AS rn
       |  FROM corpus e CROSS JOIN c0 c) WHERE rn = 1),
       |u1 AS (SELECT cluster, i AS pos,
       |  ROUND(CAST(SUM(CAST(v[(i+1)::INT] AS DECIMAL(28,10))) AS DOUBLE)
       |    / COUNT(*), 6) AS c
       |  FROM (SELECT cluster, v, UNNEST(range(len(v))) AS i FROM a0)
       |  GROUP BY cluster, i),
       |u1v AS (SELECT cluster, array_agg(c ORDER BY pos) AS cvec
       |  FROM u1 GROUP BY cluster),
       |c1 AS (SELECT c0.cluster, COALESCE(u1v.cvec, c0.cvec) AS cvec
       |  FROM c0 LEFT JOIN u1v ON c0.cluster = u1v.cluster),
       |a1 AS (SELECT vec_id, cluster FROM (
       |  SELECT e.vec_id, c.cluster,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${dist("e.v", "c.cvec")}, c.cluster) AS rn
       |  FROM corpus e CROSS JOIN c1 c) WHERE rn = 1)
       |SELECT vec_id, cluster FROM a1 ORDER BY vec_id""".stripMargin
  }

  /** PQ oracles: the [[kmeansSql]] Lloyd recipe replayed once per
    * subspace over sliced subvectors (m=2 × 32 dims, 4 codes, 2
    * assignment rounds — matching q195/q196's knobs), then the encode /
    * ADC tails. `s{j}a1` is subspace j's final assignment (= the
    * operator's encode), `s{j}c1` its final codebook. */
  private def pqDist(v: String, c: String) =
    s"""ROUND(list_reduce(list_transform(range(1, len($v) + 1),
       |    i -> ($v[i::INT] - $c[i::INT]) * ($v[i::INT] - $c[i::INT])),
       |    (x, y) -> x + y), 6)""".stripMargin
  private def pqSubCtes(j: Int, sd: Int): String = {
    val a = j * sd + 1
    val b = (j + 1) * sd
    s"""s${j}c AS (SELECT vec_id, v[$a:$b] AS s FROM corpus),
       |s${j}c0 AS (SELECT (ROW_NUMBER() OVER (ORDER BY vec_id) - 1)::INT AS code,
       |  s AS cvec FROM s${j}c ORDER BY vec_id LIMIT 4),
       |s${j}a0 AS (SELECT vec_id, s, code FROM (
       |  SELECT e.vec_id, e.s, c.code,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${pqDist("e.s", "c.cvec")}, c.code) AS rn
       |  FROM s${j}c e CROSS JOIN s${j}c0 c) WHERE rn = 1),
       |s${j}u1 AS (SELECT code, i AS pos,
       |  ROUND(CAST(SUM(CAST(s[(i+1)::INT] AS DECIMAL(28,10))) AS DOUBLE)
       |    / COUNT(*), 6) AS c
       |  FROM (SELECT code, s, UNNEST(range(len(s))) AS i FROM s${j}a0)
       |  GROUP BY code, i),
       |s${j}u1v AS (SELECT code, array_agg(c ORDER BY pos) AS cvec
       |  FROM s${j}u1 GROUP BY code),
       |s${j}c1 AS (SELECT c0.code, COALESCE(u.cvec, c0.cvec) AS cvec
       |  FROM s${j}c0 c0 LEFT JOIN s${j}u1v u ON c0.code = u.code),
       |s${j}a1 AS (SELECT vec_id, code FROM (
       |  SELECT e.vec_id, c.code,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${pqDist("e.s", "c.cvec")}, c.code) AS rn
       |  FROM s${j}c e CROSS JOIN s${j}c1 c) WHERE rn = 1)""".stripMargin
  }
  private val pqCorpusCte =
    """corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |  WHERE embedding IS NOT NULL AND len(list_filter(embedding,
      |    x -> x IS NULL OR isnan(x) OR abs(x) >= 1e18)) = 0)""".stripMargin
  private val pqEncodeSql: String =
    s"""WITH $pqCorpusCte,
       |${pqSubCtes(0, 32)},
       |${pqSubCtes(1, 32)}
       |SELECT vec_id, subspace, code FROM (
       |  SELECT vec_id, 0::INT AS subspace, code FROM s0a1
       |  UNION ALL SELECT vec_id, 1::INT, code FROM s1a1)
       |ORDER BY vec_id, subspace""".stripMargin
  private val pqTopkSql: String =
    s"""WITH $pqCorpusCte,
       |${pqSubCtes(0, 32)},
       |${pqSubCtes(1, 32)},
       |codes AS (SELECT a0.vec_id AS corpus_id, a0.code AS code0, a1.code AS code1
       |  FROM s0a1 a0 JOIN s1a1 a1 USING (vec_id)),
       |scored AS (SELECT q.query_id, c.corpus_id,
       |  ROUND(${pqDist("q.v[1:32]", "b0.cvec")}
       |      + ${pqDist("q.v[33:64]", "b1.cvec")}, 6) AS approx_d2
       |  FROM (SELECT vec_id AS query_id, v FROM corpus WHERE vec_id < 5) q
       |  CROSS JOIN codes c
       |  JOIN s0c1 b0 ON b0.code = c.code0
       |  JOIN s1c1 b1 ON b1.code = c.code1
       |  WHERE q.query_id != c.corpus_id),
       |ranked AS (SELECT query_id, corpus_id, approx_d2,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx_d2 ASC, corpus_id) AS rank FROM scored)
       |SELECT query_id, rank::INT AS rank, corpus_id, approx_d2 FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** BPE merge-learning oracle: 8 unrolled rounds. Each round counts
    * adjacent-symbol pairs over the `|`-wrapped vocab sequences, picks
    * the (count desc, l, r) argmax, and applies it with one
    * `replace('|l||r|' → '|lr|')` — the wrapper keeps boundaries
    * intact through a replacement, so DuckDB's left-to-right
    * non-overlapping replace IS the greedy BPE application, matching
    * the Spark operator's identical replace call. */
  private val bpeMergesSql: String = {
    val n = 8
    val rounds = (1 to n).map { r =>
      s"""p$r AS (SELECT t[i] AS l, t[i+1] AS r, CAST(SUM(wf) AS BIGINT) AS n
         |  FROM (SELECT wf, t, UNNEST(range(1, len(t))) AS i FROM
         |    (SELECT wf, string_split(trim(seq, '|'), '||') AS t FROM v$r))
         |  GROUP BY 1, 2),
         |top$r AS (SELECT l, r, n FROM p$r ORDER BY n DESC, l, r LIMIT 1),
         |v${r + 1} AS (SELECT replace(seq, '|' || l || '||' || r || '|',
         |  '|' || l || r || '|') AS seq, wf FROM v$r, top$r)""".stripMargin
    }.mkString(",\n")
    val out = (1 to n).map(r =>
      s"SELECT $r::INT AS merge_rank, l AS lhs, r AS rhs, n AS pair_count FROM top$r")
      .mkString("\nUNION ALL ")
    s"""WITH toks AS (SELECT UNNEST(${toksSql()}) AS word FROM documents),
       |wf0 AS (SELECT word, COUNT(*) AS wf FROM toks
       |  WHERE regexp_matches(word, '^[A-Za-z0-9]+$$') GROUP BY 1),
       |v1 AS (SELECT '|' || array_to_string(string_split(word, ''), '||') || '|' AS seq,
       |  wf FROM wf0),
       |$rounds
       |$out
       |ORDER BY merge_rank""".stripMargin
  }

  /** Hilbert-key oracle: the q142 bucket quantization, then the
    * standard xy→d rotate/reflect walk unrolled as one CTE per bit. */
  private val hilbertSql: String = {
    val bits = 8
    def bucket(v: String, mn: String, mx: String) =
      s"""(CASE WHEN $mx = $mn THEN 0 ELSE
         |LEAST(GREATEST(CAST(FLOOR((CAST($v AS DOUBLE) - $mn) / ($mx - $mn)
         |  * 256.0) AS BIGINT), 0), 255) END)""".stripMargin
    val steps = ((bits - 1) to 0 by -1).zipWithIndex.map { case (k, idx) =>
      val s = 1L << k
      s"""h${idx + 1} AS (SELECT o_orderkey,
         |  CASE WHEN ((y >> $k) & 1) = 0 THEN
         |    (CASE WHEN ((x >> $k) & 1) = 1 THEN ${s - 1} - y ELSE y END)
         |  ELSE x END AS x,
         |  CASE WHEN ((y >> $k) & 1) = 0 THEN
         |    (CASE WHEN ((x >> $k) & 1) = 1 THEN ${s - 1} - x ELSE x END)
         |  ELSE y END AS y,
         |  d + ${s * s} * xor(3 * ((x >> $k) & 1), (y >> $k) & 1) AS d
         |FROM h$idx)""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (SELECT
       |  MIN(CAST(o_totalprice AS DOUBLE)) AS mn1,
       |  MAX(CAST(o_totalprice AS DOUBLE)) AS mx1,
       |  MIN(CAST(o_custkey AS DOUBLE)) AS mn2,
       |  MAX(CAST(o_custkey AS DOUBLE)) AS mx2 FROM orders),
       |h0 AS (SELECT o_orderkey,
       |  ${bucket("o_totalprice", "b.mn1", "b.mx1")} AS x,
       |  ${bucket("o_custkey", "b.mn2", "b.mx2")} AS y,
       |  0::BIGINT AS d FROM orders, b),
       |$steps
       |SELECT o_orderkey, d AS hval FROM h$bits ORDER BY o_orderkey""".stripMargin
  }

  /** BPE-encode oracle: re-learn the 8 merges with [[bpeMergesSql]]'s
    * unrolled rounds, then re-apply the replace chain to every word of
    * every document (tops cross-joined in as 1-row frames). */
  private val bpeEncodeSql: String = {
    val n = 8
    val rounds = (1 to n).map { r =>
      s"""p$r AS (SELECT t[i] AS l, t[i+1] AS r, CAST(SUM(wf) AS BIGINT) AS n
         |  FROM (SELECT wf, t, UNNEST(range(1, len(t))) AS i FROM
         |    (SELECT wf, string_split(trim(seq, '|'), '||') AS t FROM v$r))
         |  GROUP BY 1, 2),
         |top$r AS (SELECT l, r, n FROM p$r ORDER BY n DESC, l, r LIMIT 1),
         |v${r + 1} AS (SELECT replace(seq, '|' || l || '||' || r || '|',
         |  '|' || l || r || '|') AS seq, wf FROM v$r, top$r)""".stripMargin
    }.mkString(",\n")
    val crossTops = (1 to n)
      .map(r => s"CROSS JOIN (SELECT l AS l$r, r AS r$r FROM top$r) t$r")
      .mkString("\n  ")
    val chain = (1 to n).foldLeft(
      "'|' || array_to_string(string_split(word, ''), '||') || '|'") {
      (acc, k) =>
        s"replace($acc, '|' || l$k || '||' || r$k || '|', '|' || l$k || r$k || '|')"
    }
    s"""WITH toks AS (SELECT UNNEST(${toksSql()}) AS word FROM documents),
       |wf0 AS (SELECT word, COUNT(*) AS wf FROM toks
       |  WHERE regexp_matches(word, '^[A-Za-z0-9]+$$') GROUP BY 1),
       |v1 AS (SELECT '|' || array_to_string(string_split(word, ''), '||') || '|' AS seq,
       |  wf FROM wf0),
       |$rounds,
       |d AS (SELECT doc_id, UNNEST(${toksSql()}) AS word FROM documents),
       |enc AS (SELECT doc_id, word,
       |  CASE WHEN regexp_matches(word, '^[A-Za-z0-9]+$$')
       |  THEN len(string_split(trim($chain, '|'), '||'))
       |  ELSE 1 END AS nt
       |  FROM d
       |  $crossTops)
       |SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(nt) AS BIGINT) AS n_tokens,
       |ROUND(SUM(len(word))::DOUBLE / SUM(nt), 4) AS chars_per_token
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** LSH ANN top-k oracle: signatures via [[lshSigSql]], bucket
    * equi-join, exact rerank. */
  private val lshTopkSql: String = {
    def sig(e: String): String = lshSigSql(e)
    // NULL contract mirrored from lshSignature: a NULL embedding OR one
    // carrying a NULL element gets a NULL bucket and drops out of the
    // equi-join (bucket = bucket is never true for NULL) — without the
    // CASE the generated signature would map them to bucket 0 and keep
    // the row, diverging from Spark on any corpus with NULL vectors.
    s"""WITH b AS (SELECT vec_id, e,
       |  (CASE WHEN e IS NULL OR len(list_filter(e, x -> x IS NULL)) > 0
       |   THEN NULL ELSE ${sig("e")} END) AS bucket FROM
       |  (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)),
       |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |ROUND(list_cosine_similarity(q.e, c.e), 6) + 0.0 AS cosine,
       |ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |  ROUND(list_cosine_similarity(q.e, c.e), 6) DESC, c.vec_id) AS rank
       |FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
       |WHERE q.vec_id < 5)
       |SELECT query_id, rank, corpus_id, cosine FROM scored
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q87_lsh_topk" -> lshTopkSql,
    "q200_bpe_merges" -> bpeMergesSql,
    "q208_bpe_encode" -> bpeEncodeSql,
    "q212_hilbert_key" -> hilbertSql,
    // the day-tail cutoff replayed with a window over the (tiny)
    // distinct-day inventory
    "q199_time_split" ->
      """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts,
        |  date_trunc('day', ts::TIMESTAMP) AS d
        |  FROM events WHERE ts IS NOT NULL),
        |days AS (SELECT DISTINCT d FROM e),
        |dd AS (SELECT d, ROW_NUMBER() OVER (ORDER BY d DESC) AS rn,
        |  COUNT(*) OVER () AS nd FROM days),
        |cut AS (SELECT MIN(d) AS cutoff FROM dd
        |  WHERE rn <= GREATEST(1, FLOOR(nd * 0.2)))
        |SELECT CASE WHEN e.d >= c.cutoff THEN 'holdout' ELSE 'train' END AS split,
        |COUNT(*)::BIGINT AS n, SUM(event_id)::BIGINT AS id_sum,
        |MIN(d) AS first_day, MAX(d) AS last_day
        |FROM e, cut c GROUP BY 1 ORDER BY split""".stripMargin,
    // plain HAVING replay — the CMS prefilter is a no-false-negative
    // optimization, so the exact SQL IS the contract
    "q197_heavy_hitters" ->
      """SELECT user_id, COUNT(*)::BIGINT AS n FROM events
        |WHERE user_id IS NOT NULL GROUP BY user_id
        |HAVING COUNT(*) >= 75 ORDER BY user_id""".stripMargin,
    "q195_pq_encode" -> pqEncodeSql,
    // ADC tail: per-query distance to each FINAL codebook centroid,
    // approx = ROUND(d0 + d1, 6) — exactly the Spark side's two
    // 6dp-rounded table lookups summed then re-rounded
    "q196_pq_topk" -> pqTopkSql,
    // list_reduce has no initial accumulator: it folds from the first
    // element — identical to the Spark side's 0 seed since 0·B + t₁ = t₁.
    // Token-less docs are CASE-guarded to the seed value 0: DuckDB's
    // list_reduce THROWS on an empty list where Spark's aggregate
    // returns the seed.
    "q89_token_fingerprint" ->
      s"""SELECT doc_id,
        |len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
        |(CASE WHEN len(${toksSql()}) = 0 THEN 0::BIGINT ELSE
        |list_reduce(list_transform(${toksSql()},
        |  t -> ('0x' || substr(md5(t),1,8))::BIGINT % 2147483647),
        |  (a, b) -> (a*131 + b) % 2147483647) END) AS rfp
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "q142_zorder_key" -> zorderSql,
    // NOT EXISTS, not NOT IN: a NULL fingerprint in the corpus subquery
    // would make NOT IN return zero rows; the operator's left_anti is
    // null-safe the same way NOT EXISTS is
    "q141_bloom_dedup" ->
      s"""WITH corpus AS (
         |  SELECT $fpSql AS fp FROM documents WHERE doc_id % 10 < 7),
         |newb AS (
         |  SELECT doc_id, text, $fpSql AS fp FROM (
         |    SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 7
         |    UNION ALL SELECT doc_id + 20000 AS doc_id, text FROM documents
         |    WHERE doc_id % 10 < 7 AND doc_id % 5 = 0))
         |SELECT doc_id, text FROM newb n
         |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = n.fp)
         |ORDER BY doc_id""".stripMargin,
    "q60_dedup_exact" ->
      s"""SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies FROM (
         |SELECT doc_id, text FROM documents
         |UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0)
         |GROUP BY $fpSql ORDER BY doc_id""".stripMargin,
    // every token statistic rides the SAME whitespace-run tokenizer
    // (toksSql) — mixing in string_split(text,' ') anywhere would tie
    // oracle parity to the corpus being single-space ASCII. Empty-token
    // docs are CASE-guarded to NULL like the Spark side's ANSI guards.
    "q61_text_stats" ->
      s"""SELECT doc_id,
         |len(${toksSql()}) AS n_tokens,
         |length(text) AS n_chars,
         |(CASE WHEN len(${toksSql()}) = 0 THEN NULL ELSE
         |  ROUND(${tokLenSumSql()} / CAST(len(${toksSql()}) AS DOUBLE), 6) END) AS avg_token_len,
         |(CASE WHEN len(${toksSql()}) = 0 THEN NULL ELSE
         |  ROUND($stopFilterSql / CAST(len(${toksSql()}) AS DOUBLE), 6) END) AS stop_ratio,
         |$qualitySql AS quality
         |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q62_langid" ->
      s"""SELECT CASE WHEN $stopFilterSql > 0 THEN 'en' ELSE 'unknown' END AS lang_pred,
         |COUNT(*) AS size FROM documents GROUP BY 1 ORDER BY lang_pred""".stripMargin,
    "q63_fingerprint" ->
      s"""SELECT COUNT(*) AS n_docs, COUNT(DISTINCT $fpSql) AS n_fingerprints
         |FROM documents""".stripMargin,
    "q64_minhash_pairs" -> minhashSql,
    "q140_lsh_recall_audit" -> lshRecallAuditSql,
    "q113_minhash_join" -> minhashJoinSql,
    // joins on the 32-bit md5-prefix hash EXACTLY like the operator
    // (every sibling oracle replays the hash; joining raw strings would
    // diverge on any 2^-32 collision between bench and corpus grams)
    "q114_contamination" ->
      s"""WITH bench AS (SELECT DISTINCT
         |  ('0x' || substr(md5(g),1,8))::BIGINT AS gh FROM
         |  (SELECT UNNEST(${shinglesSql()}) AS g
         |   FROM documents WHERE doc_id % 50 = 0)),
         |docs_g AS (SELECT doc_id, ('0x' || substr(md5(g),1,8))::BIGINT AS gh
         |  FROM (SELECT doc_id, UNNEST(${shinglesSql()}) AS g FROM documents))
         |SELECT doc_id, COUNT(*) AS n_contaminated_ngrams
         |FROM docs_g JOIN bench USING (gh)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q114's contamination count over the FULL corpus, divided by the
    // doc's total n-gram occurrences (GREATEST(...,1) guards the
    // shorter-than-n docs on both sides), 6dp-rounded BEFORE the
    // threshold compare so the boundary is engine-identical
    "q154_decontaminate" ->
      s"""WITH bench AS (SELECT DISTINCT
         |  ('0x' || substr(md5(g),1,8))::BIGINT AS gh FROM
         |  (SELECT UNNEST(${shinglesSql()}) AS g
         |   FROM documents WHERE doc_id % 50 = 0)),
         |docs_g AS (SELECT doc_id, ('0x' || substr(md5(g),1,8))::BIGINT AS gh
         |  FROM (SELECT doc_id, UNNEST(${shinglesSql()}) AS g FROM documents)),
         |cont AS (SELECT doc_id, COUNT(*) AS c
         |  FROM docs_g JOIN bench USING (gh) GROUP BY doc_id),
         |tot AS (SELECT doc_id, len(${shinglesSql()}) AS t FROM documents)
         |SELECT tot.doc_id,
         |  ROUND(COALESCE(cont.c, 0) / GREATEST(tot.t, 1)::DOUBLE, 6)
         |    AS contaminated_fraction
         |FROM tot LEFT JOIN cont ON tot.doc_id = cont.doc_id
         |WHERE ROUND(COALESCE(cont.c, 0) / GREATEST(tot.t, 1)::DOUBLE, 6) <= 0.1
         |ORDER BY tot.doc_id""".stripMargin,
    // bigram list per doc is NOT distinct (repetition is the signal);
    // range() here is the scalar list form (lateral-safe)
    "q116_repetition" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql()} AS toks
         |  FROM documents WHERE doc_id < 200),
         |g AS (SELECT doc_id,
         |  UNNEST(list_transform(range(len(toks) - 1),
         |    i -> array_to_string(toks[i+1:i+2], ' '))) AS g
         |  FROM t WHERE len(toks) >= 2),
         |per_gram AS (SELECT doc_id, g, COUNT(*) AS ct FROM g GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(ct) AS BIGINT) AS n_ngrams,
         |COUNT(*) AS n_distinct, MAX(ct) AS top_count,
         |ROUND(1.0 - COUNT(*) / CAST(SUM(ct) AS DOUBLE), 6) AS dup_fraction
         |FROM per_gram GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q115_unigram_nll" ->
      s"""WITH toks AS (SELECT doc_id, UNNEST(${toksSql()}) AS t FROM documents),
         |freq AS (SELECT t, COUNT(*) AS ct FROM toks GROUP BY t),
         |total AS (SELECT COUNT(*) AS total FROM toks)
         |SELECT doc_id,
         |ROUND(CAST(SUM(CAST(-LN(ct::DOUBLE / total) AS DECIMAL(18,8))) AS DOUBLE)
         |  / COUNT(*), 4) AS avg_nll,
         |COUNT(*) AS n_tokens
         |FROM toks JOIN freq USING (t) CROSS JOIN total
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q115's NLL chain + per-lang quantile_cont terciles (the same
    // interpolation formula as Spark's exact percentile; thresholds
    // rounded 6dp on both sides); Scala prints the cut literals, so
    // both engines parse the identical double
    "q152_perplexity_buckets" ->
      s"""WITH toks AS (SELECT doc_id, UNNEST(${toksSql()}) AS t FROM documents),
         |freq AS (SELECT t, COUNT(*) AS ct FROM toks GROUP BY t),
         |total AS (SELECT COUNT(*) AS total FROM toks),
         |nll AS (SELECT doc_id,
         |  ROUND(CAST(SUM(CAST(-LN(ct::DOUBLE / total) AS DECIMAL(18,8))) AS DOUBLE)
         |    / COUNT(*), 4) AS avg_nll
         |  FROM toks JOIN freq USING (t) CROSS JOIN total GROUP BY doc_id),
         |scored AS (SELECT nll.doc_id, nll.avg_nll, d.lang
         |  FROM nll JOIN documents d ON nll.doc_id = d.doc_id),
         |cuts AS (SELECT lang,
         |  ROUND(quantile_cont(avg_nll, ${1.0 / 3}::DOUBLE), 6) AS t1,
         |  ROUND(quantile_cont(avg_nll, ${2.0 / 3}::DOUBLE), 6) AS t2
         |  FROM scored WHERE lang IS NOT NULL GROUP BY lang)
         |SELECT s.doc_id, s.lang, s.avg_nll,
         |  CASE WHEN c.t1 IS NULL THEN NULL
         |       WHEN s.avg_nll <= c.t1 THEN 'head'
         |       WHEN s.avg_nll <= c.t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM scored s LEFT JOIN cuts c ON s.lang = c.lang
         |ORDER BY s.doc_id""".stripMargin,

    "q65_simhash" -> simhashSql,
    "q99_simhash_pairs" -> simhashPairsSql,
    "q107_dedup_components" -> componentsSql,
    "q269_components_shuffle" -> componentsSql,
    "q271_bpe_merges_dist" -> bpeMergesSql,
    // the two-phase incremental run must equal the ONE-SHOT closure
    // over the full edge set — same oracle as q107 by construction
    "q263_incremental_cc" -> componentsSql,
    "q149_dedup_rep_by_quality" -> repByQualitySql,
    "q117_embedding_lsh_dedup" ->
      s"""WITH corpus0 AS (
         |SELECT vec_id, embedding FROM embeddings
         |UNION ALL SELECT vec_id + 10000,
         |  list_transform(embedding, x -> x * 0.5::FLOAT)
         |FROM embeddings WHERE vec_id % 20 = 0),
         |b0 AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS e FROM corpus0),
         |b AS (SELECT vec_id, embedding,
         |  (CASE WHEN e IS NULL OR len(list_filter(e, x -> x IS NULL)) > 0
         |   THEN NULL ELSE ${lshSigSql("e")} END) AS bk
         |  FROM b0),
         |capped AS (SELECT * FROM b
         |  QUALIFY COUNT(*) OVER (PARTITION BY bk) <= 100000)
         |SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         |ROUND(list_cosine_similarity(a.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
         |FROM capped a JOIN capped c ON a.bk = c.bk AND a.vec_id < c.vec_id
         |WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) >= 0.99
         |ORDER BY id_a, id_b""".stripMargin,
    // each side's signature chain is the q117 replica with its own cap;
    // the join keys on the bucket only (A×B, no id ordering — the
    // sides are different corpora)
    "q155_embedding_join" ->
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
         |batch AS (
         |  SELECT vec_id + 10000 AS vec_id,
         |    list_transform(embedding, x -> x * 0.5::FLOAT) AS embedding
         |  FROM embeddings WHERE vec_id % 20 = 0
         |  UNION ALL
         |  SELECT vec_id + 20000, list_transform(embedding, x -> -x)
         |  FROM embeddings WHERE vec_id % 20 = 7),
         |a0 AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS e FROM corpus),
         |a1 AS (SELECT vec_id, embedding,
         |  (CASE WHEN e IS NULL OR len(list_filter(e,
         |    x -> x IS NULL OR isnan(x) OR abs(x) >= 1e18)) > 0
         |   THEN NULL ELSE ${lshSigSql("e")} END) AS bk FROM a0),
         |ac AS (SELECT * FROM a1 WHERE bk IS NOT NULL
         |  QUALIFY COUNT(*) OVER (PARTITION BY bk) <= 100000),
         |b0 AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS e FROM batch),
         |b1 AS (SELECT vec_id, embedding,
         |  (CASE WHEN e IS NULL OR len(list_filter(e,
         |    x -> x IS NULL OR isnan(x) OR abs(x) >= 1e18)) > 0
         |   THEN NULL ELSE ${lshSigSql("e")} END) AS bk FROM b0),
         |bc AS (SELECT * FROM b1 WHERE bk IS NOT NULL
         |  QUALIFY COUNT(*) OVER (PARTITION BY bk) <= 100000)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
         |  b.embedding::DOUBLE[]), 6) AS cosine
         |FROM ac a JOIN bc b ON a.bk = b.bk
         |WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
         |  b.embedding::DOUBLE[]), 6) >= 0.99
         |ORDER BY id_a, id_b""".stripMargin,
    "q158_kmeans" -> kmeansSql,
    // updates win by NOT EXISTS; insert keys can't collide (offset past
    // the id space)
    "q167_upsert" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice FROM orders),
        |u AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL SELECT o_orderkey + 10000000, o_totalprice
        |  FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT * FROM u
        |UNION ALL SELECT * FROM t
        |WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.o_orderkey = t.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    // one UNION ALL branch per documents column; counts cast BIGINT
    "q165_profile" -> {
      def br(c: String) =
        s"""SELECT '$c' AS col_name, COUNT(*)::BIGINT AS n,
           |(COUNT(*) - COUNT($c))::BIGINT AS n_nulls,
           |COUNT(DISTINCT $c)::BIGINT AS n_distinct FROM documents""".stripMargin
      Seq("doc_id", "text", "lang", "source", "n_chars").map(br)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
    },
    // exact integer inputs -> IEEE-deterministic skew ratio
    "q166_skew_stats" ->
      """WITH k AS (SELECT l_orderkey, COUNT(*) AS kn FROM lineitem GROUP BY 1)
        |SELECT CAST(SUM(kn) AS BIGINT) AS n_rows, COUNT(*)::BIGINT AS n_keys,
        |CAST(MAX(kn) AS BIGINT) AS max_key_n,
        |ROUND((CAST(MAX(kn) AS BIGINT) * COUNT(*))
        |  / CAST(SUM(kn) AS BIGINT)::DOUBLE, 4) AS skew
        |FROM k""".stripMargin,
    // q161's quantizer inlined on both sides, integer dot exact in
    // BIGINT, score = dot * scale_a * scale_b left-to-right (the
    // Spark column expression's evaluation order), 6dp-rounded
    "q162_int8_topk" ->
      """WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(list_filter(embedding,
        |    x -> x IS NULL OR isnan(x) OR abs(x) >= 1e18)) = 0),
        |qz AS (SELECT vec_id, scale,
        |  (CASE WHEN scale = 0 THEN list_transform(v, x -> 0::BIGINT)
        |   ELSE list_transform(v, x -> ROUND(x / scale)::BIGINT) END) AS q
        |  FROM (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM corpus)),
        |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS corpus_id,
        |  ROUND(list_reduce(list_transform(range(1, len(a.q) + 1),
        |      i -> a.q[i::INT] * b.q[i::INT]), (x, y) -> x + y)
        |    * a.scale * b.scale, 6) AS score
        |  FROM qz a JOIN qz b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
        |ranked AS (SELECT query_id, corpus_id, score,
        |  ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, corpus_id) AS rank FROM scored)
        |SELECT query_id, rank::INT AS rank, corpus_id, score FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // exact-arithmetic replay: list_max of |v| is exact, /127.0 and
    // the ROUND are IEEE-deterministic; q cast to INT on both sides
    "q161_quantize_int8" ->
      """WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(list_filter(embedding,
        |    x -> x IS NULL OR isnan(x) OR abs(x) >= 1e18)) = 0),
        |s AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM corpus),
        |x AS (SELECT vec_id, scale, UNNEST(range(len(v))) AS i, v FROM s)
        |SELECT vec_id, i::INT AS pos,
        |(CASE WHEN scale = 0 THEN 0 ELSE ROUND(v[(i+1)::INT] / scale) END)::INT AS q,
        |scale FROM x ORDER BY vec_id, pos""".stripMargin,
    // q107's recursive closure labels the clusters; the split replays
    // q118's md5-bucket rule over COALESCE(cluster, doc_id)
    "q156_cluster_safe_split" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 300
         |  UNION ALL SELECT doc_id + 10000, text || ' zzz'
         |    FROM documents WHERE doc_id < 300 AND doc_id % 5 = 0
         |  UNION ALL SELECT doc_id + 20000, text || ' zzz yyy'
         |    FROM documents WHERE doc_id < 300 AND doc_id % 5 = 0),
         |${ngramJaccardCtes(0.5)},
         |edges AS (SELECT id_a AS src, id_b AS dst FROM scored WHERE jaccard >= 0.5
         |  UNION SELECT id_b, id_a FROM scored WHERE jaccard >= 0.5),
         |reach AS (
         |  SELECT src AS id, src AS r FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
         |SELECT c.doc_id, COALESCE(comp.cluster, c.doc_id) AS split_key,
         |CASE WHEN ('0x' || substr(md5(COALESCE(comp.cluster, c.doc_id)::VARCHAR),1,8))::BIGINT
         |  % 10000 < 1000 THEN 'holdout' ELSE 'train' END AS split
         |FROM corpus c LEFT JOIN comp ON c.doc_id = comp.id
         |ORDER BY c.doc_id""".stripMargin,
    // same distinct-word weighting: wf counts running words, the pair
    // explosion rides DISTINCT words only; HUGEINT sum cast back to
    // BIGINT to match Spark's long
    "q157_bpe_pair_counts" ->
      s"""WITH toks AS (SELECT UNNEST(${toksSql()}) AS word
         |  FROM documents WHERE doc_id < 200),
         |wf AS (SELECT word, COUNT(*) AS wf FROM toks GROUP BY 1),
         |p AS (SELECT wf, UNNEST(list_transform(generate_series(1, length(word) - 1),
         |  i -> substr(word, i::INT, 1) || ' ' || substr(word, (i + 1)::INT, 1))) AS pair
         |  FROM wf WHERE length(word) >= 2),
         |agg AS (SELECT pair, CAST(SUM(wf) AS BIGINT) AS n FROM p GROUP BY 1)
         |SELECT pair, n FROM agg ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    // q117's LSH-pair chain + q107's recursive closure + q149's
    // argmax(score, id) keeper rule, then keep only id = representative;
    // score = round(embedding[1]::double, 6) on both sides (float→double
    // widening is exact, so the 6dp rounding sees the identical value)
    "q153_semantic_dedup" ->
      s"""WITH RECURSIVE corpus0 AS (
         |SELECT vec_id, embedding FROM embeddings
         |UNION ALL SELECT vec_id + 10000,
         |  list_transform(embedding, x -> x * 0.5::FLOAT)
         |FROM embeddings WHERE vec_id % 20 = 0),
         |b0 AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS e FROM corpus0),
         |b AS (SELECT vec_id, embedding,
         |  (CASE WHEN e IS NULL OR len(list_filter(e, x -> x IS NULL)) > 0
         |   THEN NULL ELSE ${lshSigSql("e")} END) AS bk
         |  FROM b0),
         |capped AS (SELECT * FROM b
         |  QUALIFY COUNT(*) OVER (PARTITION BY bk) <= 100000),
         |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b
         |  FROM capped a JOIN capped c ON a.bk = c.bk AND a.vec_id < c.vec_id
         |  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
         |    c.embedding::DOUBLE[]), 6) >= 0.99),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM p
         |  UNION SELECT id_b, id_a FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
         |scorec AS (SELECT vec_id,
         |  ROUND(embedding[1]::DOUBLE, 6) + 0.0 AS score FROM corpus0),
         |members AS (SELECT s.vec_id, s.score, comp.cluster
         |  FROM scorec s JOIN comp ON s.vec_id = comp.id),
         |reps AS (SELECT cluster, vec_id AS representative FROM (
         |  SELECT cluster, vec_id, ROW_NUMBER() OVER (PARTITION BY cluster
         |    ORDER BY score DESC, vec_id DESC) AS rn FROM members) WHERE rn = 1)
         |SELECT s.vec_id, s.score
         |FROM scorec s
         |LEFT JOIN comp ON s.vec_id = comp.id
         |LEFT JOIN reps ON comp.cluster = reps.cluster
         |WHERE COALESCE(reps.representative, s.vec_id) = s.vec_id
         |ORDER BY s.vec_id""".stripMargin,
    "q118_hash_split" ->
      """SELECT CASE WHEN
        |  ('0x' || substr(md5(o_orderkey::VARCHAR),1,8))::BIGINT % 10000 < 1000
        |  THEN 'val' ELSE 'train' END AS split,
        |COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY 1 ORDER BY split""".stripMargin,
    "q104_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, UNNEST(${toksSql()}) AS term
         |  FROM documents WHERE doc_id < 100),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id < 100)
         |SELECT doc_id, term, tf,
         |ROUND(tf * (LN((n_docs + 1)::DOUBLE / (df + 1)) + 1), 4) AS tfidf
         |FROM tf JOIN df USING (term) CROSS JOIN n
         |ORDER BY doc_id, term""".stripMargin,
    "q108_top_terms" ->
      s"""WITH toks AS (SELECT doc_id, UNNEST(${toksSql()}) AS term
         |  FROM documents WHERE doc_id < 100),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id < 100),
         |w AS (SELECT doc_id, term, tf,
         |  ROUND(tf * (LN((n_docs + 1)::DOUBLE / (df + 1)) + 1), 4) AS tfidf
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id, term, tf, tfidf,
         |CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |  ORDER BY tfidf DESC, term) AS INT) AS rank
         |FROM w
         |QUALIFY rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // scalar range(...) + UNNEST (the table-function range rejects
    // lateral column parameters in DuckDB); starts stop at len−overlap−1
    // (range excludes its stop → +1) mirroring chunkTokens' no-pure-
    // duplicate-tail contract
    "q112_chunk_tokens" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql()} AS toks
         |  FROM documents WHERE doc_id < 100),
         |s AS (SELECT doc_id, toks,
         |  UNNEST(range(0, GREATEST(len(toks) - 6, 0) + 1, 15)) AS i
         |  FROM t WHERE len(toks) > 0)
         |SELECT doc_id, (i // 15)::INT AS chunk_id,
         |array_to_string(toks[(i+1)::INT:(i+20)::INT], ' ') AS chunk,
         |LEAST(20, len(toks) - i)::INT AS n_tokens
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "q109_group_sample" ->
      """SELECT COUNT(DISTINCT o_orderpriority) AS n_groups,
        |TRUE AS counts_exact, 0::BIGINT AS n_outside FROM orders""".stripMargin,
    // the WHERE mirrors meanPool's corrupt-element drop (NULL / NaN /
    // |x| ≥ 1e18 leave both the sum and the divisor)
    "q110_mean_pool" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings),
        |x0 AS (SELECT label, emb, UNNEST(range(len(emb))) AS i FROM e),
        |x AS (SELECT label, i, emb[(i+1)::INT] AS v FROM x0
        |  WHERE emb[(i+1)::INT] IS NOT NULL AND NOT isnan(emb[(i+1)::INT])
        |    AND abs(emb[(i+1)::INT]) < 1e18)
        |SELECT label, i::INT AS pos,
        |ROUND(CAST(SUM(CAST(v AS DECIMAL(28,10))) AS DOUBLE)
        |  / COUNT(*), 6) + 0.0 AS centroid
        |FROM x GROUP BY label, i ORDER BY label, pos""".stripMargin,
    "q111_l2_normalize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings WHERE vec_id < 20),
        |n AS (SELECT vec_id, emb,
        |  sqrt(list_reduce(list_transform(emb, x -> x * x), (a, b) -> a + b)) AS nrm
        |  FROM e),
        |x AS (SELECT vec_id, emb, nrm, UNNEST(range(len(emb))) AS i FROM n
        |  WHERE nrm > 0)
        |SELECT vec_id, i::INT AS pos, ROUND(emb[(i+1)::INT] / nrm, 6) + 0.0 AS v
        |FROM x ORDER BY vec_id, pos""".stripMargin,
    "q105_stratified_sample" ->
      """SELECT COUNT(DISTINCT o_orderpriority) AS n_strata,
        |TRUE AS all_within_bounds, 0::BIGINT AS n_unexpected
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')""".stripMargin,
    "q106_quantile_sketch" ->
      """SELECT ROUND(quantile_cont(l_quantity::DOUBLE, 0.5), 4) AS exact_median,
        |TRUE AS within_rank_bound FROM lineitem""".stripMargin,
    "q66_ngram_jaccard" -> ngramJaccardSql,
    // the QUALIFY mirrors embeddingCosinePairs' maxBucket cap (blocks
    // over 100000 rows are dropped before pairing); window PARTITION BY
    // groups NULL labels together exactly like the Spark sentinel does
    "q67_embedding_dedup" ->
      """WITH corpus0 AS (
        |SELECT vec_id, embedding, label FROM embeddings
        |UNION ALL SELECT vec_id + 10000,
        |  list_transform(embedding, x -> x * 0.5::FLOAT), label
        |FROM embeddings WHERE vec_id % 20 = 0),
        |corpus AS (SELECT * FROM corpus0
        |  QUALIFY COUNT(*) OVER (PARTITION BY label) <= 100000)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        |FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin,
    "q68_similarity_topk" ->
      """SELECT query_id, rank, corpus_id, cosine FROM (
        |SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) + 0.0 AS cosine,
        |ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |  ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
        |  c.vec_id) AS rank
        |FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |WHERE q.vec_id < 5)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q69_multimodal_meta" ->
      """SELECT doc_id, length(text) AS n_bytes, sha256(text) AS digest
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // feature[0] of the stub codec = float32 sum of bytes at offsets
    // 0,8,16,… ÷ 255, divided by len div 8 — replayed here in FLOAT
    // (single-precision) arithmetic, then widened to double for the
    // 4dp round on both sides
    "q71_multimodal_features" ->
      """SELECT doc_id AS media_id, length(text) AS n_bytes,
        |ROUND((CASE WHEN length(text) = 0 THEN 0.0::FLOAT ELSE
        |  (list_reduce(list_transform(range(0, length(text), 8),
        |     i -> (ascii(substr(text, (i+1)::INT, 1))::FLOAT / 255.0::FLOAT)),
        |   (a, b) -> a + b)
        |   / GREATEST(1, length(text) // 8))::FLOAT END)::DOUBLE, 4) AS f0
        |FROM documents WHERE doc_id < 50 ORDER BY media_id""".stripMargin,
    "q85_pipeline" ->
      s"""WITH scored AS (
         |SELECT doc_id, $qualitySql AS quality,
         |CASE WHEN $stopFilterSql > 0 THEN 'en' ELSE 'unknown' END AS lang_pred,
         |$fpSql AS fp,
         |len(${toksSql()}) AS n_tokens
         |FROM documents),
         |filtered AS (SELECT * FROM scored WHERE quality >= 0.4),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY fp)
         |SELECT lang_pred, COUNT(*) AS n_docs,
         |CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |ROUND(AVG(quality), 6) AS avg_quality
         |FROM filtered WHERE doc_id IN (SELECT doc_id FROM keep)
         |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,
    "q70_quality_filter" ->
      s"""SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(q), 6) AS avg_quality FROM (
         |SELECT lang, $qualitySql AS q FROM documents)
         |WHERE q >= 0.5 GROUP BY lang ORDER BY lang""".stripMargin)
}
