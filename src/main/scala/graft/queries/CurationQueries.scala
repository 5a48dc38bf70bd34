package graft.queries

import graft.api.Df
import graft.operators.Curation
import org.apache.spark.sql.functions._
import QueryUtil._

/** Corpus-curation suite (q119–q125, q131, q135–q137, q143–q146):
  * PII redaction, domain blocklist filtering, corpus-level line dedup,
  * character entropy, sequence packing + materialized packs, corpus
  * mixing, temperature resampling, edit-distance verification,
  * duplicated-window detection + removal, URL canonicalization + URL
  * dedup, Gopher quality + repetition signals, seeded epoch shuffle.
  *
  * The synthetic corpus contains no PII/URLs/newlines, so each query
  * first AUGMENTS the text deterministically from `doc_id` (emails,
  * IPs, URLs, line structure built by the same SQL in both engines) —
  * the oracle then checks the operator end-to-end on content that
  * actually exercises it, not on a vacuous all-zeros table.
  */
object CurationQueries {

  /** deterministic PII injection: one email + one IP per doc, an
    * SSN-shaped id on every third doc */
  private val piiAug =
    """concat(text, ' contact user', CAST(doc_id AS STRING),
      |'@example.com ip 10.', CAST(doc_id % 256 AS STRING), '.0.',
      |CAST((doc_id * 7) % 256 AS STRING),
      |CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END)""".stripMargin
  // single-line on purpose: these fragments interpolate into oracle
  // strings whose OUTER stripMargin would strip the first `|` of a
  // line-leading `||`, silently turning concat into bitwise-or
  private val piiAugSql =
    "text || ' contact user' || doc_id::VARCHAR || '@example.com ip 10.' || " +
      "(doc_id % 256)::VARCHAR || '.0.' || ((doc_id * 7) % 256)::VARCHAR || " +
      "(CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END)"

  /** deterministic URL injection: one of five site hosts (doc_id % 5)
    * plus a CDN host shared by every doc */
  private val urlAug =
    """concat(text, ' see https://site', CAST(doc_id % 5 AS STRING),
      |'.example.com/p/', CAST(doc_id AS STRING),
      |' and http://cdn.example.org/x')""".stripMargin
  private val urlAugSql =
    "text || ' see https://site' || (doc_id % 5)::VARCHAR || " +
      "'.example.com/p/' || doc_id::VARCHAR || ' and http://cdn.example.org/x'"

  /** deterministic line structure: original text, a footer shared by
    * EVERY doc (the boilerplate line dedup must strip), and a per-doc
    * unique line (so no doc dedups to empty) */
  private val lineAug =
    """concat(text, chr(10), 'shared boilerplate footer', chr(10),
      |'doc specific ', CAST(doc_id AS STRING))""".stripMargin
  private val lineAugSql =
    "text || chr(10) || 'shared boilerplate footer' || chr(10) || " +
      "'doc specific ' || doc_id::VARCHAR"

  /** deterministic repetition classes: doc_id % 4 selects the
    * duplication shape (0 duplicate lines, 1 a hammered 2-gram,
    * 2 a repeated 6-token phrase, 3 untouched). */
  private val repAug =
    """CASE CAST(doc_id % 4 AS INT)
      |WHEN 0 THEN concat(text, repeat(concat(chr(10), 'dup line body'), 4))
      |WHEN 1 THEN concat(text, repeat(' foo bar', 10))
      |WHEN 2 THEN concat(text, repeat(' p q r s t u', 5))
      |ELSE text END""".stripMargin

  /** deterministic Gopher-rule classes: doc_id % 7 selects which rule
    * the doc trips (0 bullets, 1 ellipses, 2 symbols, 3 too-short,
    * 4 non-alpha words, 5 too-long words, 6 stopword-guaranteed).
    * Written to the Spark/DuckDB common SQL subset (concat/repeat/chr)
    * so both engines build byte-identical texts. */
  private[queries] val gopherAug =
    """CASE CAST(doc_id % 7 AS INT)
      |WHEN 0 THEN concat(text, repeat(concat(chr(10), '• bullet item'), 10))
      |WHEN 1 THEN concat(text, repeat(concat(chr(10), 'trailing line...'), 5))
      |WHEN 2 THEN concat(text, ' ', repeat('# ', 5))
      |WHEN 3 THEN 'tiny doc'
      |WHEN 4 THEN repeat('num1 2345 ', 8)
      |WHEN 5 THEN repeat('extraordinarily sophisticated vocabularies ', 5)
      |ELSE concat(text, ' the of and that') END""".stripMargin
  private val gopherAugSql = gopherAug

  val defs: Map[String, Q] = Map(
    // ---- PII audit + redaction: counts from the original text, the
    // redacted text itself hash-compared end-to-end ----
    "q119_pii_redact" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.where(col("doc_id") < 100).sdf
        .selectExpr("doc_id", s"$piiAug AS text"))
      Curation.piiStats(aug, "text", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- domain extraction + blocklist filter: docs linking to
    // site0.example.com (doc_id % 5 = 0) are dropped, then the
    // surviving per-domain doc counts are compared ----
    "q120_domain_filter" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.sdf.selectExpr("doc_id", s"$urlAug AS text"))
      val kept = Curation.dropByDomain(aug, "text", Seq("site0.example.com"))
      new Df(Curation.extractDomains(kept, "text", "doc_id").sdf
        .groupBy(col("domain")).agg(count(lit(1)).as("n_docs")))
        .sortValues(Seq("domain")).sdf
    }),

    // ---- corpus-level exact line dedup (C4 rule): the shared footer
    // survives only in the globally-first doc; duplicated base texts
    // (the documents table has exact dups) keep one copy ----
    "q121_line_dedup" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.sdf.selectExpr("doc_id", s"$lineAug AS text"))
      Curation.dedupLines(aug, "text", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- character-distribution entropy quality signal ----
    "q122_char_entropy" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Curation.charEntropy(d.where(col("doc_id") < 200), "text", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- token-budget sequence packing: hash-shard then pack in id
    // order; global pack identity = (shard, pack) ----
    "q123_pack_sequences" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Curation.packSequences(d, "text", "doc_id", budget = 512, shards = 8)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- materialized training packs: the emit side of q123 — same
    // assignment, concatenated member text per (shard, pack) ----
    "q136_materialize_packs" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Curation.materializePacks(d, "text", "doc_id", budget = 512, shards = 8)
        .sortValues(Seq("shard", "pack")).sdf
    }),

    // ---- corpus mixing to target lang weights: T = min(n/w) caps the
    // total (never upsamples), hash rule picks the kept rows; es/zh
    // have no weight and are dropped entirely ----
    "q124_mix_corpora" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Curation.mixCorpora(d, "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
        .select("doc_id", "lang").sortValues(Seq("doc_id")).sdf
    }),

    // ---- temperature rebalancing at α = 0.5: every lang keeps
    // (n/nmin)^-0.5 of its rows, smallest lang keeps all ----
    "q143_temperature_resample" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Curation.temperatureResample(d, "lang", "doc_id", alpha = 0.5)
        .select("doc_id", "lang").sortValues(Seq("doc_id")).sdf
    }),

    // ---- Gopher rule-based quality signals: seven deterministic doc
    // classes (doc_id % 7) each trip one rule — bullet lines, ellipsis
    // lines, symbol ratio, word-count floor, non-alpha words, long
    // words, and a guaranteed-stopword class; thresholds tuned to the
    // ~25-word synthetic docs (minWords 10, maxWords 1000) ----
    "q144_gopher_quality" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.sdf.selectExpr("doc_id", s"$gopherAug AS text"))
      graft.operators.Quality.gopherQualityStats(aug, "text", "doc_id",
        minWords = 10, maxWords = 1000)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- token-budget selection: best docs by n_chars until the
    // running token total passes 15000 (just over half the corpus) —
    // distributed prefix sum, exact long arithmetic ----
    "q164_token_budget" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val withTok = new Df(d.sdf.withColumn("n_tokens",
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")))
      graft.operators.Curation.selectByTokenBudget(
        withTok, "n_chars", "n_tokens", "doc_id", budget = 15000L)
        .select("doc_id", "n_chars", "n_tokens", "cum_tokens")
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- fastText-style quality classifier APPLY: tokens hash into
    // 1024 feature buckets, a synthetic-but-deterministic weight table
    // ((bucket % 7 - 3)/10) broadcast-joins in, score = mean weight,
    // keep = score > 0 ----
    "q163_quality_classifier" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val w = new Df(s.range(0, 1024).selectExpr("id AS bucket",
        "CAST((id % 7) - 3 AS DOUBLE) / 10.0 AS weight"))
      graft.operators.Curation.hashedLinearScore(
        d.where(col("doc_id") < 300), "text", "doc_id", w, buckets = 1024)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- Gopher repetition signals: four deterministic classes
    // (doc_id % 4) — duplicated lines, a hammered 2-gram, a repeated
    // 6-token phrase (dup 5-windows), and untouched docs whose natural
    // repetition the oracle replays as-is ----
    "q145_gopher_repetition" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.sdf.selectExpr("doc_id", s"$repAug AS text"))
      val out = graft.operators.Quality
        .gopherRepetitionStats(aug, "text", "doc_id")
        .sortValues(Seq("doc_id"))
      out.sdf
    }),

    // ---- per-domain quota cap: five ~100-doc domains capped at 30
    // (deterministic md5-order picks), doc_id % 11 rows have NULL
    // domain and are all kept ----
    "q151_domain_quota" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.sdf.selectExpr("doc_id",
        """CASE WHEN doc_id % 11 = 0 THEN CAST(NULL AS STRING)
          |ELSE concat('site', CAST(doc_id % 5 AS STRING), '.example.com')
          |END AS domain""".stripMargin))
      Curation.domainQuotaCap(aug, "domain", "doc_id", cap = 30)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- seeded epoch shuffle: the training-data ordering primitive.
    // Epoch 3 under seed 42 — the oracle replays the exact md5 order,
    // proving the position column is the deterministic global ordinal
    // (not an engine artifact) ----
    "q146_epoch_shuffle" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Curation.epochShuffle(d, "doc_id", seed = 42L, epoch = 3)
        .select("position", "doc_id", "lang")
        .sortValues(Seq("position")).sdf
    }),

    // ---- edit-distance verification: the corpus has no near-dups
    // (min equal-length pair distance is 44), so near-dup VARIANTS are
    // injected — doc i+1000 = doc i plus an x-run of length i%40, an
    // exactly-known edit distance straddling the threshold. Candidates
    // pair each doc with its own variant (distance i%40: kept iff
    // ≤ 25) and with its neighbor's variant (unrelated texts — the
    // drop path) ----
    "q125_edit_distance" -> ((s, dir) => {
      val d = T(s, dir, "documents").where(col("doc_id") < 80)
      val base = d.sdf.select(col("doc_id"), col("text"))
      val vars = d.sdf.select((col("doc_id") + 1000).as("doc_id"),
        concat(col("text"),
          expr("repeat('x', CAST(doc_id % 40 AS INT))")).as("text"))
      val corpus = new Df(base.union(vars))
      val cand = new Df(
        d.sdf.select(col("doc_id").as("id_a"), (col("doc_id") + 1000).as("id_b"))
          .union(d.sdf.select(col("doc_id").as("id_a"),
            (lit(1000L) + (col("doc_id") + 1) % 80).as("id_b"))))
      graft.operators.Dedup.editDistancePairs(cand, corpus, "text", "doc_id",
        maxDist = 25)
        .sortValues(Seq("id_a", "id_b")).sdf
    }),

    // ---- exact duplicated-window detection (Lee et al. substring
    // dedup). The corpus's own exact dups mark full docs; injected
    // variants (original text + a unique tail) exercise the PARTIAL
    // span-union path: the variant's prefix windows are duplicated
    // against its original, the tail-straddling ones are not ----
    "q131_dup_windows" -> ((s, dir) => {
      val d = T(s, dir, "documents").where(col("doc_id") < 150)
      val aug = new Df(d.sdf.select(col("doc_id"), col("text"))
        .union(d.sdf.select((col("doc_id") + 2000).as("doc_id"),
          concat(col("text"), lit(" zq tail marker "),
            col("doc_id").cast("string")).as("text"))))
      graft.operators.Dedup.duplicatedWindows(aug, "text", "doc_id", k = 10)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- duplicated-window REMOVAL (the Lee et al. rewrite over the
    // q131 corpus): originals keep their text (first occurrence wins by
    // (doc_id, start)), variants lose the duplicated prefix spans and
    // keep their unique tails; corpus-inherent exact dups collapse to
    // one surviving copy ----
    "q137_remove_dup_windows" -> ((s, dir) => {
      val d = T(s, dir, "documents").where(col("doc_id") < 150)
      val aug = new Df(d.sdf.select(col("doc_id"), col("text"))
        .union(d.sdf.select((col("doc_id") + 2000).as("doc_id"),
          concat(col("text"), lit(" zq tail marker "),
            col("doc_id").cast("string")).as("text"))))
      graft.operators.Dedup.removeDuplicatedWindows(aug, "text", "doc_id", k = 10)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- URL canonicalization + URL dedup (the CommonCrawl-style
    // pre-content key): four waves of the same logical URL in
    // different disguises (www + default port + upper-cased authority +
    // tracking params + fragment + trailing slash + percent-encoded
    // unreserved path char + doubled www) must collapse to one
    // canonical row each; a fifth wave's registrable `www.com` host
    // must SURVIVE the www-strip (the guard), with its `%7e` decoding
    // to `~`; NULL urls are all kept ----
    "q135_url_dedup" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val aug = new Df(d.where(col("doc_id") < 500).sdf.selectExpr("doc_id",
        """CASE (doc_id div 100)
          |WHEN 0 THEN concat('https://www.site',
          |  CAST((doc_id % 100) % 7 AS STRING), '.example.com/p/',
          |  CAST(doc_id % 100 AS STRING))
          |WHEN 1 THEN concat('HTTPS://SITE',
          |  CAST((doc_id % 100) % 7 AS STRING), '.EXAMPLE.COM:443/p/',
          |  CAST(doc_id % 100 AS STRING))
          |WHEN 2 THEN concat('https://site',
          |  CAST((doc_id % 100) % 7 AS STRING), '.example.com/p/',
          |  CAST(doc_id % 100 AS STRING), '/?utm_source=a&gclid=xyz#sec')
          |WHEN 3 THEN concat('https://www.www.site',
          |  CAST((doc_id % 100) % 7 AS STRING), '.example.com/%70/',
          |  CAST(doc_id % 100 AS STRING))
          |ELSE concat('https://www.com/%7e', CAST(doc_id % 100 AS STRING))
          |END AS url""".stripMargin)
        .union(d.where(col("doc_id") < 10).sdf
          .selectExpr("doc_id + 500 AS doc_id", "CAST(NULL AS STRING) AS url")))
      Curation.dedupByUrl(aug, "url", "doc_id")
        .sortValues(Seq("doc_id")).sdf
    }))

  /** DuckDB replay of [[Curation.normalizeUrl]]'s percent-encoding
    * pass, folded from the SAME tables the operator folds over
    * ([[Curation.PctHexLetters]] / [[Curation.PctDecode]]) — the
    * escape set can never drift between the engines. */
  private def pctSql(e: String): String = {
    val u1 = Curation.PctHexLetters.foldLeft(e)((acc, ch) =>
      s"replace($acc, '%$ch', '%${ch.toUpper}')")
    val u2 = Curation.PctHexLetters.foldLeft(u1)((acc, ch) =>
      s"regexp_replace($acc, '%([0-9A-F])$ch', '%\\1${ch.toUpper}', 'g')")
    val full = Curation.PctDecode.foldLeft(u2) { case (acc, (esc, chr)) =>
      s"replace($acc, '$esc', '$chr')" }
    // same '%' gate as the operator (the chain is the identity on a
    // '%'-free string, so the gate is semantics-preserving)
    s"CASE WHEN strpos($e, '%') > 0 THEN $full ELSE $e END"
  }

  val oracles: Map[String, String] = Map(
    // single-window replay of the distributed prefix sum (the total
    // order (n_chars DESC, doc_id) makes them identical); HUGEINT
    // window sum cast back to BIGINT
    "q164_token_budget" ->
      s"""WITH d AS (SELECT doc_id, n_chars,
         |  len(${ExtensionQueries.toksSql()})::BIGINT AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_chars, n_tokens,
         |  COALESCE(SUM(n_tokens) OVER (ORDER BY n_chars DESC NULLS LAST, doc_id
         |    ROWS UNBOUNDED PRECEDING), 0)::BIGINT AS cum_tokens FROM d)
         |SELECT doc_id, n_chars, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= 15000 ORDER BY doc_id""".stripMargin,
    // the weight table IS the formula, so the oracle inlines it:
    // bucket = md5-hash32 % 1024, weight = ((bucket % 7) - 3)/10,
    // mean through an exact DECIMAL(18,2) sum
    "q163_quality_classifier" ->
      s"""WITH toks AS (SELECT doc_id, UNNEST(${ExtensionQueries.toksSql()}) AS tok
         |  FROM documents WHERE doc_id < 300),
         |w AS (SELECT doc_id,
         |  CAST(((('0x' || substr(md5(tok),1,8))::BIGINT % 1024) % 7) - 3 AS DOUBLE)
         |    / 10.0 AS weight FROM toks)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |ROUND(CAST(SUM(CAST(weight AS DECIMAL(18,2))) AS DOUBLE)
         |  / COUNT(*), 6) AS score,
         |(ROUND(CAST(SUM(CAST(weight AS DECIMAL(18,2))) AS DOUBLE)
         |  / COUNT(*), 6) > 0) AS keep
         |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // patterns are single-sourced from Curation.* so the oracle can
    // never drift from the operator; counts via len(regexp_extract_all),
    // replacement with the 'g' flag (DuckDB defaults to first-match)
    "q119_pii_redact" ->
      s"""WITH src AS (SELECT doc_id, $piiAugSql AS text
         |FROM documents WHERE doc_id < 100)
         |SELECT doc_id,
         |len(regexp_extract_all(text, '${Curation.EmailRe}')) AS n_emails,
         |len(regexp_extract_all(text, '${Curation.Ipv4Re}')) AS n_ips,
         |len(regexp_extract_all(text, '${Curation.IdRe}')) AS n_ids,
         |regexp_replace(regexp_replace(regexp_replace(text,
         |  '${Curation.EmailRe}', '<EMAIL>', 'g'),
         |  '${Curation.Ipv4Re}', '<IP>', 'g'),
         |  '${Curation.IdRe}', '<ID>', 'g') AS redacted
         |FROM src ORDER BY doc_id""".stripMargin,
    "q120_domain_filter" ->
      s"""WITH src AS (SELECT doc_id, $urlAugSql AS t FROM documents),
         |doms AS (SELECT doc_id, UNNEST(list_distinct(
         |  regexp_extract_all(t, '${Curation.UrlDomainRe}', 1))) AS domain
         |  FROM src),
         |blocked AS (SELECT DISTINCT doc_id FROM doms
         |  WHERE domain IN ('site0.example.com'))
         |SELECT domain, COUNT(*) AS n_docs FROM doms
         |WHERE doc_id NOT IN (SELECT doc_id FROM blocked)
         |GROUP BY domain ORDER BY domain""".stripMargin,
    // joins on the 32-bit md5-prefix line hash EXACTLY like the
    // operator (the q114 convention: raw-string comparison would
    // diverge from the operator on any 2^-32 hash collision)
    "q121_line_dedup" ->
      s"""WITH src AS (SELECT doc_id, $lineAugSql AS t FROM documents),
         |ls0 AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM src),
         |lx AS (SELECT doc_id, UNNEST(range(len(ls))) AS p, ls FROM ls0),
         |l AS (SELECT doc_id, p::INT AS pos, ls[(p+1)::INT] AS line FROM lx),
         |h AS (SELECT doc_id, pos, line,
         |  ('0x' || substr(md5(line),1,8))::BIGINT AS lh FROM l),
         |kept AS (SELECT * FROM h
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY lh ORDER BY doc_id, pos) = 1),
         |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
         |  string_agg(line, chr(10) ORDER BY pos) AS text
         |  FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM h GROUP BY doc_id)
         |SELECT tot.doc_id, tot.n_lines,
         |COALESCE(reb.n_kept, 0)::BIGINT AS n_kept,
         |COALESCE(reb.text, '') AS text
         |FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id
         |ORDER BY tot.doc_id""".stripMargin,
    // H = ln n − (Σ ct·ln ct)/n with decimal-cast terms (order-
    // independent sum) and ROUND 4 absorbing the libm ulp spread
    "q122_char_entropy" ->
      """WITH ch AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '(?s).')) AS c
        |  FROM documents WHERE doc_id < 200),
        |pc AS (SELECT doc_id, c, COUNT(*) AS ct FROM ch GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(ct) AS BIGINT) AS n_chars,
        |ROUND(LN(CAST(SUM(ct) AS DOUBLE)) -
        |  CAST(SUM(CAST(ct * LN(ct::DOUBLE) AS DECIMAL(28,10))) AS DOUBLE)
        |  / SUM(ct), 4) + 0.0 AS entropy
        |FROM pc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // whitespace-run token count (the toksSql convention) + the same
    // md5-prefix hash shard as Df.splitByHash; prefix sum BEFORE the
    // doc, integral // division — mirrors packSequences exactly
    "q123_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), w -> w <> ''))::BIGINT AS n_tokens,
        |  (('0x' || substr(md5(doc_id::VARCHAR),1,8))::BIGINT % 8)::INT AS shard
        |  FROM documents),
        |p AS (SELECT doc_id, n_tokens, shard,
        |  SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS pre
        |  FROM d)
        |SELECT doc_id, n_tokens, shard, (pre // 512)::BIGINT AS pack
        |FROM p ORDER BY doc_id""".stripMargin,
    // q123's assignment pipeline + join back to text + per-(shard,pack)
    // rollup; string_agg ORDER BY doc_id ≡ the Spark side's
    // array_sort(collect_list(struct(doc_id, text))); token-less docs
    // excluded like the operator (they'd otherwise form an unbounded
    // same-pack group)
    "q136_materialize_packs" ->
      """WITH d AS (SELECT doc_id, text,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), w -> w <> ''))::BIGINT AS n_tokens,
        |  (('0x' || substr(md5(doc_id::VARCHAR),1,8))::BIGINT % 8)::INT AS shard
        |  FROM documents),
        |p AS (SELECT doc_id, text, n_tokens, shard,
        |  SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS pre
        |  FROM d)
        |SELECT shard, (pre // 512)::BIGINT AS pack, COUNT(*) AS n_docs,
        |SUM(n_tokens)::BIGINT AS n_tokens,
        |string_agg(text, ' ' ORDER BY doc_id) AS text
        |FROM p WHERE n_tokens > 0 GROUP BY shard, (pre // 512)
        |ORDER BY shard, pack""".stripMargin,

    // same arithmetic ORDER as mixCorpora: T = MIN(n/w), f = w*T/n
    // capped at 1, keep iff hash-bucket < ROUND(f·buckets) — every
    // step double-typed (a bare 0.5 literal is DECIMAL in DuckDB and
    // would change the arithmetic)
    // POW differs from the JVM in the last ulp; both sides ROUND the
    // keep fraction to 6 decimals before thresholding (operator
    // scaladoc), so the replay is exact
    "q143_temperature_resample" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY lang),
        |m AS (SELECT MIN(n) AS nmin FROM c),
        |f AS (SELECT lang, ROUND(LEAST(
        |  POW(CAST(n AS DOUBLE) / CAST((SELECT nmin FROM m) AS DOUBLE), -0.5),
        |  CAST(1.0 AS DOUBLE)), 6) AS f FROM c)
        |SELECT d.doc_id, d.lang FROM documents d JOIN f ON d.lang = f.lang
        |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR),1,8))::BIGINT % 10000
        |  < CAST(ROUND(f.f * 10000) AS BIGINT)
        |ORDER BY d.doc_id""".stripMargin,
    // full rule-battery replay: same tokenizer, same replace-and-measure
    // symbol counts, ratios rounded 6dp; threshold literals cast to
    // DOUBLE (bare decimals are DECIMAL in DuckDB and would compare in
    // decimal arithmetic)
    "q144_gopher_quality" ->
      s"""WITH src AS (SELECT doc_id, $gopherAugSql AS text FROM documents),
         |d AS (SELECT doc_id, text, ${ExtensionQueries.toksSql()} AS toks,
         |  string_split(text, chr(10)) AS lines FROM src),
         |m AS (SELECT doc_id, len(toks)::BIGINT AS n_words, len(lines) AS n_lines,
         |  CASE WHEN len(toks) > 0 THEN
         |    ROUND(list_sum(list_transform(toks, w -> length(w)))::DOUBLE
         |      / len(toks), 6) END AS avg_word_len,
         |  (length(text) - length(replace(text, '#', '')))::BIGINT
         |    + (length(text) - length(replace(text, '…', '')))::BIGINT
         |    + ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT
         |    AS n_symbols,
         |  len(list_filter(lines, l -> starts_with(l, '•')
         |    OR starts_with(l, '- '))) AS n_bullet,
         |  len(list_filter(lines, l -> ends_with(l, '...')
         |    OR ends_with(l, '…'))) AS n_ellipsis,
         |  len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
         |  len(list_filter(toks, w -> list_contains(
         |    ['the','be','to','of','and','that','have','with'], w)))::BIGINT
         |    AS n_stopwords
         |FROM d),
         |r AS (SELECT doc_id, n_words, avg_word_len,
         |  CASE WHEN n_words > 0
         |    THEN ROUND(n_symbols::DOUBLE / n_words, 6) END AS symbol_word_ratio,
         |  ROUND(n_bullet::DOUBLE / n_lines, 6) AS bullet_line_fraction,
         |  ROUND(n_ellipsis::DOUBLE / n_lines, 6) AS ellipsis_line_fraction,
         |  CASE WHEN n_words > 0
         |    THEN ROUND(n_alpha::DOUBLE / n_words, 6) END AS alpha_word_fraction,
         |  n_stopwords FROM m)
         |SELECT doc_id, n_words, avg_word_len, symbol_word_ratio,
         |  bullet_line_fraction, ellipsis_line_fraction, alpha_word_fraction,
         |  n_stopwords,
         |  COALESCE(n_words BETWEEN 10 AND 1000
         |    AND avg_word_len BETWEEN CAST(3.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE)
         |    AND symbol_word_ratio <= CAST(0.1 AS DOUBLE)
         |    AND bullet_line_fraction <= CAST(0.9 AS DOUBLE)
         |    AND ellipsis_line_fraction <= CAST(0.3 AS DOUBLE)
         |    AND alpha_word_fraction >= CAST(0.8 AS DOUBLE)
         |    AND n_stopwords >= 2, false) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    // full repetition replay: line family from list exprs, top-2-gram
    // argmax via ROW_NUMBER (≡ Spark's max(struct(cnt, gchars, gram))
    // — gchars is monotone in length(g)), dup-5-window coverage via
    // the q131 hash + position-union machinery scoped per doc
    "q145_gopher_repetition" ->
      s"""WITH src AS (SELECT doc_id, $repAug AS text FROM documents),
         |d AS (SELECT doc_id, ${ExtensionQueries.toksSql()} AS toks,
         |  string_split(text, chr(10)) AS lines FROM src),
         |b AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         |  CASE WHEN len(toks) > 0 THEN
         |    list_sum(list_transform(toks, w -> length(w)))::BIGINT
         |    ELSE 0 END AS tokchars,
         |  ROUND((len(lines) - len(list_distinct(lines)))::DOUBLE
         |    / len(lines), 6) AS dup_line_fraction,
         |  CASE WHEN COALESCE(list_sum(list_transform(lines, l -> length(l))), 0) > 0
         |    THEN ROUND((list_sum(list_transform(lines, l -> length(l)))
         |      - COALESCE(list_sum(list_transform(list_distinct(lines),
         |          l -> length(l))), 0))::DOUBLE
         |      / list_sum(list_transform(lines, l -> length(l))), 6)
         |    ELSE CAST(0.0 AS DOUBLE) END AS dup_line_char_fraction
         |  FROM d),
         |g2 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
         |    list_transform(range(len(toks) - 1),
         |      i -> array_to_string(toks[i+1:i+2], ' '))
         |    ELSE []::VARCHAR[] END) AS g FROM d),
         |c2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY doc_id, g),
         |r2 AS (SELECT doc_id, cnt, (length(g) - 1)::BIGINT AS gchars,
         |  ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY cnt DESC, length(g) DESC, g DESC) AS rn FROM c2),
         |top2 AS (SELECT doc_id, (cnt * gchars)::BIGINT AS topchars
         |  FROM r2 WHERE rn = 1),
         |w5 AS (SELECT doc_id, CASE WHEN len(toks) >= 5 THEN
         |    list_transform(range(len(toks) - 4), i ->
         |      ('0x' || substr(md5(array_to_string(toks[i+1:i+5], ' ')),1,8))::BIGINT)
         |    ELSE []::BIGINT[] END AS whs FROM d),
         |wse AS (SELECT doc_id, unnest(range(len(whs))) AS start, whs FROM w5),
         |wh AS (SELECT doc_id, start, whs[(start+1)::INT] AS h FROM wse),
         |ds AS (SELECT doc_id, start FROM (SELECT doc_id, start,
         |  COUNT(*) OVER (PARTITION BY doc_id, h) AS c FROM wh) WHERE c > 1),
         |pos AS (SELECT DISTINCT doc_id, p FROM
         |  (SELECT doc_id, unnest(range(start, start + 5)) AS p FROM ds)),
         |tp AS (SELECT doc_id, unnest(range(len(toks))) AS p, toks FROM d),
         |tl AS (SELECT doc_id, p, length(toks[(p+1)::INT])::BIGINT AS l FROM tp),
         |cov AS (SELECT tl.doc_id, SUM(tl.l)::BIGINT AS covchars FROM tl
         |  JOIN pos ON tl.doc_id = pos.doc_id AND tl.p = pos.p
         |  GROUP BY tl.doc_id)
         |SELECT b.doc_id, b.n_tokens, b.dup_line_fraction,
         |  b.dup_line_char_fraction,
         |  CASE WHEN b.tokchars > 0 THEN
         |    ROUND(COALESCE(top2.topchars, 0)::DOUBLE / b.tokchars, 6)
         |    ELSE CAST(0.0 AS DOUBLE) END AS top_ngram_char_fraction,
         |  CASE WHEN b.tokchars > 0 THEN
         |    ROUND(COALESCE(cov.covchars, 0)::DOUBLE / b.tokchars, 6)
         |    ELSE CAST(0.0 AS DOUBLE) END AS dup_ngram_char_fraction,
         |  (b.dup_line_fraction <= CAST(0.3 AS DOUBLE)
         |   AND b.dup_line_char_fraction <= CAST(0.2 AS DOUBLE)
         |   AND CASE WHEN b.tokchars > 0 THEN
         |     ROUND(COALESCE(top2.topchars, 0)::DOUBLE / b.tokchars, 6)
         |     ELSE CAST(0.0 AS DOUBLE) END <= CAST(0.2 AS DOUBLE)
         |   AND CASE WHEN b.tokchars > 0 THEN
         |     ROUND(COALESCE(cov.covchars, 0)::DOUBLE / b.tokchars, 6)
         |     ELSE CAST(0.0 AS DOUBLE) END <= CAST(0.15 AS DOUBLE)) AS keep
         |FROM b LEFT JOIN top2 ON b.doc_id = top2.doc_id
         |LEFT JOIN cov ON b.doc_id = cov.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    // rank everywhere ≡ the operator's two-phase split: under-quota
    // domains have every rn <= cap by construction
    "q151_domain_quota" ->
      """WITH src AS (SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN NULL
        |  ELSE 'site' || (doc_id % 5)::VARCHAR || '.example.com'
        |  END AS domain FROM documents),
        |ranked AS (SELECT doc_id, domain, ROW_NUMBER() OVER (
        |  PARTITION BY domain ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |  FROM src WHERE domain IS NOT NULL)
        |SELECT doc_id, domain FROM ranked WHERE rn <= 30
        |UNION ALL SELECT doc_id, domain FROM src WHERE domain IS NULL
        |ORDER BY doc_id""".stripMargin,

    // exact order replay: ROW_NUMBER over (md5 key, id) — byte-equal
    // key strings on both engines, so the permutation is identical
    "q146_epoch_shuffle" ->
      """SELECT ROW_NUMBER() OVER (
        |    ORDER BY md5(concat_ws(':', 42, 3, doc_id)), doc_id) - 1
        |  AS position, doc_id, lang
        |FROM documents ORDER BY position""".stripMargin,

    "q124_mix_corpora" ->
      """WITH mixw(lang, wt) AS (VALUES
        |  ('en', 0.5::DOUBLE), ('de', 0.25::DOUBLE), ('fr', 0.25::DOUBLE)),
        |c AS (SELECT d.lang, COUNT(*) AS n, ANY_VALUE(wt) AS wt
        |  FROM documents d JOIN mixw ON d.lang = mixw.lang GROUP BY d.lang),
        |t AS (SELECT MIN(n / wt) AS t FROM c),
        |f AS (SELECT lang, LEAST(wt * (SELECT t FROM t) / n, CAST(1.0 AS DOUBLE)) AS f
        |  FROM c)
        |SELECT d.doc_id, d.lang FROM documents d JOIN f ON d.lang = f.lang
        |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR),1,8))::BIGINT % 10000
        |  < CAST(ROUND(f.f * 10000) AS BIGINT)
        |ORDER BY d.doc_id""".stripMargin,
    // unthresholded levenshtein + WHERE <= 25 ≡ Spark's banded
    // levenshtein(l, r, 25) with the -1 rows filtered; two empty texts
    // would score 1.0 (the ANSI 0/0 guard)
    "q125_edit_distance" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 80),
        |v AS (SELECT doc_id + 1000 AS doc_id,
        |  text || repeat('x', (doc_id % 40)::INT) AS text FROM d),
        |corpus AS (SELECT * FROM d UNION ALL SELECT * FROM v),
        |cand AS (SELECT doc_id AS id_a, doc_id + 1000 AS id_b FROM d
        |  UNION ALL SELECT doc_id AS id_a, 1000 + (doc_id + 1) % 80 AS id_b FROM d),
        |p AS (SELECT id_a, id_b, a.text AS ta, b.text AS tb FROM cand
        |  JOIN corpus a ON cand.id_a = a.doc_id
        |  JOIN corpus b ON cand.id_b = b.doc_id)
        |SELECT id_a, id_b, levenshtein(ta, tb)::INT AS edit_dist,
        |(CASE WHEN GREATEST(length(ta), length(tb)) > 0
        |  THEN ROUND(CAST(1.0 AS DOUBLE) - levenshtein(ta, tb)::DOUBLE
        |    / GREATEST(length(ta), length(tb)), 6)
        |  ELSE CAST(1.0 AS DOUBLE) END) AS edit_sim
        |FROM p WHERE levenshtein(ta, tb) <= 25 ORDER BY id_a, id_b""".stripMargin,
    // window hashes = md5-prefix of the space-joined 10-token window
    // (the q114/q121 hash convention); duplicated = global count > 1;
    // coverage = interval union of equal-length windows via LAG
    "q131_dup_windows" ->
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 150
         |  UNION ALL
         |  SELECT doc_id + 2000, text || ' zq tail marker ' || doc_id::VARCHAR
         |  FROM documents WHERE doc_id < 150),
         |d AS (SELECT doc_id, ${ExtensionQueries.toksSql()} AS toks FROM src),
         |t AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         |  CASE WHEN len(toks) >= 10 THEN list_transform(range(len(toks) - 9),
         |    i -> ('0x' || substr(md5(array_to_string(toks[i+1:i+10], ' ')),1,8))::BIGINT)
         |  ELSE []::BIGINT[] END AS whs FROM d),
         |w AS (SELECT doc_id, UNNEST(range(len(whs))) AS start, whs FROM t),
         |wh AS (SELECT doc_id, start, whs[(start+1)::INT] AS h FROM w),
         |dup AS (SELECT h FROM wh GROUP BY h HAVING COUNT(*) > 1),
         |dw AS (SELECT doc_id, start FROM wh WHERE h IN (SELECT h FROM dup)),
         |lagd AS (SELECT doc_id, start,
         |  LAG(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev FROM dw),
         |cov AS (SELECT doc_id, COUNT(*) AS n_dup_windows,
         |  SUM(CASE WHEN prev IS NULL THEN 10
         |      ELSE LEAST(10, start - prev) END) AS covered
         |  FROM lagd GROUP BY doc_id)
         |SELECT t.doc_id, t.n_tokens, len(t.whs)::BIGINT AS n_windows,
         |COALESCE(cov.n_dup_windows, 0)::BIGINT AS n_dup_windows,
         |ROUND(COALESCE(cov.covered, 0)::DOUBLE / GREATEST(t.n_tokens, 1), 6)
         |  AS dup_token_fraction
         |FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    // removal replay: non-first window instances (ROW_NUMBER over
    // (doc_id, start) per hash ≡ the operator's min(struct) argmin) →
    // LAG-merged disjoint spans → removed positions relationally
    // (UNNEST range) → rebuild via string_agg of the kept tokens
    "q137_remove_dup_windows" ->
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 150
         |  UNION ALL
         |  SELECT doc_id + 2000, text || ' zq tail marker ' || doc_id::VARCHAR
         |  FROM documents WHERE doc_id < 150),
         |d AS (SELECT doc_id, ${ExtensionQueries.toksSql()} AS toks FROM src),
         |t AS (SELECT doc_id, toks, len(toks)::BIGINT AS n_tokens,
         |  CASE WHEN len(toks) >= 10 THEN list_transform(range(len(toks) - 9),
         |    i -> ('0x' || substr(md5(array_to_string(toks[i+1:i+10], ' ')),1,8))::BIGINT)
         |  ELSE []::BIGINT[] END AS whs FROM d),
         |w AS (SELECT doc_id, UNNEST(range(len(whs))) AS start, whs FROM t),
         |wh AS (SELECT doc_id, start, whs[(start+1)::INT] AS h FROM w),
         |rw AS (SELECT doc_id, start FROM (
         |  SELECT doc_id, start,
         |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
         |  FROM wh) WHERE rn > 1),
         |g AS (SELECT doc_id, start,
         |  SUM(CASE WHEN prev IS NULL OR start - prev > 10 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY start) AS grp
         |  FROM (SELECT doc_id, start,
         |    LAG(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev FROM rw)),
         |ivs AS (SELECT doc_id, grp, MIN(start) AS lo, MAX(start) + 10 AS hi
         |  FROM g GROUP BY doc_id, grp),
         |rp AS (SELECT doc_id, UNNEST(range(lo, hi)) AS pos FROM ivs),
         |tok AS (SELECT doc_id, UNNEST(range(len(toks))) AS pos, toks FROM t),
         |kept AS (SELECT k.doc_id, k.pos, k.toks[(k.pos+1)::INT] AS tk FROM tok k
         |  WHERE NOT EXISTS (SELECT 1 FROM rp
         |    WHERE rp.doc_id = k.doc_id AND rp.pos = k.pos)),
         |reb AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS text
         |  FROM kept GROUP BY doc_id),
         |nrm AS (SELECT doc_id, SUM(hi - lo)::BIGINT AS n_tokens_removed
         |  FROM ivs GROUP BY doc_id)
         |SELECT t.doc_id, COALESCE(reb.text, '') AS text, t.n_tokens,
         |COALESCE(nrm.n_tokens_removed, 0)::BIGINT AS n_tokens_removed
         |FROM t LEFT JOIN reb ON t.doc_id = reb.doc_id
         |LEFT JOIN nrm ON t.doc_id = nrm.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    // the SAME gated path/query-split pipeline as Curation.normalizeUrl,
    // with DuckDB's \1 backreference syntax (Java uses $1) and the 'g'
    // flag (Spark regexp_replace is global by default): fragment →
    // percent-encoding normalization (pctSql, folded from the
    // operator's own tables) → lowercase authority → guarded www strip
    // + ports → split at first '?' → path rules (trailing slashes,
    // lone root slash) / query rules (tracking params, && collapse,
    // dangling separators) → no-scheme inputs returned verbatim
    "q135_url_dedup" ->
      s"""WITH src AS (
        |  SELECT doc_id, CASE (doc_id // 100)
        |    WHEN 0 THEN 'https://www.site' || ((doc_id % 100) % 7)::VARCHAR
        |      || '.example.com/p/' || (doc_id % 100)::VARCHAR
        |    WHEN 1 THEN 'HTTPS://SITE' || ((doc_id % 100) % 7)::VARCHAR
        |      || '.EXAMPLE.COM:443/p/' || (doc_id % 100)::VARCHAR
        |    WHEN 2 THEN 'https://site' || ((doc_id % 100) % 7)::VARCHAR
        |      || '.example.com/p/' || (doc_id % 100)::VARCHAR
        |      || '/?utm_source=a&gclid=xyz#sec'
        |    WHEN 3 THEN 'https://www.www.site' || ((doc_id % 100) % 7)::VARCHAR
        |      || '.example.com/%70/' || (doc_id % 100)::VARCHAR
        |    ELSE 'https://www.com/%7e' || (doc_id % 100)::VARCHAR
        |    END AS url
        |  FROM documents WHERE doc_id < 500
        |  UNION ALL
        |  SELECT doc_id + 500, NULL FROM documents WHERE doc_id < 10),
        |nf AS (SELECT doc_id, url,
        |  regexp_replace(url, '#.*$$', '', 'g') AS u0 FROM src),
        |p AS (SELECT doc_id, url, ${pctSql("u0")} AS pu FROM nf),
        |h AS (SELECT doc_id, url, pu,
        |  regexp_extract(pu, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0) AS head
        |  FROM p),
        |a AS (SELECT doc_id, url, head,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    lower(head) || substr(pu, length(head) + 1),
        |    '^(https?://)(www\\.)+([^/:?#]*\\.[^/:?#]+)', '\\1\\3', 'g'),
        |    '^(http://[^/:?#]+):80([/?]|$$)', '\\1\\2', 'g'),
        |    '^(https://[^/:?#]+):443([/?]|$$)', '\\1\\2', 'g') AS auth
        |  FROM h),
        |s AS (SELECT doc_id, url, head, auth, strpos(auth, '?') AS qpos FROM a),
        |bq AS (SELECT doc_id, url, head,
        |  regexp_replace(regexp_replace(
        |    CASE WHEN qpos > 0 THEN substr(auth, 1, qpos - 1) ELSE auth END,
        |    '(://[^/?#]*/[^?#]*?)/+$$', '\\1', 'g'),
        |    '^(https?://[^/?#]+)/$$', '\\1', 'g') AS base,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    CASE WHEN qpos > 0 THEN substr(auth, qpos) ELSE '' END,
        |    '([?&])(utm_[A-Za-z]+|gclid|fbclid)=[^&#]*', '\\1', 'g'),
        |    '&&+', '&', 'g'),
        |    '^\\?&+', '?', 'g'),
        |    '[?&]+$$', '', 'g') AS query
        |  FROM s),
        |c9 AS (SELECT doc_id,
        |  CASE WHEN head = '' THEN url ELSE base || query END AS u FROM bq),
        |keyed AS (SELECT MIN(doc_id) AS doc_id, u AS canonical_url,
        |  COUNT(*) AS n_copies FROM c9 WHERE u IS NOT NULL GROUP BY u),
        |nulls AS (SELECT doc_id, u AS canonical_url, 1::BIGINT AS n_copies
        |  FROM c9 WHERE u IS NULL)
        |SELECT * FROM keyed UNION ALL SELECT * FROM nulls
        |ORDER BY doc_id""".stripMargin)
}
