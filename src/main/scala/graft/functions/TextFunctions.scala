package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines (north star in /root/repo/BASELINE.json — beyond the
  * reference's surface, which has no string functions at all,
  * SURVEY.md §2.4 "Not implemented").
  *
  * Everything here is a composition of codegen'd Catalyst expressions
  * (no UDFs): it stays inside whole-stage codegen and scales linearly
  * with no shuffle. Cross-engine-portable building blocks (md5-based
  * hashes) are chosen so DuckDB oracles can replicate results bit-for-bit.
  */
object TextFunctions {

  /** whitespace tokenizer: any whitespace run is one separator, empty
    * tokens are dropped. A bare split on ' ' would emit "" tokens on
    * double spaces and glue words across tabs/newlines — inflating
    * every token count and feeding the degenerate empty-string shingle
    * (the classic LSH hot-bucket) on any real corpus. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  def charCount(c: Column): Column = length(c)

  /** portable 32-bit token/shingle hash: first 8 hex chars of md5.
    * (Spark's builtin `hash()` is Murmur3 with Spark-specific seeds —
    * deliberately avoided so external engines can reproduce results.) */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** 60-bit variant (15 hex chars) for SimHash bit sampling. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** fraction of tokens that are stopwords; NULL for token-less docs
    * (an unguarded 0/0 THROWS under ANSI mode — a single empty doc in a
    * 100 TB corpus must not kill the job). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(c)
    val stops = filter(toks, t => t.isin(stopwords.map(x => x: Any): _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks))
  }

  /** mean token length in characters; NULL for token-less docs (see
    * [[stopwordRatio]] — ANSI division-by-zero guard). */
  def avgTokenLen(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
  }

  /** heuristic language ID. The driver's synthetic corpus is an
    * English-word salad, so the shipped profile is marker-word based
    * (presence of English function words); real deployments swap in
    * per-language marker sets via the `markers` argument. */
  def langId(c: Column,
             markers: Map[String, Seq[String]] = Map("en" -> Seq("the", "a"))): Column = {
    val toks = tokens(c)
    markers.foldLeft(lit("unknown")) { case (acc, (lang, words)) =>
      when(size(filter(toks, t => t.isin(words.map(x => x: Any): _*))) > 0, lang)
        .otherwise(acc)
    }
  }

  /** composite quality score in [0,1]: length saturation + stopword
    * presence + token-length sanity. Deterministic, portable. NULL for
    * token-less docs (the ratio terms are NULL) — a quality FILTER
    * (`quality >= t`) then drops them, which is the right default for
    * a curation pipeline. */
  def qualityScore(c: Column, stopwords: Seq[String] = Seq("the", "a")): Column =
    round(
      least(tokenCount(c).cast("double") / 100.0, lit(1.0)) * 0.4 +
        least(stopwordRatio(c, stopwords) * 5.0, lit(1.0)) * 0.3 +
        least(avgTokenLen(c) / 10.0, lit(1.0)) * 0.3,
      6)

  /** BPE-ish regex token count: letter runs, digit runs, and single
    * non-alphanumeric marks as separate pieces (the GPT-2 pre-tokenizer
    * shape, without the merges table). A closer proxy than whitespace
    * counting for "how many tokens will the trainer see"; the pattern is
    * valid in both Java regex and RE2, so oracles replicate exactly. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Rabin–Karp rolling-hash fingerprint over the token STREAM — order-
    * sensitive, unlike [[fingerprint]]'s set hash ("a b" ≠ "b a"): a
    * Horner fold `h = (h·B + hash(tok)) mod M` of portable 32-bit token
    * hashes. B=131, M=2^31−1 keep every intermediate < 2^39 — no 64-bit
    * overflow on any engine. One codegen'd `aggregate`, no shuffle. */
  def rollingFingerprint(c: Column, base: Long = 131L,
                         mod: Long = 2147483647L): Column =
    aggregate(transform(tokens(c), t => hash32(t) % mod),
      lit(0L), (acc, t) => (acc * base + t) % mod)

  /** canonical document fingerprint: md5 of the sorted distinct token
    * set — whitespace/order/duplication-insensitive exact-dedup key. */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))).cast("binary"))

  /** ALL word n-grams in stream order (duplicates kept — repetition
    * analysis needs them): `slice` windows over the token array — one
    * pass, no explode. Documents shorter than n tokens yield an EMPTY
    * list (matching DuckDB's `range(negative)` → []): an unguarded
    * `sequence(0, size-n)` would generate a descending sequence and
    * crash `slice` at runtime on any real corpus with short docs. */
  def wordGramsAll(c: Column, n: Int): Column = {
    val toks = tokens(c)
    // LAMBDA-CAPTURE HAZARD (the md5/CollapseProject class, but inside
    // higher-order functions): the old `transform(sequence(...), i =>
    // slice(toks, i+1, n))` captured `toks` in the lambda body, and HOF
    // lambdas re-evaluate captured expressions PER ELEMENT — a full
    // regex re-tokenization of the document for every gram position,
    // O(tokens²) per doc (measured 5.2× on the sf0.1 corpus: 6.4 s →
    // 1.2 s). zip_with keeps every `toks` reference at TOP level (once
    // per row): gram_i = toks[i] ⊕ toks[i+1] ⊕ … over n−1 zipped
    // shifted slices; output strings identical (join-equality checked
    // corpus-wide).
    val m = size(toks) - (n - 1)
    val parts = (0 until n).map(k => slice(toks, lit(k + 1), m))
    val grams = parts.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** word n-gram shingle SET (distinct [[wordGramsAll]]) — the dedup/
    * similarity building block. */
  def wordShingles(c: Column, n: Int): Column =
    array_distinct(wordGramsAll(c, n))
}
