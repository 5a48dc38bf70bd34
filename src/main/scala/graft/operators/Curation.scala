package graft.operators

import graft.api.Df
import graft.functions.TextFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: PII
  * detection/redaction, URL/domain filtering, corpus-level exact line
  * dedup (the C4/RefinedWeb cleaning steps), and character-entropy
  * quality scoring. North-star extensions beyond the reference's
  * surface (it has no string functions at all — SURVEY.md §2.4).
  *
  * Everything is codegen'd Catalyst expressions plus key-hashed
  * aggregations — no UDFs, no driver-side loops. Regex patterns are
  * written to the COMMON subset of Java regex and RE2 so the DuckDB
  * oracles replay them verbatim.
  */
object Curation {

  /** email mailbox pattern (conservative RFC-ish subset) */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** dotted-quad IPv4 (no octet range check — detector, not validator) */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** SSN-shaped government id `ddd-dd-dddd` */
  val IdRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  /** URL with the host as capture group 1 */
  val UrlDomainRe = "https?://([A-Za-z0-9.-]+)"

  /** All three PII classes replaced with typed placeholders. Email runs
    * first: its local/host parts can contain digit runs that the
    * narrower patterns would otherwise chew into partial matches. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(IdRe), lit("<ID>"))

  /** Per-document PII audit: match counts per class (on the ORIGINAL
    * text) plus the redacted text. One narrow projection, fully
    * codegen'd — at 100 TB this is a pure map stage, no shuffle. */
  def piiStats(docs: Df, textCol: String, idCol: String): Df = {
    val t = col(textCol)
    new Df(docs.sdf.select(col(idCol),
      regexp_count(t, lit(EmailRe)).as("n_emails"),
      regexp_count(t, lit(Ipv4Re)).as("n_ips"),
      regexp_count(t, lit(IdRe)).as("n_ids"),
      redactPii(t).as("redacted")))
  }

  /** DISTINCT domains linked per document: (idCol, domain), one row per
    * (doc, domain). Docs with no URL contribute no rows. */
  def extractDomains(docs: Df, textCol: String, idCol: String): Df =
    new Df(docs.sdf.select(col(idCol),
      explode(array_distinct(
        regexp_extract_all(col(textCol), lit(UrlDomainRe), lit(1)))).as("domain")))

  /** Drop documents linking to any blocklisted domain — the URL-level
    * safety filter. NULL text can't contain a blocked domain, so it is
    * KEPT (the un-coalesced `!arrays_overlap` would go NULL and silently
    * drop it). Pure map-side filter: the blocklist is an array literal
    * in the plan, never a join. */
  def dropByDomain(docs: Df, textCol: String, blocklist: Seq[String]): Df = {
    val doms = array_distinct(
      regexp_extract_all(col(textCol), lit(UrlDomainRe), lit(1)))
    new Df(docs.sdf.where(
      coalesce(!arrays_overlap(doms, typedlit(blocklist)), lit(true))))
  }

  /** Corpus-level exact line dedup (the C4 cleaning rule): every line
    * keeps only its FIRST occurrence across the whole corpus — first =
    * min (idCol, line position), a total order, so the result is
    * deterministic. Output per doc: `textCol` rebuilt from the kept
    * lines (original order), `n_kept`, and `n_lines`; a doc whose every
    * line appeared earlier keeps an empty string.
    *
    * Scale shape: one shuffle keyed on the 32-bit line hash (argmin per
    * line), one hash-join back (line-hash keyed — never a window over
    * the unpartitioned corpus), one per-doc rollup. Lines are compared
    * via [[graft.functions.TextFunctions.hash32]] like every dedup
    * sibling — a 2^-32 collision merges two distinct lines (documented
    * trade; oracles replay the hash so parity holds regardless).
    *
    * The line table is persisted: it feeds the argmin, the join-back,
    * and the totals — Spark plans trees, so unpersisted the split+md5
    * scan would run three times (callers clear the cache after their
    * action, the [[Dedup]] convention). */
  def dedupLines(docs: Df, textCol: String, idCol: String): Df = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val lines = docs.sdf
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("lh", hash32(col("line")))
      .persist(lvl)
    val first = lines.groupBy(col("lh"))
      .agg(min(struct(col(idCol).as("d"), col("pos").as("p"))).as("f"))
    val kept = lines.join(first, Seq("lh"))
      .where(col(idCol) === col("f.d") && col("pos") === col("f.p"))
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s("line"))).as(textCol))
    val totals = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    new Df(totals.join(rebuilt, Seq(idCol), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn(textCol, coalesce(col(textCol), lit(""))))
  }

  /** Shannon entropy (nats) of the per-document CHARACTER distribution —
    * the cheap gibberish/boilerplate signal: natural text sits around
    * 2.5–3.5, single-char spam near 0, uniform noise near ln(alphabet).
    * H = ln n − (Σ ct·ln ct)/n; each ct·ln(ct) term is cast to
    * DECIMAL(18,8) before summing so the per-doc sum is order-
    * independent (double addition is not — the [[TextAnalytics
    * .unigramLogLoss]] convention), and ROUND 4 absorbs the ≤1-ulp libm
    * spread on the outer ln. Two shuffles on the doc id, no UDFs; the
    * group count per (doc, char) is bounded by the alphabet. */
  def charEntropy(docs: Df, textCol: String, idCol: String): Df = {
    val chars = docs.sdf.select(col(idCol),
      explode(regexp_extract_all(col(textCol), lit("(?s)."), lit(0))).as("c"))
    val perChar = chars.groupBy(col(idCol), col("c")).agg(count(lit(1)).as("ct"))
    new Df(perChar.groupBy(col(idCol)).agg(
      sum(col("ct")).cast("long").as("n_chars"),
      round(log(sum(col("ct")).cast("double")) -
        sum((col("ct").cast("double") * log(col("ct").cast("double")))
          .cast("decimal(18,8)")).cast("double") / sum(col("ct")),
        4).as("entropy")))
  }
}
