package graft

import graft.api.Df
import graft.operators.Curation
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the corpus-curation operators (PII, domains, line dedup,
  * char entropy). */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private def mkDocs(texts: (Long, String)*): Df =
    Df.fromRows(spark, texts.map { case (i, t) => Row(i, t) },
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("piiStats counts and redacts emails, IPs, and id numbers") {
    val d = mkDocs(
      1L -> "mail bob.smith+x@corp.example.com and 10.1.2.3 plus 123-45-6789 end",
      2L -> "no pii here at all")
    val out = Curation.piiStats(d, "text", "doc_id").sdf.orderBy("doc_id").collect()
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3)) == ((1, 1, 1)))
    assert(out(0).getString(4) == "mail <EMAIL> and <IP> plus <ID> end")
    assert((out(1).getInt(1), out(1).getInt(2), out(1).getInt(3)) == ((0, 0, 0)))
    assert(out(1).getString(4) == "no pii here at all")
  }

  test("dropByDomain removes docs linking a blocked host; NULL text is kept") {
    val d = Df.fromRows(spark, Seq(
      Row(1L, "see https://bad.example.com/x ok"),
      Row(2L, "see https://good.example.com/x ok"),
      Row(3L, "no links"),
      Row(4L, null)),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val kept = Curation.dropByDomain(d, "text", Seq("bad.example.com"))
      .sdf.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("extractDomains emits distinct hosts per doc") {
    val d = mkDocs(1L -> "x https://a.com/1 y http://a.com/2 z https://b.org/3")
    val doms = Curation.extractDomains(d, "text", "doc_id")
      .sdf.collect().map(_.getString(1)).toSet
    assert(doms == Set("a.com", "b.org"))
  }

  test("dedupLines keeps only the globally-first occurrence of each line") {
    val d = mkDocs(
      1L -> "alpha\nshared footer\nalpha", // 2nd alpha dups line 0 of SAME doc
      2L -> "beta\nshared footer",
      3L -> "shared footer") // every line seen before -> empty doc
    val out = Curation.dedupLines(d, "text", "doc_id")
      .sdf.orderBy("doc_id").collect()
    assert(out(0).getString(out(0).fieldIndex("text")) == "alpha\nshared footer")
    assert(out(0).getLong(out(0).fieldIndex("n_kept")) == 2L)
    assert(out(0).getLong(out(0).fieldIndex("n_lines")) == 3L)
    assert(out(1).getString(out(1).fieldIndex("text")) == "beta")
    assert(out(2).getString(out(2).fieldIndex("text")) == "")
    assert(out(2).getLong(out(2).fieldIndex("n_kept")) == 0L)
  }

  test("dedupLines: kept lines across the corpus are exactly the distinct lines") {
    val rng = new scala.util.Random(7)
    val docs = (0L until 40L).map { i =>
      i -> (0 until 5).map(_ => s"line ${rng.nextInt(30)}").mkString("\n")
    }
    val d = mkDocs(docs: _*)
    val out = Curation.dedupLines(d, "text", "doc_id").sdf.collect()
    val keptLines = out.flatMap { r =>
      val t = r.getString(r.fieldIndex("text"))
      if (t.isEmpty) Seq.empty[String] else t.split("\n").toSeq
    }
    val allLines = docs.flatMap(_._2.split("\n"))
    // every distinct line survives exactly once, nothing is invented
    assert(keptLines.sorted.toSeq == allLines.distinct.sorted.toSeq)
    // totals reconcile
    assert(out.map(r => r.getLong(r.fieldIndex("n_lines"))).sum == allLines.size.toLong)
    assert(out.map(r => r.getLong(r.fieldIndex("n_kept"))).sum == allLines.distinct.size.toLong)
  }

  test("charEntropy: 0 for single-char docs, ln 2 for two equal chars") {
    val d = mkDocs(1L -> "aaaa", 2L -> "abab")
    val out = Curation.charEntropy(d, "text", "doc_id")
      .sdf.orderBy("doc_id").collect()
    assert(out(0).getDouble(2) == 0.0)
    assert(math.abs(out(1).getDouble(2) - math.log(2.0)) < 1e-4)
    assert(out(1).getLong(1) == 4L)
  }

  test("charEntropy terms ride DECIMAL(28,10) — degenerate docs cannot overflow the cast") {
    // ct·ln(ct) overflows a DECIMAL(18,8) term near ct ≈ 4e8 (ANSI
    // throws, non-ANSI NULLs the entropy); the wide meanPool-convention
    // decimal holds to ~2^53. The plan is the contract — a 4e8-char doc
    // is not buildable in a unit test.
    val out = Curation.charEntropy(mkDocs(1L -> ("a" * 100000)), "text", "doc_id").sdf
    val plan = out.queryExecution.analyzed.toString
    assert(plan.contains("decimal(28,10)") && !plan.contains("decimal(18,8)"))
    val r = out.collect()(0)
    assert(r.getLong(1) == 100000L && r.getDouble(2) == 0.0)
  }

  test("packSequences: packs cut at the token budget, within shards, in id order") {
    // one shard so the packing order is fully predictable
    val d = mkDocs(
      1L -> "t t t t",   // 4 tokens, prefix 0  -> pack 0
      2L -> "t t t",     // 3 tokens, prefix 4  -> pack 0
      3L -> "t t t t t", // 5 tokens, prefix 7  -> pack 1 (budget 6)
      4L -> "t")         // 1 token,  prefix 12 -> pack 2
    val out = Curation.packSequences(d, "text", "doc_id", budget = 6, shards = 1)
      .sdf.orderBy("doc_id").collect()
    assert(out.map(r => r.getLong(r.fieldIndex("pack"))).toSeq == Seq(0L, 0L, 1L, 2L))
    assert(out.forall(r => r.getInt(r.fieldIndex("shard")) == 0))
    // per-pack token sums never exceed budget + (one overhanging doc)
    assert(out.map(r => r.getLong(r.fieldIndex("n_tokens"))).sum == 13L)
  }

  test("materializePacks emits member text in id order with exact token totals") {
    val d = mkDocs(
      1L -> "t1 t1 t1 t1",   // 4 tokens -> pack 0
      2L -> "t2 t2 t2",      // 3 tokens -> pack 0 (prefix 4 < 6)
      0L -> "",              // token-less: excluded from packs
      3L -> "t3 t3 t3 t3 t3",// 5 tokens -> pack 1 (prefix 7)
      4L -> "t4")            // 1 token  -> pack 2 (prefix 12)
    val out = Curation.materializePacks(d, "text", "doc_id", budget = 6, shards = 1)
      .sdf.orderBy("pack").collect()
      .map(r => (r.getLong(r.fieldIndex("pack")), r.getLong(r.fieldIndex("n_docs")),
        r.getLong(r.fieldIndex("n_tokens")), r.getString(r.fieldIndex("text"))))
    assert(out.toSeq == Seq(
      (0L, 2L, 7L, "t1 t1 t1 t1 t2 t2 t2"),
      (1L, 1L, 5L, "t3 t3 t3 t3 t3"),
      (2L, 1L, 1L, "t4")))
  }

  test("packSequences: shard assignment is deterministic and pack ids restart per shard") {
    val docs = (0L until 60L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim)
    val d = mkDocs(docs: _*)
    val run1 = Curation.packSequences(d, "text", "doc_id", budget = 10, shards = 4)
      .sdf.orderBy("doc_id").collect()
    val run2 = Curation.packSequences(d, "text", "doc_id", budget = 10, shards = 4)
      .sdf.orderBy("doc_id").collect()
    assert(run1.map(_.toSeq).toSeq == run2.map(_.toSeq).toSeq)
    // every shard's pack numbering starts at 0
    val firstPackPerShard = run1.groupBy(_.getInt(2)).values
      .map(_.minBy(_.getLong(0)).getLong(3))
    assert(firstPackPerShard.forall(_ == 0L))
  }

  test("mixCorpora: output matches target weights; unweighted sources drop") {
    val rows = (0L until 400L).map { i =>
      val src = if (i % 4 == 0) "web" else if (i % 4 == 1) "books" else "junk"
      Row(i, src)
    }
    val d = Df.fromRows(spark, rows,
      StructType(Seq(StructField("doc_id", LongType), StructField("source", StringType))))
    // web n=100 w=0.5, books n=100 w=0.5 -> T = 200, both keep all
    val out = Curation.mixCorpora(d, "source", "doc_id",
      Map("web" -> 0.5, "books" -> 0.5)).sdf.collect()
    val bySrc = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySrc == Map("web" -> 100, "books" -> 100))
    // skewed weights downsample the over-represented source only:
    // T = min(100/0.9, 100/0.1) = 111.1 -> books keeps ~11, web all 100
    val skew = Curation.mixCorpora(d, "source", "doc_id",
      Map("web" -> 0.9, "books" -> 0.1)).sdf.collect()
    val n = skew.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(n("web") == 100)
    // hash rule targets round(0.1111…·buckets) of 10000 buckets; the
    // 100-doc sample is binomial around 11 — accept a wide band
    assert(n("books") >= 3 && n("books") <= 25)
    assert(!n.contains("junk"))
  }

  test("temperatureResample: alpha=1 identity, alpha=0 flattens, tail intact") {
    // head lang 320 docs, mid 80, tail 20
    val rows = (0L until 420L).map { i =>
      val lang = if (i < 320) "en" else if (i < 400) "de" else "fr"
      Row(i, lang)
    }
    val d = Df.fromRows(spark, rows,
      StructType(Seq(StructField("doc_id", LongType), StructField("lang", StringType))))
    def counts(alpha: Double): Map[String, Int] =
      Curation.temperatureResample(d, "lang", "doc_id", alpha)
        .sdf.collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    // alpha = 1: natural distribution untouched
    assert(counts(1.0) == Map("en" -> 320, "de" -> 80, "fr" -> 20))
    // any alpha: the smallest domain keeps everything (f = 1 exactly)
    val half = counts(0.5)
    assert(half("fr") == 20)
    // alpha = 0: every domain flattens toward n_min (hash rule targets
    // round(nmin/n · buckets); binomial wobble -> wide bands)
    val flat = counts(0.0)
    assert(flat("fr") == 20)
    assert(flat("en") >= 8 && flat("en") <= 36, flat.toString)
    assert(flat("de") >= 8 && flat("de") <= 36, flat.toString)
    // monotone damping: bigger domains keep a smaller FRACTION
    assert(half("en").toDouble / 320 < half("de").toDouble / 80 + 1e-9)
    // bad knob fails at call time
    val e = intercept[IllegalArgumentException](
      Curation.temperatureResample(d, "lang", "doc_id", 1.5))
    assert(e.getMessage.contains("alpha"))
    // NULL-domain rows are dropped AND excluded before n_min: a stray
    // unlabeled row must not become the smallest "domain" and collapse
    // every real domain's keep fraction
    val withNull = new Df(d.sdf.unionByName(
      d.sdf.limit(1).select((col("doc_id") + 9000).as("doc_id"),
        lit(null).cast("string").as("lang"))))
    val nulled = Curation.temperatureResample(withNull, "lang", "doc_id", 1.0)
      .sdf.collect()
    assert(nulled.length == 420 && nulled.forall(_.getString(0) != null))
  }

  test("mixCorpora: kept rows are a stable subset under re-partitioning") {
    val rows = (0L until 200L).map(i => Row(i, if (i % 2 == 0) "a" else "b"))
    val d = Df.fromRows(spark, rows,
      StructType(Seq(StructField("doc_id", LongType), StructField("source", StringType))))
    val w = Map("a" -> 0.7, "b" -> 0.3)
    val ids1 = Curation.mixCorpora(d, "source", "doc_id", w)
      .sdf.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.mixCorpora(new Df(d.sdf.repartition(7)), "source", "doc_id", w)
      .sdf.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2 && ids1.nonEmpty)
  }

  test("normalizeUrl canonicalizes scheme/host case, www, ports, fragments, tracking params, trailing slash") {
    val cases = Seq(
      // scheme+host lowercased, path case preserved
      "HTTPS://Ex.COM/Path" -> "https://ex.com/Path",
      "https://www.ex.com/a" -> "https://ex.com/a",
      "http://ex.com:80/a" -> "http://ex.com/a",
      "https://ex.com:443/a" -> "https://ex.com/a",
      "http://ex.com:8080/a" -> "http://ex.com:8080/a",   // non-default kept
      "https://ex.com/a#frag" -> "https://ex.com/a",
      "https://ex.com/a?utm_source=x&b=2" -> "https://ex.com/a?b=2",
      "https://ex.com/a?b=2&utm_campaign=y" -> "https://ex.com/a?b=2",
      "https://ex.com/a?utm_a=1&utm_b=2" -> "https://ex.com/a",
      "https://ex.com/a?gclid=z" -> "https://ex.com/a",
      "https://ex.com/a/b/" -> "https://ex.com/a/b",
      "https://ex.com/a/?fbclid=q#s" -> "https://ex.com/a",
      "https://ex.com/" -> "https://ex.com",               // root forms unify
      "https://ex.com" -> "https://ex.com",
      "https://www.www.ex.com/a" -> "https://ex.com/a",    // www runs collapse
      "https://ex.com/a//" -> "https://ex.com/a",          // slash runs stripped
      "https://ex.com/AT&&T/x" -> "https://ex.com/AT&&T/x", // path && is DATA
      "https://ex.com/a?x=1&&y=2" -> "https://ex.com/a?x=1&y=2", // query && is separators
      "no scheme at all" -> "no scheme at all",
      "free text? with && and #marks" -> "free text? with && and #marks",
      // percent-encoding (RFC 3986 §6.2.2): hex uppercased, unreserved
      // decoded, reserved escapes kept
      "https://ex.com/%7e" -> "https://ex.com/~",
      "https://ex.com/%7E" -> "https://ex.com/~",
      "https://ex.com/a%2Fb" -> "https://ex.com/a%2Fb",   // '/' stays encoded
      "https://ex.com/a%2fb" -> "https://ex.com/a%2Fb",   // …but hex uppercases
      "https://ex.com/%41%62%30%2d%2E%5f" -> "https://ex.com/Ab0-._",
      "https://ex.com/x%fa%aF" -> "https://ex.com/x%FA%AF", // both positions
      "https://ex.com/%2525" -> "https://ex.com/%2525",   // %25 never decodes
      "https://ex.com/a?x=%7e#f" -> "https://ex.com/a?x=~",
      // www guard: a registrable www.com survives; runs still collapse
      // when a dotted host remains
      "https://www.com/a" -> "https://www.com/a",
      "https://www.www.com/a" -> "https://www.com/a",
      "HTTP://WWW.COM:80/a" -> "http://www.com/a",
      "https://www.%65x.com/a" -> "https://ex.com/a")     // decode feeds www strip
    val d = Df.fromRows(spark,
      cases.zipWithIndex.map { case ((in, _), i) => Row(i.toLong, in) },
      StructType(Seq(StructField("id", LongType), StructField("url", StringType))))
    val got = d.sdf.orderBy("id")
      .select(Curation.normalizeUrl(col("url"))).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, expect), g) =>
      assert(g == expect, s"normalizeUrl($in) = $g, expected $expect") }
    // NULL stays NULL
    val n = Df.fromRows(spark, Seq(Row(1L, null)),
      StructType(Seq(StructField("id", LongType), StructField("url", StringType))))
    assert(n.sdf.select(Curation.normalizeUrl(col("url"))).collect()(0).isNullAt(0))
  }

  test("dedupByUrl keeps min id per canonical url; NULL urls all survive") {
    val d = Df.fromRows(spark, Seq(
      Row(5L, "https://www.ex.com/a"),
      Row(3L, "HTTPS://EX.COM/a?utm_source=t"),
      Row(9L, "https://ex.com/a/"),
      Row(7L, "https://ex.com/b"),
      Row(11L, null), Row(12L, null)),
      StructType(Seq(StructField("doc_id", LongType), StructField("url", StringType))))
    val out = Curation.dedupByUrl(d, "url", "doc_id").sdf.collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    assert(out(3L) == ((Some("https://ex.com/a"), 3L)))  // 3 disguises, min id 3
    assert(out(7L) == ((Some("https://ex.com/b"), 1L)))
    assert(out(11L) == ((None, 1L)) && out(12L) == ((None, 1L)))
    assert(out.size == 4)
  }

  test("editDistancePairs verifies candidates, drops beyond maxDist, guards empty texts") {
    val d = mkDocs(
      1L -> "the quick brown fox",
      2L -> "the quick brown fax", // dist 1 from doc 1
      3L -> "completely different words here entirely unlike", // far from both
      4L -> "", 5L -> "")          // empty pair -> dist 0, sim 1.0
    val cand = new Df(d.sdf.selectExpr("doc_id AS id_a").crossJoin(
      d.sdf.selectExpr("doc_id AS id_b")).where(col("id_a") < col("id_b")))
    val out = graft.operators.Dedup.editDistancePairs(cand, d, "text", "doc_id", maxDist = 5)
      .sdf.collect().map(r =>
        (r.getLong(r.fieldIndex("id_a")), r.getLong(r.fieldIndex("id_b"))) ->
        (r.getInt(r.fieldIndex("edit_dist")), r.getDouble(r.fieldIndex("edit_sim")))).toMap
    assert(out((1L, 2L))._1 == 1)
    assert(math.abs(out((1L, 2L))._2 - (1.0 - 1.0 / 19)) < 1e-6)
    assert(out((4L, 5L)) == ((0, 1.0))) // empty-vs-empty: guarded 1.0
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L))) // beyond threshold
  }

  test("editDistancePairs threshold boundary: dist == maxDist kept, maxDist+1 dropped") {
    // Spark's banded levenshtein(l, r, threshold) early-exits with -1
    // ABOVE the threshold; the operator filters >= 0 — the boundary
    // itself must survive (an off-by-one here silently shrinks recall)
    val maxDist = 7
    val d = mkDocs(
      1L -> "aaaa",
      2L -> ("aaaa" + "x" * maxDist),        // dist exactly maxDist
      3L -> ("aaaa" + "x" * (maxDist + 1)))  // dist exactly maxDist + 1
    val cand = new Df(d.sdf.selectExpr("doc_id AS id_a").crossJoin(
      d.sdf.selectExpr("doc_id AS id_b")).where(col("id_a") < col("id_b")))
    val out = graft.operators.Dedup
      .editDistancePairs(cand, d, "text", "doc_id", maxDist)
      .sdf.collect().map(r =>
        (r.getLong(r.fieldIndex("id_a")), r.getLong(r.fieldIndex("id_b"))) ->
          r.getInt(r.fieldIndex("edit_dist"))).toMap
    assert(out((1L, 2L)) == maxDist)    // boundary kept
    assert(!out.contains((1L, 3L)))     // boundary + 1 dropped
    assert(out((2L, 3L)) == 1)          // the variants differ by one char
  }

  test("removeDuplicatedWindows: cleaned realistic corpus re-detects zero dup windows") {
    // the Lee-et-al corollary on the q137 corpus shape (originals +
    // tail-suffixed variants): after keep-first removal, re-running
    // detection at the same k finds nothing. This holds on realistic
    // vocabularies; FuzzSpec documents why adversarial 3-token corpora
    // can re-create k-grams across cut seams.
    val docs = Df.readParquet(spark, s"${TestSpark.sf}/documents.parquet")
      .where(col("doc_id") < 40)
    val aug = new Df(docs.sdf.select(col("doc_id"), col("text"))
      .union(docs.sdf.select((col("doc_id") + 2000).as("doc_id"),
        concat(col("text"), lit(" zq tail marker "),
          col("doc_id").cast("string")).as("text"))))
    val cleaned = graft.operators.Dedup
      .removeDuplicatedWindows(aug, "text", "doc_id", k = 10)
    val out = cleaned.sdf.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    cleaned.unpersistIntermediates()
    // every ≥10-token variant lost its duplicated prefix spans (its
    // original, with the lower doc_id, is the surviving first copy)
    out.foreach { case (id, (_, nTok, nRem)) =>
      if (id >= 2000L && nTok >= 10L)
        assert(nRem > 0L, s"variant $id kept its duplicated prefix")
    }
    val redetect = graft.operators.Dedup.duplicatedWindows(
      new Df(Df.fromRows(spark,
        out.toSeq.sortBy(_._1).map { case (id, (t, _, _)) => Row(id, t) },
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType)))).sdf),
      "text", "doc_id", k = 10)
    val dupLeft = redetect.sdf.where(col("n_dup_windows") > 0).count()
    redetect.unpersistIntermediates()
    assert(dupLeft == 0L, s"$dupLeft docs still carry duplicated windows")
  }

  test("domainQuotaCap: over-cap domains trimmed deterministically, nulls kept") {
    val rows = (0L until 40L).map(i => Row(i, "big.com")) ++
      (100L until 103L).map(i => Row(i, "small.org")) ++
      Seq(Row(200L, null), Row(201L, null))
    val d = new Df(Df.fromRows(spark, rows,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("domain", StringType)))).sdf)
    val out = Curation.domainQuotaCap(d, "domain", "doc_id", cap = 10)
      .sdf.collect()
      .map(r => (r.getAs[Long]("doc_id"), Option(r.getAs[String]("domain")))).toSeq
    val byDomain = out.groupBy(_._2)
    assert(byDomain(Some("big.com")).size == 10)
    assert(byDomain(Some("small.org")).size == 3)   // under quota: all kept
    assert(byDomain(None).size == 2)                // null domain: all kept
    // deterministic: same picks on a re-run
    val again = Curation.domainQuotaCap(d, "domain", "doc_id", cap = 10)
      .sdf.collect()
      .map(r => (r.getAs[Long]("doc_id"), Option(r.getAs[String]("domain")))).toSeq
    assert(out.toSet == again.toSet)
    // input column order survives the internal join
    assert(Curation.domainQuotaCap(d, "domain", "doc_id", cap = 10)
      .sdf.columns.toSeq == Seq("doc_id", "domain"))
    intercept[IllegalArgumentException] {
      Curation.domainQuotaCap(d, "domain", "doc_id", cap = 0)
    }
  }

  test("epochShuffle: deterministic bijective permutation, epoch-sensitive") {
    val d = mkDocs((0L until 50L).map(i => i -> s"doc $i"): _*)
    val e1 = Curation.epochShuffle(d, "doc_id", seed = 7L, epoch = 1)
      .sdf.select("position", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // positions are exactly 0..n-1, every doc appears once
    assert(e1.map(_._1).toSeq == (0L until 50L))
    assert(e1.map(_._2).toSet == (0L until 50L).toSet)
    // reproducible: same (seed, epoch) -> same permutation
    val e1again = Curation.epochShuffle(d, "doc_id", seed = 7L, epoch = 1)
      .sdf.select("position", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(e1.toSeq == e1again.toSeq)
    // a different epoch produces a different order (50! permutations —
    // an md5 collision across all 50 keys is not a thing)
    val e2 = Curation.epochShuffle(d, "doc_id", seed = 7L, epoch = 2)
      .sdf.select("position", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(e1.map(_._2).toSeq != e2.map(_._2).toSeq)
    // not the identity order either
    assert(e1.map(_._2).toSeq != (0L until 50L).toSeq)
  }

  test("hashedLinearScore: mean hashed-bucket weight, zero for unknown buckets") {
    val d = mkDocs(1L -> "a a b", 2L -> "b", 3L -> "c")
    // weight table keyed on the ACTUAL buckets of a and b; c unmapped -> 0
    val bucketOf = d.sdf.select(explode(graft.functions.TextFunctions
        .tokens(col("text"))).as("tok")).distinct()
      .withColumn("bucket", graft.functions.TextFunctions.hash32(col("tok")) % 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Df.fromRows(spark, Seq(
      Row(bucketOf("a"), 0.2), Row(bucketOf("b"), -0.1)),
      StructType(Seq(StructField("bucket", LongType),
        StructField("weight", DoubleType))))
    val out = Curation.hashedLinearScore(d, "text", "doc_id", w, buckets = 1024)
      .sdf.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((3L, 0.1, true)))   // (0.2 + 0.2 - 0.1) / 3
    assert(out(2L) == ((1L, -0.1, false)))
    assert(out(3L) == ((1L, 0.0, false)))  // unknown bucket -> weight 0
  }

  test("selectByTokenBudget takes the quality prefix; offsets cross partitions exactly") {
    // scores 50..10, 10 tokens each, budget 25 -> exactly the top two
    // (cum 10, 20); the NULL-score doc ranks last and never makes it;
    // the NULL-token doc (score 35, between the winners) adds nothing
    // to the running total and stays eligible. 3 range partitions
    // force the offset path.
    val docs = Df.fromRows(spark, Seq(
      Row(1L, 50L, 10L), Row(2L, 40L, 10L), Row(3L, 35L, null),
      Row(4L, 30L, 10L), Row(5L, null, 10L)),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("score", LongType), StructField("n_tokens", LongType))))
    val out = graft.operators.Curation.selectByTokenBudget(
      docs, "score", "n_tokens", "doc_id", budget = 25L, numPartitions = 3)
      .sdf.collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getLong(r.fieldIndex("cum_tokens"))).toMap
    assert(out == Map(1L -> 10L, 2L -> 20L, 3L -> 20L))
    Df.releaseRetained()
  }

  test("curation ops plan without cartesian products or UDFs") {
    val d = mkDocs(1L -> "a\nb", 2L -> "b\nc")
    val plan = Curation.dedupLines(d, "text", "doc_id")
      .sdf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val pii = Curation.piiStats(d, "text", "doc_id")
      .sdf.queryExecution.executedPlan.toString
    assert(!pii.contains("BatchEvalPython") && !pii.toLowerCase.contains("scalaudf"))
    spark.catalog.clearCache()
  }
}
