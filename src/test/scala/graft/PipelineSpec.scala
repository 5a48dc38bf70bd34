package graft

import graft.api.Df
import graft.operators.{Curation, TextAnalytics}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the wave-3 training-pipeline operators (q168–q174):
  * boilerplate line removal, DSIR weights, PMI collocations, corpus
  * diff, bigram NLL, length-bucketed batches, negative sampling. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema =
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType)))

  private def mkDocs(texts: (Long, String)*): Df =
    Df.fromRows(spark, texts.map { case (i, t) => Row(i, t) }, docSchema)

  // ---- stripBoilerplateLines ----

  test("stripBoilerplateLines kills high-df lines everywhere, keeps rare ones") {
    val d = mkDocs(
      1L -> "unique one\nfooter line",
      2L -> "unique two\nfooter line",
      3L -> "unique three\nfooter line",
      4L -> "footer line")
    val out = Curation.stripBoilerplateLines(d, "text", "doc_id", minDocFreq = 3)
      .sortValues(Seq("doc_id")).sdf.collect()
    Df.releaseRetained()
    // footer (df=4) stripped from ALL docs; unique lines (df=1) kept
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq == Seq(
      1L -> "unique one", 2L -> "unique two", 3L -> "unique three", 4L -> ""))
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 2L, 2L, 1L)) // n_lines
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L, 0L)) // n_kept
  }

  test("stripBoilerplateLines under-threshold repeats survive in every doc") {
    val d = mkDocs(1L -> "quoted passage", 2L -> "quoted passage", 3L -> "other")
    val out = Curation.stripBoilerplateLines(d, "text", "doc_id", minDocFreq = 3)
      .sortValues(Seq("doc_id")).sdf.collect()
    Df.releaseRetained()
    assert(out.map(_.getString(3)).toSeq ==
      Seq("quoted passage", "quoted passage", "other"))
    intercept[IllegalArgumentException] {
      Curation.stripBoilerplateLines(d, "text", "doc_id", minDocFreq = 1)
    }
  }

  // ---- dsirLogWeights ----

  test("dsirLogWeights scores target-like docs above raw-only docs") {
    // target docs speak 'aa bb', raw-only docs speak 'zz yy'
    val rows = (1L to 10L).map(i => Row(i, "aa bb aa bb", true)) ++
      (11L to 20L).map(i => Row(i, "zz yy zz yy", false))
    val d = new Df(spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("is_tgt", BooleanType)))))
    val out = Curation.dsirLogWeights(d, "text", "doc_id", "is_tgt", buckets = 64)
      .sdf.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    Df.releaseRetained()
    assert(out(1L) > 0, "target-vocabulary doc must have positive log-weight")
    assert(out(11L) < 0, "raw-only-vocabulary doc must have negative log-weight")
    assert(out.size == 20)
  }

  test("dsirLogWeights NULL target flag counts as raw-only") {
    val d = new Df(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "aa", true), Row(2L, "zz", null))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("is_tgt", BooleanType)))))
    val out = Curation.dsirLogWeights(d, "text", "doc_id", "is_tgt", buckets = 8)
      .sdf.collect()
    Df.releaseRetained()
    assert(out.length == 2) // no NPE, null treated as false
  }

  // ---- pmiCollocations ----

  test("pmiCollocations ranks a fixed phrase above independent pairs") {
    // 'new york' always adjacent; fillers vary their neighbors
    val docs = (1L to 12L).map(i =>
      i -> s"new york w$i x${i % 3} new york y${i % 4} z$i")
    val out = TextAnalytics.pmiCollocations(mkDocs(docs: _*), "text", minCount = 5)
      .sdf.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(5)))
    Df.releaseRetained()
    assert(out.nonEmpty)
    val best = out.maxBy(_._3)
    assert((best._1, best._2) == ("new", "york"))
  }

  test("pmiCollocations minCount filters rare pairs") {
    val out = TextAnalytics.pmiCollocations(
      mkDocs(1L -> "a b c d"), "text", minCount = 2).sdf.collect()
    Df.releaseRetained()
    assert(out.isEmpty)
  }

  // ---- corpusDiff ----

  test("corpusDiff classifies added/removed/changed/unchanged incl. NULL text") {
    val old = mkDocs(1L -> "same", 2L -> "will change", 3L -> "will vanish")
      .sdf.union(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(4L, null))), docSchema))
    val nw = mkDocs(1L -> "same", 2L -> "changed!", 5L -> "brand new")
      .sdf.union(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(4L, null))), docSchema))
    val out = Curation.corpusDiff(new Df(old), new Df(nw), "doc_id", "text")
      .sortValues(Seq("doc_id")).sdf.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  // ---- bigramNll ----

  test("bigramNll scores a repeated phrase below a diverse doc; <2 tokens drop") {
    val d = mkDocs(
      1L -> "p q p q p q p q p q p q",  // utterly predictable transitions
      2L -> "k1 m7 c3 x9 b2 r8 t4 w6", // every transition unique
      3L -> "solo")
    val out = TextAnalytics.bigramNll(d, "text", "doc_id").sdf.collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    Df.releaseRetained()
    assert(out.keySet == Set(1L, 2L), "1-token doc has no transitions")
    assert(out(1L) < out(2L), "repetitive doc must have lower NLL")
    intercept[IllegalArgumentException] {
      TextAnalytics.bigramNll(d, "text", "doc_id", lambda = 1.5)
    }
  }

  // ---- stupidBackoffNll ----

  test("stupidBackoffNll hits all three backoff levels with hand-computed scores") {
    // train: trigrams {abc, bca, cab, abd}, bigrams {ab:2, bc, ca, bd}, N=6
    val train = mkDocs(0L -> "a b c a b d")
    val score = mkDocs(
      1L -> "a b c",     // trigram seen: S = 1/2        → ln 2
      3L -> "c a b d x", // seen(S=1), seen(S=1/2), OOV floor α²·0.5/6
      5L -> "d a b",     // trigram unseen, bigram ab: α·2/2 = 0.4
      7L -> "a b")       // < 3 tokens: drops
    val out = TextAnalytics.stupidBackoffNll(train, score, "text", "doc_id")
      .sdf.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    Df.releaseRetained()
    assert(out.keySet == Set(1L, 3L, 5L))
    assert(out(1L) == ((1L, 0.6931)))
    // (0 + ln 2 + ln(6/(0.16·0.5))) / 3 = 1.6702
    assert(out(3L) == ((3L, 1.6702)))
    assert(out(5L) == ((1L, 0.9163)))
    intercept[IllegalArgumentException] {
      TextAnalytics.stupidBackoffNll(train, score, "text", "doc_id", alpha = 0.0)
    }
  }

  // ---- lengthBucketBatches ----

  test("lengthBucketBatches buckets are monotone in n_tokens and batches bounded") {
    val docs = (1L to 100L).map(i => i -> (1L to (i % 20) + 1).map(j => s"w$j").mkString(" "))
    val out = Curation.lengthBucketBatches(mkDocs(docs: _*), "text", "doc_id",
      nBuckets = 4, batchSize = 5, shards = 2).sdf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    Df.releaseRetained()
    assert(out.length == 100)
    assert(out.map(_._3).toSet.subsetOf(Set(1, 2, 3, 4)))
    // monotone: a doc in a higher bucket is never shorter than one in a lower
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2))
    for (b <- 1 to 3 if byBucket.contains(b) && byBucket.contains(b + 1))
      assert(byBucket(b).max <= byBucket(b + 1).min ||
        byBucket(b).max <= byBucket(b + 1).max)
    // batch occupancy ≤ batchSize within each (bucket, shard)
    out.groupBy(r => (r._3, r._4, r._5)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
    }
    // nBuckets = 1 path: single bucket, no percentile agg
    val one = Curation.lengthBucketBatches(mkDocs(docs.take(10): _*), "text",
      "doc_id", nBuckets = 1, batchSize = 3, shards = 2).sdf.collect()
    Df.releaseRetained()
    assert(one.map(_.getInt(2)).toSet == Set(1))
  }

  // ---- negativeSamples ----

  test("negativeSamples is deterministic, k-per-anchor, in-corpus, no self-pair") {
    val d = mkDocs((1L to 50L).map(i => i -> s"doc $i"): _*)
    def run() = Curation.negativeSamples(d, "doc_id", k = 3, seed = 11L)
      .sortValues(Seq("anchor_id", "neg_rank")).sdf.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val a = run(); Df.releaseRetained()
    val b = run(); Df.releaseRetained()
    assert(a == b, "same seed must reproduce the exact pairs")
    assert(a.length == 150)
    assert(a.groupBy(_._1).forall(_._2.length == 3))
    val ids = (1L to 50L).toSet
    assert(a.forall { case (anchor, _, neg) => ids.contains(neg) && neg != anchor })
    val c = Curation.negativeSamples(d, "doc_id", k = 3, seed = 12L)
      .sortValues(Seq("anchor_id", "neg_rank")).sdf.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    Df.releaseRetained()
    assert(a != c, "different seed must draw different pairs")
  }

  // ---- cdcChunks ----

  test("cdcChunks partitions the token stream exactly and is shift-stable") {
    val base = (1 to 60).map(i => s"tok${i % 13}x$i").mkString(" ")
    val d = mkDocs(1L -> base, 2L -> s"PREFIX $base", 3L -> "tiny", 4L -> "")
    val out = TextAnalytics.cdcChunks(d, "text", "doc_id",
      window = 3, modulus = 4).sdf.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(4)))
    // chunks reassemble to the original token stream, in order
    val re1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._4).mkString(" ")
    assert(re1 == base)
    assert(out.filter(_._1 == 1L).map(_._3).sum == 60L)
    // content-defined: doc 2 = doc 1 plus a 1-token prefix; after the
    // first boundary the chunk sequences must re-align (shift-stable)
    val c1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._4)
    val c2 = out.filter(_._1 == 2L).sortBy(_._2).map(_._4)
    assert(c1.drop(1).toSet.subsetOf(c2.toSet) ||
      c1.toSet.intersect(c2.toSet).nonEmpty,
      s"no chunk re-alignment between shifted copies:\n$c1\n$c2")
    // a doc shorter than the window is one whole chunk
    assert(out.filter(_._1 == 3L).map(_._4).toSeq == Seq("tiny"))
    // a zero-token doc emits nothing
    assert(!out.exists(_._1 == 4L))
  }

  // ---- importanceSample ----

  test("importanceSample is deterministic, weight-sensitive, and n-bounded") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("log_weight", DoubleType)))
    // ids 1..100 heavy (lw=3), 101..200 light (lw=-3)
    val rows = (1L to 100L).map(Row(_, 3.0)) ++ (101L to 200L).map(Row(_, -3.0))
    val d = new Df(spark.createDataFrame(spark.sparkContext.parallelize(rows), schema))
    def run(seed: Long) = Curation.importanceSample(d, "log_weight", "doc_id",
      n = 50, seed = seed).sdf.collect().map(_.getLong(0)).toSet
    val a = run(1L)
    assert(a == run(1L), "same seed, same sample")
    assert(a.size == 50)
    val heavy = a.count(_ <= 100L)
    assert(heavy > 40, s"heavy items must dominate the sample: $heavy/50")
    assert(run(2L) != a, "different seed, different sample")
  }

  // ---- ngramDiversity ----

  test("ngramDiversity counts totals and distincts per n") {
    val d = mkDocs(1L -> "a b a b", 2L -> "a b c")
    val out = TextAnalytics.ngramDiversity(d, "text", Seq(1, 2)).sdf
      .orderBy("n").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // unigrams: 7 total, 3 distinct; bigrams: 5 total ("a b","b a",
    // "a b" | "a b","b c") → 3 distinct
    assert(out.toSeq == Seq((1, 7L, 3L), (2, 5L, 3L)))
  }

  // ---- winsorize ----

  test("winsorize clips to the corpus quantiles and preserves interior values") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    val rows = (1L to 99L).map(i => Row(i, i.toDouble)) :+ Row(100L, 1e9)
    val d = new Df(spark.createDataFrame(spark.sparkContext.parallelize(rows), schema))
    val out = Curation.winsorize(d, "v", lo = 0.05, hi = 0.9).sdf.collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(50L) == 50.0, "interior values untouched")
    assert(out(100L) < 1e9, "outlier clipped to the hi cut")
    assert(out(1L) > 1.0, "low tail clipped up")
    intercept[IllegalArgumentException] {
      Curation.winsorize(d, "v", lo = 0.9, hi = 0.5)
    }
  }

  // ---- standardizeBy ----

  test("standardizeBy computes sample z-scores per group; singletons go NULL") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType), StructField("v", DoubleType)))
    val d = new Df(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "a", 1.0), Row(2L, "a", 2.0), Row(3L, "a", 3.0),
      Row(4L, "b", 7.0))), schema))
    val out = Curation.standardizeBy(d, "v", Seq("g")).sdf.collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        Option(r.get(r.fieldIndex("v_z"))).map(_.asInstanceOf[Double])).toMap
    // group a: mean 2, sample std 1 → z = -1, 0, 1
    assert(out(1L).contains(-1.0) && out(2L).contains(0.0) && out(3L).contains(1.0))
    assert(out(4L).isEmpty, "singleton group has no spread")
  }

  // ---- normalizeTextCol ----

  test("normalizeTextCol folds case, strips punctuation, collapses whitespace") {
    val d = mkDocs(1L -> "  Hello,   WORLD!! a-b c_9  ", 2L -> "!!!")
    val out = Curation.withNormalizedText(d, "text", "doc_id")
      .sortValues(Seq("doc_id")).sdf.collect()
    assert(out(0).getString(2) == "hello world a b c 9")
    assert(out(1).getString(2) == "", "all-punctuation text normalizes to empty")
    assert(out(1).getInt(3) == 0)
  }

  // ---- dedupReport ----

  test("dedupReport summarizes exact duplication in one row") {
    val d = mkDocs(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "y", 5L -> "z")
    val r = graft.operators.Dedup.dedupReport(d, "text").sdf.collect()(0)
    assert(r.getLong(0) == 5L)           // n_docs
    assert(r.getLong(1) == 3L)           // n_unique
    assert(r.getLong(2) == 3L)           // n_in_dup_groups
    assert(r.getLong(3) == 3L)           // max_group
    assert(r.getDouble(4) == 0.4)        // (5-3)/5 removable
  }

  // ---- histogram ----

  test("histogram covers [min,max] with equal bins; constant column collapses") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    val d = new Df(spark.createDataFrame(spark.sparkContext.parallelize(
      (0L to 99L).map(i => Row(i, i.toDouble))), schema))
    val out = graft.operators.Profiling.histogram(d, "v", bins = 10)
      .sortValues(Seq("bucket")).sdf.collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(3)).sum == 100L)
    assert(out(0).getDouble(1) == 0.0 && out(9).getDouble(2) == 99.0)
    // max lands in the LAST bucket (clamped), not an overflow bucket
    assert(out(9).getLong(3) == 10L)
    val const = new Df(spark.createDataFrame(spark.sparkContext.parallelize(
      (0L to 4L).map(i => Row(i, 7.0))), schema))
    val c = graft.operators.Profiling.histogram(const, "v", bins = 10)
      .sdf.collect()
    assert(c.length == 1 && c(0).getInt(0) == 0 && c(0).getLong(3) == 5L)
  }

  // ---- correlation ----

  test("correlation finds perfect/anti/zero-variance relationships") {
    val schema = StructType(Seq(StructField("a", DoubleType),
      StructField("b", DoubleType), StructField("c", DoubleType),
      StructField("k", DoubleType)))
    val d = new Df(spark.createDataFrame(spark.sparkContext.parallelize(
      (1 to 50).map(i => Row(i.toDouble, 2.0 * i, 50.0 - i, 3.0))), schema))
    val out = graft.operators.Profiling.correlation(d, Seq("a", "b", "c", "k"))
      .sdf.collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out(("a", "b")).contains(1.0))
    assert(out(("a", "c")).contains(-1.0))
    assert(out(("a", "k")).isEmpty, "zero-variance column must yield NULL")
    assert(out.size == 6)
    intercept[IllegalArgumentException] {
      graft.operators.Profiling.correlation(d, Seq("a"))
    }
  }

  // ---- classTfidf ----

  test("classTfidf surfaces class-distinctive terms first") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    val rows = (1L to 10L).map(i => Row(i, "en", "shared words plus apple")) ++
      (11L to 20L).map(i => Row(i, "de", "shared words plus banane"))
    val d = new Df(spark.createDataFrame(spark.sparkContext.parallelize(rows), schema))
    val out = TextAnalytics.classTfidf(d, "text", "lang", k = 2).sdf.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    Df.releaseRetained()
    val top = out.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    assert(top("en") == "apple", s"en top term: $top")
    assert(top("de") == "banane", s"de top term: $top")
    assert(out.count(_._1 == "en") == 2)
  }

  // ---- splitByHash3 / dedupByNormalizedText ----

  test("splitByHash3 carves adjacent stable ranges; 2-way boundary is shared") {
    val d = mkDocs((1L to 400L).map(i => i -> s"d$i"): _*)
    val out = d.splitByHash3("doc_id", 0.1, 0.2).sdf.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val counts = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("val", "test", "train"))
    assert(counts("train") > counts("test") && counts("test") > counts("val"))
    // the val range matches the 2-way split's holdout at the same fraction
    val twoWay = d.splitByHash("doc_id", 0.1).sdf.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.filter(_._2 == "val").keySet ==
      twoWay.filter(_._2 == "holdout").keySet)
    intercept[IllegalArgumentException] { d.splitByHash3("doc_id", 0.6, 0.6) }
  }

  test("dedupByNormalizedText collapses case/punct variants, keeps original text") {
    val d = mkDocs(
      1L -> "Hello, World!",
      2L -> "hello   world",
      3L -> "HELLO WORLD.",
      4L -> "different doc")
    val out = Curation.dedupByNormalizedText(d, "text", "doc_id")
      .sortValues(Seq("doc_id")).sdf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 3L, "Hello, World!"), (4L, 1L, "different doc")))
  }

  // ---- plan shapes (the PlanSpec convention: assert the scale-
  // critical physical operators, not just results) ----

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dsirLogWeights scores through a BROADCAST ratio join, no keyless window") {
    val d = new Df(spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 30L).map(i =>
        Row(i, s"tok${i % 5} tok${i % 3}", i % 2 == 0))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("is_tgt", BooleanType)))))
    val p = plan(Curation.dsirLogWeights(d, "text", "doc_id", "is_tgt",
      buckets = 32).sdf)
    Df.releaseRetained()
    assert(p.contains("BroadcastHashJoin"), p)  // (bucket → log-ratio) table rides the plan
    assert(!p.contains("Window"), p)            // pure join + agg, no window at all
  }

  test("vocabCoverage/oovRate/zipfSlope rank with the scalable ordinal — no Window operator") {
    val d = mkDocs((1L to 30L).map(i => i -> s"tok${i % 7} tok${i % 3} x"): _*)
    Seq(TextAnalytics.vocabCoverage(d, "text", Seq(5)).sdf,
        TextAnalytics.oovRate(d, "text", "doc_id", vocabSize = 5).sdf,
        TextAnalytics.zipfSlope(d, "text", topK = 5).sdf).foreach { q =>
      val p = plan(q)
      // the frequency rank must ride range-partition + zipWithIndex,
      // never a keyless row_number window (the one-task funnel)
      assert(!p.contains("Window"), p)
    }
    Df.releaseRetained()
  }

  test("lengthBucketBatches windows are keyed by (bucket, shard) — never global") {
    val d = mkDocs((1L to 40L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim): _*)
    val p = plan(Curation.lengthBucketBatches(d, "text", "doc_id",
      nBuckets = 2, batchSize = 4, shards = 4).sdf)
    Df.releaseRetained()
    // cuts are LITERALS (order-statistic selection) — no join node
    assert(!p.contains("Join"), p)
    // the batch window partitions by bucket#/shard# — a keyless global
    // window would print "Window [... ORDER BY ...]" with no partition spec
    assert(p.contains("windowspecdefinition(bucket"), p)
  }

  test("importanceSample top-n compiles to TakeOrdered; cdcChunks shuffles only cuts") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("log_weight", DoubleType)))
    val d = new Df(spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 50L).map(Row(_, 1.0))), schema))
    val p1 = plan(Curation.importanceSample(d, "log_weight", "doc_id",
      n = 5, seed = 1L).sdf)
    assert(p1.contains("TakeOrderedAndProject"), p1)
    val docs = mkDocs(1L -> "a b c d e f g h")
    val df2 = TextAnalytics.cdcChunks(docs, "text", "doc_id").sdf
    val op = df2.queryExecution.optimizedPlan.toString
    Df.releaseRetained()
    // the cut aggregation must see only (id, cut-offset) rows — if the
    // token array or text ever rode the shuffle the Aggregate's child
    // projection would carry __toks
    val aggChild = op.linesIterator.dropWhile(!_.contains("Aggregate")).drop(1)
      .takeWhile(!_.contains("Join")).mkString("\n")
    assert(!aggChild.contains("__toks,"), op)
  }

  test("corpusDiff joins fingerprints, not text: projection precedes the join") {
    val a = mkDocs(1L -> "alpha", 2L -> "beta")
    val b = mkDocs(1L -> "alpha", 3L -> "gamma")
    val df = Curation.corpusDiff(a, b, "doc_id", "text").sdf
    val p = plan(df)
    // text must be consumed by the map-side md5 projection; the join
    // output carries only id + fingerprints + presence flags
    assert(p.contains("md5"), p)
    assert(!df.queryExecution.optimizedPlan.toString.contains("FullOuter, text"),
      df.queryExecution.optimizedPlan.toString)
  }

  // ---- vocabCoverage / oovRate ----

  test("vocabCoverage: hand-computed curve, V beyond vocab saturates at 1.0") {
    // counts: a=3, b=2, c=1; total=6
    val d = mkDocs(1L -> "a a a b", 2L -> "b c")
    val out = TextAnalytics.vocabCoverage(d, "text", Seq(1, 2, 10))
      .sortValues(Seq("v")).sdf.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    Df.releaseRetained()
    assert(out.toSeq == Seq(
      (1, 1L, 3L, 6L, 0.5),       // top-1 = {a}
      (2, 2L, 5L, 6L, 0.833333),  // top-2 = {a, b}
      (10, 3L, 6L, 6L, 1.0)))     // whole vocab
  }

  test("vocabCoverage ranks ties lexicographically (deterministic boundary)") {
    // a and b tie at count 1: top-1 must be 'a' by the term tiebreak
    val d = mkDocs(1L -> "b a")
    val out = TextAnalytics.vocabCoverage(d, "text", Seq(1))
      .sdf.collect()(0)
    Df.releaseRetained()
    assert(out.getLong(1) == 1L && out.getLong(2) == 1L &&
      out.getDouble(4) == 0.5)
  }

  test("oovRate: tokens outside the top-V vocab count as OOV per doc") {
    // vocab(2) = {a, b}; doc 1 fully covered, doc 2 half OOV
    val d = mkDocs(1L -> "a a a b", 2L -> "b c")
    val out = TextAnalytics.oovRate(d, "text", "doc_id", vocabSize = 2)
      .sortValues(Seq("doc_id")).sdf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    Df.releaseRetained()
    assert(out.toSeq == Seq((1L, 4L, 0L, 0.0), (2L, 2L, 1L, 0.5)))
  }

  test("bm25: idf favors rare terms, length norm favors short docs; search picks the right doc") {
    // docs: 1 -> "a a b" (len 3), 2 -> "b c" (len 2); df: a=1, b=2, c=1
    val d = mkDocs(1L -> "a a b", 2L -> "b c")
    val w = TextAnalytics.bm25(d, "text", "doc_id").sdf.collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getDouble(3))).toMap
    Df.releaseRetained()
    // rare term (df=1) outscores the corpus-wide one (df=2) in-doc
    assert(w((1L, "a")) > w((1L, "b")))
    assert(w((2L, "c")) > w((2L, "b")))
    // same term, same tf: the shorter doc scores higher (b-norm)
    assert(w((2L, "b")) > w((1L, "b")))
    // query {a, c}: doc1 matches a (tf 2, score ~0.902) vs doc2's c
    // (~0.755) -> doc1 is the top-1
    val top = TextAnalytics.bm25Search(d, "text", "doc_id",
      Seq("a", "c"), topN = 1).sdf.collect()
    Df.releaseRetained()
    assert(top.length == 1 && top(0).getLong(0) == 1L && top(0).getLong(1) == 1L)
    intercept[IllegalArgumentException] {
      TextAnalytics.bm25Search(d, "text", "doc_id", Seq(), topN = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalytics.bm25(d, "text", "doc_id", b = 1.5)
    }
  }

  test("zipfSlope recovers a constructed power law; flat corpus fits ~0") {
    // counts 8/4/2/1 over ranks 1..4: y = ln 16 - 1·ln(2^(r-1)) is NOT
    // linear in ln r, but the fit must be negative and steep; a uniform
    // corpus (all counts equal) must fit slope 0 exactly
    val steep = mkDocs(1L ->
      ("a " * 8 + "b " * 4 + "c " * 2 + "d").trim)
    val s = TextAnalytics.zipfSlope(steep, "text", topK = 4).sdf.collect()(0)
    assert(s.getLong(0) == 4L && s.getDouble(1) < -1.0)
    val flat = mkDocs(1L -> "a b c d")
    val f = TextAnalytics.zipfSlope(flat, "text", topK = 4).sdf.collect()(0)
    assert(f.getLong(0) == 4L && f.getDouble(1) == 0.0 && f.getDouble(2) == 0.0)
    intercept[IllegalArgumentException] {
      TextAnalytics.zipfSlope(flat, "text", topK = 1)
    }
  }

  test("rankFusion: hand-computed RRF, null signals drop the row") {
    val d = new Df(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10.0, 1.0),   // rank 1 on a, rank 3 on b
        Row(2L, 5.0, 2.0),    // rank 2 on a, rank 2 on b
        Row(3L, 5.0, 3.0),    // rank 3 on a (id tiebreak), rank 1 on b
        Row(4L, null, 9.0))), // null a -> dropped from the fusion
      StructType(Seq(StructField("id", LongType),
        StructField("a", DoubleType), StructField("b", DoubleType)))))
    val out = Curation.rankFusion(d, Seq("a", "b"), "id", k = 60)
      .sortValues(Seq("id")).sdf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    Df.releaseRetained()
    def rrf(ra: Int, rb: Int) =
      math.rint((1.0 / (60 + ra) + 1.0 / (60 + rb)) * 1e6) / 1e6
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, rrf(1, 3)),
      (2L, 2L, 2L, rrf(2, 2)),
      (3L, 3L, 1L, rrf(3, 1))))
    intercept[IllegalArgumentException] {
      Curation.rankFusion(d, Seq(), "id")
    }
    // a null id RANKS (holds positions) but emits no row — the pre-r16
    // per-signal id equi-joins never matched null keys
    val withNull = new Df(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10.0, 1.0), Row(null, 20.0, 9.0), Row(2L, 5.0, 2.0))),
      StructType(Seq(StructField("id", LongType),
        StructField("a", DoubleType), StructField("b", DoubleType)))))
    val nn = Curation.rankFusion(withNull, Seq("a", "b"), "id")
      .sortValues(Seq("id")).sdf.collect()
    Df.releaseRetained()
    // the null row ranks FIRST on both signals (a: 20 > 10 > 5,
    // b: 9 > 2 > 1) — surviving ids keep the ranks they'd have had
    // with it present (id1: a=2, b=3; id2: a=3, b=2)
    assert(nn.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(nn.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((2L, 3L), (3L, 2L)))
    // a duplicated id raises the named in-plan error instead of
    // silently folding two documents into one fused row
    val dup = new Df(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(7L, 10.0, 1.0), Row(7L, 5.0, 2.0), Row(8L, 1.0, 3.0))),
      StructType(Seq(StructField("id", LongType),
        StructField("a", DoubleType), StructField("b", DoubleType)))))
    val err = intercept[Exception] {
      Curation.rankFusion(dup, Seq("a", "b"), "id").sdf.collect()
    }
    Df.releaseRetained()
    assert(err.getMessage != null && err.getMessage.contains("duplicated"),
      s"wanted the named duplicate-id error, got: ${err.getMessage}")
  }

  test("rankFusion: ONE fused ranking protocol for all signals") {
    // the r16 melt: three signals ride a single range-partitioned
    // zipWithIndex instead of one protocol each. Each
    // withRowIndexScalable call runs exactly one eager zipWithIndex
    // job, so counting those pins the protocol count directly (total
    // job count would also see AQE's per-stage materialization
    // futures — brittle): fused = 1, the pre-r16 per-signal form = 3.
    val d = new Df(spark.range(0, 400).selectExpr("id",
      "cast(id % 37 as double) as a",
      "cast((id * 13) % 41 as double) as b",
      "cast((id * 7) % 23 as double) as c"))
    @volatile var zipJobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (j.stageInfos.exists(_.name.contains("zipWithIndex")))
          zipJobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // deterministic drain of earlier tests' queued events (not a
      // sleep-poll, which can under-wait on a loaded host)
      org.apache.spark.GraftListenerBusSync.waitUntilEmpty(spark.sparkContext)
      zipJobs = 0
      val out = Curation.rankFusion(d, Seq("a", "b", "c"), "id")
      org.apache.spark.GraftListenerBusSync.waitUntilEmpty(spark.sparkContext)
      val protocols = zipJobs
      assert(protocols == 1,
        s"rankFusion ran $protocols ranking protocols — want ONE fused")
      // ranks stay a permutation and the fusion stays exact: spot-check
      // the top doc by each signal holds rank 1 on it
      val rows = out.sdf.collect()
      assert(rows.length == 400)
      Seq("a", "b", "c").foreach { c =>
        val ranks = rows.map(_.getLong(rows.head.fieldIndex(s"rank_$c")))
        assert(ranks.sorted.toSeq == (1L to 400L))
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      Df.releaseRetained()
    }
  }

  test("oovRate rejects a non-positive vocab; empty docs drop out") {
    intercept[IllegalArgumentException] {
      TextAnalytics.oovRate(mkDocs(1L -> "x"), "text", "doc_id", 0)
    }
    val out = TextAnalytics.oovRate(
      mkDocs(1L -> "a", 2L -> "   "), "text", "doc_id", 1).sdf.collect()
    Df.releaseRetained()
    // doc 2 has zero tokens -> no row (never a 0/0 rate)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }
}
