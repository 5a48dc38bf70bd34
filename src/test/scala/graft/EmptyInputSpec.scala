package graft

import graft.api.Df
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Empty-input battery: at 100 TB an empty partition, an empty delta
  * batch, or a filtered-to-nothing snapshot is ROUTINE — every major
  * operator must either return a sane (usually empty) frame or raise a
  * NAMED graft error, never die in an executor with an unnamed
  * arithmetic/NPE. Each case collects the result to force execution. */
class EmptyInputSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  import TestSpark._

  // cross-suite block-accounting hygiene (the cache-lifetime contract
  // test asserts a clean slate): drain whatever this suite retained
  override def afterAll(): Unit = Df.releaseRetained()

  private def docs0 = Df.fromRows(spark, Seq(), StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType))))
  private def vecs0 = Df.fromRows(spark, Seq(), StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)))))
  private def nums0 = Df.fromRows(spark, Seq(), StructType(Seq(
    StructField("k", StringType), StructField("v", DoubleType))))
  private def edges0 = Df.fromRows(spark, Seq(), StructType(Seq(
    StructField("a", LongType), StructField("b", LongType))))

  private def msgChain(t: Throwable): String = {
    var c: Throwable = t; val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append(' '); c = c.getCause }
    sb.toString
  }

  /** empty in → empty out, no throw */
  private def emptyOk(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
    assert(mk.collect().isEmpty, s"$label: expected empty result")

  /** empty in → a NAMED error carrying `token` */
  private def namedErr(label: String, token: String)(mk: => Any): Unit = {
    val e = intercept[Exception](mk match {
      case d: org.apache.spark.sql.DataFrame => d.collect()
      case d: Df => d.sdf.collect()
      case x => x
    })
    assert(msgChain(e).contains(token),
      s"$label: wanted named '$token', got: ${msgChain(e).take(300)}")
  }

  test("dedup family: empty corpus yields empty pair/cluster frames") {
    import graft.operators.Dedup
    emptyOk("minhashPairs")(Dedup.minhashPairs(docs0, "text", "doc_id").sdf)
    emptyOk("simhashPairs")(Dedup.simhashPairs(docs0, "text", "doc_id").sdf)
    emptyOk("ngramJaccardPairs")(
      Dedup.ngramJaccardPairs(docs0, "text", "doc_id").sdf)
    emptyOk("exactByFingerprint")(
      Dedup.exactByFingerprint(docs0, "text", "doc_id").sdf)
    emptyOk("connectedComponents")(
      Dedup.connectedComponents(edges0, "a", "b").sdf)
    Df.releaseRetained()
  }

  test("text analytics: empty corpus yields empty stats frames") {
    import graft.operators.TextAnalytics
    emptyOk("tfidf")(TextAnalytics.tfidf(docs0, "text", "doc_id").sdf)
    emptyOk("ngramDiversity")(
      TextAnalytics.ngramDiversity(docs0, "text", Seq(1, 2)).sdf)
    emptyOk("bpePairCounts")(
      TextAnalytics.bpePairCounts(docs0, "text", "doc_id", 5).sdf)
    Df.releaseRetained()
  }

  test("graphs: empty edge list yields empty rank/transition frames") {
    import graft.operators.Graphs
    emptyOk("pageRank")(Graphs.pageRank(edges0.sdf, "a", "b", 2).sdf)
    Df.releaseRetained()
  }

  test("curation/profiling: empty input is empty or named, never unnamed arithmetic") {
    import graft.operators.{Curation, Profiling}
    emptyOk("winsorize")(Curation.winsorize(nums0, "v").sdf)
    emptyOk("standardizeBy")(
      Curation.standardizeBy(nums0, "v", Seq("k")).sdf)
    emptyOk("robustOutliers")(Curation.robustOutliers(nums0, "v").sdf)
    emptyOk("histogram")(Profiling.histogram(nums0, "v").sdf)
    emptyOk("sequenceIslands")(
      Profiling.sequenceIslands(nums0, Seq("k"), "v").sdf)
    emptyOk("skewStats collects one row with nulls")(
      Profiling.skewStats(nums0, "k").sdf.where("n_rows IS NOT NULL"))
    Df.releaseRetained()
  }

  test("similarity: empty vectors are empty or named") {
    import graft.operators.Similarity
    emptyOk("covarianceMatrix")(
      Similarity.covarianceMatrix(vecs0, "embedding").sdf)
    emptyOk("meanPool")(Similarity.meanPool(vecs0, "embedding", "vec_id").sdf)
    emptyOk("bruteTopK")(
      Similarity.bruteForceTopK(vecs0, vecs0, "embedding", "vec_id", 3).sdf)
    namedErr("pqEncode", "pq")(
      Similarity.pqEncode(vecs0, "embedding", "vec_id"))
    Df.releaseRetained()
  }

  test("time series / features: empty input empty out") {
    import graft.operators.{TimeSeries, Features}
    val ts0 = Df.fromRows(spark, Seq(), StructType(Seq(
      StructField("k", IntegerType), StructField("ts", TimestampType),
      StructField("v", DoubleType))))
    emptyOk("interpolateByTime")(
      TimeSeries.interpolateByTime(ts0, "v", "ts", Seq("k"), "vi").sdf)
    emptyOk("ewmaMean")(
      TimeSeries.ewmaMean(ts0, Seq("k"), Seq("ts"), "v").sdf)
    emptyOk("targetEncodeLoo")(
      Features.targetEncodeLoo(nums0, "k", "v", "enc").sdf)
    Df.releaseRetained()
  }

  test("r16 additions: empty input through scanKeyless, rankFusion, asKnown") {
    val e = Df.fromRows(spark, Seq(), StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("w", DoubleType))))
    // batch over zero rows: empty out, schema carries the verb columns
    val b = e.scanKeyless(Seq("id"))(_
      .diff("v", out = "dv").ffill("w", out = "w").cumcount(out = "cc"))
    assert(b.sdf.collect().isEmpty)
    assert(b.columns.toSet == Set("id", "v", "w", "dv", "cc"))
    emptyOk("rankFusion")(
      graft.operators.Curation.rankFusion(e, Seq("v", "w"), "id").sdf)
    // empty dictionary is a valid KnownCat (pandas: zero categories)
    val kc = e("v").cat.asKnown
    assert(kc.known && kc.categories.isEmpty)
    Df.releaseRetained()
  }
}
