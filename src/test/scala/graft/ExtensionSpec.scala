package graft

import graft.api.Df
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the LLM-pipeline extension operators (dedup, similarity,
  * text analysis, multimodal plumbing). */
class ExtensionSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  // cross-suite block-accounting hygiene: whatever this suite retained
  // and didn't release per-test drains here
  override def afterAll(): Unit = Df.releaseRetained()

  private def docs = Df.readParquet(spark, s"$sf/documents.parquet")
  private def embs = Df.readParquet(spark, s"$sf/embeddings.parquet")

  private def mkDocs(texts: (Long, String)*): Df =
    Df.fromRows(spark, texts.map { case (i, t) => Row(i, t) },
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("fingerprint is order/duplication-insensitive") {
    val d = mkDocs(1L -> "a b c", 2L -> "c b a a", 3L -> "a b d")
    val fps = d.sdf.select(fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("tokens: whitespace runs are one separator, no empty tokens") {
    val d = mkDocs(1L -> "a\nb  c\td ")
    val toks = d.sdf.select(tokens(col("text"))).collect()(0).getSeq[String](0)
    assert(toks == Seq("a", "b", "c", "d"))
  }

  test("wordShingles produces distinct n-grams") {
    val d = mkDocs(1L -> "a b c d")
    val sh = d.sdf.select(wordShingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  test("minhashPairs finds a mutated near-duplicate, skips unrelated") {
    val base = "the quick brown fox jumps over the lazy dog again and again today " * 3
    val d = mkDocs(
      1L -> base.trim,
      2L -> (base.trim + " zzz"),
      3L -> "completely different words entirely unrelated content here now that share nothing at all with others")
    val pairs = Dedup.minhashPairs(d, "text", "doc_id", minJaccard = 0.3)
      .sdf.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val base = ('a' to 'z').map(c => s"tok$c").mkString(" ")
    val d = mkDocs(1L -> base, 2L -> (base + " extra"), 3L -> (1 to 26).map(i => s"other$i").mkString(" "))
    val sigs = Dedup.simhash(d, "text", "doc_id").sdf.orderBy("doc_id")
      .collect().map(_.getLong(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(1)) < ham(sigs(0), sigs(2)))
    assert(ham(sigs(0), sigs(1)) <= 6)
  }

  test("ngramJaccardPairs exact jaccard on known overlap") {
    val d = mkDocs(1L -> "a b c d e", 2L -> "a b c d f", 3L -> "x y z w v")
    // 3-grams: d1={abc,bcd,cde}, d2={abc,bcd,cdf} → inter 2, union 4 → 0.5
    val pairs = Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3, minJaccard = 0.4)
      .sdf.collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(math.abs(pairs(0).getDouble(2) - 0.5) < 1e-9)
  }

  test("embedding cosine: scaled copy has cosine 1, orthogonal has 0") {
    val d = Df.fromRows(spark, Seq(
      Row(1L, Seq(1f, 0f, 2f), 0), Row(2L, Seq(2f, 0f, 4f), 0), Row(3L, Seq(0f, 5f, 0f), 0)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType))))
    val pairs = Dedup.embeddingCosinePairs(d, "embedding", "vec_id", "label", 0.999)
      .sdf.collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
  }

  test("embeddingLshPairs finds scaled duplicates without any label column") {
    // sign bits are scale-invariant: v and 0.5v always share a bucket;
    // an orthogonal vector lands elsewhere (or fails the cosine gate)
    val rng = new scala.util.Random(13)
    val v = Array.fill(64)(rng.nextFloat() - 0.5f)
    val d = Df.fromRows(spark, Seq(
      Row(1L, v.toSeq), Row(2L, v.map(_ * 0.5f).toSeq),
      Row(3L, v.map(x => -x).toSeq)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val pairs = Dedup.embeddingLshPairs(d, "embedding", "vec_id", minCosine = 0.99)
      .sdf.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("embeddingJoin pairs batch near-dups against the corpus, never A-within-A") {
    // batch: 0.5v collides with corpus v (scale-invariant sign bits);
    // -v flips every bit -> different bucket, never a candidate. The
    // two near-identical CORPUS vectors (1, 2) must NOT pair - this is
    // a cross-corpus join, not a self-join.
    val rng = new scala.util.Random(31)
    val v = Array.fill(64)(rng.nextFloat() - 0.5f)
    val corpus = Df.fromRows(spark, Seq(
      Row(1L, v.toSeq), Row(2L, v.map(_ * 2.0f).toSeq)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val batch = Df.fromRows(spark, Seq(
      Row(10L, v.map(_ * 0.5f).toSeq), Row(11L, v.map(x => -x).toSeq)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val pairs = Dedup.embeddingJoin(corpus, batch, "embedding", "vec_id",
      minCosine = 0.99).sdf.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs == Seq((1L, 10L), (2L, 10L)))
  }

  test("clusterSafeSplit keeps a near-dup cluster whole on one side") {
    // pairs: 1-2 and 2-5 chain into one component labeled 1; docs 3, 4
    // are singletons keyed on their own ids. Cluster members must share
    // split_key AND side; a singleton's key is its id (so its side
    // replays splitByHash exactly).
    val docs = Df.fromRows(spark, Seq(
      Row(1L), Row(2L), Row(3L), Row(4L), Row(5L)),
      StructType(Seq(StructField("doc_id", LongType))))
    val pairs = Df.fromRows(spark, Seq(Row(1L, 2L), Row(2L, 5L)),
      StructType(Seq(StructField("id_a", LongType),
        StructField("id_b", LongType))))
    val out = Dedup.clusterSafeSplit(docs, pairs, "doc_id", fraction = 0.5)
      .sdf.collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        (r.getLong(r.fieldIndex("split_key")),
          r.getString(r.fieldIndex("split")))).toMap
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(5L)._1 == 1L)
    assert(Set(out(1L)._2, out(2L)._2, out(5L)._2).size == 1)
    assert(out(3L)._1 == 3L && out(4L)._1 == 4L)
    val bySplitByHash = docs.splitByHash("doc_id", 0.5,
      matchLabel = "holdout", restLabel = "train")
      .sdf.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L)._2 == bySplitByHash(3L) && out(4L)._2 == bySplitByHash(4L))
  }

  test("bpePairCounts weights pairs by word frequency, skips 1-char words") {
    // words: aa x1, ab x2, x x1 -> pairs "a a" x1, "a b" x2; the
    // 1-char word contributes nothing; order is (count desc, pair asc)
    val docs = Df.fromRows(spark, Seq(Row(1L, "aa ab x"), Row(2L, "ab")),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val out = graft.operators.TextAnalytics
      .bpePairCounts(docs, "text", "doc_id", k = 10)
      .sdf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a b", 2L), ("a a", 1L)))
  }

  test("kMeans separates an obviously clustered corpus in two rounds") {
    // init = ids 1, 2 (one seed per true group); one update round lands
    // the centroids on the group means and the assignment is stable
    val docs = Df.fromRows(spark, Seq(
      Row(1L, Seq(0.0f, 0.0f)), Row(2L, Seq(10.0f, 10.0f)),
      Row(3L, Seq(0.5f, 0.0f)), Row(4L, Seq(10.0f, 9.0f))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val out = graft.operators.Similarity
      .kMeans(docs, "embedding", "vec_id", k = 2, iters = 2)
      .sdf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1))
    Df.releaseRetained()
  }

  test("kMeans keeps an empty cluster's centroid and drops NaN vectors") {
    // ids 1 and 2 are identical: both seed centroids coincide, the
    // index tie-break sends every row to cluster 0 in round 1, so
    // cluster 1 is EMPTY through the update and must keep its previous
    // centroid (not crash). That kept centroid [1,1] then recaptures
    // the duplicate points in round 2 (classic Lloyd), while the moved
    // cluster-0 centroid keeps the outlier. The NaN vector is dropped
    // up front.
    val docs = Df.fromRows(spark, Seq(
      Row(1L, Seq(1.0f, 1.0f)), Row(2L, Seq(1.0f, 1.0f)),
      Row(3L, Seq(1.5f, 1.0f)), Row(4L, Seq(Float.NaN, 1.0f))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val out = graft.operators.Similarity
      .kMeans(docs, "embedding", "vec_id", k = 2, iters = 3)
      .sdf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 0))
    Df.releaseRetained()
  }

  test("compactParquet bounds file count and size, preserves every row") {
    // 530 rows scattered over 40 tiny files -> target 100/file must
    // produce ceil(530/100) = 6 files, each <= 100 rows, data identical
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val scattered = s"$base/scattered"
    val compacted = s"$base/compacted"
    spark.range(0, 530).selectExpr("id", "concat('d', CAST(id AS STRING)) AS s")
      .repartition(40).write.mode("overwrite").parquet(scattered)
    val out = graft.operators.Layout
      .compactParquet(spark, scattered, compacted, targetRecordsPerFile = 100)
    assert(out.sdf.count() == 530)
    assert(out.sdf.agg(sum(col("id"))).collect()(0).getLong(0) == 530L * 529 / 2)
    val perFile = out.sdf.groupBy(input_file_name()).count().collect()
    assert(perFile.length == 6)
    assert(perFile.forall(_.getLong(1) <= 100))
  }

  test("quantizeInt8: max hits ±127, zero vector gets zero codes, NaN dropped") {
    val docs = Df.fromRows(spark, Seq(
      Row(1L, Seq(0.5f, -1.0f, 0.25f)),   // scale 1/127: q = 64, -127, 32
      Row(2L, Seq(0.0f, 0.0f, 0.0f)),     // zero vector: scale 0, all q 0
      Row(3L, Seq(Float.NaN, 1.0f, 0f))), // dropped
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val out = graft.operators.Similarity
      .quantizeInt8(docs, "embedding", "vec_id")
      .sdf.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set((1L, 0, 64), (1L, 1, -127), (1L, 2, 32),
      (2L, 0, 0), (2L, 1, 0), (2L, 2, 0)))
  }

  test("int8TopK ranks by reconstructed inner product, exact on axis vectors") {
    // axis-aligned vectors quantize exactly: [1,0]·[2,0] reconstructs
    // to 2.0, orthogonal to 0.0, antiparallel to -1.0
    val d = Df.fromRows(spark, Seq(
      Row(1L, Seq(1.0f, 0.0f)), Row(2L, Seq(2.0f, 0.0f)),
      Row(3L, Seq(0.0f, 1.0f)), Row(4L, Seq(-1.0f, 0.0f))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val out = graft.operators.Similarity
      .int8TopK(d.where(col("vec_id") === 1), d, "embedding", "vec_id", k = 2)
      .sdf.orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((1, 2L, 2.0), (2, 3L, 0.0)))
  }

  test("profile counts nulls and exact distincts per column; skewStats flags the hot key") {
    val d = Df.fromRows(spark, Seq(
      Row(1L, "a"), Row(2L, "a"), Row(3L, null), Row(4L, "b")),
      StructType(Seq(StructField("id", LongType),
        StructField("k", StringType))))
    val prof = graft.operators.Profiling.profile(d)
      .sdf.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(prof("id") == ((4L, 0L, 4L)))
    assert(prof("k") == ((4L, 1L, 2L)))   // null excluded from distinct
    intercept[IllegalArgumentException] {
      graft.operators.Profiling.profile(d, Seq("nope"))
    }
    // column names are data: spaces and quotes must not break the
    // generated expression
    val odd = new Df(d.sdf.withColumnRenamed("k", "it's a 'key' col"))
    val oddProf = graft.operators.Profiling.profile(odd)
      .sdf.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(oddProf("it's a 'key' col") == 2L)
    // keys: a x2, b x1, null x1 -> 3 keys, max 2, skew = 2*3/4 = 1.5
    val skew = graft.operators.Profiling.skewStats(d, "k").sdf.collect()(0)
    assert((skew.getLong(0), skew.getLong(1), skew.getLong(2), skew.getDouble(3)) ==
      ((4L, 3L, 2L, 1.5)))
  }

  test("covarianceMatrix: hand-computed upper triangle; non-finite rows dropped") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val d = Df.fromRows(spark, Seq(
      Row(1L, Seq(1.0f, 2.0f)), Row(2L, Seq(3.0f, 4.0f)),
      Row(3L, Seq(5.0f, 6.0f)), Row(4L, Seq(Float.NaN, 0.0f)), Row(5L, null)),
      schema)
    val out = graft.operators.Similarity.covarianceMatrix(d, "embedding")
      .sdf.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // dims: (1,3,5) and (2,4,6) — every pairwise covariance is 8/3
    assert(out == Map((0, 0) -> 2.666667, (0, 1) -> 2.666667, (1, 1) -> 2.666667))
  }

  test("covarianceMatrixBy: per-key matrices match per-key covarianceMatrix; keys required") {
    val schema = StructType(Seq(StructField("lbl", StringType),
      StructField("embedding", ArrayType(FloatType))))
    val d = Df.fromRows(spark, Seq(
      Row("a", Seq(1.0f, 2.0f)), Row("a", Seq(3.0f, 4.0f)), Row("a", Seq(5.0f, 6.0f)),
      Row("b", Seq(0.0f, 10.0f)), Row("b", Seq(4.0f, 2.0f))), schema)
    val by = graft.operators.Similarity
      .covarianceMatrixBy(d, "embedding", Seq("lbl"))
      .sdf.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    // each key's slice must equal covarianceMatrix run on that key alone
    Seq("a", "b").foreach { k =>
      val solo = graft.operators.Similarity.covarianceMatrix(
        new Df(d.sdf.where(col("lbl") === k)), "embedding")
        .sdf.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      solo.foreach { case ((i, j), v) => assert(by((k, i, j)) == v, s"$k ($i,$j)") }
    }
    assert(by.size == 2 * 3)
    intercept[IllegalArgumentException](
      graft.operators.Similarity.covarianceMatrixBy(d, "embedding", Nil))
  }

  test("mahalanobisScores: trace identity (mean m2 = d), invariance, singular named error") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("x", DoubleType), StructField("y", DoubleType),
      StructField("z", DoubleType)))
    val rng = new scala.util.Random(7)
    val rows = (1L to 200L).map(i => Row(i,
      rng.nextDouble() * 10, rng.nextDouble() * 5 + rng.nextGaussian(),
      rng.nextGaussian() * 3))
    val d = Df.fromRows(spark, rows, schema)
    val scores = graft.operators.Similarity
      .mahalanobisScores(d, Seq("x", "y", "z"), Seq("id"))
      .sdf.collect().map(_.getDouble(4))
    // population-covariance Mahalanobis: Σ m² / n = d exactly (trace of
    // Σ⁻¹Σ); rounded covariance cells perturb it only slightly
    val mean = scores.sum / scores.length
    assert(math.abs(mean - 3.0) < 0.05, s"mean m2 $mean, want ~3")
    assert(scores.forall(_ >= 0.0), "m2 is a squared distance")
    // 2-feature path (closed-form d=2 inverse)
    val s2 = graft.operators.Similarity
      .mahalanobisScores(d, Seq("x", "y"), Seq("id"))
      .sdf.collect().map(_.getDouble(3))
    assert(math.abs(s2.sum / s2.length - 2.0) < 0.05)
    // constant column → singular covariance, named error
    val const = new Df(d.sdf.withColumn("c", lit(1.0)))
    val e = intercept[IllegalArgumentException](
      graft.operators.Similarity.mahalanobisScores(
        const, Seq("x", "c"), Seq("id")))
    assert(e.getMessage.contains("singular covariance"), e.getMessage)
  }

  test("whiten: output covariance is the k×k identity; rank-deficient corpus raises by name") {
    val e = Df.readParquet(spark, s"$sf/embeddings.parquet")
    val w = graft.operators.Similarity.whiten(e, "embedding", "vec_id", k = 4)
    val cov = graft.operators.Similarity.covarianceMatrix(w, "wpcs")
      .sdf.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    cov.foreach { case ((i, j), v) =>
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(v - want) < 1e-4, s"($i,$j)=$v")
    }
    // a rank-1 corpus cannot whiten at k=2
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val flat = Df.fromRows(spark,
      (1L to 10L).map(i => Row(i, Seq(i.toDouble, 2.0 * i))), schema)
    val ex = intercept[IllegalArgumentException](
      graft.operators.Similarity.whiten(flat, "v", "id", k = 2))
    assert(ex.getMessage.contains("rank-deficient"), ex.getMessage)
  }

  test("invertSpd: Gauss-Jordan path (d=4) inverts to identity within 1e-9") {
    val c = Array(
      Array(4.0, 1.0, 0.5, 0.2), Array(1.0, 3.0, 0.3, 0.1),
      Array(0.5, 0.3, 2.0, 0.4), Array(0.2, 0.1, 0.4, 1.5))
    val inv = graft.operators.Similarity.invertSpd(c)
    for (i <- 0 until 4; j <- 0 until 4) {
      val e = (0 until 4).map(k => c(i)(k) * inv(k)(j)).sum
      assert(math.abs(e - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)=$e")
    }
  }

  test("withHilbertValue: bijective on the grid, consecutive cells are NEIGHBORS, NULL propagates") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("x", DoubleType), StructField("y", DoubleType)))
    val cells = for (x <- 0 to 3; y <- 0 to 3) yield (x, y)
    val d = Df.fromRows(spark, cells.zipWithIndex.map { case ((x, y), i) =>
      Row(i.toLong, x.toDouble, y.toDouble) }, schema)
    val out = graft.operators.Layout
      .withHilbertValue(d, Seq("x", "y"), bits = 2)
      .sdf.collect().map(r => r.getLong(3) -> (r.getDouble(1), r.getDouble(2)))
    assert(out.map(_._1).sorted.toSeq == (0L to 15L), "bijection onto 0..15")
    // THE Hilbert property (Z-order lacks it): walking the key visits
    // grid neighbors only
    val walk = out.sortBy(_._1).map(_._2).toSeq
    walk.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1.0,
        s"non-adjacent step ($x1,$y1)→($x2,$y2)")
    }
    val withNull = Df.fromRows(spark,
      Seq(Row(1L, 1.0, 2.0), Row(2L, null, 2.0)), schema)
    val nv = graft.operators.Layout
      .withHilbertValue(withNull, Seq("x", "y"), bits = 2)
      .sdf.collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(nv == Map(1L -> false, 2L -> true))
    intercept[IllegalArgumentException] {
      graft.operators.Layout.withHilbertValue(d, Seq("x"), bits = 2)
    }
  }

  test("waterFillBudget: level search, non-binding budget, capped flags") {
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("avail", DoubleType)))
    def mk(rows: (String, Double)*) =
      Df.fromRows(spark, rows.map { case (g, v) => Row(g, v) }, schema)
    val d = mk("a" -> 10.0, "b" -> 20.0, "c" -> 70.0)
    def run(df: Df, b: Double) = graft.operators.Curation
      .waterFillBudget(df, "g", "avail", b).sdf.collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    // B=60: level (60−30)/1 = 30 → a/b keep, c capped at 30
    assert(run(d, 60.0) == Map("a" -> ((10.0, false)),
      "b" -> ((20.0, false)), "c" -> ((30.0, true))))
    // B ≥ Σ avail: not binding
    assert(run(d, 200.0) == Map("a" -> ((10.0, false)),
      "b" -> ((20.0, false)), "c" -> ((70.0, false))))
    // level exactly equals the smallest availability
    assert(run(mk("a" -> 5.0, "b" -> 50.0, "c" -> 50.0), 15.0) ==
      Map("a" -> ((5.0, false)), "b" -> ((5.0, true)), "c" -> ((5.0, true))))
    intercept[IllegalArgumentException] {
      graft.operators.Curation.waterFillBudget(d, "g", "avail", 0.0)
    }
  }

  test("incrementalAgg: merged state ≡ full rescan; composes over batches; guards") {
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", DoubleType)))
    def mk(rows: (String, Double)*) =
      Df.fromRows(spark, rows.map { case (k, v) => Row(k, v) }, schema)
    val b1 = mk("a" -> 1.0, "a" -> 2.0, "b" -> 5.0)
    val b2 = mk("a" -> 3.0, "c" -> 7.0)
    val b3 = mk("b" -> -1.0)
    val spec = Seq("v" -> "sum", "v" -> "count", "v" -> "min", "v" -> "max")
    val full = graft.operators.Curation
      .aggState(mk((Seq("a" -> 1.0, "a" -> 2.0, "b" -> 5.0, "a" -> 3.0,
        "c" -> 7.0, "b" -> -1.0)): _*), Seq("k"), spec)
      .sortValues(Seq("k")).sdf.collect().toSeq
    val folded = Seq(b2, b3).foldLeft(
      graft.operators.Curation.aggState(b1, Seq("k"), spec)) { (st, d) =>
      graft.operators.Curation.incrementalAgg(st, d, Seq("k"), spec)
    }.sortValues(Seq("k")).sdf.collect().toSeq
    assert(folded == full)
    intercept[IllegalArgumentException] {
      graft.operators.Curation.incrementalAgg(
        graft.operators.Curation.aggState(b1, Seq("k"), Seq("v" -> "sum")),
        b2, Seq("k"), Seq("v" -> "count"))   // prev lacks v_count state
    }
    intercept[IllegalArgumentException] {
      graft.operators.Curation.aggState(b1, Seq("k"), Seq("v" -> "avg"))
    }
  }

  test("equiDepthHistogram: quantile buckets balance counts; guards") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    val d = Df.fromRows(spark,
      (1L to 8L).map(i => Row(i, i.toDouble)), schema)
    val out = graft.operators.Profiling.equiDepthHistogram(d, "v", 4)
      .sdf.collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out == Map(0 -> ((2L, 1.0, 2.0)), 1 -> ((2L, 3.0, 4.0)),
      2 -> ((2L, 5.0, 6.0)), 3 -> ((2L, 7.0, 8.0))))
    intercept[IllegalArgumentException] {
      graft.operators.Profiling.equiDepthHistogram(d, "v", 1)
    }
  }

  test("bpeEncode: rank-ordered greedy merges, non-alnum fallback, accounting") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val d = Df.fromRows(spark, Seq(
      Row(1L, "low lower a-b"), Row(2L, "aaa"), Row(3L, "   ")), schema)
    val out = graft.operators.TextAnalytics
      .bpeEncode(d, "text", "doc_id", Seq("l" -> "o", "lo" -> "w"))
      .sdf.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // low→[low]=1, lower→[low,e,r]=3, a-b→fallback 1; chars 11, cpt 2.2
    assert(out(1L) == ((3L, 5L, 2.2)))
    assert(!out.contains(3L), "whitespace-only doc has no words")
    // greedy non-overlap: aaa + (a,a) → [aa, a] = 2 tokens
    val out2 = graft.operators.TextAnalytics
      .bpeEncode(d, "text", "doc_id", Seq("a" -> "a"))
      .sdf.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out2(2L) == 2L)
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalytics.bpeEncode(d, "text", "doc_id", Seq("a" -> "|"))
    }
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalytics.bpeEncode(d, "text", "doc_id", Nil)
    }
  }

  test("pcaBasis/pcaProject: known 2-d spectrum, orthonormal sign-fixed basis, exact line projection") {
    // [[2,1],[1,2]]: λ = (3,1), eigvecs (1,1)/√2 and (1,−1)/√2 after sign fix
    val (lam, vecs) = graft.operators.Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(lam(0) - 3.0) < 1e-12 && math.abs(lam(1) - 1.0) < 1e-12)
    val r2 = 1 / math.sqrt(2)
    assert(vecs(0).lazyZip(Array(r2, r2)).forall((a, b) => math.abs(a - b) < 1e-12))
    assert(vecs(1).lazyZip(Array(r2, -r2)).forall((a, b) => math.abs(a - b) < 1e-12))

    // collinear points (1,1),(2,2),(3,3): one component carries all variance
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val d = Df.fromRows(spark, Seq(
      Row(1L, Seq(1.0f, 1.0f)), Row(2L, Seq(2.0f, 2.0f)), Row(3L, Seq(3.0f, 3.0f))),
      schema)
    val basis = graft.operators.Similarity.pcaBasis(d, "embedding", 1)
    assert(math.abs(basis.eigenvalues(0) - 4.0 / 3) < 1e-6)
    assert(math.abs(basis.eigenvalues(1)) < 1e-6)
    assert(basis.means.lazyZip(Array(2.0, 2.0)).forall((a, b) => math.abs(a - b) < 1e-9))
    val proj = graft.operators.Similarity
      .projectOnBasis(d, "embedding", "vec_id", basis)
      .sdf.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).head).toMap
    val s2 = math.sqrt(2)
    assert(math.abs(proj(1L) + s2) < 1e-6)
    assert(math.abs(proj(2L)) < 1e-6)
    assert(math.abs(proj(3L) - s2) < 1e-6)
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.pcaBasis(d, "embedding", 3)
    }
  }

  test("robustOutliers: modified z-score flags the heavy tail; MAD=0 degenerates to NULL") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    val d = Df.fromRows(spark,
      ((1L to 9L).map(i => Row(i, i.toDouble)) :+ Row(10L, 100.0)), schema)
    val out = graft.operators.Curation.robustOutliers(d, "v").sdf.collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    // med 5.5, MAD 2.5: z(100) = 0.6745·94.5/2.5 = 25.4961; z(1) = -1.2141
    assert(out(10L) == ((25.4961, true)))
    assert(out(1L) == ((-1.2141, false)))
    assert(out.values.count(_._2) == 1)
    val flat = Df.fromRows(spark, Seq(Row(1L, 5.0), Row(2L, 5.0),
      Row(3L, 5.0), Row(4L, 9.0)), schema)
    val fz = graft.operators.Curation.robustOutliers(flat, "v").sdf.collect()
    assert(fz.forall(r => r.isNullAt(2) && !r.getBoolean(3)))
    intercept[IllegalArgumentException] {
      graft.operators.Curation.robustOutliers(d, "v", threshold = 0.0)
    }
  }

  test("datasetFingerprint: order/partition-invariant, row-change-sensitive, NULL≠empty") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    val d = Df.fromRows(spark, Seq(Row(1L, "x"), Row(2L, "y"), Row(3L, null)), schema)
    def fp(df: Df) = graft.operators.Profiling
      .datasetFingerprint(df, Seq("id", "v")).sdf.collect()(0)
    val base = fp(d)
    assert(base.getLong(0) == 3L)
    // reversed row order + different partitioning → identical signatures
    val shuffled = new Df(Df.fromRows(spark,
      Seq(Row(3L, null), Row(1L, "x"), Row(2L, "y")), schema).sdf.repartition(7))
    assert(fp(shuffled).toSeq == base.toSeq)
    // one changed row moves xor and sum
    val changed = fp(Df.fromRows(spark, Seq(Row(1L, "x"), Row(2L, "Y"), Row(3L, null)), schema))
    assert(changed.getLong(1) != base.getLong(1))
    assert(changed.getString(2) != base.getString(2))
    // NULL and empty string are distinct contents
    val empty = fp(Df.fromRows(spark, Seq(Row(1L, "x"), Row(2L, "y"), Row(3L, "")), schema))
    assert(empty.getLong(1) != base.getLong(1))
    // a duplicated pair is invisible to xor but NOT to sum/count
    val pair = fp(Df.fromRows(spark, Seq(Row(1L, "x"), Row(1L, "x")), schema))
    assert(pair.getLong(0) == 2L && pair.getLong(1) == 0L)
    intercept[IllegalArgumentException] {
      graft.operators.Profiling.datasetFingerprint(d, Nil)
    }
  }

  test("upsert: updates replace, inserts append, untouched rows survive; schema checked") {
    val t = Df.fromRows(spark, Seq(Row(1L, "a"), Row(2L, "b")),
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
    val u = Df.fromRows(spark, Seq(Row(2L, "B"), Row(3L, "c")),
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
    val out = t.upsert(u, Seq("k")).sdf.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c"))
    intercept[IllegalArgumentException] {
      t.upsert(u.rename(Map("v" -> "w")), Seq("k"))
    }
    intercept[IllegalArgumentException] { t.upsert(u, Seq("nope")) }
  }

  test("embeddingCosinePairs drops over-cap blocks, keeps the rest") {
    // label 0 holds 3 identical vectors (> maxBucket=2 → dropped whole),
    // label 1 holds 2 identical vectors (= cap → kept). Without the cap
    // the hot block would contribute 3 pairs; with it, only label 1's.
    val d = Df.fromRows(spark, Seq(
      Row(1L, Seq(1f, 2f), 0), Row(2L, Seq(2f, 4f), 0), Row(3L, Seq(3f, 6f), 0),
      Row(4L, Seq(0f, 5f), 1), Row(5L, Seq(0f, 10f), 1)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType))))
    val pairs = Dedup.embeddingCosinePairs(d, "embedding", "vec_id", "label",
      minCosine = 0.999, maxBucket = 2).sdf.collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 4L && pairs(0).getLong(1) == 5L)
  }

  test("minhashJoin finds cross-corpus near-dups only (A×B, never A×A)") {
    val base = "the quick brown fox jumps over the lazy dog again and again today " * 3
    val corpus = mkDocs(1L -> base.trim, 2L -> (base.trim + " aa"),
      3L -> "totally different content with no shared trigrams at all whatsoever here")
    val batch = mkDocs(11L -> (base.trim + " zzz"),
      12L -> "unrelated new document about other things entirely with nothing shared")
    val pairs = Dedup.minhashJoin(corpus, batch, "text", "doc_id", minJaccard = 0.3)
      .sdf.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet.contains((1L, 11L)) && pairs.toSet.contains((2L, 11L)))
    // near-dup pair 1-2 WITHIN the corpus must never appear: A×B only
    assert(pairs.forall { case (a, b) => a <= 3L && b >= 11L })
    assert(!pairs.exists(_._2 == 12L))
    spark.catalog.clearCache() // minhashJoin persists both shingle tables
  }

  test("cache-lifetime contract: unpersistIntermediates releases every operator-persisted block") {
    // clean slate: the registry drain covers RDD-level checkpoint blocks
    // (connectedComponents') that clearCache cannot reach
    Df.releaseRetained()
    spark.catalog.clearCache()
    val sc = spark.sparkContext
    assert(sc.getPersistentRDDs.isEmpty)
    val d = mkDocs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again aa",
      3L -> "completely different words in this one nothing shared at all here")
    // every lazy operator that persists intermediates attaches them;
    // after the terminal action + release, NOTHING may stay cached
    val results = Seq(
      Dedup.minhashPairs(d, "text", "doc_id", minJaccard = 0.3),
      Dedup.minhashJoin(d, mkDocs(11L -> "the quick brown fox jumps over the lazy dog again and again zz"),
        "text", "doc_id", minJaccard = 0.3),
      Dedup.simhashPairs(d, "text", "doc_id"),
      Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3, minJaccard = 0.3),
      Dedup.lshBucketStats(d, "text", "doc_id"),
      graft.operators.Curation.dedupLines(d, "text", "doc_id"),
      graft.operators.TextAnalytics.unigramLogLoss(d, "text", "doc_id"))
    results.foreach { r =>
      r.sdf.collect()        // terminal action materializes the caches
      r.unpersistIntermediates()
    }
    assert(sc.getPersistentRDDs.isEmpty,
      s"leaked cached blocks: ${sc.getPersistentRDDs.values.map(_.name)}")
    // idempotent: a second release is a no-op
    results.foreach(_.unpersistIntermediates())
    // the registry fallback: a caller that only kept a DERIVED frame
    // (which drops the attachment) still has a precise release path
    val urls = Df.fromRows(spark, Seq(
      org.apache.spark.sql.Row(1L, "https://www.ex.com/a"),
      org.apache.spark.sql.Row(2L, "https://ex.com/a/")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType))))
    val derived = graft.operators.Curation.dedupByUrl(urls, "url", "doc_id")
      .where(org.apache.spark.sql.functions.col("n_copies") > 0)  // combinator INHERITS it
    derived.sdf.collect()
    derived.unpersistIntermediates()                // direct release through the chain
    assert(sc.getPersistentRDDs.isEmpty)
    Df.releaseRetained()                            // fallback now has nothing left
    assert(sc.getPersistentRDDs.isEmpty)
    // frames rebuilt from the bare DataFrame DO lose the attachment —
    // the registry fallback remains the safety net for that path
    val rebuilt = new Df(graft.operators.Curation.dedupByUrl(urls, "url", "doc_id").sdf)
    rebuilt.sdf.collect()
    rebuilt.unpersistIntermediates()                // no-op: bare-DataFrame rebuild
    assert(sc.getPersistentRDDs.nonEmpty)
    Df.releaseRetained()
    assert(sc.getPersistentRDDs.isEmpty)
  }

  test("connectedComponents: repeated runs leave zero persisted blocks after release") {
    Df.releaseRetained()
    spark.catalog.clearCache()
    val sc = spark.sparkContext
    assert(sc.getPersistentRDDs.isEmpty)
    val pairs = Df.fromRows(spark,
      Seq(Row(1L, 2L), Row(2L, 3L), Row(3L, 4L), Row(10L, 11L)),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    (1 to 3).foreach { _ =>
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      assert(cc.sdf.count() == 6)
      // in-loop hygiene: only the FINAL checkpoint (plus nothing else)
      // may be live while the result is held — superseded per-round
      // checkpoints must already be gone (the r12 leak: one per round)
      assert(sc.getPersistentRDDs.size <= 1,
        s"superseded round checkpoints leaked: ${sc.getPersistentRDDs.values.map(_.name)}")
      cc.unpersistIntermediates()
      assert(sc.getPersistentRDDs.isEmpty)
    }
    // the attachment survives the dedup-endgame wrappers (fluent chains)
    val docs6 = mkDocs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 10L -> "e", 11L -> "f")
    val rep = Dedup.keepRepresentatives(docs6, pairs, "doc_id")
      .where(org.apache.spark.sql.functions.col("representative").isNotNull)
    rep.sdf.collect()
    rep.unpersistIntermediates()
    assert(sc.getPersistentRDDs.isEmpty,
      s"keepRepresentatives leaked: ${sc.getPersistentRDDs.values.map(_.name)}")
    // failed (unconverged) runs clean up behind themselves too
    val path = Df.fromRows(spark,
      (1L to 6L).sliding(2).map(w => Row(w(0), w(1))).toSeq,
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    intercept[IllegalStateException](
      Dedup.connectedComponents(path, "id_a", "id_b", maxIter = 2))
    assert(sc.getPersistentRDDs.isEmpty,
      s"failed run leaked: ${sc.getPersistentRDDs.values.map(_.name)}")
  }

  test("duplicatedWindows: cross-doc and within-doc window dups, span union, clean docs") {
    val d = mkDocs(
      1L -> "a b c d e f",          // shares window [a b c d] with doc 2
      2L -> "x y a b c d z",        // partial overlap: 4 of 7 tokens covered
      3L -> "p q p q p q p q",      // internal repetition: fully covered
      4L -> "entirely novel words never repeated anywhere")
    val res = graft.operators.Dedup.duplicatedWindows(d, "text", "doc_id", k = 4)
    val out = res.sdf.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    res.unpersistIntermediates()
    // doc 1: 3 windows, one dup ([a b c d] at start 0) -> 4/6 covered
    assert(out(1L) == ((6L, 3L, 1L, 0.666667)))
    // doc 2: dup window starts at 2 -> 4/7 covered
    assert(out(2L) == ((7L, 4L, 1L, 0.571429)))
    // doc 3: [p q p q] x3 and [q p q p] x2 -> all 5 windows dup,
    // union [0, 8) = the whole doc
    assert(out(3L) == ((8L, 5L, 5L, 1.0)))
    // doc 4: nothing duplicated
    assert(out(4L) == ((6L, 3L, 0L, 0.0)))
  }

  test("removeDuplicatedWindows: keep-first rewrite on mixed cross/within-doc dups") {
    val d = mkDocs(
      1L -> "a b c d e f",          // first occurrence of [a b c d]: kept whole
      2L -> "x y a b c d z",        // loses its copy: [2,6) cut
      3L -> "p q p q p q p q",      // internal: first [p q p q] kept, rest cut
      4L -> "entirely novel words never repeated anywhere")
    val res = graft.operators.Dedup.removeDuplicatedWindows(d, "text", "doc_id", k = 4)
    val out = res.sdf.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    res.unpersistIntermediates()
    assert(out(1L) == (("a b c d e f", 6L, 0L)))
    assert(out(2L) == (("x y z", 7L, 4L)))
    // doc 3: [p q p q]@0 AND [q p q p]@1 are both FIRST occurrences of
    // their hashes; dup instances at starts 2..4 merge to [2, 8) ->
    // "p q" survives
    assert(out(3L) == (("p q", 8L, 6L)))
    assert(out(4L) == (("entirely novel words never repeated anywhere", 6L, 0L)))
  }

  test("lshRecallAudit: subset recall, exact cap accounting, deterministic sample") {
    // one 12-copy family: identical docs share all 3 band buckets, so a
    // cap of 8 drops every one of its C(12,2)=66 pairs; the 3-copy
    // family stays within cap and keeps its 3 pairs
    val docs =
      (0 until 12).map(i => (100L + i) -> "the quick brown fox jumps over the lazy dog") ++
      (0 until 3).map(i => (200L + i) -> "an entirely different document about spark engines") ++
      Seq(300L -> "a unique singleton document with no duplicates at all")
    val d = mkDocs(docs: _*)
    val audit = graft.operators.Dedup.lshRecallAudit(
      d, "text", "doc_id", sampleFraction = 1.0, maxBucket = 8)
    val r = audit.sdf.collect()(0)
    audit.unpersistIntermediates()
    assert(r.getLong(0) == 16L, "sampled_docs")          // fraction 1.0 keeps all
    assert(r.getLong(1) == 69L, "true_pairs")            // 66 + 3
    assert(r.getLong(2) == 3L, "lsh_pairs")              // big family dropped
    assert(r.getDouble(3) == 0.043478, "recall")         // round(3/69, 6)
    assert(r.getLong(4) == 3L, "overcap_buckets")        // 3 bands x 1 key
    assert(r.getLong(5) == 36L, "rows_in_overcap_buckets")
    // with a generous cap the same corpus audits at full recall
    val full = graft.operators.Dedup.lshRecallAudit(
      d, "text", "doc_id", sampleFraction = 1.0, maxBucket = 1000)
    val f = full.sdf.collect()(0)
    full.unpersistIntermediates()
    assert(f.getLong(1) == 69L && f.getLong(2) == 69L && f.getDouble(3) == 1.0)
    assert(f.getLong(4) == 0L && f.getLong(5) == 0L)
  }

  test("duplicatedWindows: docs shorter than k yield zero windows, fraction 0") {
    val d = mkDocs(1L -> "a b", 2L -> "a b")  // exact dups but < k tokens
    val res = graft.operators.Dedup.duplicatedWindows(d, "text", "doc_id", k = 4)
    val out = res.sdf.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    res.unpersistIntermediates()
    assert(out(1L) == ((2L, 0L, 0L, 0.0)) && out(2L) == ((2L, 0L, 0L, 0.0)))
  }

  test("ngramContamination counts distinct shared n-grams per doc") {
    val corpus = mkDocs(1L -> "a b c d e", 2L -> "x y z w v", 3L -> "a b c x q")
    val bench = mkDocs(100L -> "a b c d")
    // bench 3-grams: {abc, bcd}; doc1 shares both, doc3 shares abc only
    val hits = graft.operators.TextAnalytics
      .ngramContamination(corpus, bench, "text", "doc_id")
      .sdf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 2L, 3L -> 1L))
  }

  test("decontaminate drops docs over the contamination threshold, keeps the rest") {
    val corpus = mkDocs(1L -> "a b c d e", 2L -> "x y z w v", 3L -> "a b c q r s t u")
    val bench = mkDocs(100L -> "a b c d")
    // doc1: 3 of 3 trigrams shared (abc, bcd + cde? no — shares abc,bcd) = 2/3
    // doc2: 0/3; doc3: shares abc only = 1/6
    val kept = graft.operators.TextAnalytics
      .decontaminate(corpus, bench, "text", "doc_id", n = 3, maxFraction = 0.2)
      .sdf.collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("contaminated_fraction")).toMap
    assert(kept.keySet == Set(2L, 3L))
    assert(kept(2L) == 0.0 && kept(3L) == 0.166667)
    // threshold 0 = the strict GPT-3 rule: any shared n-gram kills the doc
    val strict = graft.operators.TextAnalytics
      .decontaminate(corpus, bench, "text", "doc_id", n = 3, maxFraction = 0.0)
      .sdf.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(strict == Set(2L))
    // a doc shorter than n tokens has no n-grams: fraction 0, always kept
    val short = graft.operators.TextAnalytics
      .decontaminate(mkDocs(9L -> "a b"), bench, "text", "doc_id", n = 3)
      .sdf.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(short == Set(9L))
  }

  test("unigramLogLoss: repetitive docs score lower than diverse ones") {
    val d = mkDocs(1L -> "w w w w w w w w", 2L -> "q r s t u v x y")
    val nll = graft.operators.TextAnalytics.unigramLogLoss(d, "text", "doc_id")
      .sdf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.catalog.clearCache()
    assert(nll(1L) < nll(2L))
    // doc 1: p(w) = 8/16 → avg_nll = ln 2; doc 2 tokens: p = 1/16 → ln 16
    assert(math.abs(nll(1L) - math.log(2)) < 1e-3)
    assert(math.abs(nll(2L) - math.log(16)) < 1e-3)
  }

  test("connectedComponents: min label propagates across a path graph") {
    // path 1-2-3-4 (diameter 3, needs multi-round propagation) plus an
    // island 10-11; every node must land on its component minimum
    val pairs = Df.fromRows(spark,
      Seq(Row(1L, 2L), Row(2L, 3L), Row(3L, 4L), Row(10L, 11L)),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .sdf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: broadcast-gated and shuffle rounds produce identical labels") {
    // the |V| gate only changes JOIN STRATEGY (labels-side broadcast
    // hints vs shuffle joins) — the min-label fixpoint is order-free,
    // so labels must be identical. A path (multi-round, shortcut
    // engaged) plus a clique plus an island covers all round shapes.
    val pairs = Df.fromRows(spark,
      ((1L to 12L).sliding(2).map(w => Row(w(0), w(1))).toSeq
        ++ Seq(Row(20L, 21L), Row(20L, 22L), Row(21L, 22L), Row(30L, 31L))),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    def run(gate: Long) = {
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b",
        broadcastMaxNodes = gate)
      val out = cc.sdf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cc.unpersistIntermediates()
      out
    }
    val gated = run(250000)
    val shuffled = run(0)
    assert(gated == shuffled)
    assert(gated.size == 17 && gated(12L) == 1L && gated(22L) == 20L && gated(31L) == 30L)
  }

  test("connectedComponents: pointer doubling converges a 64-node path in log rounds") {
    // diameter 63: plain one-hop propagation needs 63 rounds; the
    // label-of-label shortcut collapses chains geometrically, so
    // maxIter = 10 (~log2(63) + slack) must suffice — this pins the
    // logarithmic-convergence contract, not just correctness
    val path = Df.fromRows(spark,
      (1L to 64L).sliding(2).map(w => Row(w(0), w(1))).toSeq,
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val cc = Dedup.connectedComponents(path, "id_a", "id_b", maxIter = 10)
    val out = cc.sdf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.unpersistIntermediates()
    assert(out.size == 64 && out.values.forall(_ == 1L), out.toString)
  }

  test("connectedComponents fails loudly when maxIter < component diameter") {
    val path = Df.fromRows(spark,
      (1L to 6L).sliding(2).map(w => Row(w(0), w(1))).toSeq,
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val e = intercept[IllegalStateException](
      Dedup.connectedComponents(path, "id_a", "id_b", maxIter = 2).sdf.collect())
    assert(e.getMessage.contains("not converged"))
  }

  test("chunkTokens with overlap=0 partitions tokens exactly") {
    // property: stride == size ⇒ chunks tile the token stream — token
    // count conservation and chunk-count closed form hold for any doc
    val d = docs.where(col("doc_id") < 50)
    val chunks = graft.operators.TextAnalytics
      .chunkTokens(d, "text", "doc_id", size = 7, overlap = 0)
    val got = chunks.sdf.groupBy("doc_id")
      .agg(sum(col("n_tokens")).as("tok_sum"), count(lit(1)).as("n_chunks"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = d.sdf.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet == expected.filter(_._2 > 0).keySet)
    got.foreach { case (id, (tokSum, nChunks)) =>
      assert(tokSum == expected(id))
      assert(nChunks == (expected(id) + 6) / 7)
    }
  }

  test("l2Normalize output has unit norm for every real embedding") {
    import graft.functions.VectorFunctions._
    val bad = embs.sdf
      .select(norm(l2Normalize(col("embedding"))).as("n"))
      .where(abs(col("n") - 1.0) > 1e-9).count()
    assert(bad == 0)
  }

  test("keepRepresentatives: singletons keep themselves, clusters keep min") {
    val docs = mkDocs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    val pairs = Df.fromRows(spark, Seq(Row(2L, 3L)),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val rep = Dedup.keepRepresentatives(docs, pairs, "doc_id")
      .sdf.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("representative")).toMap
    assert(rep == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
  }

  test("keepRepresentativesBy: cluster keeps highest score, ties break to highest id") {
    val docs = new Df(Df.fromRows(spark, Seq(
      Row(1L, "a", 5L), Row(2L, "b", 1L), Row(3L, "c", 9L),
      Row(4L, "d", 9L), Row(5L, "e", 2L)),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("score", LongType)))).sdf)
    // cluster {2,3,4}: scores 1,9,9 -> tie between 3 and 4 -> keeper 4
    val pairs = Df.fromRows(spark, Seq(Row(2L, 3L), Row(3L, 4L)),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val rep = Dedup.keepRepresentativesBy(docs, pairs, "doc_id", "score")
      .sdf.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("representative")).toMap
    assert(rep == Map(1L -> 1L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 5L))
    // original columns survive alongside the representative
    val cols = Dedup.keepRepresentativesBy(docs, pairs, "doc_id", "score").sdf.columns.toSet
    assert(Set("doc_id", "text", "score", "representative").subsetOf(cols))
  }

  test("semanticDedup keeps each cluster's best-scoring vector, singletons survive") {
    // v and 0.5v share every sign-bit block (scale invariance) and pass
    // the cosine gate -> one cluster; the negated vector is a singleton.
    // Scores make the COPY the keeper - semantic dedup by quality, not id.
    val rng = new scala.util.Random(29)
    val v = Array.fill(64)(rng.nextFloat() - 0.5f)
    val d = Df.fromRows(spark, Seq(
      Row(1L, v.toSeq, 1.0), Row(2L, v.map(_ * 0.5f).toSeq, 7.0),
      Row(3L, v.map(x => -x).toSeq, 3.0)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("score", DoubleType))))
    val kept = Dedup.semanticDedup(d, "embedding", "vec_id", "score",
      minCosine = 0.99).sdf
    assert(!kept.columns.contains("representative"))
    assert(kept.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("perplexityBuckets: terciles split head/middle/tail; null group -> null bucket") {
    // one token per doc: nll(doc) = -ln(freq/total). freq 3/2/1 over
    // total 6 gives three distinct nll levels; terciles land exactly
    // on the level boundaries (interpolation between equal neighbors)
    val d = new Df(Df.fromRows(spark, Seq(
      Row(1L, "a", "en"), Row(2L, "a", "en"), Row(3L, "a", "en"),
      Row(4L, "b", "en"), Row(5L, "b", "en"), Row(6L, "c", "en"),
      Row(7L, "a", null)),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType)))).sdf)
    val out = graft.operators.TextAnalytics
      .perplexityBuckets(d, "text", "doc_id", "lang")
    val rows = out.sdf.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    out.unpersistIntermediates()
    // doc 7's 'a' raises freq(a) to 4 of 7 total, but stays the
    // lowest-nll token: docs 1-3 head, 4-5 middle, 6 tail
    assert(Seq(1L, 2L, 3L).forall(rows(_) == "head"))
    assert(Seq(4L, 5L).forall(rows(_) == "middle"))
    assert(rows(6L) == "tail")
    assert(rows(7L) == null)  // no cohort, no bucket
    // the approx path assigns the same buckets on small data
    val approx = graft.operators.TextAnalytics
      .perplexityBuckets(d, "text", "doc_id", "lang", exact = false)
    val arows = approx.sdf.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    approx.unpersistIntermediates()
    assert(arows == rows)
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalytics.perplexityBuckets(
        d, "text", "doc_id", "lang", lowCut = 0.9, highCut = 0.1)
    }
  }

  test("tfidf: smoothed idf downweights ubiquitous terms") {
    // 'x' appears in all 3 docs, 'rare' in one: idf(x) = ln(4/4)+1 = 1,
    // idf(rare) = ln(4/2)+1; tf counts are raw occurrences
    val d = mkDocs(1L -> "x x rare", 2L -> "x", 3L -> "x")
    val rows = graft.operators.TextAnalytics.tfidf(d, "text", "doc_id")
      .sdf.collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows((1L, "x")) == (2L, 2.0))            // tf 2 × idf 1
    assert(rows((2L, "x")) == (1L, 1.0))
    assert(rows((1L, "rare"))._1 == 1L)
    assert(math.abs(rows((1L, "rare"))._2 - (math.log(4.0 / 2.0) + 1)) < 1e-3)
  }

  test("chunkTokens: overlap windows, short tail, empty doc yields none") {
    val d = mkDocs(1L -> (1 to 7).map(i => s"t$i").mkString(" "),
      2L -> "a b", 3L -> "   ")
    val rows = graft.operators.TextAnalytics
      .chunkTokens(d, "text", "doc_id", size = 4, overlap = 2)
      .sdf.orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // doc 1: starts 0,2,4 (a start at 6 would add zero NEW tokens —
    // "t7" is already covered by chunk 2, and a pure-duplicate tail
    // chunk must never be emitted by a dedup-centric splitter)
    assert(rows.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, "t1 t2 t3 t4", 4), (1L, 1, "t3 t4 t5 t6", 4),
      (1L, 2, "t5 t6 t7", 3)))
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2)))
    assert(!rows.exists(_._1 == 3L)) // whitespace-only doc: no chunks
    intercept[IllegalArgumentException](
      graft.operators.TextAnalytics.chunkTokens(d, "text", "doc_id", 4, 4))
  }

  test("l2Normalize: unit norm, NULL for null/zero-norm/NaN vectors") {
    import graft.functions.VectorFunctions._
    val d = Df.fromRows(spark, Seq(
      Row(1L, Seq(3f, 4f)), Row(2L, Seq(0f, 0f)), Row(3L, null),
      Row(4L, Seq(Float.NaN, 1f))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val out = d.sdf.select(col("vec_id"), l2Normalize(col("embedding")).as("u"))
      .orderBy("vec_id").collect()
    assert(out(0).getSeq[Double](1) == Seq(0.6, 0.8))
    // zero-norm, NULL, and NaN-bearing vectors all go NULL — Spark
    // orders NaN above every double, so an unguarded NaN would pass
    // the norm > 0 gate and poison downstream top-k
    assert(out(1).isNullAt(1) && out(2).isNullAt(1) && out(3).isNullAt(1))
  }

  test("meanPool averages per (key, position); corrupt elements leave sum AND divisor") {
    val d = Df.fromRows(spark, Seq(
      Row(1L, Seq(1f, 2f), "a"), Row(2L, Seq(3f, 6f), "a"), Row(3L, Seq(10f, 0f), "b"),
      Row(4L, Seq(Float.NaN, null.asInstanceOf[java.lang.Float]), "b")),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)), StructField("label", StringType))))
    val m = graft.operators.Similarity.meanPool(d, "embedding", "label")
      .sdf.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // the NaN/null elements of doc 4 contribute to NEITHER the sum nor
    // the count, so label b's centroid is doc 3 alone
    assert(m == Map(("a", 0) -> 2.0, ("a", 1) -> 4.0, ("b", 0) -> 10.0, ("b", 1) -> 0.0))
  }

  test("lshSignature and ivfTopK drop vectors carrying a NULL element") {
    val rng = new scala.util.Random(5)
    val good = Array.fill(64)(rng.nextFloat() - 0.5f)
    val good2 = Array.fill(64)(rng.nextFloat() - 0.5f)
    val d = Df.fromRows(spark, Seq(
      Row(1L, good.toSeq), Row(3L, good2.toSeq),
      Row(2L, (null.asInstanceOf[java.lang.Float] +: good.tail.map(java.lang.Float.valueOf)).toSeq)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val sigs = d.sdf.select(col("vec_id"),
      Similarity.lshSignature(col("embedding"), 8, 64).as("s"))
      .orderBy("vec_id").collect()
    assert(!sigs(0).isNullAt(1))
    assert(sigs(1).isNullAt(1)) // NULL element → NULL signature, not bucket 0
    val ivf = Similarity.ivfTopK(d.where(col("vec_id") === 1L), d,
      "embedding", "vec_id", k = 2, nlist = 2, nprobe = 2).sdf.collect()
    assert(ivf.map(_.getLong(2)).forall(_ != 2L))
  }

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val q = embs.where(col("vec_id") === 0)
    val top = Similarity.bruteForceTopK(q, embs, "embedding", "vec_id", 5)
      .sdf.orderBy("rank").collect()
    assert(top.length == 5)
    val cosines = top.map(_.getAs[Double]("cosine"))
    assert(cosines.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("lshTopK returns a subset consistent with brute force ranking") {
    val q = embs.where(col("vec_id") < 3)
    val lsh = Similarity.lshTopK(q, embs, "embedding", "vec_id", k = 3)
      .sdf.collect()
    // approximate: every returned neighbor's cosine must be a real cosine
    // (sanity: scores in [-1, 1], ranks start at 1 per query)
    assert(lsh.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0))
    assert(lsh.groupBy(_.getLong(0)).values.forall(_.map(_.getInt(1)).min == 1))
  }

  test("lshSignature at planes=16 × dim=512 matches driver-side reference") {
    // the old element_at formulation exploded to 512 terms per plane and
    // broke Janino at real dims; the zip_with+aggregate form must both
    // compile AND reproduce an ascending-index double fold bit-for-bit
    val dim = 512; val planes = 16
    val rng = new scala.util.Random(7)
    val vecs = (0L until 4L).map(i => i -> Array.fill(dim)(rng.nextFloat() - 0.5f))
    val d = Df.fromRows(spark, vecs.map { case (i, v) => Row(i, v.toSeq) },
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val got = d.sdf
      .select(col("vec_id"), Similarity.lshSignature(col("embedding"), planes, dim).as("sig"))
      .orderBy("vec_id").collect().map(_.getLong(1))
    val want = vecs.map { case (_, v) =>
      (0 until planes).map { j =>
        val w = Similarity.planeWeights(j, dim)
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += v(i).toDouble * w(i); i += 1 }
        if (acc > 0) 1L << j else 0L
      }.sum
    }
    assert(got.toSeq == want)
  }

  test("rollingFingerprint is order-sensitive; set fingerprint is not") {
    val d = mkDocs(1L -> "a b c", 2L -> "c b a", 3L -> "a b c")
    val rows = d.sdf.orderBy("doc_id").select(
      rollingFingerprint(col("text")), fingerprint(col("text"))).collect()
    val (r1, r2, r3) = (rows(0).getLong(0), rows(1).getLong(0), rows(2).getLong(0))
    assert(r1 != r2 && r1 == r3)                      // order matters
    assert(rows(0).getString(1) == rows(1).getString(1)) // set hash: order-free
  }

  test("bpeTokenCount splits letter/digit runs and punctuation marks") {
    val d = mkDocs(1L -> "hello world42, don't!")
    // pieces: hello | world | 42 | , | don | ' | t | !
    val n = d.sdf.select(bpeTokenCount(col("text"))).collect()(0).getInt(0)
    assert(n == 8)
  }

  test("quality score is in [0,1] and favors stopword-bearing text") {
    val d = mkDocs(1L -> ("the quick brown fox " * 30).trim, 2L -> "zz")
    val qs = d.sdf.select(qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0 && q <= 1))
    assert(qs(0) > qs(1))
  }

  test("multimodal: packMedia + extractFeatures round-trip, deterministic") {
    val media = Multimodal.packMedia(docs.head(20, Seq("doc_id")), "doc_id", "text", "text/plain")
    assert(media.columns == Seq("media_id", "payload", "mime", "n_bytes", "digest"))
    val feats = Multimodal.extractFeatures(media).sdf.orderBy("media_id").collect()
    assert(feats.length == 20)
    val again = Multimodal.extractFeatures(media).sdf.orderBy("media_id").collect()
    assert(feats.zip(again).forall { case (a, b) =>
      a.getSeq[Float](2) == b.getSeq[Float](2) })
  }

  test("FakeCodec frame sampling covers the payload") {
    val offs = Multimodal.FakeCodec.sampleOffsets(1000, 4)
    assert(offs == Seq(0, 250, 500, 750))
  }

  test("short/empty docs yield empty shingles and survive dedup pipelines") {
    val d = mkDocs(1L -> "", 2L -> "one", 3L -> "two words",
      4L -> "a b c d e", 5L -> "a b c d f")
    val sh = d.sdf.orderBy("doc_id")
      .select(wordShingles(col("text"), 3)).collect().map(_.getSeq[String](0))
    assert(sh.take(3).forall(_.isEmpty)) // docs with < 3 tokens
    // an unguarded sequence(0, size-n) would throw at runtime here
    val mh = Dedup.minhashPairs(d, "text", "doc_id", minJaccard = 0.3)
      .sdf.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mh.forall { case (a, b) => a >= 4L && b >= 4L })
    val nj = Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3, minJaccard = 0.4)
      .sdf.collect()
    assert(nj.length == 1 && nj(0).getLong(0) == 4L && nj(0).getLong(1) == 5L)
  }

  test("bloomDedupNew equals the exact anti-join; empty corpus/batch edges") {
    val corpus = mkDocs(1L -> "a b c", 2L -> "x y", 3L -> "q r s")
    val batch = mkDocs(
      10L -> "c  b a",          // fingerprint-dup of 1 (order/whitespace)
      11L -> "x y",             // exact dup of 2
      12L -> "brand new doc",
      13L -> "q r s t")         // near, NOT a fingerprint dup
    val got = Dedup.bloomDedupNew(batch, corpus, "text", "doc_id")
    val gotIds = got.sdf.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    got.unpersistIntermediates()
    assert(gotIds == Seq(12L, 13L))
    // empty corpus: the whole batch is new (null-sketch path)
    val all = Dedup.bloomDedupNew(batch, new Df(corpus.sdf.limit(0)), "text", "doc_id")
    val allIds = all.sdf.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    all.unpersistIntermediates()
    assert(allIds == Seq(10L, 11L, 12L, 13L))
    // empty batch: empty result (zero-candidate path)
    val none = Dedup.bloomDedupNew(new Df(batch.sdf.limit(0)), corpus, "text", "doc_id")
    val n = none.sdf.count()
    none.unpersistIntermediates()
    assert(n == 0)
    // an estimate beyond Spark's silent runtime-filter clamp is REFUSED
    // with the conf named, instead of quietly degrading fpp toward 1
    val e = intercept[IllegalArgumentException](
      Dedup.bloomDedupNew(batch, corpus, "text", "doc_id",
        expectedCorpusItems = 500000000L))
    assert(e.getMessage.contains("maxNumItems"))
  }

  test("bloomDedupNew differential vs plain anti-join on the documents corpus") {
    val d = docs.select("doc_id", "text")
    val corpus = d.where(col("doc_id") % 3 < 2)
    // batch = remaining docs + mutated-id copies of corpus docs, so real
    // cross-batch dupes exist by construction
    val batch = Df.concat(Seq(
      d.where(col("doc_id") % 3 === 2),
      corpus.where(col("doc_id") % 11 === 0)
        .selectExpr("doc_id + 90000 AS doc_id", "text")))
    val total = batch.sdf.count()
    val expected = batch.sdf.withColumn("__fp", fingerprint(col("text")))
      .join(corpus.sdf.select(fingerprint(col("text")).as("__fp")),
        Seq("__fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Dedup.bloomDedupNew(batch, corpus, "text", "doc_id")
    val gotIds = got.sdf.select("doc_id").collect().map(_.getLong(0)).toSet
    got.unpersistIntermediates()
    assert(gotIds == expected)
    assert(gotIds.size < total) // the planted dupes were actually removed
  }

  test("zvalue matches a driver-side Morton reference (fuzzed)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map(i =>
      Row(i.toLong, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("id", LongType), StructField("b1", LongType),
      StructField("b2", LongType))))
    def ref(b1: Long, b2: Long): Long = (0 until 8).foldLeft(0L)((acc, j) =>
      acc | (((b1 >> j) & 1L) << (2 * j)) | (((b2 >> j) & 1L) << (2 * j + 1)))
    val got = d.sdf.select(col("id"), col("b1"), col("b2"),
      operators.Layout.zvalue(Seq(col("b1"), col("b2")), 8).as("z"))
      .collect()
    got.foreach(r => assert(r.getLong(3) == ref(r.getLong(1), r.getLong(2)),
      s"id=${r.getLong(0)}"))
    // bad knobs fail at call time with the knob named
    val e = intercept[IllegalArgumentException](
      operators.Layout.zvalue(Seq(col("b1"), col("b2")), 32))
    assert(e.getMessage.contains("cols*bits"))
  }

  test("withZValue NULL/NaN/all-NULL edges: own cluster, fail-fast, constant lane") {
    val rows = Seq(Row(1L, 10.0, 5.0), Row(2L, null, 7.0), Row(3L, 20.0, 9.0))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("a", DoubleType), StructField("b", DoubleType)))
    val d = Df.fromRows(spark, rows, schema)
    // a NULL coordinate -> NULL Morton key (its own leading cluster),
    // never bucket 0 (Spark's greatest/least SKIP nulls — the guard is
    // explicit on both bucketize branches)
    val z = operators.Layout.withZValue(d, Seq("a", "b"), bits = 4)
      .sdf.orderBy("id").collect()
    assert(!z(0).isNullAt(3) && z(1).isNullAt(3) && !z(2).isNullAt(3))
    // all-NULL column: constant-0 lane — the OTHER dimension still
    // clusters, the key is non-NULL
    val dn = Df.fromRows(spark,
      Seq(Row(1L, 1.0, null), Row(2L, 2.0, null), Row(3L, 3.0, null)),
      schema)
    val zn = operators.Layout.withZValue(dn, Seq("a", "b"), bits = 4)
      .sdf.orderBy("id").collect()
    assert(zn.forall(!_.isNullAt(3)))
    assert(zn.map(_.getLong(3)).distinct.length > 1, "dimension a still clusters")
    // one NaN would poison the division for every row — named fail-fast
    val dnan = Df.fromRows(spark,
      Seq(Row(1L, 1.0, 2.0), Row(2L, Double.NaN, 3.0)), schema)
    val e2 = intercept[IllegalArgumentException](
      operators.Layout.withZValue(dnan, Seq("a", "b"), bits = 4))
    assert(e2.getMessage.contains("NaN") && e2.getMessage.contains("'a'"))
  }

  test("zorderBy range-clusters the Morton key: sorted partitions, disjoint ranges") {
    val o = Df.readParquet(spark, s"$sf/orders.parquet")
    val zb = operators.Layout.zorderBy(
      o, Seq("o_totalprice", "o_custkey"), bits = 8, numPartitions = 8)
    import spark.implicits._
    val parts = zb.sdf.select("zval").as[Long].mapPartitions { it =>
      val s = it.toArray
      if (s.isEmpty) Iterator.empty
      else Iterator((s.head, s.last, s.sliding(2).forall(p => p.length < 2 || p(0) <= p(1))))
    }.collect().sortBy(_._1)
    assert(parts.nonEmpty && parts.forall(_._3), "every partition sorted by zval")
    parts.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._2 <= w(1)._1, s"overlapping ranges: $w")
    }
    // 2 lanes x 8 bits -> the key fits 16 bits
    val mx = zb.sdf.agg(max(col("zval"))).head.getLong(0)
    assert(mx >= 0 && mx < (1L << 16))
  }

  test("simhashPairs recall contract: finds EVERY pair within maxHamming") {
    // family of docs at graded distances from a 40-token base
    val base = (1 to 40).map(i => s"tok$i")
    val d = mkDocs((0 to 8).map(i =>
      i.toLong -> base.zipWithIndex.map { case (t, j) =>
        if (j < i) s"alt${i}_$j" else t }.mkString(" ")): _*)
    val sigs = Dedup.simhash(d, "text", "doc_id").sdf.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if ham(sigs(a), sigs(b)) <= 6
    } yield (a, b)).toSet
    val found = Dedup.simhashPairs(d, "text", "doc_id", maxHamming = 6)
      .sdf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == expected) // pigeonhole guarantee: exact recall
    // non-vacuous: the corpus must actually contain pairs beyond the old
    // 4-band guarantee radius (Hamming 4-6)
    assert(expected.exists { case (a, b) =>
      val h = ham(sigs(a), sigs(b)); h >= 4 && h <= 6 })
  }

  test("lsh bucket cap drops hot buckets, keeps the rest") {
    val near = (1 to 6).map(i => i.toLong -> "a b c d e f g h i j")
    val d = mkDocs((near :+ (9L -> "x y z w v u t s r q")): _*)
    // cap 5 < 6 identical docs → their buckets are dropped entirely
    val capped = Dedup.minhashPairs(d, "text", "doc_id",
      minJaccard = 0.3, maxBucket = 5).sdf.collect()
    assert(capped.isEmpty)
    val uncapped = Dedup.minhashPairs(d, "text", "doc_id",
      minJaccard = 0.3).sdf.collect()
    assert(uncapped.length == 15) // all 6-choose-2 identical pairs
    val stats = Dedup.lshBucketStats(d, "text", "doc_id")
      .sdf.collect().map(_.getLong(2))
    assert(stats.max == 6) // hot bucket visible to the auditing helper
  }

  test("bucketPairs pre-filter gate: window and anti-join paths identical") {
    // r22 scale gate (spark.graft.dedup.pairsPrecountBytes): below the
    // threshold the hot-bucket pre-filter is an in-stage window count,
    // above it a count-aggregate + broadcast anti-join. Both must drop
    // exactly the over-cap buckets and emit identical pairs — pinned
    // differentially on a corpus with one over-cap clique (5 identical
    // docs > maxBucket=4), surviving near-dups, and an unrelated doc.
    val docs = ((1 to 5).map(i => i.toLong -> "a b c d e f g h i j") ++
      Seq(20L -> "k l m n o p q r s t", 21L -> "k l m n o p q r s u",
        30L -> "zz yy xx ww vv uu tt ss rr qq")).toSeq
    val d = mkDocs(docs: _*)
    val key = "spark.graft.dedup.pairsPrecountBytes"
    def run(thresh: String): Seq[String] = {
      spark.conf.set(key, thresh)
      try {
        Seq(Dedup.minhashPairs(d, "text", "doc_id",
              minJaccard = 0.3, maxBucket = 4),
            Dedup.simhashPairs(d, "text", "doc_id", maxBucket = 4),
            Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3,
              minJaccard = 0.3, maxBucket = 4))
          .map(_.sdf.collect().map(_.toString).sorted.mkString("|"))
      } finally spark.conf.unset(key)
    }
    val win = run(Long.MaxValue.toString) // everything below → window path
    val anti = run("0")                   // everything above → anti path
    assert(win == anti)
    // the cap did something on both paths: the 5-clique pairs are gone
    assert(!win.head.contains("[1,2,")) // no pair within the dropped clique
    assert(win.head.nonEmpty)           // 20-21 near-dup pair survives
  }

  test("frameSamplePlan offsets equal the stub sampler's, per media") {
    val docs = Df.readParquet(spark, s"$sf/documents.parquet")
    val media = Multimodal.packMedia(
      docs.head(10, Seq("doc_id")), "doc_id", "text", "video/fake")
    val planned = Multimodal.frameSamplePlan(media, frames = 5).sdf
      .orderBy("media_id", "frame_idx").collect()
      .groupBy(_.getAs[Long]("media_id"))
      .map { case (id, rows) => id -> rows.sortBy(_.getAs[Int]("frame_idx"))
        .map(_.getAs[Int]("byte_offset")).toSeq }
    val meta = media.sdf.select("media_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(planned.nonEmpty)
    for ((id, offs) <- planned)
      assert(offs == Multimodal.FakeCodec.sampleOffsets(meta(id), 5))
  }

  test("perceptualHash sets exactly the above-mean bits") {
    val rows = Seq(Row(1L, Array(0.9f, 0.1f, 0.9f, 0.1f)),
      Row(2L, Array(0.5f, 0.5f, 0.5f, 0.5f)))
    val d = new Df(spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("feature",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType))))))
    val got = Multimodal.perceptualHash(d, dim = 4).sdf
      .orderBy("media_id").collect().map(_.getAs[Int]("phash")).toSeq
    assert(got == Seq(1 + 4, 0)) // bits 0 and 2 above mean; all-equal -> 0
  }
}
