package graft

import graft.api.Df
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Empirical scale datapoint for the near-dup pair family (the round-4
  * verdict's ask): replicate the driver's documents/embeddings tables
  * m× (ids offset, replicas made near-dup-distinct by a replica token)
  * and measure how result pairs, predicted candidates (Σ b² over LSH
  * buckets), and wall time grow with corpus size.
  *
  * What the capped-bucket model predicts — and this main verifies:
  * within-cap candidate volume grows ~quadratically on this
  * deliberately-collision-heavy corpus (31-word vocabulary: every
  * bucket is hot, the LSH worst case), while `maxBucket` bounds the
  * per-bucket term at cap² and `lshBucketStats` reports exactly how
  * much recall was traded. On a real heavy-tailed corpus the same cap
  * turns the tail's quadratic term into a reported, bounded drop.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_SCALES=1,3,10 \
  *        sbt "runMain graft.BenchPairs"
  * Prints one JSON line per scale + a closing summary line.
  */
object BenchPairs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val maxBucket = sys.env.get("SPARK_GRAFT_MAXBUCKET")
      .flatMap(_.toIntOption).getOrElse(Dedup.DefaultMaxBucket)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docsX(m: Int): Df = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      new Df((0 until m).map { i =>
        if (i == 0) d
        else d.select((col("doc_id") + i * 10000000L).as("doc_id"),
          concat(col("text"), lit(s" r$i")).as("text"))
      }.reduce(_ unionByName _))
    }
    def embsX(m: Int): Df = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding", "label")
      new Df((0 until m).map { i =>
        if (i == 0) e
        else e.select((col("vec_id") + i * 10000000L).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionByName _))
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val rows = scales.map { m =>
      val d = docsX(m)
      val nDocs = d.sdf.count()
      // predicted candidate volume from the audit helper: Σ b·(b−1)/2
      // over (band,key) buckets — what the candidate join will produce
      val stats = Dedup.lshBucketStats(d, "text", "doc_id").sdf
        .agg(sum(expr("bucket_size * (bucket_size - 1) / 2")).as("pred_candidates"),
          max(col("bucket_size")).as("max_bucket"),
          sum(when(col("bucket_size") > maxBucket,
            col("bucket_size")).otherwise(0L)).as("rows_in_overcap_buckets"))
        .collect()(0)
      graft.api.Df.releaseRetained()
      spark.catalog.clearCache()
      val (nExact, tExact) = timed(
        Dedup.exactByFingerprint(d, "text", "doc_id").sdf.count())
      val (nMinhash, tMinhash) = timed(
        Dedup.minhashPairs(d, "text", "doc_id", minJaccard = 0.5,
          maxBucket = maxBucket).sdf.count())
      graft.api.Df.releaseRetained()
      spark.catalog.clearCache()
      val (nNgram, tNgram) = timed(
        Dedup.ngramJaccardPairs(d, "text", "doc_id", minJaccard = 0.5,
          maxBucket = maxBucket).sdf.count())
      graft.api.Df.releaseRetained()
      spark.catalog.clearCache()
      val e = embsX(m)
      val nVecs = e.sdf.count()
      val (nEmb, tEmb) = timed(
        Dedup.embeddingCosinePairs(e, "embedding", "vec_id", "label", 0.99,
          maxBucket = maxBucket).sdf.count())
      graft.api.Df.releaseRetained()
      spark.catalog.clearCache()
      val json =
        s"""{"scale":$m,"docs":$nDocs,"vecs":$nVecs,""" +
        s""""pred_candidates":${stats.get(0)},"max_bucket":${stats.get(1)},""" +
        s""""rows_in_overcap_buckets":${stats.get(2)},""" +
        s""""exact_groups":$nExact,"exact_sec":$tExact,""" +
        s""""minhash_pairs":$nMinhash,"minhash_sec":$tMinhash,""" +
        s""""ngram_pairs":$nNgram,"ngram_sec":$tNgram,""" +
        s""""embedding_pairs":$nEmb,"embedding_sec":$tEmb}"""
      println(json)
      json
    }
    println(s"""{"metric":"pairs_scale","sf":"$sfDir","max_bucket_cap":$maxBucket,"scales":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
