package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming specs: the windowed streaming plans must agree with their
  * batch equivalents over the same bounded input (the strongest check
  * available without an unbounded source). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  /** FileStreamSource requires a directory: stage the single events
    * parquet file into a temp dir (simulating an arriving-files feed). */
  private lazy val stageDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("windowed type counts: streaming result equals batch result") {
    // stream the events parquet as if it were arriving
    val dir = stageDir
    val stream = StreamOps.readEventsStream(spark, dir)
    val result = StreamOps.runToCompletion(
      StreamOps.windowedTypeCounts(stream), "win_counts")

    val batch = graft.queries.QueryUtil.events(spark, dir).sdf
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

    val s = result.orderBy("win_start", "event_type").collect()
    val b = batch.orderBy("win_start", "event_type").collect()
    assert(s.length == b.length && s.length > 0)
    assert(s.zip(b).forall { case (x, y) =>
      x.getTimestamp(0) == y.getTimestamp(0) && x.getString(1) == y.getString(1) &&
        x.getLong(2) == y.getLong(2) })
  }

  test("streaming exact dedup emits one doc per fingerprint, equal to batch") {
    // stage documents TWICE (two arriving files = the re-crawl shape):
    // every fingerprint arrives at least twice, dedup must emit it once
    val d = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"), d.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"), d.resolve("b.parquet"))
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString)
    val result = StreamOps.runToCompletion(
      StreamOps.streamingExactDedup(stream, "text"), "dedup_stream",
      mode = "append")
    val batchDistinct = graft.operators.Dedup.exactByFingerprint(
      new graft.api.Df(spark.read.parquet(d.toString)), "text", "doc_id")
      .sdf.count()
    assert(result.count() == batchDistinct)
    assert(result.count() < spark.read.parquet(d.toString).count())
  }

  test("composed streaming curation: quality filter + dedup equals batch") {
    // the whole ingestion-side curation shape on one unbounded plan:
    // score -> filter -> exact dedup, identical operators to the batch
    // q85 pipeline stages
    import graft.functions.TextFunctions._
    val d = java.nio.file.Files.createTempDirectory("graft_curation_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"), d.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"), d.resolve("b.parquet"))
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString)
      .withColumn("quality", qualityScore(col("text")))
      .where(col("quality") >= 0.4)
    val result = StreamOps.runToCompletion(
      StreamOps.streamingExactDedup(stream, "text"), "curation_stream",
      mode = "append")
    val batch = spark.read.parquet(d.toString)
      .withColumn("quality", qualityScore(col("text")))
      .where(col("quality") >= 0.4)
      .withColumn("__fp", fingerprint(col("text")))
      .dropDuplicates("__fp")
    assert(result.count() == batch.count() && result.count() > 0)
  }

  test("bounded-state dedup (within-watermark) equals global distinct when dups are close in event time") {
    val d = java.nio.file.Files.createTempDirectory("graft_wm_dedup_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"), d.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"), d.resolve("b.parquet"))
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val result = StreamOps.runToCompletion(
      StreamOps.streamingDedupWithinWatermark(stream, "text", "ts", "2 hours"),
      "wm_dedup_stream", mode = "append")
    val batchDistinct = spark.read.parquet(d.toString)
      .select(graft.functions.TextFunctions.fingerprint(col("text"))).distinct().count()
    // every dup pair (the re-arrival wave AND the corpus's own exact
    // dups) is within the 2 h horizon -> bounded state, exact result
    assert(result.count() == batchDistinct)
    assert(result.count() > 0 && result.count() < spark.read.parquet(d.toString).count())
  }

  test("streaming URL dedup collapses disguises to one emission; NULL urls all survive") {
    val d = java.nio.file.Files.createTempDirectory("graft_url_dedup_stream")
    val rows = Seq(
      (1L, "https://www.ex.com/a"),        // three disguises of /a
      (2L, "HTTPS://EX.COM:443/a#frag"),
      (3L, "https://ex.com/a?utm_source=t"),
      (4L, "https://ex.com/b"),
      (5L, null.asInstanceOf[String]),     // two null-url docs: both kept
      (6L, null.asInstanceOf[String]))
    // the stream source lists top-level files only: write to a side dir
    // and hoist the part file up as a flat a.parquet
    val side = java.nio.file.Files.createTempDirectory("graft_url_dedup_write")
    spark.createDataFrame(rows).toDF("doc_id", "url")
      .coalesce(1).write.mode("overwrite").parquet(side.toString)
    val part = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(side).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
    }
    java.nio.file.Files.copy(part, d.resolve("a.parquet"))
    val schema = spark.read.parquet(d.resolve("a.parquet").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val result = StreamOps.runToCompletion(
      StreamOps.streamingUrlDedup(stream, "url", "doc_id", "ts", "2 hours"),
      "url_dedup_stream", mode = "append")
      .select("doc_id", "canonical_url").collect()
    val byCanon = result.groupBy(r => Option(r.getString(1)))
    // /a emitted once (FIRST arrival of the canonical key wins is not
    // guaranteed across engines, but exactly ONE of ids 1..3 survives)
    assert(byCanon(Some("https://ex.com/a")).map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L, 3L)))
    assert(byCanon(Some("https://ex.com/a")).length == 1)
    assert(byCanon(Some("https://ex.com/b")).map(_.getLong(0)).toSeq == Seq(4L))
    assert(byCanon(None).map(_.getLong(0)).toSet == Set(5L, 6L))
    assert(result.length == 4)
  }

  test("stream-static enrich equals the batch join; dim side broadcasts") {
    val dir = stageDir
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
      .selectExpr("user_id", "CAST(user_id % 3 AS STRING) AS k")
    val dim = spark.range(0, 2).selectExpr(
      "CAST(id AS STRING) AS k", "id * 100 AS bonus")
    val enriched = StreamOps.streamStaticEnrich(stream, dim, Seq("k"))
    val out = StreamOps.runToCompletion(enriched, "enrich_sink",
      mode = "append")
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("bonus")).as("bonus_sum")).orderBy("k").collect()
    val batch = spark.read.parquet(dir)
      .selectExpr("user_id", "CAST(user_id % 3 AS STRING) AS k")
      .join(dim, Seq("k"), "left")
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("bonus")).as("bonus_sum")).orderBy("k").collect()
    assert(out.toSeq == batch.toSeq && out.length == 3)
    // k=2 has no dim row: kept by the left join with a null bonus
    assert(out.find(_.getString(0) == "2").exists(_.isNullAt(2)))
    // inner mode drops it
    val inner = StreamOps.runToCompletion(
      StreamOps.streamStaticEnrich(stream, dim, Seq("k"), how = "inner"),
      "enrich_inner_sink", mode = "append")
      .select("k").distinct().collect().map(_.getString(0)).toSet
    assert(inner == Set("0", "1"))
    intercept[IllegalArgumentException] {
      StreamOps.streamStaticEnrich(stream, dim, Seq("k"), how = "full")
    }
  }

  test("flatMapGroupsWithState: stateful totals equal batch groupBy") {
    val stream = StreamOps.readEventsStream(spark, stageDir)
    val result = StreamOps.runToCompletion(
      StreamOps.statefulUserTotals(stream), "stateful_totals", mode = "append")
    // single input file → single trigger → final state equals batch agg
    val got = result.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 100) / 100))
    val batch = spark.read.parquet(s"$stageDir/events.parquet")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 100) / 100))
    assert(got.toSeq == batch.toSeq)
  }

  test("sliding windows produce overlapping assignments") {
    val dir = stageDir
    val stream = StreamOps.readEventsStream(spark, dir)
    val result = StreamOps.runToCompletion(
      StreamOps.slidingUserActivity(stream), "sliding_counts")
    val total = result.agg(sum("n_events")).collect()(0).getLong(0)
    val rows = spark.read.parquet(dir).count()
    // each event lands in exactly 2 sliding windows (1h window, 30m slide)
    assert(total == 2 * rows)
  }

  test("runToParquet round-trips an EMPTY bounded stream as an empty frame") {
    // a filter no row passes: the file sink commits zero part files and
    // the read-back must yield the empty frame (under the stream's own
    // schema), not an "unable to infer schema" error
    val stream = StreamOps.readEventsStream(spark, stageDir)
      .where(col("event_type") === "__no_such_type")
    val out = java.nio.file.Files.createTempDirectory("graft_empty_sink")
    val got = StreamOps.runToParquet(stream,
      out.resolve("data").toString, out.resolve("cp").toString)
    assert(got.count() == 0)
    assert(got.columns.contains("event_type") && got.columns.contains("ts"))
  }

  test("stream-stream interval join matches inside the bound, drops outside, equals batch") {
    // views/clicks split from the same bounded feed: the join must
    // reproduce the batch interval join exactly (all rows on time)
    val dir = stageDir
    def side(t: String) = StreamOps.readEventsStream(spark, dir)
      .where(col("event_type") === t && col("user_id") < 10)
    val streamed = StreamOps.runToCompletion(
      StreamOps.streamStreamIntervalJoin(side("view"), side("click"), "user_id"),
      "interval_join", mode = "append").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).sorted.toSeq
    val e = graft.queries.QueryUtil.events(spark, dir).sdf
      .where(col("user_id") < 10)
    val v = e.where(col("event_type") === "view").select(col("user_id"), col("ts").as("l_ts"))
    val c = e.where(col("event_type") === "click").select(col("user_id"), col("ts").as("r_ts"))
    val batch = v.join(c, Seq("user_id"))
      .where(col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 1 hour"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // every emitted pair respects the band by construction
    assert(streamed.forall { case (_, l, r) =>
      r.getTime >= l.getTime && r.getTime <= l.getTime + 3600000L })
  }

  test("stream-stream LEFT OUTER interval join emits null-match rows after the watermark passes") {
    // wave 1: user 1 view@t0 + click@t0+30m (match), view@t0+2h (no
    // click); user 2 view@t0 (no click). wave 2: a user_id=-1 sentinel
    // 6h later — with watermark 0s it proves no match can arrive, so
    // the two never-converted views must emit with r_ts null.
    val t0 = 1700000000000L
    def row(id: Long, uid: Long, offMin: Int, t: String) =
      (id, new java.sql.Timestamp(t0 + offMin * 60000L), uid, t, 1.0, "{}")
    val dir = java.nio.file.Files.createTempDirectory("graft_louter")
    dir.toFile.deleteOnExit()
    import spark.implicits._
    Seq(row(1, 1, 0, "view"), row(2, 1, 30, "click"),
      row(3, 1, 120, "view"), row(4, 2, 0, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dir.resolve("arrival_01").toString)
    Seq(row(-1, -1, 360, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dir.resolve("arrival_02").toString)
    // flatten the two waves into ordered arrival files
    val feed = java.nio.file.Files.createTempDirectory("graft_louter_feed")
    feed.toFile.deleteOnExit()
    for ((w, i) <- Seq("arrival_01", "arrival_02").zipWithIndex) {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(dir.resolve(w))
      val f = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
      java.nio.file.Files.copy(f, feed.resolve(f"arrival_$i%02d.parquet"))
    }
    def side(t: String) = StreamOps.readEventsStream(spark, feed.toString)
      .where(col("user_id") < 0 || col("event_type") === t)
    val got = StreamOps.runToCompletion(
      StreamOps.streamStreamIntervalJoin(side("view"), side("click"),
        "user_id", watermark = "0 seconds", how = "leftOuter"),
      "louter_join", mode = "append").collect()
      .filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        Option(r.getTimestamp(2)).map(_.getTime))).sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      (1L, t0, Some(t0 + 30 * 60000L)),
      (1L, t0 + 120 * 60000L, None),
      (2L, t0, None)))
  }

  test("KLL-in-state snapshot: exact n, quantiles inside the rank band, " +
    "state drains on the timer") {
    val t0 = 1700000000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_kll_feed")
    dir.toFile.deleteOnExit()
    import spark.implicits._
    // wave 1: 1..1000 for one key; wave 2: a far-future sentinel
    (1 to 1000).map(i =>
        (i.toLong, new java.sql.Timestamp(t0 + i * 1000L), 7L, "m", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dir.resolve("w1").toString)
    Seq((-1L, new java.sql.Timestamp(t0 + 7200L * 1000L), -1L, "m", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dir.resolve("w2").toString)
    val feed = java.nio.file.Files.createTempDirectory("graft_kll_flat")
    feed.toFile.deleteOnExit()
    for ((w, i) <- Seq("w1", "w2").zipWithIndex) {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(dir.resolve(w))
      val f = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
      java.nio.file.Files.copy(f, feed.resolve(f"arrival_$i%02d.parquet"))
    }
    val out = StreamOps.runWithRocksDbState(spark) {
      StreamOps.runToCompletion(
        StreamOps.streamingKllQuantiles(
          StreamOps.readEventsStream(spark, feed.toString)),
        "kll_state", mode = "append")
    }.collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 1000L)
    assert(math.abs(r.getAs[Double]("q50") - 500.0) <= 30.0)
    assert(math.abs(r.getAs[Double]("q25") - 250.0) <= 30.0)
    assert(math.abs(r.getAs[Double]("q75") - 750.0) <= 30.0)
  }

  test("chained rollup keeps the sentinel cut ABOVE the watermark node") {
    // if the optimizer pushed `user_id >= 0` below EventTimeWatermark,
    // punctuation rows would be dropped before the watermark observed
    // them and the cascade's final windows would never close (the
    // silent q246 failure mode: 29 of 30 days)
    import org.apache.spark.sql.catalyst.plans.logical.{EventTimeWatermark, Filter}
    // optimize by hand: .optimizedPlan on a streaming frame trips the
    // batch-execution checker before ever optimizing
    val plan = spark.sessionState.optimizer.execute(
      StreamOps.streamingHourlyDailyRollup(
        StreamOps.readEventsStream(spark, stageDir))
        .queryExecution.analyzed)
    val wmark = plan.collect { case w: EventTimeWatermark => w }
    assert(wmark.nonEmpty)
    // no Filter referencing user_id may appear BELOW the watermark node
    val below = wmark.head.collect {
      case f: Filter if f.condition.references.exists(_.name == "user_id") => f
    }
    assert(below.isEmpty, s"sentinel filter was pushed below the watermark")
    // and the cut must still exist somewhere above it
    val above = plan.collect {
      case f: Filter if f.condition.references.exists(_.name == "user_id") => f
    }
    assert(above.nonEmpty)
  }

  /** one-key synthetic feed: steady 100/102 alternation (σ settles
    * ≈0.8, so the ±1 swing stays inside 3σ) with one 1000 spike at
    * i=45 — exactly one >3σ excursion */
  private def ewmaSample(i: Int): Double =
    if (i == 45) 1000.0 else 100.0 + 2 * (i % 2)
  private def ewmaFeed(dir: java.nio.file.Path, lo: Int, hi: Int): Unit = {
    val rows = (lo until hi).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), "a",
        ewmaSample(i))
    }
    import spark.implicits._
    rows.toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir.toString)
  }

  test("streaming EWMA anomaly: spike flagged, final state equals the batch recursion") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ewma_feed")
    dir.toFile.deleteOnExit()
    ewmaFeed(dir, 0, 60)
    val st = spark.readStream
      .schema(spark.read.parquet(dir.toString).schema)
      .parquet(dir.toString)
    val out = StreamOps.runToCompletion(
      StreamOps.streamingEwmaAnomaly(st, keyCol = "event_type"),
      "ewma_anomaly", mode = "append").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 60L)
    // the lone spike is the only row > 3σ from the running mean
    assert(r.getLong(3) == 1L, s"n_anomalies = ${r.getLong(3)}")
    // batch recursion replay
    var y = 0.0; var started = false
    (0 until 60).foreach { i =>
      val x = ewmaSample(i)
      if (!started) { y = x; started = true } else y = 0.5 * x + 0.5 * y
    }
    assert(math.abs(r.getDouble(2) - y) < 1e-9, s"${r.getDouble(2)} vs $y")
  }

  test("streaming EWMA anomaly: state carries across triggers (two arrival waves)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ewma_feed2")
    dir.toFile.deleteOnExit()
    ewmaFeed(dir, 0, 30)   // wave 1
    ewmaFeed(dir, 30, 60)  // wave 2 (second file → second trigger)
    val st = spark.readStream
      .schema(spark.read.parquet(dir.toString).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val out = StreamOps.runToCompletion(
      StreamOps.streamingEwmaAnomaly(st, keyCol = "event_type"),
      "ewma_anomaly2", mode = "append").collect()
    // one emission per trigger; the LAST (n=60) must equal the
    // single-trigger recursion — state crossed the trigger boundary
    val last = out.maxBy(_.getLong(1))
    assert(out.length == 2 && last.getLong(1) == 60L)
    var y = 0.0; var started = false
    (0 until 60).foreach { i =>
      val x = ewmaSample(i)
      if (!started) { y = x; started = true } else y = 0.5 * x + 0.5 * y
    }
    assert(math.abs(last.getDouble(2) - y) < 1e-9)
    assert(last.getLong(3) == 1L)
  }

  test("transformWithState top-k per key equals the batch row_number cut") {
    val dir = stageDir
    val stream = StreamOps.readEventsStream(spark, dir)
      .where(col("user_id") < 30)
    val got = StreamOps.runWithRocksDbState(spark) {
      StreamOps.runToCompletion(
        StreamOps.streamingTopKPerKey(stream, k = 3),
        "tws_topk", mode = "append").collect()
    }.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val want = graft.queries.QueryUtil.events(spark, dir).sdf
      .where(col("user_id") < 30)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Int]("rank"))).sorted.toSeq
    assert(got.nonEmpty && got == want)
  }

  test("transformWithState top-k state merges across triggers (two arrival waves)") {
    val d = java.nio.file.Files.createTempDirectory("graft_tws_feed")
    d.toFile.deleteOnExit()
    // wave 1: key 1 sees values 10..19; wave 2: 5 higher ones arrive
    def wave(lo: Int, hi: Int): Unit = {
      import spark.implicits._
      (lo until hi).map(i => (i.toLong, 1L, i.toDouble)).toDF(
        "event_id", "user_id", "value")
        .coalesce(1).write.mode("append").parquet(d.toString)
    }
    wave(10, 20); wave(100, 105)
    val st = spark.readStream
      .schema(spark.read.parquet(d.toString).schema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString)
    val out = StreamOps.runWithRocksDbState(spark) {
      StreamOps.runToCompletion(
        StreamOps.streamingTopKPerKey(st, k = 3),
        "tws_topk2", mode = "append").collect()
    }
    // 2 triggers × 3 ranks; the FINAL trigger's top-3 must be the
    // global best regardless of which wave carried them
    assert(out.length == 6)
    val finalTop = out.map(r => (r.getLong(1), r.getInt(3)))
      .groupBy(_._1).keySet // event_ids emitted
    val lastWave = out.filter(_.getDouble(2) >= 100.0)
      .map(r => (r.getLong(1), r.getInt(3))).sorted.toSeq
    assert(lastWave == Seq((102L, 3), (103L, 2), (104L, 1)),
      out.mkString(","))
    assert(finalTop.contains(19L)) // wave-1's best ranked in trigger 1
  }

  test("timer sessionization equals batch session_window; idle keys drain via timers") {
    // stage: the real feed, then two punctuation waves (+1h, +2h past
    // the max event time) whose only job is advancing the watermark so
    // every final session's gap timer fires
    val d = java.nio.file.Files.createTempDirectory("graft_tws_sessions")
    d.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("arrival_01.parquet"))
    val raw = spark.read.parquet(s"$sf/events.parquet")
    def sentinel(hours: Int, name: String): Unit = {
      val side = java.nio.file.Files.createTempDirectory("graft_tws_sent")
      raw.orderBy(col("ts").desc).limit(1)
        .withColumn("ts", expr(s"ts + INTERVAL $hours HOUR"))
        .withColumn("event_id", lit(-1L))
        .withColumn("user_id", lit(-1L))
        .coalesce(1).write.mode("overwrite").parquet(side.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(side).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, d.resolve(name))
    }
    sentinel(1, "arrival_02.parquet")
    sentinel(2, "arrival_03.parquet")
    val stream = StreamOps.readEventsStream(spark, d.toString)
      .where(col("user_id") < 20)
    val got = StreamOps.runWithRocksDbState(spark) {
      StreamOps.runToCompletion(
        StreamOps.streamingSessionizeWithTimers(stream,
          watermark = "0 seconds"),
        "tws_sessions", mode = "append").collect()
    }.map(r => (r.getLong(2), r.getTimestamp(0), r.getTimestamp(1),
      r.getLong(3), math.rint(r.getDouble(4) * 100) / 100)).sorted.toSeq
    val want = StreamOps.userSessions(
      graft.queries.QueryUtil.events(spark, s"$sf").sdf
        .where(col("user_id") < 20 && col("user_id") >= 0))
      .collect()
      .map(r => (r.getLong(2), r.getTimestamp(0), r.getTimestamp(1),
        r.getLong(3), math.rint(r.getDouble(4) * 100) / 100)).sorted.toSeq
    assert(got.nonEmpty && got == want,
      s"got ${got.size} sessions vs ${want.size}")
  }
}
