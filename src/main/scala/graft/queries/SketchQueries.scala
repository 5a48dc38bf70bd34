package graft.queries

import graft.operators.Sketches
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** Mergeable-sketch state + time-range windows. q234–q235.
  *
  * q234 is the "sketch as a column" pattern: per-language HLL sketches
  * built in ONE partial+final aggregate (kilobytes shuffle, never raw
  * keys), then rolled up to a corpus-wide estimate by unioning the
  * sketches — the source is NOT rescanned for the rollup. The oracle
  * replays the exact distinct counts and pins the estimates to ±10%
  * (≈6 relative standard errors at lgK=12) — the q37 invariant-oracle
  * pattern.
  *
  * q235 is a value-based (RANGE) window frame: trailing-1-hour event
  * count/sum per user. RANGE frames are tie-safe by construction —
  * every row with the same ORDER value gets the same frame — so the
  * aggregate is deterministic even where (user_id, ts) had duplicates.
  */
object SketchQueries {

  val defs: Map[String, Q] = Map(
    // ---- HLL sketch column per language + merged corpus rollup ----
    "q234_hll_sketch_union" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val sk = Sketches.hllSketches(docs, Seq("lang"), "doc_id")
      val perLang = Sketches.hllEstimates(sk)
        .assign("within_tol",
          abs(col("estimate") - col("n_exact")) <= lit(0.1) * col("n_exact"))
        .select("lang", "n_exact", "within_tol")
      val overallExact = docs.sdf
        .agg(countDistinct(col("doc_id")).as("n_exact"))
      val rollup = new graft.api.Df(
        Sketches.hllRollup(sk).sdf.crossJoin(broadcast(overallExact))
          .select(lit("ALL").as("lang"), col("n_exact"),
            (abs(col("estimate") - col("n_exact")) <= lit(0.1) * col("n_exact"))
              .as("within_tol")))
      graft.api.Df.concat(Seq(perLang, rollup))
        .sortValues(Seq("lang")).sdf
    }),

    // ---- trailing-1h RANGE window per user over event time ----
    "q235_rolling_time" -> ((s, dir) => {
      val e = events(s, dir)
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      val rolled = e.sdf
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          sum(col("value").cast("decimal(28,10)")).over(w).cast("double"))
      new graft.api.Df(rolled)
        .where(col("event_id") % 20 === 0)
        .select("user_id", "event_id", "ts", "n_1h", "sum_1h")
        .sortValues(Seq("user_id", "ts")).sdf
    }))

  val oracles: Map[String, String] = Map(
    // q234's invariant: each estimate (per-language and the
    // union-rollup) must land within ±10% of the exact distinct count,
    // which IS replayed
    "q234_hll_sketch_union" ->
      """SELECT lang, COUNT(DISTINCT doc_id)::BIGINT AS n_exact,
        |       TRUE AS within_tol
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT 'ALL', COUNT(DISTINCT doc_id)::BIGINT, TRUE FROM documents
        |ORDER BY lang""".stripMargin,

    "q235_rolling_time" ->
      """WITH r AS (
        |  SELECT user_id, event_id, ts,
        |    count(*) OVER w AS n_1h,
        |    (sum(value::DECIMAL(28,10)) OVER w)::DOUBLE AS sum_1h
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW))
        |SELECT * FROM r WHERE event_id % 20 = 0
        |ORDER BY user_id, ts""".stripMargin)
}
