package graft.queries

import graft.operators.Sketches
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** Mergeable-sketch state, time-range windows, one-pass model fits.
  * q234–q236.
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
    }),

    // ---- closed-form 2-feature OLS inside the plan: ONE exact-decimal
    // moment pass + a projection solving the centered normal
    // equations; no driver arithmetic, no iteration ----
    "q236_ols_fit" -> ((s, dir) => {
      graft.operators.Regression.olsFit2(
        T(s, dir, "lineitem"),
        y = "l_extendedprice", x1 = "l_quantity", x2 = "l_discount").sdf
    }),

    // ---- Theta sketch set algebra: |view∪click| / |view∩click| /
    // |view\click| audiences from per-type sketches — raw user ids are
    // never joined; exact counts replayed for the invariant ----
    "q241_theta_overlap" -> ((s, dir) => {
      val e = events(s, dir)
        .where(col("event_type").isin("view", "click"))
      val sk = Sketches.thetaSketches(e, Seq("event_type"), "user_id",
        withExact = false)
      val est = Sketches.thetaOverlap(sk, "event_type", "view", "click")
      val flags = e.sdf.groupBy(col("user_id")).agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c"))
      val exact = flags.agg(
        count(lit(1)).as("n_union"),
        sum(col("v") * col("c")).cast("long").as("n_intersect"),
        sum(col("v") * (lit(1) - col("c"))).cast("long").as("n_only_a"))
      def ok(e: String, x: String) =
        (abs(col(e) - col(x)) <= lit(0.05) * col(x)).as(s"${x}_ok")
      new graft.api.Df(est.sdf.toDF("e_union", "e_intersect", "e_only_a")
        .crossJoin(broadcast(exact))
        .select(col("n_union"), col("n_intersect"), col("n_only_a"),
          ok("e_union", "n_union"), ok("e_intersect", "n_intersect"),
          ok("e_only_a", "n_only_a"))).sdf
    }),

    // ---- KLL quantile sketches: per-language distribution state
    // merged to corpus quantiles; each estimate must land inside the
    // exact ±3%-rank band (k=200 ⇒ ~1.65% rank error) ----
    "q242_kll_quantiles" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val probs = Seq(0.25, 0.5, 0.75)
      val est = Sketches.kllMergedQuantiles(
        Sketches.kllSketches(d, Seq("lang"), "n_chars"), probs)
      val bands = d.sdf.agg(
        count(lit(1)).as("n_total"),
        expr(s"percentile(n_chars, array(${probs.map(_ - 0.03).mkString(",")}))")
          .as("__lo"),
        expr(s"percentile(n_chars, array(${probs.map(_ + 0.03).mkString(",")}))")
          .as("__hi"))
      val probeIdx = expr("CAST(round(p * 4) AS INT)") // 0.25→1, 0.5→2, 0.75→3
      new graft.api.Df(est.sdf.crossJoin(broadcast(bands))
        .withColumn("__i", probeIdx)
        .select(col("p"), col("n_total"),
          (col("quantile") >= element_at(col("__lo"), col("__i")) &&
            col("quantile") <= element_at(col("__hi"), col("__i"))).as("ok")))
        .sortValues(Seq("p")).sdf
    }),

    // ---- mergeable frequent-items: per-day approx_top_k accumulators
    // combined to the global top-3 — EXACT here (6 distinct types ≪
    // maxItemsTracked), so the oracle replays the true counts ----
    "q243_approx_topk" -> ((s, dir) => {
      Sketches.approxTopKCombined(
        events(s, dir).assign("day", date_trunc("day", col("ts"))),
        Seq("day"), "event_type", k = 3)
        .selectExpr("item", "CAST(count AS BIGINT) AS n")
        .sortValues(col("n").desc, col("item").asc).sdf
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

    // q241's invariant: the three set-algebra estimates must sit within
    // ±5% of the exact audience counts, which ARE replayed (Theta is in
    // exact mode below 2^12 distinct users anyway)
    "q241_theta_overlap" ->
      """WITH f AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c
        |  FROM events WHERE event_type IN ('view', 'click')
        |  GROUP BY user_id)
        |SELECT count(*)::BIGINT AS n_union,
        |  sum(v * c)::BIGINT AS n_intersect,
        |  sum(v * (1 - c))::BIGINT AS n_only_a,
        |  TRUE AS n_union_ok, TRUE AS n_intersect_ok, TRUE AS n_only_a_ok
        |FROM f""".stripMargin,

    // q242's invariant: each merged-sketch quantile lands inside the
    // exact ±3%-rank band; n_total is the replayed value
    "q242_kll_quantiles" ->
      """SELECT p::DOUBLE AS p,
        |  (SELECT count(*) FROM documents)::BIGINT AS n_total,
        |  TRUE AS ok
        |FROM (VALUES (0.25), (0.5), (0.75)) t(p)
        |ORDER BY p""".stripMargin,

    // q243 is EXACT (distinct event types ≪ maxItemsTracked): replay
    // the true top-3 with the same (n desc, item) total order
    "q243_approx_topk" ->
      """SELECT event_type AS item, count(*)::BIGINT AS n
        |FROM events GROUP BY event_type
        |ORDER BY n DESC, item LIMIT 3""".stripMargin,

    // q236 replays the identical expression tree (same decimal casts,
    // same double-op nesting) so both engines land on the same IEEE
    // doubles before the final ROUND-6
    "q236_ols_fit" ->
      """WITH a AS (
        |  SELECT count(*)::DOUBLE AS n,
        |    (sum(l_quantity::DECIMAL(18,2)))::DOUBLE AS sx1,
        |    (sum(l_discount::DECIMAL(18,2)))::DOUBLE AS sx2,
        |    (sum(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS sy,
        |    (sum((l_quantity::DECIMAL(18,2) * l_quantity::DECIMAL(18,2))::DECIMAL(38,4)))::DOUBLE AS sx1x1,
        |    (sum((l_quantity::DECIMAL(18,2) * l_discount::DECIMAL(18,2))::DECIMAL(38,4)))::DOUBLE AS sx1x2,
        |    (sum((l_discount::DECIMAL(18,2) * l_discount::DECIMAL(18,2))::DECIMAL(38,4)))::DOUBLE AS sx2x2,
        |    (sum((l_quantity::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2))::DECIMAL(38,4)))::DOUBLE AS sx1y,
        |    (sum((l_discount::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2))::DECIMAL(38,4)))::DOUBLE AS sx2y,
        |    (sum((l_extendedprice::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2))::DECIMAL(38,4)))::DOUBLE AS syy
        |  FROM lineitem),
        |c AS (
        |  SELECT n, sx1, sx2, sy,
        |    sx1x1 - sx1 * sx1 / n AS s11,
        |    sx1x2 - sx1 * sx2 / n AS s12,
        |    sx2x2 - sx2 * sx2 / n AS s22,
        |    sx1y - sx1 * sy / n AS s1y,
        |    sx2y - sx2 * sy / n AS s2y,
        |    syy - sy * sy / n AS scy
        |  FROM a),
        |b AS (
        |  SELECT n, sx1, sx2, sy, s1y, s2y, scy,
        |    (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
        |    (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2
        |  FROM c)
        |SELECT
        |  ROUND((sy - b1 * sx1 - b2 * sx2) / n, 6) + 0.0 AS b0,
        |  ROUND(b1, 6) + 0.0 AS b1,
        |  ROUND(b2, 6) + 0.0 AS b2,
        |  ROUND((b1 * s1y + b2 * s2y) / scy, 6) + 0.0 AS r2
        |FROM b""".stripMargin,

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
