package graft.operators

import graft.api.Df
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch columns (Apache DataSketches HLL,
  * engine-native in Spark 4: `hll_sketch_agg` / `hll_union_agg`).
  *
  * The 100 TB pattern this enables: build per-partition (per-day,
  * per-source, per-language) sketches ONCE at ingest and persist them
  * as binary columns; every later "how many distinct X in any subset
  * of partitions" is a union of kilobyte sketches — no re-scan of the
  * corpus, no shuffle of raw keys. `approx_count_distinct` (q37) gives
  * one number; a sketch COLUMN gives reusable, mergeable state —
  * the difference between an answer and an index.
  */
object Sketches {

  /** One row per group: the group keys + a binary HLL sketch of
    * `valueCol` (+ the exact distinct count when `withExact`, for
    * audit). Single partial+final aggregate — sketches merge map-side,
    * so the shuffle carries O(groups × 2^lgK) bytes, never raw keys. */
  def hllSketches(df: Df, groupCols: Seq[String], valueCol: String,
                  lgK: Int = 12, withExact: Boolean = true): Df = {
    require(groupCols.nonEmpty)
    val aggs =
      Seq(expr(s"hll_sketch_agg(`$valueCol`, $lgK)").as("sketch")) ++
        (if (withExact) Seq(countDistinct(col(valueCol)).as("n_exact"))
         else Nil)
    new Df(df.sdf.groupBy(groupCols.map(df.sdf(_)): _*)
      .agg(aggs.head, aggs.tail: _*))
  }

  /** Merge a sketch table down to one row WITHOUT touching the source
    * data: union the binary sketches, estimate. `estimate` is the
    * DataSketches HLL estimate — rsd ≈ 1.04/√(2^lgK) (~1.6% at the
    * default lgK=12). */
  def hllRollup(sketches: Df, sketchCol: String = "sketch"): Df =
    new Df(sketches.sdf.agg(
      expr(s"hll_sketch_estimate(hll_union_agg(`$sketchCol`))")
        .cast("long").as("estimate")))

  /** Per-group estimate column from a sketch table (no merge). */
  def hllEstimates(sketches: Df, sketchCol: String = "sketch",
                   out: String = "estimate"): Df =
    new Df(sketches.sdf.withColumn(out,
      expr(s"hll_sketch_estimate(`$sketchCol`)").cast("long")))

  /** Per-group Theta sketches of `valueCol` — HLL's big brother: Theta
    * supports SET ALGEBRA on the sketches themselves (∪, ∩, \), so
    * "how many users did both A and B touch" never joins raw keys.
    * Below 2^lgK distinct values a Theta sketch is in exact mode —
    * small-group answers are exact, huge groups degrade to ~1.6%
    * (lgK=12) like HLL. */
  def thetaSketches(df: Df, groupCols: Seq[String], valueCol: String,
                    lgK: Int = 12, withExact: Boolean = true): Df = {
    require(groupCols.nonEmpty)
    val aggs =
      Seq(expr(s"theta_sketch_agg(`$valueCol`, $lgK)").as("sketch")) ++
        (if (withExact) Seq(countDistinct(col(valueCol)).as("n_exact"))
         else Nil)
    new Df(df.sdf.groupBy(groupCols.map(df.sdf(_)): _*)
      .agg(aggs.head, aggs.tail: _*))
  }

  /** Set-algebra between TWO groups' sketches — |A∪B|, |A∩B|, |A\B| —
    * computed entirely on the kilobyte sketches (a 2-row self-join of
    * the sketch table; the corpus is untouched). */
  def thetaOverlap(sketches: Df, groupCol: String,
                   a: Any, b: Any, sketchCol: String = "sketch"): Df = {
    val sa = sketches.sdf.where(col(groupCol) === lit(a))
      .select(col(sketchCol).as("__sa"))
    val sb = sketches.sdf.where(col(groupCol) === lit(b))
      .select(col(sketchCol).as("__sb"))
    new Df(sa.crossJoin(sb).selectExpr(
      "CAST(theta_sketch_estimate(theta_union(__sa, __sb)) AS LONG) AS n_union",
      "CAST(theta_sketch_estimate(theta_intersection(__sa, __sb)) AS LONG) AS n_intersect",
      "CAST(theta_sketch_estimate(theta_difference(__sa, __sb)) AS LONG) AS n_only_a"))
  }

  /** Per-group KLL quantile sketches of a bigint column — mergeable
    * DISTRIBUTION state (k=200 ⇒ ~1.65% rank error): persist per-day /
    * per-source sketches once, answer any later quantile question on
    * any subset by merging kilobytes. */
  def kllSketches(df: Df, groupCols: Seq[String], valueCol: String,
                  k: Int = 200): Df = {
    require(groupCols.nonEmpty)
    new Df(df.sdf.groupBy(groupCols.map(df.sdf(_)): _*)
      .agg(expr(s"kll_sketch_agg_bigint(`$valueCol`, $k)").as("sketch"),
        count(col(valueCol)).as("n")))
  }

  /** Merge a KLL sketch table and read quantiles at `probs` — one row
    * per probe: (p, quantile). */
  def kllMergedQuantiles(sketches: Df, probs: Seq[Double],
                         sketchCol: String = "sketch"): Df = {
    require(probs.nonEmpty)
    val merged = sketches.sdf.agg(
      expr(s"kll_merge_agg_bigint(`$sketchCol`)").as("__m"))
    val probes = probs.map(p =>
      expr(s"kll_sketch_get_quantile_bigint(__m, CAST($p AS DOUBLE))")
        .cast("long").as(s"q_$p"))
    val wide = merged.select(probes: _*)
    val stackArgs = probs.map(p => s"CAST($p AS DOUBLE), `q_$p`").mkString(", ")
    new Df(wide.selectExpr(
      s"stack(${probs.size}, $stackArgs) AS (p, quantile)"))
  }

  /** Mergeable frequent-items state: accumulate a top-`k` sketch per
    * group, combine across groups, emit (item, count) rows. Exact
    * whenever the true distinct count stays under `maxItemsTracked` —
    * the common "top event types / top domains" shape — and a bounded
    * estimate beyond. */
  def approxTopKCombined(df: Df, groupCols: Seq[String], valueCol: String,
                         k: Int = 10, maxItemsTracked: Int = 10000): Df = {
    require(groupCols.nonEmpty)
    val perGroup = df.sdf.groupBy(groupCols.map(df.sdf(_)): _*)
      .agg(expr(s"approx_top_k_accumulate(`$valueCol`, $maxItemsTracked)")
        .as("__acc"))
    new Df(perGroup
      .agg(expr(s"approx_top_k_combine(__acc, $maxItemsTracked)").as("__c"))
      .selectExpr(s"inline(approx_top_k_estimate(__c, $k))"))
  }
}
