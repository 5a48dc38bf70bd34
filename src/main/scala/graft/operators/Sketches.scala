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
}
