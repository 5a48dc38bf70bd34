package graft.operators

import graft.api.Df
import org.apache.spark.sql.functions._

/** Dataset profiling / diagnostics operators — the observability layer
  * a 100 TB pipeline runs BEFORE committing to a plan: per-column
  * health (nulls, cardinality) decides encoding and join strategy;
  * key-skew stats decide whether a join needs salting
  * ([[graft.api.Df.saltedJoin]]) or AQE skew handling. Beyond the
  * reference's surface (its `describe` is numeric-only summary stats,
  * `/root/reference/pandas_expr/_describe.py`).
  */
object Profiling {

  /** Per-column profile in LONG format: (column, n, n_nulls,
    * n_distinct) — one row per profiled column. `n_distinct` is the
    * EXACT distinct count (nulls excluded, SQL COUNT(DISTINCT)
    * semantics).
    *
    * Scale: ONE aggregation job for all columns (one pass over the
    * data); each COUNT(DISTINCT) expands to its own expand+shuffle
    * under the hood, so profiling every column of a very wide table is
    * |cols| shuffles — profile the columns you care about, or swap in
    * `approx_count_distinct` (HLL, one pass, no expand) when ±2% is
    * acceptable; exact is the default because the result feeds
    * equality-checked audits. The wide→long pivot happens on the ONE
    * aggregated row (driver-sized), not on the data. */
  def profile(df: Df, cols: Seq[String] = Nil): Df = {
    val cs = if (cols.isEmpty) df.columns.toSeq else cols
    require(cs.nonEmpty, "profile: no columns to profile")
    val missing = cs.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    // positional internal names + backtick-quoted references: column
    // names are DATA here (they ride a generated selectExpr), so a
    // space, quote, or backtick in a CSV-ingested header must not
    // break the parse or the label literal
    val aggs = count(lit(1)).as("__n") +: cs.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__present_$i"),
        count_distinct(col(c)).as(s"__distinct_$i"))
    }
    val one = df.sdf.agg(aggs.head, aggs.tail: _*)
    val stacked = cs.zipWithIndex.map { case (c, i) =>
      val label = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$label', __n, __n - __present_$i, __distinct_$i"
    }.mkString(", ")
    new Df(one.selectExpr(
      s"stack(${cs.size}, $stacked) AS (column, n, n_nulls, n_distinct)"))
  }

  /** Join/agg key-skew diagnostics: one row of (n_rows, n_keys,
    * max_key_n, skew) for a prospective shuffle key, where `skew` =
    * max_key_n / (n_rows / n_keys) rounded to 4dp — 1.0 is perfectly
    * uniform, ≥ ~5 means the hottest key's task runs that many times
    * longer than average and the join wants salting/AQE. NULL keys
    * group together (SQL GROUP BY semantics) and count like any key —
    * a mostly-NULL key column shows up as exactly the skew it is.
    *
    * Scale: one partial+final count per key, one global reduce over
    * the (bounded) per-key counts. Nothing driver-sized but the
    * 4-number result. */
  def skewStats(df: Df, keyCol: String): Df = {
    val perKey = df.sdf.groupBy(col(keyCol)).agg(count(lit(1)).as("__kn"))
    new Df(perKey.agg(
        sum(col("__kn")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__kn")).as("max_key_n"))
      .withColumn("skew",
        round(col("max_key_n") * col("n_keys") / col("n_rows"), 4)))
  }
}
