package graft.queries

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._
import QueryUtil._

/** Time-series battery: gap-filled resampling + time-weighted
  * interpolation. q244–q245. */
object TimeSeriesQueries {

  val defs: Map[String, Q] = Map(
    // ---- resample('1d') with empty bins present: one user's sparse
    // activity (27 of 30 days at sf0.01) — days with zero events MUST
    // emit n = 0 rows ----
    "q244_resample_gapfill" -> ((s, dir) => {
      TimeSeries.resampleGapfill(
        events(s, dir).where(col("user_id") === 3), "ts", "value")
        .sortValues(Seq("bin")).sdf
    }),

    // ---- interpolate(method='index'): nulls injected every 5th
    // event, lerped over event-time per user; leading nulls stay
    // null, trailing carry forward ----
    "q245_interpolate" -> ((s, dir) => {
      val e = events(s, dir).where(col("user_id") < 10)
        .assign("v", when(col("event_id") % 5 === 0, lit(null))
          .otherwise(col("value")))
      TimeSeries.interpolateByTime(e, "v", "ts", Seq("user_id"), "vi")
        .assign("vi", round(col("vi"), 6))
        .where(col("event_id") % 4 === 0)
        .select("user_id", "event_id", "ts", "v", "vi")
        .sortValues(Seq("user_id", "ts")).sdf
    }))

  val oracles: Map[String, String] = Map(
    "q244_resample_gapfill" ->
      """WITH e AS (
        |  SELECT date_trunc('day', ts::TIMESTAMP) AS d, value
        |  FROM events WHERE user_id = 3),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
        |s AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bin
        |      FROM b),
        |a AS (SELECT d AS bin, count(*)::BIGINT AS n,
        |        (sum(value::DECIMAL(28,10)))::DOUBLE AS v_sum
        |      FROM e GROUP BY 1)
        |SELECT s.bin, coalesce(a.n, 0)::BIGINT AS n,
        |  coalesce(a.v_sum, 0.0) AS v_sum
        |FROM s LEFT JOIN a USING (bin) ORDER BY bin""".stripMargin,

    // the ANSI carry-group replay of the prev/next (t, v) windows: a
    // carry group holds exactly one non-null row, so max() recovers
    // both its value and its timestamp; the lerp is the identical
    // double tree over epoch micros
    "q245_interpolate" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
        |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id < 10),
        |g AS (
        |  SELECT *,
        |    count(v) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fg,
        |    count(v) OVER (PARTITION BY user_id ORDER BY ts DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bg
        |  FROM base),
        |c AS (
        |  SELECT user_id, event_id, ts, v,
        |    max(v) OVER (PARTITION BY user_id, fg) AS pv,
        |    max(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id, fg) AS pt,
        |    max(v) OVER (PARTITION BY user_id, bg) AS nv,
        |    max(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id, bg) AS nt
        |  FROM g),
        |r AS (
        |  SELECT user_id, event_id, ts, v,
        |    ROUND(CASE
        |      WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
        |      WHEN pv IS NULL THEN CAST(NULL AS DOUBLE)
        |      WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
        |      ELSE CAST(pv AS DOUBLE)
        |        + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
        |          * (CAST(epoch_us(ts) - pt AS DOUBLE)
        |             / CAST(nt - pt AS DOUBLE))
        |    END, 6) + 0.0 AS vi
        |  FROM c)
        |SELECT * FROM r WHERE event_id % 4 = 0
        |ORDER BY user_id, ts""".stripMargin)
}
