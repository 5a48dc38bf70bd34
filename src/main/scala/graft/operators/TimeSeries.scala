package graft.operators

import graft.api.Df
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series smoothing over keyed event streams. */
object TimeSeries {

  /** Exponentially-weighted moving average per key (pandas
    * `groupby(key).value.ewm(alpha, adjust=True).mean()` semantics),
    * computed scale-safely: the weight tail below `eps` is truncated,
    * so each row looks back at a FIXED window of
    * W = ceil(ln eps / ln(1-alpha)) predecessors instead of its entire
    * history. Relative truncation error ≤ eps; memory per row is O(W)
    * regardless of how long a key's history grows — the unbounded
    * prefix formulation either overflows (the `(1-a)^-i` rescaling
    * trick exceeds double range after ~2k rows) or serializes the whole
    * key history; this stays a bounded window frame that Spark streams.
    *
    * Determinism: each term `x_j * (1-alpha)^d` is one double multiply
    * of identical operands in any engine (with a base-2 `alpha` — 0.5,
    * 0.25, … — the weights are exact powers of two, so the multiply is
    * exact scaling); terms are summed as DECIMAL(28,16) (exact, so
    * aggregation ORDER cannot perturb the result) and the denominator
    * `(1-(1-a)^n)/a` is closed-form. Re-runs on this engine are
    * bit-identical; cross-engine replays agree to ~1e-14 relative (the
    * double→decimal cast convention — shortest-string vs exact-binary
    * — differs per engine), which a 6dp round absorbs.
    *
    * Nulls in `valCol` are skipped (collect_list drops them), which
    * shifts later positions' weights — matching pandas
    * `ewm(ignore_na=True)` rather than the default NaN-position-aware
    * weighting; documented divergence, null-free columns identical.
    */
  def ewmaMean(df: Df, keyCols: Seq[String], orderCols: Seq[String],
               valCol: String, alpha: Double = 0.5,
               eps: Double = 1e-12): Df = {
    require(alpha > 0 && alpha < 1, s"ewmaMean: alpha in (0,1): $alpha")
    require(eps > 0 && eps < 1, s"ewmaMean: eps in (0,1): $eps")
    val W = math.ceil(math.log(eps) / math.log(1 - alpha)).toInt
    val frame = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*).rowsBetween(-W, Window.currentRow)
    val decay = lit(1 - alpha)
    val arr = col("__ewm_arr")
    val n = size(arr)
    // frame order is ascending → j=0 oldest, j=n-1 the current row
    val terms = transform(arr, (x: Column, j: Column) =>
      (x * pow(decay, (n - lit(1) - j).cast("double")))
        .cast("decimal(28,16)"))
    // accumulator DECIMAL(32,16): each add yields (33,16) — scale
    // intact, no rounding — and the cast back to (32,16) is exact for
    // any sum of ≤ 10^15-magnitude terms (W+1 ≤ a few hundred of them)
    val num = aggregate(terms, lit(BigDecimal(0)).cast("decimal(32,16)"),
      (acc: Column, t: Column) => (acc + t).cast("decimal(32,16)"))
    val den = (lit(1.0) - pow(decay, n.cast("double"))) / lit(alpha)
    new Df(df.sdf
      .withColumn("__ewm_arr",
        collect_list(col(valCol).cast("double")).over(frame))
      .withColumn("ewma", num.cast("double") / den)
      .drop("__ewm_arr"))
  }

  /** pandas `resample(unit).agg(count, sum)` with EMPTY BINS PRESENT —
    * the part a plain `groupBy(date_trunc)` misses: a day with no
    * events must still emit an n = 0 row (monitoring and forecasting
    * both break on silently-absent bins). The scaffold is
    * `sequence(min_bin, max_bin)` off a 1-row bounds aggregate —
    * O(bins), never a driver loop — left-joined onto the binned
    * partial+final aggregate. Empty bins: n = 0, sum = 0.0 (pandas
    * `sum(min_count=0)`). */
  def resampleGapfill(df: Df, tsCol: String, valueCol: String,
                      unit: String = "day"): Df = {
    require(Set("hour", "day", "week", "month").contains(unit.toLowerCase))
    val u = unit.toLowerCase
    val agged = df.sdf.groupBy(date_trunc(u, col(tsCol)).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,10)")).cast("double").as("v_sum"))
    val bounds = df.sdf.agg(
      date_trunc(u, min(col(tsCol))).as("lo"),
      date_trunc(u, max(col(tsCol))).as("hi"))
    val scaffold = bounds
      .select(explode(expr(s"sequence(lo, hi, interval 1 $u)")).as("bin"))
    new Df(scaffold.join(agged, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("v_sum"), lit(0.0)).as("v_sum")))
  }

  /** Seasonal-naive anomaly scoring over a RESAMPLED series: residual
    * = value − value one season ago (`period` bins back), z-scored
    * against the residual distribution (exact decimal moments, sample
    * std), |z| > `zThresh` flags. The monitoring pass behind "is
    * today's ingest volume weird for this hour of day".
    *
    * The lag window runs over the RESAMPLED series — |bins| rows
    * (calendar-sized: 100 TB over 30 days is still 720 hourly bins),
    * so the single-partition window is bounded by the calendar, never
    * the corpus; the corpus-sized work happened in
    * [[resampleGapfill]]'s partial+final aggregate. Run it on the
    * gap-filled series: a missing bin would silently shift every
    * later residual one season off. */
  def seasonalResiduals(series: Df, binCol: String, valueCol: String,
                        period: Int, zThresh: Double = 3.0): Df = {
    require(period >= 1)
    val w = Window.orderBy(series.sdf(binCol).asc)
    val withRes = series.sdf
      .withColumn("__expected", lag(col(valueCol), period).over(w))
      .withColumn("__r",
        (col(valueCol) - col("__expected")).cast("double"))
    val stats = withRes.where(col("__r").isNotNull).agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__r").cast("decimal(28,6)")).cast("double").as("__s"),
      sum((col("__r") * col("__r")).cast("decimal(38,6)")).cast("double")
        .as("__ss"))
    new Df(withRes.crossJoin(broadcast(stats))
      .selectExpr(s"`$binCol`", s"`$valueCol`",
        "__expected AS expected", "__r AS residual",
        // mean/std from exact sums, one expression tree (oracle-replayable)
        """CASE WHEN __r IS NULL OR __n < 2 THEN CAST(NULL AS DOUBLE)
          |ELSE ROUND((__r - __s / __n)
          |  / SQRT((__ss - __s * __s / __n) / (__n - 1.0)), 6)
          |END AS z""".stripMargin)
      .withColumn("is_anomaly",
        when(col("z").isNull, lit(null).cast("boolean"))
          .otherwise(abs(col("z")) > lit(zThresh))))
  }

  /** pandas `interpolate(method='index')` over event time, per key:
    * interior nulls become the time-weighted line between the
    * surrounding non-nulls, trailing nulls carry the last value
    * forward, leading nulls stay null — exactly pandas'
    * limit_direction='forward' behavior.
    *
    * Two window passes (prev/next non-null as (t, v) structs carried by
    * last/first-ignoreNulls expanding frames — the [[graft.api.Df.ffill]]
    * machinery widened to carry the timestamp too), one shuffle on the
    * keys. The lerp is one double expression over `unix_micros`, written
    * once for oracle replay. */
  def interpolateByTime(df: Df, valCol: String, tsCol: String,
                        keyCols: Seq[String], out: String): Df = {
    require(keyCols.nonEmpty, "interpolateByTime: partition keys required " +
      "(a keyless global sort does not scale)")
    val base = Window.partitionBy(keyCols.map(df.sdf(_)): _*)
      .orderBy(df.sdf(tsCol).asc)
    val back = base.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = base.rowsBetween(0, Window.unboundedFollowing)
    val obs = when(col(valCol).isNotNull,
      struct(unix_micros(col(tsCol)).as("t"), col(valCol).as("v")))
    val lerp =
      """CASE
        |  WHEN __v IS NOT NULL THEN CAST(__v AS DOUBLE)
        |  WHEN __pv.v IS NULL THEN CAST(NULL AS DOUBLE)
        |  WHEN __nv.v IS NULL THEN CAST(__pv.v AS DOUBLE)
        |  ELSE CAST(__pv.v AS DOUBLE)
        |    + (CAST(__nv.v AS DOUBLE) - CAST(__pv.v AS DOUBLE))
        |      * (CAST(__t - __pv.t AS DOUBLE)
        |         / CAST(__nv.t - __pv.t AS DOUBLE))
        |END""".stripMargin
    new Df(df.sdf
      .withColumn("__v", col(valCol))
      .withColumn("__t", unix_micros(col(tsCol)))
      .withColumn("__pv", last(obs, ignoreNulls = true).over(back))
      .withColumn("__nv", first(obs, ignoreNulls = true).over(fwd))
      .withColumn(out, expr(lerp))
      .drop("__v", "__t", "__pv", "__nv"))
  }
}
