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
}
