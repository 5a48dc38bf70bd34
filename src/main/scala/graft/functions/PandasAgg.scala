package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas aggregation-semantics adapters (SURVEY.md §7.4.3): Spark aggs
  * always skip nulls; pandas exposes `skipna=False`, `min_count` and
  * arbitrary `ddof`. Each adapter is a conditional expression wrapped
  * around the native partial+final aggregate — no UDAF, stays
  * codegen'd and distributed.
  */
object PandasAgg {

  /** pandas sum(skipna=False): null if ANY value is null. */
  def sumSkipnaFalse(c: Column): Column =
    when(count(lit(1)) === count(c), sum(c)).otherwise(lit(null))

  /** pandas sum(min_count=k): null unless ≥ k non-null values. With
    * the pandas default k=0 an empty/all-null group yields the sum
    * identity 0.0 (what pandas returns), not null. */
  def sumMinCount(c: Column, minCount: Int): Column =
    when(count(c) >= minCount, coalesce(sum(c), lit(0L)))
      .otherwise(lit(null))

  /** pandas mean(skipna=False) */
  def meanSkipnaFalse(c: Column): Column =
    when(count(lit(1)) === count(c), avg(c)).otherwise(lit(null))

  /** pandas prod(min_count=k) over the sign-aware log formulation.
    * Empty/all-null groups under the pandas default k=0 yield the
    * product identity 1.0, as pandas does. */
  def prodMinCount(c: Column, minCount: Int): Column = {
    val anyZero = max(when(c === 0, 1).otherwise(0)) === 1
    val negCount = sum(when(c < 0, 1).otherwise(0))
    val mag = exp(sum(log(abs(nullif(c, lit(0))))))
    val p = when(anyZero, lit(0.0))
      .otherwise(mag * when(negCount % 2 === 1, -1.0).otherwise(1.0))
    when(count(c) >= minCount, coalesce(p, lit(1.0))).otherwise(lit(null))
  }

  /** variance with arbitrary ddof: M2 / (n - ddof), recovered from
    * var_samp·(n-1) so the partial/final merge stays native. Groups
    * with n ≤ ddof yield NULL: the statistic is undefined there
    * (pandas renders it inf/NaN; NULL is this engine's NaN-null
    * convention, DIVERGENCES #3) — without the guard the division is
    * by zero, which under ANSI mode would kill the whole query for
    * one degenerate group. */
  def varDdof(c: Column, ddof: Int): Column = ddof match {
    case 1 => var_samp(c)
    case 0 => var_pop(c)
    case d => when(count(c) > d,
      (var_samp(c) * (count(c) - 1)) / (count(c) - lit(d)))
      .otherwise(lit(null))
  }

  def stdDdof(c: Column, ddof: Int): Column = sqrt(varDdof(c, ddof))

  /** pandas any/all with the default skipna=True: nulls are dropped;
    * an empty/all-null group yields the identity (any→false,
    * all→true), exactly these coalesces. (A skipna=False variant is
    * NOT provided: modern pandas treats NaN as truthy there, which is
    * a cast — `bool_or(c.isNotNull || c)` — not a Kleene adapter.) */
  def anySkipna(c: Column): Column = coalesce(bool_or(c), lit(false))
  def allSkipna(c: Column): Column = coalesce(bool_and(c), lit(true))
}
