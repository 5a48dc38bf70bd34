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

  /** pandas sum(min_count=k): null unless ≥ k non-null values. */
  def sumMinCount(c: Column, minCount: Int): Column =
    when(count(c) >= minCount, sum(c)).otherwise(lit(null))

  /** pandas mean(skipna=False) */
  def meanSkipnaFalse(c: Column): Column =
    when(count(lit(1)) === count(c), avg(c)).otherwise(lit(null))

  /** pandas prod(min_count=k) over the sign-aware log formulation */
  def prodMinCount(c: Column, minCount: Int): Column = {
    val anyZero = max(when(c === 0, 1).otherwise(0)) === 1
    val negCount = sum(when(c < 0, 1).otherwise(0))
    val mag = exp(sum(log(abs(nullif(c, lit(0))))))
    val p = when(anyZero, lit(0.0))
      .otherwise(mag * when(negCount % 2 === 1, -1.0).otherwise(1.0))
    when(count(c) >= minCount, p).otherwise(lit(null))
  }

  /** variance with arbitrary ddof: M2 / (n - ddof), recovered from
    * var_samp·(n-1) so the partial/final merge stays native. */
  def varDdof(c: Column, ddof: Int): Column = ddof match {
    case 1 => var_samp(c)
    case 0 => var_pop(c)
    case d => (var_samp(c) * (count(c) - 1)) / (count(c) - lit(d))
  }

  def stdDdof(c: Column, ddof: Int): Column = sqrt(varDdof(c, ddof))

  /** pandas any/all with skipna=False: pandas treats null as True-able
    * unknown — any=null if no true but nulls present; all=null if no
    * false but nulls present (Kleene logic, what Spark bool_or/bool_and
    * already implement over nullable booleans). skipna=True drops nulls. */
  def anySkipna(c: Column): Column = coalesce(bool_or(c), lit(false))
  def allSkipna(c: Column): Column = coalesce(bool_and(c), lit(true))
}
