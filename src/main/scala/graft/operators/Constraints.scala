package graft.operators

import graft.api.Df
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declarative data-quality verification — the "unit tests for data"
  * layer (Deequ-style) a 100 TB ingest runs before a corpus snapshot is
  * blessed for training. The design constraint is single-pass: every
  * metric is ONE aggregate expression, the whole suite folds into ONE
  * `Aggregate` over the table (partial agg map-side, a single 1-row
  * final agg), and the report rows are exploded from that one row.
  * No joins, no Expand, no second scan — at 100 TB the scan IS the
  * cost, so the suite's price is one pass regardless of how many
  * constraints it carries.
  *
  * Beyond the reference's surface (its closest analog is the numeric
  * `describe`, `/root/reference/pandas_expr/_describe.py`) — this is
  * the operational guard the r9 events-timestamp incident showed a
  * pipeline needs: drift must fail a named constraint loudly, not
  * corrupt results silently.
  */
object Constraints {

  /** A named metric: ONE aggregate expression over the table. All
    * metrics land as `double` so the suite stacks into a uniform
    * (metric, value) long format. */
  final case class Metric(name: String, agg: Column)

  def rowCount: Metric = Metric("row_count", count(lit(1)).cast("double"))

  /** fraction of rows with a non-null value — `count(c)/count(*)`.
    * Both counts are exact longs, so the double ratio is deterministic
    * across engines (same operands, one IEEE division). */
  def completeness(c: String): Metric =
    // empty-table guard: 0/0 with a NON-null numerator is an ANSI
    // DIVIDE_BY_ZERO that would kill the whole constraint pass; an
    // empty snapshot has no completeness to measure -> NULL
    Metric(s"completeness($c)",
      when(count(lit(1)) > 0, count(col(c)).cast("double") / count(lit(1))))

  /** mean as exact-integer-sum / count (deterministic for integral
    * columns: no float accumulation order to diverge on). */
  def meanOf(c: String): Metric =
    Metric(s"mean($c)", sum(col(c)).cast("double") / count(col(c)))

  def minOf(c: String): Metric = Metric(s"min($c)", min(col(c)).cast("double"))
  def maxOf(c: String): Metric = Metric(s"max($c)", max(col(c)).cast("double"))

  /** fraction of NON-NULL values matching an anchored regex. Nulls are
    * excluded from the denominator (a nullable column's format and its
    * completeness are separate constraints). */
  def matchRatio(c: String, regex: String): Metric =
    // all-null column: numerator sums to 0 (non-null) over 0 non-null
    // rows — guard like completeness
    Metric(s"match_ratio($c)",
      when(count(col(c)) > 0,
        sum(when(col(c).rlike(regex), 1L).otherwise(0L)).cast("double") /
          count(col(c))))

  /** approximate distinct ratio (HLL++, partial-aggregable — EXACT
    * distinct would plan an Expand next to the other metrics and break
    * the single-pass shape; use [[Profiling.profile]] when the exact
    * count is worth its own pass). rsd 1.5% suits a "is this column
    * basically a key" constraint, not an exact uniqueness proof. */
  def distinctRatioApprox(c: String): Metric =
    Metric(s"distinct_ratio_approx($c)",
      when(count(col(c)) > 0,
        approx_count_distinct(col(c)).cast("double") / count(col(c))))

  /** A constraint names a metric and a predicate over its value.
    * `check` receives the metric value column and must return a
    * boolean column (e.g. `_ === 1.0`, `_.between(lo, hi)`). */
  final case class Constraint(name: String, metric: Metric,
                              check: Column => Column)

  /** All metrics in one aggregation pass, LONG format: (metric, value).
    * Duplicate metric names are computed once. */
  def metrics(df: Df, ms: Seq[Metric]): Df = {
    val uniq = dedupe(ms)
    val aggd = aggregateOnce(df, uniq)
    val rows = uniq.zipWithIndex.map { case (m, i) =>
      struct(lit(m.name).as("metric"), col(s"__m$i").as("value"))
    }
    new Df(aggd.select(explode(array(rows: _*)).as("r")).select("r.*"))
  }

  /** Verification report: (constraint, metric, value, passed) — one row
    * per constraint, still ONE aggregation pass (constraints sharing a
    * metric share its aggregate). The report never throws; gating on it
    * is the caller's policy ([[require]]d via [[assertAll]] when a
    * pipeline wants ingest to hard-stop). */
  def verify(df: Df, cs: Seq[Constraint]): Df = {
    val uniq = dedupe(cs.map(_.metric))
    val slot = uniq.map(_.name).zipWithIndex.toMap
    val aggd = aggregateOnce(df, uniq)
    val rows = cs.map { c =>
      val v = col(s"__m${slot(c.metric.name)}")
      struct(lit(c.name).as("constraint"), lit(c.metric.name).as("metric"),
        v.as("value"), c.check(v).as("passed"))
    }
    new Df(aggd.select(explode(array(rows: _*)).as("r")).select("r.*"))
  }

  /** Hard gate: run [[verify]]; throw listing every failed constraint
    * (name + observed value) if any failed. The collect is the 1-row
    * report — O(#constraints), never data-sized. */
  def assertAll(df: Df, cs: Seq[Constraint]): Unit = {
    val failed = verify(df, cs).sdf.where(!col("passed"))
      .select("constraint", "value").collect()
    require(failed.isEmpty,
      "data-quality constraints FAILED: " + failed.map(r =>
        s"${r.getString(0)} (observed ${r.getDouble(1)})").mkString("; "))
  }

  private def dedupe(ms: Seq[Metric]): Seq[Metric] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Metric]
    ms.foreach(m => seen.getOrElseUpdate(m.name, m))
    seen.values.toSeq
  }

  private def aggregateOnce(df: Df, uniq: Seq[Metric]) = {
    val aggs = uniq.zipWithIndex.map { case (m, i) => m.agg.as(s"__m$i") }
    df.sdf.agg(aggs.head, aggs.tail: _*)
  }
}
