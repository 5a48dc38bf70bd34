package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lazy single-column view over a shared [[Df]] lineage — the Spark-first
  * re-expression of the reference's `Series` collection
  * (`/root/reference/pandas_expr/_collection.py:500`).
  *
  * A `Ser` is a (frame, column-expression) pair. All elementwise operators
  * (`/root/reference/pandas_expr/_expr.py:404-483,1102-1656`) compose
  * `Column` expressions on the SAME underlying `DataFrame` lineage, so
  * Catalyst sees one plan subtree per source — the reference needs a
  * whole `combine_similar` CSE pass (`_expr.py:304-381`) to get the same
  * effect; here it holds by construction.
  *
  * Nothing executes until an action; a comparison chain like
  * `df("a") > 5 && df("b").isin(...)` stays a single codegen'd predicate.
  */
final class Ser private[api] (
    private[api] val frame: DataFrame,
    val col: Column,
    val name: String,
    /** When `col` is a pandas-total mask (`coalesce(pred, false)` from
      * [[isin]]/[[between]]), the bare `pred` rides here so the FILTER
      * path can use it: the coalesce wrapper is opaque to data-source
      * filter translation (it cost q03 its parquet `PushedFilters`),
      * while under a WHERE it is redundant — SQL drops NULL rows
      * anyway. `&&`/`||` compose it (the rewrite stays exact through
      * conjunction/disjunction); `unary_!` deliberately does NOT
      * (pandas `~isin` keeps missing rows — there the wrapper is
      * load-bearing). */
    private[api] val rawFilter: Option[Column] = None) {

  /** the predicate a `where` should compile: pushdown-friendly for
    * mask verbs, `col` otherwise */
  private[api] def filterCol: Column = rawFilter.getOrElse(col)

  private def lift(c: Column, n: String = name): Ser = new Ser(frame, c, n)
  private def both(other: Ser)(f: (Column, Column) => Column): Ser = {
    require(other.frame eq frame,
      "cross-frame Series ops require .align() — frames must share lineage")
    lift(f(col, other.col))
  }

  // ---- arithmetic binops (reference `_expr.py:1519-1621`) ----
  def +(o: Ser): Ser = both(o)(_ + _)
  def -(o: Ser): Ser = both(o)(_ - _)
  def *(o: Ser): Ser = both(o)(_ * _)
  def /(o: Ser): Ser = both(o)(_ / _)
  def %(o: Ser): Ser = both(o)(_ % _)
  def +(v: Any): Ser = lift(col + lit(v))
  def -(v: Any): Ser = lift(col - lit(v))
  def *(v: Any): Ser = lift(col * lit(v))
  def /(v: Any): Ser = lift(col / lit(v))
  def %(v: Any): Ser = lift(col % lit(v))
  def unary_- : Ser = lift(-col)
  def unary_! : Ser = lift(!col)

  // ---- comparisons ----
  def ===(o: Ser): Ser = both(o)(_ === _)
  def !==(o: Ser): Ser = both(o)(_ =!= _)
  def <(o: Ser): Ser = both(o)(_ < _)
  def <=(o: Ser): Ser = both(o)(_ <= _)
  def >(o: Ser): Ser = both(o)(_ > _)
  def >=(o: Ser): Ser = both(o)(_ >= _)
  def ===(v: Any): Ser = lift(col === lit(v))
  def !==(v: Any): Ser = lift(col =!= lit(v))
  def <(v: Any): Ser = lift(col < lit(v))
  def <=(v: Any): Ser = lift(col <= lit(v))
  def >(v: Any): Ser = lift(col > lit(v))
  def >=(v: Any): Ser = lift(col >= lit(v))

  // ---- boolean ops (`And`/`Or`/`XOr`/`Invert`) ----
  def &&(o: Ser): Ser = {
    val s = both(o)(_ && _)
    if (rawFilter.isEmpty && o.rawFilter.isEmpty) s
    else new Ser(s.frame, s.col, s.name, Some(filterCol && o.filterCol))
  }
  def ||(o: Ser): Ser = {
    val s = both(o)(_ || _)
    if (rawFilter.isEmpty && o.rawFilter.isEmpty) s
    else new Ser(s.frame, s.col, s.name, Some(filterCol || o.filterCol))
  }
  def ^(o: Ser): Ser = both(o)((a, b) => (a && !b) || (!a && b))

  // ---- elementwise ops (`_expr.py:1102-1341`) ----
  /** `Isin` (`_expr.py:1133`) */
  /** pandas `isin` is a total boolean mask, never missing: a null/NaN
    * row is False unless null is itself among `values` (then True).
    * SQL IN would yield NULL for those rows — identical under a
    * filter, different when the mask is materialized — so the
    * null-handling is made explicit here. Still one codegen'd
    * predicate (In + coalesce/isnull), no UDF. */
  def isin(values: Any*): Ser = {
    val nonNull = values.filter(_ != null)
    val raw =
      if (nonNull.isEmpty) org.apache.spark.sql.functions.lit(false)
      else col.isin(nonNull: _*)
    val base =
      if (nonNull.isEmpty) raw
      else org.apache.spark.sql.functions
        .coalesce(raw, org.apache.spark.sql.functions.lit(false))
    val withNull = values.exists(_ == null)
    new Ser(frame,
      if (withNull) base || isNaCol else base, name,
      // filter form: the bare In pushes to the scan; the null-matching
      // arm stays (it changes which rows pass, not just null-vs-false)
      Some(if (withNull) raw || isNaCol else raw))
  }
  /** `Between` (`_expr.py:1153`); inclusive ∈ both|left|right|neither.
    * Total mask like pandas: a null row compares False, not NULL
    * (identical under a filter, explicit when materialized). NaN rows
    * already agree without special-casing: Spark orders NaN greatest,
    * so the `<= hi` arm fails exactly where pandas' NaN comparisons
    * are all-False. */
  def between(lo: Any, hi: Any, inclusive: String = "both"): Ser = {
    val raw = inclusive match {
      case "both"    => col >= lit(lo) && col <= lit(hi)
      case "left"    => col >= lit(lo) && col < lit(hi)
      case "right"   => col > lit(lo) && col <= lit(hi)
      case "neither" => col > lit(lo) && col < lit(hi)
    }
    new Ser(frame, coalesce(raw, lit(false)), name, Some(raw))
  }
  /** `IsNa` (`_expr.py:1209`): pandas NaN≈missing — test null OR (for
    * float dtypes only) NaN. Dispatching on the resolved dtype matters:
    * casting a string column to double would throw under ANSI mode and,
    * with ANSI off, yield null — making `notna` evaluate NULL and
    * silently drop valid string rows from filters. */
  private def isNaCol: Column = frame.select(col).schema.head.dataType match {
    case org.apache.spark.sql.types.DoubleType |
         org.apache.spark.sql.types.FloatType => col.isNull || isnan(col)
    case _ => col.isNull
  }
  def isna: Ser = lift(isNaCol)
  def notna: Ser = lift(!isNaCol)
  /** `Fillna` (`_expr.py:1111`) */
  def fillna(v: Any): Ser = lift(coalesce(col, lit(v)))
  /** `Replace` (`_expr.py:1125`) */
  def replace(from: Any, to: Any): Ser =
    lift(when(col === lit(from), lit(to)).otherwise(col))
  /** `Clip` (`_expr.py:1139`) */
  def clip(lower: Any = null, upper: Any = null): Ser = {
    var c = col
    if (lower != null) c = greatest(c, lit(lower))
    if (upper != null) c = least(c, lit(upper))
    lift(c)
  }
  /** `AsType` (`_expr.py:1171`) */
  def astype(t: String): Ser = lift(col.cast(t))
  /** `Round` (`_expr.py:1215`) */
  def round(decimals: Int = 0): Ser =
    lift(org.apache.spark.sql.functions.round(col, decimals))
  /** `Abs` (`_expr.py:1221`) */
  def abs: Ser = lift(org.apache.spark.sql.functions.abs(col))
  /** dict-`Map` (`_expr.py:1264-1272`) → chained CASE WHEN (codegen'd,
    * no UDF). `naAction=Some("ignore")` short-circuits nulls to null
    * without consulting the mapping (pandas `na_action='ignore'`); by
    * default a `null` KEY in the mapping can rewrite missing values. */
  def map(mapping: Map[Any, Any], naAction: Option[String] = None): Ser = {
    val mapped = mapping.foldLeft(lit(null).cast("string")) {
      case (acc, (null, v)) => when(col.isNull, lit(v)).otherwise(acc)
      case (acc, (k, v))    => when(col === lit(k), lit(v)).otherwise(acc)
    }
    lift(naAction match {
      case Some("ignore") => when(col.isNull, lit(null)).otherwise(mapped)
      case _              => mapped
    })
  }
  def as(n: String): Ser = lift(col.as(n), n)

  // ---- accessors (`_accessor.py:63-80`; SURVEY.md §2.4) ----
  def str: StrAccessor = new StrAccessor(this)
  def dt: DtAccessor = new DtAccessor(this)
  def cat: CatAccessor = new CatAccessor(this)

  /** `DropnaSeries` (`_expr.py:981`): frame filtered to non-null values
    * of this series. */
  def dropna: Df = new Df(frame.filter(col.isNotNull))

  /** Materialize as single-column Df (`ToFrame`, `_expr.py:1073`). */
  def toFrame(n: String = name): Df = new Df(frame.select(col.as(n)))

  /** `ToFrameIndex` (`_expr.py:1073-1084`): the series as a frame WITH
    * its index column carried along (pandas keeps the index on
    * to_frame; Spark's index is a designated key column, so it rides as
    * a second column and stays the frame's index). */
  def toFrameWithIndex(index: String, n: String = name): Df =
    new Df(frame.select(frame(index), col.as(n)), Some(index))

  // ---- reductions (return lazy 1x1 frames — reference `Scalar`) ----
  private def agg1(c: Column, n: String): Df = new Df(frame.agg(c.as(n)))
  def sum: Df = agg1(org.apache.spark.sql.functions.sum(col), s"${name}_sum")
  def mean: Df = agg1(avg(col), s"${name}_mean")
  def min: Df = agg1(org.apache.spark.sql.functions.min(col), s"${name}_min")
  def max: Df = agg1(org.apache.spark.sql.functions.max(col), s"${name}_max")
  def count: Df = agg1(org.apache.spark.sql.functions.count(col), s"${name}_count")
  def nunique: Df = agg1(countDistinct(col), s"${name}_nunique")
  /** `nunique_approx` — dangling in the reference (`_collection.py:282`);
    * supplied here by Spark's HyperLogLog++. */
  def nuniqueApprox(rsd: Double = 0.05): Df =
    agg1(approx_count_distinct(col, rsd), s"${name}_nunique_approx")
  /** pandas `.quantile(q)` — exact interpolated percentile (Catalyst
    * `percentile`; one pass, sort-based within the aggregate). For
    * sketch-based scale variant use [[quantileApprox]]. */
  def quantile(q: Double): Df =
    agg1(expr(s"percentile($name, $q)"), s"${name}_q$q")
  /** approximate percentile — single-pass mergeable sketch
    * (`percentile_approx`), the 100 TB path: rank error ≤ n/accuracy,
    * no per-group sort, partial-aggregates combine across executors. */
  def quantileApprox(q: Double, accuracy: Int = 10000): Df =
    agg1(percentile_approx(col, lit(q), lit(accuracy)),
      s"${name}_qapprox$q")
  def median: Df = agg1(expr(s"percentile($name, 0.5)"), s"${name}_median")
}
