package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Accessor namespaces on [[Ser]] — the reference's `PropertyMap` /
  * `FunctionMap` machinery (`/root/reference/pandas_expr/_accessor.py:
  * 63-80`) registers `.cat` only, with `.str`/`.dt` "pattern ready"
  * (`_collection.py:557-558`, SURVEY.md §2.4). Here all three ship,
  * mapped 1:1 onto codegen'd `org.apache.spark.sql.functions`.
  */
final class StrAccessor private[api] (s: Ser) {
  private def lift(c: Column): Ser = new Ser(s.frame, c, s.name)
  def upper: Ser = lift(org.apache.spark.sql.functions.upper(s.col))
  def lower: Ser = lift(org.apache.spark.sql.functions.lower(s.col))
  def len: Ser = lift(length(s.col))
  def strip: Ser = lift(trim(s.col))
  def contains(sub: String): Ser = lift(s.col.contains(sub))
  def startswith(p: String): Ser = lift(s.col.startsWith(p))
  def endswith(p: String): Ser = lift(s.col.endsWith(p))
  def slice(start: Int, len: Int): Ser = lift(substring(s.col, start + 1, len))
  def replace(pattern: String, repl: String): Ser =
    lift(regexp_replace(s.col, pattern, repl))
  def split(sep: String): Ser = lift(org.apache.spark.sql.functions.split(s.col, sep))
  def cat(other: Ser, sep: String = ""): Ser = lift(concat_ws(sep, s.col, other.col))
  def zfill(width: Int): Ser = lift(lpad(s.col, width, "0"))
}

final class DtAccessor private[api] (s: Ser) {
  private def lift(c: Column): Ser = new Ser(s.frame, c, s.name)
  def year: Ser = lift(org.apache.spark.sql.functions.year(s.col))
  def month: Ser = lift(org.apache.spark.sql.functions.month(s.col))
  def day: Ser = lift(dayofmonth(s.col))
  def hour: Ser = lift(org.apache.spark.sql.functions.hour(s.col))
  def minute: Ser = lift(org.apache.spark.sql.functions.minute(s.col))
  def second: Ser = lift(org.apache.spark.sql.functions.second(s.col))
  def dayofweek: Ser = lift(org.apache.spark.sql.functions.dayofweek(s.col))
  def date: Ser = lift(to_date(s.col))
  def floor(unit: String): Ser = lift(date_trunc(unit, s.col))
  /** `ToTimestamp` (`_expr.py:1159`): period-ish floor to unit start/end */
  def toTimestamp(freq: String, how: String = "start"): Ser = how match {
    case "start" => lift(date_trunc(freq, s.col))
    case "end" => lift(date_trunc(freq, s.col) + expr(s"INTERVAL 1 ${freq}") -
      expr("INTERVAL 1 MICROSECOND"))
  }
}

/** Categorical accessor (`_categorical.py:14-129`) over the
  * string-dictionary emulation (SURVEY.md §7.4.5): categories are the
  * sorted distinct values; `codes` ranks against a broadcast dictionary
  * (see [[Df.withCatCodes]]). `asUnknown`/`asKnown` are metadata-level
  * in the reference; here knownness is implicit (dictionary computed on
  * demand), so they are documented no-ops. */
final class CatAccessor private[api] (s: Ser) {
  /** distinct categories, sorted — eager-free (returns a lazy 1-col Df) */
  def categories: Df =
    new Df(s.frame.select(s.col.as("category")).distinct()
      .orderBy(org.apache.spark.sql.functions.col("category")))
  /** `cat.codes` for this column within its frame */
  def codes(df: Df): Df = df.withCatCodes(s.name, s.name + "_code")
  def asUnknown: Ser = s // metadata no-op (`_categorical.py:123-129`)
  def asKnown: Ser = s   // dictionary is computed on demand
}
