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
  /** Python `str.strip()` strips every char where `str.isspace()` holds
    * (tabs, newlines, NBSP, unicode spaces…); Spark's `trim` strips only
    * ' ' — so this is one regex pass over the CPython whitespace class. */
  def strip: Ser = lift(regexp_replace(s.col,
    "^[\\t-\\r \\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]+|" +
    "[\\t-\\r \\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]+$", ""))
  /** literal containment by default (Spark idiom); pandas
    * `str.contains` defaults to regex=True — pass `regex = true` for
    * that behavior. */
  def contains(sub: String, regex: Boolean = false): Ser =
    if (regex) lift(s.col.rlike(sub)) else lift(s.col.contains(sub))
  def startswith(p: String): Ser = lift(s.col.startsWith(p))
  def endswith(p: String): Ser = lift(s.col.endsWith(p))
  def slice(start: Int, len: Int): Ser = lift(substring(s.col, start + 1, len))
  def replace(pattern: String, repl: String): Ser =
    lift(regexp_replace(s.col, pattern, repl))
  def split(sep: String): Ser = lift(org.apache.spark.sql.functions.split(s.col, sep))
  def cat(other: Ser, sep: String = ""): Ser = lift(concat_ws(sep, s.col, other.col))
  /** CPython `str.zfill`: never truncates (Spark's `lpad` would), and
    * a leading '+'/'-' keeps its position — zeros go AFTER the sign
    * ('-5'.zfill(3) == '-05', not '0-5'). */
  def zfill(width: Int): Ser = {
    val signed = s.col.rlike("^[+-]")
    val filled = when(signed,
        concat(substring(s.col, 1, 1),
               lpad(substring(s.col, 2, Int.MaxValue), width - 1, "0")))
      .otherwise(lpad(s.col, width, "0"))
    lift(when(length(s.col) >= width, s.col).otherwise(filled))
  }
  /** pandas `str.capitalize`: first char upper, rest lower. */
  def capitalize: Ser = lift(concat(
    org.apache.spark.sql.functions.upper(substring(s.col, 1, 1)),
    org.apache.spark.sql.functions.lower(substring(s.col, 2, Int.MaxValue))))
  /** pandas `str.extract` (one group): regex capture group `group`. */
  def extract(pattern: String, group: Int = 1): Ser =
    lift(regexp_extract(s.col, pattern, group))
  /** pandas `str.count` for a literal single char (translate-based — no
    * regex, identical across engines). */
  def countChar(ch: String): Ser =
    lift(length(s.col) - length(translate(s.col, ch, "")))
  /** Unicode classes (\p{Nd} and \p{L} are valid in both Java regex
    * and RE2, so oracles agree). Close to pandas but not identical:
    * Python isdigit additionally accepts Numeric_Type=Digit characters
    * outside Nd (superscripts like '²') — not expressible as a regex
    * class shared by both engines. */
  // \A..\z, not ^..$: Java's $ matches BEFORE a trailing newline, so
  // "abc\n" would pass an ^..$ whole-string test (fuzz-caught)
  def isdigit: Ser = lift(s.col.rlike("\\A[\\p{Nd}]+\\z"))
  def isalpha: Ser = lift(s.col.rlike("\\A[\\p{L}]+\\z"))
  /** pandas `str.get(i)`: character at position i; negative i counts
    * from the end; out-of-range → null (pandas NaN). */
  def get(i: Int): Ser = {
    val ch = if (i >= 0) substring(s.col, i + 1, 1)
             else substring(s.col, i, 1)
    lift(when(length(ch) === 1, ch))
  }
  def pad(width: Int, fillchar: String = " ", side: String = "left"): Ser = {
    require(fillchar.length == 1,
      "str.pad: fillchar must be a single character (as in pandas)")
    // pandas str.pad never truncates; Spark's lpad/rpad cut the string
    // to `width` when it is already longer — guard on length first
    side match {
      case "left"  => lift(when(length(s.col) >= width, s.col)
                           .otherwise(lpad(s.col, width, fillchar)))
      case "right" => lift(when(length(s.col) >= width, s.col)
                           .otherwise(rpad(s.col, width, fillchar)))
      case "both"  =>
        // CPython str.center: left = marg/2 + (marg & width & 1) — the
        // extra char goes LEFT exactly when both the margin and the
        // target width are odd
        val padSrc = lit(fillchar * width)
        val deficit = greatest(lit(0), lit(width) - length(s.col))
        val extraLeft =
          if (width % 2 == 1) (deficit % 2).cast("int") else lit(0)
        val l = (deficit / 2).cast("int") + extraLeft
        val r = deficit.cast("int") - l
        lift(concat(padSrc.substr(lit(1), l), s.col, padSrc.substr(lit(1), r)))
      case other => throw new IllegalArgumentException(
        s"str.pad: side must be left|right|both (got '$other')")
    }
  }
}

final class DtAccessor private[api] (s: Ser) {
  private def lift(c: Column): Ser = new Ser(s.frame, c, s.name)
  def year: Ser = lift(org.apache.spark.sql.functions.year(s.col))
  def month: Ser = lift(org.apache.spark.sql.functions.month(s.col))
  def day: Ser = lift(dayofmonth(s.col))
  def hour: Ser = lift(org.apache.spark.sql.functions.hour(s.col))
  def minute: Ser = lift(org.apache.spark.sql.functions.minute(s.col))
  def second: Ser = lift(org.apache.spark.sql.functions.second(s.col))
  /** pandas `dt.dayofweek`/`dt.weekday`: Monday=0..Sunday=6. Spark's
    * builtin `dayofweek` is Sunday=1..Saturday=7 — shifted here to the
    * pandas convention ((spark + 5) % 7). */
  def dayofweek: Ser =
    lift((org.apache.spark.sql.functions.dayofweek(s.col) + 5) % 7)
  def weekday: Ser = dayofweek
  def quarter: Ser = lift(org.apache.spark.sql.functions.quarter(s.col))
  def dayofyear: Ser = lift(org.apache.spark.sql.functions.dayofyear(s.col))
  /** ISO week number (both Spark and DuckDB use ISO-8601 weeks). */
  def weekofyear: Ser = lift(org.apache.spark.sql.functions.weekofyear(s.col))
  /** pandas `dt.is_leap_year` — Gregorian rule as a plain expression. */
  def isLeapYear: Ser = {
    val y = org.apache.spark.sql.functions.year(s.col)
    lift((y % 4 === 0 && y % 100 =!= 0) || y % 400 === 0)
  }
  /** pandas `dt.days_in_month`. */
  def daysInMonth: Ser = lift(dayofmonth(last_day(s.col)))
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
  * string-dictionary emulation (SURVEY.md §7.4.5).
  *
  * Two states, mirroring the reference's known/unknown protocol:
  *  - UNKNOWN (this accessor): the dictionary is not materialized;
  *    `categories`/`codes` answer lazily from the data.
  *  - KNOWN ([[KnownCat]], via [[asKnown]]/[[setCategories]]): the
  *    dictionary is an explicit driver-side list (pandas stores it in
  *    the dtype), unlocking the delegated category-set methods
  *    (`_categorical.py:39-47`). */
final class CatAccessor private[api] (s: Ser) {
  /** `known` (`_categorical.py:50-53`): a bare column has no attached
    * dictionary. */
  def known: Boolean = false
  /** distinct categories, sorted — eager-free (returns a lazy 1-col Df) */
  def categories: Df =
    new Df(s.frame.select(s.col.as("category")).distinct()
      .orderBy(org.apache.spark.sql.functions.col("category")))
  /** `cat.codes` for this column within its frame */
  def codes(df: Df): Df = df.withCatCodes(s.name, s.name + "_code")
  def asUnknown: Ser = s // already unknown (`_categorical.py:78-85`)
  /** `as_known()` (`_categorical.py:55-76`): EAGERLY computes the
    * dictionary — the reference likewise runs `unique().compute()`.
    * One distinct-aggregate job; the dictionary itself is small by the
    * definition of a categorical. Sorted for determinism (matching
    * [[Df.withCatCodes]]'s convention). Guarded like `withCatCodes`:
    * the distinct set is capped at `maxCategories` (limit pushed into
    * the Spark job, so an over-cap column ships ≤ cap+1 rows, never
    * the full dictionary), and over-cap input fails fast with the
    * named error instead of collecting an unbounded list to the
    * driver — on a miscalled high-cardinality column at corpus scale
    * that is a clear exception, not a driver OOM. */
  def asKnown: KnownCat = asKnown()
  def asKnown(maxCategories: Int = 1 << 20): KnownCat = {
    require(maxCategories >= 1 && maxCategories < Int.MaxValue,
      s"as_known: maxCategories must be in [1, ${Int.MaxValue - 1}]: " +
        s"$maxCategories")
    // ordered by SPARK on the RAW column (so ints sort numerically and
    // strings sort in UTF8String binary order — the same ordering
    // withCatCodes/cat.categories use; JVM compareTo would disagree on
    // supplementary-plane characters), then cast to the string
    // dictionary representation
    val cats = s.frame.select(s.col.as("__c"))
      .where(org.apache.spark.sql.functions.col("__c").isNotNull)
      .distinct().orderBy("__c")
      .limit(maxCategories + 1)
      .select(org.apache.spark.sql.functions.col("__c").cast("string"))
      .collect().map(_.getString(0)).toSeq
    if (cats.length > maxCategories) throw new IllegalArgumentException(
      s"as_known('${s.name}'): over $maxCategories distinct values — not " +
        "a categorical column. Raise maxCategories explicitly, or keep " +
        "the column unknown and aggregate/join on it directly.")
    new KnownCat(s, s.col, cats)
  }
  /** `set_categories` without computing: attach an explicit dictionary. */
  def setCategories(cs: Seq[String]): KnownCat = new KnownCat(s, s.col, cs)
}

/** Known-categories categorical (`_categorical.py:39-76`): the pandas
  * `Categorical` dtype re-expressed Spark-first. The dictionary rides on
  * the driver as a literal (pandas keeps it in the dtype, same place),
  * so `codes` compiles to ONE codegen'd `array_position` against a
  * literal array — no join, no shuffle, no broadcast variable; scales
  * to any row count. Category-set methods are driver-side list edits
  * (dictionary-only, like pandas); only `values`/`codes` touch data.
  *
  * `valueCol` carries the data through renames; values outside the
  * current dictionary surface as null (pandas NaN) with code -1. */
final class KnownCat private[api] (
    private val s: Ser,
    private val valueCol: Column,
    val categories: Seq[String],
    val ordered: Boolean = false) {

  def known: Boolean = true

  private def copyWith(v: Column = valueCol, cs: Seq[String] = categories,
                       ord: Boolean = ordered): KnownCat =
    new KnownCat(s, v, cs, ord)

  /** `add_categories`: dictionary grows, data unchanged. */
  def addCategories(cs: Seq[String]): KnownCat = {
    require(cs.forall(c => !categories.contains(c)),
      "add_categories: category already exists")
    copyWith(cs = categories ++ cs)
  }
  /** `remove_categories`: removed values become null (pandas NaN),
    * their codes -1; remaining codes shift to the compacted positions. */
  def removeCategories(cs: Seq[String]): KnownCat = {
    require(cs.forall(categories.contains),
      "remove_categories: not an existing category")
    copyWith(cs = categories.filterNot(cs.contains))
  }
  /** `rename_categories`: relabels the dictionary AND the data values
    * (pandas semantics — codes are unchanged). All renames apply
    * SIMULTANEOUSLY against the original values (one CASE chain over
    * the un-rewritten column), so swaps work and map iteration order
    * is irrelevant; duplicate resulting categories are rejected, as in
    * pandas. */
  def renameCategories(m: Map[String, String]): KnownCat = {
    // keys that aren't current categories are ignored (pandas does the
    // same) — without the filter they would resurrect out-of-dictionary
    // data values into the renamed category
    val eff = m.filter { case (from, _) => categories.contains(from) }
    val newCats = categories.map(c => eff.getOrElse(c, c))
    require(newCats.distinct.size == newCats.size,
      "rename_categories: new categories must be unique")
    val v = eff.foldLeft(Option.empty[Column]) { case (acc, (from, to)) =>
      Some(acc.map(_.when(valueCol === lit(from), lit(to)))
        .getOrElse(when(valueCol === lit(from), lit(to))))
    }.map(_.otherwise(valueCol)).getOrElse(valueCol)
    copyWith(v = v, cs = newCats)
  }
  /** `reorder_categories`: same set, new order (recodes positions). */
  def reorderCategories(cs: Seq[String]): KnownCat = {
    require(cs.sorted == categories.sorted,
      "reorder_categories: must be a permutation of the current categories")
    copyWith(cs = cs)
  }
  /** `set_categories`: replace the dictionary outright; values not in
    * the new dictionary null out (code -1). */
  def setCategories(cs: Seq[String]): KnownCat = copyWith(cs = cs)
  def asOrdered: KnownCat = copyWith(ord = true)
  def asUnordered: KnownCat = copyWith(ord = false)
  /** `as_unknown` (`_categorical.py:78-85`): detach the dictionary. */
  def asUnknown: Ser = values

  /** data column under the current dictionary: renamed, out-of-dictionary
    * values nulled (pandas NaN). */
  def values: Ser = new Ser(s.frame,
    when(valueCol.isin(categories.map(x => x: Any): _*), valueCol), s.name)

  /** `cat.codes`: 0-based position in the dictionary; null/absent → -1.
    * `array_position` over a literal array (0 when missing, null on null
    * input — both fold to -1), fully inside whole-stage codegen. */
  def codes: Ser = new Ser(s.frame,
    coalesce(array_position(lit(categories.toArray), valueCol) - 1, lit(-1L))
      .cast("int"), s.name + "_code")
}
