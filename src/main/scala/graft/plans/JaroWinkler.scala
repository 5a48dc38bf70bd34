package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity — the record-
  * linkage scorer that rewards shared PREFIXES (names, addresses,
  * titles), complementing `levenshtein` on the
  * [[graft.operators.Linkage]] hot path where it runs once per
  * candidate pair.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (rapidfuzz
  * convention) so scores replay in the oracle: standard Jaro with the
  * half-window match rule, Winkler prefix boost (p = 0.1, prefix ≤ 4)
  * applied only when jaro > 0.7, and empty input ⇒ 0.0 (even for two
  * empties). Codegen emits one static kernel call — the same shape the
  * engine's own `levenshtein` uses — so the expression stays inside
  * whole-stage codegen with no boxing. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case StringType => true
      case NullType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** static kernel (called from generated code). Operates on Unicode
    * CODEPOINTS, not UTF-16 code units — DuckDB/rapidfuzz compare
    * codepoints, and charAt-based lengths/windows/prefixes diverge on
    * non-BMP text (a surrogate pair would count as two symbols). */
  def compute(au: UTF8String, bu: UTF8String): Double = {
    val s = au.toString.codePoints().toArray
    val t = bu.toString.codePoints().toArray
    val n = s.length; val m = t.length
    if (n == 0 || m == 0) return 0.0 // incl. both-empty: DuckDB/rapidfuzz
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sM = new Array[Boolean](n); val tM = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && s(i) == t(j)) {
          sM(i) = true; tM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0; var trans = 0; i = 0
    while (i < n) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    // transpositions halve by INTEGER division (floor) — the
    // rapidfuzz/DuckDB convention; a fractional 1.5 on odd counts is
    // the other common variant and diverges in the 3rd decimal
    val jaro = (mm / n + mm / m + (mm - trans / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro // Winkler boost threshold (rapidfuzz)
    var l = 0
    val maxL = math.min(4, math.min(n, m))
    while (l < maxL && s(l) == t(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }
}
