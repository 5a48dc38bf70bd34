package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: RFC 3986 §6.2.2 percent-encoding
  * normalization (escape hex uppercased, unreserved escapes decoded) —
  * the percent pass of
  * [[graft.operators.Curation.normalizeUrl]].
  *
  * Why native: the column-function formulation is a ~78-step
  * `replace`/`regexp_replace` chain, and that many nested string ops in
  * one projection blows Janino's 64 KB method limit — whole-stage
  * codegen DISABLES for the whole stage (observed: "Code grows beyond
  * 64 KB" on the q135 plan), dropping the hottest pre-content dedup
  * path at crawl scale out of the fused loop. This expression codegens
  * to ONE static call (the preference-order step (b) "custom
  * Expression" from the build rules, the [[FloatCosine]] precedent).
  *
  * Semantics are the sequential chain the DuckDB oracle replays
  * (CurationQueries.pctSql — both fold the SAME tables below),
  * iterated to fixpoint (see [[PercentNormalize.normalize]] for why):
  *  1. gate: a '%'-free string returns unchanged;
  *  2. case pass: first-position escape hex letters uppercase
  *     (`%a…` → `%A…`), then second-position
  *     (`%Xa` → `%XA` for X ∈ [0-9A-F]) — implemented as one in-place
  *     scan, equivalent to the two global passes because every rule
  *     only uppercases and rule instances never overlap (each starts
  *     with '%' and contains none);
  *  3. decode pass: the [[PercentNormalize.decodeTable]] literal
  *     replaces IN TABLE ORDER — sequential exactly like the chain, so
  *     adversarial double-'%' inputs (`%%32E`, where one replacement's
  *     output completes a later pattern) agree with the oracle's pass
  *     algorithm;
  *  4. repeat 2–3 until stable, so the whole expression is idempotent
  *     on EVERY input, not just well-formed URLs.
  */
case class PercentNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pct_normalize expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PercentNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.PercentNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_pct_normalize"
}

object PercentNormalize {

  /** escape hex letters that may arrive lowercase */
  val hexLetters: Seq[Char] = "abcdef".toSeq

  /** RFC 3986 §6.2.2 unreserved octets, (uppercase-hex escape →
    * decoded char), in the order the decode pass applies them. `%25`
    * is deliberately absent — '%' is not unreserved, and decoding it
    * could mint new escape openers. */
  val decodeTable: Seq[(String, String)] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .map(ch => (f"%%${ch.toInt}%02X", ch.toString))

  private val decodeArr: Array[(String, String)] = decodeTable.toArray

  private def isUpperHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F')

  /** one full chain pass: the case scan then the sequential
    * table-order decode — exactly what the DuckDB oracle replays. */
  private def chainOnce(s: String): String = {
    // case pass (in-place scan ≡ the two global replace passes)
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      if (a(i) == '%') {
        if (i + 1 < a.length && a(i + 1) >= 'a' && a(i + 1) <= 'f')
          a(i + 1) = (a(i + 1) - 32).toChar
        if (i + 2 < a.length && isUpperHex(a(i + 1)) &&
            a(i + 2) >= 'a' && a(i + 2) <= 'f')
          a(i + 2) = (a(i + 2) - 32).toChar
      }
      i += 1
    }
    // decode pass: sequential literal replaces in table order (the
    // oracle's exact algorithm); contains guard skips absent escapes
    var out = new String(a)
    var k = 0
    while (k < decodeArr.length) {
      val (esc, ch) = decodeArr(k)
      if (out.contains(esc)) out = out.replace(esc, ch)
      k += 1
    }
    out
  }

  /** the runtime kernel — called from generated code, one invocation
    * per row. Kept on the companion so codegen resolves it as a static
    * forwarder.
    *
    * The chain is iterated to FIXPOINT: a decode can mint a new escape
    * when a literal '%' directly precedes a well-formed one (`%%341` →
    * `%41` → `A` — the inner `%34` decodes to '4', which lands between
    * the outer '%' and the '1'). A single pass would decode one level
    * per CALL and break [[graft.operators.Curation.normalizeUrl]]'s
    * idempotence contract (a re-canonicalized stored key must not keep
    * moving). Termination: every decode strictly shortens the string
    * and case fixes are monotone, so the loop is bounded by length/2.
    * The DuckDB oracle replays ONE pass — identical for any input
    * whose '%'s all open well-formed escapes (the q135 corpus, and any
    * spec-compliant URL); adversarial double-'%' soup is the
    * documented residual where engines are compared on the fixpoint
    * side only (NativeExprSpec). */
  def normalize(u: UTF8String): UTF8String = {
    var s = u.toString
    if (s.indexOf('%') < 0) return u
    var prev: String = null
    while (s != prev) { prev = s; s = chainOnce(s) }
    UTF8String.fromString(s)
  }
}
