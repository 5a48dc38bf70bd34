package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, NullType}

/** Native Catalyst expression: exact Jaccard similarity of two SORTED
  * `array<bigint>` sets via a codegen'd merge loop — O(n+m) with zero
  * allocation, vs `array_intersect`'s per-call hash-set build.
  *
  * Used on the near-dup verification hot path
  * (graft.operators.Dedup.ngramJaccardPairs), where it runs once per
  * candidate pair — millions of times at scale. Inputs MUST be sorted
  * ascending and distinct (array_sort∘array_distinct upstream).
  *
  * jaccard = |A∩B| / (|A|+|B|-|A∩B|) — the same rational the
  * array-function formulation produces, so results are bit-identical.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case NullType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard_sorted expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // empty ∪ empty has no jaccard

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val uni = n + m - inter
    // empty ∪ empty: undefined — NULL, matching the array-function
    // formulation (Spark's Divide yields null on a zero divisor)
    if (uni == 0) null else inter.toDouble / uni
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val uni = ctx.freshName("uni")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |int $uni = $n + $m - $inter;
         |if ($uni == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((double) $inter) / $uni; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}
