package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration for graft's native Catalyst expressions.
  *
  * Two paths:
  *  - [[GraftFunctions.register]]: idempotent per-session registration
  *    (used internally by the operators — callers need no setup);
  *  - [[GraftExtensions]]: `SparkSessionExtensions` hook for
  *    `spark.sql.extensions=graft.plans.GraftExtensions`, making
  *    `graft_cosine` available in every session of a cluster.
  */
object GraftFunctions {
  val names: Seq[String] = Seq("graft_cosine", "graft_jaccard_sorted")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      (exprs: Seq[Expression]) => FloatCosine(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_jaccard_sorted",
      (exprs: Seq[Expression]) => SortedJaccard(exprs(0), exprs(1)), "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FloatCosine].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => FloatCosine(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_jaccard_sorted"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedJaccard].getName, "graft_jaccard_sorted"),
      (exprs: Seq[Expression]) => SortedJaccard(exprs(0), exprs(1))))
  }
}
