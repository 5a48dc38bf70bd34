package graft.operators

import graft.api.Df
import org.apache.spark.sql.functions._

/** Feature-encoding operators for model-training pipelines. */
object Features {

  /** Leave-one-out target encoding: each row's category is replaced by
    * the mean of the TARGET over the OTHER rows of the same category —
    * the standard high-cardinality categorical encoding that avoids
    * leaking the row's own label ((sum − y) / (n − 1)).
    *
    * Shape at scale: ONE grouped aggregate over the category (exact
    * DECIMAL sums — order-independent partials, bit-identical merges),
    * then a join back. The category table is |categories|-sized —
    * broadcast when small; singleton categories (n = 1) yield null
    * (no other rows to borrow a mean from), callers impute a prior.
    * Target must be ≤2dp (cast DECIMAL(18,2)); the LOO division is
    * double, written once so oracles can replay the exact tree. */
  def targetEncodeLoo(df: Df, catCol: String, targetCol: String,
                      out: String, broadcastDim: Boolean = true): Df = {
    val stats = df.sdf.groupBy(col(catCol))
      .agg(sum(col(targetCol).cast("decimal(18,2)")).cast("double").as("__s"),
        count(col(targetCol)).cast("double").as("__n"))
    val dim = if (broadcastDim) broadcast(stats) else stats
    val joined = df.sdf.join(dim, Seq(catCol), "left")
    new Df(joined
      .withColumn(out,
        when(col("__n") > 1,
          (col("__s") - col(targetCol).cast("decimal(18,2)").cast("double"))
            / (col("__n") - lit(1.0)))
          .otherwise(lit(null).cast("double")))
      .drop("__s", "__n"))
  }
}
