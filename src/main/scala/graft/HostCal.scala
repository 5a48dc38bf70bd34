package graft
import org.apache.spark.sql.SparkSession

/** Host-calibration probe shared by graft.Bench and graft.ScaleProbe
  * (r19: extracted from Bench so every measurement harness reports the
  * same normalizer). A FIXED seeded synthetic sort+agg+join touching no
  * test data: exchange, SORT (the merge hint forces sort-merge instead
  * of auto-broadcasting the 4096-row agg, plus a window sort the
  * optimizer cannot eliminate), window lag, and partial+final hash agg
  * — zero I/O so disk-cache state can't skew it. A naive
  * orderBy-under-aggregate would be defeated by Catalyst
  * (EliminateSorts) — probe plans must be checked against the
  * optimizer, not assumed. */
object HostCal {
  /** one probe execution, seconds */
  def once(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val c = org.apache.spark.sql.functions.col _
    val t0 = System.nanoTime()
    val base = spark.range(10000000L).select(c("id"),
      pmod(hash(c("id")), lit(4096)).as("k"),
      (c("id") * 2654435761L % 1000003L).as("v"))
    val agg = base.groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(c("k")).orderBy(c("v"), c("id"))
    base.join(agg.hint("merge"), "k")
      .select(c("k"), c("v"), c("sv"), lag(c("v"), 1).over(w).as("pv"))
      .groupBy("k")
      .agg(sum(c("v") + c("sv") - coalesce(c("pv"), lit(0L))).as("s"))
      .agg(sum(c("s")).as("t")).head()
    (System.nanoTime() - t0) / 1e9
  }
  /** min-of-2 back-to-back: single-shot probes spread 2.9 vs 1.3 s for
    * the same workload within one run (JIT + allocator noise) — the min
    * of two adjacent runs is the host's actual current speed. */
  def minOf2(spark: SparkSession): Double = (1 to 2).map(_ => once(spark)).min
}
