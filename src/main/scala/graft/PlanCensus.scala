package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Physical-plan census shared by `graft.Explain` (interactive) and
  * `graft.Plans` (the per-round fingerprint artifact, VERDICT r19 item 1).
  *
  * Counts are taken on the physical TREE, not the formatted string:
  * formatted mode expands every InMemoryRelation's cached lineage for
  * display (a materialized pageRank showed 275 string "Exchange"s for a
  * plan whose real work is one sort over a cached scan). Cached scans are
  * leaves (not re-executed by an action); AQE wrappers are unwrapped to
  * their current plan; and — per ADVICE r19 — expression subqueries
  * (`p.subqueries`) are folded in, so a plan dominated by a
  * scalar-subquery shuffle no longer reports shuffleExchanges=0.
  */
object PlanCensus {

  /** One file scan's fingerprint: the exact column set the scan reads
    * (ReadSchema — "a scan that reads all columns for a 2-column
    * projection is wrong"), the pushed-filter summary string, and the
    * partition/data filter counts. Location is deliberately excluded:
    * paths vary by sf dir and would make the artifact diff noisy.
    */
  final case class ScanPrint(
      columns: Seq[String],
      pushedFilters: String,
      partitionFilterCount: Int,
      dataFilterCount: Int)

  final case class Census(
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      cachedScans: Int,
      sorts: Int,
      scans: Seq[ScanPrint]) {
    def +(o: Census): Census = Census(
      shuffleExchanges + o.shuffleExchanges,
      broadcastExchanges + o.broadcastExchanges,
      cachedScans + o.cachedScans,
      sorts + o.sorts,
      scans ++ o.scans)
  }

  val empty: Census = Census(0, 0, 0, 0, Nil)

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  def census(p0: SparkPlan): Census = {
    val p = unwrap(p0)
    val self = p match {
      case _: ShuffleExchangeLike => empty.copy(shuffleExchanges = 1)
      case _: BroadcastExchangeLike => empty.copy(broadcastExchanges = 1)
      // cached: a leaf for the census — an action re-reads the cached
      // blocks, it does NOT re-run the lineage below the cache point
      case _: InMemoryTableScanExec => empty.copy(cachedScans = 1)
      case _: SortExec => empty.copy(sorts = 1)
      case f: FileSourceScanExec =>
        empty.copy(scans = Seq(ScanPrint(
          f.requiredSchema.fieldNames.toSeq,
          f.metadata.getOrElse("PushedFilters", ""),
          f.partitionFilters.size,
          f.dataFilters.size)))
      case _ => empty
    }
    val kids = p match {
      case _: InMemoryTableScanExec => empty // stop: cached lineage not re-run
      case _ =>
        (p.children ++ p.subqueries).map(census).foldLeft(empty)(_ + _)
    }
    self + kids
  }

  def of(df: DataFrame): Census = census(df.queryExecution.executedPlan)
}
