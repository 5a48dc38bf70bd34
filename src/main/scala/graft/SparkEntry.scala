package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * `queries` carries one verified query per implemented operator
  * (SURVEY.md §2 inventory + the LLM-pipeline extensions); `oracleSql`
  * the DuckDB ANSI-SQL twin the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.defs("q01_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ ElementwiseQueries.defs ++ ReductionQueries.defs ++
      JoinQueries.defs ++ WindowQueries.defs ++ ExtensionQueries.defs ++
      AnalyticsQueries.defs ++ CoverageQueries.defs ++ CoverageQueries.defs2 ++
      CurationQueries.defs ++ PipelineQueries.defs ++ StreamingQueries.defs ++
      GovernanceQueries.defs ++ ReshapeQueries.defs ++ SketchQueries.defs ++
      FeatureQueries.defs ++ TimeSeriesQueries.defs ++ MediaQueries.defs

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ElementwiseQueries.oracles ++ ReductionQueries.oracles ++
      JoinQueries.oracles ++ WindowQueries.oracles ++ ExtensionQueries.oracles ++
      AnalyticsQueries.oracles ++ CoverageQueries.oracles ++ CoverageQueries.oracles2 ++
      CurationQueries.oracles ++ PipelineQueries.oracles ++ StreamingQueries.oracles ++
      GovernanceQueries.oracles ++ ReshapeQueries.oracles ++ SketchQueries.oracles ++
      FeatureQueries.oracles ++ TimeSeriesQueries.oracles ++ MediaQueries.oracles
}
