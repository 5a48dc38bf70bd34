package graft.queries

import graft.api.Df
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-verified query suite.
  *
  * Oracle-parity conventions (driver hash-compares vs DuckDB, see
  * /root/repo/BASELINE.md):
  *  - money/quantity sums go through DECIMAL(18,2) so Spark and DuckDB
  *    both compute the EXACT decimal sum and cast it to the same double
  *    (raw double sums differ in low bits between engines);
  *  - averages = exact decimal sum cast to double, divided by count;
  *  - statistical aggs (var/std) are rounded to 4dp (engines' merge
  *    order differs in the last ~6 ulps);
  *  - every query ends in a total-order sort so row order matches;
  *  - integer sums are cast to BIGINT (DuckDB widens to INT128).
  */
object QueryUtil {
  type Q = (SparkSession, String) => org.apache.spark.sql.DataFrame

  def T(s: SparkSession, dir: String, name: String): Df =
    Df.readParquet(s, s"$dir/$name.parquet")

  /** CANONICAL nanos-long → timestamp ingest conversion (parquet
    * TIMESTAMP(NANOS) read under `nanosAsLong`): integer-div truncation
    * to microseconds — the same truncation DuckDB's `ts::TIMESTAMP`
    * applies, so oracle comparisons line up. `div` must stay integral:
    * nanos ≈ 1.7e18 exceeds double's exact range, so a float division
    * would corrupt the microseconds. Shared by the batch queries and
    * graft.streaming.StreamOps — change it in one place only. */
  def nanosColToTs(name: String): Column =
    timestamp_micros(expr(s"$name div 1000"))

  /** `events` with the ts column converted via [[nanosColToTs]]. */
  def events(s: SparkSession, dir: String): Df = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    new Df(raw.withColumn("ts", nanosColToTs("ts")))
  }

  /** exact decimal sum of a ≤2dp double column, as double */
  def decSum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  /** exact decimal sum of product of two ≤2dp doubles, as double */
  def decSum4(c: Column): Column = sum(c.cast("decimal(28,4)")).cast("double")
  /** deterministic mean: exact decimal sum / count */
  def decMean(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(c)
  /** integer sum as bigint */
  def intSum(c: Column): Column = sum(c).cast("long")
}
