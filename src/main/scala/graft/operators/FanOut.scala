package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-side parallelism guard for CPU-heavy per-row expansions
  * (tokenize → shingle/n-gram/score pipelines).
  *
  * A small parquet file is ONE scan partition (parquet splits at
  * row-group granularity), so everything up to the first shuffle —
  * including the map-side partial aggregation — runs on a single core
  * no matter how many executors the cluster has. For the text
  * operators, whose per-row work (n-gram assembly, hashing, regex) is
  * 10-100× the row-decode cost, that serial scan IS the wall time.
  *
  * [[FanOut.apply]] redistributes the input across the session's
  * default parallelism ONLY when the scan is materially narrower than
  * the session — on a 100 TB table (thousands of row groups → thousands
  * of scan partitions) it is a planning-time no-op, so the guard never
  * adds a shuffle where the scan already parallelizes. Round-robin
  * repartition keeps row multiplicity exactly (no key skew, no data
  * dependence), so it is semantics-free for every downstream operator.
  */
private[graft] object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions is planning-time only (no job); 2× headroom so a
    // near-parallel scan is left alone
    if (df.rdd.getNumPartitions * 2 >= p) df else df.repartition(p)
  }
}
