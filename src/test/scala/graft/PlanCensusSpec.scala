package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins for [[graft.PlanCensus]], the physical-tree census behind the
  * per-round plan-fingerprint gate (`graft.Plans` /
  * `bench_artifacts/plans_rNN.json`) and `graft.Explain`'s summary. The
  * gate is only as trustworthy as the census, so the three tree-walk
  * contracts each get a direct assertion: expression subqueries are
  * folded in (ADVICE r19 — a plan dominated by a scalar-subquery
  * shuffle must not report shuffleExchanges=0), cached scans are
  * LEAVES (an action re-reads cached blocks, it does not re-run the
  * lineage below the cache point — the 275x formatted-string
  * overcount class), and file scans surface their exact ReadSchema
  * column set + pushed-filter string (the pruning signal the
  * fingerprint diff exists to guard). */
class PlanCensusSpec extends AnyFunSuite {
  import TestSpark._

  test("scalar-subquery shuffles are counted (ADVICE r19)") {
    spark.range(100).toDF("id").createOrReplaceTempView("pc_t")
    val q = spark.sql(
      "SELECT id FROM pc_t WHERE id > (SELECT avg(id) FROM pc_t)")
    val c = PlanCensus.of(q)
    // the main plan is a scan+filter (no exchange); the subquery's
    // global avg carries the only shuffle — visible iff subqueries fold
    assert(c.shuffleExchanges >= 1,
      s"subquery shuffle missing from census: $c")
  }

  test("cached scan is a leaf: lineage below the cache is not counted") {
    val agg = spark.range(1000).toDF("id")
      .withColumn("g", col("id") % 7)
      .groupBy("g").agg(sum("id").as("s"))
      .cache()
    try {
      agg.count() // materialize so the plan uses InMemoryTableScan
      val c = PlanCensus.of(agg.filter(col("s") > 0))
      assert(c.cachedScans == 1, s"expected one cached scan: $c")
      // the groupBy's exchange sits BELOW the cache point — an action
      // on the filtered frame never re-runs it
      assert(c.shuffleExchanges == 0,
        s"cached lineage leaked into the census: $c")
    } finally agg.unpersist()
  }

  test("file scan fingerprint: ReadSchema columns + pushed filters + sorts") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_shipdate")
      .filter(col("l_quantity") > 10)
      .select("l_orderkey", "l_quantity")
      .orderBy("l_orderkey")
    val c = PlanCensus.of(li)
    assert(c.scans.size == 1, s"expected one file scan: $c")
    val s = c.scans.head
    // pruning: exactly the consumed columns, nothing more (l_shipdate
    // was projected away before the action)
    assert(s.columns.sorted == Seq("l_orderkey", "l_quantity"),
      s"ReadSchema not pruned to the consumed set: $s")
    assert(s.pushedFilters.contains("GreaterThan(l_quantity"),
      s"filter not pushed to the scan: $s")
    assert(s.dataFilterCount >= 1)
    assert(c.sorts >= 1, s"orderBy's sort missing: $c")
    assert(c.shuffleExchanges >= 1, s"orderBy's range exchange missing: $c")
  }
}
