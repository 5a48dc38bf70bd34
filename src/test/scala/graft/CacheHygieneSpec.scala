package graft

import graft.api.Df
import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface cache-lifetime sweep — the systemic pin for the r12
  * leak class. The precise bug it guards against: blocks that survive
  * BOTH release paths the harnesses run between queries
  * (`Df.releaseRetained()` then `spark.catalog.clearCache()`).
  * `clearCache` cannot free RDD-level storage (a `localCheckpoint`'s
  * blocks — exactly how connectedComponents leaked one |V|-row RDD per
  * iteration for four rounds), and `releaseRetained` only frees what an
  * operator ATTACHED — so any block still live after both is storage
  * nothing can reach: a leak by construction, in whichever operator the
  * failing query name points at.
  *
  * Sweeps EVERY SparkEntry query at sf0.001 (the entry-contract sf), so
  * a new operator wired into the query surface gets this guarantee
  * automatically — no per-operator test to remember. */
class CacheHygieneSpec extends AnyFunSuite {
  import TestSpark._

  test("every query leaves zero persisted blocks after releaseRetained + clearCache") {
    // clean slate (earlier suites release in afterAll, but be explicit)
    Df.releaseRetained()
    spark.catalog.clearCache()
    val sc = spark.sparkContext
    assert(sc.getPersistentRDDs.isEmpty,
      s"dirty slate before sweep: ${sc.getPersistentRDDs.values.map(_.name)}")
    val leaks = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      // count() is action enough for leak accounting: every internal
      // persist/checkpoint either materializes during plan CONSTRUCTION
      // (iterative operators) or sits on the path the count scans
      fn(spark, sf).count()
      Df.releaseRetained()
      spark.catalog.clearCache()
      val live = sc.getPersistentRDDs
      if (live.nonEmpty) {
        leaks += s"$name -> ${live.values.map(_.name).mkString("; ")}"
        // free them so one leak doesn't cascade into every later row
        live.values.foreach(_.unpersist(false))
      }
    }
    assert(leaks.isEmpty,
      s"queries leaking unreachable blocks:\n  ${leaks.mkString("\n  ")}")
  }
}
