package graft

import graft.api.Df
import graft.operators.Graphs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the graph-analytics operators (q203): PageRank power
  * iteration and the transition-edge extractor. */
class GraphSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  import TestSpark._

  // cross-suite block-accounting hygiene (the cache-lifetime contract
  // test asserts a clean slate): drain whatever this suite retained
  override def afterAll(): Unit = Df.releaseRetained()

  private val edgeSchema =
    StructType(Seq(StructField("src", StringType), StructField("dst", StringType)))

  private def mkEdges(es: (String, String)*) =
    Df.fromRows(spark, es.map { case (s, d) => Row(s, d) }, edgeSchema).sdf

  test("pageRank: a symmetric 2-cycle is the fixed point 1/N") {
    // a⇄b: r = 0.15/2 + 0.85·0.5 = 0.5 every iteration, exactly
    val out = Graphs.pageRank(mkEdges("a" -> "b", "b" -> "a"),
      "src", "dst", iterations = 5).sdf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    Df.releaseRetained()
    assert(out == Map("a" -> 0.5, "b" -> 0.5))
  }

  test("pageRank: dangling node keeps teleport-only rank (no redistribution)") {
    // a→b only. r1 = (0.075, 0.5); r2 = (0.075, 0.075 + 0.85·0.075)
    val out = Graphs.pageRank(mkEdges("a" -> "b"),
      "src", "dst", iterations = 2).sdf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    Df.releaseRetained()
    assert(out("a") == 0.075)
    assert(out("b") == 0.13875)
  }

  test("pageRank: multi-edges weight the split; guards reject bad params") {
    // a→b, a→b, a→c: a's mass splits 2/3 : 1/3
    val out = Graphs.pageRank(mkEdges("a" -> "b", "a" -> "b", "a" -> "c"),
      "src", "dst", iterations = 1).sdf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    Df.releaseRetained()
    val third = 1.0 / 3
    assert(math.abs(out("b") - (0.15 / 3 + 0.85 * third * (2.0 / 3))) < 1e-8)
    assert(math.abs(out("c") - (0.15 / 3 + 0.85 * third * (1.0 / 3))) < 1e-8)
    intercept[IllegalArgumentException] {
      Graphs.pageRank(mkEdges("a" -> "b"), "src", "dst", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRank(mkEdges("a" -> "b"), "src", "dst", damping = 1.0)
    }
  }

  test("transitionEdges emits consecutive pairs per group in total order") {
    val schema = StructType(Seq(StructField("g", LongType),
      StructField("t", LongType), StructField("page", StringType)))
    val df = Df.fromRows(spark, Seq(
      Row(1L, 1L, "x"), Row(1L, 2L, "y"), Row(1L, 3L, "z"),
      Row(2L, 1L, "q")), schema).sdf
    val out = Graphs.transitionEdges(df, "g", Seq("t"), "page")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(out == Set("x" -> "y", "y" -> "z"))
  }

  test("funnel: greedy-earliest ordered steps, window cutoff, same-ts allowed") {
    import java.sql.Timestamp
    val schema = StructType(Seq(StructField("u", StringType),
      StructField("ts", TimestampType), StructField("t", StringType)))
    def ev(u: String, sec: Long, t: String) = Row(u, new Timestamp(sec * 1000), t)
    val rows = Seq(
      ev("u1", 0, "view"), ev("u1", 100, "click"), ev("u1", 200, "purchase"),
      ev("u2", 0, "view"), ev("u2", 8000, "click"),          // outside 7200 s
      ev("u3", 0, "click"), ev("u3", 100, "view"), ev("u3", 50, "purchase"),
      ev("u4", 0, "view"), ev("u4", 15, "purchase"), ev("u4", 20, "click"),
      ev("u5", 0, "view"), ev("u5", 0, "click"), ev("u5", 0, "purchase"))
    val e = Df.fromRows(spark, rows, schema).sdf
    val out = graft.operators.Funnels
      .funnel(e, "u", "ts", "t", Seq("view", "click", "purchase"), 7200L)
      .sdf.collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    Df.releaseRetained()
    assert(out(1) == (("view", 5L, 1.0)))
    assert(out(2) == (("click", 3L, 0.6)))    // u1, u4, u5
    assert(out(3) == (("purchase", 2L, 0.4))) // u1, u5
    intercept[IllegalArgumentException] {
      graft.operators.Funnels.funnel(e, "u", "ts", "t", Seq("view"), 10L)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Funnels.funnel(e, "u", "ts", "t",
        Seq("view", "view"), 10L)
    }
  }

  test("pageRank: broadcast-chained and shuffle-loop modes are bit-identical") {
    // a 9-node three-component graph with danglers and multi-edges —
    // exercises teleport, weighting, and the left-join null path on
    // both sides of the |V| gate. broadcastMaxNodes = 0 forces the
    // per-iteration persisted shuffle loop; the default takes the
    // chained-lazy broadcast plan. The decimal-summed contributions
    // are order-independent, so the DOUBLES must match bitwise.
    val es = Seq("a" -> "b", "a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d",
      "x" -> "y", "y" -> "x", "y" -> "z", "p" -> "q")
    def run(gate: Long) =
      Graphs.pageRank(mkEdges(es: _*), "src", "dst", iterations = 9,
        broadcastMaxNodes = gate).sdf.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val chained = run(250000)
    Df.releaseRetained()
    val looped = run(0)
    Df.releaseRetained()
    assert(chained == looped)
    assert(chained.size == 9)
  }

  test("pageRank chained mode: iterations beyond chainDepth still converge (plan-depth cut)") {
    // 20 iterations crosses the chainDepth=8 materialization cut twice;
    // a 2-cycle's fixed point (0.5 each) must survive the cuts exactly.
    val out = Graphs.pageRank(mkEdges("a" -> "b", "b" -> "a"),
      "src", "dst", iterations = 20).sdf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    Df.releaseRetained()
    assert(out == Map("a" -> 0.5, "b" -> 0.5))
  }

  test("pageRank plan: rank⋈edges never cartesian, contributions partial-agg") {
    val ranked = Graphs.pageRank(mkEdges("a" -> "b", "b" -> "c", "c" -> "a"),
      "src", "dst", iterations = 1).sdf
    val p = ranked.queryExecution.executedPlan.toString
    Df.releaseRetained()
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
