package graft

import graft.api.Df
import graft.operators.Sketches
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** HLL sketch columns + RANGE-frame rolling windows. */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("hllSketches: per-group estimate tracks exact; rollup merges " +
    "sketches without rescanning the source") {
    val rows = (1 to 3000).map(i => Row(s"g${i % 3}", i.toLong))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("g", StringType), StructField("v", LongType))))
    val sk = Sketches.hllSketches(d, Seq("g"), "v")
    assert(sk.columns == Seq("g", "sketch", "n_exact"))
    val est = Sketches.hllEstimates(sk).sdf.collect()
    assert(est.length == 3)
    est.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val e = r.getAs[Long]("estimate")
      assert(math.abs(e - exact) <= 0.1 * exact, s"estimate $e vs $exact")
    }
    // merged rollup: groups partition v evenly, union must see all 3000
    val merged = Sketches.hllRollup(sk).sdf.head.getLong(0)
    assert(math.abs(merged - 3000L) <= 300L)
    // the rollup plan reads the sketch table only — no scan of `d`
    val plan = Sketches.hllRollup(sk).sdf.queryExecution.optimizedPlan
    assert(plan.collectLeaves().size == 1)
  }

  test("RANGE frame trailing window is tie-safe and matches hand count") {
    // user u: events at t=0s, 30m, 61m; trailing 1h counts = 1, 2, 2
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(Row("u", at(0), 1.0), Row("u", at(30), 2.0),
      Row("u", at(61), 4.0))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("k", StringType), StructField("ts", TimestampType),
      StructField("v", DoubleType))))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(unix_micros(col("ts"))).rangeBetween(-3600L * 1000000L, 0L)
    val got = d.sdf.withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("v")).over(w))
      .orderBy("ts").collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Double]("s"))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 3.0), (2L, 6.0)))
  }

  test("theta set algebra is exact below 2^lgK: union/intersection/difference") {
    // A = {1..600}, B = {401..1000}: |A∪B|=1000, |A∩B|=200, |A\B|=400
    val rows = (1 to 600).map(i => Row("A", i.toLong)) ++
      (401 to 1000).map(i => Row("B", i.toLong))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("g", StringType), StructField("v", LongType))))
    val sk = Sketches.thetaSketches(d, Seq("g"), "v")
    assert(sk.sdf.collect().map(r =>
      r.getAs[String]("g") -> r.getAs[Long]("n_exact")).toMap ==
      Map("A" -> 600L, "B" -> 600L))
    val o = Sketches.thetaOverlap(sk, "g", "A", "B").sdf.head
    assert(o.getAs[Long]("n_union") == 1000L)
    assert(o.getAs[Long]("n_intersect") == 200L)
    assert(o.getAs[Long]("n_only_a") == 400L)
  }

  test("KLL merged quantiles land within the rank-error band") {
    val rows = (1 to 2000).map(i => Row(s"g${i % 4}", i.toLong))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("g", StringType), StructField("v", LongType))))
    val q = Sketches.kllMergedQuantiles(
      Sketches.kllSketches(d, Seq("g"), "v"), Seq(0.25, 0.5, 0.75))
      .sdf.collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    for ((p, est) <- q)
      assert(math.abs(est - p * 2000) <= 0.03 * 2000,
        s"p=$p est=$est")
  }

  test("approxTopKCombined is exact under maxItemsTracked and merges groups") {
    val rows = (1 to 300).map { i =>
      val item = if (i % 6 == 0) "rare" else if (i % 2 == 0) "big" else "mid"
      Row(s"part${i % 5}", item)
    }
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("g", StringType), StructField("item", StringType))))
    val got = Sketches.approxTopKCombined(d, Seq("g"), "item", k = 2)
      .sdf.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(-_._2).toSeq
    val exact = Seq("big", "mid", "rare")
      .map(it => it -> (1 to 300).count { i =>
        (if (i % 6 == 0) "rare" else if (i % 2 == 0) "big" else "mid") == it
      }.toLong).sortBy(-_._2).take(2)
    assert(got == exact)
  }

  test("sketch queries run end-to-end on sf0.001 with invariants true") {
    val r = graft.queries.SketchQueries.defs("q234_hll_sketch_union")(spark, sf)
      .collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Boolean]("within_tol")), "estimate out of tolerance")
    val n = graft.queries.SketchQueries.defs("q235_rolling_time")(spark, sf).count()
    assert(n > 0)
  }
}
