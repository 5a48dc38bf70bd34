package graft

import graft.api.Df
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Reshape/fill battery: melt, get_dummies, crosstab, ffill/bfill,
  * pct_change, qcut — hand-computed expectations on tiny frames, plus
  * plan-shape assertions (melt must be a generator, not a union of
  * scans). */
class ReshapeSpec extends AnyFunSuite {
  import TestSpark._

  private def frame(rows: Seq[Row], fields: (String, DataType)*): Df =
    Df.fromRows(spark, rows,
      StructType(fields.map { case (n, t) => StructField(n, t) }))

  test("melt produces k rows per input row and one scan (stack, not union)") {
    val d = frame(
      Seq(Row(1L, 2.0, 3.0), Row(2L, 5.0, 7.0)),
      "id" -> LongType, "a" -> DoubleType, "b" -> DoubleType)
    val m = d.melt(Seq("id"), Seq("a", "b"))
    assert(m.columns == Seq("id", "variable", "value"))
    val got = m.sdf.orderBy("id", "variable").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 2.0), (1L, "b", 3.0),
      (2L, "a", 5.0), (2L, "b", 7.0)))
    // one Generate over one scan — not a Union of per-column re-reads
    val plan = m.sdf.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"))
  }

  test("get_dummies yields 0/1 indicators for the explicit value list") {
    val d = frame(Seq(Row(1L, "x"), Row(2L, "y"), Row(3L, "z")),
      "id" -> LongType, "c" -> StringType)
    val got = d.getDummies("c", Seq("x", "y"), prefix = "c")
      .sdf.orderBy("id").collect()
      .map(r => (r.getInt(r.fieldIndex("c_x")), r.getInt(r.fieldIndex("c_y"))))
    assert(got.toSeq == Seq((1, 0), (0, 1), (0, 0)))
  }

  test("crosstab counts match a hand count") {
    val d = frame(
      Seq(Row("a", "F"), Row("a", "F"), Row("a", "O"), Row("b", "O")),
      "r" -> StringType, "c" -> StringType)
    val got = d.crosstabCount("r", "c", Seq("F", "O"))
      .sdf.orderBy("r").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 2L, 1L), ("b", 0L, 1L)))
  }

  test("ffill carries forward within partition; bfill backward") {
    val rows = Seq(
      Row("p", 1L, null), Row("p", 2L, java.lang.Double.valueOf(5.0)),
      Row("p", 3L, null), Row("p", 4L, null),
      Row("q", 1L, java.lang.Double.valueOf(1.0)), Row("q", 2L, null))
    val d = frame(rows,
      "k" -> StringType, "ord" -> LongType, "v" -> DoubleType)
    def vals(x: Df): Seq[Option[Double]] =
      x.sdf.orderBy("k", "ord").collect()
        .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    assert(vals(d.ffill(Seq("v"), Seq("ord"), Seq("k"))) ==
      Seq(None, Some(5.0), Some(5.0), Some(5.0), Some(1.0), Some(1.0)))
    assert(vals(d.bfill(Seq("v"), Seq("ord"), Seq("k"))) ==
      Seq(Some(5.0), Some(5.0), None, None, Some(1.0), None))
  }

  test("pct_change matches hand-computed ratios; first row null") {
    val d = frame(
      Seq(Row("p", 1L, 10.0), Row("p", 2L, 15.0), Row("p", 3L, 12.0)),
      "k" -> StringType, "ord" -> LongType, "v" -> DoubleType)
    val got = d.pctChange("v", Seq("ord"), "pct", partitionBy = Seq("k"))
      .sdf.orderBy("ord").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(got(0).isEmpty)
    assert(math.abs(got(1).get - 0.5) < 1e-12)
    assert(math.abs(got(2).get - (12.0 / 15.0 - 1.0)) < 1e-12)
  }

  test("qcut buckets are 0-based, exhaustive, and roughly equal") {
    val d = frame((1 to 100).map(i => Row(i.toLong, i.toDouble)),
      "id" -> LongType, "v" -> DoubleType)
    val counts = d.qcut("v", 4, "bucket").sdf
      .groupBy("bucket").count().orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(counts.map(_._1) == Seq(0, 1, 2, 3))
    assert(counts.map(_._2).sum == 100L)
    counts.foreach { case (_, n) => assert(n >= 24L && n <= 26L) }
  }

  test("jsonNormalize: one parse, same values as per-field extraction, " +
    "malformed rows null out") {
    val d = frame(
      Seq(Row(1L, """{"k": 7, "s": "x"}"""), Row(2L, """not json"""),
        Row(3L, """{"k": 9}""")),
      "id" -> LongType, "js" -> StringType)
    val got = d.jsonNormalize("js", "k BIGINT, s STRING", keep = Seq("id"))
      .sdf.orderBy("id").collect()
    assert(got.map(r => if (r.isNullAt(1)) None else Some(r.getLong(1))).toSeq ==
      Seq(Some(7L), None, Some(9L)))
    assert(got(0).getString(2) == "x" && got(2).isNullAt(2))
    // differential vs get_json_object; and the plan parses ONCE
    val viaGjo = d.sdf.select(
      get_json_object(col("js"), "$.k").cast("bigint")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got.map(r => if (r.isNullAt(1)) None else Some(r.getLong(1))).toSeq
      == viaGjo)
    val plan = d.jsonNormalize("js", "k BIGINT, s STRING", Seq("id"))
      .sdf.queryExecution.optimizedPlan.toString
    assert("from_json".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("get_json_object"), plan)
  }

  test("reshape oracle queries run end-to-end on sf0.001") {
    for ((name, q) <- graft.queries.ReshapeQueries.defs) {
      val n = q(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
