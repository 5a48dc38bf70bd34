package graft

import graft.api.Df
import graft.operators.{Features, Profiling, TextAnalytics}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Target encoding, cohort retention, χ² term selection. */
class FeatureSpec extends AnyFunSuite {
  import TestSpark._

  test("targetEncodeLoo: LOO mean excludes the own row; singleton -> null") {
    val rows = Seq(Row("a", 10.0), Row("a", 20.0), Row("a", 30.0),
      Row("b", 7.0))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("c", StringType), StructField("y", DoubleType))))
    val got = Features.targetEncodeLoo(d, "c", "y", "te").sdf
      .orderBy("c", "y").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    // a@10 -> mean(20,30)=25; a@20 -> 20; a@30 -> 15; b singleton -> null
    assert(got.toSeq == Seq(Some(25.0), Some(20.0), Some(15.0), None))
  }

  test("cohortRetention: day-0 row per cohort equals cohort size; " +
    "offsets count periods") {
    def t(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:00:00")
    val rows = Seq(
      Row(1L, t(1, 5)), Row(1L, t(1, 9)), Row(1L, t(3, 1)),
      Row(2L, t(1, 7)), Row(3L, t(2, 7)), Row(3L, t(4, 7)))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("u", LongType), StructField("ts", TimestampType))))
    val got = Profiling.cohortRetention(d, "u", "ts").sdf
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1),
        r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L), ("2024-01-02", 2, 1L)))
    // week granularity: day 1 and day 3 fall in the same ISO week
    val wk = Profiling.cohortRetention(d, "u", "ts", "week").sdf
      .agg(max(col("offset"))).head.getInt(0)
    assert(wk == 0)
  }

  test("chi2Terms: a class-exclusive term dominates its class ranking") {
    // 'zzz' appears in every A doc and no B doc; shared filler elsewhere
    val rows = (1 to 12).map { i =>
      val cls = if (i <= 6) "A" else "B"
      val text = if (cls == "A") "zzz common filler" else "common filler"
      Row(i.toLong, cls, text)
    }
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("id", LongType), StructField("cls", StringType),
      StructField("text", StringType))))
    val top = TextAnalytics.chi2Terms(d, "text", "cls", "id",
      k = 2, minDf = 2L).sdf
      .where(col("cls") === "A" && col("rank") === 1).head
    assert(top.getAs[String]("term") == "zzz")
    assert(top.getAs[Double]("chi2") == 12.0) // perfect 2x2 separation: chi2 = N
  }

  test("feature queries run end-to-end on sf0.001") {
    for ((name, q) <- graft.queries.FeatureQueries.defs)
      assert(q(spark, sf).count() > 0, s"$name returned no rows")
  }

  test("resampleGapfill emits zero rows for empty bins, exact sums elsewhere") {
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    val rows = Seq(Row(t(1), 1.5), Row(t(1), 2.5), Row(t(4), 10.0))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("ts", TimestampType), StructField("value", DoubleType))))
    val got = graft.operators.TimeSeries.resampleGapfill(d, "ts", "value")
      .sdf.orderBy("bin").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
        r.getDouble(2))).toSeq
    assert(got == Seq(("2024-01-01", 2L, 4.0), ("2024-01-02", 0L, 0.0),
      ("2024-01-03", 0L, 0.0), ("2024-01-04", 1L, 10.0)))
  }

  test("interpolateByTime: interior lerp by time, trailing ffill, leading null") {
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val rows = Seq(
      Row("k", t(0), null),                          // leading -> null
      Row("k", t(10), java.lang.Double.valueOf(10.0)),
      Row("k", t(20), null),                         // 1/3 of the way 10->40
      Row("k", t(40), java.lang.Double.valueOf(40.0)),
      Row("k", t(50), null))                         // trailing -> 40
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("k", StringType), StructField("ts", TimestampType),
      StructField("v", DoubleType))))
    val got = graft.operators.TimeSeries
      .interpolateByTime(d, "v", "ts", Seq("k"), "vi")
      .sdf.orderBy("ts").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3))).toSeq
    assert(got == Seq(None, Some(10.0), Some(20.0), Some(40.0), Some(40.0)))
  }

  test("time-series queries run end-to-end on sf0.001") {
    for ((name, q) <- graft.queries.TimeSeriesQueries.defs)
      assert(q(spark, sf).count() > 0, s"$name returned no rows")
  }

  test("grouped transforms: cummax/shift/rank match hand expectations") {
    val rows = Seq(Row("g", 1L, 5.0), Row("g", 2L, 3.0), Row("g", 3L, 7.0),
      Row("h", 1L, 2.0))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("k", StringType), StructField("o", LongType),
      StructField("v", DoubleType))))
    val t = d.groupby("k").cummax("v", Seq("o"), "cm")
      .groupby("k").shift("v", Seq("o"), 1, "pv")
      .groupby("k").rank("v", "r", method = "min")
      .sdf.orderBy("k", "o").collect()
      .map(r => (r.getDouble(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4), r.getInt(5))).toSeq
    assert(t == Seq((5.0, -1.0, 2), (5.0, 5.0, 1), (7.0, 3.0, 3),
      (2.0, -1.0, 1)))
  }

  test("mergeValidated enforces the declared cardinality") {
    val l = Df.fromRows(spark, Seq(Row(1L, "a"), Row(1L, "b")),
      StructType(Seq(StructField("k", LongType), StructField("x", StringType))))
    val r = Df.fromRows(spark, Seq(Row(1L, "z")),
      StructType(Seq(StructField("k", LongType), StructField("y", StringType))))
    // m:1 passes (right unique), 1:m fails (left has dup keys)
    assert(l.mergeValidated(r, Seq("k"), validate = "m:1").sdf.count() == 2)
    val e = intercept[IllegalArgumentException] {
      l.mergeValidated(r, Seq("k"), validate = "1:m")
    }
    assert(e.getMessage.contains("left keys are not unique"))
  }

  test("duplicatedKeep marks the declared end; none marks whole groups") {
    val rows = Seq(Row(1L, 10.0), Row(1L, 20.0), Row(2L, 30.0))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    def flags(keep: String): Seq[Boolean] =
      d.duplicatedKeep(Seq("k"), "v", keep, "dup").sdf
        .orderBy("k", "v").collect().map(_.getBoolean(2)).toSeq
    assert(flags("first") == Seq(false, true, false))
    assert(flags("last") == Seq(true, false, false))
    assert(flags("none") == Seq(true, true, false))
  }

  test("whereValues keeps matching rows' values, maskValues inverts") {
    val d = Df.fromRows(spark, Seq(Row(1L, "a"), Row(5L, "b")),
      StructType(Seq(StructField("x", LongType), StructField("s", StringType))))
    val w = d.whereValues(col("x") > 3).sdf.orderBy("s").collect()
    assert(w(0).isNullAt(0) && w(0).isNullAt(1))       // row a nulled
    assert(w(1).getLong(0) == 5L && w(1).getString(1) == "b")
    val m = d.maskValues(col("x") > 3).sdf
      .orderBy(col("s").asc_nulls_last).collect()
    assert(m(0).getLong(0) == 1L && m(1).isNullAt(0))
  }

  test("grouped idxmax/idxmin pick the extreme row's id, min id on ties") {
    val rows = Seq(Row("g", 1L, 5.0), Row("g", 2L, 9.0), Row("g", 3L, 9.0),
      Row("h", 4L, 1.0))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("k", StringType), StructField("id", LongType),
      StructField("v", DoubleType))))
    val mx = d.groupby("k").idxmax("v", "id").sdf.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(mx == Seq(("g", 2L), ("h", 4L)))  // tie 9.0 -> smaller id 2
    val mn = d.groupby("k").idxmin("v", "id").sdf.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(mn == Seq(("g", 1L), ("h", 4L)))
  }

  test("grouped idxmax: string ids (window fallback) and Long.MinValue ids (no negation overflow)") {
    // string id: the old struct(v, -id) tiebreak was numeric-only and
    // failed analysis here; the fallback keeps "max v, min id on ties"
    val srows = Seq(Row("g", "b", 9.0), Row("g", "a", 9.0), Row("g", "c", 5.0))
    val sd = Df.fromRows(spark, srows, StructType(Seq(
      StructField("k", StringType), StructField("id", StringType),
      StructField("v", DoubleType))))
    val smx = sd.groupby("k").idxmax("v", "id").sdf.collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(smx == Seq(("g", "a")))
    // Long.MinValue id: -id overflows back to MinValue in Long math —
    // the decimal negation must still rank it ABOVE id 5 on the tie
    val lrows = Seq(Row("g", Long.MinValue, 9.0), Row("g", 5L, 9.0))
    val ld = Df.fromRows(spark, lrows, StructType(Seq(
      StructField("k", StringType), StructField("id", LongType),
      StructField("v", DoubleType))))
    val lmx = ld.groupby("k").idxmax("v", "id").sdf.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(lmx == Seq(("g", Long.MinValue)))
  }

  test("grouped idxmax: NaN Double id loses value ties to the smallest real id") {
    // NaN sorts LARGEST in Spark orderings and -NaN is still NaN, so
    // the order-reversing negation trick would pick the NaN id on value
    // ties — double ids must ride the window fallback instead
    val rows = Seq(Row("g", Double.NaN, 9.0), Row("g", 2.0, 9.0),
      Row("g", 7.0, 9.0))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("k", StringType), StructField("id", DoubleType),
      StructField("v", DoubleType))))
    val mx = d.groupby("k").idxmax("v", "id").sdf.collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(mx == Seq(("g", 2.0)), mx.toString)
  }

  test("Hilbert and Morton keys match the textbook algorithms over the full 16x16 grid") {
    // exhaustive differential: integer grid 0..15 over [0,15] bucketizes
    // to identity, so every cell's engine key must equal the reference
    // xy2d / bit-interleave computed driver-side — which also proves
    // bijectivity and the curve's adjacency structure in one shot
    val bits = 4
    val n = 1 << bits
    val rows = for (x <- 0 until n; y <- 0 until n)
      yield Row((x * n + y).toLong, x.toDouble, y.toDouble)
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType),
      StructField("y", DoubleType))))
    def xy2d(x0: Int, y0: Int): Long = { // Hilbert, standard formulation
      var (x, y) = (x0, y0); var d = 0L; var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    def morton(x: Int, y: Int): Long = // bit j of coord i -> j*2 + i
      (0 until bits).foldLeft(0L) { (acc, j) =>
        acc | (((x >> j) & 1).toLong << (j * 2)) |
          (((y >> j) & 1).toLong << (j * 2 + 1))
      }
    val h = graft.operators.Layout.withHilbertValue(d, Seq("x", "y"), bits)
      .sdf.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val z = graft.operators.Layout.withZValue(d, Seq("x", "y"), bits)
      .sdf.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { r =>
      val (id, x, y) = (r.getLong(0), r.getDouble(1).toInt, r.getDouble(2).toInt)
      assert(h(id) == xy2d(x, y), s"hilbert ($x,$y): ${h(id)} vs ${xy2d(x, y)}")
      assert(z(id) == morton(x, y), s"morton ($x,$y): ${z(id)} vs ${morton(x, y)}")
    }
    assert(h.values.toSet == (0L until n.toLong * n).toSet) // bijection
    assert(z.values.toSet == (0L until n.toLong * n).toSet)
  }

  test("seasonalResiduals: the one broken period is the one anomaly") {
    // period 3, four steady seasons then a spike in the last one:
    // residuals = eleven 0s and one 75 -> z ~= 3.17, the only |z| > 3
    val vals = Seq(10L, 20L, 30L, 10L, 20L, 30L, 10L, 20L, 30L,
      10L, 20L, 30L, 10L, 95L, 30L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      Row(new java.sql.Timestamp(1700000000000L + i * 3600000L), v)
    }
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("bin", TimestampType), StructField("n", LongType))))
    val got = graft.operators.TimeSeries
      .seasonalResiduals(d, "bin", "n", period = 3).sdf
      .orderBy("bin").collect()
    val anomalies = got.filter(r =>
      !r.isNullAt(r.fieldIndex("is_anomaly")) &&
        r.getBoolean(r.fieldIndex("is_anomaly")))
    assert(anomalies.length == 1)
    assert(anomalies.head.getAs[Long]("n") == 95L)
    // first period has no seasonal reference
    assert(got.take(3).forall(_.isNullAt(got.head.fieldIndex("z"))))
  }
}
