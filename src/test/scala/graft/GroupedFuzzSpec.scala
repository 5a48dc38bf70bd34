package graft

import graft.api.Df
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the grouped transform battery (cumsum/cummax/
  * cummin/cumcount/shift/rank — the q247 family) vs a brute in-memory
  * model: group rows per key, sort by the explicit order keys, and
  * replay each transform as the pandas docs define it. Random frames
  * draw duplicate order-key collisions ON PURPOSE (the window-frame
  * tie behavior — RANGE vs ROWS — is the classic silent divergence;
  * a unique tiebreak column keeps expectations deterministic). */
class GroupedFuzzSpec extends AnyFunSuite {
  import TestSpark._

  // GRAFT_FUZZ_TRIALS multiplies the per-test draw count for one-off
  // robustness sweeps (unset -> 1, the committed default)
  private val trialMult = sys.env.get("GRAFT_FUZZ_TRIALS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1)
  private def trials[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit = {
    var s = org.scalacheck.rng.Seed(90210L)
    (0 until n * trialMult).foreach { _ =>
      g.apply(org.scalacheck.Gen.Parameters.default, s).foreach(body)
      s = s.next
    }
  }

  // (group 0..2, orderA 0..4 with collisions, value) + unique id tiebreak
  private case class R(id: Long, g: Int, o: Int, v: Double)

  private val rows: Gen[List[R]] =
    Gen.choose(0, 40).flatMap { n =>
      // coarse value domain (half-integers in [-3, 3]) so rank's tie
      // paths and cummax plateaus are actually drawn, not theoretical
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 4),
        Gen.choose(-6, 6).map(_ / 2.0)))
    }.map(_.zipWithIndex.map { case ((g, o, v), i) => R(i.toLong, g, o, v) })

  private def mkDf(xs: List[R]): Df =
    Df.fromRows(spark, xs.map(r => Row(r.id, r.g, r.o, r.v)),
      StructType(Seq(StructField("id", LongType), StructField("g", IntegerType),
        StructField("o", IntegerType), StructField("v", DoubleType))))

  /** per-group rows sorted by (o, id) — the total order the queries use */
  private def sorted(xs: List[R]): Map[Int, List[R]] =
    xs.groupBy(_.g).view.mapValues(_.sortBy(r => (r.o, r.id))).toMap

  test("cumsum/cummax/cummin match the running fold over the sorted group") {
    trials(rows, n = 15) { xs =>
      val d = mkDf(xs)
      val out = d.groupby("g")
        .cumsum("v", Seq("o", "id"), out = "cs")
        .groupby("g").cummax("v", Seq("o", "id"), out = "cx")
        .groupby("g").cummin("v", Seq("o", "id"), out = "cn")
        .sdf.select("id", "cs", "cx", "cn").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      sorted(xs).values.foreach { grp =>
        grp.inits.toList.reverse.drop(1).foreach { prefix =>
          val id = prefix.last.id
          val vs = prefix.map(_.v)
          val (cs, cx, cn) = out(id)
          assert(math.abs(cs - vs.sum) < 1e-9, s"cumsum id=$id")
          assert(cx == vs.max, s"cummax id=$id")
          assert(cn == vs.min, s"cummin id=$id")
        }
      }
    }
  }

  test("shift(+/-k) matches the sorted group's offset row; edges null") {
    trials(Gen.zip(rows, Gen.oneOf(1, 2, -1, -3)), n = 15) { case (xs, k) =>
      val d = mkDf(xs)
      val out = d.groupby("g").shift("v", Seq("o", "id"), periods = k, out = "sh")
        .sdf.select("id", "sh").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      sorted(xs).values.foreach { grp =>
        grp.indices.foreach { i =>
          val want = if (i - k >= 0 && i - k < grp.size) Some(grp(i - k).v) else None
          assert(out(grp(i).id) == want, s"shift($k) id=${grp(i).id}")
        }
      }
    }
  }

  test("cumcount matches 0-based position in the sorted group") {
    trials(rows, n = 12) { xs =>
      val d = mkDf(xs)
      val out = d.groupby("g").cumcount(Seq("o", "id"), out = "cc")
        .sdf.select("id", "cc").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      sorted(xs).values.foreach { grp =>
        grp.indices.foreach { i =>
          assert(out(grp(i).id) == i, s"cumcount id=${grp(i).id}")
        }
      }
    }
  }

  test("rank min/dense/first match the pandas definitions incl. ties") {
    trials(rows, n = 15) { xs =>
      val d = mkDf(xs)
      val out = d.groupby("g").rank("v", out = "rmin", method = "min")
        .groupby("g").rank("v", out = "rd", method = "dense")
        .groupby("g").rank("v", out = "rf", method = "first", tieBreak = Seq("id"))
        .sdf.select("id", "rmin", "rd", "rf").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
      xs.groupBy(_.g).values.foreach { grp =>
        val vs = grp.map(_.v).sorted
        val distinct = vs.distinct
        grp.foreach { r =>
          val (rmin, rd, rf) = out(r.id)
          assert(rmin == vs.indexOf(r.v) + 1, s"rank-min id=${r.id}")
          assert(rd == distinct.indexOf(r.v) + 1, s"rank-dense id=${r.id}")
          // first: position among (v, id)-sorted rows
          val firstOrder = grp.sortBy(x => (x.v, x.id)).map(_.id)
          assert(rf == firstOrder.indexOf(r.id) + 1, s"rank-first id=${r.id}")
        }
      }
    }
  }

  test("cumsum over duplicate order keys is per-ROW, not per-RANGE") {
    // two rows with the SAME order key in one group: a RANGE frame
    // would give both the same running sum; pandas (and the ROWS
    // frame) gives strictly increasing prefixes along the tiebreak
    val xs = List(R(0, 1, 7, 10.0), R(1, 1, 7, 5.0), R(2, 1, 8, 1.0))
    val d = mkDf(xs)
    val got = d.groupby("g").cumsum("v", Seq("o", "id"), out = "cs")
      .sdf.orderBy("id").select("cs").collect().map(_.getDouble(0)).toList
    assert(got == List(10.0, 15.0, 16.0))
  }
}
