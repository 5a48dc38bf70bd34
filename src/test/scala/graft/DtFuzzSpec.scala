package graft

import graft.api.Df
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate
import java.time.temporal.IsoFields

/** Differential fuzz for the `.dt` accessor vs java.time (SURVEY.md §5
  * plan item c): the JDK calendar is an independent implementation of
  * the proleptic-Gregorian rules Spark 3+ uses, so per-row equality
  * over random dates (1582..2400, crossing pre-1970, century
  * non-leaps, and ISO week-year boundaries) pins every field mapping —
  * in particular the pandas Monday=0 `dayofweek` shift from Spark's
  * Sunday=1 builtin. */
class DtFuzzSpec extends AnyFunSuite {
  import TestSpark._

  // GRAFT_FUZZ_TRIALS multiplies the per-test draw count for one-off
  // robustness sweeps (unset -> 1, the committed default)
  private val trialMult = sys.env.get("GRAFT_FUZZ_TRIALS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1)
  private def trials[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit = {
    var s = org.scalacheck.rng.Seed(4242L)
    (0 until n * trialMult).foreach { _ =>
      g.apply(org.scalacheck.Gen.Parameters.default, s).foreach(body)
      s = s.next
    }
  }

  // epoch days for 1583-01-01..2400-12-31 (post-Gregorian-reform so
  // java.time and Spark agree on leap rules), leaning on year edges
  private val dates: Gen[LocalDate] = Gen.frequency(
    (6, Gen.choose(LocalDate.of(1583, 1, 1).toEpochDay,
                   LocalDate.of(2400, 12, 31).toEpochDay).map(LocalDate.ofEpochDay)),
    (2, for {
          y <- Gen.choose(1583, 2400)
          d <- Gen.oneOf(Seq((1, 1), (12, 31), (2, 28), (3, 1), (6, 30)))
        } yield LocalDate.of(y, d._1, d._2)),
    (1, Gen.oneOf(Seq(LocalDate.of(2000, 2, 29), LocalDate.of(1900, 2, 28),
                      LocalDate.of(1970, 1, 1), LocalDate.of(1969, 12, 31)))))

  private def fields(ds: List[LocalDate]): Array[Row] = {
    val d = Df.fromRows(spark, ds.map(x => Row(java.sql.Date.valueOf(x))),
      StructType(Seq(StructField("d", DateType))))
    d.assign("y", d("d").dt.year)
      .assign("m", d("d").dt.month)
      .assign("dom", d("d").dt.day)
      .assign("dow", d("d").dt.dayofweek)
      .assign("q", d("d").dt.quarter)
      .assign("doy", d("d").dt.dayofyear)
      .assign("leap", d("d").dt.isLeapYear)
      .assign("dim", d("d").dt.daysInMonth)
      .assign("woy", d("d").dt.weekofyear)
      .sdf.select("y", "m", "dom", "dow", "q", "doy", "leap", "dim", "woy")
      .collect()
  }

  test("dt fields match java.time on random proleptic-Gregorian dates") {
    trials(Gen.listOfN(40, dates), n = 15) { ds =>
      fields(ds).zip(ds).foreach { case (r, x) =>
        assert(r.getInt(0) == x.getYear, s"year($x)")
        assert(r.getInt(1) == x.getMonthValue, s"month($x)")
        assert(r.getInt(2) == x.getDayOfMonth, s"day($x)")
        // pandas convention: Monday=0..Sunday=6
        assert(r.getInt(3) == x.getDayOfWeek.getValue - 1, s"dayofweek($x)")
        assert(r.getInt(4) == (x.getMonthValue + 2) / 3, s"quarter($x)")
        assert(r.getInt(5) == x.getDayOfYear, s"dayofyear($x)")
        assert(r.getBoolean(6) == x.isLeapYear, s"isLeapYear($x)")
        assert(r.getInt(7) == x.lengthOfMonth, s"daysInMonth($x)")
        assert(r.getInt(8) == x.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR), s"weekofyear($x)")
      }
    }
  }

  test("dt.date and dt.floor(month) agree with java.time truncation") {
    trials(Gen.listOfN(30, dates), n = 8) { ds =>
      val d = Df.fromRows(spark,
        ds.map(x => Row(java.sql.Timestamp.valueOf(x.atTime(13, 47, 9)))),
        StructType(Seq(StructField("t", TimestampType))))
      val rows = d.assign("dt", d("t").dt.date)
        .assign("ms", d("t").dt.floor("month"))
        .sdf.select("dt", "ms").collect()
      rows.zip(ds).foreach { case (r, x) =>
        assert(r.getDate(0).toLocalDate == x, s"date($x)")
        assert(r.getTimestamp(1).toLocalDateTime.toLocalDate == x.withDayOfMonth(1),
          s"floor-month($x)")
        assert(r.getTimestamp(1).toLocalDateTime.toLocalTime.toSecondOfDay == 0,
          s"floor-month time($x)")
      }
    }
  }
}
