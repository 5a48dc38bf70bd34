package graft

import graft.api.Df
import graft.operators.Regression
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** One-pass OLS: in-plan closed form (olsFit2) vs driver Gaussian
  * solve (olsFit) vs known ground truth. */
class RegressionSpec extends AnyFunSuite {
  import TestSpark._

  // exact linear data: y = 3 + 2·x1 − 5·x2, all values ≤2dp
  private def exact: Df = {
    val rows = for (i <- 1 to 40; j <- 1 to 5) yield
      Row(i.toDouble, j.toDouble, 3.0 + 2.0 * i - 5.0 * j)
    Df.fromRows(spark, rows, StructType(Seq(
      StructField("x1", DoubleType), StructField("x2", DoubleType),
      StructField("y", DoubleType))))
  }

  test("olsFit2 recovers exact coefficients with r2 = 1") {
    val r = Regression.olsFit2(exact, "y", "x1", "x2").sdf.head
    assert(math.abs(r.getAs[Double]("b0") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b1") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b2") + 5.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("olsFit2 raises the named singular-design error, like olsFit's require") {
    // constant x2 → zero 2×2 determinant; must surface the contract
    // error, not a raw ANSI DIVIDE_BY_ZERO (or silent NaN)
    val rows = (1 to 10).map(i => Row(i.toDouble, 7.0, 2.0 * i))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("x1", DoubleType), StructField("x2", DoubleType),
      StructField("y", DoubleType))))
    val e = intercept[Exception](
      Regression.olsFit2(d, "y", "x1", "x2").sdf.collect())
    assert(e.getMessage.contains("singular design"), e.getMessage)
  }

  test("generic olsFit agrees with the closed form at k=2") {
    val li = Df.readParquet(spark, s"$sf/lineitem.parquet")
    val a = Regression.olsFit2(li, "l_extendedprice", "l_quantity",
      "l_discount").sdf.head
    val g = Regression.olsFit(li, "l_extendedprice",
      Seq("l_quantity", "l_discount")).sdf.head
    assert(math.abs(a.getAs[Double]("b0") - g.getAs[Double]("b0")) < 1e-5)
    assert(math.abs(a.getAs[Double]("b1") - g.getAs[Double]("b_l_quantity")) < 1e-5)
    assert(math.abs(a.getAs[Double]("b2") - g.getAs[Double]("b_l_discount")) < 1e-5)
    assert(math.abs(a.getAs[Double]("r2") - g.getAs[Double]("r2")) < 1e-5)
  }

  test("olsFit k=3 beats k=2 r2 on data with a third real signal") {
    val rows = for (i <- 1 to 100) yield {
      val x3 = (i % 7).toDouble
      Row(i.toDouble, (i % 3).toDouble, x3, 1.0 + i + 10.0 * x3)
    }
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("x1", DoubleType), StructField("x2", DoubleType),
      StructField("x3", DoubleType), StructField("y", DoubleType))))
    val k3 = Regression.olsFit(d, "y", Seq("x1", "x2", "x3")).sdf.head
    assert(math.abs(k3.getAs[Double]("b_x3") - 10.0) < 1e-6)
    assert(k3.getAs[Double]("r2") > 0.9999)
    val k2 = Regression.olsFit(d, "y", Seq("x1", "x2")).sdf.head
    assert(k2.getAs[Double]("r2") < k3.getAs[Double]("r2"))
  }

  test("olsFit refuses a singular design loudly") {
    val rows = (1 to 50).map(i => Row(i.toDouble, 2.0 * i, i * 3.0))
    val d = Df.fromRows(spark, rows, StructType(Seq(
      StructField("x1", DoubleType), StructField("x2", DoubleType),
      StructField("y", DoubleType))))
    intercept[IllegalArgumentException] {
      Regression.olsFit(d, "y", Seq("x1", "x2"))
    }
  }
}
