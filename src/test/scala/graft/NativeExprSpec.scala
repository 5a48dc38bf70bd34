package graft

import graft.api.Df
import graft.functions.VectorFunctions
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expression specs: graft_cosine must be bit-identical
  * to the higher-order-function formulation and participate in codegen. */
class NativeExprSpec extends AnyFunSuite {
  import TestSpark._

  test("graft_cosine equals the HOF cosine bit-for-bit") {
    GraftFunctions.register(spark)
    val e = Df.readParquet(spark, s"$sf/embeddings.parquet").sdf
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .where(col("id_a") < 30)
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      .where(col("id_b") < 30)
    val pairs = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("native", expr("graft_cosine(va, vb)"))
      .withColumn("hof", VectorFunctions.cosine(col("va"), col("vb")))
    val diff = pairs.where(col("native") =!= col("hof")).count()
    assert(diff == 0)
    assert(pairs.count() == 30 * 29 / 2)
  }

  test("graft_cosine handles nulls and stays in a codegen stage") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c, " +
        "graft_cosine(NULL, array(CAST(1.0 AS FLOAT))) AS n").collect()(0)
    assert(r.getDouble(0) == 0.0)
    assert(r.isNullAt(1))
  }

  test("SparkSessionExtensions wiring registers the function") {
    val s2 = TestSpark.spark.newSession()
    new graft.plans.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
    // direct registry path (what the extensions hook installs per session)
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT graft_cosine(array(CAST(3.0 AS FLOAT)), array(CAST(4.0 AS FLOAT)))")
      .collect()(0).getDouble(0) == 1.0)
  }
}
