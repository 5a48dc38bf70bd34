package graft

import graft.api.Df
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: pre-shuffle once at write time, then
  * every equi-join on the bucket keys is exchange-free — the plan-level
  * proof of the 100 TB fact-join strategy. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables equi-join without a shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_buckets")
    val li = Df.readParquet(spark, s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = Df.readParquet(spark, s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .rename(Map("o_orderkey" -> "l_orderkey"))

    val bl = li.toBucketedTable("b_lineitem", Seq("l_orderkey"), 4, s"$tmp/li")
    val bo = o.toBucketedTable("b_orders", Seq("l_orderkey"), 4, s"$tmp/o")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bl.merge(bo, on = Seq("l_orderkey"), how = "inner").sdf
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("session windows merge events within gap") {
    val e = graft.queries.QueryUtil.events(spark, sf).sdf
    val sessions = graft.streaming.StreamOps.userSessions(e, "30 minutes")
    // sanity: sessions per user ≤ events per user; windows don't overlap
    val perUser = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val bad = perUser.where(col("n_sessions") > col("n_events")).count()
    assert(bad == 0)
    val u = sessions.where(col("user_id") === 0)
      .orderBy("session_start").collect()
    u.sliding(2).foreach {
      case Array(a, b) =>
        assert(!a.getTimestamp(1).after(b.getTimestamp(0))) // end_i <= start_{i+1}
      case _ =>
    }
    assert(sessions.count() > 0)
  }
}
