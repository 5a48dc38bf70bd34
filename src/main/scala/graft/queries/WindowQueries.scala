package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** Window functions + TPC-H-style composites (SURVEY.md §2.10 extension —
  * the reference has no windows; these are the Spark-native analytics the
  * north star asks for). q48–q53. */
object WindowQueries {

  val defs: Map[String, Q] = Map(
    // ---- ranking window: top-3 per group, no global sort ----
    "q48_window_rank" -> ((s, dir) => {
      // two-phase top-k: priority has only 5 values, so a single
      // partitionBy(priority) window serializes onto ≤5 reducers. Phase 1
      // takes per-(input-partition, priority) top-3 in parallel — a few
      // hundred survivors — phase 2 ranks those exactly. Same result,
      // no skewed global sort; this is the skew-safe pattern for
      // low-cardinality grouped top-k at scale.
      val o = T(s, dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice").sdf
      val w1 = Window.partitionBy("o_orderpriority", "__pid")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val local = o.withColumn("__pid", spark_partition_id())
        .withColumn("rn1", row_number().over(w1))
        .where(col("rn1") <= 3).drop("__pid", "rn1")
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      new graft.api.Df(local.withColumn("rn", row_number().over(w)))
        .where(col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .sortValues(Seq("o_orderpriority", "rn")).sdf
    }),

    // ---- running (cumulative) sum per key; decimal-exact so engines'
    // window accumulation strategies can't diverge ----
    "q49_running_sum" -> ((s, dir) => {
      val e = events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.where(e("user_id") < 20)
        .assign("running_value",
          sum(col("value").cast("decimal(18,4)")).over(w).cast("double"))
        .select("user_id", "event_id", "running_value")
        .sortValues(Seq("user_id", "event_id")).sdf
    }),

    // ---- lag/lead analytics ----
    "q50_window_lag" -> ((s, dir) => {
      val e = events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts")
      e.where(e("user_id") < 20)
        .assign("prev_value", lag(col("value"), 1).over(w))
        .assign("delta", col("value") - col("prev_value"))
        .select("user_id", "event_id", "value", "prev_value", "delta")
        .sortValues(Seq("user_id", "event_id")).sdf
    }),

    // ---- rolling mean over 3 rows (reference has no rolling; §2.10) ----
    "q51_rolling_mean" -> ((s, dir) => {
      val e = events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-2, 0)
      e.where(e("user_id") < 20)
        .assign("rolling_mean",
          (sum(col("value").cast("decimal(18,4)")).over(w).cast("double") /
            count(col("value")).over(w)))
        .select("user_id", "event_id", "rolling_mean")
        .sortValues(Seq("user_id", "event_id")).sdf
    }),

    // ---- TPC-H Q3 shape: 3-way join → agg → top-k ----
    "q52_top_revenue" -> ((s, dir) => {
      val c0 = T(s, dir, "customer")
      val c = c0.where(c0("c_mktsegment") === "BUILDING")
        .select("c_custkey").rename(Map("c_custkey" -> "o_custkey"))
      val o = T(s, dir, "orders").merge(c, on = Seq("o_custkey"), how = "inner")
        .select("o_orderkey", "o_orderdate").rename(Map("o_orderkey" -> "l_orderkey"))
      T(s, dir, "lineitem")
        .merge(o, on = Seq("l_orderkey"), how = "inner")
        .groupby("l_orderkey", "o_orderdate")
        .agg(decSum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .nlargest(10, Seq("revenue", "l_orderkey")).sdf
    }),

    // ---- TPC-H Q5 shape: snowflake join chain → agg per nation ----
    "q53_nation_revenue" -> ((s, dir) => {
      val n = T(s, dir, "nation").broadcastHint
      val c = T(s, dir, "customer")
        .merge(n.rename(Map("n_nationkey" -> "c_nationkey")), on = Seq("c_nationkey"), how = "inner")
        .select("c_custkey", "n_name").rename(Map("c_custkey" -> "o_custkey"))
      val o = T(s, dir, "orders")
        .merge(c, on = Seq("o_custkey"), how = "inner")
        .select("o_orderkey", "n_name").rename(Map("o_orderkey" -> "l_orderkey"))
      T(s, dir, "lineitem")
        .merge(o, on = Seq("l_orderkey"), how = "inner")
        .groupby("n_name")
        .agg(decSum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n_items"))
        .sortValues(Seq("n_name")).sdf
    }))

  val oracles: Map[String, String] = Map(
    "q48_window_rank" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |SELECT o_orderpriority, o_orderkey, o_totalprice,
        |ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q49_running_sum" ->
      """SELECT user_id, event_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id
        |  ORDER BY ts::TIMESTAMP ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS running_value
        |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,
    "q50_window_lag" ->
      """SELECT user_id, event_id, value,
        |LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP) AS prev_value,
        |value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP) AS delta
        |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,
    "q51_rolling_mean" ->
      """SELECT user_id, event_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) /
        |COUNT(value) OVER w AS rolling_mean
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q52_top_revenue" ->
      """SELECT l_orderkey, o_orderdate,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey DESC LIMIT 10""".stripMargin,
    "q53_nation_revenue" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
}
