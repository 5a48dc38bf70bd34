package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** Breadth-coverage batch: analytic window battery, string/datetime
  * accessors, set ops, grouping sets. q74–q78. */
object CoverageQueries {

  val defs: Map[String, Q] = Map(
    // ---- analytic window battery: ntile / percent_rank / cume_dist ----
    "q74_window_suite" -> ((s, dir) => {
      // ntile/percent_rank/cume_dist re-derived from (rn, n) — the
      // (o_totalprice DESC, o_orderkey) order is TOTAL, so rank = rn
      // and the whole analytic battery is scan-cumcount + transform-
      // count + integer arithmetic, with no 5-value-key window (the
      // window form serializes onto <=5 tasks at any scale). The
      // ntile bucketing replays SQL's definition exactly: the first
      // n%4 buckets take ceil(n/4) rows, the rest floor(n/4)
      import graft.operators.GroupedScan
      val o = T(s, dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
      val d = o.groupby("o_orderpriority")
        .scanScalableOrdered(
          Seq("o_totalprice" -> false, "o_orderkey" -> true),
          Seq(GroupedScan.CumCount("__rn0")))
        .groupby("o_orderpriority")
        .transform("__n" -> count(lit(1)))
      new graft.api.Df(d.sdf
        .withColumn("__rn", (col("__rn0") + 1).cast("long"))
        .withColumn("tile", expr(
          """CAST(CASE WHEN __rn <= (__n % 4) * (__n div 4 + 1)
            |  THEN (__rn - 1) div (__n div 4 + 1) + 1
            |  ELSE __n % 4 + (__rn - (__n % 4) * (__n div 4 + 1) - 1)
            |       div (__n div 4) + 1 END AS INT)""".stripMargin))
        .withColumn("pr", round(when(col("__n") === 1, lit(0.0))
          .otherwise((col("__rn") - 1).cast("double") /
            (col("__n") - 1).cast("double")), 6))
        .withColumn("cd", round(
          col("__rn").cast("double") / col("__n").cast("double"), 6))
        .drop("__rn0", "__rn", "__n"))
        .where(col("o_orderkey") % 50 === 0)
        .sortValues(Seq("o_orderpriority", "o_orderkey")).sdf
    }),

    // ---- str accessor battery (upper/len/substr/concat/zfill) ----
    "q75_string_ops" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      c.assign("name_upper", c("c_name").str.upper)
        .assign("name_len", c("c_name").str.len)
        .assign("name_head", c("c_name").str.slice(0, 8))
        .assign("key_padded", c("c_custkey").astype("string").str.zfill(8))
        .select("c_custkey", "name_upper", "name_len", "name_head", "key_padded")
        .sortValues(Seq("c_custkey")).sdf
    }),

    // ---- dt accessor battery (year/month/day/quarter + trunc) ----
    "q76_datetime_ops" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      o.assign("y", o("o_orderdate").dt.year)
        .assign("m", o("o_orderdate").dt.month)
        .assign("d", o("o_orderdate").dt.day)
        .assign("month_start", o("o_orderdate").dt.floor("month"))
        .groupby("y", "m")
        .agg(count(lit(1)).as("n"),
             min(col("d")).as("first_day"),
             min(col("month_start")).as("month_start"))
        .sortValues(Seq("y", "m")).sdf
    }),

    // ---- set ops: intersect / except (SQL set semantics) ----
    "q77_setops" -> ((s, dir) => {
      val custNations = T(s, dir, "customer").selectExpr("c_nationkey AS k")
      val suppNations = T(s, dir, "supplier").selectExpr("s_nationkey AS k")
      val both = custNations.intersect(suppNations).assign("which", lit("both"))
      val custOnly = custNations.except(suppNations).assign("which", lit("cust_only"))
      graft.api.Df.concat(Seq(both, custOnly))
        .sortValues(Seq("which", "k")).sdf
    }),

    // ---- grouping sets: cube with subtotal rows ----
    "q78_cube" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .cube(Seq("l_returnflag", "l_linestatus"))(
          decSum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .sortValues(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first).sdf
    }))

  val defs2: Map[String, Q] = Map(
    // ---- pandas groupby.transform: group aggregate repeated onto the
    // rows — GroupedDf.transform (hash agg + AQE-broadcast join back),
    // NOT a whole-partition window: the 3-value key would serialize a
    // window into 3 tasks at any scale ----
    "q79_groupby_transform" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .groupby("l_returnflag")
        .transform("group_mean" ->
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(col("l_quantity"))))
        .assign("diff_from_mean", col("l_quantity") - col("group_mean"))
        .select("l_orderkey", "l_linenumber", "diff_from_mean")
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }),

    // ---- pandas pct_change over explicit order ----
    "q80_pct_change" -> ((s, dir) => {
      val e = events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts")
      e.where(e("user_id") < 10)
        .assign("pct_change", col("value") / lag(col("value"), 1).over(w) - 1)
        .select("user_id", "event_id", "pct_change")
        .sortValues(Seq("user_id", "event_id")).sdf
    }),

    // ---- pandas groupby.filter: keep rows of qualifying groups ----
    "q81_groupby_filter" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val busy = o.groupby("o_custkey").size()
      val keys = busy.where(col("size") >= 15).select("o_custkey")
      o.semiJoin(keys, Seq("o_custkey"))
        .select("o_orderkey", "o_custkey")
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- pandas groupby.cumcount + groupby.head(n): grouped windows,
    // one shuffle on the keys ----
    "q98_group_cumcount_head" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      o.select("o_orderkey", "o_custkey", "o_totalprice")
        .groupby("o_custkey")
        .cumcount(Seq("o_orderkey"), out = "nth")
        .groupby("o_custkey")
        .headPerGroup(3, Seq("o_orderkey"))
        .select("o_custkey", "o_orderkey", "nth", "o_totalprice")
        .sortValues(Seq("o_custkey", "o_orderkey")).sdf
    }),

    // ---- per-group idxmax (deterministic struct ordering) ----
    "q83_groupby_idxmax" -> ((s, dir) => {
      T(s, dir, "orders").groupby("o_orderpriority").agg(
        expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("idxmax_order"),
        max(col("o_totalprice")).as("max_price"))
        .sortValues(Seq("o_orderpriority")).sdf
    }),

    // ---- per-group exact distinct counts ----
    "q84_groupby_nunique" -> ((s, dir) => {
      T(s, dir, "lineitem").groupby("l_returnflag").agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))
        .sortValues(Seq("l_returnflag")).sdf
    }),

    // ---- categorical protocol (`_categorical.py:39-76`): eager
    // as_known dictionary, remove (values null out, codes compact),
    // rename (relabels dictionary AND data, codes stable) ----
    "q86_categorical" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val cat = o("o_orderpriority").cat.asKnown
        .removeCategories(Seq("1-URGENT"))
        .renameCategories(Map("3-MEDIUM" -> "MED"))
      o.assign("prio", cat.values)
        .assign("code", cat.codes)
        .groupby("prio", "code")
        .agg(count(lit(1)).as("n"))
        .sortValues(Seq("code")).sdf
    }),

    // ---- extended .str/.dt accessor battery: quarter/dayofyear/
    // ISO week/leap-year/days-in-month; capitalize/extract/isdigit/
    // char-count — every leg an engine-portable expression ----
    "q95_accessor_battery" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      o.assign("q", o("o_orderdate").dt.quarter)
        .assign("doy", o("o_orderdate").dt.dayofyear)
        .assign("woy", o("o_orderdate").dt.weekofyear)
        .assign("leap", o("o_orderdate").dt.isLeapYear)
        .assign("dim", o("o_orderdate").dt.daysInMonth)
        .assign("prio_cap", o("o_orderpriority").str.capitalize)
        .assign("prio_num", o("o_orderpriority").str.extract("^([0-9]+)", 1))
        .assign("num_is_digit",
          o("o_orderpriority").str.extract("^([0-9]+)", 1).str.isdigit)
        .assign("n_e", o("o_orderpriority").str.countChar("E"))
        .select("o_orderkey", "q", "doy", "woy", "leap", "dim",
          "prio_cap", "prio_num", "num_is_digit", "n_e")
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- tumbling windows (the core streaming aggregation shape, run
    // on the bounded batch): window(ts, 1h) ≡ DuckDB time_bucket ----
    "q96_tumbling_windows" -> ((s, dir) => {
      val e = events(s, dir)
      e.sdf.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .select(col("w.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("win_start", "event_type")
    }),

    // ---- sliding windows (1h length, 30m slide — each event lands in
    // exactly 2 windows); oracle replays the expansion with a 2-row
    // VALUES cross join ----
    "q97_sliding_windows" -> ((s, dir) => {
      val e = events(s, dir)
      e.where(e("user_id") < 50).sdf
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"))
        .orderBy("win_start", "event_type")
    }),

    // ---- session windows (the streaming operator, run on the bounded
    // batch): events < gap apart merge; window end = last event + gap.
    // Oracle = classic gaps-and-islands SQL, so the exact Spark
    // session-merge semantics (new session when diff >= gap, since the
    // window end is exclusive) are cross-checked engine-to-engine ----
    "q90_session_windows" -> ((s, dir) => {
      val e = events(s, dir)
      e.where(e("user_id") < 20).sdf
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
        .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
          col("user_id"), col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start")
    }),

    // ---- _Align (`_expr.py:958-978`): both aligned sides re-joined on
    // the shared key set — the result replays as one FULL OUTER JOIN in
    // SQL, closing the last §2.2 corner without a DuckDB oracle ----
    "q100_align" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val a = c.where(col("c_custkey") <= 300)
        .select("c_custkey", "c_acctbal").setIndex("c_custkey")
      val b = c.where(col("c_custkey") >= 200).where(col("c_custkey") <= 500)
        .select("c_custkey", "c_name").setIndex("c_custkey")
      val (l, r) = a.align(b)
      l.merge(r, on = Seq("c_custkey"))
        .sortValues(Seq("c_custkey")).sdf
    }),

    // ---- ToFrameIndex + RenameAxis riding one query: series → frame
    // with its index carried, index column renamed ----
    "q101_series_frame" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      o("o_totalprice").toFrameWithIndex("o_orderkey", "price")
        .renameAxis("okey")
        .where(col("okey") <= 500)
        .sortValues(Seq("okey")).sdf
    }),

    // ---- per-partition Lengths: the partitioning itself isn't oracle-
    // able (it's an execution detail), but its INVARIANT is: the block
    // lengths must sum to exactly COUNT(*) — empty partitions included ----
    "q102_partition_lengths" -> ((s, dir) => {
      T(s, dir, "lineitem").partitionLengths.sdf
        .agg(sum(col("length")).as("total_rows"))
    }),

    // ---- MemoryUsage: schema-width estimate × row count. Types are
    // pinned by CAST so the per-row width is exactly 24 bytes (3×8) on
    // any input schema — the oracle replays width × COUNT(*) ----
    "q103_memory_usage" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .selectExpr("CAST(l_orderkey AS BIGINT) AS k1",
          "CAST(l_partkey AS BIGINT) AS k2",
          "CAST(l_quantity AS DOUBLE) AS q")
        .memoryUsage.sdf
    }),

    // ---- time-range window: trailing 1-hour sum per user ----
    "q82_range_window" -> ((s, dir) => {
      val e = events(s, dir)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600, 0)
      e.where(e("user_id") < 10)
        .assign("hour_sum",
          sum(col("value").cast("decimal(18,4)")).over(w).cast("double"))
        .select("user_id", "event_id", "hour_sum")
        .sortValues(Seq("user_id", "event_id")).sdf
    }),

    // ---- pandas mask-verb semantics at the gate: isin/between are
    // TOTAL masks (missing -> false; isin-with-null matches missing),
    // materialized as columns so the oracle checks the null path the
    // all-non-null testdata never draws (nullif manufactures it) ----
    "q262_mask_semantics" -> ((s, dir) => {
      val d = new graft.api.Df(T(s, dir, "lineitem").sdf
        .withColumn("rf", expr("nullif(l_returnflag, 'N')"))
        .withColumn("qty", expr("nullif(l_quantity, 25.0)")))
      d.assign("in_flag", d("rf").isin("A", "R"))
        .assign("in_flag_or_missing", d("rf").isin("A", null))
        .assign("in_band", d("qty").between(10, 20))
        .where(col("l_orderkey") % 25 === 0)
        .select("l_orderkey", "l_linenumber", "in_flag",
          "in_flag_or_missing", "in_band")
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }))

  val oracles2: Map[String, String] = Map(
    "q262_mask_semantics" ->
      """SELECT l_orderkey, l_linenumber,
        |COALESCE(nullif(l_returnflag, 'N') IN ('A','R'), false) AS in_flag,
        |(COALESCE(nullif(l_returnflag, 'N') IN ('A'), false)
        |  OR nullif(l_returnflag, 'N') IS NULL) AS in_flag_or_missing,
        |COALESCE(nullif(l_quantity, 25.0) BETWEEN 10 AND 20, false) AS in_band
        |FROM lineitem WHERE l_orderkey % 25 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q100_align" ->
      """SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
        |a.c_acctbal, b.c_name
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 300) a
        |FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer
        |  WHERE c_custkey BETWEEN 200 AND 500) b
        |USING (c_custkey) ORDER BY c_custkey""".stripMargin,
    "q101_series_frame" ->
      """SELECT o_orderkey AS okey, o_totalprice AS price
        |FROM orders WHERE o_orderkey <= 500 ORDER BY okey""".stripMargin,
    "q102_partition_lengths" ->
      "SELECT COUNT(*) AS total_rows FROM lineitem",
    "q103_memory_usage" ->
      "SELECT COUNT(*) * 24 AS est_bytes FROM lineitem",
    "q79_groupby_transform" ->
      """SELECT l_orderkey, l_linenumber,
        |l_quantity - (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |  / COUNT(l_quantity) OVER w) AS diff_from_mean
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q80_pct_change" ->
      """SELECT user_id, event_id,
        |value / LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP) - 1 AS pct_change
        |FROM events WHERE user_id < 10 ORDER BY user_id, event_id""".stripMargin,
    "q81_groupby_filter" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (
        |SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15)
        |ORDER BY o_orderkey""".stripMargin,
    "q83_groupby_idxmax" ->
      """SELECT o_orderpriority, idxmax_order, max_price FROM (
        |SELECT o_orderpriority, o_orderkey AS idxmax_order, o_totalprice,
        |MAX(o_totalprice) OVER (PARTITION BY o_orderpriority) AS max_price,
        |ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |FROM orders) WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,
    "q84_groupby_nunique" ->
      """SELECT l_returnflag,
        |COUNT(DISTINCT l_orderkey) AS n_orders,
        |COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q82_range_window" ->
      """SELECT user_id, event_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id
        |  ORDER BY EPOCH(ts::TIMESTAMP)::BIGINT
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |FROM events WHERE user_id < 10 ORDER BY user_id, event_id""".stripMargin,
    "q98_group_cumcount_head" ->
      """SELECT o_custkey, o_orderkey, nth, o_totalprice FROM (
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1)::INT AS nth
        |FROM orders)
        |WHERE nth < 3 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q97_sliding_windows" ->
      """SELECT win_start, event_type, COUNT(*) AS n FROM (
        |SELECT event_type,
        |time_bucket(INTERVAL '30 minutes', ts::TIMESTAMP)
        |  - (k.k * INTERVAL '30 minutes') AS win_start
        |FROM events, (VALUES (0), (1)) k(k)
        |WHERE user_id < 50)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q96_tumbling_windows" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS win_start,
        |event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q95_accessor_battery" ->
      """SELECT o_orderkey,
        |QUARTER(o_orderdate)::INT AS q,
        |DAYOFYEAR(o_orderdate)::INT AS doy,
        |WEEKOFYEAR(o_orderdate)::INT AS woy,
        |((YEAR(o_orderdate) % 4 = 0 AND YEAR(o_orderdate) % 100 <> 0)
        |  OR YEAR(o_orderdate) % 400 = 0) AS leap,
        |DAY(LAST_DAY(o_orderdate))::INT AS dim,
        |UPPER(SUBSTR(o_orderpriority, 1, 1)) || LOWER(SUBSTR(o_orderpriority, 2)) AS prio_cap,
        |REGEXP_EXTRACT(o_orderpriority, '^([0-9]+)', 1) AS prio_num,
        |REGEXP_MATCHES(REGEXP_EXTRACT(o_orderpriority, '^([0-9]+)', 1), '^[\p{Nd}]+$') AS num_is_digit,
        |(LENGTH(o_orderpriority) - LENGTH(REPLACE(o_orderpriority, 'E', '')))::INT AS n_e
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q90_session_windows" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value
        |  FROM events WHERE user_id < 20),
        |flags AS (SELECT user_id, ts, value,
        |  CASE WHEN LAG(ts) OVER w IS NULL
        |       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |  THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (SELECT user_id, ts, value,
        |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT MIN(ts) AS session_start,
        |MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |user_id, COUNT(*) AS n_events,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q86_categorical" ->
      """WITH d2 AS (
        |SELECT o_orderpriority AS cat0,
        |(DENSE_RANK() OVER (ORDER BY o_orderpriority) - 1)::INT AS code
        |FROM (SELECT DISTINCT o_orderpriority FROM orders
        |      WHERE o_orderpriority <> '1-URGENT')),
        |d3 AS (SELECT cat0,
        |CASE WHEN cat0 = '3-MEDIUM' THEN 'MED' ELSE cat0 END AS cat, code
        |FROM d2)
        |SELECT d3.cat AS prio, COALESCE(d3.code, -1)::INT AS code,
        |COUNT(*) AS n
        |FROM orders o LEFT JOIN d3 ON o.o_orderpriority = d3.cat0
        |GROUP BY 1, 2 ORDER BY code""".stripMargin)

  val oracles: Map[String, String] = Map(
    "q74_window_suite" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, tile, pr, cd FROM (
        |SELECT o_orderpriority, o_orderkey, o_totalprice,
        |NTILE(4) OVER w AS tile,
        |ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        |ROUND(CUME_DIST() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE o_orderkey % 50 = 0 ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q75_string_ops" ->
      """SELECT c_custkey, UPPER(c_name) AS name_upper,
        |LENGTH(c_name) AS name_len,
        |SUBSTR(c_name, 1, 8) AS name_head,
        |LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q76_datetime_ops" ->
      """SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
        |CAST(MONTH(o_orderdate) AS INT) AS m,
        |COUNT(*) AS n,
        |CAST(MIN(DAY(o_orderdate)) AS INT) AS first_day,
        |MIN(DATE_TRUNC('month', o_orderdate))::TIMESTAMP AS month_start
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "q77_setops" ->
      """SELECT k, which FROM (
        |SELECT k, 'both' AS which FROM
        |(SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT k, 'cust_only' AS which FROM
        |(SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier))
        |ORDER BY which, k""".stripMargin,
    "q78_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
}
