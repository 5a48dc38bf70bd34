package graft.queries

import org.apache.spark.sql.functions._
import QueryUtil._

/** Reductions + groupby completion suite (SURVEY.md §2.5–§2.6).
  * q30–q39. Conventions as in [[CoreQueries]]. */
object ReductionQueries {

  val defs: Map[String, Q] = Map(
    // ---- Prod (`_reductions.py:96`, groupby `_groupby.py:200`): no
    // Spark built-in — sign-aware exp(sum(log))) in GroupedDf.prod ----
    "q30_prod" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li.where(li("l_orderkey") % 100 === 0)
        .assign("m", li("l_discount") + 1)
        .select("l_orderkey", "m")
        .groupby("l_orderkey").prod()
        .selectExpr("l_orderkey", "round(m, 6) AS prod_m")
        .sortValues(Seq("l_orderkey")).sdf
    }),

    // ---- Any / All (`_reductions.py:120-139`) ----
    "q31_any_all" -> ((s, dir) => {
      T(s, dir, "lineitem").groupby("l_returnflag").agg(
        expr("bool_or(l_discount > 0.09)").as("any_high_disc"),
        expr("bool_and(l_quantity > 5)").as("all_qty_gt5"))
        .sortValues(Seq("l_returnflag")).sdf
    }),

    // ---- IdxMin / IdxMax (`_reductions.py:142-152`): min_by/max_by over
    // a composite struct key for tie-determinism ----
    "q32_idx_minmax" -> ((s, dir) => {
      T(s, dir, "lineitem").agg(
        expr("max_by(struct(l_orderkey, l_linenumber), struct(l_extendedprice, l_orderkey, l_linenumber))").as("mx"),
        expr("min_by(struct(l_orderkey, l_linenumber), struct(l_extendedprice, l_orderkey, l_linenumber))").as("mn"))
        .selectExpr(
          "mx.l_orderkey AS idxmax_orderkey", "mx.l_linenumber AS idxmax_linenumber",
          "mn.l_orderkey AS idxmin_orderkey", "mn.l_linenumber AS idxmin_linenumber").sdf
    }),

    // ---- Len / Size (`_reductions.py:155-189`): Size = ncols × Len, the
    // same rewrite the reference does (`_reductions.py:183`) ----
    "q33_len_size" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val ncols = li.columns.size
      li.len.selectExpr("len AS n_rows", s"len * $ncols AS size").sdf
    }),

    // ---- Mode with pandas all-ties semantics (`_reductions.py:242`):
    // groupBy count + keep rows at max count, sorted. The max rides a
    // broadcast 1-row aggregate, not a keyless window — the count table
    // is vocabulary-sized, but a Window.partitionBy() would still
    // funnel it through a single partition. The counts plan appears on
    // both join sides unpersisted: it is one cheap aggregate, and a
    // persist here would leak cached blocks past the (lazy) return ----
    "q34_mode" -> ((s, dir) => {
      val c = T(s, dir, "lineitem").groupby("l_quantity").size().sdf
      c.crossJoin(broadcast(c.agg(max(col("size")).as("mx"))))
        .where(col("size") === col("mx"))
        .select("l_quantity")
        .orderBy("l_quantity")
    }),

    // ---- ValueCounts normalize (`_reductions.py:288-305`) ----
    "q35_value_counts_norm" -> ((s, dir) => {
      T(s, dir, "orders").valueCounts("o_orderpriority", normalize = true)
        .sortValues(Seq("o_orderpriority")).sdf
    }),

    // ---- Unique (`_reductions.py:40`) ----
    "q36_unique" -> ((s, dir) => {
      T(s, dir, "customer").unique("c_mktsegment")
        .sortValues(Seq("c_mktsegment")).sdf
    }),

    // ---- nunique_approx (dangling in reference `_collection.py:282`) —
    // Spark HLL++; sketches differ across engines, so the oracle checks
    // the DERIVED INVARIANT |approx − exact| ≤ 4·rsd·exact (HLL++'s
    // default rsd = 0.05; 4 standard errors) plus the exact distinct
    // count itself — the estimate can't silently drift arbitrarily. ----
    "q37_nunique_approx" -> ((s, dir) => {
      T(s, dir, "orders").sdf.agg(
          approx_count_distinct(col("o_custkey")).as("approx"),
          countDistinct(col("o_custkey")).as("n_exact"))
        .select(col("n_exact"),
          (abs(col("approx") - col("n_exact")) <= lit(0.2) * col("n_exact"))
            .as("within_4rsd"))
    }),

    // ---- groupby first/last, deterministic by ts (`_groupby.py:205-212`;
    // SURVEY.md §2.6: pandas first = first by row order → min_by) ----
    "q38_groupby_first_last" -> ((s, dir) => {
      events(s, dir).groupby("event_type").agg(
        expr("min_by(value, ts)").as("first_value"),
        expr("max_by(value, ts)").as("last_value"))
        .sortValues(Seq("event_type")).sdf
    }),

    // ---- groupby size vs count null semantics (SURVEY.md §2.6) ----
    "q39_size_vs_count" -> ((s, dir) => {
      val e = events(s, dir)
      e.assign("v", when(col("value") < 50, lit(null)).otherwise(col("value")))
        .groupby("event_type").agg(
          count(lit(1)).as("size"),
          count(col("v")).as("count_v"))
        .sortValues(Seq("event_type")).sdf
    }))

  val oracles: Map[String, String] = Map(
    // q37's invariant: the HLL++ estimate must sit within 4 relative
    // standard errors of the exact count, which IS replayed
    "q37_nunique_approx" ->
      """SELECT COUNT(DISTINCT o_custkey) AS n_exact, TRUE AS within_4rsd
        |FROM orders""".stripMargin,
    "q30_prod" ->
      """SELECT l_orderkey, ROUND(PRODUCT(1 + l_discount), 6) AS prod_m
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q31_any_all" ->
      """SELECT l_returnflag, BOOL_OR(l_discount > 0.09) AS any_high_disc,
        |BOOL_AND(l_quantity > 5) AS all_qty_gt5
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q32_idx_minmax" ->
      """SELECT
        |(SELECT l_orderkey FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC LIMIT 1) AS idxmax_orderkey,
        |(SELECT l_linenumber FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC LIMIT 1) AS idxmax_linenumber,
        |(SELECT l_orderkey FROM lineitem ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC LIMIT 1) AS idxmin_orderkey,
        |(SELECT l_linenumber FROM lineitem ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC LIMIT 1) AS idxmin_linenumber""".stripMargin,
    "q33_len_size" ->
      "SELECT COUNT(*) AS n_rows, COUNT(*) * 11 AS size FROM lineitem",
    "q34_mode" ->
      """SELECT l_quantity FROM (
        |SELECT l_quantity, COUNT(*) AS cnt FROM lineitem GROUP BY l_quantity)
        |WHERE cnt = (SELECT MAX(cnt) FROM
        |(SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_quantity))
        |ORDER BY l_quantity""".stripMargin,
    "q35_value_counts_norm" ->
      """SELECT o_orderpriority,
        |COUNT(*) / (SELECT COUNT(*) FROM orders) AS proportion
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q36_unique" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q38_groupby_first_last" ->
      """SELECT event_type,
        |ARG_MIN(value, ts::TIMESTAMP) AS first_value,
        |ARG_MAX(value, ts::TIMESTAMP) AS last_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q39_size_vs_count" ->
      """SELECT event_type, COUNT(*) AS size,
        |COUNT(CASE WHEN value < 50 THEN NULL ELSE value END) AS count_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
