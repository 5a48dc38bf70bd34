package graft.queries

import graft.api.Df
import graft.operators.{Constraints, Curation, Linkage, TimeSeries, Upsert}
import org.apache.spark.sql.functions._
import QueryUtil._

/** Round-10 governance wave: data-quality constraint verification,
  * CDC upsert snapshots, deterministic per-group sampling, sorted-
  * neighborhood record linkage, scale-safe EWMA, and source-balanced
  * interleaved selection. q214–q219. */
object GovernanceQueries {

  val defs: Map[String, Q] = Map(

    // ---- Deequ-style constraint report: 7 constraints, ONE
    // aggregation pass, exploded to one report row each ----
    "q214_constraints" -> ((s, dir) => {
      import Constraints._
      val d = T(s, dir, "documents")
      Constraints.verify(d, Seq(
        Constraint("rows present", rowCount, _ > 0.0),
        Constraint("text complete", completeness("text"), _ === 1.0),
        Constraint("lang complete", completeness("lang"), _ === 1.0),
        Constraint("lang is iso2", matchRatio("lang", "^[a-z]{2}$"), _ === 1.0),
        Constraint("n_chars nonneg", minOf("n_chars"), _ >= 0.0),
        Constraint("n_chars bounded", maxOf("n_chars"), _ <= 1.0e6),
        Constraint("mean chars sane", meanOf("n_chars"),
          _.between(10.0, 1.0e5))))
        .sortValues(Seq("constraint")).sdf
    }),

    // ---- CDC latest-wins merge: +10% price patch on keys %3, with
    // %21 tombstoned; decimal-exact price arithmetic both engines ----
    "q215_upsert_merge" -> ((s, dir) => {
      val o = T(s, dir, "orders").sdf
      val base = new Df(o
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"), lit(1).as("version")))
      val changes = new Df(o
        .where(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * " +
            "CAST(1.1 AS DECIMAL(3,2)) AS DOUBLE)").as("o_totalprice"),
          col("o_orderpriority"), lit(2).as("version"),
          (col("o_orderkey") % 21 === 0).as("deleted")))
      Upsert.applyChanges(base, changes, Seq("o_orderkey"),
        "version", "deleted")
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- incremental JOIN maintenance: the delta-view identity —
    // new rows = ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR; old∪delta must equal the full
    // join as a MULTISET (exceptAll both ways), never recompute L⋈R ----
    "q255_incremental_join" -> ((s, dir) => {
      val o = T(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = T(s, dir, "customer")
        .rename(Map("c_custkey" -> "o_custkey"))
        .select("o_custkey", "c_mktsegment")
      val (oldL, dL) = (o.where(col("o_orderkey") % 4 =!= 0),
        o.where(col("o_orderkey") % 4 === 0))
      val (oldR, dR) = (c.where(col("o_custkey") % 5 =!= 0),
        c.where(col("o_custkey") % 5 === 0))
      val oldJoin = oldL.sdf.join(oldR.sdf, Seq("o_custkey"))
      val delta = Upsert.incrementalJoinDelta(oldL, dL, oldR, dR,
        Seq("o_custkey")).sdf
      val full = o.sdf.join(c.sdf, Seq("o_custkey"))
      val cols = full.columns.map(col).toIndexedSeq
      val maintained = oldJoin.select(cols: _*).unionAll(delta.select(cols: _*))
      val equal =
        full.exceptAll(maintained).count() == 0 &&
          maintained.exceptAll(full).count() == 0
      import s.implicits._
      Seq((oldJoin.count(), delta.count(), full.count(), equal))
        .toDF("n_old", "n_delta", "n_full", "multiset_equal")
    }),

    // ---- SCD Type-2 dimension build: validity intervals per key from
    // the change log, one lead() window pass ----
    "q256_scd2" -> ((s, dir) => {
      val hist = T(s, dir, "orders")
        .where(col("o_custkey") < 200)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      Upsert.scd2(hist, Seq("o_custkey"), "o_orderdate", "o_orderkey")
        .select("o_custkey", "o_orderkey", "valid_from", "valid_to",
          "is_current")
        .sortValues(Seq("o_custkey", "valid_from", "o_orderkey")).sdf
    }),

    // ---- deterministic reservoir-equivalent: 5 events per type by
    // md5(seed:id) permutation; WindowGroupLimit keeps per-mapper
    // state at k rows per group ----
    "q216_group_sample" -> ((s, dir) => {
      val e = events(s, dir)
      Curation.groupSample(e, Seq("event_type"), "event_id", k = 5,
        seed = 42L).sdf
        .select("event_id", "event_type", "sample_rank")
        .orderBy("event_type", "sample_rank")
    }),

    // ---- sorted-neighborhood linkage: nation-blocked, name-sorted,
    // w=2 neighbors, levenshtein ≤ 3 → candidate pairs, O(n·w) not
    // O(n²) ----
    "q217_sorted_neighborhood" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      Linkage.sortedNeighborhood(c, Seq("c_nationkey"), "c_name",
        "c_name", "c_custkey", maxDist = 3, w = 2).sdf
        .select("left_id", "right_id", "dist", "offset")
        .orderBy("right_id", "offset")
    }),

    // ---- Jaro–Winkler record linkage: the native codegen'd scorer
    // (graft.plans.JaroWinkler, DuckDB-replay semantics) over the same
    // sorted-neighborhood candidates as q217 ----
    "q257_jaro_linkage" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      Linkage.sortedNeighborhoodJaro(c, Seq("c_nationkey"), "c_name",
        "c_name", "c_custkey", minSim = 0.9, w = 2).sdf
        .select("left_id", "right_id", "sim", "offset")
        .orderBy("right_id", "offset")
    }),

    // ---- per-user EWMA of event values (alpha=.5 → power-of-two
    // weights, bit-reproducible; W=40 bounded lookback) ----
    "q218_ewma" -> ((s, dir) => {
      val e = new Df(events(s, dir).sdf.where(col("user_id") < 50))
      TimeSeries.ewmaMean(e, Seq("user_id"), Seq("ts", "event_id"),
        "value", alpha = 0.5, eps = 1e-12).sdf
        .select(col("user_id"), col("event_id"),
          round(col("ewma"), 6).as("ewma"))
        .orderBy("user_id", "event_id")
    }),

    // ---- source-balanced selection: 200-doc budget filled round-
    // robin across sources by n_chars quality ----
    "q219_interleave_select" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Curation.interleavedSelect(d, "source", "n_chars", "doc_id",
        n = 200).sdf
        .select("doc_id", "source", "n_chars", "source_rank")
        .orderBy("doc_id")
    }),

    // ---- PSI distribution drift: order prices, pre-1998 baseline vs
    // 1998+ current, 10 equi-width bins off the baseline range ----
    "q220_psi_drift" -> ((s, dir) => {
      val o = T(s, dir, "orders").sdf
      val base = new Df(o.where(year(col("o_orderdate")) < 1998))
      val cur = new Df(o.where(year(col("o_orderdate")) >= 1998))
      graft.operators.Profiling.psiDrift(base, cur, "o_totalprice",
        bins = 10)
        .sortValues(Seq("bin")).sdf
    }),

    // ---- gaps-and-islands: per-user runs of consecutive event ids —
    // the numbered-feed completeness check ----
    "q221_gap_islands" -> ((s, dir) => {
      val e = new Df(events(s, dir).sdf.where(col("user_id") < 100))
      graft.operators.Profiling.sequenceIslands(e, Seq("user_id"),
        "event_id")
        .sortValues(Seq("user_id", "island_start")).sdf
    }),

    // ---- k-fold CV assignment: 5 exact md5 residue classes; per-fold
    // count + key checksum proves the exact membership ----
    "q223_kfold" -> ((s, dir) => {
      T(s, dir, "orders")
        .kFoldSplit("o_orderkey", k = 5, seed = 42L)
        .groupby("fold")
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).cast("long").as("key_sum"))
        .sortValues(Seq("fold")).sdf
    }),

    // ---- curriculum ordering: 4 equal-mass difficulty phases over
    // n_chars, deterministic within-phase shuffle key ----
    "q224_curriculum" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      Curation.curriculumOrder(d, "n_chars", "doc_id", phases = 4,
        seed = 42L).sdf
        .select("doc_id", "phase", "curriculum_key")
        .orderBy("phase", "curriculum_key")
    }),

    // ---- golden-record survivorship: per resolved entity, the modal
    // segment/nation (ties → smallest) + member count ----
    "q225_golden_record" -> ((s, dir) => {
      val c = T(s, dir, "customer").sdf.where(col("c_custkey") < 600)
      val clustered = new Df(c.withColumn("entity",
        expr("c_custkey div 3")))
      graft.operators.Linkage.goldenRecord(clustered, "entity",
        Seq("c_mktsegment", "c_nationkey"))
        .sortValues(Seq("entity")).sdf
    }))

  val oracles: Map[String, String] = Map(

    // one scalar-agg CTE; each constraint row replays the exact
    // count-ratio / min-max / integer-sum-mean arithmetic
    "q214_constraints" ->
      """WITH a AS (SELECT
        |  COUNT(*)::DOUBLE AS row_count,
        |  COUNT(text)::DOUBLE / COUNT(*) AS c_text,
        |  COUNT(lang)::DOUBLE / COUNT(*) AS c_lang,
        |  SUM(CASE WHEN regexp_matches(lang, '^[a-z]{2}$') THEN 1 ELSE 0 END)::DOUBLE
        |    / COUNT(lang) AS mr_lang,
        |  MIN(n_chars)::DOUBLE AS min_c,
        |  MAX(n_chars)::DOUBLE AS max_c,
        |  SUM(n_chars)::DOUBLE / COUNT(n_chars) AS mean_c
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT 'rows present' AS "constraint", 'row_count' AS metric,
        |    row_count AS value, row_count > 0 AS passed FROM a
        |  UNION ALL SELECT 'text complete', 'completeness(text)', c_text,
        |    c_text = 1.0 FROM a
        |  UNION ALL SELECT 'lang complete', 'completeness(lang)', c_lang,
        |    c_lang = 1.0 FROM a
        |  UNION ALL SELECT 'lang is iso2', 'match_ratio(lang)', mr_lang,
        |    mr_lang = 1.0 FROM a
        |  UNION ALL SELECT 'n_chars nonneg', 'min(n_chars)', min_c,
        |    min_c >= 0.0 FROM a
        |  UNION ALL SELECT 'n_chars bounded', 'max(n_chars)', max_c,
        |    max_c <= 1e6 FROM a
        |  UNION ALL SELECT 'mean chars sane', 'mean(n_chars)', mean_c,
        |    mean_c BETWEEN 10.0 AND 1e5 FROM a)
        |ORDER BY "constraint"""".stripMargin,

    "q215_upsert_merge" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderpriority,
        |    1 AS version, FALSE AS deleted, 0 AS pri FROM orders),
        |chg AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) *
        |      CAST(1.1 AS DECIMAL(3,2)) AS DOUBLE) AS o_totalprice,
        |    o_orderpriority, 2 AS version, o_orderkey % 21 = 0 AS deleted,
        |    1 AS pri
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC, pri DESC) AS rn FROM u)
        |SELECT o_orderkey, o_totalprice, o_orderpriority, version
        |FROM w WHERE rn = 1 AND NOT deleted ORDER BY o_orderkey""".stripMargin,

    // q255: counts replayed; the multiset identity itself was verified
    // engine-side with exceptAll both directions
    "q255_incremental_join" ->
      """WITH o AS (SELECT o_orderkey, o_custkey FROM orders),
        |c AS (SELECT c_custkey AS o_custkey, c_mktsegment FROM customer),
        |ol AS (SELECT * FROM o WHERE o_orderkey % 4 <> 0),
        |dl AS (SELECT * FROM o WHERE o_orderkey % 4 = 0),
        |orr AS (SELECT * FROM c WHERE o_custkey % 5 <> 0),
        |drr AS (SELECT * FROM c WHERE o_custkey % 5 = 0)
        |SELECT
        |  (SELECT count(*) FROM ol JOIN orr USING (o_custkey))::BIGINT
        |    AS n_old,
        |  ((SELECT count(*) FROM dl JOIN orr USING (o_custkey))
        |   + (SELECT count(*) FROM ol JOIN drr USING (o_custkey))
        |   + (SELECT count(*) FROM dl JOIN drr USING (o_custkey)))::BIGINT
        |    AS n_delta,
        |  (SELECT count(*) FROM o JOIN c USING (o_custkey))::BIGINT
        |    AS n_full,
        |  TRUE AS multiset_equal""".stripMargin,

    "q256_scd2" ->
      """SELECT o_custkey, o_orderkey,
        |  o_orderdate::TIMESTAMP AS valid_from,
        |  lead(o_orderdate::TIMESTAMP) OVER w AS valid_to,
        |  lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    "q216_group_sample" ->
      """WITH r AS (SELECT event_id, event_type,
        |  ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY md5('42:' || CAST(event_id AS VARCHAR)), event_id)
        |    AS sample_rank
        |  FROM events)
        |SELECT event_id, event_type, sample_rank FROM r
        |WHERE sample_rank <= 5 ORDER BY event_type, sample_rank""".stripMargin,

    "q217_sorted_neighborhood" ->
      """WITH s AS (SELECT c_custkey, c_name,
        |    LAG(c_name, 1) OVER w AS pt1, LAG(c_custkey, 1) OVER w AS pi1,
        |    LAG(c_name, 2) OVER w AS pt2, LAG(c_custkey, 2) OVER w AS pi2
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_name, c_custkey)),
        |p AS (
        |  SELECT pi1 AS left_id, c_custkey AS right_id,
        |    CAST(levenshtein(pt1, c_name) AS INTEGER) AS dist,
        |    1 AS "offset" FROM s WHERE pi1 IS NOT NULL
        |  UNION ALL
        |  SELECT pi2, c_custkey,
        |    CAST(levenshtein(pt2, c_name) AS INTEGER), 2
        |  FROM s WHERE pi2 IS NOT NULL)
        |SELECT left_id, right_id, dist, "offset" FROM p WHERE dist <= 3
        |ORDER BY right_id, "offset"""".stripMargin,

    // q257: DuckDB's jaro_winkler_similarity IS the reference for the
    // native expression (rapidfuzz convention: boost only above 0.7,
    // empties score 0) — ROUND-6 on both sides
    "q257_jaro_linkage" ->
      """WITH s AS (SELECT c_custkey, c_name,
        |    LAG(c_name, 1) OVER w AS pt1, LAG(c_custkey, 1) OVER w AS pi1,
        |    LAG(c_name, 2) OVER w AS pt2, LAG(c_custkey, 2) OVER w AS pi2
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_name, c_custkey)),
        |p AS (
        |  SELECT pi1 AS left_id, c_custkey AS right_id,
        |    ROUND(jaro_winkler_similarity(pt1, c_name), 6) AS sim,
        |    1 AS "offset" FROM s WHERE pi1 IS NOT NULL
        |  UNION ALL
        |  SELECT pi2, c_custkey,
        |    ROUND(jaro_winkler_similarity(pt2, c_name), 6), 2
        |  FROM s WHERE pi2 IS NOT NULL)
        |SELECT left_id, right_id, sim, "offset" FROM p WHERE sim >= 0.9
        |ORDER BY right_id, "offset"""".stripMargin,

    // terms x_j·0.5^d are exact doubles (power-of-two scaling), summed
    // as DECIMAL(28,16) → order-independent; ROUND-6 absorbs the
    // engines' double→decimal cast convention gap (shortest-string vs
    // exact-binary, ~1e-14 relative); denominator closed-form
    "q218_ewma" ->
      """WITH r AS (SELECT user_id, event_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS rn
        |  FROM events WHERE user_id < 50),
        |j AS (SELECT a.user_id, a.event_id,
        |    SUM(CAST(b.value *
        |      POWER(0.5::DOUBLE, (a.rn - b.rn)::DOUBLE)
        |      AS DECIMAL(28,16))) AS num,
        |    COUNT(*) AS n
        |  FROM r a JOIN r b ON a.user_id = b.user_id
        |    AND b.rn BETWEEN a.rn - 40 AND a.rn
        |  GROUP BY 1, 2)
        |SELECT user_id, event_id,
        |  ROUND(CAST(num AS DOUBLE) /
        |    ((1.0::DOUBLE - POWER(0.5::DOUBLE, n::DOUBLE)) / 0.5::DOUBLE),
        |    6) AS ewma
        |FROM j ORDER BY user_id, event_id""".stripMargin,

    // bin = IEEE floor((x−lo)/w) clamped — identical per engine; p's
    // are exact-count divisions; ln through DECIMAL(18,8); terms
    // ROUND-6 before the k-row total
    "q220_psi_drift" ->
      """WITH st AS (SELECT MIN(o_totalprice::DOUBLE) AS lo,
        |    MAX(o_totalprice::DOUBLE) AS hi
        |  FROM orders WHERE YEAR(o_orderdate) < 1998),
        |a AS (SELECT CAST(LEAST(GREATEST(
        |      FLOOR((o_totalprice::DOUBLE - lo) / ((hi - lo) / 10)),
        |      0), 9) AS INTEGER) AS bin, COUNT(*) AS n_base
        |  FROM orders, st WHERE YEAR(o_orderdate) < 1998 GROUP BY 1),
        |b AS (SELECT CAST(LEAST(GREATEST(
        |      FLOOR((o_totalprice::DOUBLE - lo) / ((hi - lo) / 10)),
        |      0), 9) AS INTEGER) AS bin, COUNT(*) AS n_cur
        |  FROM orders, st WHERE YEAR(o_orderdate) >= 1998 GROUP BY 1),
        |j AS (SELECT COALESCE(a.bin, b.bin) AS bin,
        |    COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
        |  FROM a FULL OUTER JOIN b ON a.bin = b.bin),
        |t AS (SELECT *,
        |    GREATEST(n_base::DOUBLE / SUM(n_base) OVER (), 1e-6::DOUBLE)
        |      AS pb,
        |    GREATEST(n_cur::DOUBLE / SUM(n_cur) OVER (), 1e-6::DOUBLE)
        |      AS pc FROM j),
        |d AS (SELECT bin, n_base, n_cur, ROUND(pb, 6) AS p_base,
        |    ROUND(pc, 6) AS p_cur,
        |    ROUND((pc - pb) *
        |      CAST(CAST(LN(pc / pb) AS DECIMAL(18,8)) AS DOUBLE), 6)
        |      + 0.0 AS psi_term FROM t)
        |SELECT bin, n_base, n_cur, p_base, p_cur, psi_term,
        |  ROUND(SUM(psi_term) OVER (), 6) + 0.0 AS psi_total
        |FROM d ORDER BY bin""".stripMargin,

    "q221_gap_islands" ->
      """WITH r AS (SELECT user_id, event_id,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
        |    AS rn
        |  FROM events WHERE user_id < 100)
        |SELECT user_id, MIN(event_id) AS island_start,
        |  MAX(event_id) AS island_end, COUNT(*) AS island_len
        |FROM r GROUP BY user_id, event_id - rn
        |ORDER BY user_id, island_start""".stripMargin,

    "q223_kfold" ->
      """SELECT CAST(('0x' || substr(md5('42:' || o_orderkey::VARCHAR),
        |    1, 8))::BIGINT % 5 AS INTEGER) AS fold,
        |  COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY 1 ORDER BY fold""".stripMargin,

    // quantile_cont ≡ Spark percentile (both ROUND-6); a score ON a
    // cut stays in the lower phase (strict >)
    "q224_curriculum" ->
      """WITH c AS (SELECT
        |  ROUND(quantile_cont(n_chars, 0.25), 6) AS c1,
        |  ROUND(quantile_cont(n_chars, 0.5), 6) AS c2,
        |  ROUND(quantile_cont(n_chars, 0.75), 6) AS c3 FROM documents)
        |SELECT doc_id,
        |  (CASE WHEN n_chars::DOUBLE > c1 THEN 1 ELSE 0 END +
        |   CASE WHEN n_chars::DOUBLE > c2 THEN 1 ELSE 0 END +
        |   CASE WHEN n_chars::DOUBLE > c3 THEN 1 ELSE 0 END) AS phase,
        |  md5('42:' || doc_id::VARCHAR) AS curriculum_key
        |FROM documents, c ORDER BY phase, curriculum_key""".stripMargin,

    "q225_golden_record" ->
      """WITH r AS (SELECT c_custkey // 3 AS entity, c_mktsegment,
        |    c_nationkey
        |  FROM customer WHERE c_custkey < 600),
        |spine AS (SELECT entity, COUNT(*) AS n_members FROM r GROUP BY 1),
        |m1 AS (SELECT entity, c_mktsegment FROM (
        |  SELECT entity, c_mktsegment, ROW_NUMBER() OVER (
        |      PARTITION BY entity ORDER BY COUNT(*) DESC, c_mktsegment)
        |      AS rn
        |  FROM r WHERE c_mktsegment IS NOT NULL
        |  GROUP BY entity, c_mktsegment) WHERE rn = 1),
        |m2 AS (SELECT entity, c_nationkey FROM (
        |  SELECT entity, c_nationkey, ROW_NUMBER() OVER (
        |      PARTITION BY entity ORDER BY COUNT(*) DESC, c_nationkey)
        |      AS rn
        |  FROM r WHERE c_nationkey IS NOT NULL
        |  GROUP BY entity, c_nationkey) WHERE rn = 1)
        |SELECT spine.entity, n_members, c_mktsegment, c_nationkey
        |FROM spine LEFT JOIN m1 USING (entity) LEFT JOIN m2 USING (entity)
        |ORDER BY entity""".stripMargin,

    "q219_interleave_select" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id) AS source_rank
        |  FROM documents),
        |t AS (SELECT * FROM r
        |  ORDER BY source_rank, n_chars DESC, doc_id LIMIT 200)
        |SELECT doc_id, source, n_chars, source_rank FROM t
        |ORDER BY doc_id""".stripMargin)
}
