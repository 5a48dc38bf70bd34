package graft.queries

import graft.api.Df
import org.apache.spark.sql.functions._
import QueryUtil._

/** Analytics staples beyond the reference surface (quantiles, describe,
  * pivot, rank, binning, JSON, scalar broadcast). q54–q59b. */
object AnalyticsQueries {

  private val prIters = 5
  private val prDamp = 0.85

  /** one unrolled power-iteration CTE: rank over `prev`, the
    * contribution sum DECIMAL(28,16)-cast exactly as the operator's */
  private def prStep(k: Int): String =
    s"""r$k AS (SELECT nd.node,
       |  ${1 - prDamp}::DOUBLE / (SELECT n FROM nn)
       |    + $prDamp::DOUBLE * COALESCE(c.s, 0::DOUBLE) AS rank
       |  FROM nodes nd LEFT JOIN (
       |    SELECT en.dst, CAST(SUM(CAST(r.rank * en.frac AS DECIMAL(28,16)))
       |      AS DOUBLE) AS s
       |    FROM en JOIN r${k - 1} r ON en.src = r.node GROUP BY en.dst) c
       |  ON nd.node = c.dst)""".stripMargin

  /** shared by q203 (gated chained-broadcast plan) and q270 (forced
    * shuffle loop) — the gate contract is bit-identical ranks, so one
    * oracle replay checks both physical paths. */
  private val pageRankSql: String =
    s"""WITH ev AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id,
       |  json_extract_string(props, '$$.k')::BIGINT AS k FROM events),
       |ed AS (SELECT k AS src, LEAD(k) OVER (
       |  PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
       |e AS (SELECT src, dst FROM ed
       |  WHERE src IS NOT NULL AND dst IS NOT NULL),
       |w AS (SELECT src, dst, COUNT(*) AS w FROM e GROUP BY 1, 2),
       |ow AS (SELECT src, SUM(w) AS ow FROM w GROUP BY 1),
       |en AS (SELECT w.src, w.dst, w.w::DOUBLE / ow.ow AS frac
       |  FROM w JOIN ow USING (src)),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (SELECT node, 1::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes),
       |${(1 to prIters).map(prStep).mkString(",\n")}
       |SELECT node, ROUND(rank, 8) AS rank FROM r$prIters
       |ORDER BY node""".stripMargin

  val defs: Map[String, Q] = Map(
    // ---- exact interpolated quantiles, grouped — via the grouped
    // order-statistic selection: 3 cohorts over the whole table is
    // exactly the few-large-cohorts case where the per-group
    // percentile aggregate buffers cohort-sized value maps ----
    "q54_quantiles" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li.select("l_returnflag", "l_quantity")
        .groupby("l_returnflag")
        .quantileScalable("l_quantity", 0.5, "median_qty")
        .selectExpr("l_returnflag", "round(median_qty, 6) AS median_qty")
        .sortValues(Seq("l_returnflag")).sdf
    }),

    // ---- describe(): stat battery in one aggregation pass ----
    "q55_describe" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .describeStats(Seq("l_quantity", "l_discount"))
        .selectExpr("stat",
          "round(l_quantity, 4) AS l_quantity", "round(l_discount, 4) AS l_discount")
        .sortValues(Seq("stat")).sdf
    }),

    // ---- describe() at k=4, mixing heavy-duplication columns
    // (quantity/discount/tax) with a distinct-heavy one (extendedprice):
    // the ordinal melt's collapse must stay correct when one column
    // barely collapses while its neighbors collapse 10⁵× ----
    "q266_describe_wide" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .describeStats(Seq("l_quantity", "l_extendedprice",
          "l_discount", "l_tax"))
        .selectExpr("stat", "round(l_quantity, 4) AS l_quantity",
          "round(l_extendedprice, 4) AS l_extendedprice",
          "round(l_discount, 4) AS l_discount",
          "round(l_tax, 4) AS l_tax")
        .sortValues(Seq("stat")).sdf
    }),

    // ---- pivot_table: one-pass grouped spread ----
    "q56_pivot" -> ((s, dir) => {
      val e = events(s, dir)
      e.assign("bucket", (col("user_id") % 10).cast("long"))
        .pivotTable("bucket", "event_type", "value",
          Seq("click", "view", "purchase", "signup", "error"), aggFn = "count")
        .sortValues(Seq("bucket")).sdf
    }),

    // ---- rank(method='min') within groups — via the scalable scan:
    // o_orderpriority has 5 values, so the window form serializes onto
    // ≤5 tasks at any scale (rank depends only on the sorted values,
    // so scan and window agree under ties) ----
    "q57_rank" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      o.select("o_orderpriority", "o_orderkey", "o_totalprice")
        .groupby("o_orderpriority")
        .rankScalable("o_totalprice", "price_rank", method = "min",
          ascending = false)
        .where(col("price_rank") <= 5)
        .sortValues(Seq("o_orderpriority", "price_rank", "o_orderkey")).sdf
    }),

    // ---- cut(): explicit-break binning ----
    "q58_cut" -> ((s, dir) => {
      T(s, dir, "orders")
        .cut("o_totalprice", Seq(0.0, 100000.0, 300000.0, 1e9),
          Seq("low", "mid", "high"), "price_band")
        .groupby("price_band")
        .agg(count(lit(1)).as("n"),
             decSum(col("o_totalprice")).as("sum_price"))
        .sortValues(Seq("price_band")).sdf
    }),

    // ---- JSON extraction from the props column ----
    "q59_json" -> ((s, dir) => {
      val e = events(s, dir)
      e.assign("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupby("event_type")
        .agg(sum(col("k")).cast("long").as("sum_k"),
             max(col("k")).as("max_k"))
        .sortValues(Seq("event_type")).sdf
    }),

    // ---- as-of join (composed: union + carry-forward window; oracle =
    // DuckDB's native ASOF JOIN — the strongest possible cross-check) ----
    "q72_asof_join" -> ((s, dir) => {
      val e = events(s, dir)
      val purchases = e.where(e("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = e.where(e("event_type") === "click")
        .selectExpr("user_id", "ts", "value AS click_value")
      purchases.asofJoin(clicks, on = Seq("user_id"),
        leftTime = "ts", rightTime = "ts", valueCols = Seq("click_value"))
        .select("event_id", "user_id", "click_value")
        .sortValues(Seq("event_id")).sdf
    }),

    // ---- IVF ANN (kmeans coarse quantizer). With nprobe = nlist every
    // cell is probed, so the result provably equals brute force
    // regardless of the clustering (AsofIvfSpec) — which makes the
    // brute-force SQL a valid exact oracle, INDEPENDENT of the
    // quantizer fit; fitSample=0.25 exercises the sampled-fit path the
    // 100 TB deployment uses (nobody fits k-means on the full corpus). ----
    "q73_ivf_topk" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 3)
      graft.operators.Similarity.ivfTopK(q, e, "embedding", "vec_id",
        k = 3, nlist = 8, nprobe = 8, fitSample = 0.25)
        .sortValues(Seq("query_id", "rank")).sdf
    }),

    // ---- disk-materialized IVF index: corpus written partitioned by
    // coarse cell, probes prune partitions at the scan; nprobe=nlist
    // so the brute-force SQL is the exact oracle (q73's contract) ----
    "q201_ivf_index" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index"
      graft.operators.Similarity.buildIvfIndex(e, "embedding", "vec_id",
        path, nlist = 8, fitSample = 0.25)
      graft.operators.Similarity.searchIvfIndex(
        e.where(col("vec_id") < 4), "embedding", "vec_id", path,
        k = 3, nprobe = 8)
        .sortValues(Seq("query_id", "rank")).sdf
    }),

    // ---- PageRank over the per-user event-transition graph (props.k
    // page i → page i+1), 5 synchronous power iterations — the
    // web-graph source-weighting signal; the oracle unrolls the same
    // five iterations as CTEs with the identical decimal-summed
    // contributions ----
    "q203_pagerank" -> ((s, dir) => {
      val e = events(s, dir)
      val ev = e.sdf.select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      val edges = graft.operators.Graphs.transitionEdges(
        ev, "user_id", Seq("ts", "event_id"), "k")
      graft.operators.Graphs.pageRank(edges, "src", "dst",
        iterations = prIters, damping = prDamp)
        .sortValues(Seq("node")).sdf
    }),

    // ---- q203 FORCED through the above-gate shuffle loop
    // (broadcastMaxNodes = 0): the web-scale per-iteration
    // persist+shuffle path — what a billion-node graph takes — stays
    // oracle-checked per round; ranks are bit-identical to q203's by
    // the gate contract (decimal-summed contributions are
    // join-order-free), so the oracle is the same unrolled CTE ----
    "q270_pagerank_shuffle" -> ((s, dir) => {
      val e = events(s, dir)
      val ev = e.sdf.select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      val edges = graft.operators.Graphs.transitionEdges(
        ev, "user_id", Seq("ts", "event_id"), "k")
      graft.operators.Graphs.pageRank(edges, "src", "dst",
        iterations = prIters, damping = prDamp, broadcastMaxNodes = 0L)
        .sortValues(Seq("node")).sdf
    }),

    // ---- population covariance matrix of the embedding column,
    // upper triangle — the distributed half of PCA/OPQ; the oracle
    // recomputes every decimal-summed moment with a lateral unnest ----
    "q205_covariance" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      graft.operators.Similarity.covarianceMatrix(e, "embedding")
        .sortValues(Seq("i", "j")).sdf
    }),

    // ---- per-label covariance matrices: the q205 machinery with the
    // moment aggregate keyed — per-domain second-moment profiles; the
    // oracle replays the decimal-summed moments per label ----
    "q259_group_covariance" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      graft.operators.Similarity.covarianceMatrixBy(e, "embedding", Seq("label"))
        .sortValues(Seq("label", "i", "j")).sdf
    }),

    // ---- Mahalanobis outlier scores over (quantity, price, discount):
    // corpus-fit mean/covariance, driver 3×3 adjugate inverse (fixed op
    // order), map-side quadratic form; the oracle replays every double
    // op in the same order from the same decimal-summed moments ----
    "q260_mahalanobis" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      new Df(graft.operators.Similarity.mahalanobisScores(li,
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        Seq("l_orderkey", "l_linenumber")).sdf
        .where(col("l_orderkey") % 20 === 0))
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }),

    // ---- PCA whitening (top-8): the oracle is the mathematical
    // contract itself — the whitened corpus's population covariance IS
    // the 8×8 identity (1s on the diagonal, 0s off), checked to 4dp
    // through the same covarianceMatrix machinery ----
    "q261_whitening" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val w = graft.operators.Similarity.whiten(e, "embedding", "vec_id", k = 8)
      new Df(graft.operators.Similarity.covarianceMatrix(w, "wpcs").sdf
        .select(col("i"), col("j"),
          (round(col("cov"), 4) + lit(0.0)).as("val")))
        .sortValues(Seq("i", "j")).sdf
    }),

    // ---- PCA (top-8): distributed covariance + driver Jacobi +
    // broadcast projection. Oracle checks three mathematical
    // invariants: per-component projected variance ≡ eigenvalue
    // (comp 0..7, |gap| rounds to 0), Σ all eigenvalues ≡ trace of
    // the covariance (comp 1000 — the trace recomputed in SQL from
    // raw embeddings), and basis orthonormality (comp 2000, max
    // |V·Vᵀ − I| rounds to 0) ----
    "q207_pca" -> ((s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val e = T(s, dir, "embeddings")
      val k = 8
      val basis = graft.operators.Similarity.pcaBasis(e, "embedding", k)
      val proj = graft.operators.Similarity
        .projectOnBasis(e, "embedding", "vec_id", basis)
      val pv = proj.sdf
        .select(posexplode(col("pcs")).as(Seq("comp", "pc")))
        .groupBy(col("comp"))
        .agg(sum(col("pc").cast("decimal(28,12)")).cast("double").as("__s1"),
          sum((col("pc") * col("pc")).cast("decimal(28,12)"))
            .cast("double").as("__s2"),
          count(lit(1)).as("__n"))
      val lamSchema = StructType(Seq(StructField("comp", IntegerType),
        StructField("lam", DoubleType)))
      val lam = graft.api.Df.fromRows(s,
        basis.eigenvalues.take(k).zipWithIndex
          .map { case (l, i) => Row(i, l) }.toIndexedSeq, lamSchema).sdf
      val gaps = pv.join(broadcast(lam), Seq("comp"))
        .select(col("comp").cast("long").as("comp"),
          round(abs(col("__s2") / col("__n") -
            (col("__s1") / col("__n")) * (col("__s1") / col("__n")) -
            col("lam")), 4).as("value"))
      val comps = basis.components
      val gramDev = (for (a <- comps.indices; b <- comps.indices) yield {
        val dot = comps(a).lazyZip(comps(b)).map(_ * _).sum
        math.abs(dot - (if (a == b) 1.0 else 0.0))
      }).max
      val extraSchema = StructType(Seq(StructField("comp", LongType),
        StructField("value", DoubleType)))
      val extra = graft.api.Df.fromRows(s, Seq(
        Row(1000L, BigDecimal(basis.eigenvalues.sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
        Row(2000L, BigDecimal(gramDev)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
        extraSchema).sdf
      gaps.union(extra).orderBy("comp")
    }),

    // ---- ordered conversion funnel view→click→purchase inside a 2 h
    // window, greedy-earliest step times; the oracle replays every
    // per-user MIN chain ----
    "q209_funnel" -> ((s, dir) => {
      val e = events(s, dir)
      graft.operators.Funnels.funnel(e.sdf, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), withinSec = 7200L)
        .sortValues(Seq("step_idx")).sdf
    }),

    // ---- as-of join, forward direction + tolerance (merge_asof
    // parity); oracle = DuckDB ASOF with the inequality flipped and a
    // post-join tolerance gate — semantically identical to pandas ----
    "q93_asof_forward" -> ((s, dir) => {
      val e = events(s, dir)
      val purchases = e.where(e("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = e.where(e("event_type") === "click")
        .selectExpr("user_id", "ts", "value AS click_value")
      purchases.asofJoin(clicks, on = Seq("user_id"),
        leftTime = "ts", rightTime = "ts", valueCols = Seq("click_value"),
        direction = "forward", toleranceSec = 3600L)
        .select("event_id", "user_id", "click_value")
        .sortValues(Seq("event_id")).sdf
    }),

    // ---- frame ⟷ scalar broadcast (df + df.mean() pattern) ----
    "q59b_scalar_broadcast" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val meanPrice = li.agg(
        (decSum(col("l_extendedprice")) / count(col("l_extendedprice"))).as("mean_price"))
      li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withScalarColumn(meanPrice)
        .assign("price_vs_mean", col("l_extendedprice") - col("mean_price"))
        .select("l_orderkey", "l_linenumber", "price_vs_mean")
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }))

  val oracles: Map[String, String] = Map(
    "q54_quantiles" ->
      """SELECT l_returnflag,
        |ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS median_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q55_describe" ->
      """SELECT stat, ROUND(l_quantity, 4) AS l_quantity, ROUND(l_discount, 4) AS l_discount FROM (
        |SELECT 'count' AS stat, COUNT(l_quantity)::DOUBLE AS l_quantity, COUNT(l_discount)::DOUBLE AS l_discount FROM lineitem
        |UNION ALL SELECT 'mean', AVG(l_quantity), AVG(l_discount) FROM lineitem
        |UNION ALL SELECT 'std', STDDEV_SAMP(l_quantity), STDDEV_SAMP(l_discount) FROM lineitem
        |UNION ALL SELECT 'min', MIN(l_quantity), MIN(l_discount) FROM lineitem
        |UNION ALL SELECT 'q25', QUANTILE_CONT(l_quantity, 0.25), QUANTILE_CONT(l_discount, 0.25) FROM lineitem
        |UNION ALL SELECT 'q50', QUANTILE_CONT(l_quantity, 0.5), QUANTILE_CONT(l_discount, 0.5) FROM lineitem
        |UNION ALL SELECT 'q75', QUANTILE_CONT(l_quantity, 0.75), QUANTILE_CONT(l_discount, 0.75) FROM lineitem
        |UNION ALL SELECT 'max', MAX(l_quantity), MAX(l_discount) FROM lineitem)
        |ORDER BY stat""".stripMargin,
    "q266_describe_wide" ->
      """SELECT stat, ROUND(l_quantity, 4) AS l_quantity,
        |ROUND(l_extendedprice, 4) AS l_extendedprice,
        |ROUND(l_discount, 4) AS l_discount, ROUND(l_tax, 4) AS l_tax FROM (
        |SELECT 'count' AS stat, COUNT(l_quantity)::DOUBLE AS l_quantity, COUNT(l_extendedprice)::DOUBLE AS l_extendedprice, COUNT(l_discount)::DOUBLE AS l_discount, COUNT(l_tax)::DOUBLE AS l_tax FROM lineitem
        |UNION ALL SELECT 'mean', AVG(l_quantity), AVG(l_extendedprice), AVG(l_discount), AVG(l_tax) FROM lineitem
        |UNION ALL SELECT 'std', STDDEV_SAMP(l_quantity), STDDEV_SAMP(l_extendedprice), STDDEV_SAMP(l_discount), STDDEV_SAMP(l_tax) FROM lineitem
        |UNION ALL SELECT 'min', MIN(l_quantity), MIN(l_extendedprice), MIN(l_discount), MIN(l_tax) FROM lineitem
        |UNION ALL SELECT 'q25', QUANTILE_CONT(l_quantity, 0.25), QUANTILE_CONT(l_extendedprice, 0.25), QUANTILE_CONT(l_discount, 0.25), QUANTILE_CONT(l_tax, 0.25) FROM lineitem
        |UNION ALL SELECT 'q50', QUANTILE_CONT(l_quantity, 0.5), QUANTILE_CONT(l_extendedprice, 0.5), QUANTILE_CONT(l_discount, 0.5), QUANTILE_CONT(l_tax, 0.5) FROM lineitem
        |UNION ALL SELECT 'q75', QUANTILE_CONT(l_quantity, 0.75), QUANTILE_CONT(l_extendedprice, 0.75), QUANTILE_CONT(l_discount, 0.75), QUANTILE_CONT(l_tax, 0.75) FROM lineitem
        |UNION ALL SELECT 'max', MAX(l_quantity), MAX(l_extendedprice), MAX(l_discount), MAX(l_tax) FROM lineitem)
        |ORDER BY stat""".stripMargin,
    "q56_pivot" ->
      """SELECT user_id % 10 AS bucket,
        |COUNT(CASE WHEN event_type = 'click' THEN value END) AS click,
        |COUNT(CASE WHEN event_type = 'view' THEN value END) AS view,
        |COUNT(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
        |COUNT(CASE WHEN event_type = 'signup' THEN value END) AS signup,
        |COUNT(CASE WHEN event_type = 'error' THEN value END) AS error
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q57_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, price_rank FROM (
        |SELECT o_orderpriority, o_orderkey, o_totalprice,
        |RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS price_rank
        |FROM orders)
        |WHERE price_rank <= 5 ORDER BY o_orderpriority, price_rank, o_orderkey""".stripMargin,
    "q58_cut" ->
      """SELECT CASE
        |WHEN o_totalprice > 300000.0 AND o_totalprice <= 1e9 THEN 'high'
        |WHEN o_totalprice > 100000.0 AND o_totalprice <= 300000.0 THEN 'mid'
        |WHEN o_totalprice > 0.0 AND o_totalprice <= 100000.0 THEN 'low'
        |END AS price_band,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY price_band""".stripMargin,
    "q59_json" ->
      """SELECT event_type,
        |CAST(SUM(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
        |MAX(json_extract_string(props, '$.k')::BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q73_ivf_topk" ->
      """SELECT query_id, rank, corpus_id, cosine FROM (
        |SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) + 0.0 AS cosine,
        |ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |  ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
        |  c.vec_id) AS rank
        |FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |WHERE q.vec_id < 3)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q201_ivf_index" ->
      """SELECT query_id, rank, corpus_id, cosine FROM (
        |SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) + 0.0 AS cosine,
        |ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |  ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
        |  c.vec_id) AS rank
        |FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |WHERE q.vec_id < 4)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q209_funnel" ->
      """WITH ev AS (SELECT user_id AS u, ts::TIMESTAMP AS ts,
        |  event_type AS t FROM events),
        |u1 AS (SELECT u, MIN(ts) AS t1 FROM ev WHERE t = 'view' GROUP BY u),
        |u2 AS (SELECT e.u, u1.t1, MIN(e.ts) AS t2 FROM ev e
        |  JOIN u1 ON e.u = u1.u
        |  WHERE e.t = 'click' AND e.ts >= u1.t1
        |    AND e.ts <= u1.t1 + INTERVAL 7200 SECOND
        |  GROUP BY e.u, u1.t1),
        |u3 AS (SELECT e.u, u2.t1, MIN(e.ts) AS t3 FROM ev e
        |  JOIN u2 ON e.u = u2.u
        |  WHERE e.t = 'purchase' AND e.ts >= u2.t2
        |    AND e.ts <= u2.t1 + INTERVAL 7200 SECOND
        |  GROUP BY e.u, u2.t1),
        |n AS (SELECT (SELECT COUNT(*) FROM u1) AS n1,
        |  (SELECT COUNT(*) FROM u2) AS n2,
        |  (SELECT COUNT(*) FROM u3) AS n3)
        |SELECT step_idx::INT AS step_idx, step, n_users::BIGINT AS n_users,
        |CASE WHEN n1 > 0 THEN ROUND(n_users::DOUBLE / n1, 4) END AS conversion
        |FROM (SELECT 1 AS step_idx, 'view' AS step, n1 AS n_users, n1 FROM n
        |  UNION ALL SELECT 2, 'click', n2, n1 FROM n
        |  UNION ALL SELECT 3, 'purchase', n3, n1 FROM n)
        |ORDER BY step_idx""".stripMargin,
    "q207_pca" ->
      s"""WITH v AS (SELECT embedding::DOUBLE[] AS e FROM embeddings
         |  WHERE embedding IS NOT NULL),
         |p AS (SELECT i::INT AS i, e[(i+1)::INT] * e[(i+1)::INT] AS p
         |  FROM v, UNNEST(range(len(e))) t1(i)),
         |s AS (SELECT i, CAST(SUM(CAST(p AS DECIMAL(28,12))) AS DOUBLE) AS sp,
         |  COUNT(*) AS n FROM p GROUP BY i),
         |m AS (SELECT i::INT AS i,
         |  CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) AS sm
         |  FROM (SELECT UNNEST(e) AS x, UNNEST(range(len(e))) AS i FROM v)
         |  GROUP BY 1),
         |diag AS (SELECT s.i, ROUND(sp / n - (m.sm / n) * (m.sm / n), 6)
         |  AS var FROM s JOIN m ON s.i = m.i),
         |tr AS (SELECT ROUND(SUM(var), 4) AS t FROM diag)
         |SELECT comp::BIGINT AS comp, val::DOUBLE AS value FROM (
         |  SELECT * FROM (VALUES ${(0 until 8).map(i => s"($i, 0.0)")
            .mkString(", ")}, (2000, 0.0)) x(comp, val)
         |  UNION ALL SELECT 1000, t FROM tr) u
         |ORDER BY comp""".stripMargin,
    // the whitening contract is exact: whitened covariance ≡ I (4dp)
    "q261_whitening" ->
      s"""SELECT i::INT AS i, j::INT AS j, val::DOUBLE AS val
         |FROM (VALUES ${(for (i <- 0 until 8; j <- i until 8)
            yield s"($i, $j, ${if (i == j) "1.0" else "0.0"})").mkString(", ")})
         |  x(i, j, val)
         |ORDER BY i, j""".stripMargin,

    // the q205 moment replay keyed by label; same filter contract as
    // the operator's fullyFinite (null vec / null / NaN / |x| >= 1e18
    // elements drop)
    "q259_group_covariance" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(list_filter(embedding,
        |    x -> x IS NULL OR isnan(x) OR abs(x) >= 1e18)) = 0),
        |p AS (SELECT label, i::INT AS i, j::INT AS j,
        |  e[(i+1)::INT] * e[(j+1)::INT] AS p
        |  FROM v, UNNEST(range(len(e))) t1(i), UNNEST(range(len(e))) t2(j)
        |  WHERE j >= i),
        |s AS (SELECT label, i, j,
        |  CAST(SUM(CAST(p AS DECIMAL(28,12))) AS DOUBLE) AS sp,
        |  COUNT(*) AS n FROM p GROUP BY 1, 2, 3),
        |m AS (SELECT label, i::INT AS i,
        |  CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) AS sm
        |  FROM (SELECT label, UNNEST(e) AS x, UNNEST(range(len(e))) AS i FROM v)
        |  GROUP BY 1, 2)
        |SELECT s.label, s.i, s.j,
        |ROUND(sp / n - (mi.sm / n) * (mj.sm / n), 6) + 0.0 AS cov
        |FROM s JOIN m mi ON s.label = mi.label AND s.i = mi.i
        |JOIN m mj ON s.label = mj.label AND s.j = mj.i
        |ORDER BY s.label, s.i, s.j""".stripMargin,

    // replays the operator's exact double tree: decimal-summed moments,
    // 6dp-rounded covariance cells (covCell), 3×3 adjugate inverse in
    // the operator's op order, 9-term row-major quadratic form
    "q260_mahalanobis" ->
      """WITH f AS (SELECT l_quantity::DOUBLE AS x0,
        |    l_extendedprice::DOUBLE AS x1, l_discount::DOUBLE AS x2
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |mo AS (SELECT COUNT(*)::BIGINT AS n,
        |  CAST(SUM(CAST(x0 AS DECIMAL(18,8))) AS DOUBLE) AS s0,
        |  CAST(SUM(CAST(x1 AS DECIMAL(18,8))) AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(x2 AS DECIMAL(18,8))) AS DOUBLE) AS s2,
        |  CAST(SUM(CAST(x0 * x0 AS DECIMAL(28,12))) AS DOUBLE) AS p00,
        |  CAST(SUM(CAST(x0 * x1 AS DECIMAL(28,12))) AS DOUBLE) AS p01,
        |  CAST(SUM(CAST(x0 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS p02,
        |  CAST(SUM(CAST(x1 * x1 AS DECIMAL(28,12))) AS DOUBLE) AS p11,
        |  CAST(SUM(CAST(x1 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS p12,
        |  CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS p22
        |  FROM f),
        |cv AS (SELECT n, s0 / n AS m0, s1 / n AS m1, s2 / n AS m2,
        |  ROUND(p00 / n - (s0 / n) * (s0 / n), 6) + 0.0 AS c00,
        |  ROUND(p01 / n - (s0 / n) * (s1 / n), 6) + 0.0 AS c01,
        |  ROUND(p02 / n - (s0 / n) * (s2 / n), 6) + 0.0 AS c02,
        |  ROUND(p11 / n - (s1 / n) * (s1 / n), 6) + 0.0 AS c11,
        |  ROUND(p12 / n - (s1 / n) * (s2 / n), 6) + 0.0 AS c12,
        |  ROUND(p22 / n - (s2 / n) * (s2 / n), 6) + 0.0 AS c22
        |  FROM mo),
        |adj AS (SELECT *,
        |  c11 * c22 - c12 * c12 AS a00,
        |  c01 * c22 - c12 * c02 AS a01,
        |  c01 * c12 - c11 * c02 AS a02
        |  FROM cv),
        |dt AS (SELECT *,
        |  c00 * a00 - c01 * a01 + c02 * a02 AS det FROM adj),
        |iv AS (SELECT m0, m1, m2,
        |  a00 / det AS i00, -a01 / det AS i01, a02 / det AS i02,
        |  (c00 * c22 - c02 * c02) / det AS i11,
        |  -(c00 * c12 - c01 * c02) / det AS i12,
        |  (c00 * c11 - c01 * c01) / det AS i22
        |  FROM dt)
        |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_discount,
        |  (CASE WHEN l_quantity IS NULL OR l_extendedprice IS NULL
        |     OR l_discount IS NULL THEN NULL ELSE
        |   ROUND(
        |     (l_quantity::DOUBLE - m0) * i00 * (l_quantity::DOUBLE - m0)
        |   + (l_quantity::DOUBLE - m0) * i01 * (l_extendedprice::DOUBLE - m1)
        |   + (l_quantity::DOUBLE - m0) * i02 * (l_discount::DOUBLE - m2)
        |   + (l_extendedprice::DOUBLE - m1) * i01 * (l_quantity::DOUBLE - m0)
        |   + (l_extendedprice::DOUBLE - m1) * i11 * (l_extendedprice::DOUBLE - m1)
        |   + (l_extendedprice::DOUBLE - m1) * i12 * (l_discount::DOUBLE - m2)
        |   + (l_discount::DOUBLE - m2) * i02 * (l_quantity::DOUBLE - m0)
        |   + (l_discount::DOUBLE - m2) * i12 * (l_extendedprice::DOUBLE - m1)
        |   + (l_discount::DOUBLE - m2) * i22 * (l_discount::DOUBLE - m2),
        |   6) + 0.0 END) AS maha2
        |FROM lineitem CROSS JOIN iv
        |WHERE l_orderkey % 20 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q205_covariance" ->
      """WITH v AS (SELECT embedding::DOUBLE[] AS e FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |p AS (SELECT i::INT AS i, j::INT AS j,
        |  e[(i+1)::INT] * e[(j+1)::INT] AS p
        |  FROM v, UNNEST(range(len(e))) t1(i), UNNEST(range(len(e))) t2(j)
        |  WHERE j >= i),
        |s AS (SELECT i, j,
        |  CAST(SUM(CAST(p AS DECIMAL(28,12))) AS DOUBLE) AS sp,
        |  COUNT(*) AS n FROM p GROUP BY i, j),
        |m AS (SELECT i::INT AS i,
        |  CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) AS sm
        |  FROM (SELECT UNNEST(e) AS x, UNNEST(range(len(e))) AS i FROM v)
        |  GROUP BY 1)
        |SELECT s.i, s.j,
        |ROUND(sp / n - (mi.sm / n) * (mj.sm / n), 6) + 0.0 AS cov
        |FROM s JOIN m mi ON s.i = mi.i JOIN m mj ON s.j = mj.i
        |ORDER BY s.i, s.j""".stripMargin,
    "q203_pagerank" -> pageRankSql,
    "q270_pagerank_shuffle" -> pageRankSql,
    "q72_asof_join" ->
      """SELECT p.event_id, p.user_id, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type='purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='click') c
        |ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q93_asof_forward" ->
      """SELECT p.event_id, p.user_id,
        |CASE WHEN EPOCH(c.ts::TIMESTAMP) - EPOCH(p.ts::TIMESTAMP) <= 3600
        |THEN c.value END AS click_value
        |FROM (SELECT * FROM events WHERE event_type='purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='click') c
        |ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q59b_scalar_broadcast" ->
      """SELECT l_orderkey, l_linenumber,
        |l_extendedprice - (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |  / COUNT(l_extendedprice) FROM lineitem) AS price_vs_mean
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
