package graft.operators

import graft.api.Df
import org.apache.spark.sql.functions._

/** Dataset profiling / diagnostics operators — the observability layer
  * a 100 TB pipeline runs BEFORE committing to a plan: per-column
  * health (nulls, cardinality) decides encoding and join strategy;
  * key-skew stats decide whether a join needs salting
  * ([[graft.api.Df.saltedJoin]]) or AQE skew handling. Beyond the
  * reference's surface (its `describe` is numeric-only summary stats,
  * `/root/reference/pandas_expr/_describe.py`).
  */
object Profiling {

  /** Exact heavy hitters (keys with count ≥ `minCount`) with a
    * count-min-sketch prefilter — the high-cardinality-key shape of
    * "top domains / hottest users in the crawl". Two passes:
    *
    *  1. one scan folds every key into a CMS (size O(1/eps·ln 1/conf),
    *     a few MB — driver-merged, broadcast back out);
    *  2. a second scan keeps only rows whose sketch ESTIMATE reaches
    *     `minCount`, then counts the survivors exactly and re-applies
    *     the threshold.
    *
    * CMS only ever OVER-estimates, so the prefilter has no false
    * negatives and the final exact filter makes the result identical to
    * plain `GROUP BY … HAVING count ≥ minCount` — sketch randomness
    * (seeded, fixed) can cost extra candidates, never correctness.
    * The payoff is at 100 TB with zipfian keys (urls, users, shingles):
    * a plain groupBy shuffles one partial count per (partition,
    * distinct key) — billions of singleton keys — where the prefilter
    * drops the long tail BEFORE the shuffle and only candidate rows
    * (the heavy keys' rows, a tiny fraction) reach it. The sketch is
    * probed on the key's canonical string rendering (type-agnostic);
    * the exact count groups on the NATIVE key, so collisions in the
    * rendering could only add candidates. NULL keys are excluded
    * (COUNT(col) semantics). The probe is a broadcast-sketch UDF — the
    * one place a UDF is the right tool: a CMS lookup has no Catalyst
    * expression form, and it sits behind a pushed-down scan, not in an
    * agg hot loop. */
  def heavyHitters(df: Df, keyCol: String, minCount: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99): Df = {
    require(minCount >= 1, s"heavyHitters: minCount must be >= 1: $minCount")
    val rows = df.sdf.select(col(keyCol)).where(col(keyCol).isNotNull)
    val sketch = rows.select(col(keyCol).cast("string").as("__k"))
      .stat.countMinSketch("__k", eps, confidence, seed = 42)
    val bc = rows.sparkSession.sparkContext.broadcast(sketch)
    val mc = minCount
    val probe = udf((k: String) => k != null && bc.value.estimateCount(k) >= mc)
    new Df(rows
      .where(probe(col(keyCol).cast("string")))
      .groupBy(keyCol).agg(count(lit(1)).as("n"))
      .where(col("n") >= mc))
  }

  /** Per-column profile in LONG format: (column, n, n_nulls,
    * n_distinct) — one row per profiled column. `n_distinct` is the
    * EXACT distinct count (nulls excluded, SQL COUNT(DISTINCT)
    * semantics).
    *
    * Scale: ONE aggregation job for all columns (one pass over the
    * data); each COUNT(DISTINCT) expands to its own expand+shuffle
    * under the hood, so profiling every column of a very wide table is
    * |cols| shuffles — profile the columns you care about, or swap in
    * `approx_count_distinct` (HLL, one pass, no expand) when ±2% is
    * acceptable; exact is the default because the result feeds
    * equality-checked audits. The wide→long pivot happens on the ONE
    * aggregated row (driver-sized), not on the data. */
  def profile(df: Df, cols: Seq[String] = Nil): Df = {
    val cs = if (cols.isEmpty) df.columns.toSeq else cols
    require(cs.nonEmpty, "profile: no columns to profile")
    val missing = cs.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    // positional internal names + backtick-quoted references: column
    // names are DATA here (they ride a generated selectExpr), so a
    // space, quote, or backtick in a CSV-ingested header must not
    // break the parse or the label literal
    val aggs = count(lit(1)).as("__n") +: cs.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__present_$i"),
        count_distinct(col(c)).as(s"__distinct_$i"))
    }
    val one = df.sdf.agg(aggs.head, aggs.tail: _*)
    val stacked = cs.zipWithIndex.map { case (c, i) =>
      val label = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$label', __n, __n - __present_$i, __distinct_$i"
    }.mkString(", ")
    new Df(one.selectExpr(
      s"stack(${cs.size}, $stacked) AS (column, n, n_nulls, n_distinct)"))
  }

  /** Join/agg key-skew diagnostics: one row of (n_rows, n_keys,
    * max_key_n, skew) for a prospective shuffle key, where `skew` =
    * max_key_n / (n_rows / n_keys) rounded to 4dp — 1.0 is perfectly
    * uniform, ≥ ~5 means the hottest key's task runs that many times
    * longer than average and the join wants salting/AQE. NULL keys
    * group together (SQL GROUP BY semantics) and count like any key —
    * a mostly-NULL key column shows up as exactly the skew it is.
    *
    * Scale: one partial+final count per key, one global reduce over
    * the (bounded) per-key counts. Nothing driver-sized but the
    * 4-number result. */
  def skewStats(df: Df, keyCol: String): Df = {
    val perKey = df.sdf.groupBy(col(keyCol)).agg(count(lit(1)).as("__kn"))
    new Df(perKey.agg(
        sum(col("__kn")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__kn")).as("max_key_n"))
      .withColumn("skew",
        round(col("max_key_n") * col("n_keys") / col("n_rows"), 4)))
  }

  /** Equal-width value histogram — the distribution snapshot a
    * pipeline takes before picking thresholds or bucketing schemes.
    * `bins` uniform buckets over the data [min, max]; NULLs excluded;
    * a constant column collapses into bucket 0. Emits one row per
    * NON-EMPTY bucket: (bucket, lo, hi, n), bounds rounded 6dp.
    *
    * Scale: one min/max agg broadcast as a 1-row frame, one map-side
    * bucket assignment, one partial+final count by bucket (≤ bins
    * groups). The [[graft.operators.Layout]] Z-order bucket arithmetic
    * convention — same double expression order cross-engine. */
  def histogram(df: Df, valueCol: String, bins: Int = 20): Df = {
    require(bins >= 1, s"histogram: bins must be >= 1: $bins")
    val v = col(valueCol).cast("double")
    val mm = df.sdf.agg(min(v).as("__mn"), max(v).as("__mx"))
    val bucket = when(col("__mx") === col("__mn"), lit(0)).otherwise(
      least(greatest(
        floor((v - col("__mn")) / (col("__mx") - col("__mn")) * bins).cast("int"),
        lit(0)), lit(bins - 1)))
    val counts = df.sdf.where(col(valueCol).isNotNull)
      .crossJoin(broadcast(mm))
      .withColumn("bucket", bucket)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    new Df(counts.crossJoin(broadcast(mm))
      .withColumn("lo", round(
        col("__mn") + col("bucket") * (col("__mx") - col("__mn")) / bins, 6))
      .withColumn("hi", round(
        col("__mn") + (col("bucket") + 1) * (col("__mx") - col("__mn")) / bins, 6))
      .select(col("bucket"), col("lo"), col("hi"), col("n")))
  }

  /** Equi-DEPTH histogram — `buckets` quantile buckets (≈ equal row
    * counts) where [[histogram]] is equi-width: the right shape for
    * heavy-tailed pipeline stats (doc lengths, token counts) whose
    * equi-width version puts 99% of rows in bucket 0. Cuts are exact
    * interpolated percentiles at k/buckets (rounded 6dp, the
    * cross-engine quantile convention); a value lands in bucket
    * #cuts-strictly-below (the q173 `>` convention — deterministic on
    * ties); NULLs are excluded. Emits one row per non-empty bucket:
    * (bucket, n, lo, hi) with lo/hi the observed min/max.
    *
    * Scale: cuts via order-statistic selection
    * ([[graft.operators.Quantiles]] — bounded memory at any corpus
    * size) embedded as literals, one map-side bucket assignment, one
    * partial+final agg over ≤ buckets groups. */
  def equiDepthHistogram(df: Df, valueCol: String, buckets: Int): Df = {
    require(buckets >= 2, s"equiDepthHistogram: buckets must be >= 2: $buckets")
    val fr = (1 until buckets).map(_.toDouble / buckets)
    val cuts = graft.operators.Quantiles.cutLits(df.sdf, valueCol, fr)
    val v = col(valueCol).cast("double")
    val bucket = cuts.map(c => when(v > c, 1).otherwise(0)).reduce(_ + _)
    new Df(df.sdf.where(col(valueCol).isNotNull)
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(v).as("lo"), max(v).as("hi")))
  }

  /** Pairwise Pearson correlation in LONG form — (col_a, col_b, corr)
    * for every a < b pair. Rows with a NULL in ANY profiled column are
    * excluded (one common support for every pair — the listwise
    * convention). All five moments per pair come from EXACT decimal
    * sums (values DECIMAL(18,2)-exact, products DECIMAL(28,4)-exact —
    * quantize inputs accordingly), so the double formula is
    * bit-identical cross-engine; corr rounds to 6dp. A zero-variance
    * column yields NULL (0/0 guarded).
    *
    * Scale: ONE aggregation pass computes every sum; the pair table is
    * |cols|² driver-side literals over the single aggregated row. */
  def correlation(df: Df, cols: Seq[String]): Df = {
    require(cols.size >= 2, s"correlation: need >= 2 columns: $cols")
    require(cols.distinct.size == cols.size, s"correlation: duplicate column in $cols")
    val idx = cols.zipWithIndex
    val pairs = for { (a, i) <- idx; (b, j) <- idx if i < j } yield (a, i, b, j)
    val aggs = (count(lit(1)).as("__n") +: idx.flatMap { case (c, i) =>
      Seq(sum(col(c).cast("decimal(18,2)")).cast("double").as(s"__s$i"),
        sum((col(c) * col(c)).cast("decimal(28,4)")).cast("double").as(s"__q$i"))
    }) ++ pairs.map { case (a, i, b, j) =>
      sum((col(a) * col(b)).cast("decimal(28,4)")).cast("double").as(s"__p${i}_$j")
    }
    // FanOut: the decimal moment sums are the whole cost and a small
    // parquet file is a handful of scan partitions — spread the partial
    // aggregation across the session (planning no-op at real scale)
    val m = FanOut(df.sdf)
      .where(cols.map(col(_).isNotNull).reduce(_ && _))
      .agg(aggs.head, aggs.tail: _*)
    // ONE evaluation of the moment row (r21): the per-pair
    // `m.select(...)` union re-ran the full scan + aggregate once per
    // pair — O(k²) passes for k columns (measured: three concurrent
    // full-scan stages on q184). Exploding an array of per-pair structs
    // derives every correlation from a single aggregate evaluation.
    val pairStructs = pairs.map { case (a, i, b, j) =>
      val n = col("__n")
      val cov = n * col(s"__p${i}_$j") - col(s"__s$i") * col(s"__s$j")
      val va = n * col(s"__q$i") - col(s"__s$i") * col(s"__s$i")
      val vb = n * col(s"__q$j") - col(s"__s$j") * col(s"__s$j")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(va > 0 && vb > 0,
          round(cov / (sqrt(va) * sqrt(vb)), 6)).as("corr"))
    }
    new Df(m.select(explode(array(pairStructs: _*)).as("__r"))
      .select(col("__r.col_a"), col("__r.col_b"), col("__r.corr")))
  }

  /** Order-independent dataset fingerprint — ONE aggregate row that
    * identifies the content of `cols` regardless of row order or
    * partitioning: the reproducibility receipt a 100 TB curation run
    * logs after every stage (two runs produced byte-identical corpora
    * ⟺ fingerprints match; a lost/duplicated partition moves n_rows,
    * xor_sig AND sum_sig).
    *
    * Per row: canonical string = cols cast to string, NULL → chr(0)
    * sentinel (distinct from empty string), joined with chr(31) (the
    * ASCII unit separator — never in numeric/key casts); row hash =
    * md5 prefix. Emitted signatures, all order/partition-independent:
    *  - xor_sig: bit-XOR of 60-bit hashes (catches any single-row
    *    change; blind to even-multiplicity duplicates on its own)
    *  - sum_sig: exact DECIMAL(38,0) sum of the same hashes (catches
    *    the duplicate-pair case xor misses)
    *  - min_sig/max_sig: hash order statistics (cheap spot probes)
    *
    * CALLER CONTRACT: `cols` must cast to string identically across
    * engines that want to reproduce the fingerprint — integer/string/
    * date columns do; raw doubles may format differently (round or
    * decimal-cast them first).
    *
    * Scale: a single map-side expression + one partial+final aggregate
    * — no shuffle of data rows, no distinct, nothing driver-side. */
  def datasetFingerprint(df: Df, cols: Seq[String]): Df = {
    require(cols.nonEmpty, "datasetFingerprint: cols must be non-empty")
    val canon = concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val h60 = conv(substring(md5(canon.cast("binary")), 1, 15), 16, 10)
      .cast("long")
    // FanOut (r21): md5-per-row is the whole cost and a small parquet
    // file is a handful of scan partitions (planning no-op at scale)
    new Df(FanOut(df.sdf)
      .select(h60.as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_sig"),
        // STRING, not DECIMAL(38,0): wide decimals are hash-hostile in
        // downstream comparators (decimal128 canonicalization differs
        // across engines even when the values agree); the digest is an
        // opaque receipt, so its canonical decimal string is the
        // portable form.
        sum(col("__h").cast("decimal(38,0)")).cast("string").as("sum_sig"),
        min(col("__h")).as("min_sig"),
        max(col("__h")).as("max_sig")))
  }

  /** Population-stability-index drift between a BASELINE and a CURRENT
    * snapshot of a numeric column — the "did the incoming crawl's
    * length/score distribution move" monitor that gates a corpus
    * refresh. Equi-width bins derive from the BASELINE's [min, max]
    * (current values outside clamp to the edge bins — drift into the
    * tails is exactly what the edge bins must absorb, not drop);
    * per-bin psi_term = (p_cur − p_base)·ln(p_cur/p_base), with both
    * ratios floored at `eps` so empty bins contribute a finite term
    * (the standard PSI convention). PSI > 0.25 is the usual
    * "distribution shifted, investigate" threshold.
    *
    * Output: one row per occupied bin — (bin, n_base, n_cur, p_base,
    * p_cur, psi_term) — plus every row carries `psi_total` (the k-row
    * sum; k = `bins`, so the window is sketch-sized, not data-sized).
    *
    * Determinism: bin assignment is the same IEEE floor((x−min)/w) in
    * any engine; p's are exact-count divisions; ln goes through the
    * DECIMAL(18,8) libm-absorption cast and terms round 6dp.
    *
    * Scale: one min/max agg over baseline (broadcast 1-row), one
    * grouped count per snapshot (partial agg), a k-row join — no
    * data-sized shuffle beyond the two counts. */
  def psiDrift(baseline: Df, current: Df, valueCol: String,
               bins: Int = 10, eps: Double = 1e-6): Df = {
    require(bins >= 2, s"psiDrift: bins must be >= 2: $bins")
    val v = col(valueCol).cast("double")
    // a constant baseline has no bin width: unguarded, the bin division
    // is an unnamed ANSI DIVIDE_BY_ZERO deep in an executor (caught by
    // the psiDrift fuzz probe) — name the degenerate input instead
    // null-safe <=> : an EMPTY or all-null baseline aggregates to
    // max === min = NULL (not true), which would skip the raise and
    // silently degenerate every bin to NULL — name that input too
    val stats = baseline.sdf.agg(
      min(v).cast("double").as("__lo"),
      when(max(v) <=> min(v), raise_error(lit(
        "psiDrift: baseline column is constant or empty/all-null " +
          "(min <=> max) — no bin width to derive; PSI needs a " +
          "baseline with spread")))
        .otherwise(max(v).cast("double")).as("__hi"))
    def binned(df: Df) = df.sdf.where(v.isNotNull)
      .crossJoin(broadcast(stats))
      .select(least(greatest(
        floor((v - col("__lo")) / ((col("__hi") - col("__lo")) / bins)),
        lit(0.0)), lit((bins - 1).toDouble)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val a = binned(baseline).withColumnRenamed("n", "n_base")
    val b = binned(current).withColumnRenamed("n", "n_cur")
    val joined = a.join(b, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    val pB = greatest(col("n_base").cast("double") / sum("n_base").over(w),
      lit(eps))
    val pC = greatest(col("n_cur").cast("double") / sum("n_cur").over(w),
      lit(eps))
    val term = round((pC - pB) *
      log(pC / pB).cast("decimal(18,8)").cast("double"), 6)
    val detail = joined
      .withColumn("p_base", round(pB, 6)).withColumn("p_cur", round(pC, 6))
      .withColumn("psi_term", term)
    new Df(detail.withColumn("psi_total",
      round(sum(col("psi_term")).over(w), 6)))
  }

  /** Gaps-and-islands over a per-key integer sequence — the
    * completeness monitor for anything numbered at ingest (chunk
    * indices, shard counters, event ids): consecutive runs collapse to
    * one island row (key…, island_start, island_end, island_len), and
    * every hole in the sequence is the space between two islands. A
    * feed that "lost" a range shows up as a split island, not as a
    * silently smaller count.
    *
    * The classic rn-difference trick: within a key, `seq − row_number`
    * is constant exactly along consecutive runs, so islands are a
    * groupBy away. `seqCol` must be DISTINCT per key (duplicates shift
    * every later row's rn and split islands) — dedupe upstream.
    *
    * Scale: ONE exchange on the key; the window ranks within it and
    * the island aggregation groups on (key, run) — a superset of the
    * window partitioning, so Catalyst reuses the exchange instead of
    * shuffling again. Output is data-sized only in the worst
    * all-singletons case; monitored feeds are mostly-consecutive, so
    * islands ≪ rows. */
  def sequenceIslands(df: Df, keyCols: Seq[String], seqCol: String): Df = {
    require(keyCols.nonEmpty, "sequenceIslands: need at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    new Df(df.sdf
      .where(col(seqCol).isNotNull)
      .withColumn("__run", col(seqCol).cast("long") - row_number().over(w))
      .groupBy((keyCols :+ "__run").map(col): _*)
      .agg(min(col(seqCol)).cast("long").as("island_start"),
        max(col(seqCol)).cast("long").as("island_end"),
        count(lit(1)).as("island_len"))
      .drop("__run"))
  }

  /** Cohort retention triangle: entities grouped by FIRST-activity
    * period (`granularity`-truncated event time), counted once per
    * (cohort, periods-since-cohort) they were active in — the
    * "did the users we acquired in week N come back in week N+k"
    * health matrix every activity dataset gets asked for.
    *
    * Two shuffles, both key-bounded: min-ts per entity (partial+final
    * agg), then a distinct over (entity, offset) — the cohort table
    * joins back entity-keyed. Offsets are exact date_diff on truncated
    * times; no window, no driver state. */
  def cohortRetention(df: Df, entityCol: String, tsCol: String,
                      granularity: String = "day"): Df = {
    val unit = granularity.toLowerCase
    require(Set("day", "week", "month").contains(unit),
      s"cohortRetention: granularity must be day|week|month: $granularity")
    val period = (c: org.apache.spark.sql.Column) => date_trunc(unit, c)
    val firsts = df.sdf.groupBy(col(entityCol))
      .agg(min(period(col(tsCol))).as("cohort"))
    // offset counts PERIODS of the chosen granularity; both operands
    // are unit-truncated, so the divisions are exact
    val off = unit match {
      case "day"   => datediff(col("__p"), col("cohort"))
      case "week"  => (datediff(col("__p"), col("cohort")) / 7).cast("int")
      case "month" => months_between(col("__p"), col("cohort")).cast("int")
    }
    val active = df.sdf
      .select(col(entityCol), period(col(tsCol)).as("__p"))
      .join(firsts, Seq(entityCol))
      .select(col(entityCol), col("cohort"), off.as("offset"))
      .dropDuplicates(entityCol, "offset")
    new Df(active.groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_active")))
  }
}
