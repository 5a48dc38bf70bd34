package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated quantiles — order-statistic
  * selection instead of a value buffer.
  *
  * Spark's `percentile` aggregate (and DuckDB's `quantile_cont`)
  * interpolate between the floor/ceil order statistics of
  * h = p·(n−1). The aggregate gets there by accumulating EVERY
  * (value → count) into one final aggregation buffer — fine at
  * sf0.1, a single-executor memory wall at 100 TB. This operator
  * computes the same doubles with bounded memory everywhere:
  *
  *  1. range-partition the (non-null, double-cast) values — Spark's
  *     range exchange already orders partitions globally;
  *  2. one job counts rows per partition (P longs to the driver —
  *     never data);
  *  3. the driver maps each needed global order statistic to
  *     (partition, local index) and broadcasts the want-list;
  *  4. a second job over the SAME shuffled RDD (exchange reused)
  *     sorts ONLY the partitions that host a target and emits the
  *     selected elements — ≤ 2·|probs| partitions do any work.
  *
  * NaN sorts greatest in the range exchange, `Arrays.sort`, and the
  * `percentile` aggregate alike, so parity holds on NaN-bearing
  * columns too; nulls are excluded like any SQL aggregate. Returns
  * null (boxed) per prob when no rows survive — the callers keep
  * their existing empty-input contracts. */
object Quantiles {

  /** [[exactQuantilesCont]] + the cross-engine 6dp SQL-HALF-UP round
    * (the convention every quantile-cut operator replays in its DuckDB
    * oracle), embedded as literal Columns — callers clip/bucket against
    * these directly, with no 1-row crossJoin node in the plan. */
  def cutLits(df: DataFrame, c: String,
              probs: Seq[Double]): Seq[org.apache.spark.sql.Column] =
    exactQuantilesCont(df, c, probs).map { v =>
      if (v == null) lit(null).cast("double")
      else lit(BigDecimal(v.doubleValue())
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

  def exactQuantilesCont(df: DataFrame, c: String,
                         probs: Seq[Double]): Seq[java.lang.Double] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"exactQuantilesCont: probs in [0,1]: $probs")
    val vals = df.select(col(c).cast("double").as("__v"))
      .where(col("__v").isNotNull)
    val ranged = vals.repartitionByRange(col("__v").asc)
    val rdd = ranged.rdd // ONE RDD: the range exchange feeds both jobs
    val counts = rdd.mapPartitionsWithIndex { (p, it) =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(p -> n)
    }.collect().toMap
    val nParts = rdd.getNumPartitions
    val n = counts.valuesIterator.sum
    if (n == 0) return probs.map(_ => null: java.lang.Double)

    // global 0-based order statistics needed: floor/ceil of p·(n−1)
    val targets: Seq[Long] = probs.flatMap { p =>
      val h = p * (n - 1)
      Seq(math.floor(h).toLong, math.ceil(h).toLong)
    }.distinct.sorted
    // prefix-sum the partition counts to locate each target
    val starts = new Array[Long](nParts)
    var acc = 0L
    (0 until nParts).foreach { p =>
      starts(p) = acc; acc += counts.getOrElse(p, 0L)
    }
    val wants: Map[Int, Seq[(Long, Int)]] = targets.map { g =>
      // last partition whose start ≤ g (counts can be zero — skip back)
      var p = java.util.Arrays.binarySearch(starts, g) match {
        case i if i >= 0 => i
        case i => -i - 2
      }
      while (counts.getOrElse(p, 0L) == 0L || g >= starts(p) + counts(p)) p += 1
      g -> (p, (g - starts(p)).toInt)
    }.groupBy(_._2._1).map { case (p, xs) =>
      p -> xs.map { case (g, (_, li)) => (g, li) }
    }
    val bc = df.sparkSession.sparkContext.broadcast(wants)
    val picked: Map[Long, Double] = rdd.mapPartitionsWithIndex { (p, it) =>
      bc.value.get(p) match {
        case None => Iterator.empty
        case Some(ws) =>
          val arr = it.map(_.getDouble(0)).toArray
          java.util.Arrays.sort(arr) // NaN last, like the range sort
          ws.iterator.map { case (g, li) => g -> arr(li) }
      }
    }.collect().toMap
    probs.map { p =>
      val h = p * (n - 1)
      val lo = picked(math.floor(h).toLong)
      val hi = picked(math.ceil(h).toLong)
      java.lang.Double.valueOf(lo + (h - math.floor(h)) * (hi - lo))
    }
  }
}
