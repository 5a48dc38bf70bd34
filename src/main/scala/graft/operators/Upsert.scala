package graft.operators

import graft.api.Df
import org.apache.spark.sql.functions._

/** Change-data-capture snapshot maintenance: fold a CHANGES set
  * (upserts + tombstones) into a BASE snapshot, latest version wins.
  * This is the nightly "apply the crawl delta to the corpus" move — at
  * 100 TB you re-materialize the snapshot from base+delta in one
  * shuffle, you never mutate in place.
  *
  * Physical shape: union → hash-aggregate on the key with a `max_by`
  * over a (version, priority) struct. The aggregate is partial —
  * map-side combine collapses multi-change keys BEFORE the shuffle, so
  * the shuffle carries at most one row per (partition, key), not one
  * per change. A window row_number would sort whole partitions for the
  * same answer; max_by's monoid does it cheaper at scale.
  */
object Upsert {

  /** Apply `changes` to `base`, both keyed by `keys`.
    *
    *  - `versionCol` (numeric/orderable) decides the winner per key —
    *    highest wins; on a version TIE a change beats a base row
    *    (re-applying a delta is then idempotent).
    *  - `deletedCol` (boolean) on `changes` marks tombstones: if the
    *    winning row is a tombstone the key disappears from the result.
    *    Base rows are never tombstones.
    *
    * Output: the surviving rows with base's columns + `versionCol`
    * (tombstone/priority bookkeeping dropped). Columns shared by both
    * inputs are taken from the winner; `changes` may carry a subset of
    * base's payload columns — absent ones inherit nulls only if the
    * caller pre-fills them, so pass complete rows for full-row
    * semantics (partial-column patching is a different operator).
    */
  def applyChanges(base: Df, changes: Df, keys: Seq[String],
                   versionCol: String, deletedCol: String): Df = {
    require(keys.nonEmpty, "applyChanges: at least one key column")
    val payload = base.sdf.columns.toSeq :+ deletedCol
    val b = base.sdf
      .withColumn(deletedCol, lit(false)).withColumn("__pri", lit(0))
    val c = changes.sdf.withColumn("__pri", lit(1))
    val all = b.select((payload :+ "__pri").map(col): _*)
      .unionByName(c.select((payload :+ "__pri").map(col): _*))
    val winner = all
      .groupBy(keys.map(col): _*)
      .agg(max_by(
        struct(payload.filterNot(keys.contains).map(col): _*),
        struct(col(versionCol), col("__pri"))).as("__w"))
      .select(keys.map(col) ++
        payload.filterNot(keys.contains).map(n => col(s"__w.$n").as(n)): _*)
    new Df(winner.where(!col(deletedCol)).drop(deletedCol))
  }

  /** Incremental JOIN maintenance — the delta-view identity
    * `(L∪ΔL)⋈(R∪ΔR) = L⋈R ∪ ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR`: given the
    * already-materialized old join and the two deltas, produce the NEW
    * rows only. At 100 TB the payoff is the join sizes: every term
    * touches at least one DELTA side (delta-sized shuffle, broadcast
    * when small), and the full L⋈R — the expensive one — is never
    * recomputed. Append-only deltas (the log-ingest shape); updates
    * and deletes route through [[applyChanges]] first. */
  def incrementalJoinDelta(oldLeft: Df, deltaLeft: Df,
                           oldRight: Df, deltaRight: Df,
                           on: Seq[String]): Df = {
    val dlR = deltaLeft.sdf.join(oldRight.sdf, on)
    val lDr = oldLeft.sdf.join(deltaRight.sdf, on)
    val dlDr = deltaLeft.sdf.join(deltaRight.sdf, on)
    // column order must agree across branches for unionAll
    val cols = dlR.columns.map(col).toIndexedSeq
    new Df(dlR.select(cols: _*)
      .unionAll(lDr.select(cols: _*))
      .unionAll(dlDr.select(cols: _*)))
  }

  /** SCD Type-2 dimension build from a change history: one row per
    * (key, version) with its validity interval — `valid_from` = the
    * change's own timestamp, `valid_to` = the NEXT change's (null while
    * current), `is_current` on the open row. ONE window pass per key
    * (lead over the change order); ties on the timestamp break on
    * `versionCol` so replays are deterministic. The point-in-time
    * lookup this table serves ("what did the dimension say when this
    * event happened") is then [[graft.api.Df.asofJoin]] or a
    * `valid_from <= ts < valid_to` range join — never a correlated
    * subquery per event. */
  def scd2(history: Df, keys: Seq[String], tsCol: String,
           versionCol: String): Df = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(history.sdf(_)): _*)
      .orderBy(history.sdf(tsCol).asc, history.sdf(versionCol).asc)
    new Df(history.sdf
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", lead(col(tsCol), 1).over(w).isNull))
  }
}
