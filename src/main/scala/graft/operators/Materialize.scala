package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization barrier for persisted multi-consumer frames.
  *
  * `persist()` alone is lazy: when the FIRST action's plan references the
  * persisted frame from several sibling subtrees (self-join sides,
  * verification lookups), AQE materializes those query stages
  * CONCURRENTLY, and every one of them computes the full upstream
  * pipeline — the cache is being written n times in parallel, not read
  * (measured r21, q107: the shingle+hash pass ran 4× concurrently,
  * 31 task-seconds on 0.2 MB of input; the BlockManager's "block already
  * exists; not re-adding" warning is this exact race). One cheap count()
  * between persist() and the consumers turns n concurrent computations
  * into one computation + n cache reads — at any scale, including a
  * cluster, where the n-fold pass would be n full passes over the corpus.
  *
  * The count materializes EVERY persisted frame in its lineage in the
  * same job, so one barrier on the downstream-most frame of a persisted
  * chain suffices. The job is part of the caller's query cost (operators
  * run it at construction, inside any timing of the query), and the
  * blocks are released through the same attach/retaining contract as the
  * persists themselves.
  */
private[graft] object Materialize {
  /** Run one counting pass so `df`'s persisted blocks (and those of any
    * persisted frame upstream of it) exist before sibling consumers plan
    * against them. Returns `df` for chaining. */
  def barrier(df: DataFrame): DataFrame = { df.count(); df }
}
