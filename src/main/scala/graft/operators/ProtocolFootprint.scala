package graft.operators

/** Driver-coordination footprint of the LAST protocol run in this JVM —
  * measured evidence for the O(partitions × groups) driver-state
  * ceilings the two-pass protocols carry ([[GroupedScan]] summaries,
  * [[Quantiles]] per-(partition, group) count maps).
  * `graft.BenchDriverCoord` runs the protocol-heavy queries across
  * scale factors and partition counts and reads these slots to turn
  * the documented formulas into numbers (BENCHLOG round 16).
  *
  * Each slot is (partitions, entries, serializedBytes). Entry counts
  * are recorded on every run (two volatile writes); the BYTES
  * measurement java-serializes the collected driver state, so it only
  * runs when `-Dgraft.protocolFootprint=true` — production calls pay
  * nothing for the diagnostic. */
object ProtocolFootprint {
  @volatile private[graft] var lastGroupedScan: Option[(Int, Int, Long)] = None
  @volatile private[graft] var lastQuantiles: Option[(Int, Int, Long)] = None

  private def measureBytes: Boolean =
    java.lang.Boolean.getBoolean("graft.protocolFootprint")

  private[operators] def footprint(partitions: Int, entries: Int,
                                   data: => AnyRef): (Int, Int, Long) =
    (partitions, entries, if (measureBytes) bytesOf(data) else -1L)

  /** java-serialized size of the driver-side state — the same order of
    * magnitude as what `collect()` shipped over the wire. -1 when the
    * state isn't serializable (never the case for protocol summaries,
    * but a diagnostic must not throw). */
  private def bytesOf(o: AnyRef): Long = {
    val bos = new java.io.ByteArrayOutputStream
    try {
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o)
      oos.flush()
      bos.size().toLong
    } catch { case scala.util.control.NonFatal(_) => -1L }
  }
}
