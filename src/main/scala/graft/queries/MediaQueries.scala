package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import QueryUtil._

/** Multimodal plumbing depth: frame-sample scheduling + perceptual-hash
  * near-dup grouping. q252–q253. The codec stays stubbed (container has
  * no image/audio libs); the SQL oracles replay the deterministic stub
  * byte-for-byte, so even the mapPartitions path is hash-checked. */
object MediaQueries {

  val defs: Map[String, Q] = Map(
    // ---- frame-sample schedule: the (media, frame) -> byte-offset
    // table a GPU decode stage consumes; sequence+explode, no UDF ----
    "q252_frame_sample" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val media = Multimodal.packMedia(
        d.where(col("doc_id") < 40), "doc_id", "text", "video/fake")
      Multimodal.frameSamplePlan(media, frames = 4)
        .sortValues(Seq("media_id", "frame_idx")).sdf
    }),

    // ---- perceptual-hash near-dup grouping over the stub features:
    // aHash bits (feature vs mean), then bucket census ----
    "q253_phash_groups" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val media = Multimodal.packMedia(
        d.where(col("doc_id") < 50), "doc_id", "text", "image/fake")
      val hashed = Multimodal.perceptualHash(
        Multimodal.extractFeatures(media, dim = 8))
      hashed.sdf.groupBy(col("phash"))
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("media_id")).as("keeper"))
        .orderBy("phash")
    }))

  /** DuckDB replay of stub feature k (byte histogram lane k): the same
    * float32 left-fold as [[Multimodal.FakeCodec.decodeToFeatures]] —
    * the q71 replay generalized to every lane. Safe on this subset:
    * every doc is ≥ 8 bytes, so no lane's range() is empty. */
  private def laneSql(k: Int): String =
    s"""(list_reduce(list_transform(range($k, length(text), 8),
       |   i -> (ascii(substr(text, (i+1)::INT, 1))::FLOAT / 255.0::FLOAT)),
       |  (a, b) -> a + b)
       | / GREATEST(1, length(text) // 8))::FLOAT""".stripMargin

  val oracles: Map[String, String] = Map(
    "q252_frame_sample" ->
      """SELECT doc_id AS media_id, length(text) AS n_bytes,
        |  f AS frame_idx,
        |  (length(text)::BIGINT * f // 4)::INT AS byte_offset
        |FROM documents, (VALUES (0), (1), (2), (3)) t(f)
        |WHERE doc_id < 40
        |ORDER BY media_id, frame_idx""".stripMargin,

    "q253_phash_groups" -> {
      val lanes = (0 until 8).map(k => s"${laneSql(k)} AS f$k").mkString(",\n")
      val sum = (0 until 8).map(k => s"f$k").mkString(" + ")
      val bits = (0 until 8)
        .map(k => s"CASE WHEN f$k::DOUBLE > m THEN ${1 << k} ELSE 0 END")
        .mkString(" + ")
      s"""WITH feats AS (
         |  SELECT doc_id,
         |$lanes
         |  FROM documents WHERE doc_id < 50),
         |withm AS (
         |  SELECT *, ($sum)::DOUBLE / 8.0 AS m FROM feats),
         |hashed AS (
         |  SELECT doc_id, ($bits) AS phash FROM withm)
         |SELECT phash, count(*)::BIGINT AS n, min(doc_id)::BIGINT AS keeper
         |FROM hashed GROUP BY phash ORDER BY phash""".stripMargin
    })
}
