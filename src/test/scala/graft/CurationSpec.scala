package graft

import graft.api.Df
import graft.operators.Curation
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the corpus-curation operators (PII, domains, line dedup,
  * char entropy). */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private def mkDocs(texts: (Long, String)*): Df =
    Df.fromRows(spark, texts.map { case (i, t) => Row(i, t) },
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("piiStats counts and redacts emails, IPs, and id numbers") {
    val d = mkDocs(
      1L -> "mail bob.smith+x@corp.example.com and 10.1.2.3 plus 123-45-6789 end",
      2L -> "no pii here at all")
    val out = Curation.piiStats(d, "text", "doc_id").sdf.orderBy("doc_id").collect()
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3)) == ((1, 1, 1)))
    assert(out(0).getString(4) == "mail <EMAIL> and <IP> plus <ID> end")
    assert((out(1).getInt(1), out(1).getInt(2), out(1).getInt(3)) == ((0, 0, 0)))
    assert(out(1).getString(4) == "no pii here at all")
  }

  test("dropByDomain removes docs linking a blocked host; NULL text is kept") {
    val d = Df.fromRows(spark, Seq(
      Row(1L, "see https://bad.example.com/x ok"),
      Row(2L, "see https://good.example.com/x ok"),
      Row(3L, "no links"),
      Row(4L, null)),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val kept = Curation.dropByDomain(d, "text", Seq("bad.example.com"))
      .sdf.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("extractDomains emits distinct hosts per doc") {
    val d = mkDocs(1L -> "x https://a.com/1 y http://a.com/2 z https://b.org/3")
    val doms = Curation.extractDomains(d, "text", "doc_id")
      .sdf.collect().map(_.getString(1)).toSet
    assert(doms == Set("a.com", "b.org"))
  }

  test("dedupLines keeps only the globally-first occurrence of each line") {
    val d = mkDocs(
      1L -> "alpha\nshared footer\nalpha", // 2nd alpha dups line 0 of SAME doc
      2L -> "beta\nshared footer",
      3L -> "shared footer") // every line seen before -> empty doc
    val out = Curation.dedupLines(d, "text", "doc_id")
      .sdf.orderBy("doc_id").collect()
    assert(out(0).getString(out(0).fieldIndex("text")) == "alpha\nshared footer")
    assert(out(0).getLong(out(0).fieldIndex("n_kept")) == 2L)
    assert(out(0).getLong(out(0).fieldIndex("n_lines")) == 3L)
    assert(out(1).getString(out(1).fieldIndex("text")) == "beta")
    assert(out(2).getString(out(2).fieldIndex("text")) == "")
    assert(out(2).getLong(out(2).fieldIndex("n_kept")) == 0L)
  }

  test("dedupLines: kept lines across the corpus are exactly the distinct lines") {
    val rng = new scala.util.Random(7)
    val docs = (0L until 40L).map { i =>
      i -> (0 until 5).map(_ => s"line ${rng.nextInt(30)}").mkString("\n")
    }
    val d = mkDocs(docs: _*)
    val out = Curation.dedupLines(d, "text", "doc_id").sdf.collect()
    val keptLines = out.flatMap { r =>
      val t = r.getString(r.fieldIndex("text"))
      if (t.isEmpty) Seq.empty[String] else t.split("\n").toSeq
    }
    val allLines = docs.flatMap(_._2.split("\n"))
    // every distinct line survives exactly once, nothing is invented
    assert(keptLines.sorted.toSeq == allLines.distinct.sorted.toSeq)
    // totals reconcile
    assert(out.map(r => r.getLong(r.fieldIndex("n_lines"))).sum == allLines.size.toLong)
    assert(out.map(r => r.getLong(r.fieldIndex("n_kept"))).sum == allLines.distinct.size.toLong)
  }

  test("charEntropy: 0 for single-char docs, ln 2 for two equal chars") {
    val d = mkDocs(1L -> "aaaa", 2L -> "abab")
    val out = Curation.charEntropy(d, "text", "doc_id")
      .sdf.orderBy("doc_id").collect()
    assert(out(0).getDouble(2) == 0.0)
    assert(math.abs(out(1).getDouble(2) - math.log(2.0)) < 1e-4)
    assert(out(1).getLong(1) == 4L)
  }

  test("curation ops plan without cartesian products or UDFs") {
    val d = mkDocs(1L -> "a\nb", 2L -> "b\nc")
    val plan = Curation.dedupLines(d, "text", "doc_id")
      .sdf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val pii = Curation.piiStats(d, "text", "doc_id")
      .sdf.queryExecution.executedPlan.toString
    assert(!pii.contains("BatchEvalPython") && !pii.toLowerCase.contains("scalaudf"))
    spark.catalog.clearCache()
  }
}
