package graft

import graft.api.Df
import graft.operators.Quality
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the Gopher rule-based quality battery
  * ([[graft.operators.Quality]]). */
class QualitySpec extends AnyFunSuite {
  import TestSpark._

  private def mkDocs(texts: (Long, String)*): Df =
    Df.fromRows(spark, texts.map { case (i, t) => Row(i, t) },
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  // a doc that passes every rule at the test thresholds
  private val goodText =
    "the cat sat on the mat and that dog ran with joy over every hill"

  private def stats(d: Df) =
    Quality.gopherQualityStats(d, "text", "doc_id",
      minWords = 5, maxWords = 100).sdf.orderBy("doc_id").collect()

  private def row(d: Df) = stats(d).head

  test("good prose passes all rules") {
    val r = row(mkDocs(1L -> goodText))
    assert(r.getAs[Long]("n_words") == 15)
    assert(r.getAs[Boolean]("keep"))
  }

  test("word-count floor and ceiling") {
    val rows = stats(mkDocs(
      1L -> "too short",
      2L -> Seq.fill(40)("the and of that").mkString(" ")))  // 160 words
    assert(rows.map(_.getAs[Boolean]("keep")).toSeq == Seq(false, false))
    assert(rows(1).getAs[Long]("n_words") == 160)
  }

  test("mean word length bounds in both directions") {
    val short = row(mkDocs(1L -> "a b c d e f the of"))        // 11/8 chars/word
    val long = row(mkDocs(1L -> ("the of " +
      Seq.fill(6)("extraordinarily").mkString(" "))))          // avg ~11.6
    assert(short.getAs[Double]("avg_word_len") == 1.375)
    assert(!short.getAs[Boolean]("keep"))
    assert(!long.getAs[Boolean]("keep"))
  }

  test("symbol ratio counts '#', '…' and non-overlapping '...'") {
    val r = row(mkDocs(1L -> "the of aa bb # # … ..... x"))
    // 9 words; symbols: 2 hashes + 1 ellipsis-char + 1 '...' (5 dots
    // hold one non-overlapping triple)
    assert(r.getAs[Long]("n_words") == 9)
    assert(r.getAs[Double]("symbol_word_ratio") == math.round(4.0 / 9 * 1e6) / 1e6)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("bullet and ellipsis line fractions") {
    val bullets = row(mkDocs(1L ->
      "the of good line\n• one\n• two\n- three\n•four"))
    // 4 of 5 lines are bullets ('- three' counts, '•four' counts)
    assert(bullets.getAs[Double]("bullet_line_fraction") == 0.8)
    val ellipses = row(mkDocs(1L -> "the of fine\nmore...\ntrailing…"))
    assert(ellipses.getAs[Double]("ellipsis_line_fraction") ==
      math.round(2.0 / 3 * 1e6) / 1e6)
    assert(!ellipses.getAs[Boolean]("keep"))
  }

  test("alpha-word fraction and stopword count rules") {
    val numeric = row(mkDocs(1L -> "the of 111 222 333 444 x1 22"))
    // words with a letter: the, of, x1 -> 3/8
    assert(numeric.getAs[Double]("alpha_word_fraction") == 0.375)
    assert(!numeric.getAs[Boolean]("keep"))
    val noStops = row(mkDocs(1L -> "cat sat mat dog ran hill joy"))
    assert(noStops.getAs[Long]("n_stopwords") == 0)
    assert(!noStops.getAs[Boolean]("keep"))
  }

  test("empty and token-less docs fail closed with NULL ratios") {
    val rows = stats(mkDocs(1L -> "", 2L -> "   "))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") == 0)
      assert(r.isNullAt(r.fieldIndex("avg_word_len")))
      assert(r.isNullAt(r.fieldIndex("alpha_word_fraction")))
      assert(!r.getAs[Boolean]("keep"))
    }
  }

  test("gopherQualityFilter is the same verdict as a row filter") {
    val d = mkDocs(1L -> goodText, 2L -> "too short", 3L -> (goodText + " more"))
    val kept = Quality.gopherQualityFilter(d, "text",
      minWords = 5, maxWords = 100).sdf.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
    // filter returns the ORIGINAL columns, not the stats projection
    assert(Quality.gopherQualityFilter(d, "text", minWords = 5, maxWords = 100)
      .sdf.columns.toSeq == Seq("doc_id", "text"))
  }

  test("repetition: duplicate lines counted by instance and by chars") {
    val d = mkDocs(1L -> "base line\ndup\ndup\ndup")
    val out = Quality.gopherRepetitionStats(d, "text", "doc_id")
    val r = out.sdf.collect().head
    out.unpersistIntermediates()
    // 4 lines, 2 distinct -> 2 dup instances; chars 18 total, 6 dup
    assert(r.getAs[Double]("dup_line_fraction") == 0.5)
    assert(r.getAs[Double]("dup_line_char_fraction") == math.round(6.0 / 18 * 1e6) / 1e6)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("repetition: top 2-gram char fraction is count x gram token chars") {
    val d = mkDocs(1L -> "x y x y x y")
    val out = Quality.gopherRepetitionStats(d, "text", "doc_id")
    val r = out.sdf.collect().head
    out.unpersistIntermediates()
    // "x y" occurs 3x, 2 token chars -> 6 / 6 total token chars
    assert(r.getAs[Double]("top_ngram_char_fraction") == 1.0)
    // the two distinct 5-windows are unique -> no dup coverage
    assert(r.getAs[Double]("dup_ngram_char_fraction") == 0.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("repetition: duplicated 5-window union covers both instances") {
    val d = mkDocs(1L -> "a b c d e a b c d e")
    val out = Quality.gopherRepetitionStats(d, "text", "doc_id")
    val r = out.sdf.collect().head
    out.unpersistIntermediates()
    // window (a b c d e) duplicates at starts 0 and 5 -> positions
    // 0-4 and 5-9 union to all ten 1-char tokens
    assert(r.getAs[Double]("dup_ngram_char_fraction") == 1.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("repetition: clean and empty docs keep; count-1 top gram still scores") {
    // 20 distinct 3-char tokens: the top 2-gram has count 1 and
    // 6 token chars -> 6/60 (the metric never reads zero on a
    // non-empty doc; the threshold does the work)
    val clean = (1 to 20).map(i => f"t$i%02d").mkString(" ")
    val d = mkDocs(1L -> clean, 2L -> "")
    val out = Quality.gopherRepetitionStats(d, "text", "doc_id")
    val rows = out.sdf.orderBy("doc_id").collect()
    out.unpersistIntermediates()
    val r1 = rows(0)
    assert(r1.getAs[Double]("dup_line_fraction") == 0.0)
    assert(r1.getAs[Double]("top_ngram_char_fraction") == 0.1)
    assert(r1.getAs[Double]("dup_ngram_char_fraction") == 0.0)
    assert(r1.getAs[Boolean]("keep"))
    val r2 = rows(1)
    assert(r2.getAs[Long]("n_tokens") == 0L)
    assert(r2.getAs[Double]("top_ngram_char_fraction") == 0.0)
    assert(r2.getAs[Boolean]("keep"))
  }

  test("knob validation fails fast") {
    val d = mkDocs(1L -> goodText)
    intercept[IllegalArgumentException] {
      Quality.gopherQualityStats(d, "text", "doc_id", minWords = 10, maxWords = 5)
    }
    intercept[IllegalArgumentException] {
      Quality.gopherQualityStats(d, "text", "doc_id", stopwords = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Quality.gopherRepetitionStats(d, "text", "doc_id", topN = 0)
    }
  }
}
