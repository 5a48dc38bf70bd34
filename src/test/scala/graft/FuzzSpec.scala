package graft

import graft.api.Df
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based differential tests (SURVEY.md §5 plan item c):
  * wrapper ops vs independently-computed expectations over random
  * frames, covering null/NaN and empty-frame edges the fixed fixtures
  * miss. */
class FuzzSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  import TestSpark._

  // cross-suite block-accounting hygiene (the cache-lifetime contract
  // test asserts a clean slate): drain whatever this suite retained
  override def afterAll(): Unit = Df.releaseRetained()

  /** draw n deterministic-ish samples from a generator (scalacheck's
    * scalatest bridge is not on the offline classpath) */
  // GRAFT_FUZZ_TRIALS multiplies the per-test draw count for one-off
  // robustness sweeps (unset -> 1, the committed default)
  private val trialMult = sys.env.get("GRAFT_FUZZ_TRIALS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1)
  private def trials[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(42L)
    var s = seed
    (0 until n * trialMult).foreach { _ =>
      g.apply(org.scalacheck.Gen.Parameters.default, s).foreach(body)
      s = s.next
    }
  }

  private val values: Gen[java.lang.Double] = Gen.frequency(
    (8, Gen.choose(-1000.0, 1000.0).map(java.lang.Double.valueOf)),
    (1, Gen.const(null.asInstanceOf[java.lang.Double])),
    (1, Gen.const(java.lang.Double.valueOf(Double.NaN))))

  private def mkDf(xs: List[java.lang.Double]): Df =
    Df.fromRows(spark, xs.map(Row(_)),
      StructType(Seq(StructField("v", DoubleType))))

  test("fillna never leaves missing values; count matches non-missing") {
    trials(Gen.listOfN(30, values)) { xs =>
      val d = mkDf(xs)
      // pandas missing = null or NaN
      val missing = d(d("v").isna).count()
      val expectMissing = xs.count(x => x == null || x.isNaN)
      assert(missing == expectMissing)
      val filled = d.assign("v", d("v").isna.astype("int"))
        .sdf.agg(sum("v")).collect()(0).getLong(0)
      assert(filled == expectMissing)
    }
  }

  test("clip bounds hold for every surviving value") {
    trials(Gen.listOfN(25, values)) { xs =>
      val d = mkDf(xs)
      val out = d.assign("c", d("v").clip(-10, 10))
        .sdf.select("c").collect().map(r => Option(r.get(0)))
      out.flatten.foreach { v =>
        val dv = v.asInstanceOf[Double]
        assert(dv.isNaN || (dv >= -10 && dv <= 10))
      }
    }
  }

  test("dropDuplicates is idempotent and bounded by distinct count") {
    trials(Gen.listOfN(40, Gen.choose(0L, 5L))) { xs =>
      val d = Df.fromRows(spark, xs.map(Row(_)),
        StructType(Seq(StructField("k", LongType))))
      val once = d.dropDuplicates()
      assert(once.count() == xs.distinct.size)
      assert(once.dropDuplicates().count() == xs.distinct.size)
    }
  }

  test("sum over decimal cast equals exact rational sum") {
    trials(Gen.listOfN(30, Gen.choose(-99999, 99999))) { cents =>
      val xs = cents.map(c => c / 100.0)
      val d = mkDf(xs.map(java.lang.Double.valueOf))
      val got = d.agg(sum(col("v").cast("decimal(18,2)")).cast("double"))
        .compute()(0).getDouble(0)
      val exact = cents.map(BigDecimal(_)).sum / 100
      assert(math.abs(got - exact.toDouble) == 0.0)
    }
  }

  test("empty frame: aggregates null/zero, ops no-throw") {
    val d = mkDf(Nil)
    val r = d.agg(sum(col("v")).as("s"), count(col("v")).as("c")).compute()(0)
    assert(r.isNullAt(0) && r.getLong(1) == 0)
    assert(d.dropDuplicates().count() == 0)
    assert(d(d("v").isna).count() == 0)
  }

  // ---- text/dedup operator properties over random corpora ----

  private val word: Gen[String] = Gen.choose(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc: Gen[List[String]] = Gen.choose(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.frequency((5, word), (1, Gen.const("the")))))

  private def mkTextDf(docs: Seq[(Long, String)]): Df =
    Df.fromRows(spark, docs.map { case (i, t) => Row(i, t) },
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("fingerprint: permutation+duplication invariant, content sensitive (random docs)") {
    import graft.functions.TextFunctions._
    // precondition: head+"x" must not already be a token, else `changed`
    // has the SAME token set and the sensitivity assert would misfire
    trials(doc.suchThat(ts => ts.nonEmpty && !ts.contains(ts.head + "x")),
      n = 8) { toks =>
      val seed = new scala.util.Random(toks.hashCode)
      val shuffled = seed.shuffle(toks ++ toks.take(toks.size / 2))
      val changed = toks.updated(0, toks.head + "x")
      val d = mkTextDf(Seq(1L -> toks.mkString(" "),
        2L -> shuffled.mkString("  "), 3L -> changed.mkString(" ")))
      val fps = d.sdf.orderBy("doc_id")
        .select(fingerprint(col("text"))).collect().map(_.getString(0))
      assert(fps(0) == fps(1))   // order/dup/whitespace insensitive
      assert(fps(0) != fps(2))   // content sensitive
    }
  }

  test("chunkTokens conserves coverage for random sizes and overlaps") {
    trials(for {
      toks <- doc.suchThat(_.nonEmpty)
      size <- Gen.choose(2, 12)
      ov <- Gen.choose(0, size - 1)
    } yield (toks, size, ov), n = 10) { case (toks, size, ov) =>
      val d = mkTextDf(Seq(1L -> toks.mkString(" ")))
      val rows = graft.operators.TextAnalytics
        .chunkTokens(d, "text", "doc_id", size, ov)
        .sdf.orderBy("chunk_id").collect()
        .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
      // reference: driver-side re-implementation of the contract
      val step = size - ov
      val starts = 0 to math.max(toks.size - ov - 1, 0) by step
      val expect = starts.zipWithIndex.map { case (s, i) =>
        val c = toks.slice(s, s + size); (i, c.mkString(" "), c.size) }
      assert(rows.toSeq == expect)
      // every token position is covered by at least one chunk
      val covered = starts.flatMap(s => s until math.min(s + size, toks.size)).toSet
      assert(covered == toks.indices.toSet)
    }
  }

  test("l2Normalize is idempotent and preserves direction (random vectors)") {
    import graft.functions.VectorFunctions._
    val vec: Gen[List[Float]] = Gen.choose(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0f, 100.0f)))
    trials(vec.suchThat(v => v.exists(_ != 0.0f)), n = 8) { v =>
      val d = Df.fromRows(spark, Seq(Row(1L, v)),
        StructType(Seq(StructField("id", LongType),
          StructField("e", ArrayType(FloatType)))))
      val once = d.sdf.select(l2Normalize(col("e")).as("u"))
      val r = once.select(norm(col("u")).as("n"),
        round(cosine(col("u").cast("array<float>"), lit(v.toArray)), 9).as("c"))
        .collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)  // unit norm
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)  // same direction
    }
  }

  test("splitByHash fraction monotone: larger fraction is a superset (random keys)") {
    trials(Gen.listOfN(40, Gen.choose(0L, 1000000L)).map(_.distinct), n = 5) { keys =>
      val d = Df.fromRows(spark, keys.map(Row(_)),
        StructType(Seq(StructField("k", LongType))))
      def hold(f: Double) = d.splitByHash("k", f).sdf
        .where(col("split") === "holdout").select("k")
        .collect().map(_.getLong(0)).toSet
      val small = hold(0.1); val big = hold(0.5)
      assert(small.subsetOf(big))  // buckets nest: stable as quotas grow
    }
  }

  // ---- curation-wave operator properties (VERDICT r6 item 6) ----

  test("dedupLines: every distinct line survives exactly once, at its first occurrence (random corpora)") {
    // docs draw lines from a SMALL pool so cross-doc duplicates are
    // guaranteed; the reference implementation is the C4 rule verbatim
    val linePool: Gen[List[String]] = Gen.choose(3, 7).flatMap(n =>
      Gen.listOfN(n, word).map(_.distinct))
    val corpus: Gen[List[List[String]]] = for {
      pool <- linePool
      nDocs <- Gen.choose(1, 6)
      docs <- Gen.listOfN(nDocs,
        Gen.choose(1, 5).flatMap(k => Gen.listOfN(k, Gen.oneOf(pool))))
    } yield docs
    trials(corpus, n = 8) { docLines =>
      val docs = docLines.zipWithIndex.map { case (ls, i) =>
        i.toLong -> ls.mkString("\n") }
      val d = mkTextDf(docs)
      val res = graft.operators.Curation.dedupLines(d, "text", "doc_id")
      val out = res.sdf.collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        (r.getLong(r.fieldIndex("n_lines")), r.getLong(r.fieldIndex("n_kept")),
          r.getString(r.fieldIndex("text")))).toMap
      res.unpersistIntermediates()
      // reference: first occurrence = min (doc_id, pos) per line
      val occ = docLines.zipWithIndex.flatMap { case (ls, i) =>
        ls.zipWithIndex.map { case (l, p) => (l, i.toLong, p) } }
      val firstOf = occ.groupBy(_._1).map { case (l, os) =>
        l -> os.map(o => (o._2, o._3)).min }
      docLines.zipWithIndex.foreach { case (ls, i) =>
        val expectKept = ls.zipWithIndex.collect {
          case (l, p) if firstOf(l) == ((i.toLong, p)) => l }
        val (nLines, nKept, text) = out(i.toLong)
        assert(nLines == ls.size && nKept == expectKept.size)
        val gotLines = if (text.isEmpty) Nil else text.split("\n").toList
        assert(gotLines == expectKept) // original order, first copies only
      }
    }
  }

  test("packSequences: within-shard prefix packing and input-order stability (random corpora)") {
    val corpus: Gen[List[Int]] =          // token count per doc
      Gen.choose(3, 25).flatMap(n => Gen.listOfN(n, Gen.choose(0, 30)))
    trials(for { c <- corpus; b <- Gen.choose(3, 40) } yield (c, b), n = 8) {
      case (tokCounts, budget) =>
        val docs = tokCounts.zipWithIndex.map { case (k, i) =>
          i.toLong -> List.fill(k)("w").mkString(" ") }
        val d = mkTextDf(docs)
        def run(input: Df) = graft.operators.Curation
          .packSequences(input, "text", "doc_id", budget = budget, shards = 4)
          .sdf.collect().map(r => (r.getLong(r.fieldIndex("doc_id")),
            r.getLong(r.fieldIndex("n_tokens")),
            r.getInt(r.fieldIndex("shard")), r.getLong(r.fieldIndex("pack"))))
        val rows = run(d)
        assert(rows.map(_._1).toSet == docs.map(_._1).toSet)
        rows.foreach { case (id, nt, _, _) => assert(nt == tokCounts(id.toInt).toLong) }
        // the packing contract, per shard: pack = prefix-before div budget
        rows.groupBy(_._3).values.foreach { shardRows =>
          var prefix = 0L
          shardRows.sortBy(_._1).foreach { case (_, nt, _, pack) =>
            assert(pack == prefix / budget)   // monotone by construction
            prefix += nt
          }
        }
        // stability: a reshuffled input yields the identical assignment
        val reshuffled = run(new Df(d.sdf.repartition(7).orderBy(rand(1))))
        assert(reshuffled.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    }
  }

  test("mixCorpora: never upsamples, drops unweighted sources, hits target mix within tolerance") {
    val corpus: Gen[Map[String, Int]] = for {
      nEn <- Gen.choose(50, 300); nDe <- Gen.choose(50, 300)
      nFr <- Gen.choose(50, 300); nZz <- Gen.choose(0, 50)
    } yield Map("en" -> nEn, "de" -> nDe, "fr" -> nFr, "zz" -> nZz)
    val weights = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2)
    trials(corpus, n = 6) { counts =>
      val rows = counts.toList.flatMap { case (lang, n) =>
        (0 until n).map(i => (s"$lang-$i".hashCode.toLong & 0xFFFFFFL, lang)) }
      val d = Df.fromRows(spark, rows.map { case (i, l) => Row(i, l) },
        StructType(Seq(StructField("doc_id", LongType), StructField("lang", StringType))))
      val kept = graft.operators.Curation
        .mixCorpora(d, "lang", "doc_id", weights)
        .sdf.collect().map(r => (r.getString(r.fieldIndex("lang")),
          r.getLong(r.fieldIndex("doc_id"))))
      val keptBy = kept.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      assert(!keptBy.contains("zz"))                     // unweighted → dropped
      val t = weights.map { case (l, w) => counts(l) / w }.min
      weights.foreach { case (l, w) =>
        val got = keptBy.getOrElse(l, 0L)
        assert(got <= counts(l))                         // never upsampled
        val target = w * t                               // feasible target share
        assert(math.abs(got - target) <= 6 * math.sqrt(target) + 3,
          s"$l: got $got, target $target (counts=$counts)")
      }
      // output rows are a subset of the input rows
      assert(kept.map(_._2).toSet.subsetOf(rows.map(_._1).toSet))
    }
  }

  test("editDistancePairs matches a reference Levenshtein; threshold boundary is exact (random strings)") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val tiny: Gen[String] = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val gen = for {
      texts <- Gen.listOfN(5, tiny)
      maxDist <- Gen.choose(0, 5)
    } yield (texts, maxDist)
    trials(gen, n = 8) { case (texts, maxDist) =>
      val docs = mkTextDf(texts.zipWithIndex.map { case (t, i) => i.toLong -> t })
      val cand = Df.fromRows(spark,
        (for (a <- texts.indices; b <- texts.indices if a < b)
          yield Row(a.toLong, b.toLong)),
        StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
      val got = graft.operators.Dedup
        .editDistancePairs(cand, docs, "text", "doc_id", maxDist)
        .sdf.collect().map(r =>
          ((r.getLong(r.fieldIndex("id_a")), r.getLong(r.fieldIndex("id_b"))),
            (r.getInt(r.fieldIndex("edit_dist")), r.getDouble(r.fieldIndex("edit_sim"))))).toMap
      val expect = (for {
        a <- texts.indices; b <- texts.indices if a < b
        d = lev(texts(a), texts(b)) if d <= maxDist  // == maxDist kept, +1 dropped
      } yield {
        val maxLen = math.max(texts(a).length, texts(b).length)
        val sim = if (maxLen == 0) 1.0
          else BigDecimal(1.0 - d.toDouble / maxLen)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a.toLong, b.toLong) -> ((d, sim))
      }).toMap
      assert(got == expect)
    }
  }

  test("normalizeUrl is idempotent over random structured URLs") {
    // the canonicalizer contract: a second pass changes nothing —
    // catches any rewrite whose output re-matches an earlier rule
    // (www runs, slash runs, separator cleanup)
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HtTpS")
      wwws <- Gen.choose(0, 2)
      host <- Gen.oneOf("Ex.COM", "a.b.org", "x1.example.net",
        "www.com", "WWW.www.Com", "www.%65x.com")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("A", "p", "q2", "",
          "%7e", "%2f", "%aB", "a%41b", "%2525", "%%341", "%%34a")))
      trail <- Gen.oneOf("", "/", "//")
      params <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n,
        Gen.oneOf("utm_source=x", "utm_a=", "a=1", "b=2", "gclid=g", "fbclid=f")))
      frag <- Gen.oneOf("", "#s", "#a#b")
    } yield {
      val path = if (segs.isEmpty) "" else segs.mkString("/", "/", "")
      val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
      s"$scheme://${"www." * wwws}$host$port$path$trail$query$frag"
    }
    trials(Gen.listOfN(25, urlGen), n = 6) { urls =>
      val d = Df.fromRows(spark, urls.zipWithIndex.map { case (u, i) => Row(i.toLong, u) },
        StructType(Seq(StructField("id", LongType), StructField("url", StringType))))
      val once = graft.operators.Curation.normalizeUrl(col("url"))
      val rows = d.sdf.select(once.as("u1"),
        graft.operators.Curation.normalizeUrl(once).as("u2")).collect()
      rows.foreach(r => assert(r.getString(0) == r.getString(1),
        s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
    }
  }

  test("duplicatedWindows matches a reference implementation (random corpora)") {
    val corpus: Gen[(List[List[String]], Int)] = for {
      nDocs <- Gen.choose(2, 6)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 12).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c"))))   // tiny vocab → dups likely
      k <- Gen.choose(1, 4)
    } yield (docs, k)
    trials(corpus, n = 8) { case (docs, k) =>
      val d = mkTextDf(docs.zipWithIndex.map { case (ts, i) => i.toLong -> ts.mkString(" ") })
      val res = graft.operators.Dedup.duplicatedWindows(d, "text", "doc_id", k)
      val got = res.sdf.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      res.unpersistIntermediates()
      // reference: windows as token-slice strings, global multiset count,
      // coverage as the exact set of covered positions
      val wins = docs.map(ts =>
        (0 to ts.size - k).map(s => ts.slice(s, s + k).mkString(" ")).toList)
      val counts = wins.flatten.groupBy(identity).view.mapValues(_.size).toMap
      docs.indices.foreach { i =>
        val ts = docs(i)
        val dupStarts = wins(i).zipWithIndex.collect {
          case (w, s) if counts(w) > 1 => s }
        val coveredPos = dupStarts.flatMap(s => s until s + k).toSet
        val frac = if (ts.isEmpty) 0.0
          else BigDecimal(coveredPos.size.toDouble / ts.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(i.toLong) ==
          ((ts.size.toLong, wins(i).size.toLong, dupStarts.size.toLong, frac)),
          s"doc $i: got ${got(i.toLong)}, toks=$ts k=$k")
      }
    }
  }

  test("removeDuplicatedWindows keep-first rewrite matches a reference implementation") {
    // differential form of the Lee-et-al property: scanning window
    // instances in (doc, start) order, every instance whose window was
    // seen before loses its span; the survivor set is exactly the
    // first occurrences. (A blanket "cleaned corpus has zero dup
    // windows" assertion would be UNSOUND here: with a 3-token vocab,
    // cutting a span can juxtapose a new k-gram that collides with an
    // existing one — the operator scaladoc documents that residual.
    // DedupSpec checks the zero-dup corollary on the realistic corpus.)
    val corpus: Gen[(List[List[String]], Int)] = for {
      nDocs <- Gen.choose(2, 6)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 12).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c"))))
      k <- Gen.choose(1, 4)
    } yield (docs, k)
    trials(corpus, n = 8) { case (docs, k) =>
      val d = mkTextDf(docs.zipWithIndex.map { case (ts, i) => i.toLong -> ts.mkString(" ") })
      val res = graft.operators.Dedup.removeDuplicatedWindows(d, "text", "doc_id", k)
      val got = res.sdf.collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      res.unpersistIntermediates()
      val seen = scala.collection.mutable.Set[String]()
      val removed = docs.map(_ => scala.collection.mutable.Set[Int]())
      for (i <- docs.indices; s <- 0 to docs(i).size - k) {
        val w = docs(i).slice(s, s + k).mkString(" ")
        if (!seen.add(w)) removed(i) ++= (s until s + k)
      }
      docs.indices.foreach { i =>
        val ts = docs(i)
        val cleaned = ts.indices.filterNot(removed(i)).map(ts).mkString(" ")
        assert(got(i.toLong) == ((cleaned, ts.size.toLong, removed(i).size.toLong)),
          s"doc $i: got ${got(i.toLong)}, toks=$ts k=$k")
      }
    }
  }

  test("quantizeInt8: codes bounded, reconstruction within scale/2 (random vectors)") {
    val vecGen = Gen.listOfN(8,
      Gen.listOfN(6, Gen.choose(-100.0f, 100.0f)))
    trials(vecGen, n = 5) { vecs =>
      val d = Df.fromRows(spark,
        vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) },
        StructType(Seq(StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)))))
      val rows = graft.operators.Similarity
        .quantizeInt8(d, "embedding", "vec_id")
        .sdf.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      assert(rows.length == vecs.size * 6)
      rows.foreach { case (id, pos, q, scale) =>
        assert(math.abs(q) <= 127, s"code out of range: $q")
        val orig = vecs(id.toInt)(pos).toDouble
        // half-away rounding: |q*scale - v| <= scale/2 (+ fp slack)
        assert(math.abs(q * scale - orig) <= scale / 2 + 1e-9,
          s"reconstruction off: v=$orig q=$q scale=$scale")
      }
    }
  }

  test("kMeans: total assignment, labels in range, deterministic (random corpora)") {
    val vecGen = Gen.listOfN(12, Gen.listOfN(4, Gen.choose(-10.0f, 10.0f)))
    trials(vecGen, n = 4) { vecs =>
      val d = Df.fromRows(spark,
        vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) },
        StructType(Seq(StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)))))
      def run() = graft.operators.Similarity
        .kMeans(d, "embedding", "vec_id", k = 3, iters = 2)
        .sdf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val a = run(); val b = run()
      Df.releaseRetained()
      assert(a.size == vecs.size)               // every vector labeled
      assert(a.values.forall(c => c >= 0 && c < 3))
      assert(a == b)                            // bit-deterministic
    }
  }

  test("selectByTokenBudget output is exactly the maximal quality prefix (random corpora)") {
    val rowGen = Gen.listOfN(20, Gen.zip(
      Gen.choose(0L, 50L), Gen.choose(1L, 30L)))
    trials(rowGen, n = 5) { xs =>
      val docs = xs.zipWithIndex.map { case ((score, tok), i) =>
        (i.toLong, score, tok) }
      val d = Df.fromRows(spark, docs.map { case (i, s, t) => Row(i, s, t) },
        StructType(Seq(StructField("doc_id", LongType),
          StructField("score", LongType), StructField("n_tokens", LongType))))
      val budget = xs.map(_._2).sum / 2
      val got = graft.operators.Curation.selectByTokenBudget(
        d, "score", "n_tokens", "doc_id", budget, numPartitions = 3)
        .sdf.collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
          r.getLong(r.fieldIndex("cum_tokens"))).toMap
      Df.releaseRetained()
      // local reference: running total over the FULL ordered stream,
      // keep rows while it stays <= budget (a strict prefix — once the
      // total passes the budget nothing later re-enters)
      var cum = 0L
      val expect = scala.collection.mutable.Map[Long, Long]()
      docs.sortBy { case (i, s, _) => (-s, i) }.foreach { case (i, _, t) =>
        cum += t
        if (cum <= budget) expect(i) = cum
      }
      assert(got == expect.toMap, s"budget=$budget")
    }
  }

  test("binopAligned union-of-index semantics") {
    val a = Df.fromRows(spark, Seq(Row(1L, 10.0), Row(2L, 20.0)),
      StructType(Seq(StructField("i", LongType), StructField("x", DoubleType))))
      .setIndex("i")
    val b = Df.fromRows(spark, Seq(Row(2L, 5.0), Row(3L, 7.0)),
      StructType(Seq(StructField("i", LongType), StructField("x", DoubleType))))
      .setIndex("i")
    val s = a.addAligned(b)
    val m = s.sdf.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(m(1L).isEmpty && m(2L).contains(25.0) && m(3L).isEmpty)
  }

  test("binopAligned differential: random mismatched indexes and column sets (pandas semantics)") {
    // reference semantics (pandas df1 OP df2): index = union of both
    // indexes; shared columns = op(l, r) with null wherever either side
    // is missing or null; one-sided columns = all-null.
    val frames: Gen[(Map[Long, (Option[Double], Option[Double])],
                     Map[Long, (Option[Double], Option[Double])])] = {
      val side = for {
        keys <- Gen.someOf(0L to 14L)
        vals <- Gen.listOfN(keys.size * 2, Gen.option(Gen.choose(-50.0, 50.0)))
      } yield keys.sorted.zip(vals.grouped(2).map(l => (l(0), l(1))).toSeq).toMap
      for { a <- side; b <- side } yield (a, b)
    }
    def mk(m: Map[Long, (Option[Double], Option[Double])], second: String): Df = {
      val rows = m.toSeq.sortBy(_._1).map { case (k, (x, y)) =>
        Row(k, x.map(java.lang.Double.valueOf).orNull,
          y.map(java.lang.Double.valueOf).orNull) }
      Df.fromRows(spark, rows, StructType(Seq(
        StructField("i", LongType), StructField("x", DoubleType),
        StructField(second, DoubleType)))).setIndex("i")
    }
    trials(frames, n = 8) { case (la, rb) =>
      // left carries (x, y), right carries (x, z): x is shared,
      // y and z are one-sided
      val got = mk(la, "y").addAligned(mk(rb, "z")).sdf.collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
      val want = (la.keySet ++ rb.keySet).map { k =>
        val x = for {
          (lx, _) <- la.get(k); (rx, _) <- rb.get(k)
          l <- lx; r <- rx
        } yield l + r
        k -> x
      }.toMap
      assert(got.keySet == (la.keySet ++ rb.keySet))
      got.foreach { case (k, (x, y, z)) =>
        assert(x == want(k).map(v => v: Any), s"key $k shared col: $x vs ${want(k)}")
        assert(y.isEmpty && z.isEmpty, s"key $k one-sided cols must be null")
      }
    }
  }

  test("cdcChunks reassembles the exact token stream; boundaries are content-local (random corpora)") {
    val corpus: Gen[(List[List[String]], Int, Int)] = for {
      nDocs <- Gen.choose(1, 5)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))))
      w <- Gen.choose(1, 4)
      m <- Gen.choose(2, 6)
    } yield (docs, w, m)
    trials(corpus, n = 8) { case (docs, w, m) =>
      val d = mkTextDf(docs.zipWithIndex.map { case (ts, i) => i.toLong -> ts.mkString(" ") })
      val res = graft.operators.TextAnalytics.cdcChunks(d, "text", "doc_id", w, m)
      val got = res.sdf.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(4)))
      Df.releaseRetained()
      docs.indices.foreach { i =>
        val ts = docs(i)
        val chunks = got.filter(_._1 == i.toLong).sortBy(_._2)
        if (ts.isEmpty) assert(chunks.isEmpty, s"doc $i: empty doc must emit no chunks")
        else {
          // chunks partition the token stream exactly, in order
          assert(chunks.map(_._4).mkString(" ") == ts.mkString(" "),
            s"doc $i reassembly: $chunks vs $ts")
          assert(chunks.map(_._3).sum == ts.size.toLong)
          assert(chunks.forall(_._3 >= 1), s"doc $i: zero-token chunk")
          // chunk indexes are dense from 0
          assert(chunks.map(_._2).toSeq == chunks.indices.toSeq)
        }
      }
      // content-defined: two docs with identical token streams chunk
      // identically (boundaries depend only on content)
      val dupPairs = docs.zipWithIndex.groupBy(_._1).values.filter(_.size > 1)
      dupPairs.foreach { grp =>
        val idxs = grp.map(_._2)
        val ref = got.filter(_._1 == idxs.head.toLong).sortBy(_._2).map(c => (c._2, c._4)).toSeq
        idxs.tail.foreach { j =>
          assert(got.filter(_._1 == j.toLong).sortBy(_._2).map(c => (c._2, c._4)).toSeq == ref)
        }
      }
    }
  }

  test("stripBoilerplateLines output never contains an over-threshold line (random corpora)") {
    val corpus: Gen[(List[List[String]], Int)] = for {
      nDocs <- Gen.choose(2, 6)
      docs <- Gen.listOfN(nDocs, Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("l1", "l2", "l3", "l4"))))  // tiny line vocab
      thr <- Gen.choose(2, 4)
    } yield (docs, thr)
    trials(corpus, n = 8) { case (docs, thr) =>
      val d = mkTextDf(docs.zipWithIndex.map { case (ls, i) => i.toLong -> ls.mkString("\n") })
      val res = graft.operators.Curation.stripBoilerplateLines(d, "text", "doc_id", thr)
      val got = res.sdf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      Df.releaseRetained()
      val docFreq = docs.zipWithIndex
        .flatMap { case (ls, i) => ls.distinct.map(_ -> i) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val boiler = docFreq.filter(_._2 >= thr).keySet
      docs.indices.foreach { i =>
        val (_, nLines, nKept, text) = got.find(_._1 == i.toLong).get
        val keptLines = if (text.isEmpty) Nil else text.split("\n").toList
        assert(nLines == docs(i).size.toLong)
        assert(nKept == keptLines.size.toLong)
        // the property: no surviving line is boilerplate, and every
        // non-boilerplate line survives in original order
        assert(keptLines == docs(i).filterNot(boiler.contains),
          s"doc $i: kept=$keptLines, expected=${docs(i).filterNot(boiler.contains)}, boiler=$boiler")
      }
    }
  }

  test("standardizeBy: group moments normalize to mean 0 / sample std 1 (random groups)") {
    val corpus: Gen[List[(String, Double)]] = Gen.choose(4, 30).flatMap(n =>
      Gen.listOfN(n, for {
        g <- Gen.oneOf("g1", "g2", "g3")
        // 2dp-quantized values (the operator's decimal contract)
        v <- Gen.choose(-10000, 10000).map(_ / 100.0)
      } yield (g, v)))
    trials(corpus, n = 8) { xs =>
      val d = Df.fromRows(spark, xs.zipWithIndex.map { case ((g, v), i) => Row(i.toLong, g, v) },
        StructType(Seq(StructField("id", LongType), StructField("g", StringType),
          StructField("v", DoubleType))))
      val out = graft.operators.Curation.standardizeBy(d, "v", Seq("g")).sdf.collect()
        .map(r => (r.getString(r.fieldIndex("g")),
          Option(r.get(r.fieldIndex("v_z"))).map(_.asInstanceOf[Double])))
      out.groupBy(_._1).foreach { case (g, rows) =>
        val vs = xs.filter(_._1 == g).map(_._2)
        val n = vs.size
        if (n < 2 || vs.distinct.size == 1)
          assert(rows.forall(_._2.isEmpty),
            s"group $g (n=$n, constant=${vs.distinct.size == 1}) must be NULL")
        else {
          val zs = rows.map(_._2.get)
          assert(math.abs(zs.sum) < 1e-3, s"group $g: z mean ${zs.sum / n}")
          val s2 = zs.map(z => z * z).sum / (n - 1)
          assert(math.abs(s2 - 1.0) < 1e-3, s"group $g: z var $s2")
        }
      }
    }
  }

  test("vocabCoverage: monotone non-decreasing in V, bounded by 1, exact at full vocab") {
    val corpora: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(1, 15)
      texts <- Gen.listOfN(n,
        Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee")).map(_.mkString(" ")))
    } yield texts.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t }
    trials(corpora, n = 6) { docs =>
      val total = docs.flatMap(_._2.split("\\s+")).count(_.nonEmpty)
      if (total > 0) {
        val d = mkTextDf(docs)
        val out = graft.operators.TextAnalytics
          .vocabCoverage(d, "text", Seq(1, 2, 100))
          .sortValues(Seq("v")).sdf.collect()
          .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
        Df.releaseRetained()
        // covered monotone in V; coverage within (0, 1]; V=100 ⊇ vocab
        assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
        assert(out.forall { case (_, cov, tot, frac) =>
          cov >= 1 && cov <= tot && frac > 0.0 && frac <= 1.0 })
        assert(out.last._2 == total && out.last._4 == 1.0)
        assert(out.forall(_._3 == total))
      }
    }
  }

  test("oovRate: rates in [0,1], n_oov <= n_tokens, full vocab -> all zero") {
    val corpora: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(1, 12)
      texts <- Gen.listOfN(n,
        Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" ")))
    } yield texts.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t }
    trials(corpora, n = 6) { docs =>
      val d = mkTextDf(docs)
      val out = graft.operators.TextAnalytics
        .oovRate(d, "text", "doc_id", vocabSize = 2)
        .sdf.collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      Df.releaseRetained()
      assert(out.length == docs.count(_._2.trim.nonEmpty))
      assert(out.forall { case (nt, no, rate) =>
        no >= 0 && no <= nt && rate >= 0.0 && rate <= 1.0 })
      // a vocab that covers everything zeroes every rate
      val full = graft.operators.TextAnalytics
        .oovRate(d, "text", "doc_id", vocabSize = 100).sdf.collect()
      Df.releaseRetained()
      assert(full.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
    }
  }

  test("rankFusion: ranks are a permutation; scores bounded and order-consistent") {
    val frames: Gen[Seq[(Long, Double, Double)]] = for {
      n <- Gen.choose(2, 20)
      as <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
      bs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
    } yield (1L to n.toLong).zip(as).zip(bs).map { case ((i, a), b) => (i, a, b) }
    trials(frames, n = 6) { rows =>
      val d = new Df(spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (i, a, b) => Row(i, a, b) }),
        StructType(Seq(StructField("id", LongType),
          StructField("a", DoubleType), StructField("b", DoubleType)))))
      val out = graft.operators.Curation.rankFusion(d, Seq("a", "b"), "id")
        .sdf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      Df.releaseRetained()
      val n = rows.length
      // each rank column is exactly the permutation 1..n
      assert(out.map(_._2).sorted.toSeq == (1L to n.toLong).toSeq)
      assert(out.map(_._3).sorted.toSeq == (1L to n.toLong).toSeq)
      // score bounds: both ranks 1 vs both ranks n (slack = the 6dp
      // rounding of the emitted score, up to 5e-7 past the bound)
      val hi = 2.0 / 61.0; val lo = 2.0 / (60.0 + n)
      assert(out.forall { case (_, _, _, s) => s >= lo - 1e-6 && s <= hi + 1e-6 })
      // better on BOTH signals -> strictly better fused score
      out.foreach { case (_, ra1, rb1, s1) =>
        out.foreach { case (_, ra2, rb2, s2) =>
          if (ra1 < ra2 && rb1 < rb2) assert(s1 > s2)
        }
      }
    }
  }

  test("negativeSamples: k in-corpus non-self draws per anchor at any corpus size") {
    val sizes: Gen[(Int, Int)] = for {
      n <- Gen.choose(2, 40)
      k <- Gen.choose(1, 4)
    } yield (n, k)
    trials(sizes, n = 6) { case (n, k) =>
      val d = mkTextDf((1L to n.toLong).map(i => i -> s"d$i"))
      val out = graft.operators.Curation.negativeSamples(d, "doc_id", k, seed = n * 31L + k)
        .sdf.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      Df.releaseRetained()
      assert(out.length == n * k)
      val ids = (1L to n.toLong).toSet
      assert(out.forall { case (a, _, b) => ids.contains(b) && a != b })
      assert(out.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == (0 until k)))
    }
  }

  test("qcut: exhaustive 0..q-1, value-monotone, roughly balanced (random data)") {
    trials(Gen.zip(Gen.choose(2, 6),
      Gen.listOfN(200, Gen.choose(-500.0, 500.0))), n = 6) { case (q, xs) =>
      val d = Df.fromRows(spark, xs.map(v => Row(java.lang.Double.valueOf(v))),
        StructType(Seq(StructField("v", DoubleType))))
      val out = d.qcut("v", q, "b").sdf.collect()
        .map(r => (r.getDouble(0), r.getInt(1))).toSeq
      assert(out.forall { case (_, b) => b >= 0 && b < q })
      // monotone: sorting by value never decreases the bucket
      val byV = out.sortBy(_._1).map(_._2)
      assert(byV.zip(byV.drop(1)).forall { case (a, b) => a <= b })
      // balanced within the 6dp-break tolerance: no bucket > 2x its share
      val shares = out.groupBy(_._2).values.map(_.size)
      assert(shares.max <= 2 * (xs.size / q + 1), shares.toString)
    }
  }

  test("melt/pivot round-trip recovers the wide frame (random values)") {
    trials(Gen.listOfN(20, Gen.zip(Gen.choose(-99.0, 99.0),
      Gen.choose(-99.0, 99.0))), n = 5) { xs =>
      val rows = xs.zipWithIndex.map { case ((a, b), i) => Row(i.toLong, a, b) }
      val d = Df.fromRows(spark, rows, StructType(Seq(
        StructField("id", LongType), StructField("a", DoubleType),
        StructField("b", DoubleType))))
      val back = d.melt(Seq("id"), Seq("a", "b"))
        .pivotTable("id", "variable", "value", Seq("a", "b"), "sum")
        .sdf.orderBy("id").collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      val want = rows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      assert(back == want)
    }
  }

  test("interpolateByTime: identity on dense series; gaps stay inside " +
    "the neighbor envelope (random gaps)") {
    trials(Gen.listOfN(40, Gen.zip(Gen.choose(0.0, 1000.0),
      Gen.choose(1, 10))), n = 5) { xs =>
      val rows = xs.zipWithIndex.map { case ((v, nullEvery), i) =>
        val vv: java.lang.Double =
          if (i % (nullEvery + 1) == nullEvery) null
          else java.lang.Double.valueOf(v)
        Row("k", new java.sql.Timestamp(1700000000000L + i * 60000L), vv)
      }
      val d = Df.fromRows(spark, rows, StructType(Seq(
        StructField("k", StringType), StructField("ts", TimestampType),
        StructField("v", DoubleType))))
      val got = graft.operators.TimeSeries
        .interpolateByTime(d, "v", "ts", Seq("k"), "vi").sdf
        .orderBy("ts").collect()
      val vs = rows.map(r =>
        Option(r.get(2).asInstanceOf[java.lang.Double]).map(_.doubleValue))
      val vis = got.map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      // non-null inputs pass through untouched
      vs.zip(vis).foreach { case (in, out) =>
        if (in.isDefined) assert(out == in)
      }
      // each interpolated value sits inside [prev, next] envelope
      val known = vs.zipWithIndex.collect { case (Some(v), i) => (i, v) }
      for (((in, out), i) <- vs.zip(vis).zipWithIndex if in.isEmpty && out.isDefined) {
        val prev = known.takeWhile(_._1 < i).lastOption
        val next = known.dropWhile(_._1 < i).headOption
        (prev, next) match {
          case (Some((_, pv)), Some((_, nv))) =>
            val (lo, hi) = (math.min(pv, nv), math.max(pv, nv))
            assert(out.get >= lo - 1e-9 && out.get <= hi + 1e-9)
          case (Some((_, pv)), None) => assert(out.get == pv) // trailing ffill
          case _ => fail("leading null should not interpolate")
        }
      }
    }
  }

  test("duplicatedKeep census: first/last mark n-distinct fewer; none marks whole groups") {
    trials(Gen.listOfN(60, Gen.choose(1L, 12L)), n = 6) { ks =>
      val rows = ks.zipWithIndex.map { case (k, i) => Row(k, i.toLong) }
      val d = Df.fromRows(spark, rows, StructType(Seq(
        StructField("k", LongType), StructField("ord", LongType))))
      def marked(keep: String): Long =
        d.duplicatedKeep(Seq("k"), "ord", keep, "dup").sdf
          .where(col("dup")).count()
      val groups = ks.groupBy(identity).values.map(_.size)
      assert(marked("first") == ks.size - groups.size)
      assert(marked("last") == ks.size - groups.size)
      assert(marked("none") == groups.filter(_ > 1).sum)
    }
  }

  test("round never emits IEEE -0.0; `+ 0.0` canonicalizes the sign (boundary fuzz)") {
    // The cross-engine flake class found in r10: a C-float ROUND maps a
    // tiny negative to -0.0 while Spark's BigDecimal round yields +0.0,
    // and the gate's hash is byte-level. Two pins: (a) Spark round over
    // the entire (-1e-6, 1e-6) boundary band never produces a sign bit;
    // (b) the suite's `+ 0.0` normalizer maps every -0.0 (including
    // round's input, abs/negation products) to +0.0 and is the identity
    // elsewhere — so an oracle-side `ROUND(...) + 0.0` provably equals
    // the Spark side bit-for-bit whenever the rounded magnitudes agree.
    val negZeroBits = java.lang.Double.doubleToRawLongBits(-0.0)
    trials(Gen.listOfN(40, Gen.frequency(
      (6, Gen.choose(-1e-6, 1e-6)),
      (2, Gen.choose(-1e-3, 1e-3)),
      (1, Gen.const(-0.0)), (1, Gen.const(0.0)))), n = 8) { xs =>
      val d = mkDf(xs.map(java.lang.Double.valueOf))
      Seq(2, 4, 6, 8).foreach { scale =>
        val out = d.sdf.select(
          round(col("v"), scale).as("r"),
          (round(col("v"), scale) + lit(0.0)).as("rn"),
          (col("v") + lit(0.0)).as("vn")).collect()
        out.foreach { row =>
          val r = row.getDouble(0)
          assert(java.lang.Double.doubleToRawLongBits(r) != negZeroBits,
            s"round(_, $scale) emitted -0.0")
          assert(java.lang.Double.doubleToRawLongBits(row.getDouble(1)) != negZeroBits)
          val vn = row.getDouble(2)
          assert(java.lang.Double.doubleToRawLongBits(vn) != negZeroBits,
            "`+ 0.0` failed to canonicalize -0.0")
        }
      }
    }
  }

  test("merge differential: suffix/column-order algorithm on random column sets (pandas _merge.py semantics, 200 cases)") {
    // reference semantics (pandas merge on common key names): key
    // columns appear ONCE un-suffixed; a non-key column present on both
    // sides gets the side suffix; one-sided columns pass through
    // unrenamed. Column order in graft's Spark using-join: keys, then
    // left non-key in left order, then right non-key in right order.
    // Values: inner = matched keys only; left keeps unmatched left rows
    // with null right columns; outer adds unmatched right rows too.
    val pool = Vector("a", "b", "c", "d", "e")
    val cases: Gen[(List[String], List[String], List[Long], List[Long],
                    (String, String), String)] = for {
      lc <- Gen.someOf(pool).map(_.toList.sorted)
      rc <- Gen.someOf(pool).map(_.toList.sorted)
      lk <- Gen.someOf(0L to 5L).map(_.toList.sorted)
      rk <- Gen.someOf(0L to 5L).map(_.toList.sorted)
      sfx <- Gen.oneOf(("_x", "_y"), ("_l", "_r"), ("_left", "_right"))
      how <- Gen.oneOf("inner", "left", "outer")
    } yield (lc, rc, lk, rk, sfx, how)
    def f(side: Int, c: String, k: Long): Double =
      side * 1000.0 + (c(0) - 'a') * 10.0 + k
    def mk(side: Int, cols: List[String], keys: List[Long]): Df =
      Df.fromRows(spark,
        keys.map(k => Row(k.asInstanceOf[AnyRef] +:
          cols.map(c => java.lang.Double.valueOf(f(side, c, k)): AnyRef): _*)),
        StructType(StructField("k", LongType) +:
          cols.map(c => StructField(c, DoubleType))))
    trials(cases, n = 200) { case (lc, rc, lk, rk, (sx, sy), how) =>
      val shared = lc.toSet & rc.toSet
      val merged = mk(1, lc, lk).merge(mk(2, rc, rk), Seq("k"), how,
        suffixes = (sx, sy))
      // schema model: the suffix/column-order algorithm itself
      val wantCols = "k" +:
        (lc.map(c => if (shared(c)) c + sx else c) ++
          rc.map(c => if (shared(c)) c + sy else c))
      assert(merged.columns.toSeq == wantCols,
        s"cols: ${merged.columns.toSeq} vs $wantCols " +
          s"(lc=$lc rc=$rc sfx=($sx,$sy))")
      // value model, independently computed
      val wantKeys = how match {
        case "inner" => lk.toSet & rk.toSet
        case "left"  => lk.toSet
        case "outer" => lk.toSet ++ rk.toSet
      }
      val got = merged.sdf.collect().map { r =>
        r.getLong(0) -> merged.columns.drop(1).zipWithIndex.map {
          case (c, i) => c -> Option(r.get(i + 1)) }.toMap
      }.toMap
      assert(got.keySet == wantKeys,
        s"keys: ${got.keySet} vs $wantKeys (how=$how)")
      got.foreach { case (k, vals) =>
        lc.foreach { c =>
          val want = if (lk.contains(k)) Some(f(1, c, k)) else None
          assert(vals(if (shared(c)) c + sx else c) == want,
            s"left col $c key $k (how=$how)")
        }
        rc.foreach { c =>
          val want = if (rk.contains(k)) Some(f(2, c, k)) else None
          assert(vals(if (shared(c)) c + sy else c) == want,
            s"right col $c key $k (how=$how)")
        }
      }
    }
  }

  test("concat differential: inner/outer column alignment on overlapping labels (pandas _concat.py semantics, 200 cases)") {
    // reference semantics (pandas concat axis=0): outer = union of
    // labels in first-appearance order, absent labels null-filled;
    // inner = intersection ordered by the FIRST frame's column order.
    // Row multiset is the concatenation either way — never deduped.
    val pool = Vector("a", "b", "c", "d", "e")
    val cases: Gen[(List[(List[String], Int)], String)] = for {
      nf <- Gen.choose(2, 4)
      frames <- Gen.listOfN(nf, for {
        cols <- Gen.atLeastOne(pool).map(_.toList.sorted)
        rows <- Gen.choose(0, 4)
      } yield (cols, rows))
      join <- Gen.oneOf("outer", "inner")
    } yield (frames, join)
    def f(frame: Int, c: String, r: Int): Double =
      frame * 1000.0 + (c(0) - 'a') * 10.0 + r
    trials(cases, n = 200) { case (frames, join) =>
      val dfs = frames.zipWithIndex.map { case ((cols, nRows), fi) =>
        Df.fromRows(spark,
          (0 until nRows).map(r => Row(
            cols.map(c => java.lang.Double.valueOf(f(fi, c, r)): AnyRef): _*)),
          StructType(cols.map(c => StructField(c, DoubleType))))
      }
      val common = frames.map(_._1.toSet).reduce(_ & _)
      if (join == "inner" && common.isEmpty) () // no aligned columns: skip draw
      else {
        val out = Df.concat(dfs, join)
        val wantCols =
          if (join == "inner") frames.head._1.filter(common.contains)
          else frames.map(_._1).reduce((acc, cs) => acc ++ cs.filterNot(acc.contains))
        assert(out.columns.toSeq == wantCols,
          s"cols: ${out.columns.toSeq} vs $wantCols (join=$join frames=$frames)")
        // row multiset model: one output row per input row, each column
        // carried when the frame has it, null otherwise
        val want = frames.zipWithIndex.flatMap { case ((cols, nRows), fi) =>
          (0 until nRows).map { r =>
            wantCols.map(c =>
              if (cols.contains(c)) Some(f(fi, c, r)) else None)
          }
        }.groupBy(identity).view.mapValues(_.size).toMap
        val got = out.sdf.collect().toSeq.map { row =>
          wantCols.indices.map(i => Option(row.get(i)).map(_.asInstanceOf[Double])).toList
        }.groupBy(identity).view.mapValues(_.size).toMap
        assert(got == want, s"rows: $got vs $want (join=$join frames=$frames)")
      }
    }
  }

  test("asofJoin differential: backward/forward/nearest with tolerance vs a brute-force model (150 cases)") {
    // reference semantics (pandas merge_asof): per key, backward = the
    // latest right row at or before t, forward = the earliest at or
    // after, nearest = the closer of the two with ties going backward;
    // tolerance nulls out a match farther than tol seconds. Right
    // timestamps are unique per key (duplicate-rt winners are
    // row-order-dependent in pandas and partition-order-dependent here
    // — out of contract).
    val cases: Gen[(List[(Int, Long)], List[(Int, Long)], String, Long)] = for {
      lt <- Gen.listOf(Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 120L)))
      rt <- Gen.listOf(Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 120L)))
      dir <- Gen.oneOf("backward", "forward", "nearest")
      tol <- Gen.oneOf(-1L, 0L, 3L, 10L)
    } yield (lt, rt.distinct
      .groupBy(identity).keys.toList // unique (k, rt)
      , dir, tol)
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    def f(k: Int, t: Long): Double = k * 1000.0 + t
    trials(cases, n = 150) { case (lt0, rt, dir, tol) =>
      val lt = lt0.zipWithIndex // left rows get distinct ids
      val left = Df.fromRows(spark,
        lt.map { case ((k, t), i) => Row(i.toLong, k, ts(t)) },
        StructType(Seq(StructField("lid", LongType), StructField("k", IntegerType),
          StructField("lt", TimestampType))))
      val right = Df.fromRows(spark,
        rt.map { case (k, t) => Row(k, ts(t), java.lang.Double.valueOf(f(k, t))) },
        StructType(Seq(StructField("k", IntegerType),
          StructField("rt", TimestampType), StructField("v", DoubleType))))
      val got = left.asofJoin(right, Seq("k"), "lt", "rt", Seq("v"),
          direction = dir, toleranceSec = tol)
        .sdf.collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      // brute-force model: choose by direction, then gate on tolerance
      // (equivalent to filter-then-choose for every direction: the
      // chosen row is the closest on its side, so if IT violates the
      // tolerance every other candidate does too)
      val byKey = rt.groupBy(_._1)
      val want = lt.map { case ((k, t), i) =>
        val cands = byKey.getOrElse(k, Nil)
        val b = cands.filter(_._2 <= t).sortBy(_._2).lastOption
        val fw = cands.filter(_._2 >= t).sortBy(_._2).headOption
        val chosen = dir match {
          case "backward" => b
          case "forward"  => fw
          case "nearest" => (b, fw) match {
            case (Some(bb), Some(ff)) =>
              if (t - bb._2 <= ff._2 - t) Some(bb) else Some(ff)
            case (x, y) => x.orElse(y)
          }
        }
        i.toLong -> chosen
          .filter(c => tol < 0 || math.abs(c._2 - t) <= tol)
          .map { case (ck, ct) => f(ck, ct): Any }
      }.toMap
      assert(got == want,
        s"dir=$dir tol=$tol\n got=$got\nwant=$want\n lt=$lt0\n rt=$rt")
    }
  }

  test("PandasAgg battery differential: skipna/min_count/ddof/prod/any/all vs a model (200 cases)") {
    // pandas semantics under test: sum(skipna=False) nulls on ANY null;
    // sum(min_count=k) needs >= k non-nulls (k=0 empty -> 0.0);
    // prod(min_count=k) likewise with identity 1.0, zero- and
    // sign-exact through the log formulation; var/std(ddof) = M2/(n-d);
    // any/all drop nulls with identities false/true. Null-ness must
    // match EXACTLY; values to 1e-9 relative (double partial-agg order
    // and exp∘ln∘abs are not bit-stable by design).
    import graft.functions.PandasAgg._
    val cases: Gen[(List[(Int, Option[Double])], Int, Int)] = for {
      rows <- Gen.listOf(Gen.zip(Gen.choose(0, 2),
        Gen.frequency(
          (6, Gen.choose(-3.0, 3.0).map(v => Some(math.rint(v * 4) / 4))),
          (1, Gen.const(Some(0.0))),
          (2, Gen.const(None: Option[Double])))))
      mc <- Gen.choose(0, 4)
      ddof <- Gen.choose(0, 2)
    } yield (rows, mc, ddof)
    trials(cases, n = 200) { case (rows, mc, ddof) =>
      val d = Df.fromRows(spark,
        rows.map { case (k, v) =>
          Row(k, v.map(java.lang.Double.valueOf).orNull) },
        StructType(Seq(StructField("k", IntegerType),
          StructField("v", DoubleType))))
      val got = d.sdf.groupBy("k").agg(
        sumSkipnaFalse(col("v")).as("s_sf"),
        sumMinCount(col("v"), mc).as("s_mc"),
        meanSkipnaFalse(col("v")).as("m_sf"),
        prodMinCount(col("v"), mc).as("p_mc"),
        varDdof(col("v"), ddof).as("vd"),
        anySkipna(col("v") > 0).as("any_pos"),
        allSkipna(col("v") > 0).as("all_pos"))
        .collect().map(r => r.getInt(0) ->
          (0 until 7).map(i => Option(r.get(i + 1))).toList).toMap
      def approx(a: Option[Any], b: Option[Double], label: String, k: Int): Unit =
        (a, b) match {
          case (None, None) => ()
          case (Some(x: Double), Some(y)) =>
            assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
              s"$label key $k: $x vs $y (rows=$rows mc=$mc ddof=$ddof)")
          case _ => fail(s"$label key $k null-ness: $a vs $b (rows=$rows mc=$mc ddof=$ddof)")
        }
      rows.groupBy(_._1).foreach { case (k, g) =>
        val vs = g.map(_._2)
        val nn = vs.flatten
        val List(sSf, sMc, mSf, pMc, vd, anyP, allP) = got(k)
        approx(sSf, if (vs.exists(_.isEmpty)) None else Some(nn.sum), "sumSkipnaFalse", k)
        approx(sMc, if (nn.size >= mc) Some(nn.sum) else None, "sumMinCount", k)
        approx(mSf, if (vs.exists(_.isEmpty)) None else Some(nn.sum / nn.size), "meanSkipnaFalse", k)
        approx(pMc, if (nn.size >= mc) Some(nn.product) else None, "prodMinCount", k)
        // n <= ddof: the statistic is undefined — the operator's
        // contract is NULL (pandas' inf/NaN under the NaN-null
        // convention); before the guard this killed the whole query
        // with an ANSI divide-by-zero (caught by this very test)
        if (nn.size > ddof) {
          val mean = nn.sum / nn.size
          val m2 = nn.map(x => (x - mean) * (x - mean)).sum
          if (nn.size >= 2)
            approx(vd, Some(m2 / (nn.size - ddof)), "varDdof", k)
        } else assert(vd.isEmpty || ddof <= 1,
          s"varDdof key $k n=${nn.size} ddof=$ddof must be null, got $vd")
        assert(anyP == Some(nn.exists(_ > 0)), s"anySkipna key $k")
        assert(allP == Some(nn.forall(_ > 0)), s"allSkipna key $k")
      }
    }
  }

  test("rangeJoin differential: bucketized point-in-interval equals the brute-force pairing (150 cases)") {
    // the bucketization must be invisible: every (point, interval)
    // pair with lo <= p <= hi (and matching equi-key when keyed)
    // appears exactly once — no boundary loss at bucket edges, no
    // duplicate from an interval spanning many buckets, negative
    // domains floor correctly, inverted intervals match nothing
    val cases: Gen[(List[(Int, Double)], List[(Int, Double, Double)],
                    Double, Boolean)] = for {
      pts <- Gen.listOf(Gen.zip(Gen.choose(0, 2),
        Gen.choose(-40, 40).map(_ / 2.0)))
      ivs <- Gen.listOf(for {
        k <- Gen.choose(0, 2)
        a <- Gen.choose(-40, 40).map(_ / 2.0)
        w <- Gen.frequency((8, Gen.choose(0, 30).map(_ / 2.0)),
          (1, Gen.const(-2.0))) // a few inverted intervals
      } yield (k, a, a + w))
      bw <- Gen.oneOf(0.5, 1.0, 2.5, 7.0)
      keyed <- Gen.oneOf(true, false)
    } yield (pts, ivs, bw, keyed)
    trials(cases, n = 150) { case (pts, ivs, bw, keyed) =>
      val points = Df.fromRows(spark,
        pts.zipWithIndex.map { case ((k, p), i) => Row(i.toLong, k, p) },
        StructType(Seq(StructField("pid", LongType),
          StructField("k", IntegerType), StructField("p", DoubleType))))
      val intervals = Df.fromRows(spark,
        ivs.zipWithIndex.map { case ((k, lo, hi), i) => Row(i.toLong, k, lo, hi) },
        StructType(Seq(StructField("iid", LongType),
          StructField("k", IntegerType), StructField("lo", DoubleType),
          StructField("hi", DoubleType))))
      val got = points.rangeJoin(
          if (keyed) intervals else new Df(intervals.sdf.drop("k")),
          "p", "lo", "hi", bw, on = if (keyed) Seq("k") else Nil)
        .sdf.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        ((pk, p), pi) <- pts.zipWithIndex
        ((ik, lo, hi), ii) <- ivs.zipWithIndex
        if (!keyed || pk == ik) && p >= lo && p <= hi
      } yield (pi.toLong, ii.toLong)).sorted
      assert(got == want,
        s"bw=$bw keyed=$keyed\n got=$got\nwant=$want\npts=$pts\nivs=$ivs")
    }
  }

  test("grouped quantile differential: exact linear interpolation per group (150 cases)") {
    // pandas g.quantile(q) default interpolation='linear': sort the
    // group's non-null values, pos = q*(n-1), result = v[floor] +
    // frac*(v[floor+1]-v[floor]); all-null/empty groups -> null
    val cases: Gen[(List[(Int, Option[Double])], Double)] = for {
      rows <- Gen.listOf(Gen.zip(Gen.choose(0, 2), Gen.frequency(
        (8, Gen.choose(-100.0, 100.0).map(Some(_))),
        (1, Gen.const(None: Option[Double])))))
      q <- Gen.oneOf(0.0, 0.25, 0.5, 0.77, 0.9, 1.0)
    } yield (rows, q)
    trials(cases, n = 150) { case (rows, q) =>
      val d = Df.fromRows(spark,
        rows.map { case (k, v) => Row(k, v.map(java.lang.Double.valueOf).orNull) },
        StructType(Seq(StructField("k", IntegerType), StructField("v", DoubleType))))
      val got = d.groupby("k").quantile(q).sdf.collect()
        .map(r => r.getInt(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
      rows.groupBy(_._1).foreach { case (k, g) =>
        val nn = g.flatMap(_._2).sorted
        val want =
          if (nn.isEmpty) None
          else {
            val pos = q * (nn.size - 1)
            val lo = math.floor(pos).toInt
            val frac = pos - lo
            Some(if (lo + 1 < nn.size) nn(lo) + frac * (nn(lo + 1) - nn(lo))
            else nn(lo))
          }
        (got(k), want) match {
          case (None, None) => ()
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
              s"key $k q=$q: $a vs $b (rows=$rows)")
          case other => fail(s"key $k q=$q null-ness: $other (rows=$rows)")
        }
      }
    }
  }

  test("combineFirst differential: self-priority fill over the index union (150 cases)") {
    // pandas df.combine_first(other): index = union of keys; shared
    // columns take self's value, falling back to other's where self is
    // null or absent; one-sided columns pass through with nulls on the
    // missing side
    val side: Gen[Map[Long, (Option[Double], Option[Double])]] = for {
      keys <- Gen.someOf(0L to 9L)
      vals <- Gen.listOfN(keys.size * 2, Gen.option(Gen.choose(-50.0, 50.0)))
    } yield keys.sorted.zip(vals.grouped(2).map(l => (l(0), l(1))).toSeq).toMap
    def mk(m: Map[Long, (Option[Double], Option[Double])], c2: String): Df =
      Df.fromRows(spark,
        m.toSeq.sortBy(_._1).map { case (k, (x, y)) =>
          Row(k, x.map(java.lang.Double.valueOf).orNull,
            y.map(java.lang.Double.valueOf).orNull) },
        StructType(Seq(StructField("k", LongType), StructField("a", DoubleType),
          StructField(c2, DoubleType))))
    trials(Gen.zip(side, side), n = 150) { case (l, r) =>
      // left carries (a, b), right carries (a, c): a shared, b/c one-sided
      val got = mk(l, "b").combineFirst(mk(r, "c"), on = Seq("k"))
        .sdf.collect().map(row => row.getLong(0) ->
          (Option(row.get(1)), Option(row.get(2)), Option(row.get(3)))).toMap
      val want = (l.keySet ++ r.keySet).map { k =>
        val (la, lb) = l.getOrElse(k, (None, None))
        val (ra, rc) = r.getOrElse(k, (None, None))
        k -> (la.orElse(ra).map(v => v: Any), lb.map(v => v: Any),
          rc.map(v => v: Any))
      }.toMap
      assert(got == want, s"\n got=$got\nwant=$want\n l=$l\n r=$r")
    }
  }

  test("interpolateByTime differential: time-weighted interior lerp, ffill tail, null head (120 cases)") {
    // pandas interpolate(method='index', limit_direction='forward') per
    // key over event time: interior nulls lerp between surrounding
    // observations weighted by time, trailing nulls carry the last
    // value, leading nulls stay null
    val cases: Gen[List[(Int, Long, Option[Double])]] = Gen.listOf(for {
      k <- Gen.choose(0, 1)
      t <- Gen.choose(0L, 500L)
      v <- Gen.frequency((5, Gen.choose(-40.0, 40.0).map(Some(_))),
        (4, Gen.const(None: Option[Double])))
    } yield (k, t, v)).map(_.groupBy(r => (r._1, r._2)).values.map(_.head).toList)
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    trials(cases, n = 120) { rows =>
      val d = Df.fromRows(spark,
        rows.map { case (k, t, v) =>
          Row(k, ts(t), v.map(java.lang.Double.valueOf).orNull) },
        StructType(Seq(StructField("k", IntegerType),
          StructField("ts", TimestampType), StructField("v", DoubleType))))
      val got = graft.operators.TimeSeries.interpolateByTime(
          d, "v", "ts", keyCols = Seq("k"), out = "vi")
        .sdf.collect().map(r =>
          (r.getInt(0), r.getTimestamp(1).toInstant.getEpochSecond) ->
            Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
      rows.groupBy(_._1).foreach { case (k, g) =>
        val srt = g.sortBy(_._2)
        srt.zipWithIndex.foreach { case ((_, t, v), i) =>
          val want: Option[Double] = v.orElse {
            val prev = srt.take(i).reverse.collectFirst {
              case (_, pt, Some(pv)) => (pt, pv) }
            val next = srt.drop(i + 1).collectFirst {
              case (_, nt, Some(nv)) => (nt, nv) }
            (prev, next) match {
              case (None, _) => None
              case (Some((_, pv)), None) => Some(pv)
              case (Some((pt, pv)), Some((nt, nv))) =>
                Some(pv + (nv - pv) * ((t - pt).toDouble / (nt - pt).toDouble))
            }
          }
          (got((k, t)), want) match {
            case (None, None) => ()
            case (Some(a), Some(b)) =>
              assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
                s"key $k t=$t: $a vs $b")
            case other => fail(s"key $k t=$t null-ness: $other (rows=$srt)")
          }
        }
      }
    }
  }

  test("resampleGapfill property: every bin between min and max present, empty bins zeroed (100 cases)") {
    val cases: Gen[List[(Long, Double)]] = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 86400L * 14), Gen.choose(-20.0, 20.0)))
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    trials(cases, n = 100) { rows =>
      val d = Df.fromRows(spark,
        rows.map { case (t, v) => Row(ts(t), v) },
        StructType(Seq(StructField("ts", TimestampType),
          StructField("v", DoubleType))))
      val got = graft.operators.TimeSeries.resampleGapfill(d, "ts", "v", "day")
        .sdf.collect().map(r =>
          r.getTimestamp(0).toInstant.getEpochSecond / 86400 ->
            (r.getLong(1), r.getDouble(2))).toMap
      val byDay = rows.groupBy(_._1 / 86400)
      val days = byDay.keys
      // every day from min to max present, EXACTLY those
      assert(got.keySet == (days.min to days.max).toSet,
        s"bins: ${got.keySet.toSeq.sorted} vs ${days.min}..${days.max}")
      got.foreach { case (day, (n, s)) =>
        val vs = byDay.getOrElse(day, Nil).map(_._2)
        assert(n == vs.size, s"day $day count $n vs ${vs.size}")
        assert(math.abs(s - vs.sum) <= 1e-6 * math.max(1.0, math.abs(vs.sum)),
          s"day $day sum $s vs ${vs.sum}")
      }
    }
  }

  test("bpeMerges differential: the full Sennrich learning loop vs a reference model (30 corpora)") {
    // reference algorithm (Sennrich et al. 2016 §3.2): count adjacent
    // symbol pairs weighted by word frequency, merge the argmax pair
    // (ties by (left, right) text) greedily left-to-right non-overlap,
    // repeat. The engine runs it as replace() rounds over the
    // |-wrapped distinct-word table; the model is the direct list
    // implementation — every (rank, lhs, rhs, count) row must agree.
    val cases: Gen[(List[String], Int)] = for {
      words <- Gen.nonEmptyListOf(
        Gen.choose(1, 6).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString)))
      n <- Gen.choose(1, 5)
    } yield (words, n)
    def mergeGreedy(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    trials(cases, n = 30) { case (words, nMerges) =>
      val d = mkTextDf(words.zipWithIndex.map { case (w, i) => (i.toLong, w) })
      val got = graft.operators.TextAnalytics.bpeMerges(d, "text", nMerges)
        .sdf.orderBy("merge_rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      Df.releaseRetained()
      // model
      var vocab: Seq[(List[String], Long)] = words.groupBy(identity).toSeq
        .map { case (w, g) => (w.map(_.toString).toList, g.size.toLong) }
      val want = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var rank = 1
      var stop = false
      while (rank <= nMerges && !stop) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.zip(syms.tail).foreach(p =>
            counts(p) = counts.getOrElse(p, 0L) + f) }
        if (counts.isEmpty) stop = true
        else {
          val ((l, r), n) = counts.toSeq
            .sortBy { case ((l, r), n) => (-n, l, r) }.head
          want += ((rank, l, r, n))
          vocab = vocab.map { case (syms, f) => (mergeGreedy(syms, l, r), f) }
          rank += 1
        }
      }
      assert(got == want.toSeq, s"\n got=$got\nwant=$want\nwords=$words n=$nMerges")
    }
  }

  test("sortedNeighborhood differential: windowed Levenshtein pairs vs a brute model (100 cases)") {
    // per block, sort by (sortCol, id); pair each record with its w
    // predecessors; keep pairs at edit distance <= maxDist with left =
    // the earlier record and offset = sort-position gap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cases: Gen[(List[(Int, Int, String)], Int, Int)] = for {
      recs <- Gen.listOf(for {
        blk <- Gen.choose(0, 1)
        srt <- Gen.choose(0, 9)
        txt <- Gen.choose(1, 5).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf("x", "y", "z")).map(_.mkString))
      } yield (blk, srt, txt))
      w <- Gen.choose(1, 3)
      maxDist <- Gen.choose(0, 3)
    } yield (recs, w, maxDist)
    trials(cases, n = 100) { case (recs0, w, maxDist) =>
      val recs = recs0.zipWithIndex.map { case ((b, s, t), i) => (i.toLong, b, s, t) }
      val d = Df.fromRows(spark,
        recs.map { case (id, b, s, t) => Row(id, b, s, t) },
        StructType(Seq(StructField("id", LongType),
          StructField("blk", IntegerType), StructField("srt", IntegerType),
          StructField("text", StringType))))
      val got = graft.operators.Linkage.sortedNeighborhood(
          d, Seq("blk"), "srt", "text", "id", maxDist, w)
        .sdf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(5))).sorted.toSeq
      val want = recs.groupBy(_._2).values.flatMap { blk =>
        val srt = blk.sortBy(r => (r._3, r._1))
        for {
          i <- srt.indices
          off <- 1 to w
          if i - off >= 0
          l = srt(i - off); r = srt(i)
          if lev(l._4, r._4) <= maxDist
        } yield (l._1, r._1, off)
      }.toSeq.sorted
      assert(got == want, s"w=$w maxDist=$maxDist\n got=$got\nwant=$want\nrecs=$recs")
    }
  }

  test("connectedComponents differential: min-label propagation vs union-find (40 graphs)") {
    // every node present in the pair list must carry the MIN id of its
    // connected component — the representative-election contract the
    // dedup endgame builds on
    val cases: Gen[List[(Long, Long)]] = Gen.listOf(
      Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
    // alternate the r17 |V| broadcast gate so BOTH join modes (labels
    // broadcast vs shuffle rounds) stay under differential pressure
    var ccGateFlip = false
    trials(cases, n = 40) { edges0 =>
      val edges = edges0.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        ccGateFlip = !ccGateFlip
        val d = Df.fromRows(spark,
          edges.map { case (a, b) => Row(a, b) },
          StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
        val got = graft.operators.Dedup.connectedComponents(d, "a", "b",
          broadcastMaxNodes = if (ccGateFlip) 250000L else 0L)
          .sdf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        Df.releaseRetained()
        // union-find model
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        val byRoot = nodes.groupBy(find)
        val want = byRoot.values.flatMap { comp =>
          val m = comp.min; comp.map(_ -> m) }.toMap
        assert(got == want, s"\n got=$got\nwant=$want\nedges=$edges")
      }
    }
  }

  test("incrementalComponents differential: two-phase label merge == one-shot CC (30 splits)") {
    // the exactness claim behind batch dedup maintenance: CC over the
    // old HALF, labels-as-star-edges + the new half, must equal CC over
    // the full edge set — for any random graph and any split point
    val cases: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
      old <- Gen.listOf(Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
      fresh <- Gen.listOf(Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
    } yield (old, fresh)
    val schema = StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType)))
    def pairsDf(es: List[(Long, Long)]) =
      Df.fromRows(spark, es.map { case (a, b) => Row(a, b) }, schema)
    var incGateFlip = false
    trials(cases, n = 30) { case (old0, fresh0) =>
      val old = old0.filter { case (a, b) => a != b }
      val fresh = fresh0.filter { case (a, b) => a != b }
      if (old.nonEmpty && fresh.nonEmpty) {
        incGateFlip = !incGateFlip
        val gate = if (incGateFlip) 250000L else 0L
        val oldLabels = graft.operators.Dedup.connectedComponents(
          pairsDf(old), "id_a", "id_b", broadcastMaxNodes = gate)
        val got = graft.operators.Dedup.incrementalComponents(
          oldLabels, pairsDf(fresh), broadcastMaxNodes = gate)
          .sdf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = graft.operators.Dedup.connectedComponents(
          pairsDf(old ++ fresh), "id_a", "id_b")
          .sdf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        Df.releaseRetained()
        assert(got == want, s"\n got=$got\nwant=$want\nold=$old fresh=$fresh")
      }
    }
  }

  test("pageRank differential: weighted power iteration vs a dense model (25 graphs)") {
    // r_{k+1}(v) = (1-d)/N + d * sum_{(s,v)} r_k(s) * w(s,v)/outW(s),
    // duplicate edges contributing multiplicity weight, dangling mass
    // NOT redistributed (the operator's documented simplification)
    val cases: Gen[(List[(Long, Long)], Int)] = for {
      edges <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L)))
      iters <- Gen.choose(1, 4)
    } yield (edges, iters)
    var prGateFlip = false
    trials(cases, n = 25) { case (edges, iters) =>
      prGateFlip = !prGateFlip
      val d = Df.fromRows(spark,
        edges.map { case (s, t) => Row(s, t) },
        StructType(Seq(StructField("s", LongType), StructField("t", LongType))))
      // alternate the r17 gate: chained-broadcast vs persisted shuffle loop
      val got = graft.operators.Graphs.pageRank(d.sdf, "s", "t", iters,
        broadcastMaxNodes = if (prGateFlip) 250000L else 0L)
        .sdf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      Df.releaseRetained()
      val damping = 0.85
      val nodes = edges.flatMap { case (s, t) => Seq(s, t) }.distinct.sorted
      val n = nodes.size
      val w = edges.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val outW = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      var rank = nodes.map(_ -> 1.0 / n).toMap
      (1 to iters).foreach { _ =>
        rank = nodes.map { v =>
          val in = w.collect { case ((s, t), wt) if t == v =>
            rank(s) * wt / outW(s) }.sum
          v -> ((1 - damping) / n + damping * in)
        }.toMap
      }
      assert(got.keySet == nodes.toSet, s"nodes: ${got.keySet} vs $nodes")
      nodes.foreach { v =>
        assert(math.abs(got(v) - rank(v)) <= 1e-6,
          s"node $v: ${got(v)} vs ${rank(v)} (edges=$edges iters=$iters)")
      }
    }
  }

  test("minhashPairs: emitted jaccards exact vs model; planted exact dups always recalled (40 corpora)") {
    // two-sided contract: PRECISION — every emitted pair's jaccard
    // equals the shingle-set model's |∩|/|∪| (6dp) and clears the
    // threshold, and no pair outside the model set appears; RECALL on
    // planted exact duplicates — identical texts have identical
    // signatures, hence share every band bucket, so (under the cap,
    // not reached here) they MUST surface with jaccard 1.0
    val vocab = Vector("red", "blue", "green", "fox", "dog", "run")
    val cases: Gen[(List[String], List[Int])] = for {
      docs <- Gen.nonEmptyListOf(Gen.choose(3, 7).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
      dupOf <- Gen.someOf(docs.indices).map(_.toList)
    } yield (docs, dupOf)
    def shingles(text: String, n: Int): Set[String] = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      if (t.length < n) Set.empty
      else t.sliding(n).map(_.mkString(" ")).toSet
    }
    trials(cases, n = 40) { case (base, dupOf) =>
      val all = base ++ dupOf.map(base) // planted exact duplicates
      val d = mkTextDf(all.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      val got = graft.operators.Dedup.minhashPairs(
          d, "text", "doc_id", shingleN = 3, minJaccard = 0.3)
        .sdf.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      Df.releaseRetained()
      val sh = all.map(shingles(_, 3))
      def jac(i: Int, j: Int): Double = {
        val inter = (sh(i) & sh(j)).size
        val uni = sh(i).size + sh(j).size - inter
        if (uni == 0) 0.0 else math.rint(1e6 * inter / uni) / 1e6
      }
      // precision: every emitted pair is a true over-threshold pair
      got.foreach { case ((a, b), jx) =>
        val want = jac(a.toInt, b.toInt)
        assert(sh(a.toInt).nonEmpty && sh(b.toInt).nonEmpty)
        assert(want >= 0.3, s"pair ($a,$b) below threshold: model $want")
        assert(math.abs(jx - want) <= 1e-6, s"pair ($a,$b): $jx vs $want")
      }
      // recall: planted duplicates surface with jaccard 1.0
      dupOf.zipWithIndex.foreach { case (orig, di) =>
        val dupId = (base.size + di).toLong
        if (sh(orig).nonEmpty)
          assert(got.get((orig.toLong, dupId)).contains(1.0),
            s"planted dup ($orig, $dupId) missing: $got\nall=$all")
      }
    }
  }

  test("simhashPairs pigeonhole recall: planted exact duplicates always pair at hamming 0 (30 corpora)") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val cases: Gen[(List[String], List[Int])] = for {
      docs <- Gen.nonEmptyListOf(Gen.choose(2, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
      dupOf <- Gen.someOf(docs.indices).map(_.toList)
    } yield (docs, dupOf)
    trials(cases, n = 30) { case (base, dupOf) =>
      val all = base ++ dupOf.map(base)
      val d = mkTextDf(all.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      val got = graft.operators.Dedup.simhashPairs(d, "text", "doc_id",
          maxHamming = 3)
        .sdf.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      Df.releaseRetained()
      dupOf.zipWithIndex.foreach { case (orig, di) =>
        val dupId = (base.size + di).toLong
        assert(got.get((orig.toLong, dupId)).contains(0),
          s"planted dup ($orig, $dupId) not at hamming 0: $got\nall=$all")
      }
      // symmetry/orientation: pairs are canonical (id_a < id_b), no dupes
      got.keys.foreach { case (a, b) => assert(a < b, s"non-canonical pair ($a,$b)") }
    }
  }

  test("sequenceIslands differential: maximal consecutive runs vs a model (150 cases)") {
    // per key, distinct sequence numbers partition into maximal runs of
    // consecutive integers; each island reports (start, end, len) —
    // nulls dropped, all-gaps degenerate to singletons
    val cases: Gen[List[(Int, Option[Long])]] = Gen.listOf(Gen.zip(
      Gen.choose(0, 2), Gen.frequency(
        (9, Gen.choose(0L, 25L).map(Some(_))),
        (1, Gen.const(None: Option[Long])))))
      .map(_.distinct) // unique (key, seq): duplicate ids are out of
                       // the numbered-feed contract the operator serves
    trials(cases, n = 150) { rows =>
      val d = Df.fromRows(spark,
        rows.map { case (k, s) =>
          Row(k, s.map(java.lang.Long.valueOf).orNull) },
        StructType(Seq(StructField("k", IntegerType),
          StructField("seq", LongType))))
      val got = graft.operators.Profiling.sequenceIslands(d, Seq("k"), "seq")
        .sdf.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      val want = rows.collect { case (k, Some(s)) => (k, s) }
        .groupBy(_._1).toSeq.flatMap { case (k, g) =>
          val ss = g.map(_._2).distinct.sorted
          val islands = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          ss.foreach { s =>
            if (islands.nonEmpty && islands.last._2 == s - 1)
              islands(islands.size - 1) = (islands.last._1, s)
            else islands += ((s, s))
          }
          islands.map { case (a, b) => (k, a, b, b - a + 1) }
        }.sorted
      assert(got == want, s"\n got=$got\nwant=$want\nrows=$rows")
    }
  }

  test("scd2 differential: validity intervals chain per key, exactly one current (120 cases)") {
    // one row per change with valid_from = its own ts, valid_to = the
    // next change's ts in (ts, version) order, is_current on the open
    // row — intervals must chain gaplessly and exactly one row per key
    // is current
    val cases: Gen[List[(Int, Long, Int)]] = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0, 2)
      t <- Gen.choose(0L, 20L)
      v <- Gen.choose(0, 3)
    } yield (k, t, v)).map(_.distinct)
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    trials(cases, n = 120) { rows =>
      val d = Df.fromRows(spark,
        rows.map { case (k, t, v) => Row(k, ts(t), v) },
        StructType(Seq(StructField("k", IntegerType),
          StructField("ts", TimestampType), StructField("ver", IntegerType))))
      val got = graft.operators.Upsert.scd2(d, Seq("k"), "ts", "ver")
        .sdf.collect().map { r =>
          ((r.getInt(0), r.getTimestamp(1).toInstant.getEpochSecond, r.getInt(2)),
            (Option(r.getTimestamp(4)).map(_.toInstant.getEpochSecond),
              r.getBoolean(5)))
        }.toMap
      rows.groupBy(_._1).foreach { case (k, g) =>
        val srt = g.sortBy(r => (r._2, r._3))
        srt.zipWithIndex.foreach { case ((_, t, v), i) =>
          val (validTo, current) = got((k, t, v))
          val wantTo = if (i + 1 < srt.size) Some(srt(i + 1)._2) else None
          assert(validTo == wantTo && current == wantTo.isEmpty,
            s"key $k row ($t,$v): ($validTo,$current) vs ($wantTo,${wantTo.isEmpty})")
        }
      }
      // exactly one current row per key
      val currents = got.toSeq.groupBy(_._1._1).view
        .mapValues(_.count(_._2._2)).toMap
      assert(currents.values.forall(_ == 1), currents.toString)
    }
  }

  test("applyChanges differential: latest version wins, ties favor the change, tombstones delete (150 cases)") {
    val cases: Gen[(Map[Long, (Long, Double)],
                    List[(Long, Long, Double, Boolean)])] = for {
      baseKeys <- Gen.someOf(0L to 7L)
      baseRows <- Gen.listOfN(baseKeys.size,
        Gen.zip(Gen.choose(0L, 5L), Gen.choose(-50.0, 50.0)))
      changes <- Gen.listOf(for {
        k <- Gen.choose(0L, 9L) // incl. keys absent from base (inserts)
        v <- Gen.choose(0L, 8L)
        x <- Gen.choose(-50.0, 50.0)
        del <- Gen.oneOf(true, false)
      } yield (k, v, x, del))
    } yield (baseKeys.zip(baseRows).map { case (k, (v, x)) => k -> (v, x) }.toMap,
      // one change per (key, version): equal-version changes tie
      // nondeterministically inside max_by — out of contract
      changes.groupBy(c => (c._1, c._2)).values.map(_.head).toList)
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("x", DoubleType), StructField("ver", LongType)))
    trials(cases, n = 150) { case (base, changes) =>
      val b = Df.fromRows(spark,
        base.toSeq.map { case (k, (v, x)) => Row(k, x, v) }, schema)
      val c = Df.fromRows(spark,
        changes.map { case (k, v, x, del) => Row(k, x, v, del) },
        StructType(schema.fields :+ StructField("deleted", BooleanType)))
      val got = graft.operators.Upsert.applyChanges(b, c, Seq("k"), "ver", "deleted")
        .sdf.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
      val want = (base.keySet ++ changes.map(_._1)).flatMap { k =>
        // candidates ordered by (version, priority): change beats base on ties
        val cand =
          base.get(k).map { case (v, x) => (v, 0, x, false) }.toList ++
            changes.collect { case (`k`, v, x, del) => (v, 1, x, del) }
        val (v, _, x, del) = cand.maxBy { case (v, p, _, _) => (v, p) }
        if (del) None else Some(k -> (x, v))
      }.toMap
      assert(got == want, s"\n got=$got\nwant=$want\nbase=$base\nchanges=$changes")
    }
  }

  test("waterFillBudget differential: the exact prefix-scan water level vs a model (150 cases)") {
    // sort groups by (avail, name); level = first k with
    // (budget - prefix_{k-1})/(n-k+1) <= avail_k; groups above the
    // level cap at it, others keep their availability; a non-binding
    // budget caps nothing
    val cases: Gen[(List[Double], Double)] = for {
      avails <- Gen.nonEmptyListOf(Gen.choose(1, 200).map(_ / 4.0))
      budget <- Gen.choose(1, 300).map(_ / 2.0)
    } yield (avails.take(8), budget)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    trials(cases, n = 150) { case (avails, budget) =>
      val groups = avails.zipWithIndex.map { case (a, i) => (f"g$i%02d", a) }
      val d = Df.fromRows(spark,
        groups.map { case (g, a) => Row(g, a) },
        StructType(Seq(StructField("g", StringType),
          StructField("avail", DoubleType))))
      val got = graft.operators.Curation.waterFillBudget(d, "g", "avail", budget)
        .sdf.collect()
        .map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
      val srt = groups.sortBy { case (g, a) => (a, g) }
      val n = srt.size
      var level: Option[Double] = None
      var prefix = 0.0
      for (((_, a), i) <- srt.zipWithIndex if level.isEmpty) {
        val cand = (budget - prefix) / (n - i)
        if (cand <= a) level = Some(cand)
        prefix += a
      }
      groups.foreach { case (g, a) =>
        val capped = level.exists(a > _)
        val alloc = r4(if (capped) level.get else a)
        val (ga, gc) = got(g)
        assert(gc == capped && math.abs(ga - alloc) <= 1e-9,
          s"group $g avail=$a: got ($ga,$gc) want ($alloc,$capped) " +
            s"level=$level budget=$budget avails=$avails")
      }
    }
  }

  test("native expressions differential: JaroWinkler and FloatCosine vs reference kernels (200 cases)") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    // independent Jaro-Winkler (rapidfuzz convention: codepoints,
    // half-window matches, integer-division transpositions, boost only
    // past 0.7, both-empty -> 0.0)
    def jw(a: String, b: String): Double = {
      val s = a.codePoints().toArray; val t = b.codePoints().toArray
      val (n, m) = (s.length, t.length)
      if (n == 0 || m == 0) return 0.0
      val win = math.max(0, math.max(n, m) / 2 - 1)
      val sM = new Array[Boolean](n); val tM = new Array[Boolean](m)
      var matches = 0
      for (i <- 0 until n) {
        var j = math.max(0, i - win)
        val hi = math.min(m - 1, i + win)
        var hit = false
        while (j <= hi && !hit) {
          if (!tM(j) && s(i) == t(j)) { sM(i) = true; tM(j) = true; matches += 1; hit = true }
          j += 1
        }
      }
      if (matches == 0) return 0.0
      var k = 0; var trans = 0
      for (i <- 0 until n if sM(i)) {
        while (!tM(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      val mm = matches.toDouble
      val jaro = (mm / n + mm / m + (mm - trans / 2) / mm) / 3.0
      if (jaro <= 0.7) jaro
      else {
        var l = 0
        val maxL = math.min(4, math.min(n, m))
        while (l < maxL && s(l) == t(l)) l += 1
        jaro + 0.1 * l * (1.0 - jaro)
      }
    }
    val sym = Gen.frequency((8, Gen.oneOf("a", "b", "c")),
      (1, Gen.const("😀")), (1, Gen.const("é")))
    val str = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, sym).map(_.mkString))
    trials(Gen.zip(str, str), n = 200) { case (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .selectExpr("graft_jaro_winkler(a, b)").collect()(0).getDouble(0)
      assert(math.abs(got - jw(a, b)) <= 1e-12,
        s"jw('$a','$b'): $got vs ${jw(a, b)}")
    }
    // FloatCosine: identical left-to-right double accumulation from
    // float inputs -> bit-identical; mismatched lengths and zero
    // vectors -> null
    def cos(x: Seq[Float], y: Seq[Float]): Option[Double] = {
      if (x.size != y.size) return None
      var dot = 0.0; var na = 0.0; var nb = 0.0
      x.indices.foreach { i =>
        val (xv, yv) = (x(i).toDouble, y(i).toDouble)
        dot += xv * yv; na += xv * xv; nb += yv * yv
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) None else Some(dot / denom)
    }
    val vec = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.frequency((6, Gen.choose(-8, 8).map(_ / 4.0f)),
        (1, Gen.const(0.0f)))))
    trials(Gen.zip(vec, vec), n = 200) { case (x, y) =>
      val row = Seq((x, y)).toDF("x", "y")
        .selectExpr("graft_cosine(CAST(x AS array<float>), CAST(y AS array<float>))")
        .collect()(0)
      val got = if (row.isNullAt(0)) None else Some(row.getDouble(0))
      val want = cos(x, y)
      assert((got, want) match {
        case (None, None) => true
        case (Some(g), Some(w)) =>
          java.lang.Double.doubleToRawLongBits(g) ==
            java.lang.Double.doubleToRawLongBits(w)
        case _ => false
      }, s"cos($x,$y): $got vs $want")
    }
  }

  test("SortedJaccard differential and Bloom no-false-negatives (150 cases)") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    // graft_jaccard_sorted over sorted-distinct long arrays = set
    // jaccard; empty ∪ empty -> null
    val arr = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 20L)).map(_.distinct.sorted))
    trials(Gen.zip(arr, arr), n = 150) { case (x, y) =>
      val row = Seq((x, y)).toDF("x", "y")
        .selectExpr("graft_jaccard_sorted(x, y)").collect()(0)
      val got = if (row.isNullAt(0)) None else Some(row.getDouble(0))
      val inter = (x.toSet & y.toSet).size
      val uni = x.size + y.size - inter
      val want = if (uni == 0) None else Some(inter.toDouble / uni)
      assert(got == want, s"jaccard($x,$y): $got vs $want")
    }
    // bloom sketch: every inserted hash MUST report present (a false
    // negative silently re-admits duplicates in the incremental dedup
    // path); absent keys are allowed to false-positive, so only the
    // one-sided contract is asserted
    trials(Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)),
        n = 20) { hashes =>
      hashes.toDF("h")
        .agg(expr(s"graft_bloom_agg(h, ${hashes.size}L)").as("s"))
        .createOrReplaceTempView("__bloom_sk")
      // might_contain requires the sketch as a scalar subquery
      val misses = hashes.toDF("h")
        .selectExpr("graft_might_contain((SELECT s FROM __bloom_sk), h) AS hit")
        .where(!col("hit")).count()
      assert(misses == 0, s"bloom false negatives: $misses of ${hashes.size}")
    }
  }

  test("targetEncodeLoo differential: leave-one-out means vs a model, singletons null (150 cases)") {
    // each row's encoding = mean of the OTHER same-category targets:
    // (sum - y)/(n - 1), computed over exact 2dp decimal sums; a
    // singleton category has no one to borrow from -> null
    val cases: Gen[List[(String, Double)]] = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b", "c", "d"),
      Gen.choose(-200, 200).map(_ / 4.0))) // exact at 2dp
    trials(cases, n = 150) { rows0 =>
      val rows = rows0.zipWithIndex.map { case ((c, y), i) => (i.toLong, c, y) }
      val d = Df.fromRows(spark,
        rows.map { case (i, c, y) => Row(i, c, y) },
        StructType(Seq(StructField("id", LongType),
          StructField("cat", StringType), StructField("y", DoubleType))))
      val got = graft.operators.Features.targetEncodeLoo(d, "cat", "y", "enc")
        .sdf.collect().map(r =>
          r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
      val byCat = rows.groupBy(_._2)
      rows.foreach { case (i, c, y) =>
        val g = byCat(c)
        val want =
          if (g.size <= 1) None
          else Some((g.map(_._3).sum - y) / (g.size - 1.0))
        (got(i), want) match {
          case (None, None) => ()
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) <= 1e-9, s"row $i: $a vs $b (rows=$rows0)")
          case other => fail(s"row $i null-ness: $other (rows=$rows0)")
        }
      }
    }
  }

  test("psiDrift differential: bins, probabilities and PSI terms vs the formula (100 cases)") {
    // equi-width bins from the BASELINE's [min, max], out-of-range
    // current values clamp to edge bins, p's floored at eps, term =
    // (p_cur - p_base) * ln(p_cur/p_base) with the DECIMAL(18,8)
    // libm absorption, everything rounded 6dp
    val eps = 1e-6
    val cases: Gen[(List[Double], List[Double], Int)] = for {
      base <- Gen.nonEmptyListOf(Gen.choose(-80, 80).map(_ / 2.0))
        .suchThat(b => b.distinct.size >= 2) // constant baseline: no width
      cur <- Gen.nonEmptyListOf(Gen.choose(-120, 120).map(_ / 2.0))
      bins <- Gen.choose(2, 8)
    } yield (base, cur, bins)
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    trials(cases, n = 100) { case (base, cur, bins) =>
      val sch = StructType(Seq(StructField("v", DoubleType)))
      val bd = Df.fromRows(spark, base.map(Row(_)), sch)
      val cd = Df.fromRows(spark, cur.map(Row(_)), sch)
      val got = graft.operators.Profiling.psiDrift(bd, cd, "v", bins)
        .sdf.collect().map(row => row.getInt(0) ->
          (row.getLong(1), row.getLong(2), row.getDouble(5), row.getDouble(6)))
        .toMap
      val (lo, hi) = (base.min, base.max)
      val w = (hi - lo) / bins
      def bin(x: Double): Int =
        math.min(math.max(math.floor((x - lo) / w), 0.0), (bins - 1).toDouble).toInt
      val nB = base.groupBy(bin).view.mapValues(_.size.toLong).toMap
      val nC = cur.groupBy(bin).view.mapValues(_.size.toLong).toMap
      val occupied = nB.keySet ++ nC.keySet
      val terms = occupied.toSeq.sorted.map { b =>
        val pB = math.max(nB.getOrElse(b, 0L).toDouble / base.size, eps)
        val pC = math.max(nC.getOrElse(b, 0L).toDouble / cur.size, eps)
        b -> r((pC - pB) * r(math.log(pC / pB), 8), 6)
      }.toMap
      val total = r(terms.values.sum, 6)
      assert(got.keySet == occupied, s"bins: ${got.keySet} vs $occupied")
      occupied.foreach { b =>
        val (gb, gc, gt, gtot) = got(b)
        assert(gb == nB.getOrElse(b, 0L) && gc == nC.getOrElse(b, 0L),
          s"bin $b counts: ($gb,$gc) vs (${nB.getOrElse(b, 0L)},${nC.getOrElse(b, 0L)})")
        assert(math.abs(gt - terms(b)) <= 1e-9, s"bin $b term: $gt vs ${terms(b)}")
        assert(math.abs(gtot - total) <= 1e-9, s"psi_total: $gtot vs $total")
      }
    }
  }

  test("ewmaMean differential: pandas ewm(adjust=True) mean on null-free series (120 cases)") {
    // pandas y_i = sum_j (1-a)^(i-j) x_j / sum_j (1-a)^(i-j): with the
    // short series drawn here the operator's eps-truncation window
    // exceeds the series length, so the model is the exact full
    // history; compare to 1e-9 relative (decimal-vs-double conversion
    // noise, documented in the scaladoc)
    val cases: Gen[(List[Double], Double)] = for {
      xs <- Gen.nonEmptyListOf(Gen.choose(-50.0, 50.0))
      alpha <- Gen.oneOf(0.5, 0.25, 0.3, 0.7)
    } yield (xs.take(60), alpha)
    trials(cases, n = 120) { case (xs, alpha) =>
      val d = Df.fromRows(spark,
        xs.zipWithIndex.map { case (x, i) => Row(i.toLong, x) },
        StructType(Seq(StructField("i", LongType), StructField("x", DoubleType))))
      val got = graft.operators.TimeSeries.ewmaMean(
          d, keyCols = Nil, orderCols = Seq("i"), valCol = "x", alpha = alpha)
        .sdf.orderBy("i").collect().map(_.getDouble(2))
      val decay = 1 - alpha
      xs.indices.foreach { i =>
        val weights = (0 to i).map(j => math.pow(decay, (i - j).toDouble))
        val want = (0 to i).map(j => xs(j) * weights(j)).sum / weights.sum
        assert(math.abs(got(i) - want) <= 1e-9 * math.max(1.0, math.abs(want)),
          s"i=$i alpha=$alpha: ${got(i)} vs $want")
      }
    }
  }
  test("isin/between masks are total booleans with pandas null semantics") {
    trials(Gen.listOfN(30, values), n = 12) { xs =>
      val d = mkDf(xs)
      // isin without null in values: missing (null or NaN) -> false
      val m1 = d.assign("m", d("v").isin(1.0, 2.0, 3.0))
        .sdf.select("m").collect().map(r => r.get(0))
      m1.zip(xs).foreach { case (g, x) =>
        assert(g != null, "isin mask must never be null")
        val want = x != null && !x.isNaN && Set(1.0, 2.0, 3.0).contains(x.doubleValue)
        assert(g == want, s"isin($x)")
      }
      // isin WITH null in values: missing -> true (pandas matches NaN)
      val m2 = d.assign("m", d("v").isin(1.0, null))
        .sdf.select("m").collect().map(r => r.get(0))
      m2.zip(xs).foreach { case (g, x) =>
        val missing = x == null || x.isNaN
        val want = missing || x.doubleValue == 1.0
        assert(g == want, s"isin-with-null($x)")
      }
      // between: null row -> false, NaN row -> false, both engines' story
      for (inc <- Seq("both", "left", "right", "neither")) {
        val mb = d.assign("m", d("v").between(-100.0, 100.0, inc))
          .sdf.select("m").collect().map(r => r.get(0))
        mb.zip(xs).foreach { case (g, x) =>
          assert(g != null, "between mask must never be null")
          val want = x != null && !x.isNaN && {
            val v = x.doubleValue
            inc match {
              case "both"    => v >= -100.0 && v <= 100.0
              case "left"    => v >= -100.0 && v < 100.0
              case "right"   => v > -100.0 && v <= 100.0
              case "neither" => v > -100.0 && v < 100.0
            }
          }
          assert(g == want, s"between($x, $inc)")
        }
      }
    }
  }
}
