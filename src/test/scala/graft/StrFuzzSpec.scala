package graft

import graft.api.Df
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the `.str` accessor vs an independent CPython
  * string-semantics model (SURVEY.md §5 plan item c). The accessor
  * documents CPython behavior where it diverges from Spark's builtins
  * (zfill sign handling + no-truncate, pad no-truncate, center's odd-
  * margin rule, strip's full whitespace class, get's negative index) —
  * each of those contracts is re-derived here in plain Scala from the
  * CPython definitions and checked per-row over adversarial alphabets
  * (signs, unicode digits, NBSP/ideographic space, empty, null). */
class StrFuzzSpec extends AnyFunSuite {
  import TestSpark._

  // GRAFT_FUZZ_TRIALS multiplies the per-test draw count for one-off
  // robustness sweeps (unset -> 1, the committed default)
  private val trialMult = sys.env.get("GRAFT_FUZZ_TRIALS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1)
  private def trials[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit = {
    var s = org.scalacheck.rng.Seed(1337L)
    (0 until n * trialMult).foreach { _ =>
      g.apply(org.scalacheck.Gen.Parameters.default, s).foreach(body)
      s = s.next
    }
  }

  // BMP-only adversarial alphabet: ASCII letters/digits, signs, regex
  // metachars kept OUT (replace/extract are regex-documented), unicode
  // digits (Arabic-Indic ٣, Devanagari ५), accented letters,
  // and the CPython whitespace suspects Spark's trim ignores (NBSP,
  // ideographic space, vertical tab).
  private val chars: Gen[Char] = Gen.frequency(
    (6, Gen.alphaNumChar),
    (2, Gen.oneOf('+', '-', '_', '*', '.')),
    (2, Gen.oneOf('\u0663', '\u096b', '\u00e9', '\u00d1', '\u03a9')),
    (2, Gen.oneOf(' ', '\t', '\n', '', ' ', '　')))

  private val strs: Gen[String] = Gen.frequency(
    (8, Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, chars).map(_.mkString))),
    (1, Gen.const(null.asInstanceOf[String])))

  private def mkDf(xs: List[String]): Df =
    Df.fromRows(spark, xs.map(Row(_)),
      StructType(Seq(StructField("s", StringType))))

  private def run(xs: List[String], f: Df => graft.api.Ser): List[Option[String]] = {
    val d = mkDf(xs)
    d.assign("o", f(d)).sdf.select("o").collect()
      .map(r => Option(r.get(0)).map(_.toString)).toList
  }

  private def hex(s: String): String =
    s.map(c => f"\\u${c.toInt}%04x").mkString

  // ---- CPython models, written from the definitions, not the impl ----

  /** str.zfill: sign keeps position, fill with '0', never truncate. */
  private def pyZfill(s: String, w: Int): String = {
    if (s.length >= w) s
    else {
      val sign = if (s.nonEmpty && (s(0) == '+' || s(0) == '-')) s.substring(0, 1) else ""
      val body = s.substring(sign.length)
      sign + ("0" * (w - sign.length - body.length)) + body
    }
  }

  /** str.ljust / rjust / center — center puts the extra char LEFT when
    * both margin and width are odd (CPython stringlib pad()). */
  private def pyPad(s: String, w: Int, fc: Char, side: String): String = {
    if (s.length >= w) s
    else side match {
      case "left"  => fc.toString * (w - s.length) + s
      case "right" => s + fc.toString * (w - s.length)
      case "both" =>
        val marg = w - s.length
        val left = marg / 2 + (marg & w & 1)
        fc.toString * left + s + fc.toString * (marg - left)
    }
  }

  /** CPython str.isspace set (BMP members our alphabet can draw, plus
    * the full class for safety), from the CPython unicodeobject docs. */
  private def pySpace(c: Char): Boolean =
    (c >= '\t' && c <= '\r') || (c >= '\u001c' && c <= '\u001f') ||
    c == ' ' || c == '\u0085' || c == '\u00a0' || c == '\u1680' ||
    (c >= '\u2000' && c <= '\u200a') || c == '\u2028' || c == '\u2029' ||
    c == '\u202f' || c == '\u205f' || c == '\u3000'

  private def pyStrip(s: String): String =
    s.dropWhile(pySpace).reverse.dropWhile(pySpace).reverse

  test("zfill matches CPython: sign position, no truncation, null passthrough") {
    trials(Gen.zip(Gen.listOfN(24, strs), Gen.choose(0, 10)), n = 12) { case (xs, w) =>
      val got = run(xs, d => d("s").str.zfill(w))
      xs.zip(got).foreach { case (x, g) =>
        assert(g == Option(x).map(pyZfill(_, w)),
          s"zfill(${Option(x).map(hex)}, $w)")
      }
    }
  }

  test("pad matches CPython ljust/rjust/center incl. the odd-margin rule") {
    val cases = Gen.zip(Gen.listOfN(20, strs), Gen.choose(0, 11),
      Gen.oneOf("left", "right", "both"), Gen.oneOf('*', '0', 'x'))
    trials(cases, n = 15) { case (xs, w, side, fc) =>
      val got = run(xs, d => d("s").str.pad(w, fc.toString, side))
      xs.zip(got).foreach { case (x, g) =>
        assert(g == Option(x).map(pyPad(_, w, fc, side)),
          s"pad(${Option(x).map(hex)}, $w, '$fc', $side)")
      }
    }
  }

  test("strip matches CPython isspace class (NBSP, ideographic space, VT)") {
    trials(Gen.listOfN(30, strs), n = 12) { xs =>
      val got = run(xs, d => d("s").str.strip)
      xs.zip(got).foreach { case (x, g) =>
        assert(g == Option(x).map(pyStrip), s"strip(${Option(x).map(hex)})")
      }
    }
  }

  test("get matches s[i]: negative index, out-of-range -> null") {
    trials(Gen.zip(Gen.listOfN(24, strs), Gen.choose(-6, 6)), n = 12) { case (xs, i) =>
      val got = run(xs, d => d("s").str.get(i))
      xs.zip(got).foreach { case (x, g) =>
        val want = Option(x).flatMap { s =>
          val j = if (i < 0) s.length + i else i
          if (j >= 0 && j < s.length) Some(s(j).toString) else None
        }
        assert(g == want, s"get(${Option(x).map(hex)}, $i)")
      }
    }
  }

  test("capitalize matches CPython: first upper, rest lower") {
    trials(Gen.listOfN(30, strs), n = 10) { xs =>
      val got = run(xs, d => d("s").str.capitalize)
      xs.zip(got).foreach { case (x, g) =>
        val want = Option(x).map { s =>
          if (s.isEmpty) s
          else s.substring(0, 1).toUpperCase + s.substring(1).toLowerCase
        }
        assert(g == want, s"capitalize(${Option(x).map(hex)})")
      }
    }
  }

  test("countChar counts exact occurrences of one char") {
    trials(Gen.zip(Gen.listOfN(24, strs), Gen.oneOf('a', '+', '\u0663', ' ')),
      n = 12) { case (xs, ch) =>
      val got = run(xs, d => d("s").str.countChar(ch.toString))
      xs.zip(got).foreach { case (x, g) =>
        assert(g.map(_.toInt) == Option(x).map(_.count(_ == ch)),
          s"countChar(${Option(x).map(hex)}, '$ch')")
      }
    }
  }

  test("isdigit/isalpha match the documented unicode classes") {
    trials(Gen.listOfN(30, strs), n = 10) { xs =>
      val gd = run(xs, d => d("s").str.isdigit)
      val ga = run(xs, d => d("s").str.isalpha)
      xs.zip(gd.zip(ga)).foreach { case (x, (dg, ag)) =>
        val wantD = Option(x).map(s => s.nonEmpty &&
          s.forall(c => Character.getType(c) == Character.DECIMAL_DIGIT_NUMBER))
        val wantA = Option(x).map(s => s.nonEmpty && s.forall(Character.isLetter))
        assert(dg.map(_.toBoolean) == wantD, s"isdigit(${Option(x).map(hex)})")
        assert(ag.map(_.toBoolean) == wantA, s"isalpha(${Option(x).map(hex)})")
      }
    }
  }

  test("contains regex=true routes through rlike; literal default unchanged") {
    val xs = List("abc123", "a+b", null, "xyz", "12ab")
    val lit = run(xs, d => d("s").str.contains("a+b"))
    assert(lit == List(Some("false"), Some("true"), None, Some("false"), Some("false")))
    val re = run(xs, d => d("s").str.contains("a+b", regex = true))
    // regex a+b (one-or-more 'a' then 'b') searches unanchored, like
    // pandas re.search: hits the "ab" inside "abc123" and "12ab",
    // misses the literal "a+b"
    assert(re == List(Some("true"), Some("false"), None, Some("false"), Some("true")))
  }

  // ---- DIVERGENCES #17 migration pins (r12 verdict #4): the two .str
  // verbs whose DEFAULT contract differs from pandas must have their
  // escape hatches pinned against independent models, so a migrating
  // user can rely on the documented translation exactly. ----

  test("contains(pat, regex=true) is pandas re.search on 200 random pattern/input pairs") {
    // pattern generator: compositional VALID regexes over constructs
    // whose semantics agree between Python re and Java regex (literals,
    // '.', classes, alternation, '*'/'+' on the last atom) — so a
    // driver-side java.util.regex .find() is a faithful stand-in for
    // the pandas re.search model
    val atom: Gen[String] = Gen.frequency(
      (6, Gen.alphaNumChar.map(_.toString)),
      (1, Gen.const(".")),
      (1, Gen.oneOf("[abc]", "[0-9]", "(a|b)")))
    val pat: Gen[String] = for {
      n <- Gen.choose(1, 4)
      atoms <- Gen.listOfN(n, atom)
      star <- Gen.oneOf("", "*", "+")
    } yield atoms.mkString + (if (atoms.last.length == 1) star else "")
    val inputs: Gen[String] = Gen.frequency(
      (8, Gen.choose(0, 10).flatMap(k =>
        Gen.listOfN(k, Gen.frequency((5, Gen.oneOf('a', 'b', 'c', '0', '1')),
          (2, Gen.alphaNumChar))).map(_.mkString))),
      (1, Gen.const(null.asInstanceOf[String])))
    var pairs = 0
    trials(Gen.zip(pat, Gen.listOfN(10, inputs)), n = 20) { case (p, xs) =>
      val got = run(xs, d => d("s").str.contains(p, regex = true))
      xs.zip(got).foreach { case (x, g) =>
        pairs += 1
        val want = Option(x).map(s =>
          java.util.regex.Pattern.compile(p).matcher(s).find().toString)
        assert(g == want, s"contains('${Option(x).getOrElse("null")}', /$p/, regex=true)")
      }
    }
    assert(pairs == 200 * trialMult) // loop-ran self-check, scales with sweeps
  }

  test("slice(start, len) is CPython s[start:start+len] for non-negative start") {
    trials(Gen.zip(Gen.choose(0, 6), Gen.choose(0, 5), Gen.listOfN(25, strs)),
           n = 8) { case (start, len, xs) =>
      val got = run(xs, d => d("s").str.slice(start, len))
      xs.zip(got).foreach { case (x, g) =>
        val want = Option(x).map { s =>
          val from = math.min(start, s.length)
          s.substring(from, math.min(from + len, s.length))
        }
        assert(g == want,
          s"slice(${Option(x).map(hex)}, start=$start, len=$len)")
      }
    }
  }
}
