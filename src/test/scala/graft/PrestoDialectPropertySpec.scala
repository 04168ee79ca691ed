package graft

import graft.sql.PrestoDialect
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based hardening of the dialect front door: the tokenizer +
  * lowering must be total (never throw) on arbitrary input, re-render
  * losslessly, and never touch the CONTENT of string literals — the
  * invariants every text-level SQL rewriter must hold to be safe in
  * front of a real parser. Generators are scalacheck's, driven by a
  * fixed-seed sampling loop (the scalatest bridge artifact is not in
  * the offline cache). */
class PrestoDialectPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default.withSize(40)
    (0 until n).flatMap(i => g.apply(params, Seed(42L + i)))
  }

  // SQL-ish token soup: words, numbers, operators, quotes, parens —
  // biased toward the shapes the passes trigger on.
  private val word = Gen.oneOf("select", "from", "where", "try", "array", "row",
    "unnest", "explain", "cast", "at", "time", "zone", "x", "t1", "col_a")
  private val sym = Gen.oneOf("(", ")", "[", "]", ",", ".", "||", "<=", "->", "*", "=")
  private val lit = Gen.alphaNumStr.map(s => "'" + s + "'")
  private val quoted = Gen.alphaNumStr.suchThat(_.nonEmpty).map(s => "\"" + s + "\"")
  private val num = Gen.chooseNum(0, 999999).map(_.toString)
  private val piece = Gen.frequency((6, word), (3, sym), (2, lit), (1, quoted), (2, num))
  private val sqlish: Gen[String] = Gen.listOf(piece).map(_.mkString(" "))

  test("transform is total on SQL-ish token soup (500 samples)") {
    samples(sqlish, 500).foreach { s =>
      PrestoDialect.transform(s) // must not throw
    }
  }

  test("tokenize + render is lossless (500 samples)") {
    samples(sqlish, 500).foreach { s =>
      assert(PrestoDialect.render(PrestoDialect.tokenize(s)) == s)
    }
  }

  test("transform is total on fully arbitrary printable strings (500 samples)") {
    samples(Gen.asciiPrintableStr, 500).foreach { s =>
      PrestoDialect.transform(s)
    }
  }

  test("string literal content survives every pass") {
    // content with SQL-looking text inside quotes must pass through
    // byte-identical (rewriting quoted text would corrupt data)
    val contents = Seq("TRY(CAST(x AS INTEGER))", "ARRAY[1,2]",
      "select * from t", "a||b", "ROW(1)", "UNNEST(xs)", "it''s")
    contents.foreach { c =>
      val out = PrestoDialect.transform(s"SELECT '$c' AS v FROM t")
      assert(out.contains(s"'$c'"), s"literal content changed: $out")
    }
  }
}
