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

  // ---- round-19 widening (r18 verdict next-step #6): perturbation
  // fuzz over statement-shaped input, comment totality, paren balance,
  // and idempotence — the invariants that separate "mis-rewrote
  // silently" from "errored by name".

  private val statements = Seq(
    "SELECT TRY(CAST(x AS INTEGER)) FROM t WHERE a || b = 'c'",
    "SELECT * FROM t CROSS JOIN UNNEST(xs) AS u(v)",
    "SELECT transform(xs, x -> x + 1) FROM t",
    "SELECT CAST(ROW(1, 'a') AS ROW(i INTEGER, s VARCHAR)) FROM t",
    "SELECT ts AT TIME ZONE 'UTC' FROM events",
    "SELECT approx_percentile(v, 0.5) FILTER (WHERE v > 0) FROM t GROUP BY k",
    "SELECT a FROM t WHERE a IN (SELECT b FROM s) ORDER BY 1 LIMIT 10",
    "SELECT element_at(m, 'k'), cardinality(xs) FROM t",
    // statement/DDL shapes: the rewrites that trigger on statement heads
    "EXPLAIN (TYPE DISTRIBUTED) SELECT * FROM t",
    "SHOW STATS FOR (SELECT * FROM t WHERE a > 0)",
    "CREATE TABLE u AS SELECT a, b FROM t WITH NO DATA",
    "ANALYZE t WITH (columns = ARRAY['a'])",
    "SELECT * FROM t FOR TIMESTAMP AS OF TIMESTAMP '2024-01-01 00:00:00'",
    "DELETE FROM t WHERE a IN (SELECT b FROM s)")

  test("token perturbations, exhaustive: total, and never corrupt string literals") {
    // delete/duplicate/swap EVERY token of every fixture (exhaustive —
    // ~600 damaged inputs): whatever the damaged input does to the
    // passes (rewrite, no-op, or error by name), transform must
    // terminate and literal CONTENT must never change — a mis-rewrite
    // inside quotes is data corruption, the one outcome fuzzing exists
    // to exclude. This enumeration found (round 19) the UNNEST alias
    // pass looping forever on an unmatched '(' in the column list
    // ("AS u(v" / "AS u((v)") — the -1 from matchFwd restarted the
    // scan; the pass now leaves malformed spans unrewritten.
    for {
      stmt <- statements
      toks = PrestoDialect.tokenize(stmt)
      idx <- toks.indices
      mode <- 0 to 2
    } {
      val damaged = mode match {
        case 0 => toks.patch(idx, Nil, 1)                 // delete
        case 1 => toks.patch(idx, Seq(toks(idx), toks(idx)), 1) // duplicate
        case _ => if (idx + 1 < toks.length)
          toks.patch(idx, Seq(toks(idx + 1), toks(idx)), 2) else toks // swap
      }
      val in = PrestoDialect.render(damaged)
      val lits = damaged.collect { case s: PrestoDialect.Str => s.text }
      try {
        val out = PrestoDialect.transform(in)
        lits.foreach(l => assert(out.contains(l),
          s"literal $l corrupted: '$in' -> '$out'"))
      } catch {
        case e: Exception => // erroring by name is allowed; silence is not
          assert(Option(e.getMessage).exists(_.nonEmpty), s"nameless error on '$in'")
      }
    }
  }

  test("comment-laced input: totality, and comment text never reaches the output (400 samples)") {
    val commented = for {
      s1 <- sqlish; s2 <- sqlish
      c <- Gen.alphaNumStr
      style <- Gen.oneOf(0, 1)
    } yield if (style == 0) s"$s1 -- ZQX$c\n$s2" else s"$s1 /* ZQX$c */ $s2"
    samples(commented, 400).foreach { s =>
      val out = PrestoDialect.transform(s) // must not throw
      assert(!out.contains("ZQX"), s"comment text leaked: '$s' -> '$out'")
    }
  }

  test("transform preserves bracket balance on balanced statement input") {
    def balance(s: String): (Int, Int) = {
      val toks = PrestoDialect.tokenize(s)
      val parens = toks.collect { case PrestoDialect.Sym("(") => 1
        case PrestoDialect.Sym(")") => -1 }.sum
      val brackets = toks.collect { case PrestoDialect.Sym("[") => 1
        case PrestoDialect.Sym("]") => -1 }.sum
      (parens, brackets)
    }
    statements.foreach { s =>
      assert(balance(s) == ((0, 0)), s"fixture not balanced: $s")
      assert(balance(PrestoDialect.transform(s)) == ((0, 0)),
        s"transform unbalanced: $s -> ${PrestoDialect.transform(s)}")
    }
  }

  test("transform is idempotent on statement fixtures and token soup (300 samples)") {
    // the output is Spark SQL: no Presto-ism should remain for a second
    // pass to rewrite differently
    (statements ++ samples(sqlish, 300)).foreach { s =>
      val once = PrestoDialect.transform(s)
      assert(PrestoDialect.transform(once) == once,
        s"not idempotent on '$s': '$once' -> '${PrestoDialect.transform(once)}'")
    }
  }
}
