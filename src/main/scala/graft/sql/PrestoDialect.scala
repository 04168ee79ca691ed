package graft.sql

import scala.collection.mutable

/** Structural Presto → Spark SQL lowering — the grammar-aware half of the
  * Presto front door (the function-NAME half stays in [[PrestoRewriter]]).
  *
  * The reference parses Presto SQL with a full ANTLR grammar and lowers
  * the AST onto its logical plan (axiom/sql/presto/grammar/PrestoSql.g4;
  * axiom/sql/presto/ast/AstBuilder.cpp). Spark already owns a complete
  * SQL grammar, so the Spark-first rendering is a DIALECT FRONT END:
  * tokenize the Presto text, lower the constructs Spark's grammar does
  * not share onto equivalent Spark constructs, and delegate the rest of
  * parsing/analysis to Catalyst via the injected [[PrestoParser]]. This
  * is a real tokenizer + bracket-matched, scope-tracked transforms — not
  * regex — so string literals, nesting, and subqueries are handled.
  *
  * Lowerings (reference files cited per pass):
  *  - `CROSS JOIN UNNEST(e1..en) [WITH ORDINALITY] [AS] a(c1..cm)` and
  *    `LEFT JOIN UNNEST(..) ON TRUE` → `LATERAL VIEW [OUTER]` over
  *    explode/inline (AstBuilder.cpp UNNEST relation; Spark's UNNEST
  *    grammar gap). Ordinality is 1-based BIGINT like Presto's.
  *  - `TRY(expr)` → `graft_try(expr)` = Catalyst TryEval (AstFunctions.h:190).
  *  - `ARRAY[..]` → `array(..)` (AstFunctions.h:279 arrayConstructor).
  *  - `ROW(..)` value constructor → `struct(..)`; `CAST(x AS ROW(f T,..))`
  *    type syntax → `STRUCT<f: T,..>` incl. nested ARRAY(T)/MAP(K,V)
  *    (AstFunctions.h:396 rowConstructor; Presto type grammar).
  *  - `x AT TIME ZONE 'z'` → `convert_timezone('UTC', 'z',
  *    cast(x as timestamp_ntz))` (AstFunctions.h:355) — session zone is
  *    UTC, so the NTZ wall-clock in 'z' of the same instant, which is
  *    exactly what Presto renders for timestamp-with-timezone.
  *  - bare `VARCHAR`/`REAL`/`JSON` type words → `STRING`/`FLOAT`/`STRING`.
  */
object PrestoDialect {

  // ------------------------------------------------------------ tokenizer
  sealed trait Tok { def text: String }
  final case class Word(text: String) extends Tok { val lower: String = text.toLowerCase }
  final case class Quoted(text: String) extends Tok // "ident" or `ident`, quotes kept
  final case class Str(text: String) extends Tok    // 'literal', quotes kept
  final case class Num(text: String) extends Tok
  final case class Sym(text: String) extends Tok
  final case class Space(text: String) extends Tok

  private val twoCharOps = Set("||", "<=", ">=", "<>", "!=", "->", "=>")

  def tokenize(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) {
        val s = i; while (i < n && sql.charAt(i).isWhitespace) i += 1
        out += Space(sql.substring(s, i))
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
        out += Space(" ")
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2; while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
        out += Space(" ")
      } else if (c == '\'') {
        val s = i; i += 1
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2 else { i += 1; done = true }
          } else i += 1
        }
        out += Str(sql.substring(s, i))
      } else if (c == '"' || c == '`') {
        val s = i; i += 1
        while (i < n && sql.charAt(i) != c) i += 1
        i = math.min(i + 1, n)
        out += Quoted(sql.substring(s, i))
      } else if (c.isDigit) {
        val s = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) i += 1
        if (i < n && (sql.charAt(i) == 'e' || sql.charAt(i) == 'E')) {
          val save = i
          i += 1
          if (i < n && (sql.charAt(i) == '+' || sql.charAt(i) == '-')) i += 1
          if (i < n && sql.charAt(i).isDigit) { while (i < n && sql.charAt(i).isDigit) i += 1 }
          else i = save
        }
        out += Num(sql.substring(s, i))
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_' || sql.charAt(i) == '$')) i += 1
        out += Word(sql.substring(s, i))
      } else {
        if (i + 1 < n && twoCharOps(sql.substring(i, i + 2))) {
          out += Sym(sql.substring(i, i + 2)); i += 2
        } else { out += Sym(c.toString); i += 1 }
      }
    }
    out.result()
  }

  def render(toks: Seq[Tok]): String = toks.map(_.text).mkString

  // --------------------------------------------------------- tok helpers
  private def isSpace(t: Tok) = t.isInstanceOf[Space]
  private def nextM(toks: Vector[Tok], i: Int): Int = {
    var j = i + 1; while (j < toks.length && isSpace(toks(j))) j += 1
    if (j < toks.length) j else -1
  }
  private def prevM(toks: Vector[Tok], i: Int): Int = {
    var j = i - 1; while (j >= 0 && isSpace(toks(j))) j -= 1
    j
  }
  private def wordAt(toks: Vector[Tok], i: Int): String = toks.lift(i) match {
    case Some(w: Word) => w.lower
    case _ => ""
  }
  private def isOpen(t: Tok) = t == Sym("(") || t == Sym("[")
  private def isClose(t: Tok) = t == Sym(")") || t == Sym("]")

  /** Index of the bracket matching the opener at i (forward). -1 if none. */
  private def matchFwd(toks: Vector[Tok], i: Int): Int = {
    var depth = 0; var j = i
    while (j < toks.length) {
      if (isOpen(toks(j))) depth += 1
      else if (isClose(toks(j))) { depth -= 1; if (depth == 0) return j }
      j += 1
    }
    -1
  }

  /** Index of the bracket matching the closer at i (backward). -1 if none. */
  private def matchBwd(toks: Vector[Tok], i: Int): Int = {
    var depth = 0; var j = i
    while (j >= 0) {
      if (isClose(toks(j))) depth += 1
      else if (isOpen(toks(j))) { depth -= 1; if (depth == 0) return j }
      j -= 1
    }
    -1
  }

  /** Bracket depth just before each token. */
  private def depths(toks: Vector[Tok]): Array[Int] = {
    val d = new Array[Int](toks.length + 1)
    var cur = 0
    var i = 0
    while (i < toks.length) {
      d(i) = cur
      if (isOpen(toks(i))) cur += 1 else if (isClose(toks(i))) cur -= 1
      i += 1
    }
    d(toks.length) = cur
    d
  }

  /** Split a token slice on top-level commas. */
  private def splitTop(ts: Vector[Tok]): Vector[Vector[Tok]] = {
    val out = Vector.newBuilder[Vector[Tok]]
    var depth = 0
    var cur = Vector.newBuilder[Tok]
    ts.foreach { t =>
      if (isOpen(t)) depth += 1
      else if (isClose(t)) depth -= 1
      if (t == Sym(",") && depth == 0) { out += cur.result(); cur = Vector.newBuilder[Tok] }
      else cur += t
    }
    val last = cur.result()
    if (last.exists(!isSpace(_))) out += last
    out.result()
  }

  // ------------------------------------------------- pass: UNNEST joins
  private val clauseKw = Set("where", "group", "having", "window", "order",
    "limit", "offset", "union", "intersect", "except", "qualify", "fetch")
  private val aliasStop = clauseKw ++ Set("on", "cross", "left", "right",
    "full", "inner", "outer", "join", "as", "with", "lateral", "natural", "using")

  private final case class UnnestSpec(start: Int, end: Int, depth: Int,
    outer: Boolean, exprs: Vector[String], cols: Vector[String],
    alias: String, ordinality: Boolean)

  /** `CROSS JOIN UNNEST(..)` / `LEFT JOIN UNNEST(..) ON TRUE` → Spark
    * `LATERAL VIEW [OUTER]` appended at the end of the FROM clause of the
    * same scope. Single array/map without ordinality lowers to `explode`;
    * the general case (multi-array zip, ordinality) lowers to
    * `inline(slice(transform(sequence(..)..)..))` with Presto's
    * null-padding and 1-based BIGINT ordinality. */
  private[sql] def rewriteUnnestJoins(toks: Vector[Tok]): Vector[Tok] = {
    val dep = depths(toks)
    val specs = mutable.ArrayBuffer.empty[UnnestSpec]
    var i = 0
    var uid = 0
    while (i < toks.length) {
      if (wordAt(toks, i) == "unnest" && wordAt(toks, prevM(toks, i)) == "join") {
        val joinIdx = prevM(toks, i)
        // collect join-type words going back: CROSS | LEFT [OUTER] | INNER
        var start = joinIdx
        var kws = Set.empty[String]
        var p = prevM(toks, joinIdx)
        while (p >= 0 && Set("cross", "left", "inner", "outer")(wordAt(toks, p))) {
          kws += wordAt(toks, p); start = p; p = prevM(toks, p)
        }
        val unsupported = Set("right", "full")(wordAt(toks, p))
        val open = nextM(toks, i)
        if (!unsupported && open >= 0 && toks(open) == Sym("(")) {
          val close = matchFwd(toks, open)
          if (close >= 0) {
            val exprs = splitTop(toks.slice(open + 1, close)).map(render(_).trim)
            var k = nextM(toks, close)
            var ordinality = false
            if (wordAt(toks, k) == "with" && wordAt(toks, nextM(toks, k)) == "ordinality") {
              ordinality = true; k = nextM(toks, nextM(toks, k))
            }
            if (wordAt(toks, k) == "as") k = nextM(toks, k)
            var alias = ""
            var cols = Vector.empty[String]
            toks.lift(k) match {
              case Some(w: Word) if !aliasStop(w.lower) =>
                alias = w.text; k = nextM(toks, k)
              case Some(q: Quoted) =>
                alias = q.text.substring(1, q.text.length - 1); k = nextM(toks, k)
              case _ =>
            }
            var malformed = false
            if (k >= 0 && toks(k) == Sym("(")) {
              val cClose = matchFwd(toks, k)
              // unmatched '(' in the alias column list (fuzz find,
              // round 19): nextM(toks, -1) would restart the scan and
              // `i = end - 1` rewound the outer loop — an infinite
              // loop on input Spark's parser should simply reject.
              // Leave the span unrewritten instead of mis-rewriting.
              if (cClose < 0) malformed = true
              else {
                cols = splitTop(toks.slice(k + 1, cClose)).map(render(_).trim).map {
                  c => if (c.startsWith("\"")) c.substring(1, c.length - 1) else c
                }
                k = nextM(toks, cClose)
              }
            }
            val outer = kws("left")
            // LEFT JOIN UNNEST must close with ON TRUE (Presto grammar).
            var ok = !malformed
            var end = if (k >= 0) k else toks.length
            if (outer) {
              if (wordAt(toks, k) == "on" && wordAt(toks, nextM(toks, k)) == "true")
                end = nextM(toks, k) + 1
              else ok = false
            } else if (wordAt(toks, k) == "on") {
              // CROSS JOIN has no ON; an ON here means something we don't model
              ok = false
            }
            if (ok) {
              uid += 1
              if (alias.isEmpty) alias = s"__graft_u$uid"
              if (cols.isEmpty)
                cols = if (exprs.length == 1 && !ordinality) Vector("col")
                       else (1 to exprs.length).map(x => s"c$x").toVector ++
                            (if (ordinality) Vector("ordinality") else Vector.empty)
              specs += UnnestSpec(start, end, dep(start), outer, exprs, cols, alias, ordinality)
              i = end - 1
            }
          }
        }
      }
      i += 1
    }
    if (specs.isEmpty) return toks

    // Insertion point per spec: first clause keyword (or scope close, or
    // end of stream) at the spec's own depth, scanning right of the span.
    val inserts = mutable.Map.empty[Int, mutable.ArrayBuffer[String]]
    specs.foreach { sp =>
      var j = sp.end
      var at = toks.length
      var found = false
      while (j < toks.length && !found) {
        // A `)` carries the depth of the scope it CLOSES (depths()
        // decrements after assigning), so the enclosing subquery's
        // closing paren sits at dep == sp.depth — the LATERAL VIEW must
        // land before it, inside the subquery, not after.
        if (dep(j) < sp.depth ||
            (dep(j) == sp.depth && isClose(toks(j)))) { at = j; found = true }
        else if (dep(j) == sp.depth && clauseKw(wordAt(toks, j))) { at = j; found = true }
        else j += 1
      }
      if (!found) at = toks.length
      inserts.getOrElseUpdate(at, mutable.ArrayBuffer.empty) += renderLateral(sp)
    }
    val removed = specs.map(sp => (sp.start, sp.end)).toVector
    def inRemoved(idx: Int) = removed.exists { case (s, e) => idx >= s && idx < e }
    val out = Vector.newBuilder[Tok]
    for (idx <- 0 to toks.length) {
      inserts.get(idx).foreach(_.foreach { lv =>
        out += Space(" "); out ++= tokenize(lv); out += Space(" ")
      })
      if (idx < toks.length && !inRemoved(idx)) out += toks(idx)
    }
    out.result()
  }

  private def renderLateral(sp: UnnestSpec): String = {
    val outer = if (sp.outer) "OUTER " else ""
    if (sp.exprs.length == 1 && !sp.ordinality) {
      // explode covers both arrays (1 col) and maps (2 cols: key, value)
      s"LATERAL VIEW ${outer}EXPLODE(${sp.exprs.head}) ${sp.alias} AS ${sp.cols.mkString(", ")}"
    } else if (sp.exprs.length == 1) {
      // single collection WITH ORDINALITY: posexplode covers both
      // arrays (pos, value) and maps (pos, key, value) — the positional
      // try_element_at form below is a KEY lookup on maps and was
      // silently wrong for them (round-17 review). Presto puts the
      // ordinality column LAST and 1-based while posexplode emits a
      // 0-based pos FIRST, so pos lands under an internal name and a
      // second single-row lateral view computes the +1 alias.
      val dataCols = sp.cols.dropRight(1)
      s"LATERAL VIEW ${outer}POSEXPLODE(${sp.exprs.head}) ${sp.alias} " +
        s"AS __graft_pos0, ${dataCols.mkString(", ")} " +
        s"LATERAL VIEW EXPLODE(array(CAST(__graft_pos0 + 1 AS BIGINT))) " +
        s"${sp.alias}_ord AS ${sp.cols.last}"
    } else {
      val dataCols = if (sp.ordinality) sp.cols.dropRight(1) else sp.cols
      require(dataCols.length == sp.exprs.length,
        s"UNNEST arity: ${sp.exprs.length} collections but ${dataCols.length} " +
          "column aliases (zipped multi-collection UNNEST lowers positionally " +
          "and supports ARRAY collections; UNNEST a MAP separately)")
      val sizes = sp.exprs.map(e => s"coalesce(size($e), 0)")
      val m = if (sizes.length == 1) sizes.head else s"greatest(${sizes.mkString(", ")})"
      val fields = dataCols.zip(sp.exprs).map { case (c, e) =>
        s"try_element_at($e, __gi + 1) AS $c"
      } ++ (if (sp.ordinality) Vector(s"CAST(__gi + 1 AS BIGINT) AS ${sp.cols.last}") else Vector.empty)
      // slice(.., 1, m) keeps the guard element count honest when every
      // collection is empty/null (sequence(0, -1) would count DOWN).
      val arr = s"slice(transform(sequence(0, greatest($m, 1) - 1), " +
        s"__gi -> struct(${fields.mkString(", ")})), 1, $m)"
      s"LATERAL VIEW ${outer}INLINE($arr) ${sp.alias}"
    }
  }

  // ---------------------------------------------- pass: CAST type syntax
  /** Presto type text → Spark type text: ROW(f T,..) → STRUCT<f: T,..>,
    * ARRAY(T) → ARRAY<T>, MAP(K,V) → MAP<K,V>, bare VARCHAR/JSON → STRING,
    * REAL → FLOAT. Applies inside CAST/TRY_CAST(.. AS <type>). */
  private[sql] def rewriteCastTypes(toks: Vector[Tok]): Vector[Tok] = {
    val edits = mutable.ArrayBuffer.empty[(Int, Int, String)] // [from, until) -> text
    var i = 0
    while (i < toks.length) {
      val w = wordAt(toks, i)
      if ((w == "cast" || w == "try_cast") && toks.lift(nextM(toks, i)).contains(Sym("("))) {
        val open = nextM(toks, i)
        val close = matchFwd(toks, open)
        if (close >= 0) {
          // the top-level AS inside these parens
          var depth = 0
          var asIdx = -1
          var j = open + 1
          while (j < close) {
            if (isOpen(toks(j))) depth += 1
            else if (isClose(toks(j))) depth -= 1
            else if (depth == 0 && wordAt(toks, j) == "as") asIdx = j
            j += 1
          }
          if (asIdx >= 0)
            typeToSpark(toks.slice(asIdx + 1, close)).foreach { t =>
              edits += ((asIdx + 1, close, " " + t))
            }
        }
      }
      i += 1
    }
    applyEdits(toks, edits.toVector)
  }

  /** Some((sparkTypeText)) when the slice parses as a Presto type; None
    * leaves the text untouched (already-Spark types pass through). */
  private[sql] def typeToSpark(ts: Vector[Tok]): Option[String] = {
    val ms = ts.filterNot(isSpace)
    var pos = 0
    def peek: Tok = if (pos < ms.length) ms(pos) else Sym("")
    def peekWord: String = peek match { case w: Word => w.lower; case _ => "" }
    def take(): Tok = { val t = peek; pos += 1; t }
    def expect(s: String): Boolean = if (peek == Sym(s)) { pos += 1; true } else false
    def parseType(): Option[String] = peekWord match {
      case "row" =>
        take()
        if (!expect("(")) return None
        val fields = mutable.ArrayBuffer.empty[String]
        var ok = true
        var done = false
        while (ok && !done) {
          val name = take() match {
            case w: Word => w.text
            case q: Quoted => "`" + q.text.substring(1, q.text.length - 1) + "`"
            case _ => ok = false; ""
          }
          if (ok) parseType() match {
            case Some(t) => fields += s"$name: $t"
            case None => ok = false
          }
          if (ok) {
            if (expect(",")) ()
            else if (expect(")")) done = true
            else ok = false
          }
        }
        if (ok) Some(s"STRUCT<${fields.mkString(", ")}>") else None
      case "array" =>
        take()
        if (!expect("(")) return None
        parseType().filter(_ => expect(")")).map(t => s"ARRAY<$t>")
      case "map" =>
        take()
        if (!expect("(")) return None
        for {
          k <- parseType()
          if expect(",")
          v <- parseType()
          if expect(")")
        } yield s"MAP<$k, $v>"
      case "varchar" | "char" =>
        val kw = take().text.toUpperCase
        if (peek == Sym("(")) { // length-parameterized: Spark accepts as-is
          pos += 1; val l = take().text; if (!expect(")")) return None
          Some(s"$kw($l)")
        } else Some("STRING")
      case "json" => take(); Some("STRING")
      case "real" => take(); Some("FLOAT")
      case "double" =>
        take()
        if (peekWord == "precision") take()
        Some("DOUBLE")
      case "" => None
      case _ =>
        // simple word type, possibly multi-word (e.g. TIMESTAMP WITH TIME
        // ZONE → TIMESTAMP; the session zone is the rendering zone).
        val first = take().text
        if (first.toLowerCase == "timestamp" && peekWord == "with") {
          take(); if (peekWord == "time") take(); if (peekWord == "zone") take()
          Some("TIMESTAMP")
        } else if (peek == Sym("(")) { // decimal(p, s) etc.
          val open = pos
          pos += 1
          val inner = mutable.ArrayBuffer.empty[String]
          while (pos < ms.length && peek != Sym(")")) inner += take().text
          if (expect(")")) Some(s"$first(${inner.mkString})") else { pos = open; Some(first) }
        } else Some(first)
    }
    val r = parseType()
    if (pos == ms.length) r else None
  }

  private def applyEdits(toks: Vector[Tok], edits: Vector[(Int, Int, String)]): Vector[Tok] = {
    if (edits.isEmpty) return toks
    val sorted = edits.sortBy(_._1)
    val out = Vector.newBuilder[Tok]
    var i = 0
    sorted.foreach { case (from, until, text) =>
      while (i < from) { out += toks(i); i += 1 }
      out ++= tokenize(text)
      i = until
    }
    while (i < toks.length) { out += toks(i); i += 1 }
    out.result()
  }

  // ------------------------------------- passes: ROW / ARRAY[..] / TRY
  /** `ROW(..)` value constructor → `struct(..)` (type positions were
    * already lowered by rewriteCastTypes, so any remaining ROW( is a
    * constructor). */
  private[sql] def rewriteRowCtor(toks: Vector[Tok]): Vector[Tok] =
    toks.zipWithIndex.map {
      case (w: Word, i) if w.lower == "row" && toks.lift(nextM(toks, i)).contains(Sym("(")) &&
          wordAt(toks, prevM(toks, i)) != "as" =>
        Word("struct")
      case (t, _) => t
    }

  /** `ARRAY[e1, e2]` → `array(e1, e2)` (bracket-matched, nests). */
  private[sql] def rewriteArrayBrackets(toks: Vector[Tok]): Vector[Tok] = {
    val swap = mutable.Set.empty[Int]
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case w: Word if w.lower == "array" =>
          val nx = nextM(toks, i)
          if (nx >= 0 && toks(nx) == Sym("[")) {
            val close = matchFwd(toks, nx)
            if (close >= 0) { swap += nx; swap += close }
          }
        case _ =>
      }
      i += 1
    }
    if (swap.isEmpty) toks
    else toks.zipWithIndex.map {
      case (Sym("["), i) if swap(i) => Sym("(")
      case (Sym("]"), i) if swap(i) => Sym(")")
      case (t, _) => t
    }
  }

  /** Presto subscript `base[idx]` → `element_at(base, idx)`. Presto
    * subscripts are 1-BASED on arrays and key lookups on maps; Spark's
    * bracket subscript is 0-based on arrays, so before this pass every
    * bracket subscript through the dialect door was silently off by one
    * (round-17 review). `element_at` carries Presto's semantics for
    * both families (1-based position / key lookup; under ANSI mode it
    * also errors on out-of-range and missing keys, like Presto's
    * subscript). Runs AFTER rewriteArrayBrackets, so every remaining
    * `[` opens a subscript. One subscript rewrites per scan, iterated
    * to a fixpoint — chains like a[1][2] re-capture the element_at call
    * through chainStart — and each rewrite removes one bracket pair, so
    * the loop terminates. */
  private[sql] def rewriteSubscripts(toks: Vector[Tok]): Vector[Tok] = {
    var cur = toks
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (!changed && i < cur.length) {
        if (cur(i) == Sym("[")) {
          val p = prevM(cur, i)
          val isSub = p >= 0 && (cur(p) match {
            case _: Word | _: Quoted | _: Str => true
            case Sym(")") | Sym("]") => true
            case _ => false
          })
          val close = matchFwd(cur, i)
          if (isSub && close > i) {
            val baseStart = chainStart(cur, p)
            val base = render(cur.slice(baseStart, p + 1)).trim
            val idx = render(cur.slice(i + 1, close)).trim
            cur = applyEdits(cur,
              Vector((baseStart, close + 1, s"element_at($base, $idx)")))
            changed = true
          }
        }
        i += 1
      }
    }
    cur
  }

  /** `TABLESAMPLE BERNOULLI(p)` / `TABLESAMPLE SYSTEM(p)`
    * (PrestoSql.g4:333 sampledRelation) → Spark `TABLESAMPLE (p PERCENT)`.
    * Spark's PERCENT sampling IS per-row Bernoulli, so BERNOULLI maps
    * exactly; SYSTEM is implementation-defined block sampling in Presto
    * ("any subset is a valid SYSTEM sample"), so row sampling is a
    * conforming implementation of it too. The percentage tokens are
    * copied verbatim inside the parens. */
  private[sql] def rewriteTablesample(toks: Vector[Tok]): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < toks.length) {
      var emitted = false
      if (wordAt(toks, i) == "tablesample") {
        val m = nextM(toks, i)
        val method = wordAt(toks, m)
        if (method == "bernoulli" || method == "system") {
          val open = nextM(toks, m)
          if (open >= 0 && toks(open) == Sym("(")) {
            val close = matchFwd(toks, open)
            if (close >= 0) {
              out += toks(i) += Space(" ")
              var j = open
              while (j < close) { out += toks(j); j += 1 }
              out += Space(" ") += Word("PERCENT") += Sym(")")
              i = close + 1
              emitted = true
            }
          }
        }
      }
      if (!emitted) { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** `TRY(expr)` → `graft_try(expr)` = TryEval (null on runtime error). */
  private[sql] def rewriteTry(toks: Vector[Tok]): Vector[Tok] =
    toks.zipWithIndex.map {
      case (w: Word, i) if w.lower == "try" && toks.lift(nextM(toks, i)).contains(Sym("(")) &&
          toks.lift(prevM(toks, i)).forall(p => p != Sym(".")) =>
        Word("graft_try")
      case (t, _) => t
    }

  // --------------------------- shared: backward postfix-primary capture
  /** Start index of the postfix-primary chain ending at j0 — a literal,
    * ident chain (a.b.c), function call, parenthesized expression or
    * subscript. Shared by the AT TIME ZONE and quantified-comparison
    * passes, both of which must capture their left operand. */
  private def chainStart(toks: Vector[Tok], j0: Int): Int = {
    var s = primaryOnly(toks, j0)
    var p = prevM(toks, s)
    while (p >= 0 && toks(p) == Sym(".")) {
      val q = prevM(toks, p)
      if (q >= 0 && (toks(q).isInstanceOf[Word] || toks(q).isInstanceOf[Quoted] || isClose(toks(q)))) {
        s = primaryOnly(toks, q); p = prevM(toks, s)
      } else return s
    }
    s
  }
  private def primaryOnly(toks: Vector[Tok], j: Int): Int = toks(j) match {
    case Sym(")") =>
      val open = matchBwd(toks, j)
      if (open < 0) j
      else {
        val p = prevM(toks, open)
        if (p >= 0 && (toks(p).isInstanceOf[Word] || toks(p).isInstanceOf[Quoted])) p else open
      }
    case Sym("]") =>
      val open = matchBwd(toks, j)
      if (open < 0) j
      else {
        val p = prevM(toks, open)
        if (p >= 0) chainStart(toks, p) else open
      }
    case _ => j
  }

  // ------------------------------------------------ pass: AT TIME ZONE
  /** `x AT TIME ZONE 'z'` → `convert_timezone('UTC', 'z',
    * cast(x as timestamp_ntz))`. Operand capture walks back over one
    * postfix-primary (literal, ident chain, function call, parens,
    * subscript); the zone is a string literal or an ident/call. */
  private[sql] def rewriteAtTimeZone(toks: Vector[Tok]): Vector[Tok] = {
    // ONE rewrite per scan, iterated to a fixpoint: chained
    // `x AT TIME ZONE 'a' AT TIME ZONE 'b'` produces OVERLAPPING edits
    // under a collect-then-apply scheme (the second operand capture
    // starts inside the first edit's span — round-17 review); after the
    // first rewrite the next scan captures the convert_timezone(...)
    // call as its postfix-primary operand, nesting correctly.
    var cur = toks
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (!changed && i < cur.length) {
        if (wordAt(cur, i) == "at" && wordAt(cur, nextM(cur, i)) == "time" &&
            wordAt(cur, nextM(cur, nextM(cur, i))) == "zone") {
          val zoneKw = nextM(cur, nextM(cur, i))
          val opEnd = prevM(cur, i)
          val tzStart = nextM(cur, zoneKw)
          if (opEnd >= 0 && tzStart >= 0 && wordAt(cur, tzStart) != "interval") {
            var tzEnd = tzStart
            cur(tzStart) match {
              case _: Word | _: Quoted =>
                val nx = nextM(cur, tzStart)
                if (nx >= 0 && cur(nx) == Sym("(")) {
                  val c = matchFwd(cur, nx); if (c >= 0) tzEnd = c
                }
              case _ =>
            }
            val opStart = chainStart(cur, opEnd)
            val operand = render(cur.slice(opStart, opEnd + 1)).trim
            val tz = render(cur.slice(tzStart, tzEnd + 1)).trim
            cur = applyEdits(cur, Vector((opStart, tzEnd + 1,
              s"convert_timezone('UTC', $tz, cast($operand as timestamp_ntz))")))
            changed = true
          }
        }
        i += 1
      }
    }
    cur
  }

  // --------------------------------- pass: quantified comparisons
  /** `x <op> ANY|SOME|ALL (subquery)` — the reference's grammar parses
    * these (AstExpressions.h:404 QuantifiedComparisonExpression) but its
    * optimizer lowering NYIs them (PrestoParser.cpp defaultVisit), and
    * Spark has no native quantified-comparison syntax at all; this
    * engine runs them. Lowering, with exact three-valued semantics:
    *  - `= ANY` → `IN`, `<> ALL` → `NOT IN` (the SQL-standard
    *    equivalences — Spark's native null handling is already right);
    *  - ordering ops and `= ALL` / `<> ANY` → a CASE over scalar
    *    aggregates of the subquery (count, non-null count, min/max):
    *    empty set hits the quantifier identity (ALL→TRUE, ANY→FALSE), a
    *    definite witness/counterexample decides via the extreme value,
    *    and remaining NULL elements or a NULL operand yield NULL.
    * The operand splices more than once — SQL expressions are pure, and
    * Spark's ReuseSubquery dedupes the repeated scalar subqueries.
    * CORRELATED subqueries work too (round 11): the correlation rides
    * inside the spliced scalar aggregates, which Spark decorrelates
    * into aggregated outer joins — count-bug-correct, so an outer row
    * with no matches hits the empty-set quantifier identity. */
  private[sql] def rewriteQuantifiedCmp(toks: Vector[Tok]): Vector[Tok] = {
    val cmpOps = Set("=", "<>", "!=", "<", "<=", ">", ">=")
    val edits = mutable.ArrayBuffer.empty[(Int, Int, String)]
    var i = 0
    while (i < toks.length) {
      val q = wordAt(toks, i)
      if (q == "any" || q == "some" || q == "all") {
        val opIdx = prevM(toks, i)
        val parIdx = nextM(toks, i)
        val isCmp = opIdx >= 0 && (toks(opIdx) match {
          case Sym(s) => cmpOps(s); case _ => false
        })
        if (isCmp && parIdx >= 0 && toks(parIdx) == Sym("(")) {
          val close = matchFwd(toks, parIdx)
          val innerKw = wordAt(toks, nextM(toks, parIdx))
          if (close > parIdx && (innerKw == "select" || innerKw == "with")) {
            val opEnd = prevM(toks, opIdx)
            val opStart = chainStart(toks, opEnd)
            // the capture is ONE postfix-primary; comparison binds
            // looser than arithmetic/concatenation, so a compound left
            // operand ('a' || x = ANY (...), x + 1 > ALL (...)) would
            // splice only its trailing primary — silently computing a
            // different expression. Fail by name instead (round-17
            // review); parenthesizing the operand is the workaround.
            val before = prevM(toks, opStart)
            if (before >= 0) toks(before) match {
              case Sym(s) if Set("+", "-", "*", "/", "%", "||")(s) =>
                throw new IllegalArgumentException(
                  "quantified comparison with a compound left operand is " +
                    s"not supported: parenthesize the operand before '$s … " +
                    s"${toks(opIdx).text} ${q.toUpperCase}(…)'")
              case _ =>
            }
            val x = render(toks.slice(opStart, opEnd + 1)).trim
            val sub = render(toks.slice(parIdx + 1, close)).trim
            val op = if (toks(opIdx).text == "!=") "<>" else toks(opIdx).text
            val all = q == "all"
            val cnt = s"(SELECT count(*) FROM ($sub) graft_qc(qc))"
            val nn = s"(SELECT count(qc) FROM ($sub) graft_qc(qc))"
            def ext(f: String) = s"(SELECT $f(qc) FROM ($sub) graft_qc(qc))"
            val nb = "CAST(NULL AS BOOLEAN)"
            val repl = (op, all) match {
              case ("=", false) => s"(($x) IN ($sub))"
              case ("<>", true) => s"(($x) NOT IN ($sub))"
              case ("=", true) =>
                val (mn, mx) = (ext("min"), ext("max"))
                s"(CASE WHEN $cnt = 0 THEN TRUE" +
                  s" WHEN ($x) <> $mn OR ($x) <> $mx THEN FALSE" +
                  s" WHEN $cnt > $nn THEN $nb" +
                  s" ELSE ($x) = $mn AND ($x) = $mx END)"
              case ("<>", false) =>
                val (mn, mx) = (ext("min"), ext("max"))
                s"(CASE WHEN $cnt = 0 THEN FALSE" +
                  s" WHEN ($x) <> $mn OR ($x) <> $mx THEN TRUE" +
                  s" WHEN $cnt > $nn THEN $nb" +
                  s" ELSE ($x) <> $mn END)"
              case (o, false) => // witness search: > / >= vs min, < / <= vs max
                val m = if (o == ">" || o == ">=") ext("min") else ext("max")
                s"(CASE WHEN $cnt = 0 THEN FALSE" +
                  s" WHEN ($x) $o $m THEN TRUE" +
                  s" WHEN $cnt > $nn THEN $nb" +
                  s" ELSE ($x) $o $m END)"
              case (o, true) => // counterexample search: > / >= vs max, < / <= vs min
                val m = if (o == ">" || o == ">=") ext("max") else ext("min")
                s"(CASE WHEN $cnt = 0 THEN TRUE" +
                  s" WHEN NOT(($x) $o $m) THEN FALSE" +
                  s" WHEN $cnt > $nn THEN $nb" +
                  s" ELSE ($x) $o $m END)"
            }
            edits += ((opStart, close + 1, repl))
            i = close
          }
        }
      }
      i += 1
    }
    applyEdits(toks, edits.toVector)
  }

  // ------------------------------------------------- pass: bare types
  /** Bare Presto type words outside CAST (DDL column lists): VARCHAR →
    * STRING (Spark's VARCHAR demands a length), JSON → STRING, REAL →
    * FLOAT. Length-parameterized VARCHAR(n) is valid Spark and kept.
    *
    * Scoped to CREATE/ALTER statements: varchar/json/real are
    * NON-RESERVED words in Presto, so in query statements they are more
    * likely identifiers — an unscoped rewrite silently renamed aliases
    * (`SELECT x AS json` became `AS STRING`; round-17 review). CAST
    * targets in queries are already lowered by rewriteCastTypes. Inside
    * DDL, an `AS <word>` is still an alias (CTAS select list), never a
    * type, so those are skipped too. */
  private[sql] def rewriteBareTypes(toks: Vector[Tok]): Vector[Tok] = {
    val head = wordAt(toks, nextM(toks, -1))
    if (head != "create" && head != "alter") return toks
    toks.zipWithIndex.map {
      case (w: Word, i) if (w.lower == "varchar" || w.lower == "json") &&
          !toks.lift(nextM(toks, i)).contains(Sym("(")) &&
          !toks.lift(prevM(toks, i)).contains(Sym(".")) &&
          wordAt(toks, prevM(toks, i)) != "as" =>
        Word("STRING")
      case (w: Word, i) if w.lower == "real" &&
          !toks.lift(prevM(toks, i)).contains(Sym(".")) &&
          wordAt(toks, prevM(toks, i)) != "as" =>
        Word("FLOAT")
      case (t, _) => t
    }
  }

  // ---------------------------------------------- pass: EXPLAIN options
  /** Presto `EXPLAIN (TYPE LOGICAL|DISTRIBUTED|IO|VALIDATE [, FORMAT …])`
    * (AstStatements.h:597 Explain + ExplainOption) → the closest Spark
    * explain mode: LOGICAL → EXTENDED (output includes the full logical
    * plan), DISTRIBUTED → FORMATTED (physical stages + exchanges — the
    * fragment view), IO → COST (stats-annotated plan), VALIDATE → plain
    * EXPLAIN (analysis runs; output ignored by callers that only check
    * validity). FORMAT options drop — Spark explain output is text.
    * `EXPLAIN ANALYZE` is deliberately left untouched: it EXECUTES the
    * query in Presto, so mapping it to a non-executing EXPLAIN would
    * silently change semantics — better a loud parse error. */
  private[sql] def rewriteExplainOptions(toks: Vector[Tok]): Vector[Tok] = {
    val i0 = nextM(toks, -1)
    if (!wordAt(toks, i0).equalsIgnoreCase("explain")) return toks
    val iP = nextM(toks, i0)
    if (!toks.lift(iP).contains(Sym("("))) return toks
    val close = matchFwd(toks, iP)
    if (close <= iP) return toks
    val opts = toks.slice(iP + 1, close).collect { case w: Word => w.lower }
    // Only an options list (led by TYPE/FORMAT) rewrites — `EXPLAIN
    // (SELECT …)` is a parenthesized query and must pass through.
    if (!opts.headOption.exists(h => h == "type" || h == "format")) return toks
    val mode: Vector[Tok] =
      if (opts.contains("distributed")) Vector(Space(" "), Word("FORMATTED"))
      else if (opts.contains("logical")) Vector(Space(" "), Word("EXTENDED"))
      else if (opts.contains("io")) Vector(Space(" "), Word("COST"))
      else Vector.empty // VALIDATE or bare FORMAT: plain EXPLAIN
    toks.take(i0 + 1) ++ mode ++ toks.drop(close + 1)
  }

  // ---------------------------------------------- pass: ANALYZE statement
  /** Presto `ANALYZE t [WITH (…)]` (AstStatements.h:636-659 Analyze) →
    * Spark `ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS` — the
    * stats-collection statement the reference pairs with its sampling /
    * history machinery; Spark's CBO then reads the gathered row count
    * and per-column min/max/ndv from the catalog at plan time. WITH
    * properties are connector-specific collection hints with no Spark
    * analogue and drop; any other trailing syntax passes through
    * unchanged so the real parser reports it. Spark's own
    * `ANALYZE TABLE[S] …` forms and `EXPLAIN ANALYZE` are untouched. */
  private[sql] def rewriteAnalyze(toks: Vector[Tok]): Vector[Tok] = {
    val i0 = nextM(toks, -1)
    if (!wordAt(toks, i0).equalsIgnoreCase("analyze")) return toks
    def isNamePart(i: Int): Boolean = toks.lift(i).exists {
      case _: Word | _: Quoted => true
      case _ => false
    }
    // Spark's own ANALYZE TABLE/TABLES statements must pass through
    // untouched — only Presto's bare `ANALYZE name` form rewrites.
    val h = wordAt(toks, nextM(toks, i0))
    if (h == "table" || h == "tables") return toks
    // consume STRICTLY a dotted identifier chain: part (. part)*; any
    // other trailing token means this is not Presto's Analyze shape and
    // the statement passes through for the real parser to report.
    var k = nextM(toks, i0) // nextM returns -1 past the last token
    if (!isNamePart(k)) return toks // no table name: let the parser complain
    var end = k
    k = nextM(toks, k)
    while (k >= 0 && toks.lift(k).contains(Sym("."))) {
      val p = nextM(toks, k)
      if (!isNamePart(p)) return toks
      end = p
      k = nextM(toks, p)
    }
    // after the name: end of statement or a WITH(...) property list
    if (k >= 0) {
      if (!wordAt(toks, k).equalsIgnoreCase("with")) return toks
      val iP = nextM(toks, k)
      if (iP < 0 || !toks.lift(iP).contains(Sym("("))) return toks
      if (nextM(toks, matchFwd(toks, iP)) >= 0) return toks
    }
    (Vector(Word("ANALYZE"), Space(" "), Word("TABLE")) :+ Space(" ")) ++
      toks.slice(nextM(toks, i0), end + 1) ++
      Vector(Space(" "), Word("COMPUTE"), Space(" "), Word("STATISTICS"),
        Space(" "), Word("FOR"), Space(" "), Word("ALL"), Space(" "), Word("COLUMNS"))
  }

  // ---------------------------------------------- pass: CREATE SCHEMA
  /** Presto `CREATE SCHEMA [IF NOT EXISTS] name [WITH (…)]`
    * (AstStatements.h:237-258 CreateSchema) → Spark's grammar-identical
    * CREATE SCHEMA with the WITH property list dropped: the properties
    * are connector placement hints (location, format defaults) with no
    * Spark-session analogue — the same trade as ANALYZE's WITH. The
    * bare form passes through byte-identical; a WITH that is not a
    * terminal property list passes through for the real parser to
    * report. */
  private[sql] def rewriteCreateSchema(toks: Vector[Tok]): Vector[Tok] = {
    val i0 = nextM(toks, -1)
    if (!wordAt(toks, i0).equalsIgnoreCase("create")) return toks
    if (!wordAt(toks, nextM(toks, i0)).equalsIgnoreCase("schema")) return toks
    var k = nextM(toks, nextM(toks, i0))
    while (k >= 0 && !wordAt(toks, k).equalsIgnoreCase("with")) k = nextM(toks, k)
    if (k < 0) return toks
    val iP = nextM(toks, k)
    if (iP < 0 || !toks.lift(iP).contains(Sym("("))) return toks
    val close = matchFwd(toks, iP)
    if (close <= iP || nextM(toks, close) >= 0) return toks
    toks.take(k) ++ toks.drop(close + 1)
  }

  // ------------------------------------- pass: date_add unit unquoting
  /** Presto `date_add('unit', n, ts)` → Spark `date_add(UNIT, n, ts)`:
    * Spark's parser intercepts date_add at GRAMMAR level and requires
    * the unit unquoted, so the injected-function route never sees it —
    * this is a text fix. Only the 3-argument form rewrites (the 2-arg
    * form is Spark's day-add and shares semantics); non-literal units
    * pass through for Spark's own error. */
  private[sql] def rewriteDateAddUnit(toks: Vector[Tok]): Vector[Tok] = {
    val edits = Vector.newBuilder[(Int, Int, String)]
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case w: Word if w.lower == "date_add" =>
          val iP = nextM(toks, i)
          if (toks.lift(iP).contains(Sym("("))) {
            val close = matchFwd(toks, iP)
            if (close > iP && splitTopLevel(toks.slice(iP + 1, close)).length == 3) {
              val iU = nextM(toks, iP)
              toks.lift(iU) match {
                case Some(Str(t)) =>
                  val unit = t.substring(1, t.length - 1)
                  if (unit.nonEmpty && unit.forall(c => c.isLetter))
                    edits += ((iU, iU + 1, unit.toUpperCase))
                case _ => ()
              }
            }
          }
        case _ => ()
      }
      i += 1
    }
    applyEdits(toks, edits.result())
  }

  // ------------------------------------- pass: SHOW CREATE VIEW
  /** Presto `SHOW CREATE VIEW v` (PrestoSql.g4:129) → Spark's
    * `SHOW CREATE TABLE v`: Spark serves view definitions through the
    * TABLE spelling only. */
  private[sql] def rewriteShowCreateView(toks: Vector[Tok]): Vector[Tok] = {
    val i0 = nextM(toks, -1)
    val i1 = nextM(toks, i0)
    val i2 = nextM(toks, i1)
    if (wordAt(toks, i0) == "show" && wordAt(toks, i1) == "create" &&
        wordAt(toks, i2) == "view") toks.updated(i2, Word("TABLE"))
    else toks
  }

  // ------------------------------------- pass: DROP FUNCTION signature
  /** Presto `DROP [TEMPORARY] FUNCTION [IF EXISTS] name [(types)]`
    * (PrestoSql.g4:100): the optional parameter-type signature
    * disambiguates overloads, which Spark does not have (functions are
    * name-keyed) — strip it so the statement parses. */
  private[sql] def rewriteDropFunction(toks: Vector[Tok]): Vector[Tok] = {
    var i = nextM(toks, -1)
    if (wordAt(toks, i) != "drop") return toks
    i = nextM(toks, i)
    if (wordAt(toks, i) == "temporary") i = nextM(toks, i)
    if (wordAt(toks, i) != "function") return toks
    i = nextM(toks, i)
    if (wordAt(toks, i) == "if") {
      val iE = nextM(toks, i)
      if (wordAt(toks, iE) != "exists") return toks
      i = nextM(toks, iE)
    }
    val (name, after) = qualifiedNameAt(toks, i)
    if (name.isEmpty || after < 0 || !toks.lift(after).contains(Sym("("))) return toks
    val close = matchFwd(toks, after)
    if (close < 0 || nextM(toks, close) >= 0) return toks
    toks.take(after) ++ toks.drop(close + 1)
  }

  // ------------------------------------- pass: unsupported statement guard
  /** Statement kinds whose semantics Spark cannot honestly provide fail
    * FAST with a clear, actionable error instead of a confusing
    * downstream parse error: role and privilege management (CREATE/DROP
    * ROLE, GRANT, REVOKE, SET ROLE, AstStatements.h:300-374) — ACLs
    * live in the external catalog layer, not the engine. Transactions
    * and CALL are likewise out of scope (README matrix); they already
    * fail in Spark's parser. Materialized views are IMPLEMENTED
    * (round 11, [[MatViews]]) and handled at the statement layer. */
  /** `U&'…'` unicode string literals with optional `UESCAPE 'x'`
    * (PrestoSql.g4:434,906-907 #unicodeStringLiteral): decode the
    * 4-digit `\XXXX` and 6-digit `\+XXXXXX` escape forms (a doubled
    * escape char denotes the char itself; `''` is still a quote) into a
    * plain Spark string literal. Runs first so every later pass sees an
    * ordinary [[Str]] token. Malformed escapes fail fast with the
    * offending literal named rather than leaking `U&` to Spark's parser. */
  private[sql] def rewriteUnicodeLiterals(toks: Vector[Tok]): Vector[Tok] = {
    def fail(lit: String, why: String): Nothing =
      throw new IllegalArgumentException(
        s"invalid U&'…' unicode string literal $lit: $why")
    def decode(raw: String, esc: Char): String = {
      // raw includes the surrounding quotes; an unterminated literal
      // reaches here WITHOUT its closing quote and the substring below
      // would silently truncate the last data character instead of
      // failing (round-17 review; rewriteQuotedIdents guards the same)
      if (raw.length < 2 || raw.charAt(raw.length - 1) != '\'')
        fail(raw, "unterminated literal")
      val body = raw.substring(1, raw.length - 1).replace("''", "'")
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        val c = body.charAt(i)
        if (c != esc) { sb.append(c); i += 1 }
        else if (i + 1 < body.length && body.charAt(i + 1) == esc) {
          sb.append(esc); i += 2
        } else {
          val (digits, skip) =
            if (i + 1 < body.length && body.charAt(i + 1) == '+') (6, 2) else (4, 1)
          val hex = body.substring(math.min(i + skip, body.length),
            math.min(i + skip + digits, body.length))
          if (hex.length < digits || !hex.forall(h => Character.digit(h, 16) >= 0))
            fail(raw, s"expected $digits hex digits after '$esc'" +
              (if (skip == 2) "+" else "") + s" at offset $i")
          val cp = Integer.parseInt(hex, 16)
          // Presto rejects lone surrogates (U+D800-DFFF) — they are UTF-16
          // artifacts, not code points a well-formed string may contain —
          // while Character.isValidCodePoint accepts them; check both.
          if (!Character.isValidCodePoint(cp) || (cp >= 0xD800 && cp <= 0xDFFF))
            fail(raw, s"\\+$hex is not a valid code point")
          sb.appendAll(Character.toChars(cp))
          i += skip + digits
        }
      }
      sb.toString
    }
    // Re-escape for Spark's parser (and this tokenizer): '' for quotes,
    // \\ for backslashes; everything else rides through as raw UTF-8.
    def sparkLit(s: String): String =
      "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < toks.length) {
      val isU = toks(i) match {
        case w: Word => w.lower == "u" && i + 2 < toks.length &&
          toks(i + 1) == Sym("&") && toks(i + 2).isInstanceOf[Str]
        case _ => false
      }
      if (!isU) { out += toks(i); i += 1 }
      else {
        val lit = toks(i + 2).text
        var next = i + 3
        var esc = '\\'
        val jU = nextM(toks, i + 2)
        if (jU >= 0 && wordAt(toks, jU) == "uescape") {
          val jS = nextM(toks, jU)
          toks.lift(jS) match {
            case Some(Str(et)) =>
              val e = et.substring(1, et.length - 1).replace("''", "'")
              if (e.length != 1) fail(lit, s"UESCAPE '$e' must be a single character")
              val ec = e.charAt(0)
              if (Character.digit(ec, 16) >= 0 || ec == '\'' || ec == '+' || ec == '"' ||
                  Character.isWhitespace(ec))
                fail(lit, s"UESCAPE '$e' may not be a hex digit, quote, '+', or whitespace")
              esc = ec
              next = jS + 1
            case _ => fail(lit, "UESCAPE must be followed by a quoted escape character")
          }
        }
        out += Str(sparkLit(decode(lit, esc)))
        i = next
      }
    }
    out.result()
  }

  private[sql] def rejectUnsupported(toks: Vector[Tok]): Vector[Tok] = {
    val i0 = nextM(toks, -1)
    val h = wordAt(toks, i0).toLowerCase
    val h2 = wordAt(toks, nextM(toks, i0)).toLowerCase
    def fail(what: String, hint: String): Nothing =
      throw new UnsupportedOperationException(
        s"Presto $what is not supported by the graft engine: $hint")
    if (((h == "create" || h == "drop") && h2 == "role") || (h == "set" && h2 == "role"))
      fail(s"${h.toUpperCase} ROLE", "role management belongs to the external catalog/ACL layer")
    if (h == "grant" || h == "revoke")
      fail(h.toUpperCase, "privilege management belongs to the external catalog/ACL layer")
    // SHOW GRANTS / SHOW [CURRENT] ROLES / SHOW ROLE GRANTS
    // (PrestoSql.g4:124-142) are the read side of the same ACL layer
    if (h == "show") {
      val h3 = wordAt(toks, nextM(toks, nextM(toks, i0))).toLowerCase
      if (h2 == "grants" || h2 == "roles" || (h2 == "role" && h3 == "grants") ||
          (h2 == "current" && h3 == "roles"))
        fail(s"SHOW ${h2.toUpperCase}" +
          (if (h2 == "role" || h2 == "current") s" ${h3.toUpperCase}" else ""),
          "role and privilege listings belong to the external catalog/ACL layer")
    }
    toks
  }

  // --------------------------------------------- pass: table versions
  /** Presto `FOR (SYSTEM_TIME|SYSTEM_VERSION|TIMESTAMP|VERSION)
    * (AS OF | BEFORE) expr` (PrestoSql.g4:561-568) → Spark's
    * `VERSION AS OF` / `TIMESTAMP AS OF` time travel (DSv2
    * loadTable(ident, version/timestamp) — graft_mem implements it).
    * `VERSION BEFORE n` with an integer literal lowers to
    * `VERSION AS OF n-1` (commit numbers are dense); `TIMESTAMP BEFORE`
    * has no exact Spark spelling and fails loudly. */
  private[sql] def rewriteTableVersion(toks: Vector[Tok]): Vector[Tok] = {
    val edits = mutable.ArrayBuffer.empty[(Int, Int, String)]
    var i = 0
    while (i < toks.length) {
      if (wordAt(toks, i).equalsIgnoreCase("for")) {
        val iK = nextM(toks, i)
        val kind = wordAt(toks, iK).toLowerCase
        val isVersion = kind == "version" || kind == "system_version"
        val isTime = kind == "timestamp" || kind == "system_time"
        if (isVersion || isTime) {
          val iS = nextM(toks, iK)
          val s1 = wordAt(toks, iS).toLowerCase
          if (s1 == "as" && wordAt(toks, nextM(toks, iS)).equalsIgnoreCase("of")) {
            val iOf = nextM(toks, iS)
            val repl = (if (isVersion) "VERSION" else "TIMESTAMP") + " AS OF"
            edits += ((i, iOf + 1, repl))
            i = iOf
          } else if (s1 == "before") {
            if (isTime) throw new UnsupportedOperationException(
              "Presto FOR TIMESTAMP BEFORE is not supported by the graft engine: " +
                "Spark time travel has no exclusive-bound form; use TIMESTAMP AS OF " +
                "with an earlier instant")
            val iV = nextM(toks, iS)
            toks.lift(iV) match {
              case Some(Num(n)) if n.forall(_.isDigit) =>
                edits += ((i, iV + 1, s"VERSION AS OF ${n.toLong - 1}"))
                i = iV
              case _ => throw new UnsupportedOperationException(
                "Presto FOR VERSION BEFORE is only supported with an integer literal " +
                  "(lowered to VERSION AS OF n-1)")
            }
          }
        }
      }
      i += 1
    }
    applyEdits(toks, edits.toVector)
  }

  // ------------------------------------------- pass: SQL routine DDL
  /** CREATE [OR REPLACE] [TEMPORARY] FUNCTION (PrestoSql.g4
    * #createFunction): Spark 4 runs SQL UDFs natively with
    * near-identical syntax (RETURNS type ... RETURN body, LANGUAGE SQL,
    * [NOT] DETERMINISTIC all shared) — only Presto's null-call
    * characteristic (`RETURNS NULL ON NULL INPUT` / `CALLED ON NULL
    * INPUT`) has no Spark spelling; it is dropped here. (Spark's
    * behavior matches CALLED ON NULL INPUT: the body sees NULLs.)
    * Matching stops at the body's standalone RETURN keyword, so the
    * clause words are never touched inside the expression. */
  private[sql] def rewriteRoutineNullCall(toks: Vector[Tok]): Vector[Tok] = {
    val i0 = nextM(toks, -1)
    if (!wordAt(toks, i0).equalsIgnoreCase("create")) return toks
    var probe = i0
    var isFn = false
    var hops = 0
    while (hops < 4 && probe >= 0 && !isFn) {
      probe = nextM(toks, probe)
      if (wordAt(toks, probe).equalsIgnoreCase("function")) isFn = true
      hops += 1
    }
    if (!isFn) return toks
    val mIdx = toks.indices.filter(k => !toks(k).isInstanceOf[Space]).toVector
    def w(j: Int): String =
      if (j < mIdx.length) toks(mIdx(j)) match {
        case word: Word => word.lower
        case t => t.text
      } else ""
    val drop = mutable.Set.empty[Int]
    var j = 0
    var stop = false
    while (j < mIdx.length && !stop) {
      if (w(j) == "return") stop = true
      else {
        def m(p: String*) = p.indices.forall(o => w(j + o) == p(o))
        if (m("returns", "null", "on", "null", "input")) {
          (0 until 5).foreach(o => drop += mIdx(j + o)); j += 5
        } else if (m("called", "on", "null", "input")) {
          (0 until 4).foreach(o => drop += mIdx(j + o)); j += 4
        } else j += 1
      }
    }
    if (drop.isEmpty) toks
    else toks.zipWithIndex.collect { case (t, k) if !drop(k) => t }
  }

  // ---------------------------------------- pass: GROUPS window frames
  /** Presto `OVER (… GROUPS BETWEEN …)` as SQL text (PrestoSql.g4:
    * 514-517). Neither Spark's nor DuckDB's grammar has GROUPS frames;
    * the engine's DataFrame lowering ([[graft.operators.WindowOps
    * .groupsFrame]]) rewrites GROUPS as a RANGE frame over the DENSE
    * RANK of the ordering — peer rows share a dense-rank value, so
    * "k groups back" is exactly "rank distance k". This pass performs
    * the identical rewrite on text:
    * {{{
    *   SELECT …, agg(x) OVER (PARTITION BY p ORDER BY o GROUPS f) …
    *   FROM rest [WHERE w] [tail]
    * }}}
    * becomes
    * {{{
    *   SELECT …, agg(x) OVER (PARTITION BY p ORDER BY __gdr RANGE f) …
    *   FROM (SELECT *, dense_rank() OVER (PARTITION BY p ORDER BY o)
    *         AS __gdr FROM rest [WHERE w]) __groups_frame [tail]
    * }}}
    * Two window passes over ONE shuffle (same partitioning) — still
    * fully distributed. Supported shape (fails FAST otherwise, naming
    * the DataFrame alternative): plain top-level SELECT, GROUPS
    * windows only in its select list, no GROUP BY/HAVING/DISTINCT/set
    * ops, and one shared (PARTITION BY, ORDER BY) across the GROUPS
    * windows of the statement. */
  private[sql] def rewriteGroupsFrame(toks: Vector[Tok]): Vector[Tok] = {
    final case class G(open: Int, close: Int, part: String, order: String,
        frame: String)
    val found = mutable.ArrayBuffer.empty[(Int, G)]
    var i = 0
    while (i < toks.length) {
      if (wordAt(toks, i).equalsIgnoreCase("over")) {
        val open = nextM(toks, i)
        if (open >= 0 && toks(open) == Sym("(")) {
          val close = matchFwd(toks, open)
          if (close > open) {
            var depth = 0
            var pPart = -1; var pOrder = -1; var pGroups = -1
            var j = open + 1
            while (j < close) {
              toks(j) match {
                case Sym("(") => depth += 1
                case Sym(")") => depth -= 1
                case w: Word if depth == 0 =>
                  if (w.lower == "partition" && pPart < 0) pPart = j
                  else if (w.lower == "order" && pOrder < 0) pOrder = j
                  else if (w.lower == "groups" && pGroups < 0) pGroups = j
                case _ => ()
              }
              j += 1
            }
            if (pGroups >= 0) {
              if (pOrder < 0 || pOrder > pGroups)
                throw new UnsupportedOperationException(
                  "GROUPS window frame requires ORDER BY in the window")
              val part =
                if (pPart < 0) "" else render(toks.slice(pPart, pOrder)).trim
              found += ((i, G(open, close, part,
                render(toks.slice(pOrder, pGroups)).trim,
                render(toks.slice(pGroups + 1, close)).trim)))
            }
          }
        }
      }
      i += 1
    }
    if (found.isEmpty) return toks
    def unsupported(why: String): Nothing =
      throw new UnsupportedOperationException(
        s"GROUPS window frame as SQL text: $why; the DataFrame lowering " +
          "(graft.operators.WindowOps.groupsFrame) has no such restriction")
    def norm(s: String) = s.toLowerCase.replaceAll("\\s+", " ").trim
    if (found.map { case (_, g) => (norm(g.part), norm(g.order)) }.distinct.length > 1)
      unsupported("all GROUPS windows in one statement must share " +
        "PARTITION BY and ORDER BY")
    val i0 = nextM(toks, -1)
    if (!wordAt(toks, i0).equalsIgnoreCase("select"))
      unsupported("only a plain top-level SELECT is supported")
    if (wordAt(toks, nextM(toks, i0)).equalsIgnoreCase("distinct"))
      unsupported("SELECT DISTINCT is not supported")
    var depth = 0
    var fromIdx = -1; var innerEnd = -1
    val stop = Set("order", "limit", "offset", "fetch")
    val banned = Set("group", "having", "qualify", "union", "intersect", "except")
    var j = i0 + 1
    while (j < toks.length) {
      toks(j) match {
        case Sym("(") => depth += 1
        case Sym(")") => depth -= 1
        case w: Word if depth == 0 =>
          if (w.lower == "from" && fromIdx < 0) fromIdx = j
          else if (fromIdx >= 0 && innerEnd < 0 && stop(w.lower)) innerEnd = j
          else if (innerEnd < 0 && banned(w.lower))
            unsupported(s"${w.text.toUpperCase} is not supported around a GROUPS window")
        case _ => ()
      }
      j += 1
    }
    if (fromIdx < 0) unsupported("a FROM clause is required")
    if (innerEnd < 0) innerEnd = toks.length
    if (found.exists(_._1 > fromIdx))
      unsupported("GROUPS windows are supported in the top-level select list only")
    val g0 = found.head._2
    def partPrefix(g: G) = if (g.part.isEmpty) "" else g.part + " "
    val sb = new StringBuilder
    var pos = i0 + 1
    for ((oi, g) <- found.sortBy(_._1)) {
      sb.append(render(toks.slice(pos, oi)))
      sb.append(s"OVER (${partPrefix(g)}ORDER BY __gdr RANGE ${g.frame})")
      pos = g.close + 1
    }
    sb.append(render(toks.slice(pos, fromIdx)))
    val inner = s"SELECT *, dense_rank() OVER (${partPrefix(g0)}${g0.order}) " +
      s"AS __gdr ${render(toks.slice(fromIdx, innerEnd))}"
    tokenize(s"SELECT ${sb.toString} FROM ($inner) __groups_frame " +
      render(toks.slice(innerEnd, toks.length)))
  }

  // --------------------------------- statement layer: PREPARE / EXECUTE
  /** Presto PREPARE / EXECUTE [USING …] / DEALLOCATE PREPARE
    * (AstStatements.h:340-374) parsed at the statement level — the
    * dialect door ([[PrestoParser]]) stores PREPARE bodies per session,
    * splices EXECUTE arguments into the `?` parameter slots token-wise
    * ([[spliceParams]]), and runs the spliced text through the normal
    * lowering. Spark's own `EXECUTE IMMEDIATE` is NOT intercepted. */
  sealed trait StatementAction
  final case class PrepareStmt(name: String, body: String) extends StatementAction
  final case class ExecuteStmt(name: String, args: Seq[String]) extends StatementAction
  final case class DeallocateStmt(name: String) extends StatementAction
  /** `SHOW STATS FOR t` / `SHOW STATS FOR (query)` (PrestoSql.g4:139-140);
    * `target` is the table name or the inner query text. */
  final case class ShowStatsStmt(target: String, isQuery: Boolean) extends StatementAction
  /** SHOW FUNCTIONS [LIKE pattern [ESCAPE esc]] (PrestoSql.g4:145-146):
    * lists the graft function REGISTRY (Presto name, Spark lowering,
    * scalar/aggregate kind, determinism, relative cost). */
  final case class ShowFunctionsStmt(like: Option[String], escape: Option[String])
    extends StatementAction
  /** SET SESSION k = v (PrestoSql.g4 #setSession) → Spark SET. */
  final case class SetSessionStmt(rest: String) extends StatementAction
  /** SHOW SESSION [LIKE pattern] (PrestoSql.g4 #showSession): the
    * session's configuration properties. */
  final case class ShowSessionStmt(like: Option[String],
      escape: Option[String] = None) extends StatementAction
  /** `EXPLAIN ANALYZE [VERBOSE] query` (PrestoSql.g4:126) — execute and
    * annotate the plan with measured per-operator metrics. */
  final case class ExplainAnalyzeStmt(body: String, verbose: Boolean) extends StatementAction
  /** `DESCRIBE INPUT|OUTPUT name` (PrestoSql.g4:157-158) over a prepared
    * statement. */
  final case class DescribeStmt(name: String, output: Boolean) extends StatementAction
  /** `CREATE MATERIALIZED VIEW (IF NOT EXISTS)? name (COMMENT s)?
    * (WITH props)? AS query` (PrestoSql.g4:88-90): the WITH property
    * list (connector placement hints) is dropped like CREATE SCHEMA's;
    * `body` keeps the dialect query text for storage + refresh. */
  final case class CreateMatViewStmt(name: String, ifNotExists: Boolean,
      comment: Option[String], body: String) extends StatementAction
  /** `REFRESH MATERIALIZED VIEW name WHERE pred` (PrestoSql.g4:92;
    * predicate-scoped like Presto's partition refresh). The WHERE-less
    * form is a graft extension meaning FULL rebuild. */
  final case class RefreshMatViewStmt(name: String, where: Option[String])
    extends StatementAction
  /** `DROP MATERIALIZED VIEW (IF EXISTS)? name` (PrestoSql.g4:91). */
  final case class DropMatViewStmt(name: String, ifExists: Boolean)
    extends StatementAction
  /** `SHOW CREATE MATERIALIZED VIEW name` (PrestoSql.g4:130). */
  final case class ShowCreateMatViewStmt(name: String) extends StatementAction
  /** `START TRANSACTION [modes]` / `COMMIT [WORK]` / `ROLLBACK [WORK]`
    * (PrestoSql.g4:151-153, AstStatements.h:687-719). Transactional
    * scope is the graft-mem connector (the reference likewise scopes
    * transactions to connector support); isolation-level / read-mode
    * qualifiers parse and drop — snapshot rollback is the semantics
    * provided. */
  final case class StartTransactionStmt(modes: String) extends StatementAction
  final case class CommitStmt() extends StatementAction
  final case class RollbackStmt() extends StatementAction
  /** `SHOW TABLES [(FROM|IN) ns] [LIKE 'p' [ESCAPE 'e']]`
    * (PrestoSql.g4:131-132). Presto's pattern is SQL LIKE — Spark's
    * SHOW TABLES matches by glob — so the listing is materialized and
    * the filter evaluated as a real LIKE. */
  final case class ShowTablesStmt(from: Option[String],
      like: Option[(String, Option[String])]) extends StatementAction
  /** `SHOW SCHEMAS [(FROM|IN) catalog] [LIKE …]` (PrestoSql.g4:133-134). */
  final case class ShowSchemasStmt(from: Option[String],
      like: Option[(String, Option[String])]) extends StatementAction
  /** `SHOW CATALOGS [LIKE …]` (PrestoSql.g4:135-136). */
  final case class ShowCatalogsStmt(like: Option[(String, Option[String])])
    extends StatementAction
  /** `SHOW COLUMNS (FROM|IN) t` (PrestoSql.g4:137) in Presto's output
    * shape (column_name, type, extra, comment). */
  final case class ShowColumnsStmt(name: String) extends StatementAction
  /** `RESET SESSION k` (PrestoSql.g4:150) → Spark `RESET k`. */
  final case class ResetSessionStmt(rest: String) extends StatementAction
  /** `ALTER SCHEMA from RENAME TO to` (PrestoSql.g4:48,
    * AstStatements.h RenameSchema). Spark has no database rename, so the
    * graft-mem catalog provides the semantics (namespace = key prefix). */
  final case class RenameSchemaStmt(from: String, to: String)
    extends StatementAction
  /** `ALTER VIEW [IF EXISTS] from RENAME TO to` (PrestoSql.g4:85-86) —
    * served by Spark's ALTER TABLE RENAME, which handles views. */
  final case class AlterViewRenameStmt(from: String, to: String,
      ifExists: Boolean) extends StatementAction
  /** `ALTER FUNCTION name [types] <null-call clause>` (PrestoSql.g4:
    * 98-99): Presto only allows altering the null-call characteristic.
    * Spark routines always evaluate CALLED ON NULL INPUT, so that form
    * acknowledges and RETURNS NULL ON NULL INPUT fails loudly. */
  final case class AlterFunctionStmt(name: String, returnsNullOnNull: Boolean)
    extends StatementAction
  /** `SHOW CREATE FUNCTION name [types]` (PrestoSql.g4:131) — serves the
    * recorded CREATE FUNCTION text from [[Routines]]. */
  final case class ShowCreateFunctionStmt(name: String) extends StatementAction
  /** `CREATE TYPE name AS ( fields ) | type` (PrestoSql.g4:80-82,
    * AstStatements.h:348 CreateType): a named row type or type alias,
    * registered in [[UserTypes]] and substituted structurally (Spark
    * types are structural, Presto's named types nominal — documented
    * divergence) wherever the name appears in a CAST target or a CREATE
    * TABLE column definition. */
  final case class CreateTypeStmt(name: String, typeText: String)
    extends StatementAction
  /** `CREATE TABLE t (…, LIKE s [INCLUDING|EXCLUDING PROPERTIES], …)`
    * (PrestoSql.g4:182-184 likeClause): the LIKE element expands to the
    * source table's column definitions. prefix = text through the table
    * name, elements = raw element texts, suffix = text after ')'. */
  final case class CreateTableLikeStmt(prefix: String, elements: Seq[String],
      suffix: String) extends StatementAction
  /** `ALTER TABLE t ADD [CONSTRAINT name] UNIQUE|PRIMARY KEY (cols)
    * [quals]` (PrestoSql.g4:69-70, 600-615): recorded table metadata —
    * Presto constraints are informational for the optimizer unless
    * ENFORCED, and Spark has no engine-checked uniqueness either —
    * surfaced through SHOW CREATE TABLE. `name` is None for the
    * unnamed form (a system name is assigned). */
  final case class AddConstraintStmt(table: String, name: Option[String],
      spec: String) extends StatementAction
  /** `ALTER TABLE t DROP CONSTRAINT [IF EXISTS] name`
    * (PrestoSql.g4:71-72). */
  final case class DropConstraintStmt(table: String, name: String,
      ifExists: Boolean) extends StatementAction
  /** `SHOW CREATE TABLE t` — Spark serves the DDL; recorded constraints
    * are appended as ALTER TABLE statements so the output is the full
    * recreate script. */
  final case class ShowCreateTableStmt(name: String) extends StatementAction
  /** `ALTER TABLE t ALTER [COLUMN] c SET NOT NULL` (PrestoSql.g4:73-74).
    * Spark's analyzer rejects every nullable→non-nullable ALTER COLUMN
    * (CheckAnalysis.checkAlterTableCommand) — Presto instead validates
    * the data; this routes the change directly to the DSv2 catalog,
    * whose alterTable checks existing rows. DROP NOT NULL needs no
    * statement: Spark allows that direction and shares the spelling. */
  final case class SetNotNullStmt(table: String, column: String)
    extends StatementAction

  /** Qualified name starting at meaningful index i: (rendered, index of
    * the next meaningful token after it), or ("", i) if none. Parts are
    * words or quoted identifiers joined by dots. */
  private def qualifiedNameAt(toks: Vector[Tok], i: Int): (String, Int) = {
    val sb = new StringBuilder
    var j = i
    var expectPart = true
    while (j >= 0 && (
        (expectPart && (toks(j).isInstanceOf[Word] || toks(j).isInstanceOf[Quoted])) ||
        (!expectPart && toks(j) == Sym(".")))) {
      sb.append(toks(j).text)
      expectPart = !expectPart
      j = nextM(toks, j)
    }
    if (expectPart) ("", i) else (sb.toString, j)
  }

  private def parseCreateMatView(toks: Vector[Tok], iView: Int): Option[StatementAction] = {
    var j = nextM(toks, iView)
    var ifNotExists = false
    if (wordAt(toks, j).equalsIgnoreCase("if")) {
      val iN = nextM(toks, j); val iE = nextM(toks, iN)
      if (!wordAt(toks, iN).equalsIgnoreCase("not") ||
          !wordAt(toks, iE).equalsIgnoreCase("exists")) return None
      ifNotExists = true; j = nextM(toks, iE)
    }
    val (name, after) = qualifiedNameAt(toks, j)
    if (name.isEmpty) return None
    var k = after
    var comment: Option[String] = None
    if (wordAt(toks, k).equalsIgnoreCase("comment")) {
      toks.lift(nextM(toks, k)) match {
        case Some(Str(t)) =>
          comment = Some(t.substring(1, t.length - 1).replace("''", "'"))
          k = nextM(toks, nextM(toks, k))
        case _ => return None
      }
    }
    if (wordAt(toks, k).equalsIgnoreCase("with")) {
      val iP = nextM(toks, k)
      if (!toks.lift(iP).contains(Sym("("))) return None
      val close = matchFwd(toks, iP)
      if (close <= iP) return None
      k = nextM(toks, close)
    }
    if (!wordAt(toks, k).equalsIgnoreCase("as")) return None
    // AS (query) | AS query — strip one outer paren pair when it wraps
    // the whole body (grammar line 90).
    var bodyToks = toks.drop(k + 1)
    val ib = nextM(bodyToks, -1)
    if (ib >= 0 && bodyToks(ib) == Sym("(")) {
      val close = matchFwd(bodyToks, ib)
      if (close > ib && nextM(bodyToks, close) < 0)
        bodyToks = bodyToks.slice(ib + 1, close)
    }
    val body = render(bodyToks).trim
    if (body.isEmpty) None
    else Some(CreateMatViewStmt(name, ifNotExists, comment, body))
  }

  def statementAction(sql: String): Option[StatementAction] = {
    val toks = tokenize(sql)
    val i0 = nextM(toks, -1)
    def nameAt(i: Int): Option[String] = toks.lift(i) match {
      case Some(w: Word) => Some(w.lower)
      case _ => None
    }
    wordAt(toks, i0).toLowerCase match {
      case "create" =>
        // CREATE MATERIALIZED VIEW, CREATE TYPE, and CREATE TABLE with a
        // LIKE element are statement-level; every other CREATE passes
        // through to Spark (CTAS, plain tables, views, schemas).
        val iM = nextM(toks, i0)
        val iV = nextM(toks, iM)
        if (wordAt(toks, iM) == "materialized" && wordAt(toks, iV) == "view")
          parseCreateMatView(toks, iV)
        else if (wordAt(toks, iM) == "type") {
          // CREATE TYPE qname AS ( field type, ... ) | type
          val (name, after) = qualifiedNameAt(toks, iV)
          if (name.isEmpty || wordAt(toks, after) != "as") None
          else {
            val iB = nextM(toks, after)
            if (toks.lift(iB).contains(Sym("("))) {
              val close = matchFwd(toks, iB)
              if (close < 0 || nextM(toks, close) >= 0) None
              else Some(CreateTypeStmt(name,
                "ROW" + render(toks.slice(iB, close + 1)).trim))
            } else {
              val text = render(toks.drop(iB)).trim
              if (text.isEmpty) None else Some(CreateTypeStmt(name, text))
            }
          }
        }
        else if (wordAt(toks, iM) == "table") {
          // only when an element list contains a top-level LIKE clause;
          // plain CREATE TABLE passes through
          var j = nextM(toks, iM)
          if (wordAt(toks, j) == "if") {
            val iN = nextM(toks, j); val iE = nextM(toks, iN)
            if (wordAt(toks, iN) != "not" || wordAt(toks, iE) != "exists") return None
            j = nextM(toks, iE)
          }
          val (name, after) = qualifiedNameAt(toks, j)
          if (name.isEmpty || after < 0 || !toks.lift(after).contains(Sym("(")))
            None
          else {
            val close = matchFwd(toks, after)
            if (close < 0) None
            else {
              val elements = splitTopLevel(toks.slice(after + 1, close))
              if (!elements.exists(el => likeElement(el).isDefined))
                None
              else Some(CreateTableLikeStmt(
                render(toks.take(after)).trim, elements.map(_.trim),
                render(toks.drop(close + 1)).trim))
            }
          }
        }
        else None
      case "alter" =>
        // ALTER SCHEMA ... RENAME TO (PrestoSql.g4:48), ALTER VIEW ...
        // RENAME TO (85-86), ALTER FUNCTION null-call (98-99); every
        // other ALTER (TABLE family) passes through to Spark/graft-mem.
        val iK = nextM(toks, i0)
        wordAt(toks, iK) match {
          case "schema" =>
            val (from, after) = qualifiedNameAt(toks, nextM(toks, iK))
            if (from.isEmpty || wordAt(toks, after) != "rename" ||
                wordAt(toks, nextM(toks, after)) != "to") None
            else {
              val (to, end) = qualifiedNameAt(toks, nextM(toks, nextM(toks, after)))
              if (to.isEmpty || to.contains(".") || end >= 0) None
              else Some(RenameSchemaStmt(from, to))
            }
          case "view" =>
            var j = nextM(toks, iK)
            var ifExists = false
            if (wordAt(toks, j) == "if") {
              val iE = nextM(toks, j)
              if (wordAt(toks, iE) != "exists") return None
              ifExists = true; j = nextM(toks, iE)
            }
            val (from, after) = qualifiedNameAt(toks, j)
            if (from.isEmpty || wordAt(toks, after) != "rename" ||
                wordAt(toks, nextM(toks, after)) != "to") None
            else {
              val (to, end) = qualifiedNameAt(toks, nextM(toks, nextM(toks, after)))
              if (to.isEmpty || end >= 0) None
              else Some(AlterViewRenameStmt(from, to, ifExists))
            }
          case "function" =>
            val (name, after) = qualifiedNameAt(toks, nextM(toks, iK))
            if (name.isEmpty) None
            else {
              var k = after
              if (k >= 0 && toks.lift(k).contains(Sym("("))) {
                val close = matchFwd(toks, k)
                if (close < 0) return None
                k = nextM(toks, close)
              }
              val tail = if (k < 0) ""
                else render(toks.drop(k)).trim.toLowerCase.replaceAll("\\s+", " ")
              tail match {
                case "returns null on null input" =>
                  Some(AlterFunctionStmt(name, returnsNullOnNull = true))
                case "called on null input" =>
                  Some(AlterFunctionStmt(name, returnsNullOnNull = false))
                case _ => None
              }
            }
          case "table" =>
            // ADD/DROP CONSTRAINT (PrestoSql.g4:69-72) and SET
            // PROPERTIES (:77-78) are handled here; every other ALTER
            // TABLE form (RENAME, ADD/DROP/RENAME COLUMN, ALTER COLUMN
            // SET/DROP NOT NULL) shares Spark's spelling and passes
            // through to the DSv2 catalog.
            var j = nextM(toks, iK)
            if (wordAt(toks, j) == "if") {
              val iE = nextM(toks, j)
              if (wordAt(toks, iE) != "exists") return None
              j = nextM(toks, iE)
            }
            val (tbl, after) = qualifiedNameAt(toks, j)
            if (tbl.isEmpty || after < 0) None
            else wordAt(toks, after) match {
              case "add" =>
                val iC = nextM(toks, after)
                wordAt(toks, iC) match {
                  case "constraint" =>
                    val (cname, rest) = qualifiedNameAt(toks, nextM(toks, iC))
                    val spec = if (rest < 0) "" else render(toks.drop(rest)).trim
                    if (cname.isEmpty || cname.contains(".") || spec.isEmpty) None
                    else Some(AddConstraintStmt(tbl, Some(cname), spec))
                  case "unique" | "primary" =>
                    Some(AddConstraintStmt(tbl, None, render(toks.drop(iC)).trim))
                  case _ => None // ADD COLUMN → Spark
                }
              case "drop" =>
                val iC = nextM(toks, after)
                if (wordAt(toks, iC) != "constraint") None // DROP COLUMN → Spark
                else {
                  var k = nextM(toks, iC)
                  var ifExists = false
                  if (wordAt(toks, k) == "if") {
                    val iE = nextM(toks, k)
                    if (wordAt(toks, iE) != "exists") return None
                    ifExists = true; k = nextM(toks, iE)
                  }
                  val (cname, end) = qualifiedNameAt(toks, k)
                  if (cname.isEmpty || cname.contains(".") || end >= 0) None
                  else Some(DropConstraintStmt(tbl, cname, ifExists))
                }
              case "alter" =>
                // ALTER [COLUMN] c SET NOT NULL → dialect statement;
                // DROP NOT NULL and type/comment changes → Spark
                var k = nextM(toks, after)
                if (wordAt(toks, k) == "column") k = nextM(toks, k)
                val (colName, rest) = qualifiedNameAt(toks, k)
                if (colName.isEmpty || colName.contains(".") || rest < 0) None
                else {
                  val tail = render(toks.drop(rest)).trim
                    .toLowerCase.replaceAll("\\s+", " ")
                  if (tail == "set not null") Some(SetNotNullStmt(tbl, colName))
                  else None
                }
              case "set" if wordAt(toks, nextM(toks, after)) == "properties" =>
                // fail FAST with the actionable alternative, like the
                // ACL family — Presto SET PROPERTIES mutates storage
                // properties graft-mem tables don't carry
                throw new UnsupportedOperationException(
                  "ALTER TABLE ... SET PROPERTIES is not supported by the " +
                    "graft engine: graft-mem tables carry no storage " +
                    "properties; use ALTER TABLE ... SET TBLPROPERTIES on a " +
                    "catalog that persists table properties")
              case _ => None
            }
          case _ => None
        }
      case "refresh" =>
        val iM = nextM(toks, i0)
        val iV = nextM(toks, iM)
        if (!wordAt(toks, iM).equalsIgnoreCase("materialized") ||
            !wordAt(toks, iV).equalsIgnoreCase("view")) None
        else {
          val (name, after) = qualifiedNameAt(toks, nextM(toks, iV))
          if (name.isEmpty) None
          else if (after < 0) Some(RefreshMatViewStmt(name, None))
          else if (wordAt(toks, after).equalsIgnoreCase("where")) {
            val pred = render(toks.drop(after + 1)).trim
            if (pred.isEmpty) None else Some(RefreshMatViewStmt(name, Some(pred)))
          } else None
        }
      case "drop" =>
        // only DROP MATERIALIZED VIEW; other DROPs pass through
        val iM = nextM(toks, i0)
        val iV = nextM(toks, iM)
        if (!wordAt(toks, iM).equalsIgnoreCase("materialized") ||
            !wordAt(toks, iV).equalsIgnoreCase("view")) None
        else {
          var j = nextM(toks, iV)
          var ifExists = false
          if (wordAt(toks, j).equalsIgnoreCase("if")) {
            val iE = nextM(toks, j)
            if (!wordAt(toks, iE).equalsIgnoreCase("exists")) return None
            ifExists = true; j = nextM(toks, iE)
          }
          val (name, after) = qualifiedNameAt(toks, j)
          if (name.isEmpty || after >= 0) None
          else Some(DropMatViewStmt(name, ifExists))
        }
      case "start" =>
        val iT = nextM(toks, i0)
        if (!wordAt(toks, iT).equalsIgnoreCase("transaction")) None
        else Some(StartTransactionStmt(render(toks.drop(iT + 1)).trim))
      case "commit" =>
        val iW = nextM(toks, i0)
        if (iW < 0 || (wordAt(toks, iW).equalsIgnoreCase("work") && nextM(toks, iW) < 0))
          Some(CommitStmt())
        else None
      case "rollback" =>
        val iW = nextM(toks, i0)
        if (iW < 0 || (wordAt(toks, iW).equalsIgnoreCase("work") && nextM(toks, iW) < 0))
          Some(RollbackStmt())
        else None
      case "prepare" =>
        val iN = nextM(toks, i0)
        val iF = nextM(toks, iN)
        for {
          name <- nameAt(iN)
          if wordAt(toks, iF).equalsIgnoreCase("from")
          body = render(toks.drop(iF + 1)).trim
          if body.nonEmpty
        } yield PrepareStmt(name, body)
      case "set" =>
        // SET SESSION k = v (PrestoSql.g4 #setSession) → Spark SET;
        // plain SET (Spark's own) passes through untouched.
        val iS = nextM(toks, i0)
        if (!wordAt(toks, iS).equalsIgnoreCase("session")) None
        else {
          val rest = render(toks.drop(iS + 1)).trim
          if (rest.nonEmpty) Some(SetSessionStmt(rest)) else None
        }
      case "execute" =>
        val iN = nextM(toks, i0)
        nameAt(iN) match {
          case Some(name) if name != "immediate" => // EXECUTE IMMEDIATE is Spark's
            val iU = nextM(toks, iN)
            if (iU < 0) Some(ExecuteStmt(name, Nil))
            else if (wordAt(toks, iU).equalsIgnoreCase("using"))
              Some(ExecuteStmt(name, splitTopLevel(toks.drop(iU + 1))))
            else None
          case _ => None
        }
      case "deallocate" =>
        val iP = nextM(toks, i0)
        if (!wordAt(toks, iP).equalsIgnoreCase("prepare")) None
        else {
          val iN = nextM(toks, iP)
          nameAt(iN).filter(_ => nextM(toks, iN) < 0).map(DeallocateStmt)
        }
      case "describe" =>
        // only DESCRIBE INPUT|OUTPUT name; DESCRIBE table passes through
        val iK = nextM(toks, i0)
        val kind = wordAt(toks, iK).toLowerCase
        if (kind != "input" && kind != "output") None
        else {
          val iN = nextM(toks, iK)
          nameAt(iN).filter(_ => nextM(toks, iN) < 0)
            .map(DescribeStmt(_, kind == "output"))
        }
      case "explain" =>
        // only EXPLAIN ANALYZE …; every other EXPLAIN form is handled by
        // rewriteExplainOptions or passes through to Spark
        val iA = nextM(toks, i0)
        if (!wordAt(toks, iA).equalsIgnoreCase("analyze")) None
        else {
          val iV = nextM(toks, iA)
          val verbose = wordAt(toks, iV).equalsIgnoreCase("verbose")
          val body = render(toks.drop(if (verbose) iV + 1 else iA + 1)).trim
          if (body.nonEmpty) Some(ExplainAnalyzeStmt(body, verbose)) else None
        }
      case "reset" =>
        // RESET SESSION k (PrestoSql.g4:150) → Spark RESET k; plain
        // RESET (Spark's own) passes through untouched.
        val iS = nextM(toks, i0)
        if (!wordAt(toks, iS).equalsIgnoreCase("session")) None
        else {
          val rest = render(toks.drop(iS + 1)).trim
          if (rest.nonEmpty) Some(ResetSessionStmt(rest)) else None
        }
      case "show" =>
        // SHOW STATS FOR …, SHOW FUNCTIONS/TABLES/SCHEMAS/CATALOGS
        // [LIKE 'p' [ESCAPE 'e']], SHOW COLUMNS, SHOW CREATE
        // MATERIALIZED VIEW (PrestoSql.g4:126-148); every other SHOW
        // passes through to Spark.
        val iS = nextM(toks, i0)
        val iF = nextM(toks, iS)
        /** [LIKE 'p' [ESCAPE 'e']] ending the statement at meaningful
          * index i: Some(filter) when well-formed, None → passthrough. */
        def likeEscape(i: Int): Option[Option[(String, Option[String])]] = {
          def unq(t: String) = t.substring(1, t.length - 1).replace("''", "'")
          if (i < 0) Some(None)
          else if (!wordAt(toks, i).equalsIgnoreCase("like")) None
          else toks.lift(nextM(toks, i)) match {
            case Some(Str(t)) =>
              val iE = nextM(toks, nextM(toks, i))
              if (iE < 0) Some(Some((unq(t), None)))
              else if (wordAt(toks, iE).equalsIgnoreCase("escape"))
                toks.lift(nextM(toks, iE)) match {
                  case Some(Str(e)) if nextM(toks, nextM(toks, iE)) < 0 =>
                    Some(Some((unq(t), Some(unq(e)))))
                  case _ => None
                }
              else None
            case _ => None
          }
        }
        /** [(FROM|IN) qname] at i → (fromOpt, indexAfter). */
        def fromClause(i: Int): Option[(Option[String], Int)] =
          if (i >= 0 && (wordAt(toks, i).equalsIgnoreCase("from") ||
              wordAt(toks, i).equalsIgnoreCase("in"))) {
            val (name, after) = qualifiedNameAt(toks, nextM(toks, i))
            if (name.isEmpty) None else Some((Some(name), after))
          } else Some((None, i))
        if (wordAt(toks, iS).equalsIgnoreCase("create") &&
            wordAt(toks, iF).equalsIgnoreCase("materialized") &&
            wordAt(toks, nextM(toks, iF)).equalsIgnoreCase("view")) {
          val (name, after) = qualifiedNameAt(toks, nextM(toks, nextM(toks, iF)))
          if (name.isEmpty || after >= 0) None else Some(ShowCreateMatViewStmt(name))
        }
        else if (wordAt(toks, iS).equalsIgnoreCase("create") &&
            wordAt(toks, iF).equalsIgnoreCase("function")) {
          // SHOW CREATE FUNCTION name [(types)] (PrestoSql.g4:131) —
          // the signature disambiguator is accepted and ignored.
          val (name, after) = qualifiedNameAt(toks, nextM(toks, iF))
          if (name.isEmpty) None
          else if (after < 0) Some(ShowCreateFunctionStmt(name))
          else if (toks.lift(after).contains(Sym("(")) && {
            val close = matchFwd(toks, after)
            close > after && nextM(toks, close) < 0
          }) Some(ShowCreateFunctionStmt(name))
          else None
        }
        else if (wordAt(toks, iS).equalsIgnoreCase("create") &&
            wordAt(toks, iF).equalsIgnoreCase("table")) {
          val (name, after) = qualifiedNameAt(toks, nextM(toks, iF))
          if (name.isEmpty || after >= 0) None else Some(ShowCreateTableStmt(name))
        }
        else if (wordAt(toks, iS).equalsIgnoreCase("tables"))
          fromClause(iF).flatMap { case (from, after) =>
            likeEscape(after).map(ShowTablesStmt(from, _)) }
        else if (wordAt(toks, iS).equalsIgnoreCase("schemas"))
          fromClause(iF).flatMap { case (from, after) =>
            likeEscape(after).map(ShowSchemasStmt(from, _)) }
        else if (wordAt(toks, iS).equalsIgnoreCase("catalogs"))
          likeEscape(iF).map(ShowCatalogsStmt)
        else if (wordAt(toks, iS).equalsIgnoreCase("columns")) {
          if (!wordAt(toks, iF).equalsIgnoreCase("from") &&
              !wordAt(toks, iF).equalsIgnoreCase("in")) None
          else {
            val (name, after) = qualifiedNameAt(toks, nextM(toks, iF))
            if (name.isEmpty || after >= 0) None else Some(ShowColumnsStmt(name))
          }
        }
        else if (wordAt(toks, iS).equalsIgnoreCase("session")) {
          // same LIKE [ESCAPE] machinery as TABLES/SCHEMAS/CATALOGS:
          // undoubled '' quotes, ESCAPE honored, trailing tokens →
          // passthrough (loud Spark parse error) instead of silently
          // ignored (round-17 review)
          likeEscape(iF).map(le =>
            ShowSessionStmt(le.map(_._1), le.flatMap(_._2)))
        }
        else if (wordAt(toks, iS).equalsIgnoreCase("functions")) {
          if (iF < 0) Some(ShowFunctionsStmt(None, None))
          else if (wordAt(toks, iF).equalsIgnoreCase("like")) {
            likeEscape(iF) match {
              case Some(Some((pat, esc))) => Some(ShowFunctionsStmt(Some(pat), esc))
              case _ => None
            }
          } else None
        }
        else if (!wordAt(toks, iS).equalsIgnoreCase("stats") ||
          !wordAt(toks, iF).equalsIgnoreCase("for")) None
        else {
          val iT = nextM(toks, iF)
          toks.lift(iT) match {
            case Some(Sym("(")) =>
              val close = matchFwd(toks, iT)
              if (close < 0) None
              else Some(ShowStatsStmt(render(toks.slice(iT + 1, close)).trim, isQuery = true))
            case Some(_) =>
              val t = render(toks.drop(iT)).trim
              if (t.nonEmpty) Some(ShowStatsStmt(t, isQuery = false)) else None
            case None => None
          }
        }
      case _ => None
    }
  }

  /** Split a token run on top-level commas, rendering each piece. */
  private def splitTopLevel(toks: Vector[Tok]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var cur = Vector.newBuilder[Tok]
    toks.foreach {
      case s @ Sym("(") => depth += 1; cur += s
      case s @ Sym(")") => depth -= 1; cur += s
      case s @ Sym("[") => depth += 1; cur += s
      case s @ Sym("]") => depth -= 1; cur += s
      case Sym(",") if depth == 0 => out += render(cur.result()).trim; cur = Vector.newBuilder[Tok]
      case t => cur += t
    }
    val last = render(cur.result()).trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Number of `?` parameter slots in a statement body. */
  def paramCount(body: String): Int = tokenize(body).count(_ == Sym("?"))

  /** Replace each `?` parameter slot (outside strings — the tokenizer
    * guarantees that) with the next USING argument, parenthesized so an
    * expression argument keeps its own precedence. Count mismatches fail
    * loudly, like Presto's "Incorrect number of parameters". */
  def spliceParams(body: String, args: Seq[String]): String = {
    var i = 0
    val out = tokenize(body).map {
      case Sym("?") =>
        if (i >= args.length)
          throw new IllegalArgumentException(
            s"prepared statement has more than ${args.length} parameter(s): USING supplied too few")
        val a = args(i); i += 1
        Sym("(" + a + ")")
      case t => t
    }
    if (i < args.length)
      throw new IllegalArgumentException(
        s"prepared statement has $i parameter(s) but USING supplied ${args.length}")
    render(out)
  }

  // ------------------------------------------ pass: CREATE VIEW security
  /** Presto `CREATE [OR REPLACE] VIEW v [SECURITY DEFINER|INVOKER] AS q`
    * (AstStatements.h:143-189 CreateView, `Security` enum): Spark views
    * have no security mode (they always run with the querying session's
    * permissions — INVOKER semantics), so the clause drops and the rest
    * of the statement — including Presto constructs inside the view
    * body — lowers through the remaining passes. Anything else between
    * the view name and AS passes through for the real parser to report. */
  private[sql] def rewriteViewSecurity(toks: Vector[Tok]): Vector[Tok] = {
    val i0 = nextM(toks, -1)
    if (!wordAt(toks, i0).equalsIgnoreCase("create")) return toks
    var i = nextM(toks, i0)
    if (wordAt(toks, i).equalsIgnoreCase("or")) i = nextM(toks, nextM(toks, i))
    if (!wordAt(toks, i).equalsIgnoreCase("view")) return toks
    var k = nextM(toks, i)
    while (k >= 0 && !wordAt(toks, k).equalsIgnoreCase("as")) {
      if (wordAt(toks, k).equalsIgnoreCase("security")) {
        val m = nextM(toks, k)
        val mode = wordAt(toks, m).toLowerCase
        return if (mode == "definer" || mode == "invoker")
          toks.take(k) ++ toks.drop(m + 1)
        else toks
      }
      k = nextM(toks, k)
    }
    toks
  }

  // ------------------------------------------- pass: quoted identifiers
  /** Presto double-quoted identifiers → Spark backticks (handles names
    * the rename-pass regex cannot: spaces, punctuation). */
  private[sql] def rewriteQuotedIdents(toks: Vector[Tok]): Vector[Tok] =
    toks.map {
      // require a TERMINATED quote: an unterminated `"` (length-1 token
      // at end of input) passes through so the real parser reports it,
      // instead of this pass crashing on substring bounds
      case q: Quoted if q.text.length >= 2 && q.text.startsWith("\"") && q.text.endsWith("\"") =>
        Quoted("`" + q.text.substring(1, q.text.length - 1).replace("`", "``") + "`")
      case t => t
    }

  /** A CREATE TABLE element that is a likeClause (PrestoSql.g4:182-184):
    * `LIKE qname [INCLUDING|EXCLUDING PROPERTIES]` → Some(qname), any
    * other element (column definition, constraint) → None. The
    * INCLUDING/EXCLUDING qualifier is accepted and dropped — graft
    * tables carry no copyable connector properties. */
  private[sql] def likeElement(element: String): Option[String] = {
    val toks = tokenize(element)
    val i0 = nextM(toks, -1)
    if (wordAt(toks, i0) != "like") return None
    val (name, after) = qualifiedNameAt(toks, nextM(toks, i0))
    if (name.isEmpty) None
    else if (after < 0) Some(name)
    else {
      val q = wordAt(toks, after)
      if ((q == "including" || q == "excluding") &&
          wordAt(toks, nextM(toks, after)) == "properties" &&
          nextM(toks, nextM(toks, after)) < 0) Some(name)
      else None
    }
  }

  // ------------------------------------------- pass: named user types
  /** Substitute [[UserTypes]] registrations (CREATE TYPE,
    * PrestoSql.g4:80-82) where the name appears in a type position:
    * the CAST/TRY_CAST target (`CAST(x AS name)`) or a CREATE TABLE
    * column definition (`col name …`). Registry values are
    * fully-expanded at record time, so one pass suffices; nested
    * occurrences inside explicit ROW(...) type text are out of scope
    * (use the named type itself). Spark types are structural, so the
    * substitution is structural — Presto's nominal identity is not
    * preserved (documented divergence). */
  private[sql] def rewriteUserTypes(toks: Vector[Tok]): Vector[Tok] = {
    if (UserTypes.isEmpty) return toks
    val isCreateTable = wordAt(toks, nextM(toks, -1)) == "create"
    /** Is the token at i directly inside a CAST/TRY_CAST call — the
      * nearest unmatched '(' scanning backward belongs to one? */
    def insideCast(i: Int): Boolean = {
      var depth = 0
      var j = i - 1
      while (j >= 0) {
        if (isClose(toks(j))) depth += 1
        else if (isOpen(toks(j))) {
          if (depth == 0) {
            val w = wordAt(toks, prevM(toks, j))
            return w == "cast" || w == "try_cast"
          }
          depth -= 1
        }
        j -= 1
      }
      false
    }
    val edits = Vector.newBuilder[(Int, Int, String)]
    toks.indices.foreach { i =>
      toks(i) match {
        case w: Word =>
          UserTypes.get(w.lower).foreach { expansion =>
            val p = prevM(toks, i)
            val castTarget = wordAt(toks, p) == "as" && insideCast(i)
            val columnDef = isCreateTable &&
              toks.lift(p).exists(t => t.isInstanceOf[Word] || t.isInstanceOf[Quoted]) && {
                val pp = prevM(toks, p)
                toks.lift(pp).exists(t => t == Sym("(") || t == Sym(","))
              }
            if (castTarget || columnDef) {
              // emit SPARK type text (STRUCT<…>) so the substitution is
              // valid in column definitions too, where the CAST-target
              // type pass does not reach
              val spark = typeToSpark(tokenize(expansion)).getOrElse(expansion)
              edits += ((i, i + 1, spark))
            }
          }
        case _ => ()
      }
    }
    applyEdits(toks, edits.result())
  }

  /** Expand references to already-registered named types inside a new
    * CREATE TYPE definition (record-time, so registry values are always
    * fully expanded): a registered name as the whole text (alias form)
    * or in field-type position (after the field identifier). */
  private[sql] def expandUserTypes(typeText: String): String = {
    val toks = tokenize(typeText)
    val meaningful = toks.count(!_.isInstanceOf[Space])
    val edits = Vector.newBuilder[(Int, Int, String)]
    toks.indices.foreach { i =>
      toks(i) match {
        case w: Word =>
          UserTypes.get(w.lower).foreach { expansion =>
            val p = prevM(toks, i)
            val fieldType =
              toks.lift(p).exists(t => t.isInstanceOf[Word] || t.isInstanceOf[Quoted])
            if (meaningful == 1 || fieldType) edits += ((i, i + 1, expansion))
          }
        case _ => ()
      }
    }
    render(applyEdits(toks, edits.result()))
  }

  /** `CREATE [OR REPLACE] [TEMPORARY] FUNCTION name …` — the created
    * routine's name, so [[PrestoParser]] can record the definition text
    * for SHOW CREATE FUNCTION / ALTER FUNCTION. None for any other
    * statement. */
  private[sql] def createFunctionName(sql: String): Option[String] = {
    val toks = tokenize(sql)
    var i = nextM(toks, -1)
    if (wordAt(toks, i) != "create") return None
    i = nextM(toks, i)
    if (wordAt(toks, i) == "or") {
      i = nextM(toks, i)
      if (wordAt(toks, i) != "replace") return None
      i = nextM(toks, i)
    }
    if (wordAt(toks, i) == "temporary") i = nextM(toks, i)
    if (wordAt(toks, i) != "function") return None
    val (name, _) = qualifiedNameAt(toks, nextM(toks, i))
    if (name.isEmpty) None else Some(name)
  }

  /** `DROP [TEMPORARY] FUNCTION [IF EXISTS] name …` — the dropped
    * routine's name (for the [[Routines]] registry). */
  private[sql] def dropFunctionName(sql: String): Option[String] = {
    val toks = tokenize(sql)
    var i = nextM(toks, -1)
    if (wordAt(toks, i) != "drop") return None
    i = nextM(toks, i)
    if (wordAt(toks, i) == "temporary") i = nextM(toks, i)
    if (wordAt(toks, i) != "function") return None
    i = nextM(toks, i)
    if (wordAt(toks, i) == "if") {
      val iE = nextM(toks, i)
      if (wordAt(toks, iE) != "exists") return None
      i = nextM(toks, iE)
    }
    val (name, _) = qualifiedNameAt(toks, i)
    if (name.isEmpty) None else Some(name)
  }

  // -------------------------------------------------------------- entry
  private val passes: Seq[Vector[Tok] => Vector[Tok]] = Seq(
    rewriteUnicodeLiterals, rejectUnsupported, rewriteRoutineNullCall, rewriteTableVersion, rewriteCreateSchema,
    rewriteShowCreateView, rewriteDropFunction, rewriteDateAddUnit,
    rewriteExplainOptions, rewriteAnalyze, rewriteViewSecurity, rewriteGroupsFrame,
    rewriteUnnestJoins,
    rewriteUserTypes, rewriteCastTypes,
    rewriteRowCtor, rewriteArrayBrackets, rewriteSubscripts,
    rewriteTry, rewriteTablesample, rewriteAtTimeZone,
    rewriteQuantifiedCmp, rewriteBareTypes, rewriteQuotedIdents)

  /** Full Presto-dialect lowering: structural passes, then the
    * function-name/identifier pass ([[PrestoRewriter.rewrite]]). */
  def transform(sql: String): String =
    PrestoRewriter.rewrite(render(passes.foldLeft(tokenize(sql))((t, f) => f(t))))
}
