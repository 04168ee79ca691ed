package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Honest implementations of Presto functions that have NO
  * semantically-equivalent Spark built-in — the cases where a bare name
  * rename would silently change results. Each is a native Catalyst
  * expression (or a lowering onto one), injected session-wide through
  * GraftExtensions so both `Registry.call` and Presto-dialect SQL text
  * resolve them by their Presto names.
  *
  * Mirrors the reference's stance that function semantics come from the
  * Presto library itself (axiom/optimizer/tests/AxiomSql.cpp:58-59
  * registers Velox's Presto functions verbatim) — nothing is aliased to a
  * lookalike.
  */
object PrestoCompat {

  /** Presto hamming_distance(a, b): number of code-point positions that
    * differ; errors when lengths differ (Presto
    * INVALID_FUNCTION_ARGUMENT), unlike Levenshtein which is a different
    * metric entirely. */
  case class HammingDistance(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "hamming_distance"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[UTF8String].toString
      val y = b.asInstanceOf[UTF8String].toString
      val xi = x.codePoints().toArray
      val yi = y.codePoints().toArray
      if (xi.length != yi.length)
        throw new IllegalArgumentException(
          s"hamming_distance: strings must have the same length (${xi.length} vs ${yi.length})")
      var d = 0L
      var i = 0
      while (i < xi.length) { if (xi(i) != yi(i)) d += 1; i += 1 }
      d
    }
  }

  /** Presto truncate(x[, n]): decimal truncation toward zero to n digits
    * (default 0) — NOT Spark's date `trunc`. BigDecimal RoundingMode.DOWN
    * gives exact decimal semantics; NaN/Inf pass through like Presto. */
  case class TruncateNumber(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "truncate"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[Double]
      val n = b.asInstanceOf[Int]
      if (x.isNaN || x.isInfinite) x
      else java.math.BigDecimal.valueOf(x)
        .setScale(n, java.math.RoundingMode.DOWN).doubleValue()
    }
  }

  /** MySQL → java.time format-pattern conversion for date_parse.
    * Unknown directives error loudly rather than parse wrongly. */
  private[functions] def mysqlToJavaFormat(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        i += 1
        sb.append(fmt.charAt(i) match {
          case 'Y' => "yyyy"; case 'y' => "yy"
          case 'm' => "MM";   case 'c' => "M"
          case 'd' => "dd";   case 'e' => "d"
          case 'H' => "HH";   case 'k' => "H"
          case 'h' => "hh";   case 'I' => "hh"; case 'l' => "h"
          case 'i' => "mm"
          case 's' => "ss";   case 'S' => "ss"
          case 'f' => "SSSSSS"
          case 'p' => "a"
          case 'M' => "MMMM"; case 'b' => "MMM"
          case 'a' => "EEE";  case 'W' => "EEEE"
          case 'j' => "DDD"
          case 'T' => "HH:mm:ss"
          case 'r' => "hh:mm:ss a"
          case '%' => "%"
          case other =>
            throw new IllegalArgumentException(
              s"date_parse: unsupported MySQL format directive %$other in '$fmt'")
        })
      } else if (c.isLetter) { sb.append('\''); sb.append(c); sb.append('\'') }
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def literalString(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: the format/unit argument must be a string literal, got $e")
  }

  /** Builders keyed by Presto name, suitable for
    * SparkSessionExtensions.injectFunction / createOrReplaceTempFunction. */
  // Explicit casts stand in for ImplicitCastInputTypes (whose
  // AbstractDataType is not public API in Spark 4); no-op casts are
  // folded away by SimplifyCasts. Unconditional so we never touch
  // .dataType on a possibly-unresolved child.
  private def asString(e: Expression) = Cast(e, StringType)
  private def asDouble(e: Expression) = Cast(e, DoubleType)
  private def asInt(e: Expression) = Cast(e, IntegerType)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "hamming_distance" -> { es: Seq[Expression] =>
      HammingDistance(asString(es(0)), asString(es(1))) },
    "truncate" -> { es: Seq[Expression] =>
      if (es.length == 1) TruncateNumber(asDouble(es.head), Literal(0))
      else TruncateNumber(asDouble(es(0)), asInt(es(1)))
    },
    // Presto date_parse(string, mysql_fmt) → timestamp. Lowered onto
    // Spark's codegen'd ParseToTimestamp with the pattern converted at
    // plan time (it is constant per query, as in Presto).
    "date_parse" -> { es: Seq[Expression] =>
      val javaFmt = mysqlToJavaFormat(literalString(es(1), "date_parse"))
      new ParseToTimestamp(es(0), Literal(UTF8String.fromString(javaFmt), StringType))
    },
    // Presto date_diff('unit', t1, t2) = t2 - t1 in units → TimestampDiff.
    // The 2-arg form keeps Spark's own date_diff(end, start) day-count
    // semantics so injecting under this name shadows nothing.
    "date_diff" -> { es: Seq[Expression] =>
      if (es.length == 3)
        new TimestampDiff(literalString(es(0), "date_diff").toUpperCase, es(1), es(2))
      else DateDiff(es(0), es(1))
    },
    // (Presto date_add('unit', value, ts) is handled as TEXT — Spark's
    // parser intercepts date_add at grammar level with UNQUOTED units,
    // so the dialect pass rewriteDateAddUnit unquotes the literal;
    // the 2-arg form is likewise parser-level and keeps Spark
    // semantics.)
    // Presto date_format ALSO takes MySQL %-patterns (format_datetime is
    // the Joda/Java-pattern one) — same conversion as date_parse, in the
    // formatting direction. Registered under a graft-prefixed name because
    // Spark's own date_format (Java patterns) must keep its meaning on the
    // Spark-dialect surface; Registry/PrestoRewriter map the Presto name
    // here.
    "presto_date_format" -> { es: Seq[Expression] =>
      val javaFmt = mysqlToJavaFormat(literalString(es(1), "presto_date_format"))
      new DateFormatClass(es(0), Literal(UTF8String.fromString(javaFmt), StringType))
    },
    // Presto's named bitwise scalars have no named Spark twins — only the
    // & | ^ ~ operators, which these lower onto directly.
    "bitwise_and" -> { es: Seq[Expression] => BitwiseAnd(es(0), es(1)) },
    "bitwise_or" -> { es: Seq[Expression] => BitwiseOr(es(0), es(1)) },
    "bitwise_xor" -> { es: Seq[Expression] => BitwiseXor(es(0), es(1)) },
    "bitwise_not" -> { es: Seq[Expression] => BitwiseNot(es(0)) },
    // Presto TRY(expr) special form (reference axiom/sql/presto/ast/
    // AstFunctions.h:190; Expr.h:292-299 — null on runtime failure of the
    // child). Lowered by the dialect parser onto Catalyst's codegen'd
    // GraftTry: the TryEval kernel (null on runtime error), but as a
    // graft-owned expression class. Spark's optimizer pushes ITS TryEval
    // into CaseWhen branch VALUES, leaving branch CONDITIONS unguarded —
    // under ANSI a throwing condition (e.g. the quantified-comparison
    // lowering's `operand <op> extreme` test) then escapes the TRY. A
    // class no rule recognizes keeps the whole child inside the guard.
    "graft_try" -> { es: Seq[Expression] => GraftTry(es.head) },
    // Presto none_match(arr, λ) — no Spark name; forall with the negated
    // lambda body (the analyzer requires the lambda's direct parent to be
    // a higher-order function, so NOT(exists(...)) can't be the shape).
    // any_match/all_match rename to exists/forall in the Registry.
    "none_match" -> { es: Seq[Expression] =>
      es(1) match {
        case LambdaFunction(body, args, hidden) =>
          ArrayForAll(es(0), LambdaFunction(Not(body), args, hidden))
        case other => throw new IllegalArgumentException(
          s"none_match: second argument must be a lambda, got $other")
      } },
    // Presto geometric_mean(x) = exp(avg(ln(x))) — composed from Spark's
    // codegen'd kernels under the Presto name.
    "geometric_mean" -> { es: Seq[Expression] =>
      Exp(new aggregate.Average(Log(asDouble(es.head))).toAggregateExpression()) },
    // Presto map_agg(k, v): map from the group's key/value pairs.
    // Duplicate keys error under Spark's default mapKeyDedupPolicy —
    // Presto's behavior exactly.
    "map_agg" -> { es: Seq[Expression] =>
      MapFromEntries(new aggregate.CollectList(
        CreateStruct(Seq(es(0), es(1)))).toAggregateExpression()) },
    // Presto checksum(x): order-insensitive aggregate digest. Rendered as
    // XOR of per-row xxhash64 — same contract (order-insensitive,
    // collision-resistant), BIGINT instead of Presto's varbinary.
    "checksum" -> { es: Seq[Expression] =>
      new aggregate.BitXorAgg(new XxHash64(Seq(es.head))).toAggregateExpression() },
    // Presto url_extract_* family → parse_url parts (url_extract_port
    // casts: parse_url returns the string form).
    "url_extract_host" -> { es: Seq[Expression] => urlPart(es.head, "HOST") },
    "url_extract_path" -> { es: Seq[Expression] => urlPart(es.head, "PATH") },
    "url_extract_protocol" -> { es: Seq[Expression] => urlPart(es.head, "PROTOCOL") },
    "url_extract_fragment" -> { es: Seq[Expression] => urlPart(es.head, "REF") },
    "url_extract_query" -> { es: Seq[Expression] => urlPart(es.head, "QUERY") },
    // parse_url has no PORT part — the port is the trailing ':digits' of
    // AUTHORITY. Anchored regexp (not split_part: 'user:pass@host:8080'
    // has three ':'-segments) + nullif('') + TRY cast so an absent port
    // returns NULL under ANSI mode instead of CAST_INVALID_INPUT, as in
    // Presto.
    "url_extract_port" -> { es: Seq[Expression] =>
      Cast(
        new NullIf(
          RegExpExtract(urlPart(es.head, "AUTHORITY"),
            Literal(UTF8String.fromString(":([0-9]+)$"), StringType), Literal(1)),
          Literal(UTF8String.fromString(""), StringType)),
        LongType, None, EvalMode.TRY) },
    "url_extract_parameter" -> { es: Seq[Expression] =>
      new ParseUrl(Seq(asString(es(0)),
        Literal(UTF8String.fromString("QUERY"), StringType), asString(es(1)))) },
    // Presto multimap_agg(k, v): map from key to ALL its values in
    // encounter order. Composed over one collect_list of (k, v) structs
    // (the three references are semantically equal, so physical
    // aggregation computes the list once): distinct keys → (key, values
    // filtered from the list). Per-group cost O(distinct·n) — the
    // group-local price of expressing a grouping inside an aggregate.
    "multimap_agg" -> { es: Seq[Expression] =>
      def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
      val pairs = new aggregate.CollectList(
        CreateNamedStruct(Seq(
          Literal(UTF8String.fromString("k"), StringType), es(0),
          Literal(UTF8String.fromString("v"), StringType), es(1)))).toAggregateExpression()
      val (x1, x2, x3, kk) = (lv("__mm_x1"), lv("__mm_x2"), lv("__mm_x3"), lv("__mm_k"))
      MapFromEntries(ArrayTransform(
        ArrayDistinct(ArrayTransform(pairs,
          LambdaFunction(GetStructField(x1, 0, Some("k")), Seq(x1)))),
        LambdaFunction(
          CreateStruct(Seq(kk,
            ArrayTransform(
              ArrayFilter(pairs, LambdaFunction(
                EqualTo(GetStructField(x2, 0, Some("k")), kk), Seq(x2))),
              LambdaFunction(GetStructField(x3, 1, Some("v")), Seq(x3))))),
          Seq(kk))))
    },
    // Presto histogram(x): map from value to occurrence count (bigint).
    // Same composition shape as multimap_agg over one collected list.
    "histogram" -> { es: Seq[Expression] =>
      def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
      val vals = new aggregate.CollectList(es.head).toAggregateExpression()
      val (v, e) = (lv("__h_v"), lv("__h_e"))
      MapFromEntries(ArrayTransform(ArrayDistinct(vals),
        LambdaFunction(
          CreateStruct(Seq(v,
            Cast(Size(ArrayFilter(vals,
              LambdaFunction(EqualTo(e, v), Seq(e)))), LongType))),
          Seq(v))))
    },
    // Presto map_union(m): union of the group's maps. On duplicate keys
    // Presto chooses an arbitrary value — first-encountered conforms.
    // Same one-collected-list composition, over flattened map entries.
    "map_union" -> { es: Seq[Expression] =>
      def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
      val entries = Flatten(new aggregate.CollectList(
        MapEntries(es.head)).toAggregateExpression())
      val (e1, e2, e3, kk) = (lv("__mu_e1"), lv("__mu_e2"), lv("__mu_e3"), lv("__mu_k"))
      MapFromEntries(ArrayTransform(
        ArrayDistinct(ArrayTransform(entries,
          LambdaFunction(GetStructField(e1, 0, Some("key")), Seq(e1)))),
        LambdaFunction(
          CreateStruct(Seq(kk,
            ElementAt(ArrayTransform(
              ArrayFilter(entries, LambdaFunction(
                EqualTo(GetStructField(e2, 0, Some("key")), kk), Seq(e2))),
              LambdaFunction(GetStructField(e3, 1, Some("value")), Seq(e3))),
              Literal(1)))),
          Seq(kk))))
    },
    // Presto ngrams(arr, n): array of all n-element windows, in order.
    // Composed from codegen'd HOFs: slice at each valid start index; the
    // guard-then-filter shape sidesteps Sequence's descending behavior
    // when the array is shorter than n (sequence(1, 0) counts DOWN).
    "ngrams" -> { es: Seq[Expression] =>
      def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
      val (arr, n) = (es(0), es(1))
      val i = lv("__ngram_i")
      val g = lv("__ngram_g")
      val body = ArrayFilter(
        ArrayTransform(
          new Sequence(Literal(1), Greatest(Seq(Size(arr), Literal(1)))),
          LambdaFunction(
            If(LessThanOrEqual(Add(i, Subtract(n, Literal(1))), Size(arr)),
              Slice(arr, i, n),
              Literal.create(null, NullType)),
            Seq(i))),
        LambdaFunction(IsNotNull(g), Seq(g)))
      // Presto: ngrams(NULL, n) is NULL (not []); n < 1 is
      // INVALID_FUNCTION_ARGUMENT.
      If(IsNull(arr), Literal.create(null, NullType),
        If(LessThan(n, Literal(1)),
          new RaiseError(Literal(UTF8String.fromString(
            "ngrams: n must be at least 1"), StringType)),
          body))
    },
    "cosine_similarity" -> { es: Seq[Expression] =>
      CosineSimilarity(es(0), es(1)) },
    // Presto word_stem(word[, lang]) — only English (the Porter stemmer)
    // is implemented; other languages refuse loudly rather than stem with
    // the wrong rules.
    "word_stem" -> { es: Seq[Expression] =>
      if (es.length >= 2) {
        // Fold any constant expression (not just a bare literal) before
        // matching; a non-foldable language defers the check to eval
        // time so expression-valued 'en' works (round-10 ADVICE).
        if (es(1).foldable) es(1).eval(null) match {
          case s: UTF8String if s.toString == "en" => WordStem(es(0))
          case other => throw new IllegalArgumentException(
            s"word_stem: only language 'en' is supported, got $other")
        } else WordStemLang(es(0), es(1))
      } else WordStem(es.head) },
    "cardinality" -> { es: Seq[Expression] => PrestoCardinality(es.head) },
    // Presto set_agg(x): the group's distinct values as an array. Presto
    // leaves the order unspecified; this implementation returns them
    // sorted ascending — a deterministic (and so oracle-checkable)
    // refinement. NULL elements are dropped (collect_list semantics) —
    // documented divergence, same stance as AND/OR error-tolerance.
    "set_agg" -> { es: Seq[Expression] =>
      new SortArray(ArrayDistinct(
        new aggregate.CollectList(es.head).toAggregateExpression()),
        Literal(true)) },
    // Presto set_union(arr): distinct union of the group's arrays — same
    // deterministic sorted refinement.
    "set_union" -> { es: Seq[Expression] =>
      new SortArray(ArrayDistinct(Flatten(
        new aggregate.CollectList(es.head).toAggregateExpression())),
        Literal(true)) },
    // Presto approx_set(x[, e]) → HyperLogLog sketch. Backed by Spark's
    // datasketches HllSketchAgg; the max-standard-error overload maps
    // e → lgConfigK via HLL's error law e ≈ 1.04/sqrt(2^lgK)
    // (Presto's default e=0.01625 lands on the default lgK=12, the
    // consistency check for the formula). Presto's accepted range
    // [0.0040625, 0.26] is enforced; lgK clamps to datasketches'
    // [4, 21].
    "approx_set" -> { es: Seq[Expression] =>
      if (es.length == 1) new aggregate.HllSketchAgg(es.head).toAggregateExpression()
      else {
        val e = es(1) match {
          case err if err.foldable => err.eval(null) match {
            case d: Double => d
            case d: java.math.BigDecimal => d.doubleValue()
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case other => throw new IllegalArgumentException(
              s"approx_set: max standard error must be a numeric constant, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"approx_set: max standard error must be a numeric constant, got $other")
        }
        if (e < 0.0040625 || e > 0.26) throw new IllegalArgumentException(
          s"approx_set: max standard error must be in [0.0040625, 0.26], got $e")
        val lgK = math.ceil(math.log((1.04 / e) * (1.04 / e)) / math.log(2.0)).toInt
          .max(4).min(21)
        new aggregate.HllSketchAgg(es.head, Literal(lgK)).toAggregateExpression()
      } },
    // Presto merge(sketch) — genuinely overloaded (round 11): runtime
    // family dispatch over HLL (approx_set) and KLL quantile
    // (qdigest_agg) sketch binaries; anything else fails with an error
    // naming the supported families (round-10 ADVICE closed properly).
    "merge" -> { es: Seq[Expression] =>
      QuantileSketch.SketchMerge(es.head).toAggregateExpression() },
    // Presto qdigest_agg(x): streaming quantile sketch (KLL-backed —
    // same contract, graft-specific binary format). The weighted and
    // accuracy overloads refuse loudly.
    "qdigest_agg" -> { es: Seq[Expression] =>
      if (es.length > 1) throw new IllegalArgumentException(
        "qdigest_agg: the weight/accuracy overloads are not supported")
      QuantileSketch.KllAgg(asDouble(es.head)).toAggregateExpression() },
    // Presto tdigest_agg (round 12 — REAL t-digest, Dunning & Ertl via
    // datasketches TDigestDouble, no longer a KLL alias): accuracy
    // concentrates at the tails; value_at_quantile / quantile_at_value
    // / merge dispatch on the serialized family id and read either.
    "tdigest_agg" -> { es: Seq[Expression] =>
      if (es.length > 1) throw new IllegalArgumentException(
        "tdigest_agg: the weight overload is not supported")
      QuantileSketch.TDigestAgg(asDouble(es.head)).toAggregateExpression() },
    "value_at_quantile" -> { es: Seq[Expression] =>
      QuantileSketch.ValueAtQuantile(es(0), asDouble(es(1))) },
    // Presto JSON family (round 11): JSON is VARCHAR-backed here, so
    // json_extract is Spark's GetJsonObject (object/array subtrees come
    // back as JSON text, Presto's json->varchar rendering), json_format
    // is the identity and json_parse validates + canonicalizes.
    "json_extract" -> { es: Seq[Expression] =>
      new GetJsonObject(asString(es(0)), asString(es(1))) },
    "json_parse" -> { es: Seq[Expression] => JsonFns.JsonParse(asString(es.head)) },
    "json_format" -> { es: Seq[Expression] => asString(es.head) },
    "json_size" -> { es: Seq[Expression] =>
      JsonFns.JsonCountable(new GetJsonObject(asString(es(0)), asString(es(1)))) },
    "json_array_contains" -> { es: Seq[Expression] =>
      JsonFns.JsonArrayContains(asString(es(0)), es(1)) },
    "is_json_scalar" -> { es: Seq[Expression] =>
      JsonFns.IsJsonScalar(asString(es.head)) },
    "json_array_get" -> { es: Seq[Expression] =>
      JsonFns.JsonArrayGet(asString(es(0)), Cast(es(1), LongType)) },
    // Presto approx_most_frequent(buckets, value, capacity) — the
    // Misra–Gries aggregator (operators/ApproxMostFrequent), SQL-callable
    // (round 11). buckets/capacity are plan-time constants in Presto
    // too; values aggregate as their string form (map<varchar,bigint>).
    "approx_most_frequent" -> { es: Seq[Expression] =>
      if (es.length != 3) throw new IllegalArgumentException(
        "approx_most_frequent(buckets, value, capacity) takes 3 arguments")
      def constInt(e: Expression, what: String): Int =
        if (e.foldable) e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"approx_most_frequent: $what must be an integer constant, got $other")
        } else throw new IllegalArgumentException(
          s"approx_most_frequent: $what must be an integer constant, got $e")
      val agg = graft.operators.ApproxMostFrequent(
        constInt(es(0), "buckets"),
        org.apache.spark.sql.graft.Shim.column(es(1)).cast("string"),
        constInt(es(2), "capacity"))
      org.apache.spark.sql.graft.Shim.expression(agg)
    },
    // Presto numeric_histogram(buckets, value[, weight]) — the Ben-Haim
    // & Tom-Tov streaming histogram (operators/NumericHistogram); exact
    // (and oracle-checkable) when NDV <= buckets.
    "numeric_histogram" -> { es: Seq[Expression] =>
      if (es.length < 2 || es.length > 3) throw new IllegalArgumentException(
        "numeric_histogram(buckets, value[, weight]) takes 2 or 3 arguments")
      val buckets =
        if (es.head.foldable) es.head.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"numeric_histogram: buckets must be an integer constant, got $other")
        } else throw new IllegalArgumentException(
          s"numeric_histogram: buckets must be an integer constant, got ${es.head}")
      val value = org.apache.spark.sql.graft.Shim.column(es(1))
      val weight =
        if (es.length == 3) org.apache.spark.sql.graft.Shim.column(es(2))
        else org.apache.spark.sql.functions.lit(1.0)
      org.apache.spark.sql.graft.Shim.expression(
        graft.operators.NumericHistogram(buckets, value, weight))
    },
    "quantile_at_value" -> { es: Seq[Expression] =>
      QuantileSketch.QuantileAtValue(es(0), asDouble(es(1))) },
    // Presto reduce_agg(x, s0, merge_in, merge_states): a TRUE partial
    // aggregate — per-group state is ONE value of the initial-state
    // type, updated by the input lambda and merged across partials by
    // the state-combiner lambda (see [[ReduceAgg]]). Replaces the
    // round-9 collect_list fold, whose O(group) per-group memory was
    // the last OOM-shaped operator at 100 TB (round-10 ADVICE).
    // NOTE: returns the HOF PLACEHOLDER — the analyzer only admits
    // lambda children when the built expression is itself a
    // HigherOrderFunction; ReduceAggResolution lowers the bound
    // placeholder to the aggregate (see ReduceAgg.scala).
    "reduce_agg" -> { es: Seq[Expression] =>
      if (es.length != 4) throw new IllegalArgumentException(
        s"reduce_agg(input, initialState, inputFn, combineFn) takes 4 arguments, got ${es.length}")
      ReduceAggCall(es(0), es(1), es(2), es(3))
    })

  private def urlPart(url: Expression, part: String): Expression =
    new ParseUrl(Seq(asString(url), Literal(UTF8String.fromString(part), StringType)))

  /** Presto cosine_similarity — dense form over array(double) and sparse
    * form over map(varchar, double) (missing keys contribute 0). One name
    * serves both, dispatching on the evaluated value, because the Presto
    * function is overloaded on input type. Zero-norm inputs yield NaN
    * (Presto/Velox behavior); dense arrays of different lengths error. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    // NULL ELEMENTS nullify the result even when both containers are
    // non-null, so nullability cannot be derived from the children.
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_similarity"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def arr(t: DataType) = t match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      def mp(t: DataType) = t match {
        case MapType(StringType, DoubleType, _) => true
        case _ => false
      }
      // Both sides must be the SAME kind — a mixed array/map call is an
      // analysis-time error, not a runtime one (round-10 ADVICE).
      if ((arr(left.dataType) && arr(right.dataType)) ||
          (mp(left.dataType) && mp(right.dataType)))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects both sides array<double> or both map<string,double>, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    private def num(v: Any): Double = v match {
      case d: Double => d
      case f: Float => f.toDouble
      case null => 0.0
    }
    override def nullSafeEval(a: Any, b: Any): Any = (a, b) match {
      case (x: org.apache.spark.sql.catalyst.util.ArrayData,
            y: org.apache.spark.sql.catalyst.util.ArrayData) =>
        val et = left.dataType.asInstanceOf[ArrayType].elementType
        val ft = right.dataType.asInstanceOf[ArrayType].elementType
        if (x.numElements() != y.numElements())
          throw new IllegalArgumentException(
            s"cosine_similarity: arrays must have the same length " +
              s"(${x.numElements()} vs ${y.numElements()})")
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < x.numElements()) {
          // a NULL element nullifies the whole result, as in Presto
          if (x.isNullAt(i) || y.isNullAt(i)) return null
          val xv = num(x.get(i, et)); val yv = num(y.get(i, ft))
          dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
        }
        dot / (math.sqrt(nx) * math.sqrt(ny))
      case (x: org.apache.spark.sql.catalyst.util.MapData,
            y: org.apache.spark.sql.catalyst.util.MapData) =>
        def toMap(m: org.apache.spark.sql.catalyst.util.MapData): Map[String, Double] = {
          val ks = m.keyArray(); val vs = m.valueArray()
          (0 until m.numElements()).map { i =>
            if (vs.isNullAt(i)) return null // NULL value nullifies, as in Presto
            ks.getUTF8String(i).toString -> num(vs.get(i, DoubleType))
          }.toMap
        }
        val mx = toMap(x); val my = toMap(y)
        if (mx == null || my == null) return null
        val dot = mx.iterator.map { case (k, v) => v * my.getOrElse(k, 0.0) }.sum
        val nx = math.sqrt(mx.valuesIterator.map(v => v * v).sum)
        val ny = math.sqrt(my.valuesIterator.map(v => v * v).sum)
        dot / (nx * ny)
      case _ => throw new IllegalArgumentException(
        "cosine_similarity: both sides must be arrays or both maps")
    }
  }

  /** Presto word_stem(word): the Porter (1980) stemmer, ported from the
    * author's reference porter.c (including its two documented
    * departures: step-2 `bli`→`ble` and `logi`→`log`) — the same
    * algorithm behind Presto's Lucene PorterStemmer and DuckDB's
    * stem(w, 'porter'), which the oracle entry exploits. Operates on
    * lowercase ASCII words; words shorter than 3 chars are returned
    * unchanged, as in the original. */
  case class WordStem(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "word_stem"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(PorterStemmer.stem(v.asInstanceOf[UTF8String].toString))
  }

  /** Presto TRY(expr): NULL on runtime error. Semantically Spark's
    * TryEval, re-implemented as a graft-owned class so no optimizer rule
    * redistributes it over conditional branches (see the graft_try
    * builder note); the codegen is the standard try/catch wrap around
    * the child's generated code. */
  case class GraftTry(child: Expression) extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = true
    override def prettyName: String = "try"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      try child.eval(input) catch { case scala.util.control.NonFatal(_) => null }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val childGen = child.genCode(ctx)
      val javaType = CodeGenerator.javaType(dataType)
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        try {
          ${childGen.code}
          ${ev.isNull} = ${childGen.isNull};
          ${ev.value} = ${childGen.value};
        } catch (Exception e) {
          ${ev.isNull} = true;
        }""")
    }
  }

  /** word_stem with a non-constant language argument: the 'en'-only
    * check happens per row at eval time (constants are folded at plan
    * time in the builder above). */
  case class WordStemLang(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "word_stem"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(w: Any, lang: Any): Any = {
      if (lang.asInstanceOf[UTF8String].toString != "en")
        throw new IllegalArgumentException(
          s"word_stem: only language 'en' is supported, got $lang")
      UTF8String.fromString(PorterStemmer.stem(w.asInstanceOf[UTF8String].toString))
    }
  }

  /** Presto cardinality — one name over container sizes AND HyperLogLog
    * sketches (Presto overloads cardinality(hll) as the estimate reader
    * for approx_set/merge). Arrays and maps keep Spark `size` semantics
    * (INT, so existing callers' schemas are unchanged); a BINARY child is
    * read as a datasketches HLL sketch (the representation Spark's
    * hll_sketch_agg / our approx_set produces) and returns the rounded
    * estimate as BIGINT, exactly like Spark's hll_sketch_estimate. */
  case class PrestoCardinality(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override lazy val dataType: DataType = child.dataType match {
      case BinaryType => LongType
      case _ => IntegerType
    }
    override def prettyName: String = "cardinality"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case BinaryType | _: ArrayType | _: MapType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cardinality expects array, map or hll-sketch binary, got ${other.catalogString}")
      }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = v match {
      case b: Array[Byte] =>
        // sketch-family dispatch on the serialized preamble: Theta
        // (make_set_digest) vs HLL (approx_set). Anything else — e.g. a
        // Presto/airlift-serialized SetDigest or HLL — is a different,
        // non-interchangeable wire format and is rejected by name.
        if (KHll.isKhll(b)) KHll.cardinality(b)
        else if (SetDigest.isSetDigest(b) || SetDigest.isThetaFamily(b)) SetDigest.estimate(b)
        else if (b.length > 2 && (b(2) & 0xff) == org.apache.datasketches.common.Family.HLL.getID)
          Math.round(org.apache.datasketches.hll.HllSketch.heapify(
            org.apache.datasketches.memory.Memory.wrap(b)).getEstimate)
        else throw new IllegalArgumentException(
          "cardinality: not a graft sketch binary — expected a 'GS'-framed " +
            "set digest, a DataSketches Theta COMPACT, or a DataSketches HLL " +
            s"(family id at preamble byte 2; got ${
              if (b.length > 2) "byte " + (b(2) & 0xff) else s"a ${b.length}-byte input"
            }). Presto's SetDigest/HLL wire formats are different and " +
            "non-interchangeable — re-aggregate with make_set_digest/approx_set.")
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.numElements()
      case m: org.apache.spark.sql.catalyst.util.MapData => m.numElements()
    }
  }

  val identifiers: Seq[FunctionIdentifier] =
    builders.map { case (n, _) => FunctionIdentifier(n) }
}
