package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** Function registry with Presto↔Spark name translation and per-function
  * metadata — the Spark rendering of the reference's FunctionRegistry
  * (axiom/optimizer/FunctionRegistry.h:111-178: per-function metadata,
  * aggregate/nondeterministic bits :25-54, canonical names :229-251,
  * reversible pairs :262-270).
  *
  * Execution goes through Spark's built-in (codegen'd) functions —
  * exactly as the reference executes by name through Velox's Presto
  * library (AxiomSql.cpp:58-59); this registry owns only naming and
  * metadata.
  */
object Registry {

  final case class FnMeta(
      sparkName: String,
      isAggregate: Boolean = false,
      deterministic: Boolean = true,
      /** relative per-row cost (reference Cost.h unit scale) */
      cost: Double = 1.0)

  /** Presto name → Spark function metadata. Identity entries are the
    * shared ANSI surface; the interesting rows are the renames. */
  val fns: Map[String, FnMeta] = {
    val renamed = Map(
      // Presto strpos takes an optional instance argument (2-arg form
      // stays Spark's codegen'd instr inside the builder).
      "strpos" -> FnMeta("presto_strpos"),
      "strrpos" -> FnMeta("strrpos"),
      // Presto split's delimiter is a LITERAL (Spark's is a regex).
      "split" -> FnMeta("presto_split"),
      "from_base" -> FnMeta("from_base"),
      "to_base" -> FnMeta("to_base"),
      "is_finite" -> FnMeta("is_finite"),
      "is_infinite" -> FnMeta("is_infinite"),
      "ends_with" -> FnMeta("endswith"),
      "cosh" -> FnMeta("cosh"), "sinh" -> FnMeta("sinh"), "tanh" -> FnMeta("tanh"),
      "acosh" -> FnMeta("acosh"), "asinh" -> FnMeta("asinh"), "atanh" -> FnMeta("atanh"),
      "atan2" -> FnMeta("atan2"), "cot" -> FnMeta("cot"),
      "e" -> FnMeta("e"), "pi" -> FnMeta("pi"),
      "approx_distinct" -> FnMeta("approx_count_distinct", isAggregate = true),
      "approx_percentile" -> FnMeta("percentile_approx", isAggregate = true, cost = 4.0),
      "arbitrary" -> FnMeta("any_value", isAggregate = true),
      "array_agg" -> FnMeta("collect_list", isAggregate = true, cost = 2.0),
      // cardinality is overloaded in Presto: container size AND the
      // HLL-sketch estimate reader — the injected PrestoCompat expression
      // dispatches on input type (array/map keep `size` semantics).
      "cardinality" -> FnMeta("cardinality"),
      "contains" -> FnMeta("array_contains"),
      "codepoint" -> FnMeta("ascii"),
      "from_unixtime" -> FnMeta("timestamp_seconds"),
      "to_unixtime" -> FnMeta("unix_timestamp"),
      "day_of_week" -> FnMeta("dayofweek"),
      "day_of_year" -> FnMeta("dayofyear"),
      "json_extract_scalar" -> FnMeta("get_json_object", cost = 8.0),
      // round-11 JSON family (PrestoCompat builders; json_array_length
      // is Spark-native under the same name)
      "json_extract" -> FnMeta("json_extract", cost = 8.0),
      "json_parse" -> FnMeta("json_parse", cost = 8.0),
      "json_format" -> FnMeta("json_format", cost = 1.0),
      "json_size" -> FnMeta("json_size", cost = 8.0),
      "json_array_contains" -> FnMeta("json_array_contains", cost = 8.0),
      "json_array_length" -> FnMeta("json_array_length", cost = 4.0),
      // round-17 JSON tail (PrestoCompat builders)
      "is_json_scalar" -> FnMeta("is_json_scalar", cost = 8.0),
      "json_array_get" -> FnMeta("json_array_get", cost = 8.0),
      "rand" -> FnMeta("rand", deterministic = false),
      "random" -> FnMeta("rand", deterministic = false),
      "uuid" -> FnMeta("uuid", deterministic = false),
      "log2" -> FnMeta("log2"),
      "ln" -> FnMeta("ln"),
      "pow" -> FnMeta("power"),
      "is_nan" -> FnMeta("isnan"),
      "element_at" -> FnMeta("element_at"),
      "slice" -> FnMeta("slice"),
      "sequence" -> FnMeta("sequence"),
      "regexp_like" -> FnMeta("rlike"),
      "split_part" -> FnMeta("split_part"),
      "date_trunc" -> FnMeta("date_trunc"),
      "date_add" -> FnMeta("date_add"),
      // 3-arg Presto form handled by the injected PrestoCompat function
      // (unit-aware TimestampDiff); name kept identical so SQL text is
      // untouched and arity decides.
      "date_diff" -> FnMeta("date_diff"),
      "array_position" -> FnMeta("array_position"),
      "array_remove" -> FnMeta("array_remove"),
      "array_sort" -> FnMeta("array_sort"),
      "arrays_overlap" -> FnMeta("arrays_overlap"),
      "flatten" -> FnMeta("flatten"),
      "array_max" -> FnMeta("array_max"),
      "array_min" -> FnMeta("array_min"),
      "array_join" -> FnMeta("array_join"),
      // Presto repeat(elem, n) builds an ARRAY — Spark's same-named
      // function repeats a STRING; array_repeat is the honest match.
      "repeat" -> FnMeta("array_repeat"),
      "map_concat" -> FnMeta("map_concat"),
      "map_from_entries" -> FnMeta("map_from_entries"),
      // Presto chr(n) is a Unicode CODE POINT; Spark's char/chr is the
      // byte n % 256 — PrestoFns2.CodePointChar owns the semantics.
      "chr" -> FnMeta("presto_chr"),
      // Presto MAP() takes zero args or (keys_array, values_array) —
      // Spark's map(...) takes interleaved pairs.
      "map" -> FnMeta("presto_map"),
      "lpad" -> FnMeta("lpad"),
      "rpad" -> FnMeta("rpad"),
      "levenshtein_distance" -> FnMeta("levenshtein", cost = 8.0),
      // hamming_distance is a DIFFERENT metric from levenshtein — it gets
      // a real implementation (PrestoCompat.HammingDistance), not an alias.
      "hamming_distance" -> FnMeta("hamming_distance", cost = 8.0),
      "to_hex" -> FnMeta("hex"),
      "from_hex" -> FnMeta("unhex"),
      "bit_count" -> FnMeta("bit_count"),
      // Presto's scalar bitwise_and/or/xor have no NAMED Spark function
      // (only the & | ^ operators) — callers use Column operators.
      // Presto regexp_extract defaults to group 0 and yields NULL on
      // no-match (Spark: group 1, '') — PrestoFns2 owns the semantics.
      "regexp_extract" -> FnMeta("presto_regexp_extract", cost = 4.0),
      "regexp_extract_all" -> FnMeta("presto_regexp_extract_all", cost = 8.0),
      "regexp_split" -> FnMeta("regexp_split", cost = 4.0),
      "regexp_replace" -> FnMeta("regexp_replace", cost = 4.0),
      // round-11 digest/byte-order tail (PrestoFns2): Presto digests
      // return VARBINARY (Spark's md5/sha1 return hex strings) and
      // Presto xxhash64 is seed-0 XXH64 as 8 bytes (Spark's is seed-42
      // → BIGINT), so the colliding names go through presto_* builders.
      "md5" -> FnMeta("presto_md5", cost = 4.0),
      "sha1" -> FnMeta("presto_sha1", cost = 4.0),
      "sha256" -> FnMeta("sha256", cost = 4.0),
      "sha512" -> FnMeta("sha512", cost = 4.0),
      "xxhash64" -> FnMeta("presto_xxhash64", cost = 2.0),
      "crc32" -> FnMeta("crc32", cost = 2.0),
      "to_big_endian_64" -> FnMeta("to_big_endian_64"),
      "from_big_endian_64" -> FnMeta("from_big_endian_64"),
      "to_big_endian_32" -> FnMeta("to_big_endian_32"),
      "from_big_endian_32" -> FnMeta("from_big_endian_32"),
      "to_ieee754_64" -> FnMeta("to_ieee754_64"),
      "from_ieee754_64" -> FnMeta("from_ieee754_64"),
      "to_ieee754_32" -> FnMeta("to_ieee754_32"),
      "from_ieee754_32" -> FnMeta("from_ieee754_32"),
      "to_utf8" -> FnMeta("to_utf8"),
      "from_utf8" -> FnMeta("from_utf8"),
      "normalize" -> FnMeta("normalize", cost = 2.0),
      // distribution CDFs + Wilson intervals (PrestoFns2.DistFn)
      "normal_cdf" -> FnMeta("normal_cdf", cost = 8.0),
      "inverse_normal_cdf" -> FnMeta("inverse_normal_cdf", cost = 8.0),
      "binomial_cdf" -> FnMeta("binomial_cdf", cost = 8.0),
      "poisson_cdf" -> FnMeta("poisson_cdf", cost = 8.0),
      "beta_cdf" -> FnMeta("beta_cdf", cost = 8.0),
      "inverse_beta_cdf" -> FnMeta("inverse_beta_cdf", cost = 8.0),
      "chi_squared_cdf" -> FnMeta("chi_squared_cdf", cost = 8.0),
      "gamma_cdf" -> FnMeta("gamma_cdf", cost = 8.0),
      "cauchy_cdf" -> FnMeta("cauchy_cdf", cost = 8.0),
      "weibull_cdf" -> FnMeta("weibull_cdf", cost = 8.0),
      "laplace_cdf" -> FnMeta("laplace_cdf", cost = 8.0),
      "f_cdf" -> FnMeta("f_cdf", cost = 8.0),
      "wilson_interval_lower" -> FnMeta("wilson_interval_lower", cost = 2.0),
      "wilson_interval_upper" -> FnMeta("wilson_interval_upper", cost = 2.0),
      // datetime tail (PrestoFns2 + Spark twins under Presto names)
      "last_day_of_month" -> FnMeta("last_day_of_month"),
      "week" -> FnMeta("week_of_year"),
      "week_of_year" -> FnMeta("week_of_year"),
      "year_of_week" -> FnMeta("year_of_week"),
      "yow" -> FnMeta("year_of_week"),
      "quarter" -> FnMeta("quarter"),
      "millisecond" -> FnMeta("millisecond"),
      "from_iso8601_timestamp" -> FnMeta("from_iso8601_timestamp"),
      "from_iso8601_date" -> FnMeta("from_iso8601_date"),
      "to_iso8601" -> FnMeta("to_iso8601", cost = 2.0),
      "parse_duration" -> FnMeta("parse_duration", cost = 2.0),
      "to_milliseconds" -> FnMeta("to_milliseconds"),
      "human_readable_seconds" -> FnMeta("human_readable_seconds", cost = 2.0),
      // Presto date(x) collides with nothing nameable in Spark SQL
      // (DATE 'lit' is syntax) — renamed onto the builder.
      "date" -> FnMeta("presto_date"),
      "current_timezone" -> FnMeta("current_timezone"),
      // aggregate tail
      "every" -> FnMeta("bool_and", isAggregate = true),
      "bitwise_and_agg" -> FnMeta("bit_and", isAggregate = true),
      "bitwise_or_agg" -> FnMeta("bit_or", isAggregate = true),
      "bitwise_xor_agg" -> FnMeta("bit_xor", isAggregate = true),
      "entropy" -> FnMeta("entropy", isAggregate = true, cost = 2.0),
      "map_union_sum" -> FnMeta("map_union_sum", isAggregate = true, cost = 8.0),
      // array/map utility tail (PrestoFns2 HOF compositions)
      "array_sum" -> FnMeta("array_sum", cost = 2.0),
      "array_average" -> FnMeta("array_average", cost = 2.0),
      "array_cum_sum" -> FnMeta("array_cum_sum", cost = 4.0),
      "array_duplicates" -> FnMeta("array_duplicates", cost = 8.0),
      "array_has_duplicates" -> FnMeta("array_has_duplicates", cost = 4.0),
      "array_normalize" -> FnMeta("array_normalize", cost = 4.0),
      "array_sort_desc" -> FnMeta("array_sort_desc", cost = 4.0),
      "remove_nulls" -> FnMeta("remove_nulls", cost = 2.0),
      "map_remove_null_values" -> FnMeta("map_remove_null_values", cost = 2.0),
      "map_subset" -> FnMeta("map_subset", cost = 2.0),
      "map_top_n" -> FnMeta("map_top_n", cost = 4.0),
      "map_normalize" -> FnMeta("map_normalize", cost = 4.0),
      "multimap_from_entries" -> FnMeta("multimap_from_entries", cost = 8.0),
      // geospatial ST_* family (GeoFns — planar OGC kernels over WKB;
      // the reference registers these via the Velox Presto library,
      // AxiomSql.cpp:149)
      "st_point" -> FnMeta("st_point"),
      "st_geometryfromtext" -> FnMeta("st_geometryfromtext", cost = 8.0),
      "st_astext" -> FnMeta("st_astext", cost = 4.0),
      "st_x" -> FnMeta("st_x"),
      "st_y" -> FnMeta("st_y"),
      "st_area" -> FnMeta("st_area", cost = 4.0),
      "st_length" -> FnMeta("st_length", cost = 4.0),
      "st_centroid" -> FnMeta("st_centroid", cost = 4.0),
      "st_envelope" -> FnMeta("st_envelope", cost = 2.0),
      "st_geometrytype" -> FnMeta("st_geometrytype"),
      "st_numpoints" -> FnMeta("st_numpoints"),
      "st_isempty" -> FnMeta("st_isempty"),
      "st_xmin" -> FnMeta("st_xmin"), "st_ymin" -> FnMeta("st_ymin"),
      "st_xmax" -> FnMeta("st_xmax"), "st_ymax" -> FnMeta("st_ymax"),
      "st_distance" -> FnMeta("st_distance", cost = 8.0),
      "st_intersects" -> FnMeta("st_intersects", cost = 8.0),
      "st_contains" -> FnMeta("st_contains", cost = 8.0),
      "st_within" -> FnMeta("st_within", cost = 8.0),
      "great_circle_distance" -> FnMeta("great_circle_distance", cost = 2.0),
      "st_dimension" -> FnMeta("st_dimension"),
      "st_numgeometries" -> FnMeta("st_numgeometries"),
      "st_isclosed" -> FnMeta("st_isclosed"),
      "st_issimple" -> FnMeta("st_issimple", cost = 8.0),
      "st_isring" -> FnMeta("st_isring", cost = 8.0),
      "st_exteriorring" -> FnMeta("st_exteriorring"),
      "st_numinteriorring" -> FnMeta("st_numinteriorring"),
      "st_convexhull" -> FnMeta("st_convexhull", cost = 8.0),
      "st_startpoint" -> FnMeta("st_startpoint"),
      "st_endpoint" -> FnMeta("st_endpoint"),
      "st_pointn" -> FnMeta("st_pointn"),
      "st_geometryn" -> FnMeta("st_geometryn"),
      "st_interiorringn" -> FnMeta("st_interiorringn"),
      "st_disjoint" -> FnMeta("st_disjoint", cost = 8.0),
      // DE-9IM relate family (round 16)
      "st_touches" -> FnMeta("st_touches", cost = 8.0),
      "st_crosses" -> FnMeta("st_crosses", cost = 8.0),
      "st_overlaps" -> FnMeta("st_overlaps", cost = 8.0),
      "st_equals" -> FnMeta("st_equals", cost = 8.0),
      "st_relate" -> FnMeta("st_relate", cost = 8.0),
      "st_asbinary" -> FnMeta("st_asbinary"),
      "st_geomfrombinary" -> FnMeta("st_geomfrombinary", cost = 2.0),
      "st_geometryfrombinary" -> FnMeta("st_geometryfrombinary", cost = 2.0),
      "st_linefromtext" -> FnMeta("st_linefromtext", cost = 8.0),
      "st_linestring" -> FnMeta("st_linestring", cost = 2.0),
      "st_multipoint" -> FnMeta("st_multipoint", cost = 2.0),
      "st_polygon" -> FnMeta("st_polygon", cost = 8.0),
      // ML inference helpers (MlFns — exact least-squares linear models)
      "features" -> FnMeta("features"),
      "learn_regressor" -> FnMeta("learn_regressor", isAggregate = true, cost = 16.0),
      "learn_classifier" -> FnMeta("learn_classifier", isAggregate = true, cost = 16.0),
      "regress" -> FnMeta("regress", cost = 4.0),
      "classify" -> FnMeta("classify", cost = 4.0),
      // Bing tile family (BingTiles — Web-Mercator quadtree addressing)
      "bing_tile" -> FnMeta("bing_tile"),
      "bing_tile_at" -> FnMeta("bing_tile_at", cost = 2.0),
      "bing_tile_quadkey" -> FnMeta("bing_tile_quadkey", cost = 2.0),
      "bing_tile_zoom_level" -> FnMeta("bing_tile_zoom_level"),
      "bing_tile_coordinates" -> FnMeta("bing_tile_coordinates"),
      "bing_tile_polygon" -> FnMeta("bing_tile_polygon", cost = 4.0),
      "bing_tiles_around" -> FnMeta("bing_tiles_around", cost = 4.0),
      "convex_hull_agg" -> FnMeta("convex_hull_agg", isAggregate = true, cost = 8.0),
      "geometry_to_bing_tiles" -> FnMeta("geometry_to_bing_tiles", cost = 8.0),
      "simplify_geometry" -> FnMeta("simplify_geometry", cost = 8.0),
      "st_isvalid" -> FnMeta("st_isvalid", cost = 8.0),
      "geometry_invalid_reason" -> FnMeta("geometry_invalid_reason", cost = 8.0),
      "st_points" -> FnMeta("st_points", cost = 2.0),
      "st_coorddim" -> FnMeta("st_coorddim"),
      "line_interpolate_points" -> FnMeta("line_interpolate_points", cost = 4.0),
      "to_spherical_geography" -> FnMeta("to_spherical_geography", cost = 2.0),
      "to_geometry" -> FnMeta("to_geometry", cost = 2.0),
      "line_locate_point" -> FnMeta("line_locate_point", cost = 4.0),
      "line_interpolate_point" -> FnMeta("line_interpolate_point", cost = 4.0),
      // round-17 constructive overlay + accessor tail (GeoFns/GeoAgg)
      "st_union" -> FnMeta("st_union", cost = 16.0),
      "st_intersection" -> FnMeta("st_intersection", cost = 16.0),
      "st_difference" -> FnMeta("st_difference", cost = 16.0),
      "st_symdifference" -> FnMeta("st_symdifference", cost = 16.0),
      "st_buffer" -> FnMeta("st_buffer", cost = 16.0),
      "geometry_union" -> FnMeta("geometry_union", cost = 16.0),
      "geometry_union_agg" -> FnMeta("geometry_union_agg", isAggregate = true, cost = 16.0),
      "st_boundary" -> FnMeta("st_boundary", cost = 8.0),
      "st_interiorrings" -> FnMeta("st_interiorrings", cost = 2.0),
      "st_envelopeaspts" -> FnMeta("st_envelopeaspts", cost = 2.0),
      "expand_envelope" -> FnMeta("expand_envelope", cost = 2.0),
      "flatten_geometry_collections" -> FnMeta("flatten_geometry_collections", cost = 2.0),
      "geometry_nearest_points" -> FnMeta("geometry_nearest_points", cost = 8.0),
      "format_datetime" -> FnMeta("date_format"),
      // Presto date_format takes MYSQL %-patterns (unlike format_datetime)
      // → PrestoCompat's converting implementation, not Spark's date_format.
      "date_format" -> FnMeta("presto_date_format"),
      // Presto reduce(arr, init, merge, finish) ≡ Spark aggregate (same
      // 4-arg HOF shape).
      "reduce" -> FnMeta("aggregate"),
      // Presto zip(a, b) → array of rows ≡ Spark arrays_zip (structs).
      "zip" -> FnMeta("arrays_zip"),
      "bitwise_and" -> FnMeta("bitwise_and"),
      "bitwise_or" -> FnMeta("bitwise_or"),
      "bitwise_xor" -> FnMeta("bitwise_xor"),
      "bitwise_not" -> FnMeta("bitwise_not"),
      // Presto logical right shift = Spark shiftrightunsigned (Spark's
      // shiftright is the ARITHMETIC shift).
      "bitwise_left_shift" -> FnMeta("shiftleft"),
      "bitwise_right_shift" -> FnMeta("shiftrightunsigned"),
      "bitwise_shift_right_arithmetic" -> FnMeta("shiftright"),
      "regexp_count" -> FnMeta("regexp_count", cost = 4.0),
      "typeof" -> FnMeta("typeof"),
      "shuffle" -> FnMeta("shuffle", deterministic = false),
      "array_except" -> FnMeta("array_except"),
      "map_entries" -> FnMeta("map_entries"),
      "map_zip_with" -> FnMeta("map_zip_with"),
      "transform_keys" -> FnMeta("transform_keys"),
      "transform_values" -> FnMeta("transform_values"),
      // date_parse takes MySQL %-patterns, to_timestamp Java patterns —
      // PrestoCompat converts the pattern at plan time under this name.
      "date_parse" -> FnMeta("date_parse"),
      "current_date" -> FnMeta("current_date", deterministic = false),
      "now" -> FnMeta("now", deterministic = false),
      "width_bucket" -> FnMeta("width_bucket"),
      // Presto truncate is NUMERIC truncation toward zero; Spark trunc is
      // a date function — PrestoCompat provides the numeric one.
      "truncate" -> FnMeta("truncate"),
      "mod" -> FnMeta("mod"),
      "sign" -> FnMeta("signum"),
      "cbrt" -> FnMeta("cbrt"),
      "degrees" -> FnMeta("degrees"),
      "radians" -> FnMeta("radians"),
      // Presto lambda-predicate trio: exists/forall are the Spark names;
      // none_match is injected (PrestoCompat) as NOT exists.
      "any_match" -> FnMeta("exists"),
      "all_match" -> FnMeta("forall"),
      "none_match" -> FnMeta("none_match"),
      "starts_with" -> FnMeta("startswith"),
      "to_base64" -> FnMeta("base64"),
      "from_base64" -> FnMeta("unbase64"),
      // injected composites/aggregates (PrestoCompat.builders)
      "geometric_mean" -> FnMeta("geometric_mean", isAggregate = true),
      "map_agg" -> FnMeta("map_agg", isAggregate = true, cost = 2.0),
      "checksum" -> FnMeta("checksum", isAggregate = true, cost = 2.0),
      "url_extract_host" -> FnMeta("url_extract_host", cost = 4.0),
      "url_extract_path" -> FnMeta("url_extract_path", cost = 4.0),
      "url_extract_protocol" -> FnMeta("url_extract_protocol", cost = 4.0),
      "url_extract_fragment" -> FnMeta("url_extract_fragment", cost = 4.0),
      "url_extract_query" -> FnMeta("url_extract_query", cost = 4.0),
      "url_extract_port" -> FnMeta("url_extract_port", cost = 4.0),
      "url_extract_parameter" -> FnMeta("url_extract_parameter", cost = 4.0),
      "ngrams" -> FnMeta("ngrams", cost = 4.0),
      "multimap_agg" -> FnMeta("multimap_agg", isAggregate = true, cost = 4.0),
      "histogram" -> FnMeta("histogram", isAggregate = true, cost = 4.0),
      "map_union" -> FnMeta("map_union", isAggregate = true, cost = 4.0),
      // round-10 tail: similarity/sketch/set aggregates (PrestoCompat)
      "cosine_similarity" -> FnMeta("cosine_similarity", cost = 8.0),
      "word_stem" -> FnMeta("word_stem", cost = 8.0),
      "set_agg" -> FnMeta("set_agg", isAggregate = true, cost = 2.0),
      "set_union" -> FnMeta("set_union", isAggregate = true, cost = 4.0),
      "approx_set" -> FnMeta("approx_set", isAggregate = true, cost = 2.0),
      "merge" -> FnMeta("merge", isAggregate = true, cost = 2.0),
      "reduce_agg" -> FnMeta("reduce_agg", isAggregate = true, cost = 4.0),
      // round-11: datetime/zone + sketch-array + keyed-top-n tail
      "at_timezone" -> FnMeta("at_timezone", cost = 2.0),
      "with_timezone" -> FnMeta("with_timezone", cost = 2.0),
      "timezone_hour" -> FnMeta("timezone_hour", cost = 2.0),
      "timezone_minute" -> FnMeta("timezone_minute", cost = 2.0),
      "parse_datetime" -> FnMeta("parse_datetime", cost = 4.0),
      "from_unixtime_nanos" -> FnMeta("from_unixtime_nanos"),
      "values_at_quantiles" -> FnMeta("values_at_quantiles", cost = 4.0),
      "quantiles_at_values" -> FnMeta("quantiles_at_values", cost = 4.0),
      "map_keys_by_top_n_values" -> FnMeta("map_keys_by_top_n_values", cost = 4.0),
      "numeric_histogram" -> FnMeta("numeric_histogram", isAggregate = true, cost = 4.0),
      "bitwise_right_shift_arithmetic" -> FnMeta("shiftright"),
      // round-11: HMAC / base-codec / array-frequency / sampling tail
      "hmac_md5" -> FnMeta("hmac_md5", cost = 8.0),
      "hmac_sha1" -> FnMeta("hmac_sha1", cost = 8.0),
      "hmac_sha256" -> FnMeta("hmac_sha256", cost = 8.0),
      "hmac_sha512" -> FnMeta("hmac_sha512", cost = 8.0),
      "to_base32" -> FnMeta("to_base32", cost = 2.0),
      "from_base32" -> FnMeta("from_base32", cost = 2.0),
      "to_base64url" -> FnMeta("to_base64url", cost = 2.0),
      "from_base64url" -> FnMeta("from_base64url", cost = 2.0),
      "array_top_n" -> FnMeta("array_top_n", cost = 4.0),
      "array_least_frequent" -> FnMeta("array_least_frequent", cost = 4.0),
      "trim_array" -> FnMeta("trim_array", cost = 2.0),
      "array_split_into_chunks" -> FnMeta("array_split_into_chunks", cost = 4.0),
      "split_to_multimap" -> FnMeta("split_to_multimap", cost = 4.0),
      "key_sampling_percent" -> FnMeta("key_sampling_percent", cost = 2.0),
      "inverse_chi_squared_cdf" -> FnMeta("inverse_chi_squared_cdf", cost = 8.0),
      "inverse_gamma_cdf" -> FnMeta("inverse_gamma_cdf", cost = 8.0),
      "inverse_cauchy_cdf" -> FnMeta("inverse_cauchy_cdf", cost = 8.0),
      "inverse_weibull_cdf" -> FnMeta("inverse_weibull_cdf", cost = 8.0),
      "inverse_laplace_cdf" -> FnMeta("inverse_laplace_cdf", cost = 8.0),
      "inverse_f_cdf" -> FnMeta("inverse_f_cdf", cost = 8.0),
      // round-11: SetDigest family (Theta-backed, SetDigest builders)
      "make_set_digest" -> FnMeta("make_set_digest", isAggregate = true, cost = 2.0),
      "merge_set_digest" -> FnMeta("merge_set_digest", isAggregate = true, cost = 2.0),
      "intersection_cardinality" -> FnMeta("intersection_cardinality", cost = 4.0),
      "jaccard_index" -> FnMeta("jaccard_index", cost = 4.0),
      "hash_counts" -> FnMeta("hash_counts", cost = 2.0),
      // round-17: KHyperLogLog family (joinability/reidentifiability,
      // KHll builders; cardinality/intersection/jaccard dispatch on the
      // 'GK' preamble through the shared names above)
      "khyperloglog_agg" -> FnMeta("khyperloglog_agg", isAggregate = true, cost = 2.0),
      "merge_khll" -> FnMeta("merge_khll", cost = 2.0),
      "uniqueness_distribution" -> FnMeta("uniqueness_distribution", cost = 4.0),
      "reidentification_potential" -> FnMeta("reidentification_potential", cost = 4.0),
      // round-11: IP-address family + array tail (NetFns builders)
      "ip_prefix" -> FnMeta("ip_prefix", cost = 4.0),
      "ip_subnet_min" -> FnMeta("ip_subnet_min", cost = 4.0),
      "ip_subnet_max" -> FnMeta("ip_subnet_max", cost = 4.0),
      "ip_subnet_range" -> FnMeta("ip_subnet_range", cost = 4.0),
      "is_subnet_of" -> FnMeta("is_subnet_of", cost = 4.0),
      "combinations" -> FnMeta("combinations", cost = 8.0),
      "contains_sequence" -> FnMeta("contains_sequence", cost = 4.0),
      // Spark 4 ships luhn_check under the Presto name
      "luhn_check" -> FnMeta("luhn_check", cost = 2.0),
      // round-11: quantile sketch family (KLL-backed qdigest analogue)
      "qdigest_agg" -> FnMeta("qdigest_agg", isAggregate = true, cost = 2.0),
      "tdigest_agg" -> FnMeta("tdigest_agg", isAggregate = true, cost = 2.0),
      "approx_most_frequent" -> FnMeta("approx_most_frequent", isAggregate = true, cost = 4.0),
      "value_at_quantile" -> FnMeta("value_at_quantile", cost = 2.0),
      "quantile_at_value" -> FnMeta("quantile_at_value", cost = 2.0),
      // Presto split_to_map(s, entryDelim, kvDelim) ≡ Spark str_to_map
      // (same argument order).
      "split_to_map" -> FnMeta("str_to_map"))
    // NOTE: Presto's nullary infinity()/nan() are literals in Spark
    // (double('Infinity')) — not name-mappable, so not registry entries
    // (the SQL rewriter must never substitute a non-identifier).
    val aggs = Seq("sum", "avg", "min", "max", "count", "stddev", "variance",
      "corr", "covar_samp", "covar_pop", "skewness", "kurtosis",
      "min_by", "max_by", "bool_and", "bool_or", "count_if",
      "regr_slope", "regr_intercept", "regr_r2", "regr_count",
      "regr_avgx", "regr_avgy")
      .map(n => n -> FnMeta(n, isAggregate = true))
    val scalars = Seq("abs", "round", "floor", "ceil", "sqrt", "exp", "length",
      "lower", "upper", "trim", "ltrim", "rtrim", "substr", "concat", "replace",
      "reverse", "coalesce", "greatest", "least", "year", "month", "day", "hour",
      "minute", "second", "sha2", "transform", "filter",
      "zip_with", "aggregate", "array_distinct", "array_intersect", "array_union",
      "explode", "posexplode", "sort_array", "array_sort", "map_keys", "map_values",
      "url_encode", "url_decode")
      .map(n => n -> FnMeta(n))
    (aggs ++ scalars).toMap ++ renamed
  }

  /** Reversible comparison/arith pairs (FunctionRegistry.h:262-270) —
    * lets a planner canonicalize `lit op col` to `col op' lit`. */
  val reversible: Map[String, String] = Map(
    "=" -> "=", "<" -> ">", ">" -> "<", "<=" -> ">=", ">=" -> "<=",
    "+" -> "+", "*" -> "*")

  def meta(prestoName: String): Option[FnMeta] = fns.get(prestoName.toLowerCase)

  /** Resolve a Presto-dialect call to a Spark Column. Unknown names fall
    * through verbatim — Spark's analyzer raises on truly unknown ones. */
  def call(prestoName: String, args: Column*): Column = {
    val spark = meta(prestoName).map(_.sparkName).getOrElse(prestoName.toLowerCase)
    call_function(spark, args: _*)
  }

  def isAggregate(prestoName: String): Boolean =
    meta(prestoName).exists(_.isAggregate)

  def isDeterministic(prestoName: String): Boolean =
    meta(prestoName).forall(_.deterministic)
}
