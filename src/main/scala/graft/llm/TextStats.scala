package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over `documents`: token statistics, quality scoring,
  * heuristic language ID, and content fingerprinting — the per-document
  * scoring/filtering stages of a training-data pipeline. Everything is a
  * narrow projection (one pass, no shuffle except final aggregates), so
  * at 100 TB these run at scan speed and pushdown keeps untouched
  * columns unread.
  */
object TextStats {

  private def toks: Column = split(trim(col("text")), "\\s+")

  // --------------------------------------------------------- token stats
  /** Whitespace tokens + a BPE-ish proxy: alphanumeric runs (subword-like
    * segmentation by regex, the cheap stand-in for a real tokenizer). */
  def tokenStats(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      size(split(trim(col("text")), "[^a-zA-Z0-9]+")).as("n_bpeish"),
      round(aggregate(transform(toks, tk => length(tk).cast("double")),
        lit(0.0), (a, x) => a + x) / size(toks), 4).as("avg_tok_len"))
  val tokenStatsSql: String =
    """SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_distinct,
       len(string_split_regex(trim(text), '[^a-zA-Z0-9]+')) AS n_bpeish,
       round(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                                     tk -> length(tk)::DOUBLE)) /
             len(string_split_regex(trim(text), '\s+')), 4) AS avg_tok_len
       FROM documents"""

  // ------------------------------------------------------ quality score
  /** Length / stopword-ratio / distinct-ratio quality heuristics with a
    * bucketed verdict — the filter stage of a data-quality pipeline. */
  def quality(t: Tables): DataFrame = {
    val nTok = size(toks)
    val stopHits = size(filter(toks, tk => tk.isin("the", "a", "of", "and", "to")))
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio = stopHits.cast("double") / nTok
    t.documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      round(stopRatio, 4).as("stop_ratio"),
      round(distinctRatio, 4).as("distinct_ratio"),
      when(length(col("text")) < 50, "too_short")
        .when(distinctRatio < 0.2, "repetitive")
        .when(stopRatio > 0.4, "boilerplate")
        .otherwise("keep").as("verdict"))
  }
  val qualitySql: String =
    """WITH s AS (
         SELECT doc_id, text,
                string_split_regex(trim(text), '\s+') AS w FROM documents
       )
       SELECT doc_id, length(text) AS n_chars,
         round(len(list_filter(w, tk -> tk IN ('the','a','of','and','to'))) * 1.0 / len(w), 4) AS stop_ratio,
         round(len(list_distinct(w)) * 1.0 / len(w), 4) AS distinct_ratio,
         CASE WHEN length(text) < 50 THEN 'too_short'
              WHEN len(list_distinct(w)) * 1.0 / len(w) < 0.2 THEN 'repetitive'
              WHEN len(list_filter(w, tk -> tk IN ('the','a','of','and','to'))) * 1.0 / len(w) > 0.4 THEN 'boilerplate'
              ELSE 'keep' END AS verdict
       FROM s"""

  // -------------------------------------------------------- language ID
  /** Marker-stopword n-gram heuristic: score = hits per language's marker
    * set, predict the argmax (ties → 'und'). The synthetic corpus is
    * monolingual word-soup, so this mostly predicts 'en'/'und' — the
    * operator structure (per-language scoring + argmax) is what carries
    * to real corpora. */
  def langId(t: Tables): DataFrame = {
    def hits(markers: Seq[String]): Column =
      size(filter(toks, tk => tk.isin(markers: _*)))
    val en = hits(Seq("the", "a", "of", "and"))
    val es = hits(Seq("el", "la", "los", "que"))
    val de = hits(Seq("der", "die", "das", "und"))
    val fr = hits(Seq("le", "la", "les", "et"))
    t.documents.select(col("doc_id"), col("lang").as("labeled_lang"),
      en.as("sc_en"), es.as("sc_es"), de.as("sc_de"), fr.as("sc_fr"),
      when(en > es && en > de && en > fr, "en")
        .when(es > en && es > de && es > fr, "es")
        .when(de > en && de > es && de > fr, "de")
        .when(fr > en && fr > es && fr > de, "fr")
        .otherwise("und").as("pred_lang"))
  }
  val langIdSql: String =
    """WITH s AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS w FROM documents),
       sc AS (
         SELECT doc_id, lang,
           len(list_filter(w, tk -> tk IN ('the','a','of','and'))) AS sc_en,
           len(list_filter(w, tk -> tk IN ('el','la','los','que'))) AS sc_es,
           len(list_filter(w, tk -> tk IN ('der','die','das','und'))) AS sc_de,
           len(list_filter(w, tk -> tk IN ('le','la','les','et'))) AS sc_fr
         FROM s)
       SELECT doc_id, lang AS labeled_lang, sc_en, sc_es, sc_de, sc_fr,
         CASE WHEN sc_en > sc_es AND sc_en > sc_de AND sc_en > sc_fr THEN 'en'
              WHEN sc_es > sc_en AND sc_es > sc_de AND sc_es > sc_fr THEN 'es'
              WHEN sc_de > sc_en AND sc_de > sc_es AND sc_de > sc_fr THEN 'de'
              WHEN sc_fr > sc_en AND sc_fr > sc_es AND sc_fr > sc_de THEN 'fr'
              ELSE 'und' END AS pred_lang
       FROM sc"""

  // ------------------------------------------------------- fingerprints
  /** Normalized-content fingerprint (lower, collapse whitespace) → md5;
    * per-source uniqueness census — the cross-source contamination
    * check of a corpus build. */
  def fingerprint(t: Tables): DataFrame =
    t.documents
      .withColumn("fp", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"))
  val fingerprintSql: String =
    """SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_unique
       FROM documents GROUP BY source"""

  // -------------------------------------------- cross-source decontamination
  /** Train/eval contamination check: normalized fingerprints appearing in
    * MORE THAN ONE source, with the source list — the decontamination
    * sweep of a corpus build (e.g. benchmark text leaked into training
    * shards). One shuffle on the fingerprint. */
  def crossSourceLeak(t: Tables): DataFrame =
    t.documents
      .withColumn("fp", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .groupBy(col("fp"))
      .agg(countDistinct(col("source")).as("n_sources"),
        concat_ws(",", sort_array(collect_set(col("source")))).as("sources"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_sources") >= 2)
      .select(col("fp"), col("n_sources"), col("sources"), col("n_docs"))
  val crossSourceLeakSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         count(DISTINCT source) AS n_sources,
         array_to_string(list_sort(list_distinct(list(source))), ',') AS sources,
         count(*) AS n_docs
       FROM documents
       GROUP BY 1 HAVING count(DISTINCT source) >= 2"""

  // --------------------------------------- span-level exact-substring dedup
  /** Span-level EXACT-substring duplication census — the granularity
    * document-level dedup misses (two distinct documents sharing one
    * long boilerplate paragraph; Lee et al.'s ExactSubstr motivation).
    * The paper's suffix array becomes a distributed content-anchored
    * k-gram scheme (winnowing/CDC family): a [[GramK]]-char gram is an
    * ANCHOR iff its first character's code point ≡ 0 (mod 8) — see
    * [[anchorsOver]]. Selection depends only on gram CONTENT, so two
    * copies of a span anchor at the same offsets inside the span no
    * matter where it sits in each document — no alignment problem, no
    * pairwise comparison. A shared span of length L carries ~(L-63)/8
    * expected anchors; an anchor hash seen in ≥2 distinct documents
    * marks duplicated content, and the per-document census reports the
    * duplicated-anchor fraction (the paper's "how much of this doc is
    * copied" signal that drives span excision or doc downweighting).
    *
    * Scale: positions pre-filter cost one ascii() each; the stream
    * carries (doc_id, 8-byte hash) for only the ~1/8 that anchor;
    * two hash-keyed shuffles (distinct-doc census, anchor join-back) and
    * one doc_id agg. Linear end to end; no pairs, no spans materialized. */
  private val GramK = 64

  /** (doc_id, doc_len, pos, h): the content-anchored gram stream shared
    * by the census and the excision — ONE definition of what an anchor
    * is, so the two ops (and their SQL twins) cannot drift apart.
    *
    * Anchor selection is a CDC-style byte condition — the gram's FIRST
    * character's code point ≡ 0 (mod 8) — evaluated on the raw text, so
    * the gram hash runs ONLY on the ≈1/8 of positions that anchor
    * (one ascii() per position replaces a 64-char hash per position;
    * 8× less hashing than hash-then-subsample at 2× the anchor
    * density). Selection depends only on content, so two copies of a
    * span anchor at the same in-span offsets at any document offset;
    * xxhash64 of the full 64-char gram then identifies the content. The keep
    * rate is data-dependent (chars with code ≡ 0 mod 8 — 'h','p','x' on
    * lowercase text). */
  private[graft] def anchorsOver(docs: DataFrame): DataFrame = docs
    .filter(length(col("text")) >= GramK)
    .select(col("doc_id"), length(col("text")).as("doc_len"),
      // Selection AND hashing happen inside one per-document kernel, so
      // the heavy text column is materialized once per DOCUMENT and the
      // exploded stream carries only (pos, hash) structs — never a copy
      // of the text per position row.
      //
      // The anchor identity is xxhash64 of the gram (round 13; was a
      // 32-char md5 hex string — see the scale rationale on the r13
      // commit). Optimization round 19: the interpreted HOF chain
      // (sequence → filter(ascii(substring)) → transform(xxhash64
      // (substring))) became the compiled [[NativeExprs.AnchorGrams]]
      // kernel — same positions, same seed-42 XXH64 over the same gram
      // bytes, so the anchor stream is bit-identical (pinned in
      // NativeExprsSpec against the HOF chain), but the ~10M per-position
      // interpreted ops and UTF8String allocations per corpus pass are
      // now one byte scan per document. The extraction was the dominant
      // cost of every withAnchors consumer.
      explode(org.apache.spark.sql.graft.Shim.column(
        graft.functions.NativeExprs.AnchorGrams(
          org.apache.spark.sql.graft.Shim.expression(col("text")), GramK)))
        .as("a"))
    .select(col("doc_id"), col("doc_len"), col("a.pos").as("pos"), col("a.h").as("h"))

  /** Anchor hashes seen in >= 2 distinct documents. */
  private def dupHashes(anchors: DataFrame): DataFrame = anchors
    .groupBy(col("h"))
    .agg(countDistinct(col("doc_id")).as("nd"))
    .filter(col("nd") >= 2)
    .select(col("h"))

  /** Materialize the anchor stream ONCE (eager localCheckpoint — the
    * repo's compute-once idiom, as in [[Ann]]/[[Corpus]]) for a body that
    * consumes it on BOTH sides of the census join: without it Catalyst
    * re-runs the whole extraction (one ascii() per position plus an md5
    * per anchoring position, over every document) for the [[dupHashes]]
    * aggregate AND the join-back — at these entries the extraction, not
    * the shuffles, dominates. The body's result (per-document rows or
    * per-document span arrays — always #docs-bounded, never pos-level) is
    * checkpointed too so the anchor blocks can be released before
    * returning. Blocks are partition-local MEMORY_AND_DISK: the same
    * trade a 100 TB run makes, since the join already shuffles the full
    * anchor stream and recomputing the extraction costs two CPU passes
    * over the entire corpus text. The skew-safe groupBy census (partial
    * countDistinct) is kept — a window-over-h would put a boilerplate
    * hash shared by millions of documents on one task. */
  private def withAnchors(docs: DataFrame)(body: DataFrame => DataFrame): DataFrame = {
    // SIZE-AWARE (round 13, DedupScale lane finding): below ~256 MB of
    // corpus the MEMORY checkpoint wins outright (the extraction
    // dominates and the blocks fit — the round-12 measurement at
    // sf0.1). Past it the memory-resident anchor stream (~1.5× the
    // corpus text even at 8-byte hashes) evicts everything else from
    // executor storage and the entry spends more wall re-faulting
    // blocks than a second extraction pass costs (measured 412 s
    // thrashing vs 146 s without the cache at the lane's 500k-doc
    // corpus). Big corpora therefore persist the stream DISK_ONLY —
    // compute once, spill the blocks to executor-local disk, pin no
    // storage memory. The round-14 A/B (bench/SCALING_DEDUP.md)
    // measured DISK_ONLY vs recompute-per-consumer on the full
    // span-cut at 100×: 130 s vs 147 s min-of-2 — DISK_ONLY wins ~13%
    // (one extraction pass + a disk read beats two extraction passes).
    // `graft.text.anchorStrategy` overrides the size-aware choice
    // (persist | checkpoint | recompute) for lane A/Bs.
    val strategy = docs.sparkSession.conf
      .get("graft.text.anchorStrategy", "auto") match {
        case "auto" =>
          val big =
            docs.queryExecution.optimizedPlan.stats.sizeInBytes > (256L << 20)
          if (big) "persist" else "checkpoint"
        case s @ ("persist" | "checkpoint" | "recompute") => s
        case other => throw new IllegalArgumentException(
          s"graft.text.anchorStrategy='$other' - expected auto|persist|checkpoint|recompute " +
          "(a typo here would silently A/B the wrong strategy)")
      }
    if (strategy == "recompute")
      return body(anchorsOver(docs)).localCheckpoint(true)
    if (strategy == "persist") {
      val anchors = anchorsOver(docs)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      try return body(anchors).localCheckpoint(true)
      finally anchors.unpersist(blocking = false)
    }
    val sc = docs.sparkSession.sparkContext
    // Ownership is PRECISE: the ids snapshotted around the one persist
    // call this method makes are the only ids it ever releases — never a
    // free-everything-but-the-max keyset diff, which under a concurrent
    // persist could release a foreign caller's blocks or this call's own
    // lineage-truncated result. The try/finally releases the pos-level
    // anchor blocks even when the body fails; the small result
    // checkpoint is left to Spark's ContextCleaner, which unpersists it
    // once the returned frame becomes unreachable (bench reps and specs
    // drop it right after their action).
    val before = sc.getPersistentRDDs.keySet
    val anchors = anchorsOver(docs).localCheckpoint(true)
    val anchorIds = sc.getPersistentRDDs.keySet -- before
    try body(anchors).localCheckpoint(true)
    finally anchorIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }

  def dupSpansOver(docs: DataFrame): DataFrame = withAnchors(docs) { anchors =>
    anchors.join(dupHashes(anchors).withColumn("is_dup", lit(1)), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_anchors"),
        count(col("is_dup")).as("n_dup_anchors"))
      .withColumn("dup_frac", round(col("n_dup_anchors") / col("n_anchors"), 4))
  }

  def dupSpans(t: Tables): DataFrame = dupSpansOver(t.documents)

  /** The excision half of the span-level dedup (what Lee et al. actually
    * DO with the matches): merge each document's duplicated anchors into
    * maximal character intervals (classic gaps-and-islands — a new
    * island starts where the next anchor no longer overlaps the previous
    * gram's [pos, pos+K-1] extent) and report what a cut would remove:
    * spans to excise, characters cut, characters kept. Runs entirely on
    * (doc_id, pos) integers: one window over each document's anchors and
    * two aggregations — the heavy text column never enters the shuffle.
    * Only documents that contain duplicated spans appear. */
  def dupSpanExcise(t: Tables): DataFrame = dupSpanExciseOver(t.documents)

  def dupSpanExciseOver(docs: DataFrame): DataFrame = withAnchors(docs) { anchors =>
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    anchors.join(dupHashes(anchors), "h")
      .withColumn("prev", lag(col("pos"), 1).over(wOrd))
      .withColumn("new_isl",
        when(col("prev").isNull || col("pos") - col("prev") > GramK - 1, 1).otherwise(0))
      .withColumn("isl", sum(col("new_isl")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("doc_len"), col("isl"))
      .agg((max(col("pos")) - min(col("pos")) + GramK).cast("long").as("span_len"))
      .groupBy(col("doc_id"), col("doc_len"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("cut_chars"))
      .select(col("doc_id"), col("n_spans"), col("cut_chars"),
        (col("doc_len").cast("long") - col("cut_chars")).as("kept_chars"))
  }
  /** The excision applied: the corpus with every duplicated span CUT OUT
    * (Lee et al.'s actual pipeline output — deduplicated text, not just
    * the census). Islands are merged exactly as in [[dupSpanExciseOver]];
    * each document's few intervals are collected to a sorted array and
    * the cleaned text is stitched by ONE per-document HOF fold over them
    * (substring concatenation of the kept gaps) — the heavy text column
    * is joined in once by doc_id and never enters the anchor shuffles or
    * the window. Documents without duplicated spans (and those shorter
    * than a gram) pass through unchanged, so the result IS the corpus. */
  def dupSpanCut(t: Tables): DataFrame = dupSpanCutOver(t.documents)

  def dupSpanCutOver(docs: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // Only the #docs-bounded span arrays pass through the checkpoint —
    // the corpus-sized stitched output stays lazy.
    val spans = withAnchors(docs) { anchors => anchors.join(dupHashes(anchors), "h")
      .withColumn("prev", lag(col("pos"), 1).over(wOrd))
      .withColumn("new_isl",
        when(col("prev").isNull || col("pos") - col("prev") > GramK - 1, 1).otherwise(0))
      .withColumn("isl", sum(col("new_isl")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(GramK - 1)).as("e"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("s"), col("e")))).as("spans"))
    }
    docs.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("spans").isNull, col("text")).otherwise(expr(
          """aggregate(spans, named_struct('nxt', 1, 'acc', ''),
               (st, sp) -> named_struct('nxt', sp.e + 1,
                 'acc', concat(st.acc, substring(text, st.nxt, sp.s - st.nxt))),
               st -> concat(st.acc, substring(text, st.nxt)))"""))
          .as("cleaned_text"))
  }
  val dupSpanCutSql: String =
    s"""WITH k AS (
         SELECT d.doc_id, t.pos::INT AS pos,
                md5(substr(d.text, t.pos::INT, $GramK)) AS h
         FROM documents d, unnest(range(1, length(d.text) - ${GramK - 2})) AS t(pos)
         WHERE length(d.text) >= $GramK
           AND ord(substr(d.text, t.pos::INT, 1)) % 8 = 0),
       dup AS (SELECT h FROM k GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       isl AS (
         SELECT doc_id, pos,
                sum(CASE WHEN prev IS NULL OR pos - prev > ${GramK - 1}
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS isl
         FROM (SELECT k.doc_id, k.pos,
                      lag(k.pos) OVER (PARTITION BY k.doc_id ORDER BY k.pos) AS prev
               FROM k JOIN dup ON k.h = dup.h) x),
       spans AS (
         SELECT doc_id, isl, min(pos) AS s, max(pos) + ${GramK - 1} AS e
         FROM isl GROUP BY doc_id, isl),
       seg AS (
         SELECT doc_id, s, e,
                lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
         FROM spans),
       cut AS (
         SELECT seg.doc_id,
                string_agg(substr(d.text, seg.prev_e + 1, seg.s - seg.prev_e - 1),
                           '' ORDER BY seg.s)
                  || substr(d.text, max(seg.e) + 1) AS cleaned_text
         FROM seg JOIN documents d ON seg.doc_id = d.doc_id
         GROUP BY seg.doc_id, d.text)
       SELECT doc_id, cleaned_text FROM cut
       UNION ALL
       SELECT doc_id, text AS cleaned_text FROM documents
       WHERE doc_id NOT IN (SELECT doc_id FROM cut)"""

  val dupSpanExciseSql: String =
    s"""WITH k AS (
         SELECT d.doc_id, length(d.text) AS doc_len,
                t.pos::INT AS pos, md5(substr(d.text, t.pos::INT, $GramK)) AS h
         FROM documents d, unnest(range(1, length(d.text) - ${GramK - 2})) AS t(pos)
         WHERE length(d.text) >= $GramK
           AND ord(substr(d.text, t.pos::INT, 1)) % 8 = 0),
       dup AS (SELECT h FROM k GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       da AS (SELECT k.* FROM k JOIN dup ON k.h = dup.h),
       isl AS (
         SELECT doc_id, doc_len, pos,
                sum(CASE WHEN prev IS NULL OR pos - prev > ${GramK - 1}
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS isl
         FROM (SELECT doc_id, doc_len, pos,
                      lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
               FROM da) x),
       spans AS (
         SELECT doc_id, doc_len, isl,
                (max(pos) - min(pos) + $GramK)::BIGINT AS span_len
         FROM isl GROUP BY doc_id, doc_len, isl)
       SELECT doc_id, count(*) AS n_spans,
              sum(span_len)::BIGINT AS cut_chars,
              (doc_len - sum(span_len))::BIGINT AS kept_chars
       FROM spans GROUP BY doc_id, doc_len"""
  val dupSpansSql: String =
    s"""WITH k AS (
         SELECT d.doc_id, md5(substr(d.text, t.pos::INT, $GramK)) AS h
         FROM documents d, unnest(range(1, length(d.text) - ${GramK - 2})) AS t(pos)
         WHERE length(d.text) >= $GramK
           AND ord(substr(d.text, t.pos::INT, 1)) % 8 = 0),
       dup AS (SELECT h FROM k GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
       SELECT k.doc_id, count(*) AS n_anchors,
              count(dup.h) AS n_dup_anchors,
              round(count(dup.h) / count(*), 4) AS dup_frac
       FROM k LEFT JOIN dup ON k.h = dup.h
       GROUP BY k.doc_id"""

  // --------------------------------------------- unigram LM quality score
  /** Per-document average negative log-likelihood under the corpus's own
    * unigram language model — the perplexity-proxy quality filter (docs
    * full of corpus-rare tokens score high/implausible, boilerplate
    * scores low). Two shuffles (term counts, per-doc score); the corpus
    * total joins as a broadcast single row; the score is floor-quantized
    * before comparison so both engines agree bit-for-bit.
    *
    * A real pipeline swaps the unigram model for an n-gram or neural
    * scorer; the dataflow (corpus stats pass → broadcast → per-doc score
    * pass) is identical at 100 TB. */
  def unigramLogprob(t: Tables): DataFrame = {
    val tk = t.documents
      .repartition(t.spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tk"))
    val freq = tk.groupBy(col("tk")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).cast("double").as("tot"))
    tk.join(freq, "tk")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        floor(avg(-log(col("cnt").cast("double") / col("tot"))) * 10000).as("nll_q"))
      .select(col("doc_id"), col("n_tok"), col("nll_q"))
  }
  val unigramLogprobSql: String =
    """WITH tk AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tk FROM documents
       ), f AS (
         SELECT tk, count(*) AS cnt FROM tk GROUP BY 1
       ), tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM f)
       SELECT doc_id, count(*) AS n_tok,
              CAST(floor(avg(-ln(cnt / tot)) * 10000) AS BIGINT) AS nll_q
       FROM tk JOIN f USING (tk) CROSS JOIN tot
       GROUP BY doc_id"""

  // -------------------------------------------- intra-doc repetition removal
  /** Order-preserving token dedup WITHIN each document — the intra-doc
    * repetition-removal stage of a corpus build (the token-level analogue
    * of duplicate-line stripping). Spark's `array_distinct` keeps first
    * occurrences in encounter order; the oracle reconstructs that order
    * explicitly via min(position) since DuckDB's `list_distinct` does not
    * define one. Narrow projection — scan-speed at any corpus size. */
  def dedupTokens(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), size(col("w")).cast("bigint").as("n_tok"),
        array_distinct(col("w")).as("d"))
      .select(col("doc_id"), col("n_tok"),
        size(col("d")).cast("bigint").as("n_kept"),
        round(size(col("d")) / col("n_tok").cast("double"), 4).as("kept_ratio"),
        array_join(slice(col("d"), 1, 5), " ").as("head5"))
  val dedupTokensSql: String =
    """WITH s AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
       ), e AS (
         SELECT doc_id, len(w) AS n_tok,
                unnest(w) AS tok, unnest(range(1, len(w) + 1)) AS pos
         FROM s
       ), f AS (
         SELECT doc_id, n_tok, tok, min(pos) AS mn FROM e GROUP BY 1, 2, 3
       ), g AS (
         SELECT doc_id, n_tok, list(tok ORDER BY mn) AS d FROM f GROUP BY 1, 2)
       SELECT doc_id, n_tok, len(d) AS n_kept,
              round(len(d) / n_tok::DOUBLE, 4) AS kept_ratio,
              array_to_string(d[1:5], ' ') AS head5
       FROM g"""

  /** End-to-end corpus build: quality-filter → exact-dedup (keep min id)
    * → materialize → digest. The composition a real pipeline runs
    * nightly, as one declarative plan plus one parquet write. */
  def corpusBuild(t: Tables): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val kept = t.documents
      .filter(length(col("text")) >= 50 &&
        size(array_distinct(toks)).cast("double") / size(toks) >= 0.2)
    val deduped = kept
      .withColumn("rn", row_number().over(
        Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    val dir = "/root/repo/target/corpus/build"
    deduped.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .write.mode("overwrite").parquet(dir)
    t.spark.read.parquet(dir)
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars"),
        countDistinct(col("source")).as("n_sources"))
  }
  val corpusBuildSql: String =
    """WITH kept AS (
         SELECT * FROM documents
         WHERE length(text) >= 50
           AND len(list_distinct(string_split_regex(trim(text), '\s+'))) * 1.0
               / len(string_split_regex(trim(text), '\s+')) >= 0.2),
       deduped AS (
         SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                        FROM kept) s WHERE rn = 1)
       SELECT count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS n_chars,
              count(DISTINCT source) AS n_sources
       FROM deduped"""

  // -------------------------------------------------------- repetition
  /** Gopher-style repetition signals: fraction of tokens taken by the
    * single most frequent word, and fraction of duplicated bigrams
    * (1 - distinct/total). Both shapes are explode → groupBy keyed by
    * doc_id, so at 100 TB every shuffle is per-document local work with
    * map-side partial aggregation — no corpus-wide state. */
  def repetition(t: Tables): DataFrame = {
    val toks = t.documents.select(col("doc_id"),
      posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
    val wordStats = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_cnt"), sum("c").as("n_tok"))
    val bigrams = toks
      .withColumn("nxt",
        lead("tok", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), concat(col("tok"), lit(" "), col("nxt")).as("bg"))
    val bgStats = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct_bg"), sum("c").as("n_bg"))
    wordStats.join(bgStats, Seq("doc_id"))
      .select(col("doc_id"),
        round(col("top_cnt") / col("n_tok"), 4).as("top_word_frac"),
        round(lit(1.0) - col("n_distinct_bg") / col("n_bg"), 4)
          .as("dup_bigram_frac"))
  }
  val repetitionSql: String =
    """WITH tk AS (
         SELECT doc_id,
                unnest(string_split_regex(trim(text), '\s+')) AS tok,
                generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
         FROM documents),
       wc AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
       ws AS (SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_tok FROM wc GROUP BY 1),
       nx AS (SELECT doc_id, tok,
                     lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
              FROM tk),
       bgr AS (SELECT doc_id, tok || ' ' || nxt AS bg FROM nx WHERE nxt IS NOT NULL),
       bc AS (SELECT doc_id, bg, count(*) AS c FROM bgr GROUP BY 1, 2),
       bs AS (SELECT doc_id, count(*) AS n_distinct_bg, sum(c) AS n_bg FROM bc GROUP BY 1)
       SELECT ws.doc_id,
              round(top_cnt * 1.0 / n_tok, 4) AS top_word_frac,
              round(1.0 - n_distinct_bg * 1.0 / n_bg, 4) AS dup_bigram_frac
       FROM ws JOIN bs ON ws.doc_id = bs.doc_id"""

  // ------------------------------------------------------- PII scrubbing
  /** PII redaction — the scrub stage every training-data pipeline runs
    * before text ships: regex-match emails/phone numbers, count them,
    * and replace with typed placeholders. The synthetic corpus contains
    * no PII, so the query PLANTS a deterministic email + phone per
    * document (same pattern as the planted near-dups: the plumbing is
    * the deliverable, the planted data makes it verifiable), then
    * redacts and emits counts plus the scrubbed text for the oracle to
    * hash. Pure narrow projection — scan-speed at any corpus size. */
  def piiScrub(t: Tables): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    t.documents.select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("pii_text"))
      .select(col("doc_id"),
        regexp_count(col("pii_text"), lit(emailRe)).as("n_emails"),
        regexp_count(col("pii_text"), lit(phoneRe)).as("n_phones"),
        regexp_replace(regexp_replace(col("pii_text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("redacted"))
  }
  val piiScrubSql: String =
    """WITH p AS (
         SELECT doc_id,
                text || ' contact user' || doc_id || '@example.com or +1-555-' ||
                  lpad((doc_id % 10000)::VARCHAR, 4, '0') AS pii_text
         FROM documents)
       SELECT doc_id,
              len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
              len(regexp_extract_all(pii_text, '\+1-555-[0-9]{4}')) AS n_phones,
              regexp_replace(regexp_replace(pii_text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted
       FROM p"""

  // --------------------------------------------- benchmark decontamination
  /** Benchmark decontamination — the training-pipeline stage that flags
    * corpus documents CONTAINING n-grams from an evaluation suite (the
    * GPT-3 appendix-C / Pile-appendix discipline: a benchmark answer
    * leaking into pretraining data inflates downstream scores). The
    * asymmetry is the whole design: an eval suite is KBs-to-MBs against
    * a 100 TB corpus, so its distinct word 3-grams BROADCAST and the
    * corpus stream is probed in place — one pass over training text, one
    * per-doc aggregation, no corpus shuffle keyed on grams. Output is
    * (doc_id, n_contaminated) for contaminated docs only (the
    * rejection-sized verdict list, like [[Dedup.dedupIncremental]]).
    *
    * The oracle entry derives the "eval suite" deterministically from
    * the corpus itself (docs with doc_id % 97 == 0 stand in — testdata
    * ships no separate benchmark table); production calls
    * [[decontaminateAgainst]] with any (text) frame. */
  def decontaminate(t: Tables): DataFrame = decontaminateAgainst(
    t.documents.filter(col("doc_id") % 97 =!= 0),
    t.documents.filter(col("doc_id") % 97 === 0))

  /** Bloom-path twin of [[decontaminate]] with the SAME oracle SQL: the
    * bloom is only a prefilter and the exact verify join restores the
    * identical result, so the big-eval fallback's OUTPUT is pinned in
    * the DuckDB gate, not just its plan shape. */
  def decontaminateBloom(t: Tables): DataFrame = decontaminateAgainst(
    t.documents.filter(col("doc_id") % 97 =!= 0),
    t.documents.filter(col("doc_id") % 97 === 0),
    forcePath = Some("bloom"))

  /** Size-aware eval-suite probe (round-14 verdict Next #5: the eval
    * SIZE is an axis — suites run 1 to 10⁵ docs and the gram set grows
    * with them). Two physical paths, same result:
    *
    *  - `broadcast` — the distinct eval grams broadcast and the corpus
    *    gram stream hash-probes them in place: zero corpus shuffle, the
    *    right shape while the gram set fits a broadcast hash relation.
    *  - `bloom` — past that, a bloom filter over the eval grams (~1.8
    *    bytes/gram at fpp 1e-3 vs ~100 bytes/gram hashed-relation
    *    footprint, a ~50× reach extension) broadcasts instead; the
    *    corpus stream is probed in place and only survivors — true
    *    matches + 0.1% of the stream — pay the exact gram-keyed verify
    *    join, which is merge-PINNED (the eval side being too big to
    *    broadcast is the premise of this branch; AQE must not flip it
    *    back on compressed-size optimism, the llm/Dedup scale-cliff
    *    lesson).
    *
    *  `auto` decides from one small aggregate over the EVAL side only
    *  (eval ≪ corpus by design — the corpus is never pre-scanned);
    *  `graft.text.decontaminatePath` forces a path for A/Bs and
    *  `graft.text.decontaminateBroadcastBytes` (default 256 MB) sets
    *  the estimated-footprint cap. Measured on the eval axis at corpus
    *  100× in bench/SCALING_DEDUP.md. */
  private def decontaminateGrams(df: DataFrame) = df
    .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    .filter(size(col("w")) >= 3)
    .select(col("doc_id"), explode(Dedup.shingleOf(col("w"))).as("g"))

  /** The `auto` decision, exposed so the scale lane can assert WHICH
    * path a given suite size selects (tools/DedupScale's cap-crossing
    * leg); runs the same one-job eval-side stats the operator runs. */
  private[graft] def decontaminateAutoPath(eval: DataFrame): String = {
    val spark = eval.sparkSession
    val r = decontaminateGrams(eval).select(col("g")).distinct()
      .agg(count(lit(1)), coalesce(sum(length(col("g"))), lit(0L))).head()
    val est = 4L * r.getLong(1) + 64L * r.getLong(0)
    val cap = spark.conf
      .get("graft.text.decontaminateBroadcastBytes", (256L << 20).toString).toLong
    if (est <= cap) "broadcast" else "bloom"
  }

  def decontaminateAgainst(train: DataFrame, eval: DataFrame,
                           forcePath: Option[String] = None): DataFrame = {
    val spark = train.sparkSession
    def grams(df: DataFrame) = decontaminateGrams(df)
    val evalGrams = grams(eval).select(col("g")).distinct()
    // Materialized ONCE for the consumers that would otherwise re-derive
    // the distinct pipeline (auto's stats aggregate, auto-resolved
    // broadcast's build side, the bloom build, and the bloom path's
    // exact verify join each scan it); only a directly FORCED broadcast
    // stays a single fully-lazy plan and never touches this.
    // Construction of the bloom/auto variants therefore runs eval-side
    // jobs eagerly — the eval side is KBs-to-MBs by design.
    lazy val evalGramsMat = evalGrams.localCheckpoint(true)
    lazy val gramStats = {
      val r = evalGramsMat.agg(
        count(lit(1)), coalesce(sum(length(col("g"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val pathConf = forcePath.getOrElse(
      spark.conf.get("graft.text.decontaminatePath", "auto"))
    val path = pathConf match {
      case "auto" =>
        val (n, bytes) = gramStats
        // hashed-relation footprint ≈ payload + per-row UnsafeRow/bucket
        // overhead (measured ~4× raw UTF8 + ~64 B/row)
        val est = 4L * bytes + 64L * n
        val cap = spark.conf
          .get("graft.text.decontaminateBroadcastBytes", (256L << 20).toString).toLong
        if (est <= cap) "broadcast" else "bloom"
      case s @ ("broadcast" | "bloom") => s
      case other => throw new IllegalArgumentException(
        s"graft.text.decontaminatePath='$other' - expected auto|broadcast|bloom " +
        "(a typo here would silently A/B the wrong path)")
    }
    val matched =
      if (path == "broadcast") {
        // auto already paid the eval-side materialization for its stats
        // aggregate — broadcast the checkpointed grams in that case so
        // the distinct pipeline really runs once; only a directly
        // forced broadcast keeps the single fully-lazy plan.
        val rhs = if (pathConf == "auto") evalGramsMat else evalGrams
        grams(train).join(broadcast(rhs), "g")
      } else {
        val bf = evalGramsMat.stat.bloomFilter("g", math.max(1L, gramStats._1), 1e-3)
        val bfB = spark.sparkContext.broadcast(bf)
        grams(train)
          .filter(org.apache.spark.sql.graft.Shim.column(
            graft.functions.NativeExprs.BloomMightContain(
              org.apache.spark.sql.graft.Shim.expression(col("g")), bfB)))
          .hint("merge")
          .join(evalGramsMat.hint("merge"), "g")
      }
    matched
      .groupBy(col("doc_id"))
      // shingleOf is per-doc distinct, so this counts DISTINCT matched
      // grams — the containment evidence, invariant to repetition
      .agg(count(lit(1)).as("n_contaminated"))
  }
  val decontaminateSql: String =
    """WITH toks AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
       ), sh AS (
         SELECT doc_id,
                list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w)-1)]) AS gs
         FROM toks WHERE len(w) >= 3
       ), eg AS (
         SELECT DISTINCT unnest(gs) AS g FROM sh WHERE doc_id % 97 = 0
       ), tg AS (
         SELECT doc_id, unnest(gs) AS g FROM sh WHERE doc_id % 97 <> 0
       )
       SELECT doc_id, count(*) AS n_contaminated
       FROM tg JOIN eg USING (g)
       GROUP BY doc_id"""

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("text_repetition", repetition _, repetitionSql),
    ("text_token_stats", tokenStats _, tokenStatsSql),
    ("text_quality", quality _, qualitySql),
    ("text_langid", langId _, langIdSql),
    ("text_fingerprint", fingerprint _, fingerprintSql),
    ("text_cross_source_leak", crossSourceLeak _, crossSourceLeakSql),
    ("text_dedup_tokens", dedupTokens _, dedupTokensSql),
    ("text_dup_spans", dupSpans _, dupSpansSql),
    ("text_dup_span_excise", dupSpanExcise _, dupSpanExciseSql),
    ("text_dup_span_cut", dupSpanCut _, dupSpanCutSql),
    ("text_unigram_logprob", unigramLogprob _, unigramLogprobSql),
    ("text_pii_scrub", piiScrub _, piiScrubSql),
    ("text_decontaminate", decontaminate _, decontaminateSql),
    ("text_decontaminate_bloom", decontaminateBloom _, decontaminateSql),
    ("pipeline_corpus_build", corpusBuild _, corpusBuildSql))
}
