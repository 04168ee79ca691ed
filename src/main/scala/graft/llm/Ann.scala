package graft.llm

import graft.Tables
import graft.functions.NativeExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * Two tiers:
  *  - brute-force top-k: the exact baseline and DuckDB-checkable. The
  *    query set (a handful of probe vectors) broadcasts against the full
  *    corpus, so the "product" is a map-side scan — no shuffle of the
  *    corpus at any scale; per-query top-k via window rank.
  *  - IVF top-k: the 100 TB path. A fixed set of coarse centroids
  *    partitions the corpus into lists (one shuffle on list id, done
  *    once and reusable); each query probes only its nProbe nearest
  *    lists. Approximate vs brute force (recall-gated in LlmOpsSpec)
  *    but deterministic, so the oracle replays the exact IVF algorithm
  *    and hash-checks it (see [[annIvfSql]]).
  *
  * All arithmetic in double precision on both engines so rank order is
  * stable across Spark and DuckDB.
  */
object Ann {

  private val K = 5
  private val NQueries = 20 // probe vectors: vec_id < 20
  private val NProbe = 6
  /** Each corpus vector is REPLICATED into its NAssign nearest lists —
    * the standard IVF recall lever for vectors near list boundaries
    * (where a query's true neighbors live when it probes the adjacent
    * list). Storage cost NAssign×; recall at this corpus/codebook:
    * 0.94 @ k=5 vs 0.50 for single-assign probe-4 (tools/DbgIvf grid).
    * Candidates are deduped per (query, vector) BEFORE ranking, so a
    * twice-met vector cannot occupy two top-k slots. */
  private val NAssign = 3

  private def dot(a: Column, b: Column): Column =
    call_function("graft_vecdot", a, b)

  /** embeddings with L2 norm (dot via the native compiled kernel). */
  private def prepped(t: Tables): DataFrame = {
    NativeExprs.ensureRegistered(t.spark)
    t.embeddings.select(col("vec_id"), col("embedding").as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
  }

  // ------------------------------------- map-side centroid ranking (r19)
  /** The trained centroid set collapsed to ONE broadcastable row —
    * array of struct(c_id, ce, cnorm) sorted by c_id (collect_list order
    * is shuffle-dependent; the sort pins it). A fixed-k model artifact,
    * never corpus-proportional. */
  private def centsRow(cents: DataFrame): DataFrame =
    cents.agg(array_sort(collect_list(
      struct(col("c_id"), col("ce"), col("cnorm")))).as("cbs"))

  /** (csim desc, c_id asc) — the exact ordering every assign/probe
    * window used, as an array_sort comparator. NaN ranks FIRST (round-20
    * advice): the replaced row_number window ordered csim descending
    * with Spark's NaN-as-greatest semantics, while bare `>`/`<` are both
    * false for NaN and would silently fall through to the c_id
    * tie-break — a zero-norm embedding (csim = NaN) must assign the
    * same way it did pre-change. */
  private val bySimDesc: (Column, Column) => Column = (l, r) => {
    val (ls, rs) = (l.getField("csim"), r.getField("csim"))
    when(isnan(ls) && !isnan(rs), -1)
      .when(isnan(rs) && !isnan(ls), 1)
      .when(ls > rs, -1)
      .when(ls < rs, 1)
      .when(l.getField("c_id") < r.getField("c_id"), -1)
      .when(l.getField("c_id") > r.getField("c_id"), 1)
      .otherwise(0)
  }

  /** Top-`n` centroids per row by cosine, computed MAP-SIDE against the
    * broadcast codebook: ranking k=16 structs per row inside a HOF
    * instead of the crossJoin+row_number window (which shuffled corpus×k
    * rows carrying the full embedding arrays). The csim arithmetic
    * (graft_vecdot / (norm·cnorm)) and the (csim desc, c_id asc)
    * tie-break are unchanged expression-for-expression, so the
    * assignment is bit-identical. Used where the per-row csim VALUE is
    * needed downstream ([[kmeansTrain]]'s objective); the hot
    * c_id-only assignment paths use the compiled
    * [[NativeExprs.IvfAssign]] kernel instead ([[nativeTopIds]]) —
    * interpreted HOF ranking measured ~1.3× SLOWER than the codegen'd
    * join+window it replaced, while the native kernel beats both. */
  private def topCents(v: DataFrame, cents: DataFrame, n: Int,
                       eCol: String, normCol: String): DataFrame =
    v.crossJoin(broadcast(centsRow(cents)))
      .withColumn("tc", explode(slice(array_sort(
        transform(col("cbs"), c => struct(
          (dot(col(eCol), c.getField("ce")) /
            (col(normCol) * c.getField("cnorm"))).as("csim"),
          c.getField("c_id").as("c_id"))), bySimDesc), 1, n)))
      .drop("cbs")
      .withColumn("c_id", col("tc.c_id"))
      .withColumn("csim", col("tc.csim"))
      .drop("tc")

  /** The trained codebook COLLECTED (bounded: k ≤ 16 rows — the same
    * model-artifact discipline as [[graft.llm.Dedup.neardupEmbeddingOver]]'s
    * centroid literal): c_ids sorted ascending plus their vectors as
    * doubles (float elements widen exactly). */
  private def collectCents(cents: DataFrame): (Seq[Long], Seq[Seq[Double]]) = {
    val rows = cents.orderBy(col("c_id")).select(col("c_id"), col("ce")).collect()
    (rows.map(_.getLong(0)).toSeq,
      rows.map(_.getSeq[Any](1).map {
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d.doubleValue
        case x => x.asInstanceOf[Double]
      }.toSeq).toSeq)
  }

  /** Top-`n` centroid c_ids per row via the compiled
    * [[NativeExprs.IvfAssign]] kernel against the collected codebook
    * (optimization round 19): a pure projection — no crossJoin, no
    * window Exchange+Sort, no per-row interpreted HOF. IvfAssign ranks
    * by dot/cnorm, the same ordering as csim = dot/(norm·cnorm) (the
    * row's norm is a common positive factor — rank-invariant, the
    * documented ulp-tie caveat of [[annIvfSql]] applies unchanged), and
    * its strict `>` selection keeps the LOWEST index on ties = the old
    * (csim desc, c_id asc) window order, mapped back to real c_ids via
    * the sorted id literal (empty clusters may leave gaps). */
  private def nativeTopIds(v: DataFrame, cb: (Seq[Long], Seq[Seq[Double]]),
                           n: Int, eCol: String): DataFrame =
    v.withColumn("__aidx", explode(call_function("graft_ivf_assign",
        col(eCol), typedlit(cb._2), lit(math.min(n.toLong, cb._1.size.toLong).toInt))))
      .withColumn("c_id", element_at(typedlit(cb._1), col("__aidx") + 1))
      .drop("__aidx")

  // ------------------------------------------------- brute-force top-k
  def annBruteforce(t: Tables): DataFrame = annBruteforce(t, NQueries)

  /** `nQueries` generalization for the scale harness (tools/AnnScale):
    * the registered entry keeps the fixed probe set. */
  private[graft] def annBruteforce(t: Tables, nQueries: Long): DataFrame = {
    val v = prepped(t)
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"))
    val scored = broadcast(q).crossJoin(v)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rk"),
        round(col("cos"), 4).as("cos"))
  }
  val annBruteforceSql: String =
    s"""SELECT q_id, neighbor_id, rk, round(cos, 4) AS cos
       FROM (SELECT q.vec_id AS q_id, v.vec_id AS neighbor_id,
               list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]) AS cos,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]) DESC,
                          v.vec_id) AS rk
             FROM embeddings q, embeddings v
             WHERE q.vec_id < $NQueries AND q.vec_id <> v.vec_id) s
       WHERE rk <= $K"""

  // --------------------------------------------- trained codebooks
  /** Codebook size and Lloyd iterations shared by the embedding family
    * (IVF lists, bucketed near-dup blocking, k-means demos). FIXED
    * knobs: the model artifact is k rows regardless of corpus size. */
  private[llm] val CbK = 16
  private[llm] val CbIters = 2

  /** Overflow-safe deterministic spread hash used to pick k seed
    * vectors: reduce vec_id into [0, 2^31) FIRST so the LCG product
    * stays far below int64 overflow at any id (DuckDB raises on BIGINT
    * overflow where Spark wraps — bounding the intermediate keeps the
    * two engines bit-identical at multi-billion-row ids). */
  private[llm] def seedHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(1103515245L) + lit(12345L), lit(2147483647L))
  private[llm] def seedHashSql(id: String): String =
    s"(($id % 2147483648) * 1103515245 + 12345) % 2147483647"

  /** Distributed spherical k-means codebook trainer — the fixed-k model
    * artifact that retires the old stride-31 corpus sample (whose
    * driver collect grew as n/31 with the corpus). Seeds are the k
    * hash-smallest vectors (a distributed `orderBy.limit(k)` top-k —
    * never a corpus-proportional structure); each Lloyd round assigns
    * every vector to its nearest centroid by cosine (broadcast of the
    * k-row codebook × corpus, map-side) and recomputes centroids as
    * per-dimension means, one (c_id, dim) shuffle with partial aggs.
    *
    * Centroids are ROUNDED to 6 decimals after every update: the mean
    * is the only order-dependent float reduction in the loop, and
    * rounding at each fixed point makes the trained codebook
    * bit-identical across engines (and across Spark's own shuffle
    * orders), so DuckDB replays the whole training exactly — see
    * [[trainCodebookSql]] — and downstream oracle entries stay
    * hash-checkable. Same precedent as [[kmeansStep]]'s round-6 output.
    *
    * Empty clusters drop out (production reseeds from the farthest
    * vectors); input must carry (vec_id, e: array<double>, norm).
    * Reference: the reference trains its layout stats from data the
    * same way (axiom ConnectorMetadata.h:253-269 `TableLayout::sample`). */
  /** Bounded deterministic TRAINING sample: codebooks are trained on the
    * [[TrainN]] hash-smallest vectors (a distributed `orderBy.limit`
    * top-k), never the full corpus — the standard vector-index practice
    * (FAISS trains IVF/PQ codebooks on a bounded sample of the corpus).
    * This makes training cost O(TrainN · k · iters) — CONSTANT in corpus
    * size — while the assign/encode stages remain the only linear scans.
    * The sample is hash-ranked, so it is deterministic and the DuckDB
    * oracles replay it exactly; at the verification scales (≤ TrainN
    * vectors) the sample IS the corpus and nothing changes. */
  private[llm] val TrainN = 512

  /** The k hash-smallest rows with their rank 0..k-1 — the ONE
    * deterministic seed/sample picker behind [[trainSample]],
    * [[seedCents]] and the PQ seeds: a distributed `orderBy.limit(k)`
    * top-k (TakeOrderedAndProject); the row_number window runs over the
    * k surviving rows only. A change to the hash scheme lands in every
    * consumer at once AND must change the [[seedHashSql]] twins. */
  private[llm] def hashTopK(v: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("h"), col("vec_id"))
    v.withColumn("h", seedHash(col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .withColumn("rank", row_number().over(w) - 1)
      .drop("h")
  }

  private[llm] def trainSample(v: DataFrame): DataFrame =
    hashTopK(v, TrainN).drop("rank")

  /** The k hash-smallest vectors as seed centroids (c_id 0..k-1). */
  private[llm] def seedCents(v: DataFrame, k: Int = CbK): DataFrame =
    hashTopK(v, k).select(col("rank").cast("long").as("c_id"),
      col("e").as("ce"), col("norm").as("cnorm"))

  def trainCodebook(v: DataFrame, k: Int = CbK, iters: Int = CbIters): DataFrame = {
    // Lloyd rounds iterate over the BOUNDED sample (seedCents over the
    // sample equals seedCents over v: same ordering, same top-k).
    // Optimization round 19: assignment is map-side ([[topCents]] —
    // the per-vector argmax no longer shuffles sample×k rows), and the
    // per-iteration localCheckpoints are gone: each one forced an eager
    // job per Lloyd round over a 512-row sample, so training paid
    // 2·iters scheduler round-trips for microseconds of compute. The
    // rounds now fuse into the single final checkpoint (kept — the
    // trained codebook is consumed by several downstream subtrees and
    // must be computed once).
    val vs = trainSample(v).localCheckpoint(true)
    var cents = seedCents(vs, k)
    for (_ <- 1 to iters) {
      cents = nativeTopIds(vs, collectCents(cents), 1, "e")
        .select(col("c_id"), posexplode(col("e")))
        .groupBy(col("c_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("c_id"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => round(s.getField("m"), 6)).as("ce"))
        .withColumn("cnorm", sqrt(dot(col("ce"), col("ce"))))
    }
    cents.localCheckpoint(true)
  }

  /** DuckDB replay of [[trainCodebook]]: the unrolled CTE chain
    * (seed pick + `iters` assign/mean rounds, round-6 at each update).
    * Assumes a CTE `v(vec_id, e)` is in scope; the trained codebook is
    * `cb_t$iters(c_id, ce)`. */
  def trainCodebookSql(k: Int = CbK, iters: Int = CbIters): String = {
    val seed =
      s"""cbsmp AS (
         SELECT vec_id, e FROM (
           SELECT vec_id, e,
                  row_number() OVER (ORDER BY ${seedHashSql("vec_id")}, vec_id) AS srk
           FROM v) z WHERE srk <= $TrainN),
       cb_t0 AS (
         SELECT e AS ce,
                row_number() OVER (ORDER BY ${seedHashSql("vec_id")}, vec_id) - 1 AS c_id
         FROM cbsmp QUALIFY c_id < $k)"""
    val steps = (1 to iters).map { i =>
      s"""asg_t$i AS (
           SELECT vec_id, e, c_id FROM (
             SELECT v.vec_id, v.e, c.c_id,
                    row_number() OVER (PARTITION BY v.vec_id
                      ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.c_id) AS r
             FROM cbsmp v CROSS JOIN cb_t${i - 1} c) x WHERE r = 1),
         cb_t$i AS (
           SELECT c_id, list(round(m, 6) ORDER BY pos) AS ce FROM (
             SELECT c_id, pos, avg(x) AS m FROM (
               SELECT c_id, unnest(range(1, len(e) + 1)) AS pos, unnest(e) AS x
               FROM asg_t$i) d GROUP BY 1, 2) g GROUP BY 1)"""
    }
    (seed +: steps).mkString(",\n       ")
  }

  // ------------------------------------------------------- IVF top-k
  /** Coarse centroids: the [[trainCodebook]] fixed-k spherical-k-means
    * codebook (deterministic, round-6 fixed points, so the oracle
    * replays the training exactly). */
  def annIvf(t: Tables): DataFrame = annIvf(t, NProbe)

  /** `nProbe` generalization; `Int.MaxValue` probes every list, which
    * makes IVF EXACT: every vector appears in at least one probed list
    * (NAssign replicates each into its 3 nearest — see [[NAssign]]) and
    * the dropDuplicates below collapses the replicas, so probing all
    * lists scores the whole corpus exactly once — that variant is
    * registered with the brute-force oracle as a hash-checked proof of
    * the IVF partition/probe plumbing, while the approximate default
    * stays recall-gated in LlmOpsSpec. (Do NOT remove the dedup on the
    * strength of a single-assign argument — multi-assign made that
    * false.) */
  def annIvf(t: Tables, nProbe: Int): DataFrame = annIvf(t, nProbe, NQueries, CbK)

  /** `nQueries`/`nLists` generalization for the scale harness
    * (tools/AnnScale): production IVF sizes the codebook with the corpus
    * (~sqrt N lists); the registered entries keep the fixture-sized
    * 16-list codebook and fixed probe set. */
  private[graft] def annIvf(t: Tables, nProbe: Int, nQueries: Long, nLists: Int): DataFrame = {
    val v = prepped(t)
    val cents = trainCodebook(v, nLists)
    // Assign every vector to its NAssign nearest centroids → replicated
    // inverted lists (multi-assign; see [[NAssign]]). Compiled map-side
    // ranking against the collected codebook ([[nativeTopIds]]) — no
    // exchange, no window.
    val cb = collectCents(cents)
    val lists = nativeTopIds(v, cb, NAssign, "e")
      .select(col("c_id").as("list_id"), col("vec_id"), col("e"), col("norm"))
    // Each query probes its nProbe nearest lists only.
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"))
    val probes = nativeTopIds(q, cb, nProbe, "qe")
      .select(col("q_id"), col("qe"), col("qnorm"), col("c_id").as("list_id"))
    // Score only within probed lists; dedup (query, vector) BEFORE the
    // ranking window so a replicated vector fills one top-k slot, not
    // NAssign of them; then per-query top-k.
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    probes.join(lists, "list_id")
      .filter(col("q_id") =!= col("vec_id"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnorm") * col("norm")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rk"),
        round(col("cos"), 4).as("cos"))
  }

  /** The registered-`nProbe` IVF result is *deterministic* — coarse
    * assignment, probe selection, and candidate ranking are all pure
    * double arithmetic with explicit tie-breaks — so DuckDB can replay
    * the exact same algorithm and the approximate entry is still
    * rows+schema+hash-checkable. The oracle below IS that replay (same
    * shape as [[kmeansStepSql]]'s assignment step). Recall-vs-brute-force
    * stays a separate quality gate in LlmOpsSpec: hash equality proves
    * the IVF semantics (partition/probe/rank), the recall floor judges
    * its approximation quality.
    *
    * Cross-engine tie note: ranking compares unrounded doubles computed
    * by different kernels (graft_vecdot vs list_cosine_similarity), so
    * two CANDIDATES of one query whose cosines differ by less than the
    * accumulated ulp error (~1e-15) could in principle rank differently
    * across engines. On this corpus the closest same-query candidate gap
    * is orders of magnitude wider, and the data is fixed (seed 42), so
    * the gate is deterministic; if regenerated data ever flaked it,
    * round the sims to one fixed precision before ranking on BOTH
    * engines. */
  val annIvfSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       ${trainCodebookSql()},
       c AS (SELECT c_id, ce FROM cb_t$CbIters),
       a AS (SELECT v.vec_id, c.c_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.c_id) AS arank
             FROM v CROSS JOIN c),
       lists AS (SELECT vec_id, c_id AS list_id FROM a WHERE arank <= $NAssign),
       q AS (SELECT vec_id AS q_id, e FROM v WHERE vec_id < $NQueries),
       pr AS (SELECT q.q_id, c.c_id AS list_id,
                row_number() OVER (
                  PARTITION BY q.q_id
                  ORDER BY list_cosine_similarity(q.e, c.ce) DESC, c.c_id) AS prank
              FROM q CROSS JOIN c),
       cand AS (
         SELECT DISTINCT p.q_id, l.vec_id
         FROM (SELECT q_id, list_id FROM pr WHERE prank <= $NProbe) p
         JOIN lists l ON p.list_id = l.list_id
         WHERE l.vec_id <> p.q_id),
       scored AS (
         SELECT cd.q_id, cd.vec_id AS neighbor_id,
                list_cosine_similarity(qv.e, nv.e) AS cos,
                row_number() OVER (
                  PARTITION BY cd.q_id
                  ORDER BY list_cosine_similarity(qv.e, nv.e) DESC, cd.vec_id) AS rk
         FROM cand cd
         JOIN v qv ON qv.vec_id = cd.q_id
         JOIN v nv ON nv.vec_id = cd.vec_id)
       SELECT q_id, neighbor_id, rk, round(cos, 4) AS cos
       FROM scored WHERE rk <= $K"""

  // ------------------------------------------------- k-means (IVF train)
  /** One exact Lloyd iteration of the k-means that trains IVF coarse
    * centroids (the single-step, introspectable twin of
    * [[trainCodebook]], which now feeds [[annIvf]] and the embedding
    * near-dup): assign every vector to its nearest seed (cosine), then
    * recompute each centroid as the element-wise mean of its list. Emits
    * per-cluster population and the first two centroid coordinates.
    *
    * Scale: assignment is a broadcast(seeds) × corpus map-side scan; the
    * mean is one shuffle on (cluster, dim) with map-side partial sums —
    * the same two-stage shape at any corpus size. Full training = this
    * step iterated (driver loop like Corpus.dedupClusterCC, converging on
    * centroid drift). */
  def kmeansStep(t: Tables): DataFrame = {
    NativeExprs.ensureRegistered(t.spark)
    val base = t.embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val seeds = seedCents(base)
    // Compiled map-side nearest-seed assignment ([[nativeTopIds]]): same
    // ranking and tie-break as the old crossJoin+window, no exchange.
    val assigned = nativeTopIds(base, collectCents(seeds), 1, "e")
      .select(col("c_id"), col("vec_id"), col("e"))
    val dimMeans = assigned
      .select(col("c_id"), posexplode(col("e")))
      .groupBy(col("c_id"), col("pos"))
      .agg(avg(col("col")).as("m"))
    val newCents = dimMeans.groupBy(col("c_id"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("ce"))
    val counts = assigned.groupBy(col("c_id")).agg(count(lit(1)).as("n_assigned"))
    newCents.join(counts, "c_id")
      .select(col("c_id"), col("n_assigned"),
        round(element_at(col("ce"), 1), 6).as("c1"),
        round(element_at(col("ce"), 2), 6).as("c2"))
  }
  val kmeansStepSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       c AS (SELECT e AS ce,
               row_number() OVER (ORDER BY ${seedHashSql("vec_id")}, vec_id) - 1 AS c_id
             FROM v QUALIFY c_id < $CbK),
       a AS (
         SELECT v.vec_id, c.c_id, v.e,
                row_number() OVER (
                  PARTITION BY v.vec_id
                  ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.c_id) AS arank
         FROM v CROSS JOIN c),
       asg AS (SELECT vec_id, c_id, e FROM a WHERE arank = 1),
       d AS (SELECT c_id, unnest(range(1, len(e) + 1)) AS pos, unnest(e) AS x FROM asg),
       m AS (SELECT c_id, pos, avg(x) AS m FROM d GROUP BY 1, 2),
       nc AS (SELECT c_id, list(m ORDER BY pos) AS ce FROM m GROUP BY 1),
       n AS (SELECT c_id, count(*) AS n_assigned FROM asg GROUP BY 1)
       SELECT nc.c_id, n.n_assigned,
              round(ce[1], 6) AS c1, round(ce[2], 6) AS c2
       FROM nc JOIN n ON nc.c_id = n.c_id"""

  /** Full spherical k-means training: [[kmeansStep]]'s assign/mean cycle
    * iterated with the same driver-loop pattern as Corpus.dedupClusterCC
    * (per-round localCheckpoint, data-parallel rounds, driver sees only
    * the scalar objective). Returns the per-iteration objective
    * Σ cos(vector, assigned centroid) — for spherical k-means (cosine
    * assignment + mean update) it is non-decreasing, which the test
    * asserts. Clusters that empty drop out (documented; production
    * reseeds them from the farthest vectors). */
  def kmeansTrain(t: Tables, iters: Int = 4): Seq[Double] = {
    NativeExprs.ensureRegistered(t.spark)
    // L2-normalize the inputs FIRST: for fixed assignments, the
    // maximizer of Σ cos(x, c) over the centroid direction is Σ x/|x|
    // normalized — the plain mean of UNnormalized vectors is not, so the
    // non-decreasing-objective claim below would be false for clusters
    // with heterogeneous norms (round-17 review). On unit vectors the
    // plain mean points along the true maximizer (cosine ignores the
    // centroid's scale), making this genuine spherical k-means.
    val base = t.embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("raw"))
      .withColumn("nrm0", sqrt(dot(col("raw"), col("raw"))))
      .select(col("vec_id"),
        transform(col("raw"), x => x / greatest(col("nrm0"), lit(java.lang.Double.MIN_NORMAL))).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
      .localCheckpoint(true)
    var cents = seedCents(base).localCheckpoint(true)
    val objs = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      // Map-side assignment ([[topCents]]); the per-iteration checkpoint
      // stays — `assigned` feeds both the objective action and the update.
      val assigned = topCents(base, cents, 1, "e", "norm")
        .select(col("c_id"), col("e"), col("csim"))
        .localCheckpoint(true)
      objs += assigned.agg(sum(col("csim"))).head().getDouble(0)
      cents = assigned
        .select(col("c_id"), posexplode(col("e")))
        .groupBy(col("c_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("c_id"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("ce"))
        .withColumn("cnorm", sqrt(dot(col("ce"), col("ce"))))
        .localCheckpoint(true)
    }
    objs.result()
  }

  // ------------------------------------------- sign-LSH near-dup (exact)
  /** Embedding near-dup via random-hyperplane (sign) LSH — the 100 TB
    * scale path for cosine thresholds where dedup actually operates
    * (≥0.9): vectors meet only inside same-(table, bucket) groups, then
    * exact cosine verifies every candidate (precision 1 by construction).
    *
    * The synthetic corpus has no true near-dups (max off-diagonal cosine
    * ≈ 0.5), so the query PLANTS them: a +0.03-shifted copy of every
    * vector under id -(vec_id+1) — negative, so planted ids can never
    * collide with real ids at ANY corpus size — (cos ≈ 0.96-0.98 to its
    * original, ≤ 0.6 to everything else)
    * — pure double arithmetic DuckDB reproduces exactly, which makes this
    * LSH path hash-checkable against an exact all-pairs oracle. 16
    * tables × 8 bits gives per-pair miss probability (1-p^8)^16 ≈ 2e-5
    * at cos 0.96 (p = 1-θ/π ≈ 0.92); empirically recall 1.0 at sf0.01
    * and sf0.1. The bucket stream carries only (vec_id, bucket) — the
    * vectors join back in after candidate-pair dedup. */
  def annSignLshNearDup(t: Tables): DataFrame = {
    NativeExprs.ensureRegistered(t.spark)
    val base = t.embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val pert = base.select((-(col("vec_id") + 1)).as("vec_id"),
      transform(col("e"), x => x + lit(0.03)).as("e"))
    val corpus = base.unionByName(pert)
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val buckets = corpus.select(col("vec_id"),
      explode(call_function("graft_signlsh", col("e"), lit(16), lit(8))).as("bucket"))
    val cands = buckets.as("x")
      .join(buckets.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    cands
      .join(corpus.select(col("vec_id").as("vec_a"), col("e").as("ea"), col("norm").as("na")), "vec_a")
      .join(corpus.select(col("vec_id").as("vec_b"), col("e").as("eb"), col("norm").as("nb")), "vec_b")
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.9)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
  }
  val annSignLshNearDupSql: String =
    """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       pert AS (SELECT -(vec_id + 1) AS vec_id, list_transform(e, x -> x + 0.03) AS e FROM base),
       corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert)
       SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              round(list_cosine_similarity(a.e, b.e), 4) AS cos
       FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.e, b.e) >= 0.9"""

  // -------------------------------------------------- int8 quantization
  /** Per-vector symmetric int8 quantization — the storage/serving form
    * of an embedding corpus (4x smaller, SIMD-dot-friendly). Emits the
    * per-vector scale and the reconstruction error so the quality loss
    * is measurable in-pipeline. All list arithmetic; DuckDB recomputes
    * identically. */
  def quantizeInt8(t: Tables): DataFrame =
    t.embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("scale", greatest(aggregate(col("e"), lit(0.0),
        (a, x) => greatest(a, abs(x))), lit(1e-12)) / 127.0)
      .withColumn("q", transform(col("e"), x => round(x / col("scale")).cast("int")))
      .withColumn("mae", aggregate(
        zip_with(col("e"), col("q"), (x, qv) => abs(x - qv.cast("double") * col("scale"))),
        lit(0.0), (a, x) => a + x) / size(col("e")))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        round(col("mae"), 6).as("mae"),
        element_at(col("q"), 1).as("q1"), element_at(col("q"), 2).as("q2"))
  val quantizeInt8Sql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       s AS (SELECT vec_id, e,
               greatest(list_max(list_transform(e, x -> abs(x))), 1e-12) / 127.0 AS scale
             FROM v),
       q AS (SELECT vec_id, e, scale,
               list_transform(e, x -> round(x / scale)::INT) AS qe
             FROM s)
       SELECT vec_id, round(scale, 6) AS scale,
         round(list_sum(list_transform(range(1, len(e) + 1),
                 i -> abs(e[i] - qe[i]::DOUBLE * scale))) / len(e), 6) AS mae,
         qe[1] AS q1, qe[2] AS q2
       FROM q"""

  // ------------------------------------------- product quantization (PQ)
  /** Product-quantization encode — the serving-side compression between
    * int8 (4×) and binary hashing: split each vector into M=8 subvectors
    * of 8 dims, encode each against a K=16-entry per-subspace codebook
    * (argmin L2, ties to the lower code) → 8 codes ≈ 8 bytes/vector
    * (32× smaller), with the per-vector reconstruction error emitted so
    * quality loss is measurable in-pipeline. Codebooks are TRAINED
    * per-subspace L2 k-means ([[pqCbTrained]] — fixed 8×16 model
    * artifact, round-6 fixed points); the encode is relational (explode
    * subspaces × broadcast codebook → argmin), so the DuckDB oracle
    * replays training and encode exactly.
    *
    * Scale: the codebook is a fixed-size broadcast model artifact; the
    * encode stream carries (vec_id, m, 8 doubles) and one groupBy on
    * vec_id reassembles codes — linear, no corpus product. */
  private val PqM = 8; private val PqK = 16; private val PqD = 8

  /** (vec_id, m, sv): the corpus exploded into per-subspace vectors. */
  private def pqSub(v: DataFrame): DataFrame =
    v.select(col("vec_id"), explode(transform(sequence(lit(0), lit(PqM - 1)),
        m => struct(m.as("m"), slice(col("e"), m * PqD + 1, lit(PqD)).as("sv")))).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** The per-subspace PQ codebook COLLECTED (bounded: ≤ M·K = 128 rows —
    * a fixed-size model artifact, same discipline as [[collectCents]]),
    * sorted (m, c_idx) so the kernel's strict-< scan reproduces the
    * (dist asc, c_idx asc) tie-break. */
  private def collectPqCb(cb: DataFrame): Array[(Int, Int, Array[Double])] =
    cb.orderBy(col("m"), col("c_idx")).select(col("m"), col("c_idx"), col("csv"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))

  /** Column of per-subspace argmin codes+abserr via the compiled
    * [[NativeExprs.PqEncodeCodes]] kernel — replaces the
    * explode→broadcast-join→row_number-window chain (which shuffled
    * corpus×M×K rows) with a pure projection. */
  private def pqCodes(e: Column, cbArr: Array[(Int, Int, Array[Double])]): Column =
    org.apache.spark.sql.graft.Shim.column(
      NativeExprs.PqEncodeCodes(
        org.apache.spark.sql.graft.Shim.expression(e), cbArr, PqM, PqD))

  /** (c_idx, m, csv): per-subspace PQ codebooks TRAINED with classic
    * Lloyd L2 k-means (all 8 subspaces iterate inside one DataFrame
    * job, grouped by m). Seeds are the hash-smallest [[PqK]] vectors'
    * subvectors; every update rounds to 6 decimals so the trained
    * codebook is a cross-engine fixed point exactly like
    * [[trainCodebook]] — [[pqTrainSql]] is the DuckDB replay. The
    * codebook stays a fixed 8×16-row broadcast model artifact. */
  private def pqCbTrained(v: DataFrame, iters: Int = CbIters): DataFrame = {
    // Bounded training sample, like [[trainCodebook]]: Lloyd rounds cost
    // O(TrainN), not O(corpus); seeds are unchanged (same top-PqK).
    val vs = trainSample(v.select(col("vec_id"), col("e"))).localCheckpoint(true)
    val seeds = hashTopK(vs, PqK).withColumn("c_idx", col("rank").cast("int"))
    var cb = seeds.select(col("c_idx"), explode(transform(sequence(lit(0), lit(PqM - 1)),
        m => struct(m.as("m"), slice(col("e"), m * PqD + 1, lit(PqD)).as("csv")))).as("s"))
      .select(col("c_idx"), col("s.m").as("m"), col("s.csv").as("csv"))
    // Optimization round 19: compiled map-side argmin ([[pqCodes]])
    // instead of the explode+join+window shuffle; the winner's own
    // subvector re-slices from e for the mean update (same values the
    // old pqSub rows carried).
    for (_ <- 1 to iters) {
      val cbArr = collectPqCb(cb)
      cb = vs.select(col("e"), explode(pqCodes(col("e"), cbArr)).as("b"))
        .select(col("b.m").as("m"), col("b.c_idx").as("c_idx"),
          posexplode(slice(col("e"), col("b.m") * PqD + 1, lit(PqD))))
        .groupBy(col("m"), col("c_idx"), col("pos"))
        .agg(avg(col("col")).as("mu"))
        .groupBy(col("m"), col("c_idx"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("mu")))),
          s => round(s.getField("mu"), 6)).as("csv"))
    }
    cb.localCheckpoint(true)
  }

  /** DuckDB replay of [[pqCbTrained]] (seed subvectors + `iters` L2
    * assign/mean rounds). Assumes CTEs `v(vec_id, e)` and
    * `sub(vec_id, m, sv)` in scope; the codebook is
    * `cbsub_t$iters(m, c_idx, csv)`. */
  def pqTrainSql(iters: Int = CbIters): String = {
    val seed =
      s"""pqsmp AS (
         SELECT vec_id FROM (
           SELECT vec_id,
                  row_number() OVER (ORDER BY ${seedHashSql("vec_id")}, vec_id) AS srk
           FROM v) z WHERE srk <= $TrainN),
       pqsub AS (SELECT s.* FROM sub s JOIN pqsmp USING (vec_id)),
       cq AS (SELECT e,
                row_number() OVER (ORDER BY ${seedHashSql("vec_id")}, vec_id) - 1 AS c_idx
              FROM v QUALIFY c_idx < $PqK),
       cbsub_t0 AS (SELECT c_idx, m, e[m*8+1 : m*8+8] AS csv
                    FROM cq, unnest(range(0, 8)) AS t(m))"""
    val steps = (1 to iters).map { i =>
      s"""pasg_t$i AS (
           SELECT m, c_idx, sv FROM (
             SELECT s.m, s.sv, c.c_idx,
                    row_number() OVER (PARTITION BY s.vec_id, s.m
                      ORDER BY list_sum(list_transform(range(1, 9),
                        j -> (s.sv[j] - c.csv[j]) * (s.sv[j] - c.csv[j]))), c.c_idx) AS rn
             FROM pqsub s JOIN cbsub_t${i - 1} c ON s.m = c.m) x WHERE rn = 1),
         cbsub_t$i AS (
           SELECT m, c_idx, list(round(mu, 6) ORDER BY pos) AS csv FROM (
             SELECT m, c_idx, pos, avg(x) AS mu FROM (
               SELECT m, c_idx, unnest(range(1, len(sv) + 1)) AS pos, unnest(sv) AS x
               FROM pasg_t$i) d GROUP BY 1, 2, 3) g GROUP BY 1, 2)"""
    }
    (seed +: steps).mkString(",\n       ")
  }

  /** L2-NORMALIZED corpus for the PQ family: on the unit sphere L2 and
    * cosine agree, so ADC's squared-distance tables rank the same way
    * the cosine-serving stack does. */
  private def pqCorpus(t: Tables): DataFrame = {
    NativeExprs.ensureRegistered(t.spark)
    t.embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e0"))
      .withColumn("nrm", sqrt(call_function("graft_vecdot", col("e0"), col("e0"))))
      .select(col("vec_id"), transform(col("e0"), x => x / col("nrm")).as("e"))
  }

  def pqEncode(t: Tables): DataFrame = {
    val v = pqCorpus(t)
    // Fully map-side (round 19): codes and mae assemble per row from the
    // compiled [[pqCodes]] array (m-ascending — the order the old
    // array_sort(collect_list) produced; the mae sum accumulates in the
    // same m order the old per-(vec,m)-row sum did) — the encode stage
    // now has ZERO exchanges.
    val bs = pqCodes(col("e"), collectPqCb(pqCbTrained(v)))
    v.withColumn("bs", bs)
      .select(col("vec_id"),
        concat_ws(",", transform(col("bs"),
          b => b.getField("c_idx").cast("string"))).as("codes"),
        round(aggregate(col("bs"), lit(0.0), (acc, b) =>
          acc + b.getField("abserr")) / (PqM * PqD), 6).as("mae"))
  }
  val pqEncodeSql: String =
    s"""WITH v AS (SELECT vec_id,
              list_transform(embedding::DOUBLE[], x -> x /
                sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS e
            FROM embeddings),
       sub AS (SELECT vec_id, m, e[m*8+1 : m*8+8] AS sv
               FROM v, unnest(range(0, 8)) AS t(m)),
       ${pqTrainSql()},
       cbsub AS (SELECT c_idx, m, csv FROM cbsub_t$CbIters),
       scored AS (
         SELECT s.vec_id, s.m, c.c_idx,
                list_sum(list_transform(range(1, 9),
                  i -> (s.sv[i] - c.csv[i]) * (s.sv[i] - c.csv[i]))) AS dist,
                list_sum(list_transform(range(1, 9),
                  i -> abs(s.sv[i] - c.csv[i]))) AS abserr
         FROM sub s JOIN cbsub c ON s.m = c.m),
       best AS (
         SELECT vec_id, m, c_idx, abserr,
                row_number() OVER (PARTITION BY vec_id, m
                                   ORDER BY dist, c_idx) AS rn
         FROM scored)
       SELECT vec_id,
              array_to_string(list(c_idx ORDER BY m), ',') AS codes,
              round(sum(abserr) / 64, 6) AS mae
       FROM best WHERE rn = 1 GROUP BY vec_id"""

  /** PQ serving read path pairing with [[pqEncode]] — the standard
    * two-stage ANN: (1) ADC prefilter: per query, precompute the M×K
    * table of exact subspace distances to every codebook entry (a tiny
    * broadcast), score every ENCODED vector by summing M table lookups
    * (original vectors untouched — the corpus is 8 codes/vector during
    * the scan), keep the top [[AdcRerank]]; (2) exact rerank: the
    * original vectors join back for the prefiltered candidates only
    * (queries×AdcRerank rows, never the corpus) and exact cosine picks
    * the final top-k. Approximate but fully deterministic, so the
    * DuckDB oracle replays both stages; recall vs exact brute force is
    * gated separately in LlmOpsSpec.
    *
    * Scale: codes stream linearly; one groupBy on (q_id, vec_id) sums
    * the lookups; the rerank join touches a constant number of rows per
    * query. No corpus product, no corpus-wide vector shuffle. */
  private val AdcRerank = 100 // ADC prefilter width fed to exact rerank

  /** The per-query ADC distance table COLLECTED and flattened for
    * map-side lookup (optimization round 19): qdist doubles are computed
    * by the SAME sqDist expressions as before and only then collected,
    * so every table value is bit-identical; the table is bounded —
    * NQueries×M×K rows, a per-probe-set model artifact like the
    * codebooks. Returns (sorted q_ids, flat table indexed
    * [qi·M·K + m·K + c_idx]). */
  private def collectDtab(v: DataFrame, cb: DataFrame): (Seq[Long], Seq[Double]) = {
    val rows = pqSub(v.filter(col("vec_id") < NQueries))
      .withColumnRenamed("vec_id", "q_id").withColumnRenamed("sv", "qsv")
      .join(broadcast(cb), "m")
      .withColumn("qdist", sqDist(col("qsv"), col("csv")))
      .select(col("q_id"), col("m"), col("c_idx"), col("qdist"))
      .collect()
    val qids = rows.map(_.getLong(0)).distinct.sorted.toSeq
    val qIdx = qids.zipWithIndex.toMap
    val flat = Array.fill(qids.size * PqM * PqK)(Double.NaN)
    rows.foreach { r =>
      flat(qIdx(r.getLong(0)) * PqM * PqK + r.getInt(1) * PqK + r.getInt(2)) =
        r.getDouble(3)
    }
    (qids, flat.toSeq)
  }

  /** Σ_m dtab[qi, m, codes(m)] accumulated m-ascending — the exact
    * order the old enc⋈dtab groupBy summed in (enc rows stream
    * m-ascending into the partial agg), rounded to the same 9 digits
    * before ranking. The positional lookup assumes pqCodes emitted
    * exactly PqM entries; PqEncodeCodes emits no element for a subspace
    * with no surviving codebook entry, which would silently shift every
    * later subspace's lookup to the wrong dtab cell — so a short codes
    * array fails LOUDLY instead (round-20 advice; the invariant that
    * every m keeps ≥ 1 code holds after training, this makes a future
    * violation visible). */
  private def adcFold(qi: Column, codes: Column, flatLit: Column): Column =
    round(when(size(codes) === PqM,
      aggregate(sequence(lit(0), lit(PqM - 1)), lit(0.0),
        (acc, m) => acc + element_at(flatLit,
          qi * (PqM * PqK) + m * PqK + element_at(codes, m + 1) + 1)))
      .otherwise(raise_error(concat(
        lit(s"adc: pq codes array must have exactly $PqM entries, got "),
        size(codes).cast("string")))), 9)

  def annPqAdc(t: Tables): DataFrame = {
    val v = pqCorpus(t)
    val cb = pqCbTrained(v) // trained once, shared by encode + query tables
    val cbArr = collectPqCb(cb)
    // Stage 1: ADC prefilter — rank every encoded vector by summed
    // table lookups, keep the top AdcRerank per query. Round 19: the
    // codes come from the compiled [[pqCodes]] kernel and the per-query
    // table is a collected literal ([[collectDtab]]), so scoring is a
    // pure map-side fold + explode — the old enc⋈broadcast(dtab) join
    // and its corpus×M×queries groupBy exchange are gone. adc is an
    // 8-term double sum whose accumulation order is engine-dependent
    // (Spark vs DuckDB group order); round to a fixed precision BEFORE
    // the rank so ulp-close candidates at the prk cutoff cannot order
    // differently across engines.
    val (qids, flat) = collectDtab(v, cb)
    val flatLit = typedlit(flat)
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    val prefiltered = v
      .select(col("vec_id"),
        transform(pqCodes(col("e"), cbArr), b => b.getField("c_idx")).as("codes"))
      .select(col("vec_id"), col("codes"),
        explode(sequence(lit(0), lit(qids.size - 1))).as("qi"))
      .withColumn("q_id", element_at(typedlit(qids), col("qi") + 1))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adc", adcFold(col("qi"), col("codes"), flatLit))
      .withColumn("prk", row_number().over(wAdc))
      .filter(col("prk") <= AdcRerank)
      .select(col("q_id"), col("vec_id"))
    // Stage 2: exact rerank — original vectors join back ONLY for the
    // prefiltered candidates (queries×AdcRerank rows, not the corpus).
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    prefiltered
      .join(v.select(col("vec_id").as("q_id"), col("e").as("qe")), "q_id")
      .join(v, "vec_id")
      .withColumn("cos", call_function("graft_vecdot", col("qe"), col("e")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rk"),
        round(col("cos"), 4).as("cos"))
  }
  val annPqAdcSql: String =
    s"""WITH v AS (SELECT vec_id,
              list_transform(embedding::DOUBLE[], x -> x /
                sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS e
            FROM embeddings),
       sub AS (SELECT vec_id, m, e[m*8+1 : m*8+8] AS sv
               FROM v, unnest(range(0, 8)) AS t(m)),
       ${pqTrainSql()},
       cbsub AS (SELECT c_idx, m, csv FROM cbsub_t$CbIters),
       scored AS (
         SELECT s.vec_id, s.m, c.c_idx,
                list_sum(list_transform(range(1, 9),
                  i -> (s.sv[i] - c.csv[i]) * (s.sv[i] - c.csv[i]))) AS dist
         FROM sub s JOIN cbsub c ON s.m = c.m),
       enc AS (
         SELECT vec_id, m, c_idx FROM (
           SELECT vec_id, m, c_idx,
                  row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY dist, c_idx) AS rn
           FROM scored) x WHERE rn = 1),
       dtab AS (
         SELECT s.vec_id AS q_id, s.m, c.c_idx,
                list_sum(list_transform(range(1, 9),
                  i -> (s.sv[i] - c.csv[i]) * (s.sv[i] - c.csv[i]))) AS qdist
         FROM sub s JOIN cbsub c ON s.m = c.m
         WHERE s.vec_id < $NQueries),
       pre AS (
         SELECT q_id, vec_id FROM (
           SELECT d.q_id, e.vec_id, round(sum(d.qdist), 9) AS adc,
                  row_number() OVER (PARTITION BY d.q_id
                                     ORDER BY round(sum(d.qdist), 9), e.vec_id) AS prk
           FROM enc e JOIN dtab d ON e.m = d.m AND e.c_idx = d.c_idx
           WHERE d.q_id <> e.vec_id
           GROUP BY d.q_id, e.vec_id) x WHERE prk <= 100),
       rer AS (
         SELECT p.q_id, p.vec_id AS neighbor_id,
                list_dot_product(qv.e, nv.e) AS cos
         FROM pre p
         JOIN v qv ON qv.vec_id = p.q_id
         JOIN v nv ON nv.vec_id = p.vec_id)
       SELECT q_id, neighbor_id,
              row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk,
              round(cos, 4) AS cos
       FROM rer QUALIFY rk <= $K"""

  // ------------------------------------------------ IVF + PQ (combined)
  /** The full serving configuration — IVF coarse pruning composed with
    * PQ/ADC scoring and exact rerank, the architecture every production
    * vector index (FAISS IVFPQ) deploys at billion-vector scale:
    *
    *  1. coarse: queries probe their nProbe nearest coarse centroids;
    *     only those lists' members become candidates (IVF prunes the
    *     corpus to a fraction before anything is scored);
    *  2. ADC: candidates are scored from their 8-byte PQ codes via the
    *     per-query distance table — the original vectors are NOT read;
    *  3. rerank: the top [[AdcRerank]] per query join their full vectors
    *     back for exact cosine, which picks the final top-k.
    *
    * Everything is the trained fixed-k model artifacts ([[trainCodebook]]
    * coarse, [[pqCbTrained]] subspace) — broadcasts, never
    * corpus-proportional. The scan cost at 100 TB is: code stream of the
    * probed lists only (≈ nProbe/k of the corpus × 8 bytes/vector), one
    * groupBy on (q_id, vec_id), and a constant-size rerank join per
    * query. Fully deterministic (round-6 codebooks, round-9 ADC, explicit
    * tie-breaks), so the DuckDB oracle replays all three stages;
    * recall-vs-brute-force is gated separately in LlmOpsSpec. */
  def annIvfPq(t: Tables): DataFrame = {
    val v = pqCorpus(t).withColumn("norm", sqrt(call_function("graft_vecdot", col("e"), col("e"))))
    val coarse = trainCodebook(v) // (c_id, ce, cnorm): fixed-k broadcast
    val pqcb = pqCbTrained(v) // (c_idx, m, csv): fixed 8x16 broadcast
    // IVF membership carries ONLY (list_id, vec_id) — vectors stay put.
    // Compiled map-side assign/probe ranking ([[nativeTopIds]]).
    val cb = collectCents(coarse)
    val lists = nativeTopIds(v, cb, NAssign, "e")
      .select(col("c_id").as("list_id"), col("vec_id"))
    val pqcbArr = collectPqCb(pqcb)
    // Per-vector codes map-side (compiled [[pqCodes]]) — replaces the
    // (vec_id, m, c_idx) row stream.
    val codesDf = v.select(col("vec_id"),
      transform(pqCodes(col("e"), pqcbArr), b => b.getField("c_idx")).as("codes"))
    val q = v.filter(col("vec_id") < NQueries)
    val probed = nativeTopIds(
        q.select(col("vec_id").as("q_id"), col("e").as("qe")), cb, NProbe, "qe")
      .select(col("q_id"), col("c_id").as("list_id"))
    // Per-query ADC distance table, collected ([[collectDtab]] — same
    // sqDist doubles, bounded NQueries×M×K rows).
    val (qids, flat) = collectDtab(v, pqcb)
    val flatLit = typedlit(flat)
    // Stage 1+2: candidates from probed lists only, scored from codes —
    // one join attaches each candidate's 8-byte code array, then the ADC
    // score is a map-side fold ([[adcFold]], same m-ascending
    // accumulation + round-9 as the old groupBy): the old
    // enc⋈broadcast(dtab) join and its candidates×M groupBy exchange
    // are gone (round 19).
    val cands = probed.join(lists, "list_id")
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id")).dropDuplicates("q_id", "vec_id")
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    val prefiltered = cands.join(codesDf, "vec_id")
      .withColumn("qi", (array_position(typedlit(qids), col("q_id")) - 1).cast("int"))
      .withColumn("adc", adcFold(col("qi"), col("codes"), flatLit))
      .withColumn("prk", row_number().over(wAdc))
      .filter(col("prk") <= AdcRerank)
      .select(col("q_id"), col("vec_id"))
    // Stage 3: exact rerank over the surviving candidates only.
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    prefiltered
      .join(v.select(col("vec_id").as("q_id"), col("e").as("qe")), "q_id")
      .join(v.select(col("vec_id"), col("e")), "vec_id")
      .withColumn("cos", call_function("graft_vecdot", col("qe"), col("e")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rk"),
        round(col("cos"), 4).as("cos"))
  }
  val annIvfPqSql: String =
    s"""WITH v AS (SELECT vec_id,
              list_transform(embedding::DOUBLE[], x -> x /
                sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS e
            FROM embeddings),
       sub AS (SELECT vec_id, m, e[m*8+1 : m*8+8] AS sv
               FROM v, unnest(range(0, 8)) AS t(m)),
       ${trainCodebookSql()},
       c AS (SELECT c_id, ce FROM cb_t$CbIters),
       ${pqTrainSql()},
       cbsub AS (SELECT c_idx, m, csv FROM cbsub_t$CbIters),
       a AS (SELECT v.vec_id, c.c_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.c_id) AS arank
             FROM v CROSS JOIN c),
       lists AS (SELECT vec_id, c_id AS list_id FROM a WHERE arank <= $NAssign),
       q AS (SELECT vec_id AS q_id, e FROM v WHERE vec_id < $NQueries),
       pr AS (SELECT q.q_id, c.c_id AS list_id,
                row_number() OVER (
                  PARTITION BY q.q_id
                  ORDER BY list_cosine_similarity(q.e, c.ce) DESC, c.c_id) AS prank
              FROM q CROSS JOIN c),
       scored AS (
         SELECT s.vec_id, s.m, c.c_idx,
                list_sum(list_transform(range(1, 9),
                  i -> (s.sv[i] - c.csv[i]) * (s.sv[i] - c.csv[i]))) AS dist
         FROM sub s JOIN cbsub c ON s.m = c.m),
       enc AS (
         SELECT vec_id, m, c_idx FROM (
           SELECT vec_id, m, c_idx,
                  row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY dist, c_idx) AS rn
           FROM scored) x WHERE rn = 1),
       dtab AS (
         SELECT s.vec_id AS q_id, s.m, c.c_idx,
                list_sum(list_transform(range(1, 9),
                  i -> (s.sv[i] - c.csv[i]) * (s.sv[i] - c.csv[i]))) AS qdist
         FROM sub s JOIN cbsub c ON s.m = c.m
         WHERE s.vec_id < $NQueries),
       cand AS (
         SELECT DISTINCT p.q_id, l.vec_id
         FROM (SELECT q_id, list_id FROM pr WHERE prank <= $NProbe) p
         JOIN lists l ON p.list_id = l.list_id
         WHERE l.vec_id <> p.q_id),
       pre AS (
         SELECT q_id, vec_id FROM (
           SELECT cd.q_id, cd.vec_id, round(sum(d.qdist), 9) AS adc,
                  row_number() OVER (PARTITION BY cd.q_id
                                     ORDER BY round(sum(d.qdist), 9), cd.vec_id) AS prk
           FROM cand cd
           JOIN enc e ON e.vec_id = cd.vec_id
           JOIN dtab d ON d.q_id = cd.q_id AND d.m = e.m AND d.c_idx = e.c_idx
           GROUP BY cd.q_id, cd.vec_id) x WHERE prk <= $AdcRerank),
       rer AS (
         SELECT p.q_id, p.vec_id AS neighbor_id,
                list_dot_product(qv.e, nv.e) AS cos
         FROM pre p
         JOIN v qv ON qv.vec_id = p.q_id
         JOIN v nv ON nv.vec_id = p.vec_id)
       SELECT q_id, neighbor_id,
              row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk,
              round(cos, 4) AS cos
       FROM rer QUALIFY rk <= $K"""

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("ann_bruteforce_topk", annBruteforce _, annBruteforceSql),
    // approximate by design, but deterministically so → exact IVF-replay oracle
    ("ann_ivf_topk", ((t: Tables) => annIvf(t)), annIvfSql),
    // full-probe IVF is exact → same oracle as brute force
    ("ann_ivf_fullprobe", ((t: Tables) => annIvf(t, Int.MaxValue)), annBruteforceSql),
    ("ann_signlsh_neardup", annSignLshNearDup _, annSignLshNearDupSql),
    ("emb_kmeans_step", kmeansStep _, kmeansStepSql),
    ("emb_quantize_int8", quantizeInt8 _, quantizeInt8Sql),
    ("emb_pq_encode", pqEncode _, pqEncodeSql),
    ("ann_pq_adc", annPqAdc _, annPqAdcSql),
    // IVF pruning × PQ/ADC scoring × exact rerank — the combined serving path
    ("ann_ivfpq_topk", annIvfPq _, annIvfPqSql))
}
