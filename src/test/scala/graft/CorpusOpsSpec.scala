package graft

import graft.llm.{Corpus, Dedup}
import org.apache.spark.sql.functions._

/** Corpus-construction operators: invariants + a union-find ground truth
  * for the connected-components clustering. */
class CorpusOpsSpec extends SparkSpec {

  test("dedup_cluster_cc matches driver-side union-find on the same edges") {
    val pairs = Dedup.neardupMinhash(tables)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs")
    // classic union-find over the collected (tiny) edge list
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Corpus.dedupClusterCC(tables)
      .select("doc_id", "component").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("large-star/small-star CC agrees with hash-min CC on the fixture graph") {
    val hashMin = Corpus.dedupClusterCC(tables)
      .select("doc_id", "component", "cluster_n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val star = Corpus.dedupClusterCCStar(tables)
      .select("doc_id", "component", "cluster_n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(star == hashMin)
  }

  test("star CC labels an adversarial 256-diameter path in O(log d) rounds") {
    import spark.implicits._
    // Path 0-1-2-…-256: hash-min label propagation needs 256 rounds here;
    // the alternating star rewrite must collapse it in ≤ ~2·log2(256).
    val path = (0L until 256L).map(i => (i, i + 1)).toDF("pa", "pb")
    val (comp, rounds) = Corpus.connectedComponentsStar(path)
    val labels = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 257)
    assert(labels.values.forall(_ == 0L), "all nodes must label to the path minimum")
    assert(rounds <= 16, s"expected O(log d) convergence, took $rounds rounds")
  }

  test("star CC separates disjoint cliques and survives an empty edge list") {
    import spark.implicits._
    val cliqueA = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val cliqueB = for (i <- 10L to 12L; j <- (i + 1) to 12L) yield (i, j)
    val (comp, _) = Corpus.connectedComponentsStar((cliqueA ++ cliqueB).toDF("pa", "pb"))
    val labels = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(labels(_) == 0L) && (10L to 12L).forall(labels(_) == 10L))
    val (empty, _) = Corpus.connectedComponentsStar(Seq.empty[(Long, Long)].toDF("pa", "pb"))
    assert(empty.count() == 0)
  }

  test("cluster components are closed: both endpoints of every edge share a label") {
    val cc = Corpus.dedupClusterCC(tables).select("doc_id", "component")
    val e = Dedup.neardupMinhash(tables).select("doc_a", "doc_b")
    val crossLabel = e
      .join(cc.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("component", "ca"), "doc_a")
      .join(cc.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("component", "cb"), "doc_b")
      .filter(col("ca") =!= col("cb"))
    assert(crossLabel.count() == 0)
  }

  test("pack_sequences conserves tokens and numbers bins contiguously") {
    val packed = Corpus.packSequences(tables).collect()
    val totTokens = tables.documents
      .select(sum(size(split(trim(col("text")), "\\s+"))))
      .head().getLong(0)
    assert(packed.map(_.getAs[Long]("bin_tokens")).sum == totTokens)
    packed.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).sorted
      assert(bins.head == 0 && bins.toSet == (0L to bins.last).toSet)
    }
  }

  test("packing property: random corpora match a sequential reference packer") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // docs up to 5000 tokens: exercises the overflow case (a single doc
    // larger than the 2048-token context) the fixture corpus never hits
    val genDocs = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 5000)))
    val prop = Prop.forAllNoShrink(genDocs) { raw =>
      val docs = raw.zipWithIndex.map { case ((s, n), i) => (s"s$s", i.toLong, n.toLong) }
      val got = graft.llm.Corpus.packBins(
        docs.toDF("source", "doc_id", "n_tok"), 2048)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      // sequential reference: lay docs end to end per source in id order
      val expected = docs.groupBy(_._1).flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._2).map { case (_, _, n) =>
          val bin = cum / 2048; cum += n; (src, bin) -> n
        }.groupBy(_._1).map { case (k, vs) =>
          k -> (vs.size.toLong, vs.map(_._2).sum)
        }
      }
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("doc_chunk_sliding emits ceil(n_tok/32) chunks per doc, all 1..64 tokens") {
    val chunks = Corpus.docChunkSliding(tables)
    val perDoc = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val docs = tables.documents
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tok"))
    val bad = perDoc.join(docs, "doc_id")
      .filter(col("n_chunks") =!= ceil(col("n_tok") / 32.0).cast("long"))
    assert(bad.count() == 0)
    assert(chunks.filter(col("n_tok") < 1 || col("n_tok") > 64).count() == 0)
  }

  test("stratified sample keeps only buckets under each source's threshold and is deterministic") {
    val s1 = Corpus.sampleStratified(tables).collect().map(_.mkString("|")).toSet
    val s2 = Corpus.sampleStratified(tables).collect().map(_.mkString("|")).toSet
    assert(s1 == s2) // content-hash bucketing: no rand(), rerun-identical
    val bad = Corpus.sampleStratified(tables).filter(
      col("bucket") >= expr("""CASE CAST(substr(source, 4) AS INT) % 4
          WHEN 0 THEN 256 WHEN 1 THEN 128 WHEN 2 THEN 64 ELSE 32 END"""))
    assert(bad.count() == 0)
  }

  test("tfidf emits at most 3 ranked terms per doc, rank-1 first") {
    val tf = Corpus.tfidfTopTerms(tables)
    val perDoc = tf.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"))
    assert(perDoc.filter(col("n") > 3 || col("lo") =!= 1 || col("hi") > 3).count() == 0)
  }

  test("domain mixture hits target proportions deterministically") {
    val mix = Corpus.corpusMixture(tables)
    val bySource = mix.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only the four spec'd sources survive
    assert(bySource.keySet.subsetOf(Set("src0", "src1", "src2", "src3")), bySource)
    // proportions track the 0.4/0.3/0.2/0.1 weights (hash sampling on a
    // tiny per-source population → generous tolerance, but ordering and
    // rough magnitude must hold)
    val n = bySource.values.sum.toDouble
    assert(n > 0)
    val p0 = bySource.getOrElse("src0", 0L) / n
    val p3 = bySource.getOrElse("src3", 0L) / n
    assert(p0 > p3, s"mixture ordering lost: $bySource")
    assert(math.abs(p0 - 0.4) < 0.25, s"src0 share $p0 far from 0.4 ($bySource)")
    // deterministic: identical result on rerun
    val again = Corpus.corpusMixture(tables).collect().map(_.getLong(0)).toSet
    assert(again == mix.collect().map(_.getLong(0)).toSet)
  }

  test("parameterized mixture tracks requested weights within the budget and validates input") {
    // per-source counts track budget*w_s for several weight/budget
    // configurations (hash sampling on small per-source populations →
    // generous tolerance, but each source must land near its target)
    val configs = Seq(
      (Seq(("src0", 0.5), ("src1", 0.5)), 40L),
      (Seq(("src0", 0.6), ("src2", 0.3), ("src4", 0.1)), 50L),
      (Seq(("src1", 0.25), ("src3", 0.25), ("src5", 0.25), ("src7", 0.25)), 80L))
    for ((weights, budget) <- configs) {
      val bySource = Corpus.corpusMixtureOver(tables.documents, weights, budget)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySource.keySet.subsetOf(weights.map(_._1).toSet),
        s"unlisted source leaked: $bySource")
      for ((src, w) <- weights) {
        val nSrc = tables.documents.filter(col("source") === src).count()
        val target = math.min(budget * w, nSrc.toDouble) // keep_frac caps at 1
        val got = bySource.getOrElse(src, 0L).toDouble
        assert(math.abs(got - target) <= math.max(6.0, 0.5 * target),
          s"$src: got $got, target $target (weights=$weights budget=$budget)")
      }
    }
    // invalid specs are rejected up front
    intercept[IllegalArgumentException] {
      Corpus.corpusMixtureOver(tables.documents, Seq(("src0", 0.4), ("src1", 0.4)), 60L)
    }
    intercept[IllegalArgumentException] {
      Corpus.corpusMixtureOver(tables.documents, Seq(("src0", 1.5), ("src1", -0.5)), 60L)
    }
    intercept[IllegalArgumentException] {
      Corpus.corpusMixtureOver(tables.documents, Seq(("src0", 1.0)), 0L)
    }
  }

  test("top bigrams are count-descending with deterministic tie order") {
    val rows = Corpus.ngramTopBigrams(tables).collect()
      .map(r => (r.getAs[String]("bigram"), r.getAs[Long]("cnt")))
    assert(rows.length == 20)
    assert(rows.sliding(2).forall { case Array((b1, c1), (b2, c2)) =>
      c1 > c2 || (c1 == c2 && b1 < b2) })
  }
}
