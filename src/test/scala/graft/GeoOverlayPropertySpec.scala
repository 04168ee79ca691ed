package graft

import graft.functions.GeoFns._
import graft.functions.GeoOverlay
import org.scalacheck.{Gen, Prop, Shrink, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based differential sweep of the overlay kernel (round 19,
  * r18 verdict next-step #6): the fixed-seed 200/500-pair loops in
  * GeoSpec become ScalaCheck properties with SHRINKING, at larger n,
  * and over a strictly wider input class — star-shaped (generally
  * NON-convex) simple polygons, where the convex-only random suite
  * could never exercise multi-component intersections or concave
  * boundary chains. Oracles are algebraic identities that hold for any
  * pair of simple polygons, so no second geometry engine is needed:
  *
  *   area(A) + area(B) = area(A∪B) + area(A∩B)      (inclusion–exclusion)
  *   area(A\B) + area(A∩B) = area(A)                 (partition of A)
  *   area(AΔB) = area(A∪B) − area(A∩B)               (symmetric difference)
  *   A∩B nonempty ⇔ ST_Intersects(A, B)              (relate consistency)
  *   A ⊆ B ⇒ area(A∩B)=area(A) ∧ area(A∪B)=area(B)   (containment collapse)
  *   commutativity of ∩/∪ areas; A∪A ≈ A             (idempotence)
  *
  * A failing pair shrinks toward integer coordinates, fewer vertices,
  * and an origin-centered twin — the smallest counterexample is what a
  * kernel debugging session actually needs. Uses scalacheck core
  * directly (the scalatest bridge artifact is not in the offline
  * cache, same stance as PrestoDialectPropertySpec).
  */
class GeoOverlayPropertySpec extends AnyFunSuite {

  /** Star-shaped polygon: vertices at equal angles around (cx, cy) with
    * per-vertex radii — simple (non-self-intersecting) by construction,
    * convex only when all radii coincide. */
  final case class Star(cx: Double, cy: Double, radii: List[Double]) {
    def wkt: String = {
      val k = radii.size
      val vs = radii.zipWithIndex.map { case (r, i) =>
        val a = 2 * math.Pi * i / k
        s"${cx + r * math.cos(a)} ${cy + r * math.sin(a)}"
      }
      s"POLYGON ((${(vs :+ vs.head).mkString(", ")}))"
    }
    def geom: Geom = parseWkt(wkt)
  }

  private val genStar: Gen[Star] = for {
    k <- Gen.choose(3, 12)
    cx <- Gen.choose(-30.0, 30.0)
    cy <- Gen.choose(-30.0, 30.0)
    radii <- Gen.listOfN(k, Gen.choose(1.0, 25.0))
  } yield Star(cx, cy, radii)

  /** Shrink toward the debuggable corner of the space: integer
    * coordinates first (snap-round noise vanishes), then fewer vertices
    * (every other, floor 3), then an origin-centered twin. */
  private implicit val shrinkStar: Shrink[Star] = Shrink { s =>
    val snapped = Star(s.cx.round.toDouble, s.cy.round.toDouble,
      s.radii.map(r => math.max(1.0, r.round.toDouble)))
    val fewer =
      if (s.radii.size > 3)
        Some(Star(s.cx, s.cy,
          s.radii.zipWithIndex.collect { case (r, i) if i % 2 == 0 => r } match {
            case l if l.size >= 3 => l
            case _ => s.radii.take(3)
          }))
      else None
    val centered = Star(0.0, 0.0, s.radii)
    Stream((Seq(snapped) ++ fewer.toSeq :+ centered).filter(_ != s).distinct: _*)
  }

  /** Run a property at a larger n than the fixed loops; surface the
    * (shrunk) counterexample in the scalatest failure message. */
  private def check(name: String)(p: (Star, Star) => Prop): Unit = {
    val prop = Prop.forAll(genStar, genStar)(p)
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(400)
        .withInitialSeed(org.scalacheck.rng.Seed(20260816L)), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("inclusion-exclusion, partition, symdiff on 400 star pairs (shrinking)") {
    check("area algebra") { (sa, sb) =>
      val (a, b) = (sa.geom, sb.geom)
      val (aa, ab) = (area(a), area(b))
      val inter = GeoOverlay.intersection(a, b)
      val uni = GeoOverlay.union(a, b)
      val dif = GeoOverlay.difference(a, b)
      val sym = GeoOverlay.symDifference(a, b)
      // snap-rounding perturbs vertices on a ~|coord|·2^-30 grid; the
      // 1e-6-relative tolerance is ~1000x that, far under any real bug
      val tol = 1e-6 * (aa + ab + 1)
      Prop(math.abs(aa + ab - (area(uni) + area(inter))) <= tol) :| "incl-excl" &&
        Prop(math.abs(area(dif) + area(inter) - aa) <= tol) :| "partition" &&
        Prop(math.abs(area(sym) - (area(uni) - area(inter))) <= tol) :| "symdiff"
    }
  }

  test("relate consistency + containment collapse on 400 star pairs (shrinking)") {
    check("relate/containment") { (sa, sb) =>
      val (a, b) = (sa.geom, sb.geom)
      val (aa, ab) = (area(a), area(b))
      val inter = GeoOverlay.intersection(a, b)
      val tol = 1e-6 * (aa + ab + 1)
      val relateOk = Prop(!inter.isEmpty == intersects(a, b)) :| "inter-nonempty-iff-intersects"
      val collapse =
        if (contains(b, a))
          Prop(math.abs(area(inter) - aa) <= tol) :| "nested-inter" &&
            Prop(math.abs(area(GeoOverlay.union(a, b)) - ab) <= tol) :| "nested-union"
        else Prop.passed
      relateOk && collapse
    }
  }

  /** Annulus: star shell with a concentric half-scale star hole —
    * strictly interior by construction (hole radius ≤ shell radius / 2
    * per vertex ray). Exercises the hole-ring paths of
    * classify/stitch/assemble that shell-only pairs never touch. */
  final case class Annulus(star: Star) {
    def wkt: String = {
      val k = star.radii.size
      def ring(scale: Double, reversed: Boolean) = {
        val vs = star.radii.zipWithIndex.map { case (r, i) =>
          val a = 2 * math.Pi * i / k
          s"${star.cx + r * scale * math.cos(a)} ${star.cy + r * scale * math.sin(a)}"
        }
        val closed = vs :+ vs.head
        (if (reversed) closed.reverse else closed).mkString(", ")
      }
      s"POLYGON ((${ring(1.0, reversed = false)}), (${ring(0.5, reversed = true)}))"
    }
    def geom: Geom = parseWkt(wkt)
    /** shoelace of shell minus hole: hole area = shell area / 4 for a
      * uniformly half-scaled similar ring */
    def expectedArea: Double = area(parseWkt(
      s"POLYGON ((${star.wkt.stripPrefix("POLYGON ((").stripSuffix("))")}))")) * 0.75
  }

  private val genAnnulus: Gen[Annulus] = genStar.map(Annulus(_))
  private implicit val shrinkAnnulus: Shrink[Annulus] =
    Shrink(a => shrinkStar.shrink(a.star).map(Annulus(_)))

  test("area algebra holds for polygons WITH HOLES vs solid stars (400 pairs, shrinking)") {
    // the hole ring doubles the boundary complexity of every overlay:
    // A is an annulus, B a solid star — the same algebraic identities
    // must hold, plus the annulus's own area closed form (hole = 1/4
    // of shell for a half-scaled similar ring)
    val prop = Prop.forAll(genAnnulus, genStar) { (an, sb) =>
      val (a, b) = (an.geom, sb.geom)
      val (aa, ab) = (area(a), area(b))
      val tol = 1e-6 * (aa + ab + 1)
      val inter = GeoOverlay.intersection(a, b)
      val uni = GeoOverlay.union(a, b)
      val dif = GeoOverlay.difference(a, b)
      Prop(math.abs(aa - an.expectedArea) <= tol) :| "annulus-closed-form" &&
        Prop(math.abs(aa + ab - (area(uni) + area(inter))) <= tol) :| "incl-excl" &&
        Prop(math.abs(area(dif) + area(inter) - aa) <= tol) :| "partition" &&
        Prop(math.abs(area(GeoOverlay.union(a, a)) - aa) <= tol) :| "hole-self-union" &&
        Prop(GeoOverlay.difference(a, a).isEmpty) :| "hole-self-diff"
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(400)
        .withInitialSeed(org.scalacheck.rng.Seed(20260817L)), prop)
    assert(res.passed, s"holes: ${res.status}")
  }

  test("WKT round-trip is exact on generated stars and annuli (400 each)") {
    // parse(render(g)) must reproduce g exactly — float coordinates
    // included (the WKT writer must not lose precision)
    val prop = Prop.forAll(genStar, genAnnulus) { (s, a) =>
      Prop(toWkt(parseWkt(s.wkt)) == toWkt(parseWkt(toWkt(s.geom)))) :| "star" &&
        Prop(toWkt(parseWkt(a.wkt)) == toWkt(parseWkt(toWkt(a.geom)))) :| "annulus" &&
        Prop(toWkt(fromWkb(toWkb(s.geom))) == toWkt(s.geom)) :| "star-wkb" &&
        Prop(toWkt(fromWkb(toWkb(a.geom))) == toWkt(a.geom)) :| "annulus-wkb"
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(400)
        .withInitialSeed(org.scalacheck.rng.Seed(20260818L)), prop)
    assert(res.passed, s"roundtrip: ${res.status}")
  }

  test("DE-9IM relate invariants on 400 NON-convex star pairs (shrinking)") {
    // GeoSpec's random relate differential is convex-only; star pairs
    // reach concave boundary chains. Oracles are matrix-algebraic:
    // transpose symmetry, predicate-vs-matrix consistency, and the
    // self-relate closed form (a simple polygon relates to itself as
    // 2FFF1FFF2).
    val prop = Prop.forAll(genStar, genStar) { (sa, sb) =>
      val (a, b) = (sa.geom, sb.geom)
      val m = relateMatrix(a, b)
      val t = Array(0, 3, 6, 1, 4, 7, 2, 5, 8).map(relateMatrix(b, a).charAt).mkString
      val closureMeet = "0134".exists(c => m(c - '0') != 'F')
      Prop(m == t) :| s"transpose: $m vs ${relateMatrix(b, a)}" &&
        Prop(closureMeet == intersects(a, b)) :| s"closure-vs-intersects: $m" &&
        Prop(relate(a, b, "T*****FF*") == contains(a, b)) :| s"contains-vs-matrix: $m" &&
        Prop(!contains(a, b) || intersects(a, b)) :| "contains-implies-intersects" &&
        Prop(relateMatrix(a, a) == "2FFF1FFF2") :| s"self-relate: ${relateMatrix(a, a)}"
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(400)
        .withInitialSeed(org.scalacheck.rng.Seed(20260819L)), prop)
    assert(res.passed, s"relate: ${res.status}")
  }

  test("st_buffer properties on 150 NON-convex stars (shrinking)") {
    // the buffer fixtures are rectangles/points/segments; stars reach
    // concave corners (arc joins across reflex vertices) and the
    // erosion path's hole/collapse handling. Oracles are set-algebraic:
    // dilation contains the input, erosion is contained by it, area is
    // monotone in the radius, buffer(0) is the identity.
    val genR = Gen.choose(0.5, 4.0)
    val prop = Prop.forAll(genStar, genR) { (s, r) =>
      val g = s.geom
      val dil = GeoOverlay.buffer(g, r)
      val dil2 = GeoOverlay.buffer(g, r * 2)
      val ero = GeoOverlay.buffer(g, -r)
      Prop(contains(dil, g)) :| "dilation-contains-input" &&
        Prop(area(dil2) >= area(dil) && area(dil) > area(g)) :| "area-monotone" &&
        Prop(ero.isEmpty || contains(g, ero)) :| "erosion-contained" &&
        Prop(ero.isEmpty || area(ero) < area(g)) :| "erosion-shrinks" &&
        Prop(toWkt(GeoOverlay.buffer(g, 0.0)) == toWkt(g)) :| "buffer-zero-identity"
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(150)
        .withInitialSeed(org.scalacheck.rng.Seed(20260820L)), prop)
    assert(res.passed, s"buffer: ${res.status}")
  }

  test("UnionState (validate-once + unionTrusted) matches union byte-for-byte; invalid input still rejected") {
    // Round-20 optimization pin: GeoAgg.UnionState validates each USER
    // input once in add() and tree-merges via GeoOverlay.unionTrusted
    // (no per-level O(E²) operand re-validation). On valid input the
    // aggregate's result must be byte-identical to the validating
    // union; invalid input must still fail at the aggregate's entry
    // surface with the same st_union error.
    val prop = Prop.forAll(genStar, genAnnulus) { (s, an) =>
      val (a, b) = (s.geom, an.geom)
      val st = new graft.functions.GeoAgg.UnionState
      st.add(a); st.add(b); st.compact()
      Prop(toWkt(st.pending.head) == toWkt(GeoOverlay.union(a, b))) :| "state-vs-union"
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(20260821L)), prop)
    assert(res.passed, s"trusted-union: ${res.status}")
    val bow = parseWkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    val st = new graft.functions.GeoAgg.UnionState
    val e = intercept[IllegalArgumentException] { st.add(bow) }
    assert(e.getMessage.contains("st_union"), e.getMessage)
  }

  test("commutativity and idempotence on 400 star pairs (shrinking)") {
    check("commutativity/idempotence") { (sa, sb) =>
      val (a, b) = (sa.geom, sb.geom)
      val tol = 1e-6 * (area(a) + area(b) + 1)
      Prop(math.abs(area(GeoOverlay.intersection(a, b)) -
        area(GeoOverlay.intersection(b, a))) <= tol) :| "inter-comm" &&
        Prop(math.abs(area(GeoOverlay.union(a, b)) -
          area(GeoOverlay.union(b, a))) <= tol) :| "union-comm" &&
        Prop(math.abs(area(GeoOverlay.union(a, a)) - area(a)) <= tol) :| "union-idem" &&
        Prop(GeoOverlay.difference(a, a).isEmpty) :| "self-diff-empty"
    }
  }
}
