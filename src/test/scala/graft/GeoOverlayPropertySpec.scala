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
