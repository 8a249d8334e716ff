package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ScaleUp

/** Pins the scale-sweep generator's per-copy text bijection family.
  *
  * The sf1/sf10 measurements in SCALING.md are only meaningful if the
  * tiled corpus preserves within-copy duplicate structure (each map is
  * a bijection on letters) while keeping cross-copy shingles disjoint
  * (distinct maps send the same source shingle to different images).
  * These are pure-function properties of ScaleUp.affineMap — no Spark
  * session needed — and a silent break here would surface only as an
  * unexplained super-linear dedup row two rounds later.
  */
class ScaleUpSpec extends AnyFunSuite {

  private val maps = (0 until ScaleUp.familySize).map(ScaleUp.affineMap)

  test("copy 0 is the identity and copies 1..25 are the round-11 rotations") {
    assert(maps(0) == ScaleUp.alpha)
    for (i <- 1 until 26)
      assert(maps(i) == ScaleUp.alpha.drop(i) + ScaleUp.alpha.take(i),
        s"copy $i is not the rotation the round-11 generator produced")
  }

  test("every member is a bijection on the 26 letters") {
    for ((m, i) <- maps.zipWithIndex)
      assert(m.toSet.size == 26 && m.forall(_.isLower), s"copy $i not a bijection: $m")
  }

  test("all 312 members are pairwise distinct and agree on at most 2 letters") {
    // the disjointness guarantee for 5-char shingles: two copies can
    // only collide on a shingle drawn entirely from the (≤2) agreeing
    // letters plus non-letters — vanishing measure in real text
    for (i <- maps.indices; j <- (i + 1) until maps.size) {
      val agree = (0 until 26).count(k => maps(i)(k) == maps(j)(k))
      assert(agree <= 2, s"maps $i and $j agree on $agree letters")
    }
  }

  test("the family size is the full affine group mod 26 (12 units × 26 shifts)") {
    assert(ScaleUp.familySize == 312)
    // one past the family wraps to the identity — the require() in
    // main() exists to reject exactly that
    assert(ScaleUp.affineMap(ScaleUp.familySize) == maps(0))
  }

  // ---- the NAME-column digit bijection (d8's blocking input) ----

  private val dmaps = (0 until ScaleUp.familySize).map(ScaleUp.digitMap)

  test("digitMap: every member sends the 10 digits to 10 DISTINCT letters") {
    // injective ⇒ the source's 100 distinct 2-digit name suffixes stay
    // 100 distinct last-2-char blocks inside every copy — the property
    // whose absence (the _c<i> token tag) fused each copy into one
    // mega-block the d8 pair cap then dropped
    for ((m, i) <- dmaps.zipWithIndex)
      assert(m.length == 10 && m.toSet.size == 10 && m.forall(_.isLower),
        s"digitMap($i) not an injection into letters: $m")
  }

  test("digitMap: distinct-digit suffixes NEVER collide across distinct copies") {
    // Δa·(d1−d2) ≡ 0 (mod 26) with d1≠d2 in 0..9 forces Δa ≡ 0 mod 13,
    // i.e. a_j = a_i ± 13 — even, so not a unit: no other family member
    // agrees on two distinct digits at once. Brute-forced here over all
    // pairs so an edit to the unit list can't silently break it.
    for (i <- dmaps.indices; j <- (i + 1) until dmaps.size) {
      val agree = (0 to 9).filter(d => dmaps(i)(d) == dmaps(j)(d))
      assert(agree.size <= 1,
        s"digitMaps $i,$j agree on digits $agree — a distinct-digit " +
          "name suffix would merge those copies' blocks")
    }
  }

  test("embedPerm/embedSigns: copy 0 identity, bijections, pairwise distinct") {
    val dim = 64
    assert(ScaleUp.embedPerm(0, dim) == (0 until dim),
      "copy 0 permutation must be the identity (source rows verbatim)")
    assert(ScaleUp.embedSigns(0, dim).forall(_ == 1.0f),
      "copy 0 signs must all be +1")
    val fams = (0 until ScaleUp.familySize)
      .map(i => (ScaleUp.embedPerm(i, dim), ScaleUp.embedSigns(i, dim)))
    for (((p, _), i) <- fams.zipWithIndex)
      assert(p.toSet.size == dim, s"embedPerm($i) is not a bijection")
    assert(fams.distinct.size == fams.size,
      "two copies share an identical (perm, signs) transform — their " +
        "vectors would be exact clones again")
  }

  test("embedding transform is orthogonal: dots and norms preserved within a copy") {
    val dim = 64
    val rnd = new scala.util.Random(7)
    val a = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    val b = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    def apply(i: Int, v: Array[Float]): Array[Float] = {
      val p = ScaleUp.embedPerm(i, dim); val s = ScaleUp.embedSigns(i, dim)
      (0 until dim).map(j => s(j) * v(p(j))).toArray
    }
    def dot(x: Array[Float], y: Array[Float]): Double =
      x.indices.map(j => x(j).toDouble * y(j).toDouble).sum
    for (i <- Seq(1, 31, 32, 100, 311)) {
      val (qa, qb) = (apply(i, a), apply(i, b))
      // s(j)² = 1 and the permuted products are the SAME multiset, so
      // preservation is exact (the sum here folds in a fixed order)
      assert(math.abs(dot(qa, qb) - dot(a, b)) < 1e-12,
        s"copy $i broke within-copy dot products")
      assert(math.abs(dot(qa, qa) - dot(a, a)) < 1e-12,
        s"copy $i broke norms")
      // and the transformed vector is NOT the source — the clone
      // degeneracy the transform exists to remove
      assert(!qa.sameElements(a), s"copy $i left the vector verbatim")
    }
  }

  test("digitMap: repeated-digit suffix merging is bounded by the unit count") {
    // a single digit's image can coincide across at most the 11 other
    // multiplier choices — block merging stays bounded regardless of
    // copy count (never a blowup)
    for (i <- dmaps.indices.take(26); d <- 0 to 9) {
      val same = dmaps.indices.count(j => j != i && dmaps(j)(d) == dmaps(i)(d))
      assert(same <= 11, s"digit $d of copy $i collides with $same other copies")
    }
  }

  test("digitMap: 100-copy image-space saturation is linear, never a collapse") {
    // The per-suffix guarantees above do NOT make cross-copy blocks
    // disjoint: different suffixes from different copies can share a
    // 2-letter image, and with 100 copies the ~9000 distinct-digit
    // suffix images pigeonhole into 26²=676 cells. Pin the measured
    // shape: mean cell load ~14 (linear in copies), max load within 3×
    // the mean (no token-tag-style mega-block), and — the d8 story at
    // sf10 — merged blocks big enough to trip the pair-cap audit.
    val copies = 100
    val suffixes = for {
      i <- 0 until copies
      d1 <- 0 to 9; d2 <- 0 to 9 if d1 != d2
    } yield (dmaps(i)(d1), dmaps(i)(d2))
    val loads = suffixes.groupBy(identity).map(_._2.size)
    val mean = suffixes.size.toDouble / (26 * 25) // distinct-letter cells only
    assert(mean > 10 && mean < 20, s"unexpected mean cell load $mean")
    assert(loads.max <= 3 * mean,
      s"max cell load ${loads.max} vs mean $mean — a mega-block collapse")
    // every cell is hit (the merge is spread, not concentrated)
    assert(loads.size > 600, s"only ${loads.size} cells populated")
  }
}
