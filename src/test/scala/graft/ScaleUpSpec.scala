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
}
