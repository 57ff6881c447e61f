package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ScaleFixture events-shard stride contract (pure math —
  * no session): the stride must keep shard id-blocks disjoint and
  * must be coprime to the GeoOps position moduli, so the per-shard
  * lat/lon phase walk covers the FULL 18000/36000 phase spaces
  * instead of the gcd-sized subgroup that saturated co-presence
  * pair identity at factor 9 in r16 (SCALING.md note).
  */
class ScaleFixtureSpec extends AnyFunSuite {

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  test("posStride is >= n (shard id blocks stay disjoint)") {
    for (n <- Seq(1L, 2L, 99999L, 100000L, 1000000L))
      assert(ScaleFixture.posStride(n) >= n)
  }

  test("posStride is coprime to both position moduli") {
    for (n <- Seq(1L, 36000L, 99999L, 100000L, 100001L, 1000000L)) {
      val m = ScaleFixture.posStride(n)
      assert(gcd(m, 18000L) == 1L, s"n=$n m=$m lat modulus")
      assert(gcd(m, 36000L) == 1L, s"n=$n m=$m lon modulus")
    }
  }

  test("the sf0.1 row count (100000) gets full phase periods") {
    val m = ScaleFixture.posStride(100000L)
    assert(m == 100001L)
    // phase period = modulus / gcd(stride * multiplier, modulus);
    // the raw n=100000 stride had lat period 9 — the saturation.
    assert(18000L / gcd(m * 7919L, 18000L) == 18000L)
    assert(36000L / gcd(m * 104729L, 36000L) == 36000L)
    assert(18000L / gcd(100000L * 7919L, 18000L) == 9L)
  }
}
