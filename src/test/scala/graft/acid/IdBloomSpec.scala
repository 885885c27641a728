package graft.acid

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the bounded id-summary sketch the manifests carry for
  * large transactions (no Spark session needed — pure driver code). */
class IdBloomSpec extends AnyFunSuite {

  test("no false negatives, ever") {
    val r = new scala.util.Random(42)
    val ids = Array.fill(10000)(r.nextLong())
    val b = IdBloom.empty(1L << 20)
    ids.foreach(b.add)
    assert(ids.forall(b.contains))
  }

  test("false-positive rate is sane at the designed load") {
    val r = new scala.util.Random(7)
    val members = Array.fill(10000)(r.nextLong())
    val b = IdBloom.empty(1L << 20) // ~100 bits/id at this load
    members.foreach(b.add)
    val memberSet = members.toSet
    val probes = Iterator.continually(r.nextLong())
      .filterNot(memberSet).take(10000).toArray
    val fp = probes.count(b.contains)
    assert(fp <= 100, s"$fp false positives in 10k probes (expected ~0 at 100 bits/id)")
  }

  test("base64 roundtrip preserves membership") {
    val b = IdBloom.empty(1L << 12)
    (1L to 100L).foreach(b.add)
    val back = IdBloom.fromBase64(b.toBase64, b.k)
    assert(back.mBits == b.mBits)
    assert((1L to 100L).forall(back.contains))
  }

  test("union contains both operands' members; geometry mismatch rejected") {
    val a = IdBloom.empty(1L << 12); val b = IdBloom.empty(1L << 12)
    (1L to 50L).foreach(a.add)
    (51L to 100L).foreach(b.add)
    a.unionInPlace(b)
    assert((1L to 100L).forall(a.contains))
    val odd = IdBloom.empty(1L << 13)
    intercept[IllegalArgumentException] { a.unionInPlace(odd) }
  }

  test("summary merge widens range and keeps membership") {
    def sum(ids: Seq[Long]) = {
      val b = IdBloom.empty(1L << 12); ids.foreach(b.add)
      ObjSummary(ids.size, ids.min, ids.max, b)
    }
    val m = sum(Seq(10L, 20L)).merge(sum(Seq(500L, 600L)))
    assert(m.count == 4 && m.min == 10L && m.max == 600L)
    assert(Seq(10L, 20L, 500L, 600L).forall(m.mayContain))
    assert(!m.mayContain(5L), "below range")
    assert(!m.mayContain(700L), "above range")
    assert(sum(Seq(1L, 2L)).mayOverlap(sum(Seq(2L, 9L))))
    assert(!sum(Seq(1L, 2L)).mayOverlap(sum(Seq(30L, 40L))))
  }

  // Disjointness-by-AND is load-sensitive: at the default 2^23-bit
  // geometry two 30-id sets light ~180 bits each, so the expected
  // cross-collision count is ~0.004 — the fixture sets below verifiably
  // share zero bits (deterministic hash: checked once, true forever).
  // Heavily-loaded filters degrade toward always-intersecting, which
  // only re-creates the old range-only pessimism, never a lost update.

  test("intersects: an all-zero AND proves the id sets disjoint") {
    val a = IdBloom.empty(1L << 23); val b = IdBloom.empty(1L << 23)
    (0L until 30L).foreach(i => a.add(2 * i))     // evens
    (0L until 30L).foreach(i => b.add(2 * i + 1)) // odds
    assert(!a.intersects(b),
      "disjoint 30-id sets must AND to zero at 2^23 bits")
    b.add(42L) // now shares one id with a
    assert(a.intersects(b), "a shared id always lights shared bits")
    intercept[IllegalArgumentException] {
      a.intersects(IdBloom.empty(1L << 12))
    }
  }

  test("mayOverlap: interleaved-but-disjoint ranges no longer conflict") {
    def sum(ids: Seq[Long]) = {
      val b = IdBloom.empty(1L << 23); ids.foreach(b.add)
      ObjSummary(ids.size, ids.min, ids.max, b)
    }
    val evens = sum((0L until 30L).map(2 * _))
    val odds = sum((0L until 30L).map(2 * _ + 1))
    // ranges interleave ([0,198] vs [1,199]) but the sets are disjoint:
    // the bloom AND must clear what the range check alone cannot
    assert(!evens.mayOverlap(odds))
    assert(!odds.mayOverlap(evens))
    // one genuinely shared id flips it back to conflict
    val oddsPlus = sum((0L until 30L).map(2 * _ + 1) :+ 42L)
    assert(evens.mayOverlap(oddsPlus))
    // differing geometry degrades to the range-only verdict (never throws)
    val small = {
      val b = IdBloom.empty(1L << 12); b.add(1L)
      ObjSummary(1, 1L, 1L, b)
    }
    assert(evens.mayOverlap(small), "range overlap + unmergeable geometry")
  }

  test("merge is pure: neither operand's bitset is mutated") {
    def sum(ids: Seq[Long]) = {
      val b = IdBloom.empty(1L << 12); ids.foreach(b.add)
      ObjSummary(ids.size, ids.min, ids.max, b)
    }
    val a = sum(Seq(1L, 2L)); val b = sum(Seq(500L, 600L))
    val aBits = a.bloom.toBase64; val bBits = b.bloom.toBase64
    val m = a.merge(b)
    assert(a.bloom.toBase64 == aBits, "left operand widened in place")
    assert(b.bloom.toBase64 == bBits, "right operand widened in place")
    assert(Seq(1L, 2L, 500L, 600L).forall(m.mayContain))
    assert(!a.bloom.contains(500L), "membership leaked back into the operand")
  }
}
