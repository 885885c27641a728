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
}
