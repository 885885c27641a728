package graft.acid

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Unit surface of the positional deletion-vector bitmap: membership,
  * union, canonical serialization, the sparse/dense container
  * crossover, and the size bound that justifies the representation
  * (VERDICT r6 #4: a 1M-delete mask must serialize to a few hundred
  * KiB, not the ~8 MB of the id-array sidecar it replaced). */
class GraftBitmapSpec extends AnyFunSuite {

  test("membership over random members and non-members") {
    val rnd = new Random(7)
    val members = (1 to 5000).map(_ => rnd.nextLong(1L << 40)).distinct
    val bm = GraftBitmap(members)
    assert(bm.cardinality == members.size)
    members.foreach(v => assert(bm.contains(v), s"member $v missing"))
    val memberSet = members.toSet
    (1 to 5000).map(_ => rnd.nextLong(1L << 40))
      .filterNot(memberSet).take(1000)
      .foreach(v => assert(!bm.contains(v), s"non-member $v present"))
    assert(!bm.contains(-1L)) // negative ordinals are never members
  }

  test("iterator is ascending and matches the input set") {
    val vals = Seq(70000L, 3L, 65535L, 65536L, 0L, 1L << 33)
    assert(GraftBitmap(vals).iterator.toSeq == vals.distinct.sorted)
  }

  test("serialize/deserialize round-trips; equal sets are byte-identical") {
    val rnd = new Random(11)
    val vals = (1 to 3000).map(_ => rnd.nextLong(1L << 30))
    val bm = GraftBitmap(vals)
    val back = GraftBitmap.deserialize(bm.serialize())
    assert(back.iterator.toSeq == bm.iterator.toSeq)
    // canonical: same set built in a different order serializes equal
    val shuffled = GraftBitmap(Random.shuffle(vals))
    assert(java.util.Arrays.equals(bm.serialize(), shuffled.serialize()))
  }

  test("sparse/dense crossover: containers on both sides round-trip") {
    // one container just under ArrayMax (sparse), one far above (dense)
    val sparse = (0 until GraftBitmap.ArrayMax - 1).map(_.toLong * 2)
      .filter(_ < (1 << 16)).map(_ + (1L << 16))
    val dense = (0 until 60000).map(_.toLong)
    val bm = GraftBitmap(sparse ++ dense)
    val back = GraftBitmap.deserialize(bm.serialize())
    assert(back.cardinality == (sparse ++ dense).distinct.size)
    assert(back.contains(dense.last) && back.contains(sparse.head))
  }

  test("union merges members across representations") {
    val a = GraftBitmap(Seq(1L, 2L, 100000L))
    val b = GraftBitmap((0L until 50000L).map(_ + 200000L))
    val u = a.union(b)
    assert(u.cardinality == 3 + 50000)
    assert(u.contains(2L) && u.contains(249999L) && !u.contains(3L))
    // identity cases
    assert(a.union(GraftBitmap.empty) eq a)
    assert(GraftBitmap.empty.union(b) eq b)
  }

  test("size bound: 1M dense deletes serialize under a few hundred KiB") {
    // 1M contiguous ordinals = 16 dense containers: the mask a
    // heavily-deleted 100 TB file actually produces
    val bm = GraftBitmap((0L until 1000000L))
    val bytes = bm.serialize().length
    assert(bytes < 300 * 1024, s"1M-delete mask is $bytes bytes")
    // and the worst adversarial spread (every 3rd row) stays bounded
    // by the dense-container ceiling, never reverting to O(ids)
    val spread = GraftBitmap((0L until 3000000L by 3))
    assert(spread.serialize().length < 500 * 1024)
  }

  test("deserialize rejects torn or mistyped payloads loudly") {
    val good = GraftBitmap(Seq(1L, 2L)).serialize()
    intercept[IllegalArgumentException] {
      GraftBitmap.deserialize("not a bitmap".getBytes("UTF-8"))
    }
    val bad = good.clone(); bad(0) = (bad(0) ^ 0x7f).toByte
    intercept[Exception](GraftBitmap.deserialize(bad))
  }
}
