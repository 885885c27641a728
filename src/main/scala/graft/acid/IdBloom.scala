package graft.acid

/** Fixed-geometry bloom filter over 64-bit object ids — the manifest's
  * bounded stand-in for a transaction's full id list once it passes
  * [[EngineConf.objectListThreshold]] (reference analog: the id IS the
  * address, defs.rs:12-18 — here a summary of the addresses a commit
  * touched, carried where the full list would make manifests O(batch)).
  *
  * Geometry is FIXED per deployment ([[EngineConf.bloomBits]], default
  * 2^23 bits = 1 MiB) so summaries from different transactions union
  * bit-for-bit — a size negotiated per batch could never be merged
  * after the fact. k = 6 probes; at 10^6 distinct ids the false-positive
  * rate is ~2%, which only ever costs a SPURIOUS commit conflict
  * (retry), never a missed one: bloom filters have no false negatives,
  * and conflict detection errs exactly that direction.
  *
  * Hashing is splitmix64 double-hashing — deterministic across JVMs
  * and partitions (no Random, no object identity), so a bloom built
  * distributed equals one built serially. */
final class IdBloom private (private[acid] val bits: Array[Long], val k: Int)
    extends Serializable {

  def mBits: Long = bits.length.toLong * 64

  @inline private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def add(id: Long): Unit = {
    val h1 = mix(id); val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % mBits
      bits((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
      i += 1
    }
  }

  def contains(id: Long): Boolean = {
    val h1 = mix(id); val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % mBits
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise union; requires identical geometry (enforced by the fixed
    * [[EngineConf.bloomBits]] sizing). */
  def unionInPlace(o: IdBloom): this.type = {
    require(o.bits.length == bits.length && o.k == k,
      s"bloom geometry mismatch: ${o.mBits}/${o.k} vs $mBits/$k")
    var i = 0
    while (i < bits.length) { bits(i) |= o.bits(i); i += 1 }
    this
  }

  /** Independent copy of this filter's bitset (same geometry). */
  def copy(): IdBloom = new IdBloom(bits.clone(), k)

  /** True iff the two bitsets share ANY set bit. An all-zero bitwise
    * AND PROVES the underlying id sets are disjoint: hashing is a pure
    * function of (id, geometry), so an id present in both sets lights
    * the same k positions in both filters — a shared id implies shared
    * bits. Shared bits without a shared id remain possible (hash
    * collision → spurious conflict), which errs in the safe direction.
    * Requires identical geometry. */
  def intersects(o: IdBloom): Boolean = {
    require(o.bits.length == bits.length && o.k == k,
      s"bloom geometry mismatch: ${o.mBits}/${o.k} vs $mBits/$k")
    var i = 0
    while (i < bits.length) { if ((bits(i) & o.bits(i)) != 0L) return true; i += 1 }
    false
  }

  def toBase64: String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }
}

object IdBloom {
  /** The deployment-wide probe count. Geometry (mBits, k) must match
    * for summaries to union or intersect; k is pinned here so every
    * construction site and compatibility check agrees. */
  val DefaultK = 6

  def empty(mBits: Long, k: Int = DefaultK): IdBloom = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    new IdBloom(new Array[Long]((mBits / 64).toInt), k)
  }

  /** All-ones filter: `contains` is true for every id. The conservative
    * stand-in when a summary must cover ids that can no longer be
    * enumerated (e.g. re-summarizing a manifest written under a
    * different bloom geometry) — membership degrades to the range
    * check, which can only over-report conflicts. */
  def saturated(mBits: Long, k: Int = DefaultK): IdBloom = {
    val b = empty(mBits, k)
    java.util.Arrays.fill(b.bits, -1L)
    b
  }

  def fromBase64(s: String, k: Int): IdBloom = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val longs = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < longs.length) { longs(i) = bb.getLong(); i += 1 }
    new IdBloom(longs, k)
  }

  /** FNV-1a 64 over raw bytes — the deterministic byte→long reduction
    * for NON-long bloom domains (string/binary column values in the
    * per-file skipping blooms). Pure function of content: a bloom
    * built in any partition/JVM probes identically at plan time. */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001B3L; i += 1 }
    h
  }

  /** External/Catalyst value → bloom domain long; None = type outside
    * the bloom contract (never added, never vetoed). Integral widths
    * collapse to the SAME long, so `int` file data still vetoes an
    * `EqualTo(col, 5L)` after a lossless type widening. */
  def hashValue(v: Any): Option[Long] = v match {
    case null => None
    case l: Long => Some(l)
    case i: java.lang.Integer => Some(i.longValue)
    case s: java.lang.Short => Some(s.longValue)
    case b: java.lang.Byte => Some(b.longValue)
    case s: String =>
      Some(hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    case u: org.apache.spark.unsafe.types.UTF8String =>
      Some(hashBytes(u.getBytes))
    case b: Array[Byte] => Some(hashBytes(b))
    case _ => None
  }
}

/** Bounded summary of the object ids a transaction touched: exact
  * count/min/max plus an [[IdBloom]] membership sketch. Replaces the
  * manifest's literal id list past [[EngineConf.objectListThreshold]].
  * `count` is informational (overlapping ids from multiple staging
  * rounds in one txn may double-count); correctness rests only on the
  * range and the bloom, both of which are superset-safe under merge. */
final case class ObjSummary(count: Long, min: Long, max: Long, bloom: IdBloom) {
  def mayContain(id: Long): Boolean =
    id >= min && id <= max && bloom.contains(id)
  /** Pure merge: neither operand is mutated (the union runs on a copied
    * bitset), so callers holding a reference to a parsed manifest's
    * summary never see it silently widened. */
  def merge(o: ObjSummary): ObjSummary =
    ObjSummary(count + o.count, math.min(min, o.min), math.max(max, o.max),
      bloom.copy().unionInPlace(o.bloom))
  /** Conservative overlap test between two summaries: range
    * intersection AND bloom intersection — an all-zero bitwise AND of
    * the two bitsets PROVES the id sets disjoint ([[IdBloom
    * .intersects]]), so two bulk writers on interleaved-but-disjoint
    * ranges no longer spuriously conflict. Still pessimistic on hash
    * collisions — pessimism costs a retry, never a lost update. Blooms
    * of differing geometry can't be intersected; those fall back to
    * the range-only verdict. */
  def mayOverlap(o: ObjSummary): Boolean =
    min <= o.max && o.min <= max &&
    (bloom.mBits != o.bloom.mBits || bloom.k != o.bloom.k ||
      bloom.intersects(o.bloom))
}
