package graft.acid

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Capped DISTINCT-id collector that rides a write job as an OBSERVED
  * metric (`Dataset.observe`), so the transaction's touched-id list is
  * known the moment the staging write finishes — previously the ids
  * were re-read from the just-written parquet files in a separate
  * Spark job (one extra pass over every staged batch, at any scale).
  *
  * Capped: a buffer past `cap` distinct ids flips to OVERFLOWED (its
  * set is dropped, merges stay O(1)), and [[finish]] returns null —
  * the caller then builds the bounded [[ObjSummary]] bloom with the
  * distributed pass exactly as before (only batches past
  * [[EngineConf.objectListThreshold]] pay it, where one extra pass is
  * amortized by the batch). Per-task accumulator payloads are bounded
  * by 8 bytes x cap.
  *
  * The observed node sits directly under the write (a RESULT stage),
  * where Spark merges accumulator updates exactly once per partition —
  * and every output is idempotent under re-merge anyway (set union);
  * the count the caller derives is `ids.length`, exact distinct. */
final class CappedIdSet(cap: Int)
    extends Aggregator[java.lang.Long, CappedIdSet.Buf, Array[Long]] {

  override def zero: CappedIdSet.Buf = new CappedIdSet.Buf

  override def reduce(b: CappedIdSet.Buf, id: java.lang.Long)
      : CappedIdSet.Buf = {
    // a NULL id flips to the fallback path ([[finish]] returns null)
    // instead of being silently skipped: the legacy read-back probe
    // recorded null ids (as 0L via unboxing), and the fallback's
    // distributed summary does the same — an id silently missing from
    // the conflict set would be the one unsound outcome
    if (!b.overflowed) {
      if (id == null) { b.overflowed = true; b.ids = null }
      else {
        b.ids.add(id.longValue)
        if (b.ids.size > cap) { b.overflowed = true; b.ids = null }
      }
    }
    b
  }

  override def merge(a: CappedIdSet.Buf, b: CappedIdSet.Buf)
      : CappedIdSet.Buf = {
    if (a.overflowed) return a
    if (b.overflowed) return b
    a.ids.addAll(b.ids)
    if (a.ids.size > cap) { a.overflowed = true; a.ids = null }
    a
  }

  /** null = overflowed (caller falls back to the bloom summary);
    * otherwise the distinct ids, sorted for determinism. */
  override def finish(b: CappedIdSet.Buf): Array[Long] =
    if (b.overflowed) null
    else {
      val out = new Array[Long](b.ids.size)
      val it = b.ids.iterator(); var i = 0
      while (it.hasNext) { out(i) = it.next().longValue; i += 1 }
      java.util.Arrays.sort(out)
      out
    }

  override def bufferEncoder: Encoder[CappedIdSet.Buf] =
    Encoders.kryo[CappedIdSet.Buf]
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CappedIdSet {
  /** Mutable per-task buffer, kryo-serialized between merge sites —
    * kryo writes a HashSet[java.lang.Long] as element varints (close
    * to 8 bytes/id), where java serialization paid the boxed-object
    * graph overhead (~10x) on every per-partition merge payload. */
  final class Buf extends Serializable {
    var overflowed: Boolean = false
    var ids: java.util.HashSet[java.lang.Long] =
      new java.util.HashSet[java.lang.Long]()
  }
}
