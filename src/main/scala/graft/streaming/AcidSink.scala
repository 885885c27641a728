package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.acid.Instance

/** Streaming → transactional-table path (SURVEY.md §2.2 Q22 "sink
  * `foreachBatch` into the ACID table layer"): every micro-batch becomes
  * ONE atomic commit of the [[graft.acid.Instance]] — the Spark-first
  * analog of the reference's group commit, which flushes a whole batch
  * of transactions' WAL records with a single durable write
  * (log_mgr/io.rs:99-103).
  *
  * Exactly-once: `foreachBatch` is at-least-once (an engine restart
  * replays the last uncommitted batch), so each batch's commit is an
  * idempotent UPSERT — delete the batch's obj_ids, then insert — inside
  * one transaction. A replayed batch therefore converges to the same
  * table state instead of double-inserting; the reference gets the same
  * property from WAL sequence numbers deduplicating replayed records.
  * Pass `checkpointLocation` so the engine tracks batch progress across
  * restarts; without it a restarted query re-reads the source from
  * scratch (still convergent here — ids collapse — but wasteful).
  *
  * 100 TB notes: the commit itself is metadata-only (one manifest
  * publish), the data write is the batch's parallel parquet write. No
  * driver- or metadata-side structure is O(batch): small batches carry
  * a literal id list, and past [[graft.acid.EngineConf
  * .objectListThreshold]] keys the upsert switches to a fully
  * distributed delete (`Txn.deleteMatching`) with a bounded
  * min/max+bloom summary in the manifest. Either way the delete side
  * prunes to candidate files via manifest id-range stats, so the
  * upsert never scans the whole table.
  */
object AcidSink {

  /** Run `stream` to completion (AvailableNow), committing each
    * micro-batch transactionally into `inst`. `idCol` becomes the
    * table's obj_id. Returns the number of DISTINCT micro-batches
    * committed (a replayed batch id is counted once). */
  def runInto(inst: Instance, stream: DataFrame, idCol: String,
      checkpointLocation: Option[String] = None): Long = {
    val batchIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val keyed = batch.withColumn("obj_id", col(idCol))
        // upsert = delete-by-batch-ids + insert in ONE transaction:
        // a no-op on first delivery, the undo half on replay
        inst.withRetry() { t => t.upsert(keyed) }
        batchIds.add(batchId)
        ()
      }
    val q = checkpointLocation
      .fold(writer)(writer.option("checkpointLocation", _))
      .start()
    q.processAllAvailable()
    q.stop()
    batchIds.size().toLong
  }
}
