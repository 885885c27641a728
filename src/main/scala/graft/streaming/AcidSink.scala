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
  * (log_mgr/io.rs:99-103). Exactly-once composition: with a
  * checkpointLocation, a replayed batch re-runs `withRetry` and
  * re-inserts — idempotence at scale comes from keying obj_id off the
  * batch's own ids (as here, obj_id := event_id), so a re-commit of
  * batch N is detectable/collapsible downstream; the reference gets the
  * same property from its WAL sequence numbers.
  *
  * 100 TB notes: the commit itself is metadata-only (one manifest
  * create), the data write is the batch's parallel parquet write — no
  * driver bottleneck beyond the id-range footer reads (O(files), not
  * O(rows)).
  */
object AcidSink {

  /** Run `stream` to completion (AvailableNow), committing each
    * micro-batch transactionally into `inst`. `idCol` becomes the
    * table's obj_id. Returns the number of micro-batches committed. */
  def runInto(inst: Instance, stream: DataFrame, idCol: String): Long = {
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val q = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        inst.withRetry() { t =>
          t.insert(batch.withColumn("obj_id", col(idCol)))
        }
        batches.incrementAndGet()
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    batches.get()
  }
}
