package graft.acid

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

import graft.acid.VersionedTable.UStat

/** Columnar (parquet) checkpoint side files — the scale path for the
  * manifest log's per-file state.
  *
  * An INLINE checkpoint carries the full fold (live files, id ranges,
  * column stats, dv lists) inside one JSON manifest; folding it is an
  * O(files) driver-side parse, and every query's file skipping walks
  * the resulting maps on the driver. That is the classic metadata
  * scale wall (the reference bounds recovery cost with checkpoints for
  * the same reason, src/system/checkpointer.rs:86-176; Delta hit it
  * and moved to parquet checkpoints). Past
  * [[EngineConf.checkpointInlineFiles]] live files, a checkpoint
  * manifest instead publishes `ckptRef` -> a parquet directory under
  * `_manifests/` holding ONE ROW PER LIVE FILE with every index the
  * planner needs:
  *
  *  - the JSON manifest stays O(1) regardless of table size;
  *  - the side files are written by a distributed Spark job that folds
  *    the PREVIOUS side files plus the O(checkpointInterval) tail of
  *    delta manifests — the driver never materializes the stat maps;
  *  - file skipping over checkpoint-covered files runs as a Spark
  *    filter over the side files ([[Instance.sidecarSurvivors]]),
  *    returning only survivor names to the driver — the skip loop is
  *    distributed, O(files / cores) per executor;
  *  - the driver-materialized part of [[VersionedTable.TableState]]
  *    shrinks to the live file NAME list and the (sparse) dv map —
  *    the stat maps stay columnar on disk.
  *
  * Stat columns are flattened to parallel arrays (same discipline as
  * the JSON codec) so the row encoder stays primitive-only and the
  * parquet schema is stable. `uKinds` carries [[UStat.kind]] as
  * single-char strings. */
private[acid] object CheckpointStore {

  /** One live data file's full planner state. `size`/`mtime` are the
    * file's on-store status, captured ONCE at checkpoint time (data
    * files are immutable, so they never go stale) — split planning
    * over checkpoint-covered files then needs ZERO per-file status
    * RPCs; 0 = unknown (synthetic/legacy rows), falls back to a
    * status fetch. */
  final case class CkptRow(
      file: String,
      idMin: Option[Long], idMax: Option[Long],
      colNames: Seq[String], colMins: Seq[Long], colMaxs: Seq[Long],
      dvList: Seq[String],
      uCols: Seq[String], uKinds: Seq[String],
      uMins: Seq[String], uMaxs: Seq[String], uNulls: Seq[Long],
      size: Long = 0L, mtime: Long = 0L)

  implicit val ckptRowEncoder: Encoder[CkptRow] = Encoders.product[CkptRow]

  def toRow(file: String, stats: Option[(Long, Long)],
      colStats: Map[String, (Long, Long)],
      dvs: Seq[String],
      fileStats: Map[String, UStat],
      size: Long = 0L, mtime: Long = 0L): CkptRow = {
    val cs = colStats.toSeq.sortBy(_._1)
    val us = fileStats.toSeq.sortBy(_._1)
    CkptRow(file, stats.map(_._1), stats.map(_._2),
      cs.map(_._1), cs.map(_._2._1), cs.map(_._2._2),
      dvs,
      us.map(_._1), us.map(_._2.kind.toString),
      us.map(_._2.min), us.map(_._2.max), us.map(_._2.nulls),
      size, mtime)
  }

  def statsOf(r: CkptRow): Option[(Long, Long)] =
    for (lo <- r.idMin; hi <- r.idMax) yield (lo, hi)

  def colStatsOf(r: CkptRow): Map[String, (Long, Long)] =
    r.colNames.indices.map(i =>
      r.colNames(i) -> (r.colMins(i), r.colMaxs(i))).toMap

  def ustatsOf(r: CkptRow): Map[String, UStat] =
    r.uCols.indices.map(i =>
      r.uCols(i) -> UStat(r.uKinds(i).head, r.uMins(i), r.uMaxs(i),
        r.uNulls(i))).toMap

  /** Sidecar parquet schema, pinned explicitly on every read so an
    * EMPTY sidecar (truncated table) still reads with the right
    * shape and a foreign file in the directory fails loudly. */
  def readRows(spark: SparkSession, path: String): Dataset[CkptRow] =
    spark.read.schema(ckptRowEncoder.schema).parquet(path).as[CkptRow]

  /** True when [lo, hi] intersects the sorted probe array. */
  private def anyIn(sorted: Array[Long], lo: Long, hi: Long): Boolean = {
    var i = java.util.Arrays.binarySearch(sorted, lo)
    if (i < 0) i = -i - 1
    i < sorted.length && sorted(i) <= hi
  }

  /** Executor-safe conservative veto: may the row's obj-id range
    * contain one of the (sorted) probe ids? Rangeless rows are always
    * candidates. Built HERE (object member) so the returned closure
    * captures only the array — never a Txn/Instance. */
  def mayContainId(sortedIds: Array[Long]): CkptRow => Boolean = r =>
    (r.idMin, r.idMax) match {
      case (Some(lo), Some(hi)) => anyIn(sortedIds, lo, hi)
      case _ => true
    }

  /** [[mayContainId]] generalized to a secondary column: Z-order
    * colStats first, then the universal footer stats' integral range;
    * rows with neither stay candidates. `pcol` is the PHYSICAL name. */
  def mayContainCol(pcol: String,
      sortedVals: Array[Long]): CkptRow => Boolean = r => {
    val ci = r.colNames.indexOf(pcol)
    val range =
      if (ci >= 0) Some((r.colMins(ci), r.colMaxs(ci)))
      else {
        val ui = r.uCols.indexOf(pcol)
        if (ui >= 0)
          UStat(r.uKinds(ui).head, r.uMins(ui), r.uMaxs(ui),
            r.uNulls(ui)).longRange
        else None
      }
    range match {
      case Some((lo, hi)) => anyIn(sortedVals, lo, hi)
      case None => true
    }
  }
}
