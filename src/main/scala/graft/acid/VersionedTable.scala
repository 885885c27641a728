package graft.acid

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Versioned ACID table layer — capability parity with db-core's
  * transactional storage engine (SURVEY.md §2.1), re-expressed Spark-first
  * as a copy-on-write commit protocol over immutable parquet files plus a
  * JSON manifest log (the idiomatic cloud/lakehouse analog of the
  * reference's WAL + MVCC machinery):
  *
  *  - begin/commit/rollback with snapshot isolation
  *    (reference: instance.rs:88-122 — TSN allocation, read CSN pinning)
  *  - snapshot reads: a transaction reads the file set of its pinned
  *    version; concurrent commits are invisible (reference MVCC resolve:
  *    block_driver.rs:461-486 walks prev_version_ptr chains — here
  *    immutability makes old versions trivially readable)
  *  - optimistic write-conflict detection replaces the reference's
  *    blocking object locks (tran_mgr.rs:85-127): commit fails if any
  *    version published after the snapshot touched the same objects
  *  - durability: manifest publish is an atomic create-if-absent
  *    (the reference's group-commit WAL flush, log_mgr/io.rs:99-103,
  *    collapses to one atomic rename-free file create per commit)
  *  - rollback discards unpublished staging (reference restores
  *    pre-images from the version store, block_driver.rs:591-601 —
  *    copy-on-write makes undo free)
  *  - recovery: opening a table replays manifests from the latest
  *    checkpoint (reference: restore checkpoint + WAL replay,
  *    instance.rs:221-304); an unpublished manifest simply never exists
  *  - checkpoints every [[Instance.checkpointInterval]] commits compact
  *    the log (reference fuzzy checkpointer: checkpointer.rs:86-176)
  *  - [[Instance.vacuum]] reclaims files unreachable from retained
  *    versions (reference version-store space reuse:
  *    version_store.rs:252-309; README "Roadmap: implement vacuuming")
  *
  * Manifests are deltas `{version, tsn, added, removed, objects}`;
  * snapshot state = latest checkpoint ≤ v + replay of (ckpt, v].
  * All metadata is O(files-touched), data IO is O(rows-touched) — the
  * layout scales to object stores (atomic-create is the only primitive
  * required of the filesystem).
  */
object VersionedTable {

  /** Width of the per-transaction sequence in an object id; the packed
    * id mirrors the reference's structured ObjectId (defs.rs:12-18). */
  val SeqBits = 20

  final case class Manifest(
      version: Long,
      tsn: Long,
      schemaDDL: String,
      added: Seq[String],
      removed: Seq[String],
      objects: Seq[Long],
      checkpoint: Boolean,
      allFiles: Seq[String])

  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  private[acid] def toJson(m: Manifest): String = {
    def arrS(xs: Seq[String]) = xs.map(x => "\"" + esc(x) + "\"").mkString("[", ",", "]")
    def arrL(xs: Seq[Long]) = xs.mkString("[", ",", "]")
    s"""{"version":${m.version},"tsn":${m.tsn},"schemaDDL":"${esc(m.schemaDDL)}",""" +
      s""""added":${arrS(m.added)},"removed":${arrS(m.removed)},""" +
      s""""objects":${arrL(m.objects)},"checkpoint":${m.checkpoint},""" +
      s""""allFiles":${arrS(m.allFiles)}}"""
  }

  private[acid] def fromJson(s: String): Manifest = {
    // minimal parser for the fixed shape above (keys never contain
    // escapes; values are numbers, bools, or string arrays)
    def strField(k: String): String = {
      val i = s.indexOf("\"" + k + "\":\"") + k.length + 4
      // escape-aware scan + single-pass unescape (handles \\ before ",
      // and the \uXXXX forms esc() emits for control characters)
      val sb = new StringBuilder; var j = i
      var done = false
      while (!done) {
        s(j) match {
          case '"' => done = true
          case '\\' =>
            s(j + 1) match {
              case 'n' => sb.append('\n'); j += 2
              case 'u' =>
                sb.append(Integer.parseInt(s.substring(j + 2, j + 6), 16).toChar)
                j += 6
              case c => sb.append(c); j += 2 // \" and \\
            }
          case c => sb.append(c); j += 1
        }
      }
      sb.toString
    }
    def rawField(k: String): String = {
      val i = s.indexOf("\"" + k + "\":") + k.length + 3
      var j = i; var depth = 0
      while (j < s.length && (depth > 0 || (s(j) != ',' && s(j) != '}'))) {
        if (s(j) == '[') depth += 1
        if (s(j) == ']') depth -= 1
        j += 1
      }
      s.substring(i, j)
    }
    def strArr(k: String): Seq[String] = {
      val raw = rawField(k).trim.stripPrefix("[").stripSuffix("]")
      if (raw.isEmpty) Nil
      else raw.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
    }
    def longArr(k: String): Seq[Long] = {
      val raw = rawField(k).trim.stripPrefix("[").stripSuffix("]")
      if (raw.isEmpty) Nil else raw.split(",").toSeq.map(_.trim.toLong)
    }
    Manifest(rawField("version").toLong, rawField("tsn").toLong,
      strField("schemaDDL"), strArr("added"), strArr("removed"),
      longArr("objects"), rawField("checkpoint").toBoolean, strArr("allFiles"))
  }

  /** One-time datastore initialization (reference:
    * initialize_datastore, datastore.rs:132-178). */
  def create(spark: SparkSession, path: String, schema: StructType): Instance = {
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(path, "data"))
    fs.mkdirs(new Path(path, "_manifests"))
    val inst = new Instance(spark, path)
    if (!inst.publish(Manifest(0L, 0L, schema.toDDL, Nil, Nil, Nil,
        checkpoint = true, allFiles = Nil)))
      throw new IllegalStateException(
        s"datastore already initialized at $path (v0 manifest exists)")
    inst
  }

  /** Open an existing datastore, resolving the committed head
    * (reference: Instance::new + restore_state, instance.rs:42-75). */
  def open(spark: SparkSession, path: String): Instance =
    new Instance(spark, path)
}

/** Conflict = another transaction committed the same objects after this
  * transaction's snapshot (optimistic analog of tran_mgr lock waits). */
final class ConflictException(msg: String) extends RuntimeException(msg)

final class Instance(val spark: SparkSession, val root: String) {
  import VersionedTable._

  val checkpointInterval = 10

  private val fs: FileSystem =
    FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
  private val manifestDir = new Path(root, "_manifests")
  private val dataDir = new Path(root, "data")
  // unique within a process via the atomic; cross-process collisions made
  // improbable by mixing wall clock and nanotime (a production deployment
  // would allocate TSNs from the log itself)
  private val tsnSeq = new AtomicLong(
    (System.currentTimeMillis() << 20) ^ (System.nanoTime() & 0xFFFFF))

  private def manifestPath(v: Long) = new Path(manifestDir, f"v$v%020d.json")

  private def readManifest(v: Long): Manifest = {
    val in = fs.open(manifestPath(v))
    try fromJson(new String(in.readAllBytes(), "UTF-8")) finally in.close()
  }

  /** Latest committed version (head of the log). */
  def latestVersion: Long = {
    val vs = fs.listStatus(manifestDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toLong)
    if (vs.isEmpty) -1L else vs.max
  }

  /** File set + schema at a version: replay from the nearest checkpoint
    * (reference recovery replay: instance.rs:239-304). Scans backward to
    * the latest checkpoint <= v, so cost is O(checkpointInterval)
    * manifest reads, not O(v). */
  def stateAt(v: Long): (Seq[String], String) = {
    var tail = List.empty[Manifest]
    var cv = v
    var ckpt: Manifest = null
    while (ckpt == null) {
      val m = readManifest(cv)
      if (m.checkpoint) ckpt = m else { tail = m :: tail; cv -= 1 }
    }
    var files = ckpt.allFiles.toSet
    var ddl = ckpt.schemaDDL
    tail.foreach { m =>
      files = files -- m.removed ++ m.added
      ddl = m.schemaDDL
    }
    (files.toSeq.sorted, ddl)
  }

  /** Version-pinned snapshot read (reference: open_read at the txn's
    * snapshot CSN, instance.rs:126-134). */
  def snapshot(v: Long): DataFrame = {
    val (files, ddl) = stateAt(v)
    viewOf(files, ddl)
  }

  /** DataFrame over an explicit file set (shared by committed snapshots
    * and transaction-local views). */
  private[acid] def viewOf(files: Seq[String], ddl: String): DataFrame = {
    val schema = StructType.fromDDL(ddl)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema)
        .parquet(files.map(f => new Path(dataDir, f).toString): _*)
  }

  /** Current committed table contents. */
  def read(): DataFrame = snapshot(latestVersion)

  private[acid] def publish(m: Manifest): Boolean = {
    try {
      val out = fs.create(manifestPath(m.version), false) // put-if-absent
      try out.write(toJson(m).getBytes("UTF-8")) finally out.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  /** Begin a transaction: allocate a TSN, pin the snapshot
    * (reference: begin_transaction, instance.rs:88-99 + tran_mgr.rs:66-73). */
  def begin(): Txn = new Txn(this, tsnSeq.incrementAndGet(), latestVersion)

  /** Refresh a transaction's snapshot to the latest commit
    * (reference: update_read_csn, instance.rs:384-386). */
  def refresh(txn: Txn): Unit = txn.readVersion = latestVersion

  private[acid] def writeStaged(df: DataFrame, txn: Txn): Seq[String] = {
    // UUID suffix: staging dirs can never collide even if two processes
    // draw the same tsn
    val sub = f"t${txn.tsn}%x-${txn.stagedBatch.incrementAndGet()}-" +
      java.util.UUID.randomUUID().toString.take(8)
    val out = new Path(dataDir, sub).toString
    df.write.parquet(out)
    fs.listStatus(new Path(out)).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).map(n => s"$sub/$n").toSeq
  }

  /** Commit: optimistic conflict check against versions published after
    * the snapshot, then atomic manifest create; on a losing race the
    * check reruns at the new head (reference: commit + lock release,
    * instance.rs:102-111, 212-219).
    *
    * Conflict = an interleaved commit touched the same objects OR
    * rewrote any of the same files. The file check is essential: the
    * copy-on-write unit is a file, so two transactions modifying
    * disjoint objects that live in one file would otherwise both
    * republish stale copies of each other's rows. */
  def commit(txn: Txn): Long = this.synchronized {
    if (txn.added.isEmpty && txn.removed.isEmpty) {
      deleteRetired(txn) // e.g. insert-then-delete-all within one txn
      return txn.readVersion
    }
    var attempt = latestVersion + 1
    while (true) {
      // conflict window = versions committed after our snapshot
      ((txn.readVersion + 1) until attempt).foreach { v =>
        val m = readManifest(v)
        val objOverlap = m.objects.toSet.intersect(txn.objects.toSet)
        val fileOverlap = m.removed.toSet.intersect(txn.removed.toSet)
        if (objOverlap.nonEmpty || fileOverlap.nonEmpty) {
          txn.abort()
          throw new ConflictException(
            if (objOverlap.nonEmpty)
              s"objects ${objOverlap.take(5).mkString(",")} committed by tsn ${m.tsn}"
            else
              s"files ${fileOverlap.take(3).mkString(",")} rewritten by tsn ${m.tsn}")
        }
      }
      val m = Manifest(attempt, txn.tsn, txn.schemaDDL.getOrElse(currentDDL),
        txn.added.toSeq, txn.removed.toSeq, txn.objects.toSeq,
        checkpoint = attempt % checkpointInterval == 0,
        allFiles = if (attempt % checkpointInterval == 0)
          (stateAt(attempt - 1)._1.toSet -- txn.removed ++ txn.added).toSeq.sorted
        else Nil)
      if (publish(m)) { deleteRetired(txn); return attempt }
      val head = latestVersion
      if (head + 1 == attempt) {
        // no other writer advanced the log: the create failed for a real
        // IO reason, not a lost race — surface it instead of spinning
        txn.abort()
        throw new java.io.IOException(
          s"cannot publish manifest v$attempt at $root")
      }
      attempt = head + 1 // lost the race: re-check the new window
    }
    -1L
  }

  private def currentDDL: String = stateAt(latestVersion)._2

  /** Rollback: discard staged files — nothing was published, so undo is
    * free (reference restores pre-images: block_driver.rs:591-601). */
  def rollback(txn: Txn): Unit = txn.abort()

  /** Delete data files unreachable from the last `retainVersions`
    * versions (reference version-store extent reuse + Roadmap vacuum).
    * Only files referenced by some committed manifest are candidates —
    * staged files of in-flight transactions appear in no manifest and
    * must never be reclaimed. */
  def vacuum(retainVersions: Int): Int = {
    val head = latestVersion
    val horizon = math.max(0L, head - retainVersions + 1)
    val live = (horizon to head).flatMap(stateAt(_)._1).toSet
    val everCommitted = (0L to head).map(readManifest)
      .flatMap(m => m.added ++ m.allFiles).toSet
    var removed = 0
    (everCommitted -- live).foreach { rel =>
      val p = new Path(dataDir, rel)
      if (fs.exists(p)) { fs.delete(p, false); removed += 1 }
    }
    removed
  }

  private[acid] def readStagedIds(staged: Seq[String]): Seq[Long] =
    spark.read.parquet(staged.map(f => new Path(dataDir, f).toString): _*)
      .select("obj_id").distinct().collect().map(_.getLong(0)).toSeq

  private[acid] def deleteStagingDirs(txn: Txn): Unit =
    (txn.added ++ txn.retired).map(_.split('/').head).distinct
      .foreach(d => fs.delete(new Path(dataDir, d), true))

  /** Physically reclaim staged files the transaction itself superseded
    * (they appear in no manifest, so vacuum can never see them). */
  private[acid] def deleteRetired(txn: Txn): Unit =
    txn.retired.foreach(f => fs.delete(new Path(dataDir, f), false))
}

/** A transaction handle (reference: Transaction, instance.rs:369-397). */
final class Txn private[acid] (inst: Instance, val tsn: Long,
    @volatile private[acid] var readVersion: Long) {
  import VersionedTable._

  private[acid] val added = mutable.ArrayBuffer[String]()
  private[acid] val removed = mutable.ArrayBuffer[String]()
  private[acid] val objects = mutable.LinkedHashSet[Long]()
  // staged files superseded by a LATER mutation of the same transaction —
  // never published, physically reclaimed at commit/abort
  private[acid] val retired = mutable.ArrayBuffer[String]()
  private[acid] var schemaDDL: Option[String] = None
  private[acid] val stagedBatch = new AtomicLong(0)
  private val objSeq = new AtomicLong(0)

  /** Read-your-own-writes view (reference MVCC resolve accepts entries
    * with `tsn == my_tsn`, block_driver.rs:461-486): the pinned
    * snapshot's file set minus files this transaction removed plus its
    * staged files. A second mutation in the same transaction therefore
    * sees — and rewrites — the FIRST mutation's output, not the stale
    * base files (without this, manifests could remove one base file
    * twice while publishing both rewrites, resurrecting deleted rows). */
  def read(): DataFrame = {
    val (base, snapDdl) = inst.stateAt(readVersion)
    val files = (base.toSet -- removed ++ added).toSeq.sorted
    inst.viewOf(files, schemaDDL.getOrElse(snapDdl))
  }

  /** Allocate a globally-unique object id: (tsn << SeqBits) | seq — the
    * structured-id analog of the reference's physical ObjectId
    * (defs.rs:12-18). The tsn is masked to the 43 bits that fit beside
    * the sequence (uniqueness rests on the low 43 bits of the seeded
    * tsn: ~23 bits of wall-clock millis xor 20 bits of nanotime — a
    * production deployment would allocate tsns from the commit log);
    * the sequence is bounds-checked so it can never bleed into the tsn
    * field and collide with a neighboring transaction's ids. */
  def newObjectId(): Long = {
    val seq = objSeq.incrementAndGet()
    if (seq >= (1L << SeqBits))
      throw new IllegalStateException(
        s"transaction $tsn exceeded ${1L << SeqBits} object allocations; " +
        "split the load across transactions")
    ((tsn & ((1L << (63 - SeqBits)) - 1)) << SeqBits) | seq
  }

  /** Insert rows that already carry an `obj_id` column
    * (reference: open_create + write_next, instance.rs:173-187).
    * Object ids for conflict tracking are read back from the STAGED
    * files, so a nondeterministic input can't desynchronize the data
    * from the guarded id set (and the input runs exactly once). The id
    * list itself is driver-side metadata — bounded by transaction size;
    * at extreme scale a min/max+bloom summary would replace it. */
  def insert(df: DataFrame): Unit = {
    val staged = inst.writeStaged(df, this)
    added ++= staged
    objects ++= inst.readStagedIds(staged)
    schemaDDL = Some(df.schema.toDDL)
  }

  /** Delete objects by id: copy-on-write rewrite of only the files that
    * contain them (reference: delete chain tombstoning,
    * block_driver.rs:210-249). Reads the txn-local view, so repeated
    * mutations in one transaction compose (read-your-own-writes). */
  def delete(ids: Seq[Long]): Unit = {
    val snap = read().withColumn("_file", input_file_name())
    val hit = snap.filter(col("obj_id").isin(ids: _*))
      .select("_file").distinct().collect().map(_.getString(0))
    if (hit.nonEmpty) {
      val survivors = snap.filter(col("_file").isin(hit.toSeq: _*))
        .filter(!col("obj_id").isin(ids: _*)).drop("_file")
      val rewritten = if (survivors.isEmpty) Nil
        else inst.writeStaged(survivors, this)
      retire(hit.toSeq.map(relativize))
      added ++= rewritten
    }
    objects ++= ids
  }

  /** Update objects by id with a column transformation — copy-on-write
    * (reference: open_write under object lock, instance.rs:141-168;
    * blocking lock replaced by commit-time conflict detection). */
  def update(ids: Seq[Long], transform: DataFrame => DataFrame): Unit = {
    val snap = read().withColumn("_file", input_file_name())
    val hit = snap.filter(col("obj_id").isin(ids: _*))
      .select("_file").distinct().collect().map(_.getString(0))
    if (hit.nonEmpty) {
      val touched = snap.filter(col("_file").isin(hit.toSeq: _*)).drop("_file")
      val untouchedRows = touched.filter(!col("obj_id").isin(ids: _*))
      val updatedRows = transform(touched.filter(col("obj_id").isin(ids: _*)))
      val rewritten = inst.writeStaged(untouchedRows.unionByName(updatedRows), this)
      retire(hit.toSeq.map(relativize))
      added ++= rewritten
    }
    objects ++= ids
  }

  /** A rewritten file that this transaction itself staged is dropped
    * from `added` (it was never published, so the manifest must not
    * list it as removed); only base-version files go to `removed`. */
  private def retire(files: Seq[String]): Unit = files.foreach { f =>
    val i = added.indexOf(f)
    if (i >= 0) { added.remove(i); retired += f }
    else removed += f
  }

  private def relativize(fileUri: String): String = {
    val parts = fileUri.split('/')
    parts.takeRight(2).mkString("/")
  }

  private[acid] def abort(): Unit = {
    inst.deleteStagingDirs(this)
    added.clear(); removed.clear(); objects.clear(); retired.clear()
  }
}
