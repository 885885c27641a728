package graft.acid

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Literal, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Structured-Streaming source over a [[VersionedTable]]'s commit log —
  * the Spark-native analog of tailing the reference's WAL for new data
  * (log records are consumed downstream by LSN order,
  * log_mgr/io.rs:354-373; here the manifest log IS the log, and stream
  * offsets ARE table versions).
  *
  * `spark.readStream.format("graft-cdf").option("path", root).load()`
  * delivers the rows each data commit APPENDED, tagged `_version`, in
  * commit order — Delta-`readStream` semantics:
  *  - pure-insert commits stream their inserted rows exactly;
  *  - layout-only commits (compaction, checkpointing) stream NOTHING —
  *    they change bytes, not content;
  *  - commits that remove files (update/delete/restore) FAIL the
  *    stream by default (an append stream cannot represent them);
  *    `.option("ignoreChanges", true)` streams their added files'
  *    rows instead (post-images plus CoW-copied neighbors — the same
  *    documented caveat as Delta's `ignoreChanges`), and exact
  *    row-level CDC remains available as the batch
  *    [[Instance.changes]];
  *  - `.option("startingVersion", v)` begins at commit v (default 1).
  *
  * `.option("readChangeFeed", true)` upgrades the feed to typed change
  * events (Delta's CDF-read analog): every row gains `_change_type` —
  * added-file rows stream as `insert`, and a MERGE-ON-READ delete
  * commit (deletion-vector delta, no file delta) streams its
  * newly-masked rows as `delete` events, read from the still-live
  * masked file restricted to the mask DELTA vs the previous version —
  * so a downstream sync consumes MoR deletes incrementally instead of
  * needing a batch [[Instance.changes]] reconciliation pass. Replay
  * stays byte-identical (masks are immutable sidecars resolved from
  * pinned manifests). Commits that REMOVE files still need
  * `ignoreChanges` (a CoW rewrite's row identity is not recoverable
  * from file deltas); dv CLEARS (restore un-deletes) carry file
  * deltas and fall under the same rule. Vacuum retention must cover
  * the stream's lag — the masked file must still exist when the
  * delete batch is planned, the same contract as added files.
  *
  * Exactly-once: offsets are table versions checkpointed by the
  * engine's offset log, and a replayed `(start, end]` batch re-plans
  * from immutable manifests, so re-delivery is byte-identical.
  * [[Instance.vacuum]] retention must cover the stream's maximum lag —
  * the same contract every lakehouse streaming source carries.
  *
  * Scale: the driver reads ONE manifest per commit per batch (plus a
  * file-status per added file); rows never touch the driver. Each
  * added file is one [[InputPartition]] read by Spark's own vectorized
  * parquet reader on the executors ([[ParquetFileFormat
  * .buildReaderWithPartitionValues]] — the exact machinery behind
  * `FileSourceScanExec`), with hive-partition values (k=v staging
  * segments) rebuilt as constant partition columns, never scanned. */
final class ChangeFeedProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdf"

  private def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-cdf requires .option(\"path\", tableRoot)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeFeedSource.outputSchema(
      VersionedTable.open(SparkSession.active, rootOf(options)),
      options.getBoolean("readChangeFeed", false))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ChangeFeedTable(schema,
      rootOf(new CaseInsensitiveStringMap(properties)))
}

private[acid] object ChangeFeedSource {
  def outputSchema(inst: Instance, changeFeed: Boolean = false): StructType = {
    val (_, ddl) = inst.stateAt(inst.latestVersion)
    val base = StructType.fromDDL(ddl)
      .add(StructField("_version", LongType, nullable = false))
    if (changeFeed)
      base.add(StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false))
    else base
  }

  def partPairs(rel: String): Seq[(String, String)] =
    rel.split('/').drop(1).dropRight(1).toSeq.flatMap { seg =>
      val i = seg.indexOf('=')
      if (i > 0) Some(seg.substring(0, i) -> seg.substring(i + 1)) else None
    }

  /** One [[CdfPartition]] per file appended by each data commit in
    * `(lo, hi]` — shared by the micro-batch stream and the bounded
    * batch read; manifests are immutable, so planning the same range
    * twice is byte-identical (the replay guarantee). */
  def planRange(inst: Instance, schema: StructType, lo: Long, hi: Long,
      ignoreChanges: Boolean, changeFeed: Boolean = false,
      ren: Map[String, String] = Map.empty)
      : Array[CdfPartition] = {
    val out = Array.newBuilder[CdfPartition]
    // `schema` and `ren` are the logical schema and column mapping the
    // CALLER captured together (stream start / batch plan); files of
    // every version spell the fixed PHYSICAL names, so one mapping
    // translates for the whole range — passing them as a pair keeps
    // the partition-type lookup below consistent with the reader
    // factory's resolution even if a rename commits mid-plan
    // (file, version, change type, keep-mask) specs first; statuses
    // are then fetched on the bounded driver pool — each is a ~10ms
    // RPC on an object store, and a bursty commit range adds files ×
    // versions of them (the serial walk was the planner bottleneck)
    val specs = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, String, Option[VersionedTable.DvMask])]
    // dv state rolls FORWARD beside the walk (seeded by one
    // O(checkpointInterval) replay at `lo`), so a range dense with MoR
    // commits costs O(range) manifest reads, not O(range × interval) —
    // the same roll-forward discipline as Instance.changes()
    var prevDvs: Map[String, Seq[String]] =
      if (changeFeed) inst.tableStateAt(lo).dvs else Map.empty
    ((lo + 1) to hi).foreach { v =>
      val m = inst.readManifest(v)
      val priorDvs = prevDvs
      if (changeFeed) {
        var rolled = prevDvs -- m.removed
        m.dvs.foreach { case (f, l) =>
          rolled = if (l.isEmpty) rolled - f else rolled.updated(f, l)
        }
        prevDvs = rolled
      }
      val isData = m.objects.nonEmpty || m.objSummary.isDefined
      if (isData) {
        // a merge-on-read delete commit (dv delta, no file delta) is a
        // row-removal too — representable ONLY as typed change events
        // (readChangeFeed streams the newly-masked rows as deletes);
        // without that mode it fails like a CoW delete, and under
        // ignoreChanges it simply adds no files. File REMOVALS stay
        // unrepresentable even as events (a rewrite's row identity is
        // not recoverable from file deltas).
        // a commit whose rewrite staged exact change images (cdcExact,
        // EngineConf.changeDataFeed) is FULLY representable in
        // readChangeFeed mode: its cdc side files stream verbatim
        // (insert/delete/update_preimage/update_postimage in-file) and
        // its added data files must NOT also stream — the images
        // already include the inserts
        val cdcServed = changeFeed && m.cdcExact
        val unrepresentable =
          (m.removed.nonEmpty && !cdcServed) ||
          (m.dvs.nonEmpty && !changeFeed)
        if (unrepresentable && !ignoreChanges)
          throw new IllegalStateException(
            s"graft-cdf: version $v of ${inst.root} removes rows (update/" +
            "delete/restore) — an append stream cannot represent it. Set " +
            ".option(\"readChangeFeed\", true) for typed change events " +
            "(exact when the table writes change data, " +
            "EngineConf.changeDataFeed; merge-on-read deletes always), " +
            ".option(\"ignoreChanges\", true) to stream post-image rows, " +
            "or consume Instance.changes() for exact row-level CDC.")
        if (cdcServed)
          m.cdc.foreach { rel => specs += ((rel, v, "__cdc__", None)) }
        else
          m.added.foreach { rel => specs += ((rel, v, "insert", None)) }
        if (changeFeed && m.dvs.nonEmpty) {
          // DELETE events: for each masked file, the mask DELTA vs the
          // previous version (prior-masked rows already streamed as
          // deletes by their own commit; a clear contributes nothing)
          val prior = priorDvs
          m.dvs.toSeq.sortBy(_._1).foreach { case (f, list) =>
            if (!m.removed.contains(f) && list.nonEmpty) {
              val cur = inst.resolveDvs(Map(f -> list), Seq(f))(f)
              val pre = prior.get(f).filter(_.nonEmpty)
                .map(l => inst.resolveDvs(Map(f -> l), Seq(f))(f))
                .getOrElse(VersionedTable.DvMask.empty)
              val newIds = cur.ids.filter(id =>
                java.util.Arrays.binarySearch(pre.ids, id) < 0)
              val newPos = GraftBitmap(cur.pos.iterator
                .filterNot(pre.pos.contains).toSeq)
              if (newIds.nonEmpty || newPos.nonEmpty)
                specs += ((f, v, "delete",
                  Some(VersionedTable.DvMask(newIds, newPos))))
            }
          }
        }
      }
    }
    val statuses = inst.pooledMap(specs.map(_._1).distinct.toSeq)(rel =>
      rel -> inst.fs.getFileStatus(new Path(inst.dataDir, rel))).toMap
    specs.foreach { case (rel, v, changeType, keep) =>
      val isCdc = changeType == "__cdc__"
      val pairs = if (isCdc) Nil else partPairs(rel)
      val status = statuses(rel)
      // `k` spells the PHYSICAL column name
      val consts = pairs.map { case (k, raw) =>
        val dt = schema.find(f =>
            ren.getOrElse(f.name, f.name) == k).map(_.dataType)
          .getOrElse(org.apache.spark.sql.types.StringType)
        val s = ExternalCatalogUtils.unescapePathName(raw)
        if (s == "__HIVE_DEFAULT_PARTITION__") null
        else Cast(Literal(org.apache.spark.unsafe.types.UTF8String
            .fromString(s), org.apache.spark.sql.types.StringType), dt,
          Option(SQLConf.get.sessionLocalTimeZone)).eval(null)
      } :+ (v: Any)
      // cdc side files carry _change_type IN-FILE; every other spec
      // gets it as a per-partition constant
      val partRow = new GenericInternalRow(
        (if (changeFeed && !isCdc)
          consts :+ org.apache.spark.unsafe.types.UTF8String
            .fromString(changeType)
        else consts).toArray)
      out += CdfPartition(
        PartitionedFile(partRow, SparkPath.fromPath(status.getPath),
          0L, status.getLen, Array.empty, status.getModificationTime,
          status.getLen),
        pairs.map(_._1), keep, isCdc)
    }
    out.result()
  }

  /** Per-layout prepared parquet readers for a planned partition set
    * (row-based: the DSv2 PartitionReader contract here is
    * InternalRow). */
  /** Synthetic output columns appended by the source (never read from
    * files; carried as partition constants). */
  private[acid] val MetaCols = Set("_version", "_change_type")

  def readerFactory(spark: SparkSession, schema: StructType,
      planned: Array[CdfPartition],
      ren: Map[String, String] = Map.empty,
      changeFeed: Boolean = false): CdfReaderFactory = {
    val fmt = new ParquetFileFormat
    // files + layouts spell PHYSICAL names; `schema` is logical — the
    // reader plans physical and the order projection restores logical
    // positions (names never reach the output rows)
    def phys(n: String) = ren.getOrElse(n, n)
    def needRi(p: CdfPartition) = p.keep.exists(_.pos.nonEmpty)
    val layouts = planned.map(p => (p.layout, needRi(p), p.cdc)).distinct
      .map { case (layout, ri, isCdc) =>
        val partFields = (if (isCdc) Nil
          else layout.map(k =>
            schema.find(f => phys(f.name) == k)
              .map(f => f.copy(name = k))
              .getOrElse(StructField(k,
                org.apache.spark.sql.types.StringType)))) ++
          (StructField("_version", LongType, nullable = false) +:
            (if (changeFeed && !isCdc)
              Seq(StructField("_change_type",
                org.apache.spark.sql.types.StringType, nullable = false))
            else Nil))
        // cdc side files physicalize EVERY table column and carry
        // _change_type in-file; ordinary files drop layout columns
        var fileSchema =
          if (isCdc)
            StructType(
              schema.filterNot(f => MetaCols(f.name))
                .map(f => f.copy(name = phys(f.name))) :+
              StructField("_change_type",
                org.apache.spark.sql.types.StringType, nullable = false))
          else StructType(
            schema.filterNot(f => layout.contains(phys(f.name)) ||
                MetaCols(f.name))
              .map(f => f.copy(name = phys(f.name))))
        // delete partitions with a POSITIONAL mask filter by the
        // parquet row index (requested via the temporary metadata
        // column; file-absolute)
        if (ri)
          fileSchema = StructType(fileSchema :+ StructField(
            ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME, LongType))
        // a FRESH hadoop conf PER prepared reader: the builder writes
        // its requested schema into the conf, so sharing one across
        // layouts lets the last-built reader's schema clobber every
        // earlier one's (misaligned rows at read time)
        val reader = fmt.buildReaderWithPartitionValues(spark, fileSchema,
          StructType(partFields), fileSchema, Nil,
          Map(org.apache.spark.sql.execution.datasources.FileFormat
            .OPTION_RETURNING_BATCH -> "false"),
          spark.sessionState.newHadoopConf())
        val physical = StructType(fileSchema ++ partFields)
        val order = schema.map(f =>
          if (MetaCols(f.name)) physical.fieldIndex(f.name)
          else physical.fieldIndex(phys(f.name))).toArray
        val idIdx =
          if (physical.fieldNames.contains("obj_id"))
            physical.fieldIndex("obj_id") else -1
        val riIdx = if (ri) physical.fieldIndex(
          ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME) else -1
        (layout, ri, isCdc) ->
          CdfLayoutReader(reader, physical, order, idIdx, riIdx)
      }.toMap
    new CdfReaderFactory(layouts)
  }
}

private[acid] final class ChangeFeedTable(schema: StructType, root: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-cdf `$root`"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ChangeFeedScan(schema, root,
        startingVersion = Option(options.get("startingVersion"))
          .map(_.toLong).getOrElse(1L),
        ignoreChanges = options.getBoolean("ignoreChanges", false),
        maxVersionsPerTrigger = Option(options.get("maxVersionsPerTrigger"))
          .map(_.toLong),
        endingVersion = Option(options.get("endingVersion")).map(_.toLong),
        changeFeed = options.getBoolean("readChangeFeed", false))
    }
}

private[acid] final class ChangeFeedScan(schema: StructType, root: String,
    startingVersion: Long, ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Long],
    endingVersion: Option[Long] = None,
    changeFeed: Boolean = false) extends Scan {
  override def readSchema(): StructType = schema
  /** Bounded batch read of the same append feed
    * (`spark.read.format("graft-cdf")` with `startingVersion` /
    * `endingVersion`): one-shot commit-log catch-up without a
    * checkpoint — e.g. backfilling a downstream table from commit N,
    * or SQL over a commit interval via a temp view. The range is
    * pinned at planning; identical semantics to draining the stream
    * over `(startingVersion-1, endingVersion]`. */
  override def toBatch: Batch = new Batch {
    private lazy val spark = SparkSession.active
    private lazy val inst = VersionedTable.open(spark, root)
    // ONE capture shared by planning and the reader factory, so a
    // rename committing between the two can't misalign them
    private lazy val ren = inst.tableStateAt(inst.latestVersion).renames
    private lazy val planned = ChangeFeedSource.planRange(inst, schema,
      startingVersion - 1,
      endingVersion.getOrElse(inst.latestVersion), ignoreChanges,
      changeFeed, ren)
    override def planInputPartitions(): Array[InputPartition] =
      planned.toArray[InputPartition]
    override def createReaderFactory(): PartitionReaderFactory =
      ChangeFeedSource.readerFactory(spark, schema, planned, ren, changeFeed)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangeFeedStream(schema, root, startingVersion, ignoreChanges,
      maxVersionsPerTrigger, changeFeed)
}

private[acid] final case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** One data file of one commit: an ADDED file streamed whole
  * (`keep` empty), or — readChangeFeed mode — a MASKED file whose
  * newly-deleted rows stream as delete events (`keep` = the mask
  * delta; only matching rows survive), or — `cdc` — a CHANGE-DATA
  * side file written by the committing rewrite itself, whose rows
  * already carry `_change_type` in-file (exact pre/post images of an
  * UPDATE/MERGE/row-level/restore commit). `layout` is the hive `k=v`
  * column sequence parsed from its staging path (always empty for
  * cdc side files — they physicalize every column). */
private[acid] final case class CdfPartition(
    file: PartitionedFile, layout: Seq[String],
    keep: Option[VersionedTable.DvMask] = None,
    cdc: Boolean = false) extends InputPartition

private[acid] final case class CdfLayoutReader(
    reader: PartitionedFile => Iterator[InternalRow],
    physical: StructType, order: Array[Int], idIdx: Int, riIdx: Int)

private[acid] final class ChangeFeedStream(schema: StructType, root: String,
    startingVersion: Long, ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Long],
    changeFeed: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  @transient private lazy val spark = SparkSession.active
  @transient private lazy val inst = VersionedTable.open(spark, root)
  // column mapping captured ONCE at stream start, beside the (already
  // captured) schema — physical names never change, so one mapping
  // resolves every version's files for the whole run. Re-resolving at
  // latestVersion per batch would silently mis-read after a mid-stream
  // re-rename (the map is keyed by the NEW logical name, so phys()
  // would miss and the column would read NULL); instead, drift against
  // the captured logical names FAILS the stream loudly (Delta's
  // schema-change semantics — restart to adopt the new mapping).
  @transient private lazy val ren0: Map[String, String] =
    inst.tableStateAt(inst.latestVersion).renames
  // planInputPartitions -> createReaderFactory run in sequence on the
  // driver for the same batch; the factory needs the batch's distinct
  // partition layouts to prepare one reader per layout
  @transient @volatile private var planned: Array[CdfPartition] = Array.empty
  // Trigger.AvailableNow pins the head at trigger start so the run
  // terminates even while writers keep committing
  @transient @volatile private var availableNowCap: Long = -1L

  override def initialOffset(): Offset = VersionOffset(startingVersion - 1)
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)
  override def latestOffset(): Offset = VersionOffset(inst.latestVersion)
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = inst.latestVersion
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = inst.latestVersion
    val capped = if (availableNowCap >= 0) math.min(head, availableNowCap)
      else head
    // maxVersionsPerTrigger bounds each micro-batch's commit span so a
    // long catch-up (or a bursty writer) drains as steady bounded
    // batches instead of one giant replay — the planner's IO is
    // O(versions per batch), so this is the knob that caps it
    VersionOffset(maxVersionsPerTrigger.fold(capped)(n =>
      math.min(capped, start.asInstanceOf[VersionOffset].v + math.max(1L, n))))
  }
  override def reportLatestOffset(): Offset = VersionOffset(inst.latestVersion)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    // mapping-drift gate: if any column this stream captured at start
    // has since been renamed again, dropped, or re-typed, planning
    // with the captured (schema, ren0) would silently emit NULLs —
    // fail the run instead; a restart re-captures and replays exactly
    val cur = inst.tableStateAt(inst.latestVersion)
    val curSchema = StructType.fromDDL(cur.ddl)
    val drifted = schema.filterNot(f =>
        ChangeFeedSource.MetaCols(f.name)).flatMap { f =>
      curSchema.find(_.name == f.name) match {
        case None => Some(s"${f.name} (dropped or renamed)")
        case Some(g) if cur.renames.getOrElse(f.name, f.name) !=
            ren0.getOrElse(f.name, f.name) =>
          Some(s"${f.name} (column mapping changed)")
        case Some(g) if g.dataType != f.dataType =>
          Some(s"${f.name} (type ${f.dataType.simpleString} -> " +
            s"${g.dataType.simpleString})")
        case _ => None
      }
    }
    if (drifted.nonEmpty)
      throw new IllegalStateException(
        s"graft-cdf: table schema/column mapping changed mid-stream for " +
        s"column(s) ${drifted.mkString(", ")} at ${inst.root}; restart " +
        "the stream to adopt the new schema (offsets replay exactly)")
    val ps = ChangeFeedSource.planRange(inst, schema,
      start.asInstanceOf[VersionOffset].v,
      end.asInstanceOf[VersionOffset].v, ignoreChanges, changeFeed, ren0)
    planned = ps
    ps.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChangeFeedSource.readerFactory(spark, schema, planned, ren0, changeFeed)
}

private[acid] final class CdfReaderFactory(
    layouts: Map[(Seq[String], Boolean, Boolean), CdfLayoutReader])
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[CdfPartition]
    val needRi = cp.keep.exists(_.pos.nonEmpty)
    val lr = layouts((cp.layout, needRi, cp.cdc))
    // the prepared reader may hand back vectorized ColumnarBatches
    // disguised as InternalRow (the FileScanRDD contract) — unwrap;
    // then reorder physical (file ++ partition) columns to the source
    // schema with a codegen'd projection built HERE, on the executor
    val proj = UnsafeProjection.create(lr.order.map(i =>
      BoundReference(i, lr.physical(i).dataType, nullable = true)
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]))
    val raw: Iterator[InternalRow] = readerRows(lr, cp.file)
    // delete partitions KEEP only the newly-masked rows (legacy
    // sidecars match by obj_id, positional by row ordinal)
    val kept = cp.keep match {
      case Some(mask) => raw.filter { r =>
        (lr.idIdx >= 0 && mask.ids.nonEmpty &&
          java.util.Arrays.binarySearch(mask.ids, r.getLong(lr.idIdx)) >= 0) ||
        (lr.riIdx >= 0 && mask.pos.contains(r.getLong(lr.riIdx)))
      }
      case None => raw
    }
    val rows = kept.map(proj)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }

  private def readerRows(lr: CdfLayoutReader,
      f: PartitionedFile): Iterator[InternalRow] =
    lr.reader(f).flatMap { r =>
      (r: Any) match {
        case b: ColumnarBatch => b.rowIterator().asScala
        case row: InternalRow => Iterator.single(row)
      }
    }
}
