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
      VersionedTable.open(SparkSession.active, rootOf(options)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ChangeFeedTable(schema,
      rootOf(new CaseInsensitiveStringMap(properties)))
}

private[acid] object ChangeFeedSource {
  def outputSchema(inst: Instance): StructType = {
    val (_, ddl) = inst.stateAt(inst.latestVersion)
    StructType.fromDDL(ddl)
      .add(StructField("_version", LongType, nullable = false))
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
      ignoreChanges: Boolean): Array[CdfPartition] = {
    val out = Array.newBuilder[CdfPartition]
    ((lo + 1) to hi).foreach { v =>
      val m = inst.readManifest(v)
      val isData = m.objects.nonEmpty || m.objSummary.isDefined
      if (isData) {
        // a merge-on-read delete commit (dv delta, no file delta) is a
        // row-removal too — an append stream can no more represent it
        // than a CoW delete; under ignoreChanges it simply adds no
        // files (the masked rows were already streamed)
        if ((m.removed.nonEmpty || m.dvs.nonEmpty) && !ignoreChanges)
          throw new IllegalStateException(
            s"graft-cdf: version $v of ${inst.root} removes rows (update/" +
            "delete/restore) — an append stream cannot represent it. Set " +
            ".option(\"ignoreChanges\", true) to stream post-image rows, " +
            "or consume Instance.changes() for exact row-level CDC.")
        m.added.foreach { rel =>
          val pairs = partPairs(rel)
          val status = inst.fs.getFileStatus(new Path(inst.dataDir, rel))
          val partRow = new GenericInternalRow(
            (pairs.map { case (k, raw) =>
              val dt = schema.find(_.name == k).map(_.dataType)
                .getOrElse(org.apache.spark.sql.types.StringType)
              val s = ExternalCatalogUtils.unescapePathName(raw)
              if (s == "__HIVE_DEFAULT_PARTITION__") null
              else Cast(Literal(org.apache.spark.unsafe.types.UTF8String
                  .fromString(s), org.apache.spark.sql.types.StringType), dt,
                Option(SQLConf.get.sessionLocalTimeZone)).eval(null)
            } :+ (v: Any)).toArray)
          out += CdfPartition(
            PartitionedFile(partRow, SparkPath.fromPath(status.getPath),
              0L, status.getLen, Array.empty, status.getModificationTime,
              status.getLen),
            pairs.map(_._1))
        }
      }
    }
    out.result()
  }

  /** Per-layout prepared parquet readers for a planned partition set
    * (row-based: the DSv2 PartitionReader contract here is
    * InternalRow). */
  def readerFactory(spark: SparkSession, schema: StructType,
      planned: Array[CdfPartition]): CdfReaderFactory = {
    val fmt = new ParquetFileFormat
    val conf = spark.sessionState.newHadoopConf()
    val layouts = planned.map(_.layout).distinct.map { layout =>
      val partFields = layout.map(k =>
        schema.find(_.name == k).getOrElse(StructField(k,
          org.apache.spark.sql.types.StringType))) :+
        StructField("_version", LongType, nullable = false)
      val fileSchema = StructType(
        schema.filterNot(f => layout.contains(f.name) || f.name == "_version"))
      val reader = fmt.buildReaderWithPartitionValues(spark, fileSchema,
        StructType(partFields), fileSchema, Nil,
        Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"), conf)
      val physical = StructType(fileSchema ++ partFields)
      val order = schema.map(f => physical.fieldIndex(f.name)).toArray
      layout -> (reader, physical, order)
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
        endingVersion = Option(options.get("endingVersion")).map(_.toLong))
    }
}

private[acid] final class ChangeFeedScan(schema: StructType, root: String,
    startingVersion: Long, ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Long],
    endingVersion: Option[Long] = None) extends Scan {
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
    private lazy val planned = ChangeFeedSource.planRange(inst, schema,
      startingVersion - 1,
      endingVersion.getOrElse(inst.latestVersion), ignoreChanges)
    override def planInputPartitions(): Array[InputPartition] =
      planned.toArray[InputPartition]
    override def createReaderFactory(): PartitionReaderFactory =
      ChangeFeedSource.readerFactory(spark, schema, planned)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangeFeedStream(schema, root, startingVersion, ignoreChanges,
      maxVersionsPerTrigger)
}

private[acid] final case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** One added data file of one commit; `partValues` are the hive `k=v`
  * pairs parsed from its staging path (raw, still hive-escaped). */
private[acid] final case class CdfPartition(
    file: PartitionedFile, layout: Seq[String]) extends InputPartition

private[acid] final class ChangeFeedStream(schema: StructType, root: String,
    startingVersion: Long, ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  @transient private lazy val spark = SparkSession.active
  @transient private lazy val inst = VersionedTable.open(spark, root)
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
    val ps = ChangeFeedSource.planRange(inst, schema,
      start.asInstanceOf[VersionOffset].v,
      end.asInstanceOf[VersionOffset].v, ignoreChanges)
    planned = ps
    ps.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChangeFeedSource.readerFactory(spark, schema, planned)
}

private[acid] final class CdfReaderFactory(
    layouts: Map[Seq[String], (PartitionedFile => Iterator[InternalRow],
      StructType, Array[Int])]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[CdfPartition]
    val (reader, physical, order) = layouts(cp.layout)
    // the prepared reader may hand back vectorized ColumnarBatches
    // disguised as InternalRow (the FileScanRDD contract) — unwrap;
    // then reorder physical (file ++ partition) columns to the source
    // schema with a codegen'd projection built HERE, on the executor
    val proj = UnsafeProjection.create(order.map(i =>
      BoundReference(i, physical(i).dataType, nullable = true)
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]))
    val rows: Iterator[InternalRow] = reader(cp.file).flatMap { r =>
      (r: Any) match {
        case b: ColumnarBatch => b.rowIterator().asScala
        case row: InternalRow => Iterator.single(row)
      }
    }.map(proj)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
