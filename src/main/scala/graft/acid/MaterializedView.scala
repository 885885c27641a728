package graft.acid

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructField, StructType}

/** Incrementally-maintained aggregate view over a versioned table —
  * the warehouse "materialized view with incremental refresh", built
  * from parts the engine already has: the exact change feed
  * ([[Instance.changes]]), keyed MERGE ([[Txn.merge]]), and the
  * `appTxns` idempotence watermark ([[Txn.markEpoch]]).
  *
  * The view is itself a versioned table holding one row per group:
  * `obj_id` (a 64-bit hash of the group key — the engine's row
  * address), the group columns, `cnt`, and one `sum_<c>` per summed
  * column (integral source columns only; `avg` is `sum/cnt` at read).
  * COUNT and SUM are *self-maintainable* aggregates: a change delta
  * alone updates them exactly (MIN/MAX are not — a deleted extremum
  * forces a rescan — and are deliberately out of scope; answer those
  * with metadata-only aggregate pushdown instead).
  *
  * `refresh()` is O(delta), never a rescan:
  *  1. reads the source commits in `(lastRefreshed, head]` as a
  *     SIGNED row delta ([[Instance.weightedDelta]]): rows visible
  *     after each commit weigh +1, rows visible before it −1,
  *     restricted to touched files — no per-row identity joins; a
  *     CoW copy-back contributes ±1 to its group and cancels;
  *  2. folds the weights into per-group deltas: `Σw` is the count
  *     delta and `Σ(c·w)` the sum delta — one map-side-combinable
  *     aggregation over the delta rows only;
  *  3. MERGEs the deltas into the view by group hash — groups whose
  *     count reaches zero are deleted, unseen groups insert — and
  *     marks the source head in the SAME commit via the appTxns
  *     watermark, so refresh is atomic, crash-safe, and idempotent: a
  *     replayed or concurrent refresh of the same head lands nothing.
  *
  * At 100 TB the refresh cost is proportional to the day's churn, not
  * the table: the delta aggregation shuffles one partial row per
  * (group × partition), and the MERGE prunes view files by the group
  * hashes' range exactly like any keyed write. Group-key hash
  * collisions (two groups on one 64-bit `obj_id`) would fold two
  * groups together; at the birthday bound that needs ~2³² distinct
  * groups — beyond it, widen the key with a second hash column.
  *
  * Reference analog: db-core keeps derived per-object summaries
  * current under the same WAL the data writes ride
  * (src/storage/free_info.rs); here the change feed plays the WAL and
  * the view table the summary.
  *
  * NULL semantics match SQL GROUP BY: null group keys form their own
  * group; `sum_<c>` ignores null addends (`cnt` still counts the
  * row). Columns added to the source after creation refresh as nulls
  * for pre-existing versions (the change feed aligns schemas by
  * name). */
final class MaterializedAggView private (
    val source: Instance, val view: Instance,
    val groupCols: Seq[String], val sumCols: Seq[String]) {

  private def appId: String = "mv:" + view.root

  /** Version of the source the view currently reflects (-1 = never
    * refreshed; the first refresh folds the whole history, which for
    * an insert-only prefix IS the initial full build). */
  def refreshedVersion: Long = view.lastCommittedEpoch(appId).getOrElse(-1L)

  /** The view's stored groups with derived `avg_<c>` columns. */
  def read(): DataFrame = {
    val base = view.read()
    sumCols.foldLeft(base)((df, c) =>
      df.withColumn(s"avg_$c",
        col(s"sum_$c").cast("double") / col("cnt").cast("double")))
  }

  /** Fold all source commits since the last refresh into the view.
    * Returns the source version the view now reflects. Safe to call
    * concurrently or re-call after a crash: the watermark rides the
    * merge commit. */
  def refresh(): Long = {
    val head = source.latestVersion
    val last = math.max(0L, refreshedVersion)
    if (head <= last) return head
    // the signed row delta — NOT the classified change feed: an
    // aggregate needs net multiplicities only, and weightedDelta skips
    // the feed's per-row identity diff (copy-backs cancel in the Σ)
    val weighted = source.weightedDelta(last, head)
    val delta = weighted
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_w")).as("cnt"),
        sumCols.map(c =>
          sum(col(c).cast("long") * col("_w")).as(s"sum_$c")): _*)
      // an interval whose effects cancel exactly (e.g. an update that
      // kept the group and the summed values) must neither rewrite
      // the group's file nor insert a zero group
      .filter(col("cnt") =!= 0L || sumCols.map(c =>
        coalesce(col(s"sum_$c"), lit(0L)) =!= 0L)
        .foldLeft(lit(false))(_ || _))
      .withColumn("obj_id", xxhash64(groupCols.map(col): _*))
      .select(("obj_id" +: groupCols ++: "cnt" +:
        sumCols.map(c => s"sum_$c")).map(col): _*)
    try {
      view.withRetry() { t =>
        t.markEpoch(appId, head)
        t.merge(delta,
          matchedDelete = Some(col("t.cnt") + col("s.cnt") === 0L),
          matchedUpdate = Map("cnt" -> (col("t.cnt") + col("s.cnt"))) ++
            sumCols.map(c => s"sum_$c" ->
              (coalesce(col(s"t.sum_$c"), lit(0L)) +
                coalesce(col(s"s.sum_$c"), lit(0L)))).toMap,
          insertUnmatched = true)
      }
    } catch {
      // another refresher already folded this head — its commit is
      // exactly the one we wanted
      case _: EpochAlreadyCommittedException => ()
    }
    head
  }
}

object MaterializedAggView {

  /** Definition side file under the view root — written ONCE at create
    * (the definition is immutable), so `open(viewRoot)` and the SQL
    * `CALL system.refresh_mv` need no re-specification. `source` is
    * the creating surface's spec: an absolute table root (API create)
    * or a dotted catalog name (SQL create_mv) — dotted names cannot
    * contain '/', which is how [[openFromDef]] tells them apart. */
  private val DefFile = "_mv.json"

  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
  }
  private def writeDef(view: Instance, source: String,
      groupCols: Seq[String], sumCols: Seq[String]): Unit = {
    val json = s"""{"source":"${esc(source)}",""" +
      s""""groupCols":[${groupCols.map(c => s""""${esc(c)}"""").mkString(",")}],""" +
      s""""sumCols":[${sumCols.map(c => s""""${esc(c)}"""").mkString(",")}]}"""
    val out = view.fs.create(
      new org.apache.hadoop.fs.Path(view.root, DefFile), false)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** (source spec, group columns, sum columns) from the definition
    * file — the same minimal quote-aware array parse the manifest
    * codec uses. */
  private[acid] def readDef(view: Instance): (String, Seq[String], Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(view.root, DefFile)
    require(view.fs.exists(p), s"${view.root} is not a materialized view " +
      s"(no $DefFile)")
    val in = view.fs.open(p)
    val json = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    def strField(k: String): String = {
      val m = ("\"" + k + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(json)
      m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse(throw new IllegalStateException(s"bad $DefFile: no $k"))
    }
    def arrField(k: String): Seq[String] = {
      val m = ("\"" + k + "\":\\[((?:[^\\]])*)\\]").r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalStateException(s"bad $DefFile: no $k"))
      val body = m.group(1).trim
      if (body.isEmpty) Nil
      else body.split(',').toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\"))
    }
    (strField("source"), arrField("groupCols"), arrField("sumCols"))
  }

  /** Open a view from its persisted definition. `resolveSource` maps
    * a dotted catalog name to its Instance (pass the catalog's
    * resolver from SQL; the default handles only path specs). */
  def openFromDef(spark: SparkSession, viewRoot: String,
      resolveSource: String => Instance = null): MaterializedAggView = {
    val view = VersionedTable.open(spark, viewRoot)
    val (src, g, s) = readDef(view)
    val inst =
      if (src.contains('/')) VersionedTable.open(spark, src)
      else {
        require(resolveSource != null,
          s"view source '$src' is a catalog name; open it through the catalog")
        resolveSource(src)
      }
    new MaterializedAggView(inst, view, g, s)
  }

  private def viewSchema(srcSchema: StructType, groupCols: Seq[String],
      sumCols: Seq[String]): StructType = {
    require(groupCols.nonEmpty, "at least one group column is required " +
      "(for a global aggregate, use metadata-only aggregate pushdown)")
    // reserved spellings: the view's own columns and the delta's
    // weight column must not collide with source columns in play
    val reserved = Set("obj_id", "cnt", "_w") ++ sumCols.map(c => s"sum_$c")
    (groupCols ++ sumCols).foreach(c => require(!reserved(c),
      s"column $c collides with a reserved view/delta column name"))
    val byName = srcSchema.fields.map(f => f.name -> f).toMap
    groupCols.foreach(c => require(byName.contains(c),
      s"group column $c not in source schema"))
    sumCols.foreach { c =>
      val f = byName.getOrElse(c,
        throw new IllegalArgumentException(s"sum column $c not in source schema"))
      require(Seq(LongType, IntegerType, ShortType, ByteType)
        .contains(f.dataType),
        s"sum column $c must be integral (got ${f.dataType.simpleString}); " +
          "pre-scale floats/decimals to integers upstream")
    }
    StructType(
      StructField("obj_id", LongType, nullable = false) +:
      groupCols.map(byName(_).copy(nullable = true)) ++:
      StructField("cnt", LongType, nullable = false) +:
      sumCols.map(c => StructField(s"sum_$c", LongType, nullable = true)))
  }

  /** Create the (empty) view table beside its persisted definition.
    * `sourceSpec` overrides what the definition records as the source
    * (the SQL catalog stores the dotted table name so views survive a
    * warehouse move; the default records the source's root path). */
  def create(spark: SparkSession, viewRoot: String, source: Instance,
      groupCols: Seq[String], sumCols: Seq[String],
      sourceSpec: Option[String] = None): MaterializedAggView = {
    val schema = viewSchema(StructType.fromDDL(source.stateAt(
      source.latestVersion)._2), groupCols, sumCols)
    val view = VersionedTable.create(spark, viewRoot, schema)
    writeDef(view, sourceSpec.getOrElse(source.root), groupCols, sumCols)
    new MaterializedAggView(source, view, groupCols, sumCols)
  }

  /** Re-open an existing view (definition is supplied by the caller;
    * the watermark lives in the view table's manifest). */
  def open(spark: SparkSession, viewRoot: String, source: Instance,
      groupCols: Seq[String], sumCols: Seq[String]): MaterializedAggView =
    new MaterializedAggView(source, VersionedTable.open(spark, viewRoot),
      groupCols, sumCols)
}
