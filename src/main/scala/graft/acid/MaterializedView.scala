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
  *  1. reads the source commits in `(lastRefreshed, head]` through
  *     [[Instance.changes]] — pre/post images are exact even through
  *     CoW rewrites and MoR masks;
  *  2. folds them into per-group deltas: weight +1 for
  *     insert/update_postimage, -1 for delete/update_preimage, so
  *     `Σw` is the count delta and `Σ(c·w)` the sum delta — one
  *     map-side-combinable aggregation over the delta rows only;
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
    val weighted = source.changes(last, head)
      .filter(col("_change").isNotNull)
      .withColumn("_w",
        when(col("_change").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
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
  private def viewSchema(srcSchema: StructType, groupCols: Seq[String],
      sumCols: Seq[String]): StructType = {
    require(groupCols.nonEmpty, "at least one group column is required " +
      "(for a global aggregate, use metadata-only aggregate pushdown)")
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

  /** Create the (empty) view table beside its definition. */
  def create(spark: SparkSession, viewRoot: String, source: Instance,
      groupCols: Seq[String], sumCols: Seq[String]): MaterializedAggView = {
    val schema = viewSchema(StructType.fromDDL(source.stateAt(
      source.latestVersion)._2), groupCols, sumCols)
    val view = VersionedTable.create(spark, viewRoot, schema)
    new MaterializedAggView(source, view, groupCols, sumCols)
  }

  /** Re-open an existing view (definition is supplied by the caller;
    * the watermark lives in the view table's manifest). */
  def open(spark: SparkSession, viewRoot: String, source: Instance,
      groupCols: Seq[String], sumCols: Seq[String]): MaterializedAggView =
    new MaterializedAggView(source, VersionedTable.open(spark, viewRoot),
      groupCols, sumCols)
}
