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
  * address), the group columns, `cnt`, and per summed column a
  * `sum_<c>` plus `nn_<c>`, the count of NON-NULL addends — the
  * witness that lets a stored sum return to SQL's NULL when every
  * non-null contributor is deleted (SUM over rows whose addends are
  * all NULL is NULL, not 0; without the witness a maintained 0 and a
  * true NULL are indistinguishable). `avg` is `sum/cnt` at read.
  * COUNT and SUM are *self-maintainable* aggregates: a change delta
  * alone updates them exactly.
  *
  * MIN/MAX (`min_<c>` / `max_<c>`, any atomic orderable type) are NOT
  * self-maintainable — a deleted extremum invalidates the stored value
  * — so refresh maintains them with the standard IVM split: inserts
  * fold as `least/greatest(stored, inserted-extremum)` (exact, free),
  * and a group is RECOMPUTED from the source snapshot only when the
  * interval deleted a value at the stored extremum WITHOUT inserting
  * one at least as extreme (if `ins_min <= del_min` the inserted value
  * already covers any death: every remaining row is >= the old min, so
  * the new min is exactly `least(stored, ins)`). Both candidate sides
  * are computed from the delta NETTED per (group, value) — `Σ_w` per
  * value tuple first, insert candidates from net > 0, death detectors
  * from net < 0 — so a transient value inserted and deleted within the
  * interval (across commits) and CoW copy-back pairs cancel exactly
  * instead of corrupting the fold or falsely covering a real death,
  * which makes the `ins <= del` cover inequality sound.
  * The recompute is a ONE-JOB scan of the source
  * restricted to the dirty groups (semi join by group hash), O(dirty
  * groups' rows) — proportional to extremum churn, not the table; a
  * view whose extrema never die never rescans, and a COUNT/SUM-only
  * view never rescans at all.
  *
  * An optional `WHERE` predicate (over source columns, head logical
  * names) restricts the view to matching rows. COUNT/SUM stay
  * self-maintainable under a filter because the SIGNED delta commutes
  * with it: a row updated across the predicate boundary contributes
  * its −1 pre-image inside the filter (decrement) and its +1 post-
  * image outside it (dropped), exactly the net the filtered aggregate
  * needs.
  *
  * `refresh()` is O(delta), never a rescan:
  *  1. reads the source commits in `(lastRefreshed, head]` as a
  *     SIGNED row delta ([[Instance.weightedDelta]]): rows visible
  *     after each commit weigh +1, rows visible before it −1,
  *     restricted to touched files — no per-row identity joins; a
  *     CoW copy-back contributes ±1 to its group and cancels. The
  *     delta is aligned to the head's LOGICAL column names by fixed
  *     physical identity, so a mid-interval column rename folds
  *     pre-rename rows into the right group instead of NULLs;
  *  2. folds the weights into per-group deltas: `Σw` is the count
  *     delta and `Σ(c·w)` the sum delta — one map-side-combinable
  *     aggregation over the delta rows only;
  *  3. MERGEs the deltas into the view by group hash — groups whose
  *     count reaches zero are deleted, unseen groups insert — and
  *     marks the source head in the SAME commit via the appTxns
  *     watermark, so refresh is atomic, crash-safe, and idempotent: a
  *     replayed refresh of the same head lands nothing.
  *
  * Concurrent refreshers that observed DIFFERENT heads are serialized
  * by a FENCED watermark ([[Txn.markEpoch]] `fence = true`): the
  * slower refresher's commit conflicts with any interleaved watermark
  * movement, and on conflict (or on a snapshot that already carries a
  * newer watermark) refresh RESTARTS from the advanced watermark with
  * a freshly computed delta — it never re-merges a delta whose base
  * interval another refresher partially folded (which would apply the
  * overlap twice).
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
  * row) and is NULL while `nn_<c> = 0`. Columns added to the source
  * after creation refresh as nulls for pre-existing versions (the
  * delta aligns schemas by physical identity). */
final class MaterializedAggView private (
    val source: Instance, val view: Instance,
    val groupCols: Seq[String], val sumCols: Seq[String],
    val minCols: Seq[String], val maxCols: Seq[String],
    val dimJoin: Option[MaterializedAggView.DimJoin],
    val where: Option[String],
    // fixed PHYSICAL names of the group/sum/min/max columns, captured
    // at create: refresh re-resolves them to the head's logical names,
    // so renaming a view column in the source neither breaks the
    // refresh nor (worse) folds pre-rename rows into the NULL group.
    // None = legacy definition; the stored logical names are assumed
    // still current and their physicals derived from the head.
    groupPhys0: Option[Seq[String]], sumPhys0: Option[Seq[String]],
    minPhys0: Option[Seq[String]], maxPhys0: Option[Seq[String]]) {

  private def appId: String = "mv:" + view.root

  /** Version of the source the view currently reflects (-1 = never
    * refreshed; the first refresh folds the HEAD SNAPSHOT at +1 — the
    * telescoped equivalent of folding the whole history, one scan,
    * immune to vacuumed pre-images — see [[fullFold]]). */
  def refreshedVersion: Long = view.lastCommittedEpoch(appId).getOrElse(-1L)

  /** The view's stored groups with derived `avg_<c>` columns. */
  def read(): DataFrame = {
    val base = view.read()
    sumCols.foldLeft(base)((df, c) =>
      df.withColumn(s"avg_$c",
        col(s"sum_$c").cast("double") / col("cnt").cast("double")))
  }

  // restart signal: the watermark we derived the delta from moved —
  // control flow only, never escapes refresh()
  private final class StaleWatermark extends RuntimeException

  /** Fold all source commits since the last refresh into the view.
    * Returns the source version the view now reflects. Safe to call
    * concurrently or re-call after a crash: the watermark rides the
    * merge commit, fenced against rival refreshers (see class doc). */
  private def appIdDim: String = appId + "#dim"

  /** Dimension version the view currently reflects (join views). */
  def refreshedDimVersion: Long =
    view.lastCommittedEpoch(appIdDim).getOrElse(-1L)

  /** How the LAST [[refresh]] call applied its interval — "noop" (no
    * new commits), "incremental" (signed-delta fold + MERGE),
    * "initial" (first build: one telescoped snapshot fold), or
    * "rebuild" (full rebuild fallback: the interval referenced
    * vacuum-reclaimed pre-images, or was longer than
    * [[EngineConf.mvRebuildMaxInterval]]). Diagnostic only. */
  @volatile var lastRefreshMode: String = "none"

  /** The COMPLETE view contents at `(head, headD)` — one snapshot
    * scan (plus the dim snapshot join for join views), no history
    * read. This is the telescoped identity behind the initial build:
    * `weightedDelta(0, head)` sums (post − pre) over every commit,
    * which telescopes to `snapshot(head)` at weight +1 — so the first
    * fold costs one table scan instead of O(total historical churn)
    * pre-image reads, and never touches a file vacuum may have
    * reclaimed. The same fold is the rebuild fallback for a refresh
    * whose incremental interval is no longer readable. Reference
    * analog: recovery reads the checkpoint, not the whole WAL
    * (io.rs:260-289). */
  private def fullFold(head: Long, headD: Long,
      // by-name: join views bind these by logical name and the lazy
      // resolvers would throw on dim-side columns if forced here
      gNow: => Seq[(String, String)], sNow: => Seq[(String, String)],
      mNow: => Seq[(String, String)], xNow: => Seq[(String, String)]): DataFrame = {
    val rows = dimJoin match {
      case None =>
        val s0 = source.snapshot(head)
        val sF = where.fold(s0)(p => s0.filter(expr(p)))
        sF.select((gNow ++ sNow ++ mNow ++ xNow).distinct.map {
          case (now, orig) => col(now).as(orig) }: _*)
      case Some(dj) =>
        val factSide = (groupCols ++ sumCols)
          .filter(dj.factCols.contains).distinct
        val dimSide = (groupCols ++ sumCols)
          .filterNot(dj.factCols.contains).distinct
        val f0 = source.snapshot(head)
        val f = where.fold(f0)(p => f0.filter(expr(p)))
        f.alias("F").join(dj.dim.snapshot(headD).alias("D"),
            col(s"F.${dj.factKey}") === col(s"D.${dj.dimKey}"))
          .select((factSide.map(c => col(s"F.$c").as(c)) ++
            dimSide.map(c => col(s"D.$c").as(c))): _*)
    }
    val aggs: Seq[Column] =
      count(lit(1)).as("cnt") +:
      (sumCols.flatMap(c => Seq(
        sum(col(c).cast("long")).as(s"sum_$c"),
        count(col(c)).as(s"nn_$c"))) ++
       minCols.map(c => min(col(c)).as(s"min_$c")) ++
       maxCols.map(c => max(col(c)).as(s"max_$c")))
    rows.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("obj_id", xxhash64(groupCols.map(col): _*))
      .select(("obj_id" +: groupCols ++: "cnt" +:
        (sumCols.flatMap(c => Seq(s"sum_$c", s"nn_$c")) ++
         minCols.map(c => s"min_$c") ++ maxCols.map(c => s"max_$c")))
        .map(col): _*)
  }

  def refresh(): Long = {
    var forceRebuild = false
    while (true) {
      val head = source.latestVersion
      val initial = refreshedVersion < 0
      val last = math.max(0L, refreshedVersion)
      val headD = dimJoin.map(_.dim.latestVersion).getOrElse(0L)
      val lastD = math.max(0L, refreshedDimVersion)
      if (head <= last && (dimJoin.isEmpty || headD <= lastD)) {
        lastRefreshMode = "noop"; return head
      }
      // resolve the view columns' fixed physical names to the HEAD's
      // logical names: the delta below is head-aligned, so a source
      // rename mid-interval is transparent — unless the column was
      // dropped, which has no incremental answer
      val stH = source.tableStateAt(head)
      val headPhysToLogical =
        org.apache.spark.sql.types.StructType.fromDDL(stH.ddl).fields
          .map(f => stH.renames.getOrElse(f.name, f.name) -> f.name).toMap
      def resolve(phys: Option[Seq[String]], logical: Seq[String]) =
        phys.getOrElse(logical.map(l => stH.renames.getOrElse(l, l)))
          .zip(logical).map { case (p, orig) =>
            headPhysToLogical.getOrElse(p, throw new IllegalStateException(
              s"view column '$orig' (physical '$p') no longer exists in " +
              s"the source at v$head; drop and rebuild the view")) -> orig
          }
      // join views bind ALL columns by logical name (dim columns have
      // no fact-side physical identity); rename resilience applies to
      // plain views only — forcing these in a join view would throw on
      // dim-side names, so they stay lazy
      lazy val gNow = resolve(groupPhys0, groupCols)
      lazy val sNow = resolve(sumPhys0, sumCols)
      lazy val mNow = resolve(minPhys0, minCols)
      lazy val xNow = resolve(maxPhys0, maxCols)
      // rebuild triggers: the interval's pre-images may be reclaimed
      // (vacuum horizon, or a FileNotFound already surfaced below), or
      // the catch-up interval is long enough that a bounded-plan
      // snapshot rebuild beats an O(interval) incremental fold
      val vacuumStale = !initial &&
        ((head > last && last < source.vacuumHorizon) ||
         dimJoin.exists(dj =>
           headD > lastD && lastD < dj.dim.vacuumHorizon))
      val longInterval =
        (head - last) > source.conf.mvRebuildMaxInterval ||
        dimJoin.exists(dj =>
          (headD - lastD) > dj.dim.conf.mvRebuildMaxInterval)
      if (initial || forceRebuild || vacuumStale || longInterval) {
        val full = fullFold(head, headD, gNow, sNow, mNow, xNow)
        try {
          view.withRetry() { t =>
            // same stale-watermark + fence discipline as the
            // incremental path: the fold is valid only against the
            // watermarks it was derived from
            if (view.appTxnsAt(t.readVersion).get(appId)
                .exists(w => math.max(0L, w) != last))
              throw new StaleWatermark
            if (dimJoin.isDefined &&
                view.appTxnsAt(t.readVersion).get(appIdDim)
                  .exists(w => math.max(0L, w) != lastD))
              throw new StaleWatermark
            if (head > last) t.markEpoch(appId, head, fence = true)
            else if (dimJoin.isDefined) t.fenceEpoch(appId)
            if (dimJoin.isDefined) {
              if (headD > lastD) t.markEpoch(appIdDim, headD, fence = true)
              else t.fenceEpoch(appIdDim)
            }
            // truncate + insert in ONE commit: stale groups (dead in
            // the lost interval) must not linger, and the saturated
            // truncate summary conflicts with any rival merge
            t.truncate()
            if (!full.isEmpty) t.insert(full)
          }
          lastRefreshMode = if (initial) "initial" else "rebuild"
          return head
        } catch {
          case _: EpochAlreadyCommittedException =>
            lastRefreshMode = if (initial) "initial" else "rebuild"
            return head
          case _: StaleWatermark => ()
        }
      } else try {
      // the signed row delta — NOT the classified change feed: an
      // aggregate needs net multiplicities only, and weightedDelta skips
      // the feed's per-row identity diff (copy-backs cancel in the Σ)
      val weighted = dimJoin match {
        case None =>
          val weighted0 = source.weightedDelta(last, head, alignToHead = true)
          where.fold(weighted0)(p => weighted0.filter(expr(p)))
            // back to the view's own (create-time) column names
            .select(((gNow ++ sNow ++ mNow ++ xNow).distinct.map {
              case (now, orig) => col(now).as(orig) } :+ col("_w")): _*)
        case Some(dj) =>
          // SIGNED delta of the join, all terms against NEW-side
          // relations (no old snapshots):
          //   Δ(F ⨝ D) = ΔF ⨝ D_new  +  F_new ⨝ ΔD  −  ΔF ⨝ ΔD
          // Weights multiply through the join, so a dim row whose
          // group attribute changed contributes −1 under its old
          // values and +1 under its new ones against EVERY matching
          // fact row — group moves, key retargets, deletes and
          // duplicate dim keys all fall out of the algebra. F_new in
          // the middle term is restricted to the CHANGED dim keys
          // (semi join), so the fact side is scanned only where the
          // dimension actually moved; an interval with no dim churn
          // costs exactly the plain fact delta.
          val factSide = (groupCols ++ sumCols)
            .filter(dj.factCols.contains).distinct
          val dimSide = (groupCols ++ sumCols)
            .filterNot(dj.factCols.contains).distinct
          def joined(f: DataFrame, d: DataFrame, sign: Int): DataFrame =
            f.alias("F").join(d.alias("D"),
              col(s"F.${dj.factKey}") === col(s"D.${dj.dimKey}"))
              .select((factSide.map(c => col(s"F.$c").as(c)) ++
                dimSide.map(c => col(s"D.$c").as(c)) :+
                (lit(sign.toLong) * col("F._wf") * col("D._wd"))
                  .as("_w")): _*)
          // head-aligned like the plain-view delta, so a FACT-side
          // rename mid-interval keeps pre-rename rows under their
          // current names (dim-side renames stay unsupported — the
          // dim delta binds by logical name and breaks loudly)
          val dF0 = source.weightedDelta(last, head, alignToHead = true)
          val dF = where.fold(dF0)(p => dF0.filter(expr(p)))
            .withColumnRenamed("_w", "_wf")
          // D_new restricted to the fact delta's keys BEFORE the join:
          // the inner join only ever matches those keys, and the
          // explicit semi join (small build side) lets the dim scan
          // prune by its obj_id stats index / runtime filters instead
          // of reading the whole dimension every refresh — term1 costs
          // O(fact churn), not O(dim)
          val factKeys = dF.select(col(dj.factKey).as("_fk")).distinct()
          val dNew = dj.dim.snapshot(headD)
            .join(factKeys, col(dj.dimKey) === col("_fk"), "left_semi")
            .withColumn("_wd", lit(1L))
          val term1 = joined(dF, dNew, 1)
          if (headD <= lastD) term1
          else {
            val dD = dj.dim.weightedDelta(lastD, headD)
              .withColumnRenamed("_w", "_wd")
            val changed = dD.select(col(dj.dimKey).as("_ck")).distinct()
            val fNew0 = source.snapshot(head)
            val fNew = where.fold(fNew0)(p => fNew0.filter(expr(p)))
              .join(changed, col(dj.factKey) === col("_ck"), "left_semi")
              .withColumn("_wf", lit(1L))
            val term2 = joined(fNew, dD, 1)
            val term3 = joined(dF, dD, -1)
            term1.unionByName(term2).unionByName(term3)
          }
      }
      val mmCols = (minCols ++ maxCols).distinct
      // the delta is consumed once for the base aggregates plus once
      // per min/max column (the netting pass below): materialize it so
      // the file-restricted scans don't re-run per consumer, and the
      // lineage stays bounded
      val weightedShared =
        if (mmCols.isEmpty) weighted else weighted.localCheckpoint()
      val baseAggs: Seq[Column] =
        sum(col("_w")).as("cnt") +:
        sumCols.flatMap(c => Seq(
          sum(col(c).cast("long") * col("_w")).as(s"sum_$c"),
          sum(when(col(c).isNotNull, col("_w")).otherwise(lit(0L)))
            .as(s"nn_$c")))
      val base = weightedShared
        .groupBy(groupCols.map(col): _*)
        .agg(baseAggs.head, baseAggs.tail: _*)
        .withColumn("obj_id", xxhash64(groupCols.map(col): _*))
      // inserted/deleted extremum candidates of the interval, from the
      // NETTED per-(group, value) multiplicities — NOT the raw signed
      // rows: a value inserted and deleted in SEPARATE commits of one
      // interval (or a CoW copy-back pair split across commits) sums
      // to net 0 and contributes to NEITHER side. Raw-row candidates
      // would surface such a transient value on BOTH sides — as an
      // insert candidate it corrupts the least/greatest fold with a
      // value no longer in the table, and as a delete candidate it
      // falsely "covers" a genuine extremum death through the
      // ins <= del test, skipping the recompute. Net > 0 values are
      // the true insert candidates (merge's least/greatest input and
      // the unmatched-INSERT value); net < 0 the true death detectors.
      val withCand = mmCols.foldLeft(base) { (acc, c) =>
        val perValue = weightedShared
          .groupBy((groupCols :+ c).distinct.map(col): _*)
          .agg(sum(col("_w")).as("_net"))
          .filter(col("_net") =!= 0L)
        val candAggs: Seq[Column] =
          (if (minCols.contains(c)) Seq(
            min(when(col("_net") > 0, col(c))).as(s"min_$c"),
            min(when(col("_net") < 0, col(c))).as(s"del_min_$c")) else Nil) ++
          (if (maxCols.contains(c)) Seq(
            max(when(col("_net") > 0, col(c))).as(s"max_$c"),
            max(when(col("_net") < 0, col(c))).as(s"del_max_$c")) else Nil)
        val candNames =
          (if (minCols.contains(c)) Seq(s"min_$c", s"del_min_$c") else Nil) ++
          (if (maxCols.contains(c)) Seq(s"max_$c", s"del_max_$c") else Nil)
        // joined back by group hash (null group keys hash like values)
        val cand = perValue.groupBy(groupCols.map(col): _*)
          .agg(candAggs.head, candAggs.tail: _*)
          .withColumn("_mmid", xxhash64(groupCols.map(col): _*))
          .select(("_mmid" +: candNames).map(col): _*)
        acc.join(cand, col("obj_id") === col("_mmid"), "left").drop("_mmid")
      }
      val delta = withCand
        // an interval whose effects cancel exactly (e.g. an update that
        // kept the group and the summed values) must neither rewrite
        // the group's file nor insert a zero group; nn participates —
        // a NULL→0 update moves nn without moving cnt or the sum —
        // and any min/max activity keeps the group in play (the merge
        // decides whether it actually changes anything)
        .filter(col("cnt") =!= 0L || (sumCols.map(c =>
          coalesce(col(s"sum_$c"), lit(0L)) =!= 0L ||
            col(s"nn_$c") =!= 0L) ++
          minCols.map(c => col(s"min_$c").isNotNull ||
            col(s"del_min_$c").isNotNull) ++
          maxCols.map(c => col(s"max_$c").isNotNull ||
            col(s"del_max_$c").isNotNull))
          .foldLeft(lit(false))(_ || _))
        .select(("obj_id" +: groupCols ++: "cnt" +:
          (sumCols.flatMap(c => Seq(s"sum_$c", s"nn_$c")) ++
           minCols.flatMap(c => Seq(s"min_$c", s"del_min_$c")) ++
           maxCols.flatMap(c => Seq(s"max_$c", s"del_max_$c"))))
          .map(col): _*)
        view.withRetry() { t =>
          // the delta above is valid ONLY against watermark `last`; if
          // a rival refresher advanced it (visible in this snapshot, or
          // surfaced as a fence conflict that re-ran this body), the
          // overlap of the two intervals must not fold twice — restart
          // from the new watermark with a fresh delta
          if (view.appTxnsAt(t.readVersion).get(appId)
              .exists(w => math.max(0L, w) != last))
            throw new StaleWatermark
          if (dimJoin.isDefined &&
              view.appTxnsAt(t.readVersion).get(appIdDim)
                .exists(w => math.max(0L, w) != lastD))
            throw new StaleWatermark
          // each watermark MOVES only when its side advanced (a
          // re-mark at the SAME epoch would read as already-committed
          // and silently skip the fold), but a join view FENCES both
          // sides regardless: the delta was derived from both
          // watermarks, so two refreshers that each observed only one
          // side's churn must still collide — otherwise both merges
          // land on disjoint appIds and the cross term ΔF ⨝ ΔD is
          // never applied (fenceEpoch watches without moving)
          if (head > last) t.markEpoch(appId, head, fence = true)
          else if (dimJoin.isDefined) t.fenceEpoch(appId)
          if (dimJoin.isDefined) {
            if (headD > lastD) t.markEpoch(appIdDim, headD, fence = true)
            else t.fenceEpoch(appIdDim)
          }
          // min/max death repair: groups whose stored extremum the
          // interval deleted without covering (see class doc) get
          // ABSOLUTE recomputed values from the head snapshot, scanned
          // once and restricted to exactly those groups by group hash
          val deltaFinal =
            if (minCols.isEmpty && maxCols.isEmpty) delta
            else {
              val stored = t.read().select((col("obj_id").as("_vid") +:
                minCols.map(c => col(s"min_$c").as(s"_t_min_$c")) ++:
                maxCols.map(c => col(s"max_$c").as(s"_t_max_$c"))): _*)
              val joined = delta.join(stored,
                col("obj_id") === col("_vid"), "left")
              val dirtyCond =
                (minCols.map(c =>
                  col(s"del_min_$c").isNotNull && col("_vid").isNotNull &&
                  (col(s"_t_min_$c").isNull ||
                    col(s"del_min_$c") <= col(s"_t_min_$c")) &&
                  (col(s"min_$c").isNull ||
                    col(s"min_$c") > col(s"del_min_$c"))) ++
                 maxCols.map(c =>
                  col(s"del_max_$c").isNotNull && col("_vid").isNotNull &&
                  (col(s"_t_max_$c").isNull ||
                    col(s"del_max_$c") >= col(s"_t_max_$c")) &&
                  (col(s"max_$c").isNull ||
                    col(s"max_$c") < col(s"del_max_$c"))))
                .reduce(_ || _)
              val flagged = joined.withColumn("_dirty",
                coalesce(dirtyCond, lit(false)))
              val dirtyKeys = flagged.filter(col("_dirty"))
                .select(col("obj_id").as("_did"))
              // ONE bounded scan: head snapshot, the view's predicate,
              // restricted to dirty groups by hash (null group keys
              // hash like any value, so no null-join pitfalls)
              val mmSel = (mNow ++ xNow).distinct
              val srcRows = where.fold(source.snapshot(head))(p =>
                source.snapshot(head).filter(expr(p)))
                .select((gNow.map { case (now, orig) =>
                  col(now).as(orig) } ++
                  mmSel.map { case (now, orig) => col(now).as(orig) }): _*)
                .withColumn("_sid", xxhash64(groupCols.map(col): _*))
                .join(dirtyKeys, col("_sid") === col("_did"), "left_semi")
              val absAggs =
                minCols.map(c => min(col(c)).as(s"_abs_min_$c")) ++
                maxCols.map(c => max(col(c)).as(s"_abs_max_$c"))
              val recomputed = srcRows.groupBy(col("_sid"))
                .agg(absAggs.head, absAggs.tail: _*)
              flagged.join(recomputed,
                  col("obj_id") === col("_sid"), "left")
                .drop(("_vid" +: "_sid" +:
                  (minCols.map(c => s"_t_min_$c") ++
                   maxCols.map(c => s"_t_max_$c"))): _*)
            }
          t.merge(deltaFinal,
            matchedDelete = Some(col("t.cnt") + col("s.cnt") === 0L),
            matchedUpdate =
              Map("cnt" -> (col("t.cnt") + col("s.cnt"))) ++
              sumCols.flatMap { c =>
                val nn = col(s"t.nn_$c") + col(s"s.nn_$c")
                Seq(
                  s"sum_$c" -> when(nn === 0L, lit(null).cast("long"))
                    .otherwise(coalesce(col(s"t.sum_$c"), lit(0L)) +
                      coalesce(col(s"s.sum_$c"), lit(0L))),
                  s"nn_$c" -> nn)
              }.toMap ++
              minCols.map(c => s"min_$c" ->
                when(col("s._dirty"), col(s"s._abs_min_$c"))
                  .otherwise(least(col(s"t.min_$c"), col(s"s.min_$c")))) ++
              maxCols.map(c => s"max_$c" ->
                when(col("s._dirty"), col(s"s._abs_max_$c"))
                  .otherwise(greatest(col(s"t.max_$c"), col(s"s.max_$c")))),
            insertUnmatched = true)
        }
        lastRefreshMode = "incremental"
        return head
      } catch {
        // another refresher already folded this exact head — its
        // commit is the one we wanted
        case _: EpochAlreadyCommittedException =>
          lastRefreshMode = "incremental"; return head
        // watermark moved underneath us: loop and recompute from it
        case _: StaleWatermark => ()
        // a reclaimed data file surfaced mid-fold: vacuum outran this
        // view (no horizon marker warned us — lost marker, or a rival
        // vacuumed between our check and the fold). Fall back to the
        // snapshot rebuild — the same fold the initial build uses —
        // instead of dying with no recovery path.
        case e: Throwable if !forceRebuild &&
            MaterializedAggView.isMissingInput(e) =>
          forceRebuild = true
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object MaterializedAggView {

  /** Does this failure chain bottom out in a missing input file — the
    * signature of a refresh interval whose pre-images vacuum already
    * reclaimed? Spark wraps the task's FileNotFoundException in
    * several layers (SparkException, AnalysisException for a missing
    * path at plan time), so both the cause chain and the message text
    * are probed. Used only to choose the rebuild fallback — a false
    * positive costs one snapshot rebuild, never a wrong answer. */
  private[acid] def isMissingInput(e: Throwable): Boolean = {
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 20) {
      if (t.isInstanceOf[java.io.FileNotFoundException]) return true
      val m = t.getMessage
      if (m != null && (m.contains("FileNotFoundException") ||
          m.contains("PATH_NOT_FOUND") ||
          m.contains("FILE_NOT_EXIST") ||
          m.contains("does not exist")))
        return true
      t = t.getCause; depth += 1
    }
    false
  }

  /** Dimension side of a JOIN view: `view = fact JOIN dim ON
    * fact.factKey = dim.dimKey`, grouped/summed over columns from
    * EITHER side (COUNT/SUM only). Maintained by signed-delta algebra
    * over both tables (see [[MaterializedAggView.refresh]]); group
    * and sum columns bind by LOGICAL name on both sides (renaming an
    * involved column breaks the view loudly — rebuild it). `factCols`
    * caches the fact schema's field names for side resolution;
    * `dimSpec` is the persisted source spec of the dimension. */
  final case class DimJoin(dim: Instance, factKey: String, dimKey: String,
      factCols: Set[String] = Set.empty, dimSpec: String = "")

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
      groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String],
      where: Option[String],
      groupPhys: Seq[String], sumPhys: Seq[String],
      minPhys: Seq[String], maxPhys: Seq[String],
      dim: Option[(String, String, String)] = None): Unit = {
    def arr(xs: Seq[String]) =
      s"[${xs.map(c => "\"" + esc(c) + "\"").mkString(",")}]"
    val json = s"""{"source":"${esc(source)}",""" +
      s""""groupCols":${arr(groupCols)},""" +
      s""""sumCols":${arr(sumCols)},""" +
      s""""minCols":${arr(minCols)},""" +
      s""""maxCols":${arr(maxCols)},""" +
      s""""groupPhys":${arr(groupPhys)},""" +
      s""""sumPhys":${arr(sumPhys)},""" +
      s""""minPhys":${arr(minPhys)},""" +
      s""""maxPhys":${arr(maxPhys)}""" +
      where.fold("")(w => s""","where":"${esc(w)}"""") +
      dim.fold("") { case (spec, fk, dk) =>
        s""","dimSource":"${esc(spec)}","factKey":"${esc(fk)}",""" +
        s""""dimKey":"${esc(dk)}"""" } + "}"
    val out = view.fs.create(
      new org.apache.hadoop.fs.Path(view.root, DefFile), false)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Parsed [[DefFile]] contents (physical-name arrays absent on
    * definitions written before renames were tracked; min/max arrays
    * absent on pre-min/max definitions — both fold to empty/None). */
  private[acid] final case class MvDef(source: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String],
      where: Option[String],
      groupPhys: Option[Seq[String]], sumPhys: Option[Seq[String]],
      minPhys: Option[Seq[String]], maxPhys: Option[Seq[String]],
      dimSource: Option[String] = None, factKey: Option[String] = None,
      dimKey: Option[String] = None)

  /** The persisted definition. The array parse is a real quote-aware
    * scan — column names containing commas, brackets, quotes or
    * backslashes round-trip exactly as [[writeDef]]'s escaper
    * produced them. */
  private[acid] def readDef(view: Instance): MvDef = {
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
    // scan one JSON string literal starting at json(i) == '"'; returns
    // (unescaped value, index just past the closing quote)
    def scanString(i0: Int): (String, Int) = {
      require(i0 < json.length && json.charAt(i0) == '"',
        s"bad $DefFile: expected string at offset $i0")
      val sb = new StringBuilder
      var i = i0 + 1
      while (i < json.length && json.charAt(i) != '"') {
        val c = json.charAt(i)
        if (c == '\\' && i + 1 < json.length) {
          sb.append(json.charAt(i + 1)); i += 2
        } else { sb.append(c); i += 1 }
      }
      require(i < json.length, s"bad $DefFile: unterminated string")
      (sb.toString, i + 1)
    }
    // sequential object scan: `indexOf`-style key lookup could match
    // a key-shaped substring inside an EARLIER field's escaped value,
    // so keys and values are consumed strictly in document order
    def skipWs(i0: Int): Int = {
      var i = i0
      while (i < json.length && json.charAt(i).isWhitespace) i += 1
      i
    }
    var i = skipWs(0)
    require(i < json.length && json.charAt(i) == '{', s"bad $DefFile")
    i = skipWs(i + 1)
    var strs = Map.empty[String, String]
    var arrs = Map.empty[String, Seq[String]]
    while (i < json.length && json.charAt(i) != '}') {
      val (k, afterKey) = scanString(i)
      i = skipWs(afterKey)
      require(i < json.length && json.charAt(i) == ':', s"bad $DefFile")
      i = skipWs(i + 1)
      if (json.charAt(i) == '[') {
        i = skipWs(i + 1)
        val out = Seq.newBuilder[String]
        while (json.charAt(i) != ']') {
          val (v, next) = scanString(i)
          out += v
          i = skipWs(next)
          if (json.charAt(i) == ',') i = skipWs(i + 1)
        }
        arrs += k -> out.result()
        i = skipWs(i + 1)
      } else {
        val (v, next) = scanString(i)
        strs += k -> v
        i = skipWs(next)
      }
      if (i < json.length && json.charAt(i) == ',') i = skipWs(i + 1)
    }
    def arrField(k: String): Seq[String] = arrs.getOrElse(k,
      throw new IllegalStateException(s"bad $DefFile: no $k"))
    MvDef(strs.getOrElse("source",
        throw new IllegalStateException(s"bad $DefFile: no source")),
      arrField("groupCols"), arrField("sumCols"),
      arrs.getOrElse("minCols", Nil), arrs.getOrElse("maxCols", Nil),
      strs.get("where"),
      arrs.get("groupPhys"), arrs.get("sumPhys"),
      arrs.get("minPhys"), arrs.get("maxPhys"),
      strs.get("dimSource"), strs.get("factKey"), strs.get("dimKey"))
  }

  /** Open a view from its persisted definition. `resolveSource` maps
    * a dotted catalog name to its Instance (pass the catalog's
    * resolver from SQL; the default handles only path specs). */
  def openFromDef(spark: SparkSession, viewRoot: String,
      resolveSource: String => Instance = null): MaterializedAggView = {
    val view = VersionedTable.open(spark, viewRoot)
    val d = readDef(view)
    def open1(spec: String): Instance =
      if (spec.contains('/')) VersionedTable.open(spark, spec)
      else {
        require(resolveSource != null,
          s"view source '$spec' is a catalog name; open it through " +
          "the catalog")
        resolveSource(spec)
      }
    val inst = open1(d.source)
    val dj = d.dimSource.map { spec =>
      val dimInst = open1(spec)
      val factCols = StructType
        .fromDDL(inst.stateAt(inst.latestVersion)._2).fieldNames.toSet
      DimJoin(dimInst, d.factKey.get, d.dimKey.get, factCols, spec)
    }
    new MaterializedAggView(inst, view, d.groupCols, d.sumCols,
      d.minCols, d.maxCols, dj, d.where,
      d.groupPhys, d.sumPhys, d.minPhys, d.maxPhys)
  }

  private def viewSchema(srcSchema: StructType, groupCols: Seq[String],
      sumCols: Seq[String], minCols: Seq[String],
      maxCols: Seq[String]): StructType = {
    require(groupCols.nonEmpty, "at least one group column is required " +
      "(for a global aggregate, use metadata-only aggregate pushdown)")
    // reserved spellings: the view's own columns and the delta's
    // working columns must not collide with source columns in play
    val reserved = Set("obj_id", "cnt", "_w", "_dirty", "_vid", "_sid",
        "_did", "_mmid", "_net") ++
      sumCols.flatMap(c => Seq(s"sum_$c", s"nn_$c")) ++
      minCols.flatMap(c => Seq(s"min_$c", s"del_min_$c",
        s"_t_min_$c", s"_abs_min_$c")) ++
      maxCols.flatMap(c => Seq(s"max_$c", s"del_max_$c",
        s"_t_max_$c", s"_abs_max_$c"))
    (groupCols ++ sumCols ++ minCols ++ maxCols).foreach(c =>
      require(!reserved(c),
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
    (minCols ++ maxCols).foreach { c =>
      val f = byName.getOrElse(c, throw new IllegalArgumentException(
        s"min/max column $c not in source schema"))
      // atomic orderable types only (no arrays/maps/structs): the
      // stored extremum must compare with least/greatest
      import org.apache.spark.sql.types._
      val orderable = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | _: BinaryType =>
          false
        case _ => true
      }
      require(orderable,
        s"min/max column $c must be an atomic orderable type " +
          s"(got ${f.dataType.simpleString})")
    }
    StructType(
      StructField("obj_id", LongType, nullable = false) +:
      groupCols.map(byName(_).copy(nullable = true)) ++:
      StructField("cnt", LongType, nullable = false) +:
      (sumCols.flatMap(c => Seq(
        StructField(s"sum_$c", LongType, nullable = true),
        StructField(s"nn_$c", LongType, nullable = false))) ++
       minCols.map(c =>
        StructField(s"min_$c", byName(c).dataType, nullable = true)) ++
       maxCols.map(c =>
        StructField(s"max_$c", byName(c).dataType, nullable = true))))
  }

  /** Create the (empty) view table beside its persisted definition.
    * `sourceSpec` overrides what the definition records as the source
    * (the SQL catalog stores the dotted table name so views survive a
    * warehouse move; the default records the source's root path).
    * `where` restricts the view to source rows matching the predicate
    * (head logical names; validated against the source schema here). */
  def create(spark: SparkSession, viewRoot: String, source: Instance,
      groupCols: Seq[String], sumCols: Seq[String],
      sourceSpec: Option[String] = None,
      where: Option[String] = None,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      dimJoin: Option[DimJoin] = None): MaterializedAggView = {
    val head = source.latestVersion
    val factSchema = StructType.fromDDL(source.stateAt(head)._2)
    // join views resolve each group/sum column against exactly ONE
    // side; ambiguous or missing names fail at create
    val srcSchema = dimJoin match {
      case None => factSchema
      case Some(dj) =>
        require(minCols.isEmpty && maxCols.isEmpty,
          "MIN/MAX are not supported on join views (a dim change would " +
          "force recompute storms); use a plain view on the fact table")
        val dimSchema = StructType.fromDDL(
          dj.dim.stateAt(dj.dim.latestVersion)._2)
        require(factSchema.fieldNames.contains(dj.factKey),
          s"factKey ${dj.factKey} not in fact schema")
        require(dimSchema.fieldNames.contains(dj.dimKey),
          s"dimKey ${dj.dimKey} not in dim schema")
        val factNames = factSchema.fieldNames.toSet
        val dimNames = dimSchema.fieldNames.toSet
        (groupCols ++ sumCols).foreach { c =>
          require(!(factNames(c) && dimNames(c)),
            s"column $c is ambiguous: present in both fact and dim")
          require(factNames(c) || dimNames(c),
            s"column $c in neither fact nor dim schema")
        }
        StructType(factSchema.fields ++
          dimSchema.fields.filterNot(f => factNames(f.name)))
    }
    val schema = viewSchema(srcSchema, groupCols, sumCols, minCols, maxCols)
    // fail at create, not first refresh: the predicate must resolve
    // against the source schema alone (no view/delta columns)
    where.foreach { w =>
      // join views: the predicate is applied to the FACT side before
      // the join, so it must resolve against the fact schema alone
      val probe = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), factSchema)
      probe.filter(expr(w)).queryExecution.analyzed
    }
    // pin each view column's PHYSICAL source name now — the stable
    // identity refresh resolves against future renames
    val ren = source.tableStateAt(head).renames
    def phys(c: String) =
      if (dimJoin.isDefined) c else ren.getOrElse(c, c)
    val groupPhys = groupCols.map(phys)
    val sumPhys = sumCols.map(phys)
    val minPhys = minCols.map(phys)
    val maxPhys = maxCols.map(phys)
    // normalize the caller's DimJoin: factCols always reflects the
    // fact schema here, and an empty dimSpec records the dim's root
    val dj2 = dimJoin.map(dj => dj.copy(
      factCols = factSchema.fieldNames.toSet,
      dimSpec = if (dj.dimSpec.nonEmpty) dj.dimSpec else dj.dim.root))
    val view = VersionedTable.create(spark, viewRoot, schema)
    writeDef(view, sourceSpec.getOrElse(source.root), groupCols, sumCols,
      minCols, maxCols, where, groupPhys, sumPhys, minPhys, maxPhys,
      dj2.map(dj => (dj.dimSpec, dj.factKey, dj.dimKey)))
    new MaterializedAggView(source, view, groupCols, sumCols,
      minCols, maxCols, dj2, where,
      Some(groupPhys), Some(sumPhys), Some(minPhys), Some(maxPhys))
  }

  /** Re-open an existing view (definition is supplied by the caller;
    * the watermark lives in the view table's manifest). The group/sum
    * names are taken as CURRENT logical names — a view that must
    * survive source renames should be reopened via [[openFromDef]],
    * which carries the create-time physical identities. */
  def open(spark: SparkSession, viewRoot: String, source: Instance,
      groupCols: Seq[String], sumCols: Seq[String],
      where: Option[String] = None,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): MaterializedAggView =
    new MaterializedAggView(source, VersionedTable.open(spark, viewRoot),
      groupCols, sumCols, minCols, maxCols, None, where,
      None, None, None, None)
}
