package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.Engine
import graft.acid.{EngineConf, VersionedTable}

/** Persisted IVF index ([[IvfIndex]]): build trains once and lands a
  * bucket-partitioned assignment table; search reads only the probed
  * cells; full probe IS brute force; refresh folds a graft source's
  * churn incrementally under the fenced-watermark discipline. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  import spark.implicits._

  private val dim = 8

  // deterministic unit-ish vectors spread around the circle in the
  // first two dims (the rest zero): cosine structure is easy to reason
  // about and k-means has real clusters to find
  private def vec(i: Long): Seq[Double] = {
    val angle = (i % 32).toDouble / 32.0 * 2 * math.Pi
    Seq(math.cos(angle), math.sin(angle)) ++ Seq.fill(dim - 2)(0.0)
  }

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, vec(i.toLong))).toDF("vec_id", "v")

  test("full probe equals brute force; reopen round-trips; partial probe recalls") {
    val root = Files.createTempDirectory("graft_ivf_t1_").toUri.toString
    val all = corpus(128)
    IvfIndex.build(all, root, dim = dim, nCells = 4)
    val idx = IvfIndex.open(spark, root)
    assert(idx.dim == dim && idx.nCells == 4)
    val queries = all.filter(col("vec_id") < 10)
    val exact = Similarity.annTop1(all, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = idx.search(queries, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full == exact)
    // partial probe: vectors cluster by angle, so 2 of 4 cells should
    // recall most top-1s (gate loosely; geometry is deterministic)
    val part = idx.search(queries, nProbe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = exact.count { case (q, n) => part.get(q).contains(n) }
    assert(hits >= 7, s"partial-probe recall too low: $hits/10")
    // topK shape
    val topk = idx.searchTopK(queries, k = 3, nProbe = 4).collect()
    assert(topk.length == 30)
  }

  test("broadcast-scorer regime (nCells > PlanCells) answers identically") {
    val root = Files.createTempDirectory("graft_ivf_t3_").toUri.toString
    val all = corpus(256)
    IvfIndex.build(all, root, dim = dim, nCells = 80,
      distributedTrain = true)
    val idx = IvfIndex.open(spark, root)
    assert(idx.nCells == 80)
    val queries = all.filter(col("vec_id") < 6)
    val exact = Similarity.annTop1(all, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = idx.search(queries, nProbe = 80).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full == exact)
  }

  test("zero-norm vectors assign identically across scorer regimes") {
    // a zero-norm vector (or centroid) scores cosine NaN: Spark SQL
    // sorts NaN GREATEST while the broadcast scorer's `cs > bestCs`
    // never accepts it — unfixed, the regimes assign the same row to
    // DIFFERENT cells and a partial probe silently loses it. Both now
    // pin NaN to -Inf (rank last, tie-break lowest cell).
    val cents: Array[Array[Double]] = Array(
      Array.fill(dim)(0.0), // zero-norm centroid: NaN against everything
      (Seq(1.0, 0.0) ++ Seq.fill(dim - 2)(0.0)).toArray,
      (Seq(0.0, 1.0) ++ Seq.fill(dim - 2)(0.0)).toArray)
    val aRoot = Files.createTempDirectory("graft_ivf_nan_a_").toUri.toString
    val assign = VersionedTable.create(spark, aRoot, StructType(Seq(
      StructField("obj_id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType)),
      StructField("cell", org.apache.spark.sql.types.IntegerType))))
    val idx = new IvfIndex(spark,
      Files.createTempDirectory("graft_ivf_nan_").toUri.toString,
      dim, 3, cents, assign, None, "vec_id", "v")
    val rows = Seq(
      (0L, Seq.fill(dim)(0.0)),                          // zero vector
      (1L, Seq(1.0, 0.0) ++ Seq.fill(dim - 2)(0.0)),
      (2L, Seq(0.0, 1.0) ++ Seq.fill(dim - 2)(0.0)),
      (3L, Seq(-1.0, -1.0) ++ Seq.fill(dim - 2)(0.0))
    ).toDF("vec_id", "v")
    val sqlCells = idx.assignRows(rows).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val bcCells = rows.collect().map(r =>
      r.getLong(0) -> IvfIndex.nearestIdx(r.getSeq[Double](1).toArray,
        cents)).toMap
    assert(sqlCells == bcCells,
      s"regimes disagree: sql=$sqlCells broadcast=$bcCells")
    // the degenerate scores rank LAST: the zero vector falls to the
    // lowest cell id, and no real vector is captured by the dead
    // centroid (pre-fix, SQL assigned rows 1-3 to cell 0: NaN wins)
    assert(sqlCells(0L) == 0)
    assert(sqlCells(1L) == 1 && sqlCells(2L) == 2)
    assert(sqlCells(3L) != 0)
  }

  test("calibration curve persists, reopens, and prices targeted search") {
    val root = Files.createTempDirectory("graft_ivf_cal_").toUri.toString
    val all = corpus(128)
    val built = IvfIndex.build(all, root, dim = dim, nCells = 4)
    assert(built.calibrationCurve.isEmpty)
    // targeted search without a curve must fail loudly, not guess
    intercept[IllegalArgumentException](built.probeFor(0.9))
    val curve = built.calibrate()
    assert(curve.map(_._1) == Seq(1, 2)) // doubling ladder below nCells
    // the curve comes back through _ivf.json, not recomputed
    val idx = IvfIndex.open(spark, root)
    assert(idx.calibrationCurve == curve)
    val p = idx.probeFor(0.9)
    assert(p >= 1 && p <= 4)
    // an unreachable target escalates to the full (= exact) probe
    assert(idx.probeFor(1.0) == 4)
    // targeted result IS the chosen rung's result
    val queries = all.filter(col("vec_id") < 10)
    val targeted = idx.searchTargeted(queries, targetRecall = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val manual = idx.search(queries, nProbe = p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(targeted == manual)
    // and it actually recalls: >= 9/10 against brute force (the
    // Wilson-LCB acceptance is calibrated on a held-out-style tail
    // sample, so this is a genuine generalization check)
    val exact = Similarity.annTop1(all, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = targeted.count { case (q, nb) => exact.get(q).contains(nb) }
    assert(hits >= 9, s"targeted recall too low: $hits/10")
    // topK variant shares the probe selection
    assert(idx.searchTopKTargeted(queries, k = 3).count() == 30)
  }

  test("meta fields with quotes/backslashes round-trip through _ivf.json") {
    val root = Files.createTempDirectory("graft_ivf_esc_").toUri.toString
    val hostile = "v\"co\\l"
    val all = corpus(32).withColumnRenamed("v", hostile)
    IvfIndex.build(all, root, dim = dim, nCells = 2, vecCol = hostile)
    val idx = IvfIndex.open(spark, root)
    assert(idx.vecCol == hostile)
    assert(idx.idCol == "vec_id")
    // the index still searches through the hostile-named column
    assert(idx.search(all.filter(col("vec_id") < 4), nProbe = 2)
      .count() == 4)
  }

  test("refresh-on-epoch: the streaming sink advances the index per epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val srcRoot = Files.createTempDirectory("graft_ivf_se_").toUri.toString
    val src = VersionedTable.create(spark, srcRoot, StructType(Seq(
      StructField("obj_id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType)))))
    src.withRetry() { t => t.insert(
      (0 until 32).map(i => (i.toLong, vec(i.toLong)))
        .toDF("obj_id", "v")) }
    val root = Files.createTempDirectory("graft_ivf_se_i_").toUri.toString
    IvfIndex.buildFromTable(src, root, dim = dim, nCells = 4)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = Files.createTempDirectory("graft_ivf_se_ck_").toString
    mem.addData((100L, vec(100L)), (101L, vec(101L)))
    val q = mem.toDF().toDF("obj_id", "v")
      .writeStream.format("graft").option("path", srcRoot)
      .option("checkpointLocation", ckpt)
      .option("refreshIndexes", root)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val idx = IvfIndex.open(spark, root)
    assert(idx.indexedVersion == src.latestVersion)
    // the streamed rows are searchable without any manual refresh
    val queries = src.read().filter(col("obj_id") === 100L)
      .select(col("obj_id"), col("v"))
    assert(idx.search(queries, nProbe = 4).count() == 1)
  }

  test("SQL front door: create/refresh/search/drop + $indexes metadata") {
    import graft.acid.GraftCatalog
    val tag = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(8)
    val cat = s"gann$tag"
    val wh = Files.createTempDirectory("graft_ann_wh_").toUri.toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ann.vecs (obj_id BIGINT, v ARRAY<DOUBLE>)")
    corpus(64).createOrReplaceTempView(s"ann_src_$tag")
    spark.sql(s"INSERT INTO $cat.ann.vecs SELECT * FROM ann_src_$tag " +
      "WHERE vec_id < 48")
    spark.sql(s"CALL $cat.system.create_ann_index('ann.idx', 'ann.vecs', " +
      "dim => 8, n_cells => 4)")
    // $indexes: one row, fresh, calibrated (create default)
    val meta = spark.sql(
      s"SELECT n_cells, lag, calibrated FROM $cat.ann.`vecs$$indexes`")
      .collect()
    assert(meta.length == 1)
    assert(meta(0).getInt(0) == 4 && meta(0).getLong(1) == 0L &&
      meta(0).getBoolean(2))
    // churn + refresh: lag closes
    spark.sql(s"INSERT INTO $cat.ann.vecs SELECT * FROM ann_src_$tag " +
      "WHERE vec_id >= 48")
    assert(spark.sql(s"SELECT lag FROM $cat.ann.`vecs$$indexes`")
      .head.getLong(0) == 1L)
    spark.sql(s"CALL $cat.system.refresh_ann_index('ann.idx')")
    assert(spark.sql(s"SELECT lag FROM $cat.ann.`vecs$$indexes`")
      .head.getLong(0) == 0L)
    // full-probe search through SQL == brute force over the WHOLE
    // corpus (post-churn rows included)
    spark.sql(s"CREATE TABLE $cat.ann.q (obj_id BIGINT, v ARRAY<DOUBLE>)")
    spark.sql(s"INSERT INTO $cat.ann.q " +
      s"SELECT obj_id, v FROM $cat.ann.vecs WHERE obj_id < 6")
    val got = spark.sql(s"CALL $cat.system.ann_search('ann.idx', " +
      "'ann.q', k => 1, n_probe => 4)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val all = corpus(64)
    val exact = Similarity.annTop1(all, all.filter(col("vec_id") < 6))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exact)
    // target_recall path reads the persisted curve (no retraining)
    assert(spark.sql(s"CALL $cat.system.ann_search('ann.idx', 'ann.q', " +
      "k => 1, target_recall => 0.9)").count() == 6)
    // drop: deregisters + deletes
    spark.sql(s"CALL $cat.system.drop_ann_index('ann.idx')")
    assert(spark.sql(s"SELECT * FROM $cat.ann.`vecs$$indexes`").count()
      == 0L)
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.ann_search('ann.idx', 'ann.q', " +
        "k => 1)").collect()
    }
  }

  test("graft-source index refreshes incrementally and survives vacuum") {
    val srcRoot = Files.createTempDirectory("graft_ivf_src_").toUri.toString
    val src = VersionedTable.create(spark, srcRoot, StructType(Seq(
      StructField("obj_id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType)))),
      EngineConf(checkpointInterval = 2, orphanGraceMs = 0L))
    src.withRetry() { t => t.insert(
      (0 until 64).map(i => (i.toLong, vec(i.toLong)))
        .toDF("obj_id", "v")) }
    val root = Files.createTempDirectory("graft_ivf_t2_").toUri.toString
    val idx = IvfIndex.buildFromTable(src, root, dim = dim, nCells = 4)
    assert(idx.indexedVersion == src.latestVersion)

    // churn: move a vector to the opposite side (likely a CELL MOVE),
    // delete one, insert a new one
    src.withRetry() { t => t.update(Seq(0L),
      df => df.withColumn("v",
        array((Seq(-1.0, 0.0) ++ Seq.fill(dim - 2)(0.0)).map(lit): _*))) }
    src.withRetry() { t => t.delete(Seq(1L)) }
    src.withRetry() { t => t.insert(Seq((100L, vec(100L)))
      .toDF("obj_id", "v")) }
    val reopened = IvfIndex.open(spark, root)
    reopened.refresh()
    assert(reopened.indexedVersion == src.latestVersion)

    // the index answers EXACTLY like brute force over the CURRENT
    // source at full probe — deletions gone, update re-assigned
    val now = src.read().select(col("obj_id").as("vec_id"), col("v"))
    val queries = now.filter(col("vec_id") < 8)
    val exact = Similarity.annTop1(now, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = reopened.search(
      queries.select(col("vec_id").as("obj_id"), col("v")), nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exact)

    // refresh is idempotent (no new commits -> no-op)
    val v = reopened.refresh()
    assert(v == src.latestVersion)

    // a refresh interval older than vacuum retention rebuilds instead
    // of dying: churn several versions, vacuum hard, then refresh an
    // index that is many versions stale
    (0 until 5).foreach { i =>
      src.withRetry() { t => t.update(Seq(2L),
        df => df.withColumn("v", array(
          (Seq(math.cos(i + 1.0), math.sin(i + 1.0)) ++
            Seq.fill(dim - 2)(0.0)).map(lit): _*))) }
    }
    src.vacuum(retainVersions = 1)
    reopened.refresh()
    assert(reopened.indexedVersion == src.latestVersion)
    val now2 = src.read().select(col("obj_id").as("vec_id"), col("v"))
    val q2 = now2.filter(col("vec_id") < 8)
    val exact2 = Similarity.annTop1(now2, q2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got2 = reopened.search(
      q2.select(col("vec_id").as("obj_id"), col("v")), nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 == exact2)
  }
}
