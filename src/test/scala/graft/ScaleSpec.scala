package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, SkewJoin}

/** Scale-technique tests: salting for skew and bucketing for
  * co-located (shuffle-free) joins — the manual levers used when AQE
  * alone isn't enough at 100 TB. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("salted join equals plain join on skewed keys") {
    // 90% of rows share one hot key — the classic skew shape
    val large = (1 to 2000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong)
    }.toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (0L, "f")).toDF("k", "name")

    val plain = large.join(small, "k")
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.salted(large, small, "k")
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("runtime bloom filter prunes the fact scan under a selective dim filter") {
    // the 100 TB shape: a selective dimension predicate should reach
    // the fact side BEFORE the shuffle via an injected bloom filter
    // (row-level runtime filtering), not be applied only at the join.
    // Thresholds are lowered to fixture scale; on a cluster the
    // defaults (10M rows / scan-size gates) trigger on real facts.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle join shape
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = "/root/testdata/sf0.01"
      def query() = {
        val orders = Engine.table(spark, d, "orders")
          .filter(col("o_totalprice") > 400000)
        val li = Engine.table(spark, d, "lineitem")
        li.join(orders, li("l_orderkey") === orders("o_orderkey"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("c"), sum("l_quantity").as("q"))
      }
      val withBloom = query()
      val rows = withBloom.collect().map(_.toSeq).toSet
      assert(withBloom.queryExecution.executedPlan.toString
        .contains("bloom_filter"), "no runtime bloom filter injected")
      // semantics unchanged vs the unfiltered plan
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(query().collect().map(_.toSeq).toSet == rows)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf; use the default ./spark-warehouse.
    // The in-memory catalog forgets tables across JVMs but leaves the
    // directories behind — clear both.
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("orders_b", "customer_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(wh, t))
    }
    Engine.table(spark, dir, "orders")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Engine.table(spark, dir, "customer")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
    assert(joined.count() ==
      Engine.table(spark, dir, "orders").count()) // FK: every order matches
  }

  test("LSH near-dup is a zero-false-positive subset of exact with bounded recall loss") {
    // deterministic hyperplanes -> this is a pinned result, not a flaky
    // statistical check. tau=0.4 on near-orthogonal synthetic vectors is
    // the WORST case for LSH (p^r collapses as angle -> 90 deg); the
    // subset property must still be exact and recall stays usable.
    val e = Engine.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = Similarity.cosineNearDup(e, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineNearDupLsh(e, 0.4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${(lsh -- exact).take(5)}")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.4, s"recall collapsed: $recall")
  }

  test("IVF ANN agrees with exact search on most queries (pinned, deterministic)") {
    // seeded init + fixed Lloyd rounds -> the index is a pure function
    // of the fixture; probing 4 of 16 cells scans ~25% of the corpus
    val e = Engine.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.annTop1(e, q)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.annTop1Ivf(e, q, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf.keySet == exact.keySet) // every query answered
    val agree = exact.count { case (k, v) => ivf.get(k).contains(v) }
    assert(agree >= (exact.size * 0.5).toInt,
      s"IVF found the true top-1 for only $agree/${exact.size} queries")
  }

  test("distributed IVF training: nCells=256 recall pinned, no vector ever collected") {
    // past a few hundred cells a 4096-row driver sample starves cells;
    // distributedTrain runs each Lloyd round as a mapPartitions pass
    // with tree-merged per-cell partials. Deterministic (seeded by the
    // same hash permutation, fixed partitioning) -> pinned, not flaky.
    // nProbe scales with nCells to keep the scanned fraction ~25%.
    val e = Engine.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.annTop1(e, q)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.annTop1Ivf(e, q, dim = 64, nCells = 256,
      nProbe = 64, distributedTrain = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf.keySet == exact.keySet) // every query answered
    val agree = exact.count { case (k, v) => ivf.get(k).contains(v) }
    assert(agree >= (exact.size * 0.5).toInt,
      s"distributed-trained IVF matched exact top-1 on only $agree/${exact.size}")
  }

  test("IVF recall >= 0.9 vs exact top-k at the bench scale factor (sf0.1)") {
    // the per-round quality bound for the approximate ANN keys at the
    // driver bench's own scale: the IVF answer must land inside the
    // exact top-5 (q26_ann_ivf vs q26_ann_topk — standard recall@k)
    // for >= 90% of queries, AND hit the true top-1 for most.
    // Deterministic (seeded training, fixed probes) — pinned, not
    // statistical. Bench.scala emits the strict top-1 agreement as a
    // "recall" row in BENCH_r{N}.json every round.
    val e = Engine.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 20)
    val exactTop5 = Similarity.annTopK(e, q, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exactTop1 = Similarity.annTop1(e, q)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.annTop1Ivf(e, q, dim = 64, nCells = 16, nProbe = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf.keySet == exactTop1.keySet)
    val recallK = ivf.count { case (k, v) => exactTop5(k).contains(v) }
      .toDouble / ivf.size
    val recall1 = exactTop1.count { case (k, v) => ivf.get(k).contains(v) }
      .toDouble / exactTop1.size
    info(f"sf0.1 IVF (nCells=16, nProbe=12): recall@5 $recallK%.3f, " +
      f"strict top-1 agreement $recall1%.3f")
    assert(recallK >= 0.9, f"sf0.1 IVF recall@5 $recallK%.3f < 0.9")
    assert(recall1 >= 0.75, f"sf0.1 IVF top-1 agreement $recall1%.3f < 0.75")
  }

  test("multi-probe LSH recall >= 0.5 vs exact top-1 at the bench scale factor (sf0.1)") {
    // the LSH twin of the IVF gate above: the fixed default probe
    // geometry (6 planes; probe the buckets reached by flipping
    // subsets of size <= 3 of the 5 lowest-|margin| planes =
    // 1 + 5 + 10 + 10 = 26 of 64 buckets, ~41% scanned) must find the
    // true top-1 for at least half the queries on the SAME fixture
    // where single-probe measured 0.000 (round-8 recall artifact) — a
    // shipped ANN surface must beat its own scanned fraction, or it
    // is just sampling. Deterministic (fixed planes, fixed probes) —
    // pinned. The SHIPPED q26 keys are recall-targeted on top of this
    // geometry ladder (next test).
    val e = Engine.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 20)
    val exactTop1 = Similarity.annTop1(e, q)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Similarity.annTop1Lsh(e, q, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall1 = exactTop1.count { case (k, v) => lsh.get(k).contains(v) }
      .toDouble / exactTop1.size
    info(f"sf0.1 multi-probe LSH: strict top-1 agreement $recall1%.3f")
    assert(recall1 >= 0.5, f"sf0.1 LSH top-1 agreement $recall1%.3f < 0.5")
  }

  test("recall-targeted ANN ships >= 0.8 measured top-1 at sf0.1 (LSH and IVF)") {
    // the shipped q26_ann_lsh / q26_ann_ivf keys calibrate their probe
    // geometry to targetRecall = 0.9 on a seeded sample; the gate
    // bounds the MEASURED recall on the real query set at >= 0.8
    // (sample-vs-population slack). Deterministic ladder + seeded
    // sample — pinned, not statistical.
    val e = Engine.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 20)
    val exactTop1 = Similarity.annTop1(e, q)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exactTop1.count { case (k, v) => got.get(k).contains(v) }
        .toDouble / exactTop1.size
    }
    val lshR = recallOf(
      Similarity.annTop1LshTargeted(e, q, dim = 64, targetRecall = 0.9))
    val (fp, mf, sampleLsh) = Similarity.lastLshCalibration
    info(f"targeted LSH: chose flip<=$mf of $fp (sample $sampleLsh%.3f), " +
      f"measured $lshR%.3f")
    assert(lshR >= 0.8, f"targeted LSH recall $lshR%.3f < 0.8")
    val ivfR = recallOf(
      Similarity.annTop1IvfTargeted(e, q, dim = 64, targetRecall = 0.9))
    val (np, sampleIvf) = Similarity.lastIvfCalibration
    info(f"targeted IVF: chose nProbe=$np (sample $sampleIvf%.3f), " +
      f"measured $ivfR%.3f")
    assert(ivfR >= 0.8, f"targeted IVF recall $ivfR%.3f < 0.8")
  }

  test("MV catch-up over a 500-commit interval takes the bounded rebuild path") {
    // a view left behind for weeks of micro-batch commits must not
    // fold an O(interval) plan: past mvRebuildMaxInterval the refresh
    // rebuilds from the head snapshot (O(table), bounded plan); below
    // it, the incremental fold's 32-version localCheckpoint batches
    // bound the plan depth. Both regimes exercised on one table.
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.acid.{EngineConf, MaterializedAggView, VersionedTable}
    val schema = StructType(Seq(
      StructField("obj_id", LongType, nullable = false),
      StructField("grp", StringType),
      StructField("v", LongType)))
    val src = VersionedTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_scale_mv_").toUri.toString,
      schema, EngineConf(mvRebuildMaxInterval = 300))
    val mv = MaterializedAggView.create(spark,
      java.nio.file.Files.createTempDirectory("graft_scale_mvv_").toUri.toString,
      src, groupCols = Seq("grp"), sumCols = Seq("v"))
    src.withRetry() { t =>
      t.insert(Seq((0L, "g0", 0L)).toDF("obj_id", "grp", "v")) }
    mv.refresh()
    (1 to 500).foreach { i =>
      src.withRetry() { t => t.insert(
        Seq((i.toLong, s"g${i % 8}", i.toLong)).toDF("obj_id", "grp", "v")) }
    }
    val t0 = System.nanoTime()
    mv.refresh()
    val rebuildS = (System.nanoTime() - t0) / 1e9
    assert(mv.lastRefreshMode == "rebuild",
      s"500-commit interval should rebuild, got ${mv.lastRefreshMode}")
    def viewRows() = mv.read().select("grp", "cnt", "sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    def oracle() = src.read().groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(viewRows() == oracle())
    // sub-threshold catch-up folds incrementally (bounded by the
    // 32-version localCheckpoint batching inside weightedDelta)
    (501 to 600).foreach { i =>
      src.withRetry() { t => t.insert(
        Seq((i.toLong, s"g${i % 8}", i.toLong)).toDF("obj_id", "grp", "v")) }
    }
    val t1 = System.nanoTime()
    mv.refresh()
    val incrS = (System.nanoTime() - t1) / 1e9
    assert(mv.lastRefreshMode == "incremental",
      s"100-commit interval should fold incrementally, got ${mv.lastRefreshMode}")
    assert(viewRows() == oracle())
    info(f"catch-up refresh: 500-commit rebuild $rebuildS%.2f s, " +
      f"100-commit incremental $incrS%.2f s")
  }

  test("codegen'd HyperplaneBands matches the interpreted plane generator") {
    // the expression and Similarity.lshBucket draw signs from the same
    // (plane, dim) integer mix — cross-check one vector end to end
    val e = Engine.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(8)
    val viaExpr = e.select(col("vec_id"),
        graft.expressions.VectorExpressions
          .hyperplaneBands(spark, col("v"), 1, 16)(0).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaHof = e.select(col("vec_id"),
        Similarity.lshBucket(col("v"), dim = 64, nPlanes = 16).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaHof)
  }
}
