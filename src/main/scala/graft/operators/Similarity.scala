package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Engine, Q}
import graft.expressions.VectorExpressions

/** Vector-similarity operators (SURVEY.md §2.2 Q25-embeddings/Q26):
  * cosine similarity on ARRAY<FLOAT> embeddings, brute-force exact top-k
  * as the verifiable baseline, a random-hyperplane LSH bucketed variant
  * as the sub-quadratic scale path, and cosine near-dup pairing.
  *
  * Per-pair cosine uses the codegen'd
  * [[graft.expressions.CosineSimilarity]] Catalyst expression — a tight
  * primitive loop inside whole-stage codegen (~25x faster than the
  * interpreted zip_with/aggregate form over millions of pairs), with the
  * exact accumulation order of DuckDB's list_dot_product so rounded
  * results hash-match the oracle.
  *
  * 100 TB design notes:
  *  - the query set is broadcast (small side), the corpus streams —
  *    brute force is a single narrow pass per corpus partition, no
  *    shuffle until the per-query top-k reduction;
  *  - the LSH path buckets both sides on a hyperplane signature so the
  *    join touches only same-bucket pairs; recall is tunable via plane
  *    count/probes (single-probe here — the exact query is the anchor).
  */
object Similarity {

  /** Codegen'd cosine (see [[graft.expressions.CosineSimilarity]]). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column =
    VectorExpressions.cosineSim(spark, a, b)

  private def emb(s: SparkSession, dir: String): DataFrame =
    Engine.table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Per-query argmax as a PARTIAL-AGGREGATABLE `max(struct(cs, -nid))`
    * instead of a row_number window: a window sorts and shuffles every
    * candidate score, while the struct-max combines map-side, so only
    * one partial row per (query, partition) reaches the shuffle — at
    * corpus scale the reduction input is O(queries · partitions), not
    * O(queries · corpus). Tie-break matches the oracle's
    * ORDER BY cs DESC, nid ASC: max on (cs, -nid) picks the smallest
    * neighbor id among equal scores. */
  private[operators] def top1(cand: DataFrame): DataFrame =
    cand.groupBy("qid")
      .agg(max(struct(col("cs"), (-col("nid")).as("nn"))).as("m"))
      .select(col("qid").as("vec_id"), (-col("m.nn")).as("neighbor_id"),
        col("m.cs").as("cs"))
      .orderBy("vec_id")

  /** Exact top-1 cosine neighbor for each query vector (brute force). */
  def annTop1(all: DataFrame, queries: DataFrame): DataFrame = {
    val s = all.sparkSession
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"))
    top1(all.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine(s, col("qv"), col("v")), 4).as("cs")))
  }

  /** Exact top-k cosine neighbors per query (brute force), ranked. For
    * k = 1 prefer [[annTop1]] (partial-aggregatable — no sort at all).
    * Here a per-query ranking window is the right tool: its input is
    * the CANDIDATE set, which at scale is already bounded by the index
    * (LSH bucket or IVF probe list), not the corpus — so the window
    * sorts O(queries x bucket) rows, and the brute-force form is the
    * verification anchor at moderate n. Tie-break: score desc, then
    * neighbor id asc (deterministic, matches the SQL oracle). */
  def annTopK(all: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val s = all.sparkSession
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"))
    val cand = all.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine(s, col("qv"), col("v")), 4).as("cs"))
    val w = Window.partitionBy("qid").orderBy(col("cs").desc, col("nid").asc)
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid").as("vec_id"), col("nid").as("neighbor_id"),
        col("cs"), col("rank"))
      .orderBy("vec_id", "rank")
  }

  /** Deterministic ±1 hyperplanes: sign from a small integer mix of
    * (plane, dim) — engine-version independent. */
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { j =>
      (0 until dim).map { d =>
        var x = (j.toLong << 32) | d.toLong
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
        x ^= x >>> 33
        if ((x & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Random-hyperplane signature bucket for an embedding column. Pick
    * nPlanes ≈ log2(rows / desiredBucketSize): more planes → smaller
    * buckets → faster but lower per-probe recall (recovered by
    * multi-probing on the query side — [[lshProbes]]). */
  def lshBucket(v: Column, dim: Int, nPlanes: Int = 16): Column =
    planes(nPlanes, dim).zipWithIndex.map { case (w, j) =>
      val wl = array(w.map(lit): _*)
      when(aggregate(zip_with(v, wl, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** Hyperplane margins m[j] = <v, plane_j> — the shared input of the
    * signature, the probe list, and the calibration tagger. */
  private def lshMargins(v: Column, dim: Int, nPlanes: Int): Column =
    array(planes(nPlanes, dim).map { w =>
      val wl = array(w.map(lit): _*)
      aggregate(zip_with(v, wl, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
    }: _*)

  private def bitOf(i: Column): Column =
    pow(lit(2.0), i.cast("double")).cast("long")

  /** Signature bucket from a margins array (one fold). */
  private def lshSigOf(m: Column, nPlanes: Int): Column =
    aggregate(
      zip_with(m, sequence(lit(0), lit(nPlanes - 1)),
        (x, i) => when(x > 0, bitOf(i)).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)

  /** Bit values of the `flipPlanes` lowest-|margin| planes, in margin
    * order (struct sort: margin first, index breaks ties). */
  private def lshLowBits(m: Column, nPlanes: Int, flipPlanes: Int): Column =
    transform(
      slice(array_sort(zip_with(m, sequence(lit(0), lit(nPlanes - 1)),
        (x, i) => struct(abs(x).as("a"), i.as("i")))), 1, flipPlanes),
      r => bitOf(r.getField("i")))

  /** QUERY-DIRECTED multi-probe bucket list (Lv et al., VLDB'07, the
    * standard multi-probe LSH technique): beside the query's own
    * signature bucket, probe the buckets reached by flipping subsets
    * (size ≤ `maxFlip`) of the `flipPlanes` hyperplanes with the
    * SMALLEST |margin| — the true neighbor's signature, when it
    * differs, almost always differs on exactly the planes the query
    * sits closest to, so directed probes buy more recall than their
    * scanned fraction (defaults: 1 + 5 + 10 + 10 = 26 probes of the
    * 2^6 = 64 buckets ≈ 41% of the corpus scanned, top-1 recall
    * measured 0.65 at sf0.1 on the locality-free bench fixture where
    * single-probe measured 0.000 — see ScaleSpec's ≥ 0.5 gate, the
    * LSH twin of IVF's gated nProbe=12 geometry which scans 75% for
    * 0.90). On corpora with real angular clusters the same geometry
    * scans far less per bucket; tune nPlanes up and probes down as
    * locality allows.
    *
    * Pure codegen'd SQL: margins via zip_with/aggregate, plane ranking
    * via array_sort on (|margin|, index) structs, bucket ids by XOR of
    * the chosen bit subsets. The corpus side still computes ONE bucket
    * ([[lshBucket]]); only the (small, broadcast) query side fans out
    * ×probes, so the join stays bucket-partitioned and sub-quadratic. */
  def lshProbes(v: Column, dim: Int, nPlanes: Int = 6,
      flipPlanes: Int = 5, maxFlip: Int = 3): Column = {
    require(flipPlanes <= nPlanes && maxFlip <= flipPlanes,
      s"bad probe geometry: $nPlanes planes, flip $flipPlanes, max $maxFlip")
    // every intermediate is referenced ONCE (higher-order functions
    // over a single margins array) — a per-probe expression would
    // duplicate the margins subtree ~|probes| times and melt codegen
    // (the first cut of this function cost ~14 s of janino time per
    // plan); this form keeps the tree linear in nPlanes + |probes|
    val m = lshMargins(v, dim, nPlanes)
    // signature: one fold over (margin, index) pairs
    val sig = lshSigOf(m, nPlanes)
    // bit values of the flipPlanes lowest-|margin| planes (struct sort
    // orders by field position: margin first, index breaks ties)
    val low = lshLowBits(m, nPlanes, flipPlanes)
    // static subset spec (1-based positions into `low`); the probe
    // buckets fold each subset's bits into sig by XOR
    val subsets: Seq[Seq[Int]] =
      (1 to maxFlip).flatMap(k => (1 to flipPlanes).combinations(k).toSeq)
    val spec = array(subsets.map(s => array(s.map(lit): _*)): _*)
    concat(array(sig), transform(spec, s =>
      aggregate(s, sig, (acc, j) => acc.bitwiseXOR(element_at(low, j)))))
  }

  /** LSH-bucketed ANN: same output shape as [[annTop1]] but candidates
    * are restricted to the query's multi-probe bucket list
    * (sub-quadratic; approximate — recall governed by the probe
    * geometry, gated in ScaleSpec like IVF's). Buckets are disjoint on
    * the corpus side and probe ids distinct per query, so no candidate
    * pair is scored twice. */
  def annTop1Lsh(all: DataFrame, queries: DataFrame, dim: Int,
      nPlanes: Int = 6, flipPlanes: Int = 5, maxFlip: Int = 3): DataFrame = {
    val s = all.sparkSession
    val bAll = all.withColumn("bkt", lshBucket(col("v"), dim, nPlanes))
    val q = queries
      .withColumn("probes",
        lshProbes(col("v"), dim, nPlanes, flipPlanes, maxFlip))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(col("probes")).as("bkt"))
    top1(bAll.join(broadcast(q), Seq("bkt"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine(s, col("qv"), col("v")), 4).as("cs")))
  }

  /** One-sided Wilson lower bound (default z = 1.28 ≈ 80%): the
    * calibration ladder accepts a rung only when its SAMPLE recall
    * statistically supports the target — a raw small-sample ratio
    * (11/12 = 0.917) routinely flatters a geometry whose population
    * recall is well below it. */
  private[operators] def wilsonLcb(hits: Long, n: Long,
      z: Double = 1.28): Double = {
    if (n == 0) return 0.0
    val p = hits.toDouble / n; val z2 = z * z
    (p + z2 / (2.0 * n) -
      z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))) / (1 + z2 / n)
  }

  /** Deterministic calibration queries: the TAIL of the hash-rank
    * permutation (id-order-free, reproducible). The tail, not the
    * head: IVF's k-means seeds are the permutation's HEAD, and
    * calibrating recall on the seed rows flatters the index (their
    * cells' centroids are biased toward them — a train/test leak that
    * measured 1.000 on the sample vs 0.55 on the population). */
  private def calibrationSample(all: DataFrame, n: Int): DataFrame =
    all.orderBy(Sampling.splitBucket(col("vec_id"), Int.MaxValue).desc,
      col("vec_id").desc).limit(n)

  /** Chosen geometry and measured sample recall of the LAST targeted
    * calibration on this JVM — diagnostic only (Bench prints them). */
  @volatile var lastLshCalibration: (Int, Int, Double) = (0, 0, -1.0)
  @volatile var lastIvfCalibration: (Int, Double) = (0, -1.0)

  /** Recall-TARGETED multi-probe LSH top-1: walk a monotone ladder of
    * probe geometries (wider flip sets → more buckets probed) and ship
    * the CHEAPEST one whose measured recall@1 on a small deterministic
    * query sample reaches `targetRecall`; the final rung probes every
    * bucket, so the walk always terminates at exact-equivalent answers
    * in the worst case. The calibration pays a handful of bounded jobs
    * (sample × ladder); the recall/scanned-fraction tradeoff is PRICED
    * instead of fixed — a user states the recall they need and the
    * geometry follows the corpus's actual locality. */
  def annTop1LshTargeted(all: DataFrame, queries: DataFrame, dim: Int,
      targetRecall: Double = 0.9, nPlanes: Int = 6,
      sampleQueries: Int = 16): DataFrame = {
    val s = all.sparkSession
    val ladder: Seq[(Int, Int)] = Seq(
      (math.min(4, nPlanes), 2), (math.min(5, nPlanes), 3),
      (nPlanes, 3), (nPlanes, 4), (nPlanes, nPlanes))
      .map { case (fp, mf) => (fp, math.min(mf, fp)) }.distinct
    val sample = calibrationSample(all, sampleQueries)
    // ONE corpus pass calibrates the WHOLE ladder (previously: the
    // exact anchor plus one full corpus re-scan per rung — bucket
    // signatures recomputed 4x for the same answers). Each (sample
    // query, corpus vector) pair is scored once — the same flops the
    // exact anchor alone paid — and tagged with its bucket-diff
    // geometry: k = planes flipped between the query's signature and
    // the vector's bucket, p = the deepest flipped plane's 1-based
    // rank in the query's |margin| order. Rung (fp, mf) probes exactly
    // the buckets {sig XOR S : S ⊆ fp lowest-margin planes, |S| <= mf},
    // so the pair is a rung candidate iff k = 0 OR (p <= fp AND
    // k <= mf) — every rung's top-1 AND the exact one fall out of one
    // partial-aggregatable grouped max.
    val mq = lshMargins(col("qv"), dim, nPlanes)
    val qside = sample
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .withColumn("_sig", lshSigOf(mq, nPlanes))
      .withColumn("_low", lshLowBits(mq, nPlanes, nPlanes))
    // bucket computed BEFORE the join: once per corpus vector, not per
    // (query x vector) pair
    val corpus = all.withColumn("_bkt", lshBucket(col("v"), dim, nPlanes))
    val pairs = corpus.join(broadcast(qside), col("vec_id") =!= col("qid"))
      .select(col("qid"),
        struct(round(cosine(s, col("qv"), col("v")), 4).as("cs"),
          (-col("vec_id")).as("nn")).as("_st"),
        col("_sig").bitwiseXOR(col("_bkt")).as("_d"), col("_low"))
      .withColumn("_k", expr("bit_count(_d)"))
      .withColumn("_p", aggregate(sequence(lit(1), lit(nPlanes)), lit(0),
        (acc, j) => when(
          col("_d").bitwiseAND(element_at(col("_low"), j)) =!= 0L,
          greatest(acc, j)).otherwise(acc)))
    val aggCols = max(col("_st")).as("_exact") +:
      ladder.init.zipWithIndex.map { case ((fp, mf), i) =>
        max(when(col("_k") === 0 ||
          (col("_p") <= fp && col("_k") <= mf), col("_st"))).as(s"_r$i")
      }
    // row layout: (qid, _exact, _r0.._r3) — bounded by sampleQueries
    val rows = pairs.groupBy("qid").agg(aggCols.head, aggCols.tail: _*)
      .collect()
    val n = rows.length.toLong
    var measured = -1.0
    val chosen = ladder.init.zipWithIndex.find { case (_, i) =>
      val hits = rows.count { r => !r.isNullAt(2 + i) &&
        r.getStruct(2 + i).getLong(1) == r.getStruct(1).getLong(1) }.toLong
      measured = if (n == 0) 1.0 else hits.toDouble / n
      // LCB, not the raw ratio: on a locality-free corpus the ladder
      // correctly escalates to the full-probe rung (= exact answers —
      // the honest outcome when the data gives LSH nothing to
      // exploit); on clustered corpora it stops early
      wilsonLcb(hits, n) >= targetRecall
    }.map(_._1).getOrElse(ladder.last)
    lastLshCalibration = (chosen._1, chosen._2,
      if (chosen == ladder.last) 1.0 else measured)
    // the full-probe rung visits every bucket — identical answers to
    // the exact scan, so run the cheaper brute-force plan directly
    // (no bucket explode/join machinery for the same candidates)
    if (chosen == ladder.last) annTop1(all, queries)
    else annTop1Lsh(all, queries, dim, nPlanes, chosen._1, chosen._2)
  }

  /** Recall-TARGETED IVF top-1: same contract as
    * [[annTop1LshTargeted]] with the nProbe ladder (the final rung
    * probes every cell = exact-equivalent). */
  def annTop1IvfTargeted(all: DataFrame, queries: DataFrame, dim: Int,
      targetRecall: Double = 0.9, nCells: Int = 16,
      sampleQueries: Int = 16): DataFrame = {
    val s = all.sparkSession
    val ladder = Seq(4, 8, 12, nCells).filter(_ <= nCells).distinct
    val sample = calibrationSample(all, sampleQueries)
    // ONE training for the whole ladder: every rung probes the same
    // index, only nProbe changes
    val cents = trainIvfCentroids(all, dim, nCells, iters = 3,
      trainSample = 4096, distributedTrain = false)
    val centroids: Array[(Int, Seq[Double])] =
      cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
    // ONE corpus pass calibrates the WHOLE ladder (previously: the
    // exact anchor plus one partial corpus re-scan — and one corpus
    // cell re-assignment — per rung). The corpus cell is the SAME
    // greatest(struct(cs, cell)) argmax [[ivfQuery]] assigns; the
    // query side ranks ALL cells by (cs desc, cell asc) exactly like
    // ivfQuery's probe window, and array_position of the pair's
    // corpus cell in that ranking is its minimal nProbe — rung hit
    // iff rank <= nProbe, so every rung's top-1 and the exact one
    // fall out of one grouped max.
    def nearestCell(v: Column): Column = {
      val scored = centroids.map { case (c, w) =>
        struct(cosine(s, v, array(w.map(lit): _*)).as("cs"),
          lit(c).as("cell"))
      }
      if (scored.length == 1) scored.head("cell")
      else greatest(scored.toIndexedSeq: _*)("cell")
    }
    val ranked = transform(array_sort(array(centroids.map { case (c, w) =>
        struct((-cosine(s, col("qv"), array(w.map(lit): _*))).as("nc"),
          lit(c).as("cell")) }.toIndexedSeq: _*)),
      x => x.getField("cell"))
    val qside = sample.select(col("vec_id").as("qid"), col("v").as("qv"))
      .withColumn("_cells", ranked)
    // cell assigned BEFORE the join: once per corpus vector, not per
    // (query x vector) pair
    val corpus = all.withColumn("_cell", nearestCell(col("v")))
    val pairs = corpus.join(broadcast(qside), col("vec_id") =!= col("qid"))
      .select(col("qid"),
        struct(round(cosine(s, col("qv"), col("v")), 4).as("cs"),
          (-col("vec_id")).as("nn")).as("_st"),
        array_position(col("_cells"), col("_cell")).as("_r"))
    val aggCols = max(col("_st")).as("_exact") +:
      ladder.zipWithIndex.map { case (p, i) =>
        max(when(col("_r") <= p, col("_st"))).as(s"_r$i") }
    // row layout: (qid, _exact, _r0..) — bounded by sampleQueries
    val rows = pairs.groupBy("qid").agg(aggCols.head, aggCols.tail: _*)
      .collect()
    val n = rows.length.toLong
    var measured = -1.0
    val chosen = ladder.zipWithIndex.find { case (_, i) =>
      val hits = rows.count { r => !r.isNullAt(2 + i) &&
        r.getStruct(2 + i).getLong(1) == r.getStruct(1).getLong(1) }.toLong
      measured = if (n == 0) 1.0 else hits.toDouble / n
      wilsonLcb(hits, n) >= targetRecall
    }.map(_._1).getOrElse(nCells)
    lastIvfCalibration = (chosen, measured)
    annTop1Ivf(all, queries, dim, nCells, chosen, centroids0 = Some(cents))
  }

  /** IVF (inverted-file) ANN: k-means cells + nProbe-cell search — the
    * other classic sub-quadratic index besides LSH.
    *
    * Train: deterministic Lloyd k-means over a BOUNDED driver-side
    * sample (first `trainSample` vector ids — fixed rule, so results
    * never depend on partitioning). Training an IVF coarse quantizer
    * on a sample is the standard practice at any corpus size: the
    * model is nCells x dim; its quality needs only a representative
    * sample, not the corpus — so training costs ONE bounded collect
    * and pure driver arithmetic, instead of `iters` distributed
    * assign+reduce jobs over the full data (which at 100 TB would
    * read the corpus `iters` extra times for no recall gain).
    *
    * Index: one pass assigns every corpus vector its nearest centroid
    * cell (a shuffle-free narrow map against the broadcast-sized
    * centroid matrix; the cell id becomes the partition/bucket key at
    * scale).
    *
    * Query: each query probes its `nProbe` nearest cells, so the
    * scanned fraction is ~nProbe/nCells of the corpus. Recall < 1 by
    * construction (a true neighbor can live in an unprobed cell) —
    * approximate, declared rows-only; the exact brute-force query is
    * the verifiable anchor. */
  def annTop1Ivf(all: DataFrame, queries: DataFrame, dim: Int,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 3,
      trainSample: Int = 4096, distributedTrain: Boolean = false,
      // pre-trained centroids (e.g. from [[annTop1IvfTargeted]]'s
      // calibration ladder, which probes the SAME index at several
      // nProbe settings — retraining per rung would pay the sample
      // collect + Lloyd arithmetic once per rung for bit-identical
      // centroids)
      centroids0: Option[Array[Array[Double]]] = None): DataFrame = {
    val s = all.sparkSession
    val cents: Array[Array[Double]] = centroids0.getOrElse(
      trainIvfCentroids(all, dim, nCells, iters, trainSample,
        distributedTrain))
    ivfQuery(s, all, queries, cents, nProbe)
  }

  /** Deterministic Lloyd k-means coarse quantizer (the `train` half of
    * [[annTop1Ivf]], reusable across probe settings). */
  private[operators] def trainIvfCentroids(all: DataFrame, dim: Int,
      nCells: Int, iters: Int, trainSample: Int,
      distributedTrain: Boolean): Array[Array[Double]] = {
    val s = all.sparkSession
    // ---- train: deterministic Lloyd k-means --------------------------
    // Two regimes, one seed rule. Seeds (and the driver regime's whole
    // training set) are drawn by a deterministic hash PERMUTATION of
    // the id (top-k by MINSTD rank — [[Sampling.splitBucket]]'s
    // generator at full width), not lowest-ids: on a corpus where id
    // correlates with time/domain the first-N rows would train skewed
    // centroids, while the hash rank is id-order-free yet reproducible
    // run to run.
    //  - driver (default): Lloyd over a bounded `trainSample` collect —
    //    the standard practice while nCells is small (the model is
    //    nCells x dim; quality needs a representative sample, not the
    //    corpus), costing ONE bounded collect and driver arithmetic.
    //  - distributed (`distributedTrain`): once nCells grows past a
    //    few hundred, a 4096-row sample starves cells (<16 rows each);
    //    each Lloyd round becomes one mapPartitions pass computing
    //    per-cell partial (sum, count) against broadcast centroids,
    //    tree-merged to the driver — O(nCells·dim) per partial, no
    //    vector ever collected, `iters` passes over the corpus.
    val seedCount =
      if (distributedTrain) nCells else math.max(nCells, trainSample)
    val sample: Array[Array[Double]] = all
      .orderBy(Sampling.splitBucket(col("vec_id"), Int.MaxValue), col("vec_id"))
      .limit(seedCount).collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "IVF index over an empty corpus")
    def cosSim(a: Array[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // strict > = first-wins argmax over a fixed scan order:
    // deterministic regardless of float ties
    def nearestIdx(v: Array[Double], cents: Array[Array[Double]]): Int = {
      var best = 0; var bestCs = Double.NegativeInfinity; var c = 0
      while (c < cents.length) {
        val cs = cosSim(v, scala.collection.immutable.ArraySeq.unsafeWrapArray(cents(c)))
        if (cs > bestCs) { bestCs = cs; best = c }
        c += 1
      }
      best
    }
    var cents: Array[Array[Double]] = sample.take(nCells)
    if (distributedTrain) {
      val vecs = all.select(col("v")).rdd
        .map(_.getSeq[Double](0).toArray)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        (1 to iters).foreach { _ =>
          val bc = s.sparkContext.broadcast(cents)
          val (sums, counts) = vecs.mapPartitions { it =>
            val cs = bc.value
            val pSums = Array.fill(cs.length)(new Array[Double](dim))
            val pCounts = new Array[Long](cs.length)
            it.foreach { v =>
              val best = nearestIdx(v, cs)
              var d = 0
              while (d < dim) { pSums(best)(d) += v(d); d += 1 }
              pCounts(best) += 1
            }
            Iterator.single((pSums, pCounts))
          }.treeReduce { case ((s1, c1), (s2, c2)) =>
            var c = 0
            while (c < s1.length) {
              var d = 0
              while (d < dim) { s1(c)(d) += s2(c)(d); d += 1 }
              c1(c) += c2(c); c += 1
            }
            (s1, c1)
          }
          bc.destroy()
          // a cell that captured no vectors keeps its previous centroid
          cents = cents.zipWithIndex.map { case (old, c) =>
            if (counts(c) == 0) old else sums(c).map(_ / counts(c))
          }
        }
      } finally vecs.unpersist()
    } else {
      (1 to iters).foreach { _ =>
        val sums = Array.fill(cents.length)(new Array[Double](dim))
        val counts = new Array[Long](cents.length)
        sample.foreach { v =>
          val best = nearestIdx(v, cents)
          var d = 0
          while (d < dim) { sums(best)(d) += v(d); d += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old else sums(c).map(_ / counts(c))
        }
      }
    }
    cents
  }

  /** The `index + probe` half of [[annTop1Ivf]]: assign corpus cells,
    * probe each query's nProbe nearest cells, exact-score candidates. */
  private def ivfQuery(s: SparkSession, all: DataFrame,
      queries: DataFrame, cents: Array[Array[Double]],
      nProbe: Int): DataFrame = {
    val centroids: Array[(Int, Seq[Double])] =
      cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
    def nearestCell(v: Column): Column = {
      // argmin over cells of (1 - cosine) == argmax cosine
      val scored = centroids.map { case (c, w) =>
        struct(cosine(s, v, array(w.map(lit): _*)).as("cs"),
          lit(c).as("cell"))
      }
      if (scored.length == 1) scored.head("cell")
      else greatest(scored.toIndexedSeq: _*)("cell")
    }
    // ---- index: assign corpus vectors to cells (narrow map) ----------
    val indexed = all.withColumn("cell", nearestCell(col("v")))
    // ---- probe: nProbe nearest cells per query -----------------------
    val probes = queries.select(col("vec_id").as("qid"), col("v").as("qv"))
      .select(col("qid"), col("qv"), explode(array(centroids.map { case (c, w) =>
        struct(cosine(s, col("qv"),
          array(w.map(lit): _*)).as("cs"), lit(c).as("cell"))
      }.toIndexedSeq: _*)).as("sc"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("sc.cs").desc, col("sc.cell"))))
      .filter(col("rnk") <= nProbe)
      .select(col("qid"), col("qv"), col("sc.cell").as("cell"))
    top1(indexed.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine(s, col("qv"), col("v")), 4).as("cs")))
  }

  /** All EXACT pairs with cosine >= tau (embedding near-dup).
    *
    * The threshold lives in the JOIN CONDITION, not a post-join filter:
    * the broadcast nested-loop join evaluates `id_a < id_b AND
    * cosine(va,vb) >= tau` inside its whole-stage-codegen'd probe loop,
    * so the O(n^2) candidate pairs are only ever a pair of array
    * pointers in a register — no joined row (with two copied 64-double
    * arrays) is materialized unless it passes. The previous formulation
    * (condition `id_a < id_b`, cosine in a filter above the join) built
    * every candidate row first and was ~10x slower for the same flops.
    *
    * Exact all-pairs is inherently quadratic — this is the verifiable
    * anchor at moderate n (matrix-block scheduling, same flops). The
    * 100 TB path is [[cosineNearDupLsh]]. */
  def cosineNearDup(all: DataFrame, tau: Double): DataFrame = {
    val s = all.sparkSession
    val a = all.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = all.select(col("vec_id").as("id_b"), col("v").as("vb"))
    // no broadcast hint: a non-equi join picks BNLJ while a side fits
    // the broadcast threshold and degrades to a partitioned cartesian
    // (condition still evaluated in-loop) beyond it — a forced hint
    // would instead fail outright at the 8 GB broadcast limit
    a.join(b,
        col("id_a") < col("id_b") &&
        cosine(s, col("va"), col("vb")) >= tau)
      .select(col("id_a").as("vec_lo"), col("id_b").as("vec_hi"),
        round(cosine(s, col("va"), col("vb")), 4).as("cs"))
      .orderBy("vec_lo", "vec_hi")
  }

  /** Sub-quadratic near-dup: banded random-hyperplane LSH prefilter +
    * exact cosine verification (same output shape as [[cosineNearDup]];
    * zero false positives, recall < 1 by construction — approximate,
    * declared rows-only; the exact query is the correctness anchor).
    *
    * OR-amplification: `nBands * rPlanes` hyperplane sign bits (one
    * codegen'd [[graft.expressions.HyperplaneBands]] pass per row) are
    * split into `nBands` band keys; a pair is a candidate iff it
    * collides in ANY band: P[candidate] = 1-(1-p^r)^b with
    * p = 1 - angle(a,b)/pi. The defaults (32 bands x 8 planes) give
    * >=99.9% recall at tau 0.8+, ~94% at 0.6, degrading toward random
    * vectors — pick tau for true near-dup workloads; low taus on
    * near-orthogonal corpora are intrinsically hard for any LSH.
    *
    * Shuffle discipline (the 100 TB path):
    *  1. the banded index is NARROW — (bucket, vec_id) pairs only, so
    *     the self-join and the (id_a,id_b) candidate dedup shuffle
    *     16-byte rows, never embedding arrays;
    *  2. buckets with 8 planes are 256-way selective per band, so
    *     same-bucket pairing is sub-quadratic for any clustered corpus;
    *  3. vectors are fetched for surviving candidates via two equi
    *     joins (AQE broadcasts the corpus side when small; at scale
    *     both are hash joins on vec_id), then exact cosine verifies. */
  def cosineNearDupLsh(all: DataFrame, tau: Double, dim: Int,
      nBands: Int = 32, rPlanes: Int = 8): DataFrame = {
    val s = all.sparkSession
    val banded = all
      .select(col("vec_id"), posexplode(
        VectorExpressions.hyperplaneBands(s, col("v"), nBands, rPlanes))
        .as(Seq("band", "key")))
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val va = all.select(col("vec_id").as("id_a"), col("v").as("va"))
    val vb = all.select(col("vec_id").as("id_b"), col("v").as("vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .filter(cosine(s, col("va"), col("vb")) >= tau)
      .select(col("id_a").as("vec_lo"), col("id_b").as("vec_hi"),
        round(cosine(s, col("va"), col("vb")), 4).as("cs"))
      .orderBy("vec_lo", "vec_hi")
  }

  private val cosSql =
    "list_dot_product(qv, v)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(v, v)))"

  val defs: Seq[(String, Q)] = Seq(

    "q26_ann_top1" -> Q(
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20), " +
      "p AS (SELECT qid, e.vec_id AS nid, " +
      s"ROUND($cosSql, 4) AS cs FROM q, e WHERE e.vec_id <> qid) " +
      "SELECT qid AS vec_id, nid AS neighbor_id, cs FROM (" +
      "SELECT qid, nid, cs, ROW_NUMBER() OVER (" +
      "PARTITION BY qid ORDER BY cs DESC, nid) AS rn FROM p) t " +
      "WHERE rn = 1 ORDER BY vec_id") {
      (s, dir) =>
        val all = emb(s, dir)
        annTop1(all, all.filter(col("vec_id") < 20))
    },

    "q26_ann_topk" -> Q(
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20), " +
      "p AS (SELECT qid, e.vec_id AS nid, " +
      s"ROUND($cosSql, 4) AS cs FROM q, e WHERE e.vec_id <> qid) " +
      "SELECT qid AS vec_id, nid AS neighbor_id, cs, rank FROM (" +
      "SELECT qid, nid, cs, ROW_NUMBER() OVER (" +
      "PARTITION BY qid ORDER BY cs DESC, nid) AS rank FROM p) t " +
      "WHERE rank <= 5 ORDER BY vec_id, rank") {
      (s, dir) =>
        val all = emb(s, dir)
        annTopK(all, all.filter(col("vec_id") < 20), 5)
    },

    // approximate (recall-targeted multi-probe LSH): the shipped key
    // calibrates its probe geometry against a seeded sample until
    // measured recall@1 >= 0.9 — a user gets the recall they asked
    // for, not whatever a fixed geometry happens to give. Rows-only
    // (recall < 1 by construction); ScaleSpec gates >= 0.8 measured.
    "q26_ann_lsh" -> Q.noOracle {
      (s, dir) =>
        val all = emb(s, dir)
        annTop1LshTargeted(all, all.filter(col("vec_id") < 20), dim = 64,
          targetRecall = 0.9)
    },

    // approximate (recall-targeted IVF): same contract on the nProbe
    // ladder; deterministic seeded k-means, rows-only
    "q26_ann_ivf" -> Q.noOracle {
      (s, dir) =>
        val all = emb(s, dir)
        annTop1IvfTargeted(all, all.filter(col("vec_id") < 20), dim = 64,
          targetRecall = 0.9)
    },

    // PERSISTED IVF index: build (train + bucket-partitioned assignment
    // table) -> reopen from disk -> search at FULL probe, which is
    // exactly brute force by construction — so the persisted-index
    // machinery (metadata round-trip, partition-pruned candidate read,
    // probe ranking) is hash-gated against the same DuckDB oracle as
    // q26_ann_top1. Partial-probe recall is gated in IvfIndexSpec.
    "q75_ann_index" -> Q(
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20), " +
      "p AS (SELECT qid, e.vec_id AS nid, " +
      s"ROUND($cosSql, 4) AS cs FROM q, e WHERE e.vec_id <> qid) " +
      "SELECT qid AS vec_id, nid AS neighbor_id, cs FROM (" +
      "SELECT qid, nid, cs, ROW_NUMBER() OVER (" +
      "PARTITION BY qid ORDER BY cs DESC, nid) AS rn FROM p) t " +
      "WHERE rn = 1 ORDER BY vec_id") {
      (s, dir) =>
        val all = emb(s, dir)
        val root = java.nio.file.Files
          .createTempDirectory("graft_ivfidx_").toUri.toString
        IvfIndex.build(all, root, dim = 64, nCells = 8)
        val idx = IvfIndex.open(s, root) // exercise the reopen path
        idx.search(all.filter(col("vec_id") < 20), nProbe = 8)
    },

    // recall-TARGETED search on the REOPENED persisted index: the
    // probe count comes from the calibration curve stored in
    // _ivf.json at build time — zero training or measurement jobs at
    // search. Approximate by construction (probe < full) → rows-only;
    // the recall (>= 0.9 target via Wilson-LCB acceptance) is
    // measured per-round in Bench's recall row, and the full-probe
    // rung of the SAME index is the hash-gated q75/q76 anchor.
    "q78_ann_index_targeted" -> Q.noOracle {
      (s, dir) =>
        val all = emb(s, dir)
        val root = java.nio.file.Files
          .createTempDirectory("graft_ivfidx_t_").toUri.toString
        IvfIndex.build(all, root, dim = 64, nCells = 8).calibrate()
        val idx = IvfIndex.open(s, root) // curve read from _ivf.json
        idx.searchTargeted(all.filter(col("vec_id") < 20),
          targetRecall = 0.9)
    },

    // the persisted index's top-k path, full probe = exact — gated
    // against q26_ann_topk's brute-force oracle
    "q76_ann_index_topk" -> Q(
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20), " +
      "p AS (SELECT qid, e.vec_id AS nid, " +
      s"ROUND($cosSql, 4) AS cs FROM q, e WHERE e.vec_id <> qid) " +
      "SELECT qid AS vec_id, nid AS neighbor_id, cs, rank FROM (" +
      "SELECT qid, nid, cs, ROW_NUMBER() OVER (" +
      "PARTITION BY qid ORDER BY cs DESC, nid) AS rank FROM p) t " +
      "WHERE rank <= 5 ORDER BY vec_id, rank") {
      (s, dir) =>
        val all = emb(s, dir)
        val root = java.nio.file.Files
          .createTempDirectory("graft_ivfidx_k_").toUri.toString
        val idx = IvfIndex.build(all, root, dim = 64, nCells = 8)
        idx.searchTopK(all.filter(col("vec_id") < 20), k = 5, nProbe = 8)
    },

    "q25_embed_neardup" -> Q(
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "p AS (SELECT a.vec_id AS vec_lo, b.vec_id AS vec_hi, " +
      "list_dot_product(a.v, b.v)/(sqrt(list_dot_product(a.v, a.v))*sqrt(list_dot_product(b.v, b.v))) AS csx " +
      "FROM e a JOIN e b ON a.vec_id < b.vec_id) " +
      "SELECT vec_lo, vec_hi, ROUND(csx, 4) AS cs FROM p " +
      "WHERE csx >= 0.4 ORDER BY vec_lo, vec_hi") {
      (s, dir) => cosineNearDup(emb(s, dir), 0.4)
    },

    // sub-quadratic LSH-prefiltered variant (approximate recall by
    // construction -> rows-only; exact-recall property vs the brute
    // query is pinned in ScaleSpec)
    "q25_embed_neardup_lsh" -> Q.noOracle {
      (s, dir) => cosineNearDupLsh(emb(s, dir), 0.4, dim = 64)
    }
  )
}
