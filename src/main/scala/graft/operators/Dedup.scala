package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Engine, Q}

/** Deduplication operators for LLM data pipelines (SURVEY.md §2.2
  * Q24/Q25): exact dedup, exact n-gram Jaccard similarity join, and two
  * sub-quadratic near-dup paths — MinHash-LSH and SimHash banding — each
  * followed by exact verification so output is deterministic and equal to
  * the exact-pair oracle whenever recall is 1 (verified on the fixtures).
  *
  * 100 TB design notes:
  *  - every stage is a hash-shuffle on a key (shingle / band signature /
  *    doc id); no driver-side collection, no O(n²) all-pairs stage;
  *  - candidate generation is LSH-banded so cost is
  *    O(docs · numHashes + candidate pairs), not O(docs²);
  *  - the exact-Jaccard inverted-index join is itself the standard
  *    scalable formulation (explode shingles, join on shingle) — at
  *    extreme scale add a document-frequency cutoff / prefix filter.
  */
object Dedup {

  /** Distinct word k-shingles ("w1 w2 w3") of a whitespace-tokenized
    * text column; empty array when the doc has fewer than k tokens
    * (mirrors generate_series emptiness in the oracle). */
  def shingles(text: Column, k: Int = 3): Column = {
    val w = split(text, " ")
    when(size(w) >= k,
      array_distinct(transform(sequence(lit(0), size(w) - k),
        i => concat_ws(" ", slice(w, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: hash-partition on the key columns, keep one row. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** C4-style repeated-span removal: tile each document into
    * consecutive `width`-word spans, drop every full-width span whose
    * text already occurred earlier in the corpus (first occurrence in
    * (doc, position) order survives), and reassemble the remaining
    * spans. Short tail tiles (the last < `width` words) are never
    * deduplicated — a one-word tail is not a meaningful span. A doc
    * whose every tile was removed drops out of the output.
    *
    * 100 TB notes: the whole keep-decision is ONE hash aggregate —
    * the winner per full-width span is `min(struct(id, idx))` under
    * `groupBy(span)`, and tail tiles (which are all kept) get a
    * per-row-unique group key so the same aggregate passes them
    * through. Partially aggregatable with map-side combine, so a
    * hyper-common span reduces on the mappers instead of sort-shuffling
    * every occurrence onto one window task; the tiling explode is
    * evaluated exactly once (no self-join back to pick the winner row —
    * the min-struct already carries it). Reassembly state is per-doc
    * (`collect_list` bounded by doc length), never global. */
  def dedupSpans(docs: DataFrame, width: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(width >= 1, "span width must be >= 1")
    val words = split(col(textCol), " ")
    val nTiles = ceil(size(words).cast("double") / width).cast("int")
    val tiles = docs
      .select(col(idCol), size(words).as("_nw"),
        posexplode(transform(sequence(lit(0), nTiles - 1),
          i => concat_ws(" ", slice(words, i * width + 1, lit(width))))))
      .withColumnRenamed("pos", "_idx").withColumnRenamed("col", "_span")
      .withColumn("_full", (col("_idx") + 1) * width <= col("_nw"))
    // full tiles group per span (winner = min struct); tail tiles get a
    // unique key (their own (id, idx)) so every one survives the agg
    val kept = tiles
      .groupBy(col("_full"), col("_span"),
        when(!col("_full"), struct(col(idCol), col("_idx"))).as("_tk"))
      .agg(min(struct(col(idCol), col("_idx"))).as("_w"))
      .select(col("_w")(idCol).as(idCol), col("_w")("_idx").as("_idx"),
        col("_span"))
    kept.groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("_idx"), col("_span"))))
        .as("_a"))
      .select(col(idCol),
        concat_ws(" ", transform(col("_a"), t => t("_span"))).as(textCol))
  }

  /** Docs with id + distinct shingle-hash set (one-pass codegen-friendly
    * scan, see [[graft.expressions.ShingleHashes]]) + set size. All
    * downstream consumers need only set semantics, so 64-bit hashes
    * replace shingle strings: smaller shuffles, cheap equality.
    *
    * `idCol` must be an INTEGRAL type (it is normalized to LONG here —
    * the per-bucket simhash pair loop and the `<` pair ordering both
    * operate on primitive longs). Rejected loudly rather than cast:
    * a string id would cast to null (silently empty output) and a
    * fractional id would truncate (distinct docs collapsing onto one
    * id) — non-integral ids need a surrogate (e.g. monotonically
    * increasing id or a 64-bit hash). */
  private def docShingles(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"dedup id column '$idCol' must be integral, got ${other.simpleString}; " +
        "derive a surrogate long id first")
    }
    // sorted ascending: the exact-verify kernel
    // ([[graft.expressions.SortedIntersectSize]]) is a merge over the
    // two sorted arrays; MinHash/SimHash sketches are order-independent
    docs.select(col(idCol).cast("long").as("id"),
      sort_array(graft.expressions.ShingleHashes
        .shingleHashes(docs.sparkSession, col(textCol), k)).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** Exact Jaccard verification of candidate pairs (columns id_a < id_b)
    * against the (sorted) shingle sets; emits (doc_lo, doc_hi, jac) for
    * jac >= tau. Intersection is a primitive merge
    * ([[graft.expressions.SortedIntersectSize]]); the two array-fetch
    * joins are plain equi joins on id — AQE broadcasts the doc side
    * while it is small, hash-joins at scale. */
  private def verifyPairs(cand: DataFrame, ds: DataFrame, tau: Double): DataFrame = {
    val s = ds.sparkSession
    val a = ds.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = ds.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("i", graft.expressions.SketchExpressions
        .sortedIntersectSize(s, col("sh_a"), col("sh_b")))
      .withColumn("jacx", col("i").cast("double")
        / (size(col("sh_a")) + size(col("sh_b")) - col("i")))
      .filter(col("jacx") >= tau)
      .select(col("id_a").as("doc_lo"), col("id_b").as("doc_hi"),
        round(col("jacx"), 4).as("jac"))
      .orderBy("doc_lo", "doc_hi")
  }

  /** Exact n-gram Jaccard similarity join via PREFIX-FILTERED inverted
    * index (the All-Pairs/PPJoin principle): under a GLOBAL total order
    * on shingles, index only each doc's first `n - ceil(tau*n) + 1`
    * shingles. Any pair with jac >= tau must share a PREFIX shingle —
    * jac >= tau implies overlap >= ceil(tau*n) on both sides (via the
    * tau*n <= |B| length bound), and two sets whose overlap >= t must
    * collide within their (n-t+1)-prefixes under a common total order.
    * Surviving candidates are exact-verified against the full sets
    * (sorted-merge intersection — see [[verifyPairs]]). Exact for ANY
    * choice of the global order; the order only shapes candidate count.
    *
    * Why not the plain inverted-index count: counting intersections per
    * co-occurring pair shuffles one row per (doc,doc,shingle)
    * co-occurrence — the hottest shingles contribute df² rows and the
    * per-pair count barely compresses (measured at sf0.1: 1.27M
    * co-occurrence rows into 1.13M groups — the shuffle IS the output).
    * The prefix drops ~half of each side up front (1.13M -> ~0.4M
    * candidates at tau 0.5) and verification is a near-free merge.
    *
    * `orderByDf = false` (default): global order = hash ascending. The
    * docs' arrays are already hash-sorted, so the prefix is literally
    * `slice(sh, 1, L)` — a narrow map-side pass, no extra shuffle.
    * `orderByDf = true`: global order = (document frequency asc, hash
    * asc) — rare shingles first, which evicts high-df shingles from
    * every prefix. Costs a df-count aggregate plus a per-doc ranking
    * window. On a flat synthetic vocabulary this buys nothing (df is
    * uniformly small), but on a Zipfian web corpus at 100 TB it is the
    * difference between prefix collisions tracking true near-dups and
    * one stop-phrase shingle contributing df²/4 candidate pairs —
    * turn it on for natural-language corpora at scale. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, tau: Double = 0.5,
      orderByDf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ds is consumed by the prefix and the verify joins; it is NOT
    // materialized — re-running the codegen shingle hash is cheaper
    // than writing the wide hash arrays (measured: a localCheckpoint
    // here costs ~10% on both keys)
    val ds = docShingles(docs, idCol, textCol, k)
    // ceil(n*tau) must be the RATIONAL ceiling: for taus not exactly
    // representable in binary (0.9*10 evaluates to 9.000000000000002,
    // ceil = 10 instead of 9) the naive form shortens the prefix by one
    // and silently drops pairs sitting exactly at the threshold. The
    // epsilon nudge keeps the ceiling exact for any realistic tau (it
    // would take |n*tau - k| < 1e-9 ≠ 0 to fool it, impossible for
    // doc sizes < ~1e8 at rational taus).
    def overlapCeil(n: Column): Column = ceil(n * lit(tau) - lit(1e-9))
    // the prefix carries (n = set size, p = 1-based rank of s within
    // the doc under the global order) so the candidate join can apply
    // two EXACTNESS-PRESERVING prunes before the distinct+verify:
    //  - length-ratio: jac >= tau implies |A∩B| <= min and |A∪B| >=
    //    max, so min(n_a, n_b) >= tau * max(n_a, n_b);
    //  - positional (PPJoin): jac >= tau iff overlap >= ceil(tau/(1+
    //    tau) * (n_a+n_b)). For the pair's FIRST common element under
    //    the global order, nothing before its positions intersects, so
    //    overlap <= min(n_a-p_a, n_b-p_b) + 1 — a qualifying pair's
    //    first-common-element row always passes, and the pair survives
    //    the ANY-row-passes distinct. Rows for later shared elements
    //    may be pruned, which only removes duplicate collisions.
    // Both prunes cut the candidate-pair set the exact verify must
    // merge-intersect — the dominant cost — and drop no true pair.
    val prefix =
      if (!orderByDf) {
        // sh is sorted ascending: its first L elements ARE the prefix
        // under the hash-asc global order (posexplode rank = position
        // in the full sorted set)
        val L = (size(col("sh")) - overlapCeil(size(col("sh")))
          + lit(1)).cast("int")
        ds.select(col("id"), size(col("sh")).as("n"),
            posexplode(slice(col("sh"), lit(1), L)).as(Seq("p0", "s")))
          .select(col("id"), col("n"), (col("p0") + 1).as("p"), col("s"))
      } else {
        // carry the set size through the explode so ranking needs only
        // ONE window function (row_number); n as a second windowed
        // count would buffer every partition twice
        val ex = ds.select(col("id"), size(col("sh")).as("n"),
          explode(col("sh")).as("s"))
        val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
        // the ranked prefix is consumed twice by the candidate
        // self-join below; without a cut each side re-runs the whole
        // explode -> dfreq-join -> window chain (4-5 subtree
        // evaluations end to end). localCheckpoint materializes the
        // narrow (id, n, p, s) prefix once — same bounded-lineage
        // pattern as Instance.changes()
        ex.join(dfreq, "s")
          .withColumn("pos", row_number().over(
            Window.partitionBy("id").orderBy(col("df"), col("s"))))
          .filter(col("pos") <= col("n") - overlapCeil(col("n")) + lit(1))
          .select(col("id"), col("n"), col("pos").as("p"), col("s"))
          .localCheckpoint()
      }
    val needed = ceil((col("n_a") + col("n_b")) * lit(tau / (1.0 + tau))
      - lit(1e-9))
    val cand = prefix.select(col("id").as("id_a"), col("n").as("n_a"),
        col("p").as("p_a"), col("s"))
      .join(prefix.select(col("id").as("id_b"), col("n").as("n_b"),
        col("p").as("p_b"), col("s")), "s")
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(tau) * greatest(col("n_a"), col("n_b")) - lit(1e-9))
      .filter(least(col("n_a") - col("p_a"), col("n_b") - col("p_b"))
        + lit(1) >= needed)
      .select("id_a", "id_b").distinct()
    verifyPairs(cand, ds, tau)
  }

  /** Train/heldout decontamination (eval-set integrity): `train` docs
    * sharing at least one word-k-gram with any `heldout` doc, with the
    * count of distinct leaked k-grams — the audit artifact a training
    * pipeline keeps before dropping the hits. k=8 is the conventional
    * contamination n-gram.
    *
    * 100 TB shape: explode k-grams both sides, hash-join on the gram,
    * per-doc aggregate — sub-quadratic, one shuffle keyed on the gram;
    * the heldout gram set (eval corpora are small) is distinct-ed
    * first and AQE broadcasts it while it fits. Grams travel as their
    * 64-bit hash ([[graft.expressions.ShingleHashes]], one codegen'd
    * pass, ~100x cheaper than the string-HOF pipeline and an 8x
    * narrower shuffle than 8-word gram strings); set-membership is all
    * the join needs, exactly as in [[jaccardPairs]]. */
  def contaminated(train: DataFrame, heldout: DataFrame,
      idCol: String, textCol: String, k: Int = 8): DataFrame = {
    def grams(df: DataFrame) = graft.expressions.ShingleHashes
      .shingleHashes(df.sparkSession, col(textCol), k)
    val tr = train.select(col(idCol).as("doc_id"),
      explode(grams(train)).as("s"))
    val hd = heldout.select(explode(grams(heldout)).as("s")).distinct()
    tr.join(hd, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_leaked"))
  }

  /** MinHash-LSH near-dup join: numHashes minhashes, banded into
    * numHashes/bandRows bands; same-band collisions become candidates,
    * then exact-verified. Recall for J≥0.85 at (128, 4) is 1-(1-J⁴)³² ≈ 1.
    *
    * Signatures + band keys are a single map-side expression per doc
    * ([[graft.expressions.MinHashBands]]) — no shuffle until the tiny
    * band-collision join. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, tau: Double = 0.5,
      numHashes: Int = 128, bandRows: Int = 4): DataFrame = {
    val ds = docShingles(docs, idCol, textCol, k)
    val bands = ds.select(col("id"),
      posexplode(graft.expressions.SketchExpressions
        .minhashBands(docs.sparkSession, col("sh"), numHashes, bandRows))
        .as(Seq("band", "bsig")))
    val cand = bands.select(col("id").as("id_a"), col("band"), col("bsig"))
      .join(bands.select(col("id").as("id_b"), col("band"), col("bsig")),
        Seq("band", "bsig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyPairs(cand, ds, tau)
  }

  /** SimHash near-dup join: 64-bit simhash over shingle hashes, banded
    * into `nBands` chunks of `64/nBands` bits; pigeonhole guarantees any
    * pair with hamming < nBands collides in some band. Short docs (few
    * shingles) have noisy per-bit sums, so near-dups can sit at hamming
    * 5–10 — use many narrow bands (default 16×4 bits, recall guaranteed
    * to hamming 15) and let hamming filter + exact verification at `tau`
    * remove false positives. At web scale with large feature sets,
    * 4×16-bit bands and maxHamming ≈ 3 is the cheaper classic setting.
    *
    * Candidate enumeration is per-BUCKET, not a self-join: with 4-bit
    * band keys a bucket holds n/16 docs, and a (band,key) equi-join
    * materializes ~n²/2 joined rows just to discard ~all of them at the
    * hamming check (12.7M rows / 443 survivors at sf0.1 — the join
    * machinery cost 6 s where the XOR+popcount work is milliseconds).
    * Instead each bucket's (id, fingerprint) pairs are collected into
    * one row and the quadratic loop runs as primitive-array flatMap
    * with the hamming test inline, emitting only survivors. Bucket
    * size bounds the loop: keys must be wide enough that a bucket fits
    * in memory (at 1e9 docs use 16-bit bands; the 4-bit default is for
    * the hamming-15 guarantee at moderate n). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, tau: Double = 0.9, maxHamming: Int = 15,
      nBands: Int = 16, maxBucket: Int = 1 << 16): DataFrame = {
    val ds = docShingles(docs, idCol, textCol, k)
    // fingerprint is a map-side expression per doc — no shuffle
    val sims = ds.select(col("id"), graft.expressions.SketchExpressions
      .simhashFp(docs.sparkSession, col("sh")).as("fp"))
    val bandBits = 64 / nBands
    val mask = (1L << bandBits) - 1
    val bands = sims.select(col("id"), col("fp"),
      posexplode(array((0 until nBands).map(kk =>
        shiftright(col("fp"), kk * bandBits).bitwiseAND(mask)): _*))
        .as(Seq("band", "key")))
    val pairEnc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    val cand = bands.groupBy("band", "key")
      .agg(collect_list(struct(col("id"), col("fp"))).as("es"))
      .select(col("es"))
      .flatMap { (row: org.apache.spark.sql.Row) =>
        val es = row.getSeq[org.apache.spark.sql.Row](0)
        val n = es.size
        // a skewed or too-narrow band key piles a large fraction of the
        // corpus into ONE collect_list row — fail loudly before the
        // quadratic loop (and the single-row materialization) melts an
        // executor; the fix is wider bands (e.g. 16-bit at 1e9 docs).
        // 64k is already ~2e9 hamming checks (~seconds) for one bucket
        // — past that the loop is the problem, not just the memory
        if (n > maxBucket) throw new IllegalStateException(
          s"simhash bucket holds $n docs (> maxBucket=$maxBucket); " +
          "band keys are too narrow for this corpus — increase band " +
          "width (fewer, wider bands) or raise maxBucket")
        val ids = new Array[Long](n)
        val fps = new Array[Long](n)
        var i = 0
        es.foreach { e => ids(i) = e.getLong(0); fps(i) = e.getLong(1); i += 1 }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            // ids(i) == ids(j) happens when the input carries duplicate
            // doc ids; a (id,id) self-pair would pass the hamming test
            // (distance 0) yet was never a candidate under the join
            // formulation's strict id_a < id_b
            if (ids(i) != ids(j) &&
                java.lang.Long.bitCount(fps(i) ^ fps(j)) <= maxHamming)
              out += (if (ids(i) < ids(j)) (ids(i), ids(j))
                      else (ids(j), ids(i)))
            j += 1
          }
          i += 1
        }
        out
      }(pairEnc)
      .toDF("id_a", "id_b").distinct()
    verifyPairs(cand, ds, tau)
  }

  /** Connected components of an undirected pair graph — the clustering
    * step a real dedup pipeline runs on the near-dup pairs (greedy
    * "drop doc_hi" under-merges transitive chains A~B, B~C where A~C
    * was never a candidate). Labels converge to the MINIMUM id
    * reachable from each node.
    *
    * Algorithm: iterative min-label propagation — each round joins
    * labels across edges and keeps the per-node minimum, until a round
    * changes nothing. Rounds = graph diameter (near-dup clusters are
    * shallow: dozens of rounds would mean pathological chains). Each
    * round is two hash-shuffles over the EDGE set, not the corpus, and
    * the loop is driver-coordinated exactly like Pregel/GraphX — the
    * driver holds only the changed-count. At web scale the large-star/
    * small-star variant halves round count; min-propagation is the
    * verifiable baseline.
    *
    * Input: (id_a, id_b) pairs. Output: (doc_id, component) for every
    * node that appears in some pair, component = min id of its cluster.
    *
    * Fast path: the pair graph is orders of magnitude smaller than the
    * corpus (it holds only near-duplicates), so up to `driverEdgeLimit`
    * edges (default 4M ≈ 64 MB of longs) the component labels are
    * computed in one pass of driver union-find instead of ~diameter
    * Spark rounds — the same bounded-metadata trade the ACID layer
    * makes for its id lists. Larger graphs take the distributed loop
    * unchanged; both paths produce identical labels. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50,
      driverEdgeLimit: Long = 4000000L): DataFrame = {
    val spark = pairs.sparkSession
    val undirected = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
    // one streamed pass fetches limit+1 rows: under the limit that IS
    // the whole edge set (no second pass over the expensive pair
    // computation); over it, fall back to the distributed loop. The
    // iterator keeps driver residency at two primitive long arrays
    // (~16 B/edge — boxed Rows held all at once would cost ~10x that)
    val fetchCap = math.min(driverEdgeLimit + 1, Int.MaxValue.toLong).toInt
    var ea = new Array[Long](1024); var eb = new Array[Long](1024); var n = 0
    val edgeIt = undirected.limit(fetchCap).toLocalIterator()
    while (edgeIt.hasNext) {
      val row = edgeIt.next()
      if (n == ea.length) {
        ea = java.util.Arrays.copyOf(ea, n * 2)
        eb = java.util.Arrays.copyOf(eb, n * 2)
      }
      ea(n) = row.getLong(0); eb(n) = row.getLong(1); n += 1
    }
    if (n <= driverEdgeLimit)
      return {
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
          r
        }
        var i = 0
        while (i < n) {
          val a = ea(i); val b = eb(i)
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val ra = find(a); val rb = find(b)
          // union by MIN root: the final root IS the component label
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
          i += 1
        }
        val labels = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
        parent.keySet.forEach(id => labels += ((id, find(id))))
        import spark.implicits._
        labels.sortBy(_._1).toSeq.toDF("doc_id", "component")
      }
    val edges = undirected
      .union(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .distinct()
      .persist()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      it += 1
      // candidate label for each node: min of its own and its
      // neighbors' current labels
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "b")
          .withColumnRenamed("component", "nbr"), "b")
        .groupBy(col("a").as("id")).agg(min(col("nbr")).as("nbr"))
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("component"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
    }
    edges.unpersist()
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — " +
        "pathological chain structure; raise maxIters")
    }
    // cut the iterative lineage into checkpointed blocks (freed by the
    // context cleaner once unreferenced), then drop the loop's cache —
    // a plain persist here would pin one label set in the CacheManager
    // per invocation forever
    val out = labels.localCheckpoint(true)
      .orderBy("id").select(col("id").as("doc_id"), col("component"))
    labels.unpersist()
    out
  }

  /** Shared oracle: exact word-3-shingle Jaccard pairs at tau, pure SQL. */
  def jaccardOracle(tau: Double): String =
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
    "sh AS (SELECT DISTINCT doc_id, " +
    "(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS s " +
    "FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks)), " +
    "cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), " +
    "inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i " +
    "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
    "SELECT da AS doc_lo, db AS doc_hi, " +
    "ROUND(CAST(i AS DOUBLE)/(ca.n + cb.n - i), 4) AS jac " +
    "FROM inter JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db " +
    s"WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= $tau " +
    "ORDER BY doc_lo, doc_hi"

  private def docs(s: SparkSession, dir: String) =
    Engine.table(s, dir, "documents")

  val defs: Seq[(String, Q)] = Seq(

    "q24_dedup_exact" -> Q(
      "SELECT COUNT(*) AS c FROM (SELECT DISTINCT text FROM documents)") {
      (s, dir) =>
        exact(docs(s, dir).select("text"), Seq("text"))
          .agg(count(lit(1)).as("c"))
    },

    "q24_dedup_by_source" -> Q(
      "SELECT source, COUNT(DISTINCT text) AS c FROM documents " +
      "GROUP BY source ORDER BY source") {
      (s, dir) =>
        docs(s, dir).groupBy("source")
          .agg(countDistinct(col("text")).as("c"))
          .orderBy("source")
    },

    "q25_jaccard_join" -> Q(jaccardOracle(0.5)) {
      (s, dir) => jaccardPairs(docs(s, dir), "doc_id", "text", 3, 0.5)
    },

    // same oracle through the document-frequency-ordered prefix — the
    // flag that matters on Zipfian corpora must also be EXACT, not just
    // plausible (the global order shapes candidates, never results)
    "q25_jaccard_join_df" -> Q(jaccardOracle(0.5)) {
      (s, dir) => jaccardPairs(docs(s, dir), "doc_id", "text", 3, 0.5,
        orderByDf = true)
    },

    // tau = 0.9 is not binary-representable: this key pins the rational
    // prefix-ceiling fix (a pair at exactly the threshold must survive)
    "q25_jaccard_tau9" -> Q(jaccardOracle(0.9)) {
      (s, dir) => jaccardPairs(docs(s, dir), "doc_id", "text", 3, 0.9)
    },

    "q25_minhash_lsh" -> Q(jaccardOracle(0.5)) {
      (s, dir) => minhashLshPairs(docs(s, dir), "doc_id", "text", 3, 0.5)
    },

    "q25_simhash" -> Q(jaccardOracle(0.9)) {
      (s, dir) => simhashPairs(docs(s, dir), "doc_id", "text", 3, 0.9)
    },

    // transitive near-dup clusters: connected components over the exact
    // Jaccard pair graph; the oracle recomputes them with recursive SQL
    // (min reachable id per node), so the iterative label propagation
    // is hash-verified end to end
    "q39_dedup_clusters" -> Q(
      "WITH RECURSIVE " +
      "toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, " +
      "(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS s " +
      "FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks)), " +
      "cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), " +
      "inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i " +
      "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "pj AS (SELECT da, db FROM inter " +
      "JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db " +
      "WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= 0.5), " +
      "e AS (SELECT da AS a, db AS b FROM pj UNION SELECT db, da FROM pj), " +
      "n AS (SELECT DISTINCT a AS id FROM e), " +
      "r(src, dst) AS (SELECT id, id FROM n " +
      "UNION SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a) " +
      "SELECT src AS doc_id, MIN(dst) AS component FROM r " +
      "GROUP BY src ORDER BY doc_id") {
      (s, dir) =>
        connectedComponents(
          jaccardPairs(docs(s, dir), "doc_id", "text", 3, 0.5)
            .select(col("doc_lo").as("id_a"), col("doc_hi").as("id_b")))
    },

    // C4-style repeated-span removal over 3-word tiles (~19 % of tiles
    // in the fixture corpus are repeats): the survivor choice, tail
    // handling, and reassembly order are all hash-gated against a
    // window-based SQL restatement
    "q49_span_dedup" -> Q(
      "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
      "t AS (SELECT doc_id, i - 1 AS tile_idx, " +
      "array_to_string(ws[(i-1)*3+1 : i*3], ' ') AS tile, " +
      "len(ws) >= i*3 AS isfull " +
      "FROM (SELECT doc_id, ws, " +
      "unnest(generate_series(1, CAST(ceil(len(ws)/3.0) AS BIGINT))) AS i " +
      "FROM w)), " +
      "keep AS (" +
      "SELECT doc_id, tile_idx, tile FROM (" +
      "SELECT doc_id, tile_idx, tile, " +
      "ROW_NUMBER() OVER (PARTITION BY tile ORDER BY doc_id, tile_idx) AS rn " +
      "FROM t WHERE isfull) WHERE rn = 1 " +
      "UNION ALL SELECT doc_id, tile_idx, tile FROM t WHERE NOT isfull) " +
      "SELECT doc_id, string_agg(tile, ' ' ORDER BY tile_idx) AS text " +
      "FROM keep GROUP BY doc_id ORDER BY doc_id") {
      (s, dir) => dedupSpans(docs(s, dir), 3).orderBy("doc_id")
    }
  )
}
