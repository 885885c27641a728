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

  private val P = 2147483647L // 2^31-1, Mersenne prime for affine hashing

  /** Deterministic affine-permutation constants (public tabulation-style
    * minhash construction; any fixed odd multipliers work). */
  private def hashParams(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val a = (2654435761L * (i + 1) + 40503L) % P
      val c = (2246822519L * (i + 1) + 3266489917L) % P
      (if (a == 0) 1L else a, c)
    }

  /** Docs with id + distinct shingle set + set size. */
  private def docShingles(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    docs.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exact Jaccard verification of candidate pairs (columns id_a < id_b)
    * against the shingle sets; emits (doc_lo, doc_hi, jac) for jac >= tau. */
  private def verifyPairs(cand: DataFrame, ds: DataFrame, tau: Double): DataFrame = {
    val a = ds.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = ds.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("i", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jacx", col("i").cast("double")
        / (size(col("sh_a")) + size(col("sh_b")) - col("i")))
      .filter(col("jacx") >= tau)
      .select(col("id_a").as("doc_lo"), col("id_b").as("doc_hi"),
        round(col("jacx"), 4).as("jac"))
      .orderBy("doc_lo", "doc_hi")
  }

  /** Exact n-gram Jaccard similarity join via shingle inverted index. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, tau: Double = 0.5): DataFrame = {
    val ds = docShingles(docs, idCol, textCol, k)
    val ex = ds.select(col("id"), explode(col("sh")).as("s"))
    val cand = ex.select(col("id").as("id_a"), col("s"))
      .join(ex.select(col("id").as("id_b"), col("s")), "s")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyPairs(cand, ds, tau)
  }

  /** MinHash-LSH near-dup join: numHashes minhashes, banded into
    * numHashes/bandRows bands; same-band collisions become candidates,
    * then exact-verified. Recall for J≥0.85 at (128, 4) is 1-(1-J⁴)³² ≈ 1. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, tau: Double = 0.5,
      numHashes: Int = 128, bandRows: Int = 4): DataFrame = {
    val ds = docShingles(docs, idCol, textCol, k)
    val ex = ds.select(col("id"), explode(col("sh")).as("s"))
      .withColumn("b", pmod(xxhash64(col("s")), lit(P)))
    val params = hashParams(numHashes)
    val sigCols = params.zipWithIndex.map { case ((a, c), i) =>
      min((col("b") * a + c) % P).as(s"h$i")
    }
    val sig = ex.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
    val nBands = numHashes / bandRows
    val bandSigs = (0 until nBands).map { j =>
      xxhash64(concat_ws(",",
        (lit(j) +: (0 until bandRows).map(r => col(s"h${j * bandRows + r}"))): _*))
    }
    val bands = sig.select(col("id"),
      posexplode(array(bandSigs: _*)).as(Seq("band", "bsig")))
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
    * 4×16-bit bands and maxHamming ≈ 3 is the cheaper classic setting. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, tau: Double = 0.9, maxHamming: Int = 15,
      nBands: Int = 16): DataFrame = {
    val ds = docShingles(docs, idCol, textCol, k)
    val ex = ds.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("b"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("b"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$j")
    }
    val agg = ex.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    val sims = agg.select(col("id"), fp.as("fp"))
    val bandBits = 64 / nBands
    val mask = (1L << bandBits) - 1
    val bands = sims.select(col("id"), col("fp"),
      posexplode(array((0 until nBands).map(kk =>
        shiftright(col("fp"), kk * bandBits).bitwiseAND(mask)): _*))
        .as(Seq("band", "key")))
    val cand = bands
      .select(col("id").as("id_a"), col("fp").as("fp_a"), col("band"), col("key"))
      .join(bands.select(col("id").as("id_b"), col("fp").as("fp_b"),
        col("band"), col("key")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fp_a", "fp_b").distinct()
      .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= maxHamming)
      .select("id_a", "id_b")
    verifyPairs(cand, ds, tau)
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

    "q25_minhash_lsh" -> Q(jaccardOracle(0.5)) {
      (s, dir) => minhashLshPairs(docs(s, dir), "doc_id", "text", 3, 0.5)
    },

    "q25_simhash" -> Q(jaccardOracle(0.9)) {
      (s, dir) => simhashPairs(docs(s, dir), "doc_id", "text", 3, 0.9)
    }
  )
}
