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

  /** Exact top-1 cosine neighbor for each query vector (brute force). */
  def annTop1(all: DataFrame, queries: DataFrame): DataFrame = {
    val s = all.sparkSession
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"))
    val cand = all.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine(s, col("qv"), col("v")), 4).as("cs"))
    val w = Window.partitionBy("qid").orderBy(col("cs").desc, col("nid").asc)
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid").as("vec_id"), col("nid").as("neighbor_id"), col("cs"))
      .orderBy("vec_id")
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
    * buckets → faster but lower recall (single-probe). */
  def lshBucket(v: Column, dim: Int, nPlanes: Int = 16): Column =
    planes(nPlanes, dim).zipWithIndex.map { case (w, j) =>
      val wl = array(w.map(lit): _*)
      when(aggregate(zip_with(v, wl, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed ANN: same output shape as [[annTop1]] but candidates
    * are restricted to the query's bucket (sub-quadratic; approximate). */
  def annTop1Lsh(all: DataFrame, queries: DataFrame, dim: Int,
      nPlanes: Int = 6): DataFrame = {
    val s = all.sparkSession
    val bAll = all.withColumn("bkt", lshBucket(col("v"), dim, nPlanes))
    val q = queries.withColumn("bkt", lshBucket(col("v"), dim, nPlanes))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("bkt"))
    val cand = bAll.join(broadcast(q), Seq("bkt"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine(s, col("qv"), col("v")), 4).as("cs"))
    val w = Window.partitionBy("qid").orderBy(col("cs").desc, col("nid").asc)
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid").as("vec_id"), col("nid").as("neighbor_id"), col("cs"))
      .orderBy("vec_id")
  }

  /** All pairs with cosine >= tau (embedding near-dup). Brute self-join
    * here; the LSH bucket prefilter above is the 100 TB path. */
  def cosineNearDup(all: DataFrame, tau: Double): DataFrame = {
    val s = all.sparkSession
    val a = all.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = all.select(col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("csx", cosine(s, col("va"), col("vb")))
      .filter(col("csx") >= tau)
      .select(col("id_a").as("vec_lo"), col("id_b").as("vec_hi"),
        round(col("csx"), 4).as("cs"))
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

    // approximate (single-probe LSH): deterministic but not SQL-derivable
    "q26_ann_lsh" -> Q.noOracle {
      (s, dir) =>
        val all = emb(s, dir)
        annTop1Lsh(all, all.filter(col("vec_id") < 20), dim = 64)
    },

    "q25_embed_neardup" -> Q(
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "p AS (SELECT a.vec_id AS vec_lo, b.vec_id AS vec_hi, " +
      "list_dot_product(a.v, b.v)/(sqrt(list_dot_product(a.v, a.v))*sqrt(list_dot_product(b.v, b.v))) AS csx " +
      "FROM e a JOIN e b ON a.vec_id < b.vec_id) " +
      "SELECT vec_lo, vec_hi, ROUND(csx, 4) AS cs FROM p " +
      "WHERE csx >= 0.4 ORDER BY vec_lo, vec_hi") {
      (s, dir) => cosineNearDup(emb(s, dir), 0.4)
    }
  )
}
