package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Engine, Q}

/** Deterministic sampling / dataset splitting for LLM data pipelines:
  * train/eval/test splits, fractional corpus samples, and k-fold
  * assignment — all as a PURE FUNCTION of the row's id, so a split is
  * reproducible across engines, runs, partitionings, and re-executions
  * (a `rand()`-based split silently reshuffles membership on every
  * retry/re-run — unacceptable when the eval set must stay frozen).
  *
  * The mixer is two rounds of the Lehmer/Park–Miller LCG step
  * (x -> x*48271 mod 2^31-1): every operation is plain BIGINT
  * multiply/mod, chosen so intermediates stay far below int64 overflow
  * — which also makes the exact same expression computable in ANSI SQL
  * by any engine (the DuckDB oracle runs it verbatim; engine-native
  * hash() functions differ across engines and versions, so they can
  * never anchor a frozen split).
  *
  * 100 TB notes: the bucket is a narrow per-row projection — no
  * shuffle, no state; the sample filter runs inside the scan's
  * whole-stage-codegen pass over just the id column (arithmetic
  * predicates don't reach parquet PushedFilters, but column pruning
  * still means a 1% sample decision reads one column, and the 99%
  * discarded rows never materialize their payload columns).
  */
object Sampling {

  val Mersenne31 = 2147483647L // 2^31 - 1
  val Minstd = 48271L

  /** Uniform bucket in [0, buckets) as a deterministic function of a
    * NON-NEGATIVE integral id column. Uses `%` (truncated division,
    * identical semantics in Spark and ANSI SQL engines) rather than
    * `pmod`, so the Scala and oracle computations are the same
    * expression symbol-for-symbol; a negative id would get a negative
    * bucket on both sides alike — derive a non-negative surrogate
    * first. */
  def splitBucket(id: Column, buckets: Int = 100): Column = {
    val x0 = id.cast("long") % lit(Mersenne31)
    val x1 = (x0 * lit(Minstd)) % lit(Mersenne31)
    val x2 = (x1 * lit(Minstd)) % lit(Mersenne31)
    x2 % lit(buckets)
  }

  /** SQL fragment computing [[splitBucket]] verbatim (oracle parity). */
  def splitBucketSql(idExpr: String, buckets: Int = 100): String =
    s"(((($idExpr % $Mersenne31) * $Minstd % $Mersenne31) " +
    s"* $Minstd % $Mersenne31) % $buckets)"

  /** Deterministic fractional sample: keep ids whose bucket falls in
    * [0, pct) of `buckets`. */
  def sampleByKey(df: DataFrame, idCol: String, pctBuckets: Int,
      buckets: Int = 100): DataFrame =
    df.filter(splitBucket(col(idCol), buckets) < pctBuckets)

  /** Named train/eval/test split assignment (e.g. 90/5/5). */
  def assignSplit(id: Column, trainPct: Int = 90, evalPct: Int = 5): Column = {
    val b = splitBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + evalPct, "eval")
      .otherwise("test")
  }

  /** Deterministic weighted resampling for domain/language mixture
    * control: each row is repeated `floor(weight)` times plus one extra
    * copy for the `frac(weight)` share of ids the frozen mixer selects
    * (weight 2.5 → 2 copies, +1 for half the ids; weight 0.25 → kept
    * once for a quarter of the ids, dropped otherwise). Membership of
    * the fractional copy is a pure id function — bit-stable across
    * runs, engines, and retries, where a `rand()` draw resamples every
    * re-execution. Adds a `copy` column (1..reps); rows with 0 repeats
    * disappear.
    *
    * 100 TB shape: narrow per-row explode — no shuffle, no state;
    * bucket arithmetic IS the Bernoulli draw. */
  def upsample(df: DataFrame, id: Column, weight: Column): DataFrame = {
    // frac derived from the FRACTIONAL PART alone: a `% 100` on the
    // rounded total would carry weight 0.999 to fracPct 0 (dropping
    // every row) instead of ~1 extra copy for ~all ids; here it rounds
    // to 100 and `bucket < 100` is simply always true
    val fracPct = round((weight - floor(weight)) * 100).cast("long")
    val reps = floor(weight).cast("long") +
      when(splitBucket(id) < fracPct, 1L).otherwise(0L)
    // sequence(1, 0) would DESCEND in Spark — guard the empty case
    df.withColumn("copy", explode(
      when(reps >= 1, sequence(lit(1L), reps))
        .otherwise(array().cast("array<bigint>"))))
  }

  val defs: Seq[(String, Q)] = Seq(

    // 10%-bucket deterministic sample: membership must be a pure id
    // function — DuckDB recomputes the identical arithmetic and the
    // row sets hash-match
    "q36_sample_by_key" -> Q(
      "SELECT doc_id, lang FROM documents " +
      s"WHERE ${Sampling.splitBucketSql("doc_id")} < 10 " +
      "ORDER BY doc_id") {
      (s, dir) =>
        sampleByKey(Engine.table(s, dir, "documents"), "doc_id", 10)
          .select("doc_id", "lang").orderBy("doc_id")
    },

    // frozen 90/5/5 split: per-split counts are stable across engines
    "q36_split_assign" -> Q(
      "SELECT split, COUNT(*) AS c FROM (SELECT CASE " +
      s"WHEN ${Sampling.splitBucketSql("doc_id")} < 90 THEN 'train' " +
      s"WHEN ${Sampling.splitBucketSql("doc_id")} < 95 THEN 'eval' " +
      "ELSE 'test' END AS split FROM documents) t " +
      "GROUP BY split ORDER BY split") {
      (s, dir) =>
        Engine.table(s, dir, "documents")
          .select(assignSplit(col("doc_id")).as("split"))
          .groupBy("split").agg(count(lit(1)).as("c"))
          .orderBy("split")
    }
  )
}
