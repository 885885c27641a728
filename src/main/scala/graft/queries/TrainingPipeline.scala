package graft.queries

import org.apache.spark.sql.functions._

import graft.{Engine, Q}
import graft.operators.{Dedup, Sampling}

/** End-to-end LLM training-data pipeline as ONE deterministic,
  * oracle-checked query — the composition the individual operators
  * exist for:
  *
  *   1. language filter (en),
  *   2. exact dedup keeping the LOWEST doc_id per text (deterministic,
  *      unlike dropDuplicates' arbitrary survivor),
  *   3. near-dup removal at word-3-shingle Jaccard >= 0.5 — greedy
  *      "drop every doc_hi" rule over the exact pair set, so the
  *      lowest id of a duplicate cluster survives,
  *   4. frozen 90/5/5 train/eval/test assignment
  *      ([[graft.operators.Sampling]]),
  *   5. per-split counts + corpus size.
  *
  * Every stage is deterministic, so the whole pipeline hash-matches a
  * single DuckDB oracle — the point being that dedup, similarity, and
  * splitting COMPOSE without giving up verifiability.
  *
  * 100 TB shape: filter pushes to the scan; exact dedup is one
  * hash-shuffle on text; near-dup pairs come from the prefix-filtered
  * inverted index (sub-quadratic); removal is a left-anti join on the
  * near-dup id set — NOT hint-broadcast, because a heavily duplicated
  * corpus makes that set a large fraction of the data (AQE broadcasts
  * it when it measures small, hash-joins otherwise); split assignment
  * is a narrow per-row projection.
  */
object TrainingPipeline {

  private val pipelineOracle: String =
    // exact dedup: lowest doc_id per text among English docs
    "WITH uniq AS (SELECT MIN(doc_id) AS doc_id, MIN(n_chars) AS n_chars, text " +
    "FROM documents WHERE lang = 'en' GROUP BY text), " +
    // word-3-shingles of the deduped docs
    "toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM uniq), " +
    "sh AS (SELECT DISTINCT doc_id, (w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS s " +
    "FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks)), " +
    "cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), " +
    "inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i " +
    "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
    "dups AS (SELECT DISTINCT db AS doc_id FROM inter " +
    "JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db " +
    "WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= 0.5), " +
    "kept AS (SELECT u.* FROM uniq u WHERE u.doc_id NOT IN (SELECT doc_id FROM dups)) " +
    "SELECT CASE " +
    s"WHEN ${Sampling.splitBucketSql("doc_id")} < 90 THEN 'train' " +
    s"WHEN ${Sampling.splitBucketSql("doc_id")} < 95 THEN 'eval' " +
    "ELSE 'test' END AS split, COUNT(*) AS c, " +
    "CAST(SUM(n_chars) AS BIGINT) AS chars FROM kept " +
    "GROUP BY split ORDER BY split"

  val defs: Seq[(String, Q)] = Seq(

    "q38_training_pipeline" -> Q(pipelineOracle) {
      (s, dir) =>
        val en = Engine.table(s, dir, "documents")
          .filter(col("lang") === "en")
        // deterministic exact dedup: lowest id per text (and its
        // n_chars — MIN over the group matches the oracle even if two
        // identical texts ever disagreed on metadata)
        val uniq = en.groupBy("text")
          .agg(min("doc_id").as("doc_id"), min("n_chars").as("n_chars"))
        val nearDupIds = Dedup
          .jaccardPairs(uniq, "doc_id", "text", 3, 0.5)
          .select(col("doc_hi").as("doc_id")).distinct()
        val kept = uniq.join(nearDupIds, Seq("doc_id"), "left_anti")
        kept.select(Sampling.assignSplit(col("doc_id")).as("split"),
            col("n_chars"))
          .groupBy("split")
          .agg(count(lit(1)).as("c"), sum(col("n_chars")).as("chars"))
          .orderBy("split")
    }
  )
}
