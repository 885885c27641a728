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
  *   3. near-dup CLUSTERING at word-3-shingle Jaccard >= 0.5 —
  *      connected components over the exact pair graph
  *      ([[graft.operators.Dedup.connectedComponents]]), keeping each
  *      cluster's representative (its minimum id); transitive chains
  *      A~B~C collapse to one survivor even when A~C was never a pair,
  *   4. frozen 90/5/5 train/eval/test assignment
  *      ([[graft.operators.Sampling]]),
  *   5. per-split counts + corpus size.
  *
  * Every stage is deterministic, so the whole pipeline hash-matches a
  * single DuckDB oracle (near-dup clusters via recursive SQL) — the
  * point being that dedup, similarity clustering, and splitting
  * COMPOSE without giving up verifiability.
  *
  * 100 TB shape: filter pushes to the scan; exact dedup is one
  * hash-shuffle on text; near-dup pairs come from the prefix-filtered
  * inverted index (sub-quadratic); component rounds shuffle only the
  * EDGE set; removal is a left-anti join on the non-representative id
  * set — NOT hint-broadcast, because a heavily duplicated corpus makes
  * that set a large fraction of the data (AQE broadcasts it when it
  * measures small, hash-joins otherwise); split assignment is a narrow
  * per-row projection.
  */
object TrainingPipeline {

  private val pipelineOracle: String =
    "WITH RECURSIVE " +
    // exact dedup: lowest doc_id per text among English docs
    "uniq AS (SELECT MIN(doc_id) AS doc_id, MIN(n_chars) AS n_chars, text " +
    "FROM documents WHERE lang = 'en' GROUP BY text), " +
    // word-3-shingles of the deduped docs
    "toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM uniq), " +
    "sh AS (SELECT DISTINCT doc_id, (w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS s " +
    "FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks)), " +
    "cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), " +
    "inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i " +
    "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
    "pj AS (SELECT da, db FROM inter " +
    "JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db " +
    "WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= 0.5), " +
    // near-dup clusters: min reachable id per node (recursive closure);
    // every node whose label differs from its own id is a duplicate
    "e AS (SELECT da AS a, db AS b FROM pj UNION SELECT db, da FROM pj), " +
    "nn AS (SELECT DISTINCT a AS id FROM e), " +
    "r(src, dst) AS (SELECT id, id FROM nn " +
    "UNION SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a), " +
    "dups AS (SELECT src AS doc_id FROM r GROUP BY src " +
    "HAVING MIN(dst) <> src), " +
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
        val pairs = Dedup.jaccardPairs(uniq, "doc_id", "text", 3, 0.5)
          .select(col("doc_lo").as("id_a"), col("doc_hi").as("id_b"))
        // non-representatives: cluster members whose label is not
        // their own id
        val nearDupIds = Dedup.connectedComponents(pairs)
          .filter(col("doc_id") =!= col("component"))
          .select("doc_id")
        val kept = uniq.join(nearDupIds, Seq("doc_id"), "left_anti")
        kept.select(Sampling.assignSplit(col("doc_id")).as("split"),
            col("n_chars"))
          .groupBy("split")
          .agg(count(lit(1)).as("c"), sum(col("n_chars")).as("chars"))
          .orderBy("split")
    }
  )
}
