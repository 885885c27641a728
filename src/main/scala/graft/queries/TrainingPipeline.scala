package graft.queries

import org.apache.spark.sql.functions._

import graft.{Engine, Q}
import graft.functions.TextAnalytics
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

  /** DuckDB fragment for the word-8-gram used by decontamination. */
  private val gram8: String =
    (0 until 8).map(j => s"w[i+$j]").mkString(" || ' ' || ")

  val defs: Seq[(String, Q)] = Seq(

    // ---- q40: train/heldout decontamination ------------------------
    // The canonical eval-integrity op: any train doc sharing a word
    // 8-gram with an eval/test doc is contaminated and must be dropped
    // before training. Output = contaminated train doc ids with the
    // count of distinct leaked 8-grams (the audit artifact a pipeline
    // keeps).
    //
    // 100 TB shape: explode 8-grams on both sides, hash-join on the
    // gram, aggregate per doc — sub-quadratic, one shuffle keyed on the
    // gram. The heldout side (eval+test = 10% here, typically far less)
    // is distinct-ed first so the join probes a set, and AQE broadcasts
    // it while it fits. At scale, join on the 64-bit shingle HASH
    // ([[graft.expressions.ShingleHashes]]) instead of the gram string
    // — string grams here only because the oracle must compute the
    // identical key.
    "q40_decontaminate" -> Q(
      "WITH sp AS (SELECT doc_id, text, CASE " +
      s"WHEN ${Sampling.splitBucketSql("doc_id")} < 90 THEN 'train' " +
      "ELSE 'held' END AS split FROM documents), " +
      "toks AS (SELECT doc_id, split, string_split(text, ' ') AS w FROM sp), " +
      s"sh AS (SELECT DISTINCT doc_id, split, ($gram8) AS s " +
      "FROM (SELECT doc_id, split, w, unnest(generate_series(1, len(w)-7)) AS i FROM toks)), " +
      "hd AS (SELECT DISTINCT s FROM sh WHERE split = 'held') " +
      "SELECT doc_id, COUNT(*) AS n_leaked FROM sh JOIN hd USING (s) " +
      "WHERE split = 'train' GROUP BY doc_id ORDER BY doc_id") {
      (s, dir) =>
        val docs = Engine.table(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            (Sampling.splitBucket(col("doc_id")) < 90).as("is_train"))
        Dedup.contaminated(
            docs.filter(col("is_train")), docs.filter(!col("is_train")),
            "doc_id", "text", 8)
          .orderBy("doc_id")
    },

    // ---- q41: deterministic domain/language mixture ----------------
    // Rebalance the corpus toward a target language mixture by
    // integer-repeating rows: en stays at 1 copy, every other language
    // gets 2.5x — 2 copies plus a 3rd for the half of ids the frozen
    // [[Sampling.splitBucket]] mixer selects. Membership of the extra
    // copy is a pure id function, so the mixed corpus is bit-stable
    // across runs/engines (a rand()-based upsample resamples every
    // retry — poison for reproducible training data).
    //
    // 100 TB shape: narrow per-row explode, no shuffle, no state; the
    // output is written straight back out. Fractional weights never
    // need rand(): bucket arithmetic IS the Bernoulli draw.
    "q41_domain_mix" -> Q(
      "SELECT doc_id, lang, unnest(generate_series(1, reps)) AS copy " +
      "FROM (SELECT doc_id, lang, CASE WHEN lang = 'en' THEN 1 ELSE 2 + " +
      s"(CASE WHEN ${Sampling.splitBucketSql("doc_id")} < 50 THEN 1 ELSE 0 END) " +
      "END AS reps FROM documents) ORDER BY doc_id, copy") {
      (s, dir) =>
        val weight = when(col("lang") === "en", lit(1.0)).otherwise(lit(2.5))
        Sampling.upsample(
            Engine.table(s, dir, "documents").select("doc_id", "lang"),
            col("doc_id"), weight)
          .orderBy("doc_id", "copy")
    },

    // ---- q42: fixed-window chunking with overlap -------------------
    // Split each document into 32-token training chunks on a 24-token
    // stride (8-token overlap keeps boundary context); chunk starts at
    // i*stride while that is inside the doc, so every token lands in at
    // least one chunk and the per-doc chunk count is ceil(n/24).
    //
    // 100 TB shape: per-row explode of an arithmetic sequence + array
    // slice — narrow, codegen'd, no shuffle; downstream packing/batching
    // consumes (doc_id, chunk_idx) ordered output.
    "q42_chunk" -> Q(
      "WITH c AS (SELECT doc_id, w, n, " +
      "unnest(generate_series(0, CAST(ceil(n/24.0) AS BIGINT) - 1)) AS i " +
      "FROM (SELECT doc_id, string_split(text, ' ') AS w, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents)) " +
      "SELECT doc_id, i AS chunk_idx, " +
      "array_to_string(w[i*24+1 : i*24+32], ' ') AS chunk, " +
      "CAST(LEAST(n - i*24, 32) AS BIGINT) AS chunk_tokens " +
      "FROM c ORDER BY doc_id, chunk_idx") {
      (s, dir) =>
        TextAnalytics.chunk(Engine.table(s, dir, "documents"),
            col("doc_id"), col("text"), 32, 24)
          .orderBy("doc_id", "chunk_idx")
    },

    // ---- q44: sequence packing into context windows ----------------
    // Pack the 32/24 chunk stream into 256-token context windows per
    // shard (offset-based concat-then-split — [[TextAnalytics
    // .packChunks]]); report each window's chunk count and token fill.
    // The per-shard prefix-sum layout is deterministic, so the whole
    // packed corpus shape hash-matches the oracle's window SQL.
    "q44_pack" -> Q(
      "WITH ch AS (SELECT doc_id, i AS chunk_idx, " +
      "CAST(LEAST(n - i*24, 32) AS BIGINT) AS chunk_tokens " +
      "FROM (SELECT doc_id, n, " +
      "unnest(generate_series(0, CAST(ceil(n/24.0) AS BIGINT) - 1)) AS i " +
      "FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n " +
      "FROM documents))), " +
      "p AS (SELECT doc_id % 8 AS shard, chunk_tokens, " +
      "SUM(chunk_tokens) OVER (PARTITION BY doc_id % 8 " +
      "ORDER BY doc_id, chunk_idx) - chunk_tokens AS start FROM ch) " +
      "SELECT shard, CAST(FLOOR(start / 256) AS BIGINT) AS bin, " +
      "COUNT(*) AS n_chunks, CAST(SUM(chunk_tokens) AS BIGINT) AS bin_tokens " +
      "FROM p GROUP BY shard, bin ORDER BY shard, bin") {
      (s, dir) =>
        val chunks = TextAnalytics.chunk(Engine.table(s, dir, "documents"),
          col("doc_id"), col("text"), 32, 24)
        TextAnalytics.packChunks(chunks, 256, 8)
          .groupBy("shard", "bin")
          .agg(count(lit(1)).as("n_chunks"),
            sum("chunk_tokens").as("bin_tokens"))
          .orderBy("shard", "bin")
    },

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
