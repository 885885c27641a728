package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Engine, Q}

/** Text-analysis operators for LLM data pipelines (SURVEY.md §2.2 Q27):
  * tokenization, language ID (stopword-profile heuristic), quality
  * scoring, token statistics, and rolling-hash document fingerprinting.
  *
  * All are per-row narrow transformations (no shuffle except final
  * aggregations) — they scale linearly with input and stay inside
  * whole-stage codegen. Every query mirrors its DuckDB oracle formula
  * exactly (same operation order) so results hash-match cross-engine.
  */
object TextAnalytics {

  /** Whitespace tokens (the documents fixture is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex tokens for free-form text: lowercase alnum runs. */
  def regexTokens(text: Column): Column =
    split(lower(text), "[^a-z0-9]+")

  /** Tiny public stopword profiles — enough to discriminate major
    * Latin-script languages; zh intentionally empty (detected via CJK
    * ratio in real corpora; stubbed deterministic here). Keep in sync
    * with the oracle SQL below. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "zh" -> Seq.empty)

  /** Stopword-hit score for one language profile. */
  def langScore(toks: Column, words: Seq[String]): Column =
    if (words.isEmpty) lit(0)
    else size(filter(toks, t => t.isInCollection(words)))

  /** Predicted language: argmax score, ties to the alphabetically first
    * language (fixed CASE order — mirrored in SQL). */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = stopwords.map { case (l, ws) => l -> langScore(toks, ws) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, sc), i), elseCol) =>
        val rest = scores.drop(i + 1).map(_._2)
        when(rest.map(sc >= _).reduce(_ && _), lit(lang)).otherwise(elseCol)
    }
  }

  private def sqlLangId: String = {
    val scoreSql = stopwords.map { case (l, ws) =>
      if (ws.isEmpty) s"0 AS s_$l"
      else s"len(list_filter(string_split(text,' '), t -> list_contains([${ws.map("'" + _ + "'").mkString(",")}], t))) AS s_$l"
    }.mkString(", ")
    val langs = stopwords.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val conds = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"SELECT doc_id, CASE $cases ELSE '${langs.last}' END AS pred_lang " +
      s"FROM (SELECT doc_id, text, $scoreSql FROM documents) ORDER BY doc_id"
  }

  /** Heuristic quality score in [0,1]: 0.5·length-ratio + 0.5·type-token
    * ratio. Deterministic per-row double arithmetic, same op order as the
    * oracle. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val lenr = least(lit(1.0), nTok / lit(100.0))
    round(lit(0.5) * lenr + lit(0.5) * ttr, 4)
  }

  /** Polynomial rolling hash over characters, mod 1e9+7 — a classic
    * content fingerprint. Uses the codegen'd
    * [[graft.expressions.RollingHash]] expression (byte loop ==
    * char loop for ASCII text); left-to-right fold matches DuckDB
    * list_reduce. */
  def fingerprint(spark: SparkSession, text: Column): Column =
    graft.expressions.VectorExpressions.rollingHash(spark, text)

  /** Fixed-window token chunking with overlap — the doc→training-chunk
    * splitter: windows of `chunkTokens` tokens starting every `stride`
    * tokens, emitting a window while its start is inside the doc, so
    * every token lands in ≥1 chunk and the per-doc chunk count is
    * ceil(n/stride). Output: (doc_id, chunk_idx, chunk, chunk_tokens).
    *
    * 100 TB shape: per-row explode of an arithmetic sequence + array
    * slice — narrow, codegen'd, no shuffle. */
  def chunk(df: DataFrame, id: Column, text: Column,
      chunkTokens: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1, "chunkTokens/stride must be >= 1")
    df.select(id.as("doc_id"), split(text, " ").as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .withColumn("i", explode(
        sequence(lit(0L), ceil(col("n") / lit(stride.toDouble)).cast("long") - 1)))
      .select(col("doc_id"), col("i").as("chunk_idx"),
        concat_ws(" ",
          expr(s"slice(w, CAST(i*$stride+1 AS INT), $chunkTokens)")).as("chunk"),
        least(col("n") - col("i") * stride, lit(chunkTokens.toLong))
          .as("chunk_tokens"))
  }

  /** Offset-based sequence packing (concat-then-split): lay the chunks
    * of each shard end-to-end in (doc_id, chunk_idx) order and cut the
    * token stream every `ctxTokens` — each chunk is assigned to the
    * context window (`bin`) where it STARTS, at `offset` tokens into
    * it. This is the packing strategy that concatenates docs with an
    * EOS separator and slices fixed windows; unlike first-fit bin
    * packing it is a pure prefix-sum, so the layout is deterministic
    * and cross-engine verifiable.
    *
    * Input must carry (doc_id, chunk_idx, chunk_tokens) — e.g.
    * [[chunk]]'s output.
    *
    * 100 TB shape: one shuffle keyed on the shard, then a per-shard
    * sorted window prefix-sum — no global sort, no driver state; shard
    * count scales with the cluster (shard by [[graft.operators
    * .Sampling.splitBucket]] at scale; `doc_id % shards` here keeps the
    * oracle SQL trivial). */
  def packChunks(chunks: DataFrame, ctxTokens: Int = 256,
      shards: Int = 8): DataFrame = {
    require(ctxTokens >= 1 && shards >= 1, "ctxTokens/shards must be >= 1")
    val w = Window.partitionBy("shard").orderBy("doc_id", "chunk_idx")
    chunks.withColumn("shard", col("doc_id") % shards)
      .withColumn("start", sum(col("chunk_tokens")).over(w) - col("chunk_tokens"))
      .withColumn("bin", floor(col("start") / ctxTokens))
      .withColumn("offset", col("start") - col("bin") * ctxTokens)
      .drop("start")
  }

  private def t(s: SparkSession, dir: String) =
    Engine.table(s, dir, "documents")

  val defs: Seq[(String, Q)] = Seq(

    "q27_token_freq" -> Q(
      "SELECT token, COUNT(*) AS c FROM (" +
      "SELECT unnest(regexp_split_to_array(LOWER(text), '[^a-z0-9]+')) AS token " +
      "FROM documents) WHERE token <> '' " +
      "GROUP BY token ORDER BY c DESC, token LIMIT 50") {
      (s, dir) =>
        t(s, dir)
          .select(explode(regexTokens(col("text"))).as("token"))
          .filter(col("token") =!= "")
          .groupBy("token").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("token").asc)
          .limit(50)
    },

    "q27_langid" -> Q(sqlLangId) {
      (s, dir) =>
        t(s, dir)
          .select(col("doc_id"), langId(col("text")).as("pred_lang"))
          .orderBy("doc_id")
    },

    "q27_quality" -> Q(
      "SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens, " +
      "ROUND(0.5 * LEAST(1.0, len(string_split(text,' ')) / 100.0) + " +
      "0.5 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) " +
      "/ len(string_split(text,' '))), 4) AS score " +
      "FROM documents ORDER BY doc_id") {
      (s, dir) =>
        t(s, dir)
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("n_tokens"),
            qualityScore(col("text")).as("score"))
          .orderBy("doc_id")
    },

    "q27_fingerprint" -> Q(
      "SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(generate_series(1, len(text)), " +
      "i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), " +
      "(a, b) -> (a * 131 + b) % 1000000007) AS fp " +
      "FROM documents ORDER BY doc_id") {
      (s, dir) =>
        t(s, dir)
          .select(col("doc_id"), fingerprint(s, col("text")).as("fp"))
          .orderBy("doc_id")
    }
  )
}
