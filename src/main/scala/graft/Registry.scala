package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as correctness oracle.
  * Column names/aliases MUST match between the two — the driver sorts
  * columns by name and hashes values. */
final case class Q(
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(oracle: String)(impl: (SparkSession, String) => DataFrame): Q =
    Q(impl, Some(oracle))
  def noOracle(impl: (SparkSession, String) => DataFrame): Q =
    Q(impl, None)
}
