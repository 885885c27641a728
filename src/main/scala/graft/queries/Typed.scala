package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Engine, Q}
import graft.Engine.{dsum, sqlDsum}

/** Typed Dataset[T] API edge (SURVEY.md §1.4): case-class views of the
  * core tables with compile-time field checks. Queries stay DataFrame
  * algebra internally (codegen, no Encoder round-trips in the hot path);
  * the typed layer is the user-facing boundary. */
object Typed {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: Timestamp)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  def lineitems(s: SparkSession, dir: String): Dataset[Lineitem] = {
    import s.implicits._
    Engine.table(s, dir, "lineitem").as[Lineitem]
  }

  def orders(s: SparkSession, dir: String): Dataset[Order] = {
    import s.implicits._
    Engine.table(s, dir, "orders").as[Order]
  }

  def documents(s: SparkSession, dir: String): Dataset[Document] = {
    import s.implicits._
    Engine.table(s, dir, "documents").as[Document]
  }

  val defs: Seq[(String, Q)] = Seq(

    // typed filter + untyped agg: the Dataset edge compiles the predicate
    // against the case class, then drops to columnar ops for the agg
    "q31_typed_dataset" -> Q(
      "SELECT l_returnflag, COUNT(*) AS c, " +
      s"${sqlDsum("l_extendedprice")} AS sp FROM lineitem " +
      "WHERE l_quantity >= 30 GROUP BY l_returnflag ORDER BY l_returnflag") {
      (s, dir) =>
        lineitems(s, dir)
          .filter(col("l_quantity") >= 30) // Column predicate: pushed down
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("c"), dsum(col("l_extendedprice")).as("sp"))
          .orderBy("l_returnflag")
    },

    // schema-based JSON parsing (from_json), complementing
    // q19_json's path extraction
    "q19_from_json" -> Q(
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) " +
      "AS k FROM events ORDER BY event_id LIMIT 200") {
      (s, dir) =>
        Engine.table(s, dir, "events")
          .select(col("event_id"),
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
              .getField("k").as("k"))
          .orderBy("event_id")
          .limit(200)
    }
  )
}
