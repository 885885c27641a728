package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.acid.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the UI is off, so the SQLAdaptiveExecutionUpdate events AQE
      // posts per plan update have no consumer — but their 'formatted'
      // explain string (spark.sql.ui.explainMode default) is still
      // built EAGERLY on the driver at every stage materialization,
      // measured ~20% of wall on multi-commit MV lifecycles (driver
      // thread dumps: AdaptiveSparkPlanExec.onUpdatePlan ->
      // QueryExecution.explainString). 'simple' keeps the event (and
      // any attached listener working) at a fraction of the cost.
      .config("spark.sql.ui.explainMode", "simple")
      // no-fork local FS (see Engine.localFsImpl: chmod/ls forks
      // removed; env-overridable)
      .config("spark.hadoop.fs.file.impl", graft.Engine.localFsImpl)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        graft.Engine.localAbsFsImpl)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a narrowed run leaves a marker file so its partial artifacts can
    // never be mistaken for a full-suite dump (round-4 ADVICE)
    sys.env.get("SPARK_GRAFT_ONLY").foreach { f =>
      System.err.println(
        s"[verify] WARNING: SPARK_GRAFT_ONLY='$f' is narrowing this run " +
        s"to ${SparkEntry.selectedRegistry.size} of ${SparkEntry.registry.size} queries")
      Files.writeString(Paths.get(s"$outDir/_filtered.txt"), f)
    }
    SparkEntry.selectedRegistry.foreach { case (name, q) =>
      val fn = q.impl
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
