package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Robustness (round-1 postmortem: every CORRECTNESS row came back
  * `no_oracle` even though a valid oracle_sql.json sat next to the parquet
  * outputs and matched 14/14 when run manually):
  *  - the oracle json is written FIRST, before any query runs, so a
  *    timeout/kill mid-dump can no longer lose it;
  *  - every oracle is emitted under BOTH key forms — the bare query name
  *    (`q01_pricing_agg`, the documented contract) and the parquet file
  *    name (`q01_pricing_agg.parquet`, the key form the round-1
  *    CORRECTNESS report used) — so either lookup convention resolves.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    new java.io.File(outDir).mkdirs()
    writeOracleJson(s"$outDir/oracle_sql.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.foreach { case (name, fn) =>
      val target = s"$outDir/$name.parquet"
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(target)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must not leave a STALE output from a previous
        // invocation in place — the driver's compare would silently score
        // outdated results instead of reporting the failure
        try deleteRecursively(new java.io.File(target))
        catch { case scala.util.control.NonFatal(_) => }
      }
    }
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Dump SparkEntry.oracleSql as JSON (dual key forms, see above). */
  def writeOracleJson(path: String): Unit = {
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
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(path), json)
  }
}
