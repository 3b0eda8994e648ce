package graft.tools

import graft.{SparkEntry, Verify}
import org.apache.spark.sql.SparkSession

/** Dev tool: the Verify dump restricted to named queries, for fast oracle
  * iteration on a new operator without re-running the whole surface.
  *
  *   runMain graft.tools.VerifySubset <sfDir> <outDir> q59 q60 ...
  *
  * Each trailing arg is a prefix match on the query name. The full
  * oracle_sql.json is still written (scripts/oracle_check.py needs it; pass
  * the same prefixes to that script's env GRAFT_ONLY to restrict its loop,
  * or just ignore the missing-parquet ERROR lines for undumped queries).
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val prefixes = args.drop(2).toSeq
    require(prefixes.nonEmpty, "give at least one query-name prefix")
    new java.io.File(outDir).mkdirs()
    Verify.writeOracleJson(s"$outDir/oracle_sql.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
      .foreach { case (name, fn) =>
        val target = s"$outDir/$name.parquet"
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(target)
        println(s"[subset] dumped $name")
      }
    spark.stop()
  }
}
