package graft.tools

import graft.reflow.ExtractConfig
import org.apache.spark.sql.SparkSession

/** Dev tool: stage decomposition on the FastScan path with noop sink. */
object BenchProbe2 {
  def main(args: Array[String]): Unit = {
    val corpusPath = "/root/repo/target/bench/docs_120000"
    val levels = sys.env.getOrElse("PROBE_LEVELS", "4,16").split(",").map(_.trim.toInt)
    levels.foreach { level =>
      val spark = SparkSession.builder()
        .master(s"local[$level]")
        .config("spark.sql.shuffle.partitions", level)
        .config("spark.sql.files.maxPartitionBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      def df = spark.read.parquet(corpusPath).select("doc_id", "spans")
      def time(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[p2] level=$level $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val cfg = ExtractConfig()
      time("a_extract_noop_warm") {
        graft.job.FastScan.extract(df, cfg).write.mode("overwrite").format("noop").save()
      }
      time("a_extract_noop") {
        graft.job.FastScan.extract(df, cfg).write.mode("overwrite").format("noop").save()
      }
      time("b_repart_extract_noop") {
        import graft.model.DocRow
        val part = graft.job.ExtractJob.repartitionSkewAware(df.as[DocRow], level, 20000)
        graft.job.FastScan.extract(part.toDF(), cfg).write.mode("overwrite").format("noop").save()
      }
      time("c_repart_extract_parquet") {
        import graft.model.DocRow
        val part = graft.job.ExtractJob.repartitionSkewAware(df.as[DocRow], level, 20000)
        val out = java.nio.file.Files.createTempDirectory("p2").toString
        graft.job.FastScan.extract(part.toDF(), cfg).write.mode("overwrite").parquet(out + "/o")
      }
      spark.stop()
    }
  }
}
