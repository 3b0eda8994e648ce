package graft.tools

import graft.reflow.ExtractConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: task-granularity sweep — does finer task quantization close
  * the 16-core efficiency gap?
  */
object WaveProbe {
  def main(args: Array[String]): Unit = {
    val corpusPath = "/root/repo/target/bench/docs_120000"
    for (level <- Seq(4, 16); mpb <- Seq(4194304, 1048576); salt <- Seq(4, 12)) {
      val spark = SparkSession.builder()
        .master(s"local[$level]")
        .config("spark.sql.shuffle.partitions", level)
        .config("spark.sql.files.maxPartitionBytes", mpb)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val out = java.nio.file.Files.createTempDirectory("waveprobe").toString
      def once(tag: String): Double = {
        val docs = spark.read.parquet(corpusPath)
          .select("doc_id", "spans").as[graft.model.DocRow]
        val key = when(size(col("spans")) >= 20000,
          xxhash64(col("doc_id"), lit("bigdoc-salt"), size(col("spans"))))
          .otherwise(xxhash64(col("doc_id")))
        val part = docs.repartition(level * salt, key).as[graft.model.DocRow]
        val t0 = System.nanoTime()
        graft.job.FastScan.extract(part.toDF(), ExtractConfig())
          .write.mode("overwrite").parquet(s"$out/$tag")
        (System.nanoTime() - t0) / 1e9
      }
      once("warm")
      val best = Seq(once("t1"), once("t2")).min
      println(f"[wave] level=$level mpb=${mpb / 1048576}MB salt=$salt best=$best%.2f s")
      spark.stop()
    }
  }
}
