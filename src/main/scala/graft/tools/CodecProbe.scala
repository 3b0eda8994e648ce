package graft.tools

import graft.reflow.ExtractConfig
import org.apache.spark.sql.SparkSession

/** Dev tool: A/B shuffle+sink compression codecs on the full e2e path. */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val corpusPath = "/root/repo/target/bench/docs_120000"
    val variants = Seq(
      ("lz4-snappy", "lz4", "snappy"),
      ("zstd-zstd", "zstd", "zstd"),
      ("lz4-zstd", "lz4", "zstd"),
      ("zstd-snappy", "zstd", "snappy"))
    for ((name, io, pq) <- variants; level <- Seq(4, 16)) {
      val spark = SparkSession.builder()
        .master(s"local[$level]")
        .config("spark.sql.shuffle.partitions", level)
        .config("spark.sql.files.maxPartitionBytes", "4194304")
        .config("spark.io.compression.codec", io)
        .config("spark.sql.parquet.compression.codec", pq)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val cfg = ExtractConfig()
      val out = java.nio.file.Files.createTempDirectory("codecprobe").toString
      def once(tag: String): Double = {
        val docs = spark.read.parquet(corpusPath)
          .select("doc_id", "spans").as[graft.model.DocRow]
        val part = graft.job.ExtractJob.repartitionSkewAware(docs, level, 20000)
        val t0 = System.nanoTime()
        graft.job.FastScan.extract(part.toDF(), cfg)
          .write.mode("overwrite").parquet(s"$out/$tag")
        (System.nanoTime() - t0) / 1e9
      }
      once("warm")
      val best = Seq(once("t1"), once("t2")).min
      println(f"[codec] $name level=$level best=$best%.2f s (${120000 / best}%.0f docs/s)")
      spark.stop()
    }
  }
}
