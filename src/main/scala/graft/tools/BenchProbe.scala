package graft.tools

import graft.extract.Extractor
import graft.model._
import graft.reflow.ExtractConfig
import org.apache.spark.sql.SparkSession

/** Dev tool: decompose extraction bench wall time by stage at two levels. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "40000").toInt
    val corpusPath = s"/root/repo/target/bench/docs_$nDocs"
    val levels = sys.env.getOrElse("PROBE_LEVELS", "8,32").split(",").map(_.trim.toInt).toSeq
    levels.foreach { level =>
      val spark = SparkSession.builder()
        .master(s"local[$level]")
        .config("spark.sql.shuffle.partitions", level)
        .config("spark.sql.files.maxPartitionBytes", s"${sys.env.getOrElse("PROBE_MPB", "4194304")}")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      def docs = spark.read.parquet(corpusPath).select("doc_id", "spans").as[DocRow]
      println(s"[probe] level=$level scan partitions: ${docs.rdd.getNumPartitions}")
      def time(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[probe] level=$level $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val cfg = ExtractConfig()
      time("scan_count")(docs.count())
      time("scan_count2")(docs.count())
      time("deser_only") {
        docs.mapPartitions(_.map(_.spans.length.toLong)).reduce(_ + _)
      }
      time("deser_only2") {
        docs.mapPartitions(_.map(_.spans.length.toLong)).reduce(_ + _)
      }
      time("extract_nocount_noshuffle") {
        docs.mapPartitions(_.map(r => Extractor.extractRow(r, cfg).spans.length.toLong))
          .reduce(_ + _)
      }
      time("extract_nocount_noshuffle2") {
        docs.mapPartitions(_.map(r => Extractor.extractRow(r, cfg).spans.length.toLong))
          .reduce(_ + _)
      }
      time("repartition_extract_count") {
        graft.job.ExtractJob.repartitionSkewAware(docs, level, 20000)
          .mapPartitions(_.map(r => Extractor.extractRow(r, cfg).spans.length.toLong))
          .reduce(_ + _)
      }
      time("repartition_extract_write") {
        val out = java.nio.file.Files.createTempDirectory("probe").toString
        graft.job.ExtractJob.repartitionSkewAware(docs, level, 20000)
          .mapPartitions(_.map(r => Extractor.extractRow(r, cfg)))
          .write.mode("overwrite").parquet(out + "/o")
      }
      spark.stop()
    }
  }
}
