package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: isolate parquet-read vs encoder-deser scaling. */
object DeserScale {
  def main(args: Array[String]): Unit = {
    val corpusPath = "/root/repo/target/bench/docs_40000"
    Seq(8, 32, 8, 32).foreach { level =>
      val spark = SparkSession.builder()
        .master(s"local[$level]")
        .config("spark.sql.files.maxPartitionBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      def df = spark.read.parquet(corpusPath).select("doc_id", "spans")
      def time(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[deser] level=$level $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("sql_only_warm") { df.selectExpr("sum(size(spans))").collect() }
      time("sql_only") { df.selectExpr("sum(size(spans))").collect() }
      time("sql_texthash") { df.selectExpr("sum(hash(to_json(spans)))").collect() }
      time("encoder_warm") {
        df.as[graft.model.DocRow].mapPartitions(_.map(_.spans.length.toLong)).reduce(_ + _)
      }
      time("encoder") {
        df.as[graft.model.DocRow].mapPartitions(_.map(_.spans.length.toLong)).reduce(_ + _)
      }
      spark.stop()
    }
  }
}
