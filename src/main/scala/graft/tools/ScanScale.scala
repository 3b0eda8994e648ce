package graft.tools

import org.apache.spark.sql.SparkSession

object ScanScale {
  def main(args: Array[String]): Unit = {
    val corpusPath = "/root/repo/target/bench/docs_120000"
    Seq(("true", 4), ("true", 16), ("false", 4), ("false", 16)).foreach { case (nested, level) =>
      val spark = SparkSession.builder()
        .master(s"local[$level]")
        .config("spark.sql.files.maxPartitionBytes", "4194304")
        .config("spark.sql.parquet.enableNestedColumnVectorizedReader", nested)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      def df = spark.read.parquet(corpusPath).select("doc_id", "spans")
      def run(): Double = {
        val t0 = System.nanoTime()
        df.selectExpr("sum(size(spans))", "sum(length(spans[0].text))").collect()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      println(f"[scan] nestedVec=$nested level=$level ${Seq(run(), run()).min}%.2f s")
      spark.stop()
    }
  }
}
