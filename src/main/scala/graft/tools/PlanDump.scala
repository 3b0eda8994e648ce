package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the SparkEntry query
  * surface + smoke the driver's entry() contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_pricing_agg",
      "q02_revenue_by_nation", "q07_exact_dup_groups", "q11_minhash_dup_pairs",
      "q19_ngram_jaccard_pairs", "q13_ann_bruteforce_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val entryRows = graft.SparkEntry.entry(spark).count()
    println(s"[plan] entry() rows=$entryRows (driver smoke-checks >0)")
    names.foreach { n =>
      println(s"\n================ $n ================")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
