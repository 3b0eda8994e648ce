package graft.tools

import graft.reflow.ExtractConfig
import org.apache.spark.sql.SparkSession

/** Dev tool: fixed per-job cost (planning/scheduling/commit) measured by
  * running the identical e2e pipeline on a tiny corpus.
  */
object FixedCostProbe {
  def main(args: Array[String]): Unit = {
    for (level <- Seq(4, 16); n <- Seq(400, 120000)) {
      val corpusPath = s"/root/repo/target/bench/docs_$n"
      val spark = SparkSession.builder()
        .master(s"local[$level]")
        .config("spark.sql.shuffle.partitions", level)
        .config("spark.sql.files.maxPartitionBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      if (!new java.io.File(corpusPath + "/_SUCCESS").exists()) {
        spark.range(0, n).map { i =>
          val rng = new graft.fixtures.Fixtures.Rng(42L + i)
          val pages = if (i % 1000 == 0) 40 else 1 + rng.nextInt(3)
          graft.fixtures.Fixtures.compositeDoc(f"doc-$i%08d", pages, rng, withMedia = i % 5 == 0)
        }.repartition(32).write.mode("overwrite").parquet(corpusPath)
      }
      val out = java.nio.file.Files.createTempDirectory("fixedcost").toString
      def once(tag: String): Double = {
        val docs = spark.read.parquet(corpusPath)
          .select("doc_id", "spans").as[graft.model.DocRow]
        val part = graft.job.ExtractJob.repartitionSkewAware(docs, level, 20000)
        val t0 = System.nanoTime()
        graft.job.FastScan.extract(part.toDF(), ExtractConfig())
          .write.mode("overwrite").parquet(s"$out/$tag")
        (System.nanoTime() - t0) / 1e9
      }
      once("warm"); once("warm2")
      val best = (1 to 3).map(i => once(s"t$i")).min
      println(f"[fixed] level=$level n=$n best=$best%.2f s")
      spark.stop()
    }
  }
}
