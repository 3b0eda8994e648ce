package graft.tools

import graft.fixtures.Fixtures
import graft.job.{ExtractJob, JobConfig}
import graft.model._
import org.apache.spark.sql.SparkSession

/** Dev verification driver: full Spark path (write input parquet -> run
  * the chunked extraction job -> read output + metrics back -> re-run to
  * prove resume is a no-op).
  */
object VerifyE2E {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-verify-e2e")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    println(s"workdir: $dir")

    // degenerate doc (no words) -> must become a failed metric, not output
    val docs = Fixtures.corpus(200, seed = 42L) :+
      DocRow("doc-degenerate", Seq(Span("page", "", "", 0)))
    spark.createDataset(docs).write.parquet(s"$dir/in")

    val cfg = JobConfig(
      inputPath = s"$dir/in",
      outputPath = s"$dir/out",
      metricsPath = s"$dir/metrics",
      runId = "verify-1",
      numPartitions = 8,
      chunks = 2)

    ExtractJob.run(spark, cfg)
    val out1 = ExtractJob.readOutput(spark, cfg).collect().sortBy(_.doc_id)
    println(s"docs in: ${docs.length}, docs out: ${out1.length}")
    val m = spark.read.parquet(s"$dir/metrics")
    m.show(50, truncate = false)
    println("sample doc text:")
    println(out1.head.text)
    println("sample spans: " + out1.head.spans.map(_.kind).mkString(","))

    // resume probe: re-run same config -> both chunks recorded done ->
    // nothing reprocessed, output unchanged
    ExtractJob.run(spark, cfg)
    val out2 = ExtractJob.readOutput(spark, cfg).collect().sortBy(_.doc_id)
    println(s"after resume re-run: ${out2.length} rows (expect unchanged ${out1.length})")
    val same = out1.length == out2.length &&
      out1.zip(out2).forall { case (a, b) => a == b }
    println(s"resume no-op: $same")

    val failed = m.filter("n_failed > 0").count()
    println(s"metric rows with failures: $failed (expect >= 1 for degenerate doc)")
    spark.stop()
    if (!same) sys.exit(1)
  }
}
