package graft.tools

import graft.extract.Extractor
import graft.fixtures.Fixtures
import graft.model._
import graft.reflow.ExtractConfig
import org.apache.spark.sql.SparkSession

/** Dev tool: (re)generate the frozen document-level goldens
  * (FIXTURES.md §4 "document-level goldens ... frozen as parquet" — JSONL
  * here so diffs are reviewable). Run ONLY when an intentional semantics
  * change is made; the diff is the review surface.
  */
object GoldenGen {
  val CorpusSeed = 123L
  val CorpusSize = 25

  def corpus(): IndexedSeq[DocRow] = Fixtures.corpus(CorpusSize, seed = CorpusSeed)

  def extractJson(spark: SparkSession, cfg: ExtractConfig): Seq[String] = {
    import spark.implicits._
    spark.createDataset(corpus().toSeq)
      .map(r => Extractor.extractRow(r, cfg))
      .orderBy("doc_id")
      .toJSON.collect().toSeq
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("/root/repo/src/test/resources/goldens")
    java.nio.file.Files.createDirectories(dir)
    Seq(
      "extract_fast.jsonl" -> ExtractConfig(),
      "extract_full.jsonl" -> ExtractConfig(fast = false)).foreach {
      case (name, cfg) =>
        val lines = extractJson(spark, cfg)
        java.nio.file.Files.writeString(dir.resolve(name),
          lines.mkString("", "\n", "\n"))
        println(s"[golden] wrote ${lines.length} docs -> $name")
    }
    spark.stop()
  }
}
