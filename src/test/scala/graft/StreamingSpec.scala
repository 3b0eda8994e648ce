package graft

import graft.extract.Extractor
import graft.fixtures.Fixtures
import graft.model._
import graft.streaming.StreamingExtract
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming surface: incremental extraction equals batch
  * extraction; the checkpoint makes repeated AvailableNow runs process
  * only new files (streaming resume).
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streamingspec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def writeBatch(docs: Seq[DocRow], dir: String): Unit = {
    import spark.implicits._
    spark.createDataset(docs).coalesce(1).write.mode("append").parquet(dir)
  }

  test("streaming extraction == batch extraction; checkpoint resumes incrementally") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val in = s"$root/in"; val out = s"$root/out"; val cp = s"$root/cp"

    val first = Fixtures.corpus(30, seed = 11L)
    writeBatch(first, in)
    StreamingExtract.runAvailableNow(spark, in, out, cp)
    val afterFirst = spark.read.parquet(out).as[ExtractedDoc].collect()
    assert(afterFirst.length == first.length)

    // second increment: only the new file is processed (offsets checkpointed)
    val second = Fixtures.corpus(45, seed = 12L).drop(30) // 15 distinct new docs
    writeBatch(second, in)
    StreamingExtract.runAvailableNow(spark, in, out, cp)
    val afterSecond = spark.read.parquet(out).as[ExtractedDoc].collect()
    assert(afterSecond.length == first.length + second.length)
    // no doc processed twice
    assert(afterSecond.map(_.doc_id).distinct.length == afterSecond.length)

    // equivalence with the batch path on the same input
    val batch = spark.read.parquet(in).select("doc_id", "spans").as[DocRow]
      .collect().map(r => Extractor.extractRow(r, graft.reflow.ExtractConfig()))
    val streamMap = afterSecond.map(d => d.doc_id -> d).toMap
    batch.foreach { b =>
      val s = streamMap(b.doc_id)
      assert(s.spans == b.spans && s.text == b.text, s"mismatch for ${b.doc_id}")
    }
  }
}
