package graft

import graft.reflow.ExtractConfig
import graft.tools.GoldenGen
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Frozen document-level goldens (FIXTURES.md §4): extraction output for a
  * 25-doc composite corpus is pinned in test resources; any kernel change
  * that alters output trips this and must regenerate the goldens
  * deliberately (`runMain graft.tools.GoldenGen`) with the diff reviewed.
  */
class GoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-goldenspec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def frozen(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/goldens/$name")
    assert(in != null, s"missing golden resource $name — run graft.tools.GoldenGen")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
  }

  private def check(name: String, cfg: ExtractConfig): Unit = {
    val expected = frozen(name)
    val actual = GoldenGen.extractJson(spark, cfg)
    assert(actual.length == expected.length)
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      assert(a == e, s"$name line $i diverged")
    }
  }

  test("fast-mode extraction matches frozen goldens") {
    check("extract_fast.jsonl", ExtractConfig())
  }

  test("full-mode (media) extraction matches frozen goldens") {
    check("extract_full.jsonl", ExtractConfig(fast = false))
  }
}
