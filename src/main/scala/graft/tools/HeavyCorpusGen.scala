package graft.tools

import graft.fixtures.Fixtures
import org.apache.spark.sql.SparkSession

/** Dev tool: generate a heavier-document bench corpus (4-8 pages/doc,
  * matching the reference corpus document sizes better than 1-3 pages).
  */
object HeavyCorpusGen {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40000)
    val path = s"/root/repo/target/bench/heavy2_$n"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(0, n).map { i =>
      val rng = new Fixtures.Rng(42L + i)
      val pages = if (i % 1000 == 0) 80 else 10 + rng.nextInt(7)
      Fixtures.compositeDoc(f"doc-$i%08d", pages, rng, withMedia = i % 5 == 0)
    }.repartition(32).write.mode("overwrite").parquet(path)
    println(s"[heavy] wrote $n docs -> $path")
    spark.stop()
  }
}
