package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 optimization probes (guide §1.4: noop-sink isolation) — a
  * SEPARATE main so the frozen `graft.Bench` harness stays untouched.
  * Each subcommand isolates one stage of an expensive query so its wall
  * can be attributed (kernel vs join vs barrier), and the numbers are
  * cited in OPTIMIZATION_r08.md.
  *
  *  - `winnow`   : q30 decomposition — signature kernel alone (noop) vs
  *                 the full shared-fingerprint pair join.
  *  - `grams`    : q22/q25 decomposition — gram-hash projection alone vs
  *                 the full decontaminate / doc-freq aggregations.
  *  - `crawl`    : x23/x31 barrier decomposition — an empty-cycle probe
  *                 (all fixed per-cycle cost, no data path) next to the
  *                 measured crawl walls, the VERDICT item-6 artifact.
  */
object BenchExtra {

  private def session(cores: Int): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    args.toList match {
      case "winnow" :: _ => winnow(sfDir, cpus)
      case "prep" :: _ => prep(sfDir, cpus)
      case "grams" :: _ => grams(sfDir, cpus)
      case "crawl" :: _ => crawl(cpus)
      case other => sys.error(s"unknown BenchExtra command: $other")
    }
  }

  /** q30 stage isolation: signature kernel vs pair join. */
  private def winnow(sfDir: String, cpus: Int): Unit = {
    val spark = session(cpus)
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { r =>
      spark.sparkContext.setJobDescription("winnow: signature kernel only")
      val tSig = timed {
        noop(docs.select(col("doc_id").cast("long"), col("text"))
          .as[(Long, String)]
          .flatMap { case (id, t) =>
            graft.ops.TextAnalysis.winnowSignature(t).distinct.iterator
              .map(h => (id, h))
          }.toDF("id", "f"))
      }
      spark.sparkContext.setJobDescription("winnow: full q30 pair join")
      val tFull = timed {
        noop(graft.ops.Dedup.winnowOverlapPairs(docs, minShared = 10))
      }
      println(f"[winnow] round $r kernel_only=$tSig%.2f s full_q30=$tFull%.2f s")
    }
    spark.stop()
  }

  /** q26 stage isolation: cumulative wall per CorpusPrep stage. */
  private def prep(sfDir: String, cpus: Int): Unit = {
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.pmod
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { r =>
      spark.catalog.clearCache()
      val stages = graft.pipeline.CorpusPrep.stages(
        docs = d.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        evalCorpus = Some(d.filter(pmod(col("doc_id"), lit(20)) === 0)),
        cfg = graft.pipeline.CorpusPrep.PrepConfig(
          quality = Some(graft.ops.Corpus.GopherThresholds(minTokens = 20,
            maxDupWordRatio = 0.7, maxDup2GramRatio = 0.15,
            minStopwordRatio = 0.01, minAlphaRatio = 0.6)),
          nearDedup = Some(graft.ops.Dedup.MinHashParams(bands = 32,
            jaccardThreshold = 0.5)),
          decontaminateN = 4,
          sampleRates = Map("en" -> 0.9, "de" -> 0.7),
          sampleDefaultRate = 0.5))
      stages.foreach { case (name, df) =>
        spark.sparkContext.setJobDescription(s"prep: $name")
        val t = timed(noop(df))
        println(f"[prep] round $r $name%-16s cumulative=$t%.2f s")
      }
    }
    spark.stop()
  }

  /** q22/q25 stage isolation: gram projection vs full aggregations. */
  private def grams(sfDir: String, cpus: Int): Unit = {
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = graft.ops.TextAnalysis.wsTokens(lower(col("text")))
    (1 to 2).foreach { r =>
      spark.sparkContext.setJobDescription("grams: 4-gram hash projection only")
      val tProj = timed {
        noop(docs.select(col("doc_id"),
          explode(graft.ops.Corpus.wordGrams(toks, 4)).as("gram"))
          .select(col("doc_id"), call_function("md5_long", col("gram")).as("g")))
      }
      spark.sparkContext.setJobDescription("grams: full q22 decontaminate")
      val tQ22 = timed {
        noop(graft.ops.Corpus.decontaminate(
          docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(20)) === 0), n = 4))
      }
      spark.sparkContext.setJobDescription("grams: full q25 df-topk")
      val tQ25 = timed {
        noop(graft.ops.Corpus.ngramDocFreqTopK(docs, n = 2, k = 50))
      }
      println(f"[grams] round $r gram_proj=$tProj%.2f s q22=$tQ22%.2f s q25=$tQ25%.2f s")
    }
    spark.stop()
  }

  /** x23/x31 barrier decomposition (VERDICT r7 item 6): run the real
    * fixture crawls AND an empty-cycle probe (1-url web, seeds exhaust
    * after cycle 1) in the same window, so `cycles x empty-cycle wall`
    * decomposes the crawl walls into fixed barrier vs data path.
    */
  private def crawl(cpus: Int): Unit = {
    val spark = session(cpus)
    val sp = spark
    import sp.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 2).foreach { r =>
      // empty-cycle probe: seeds with no outlinks -> exhausts in 2 cycles
      spark.sparkContext.setJobDescription("crawl: empty-cycle probe")
      val web1 = Seq(("https://probe.example/only",
        "<html><body><p>leer</p></body></html>")).toDF("url", "html")
      val seeds1 = Seq("https://probe.example/only").toDF("url")
      val robots1 = Seq(("probe.example", "User-Agent: *\n"))
        .toDF("host", "robots_txt")
      val cfg1 = graft.pipeline.CrawlLoop.CrawlConfig(
        outDir = java.nio.file.Files.createTempDirectory("graft-probe")
          .toString, cycles = 4)
      val tProbe = timed {
        graft.pipeline.CrawlLoop.run(spark, web1, seeds1, robots1, cfg1)
      }
      // the x23 fixture crawl
      spark.sparkContext.setJobDescription("crawl: x23 fixture loop")
      val web = graft.fixtures.HtmlFixtures.site(depth = 2, fanout = 2)
        .toDF("url", "html")
      val seeds = Seq("https://crawl.example/start").toDF("url")
      val robots = Seq(graft.fixtures.HtmlFixtures.siteRobots())
        .toDF("host", "robots_txt")
      val cfg = graft.pipeline.CrawlLoop.CrawlConfig(
        outDir = java.nio.file.Files.createTempDirectory("graft-x23p")
          .toString, cycles = 10)
      val tX23 = timed {
        graft.pipeline.CrawlLoop.run(spark, web, seeds, robots, cfg)
      }
      println(f"[crawl] round $r empty_run(2cyc)=$tProbe%.2f s " +
        f"per_cycle=${tProbe / 2}%.2f s x23_run=$tX23%.2f s")
    }
    spark.stop()
  }
}
