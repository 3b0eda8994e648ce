package graft.job

import graft.extract.Extractor
import graft.model._
import graft.reflow.ExtractConfig
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator

/** The corpus-dimension driver (SURVEY.md §2.11 C1, §4): Iceberg/parquet
  * scan -> resume anti-join -> skew-aware repartition -> batched
  * mapPartitions extraction -> output + metrics sinks.
  *
  * Scale design (north_rule):
  *  - the unit of parallelism is the document row; extraction is
  *    embarrassingly parallel, so the only shuffles are the explicit
  *    repartition and (on resume) the anti-join;
  *  - skew: documents with span counts >= `bigDocSpanThreshold` are split
  *    into their own partition set sized one-doc-per-partition, so a
  *    handful of pathological documents never serialize a task (the
  *    reference has the same hot spot: per-PDF runtime dominated by LM
  *    calls, development/notes/03_notes.md);
  *  - resume: the corpus is processed in `chunks` deterministic slices
  *    (pmod(xxhash64(doc_id), chunks)); each completed chunk OVERWRITES its
  *    own chunk= directory (the retry unit — idempotent on any crash/retry
  *    interleaving) and then appends a metrics row; on restart, chunks with
  *    a 'done' metrics row are skipped — exact resume, verified by the
  *    resume-equivalence test (FIXTURES.md §4). With `bucketedInput` the
  *    input is laid out as bucket= partition dirs (bucketizeInput), so
  *    chunk selection is partition pruning and a k-chunk run scans the
  *    input ONCE total, not k times. On Iceberg the same flow maps to a
  *    bucket partition transform + replacePartitions snapshots + the
  *    metrics table.
  */
final case class JobConfig(
    inputPath: String,
    outputPath: String,
    metricsPath: String,
    runId: String = "run-0",
    numPartitions: Int = 32,
    chunks: Int = 1,
    bigDocSpanThreshold: Int = 20000,
    /** html-kernel skew threshold in CHARS (inputKind = "html"). A
      * separate knob from bigDocSpanThreshold: a 20k-span layout doc is
      * pathological, but a 20k-char page is ordinary — reusing the span
      * threshold would send most real pages down the big-doc salt branch
      * and stop the knob from isolating skew.
      */
    bigDocHtmlChars: Int = 500000,
    format: String = "parquet",
    /** input laid out as bucket=N partition dirs (ExtractJob.bucketizeInput):
      * chunk selection becomes partition PRUNING — a k-chunk run reads each
      * input byte once, instead of k full scans of a pmod filter.
      */
    bucketedInput: Boolean = false,
    /** set false when the input layout already distributes documents
      * (ingest-time hash bucketing): extraction runs map-only, zero
      * shuffle. Default true = explicit skew-aware repartition.
      */
    repartitionInput: Boolean = true,
    /** "chunk" (default): a crashed chunk is re-extracted whole and its
      * directory atomically Overwritten — exactly-once under any retry
      * interleaving. "doc": SURVEY §2.3 J4's doc-granular resume — an
      * incomplete chunk's surviving output rows are left-anti-joined
      * against the input by doc_id and only the missing documents are
      * re-extracted and Appended (requires job-level output commit,
      * parquet committer v1 / Iceberg snapshot, so a crashed append is
      * invisible; with task-level commits use "chunk").
      */
    resumeGranularity: String = "chunk",
    /** "spans" (default): the layout-token PDF kernel over (doc_id,
      * spans). "html": the web kernel (graft.html.HtmlExtract) over
      * (doc_id, html) — same chunking, bucketed pruning, skew salting
      * (keyed on html length instead of span count), doc/chunk resume
      * and per-partition lineage metrics; only the per-row kernel and
      * the input columns differ. "html_bytes": the same web kernel over
      * crawl-native (doc_id, html_bytes[, content_type]) rows — the
      * charset ladder (HtmlCharset) runs inside the same map pass; a
      * missing content_type column reads as null (ladder continues at
      * the meta prescan / content sniff).
      */
    inputKind: String = "spans",
    extract: ExtractConfig = ExtractConfig())

object ExtractJob {

  /** Read the docs table as a typed Dataset. Column pruning to
    * (doc_id, spans) is explicit so the scan never reads extra columns.
    */
  def readDocs(spark: SparkSession, cfg: JobConfig): Dataset[DocRow] = {
    import spark.implicits._
    spark.read.format(cfg.format).load(cfg.inputPath)
      .select("doc_id", "spans")
      .as[DocRow]
  }

  /** Partition granularity multiplier: more, smaller tasks smooth residual
    * skew after salting (cheap at task-scheduling level, no extra shuffle).
    */
  val SaltFactor = 4

  /** Skew-aware repartition (north_star requirement: "explicit
    * repartitioning on doc_id hash, salting for skewed long-document
    * partitions") in a SINGLE scan + single shuffle:
    *  - normal docs key on xxhash64(doc_id) — deterministic placement;
    *  - long docs (size(spans) >= bigThreshold) key on a size-salted hash,
    *    so a cluster of pathological documents spreads independently of
    *    its doc_id neighborhood;
    *  - SaltFactor x numPartitions output partitions so one long doc plus
    *    its co-residents never serializes a whole core's worth of work.
    * (An earlier two-branch filter+union formulation scanned the input
    * twice — at 100 TB that doubles the scan; this one doesn't.)
    */
  def repartitionSkewAware(
      docs: Dataset[DocRow],
      numPartitions: Int,
      bigThreshold: Int): Dataset[DocRow] = {
    import docs.sparkSession.implicits._
    repartitionSkewAwareDf(docs.toDF(), numPartitions, bigThreshold,
      size(col("spans"))).as[DocRow]
  }

  /** DataFrame-generic variant: `docSize` is the skew measure (span count
    * for the layout kernel, html length for the web kernel).
    */
  def repartitionSkewAwareDf(docs: org.apache.spark.sql.DataFrame,
      numPartitions: Int, bigThreshold: Int,
      docSize: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val key = when(docSize >= bigThreshold,
      xxhash64(col("doc_id"), lit("bigdoc-salt"), docSize))
      .otherwise(xxhash64(col("doc_id")))
    docs.repartition(numPartitions * SaltFactor, key)
  }

  /** Per-partition counters + the emit-exactly-once metric iterator,
    * SHARED by the span and html chunk extractors: one metrics contract,
    * one implementation — a divergence here would silently split the two
    * kernels' lineage semantics. Constructed inside mapPartitions (task
    * thread), never serialized.
    */
  private final class PartitionInstrumentation(runId: String, chunkId: Int) {
    private val t0 = System.currentTimeMillis()
    private val lm0 = graft.lm.Scorer.threadLmCallCount // task = one thread
    private val pid = org.apache.spark.TaskContext.getPartitionId()
    var nDocs = 0L
    var nFailed = 0L
    var spansIn = 0L
    var spansOut = 0L
    private var firstError: String = ""
    def failed(docId: String, e: Throwable): Unit = {
      nFailed += 1
      if (firstError.isEmpty) firstError = s"$docId: ${e.getMessage}"
    }
    def wrap(out: Iterator[ExtractedDoc],
        acc: CollectionAccumulator[PartitionMetric]): Iterator[ExtractedDoc] =
      new Iterator[ExtractedDoc] {
        private var metricEmitted = false
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h && !metricEmitted) {
            metricEmitted = true
            acc.add(PartitionMetric(
              runId, chunkId, pid, nDocs, nFailed, spansIn, spansOut,
              graft.lm.Scorer.threadLmCallCount - lm0,
              System.currentTimeMillis() - t0,
              if (nFailed == 0) "done" else "done_with_failures",
              firstError, System.currentTimeMillis()))
          }
          h
        }
        def next(): ExtractedDoc = out.next()
      }
  }

  /** Extract one chunk: returns the output Dataset; metrics are gathered
    * through an accumulator (one row per partition — per-partition
    * lineage). Rows are consumed on the Tungsten-direct path (FastScan) —
    * no encoder deserialization of the span array.
    */
  def extractChunk(
      docs: Dataset[DocRow],
      cfg: JobConfig,
      chunkId: Int,
      metricsAcc: CollectionAccumulator[PartitionMetric]): Dataset[ExtractedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ecfg = cfg.extract
    val runId = cfg.runId
    val prunedDf = docs.toDF().select("doc_id", "spans")
    val ord = FastScan.SpanOrdinals.from(prunedDf.schema)
    val rdd = prunedDf
      .queryExecution.toRdd.mapPartitions { it =>
      val m = new PartitionInstrumentation(runId, chunkId)
      val out = it.flatMap { row =>
        m.nDocs += 1
        // docId resolved defensively FIRST: a null doc_id / null spans is
        // a malformed DOCUMENT (metrics row), never a task failure — at
        // 10^12 rows every garbage shape occurs, and an NPE outside the
        // try would abort the whole chunk on one dirty row
        var docId = "(null doc_id)"
        try {
          if (!row.isNullAt(0)) docId = row.getUTF8String(0).toString
          val arr = row.getArray(1) // null spans -> NPE -> failed doc
          m.spansIn += arr.numElements()
          val tree = FastScan.decodeSpans(arr, ecfg.fast, ord)
          val docOut = Extractor.extractTree(tree, ecfg)
          val r = ExtractedDoc(docId, Extractor.emitSpans(docOut), docOut.text())
          m.spansOut += r.spans.length
          Some(r)
        } catch {
          case scala.util.control.NonFatal(e) => m.failed(docId, e); None
        }
      }
      m.wrap(out, metricsAcc)
    }
    spark.createDataset(rdd)
  }

  /** HTML twin of extractChunk: the web kernel over (doc_id, html) rows
    * with the SAME per-partition lineage metrics contract (one
    * PartitionMetric per partition; a null/failed document is a metrics
    * row, never a task failure). `n_spans_in` is 0 by definition — the
    * web input has no span column; `n_spans_out` counts emitted blocks.
    */
  def extractChunkHtml(
      docs: org.apache.spark.sql.DataFrame,
      cfg: JobConfig,
      chunkId: Int,
      metricsAcc: CollectionAccumulator[PartitionMetric]): Dataset[ExtractedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val runId = cfg.runId
    val rdd = docs.select("doc_id", "html").as[(String, String)]
      .queryExecution.toRdd.mapPartitions { it =>
        val m = new PartitionInstrumentation(runId, chunkId)
        val out = it.flatMap { row =>
          m.nDocs += 1
          var docId = "(null doc_id)"
          try {
            if (!row.isNullAt(0)) docId = row.getUTF8String(0).toString
            require(!row.isNullAt(1), "null html")
            val r = graft.html.HtmlExtract.extractRow(
              docId, row.getUTF8String(1).toString)
            m.spansOut += r.spans.length
            Some(r)
          } catch {
            case scala.util.control.NonFatal(e) => m.failed(docId, e); None
          }
        }
        m.wrap(out, metricsAcc)
      }
    spark.createDataset(rdd)
  }

  /** Crawl-native twin of extractChunkHtml: (doc_id, html_bytes,
    * content_type) rows through the charset ladder + web kernel in ONE
    * map pass, same metrics contract. A null content_type cell is fine
    * (the ladder continues); null bytes are a counted metrics failure.
    */
  def extractChunkHtmlBytes(
      docs: org.apache.spark.sql.DataFrame,
      cfg: JobConfig,
      chunkId: Int,
      metricsAcc: CollectionAccumulator[PartitionMetric]): Dataset[ExtractedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val runId = cfg.runId
    val rdd = docs.select("doc_id", "html_bytes", "content_type")
      .queryExecution.toRdd.mapPartitions { it =>
        val m = new PartitionInstrumentation(runId, chunkId)
        val out = it.flatMap { row =>
          m.nDocs += 1
          var docId = "(null doc_id)"
          try {
            if (!row.isNullAt(0)) docId = row.getUTF8String(0).toString
            require(!row.isNullAt(1), "null html_bytes")
            val ct = if (row.isNullAt(2)) null else row.getUTF8String(2).toString
            val r = graft.html.HtmlExtract.extractRowBytes(
              docId, row.getBinary(1), ct)
            m.spansOut += r.spans.length
            Some(r)
          } catch {
            case scala.util.control.NonFatal(e) => m.failed(docId, e); None
          }
        }
        m.wrap(out, metricsAcc)
      }
    spark.createDataset(rdd)
  }

  /** Chunk ids already recorded complete in the metrics table (resume).
    * A MISSING metrics table means a fresh run (empty set); an EXISTING
    * table that cannot be read fails loudly — silently returning empty
    * would reprocess every chunk and (pre-Overwrite) duplicate output.
    */
  def completedChunks(spark: SparkSession, cfg: JobConfig): Set[Int] = {
    val p = new org.apache.hadoop.fs.Path(cfg.metricsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else try {
      val df = spark.read.format(cfg.format).load(cfg.metricsPath)
      df.filter(col("run_id") === cfg.runId && col("status").startsWith("done"))
        .select("chunk_id").distinct()
        .collect().map(_.getInt(0)).toSet
    } catch {
      case scala.util.control.NonFatal(e) =>
        throw new IllegalStateException(
          s"metrics table ${cfg.metricsPath} exists but is unreadable — " +
            "refusing to guess the resume state", e)
    }
  }

  /** Lay the input out as `bucket=N` partition directories keyed on
    * pmod(xxhash64(doc_id), chunks) — one pass over the raw table. A
    * chunked/resumed ExtractJob over this layout selects each chunk by
    * partition PRUNING, so a k-chunk run scans each input byte exactly
    * once (the unbucketed fallback filters the full input per chunk: k
    * scans of a 100 TB table). On Iceberg this is the table's bucket
    * partition transform, written once at ingest.
    */
  def bucketizeInput(spark: SparkSession, rawPath: String, bucketedPath: String,
      chunks: Int, format: String = "parquet"): Unit = {
    spark.read.format(format).load(rawPath)
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(chunks)))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .format(format).save(bucketedPath)
  }

  /** Run the job end-to-end with checkpointed resume. */
  def run(spark: SparkSession, cfg: JobConfig): Unit = {
    import spark.implicits._
    // consulted regardless of cfg.chunks: a rerun of an already-complete
    // job (chunks=1 included) must be a no-op, not a second copy
    val done = completedChunks(spark, cfg)

    if (cfg.bucketedInput) {
      // the loop only visits buckets 0..chunks-1: a layout written with
      // MORE buckets than cfg.chunks would silently never extract the
      // excess buckets and still report success — fail loudly instead
      val p = new org.apache.hadoop.fs.Path(cfg.inputPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bucketDirs = fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("bucket="))
      val unparseable = bucketDirs.filter(_.stripPrefix("bucket=").toIntOption.isEmpty)
      require(unparseable.isEmpty,
        s"input has non-numeric bucket partition dirs ${unparseable.mkString(", ")} " +
          "(e.g. a null bucket value at write time) — the bucketed layout contract " +
          "requires integer buckets 0..chunks-1")
      val buckets = bucketDirs.map(_.stripPrefix("bucket=").toInt)
      require(buckets.nonEmpty,
        s"bucketedInput=true but ${cfg.inputPath} has no bucket= directories")
      val over = buckets.filter(_ >= cfg.chunks)
      require(over.isEmpty,
        s"input has bucket=${over.max} but chunks=${cfg.chunks} — " +
          "a smaller chunk count would silently drop those buckets")
    }

    (0 until cfg.chunks).foreach { chunk =>
      if (!done.contains(chunk)) {
        // the kernels share every job mechanism; only the data columns
        // and the per-row function differ. html_bytes additionally
        // carries content_type when the input has it (a crawl table
        // without one still works — the charset ladder continues past
        // the absent transport layer)
        def inputCols(df: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame = cfg.inputKind match {
          case "html" => df.select("doc_id", "html")
          case "html_bytes" =>
            // a WARC landing (Warc.ingestToTable) carries 3xx redirect
            // rows — crawl EDGES with empty bodies; only HTTP-200
            // captures are documents (mirrors Warc.extractAll's filter)
            val content =
              if (df.columns.contains("http_status"))
                df.filter(col("http_status") === 200)
              else df
            if (content.columns.contains("content_type"))
              content.select("doc_id", "html_bytes", "content_type")
            else content.select(col("doc_id"), col("html_bytes"),
              lit(null).cast("string").as("content_type"))
          case _ => df.select("doc_id", "spans")
        }
        val slice =
          if (cfg.bucketedInput) {
            // partition pruning on the bucket= layout: only this chunk's
            // files are scanned (JobSpec asserts the pushed filter)
            inputCols(spark.read.format(cfg.format).load(cfg.inputPath)
              .filter(col("bucket") === chunk))
          } else {
            val docs = inputCols(spark.read.format(cfg.format).load(cfg.inputPath))
            if (cfg.chunks == 1) docs
            else docs.filter(pmod(xxhash64(col("doc_id")), lit(cfg.chunks)) === chunk)
          }
        val chunkDir = s"${cfg.outputPath}/chunk=$chunk"
        // doc-granular resume (J4): keep the docs a crashed attempt already
        // committed, re-extract only the missing ones (left-anti on doc_id)
        val docLevel = cfg.resumeGranularity == "doc"
        val survivors: Option[org.apache.spark.sql.DataFrame] =
          if (!docLevel) None
          else {
            val p = new org.apache.hadoop.fs.Path(chunkDir)
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (fs.exists(p))
              scala.util.Try(spark.read.format(cfg.format).load(chunkDir)
                .select("doc_id")).toOption
            else None
          }
        val sliceTodo = survivors match {
          case Some(done) =>
            // broadcast when small; AQE/sort-merge otherwise — doc_id is
            // the join key on both sides, no wide rows cross the shuffle
            slice.join(done, Seq("doc_id"), "left_anti")
          case None => slice
        }
        val part =
          if (cfg.repartitionInput) {
            // skew measure AND threshold are per-kind: span count vs
            // bigDocSpanThreshold for layout docs, char length vs
            // bigDocHtmlChars for pages (the units differ by ~an order of
            // magnitude — see the JobConfig scaladoc)
            val (sizeCol, threshold) = cfg.inputKind match {
              case "html" => (length(col("html")), cfg.bigDocHtmlChars)
              // length(binary) = octet count; bytes-per-char ~1 for the
              // dominant encodings, so the same char threshold applies
              case "html_bytes" => (length(col("html_bytes")), cfg.bigDocHtmlChars)
              case _ => (size(col("spans")), cfg.bigDocSpanThreshold)
            }
            repartitionSkewAwareDf(sliceTodo, cfg.numPartitions,
              threshold, sizeCol)
          } else sliceTodo // ingest-time layout already distributes: map-only
        val acc = spark.sparkContext.collectionAccumulator[PartitionMetric](s"metrics-$chunk")
        val out = cfg.inputKind match {
          case "html" => extractChunkHtml(part, cfg, chunk, acc)
          case "html_bytes" => extractChunkHtmlBytes(part, cfg, chunk, acc)
          case _ =>
            extractChunk(part.select("doc_id", "spans").as[DocRow], cfg, chunk, acc)
        }
        // chunk mode: Overwrite — the chunk directory is the retry unit, so
        // a crashed-after-partial-commit attempt (committer v2, speculative
        // tasks) is simply replaced on resume — idempotent by construction.
        // doc mode: Append of exactly the anti-joined remainder.
        val mode = if (survivors.isDefined) SaveMode.Append else SaveMode.Overwrite
        out.write.mode(mode).format(cfg.format).save(chunkDir)
        // chunk committed -> record completion (exact resume boundary);
        // dedupe on partition id: task retries/speculation can fire an
        // accumulator update more than once per partition
        val rows = scala.jdk.CollectionConverters.ListHasAsScala(acc.value).asScala
          .groupBy(_.partition_id).map(_._2.head).toSeq
        val metricRows =
          if (rows.nonEmpty) rows
          else Seq(PartitionMetric(cfg.runId, chunk, -1, 0, 0, 0, 0, 0, 0,
            "done", "", System.currentTimeMillis()))
        spark.createDataset(metricRows).write.mode(SaveMode.Append)
          .format(cfg.format).save(cfg.metricsPath)
      }
    }
  }

  /** Read the combined output of all chunks. */
  def readOutput(spark: SparkSession, cfg: JobConfig): Dataset[ExtractedDoc] = {
    import spark.implicits._
    spark.read.format(cfg.format).load(s"${cfg.outputPath}/chunk=*")
      .select("doc_id", "spans", "text").as[ExtractedDoc]
  }

  /** Oracle comparison join (J5): rows whose span sequence differs from
    * the expected table under (kind, text, media_ref, order) — plain
    * Catalyst array-of-struct equality, broadcast-friendly.
    */
  def diffAgainstExpected(out: DataFrame, expected: DataFrame): DataFrame = {
    out.alias("o")
      .join(expected.alias("e"), Seq("doc_id"), "inner")
      .filter(!(col("o.spans") === col("e.spans")))
      .select(col("doc_id"), col("o.spans").as("actual"), col("e.spans").as("expected"))
  }

  /** spark-submit entrypoint (north_rule: "run via spark-submit"):
    *
    *   spark-submit --class graft.job.ExtractJob <jar> \
    *     --input <path> --output <path> --metrics <path> \
    *     [--run-id r] [--partitions n] [--chunks k] [--format parquet] \
    *     [--big-doc-spans n] [--big-doc-html-chars n] [--fast true|false] \
    *     [--bucketed-input true|false] [--repartition true|false] \
    *     [--input-kind spans|html|html_bytes]
    *
    * The session is taken from spark-submit's conf (master, executors,
    * AQE, shuffle partitions come from the cluster submit, not the code).
    */
  def main(args: Array[String]): Unit = {
    val kv = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    def req(k: String): String =
      kv.getOrElse(k, sys.error(s"missing required --$k <value>"))
    val cfg = JobConfig(
      inputPath = req("input"),
      outputPath = req("output"),
      metricsPath = req("metrics"),
      runId = kv.getOrElse("run-id", "run-0"),
      numPartitions = kv.getOrElse("partitions", "32").toInt,
      chunks = kv.getOrElse("chunks", "1").toInt,
      bigDocSpanThreshold = kv.getOrElse("big-doc-spans", "20000").toInt,
      bigDocHtmlChars = kv.getOrElse("big-doc-html-chars", "500000").toInt,
      format = kv.getOrElse("format", "parquet"),
      bucketedInput = kv.getOrElse("bucketed-input", "false").toBoolean,
      repartitionInput = kv.getOrElse("repartition", "true").toBoolean,
      inputKind = kv.getOrElse("input-kind", "spans"),
      extract = graft.reflow.ExtractConfig(
        fast = kv.getOrElse("fast", "true").toBoolean))
    val builder = SparkSession.builder()
      .appName(s"graft-extract-${cfg.runId}")
      .config("spark.sql.adaptive.enabled", "true")
    // on a cluster, spark-submit provides the master; fall back for
    // local/dev invocation
    val withMaster =
      if (sys.props.contains("spark.master")) builder
      else builder.master(kv.getOrElse("master", "local[32]"))
        .config("spark.sql.shuffle.partitions", kv.getOrElse("partitions", "32"))
    val spark = withMaster.getOrCreate()
    run(spark, cfg)
    spark.stop()
  }
}
