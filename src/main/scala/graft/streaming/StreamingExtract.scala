package graft.streaming

import graft.extract.Extractor
import graft.model._
import graft.reflow.ExtractConfig
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Structured-Streaming surface: continuous/incremental extraction.
  *
  * The reference is strictly batch (one PDF per call,
  * tests/test_pdfs.py:16-22), and the north_rule job is spark-submit
  * batch — but a 10^12-document corpus is not ingested once; it arrives.
  * The extraction kernel is a stateless per-row function, so the streaming
  * form is the same `mapPartitions` pass under a streaming scan:
  *
  *   readStream (file source, maxFilesPerTrigger) -> extract -> sink
  *
  * Exactly-once: the file source + checkpointed offsets + an idempotent
  * (path-unique) parquet sink give end-to-end exactly-once for this
  * stateless pipeline; no watermark is needed (no event-time aggregation).
  * Resume is the streaming checkpoint itself — the batch job's
  * chunk-metrics resume and this checkpoint are the two faces of the same
  * requirement.
  *
  * No shuffle in-stream: skew salting is a batch concern (the streaming
  * micro-batch bounds work per trigger via maxFilesPerTrigger instead);
  * each micro-batch is embarrassingly parallel over its input partitions.
  */
object StreamingExtract {

  /** Streaming extraction transform — works on any streaming (or batch)
    * DataFrame with (doc_id, spans). Stateless, so it composes with any
    * source/sink/trigger. (The batch job uses the Tungsten-direct
    * FastScan variant; streaming plans can't expose queryExecution.toRdd,
    * so this takes the typed-encoder path — same kernel, same output.)
    */
  def transform(docs: DataFrame, cfg: ExtractConfig = ExtractConfig()): Dataset[ExtractedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "spans").as[DocRow].mapPartitions(_.flatMap { row =>
      try Some(Extractor.extractRow(row, cfg))
      catch { case _: ExtractionException => None }
    })
  }

  /** A streaming row with its extraction outcome — the batch job's
    * metrics-table contract translated to a stream: every input document
    * produces exactly one output row, failed ones with status="failed"
    * and the error message, so continuous-ingest data loss is a
    * queryable fact instead of a silent flatMap drop.
    */
  final case class ExtractedDocStatus(doc_id: String, spans: Seq[graft.model.Span],
      text: String, status: String, error: String)

  /** transform with per-document outcome (the production streaming path:
    * `filter($"status" === "ok")` recovers transform's output; the failed
    * remainder IS the streaming metrics signal).
    */
  def transformWithStatus(docs: DataFrame,
      cfg: ExtractConfig = ExtractConfig()): Dataset[ExtractedDocStatus] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "spans").as[DocRow].mapPartitions(_.map { row =>
      try {
        val d = Extractor.extractRow(row, cfg)
        ExtractedDocStatus(d.doc_id, d.spans, d.text, "ok", "")
      } catch {
        case e: ExtractionException =>
          ExtractedDocStatus(row.doc_id, Seq.empty, "", "failed",
            String.valueOf(e.getMessage))
      }
    })
  }

  /** File-source incremental pipeline: watches `inputDir` for new parquet
    * files of DocRow, extracts, appends to `outputDir`, checkpointing
    * offsets under `checkpointDir`.
    */
  def fileStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      cfg: ExtractConfig = ExtractConfig(),
      maxFilesPerTrigger: Int = 32): DataStreamWriter[ExtractedDoc] = {
    val in = spark.readStream
      .format("parquet")
      .schema(Encoders.product[DocRow].schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(inputDir)
    transform(in, cfg).writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
  }

  /** Streaming exact dedup for continuous ingest: drop any document whose
    * content fingerprint was already seen within the watermark horizon.
    * State holds the 16-byte md5 fingerprint (plus event time), never the
    * text, and `dropDuplicatesWithinWatermark` evicts state older than
    * the watermark — so state size is bounded by (dedup horizon x ingest
    * rate), not corpus size. Cross-all-time exact dedup remains the batch
    * operator (Dedup.dedupExact) run as a periodic compaction; this is
    * the standard split for dedup-on-arrival at corpus scale.
    */
  def dedupExactStream(docs: DataFrame, eventTimeCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("fp", graft.ops.TextAnalysis.fingerprint(
        org.apache.spark.sql.functions.col("text")))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Drain everything currently available and stop (Trigger.AvailableNow):
    * the incremental-batch mode — repeated invocations process only new
    * files. Returns after the stream terminates.
    */
  def runAvailableNow(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      cfg: ExtractConfig = ExtractConfig()): Unit = {
    val q = fileStream(spark, inputDir, outputDir, checkpointDir, cfg)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
