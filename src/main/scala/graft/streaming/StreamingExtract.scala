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
/** One (band, band_hash) bucket row of an incoming document
  * (nearDupPairsStream). Top-level so the Dataset encoders codegen
  * cleanly (object-nested state classes trip janino).
  */
final case class BandedSig(band: Int, band_hash: Long, doc_id: Long,
    ts: java.sql.Timestamp, sig: Seq[Long])

/** Candidate near-dup pair from the stream (doc_a < doc_b). */
final case class StreamPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

/** nearDupPairsStream bucket state: one entry per member in horizon. */
final case class BucketEntry(doc_id: Long, ts_ms: Long, sig: Seq[Long])
final case class BucketState(entries: List[BucketEntry])

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

  /** Streaming MinHash near-duplicate CANDIDATE pairs for continuous
    * ingest (the streaming face of Dedup.minHashDuplicatePairs):
    *
    *  - map-side: one MinHash signature per doc, banded into
    *    (band, band_hash) bucket rows — exactly the batch operator's
    *    shapes (Dedup.minHashSignature / band mixing), so stream and
    *    batch agree on bucketing;
    *  - state: flatMapGroupsWithState keyed on the bucket, holding the
    *    (doc_id, event-time, signature) of bucket members inside the
    *    watermark horizon — signatures, never text. Each doc's signature
    *    is held in EACH of its `bands` bucket states (the estimator needs
    *    the full signature at comparison time), so state and shuffle pay
    *    a factor of `bands` x numHashes longs per doc within the horizon;
    *    the knobs are bands/numHashes/maxBucketSize and the watermark.
    *    Eviction by event-time timeout bounds state to
    *    (horizon x ingest rate), never corpus size;
    *  - similarity is ESTIMATED from signature agreement (the standard
    *    MinHash estimator: matching components / numHashes). The batch
    *    layer verifies with exact shingle Jaccard; on a stream the texts
    *    are gone, so the estimator is the honest on-arrival signal and
    *    the periodic batch compaction stays authoritative.
    *
    * A pair colliding in several buckets can emit more than once
    * (at-least-once per pair) — consumers dedupe on (doc_a, doc_b).
    */
  def nearDupPairsStream(docs: DataFrame, eventTimeCol: String,
      watermark: String,
      p: graft.ops.Dedup.MinHashParams = graft.ops.Dedup.MinHashParams(),
      saturatedSkips: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[StreamPair] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    // recall loss from the mega-bucket cap must be VISIBLE at runtime
    // (round-2 advice): each NEW document a saturated (band, band_hash)
    // bucket shuts out increments this accumulator (named -> surfaces in
    // the Spark UI / status APIs; callers can pass their own to alert on
    // it), mirroring how the batch operator's cut is auditable via
    // Audit.pairRecall. Unit = per-band bucket events: a doc shut out of
    // all its bands counts up to `bands` times (upper bound on doc-level
    // loss); replays of ids already stored in the bucket don't count.
    val skipAcc = saturatedSkips.getOrElse(
      spark.sparkContext.longAccumulator("graft.streaming.neardup.saturatedSkips"))
    val rows = p.numHashes / p.bands
    val banded = docs
      .select(col("doc_id").cast("long"), col("text"),
        col(eventTimeCol).cast("timestamp").as("ts"))
      // null doc_id/text/ts rows are dropped BEFORE the typed stage: one
      // poison row would otherwise NPE the task, and a streaming task
      // failure crash-loops on checkpoint replay (this operator emits
      // candidate pairs, not a per-doc sink — transformWithStatus is the
      // per-doc outcome surface)
      .filter(col("doc_id").isNotNull && col("text").isNotNull &&
        col("ts").isNotNull)
      .as[(Long, String, java.sql.Timestamp)]
      .flatMap { case (id, text, ts) =>
        val sig = graft.ops.Dedup.minHashSignature(
          graft.ops.Dedup.shingles(text, p.shingleSize), p.numHashes)
        (0 until p.bands).iterator.map { b =>
          var h = 0xcbf29ce484222325L
          var i = b * rows
          while (i < (b + 1) * rows) { h = graft.ops.Hashing.mix(h ^ sig(i)); i += 1 }
          BandedSig(b, h, id, ts, sig.toSeq)
        }
      }
      .withWatermark("ts", watermark)
    banded.groupByKey(r => (r.band, r.band_hash))
      .flatMapGroupsWithState[BucketState, StreamPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, it, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var cur = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_.ts_ms >= wm) // horizon eviction on every visit
            val out = scala.collection.mutable.ArrayBuffer.empty[StreamPair]
            it.foreach { r =>
              // mega-bucket guard (MinHashParams.maxBucketSize, same
              // rationale as the batch operator): a bucket saturated by
              // corpus-wide boilerplate stops comparing AND stops growing
              // — per-arrival work and state stay bounded
              if (cur.lengthCompare(p.maxBucketSize) < 0) {
                cur.foreach { e =>
                  val oid = e.doc_id; val osig = e.sig
                  if (oid != r.doc_id) {
                    var m = 0; var i = 0
                    val n = math.min(osig.length, r.sig.length)
                    while (i < n) { if (osig(i) == r.sig(i)) m += 1; i += 1 }
                    val est = if (n == 0) 0.0 else m.toDouble / n
                    if (est >= p.jaccardThreshold)
                      out += StreamPair(math.min(oid, r.doc_id),
                        math.max(oid, r.doc_id), graft.ops.Similarity.round6(est))
                  }
                }
                cur = BucketEntry(r.doc_id, r.ts.getTime, r.sig) :: cur
              } else if (!cur.exists(_.doc_id == r.doc_id)) {
                // count only genuinely shut-out documents, not replays of
                // ids the bucket already holds; note the unit is per-BAND
                // bucket events — a doc shut out of all its bands counts
                // up to `bands` times (an upper bound on doc-level loss)
                skipAcc.add(1L)
              }
            }
            if (cur.isEmpty) state.remove()
            else {
              state.update(BucketState(cur))
              state.setTimeoutTimestamp(cur.map(_.ts_ms).max, watermark)
            }
            out.iterator
          }
      }
  }

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
