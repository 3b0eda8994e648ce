package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated token sequences ACROSS documents (the defect class of
  * Lee et al. 2021, "Deduplicating Training Data Makes Language Models
  * Better": verbatim passages repeated between web pages survive
  * whole-document dedup). Finds every maximal run of >= minRunTokens
  * consecutive tokens shared between two documents — without a suffix
  * array, as three relational steps that parallelize trivially:
  *
  *  1. hash every k-token window -> (doc, pos, h) rows. Map-side; the
  *     hash is the codegen'd xxhash64, so only 24-byte rows ever shuffle
  *     (never token text). The oracle recomputes windows with its own
  *     hash — matches are window-TEXT equality either way (no hash
  *     reaches the output), so the engine hash is free to be the cheap
  *     one at the usual 2^-64 collision odds.
  *  2. self-join windows on h with doc_a < doc_b. A shared run of L
  *     tokens produces L-k+1 hits on the SAME alignment diagonal
  *     (pos_a - pos_b).
  *  3. gaps-and-islands per (doc_a, doc_b, diag): consecutive pos_a
  *     values collapse to one island = one maximal run,
  *     run_tokens = hits + k - 1.
  *
  * Runs shorter than k are invisible — pick k <= minRunTokens (k is the
  * recall floor, minRunTokens the reporting threshold).
  *
  * Scale: windows are O(total tokens) fixed-width rows; the only
  * dangerous key is a corpus-hot window (boilerplate) — `maxWindowDocFreq`
  * drops windows present in more than that many documents before the
  * self-join, the same cut ngramJaccardPairsAtScale applies (a stop-phrase
  * window otherwise makes the join quadratic; gate entries run it
  * unbounded because their oracle is the exact formulation).
  */
object SubstringDedup {

  /** Pipeline parameters (CorpusPrep's substring_dedup stage): production
    * defaults — 50-token runs are the Lee et al. reporting threshold, and
    * a bounded window doc-frequency keeps the self-join linear.
    */
  final case class RunParams(k: Int = 8, minRunTokens: Int = 50,
      maxWindowDocFreq: Int = 5000)

  def sharedTokenRuns(docs: DataFrame, k: Int = 8, minRunTokens: Int = 12,
      maxWindowDocFreq: Int = Int.MaxValue,
      sortOutput: Boolean = true): DataFrame = {
    require(k >= 1 && minRunTokens >= k, s"need 1 <= k <= minRunTokens")
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val w = Partitioning.spreadSmall(
        docs.select(col("doc_id").cast("long").as("id"), col("text")))
      .select(col("id"), toks.as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= k) // sequence(0, n-k) would run descending on n < k
      .select(col("id"), posexplode(
        // xxhash64, not md5_long: the hash only keys the alignment join
        // (matches ⇔ equal window text absent 2^-64 collisions; no hash
        // reaches the output), and it is ~10x cheaper per window
        transform(sequence(lit(0), col("n") - k),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
        .as(Seq("pos", "h")))
    val cut = {
      val kept =
        if (maxWindowDocFreq == Int.MaxValue) w
        else {
          val hot = w.groupBy("h").agg(countDistinct("id").as("df"))
            .filter(col("df") > maxWindowDocFreq).select("h")
          w.join(hot, Seq("h"), "left_anti")
        }
      // persisted: BOTH sides of the self-join read the window hashes and
      // Catalyst does not dedupe identical subtrees — without this the
      // tokenize + md5-per-window pass runs twice (the ngramJaccardPairs
      // `exploded` convention; 24-byte rows, O(total tokens), and the
      // same caller-owned cache lifetime documented on Dedup)
      kept.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val a = cut.select(col("h"), col("id").as("doc_a"), col("pos").as("pa"))
    val b = cut.select(col("h"), col("id").as("doc_b"), col("pos").as("pb"))
    val hits = a.join(b, "h").filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    val islands = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    val runs = hits.withColumn("grp", col("pa") - row_number().over(islands))
      .groupBy("doc_a", "doc_b", "diag", "grp")
      .agg(min(col("pa")).cast("long").as("start_a"),
        min(col("pb")).cast("long").as("start_b"),
        (count(lit(1)) + (k - 1)).as("run_tokens"))
      .filter(col("run_tokens") >= minRunTokens)
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("run_tokens"))
    if (sortOutput)
      runs.orderBy(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"))
    else runs
  }
}
