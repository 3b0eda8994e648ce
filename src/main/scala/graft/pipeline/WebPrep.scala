package graft.pipeline

import graft.html.HtmlExtract
import graft.ops.Web
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The web-ingest counterpart of [[CorpusPrep]]: raw fetched pages
  * `(doc_id, html, url)` -> deduplicated, robots-respecting extracted
  * documents, in the order a crawl pipeline wants them:
  *
  *  1. ONE-pass extraction (`HtmlExtract.extractAll`): main-content
  *     spans + text, resolved out-links, page metadata — map-only;
  *  2. robots gate: pages whose meta robots declares `noindex` are
  *     dropped BEFORE any shuffle spends cycles on them (the crawl
  *     contract: such pages may be fetched for link discovery but must
  *     not enter a corpus);
  *  3. canonical-priority URL dedup: the dedup key is the page's own
  *     rel=canonical (already resolved absolute) when declared, else the
  *     fetch URL — both through `Web.canonicalUrl` — so mirror fetches
  *     (`/amp/…`, `?utm=…`, scheme/case variants) of one logical page
  *     collapse to the deterministic keeper (min doc_id), exactly the
  *     dedup a frontier cannot do because only the PAGE declares its
  *     canonical.
  *
  * Output: the kept WebDoc rows plus their `dedup_url`. Downstream,
  * content-level dedup and quality filtering continue in
  * [[CorpusPrep]] over (doc_id, text).
  *
  * Scale shape: stage 1-2 are map-only; stage 3 is one group + join-back
  * on the canonical key, the same shape as `Web.urlDedup` — at 100 TB
  * pre-hash the key with md5_long (`Web.urlDedupAtScale`'s layout) if
  * URL strings dominate the shuffle; out-links for the frontier should
  * be projected out BEFORE the dedup shuffle (they are the widest
  * column), which `frontier()` below does.
  */
object WebPrep {

  /** Extract + robots gate + canonical-priority dedup (see object doc). */
  def prepare(pages: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html", urlCol: String = "url",
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val docs = HtmlExtract
      .extractAll(pages, idCol, htmlCol, Some(urlCol), failedAcc).toDF()
    val live = docs.filter(!col("robots").contains("noindex"))
    // frontier links are the widest column: drop them before the shuffle,
    // join back only for the kept rows
    val keyed = live
      .withColumn("dedup_url", Web.canonicalUrl(
        when(col("canonical") =!= "", col("canonical")).otherwise(col("url"))))
    val keepers = keyed.select(col("doc_id"), col("dedup_url"))
      .groupBy(col("dedup_url")).agg(min(col("doc_id")).as("keeper"))
    keyed.join(keepers, Seq("dedup_url"))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper")
  }

  /** The crawl-frontier feed from the same pages: every out-link of
    * every NON-noindex page (nofollow-all pages are also excluded),
    * canonicalized and deduplicated — (url, first_seen_doc) rows ready
    * to diff against the already-fetched set. Mirrors prepare()'s
    * one-pass extraction; run either, or both on the same extractAll
    * output if executing them together.
    */
  def frontier(pages: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html", urlCol: String = "url"): DataFrame = {
    val docs = HtmlExtract
      .extractAll(pages, idCol, htmlCol, Some(urlCol)).toDF()
    docs.filter(!col("robots").contains("noindex") &&
        !col("robots").contains("nofollow"))
      .select(col("doc_id"), explode(col("links")).as("l"))
      .select(col("doc_id"), Web.canonicalUrl(col("l.resolved")).as("url"))
      .groupBy(col("url")).agg(min(col("doc_id")).as("first_seen_doc"))
  }
}
