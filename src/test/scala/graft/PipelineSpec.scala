package graft

import graft.ops.{Corpus, Dedup}
import graft.pipeline.CorpusPrep
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CorpusPrep: each stage drops exactly its designed victim, survivors
  * keep the original schema, and the composition is deterministic.
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipelinespec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  import scala.collection.immutable.Seq

  // 50 distinct letter-only words + 10 stopwords = 60 "good" tokens
  private val words: Seq[String] =
    (for (a <- 'a' to 'j'; b <- 'a' to 'e') yield s"$a${b}word").toList
  private val words2: Seq[String] =
    (for (a <- 'k' to 't'; b <- 'a' to 'e') yield s"$a${b}word").toList
  private val words3: Seq[String] =
    (for (a <- 'a' to 'j'; b <- 'f' to 'j') yield s"$a${b}other").toList
  private val stops = Seq("the", "and", "of", "to", "in",
    "is", "that", "for", "with", "was")

  private def mk(toks: Seq[String]) = toks.mkString(" ")

  private val doc1 = mk(words ++ stops)
  private val doc2 = (words ++ stops).mkString("  ") // exact dup modulo ws
  private val doc3 = mk(words.dropRight(10) ++ words2.take(10) ++ stops) // near dup of doc1
  private val doc4 = "tiny low quality"
  private val doc5 = mk(words3.take(46) ++ stops ++
    Seq("secret", "bench", "mark", "phrase")) // shares a 4-gram with eval
  private val doc6 = mk(words2 ++ stops) // clean, near-dups doc5? checked below
  private val evalText = mk(Seq("secret", "bench", "mark", "phrase") ++
    (for (a <- 'u' to 'z'; b <- 'a' to 'e') yield s"$a${b}filler").toList)

  private def corpus = {
    val sp = spark
    import sp.implicits._
    Seq((1L, doc1, "en"), (2L, doc2, "en"), (3L, doc3, "en"),
      (4L, doc4, "en"), (5L, doc5, "en"), (6L, doc6, "en"))
      .toDF("doc_id", "text", "lang")
  }

  private def evalDf = {
    val sp = spark
    import sp.implicits._
    Seq((100L, evalText, "en")).toDF("doc_id", "text", "lang")
  }

  private val cfg = CorpusPrep.PrepConfig(
    nearDedup = Some(Dedup.MinHashParams(bands = 32, jaccardThreshold = 0.5)),
    decontaminateN = 4)

  test("stage-by-stage: quality, exact-dup, near-dup, contamination each drop their doc") {
    // doc5/doc6 share 46 tokens of 60 but doc6's trigram overlap with
    // doc5 stays below 0.5 (suffixes differ) — sanity-pin that first so
    // the near-dup assertion below is meaningful
    val j56 = {
      val a = Dedup.shingles(doc5.toLowerCase, 3)
      val b = Dedup.shingles(doc6.toLowerCase, 3)
      a.intersect(b).size.toDouble / a.union(b).size
    }
    assert(j56 < 0.5, s"fixture broken: j(doc5,doc6)=$j56")

    val audit = CorpusPrep.audit(corpus, Some(evalDf), cfg).toMap
    assert(audit("input") == 6)
    assert(audit("quality") == 5)        // doc4 out (3 tokens)
    assert(audit("exact_dedup") == 4)    // doc2 out (dup of doc1)
    assert(audit("near_dedup") == 3)     // doc3 out (J(doc1,doc3) >= 0.5)
    assert(audit("decontaminate") == 2)  // doc5 out (shared 4-gram)

    val out = CorpusPrep.prepare(corpus, Some(evalDf), cfg)
    val ids = out.select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 6L))
    // original schema preserved
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang"))
  }

  test("prepareAudited: recall audit row emitted with the prod near-dedup config") {
    // sampleRate 1.0 -> the audit's exact layer sees the whole (tiny)
    // corpus; with the prod-shaped MinHash config every exact pair must be
    // found (recall 1.0), and survivors must equal prepare()'s
    val (out, auditRow) = CorpusPrep.prepareAudited(
      corpus, Some(evalDf), cfg, auditSampleRate = 1.0, minRecall = 1.0)
    val row = auditRow.head()
    assert(row.getAs[Long]("sampled_rows") == 4L) // post quality+exact-dedup
    assert(row.getAs[Long]("exact_pairs") >= 1L)  // (doc1, doc3)
    assert(row.getAs[Double]("recall") == 1.0)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 6L))
    // no near-dedup configured -> loud failure, not a silent no-audit
    intercept[IllegalArgumentException] {
      CorpusPrep.prepareAudited(corpus, None,
        CorpusPrep.PrepConfig(nearDedup = None))
    }
  }

  test("sampling stage engages and is deterministic") {
    val sp = spark
    import sp.implicits._
    val many = (1L to 400L)
      .map(i => (i, mk(words ++ stops.map(s => s + i)), "en"))
      .toDF("doc_id", "text", "lang")
    val c = CorpusPrep.PrepConfig(
      quality = None, exactDedup = false, nearDedup = None,
      sampleDefaultRate = 0.5, sampleSalt = "pipe-test")
    val n1 = CorpusPrep.prepare(many, None, c).count()
    val n2 = CorpusPrep.prepare(many, None, c).count()
    assert(n1 == n2)
    assert(math.abs(n1 - 200L) < 40, s"got $n1 of 400 at rate 0.5")
  }

  test("pii_redact and substring_dedup stages engage in order") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    // doc 10 quotes a 12-token passage from doc 9 inside otherwise-unique
    // text: whole-doc similarity is low, only the containment layer sees it
    val passage = (1 to 12).map(i => s"quoted$i").mkString(" ")
    val docs = Seq(
      (9L, mk(words ++ stops) + " " + passage + " contact a@b.co", "en"),
      (10L, mk(words2 ++ stops) + " " + passage, "en"),
      (11L, mk(words3.take(50) ++ stops), "en"))
      .toDF("doc_id", "text", "lang")
    val c = CorpusPrep.PrepConfig(
      piiRedact = true,
      quality = Some(Corpus.GopherThresholds(minTokens = 5,
        minStopwordRatio = 0.0, minAlphaRatio = 0.0,
        maxDupWordRatio = 1.0, maxDup2GramRatio = 1.0)),
      exactDedup = false, nearDedup = None,
      substringDedup = Some(graft.ops.SubstringDedup.RunParams(
        k = 8, minRunTokens = 12, maxWindowDocFreq = Int.MaxValue)))
    val stages = CorpusPrep.stages(docs, None, c).toMap
    // redaction runs FIRST, so every later stage sees the clean text
    val redacted = stages("pii_redact").filter(col("doc_id") === 9L)
      .select("text").collect().head.getString(0)
    assert(redacted.contains("<EMAIL>") && !redacted.contains("a@b.co"))
    // the containment layer drops the higher-id quoting doc only
    val ids = CorpusPrep.prepare(docs, None, c)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(9L, 11L))
  }

  test("decontamination sees redacted text on BOTH sides when piiRedact is on") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    // the contaminated passage CONTAINS an email: if only the training
    // side were redacted, no 4-gram spanning the address would match the
    // raw eval text and the leak would go undetected
    val passage = "contact us at support@example.com for benchmark answers"
    val train = Seq(
      (1L, mk(words ++ stops) + " " + passage, "en"),
      (2L, mk(words2 ++ stops), "en")).toDF("doc_id", "text", "lang")
    val eval = Seq((100L, passage + " " + mk(words3.take(20)), "en"))
      .toDF("doc_id", "text", "lang")
    val c = CorpusPrep.PrepConfig(
      piiRedact = true,
      quality = Some(Corpus.GopherThresholds(minTokens = 5,
        minStopwordRatio = 0.0, minAlphaRatio = 0.0,
        maxDupWordRatio = 1.0, maxDup2GramRatio = 1.0)),
      exactDedup = false, nearDedup = None, decontaminateN = 4)
    val ids = CorpusPrep.prepare(train, Some(eval), c)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(2L), s"contaminated doc 1 must be dropped, got $ids")
  }

  test("extraction output feeds CorpusPrep directly (one-library path)") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(sp)
    val docs = sp.createDataset(graft.fixtures.Fixtures.corpus(24, seed = 7L))
    val extracted = graft.streaming.StreamingExtract.transform(docs.toDF()).toDF()
      // the dedup stages key on a numeric 64-bit doc id; string-keyed
      // corpora derive a surrogate via md5_long (collision odds n^2/2^64)
      .withColumn("doc_id",
        org.apache.spark.sql.functions.call_function("md5_long", col("doc_id")))
    val base = extracted.select(col("doc_id"), col("text"))
    assert(base.select("text").distinct().count() == 24) // fixture sanity
    // plant exact duplicates under fresh (negative) ids: the exact-dedup
    // stage must collapse each planted/original pair to one survivor
    val planted = base
      .filter(org.apache.spark.sql.functions.pmod(col("doc_id"),
        org.apache.spark.sql.functions.lit(5)) === 0)
      .withColumn("doc_id", -col("doc_id"))
    val nPlanted = planted.count()
    assert(nPlanted > 0)
    val prep = CorpusPrep.PrepConfig(
      quality = Some(Corpus.GopherThresholds(minTokens = 5,
        minStopwordRatio = 0.0, minAlphaRatio = 0.0,
        maxDupWordRatio = 1.0, maxDup2GramRatio = 1.0)),
      nearDedup = Some(Dedup.MinHashParams(bands = 32, jaccardThreshold = 0.95)))
    val out = CorpusPrep.prepare(base.unionByName(planted), None, prep)
    assert(out.count() == 24, s"expected 24 survivors of ${24 + nPlanted}")
    assert(out.columns.toSeq == Seq("doc_id", "text"))
  }

  test("web pages feed CorpusPrep directly (html -> extract -> prep one-library path)") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{call_function, col, lit}
    // a cloned page (identical extracted text under a new id) must fall
    // to the dedup stages; the md5_long surrogate key is the documented
    // string-corpus recipe from the CorpusPrep scaladoc
    graft.functions.GraftFunctions.register(sp)
    val base = graft.fixtures.HtmlFixtures.corpus(6)
    val pages = (base :+ ("web-dup", base.head._2.replace("web-00000", "web-dup")))
      .toDF("doc_id", "html")
    val docs = graft.html.HtmlExtract.extract(pages).toDF()
      .select(col("doc_id").as("doc_id_str"), col("text"))
      .withColumn("doc_id", call_function("md5_long", col("doc_id_str")))
      .withColumn("lang", lit("de"))
      .select("doc_id", "text", "lang")
    // quality off: the synthetic fixture vocabulary is stopword-free by
    // design, which the Gopher gate (correctly) rejects — this case pins
    // the html -> extract -> dedup composition, not the quality rule
    val out = CorpusPrep.prepare(docs, None, CorpusPrep.PrepConfig(
      quality = None,
      nearDedup = Some(Dedup.MinHashParams(bands = 32, jaccardThreshold = 0.5))))
    val n = out.count()
    assert(n == 6, s"expected the near-dup page dropped, got $n of 7")
  }

  test("full raw-web path: WebPrep (url dedup) -> CorpusPrep (content dedup) compose") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{call_function, col, lit}
    graft.functions.GraftFunctions.register(sp)
    val base = graft.fixtures.HtmlFixtures.corpus(6)
    // three duplicate classes: (1) a mirror FETCH of page 0 under a new
    // url — caught by WebPrep's canonical dedup (same absolute canonical,
    // seed 43 => not the relative-canonical subset); (2) a content CLONE
    // of page 1 under its own id+canonical — passes url dedup, caught by
    // CorpusPrep's near-dedup; (3) four distinct pages
    val (id1, html1) = base(1)
    val pages = (base.map { case (id, h) =>
      (s"$id-a", h, s"https://fetch.example/seite/$id") } ++ Seq(
      (s"${base.head._1}-mirror", base.head._2,
        s"https://m.fetch.example/amp/${base.head._1}"),
      ("clone-b", html1.replace(id1, "clone-b"),
        "https://fetch.example/seite/clone-b")))
      .toDF("doc_id", "html", "url")
    val kept = graft.pipeline.WebPrep.prepare(pages)
    val docs = kept
      .select(col("doc_id").as("doc_id_str"), col("text"))
      .withColumn("doc_id", call_function("md5_long", col("doc_id_str")))
      .withColumn("lang", lit("de"))
      .select("doc_id", "text", "lang")
    val out = CorpusPrep.prepare(docs, None, CorpusPrep.PrepConfig(
      quality = None,
      nearDedup = Some(Dedup.MinHashParams(bands = 32, jaccardThreshold = 0.5))))
    // WebPrep: the noindex seed page (web-00003, seed 45) is gated out
    // (8 -> 7). Page 0 (seed 42) declares a RELATIVE canonical, which
    // resolves per-fetch-host, so its mirror does NOT merge at the URL
    // layer — but its content is identical, so CorpusPrep's dedup
    // removes it; the clone falls to near-dedup: 5 survive
    val nKept = kept.count()
    assert(nKept == 7, s"webprep kept $nKept")
    val n = out.count()
    assert(n == 5, s"expected 5 survivors, got $n")
    // the keeper choice is deterministic: a second run keeps the SAME ids
    val ids1 = kept.select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    val ids2 = graft.pipeline.WebPrep.prepare(pages)
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("WebPrep: robots gate, canonical mirror-collapse, frontier feed") {
    val sp = spark
    import sp.implicits._
    val canonical = """<link rel="canonical" href="https://site.example/artikel/a1">"""
    val body = "<p>" + ("inhalt mit vielen langen worten immer weiter so " * 4) +
      """<a href="neu/seite">weiter</a></p>"""
    val pages = Seq(
      // one logical page fetched twice (desktop + tracking variant):
      // the declared canonical must collapse them to ONE keeper
      ("a-desktop", s"<head>$canonical</head><body>$body</body>",
        "https://site.example/artikel/a1"),
      ("b-mirror", s"<head>$canonical</head><body>$body</body>",
        "https://m.site.example/amp/a1?utm_source=amp"),
      // noindex page: dropped entirely, its links excluded from frontier
      ("c-noindex", "<head><meta name=\"robots\" content=\"noindex\">" +
        s"</head><body>$body</body>", "https://other.example/x"),
      // no canonical: fetch URL (canonicalized) is the dedup key
      ("d-plain", s"<body>$body</body>", "http://Plain.example/P?utm_medium=m"))
      .toDF("doc_id", "html", "url")
    val out = graft.pipeline.WebPrep.prepare(pages).collect()
      .map(r => r.getAs[String]("doc_id") -> r.getAs[String]("dedup_url")).toMap
    assert(out == Map(
      "a-desktop" -> "https://site.example/artikel/a1", // min doc_id keeper
      "d-plain" -> "https://plain.example/P"), out)
    // frontier: noindex pages still contribute links (noindex forbids
    // indexing, not link-following); only nofollow would gate them;
    // links are resolved + canonicalized + first-seen deduplicated
    val fr = graft.pipeline.WebPrep.frontier(pages).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fr == Map(
      "https://site.example/artikel/neu/seite" -> "a-desktop",
      "https://m.site.example/amp/neu/seite" -> "b-mirror",
      "https://other.example/neu/seite" -> "c-noindex",
      "https://plain.example/neu/seite" -> "d-plain"), fr)
    // nofollow DOES gate the frontier
    val nf = Seq(("e", "<head><meta name=\"robots\" content=\"nofollow\"></head>" +
      "<body><p><a href=\"/x\">l</a></p></body>", "https://nf.example/"))
      .toDF("doc_id", "html", "url")
    assert(graft.pipeline.WebPrep.frontier(nf).collect().isEmpty)
    // robots "none" == noindex,nofollow: gated from BOTH surfaces; and a
    // permissive first tag does not shadow a later restrictive one
    // (multiple robots metas union - most restrictive wins)
    val none = Seq(
      ("f1", "<head><meta name=\"robots\" content=\"none\"></head>" +
        s"<body>$body</body>", "https://n1.example/"),
      ("f2", "<head><meta name=\"robots\" content=\"all\">" +
        "<meta name=\"robots\" content=\"noindex\"></head>" +
        s"<body>$body</body>", "https://n2.example/"))
      .toDF("doc_id", "html", "url")
    assert(graft.pipeline.WebPrep.prepare(none).collect().isEmpty)
    assert(graft.pipeline.WebPrep.frontier(none).collect()
      .map(_.getString(1)).toSeq == Seq("f2")) // f2: noindex but not nofollow
    // shared-extraction variants == the all-in-one entry points
    val docs = graft.html.HtmlExtract.extractAll(pages, pageUrlCol = Some("url")).toDF()
    assert(graft.pipeline.WebPrep.prepareExtracted(docs).collect()
      .map(r => r.getAs[String]("doc_id")).sorted.toSeq ==
      Seq("a-desktop", "d-plain"))
    assert(graft.pipeline.WebPrep.frontierExtracted(docs).collect()
      .map(_.getString(0)).sorted.toSeq == fr.keys.toSeq.sorted)
    // a null-url row with no canonical stays its own keeper (never
    // silently vanishes through null-unsafe join equality)
    val nullUrl = Seq(("n1", s"<body>$body</body>", null: String))
      .toDF("doc_id", "html", "url")
    val kept = graft.pipeline.WebPrep.prepare(nullUrl).collect()
    assert(kept.length == 1 && kept.head.getAs[String]("doc_id") == "n1")
    assert(kept.head.getAs[String]("dedup_url") == null)
    // two sites declaring the SAME relative canonical with unknown fetch
    // urls must NOT merge (host-ambiguous key refuses to anchor a merge)
    val relCanon = Seq(
      ("r1", "<head><link rel=\"canonical\" href=\"/index\"></head>" +
        s"<body>$body</body>", null: String),
      ("r2", "<head><link rel=\"canonical\" href=\"/index\"></head>" +
        s"<body>$body</body>", null: String)).toDF("doc_id", "html", "url")
    assert(graft.pipeline.WebPrep.prepare(relCanon).collect().length == 2)
    // EXTERNAL extracted frames may carry NULL robots (extractAll always
    // emits ""); null must read as 'no directives', not silently drop the
    // page from corpus and frontier
    val extNull = docs.withColumn("robots",
      org.apache.spark.sql.functions.lit(null).cast("string"))
    assert(graft.pipeline.WebPrep.prepareExtracted(extNull).collect()
      .map(r => r.getAs[String]("doc_id")).sorted.toSeq ==
      Seq("a-desktop", "c-noindex", "d-plain")) // noindex info lost with robots=null
    assert(graft.pipeline.WebPrep.frontierExtracted(extNull).collect()
      .map(_.getString(0)).sorted.toSeq == fr.keys.toSeq.sorted)
  }

  test("frontierGated: per-host robots.txt gates the frontier before fetch") {
    val sp = spark
    import sp.implicits._
    val frontier = Seq(
      ("https://site.example/artikel/a1", "d1"),
      ("https://site.example/artikel/frei", "d1"),
      ("https://site.example/impressum", "d2"),
      ("https://User:Pw@site.example/artikel/a2", "d2"), // userinfo: same host
      ("https://offen.example/alles", "d3"))             // host w/o robots row
      .toDF("url", "first_seen_doc")
    val robots = Seq(
      // crawler-specific group: /artikel/* closed except /artikel/frei;
      // the * group (deny all) must NOT leak onto graftbot
      ("Site.Example", "User-Agent: graftbot\nDisallow: /artikel/*\n" +
        "Allow: /artikel/frei\nUser-Agent: *\nDisallow: /\n"),
      ("unrelated.example", "User-Agent: *\nDisallow: /\n"))
      .toDF("host", "robots_txt")
    val kept = graft.pipeline.WebPrep
      .frontierGated(frontier, robots, userAgent = "graftbot/2.0")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(kept == Seq("https://offen.example/alles",
      "https://site.example/artikel/frei",
      "https://site.example/impressum"), kept)
    // columns pass through unchanged
    assert(graft.pipeline.WebPrep.frontierGated(frontier, robots)
      .columns.toSeq == Seq("url", "first_seen_doc"))
  }

  test("duplicate robots host rows collapse to one: no frontier duplication in gate or plan") {
    val sp = spark
    import sp.implicits._
    val frontier = Seq(
      ("https://dup.example/a", "d1"),
      ("https://dup.example/b", "d1"),
      ("https://dup.example/blocked/c", "d2"))
      .toDF("url", "first_seen_doc")
    // a real fetch log easily yields several rows per host — including a
    // null capture shadowed by the real one; neither may duplicate URLs
    val robots = Seq(
      ("dup.example", null: String),
      ("dup.example", "User-Agent: *\nDisallow: /blocked/\nCrawl-delay: 2\n"),
      ("DUP.example:443", "User-Agent: *\nDisallow: /blocked/\nCrawl-delay: 2\n"))
      .toDF("host", "robots_txt")
    val gated = graft.pipeline.WebPrep.frontierGated(frontier, robots)
      .collect().map(_.getString(0)).toSeq
    // exactly one row per kept url (no join fan-out), the gate applied
    assert(gated.sorted == Seq("https://dup.example/a", "https://dup.example/b"))
    val plan = graft.pipeline.WebPrep.fetchSchedule(frontier, robots)
      .collect()
    assert(plan.length == 3) // one plan row per url, not 3x
    assert(plan.map(_.getAs[Int]("fetch_seq")).sorted.toSeq == Seq(1, 2, 3))
    assert(plan.forall(_.getAs[Double]("delay_s") == 2.0)) // real row wins over null
  }

  test("frontierNew: frontier minus the fetched set (canonicalized anti-join)") {
    val sp = spark
    import sp.implicits._
    val frontier = Seq(
      ("https://site.example/a", "d1"),
      ("https://site.example/b", "d2"),
      (null.asInstanceOf[String], "d3")) // null url survives the anti join
      .toDF("url", "first_seen_doc")
    // fetched log arrives UN-canonicalized: variants of /a must still diff
    val fetched = Seq("http://Site.Example/a?utm_source=x").toDF("url")
    val out = graft.pipeline.WebPrep.frontierNew(frontier, fetched)
      .collect().map(r => Option(r.getString(0)).orNull).toSeq
    assert(out.toSet == Set("https://site.example/b", null), out)
  }

  test("fetchSchedule: per-host sequencing under Crawl-delay, default pacing, horizon cap") {
    val sp = spark
    import sp.implicits._
    val frontier = Seq(
      ("https://slow.example/a", "d1"),
      ("https://slow.example/b", "d2"),
      ("https://slow.example/c", "d3"),
      ("https://fast.example/p", "d4"),
      ("https://fast.example/q", "d5"),
      (null.asInstanceOf[String], "d6")) // nothing to fetch: dropped
      .toDF("url", "first_seen_doc")
    val robots = Seq(
      ("Slow.Example", "User-Agent: *\nCrawl-delay: 30\nDisallow: /x\n"),
      ("fast.example", "User-Agent: *\nDisallow: /x\n")) // no delay declared
      .toDF("host", "robots_txt")
    val out = graft.pipeline.WebPrep
      .fetchSchedule(frontier, robots, defaultDelaySeconds = 1.0)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[String]("url"),
        r.getAs[Double]("delay_s"), r.getAs[Int]("fetch_seq"),
        r.getAs[Double]("not_before_s"))).sortBy(t => (t._1, t._4)).toSeq
    assert(out == Seq(
      ("fast.example", "https://fast.example/p", 1.0, 1, 0.0),
      ("fast.example", "https://fast.example/q", 1.0, 2, 1.0),
      ("slow.example", "https://slow.example/a", 30.0, 1, 0.0),
      ("slow.example", "https://slow.example/b", 30.0, 2, 30.0),
      ("slow.example", "https://slow.example/c", 30.0, 3, 60.0)), out)
    // horizon cap: maxPerHost bounds each host's plan, keeping the
    // FIRST urls in fetch order; two-phase salted top-k == naive top-k
    val capped = graft.pipeline.WebPrep
      .fetchSchedule(frontier, robots, maxPerHost = 2, saltParts = 4)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[String]("url")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(capped == Seq(
      ("fast.example", "https://fast.example/p"),
      ("fast.example", "https://fast.example/q"),
      ("slow.example", "https://slow.example/a"),
      ("slow.example", "https://slow.example/b")), capped)
    // frontier columns pass through
    assert(graft.pipeline.WebPrep.fetchSchedule(frontier, robots)
      .columns.toSet == Set("host", "url", "first_seen_doc",
        "delay_s", "fetch_seq", "not_before_s"))
  }

  test("frontierRanked + priority schedule: in-degree ordering, horizon cap keeps the top") {
    val sp = spark
    import sp.implicits._
    // edges: /hot referenced by 3 docs (one twice: OPIC counts edges),
    // /warm by 2, /cold by 1; a scheme/case variant must merge
    val edges = Seq(
      (1L, "https://r.example/hot"), (1L, "https://r.example/hot"),
      (2L, "HTTP://R.Example/hot"), (3L, "https://r.example/hot"),
      (1L, "https://r.example/warm"), (2L, "https://r.example/warm"),
      (3L, "https://r.example/cold"))
      .toDF("doc_id", "url")
    val f = graft.pipeline.WebPrep.frontierRanked(edges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(f == Set(
      ("https://r.example/hot", 4L, 1L),
      ("https://r.example/warm", 2L, 1L),
      ("https://r.example/cold", 1L, 3L)), f)
    // priority scheduling: hot first, cap=2 drops the LOWEST in-degree
    val robots = Seq(("r.example", "User-Agent: *\nCrawl-delay: 3\n"))
      .toDF("host", "robots_txt")
    val plan = graft.pipeline.WebPrep.fetchSchedule(
        graft.pipeline.WebPrep.frontierRanked(edges), robots,
        maxPerHost = 2, priorityCol = Some("in_degree"))
      .orderBy(org.apache.spark.sql.functions.col("fetch_seq")).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Int]("fetch_seq"),
        r.getAs[Double]("not_before_s"))).toSeq
    assert(plan == Seq(
      ("https://r.example/hot", 1, 0.0),
      ("https://r.example/warm", 2, 3.0)), plan)
  }

  test("frontierStale: sitemap lastmod newer than the last fetch marks recrawl candidates") {
    val sp = spark
    import sp.implicits._
    val seeds = Seq(
      ("https://s.example/a", "2026-03-01T00:00:00Z"),  // newer than fetch: stale
      ("https://s.example/b", "2026-01-01T00:00:00Z"),  // older: fresh
      ("https://s.example/c", "2026-03-01T00:00:00Z"),  // never fetched: not here (frontierNew's job)
      ("https://s.example/d", ""))                       // no lastmod: never stale
      .toDF("url", "lastmod")
    // fetched log arrives un-canonicalized and with multiple captures:
    // the LATEST fetch is the comparison point
    val fetched = Seq(
      ("http://S.Example/a?utm_source=x", "2026-02-01T00:00:00Z"),
      ("https://s.example/b", "2026-02-01T00:00:00Z"),
      ("https://s.example/b", "2025-12-01T00:00:00Z"), // stale old capture, superseded
      ("https://s.example/d", "2026-02-01T00:00:00Z"))
      .toDF("url", "fetch_ts")
    val out = graft.pipeline.WebPrep.frontierStale(seeds, fetched)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(out == Seq(("https://s.example/a",
      "2026-03-01T00:00:00Z", "2026-02-01T00:00:00Z")), out)
    // a TimestampType fetch ts renders in the SAME W3C form before the
    // string compare — a bare cast's 'yyyy-MM-dd HH:mm:ss' (' ' < 'T')
    // would make every same-day lastmod read newer and re-queue the page
    val fetchedTs = Seq(
      ("https://s.example/a", java.sql.Timestamp.from(
        java.time.Instant.parse("2026-02-01T00:00:00Z"))),
      ("https://s.example/b", java.sql.Timestamp.from(
        java.time.Instant.parse("2026-02-01T00:00:00Z"))))
      .toDF("url", "fetch_ts")
    val sameDaySeeds = Seq(
      ("https://s.example/a", "2026-03-01T00:00:00Z"),  // genuinely newer
      ("https://s.example/b", "2026-02-01T00:00:00Z"))  // SAME instant: not stale
      .toDF("url", "lastmod")
    val outTs = graft.pipeline.WebPrep.frontierStale(sameDaySeeds, fetchedTs)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(outTs == Seq(("https://s.example/a", "2026-02-01T00:00:00Z")), outTs)
  }

  test("stages without eval corpus or sampling: no such stage entries") {
    val names = CorpusPrep.stages(corpus, None,
      CorpusPrep.PrepConfig(sampleDefaultRate = 1.0)).map(_._1)
    assert(names == Seq("input", "quality", "exact_dedup", "near_dedup"))
  }

  // ---------- recrawlSchedule ----------

  private def recrawlRow(rows: Seq[(String, Long, String)], minI: Long = 100L,
      maxI: Long = 100000L) = {
    val sp = spark
    import sp.implicits._
    graft.pipeline.WebPrep
      .recrawlSchedule(rows.toDF("url", "fetch_ts", "digest"),
        minIntervalS = minI, maxIntervalS = maxI)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("recrawlSchedule: estimator matches the hand-computed Cho-GM value, clamps both ways") {
    // 3 intervals of 1000 s, every one changed: lambda = ln(7)/1000,
    // 1/lambda ~ 513.9 -> floor 513, inside [100, 100000]
    val everyChange = (0 to 3).map(i =>
      ("https://cg.example/a", 1000L * i, s"d$i"))
    // same cadence, one change: lambda = ln(3.5/2.5)/1000 -> 1/lambda ~ 2972
    val oneChange = (0 to 3).map(i =>
      ("https://cg.example/b", 1000L * i, if (i < 2) "x" else "y"))
    val out = recrawlRow(everyChange ++ oneChange)
    val a = out("https://cg.example/a")
    assert(a.getAs[Long]("n_captures") == 4L &&
      a.getAs[Long]("n_changes") == 3L)
    assert(a.getAs[Long]("next_interval_s") ==
      math.floor(1.0 / (math.log(7.0) / 1000.0)).toLong) // 513
    assert(a.getAs[Long]("next_fetch_epoch") == 3000L + 513L)
    assert(math.abs(a.getAs[Double]("change_rate_per_day") -
      BigDecimal(math.log(7.0) / 1000.0 * 86400.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val b = out("https://cg.example/b")
    assert(b.getAs[Long]("n_changes") == 1L)
    assert(b.getAs[Long]("next_interval_s") ==
      math.floor(1000.0 / math.log(3.5 / 2.5)).toLong) // 2972
    // min clamp: same change pattern, 10 s cadence -> 1/lambda ~ 5.1 -> 100
    val fast = (0 to 3).map(i => ("https://cg.example/f", 10L * i, s"d$i"))
    assert(recrawlRow(fast)("https://cg.example/f")
      .getAs[Long]("next_interval_s") == 100L)
  }

  test("recrawlSchedule: slow lanes — never-changed and single-capture urls park at maxInterval") {
    val rows = (0 to 3).map(i => ("https://cg.example/static", 1000L * i, "same")) ++
      Seq(("https://cg.example/solo", 5000L, "one"))
    val out = recrawlRow(rows)
    val s = out("https://cg.example/static")
    assert(s.getAs[Double]("change_rate_per_day") == 0.0)
    assert(s.getAs[Long]("next_interval_s") == 100000L)
    val solo = out("https://cg.example/solo")
    assert(solo.isNullAt(solo.fieldIndex("change_rate_per_day")))
    assert(solo.getAs[Long]("next_interval_s") == 100000L)
    assert(solo.getAs[Long]("next_fetch_epoch") == 105000L)
  }

  test("recrawlSchedule: capture series merge across url spellings; null digests compare null-safely") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      ("https://cg.example/m", 0L, "x"),
      ("HTTP://CG.Example:80/m?utm_source=t", 1000L, "x"), // variant, unchanged
      ("https://cg.example/m", 2000L, null),               // value -> null: change
      ("https://cg.example/m", 3000L, null))               // null -> null: unchanged
      .toDF("url", "fetch_ts", "digest")
    val out = graft.pipeline.WebPrep
      .recrawlSchedule(rows, minIntervalS = 100L, maxIntervalS = 100000L)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_captures") == 4L)
    assert(out.head.getAs[Long]("n_changes") == 1L)
  }

  test("recrawlSchedule: W3C string timestamps parse offset-correctly regardless of session timezone") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      ("https://cg.example/t", "2026-01-01T00:00:00Z", "a"),
      ("https://cg.example/t", "2026-01-01T01:00:00Z", "b"))
      .toDF("url", "fetch_ts", "digest")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val r = graft.pipeline.WebPrep
        .recrawlSchedule(rows, minIntervalS = 100L, maxIntervalS = 100000L)
        .collect().head
      // 2026-01-01T01:00:00Z = 1767229200; interval 3600 s, one change:
      // lambda = ln(3)/3600 -> floor(1/lambda) = 3276
      assert(r.getAs[Long]("next_fetch_epoch") ==
        1767229200L + math.floor(3600.0 / math.log(3.0)).toLong)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("allocate: blocked host consumes no budget; caps and split compose in order") {
    val sp = spark
    import sp.implicits._
    // 3 hosts x 20 docs, ~10 tokens each; host b2 blocklisted
    val docs = (1L to 60L).map { i =>
      val host = s"h${i % 3}.test"
      (i, (1 to 10).map(j => s"w${i}x$j").mkString(" "),
        s"https://$host/p/$i")
    }.toDF("doc_id", "text", "url")
    def run(block: Set[String]) =
      graft.pipeline.CorpusPrep.allocate(docs, block,
        maxDocsPerHost = Some(15L), maxTokensPerHost = Some(120L),
        tokenBudget = 200L,
        splits = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1))
        .collect().map(r => (r.getLong(0), r.getAs[String]("split"))).toSeq
    val blocked = run(Set("h2.test"))
    val open = run(Set.empty[String])
    assert(blocked.forall { case (id, _) => id % 3 != 2 }, blocked.toString)
    // freeing h2's budget can only ADD unblocked-host docs, never drop
    // one: every unblocked doc the open run kept must survive in the
    // blocked run too (real containment — the previous form was a
    // tautology, ADVICE r7)
    assert(open.filter(_._1 % 3 != 2).map(_._1).toSet
      .subsetOf(blocked.map(_._1).toSet),
      s"open run's unblocked docs must be contained in the blocked run: " +
        s"$open vs $blocked")
    assert(blocked.map(_._1).toSet.size >= open.count(_._1 % 3 != 2),
      s"blocked run must keep at least the open run's unblocked docs: " +
        s"${blocked.map(_._1).toSet} vs $open")
    // splits valid and deterministic per the shared md5 rule
    blocked.foreach { case (id, split) =>
      val key = (graft.ops.Hashing.md5Long(s"${id}graft-alloc-v1")
        & ((1L << 60) - 1)) % 10000L
      val expect = if (key < 8000) "train"
        else if (key < 9000) "validation" else "test"
      assert(split == expect, s"doc $id")
    }
    // per-host doc cap binds: 120 tokens / 10 per doc = 12 < 15 docs
    val perHost = blocked.groupBy(_._1 % 3).view.mapValues(_.size).toMap
    assert(perHost.values.forall(_ <= 12), perHost.toString)
  }
}
