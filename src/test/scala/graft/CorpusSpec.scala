package graft

import graft.ops.{Corpus, Dsir, Hashing, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level pipeline operators: decontamination, deterministic
  * stratified sampling, Gopher-rule quality filter, n-gram DF top-k.
  */
class CorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-corpusspec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  import scala.collection.immutable.Seq

  private def docsDf(rows: Seq[(Long, String)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---------- wordGrams ----------

  test("wordGrams: distinct n-grams; short doc collapses to one gram") {
    val df = docsDf(Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y x y x y")))
    val out = df.select(col("doc_id"),
      Corpus.wordGrams(TextAnalysis.wsTokens(col("text")), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(out(1L) == Set("a b c", "b c d"))
    assert(out(2L) == Set("a b")) // shorter than n -> whole text
    assert(out(3L) == Set("x y x", "y x y")) // distinct
  }

  // ---------- decontamination ----------

  test("decontaminate: overlap counts, clean docs kept with zero") {
    val eval = docsDf(Seq((100L, "the quick brown fox jumps")))
    val train = docsDf(Seq(
      (1L, "a quick brown fox runs"), // shares "quick brown fox"
      (2L, "totally disjoint text here"),
      (3L, "the quick brown fox jumps again"))) // shares 3 grams
    val out = Corpus.decontaminate(train, eval, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 1L, true)))
    assert(out(1) == ((2L, 0L, false)))
    // doc3 grams: {the quick brown, quick brown fox, brown fox jumps,
    //              fox jumps again} -> 3 overlap with eval
    assert(out(2) == ((3L, 3L, true)))
  }

  test("decontaminate: every training doc appears exactly once") {
    val eval = docsDf(Seq((100L, "zz yy xx")))
    val train = docsDf((1L to 20L).map(i => (i, s"doc number $i words")))
    val out = Corpus.decontaminate(train, eval, n = 3)
    assert(out.count() == 20)
    assert(out.select("doc_id").distinct().count() == 20)
  }

  // ---------- stratified sampling ----------

  test("stratifiedSample: deterministic, rate-respecting, stratum-aware") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    def run() = Corpus.stratifiedSample(df, col("lang"),
      rates = Map("en" -> 0.5), defaultRate = 0.1,
      keyCol = col("doc_id"), salt = "s1")
    val a = run().select("doc_id").as[Long].collect().sorted.toSeq
    val b = run().select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b) // deterministic
    val en = run().filter(col("stratum") === "en").count().toDouble / 1000
    val de = run().filter(col("stratum") === "de").count().toDouble / 1000
    assert(math.abs(en - 0.5) < 0.08, s"en rate $en")
    assert(math.abs(de - 0.1) < 0.05, s"de rate $de")
    // a different salt draws a different sample
    val c = Corpus.stratifiedSample(df, col("lang"), Map("en" -> 0.5), 0.1,
      col("doc_id"), "s2").select("doc_id").as[Long].collect().sorted.toSeq
    assert(a != c)
  }

  test("replicatedSample: epochs by whole part + fractional hash draw; rate<=1 equals stratifiedSample") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 3000L).map(i =>
      (i, Seq("en", "de", "fr")(((i % 3).toInt)))).toDF("doc_id", "lang")
    def run() = Corpus.replicatedSample(df, col("lang"),
      rates = Map("en" -> 2.25, "de" -> 1.0), defaultRate = 0.4,
      keyCol = col("doc_id"), salt = "e1")
    val out = run().cache()
    // determinism
    assert(out.select("doc_id", "epoch").collect().toSet ==
      run().select("doc_id", "epoch").collect().toSet)
    // de (rate exactly 1): every doc exactly once, epoch 0
    val de = out.filter(col("stratum") === "de")
    assert(de.count() == 1000 && de.agg(max("epoch")).head.getLong(0) == 0L)
    // en (rate 2.25): every en doc at least twice, ~25% three times,
    // epochs contiguous from 0
    val en = out.filter(col("stratum") === "en")
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("epoch").as("mx"))
    assert(en.count() == 1000)
    assert(en.filter(col("n") < 2 || col("n") > 3).count() == 0)
    assert(en.filter(col("mx") =!= col("n") - 1).count() == 0)
    val thrice = en.filter(col("n") === 3).count().toDouble / 1000
    assert(math.abs(thrice - 0.25) < 0.06, s"en 3-epoch share $thrice")
    // fr (default 0.4 < 1): the kept set is EXACTLY stratifiedSample's
    val frGot = out.filter(col("stratum") === "fr")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val frWant = Corpus.stratifiedSample(df.filter(col("lang") === "fr"),
        col("lang"), Map.empty, 0.4, col("doc_id"), "e1")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(frGot == frWant)
    out.unpersist()
    // a fat-fingered rate fails loudly
    intercept[IllegalArgumentException] {
      Corpus.replicatedSample(df, col("lang"), Map("en" -> 1000.0), 1.0,
        col("doc_id"), "e1")
    }
    // null keyCol: dropped like stratifiedSample (a null sample_key must
    // not survive via the unconditional floor(rate) base copies)
    val withNull = df.select(
      when(col("doc_id") === 1L, lit(null)).otherwise(col("doc_id"))
        .cast("long").as("doc_id"), col("lang"))
    val nullKept = Corpus.replicatedSample(withNull, col("lang"),
        Map("en" -> 2.25, "de" -> 1.0), 0.4, col("doc_id"), "e1")
      .filter(col("doc_id").isNull).count()
    assert(nullKept == 0L)
  }

  test("splitAssign: deterministic hash carve, growth-stable, nulls drop, bad configs fail") {
    val sp = spark
    import sp.implicits._
    val splits = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1)
    val df = (1L to 5000L).toDF("doc_id")
    val out = Corpus.splitAssign(df, splits, col("doc_id"), "split-t1").cache()
    // total preservation + interval semantics: split is exactly the
    // sample_key interval, so proportions track the weights
    assert(out.count() == 5000)
    val bad = out.filter(
      (col("split") === "train" && col("sample_key") >= 8000) ||
      (col("split") === "validation" &&
        (col("sample_key") < 8000 || col("sample_key") >= 9000)) ||
      (col("split") === "test" && col("sample_key") < 9000)).count()
    assert(bad == 0)
    val shares = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / 5000).toMap
    assert(math.abs(shares("train") - 0.8) < 0.03, shares.toString)
    assert(math.abs(shares("validation") - 0.1) < 0.02, shares.toString)
    assert(math.abs(shares("test") - 0.1) < 0.02, shares.toString)
    // growth stability: assigning a SUBSET alone gives every id the same
    // split as inside the full corpus (incremental additions never
    // migrate a doc across the train/eval boundary)
    val sub = Corpus.splitAssign((1L to 1000L).toDF("doc_id"), splits,
        col("doc_id"), "split-t1")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val inFull = out.filter(col("doc_id") <= 1000)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub == inFull)
    out.unpersist()
    // null key rows drop (no id, no reproducible draw)
    val withNull = df.select(when(col("doc_id") === 3L, lit(null))
      .otherwise(col("doc_id")).cast("long").as("doc_id"))
    assert(Corpus.splitAssign(withNull, splits, col("doc_id"), "split-t1")
      .count() == 4999)
    // config validation fails loudly
    intercept[IllegalArgumentException] {
      Corpus.splitAssign(df, Seq("a" -> 0.5, "b" -> 0.4), col("doc_id"), "s")
    }
    intercept[IllegalArgumentException] {
      Corpus.splitAssign(df, Seq("a" -> 0.5, "a" -> 0.5), col("doc_id"), "s")
    }
    intercept[IllegalArgumentException] {
      Corpus.splitAssign(df, Seq("a" -> 1.2, "b" -> -0.2), col("doc_id"), "s")
    }
  }

  test("temperatureRates: alpha flattens toward the tail; budget and cap semantics") {
    // natural masses 90/9/1 (x1000 tokens)
    val mass = Map("en" -> 90000L, "de" -> 9000L, "rm" -> 1000L)
    // alpha = 1: natural mix -> every rate equal (and max-normalized to 1)
    val nat = Corpus.temperatureRates(mass, alpha = 1.0)
    assert(nat.values.forall(r => math.abs(r - 1.0) < 1e-12))
    // alpha = 0.5: rarest stratum binds at rate 1, head downsampled by
    // sqrt(mass ratio): rate_en = sqrt(1000/90000) = 1/sqrt(90)
    val t = Corpus.temperatureRates(mass, alpha = 0.5)
    assert(math.abs(t("rm") - 1.0) < 1e-12)
    assert(math.abs(t("en") - 1.0 / math.sqrt(90.0)) < 1e-12)
    assert(math.abs(t("de") - 1.0 / math.sqrt(9.0)) < 1e-12)
    // realized masses then follow q_s = sqrt(m_s)/sum(sqrt): shares of
    // (300, 94.87, 31.62) -> the tail share rises from 1% to ~7.4%
    val kept = mass.map { case (s, m) => s -> m * t(s) }
    val tailShare = kept("rm") / kept.values.sum
    assert(tailShare > 0.07 && tailShare < 0.08, s"tail share $tailShare")
    // maxRate > 1: the rarest stratum gets epochs, ratios preserved
    val up = Corpus.temperatureRates(mass, alpha = 0.5, maxRate = 3.0)
    assert(math.abs(up("rm") - 3.0) < 1e-12)
    assert(math.abs(up("en") - 3.0 / math.sqrt(90.0)) < 1e-12)
    // targetMass: rates scale to the budget, capped at maxRate
    val b = Corpus.temperatureRates(mass, alpha = 0.5,
      targetMass = Some(10000L), maxRate = 1.0)
    val realized = mass.map { case (s, m) => m * b(s) }.sum
    assert(b.values.forall(_ <= 1.0))
    assert(realized <= 10000L * 1.05) // cap can only push DOWN from target
    // zero-mass stratum -> rate 0; all-zero -> all 0
    val z = Corpus.temperatureRates(mass + ("xx" -> 0L), alpha = 0.5)
    assert(z("xx") == 0.0)
    assert(Corpus.temperatureRates(Map("a" -> 0L), 0.5).values.forall(_ == 0.0))
    // pow overflow (huge mass x large alpha) fails loudly at the input,
    // not as NaN rates poisoning a downstream require
    val boom = intercept[IllegalArgumentException] {
      Corpus.temperatureRates(Map("big" -> 1000000000000L, "sm" -> 1L),
        alpha = 30.0)
    }
    assert(boom.getMessage.contains("overflow"))
  }

  test("packDocsNextFit: matches a sequential next-fit replay; boundary invariants hold") {
    val sp = spark
    import sp.implicits._
    // token counts 1..9 words via repeat; ids chosen so hash order is
    // arbitrary; include an oversize doc (12 > seqLen 8) per shard odds
    val rows = (1L to 200L).map(i => (i, ("w " * (1 + (i % 12)).toInt).trim))
    val df = rows.toDF("doc_id", "text")
    val seqLen = 8
    val out = Corpus.packDocsNextFit(df, seqLen = seqLen, nShards = 3,
      salt = "nf1").cache()
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getInt(4), r.getBoolean(5))).toSet
    // driver-side replay of the exact rule over the same hash order
    val want = rows
      .map { case (id, text) =>
        val pkey = Hashing.md5Long(id.toString + "nf1") & 0x0FFFFFFFFFFFFFFFL
        (id, pkey, text.split("\\s+").count(_.nonEmpty).toLong, pkey % 3)
      }
      .groupBy(_._4).toSeq.flatMap { case (shard, docs) =>
        var bin = 0L; var fill = 0L; var slot = 0
        docs.sortBy(d => (d._2, d._1)).map { case (id, _, n, _) =>
          if (n > seqLen) {
            if (fill > 0) bin += 1
            val r = (id, shard, n, bin, 0, true)
            bin += 1; fill = 0; slot = 0; r
          } else {
            if (fill + n > seqLen) { bin += 1; fill = 0; slot = 0 }
            val r = (id, shard, n, bin, slot, false)
            fill += n; slot += 1; r
          }
        }
      }.toSet
    assert(got == want)
    // invariants: every doc exactly once; non-oversize bins fit seqLen;
    // oversize docs sit alone; bins dense from 0; pos contiguous
    assert(out.count() == 200)
    val byBin = out.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("toks"), count(lit(1)).as("n"),
        max(col("oversize").cast("int")).as("ov"),
        min("pos").as("p0"), max("pos").as("p1"))
    assert(byBin.filter(col("ov") === 0 && col("toks") > seqLen).count() == 0)
    assert(byBin.filter(col("ov") === 1 && col("n") =!= 1).count() == 0)
    assert(byBin.filter(col("p0") =!= 0 || col("p1") =!= col("n") - 1)
      .count() == 0)
    val dense = out.groupBy("shard").agg(max("bin").as("mx"),
      countDistinct("bin").as("nb"))
    assert(dense.filter(col("nb") =!= col("mx") + 1).count() == 0)
    out.unpersist()
  }

  test("corpusDelta: four statuses, smallest-digest keeper, null-safe compare") {
    val sp = spark
    import sp.implicits._
    val oldSnap = Seq(
      ("a", "same"), ("b", "one"), ("c", "gone"),
      ("d", "dup2"), ("d", "dup1"), // keeper = min digest of the two
      ("e", null), (null, "droppedKey")
    ).toDF("url", "text")
    val newSnap = Seq(
      ("a", "same"), ("b", "two"), ("f", "fresh"),
      ("d", "dup1"), ("d", "dup2"),
      ("e", null), (null, "droppedKey")
    ).toDF("url", "text")
    val full = Corpus.corpusDelta(oldSnap, newSnap,
      includeUnchanged = true)
    val st = full.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st == Map("a" -> "unchanged", "b" -> "changed", "c" -> "removed",
      "d" -> "unchanged", "e" -> "unchanged", "f" -> "added"))
    // default excludes unchanged — the delta is small by construction
    val slim = Corpus.corpusDelta(oldSnap, newSnap)
    assert(slim.collect().map(_.getString(0)).toSet == Set("b", "c", "f"))
    // digests carried: added has null old side, removed null new side
    val row = full.filter(col("url") === "f").collect()(0)
    assert(row.isNullAt(2) && !row.isNullAt(3))
  }

  test("sampleKey matches Hashing.md5Long recomputation") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("42", "x")).toDF("id", "junk")
    val got = df.select(Corpus.sampleKey(col("id"), "salty").as("k"))
      .collect()(0).getLong(0)
    val want = (Hashing.md5Long("42salty") & 0x0FFFFFFFFFFFFFFFL) %
      Corpus.SampleBuckets
    assert(got == want)
  }

  // ---------- quality filter ----------

  test("gopherQualityFilter: each rule fires on its designed violation") {
    val good = (1 to 60).map(i => s"word$i").mkString(" ") // 60 distinct tokens
    val tiny = "only four words here"
    val repeated = (1 to 60).map(_ => "spam spam").mkString(" ")
    val longWords = (1 to 60).map(_ => "incomprehensibilities").mkString(" ")
    val df = docsDf(Seq(
      (1L, good), (2L, tiny), (3L, repeated), (4L, longWords)))
    val out = Corpus.gopherQualityFilter(df,
      Corpus.GopherThresholds(minStopwordRatio = 0.0, minAlphaRatio = 0.0))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("passes"))
    assert(!out(2L).getAs[Boolean]("word_count_ok"))
    assert(!out(3L).getAs[Boolean]("dup_word_ok"))
    assert(!out(3L).getAs[Boolean]("dup_2gram_ok"))
    assert(!out(4L).getAs[Boolean]("mean_word_len_ok")) // 21-char words
    assert(!out(2L).getAs[Boolean]("passes"))
  }

  test("gopherQualityFilter: stopword and alpha rules") {
    val stopRich = ("the and of to in " * 12).trim   // all stopwords
    val symbols = ("@# $% ^& *! () " * 12).trim      // no letters
    val df = docsDf(Seq((1L, stopRich), (2L, symbols)))
    val out = Corpus.gopherQualityFilter(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("stopword_ok"))
    assert(out(1L).getAs[Boolean]("alpha_ok"))
    assert(!out(2L).getAs[Boolean]("stopword_ok"))
    assert(!out(2L).getAs[Boolean]("alpha_ok"))
  }

  // ---------- n-gram document frequency ----------

  // ---------- boilerplate line removal ----------

  test("removeBoilerplateLines: hot lines dropped, order kept, all-boilerplate doc becomes empty row") {
    val df = docsDf(Seq(
      (1L, "unique one\nFOOTER\nmore one"),
      (2L, "FOOTER\nunique two"),
      (3L, "unique three\nFOOTER"),
      (4L, "FOOTER"))) // nothing but boilerplate
    val out = Corpus.removeBoilerplateLines(df, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // row-count preserving: doc 4 survives as an EMPTY row, it does not
    // silently vanish from the corpus (downstream joins key on doc_id)
    assert(out == Map(
      1L -> "unique one\nmore one",
      2L -> "unique two",
      3L -> "unique three",
      4L -> ""))
    // per-doc repeats do not inflate the document frequency
    val df2 = docsDf(Seq(
      (1L, "x\nx\nx"), (2L, "y"))) // "x" df=1 (one doc), under the cut
    val out2 = Corpus.removeBoilerplateLines(df2, maxDocFreq = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(1L) == "x\nx\nx")
  }

  test("dedupParagraphsGlobal: keep-first corpus-wide, short lines pass, AtScale identical") {
    val df = docsDf(Seq(
      (1L, "erster einzigartiger absatz\nGETEILTER LANGER ABSATZ\n--"),
      (2L, "GETEILTER LANGER ABSATZ\nzweiter einzigartiger absatz\n--"),
      (3L, "--\nGETEILTER LANGER ABSATZ\nGETEILTER LANGER ABSATZ"),
      (4L, "GETEILTER LANGER ABSATZ"))) // all duplicate -> empty row
    val out = Corpus.dedupParagraphsGlobal(df, minChars = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      // doc 1 is the (doc_id, pos)-smallest occurrence: keeps it
      1L -> "erster einzigartiger absatz\nGETEILTER LANGER ABSATZ\n--",
      // later copies removed; the short "--" spacer survives everywhere
      2L -> "zweiter einzigartiger absatz\n--",
      // within-doc repeat also collapses (it is a later occurrence)
      3L -> "--",
      // row-count preserving: fully-deduplicated doc -> empty row
      4L -> ""), out)
    // the md5_long-keyed AtScale face produces the identical corpus
    val atScale = Corpus.dedupParagraphsGlobalAtScale(df, minChars = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(atScale == out)
  }

  test("dedupParagraphsGlobal == brute force keep-first on random multi-line corpora") {
    (0L until 4L).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val paras = Vector("absatz eins lang genug", "absatz zwei lang genug",
        "absatz drei lang genug", "kurz", "--", "absatz vier lang genug")
      val rows = (1L to 12L).map { i =>
        val n = 1 + rng.nextInt(4)
        (i, Seq.fill(n)(paras(rng.nextInt(paras.size))).mkString("\n"))
      }
      val minChars = 10
      // brute force: scan docs in (doc_id, pos) order, keep first
      val seen = scala.collection.mutable.Set.empty[String]
      val want = rows.map { case (id, text) =>
        id -> text.split("\n", -1).filter { l =>
          if (l.length < minChars) true else seen.add(l)
        }.mkString("\n")
      }.toMap
      val got = Corpus.dedupParagraphsGlobal(docsDf(rows.toList), minChars)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("hostSummary: one row per normalized host; unparseable urls group under empty host") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      ("https://A.Example:443/x", "ein zwei drei"),
      ("https://a.example/y", "vier fünf"),
      ("https://b.example/z", "sechs"),
      // a null text cell counts 0 tokens (size() on a null array is -1
      // under legacy sizeOfNull — that must never skew the host's sums)
      ("https://b.example/leer", null: String),
      ("kein-url", "sieben acht"),
      (null: String, "neun")).toDF("url", "text")
    val got = Corpus.hostSummary(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("a.example", 2L, 5L),  // case + :443 normalized into one host
      ("b.example", 2L, 1L),  // the null-text row: counted, 0 tokens
      ("", 2L, 3L)), got)     // unparseable + null urls: visible, not lost
  }

  test("capPerHost: both caps are prefix cuts; salted two-phase equals the single-window answer") {
    val sp = spark
    import sp.implicits._
    // 3 hosts x 20 docs, token masses 1..5 cycling — both caps bind
    // (rank cap at 10 docs, token cap at 25 cumulative tokens, whichever
    // bites first per host)
    val docs = (0L until 60L).map { i =>
      (i, s"https://H${i % 3}.Example:443/p$i", // case+port: hostOf normalizes
        Seq.fill((1 + (i % 5)).toInt)("w").mkString(" "))
    }.toDF("doc_id", "url", "text")
    def run(saltParts: Int) =
      Corpus.capPerHost(docs, maxDocs = Some(10L), maxTokens = Some(25L),
          saltParts = saltParts)
        .select("doc_id", "host", "n_tok", "host_rank", "host_cum_tokens")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val got = run(8)
    // brute-force single-window reference
    val ref = (0L until 60L).map(i => (i, s"h${i % 3}.example",
        (1 + (i % 5)).toLong))
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(_._1).zipWithIndex.flatMap { case ((id, h, tok), idx) =>
          cum += tok
          if (idx + 1 <= 10 && cum <= 25) Some((id, h, tok,
            (idx + 1).toLong, cum)) else None
        }
      }.toSet
    assert(got == ref, got.toSeq.sortBy(_._1).mkString("\n"))
    // the salt is invisible in the answer (the superset/prefix argument)
    assert(run(1) == got && run(32) == got)
    // single-cap modes
    assert(Corpus.capPerHost(docs, maxDocs = Some(10L)).count() == 30)
    val tokenOnlyRef = (0L until 60L).map(i => (i, i % 3,
        (1 + (i % 5)).toLong))
      .groupBy(_._2).iterator.map { case (_, rows) =>
        var cum = 0L
        rows.sortBy(_._1).count { case (_, _, tok) =>
          cum += tok; cum <= 25 }
      }.sum
    assert(Corpus.capPerHost(docs, maxTokens = Some(25L)).count() ==
      tokenOnlyRef.toLong)
    // null url (host "") and null text (0 tokens) rows are capped, not lost
    val edge = Seq((1L, null: String, null: String),
      (2L, "kein-url", "ein zwei")).toDF("doc_id", "url", "text")
    val e = Corpus.capPerHost(edge, maxDocs = Some(5L), maxTokens = Some(5L))
      .select("doc_id", "host", "n_tok", "host_cum_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(e == Set((1L, "", 0L, 0L), (2L, "", 2L, 2L)), e)
  }

  test("capPerHost drop-point fence: a salt bucket swallowing a mid-host row's tokens cannot sneak a later row under the budget") {
    val sp = spark
    import sp.implicits._
    // construct the adversarial shape deliberately: ids a < b < c with
    // salt(a) == salt(b) != salt(c) (salt = pmod(xxhash64(id), 4)),
    // tokens 6, 10, 4, cap 15. Single-window truth: cum 6, 16, 20 ->
    // keep only a. An unfenced two-phase would drop b in its bucket
    // (cum 16 > 15) and then see c's cumsum as 6 + 4 = 10 <= 15 —
    // wrongly keeping c with a wrong audit value.
    val salts = (0L until 200L).toDF("doc_id")
      .select(col("doc_id"),
        pmod(xxhash64(col("doc_id")), lit(4L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = (0L until 200L).toSeq
    val triple = (for {
      a <- ids; b <- ids if b > a && salts(b) == salts(a)
      c <- ids if c > b && salts(c) != salts(a)
    } yield (a, b, c)).head
    val (a, b, c) = triple
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (a, "https://fence.example/x", words(6)),
      (b, "https://fence.example/y", words(10)),
      (c, "https://fence.example/z", words(4)))
      .toDF("doc_id", "url", "text")
    val kept = Corpus.capPerHost(docs, maxTokens = Some(15L), saltParts = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(a), s"triple=$triple kept=$kept")
  }

  test("capPerHost randomized: salted two-phase == brute-force single window, zeros and all salt counts") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(20260818L)
    val toks = (0L until 300L).map(i => i -> rng.nextInt(51)).toMap
    val docs = (0L until 300L).map { i =>
      (i, s"https://h${i % 5}.example/p$i",
        Seq.fill(toks(i))("w").mkString(" "))
    }.toDF("doc_id", "url", "text")
    // both caps are prefix cuts: rank and cumsum are monotone, so
    // keep-iff-both-hold IS the single-window answer
    def ref(maxDocs: Option[Long], maxTokens: Option[Long]) =
      (0L until 300L).map(i => (i, i % 5, toks(i).toLong))
        .groupBy(_._2).iterator.flatMap { case (_, rows) =>
          var cum = 0L
          rows.sortBy(_._1).zipWithIndex.flatMap { case ((id, _, t), idx) =>
            cum += t
            if (maxDocs.forall(idx + 1 <= _) && maxTokens.forall(cum <= _))
              Some(id)
            else None
          }
        }.toSet
    for ((md, mt) <- Seq((Some(8L), Some(120L)), (None, Some(120L)),
        (Some(8L), None)); parts <- Seq(1, 4, 32)) {
      val got = Corpus.capPerHost(docs, md, mt, saltParts = parts)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == ref(md, mt), s"md=$md mt=$mt parts=$parts " +
        s"extra=${(got -- ref(md, mt)).toSeq.sorted.take(5)} " +
        s"missing=${(ref(md, mt) -- got).toSeq.sorted.take(5)}")
    }
  }

  test("capPerHostByTokenShare: the share budget is floor(share * corpus tokens) fed to capPerHost") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 60L).map { i =>
      (i, s"https://h${i % 3}.example/p$i",
        Seq.fill((1 + (i % 5)).toInt)("w").mkString(" "))
    }.toDF("doc_id", "url", "text")
    // corpus total = 60 + 120 = 180 tokens; share 0.1 -> 18 per host
    val byShare = Corpus.capPerHostByTokenShare(docs, 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byBudget = Corpus.capPerHost(docs, maxTokens = Some(18L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byShare == byBudget && byShare.nonEmpty)
    // an empty corpus is a benign empty result, not an NPE from the
    // null SQL sum
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "url", "text")
    assert(Corpus.capPerHostByTokenShare(empty, 0.5).count() == 0)
  }

  // ---------- randomized cross-checks vs brute-force Scala ----------

  private def gramsOf(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.length < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def randomCorpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    (1L to nDocs.toLong).map { i =>
      val len = 1 + rng.nextInt(12)
      (i, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("removeBoilerplateLines == brute force on random multi-line corpora") {
    (0L until 4L).foreach { seed =>
      val rng = new scala.util.Random(5000 + seed)
      val lineVocab = Vector("aa bb", "cc dd", "ee ff", "gg hh", "ii jj",
        "kk ll", "mm nn", "oo pp")
      val rows = (1L to 30L).map { i =>
        val nLines = 1 + rng.nextInt(5)
        (i, Seq.fill(nLines)(lineVocab(rng.nextInt(lineVocab.size)))
          .mkString("\n"))
      }
      val maxDf = 1 + rng.nextInt(10)
      val df = rows.flatMap { case (_, t) => t.split("\n").distinct }
        .groupBy(identity).view.mapValues(_.size).toMap
      val expected = rows.map { case (id, t) =>
        // all-hot docs survive as empty rows (row-count preserving)
        id -> t.split("\n").filter(l => df(l) <= maxDf).mkString("\n")
      }.toMap
      val got = Corpus.removeBoilerplateLines(docsDf(rows.toList), maxDf)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected, s"seed=$seed maxDf=$maxDf")
    }
  }

  test("decontaminate == brute-force gram-set overlap on random corpora") {
    (0L until 5L).foreach { seed =>
      val trainRows = randomCorpus(1000 + seed, 40)
      val evalRows = randomCorpus(2000 + seed, 6)
      val n = 2 + (seed % 3).toInt // n in 2..4
      val evalGrams = evalRows.flatMap(r => gramsOf(r._2, n)).toSet
      val expected = trainRows.map { case (id, t) =>
        val ov = gramsOf(t, n).count(evalGrams.contains)
        id -> ((id, ov.toLong, ov > 0))
      }.toMap
      val got = Corpus.decontaminate(docsDf(trainRows.toList),
        docsDf(evalRows.toList), n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1),
          r.getBoolean(2)))).toMap
      assert(got.keySet == expected.keySet, s"seed=$seed doc set")
      expected.foreach { case (id, e) =>
        assert(got(id) == e, s"seed=$seed doc=$id got=${got(id)} want=$e")
      }
    }
  }

  test("stratifiedSample == per-row md5Long recomputation on random corpora") {
    val sp = spark
    import sp.implicits._
    (0L until 3L).foreach { seed =>
      val rng = new scala.util.Random(3000 + seed)
      val langs = Vector("en", "de", "zh")
      val rows = (1L to 300L).map(i => (i, langs(rng.nextInt(3))))
      val rates = Map("en" -> 0.4, "de" -> 0.8)
      val salt = s"fuzz-$seed"
      def thresh(lang: String): Long =
        math.round(rates.getOrElse(lang, 0.15) * Corpus.SampleBuckets)
      val expected = rows.filter { case (id, lang) =>
        ((Hashing.md5Long(s"$id$salt") & 0x0FFFFFFFFFFFFFFFL) %
          Corpus.SampleBuckets) < thresh(lang)
      }.map(_._1).toSet
      val got = Corpus.stratifiedSample(rows.toDF("doc_id", "lang"),
        col("lang"), rates, 0.15, col("doc_id"), salt)
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"seed=$seed diff=${got.diff(expected)} / ${expected.diff(got)}")
    }
  }

  test("ngramDocFreqTopK == brute-force document frequency on random corpora") {
    (0L until 3L).foreach { seed =>
      val rows = randomCorpus(4000 + seed, 50)
      val k = 15
      val df = rows.flatMap(r => gramsOf(r._2, 2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = df.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
      val got = Corpus.ngramDocFreqTopK(docsDf(rows.toList), n = 2, k = k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expected, s"seed=$seed\ngot=$got\nwant=$expected")
    }
  }

  test("ngramDocFreqTopK: counts are per-doc-distinct, ties break on gram") {
    val df = docsDf(Seq(
      (1L, "a b a b"),   // grams {a b, b a} — dup "a b" counted once
      (2L, "a b c"),     // {a b, b c}
      (3L, "b c d")))    // {b c, c d}
    val out = Corpus.ngramDocFreqTopK(df, n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a b", 2L), ("b c", 2L), ("b a", 1L)))
  }

  test("packSequences: shard-local concat-and-chunk layout, spanning docs, determinism") {
    // token counts: doc i has (10 + i) whitespace tokens; doc 50 is long
    // (spans several 64-token sequences); doc 99 is empty (dropped)
    val docs = docsDf(
      (1L to 20L).map(i => (i, (1 to 10 + i.toInt).map(j => s"t$j").mkString(" "))) ++
        Seq((50L, (1 to 300).map(j => s"w$j").mkString(" ")), (99L, "   ")))
    val out = Corpus.packSequences(docs, seqLen = 64, nShards = 2, salt = "pack-test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length == 21) // empty doc dropped
    // reconstruct each shard's layout from the emitted index alone:
    // cum = first_seq * seqLen + seq_offset must tile the shard's token
    // stream exactly — first doc at 0, each next doc starting where the
    // previous ended, last_seq consistent with the span
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => r._4 * 64 + r._6)
      var cum = 0L
      ordered.foreach { case (_, _, n, first, last, off) =>
        assert(first * 64 + off == cum, s"gap/overlap at cum=$cum")
        assert(last == (cum + n - 1) / 64)
        cum += n
      }
    }
    // the long doc spans sequences
    val d50 = out.find(_._1 == 50L).get
    assert(d50._3 == 300L && d50._5 > d50._4)
    // bit-deterministic layout: a re-run (fresh plan) emits the same index
    val again = Corpus.packSequences(docs, seqLen = 64, nShards = 2, salt = "pack-test")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(5))).toSet
    assert(again == out.map(r => (r._1, r._4, r._6)).toSet)
  }

  test("packSequences: shard count changes the layout, never the doc set or token mass") {
    val docs = docsDf((1L to 40L).map(i =>
      (i, (1 to 5 + i.toInt % 11).map(j => s"t$j").mkString(" "))))
    def index(nShards: Int) =
      Corpus.packSequences(docs, seqLen = 32, nShards = nShards, salt = "inv")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val one = index(1)
    val five = index(5)
    assert(one == five) // same docs, same per-doc token counts
    assert(one.values.sum == five.values.sum)
  }

  test("rebalanceRates: binding stratum kept whole, mix hits the target shares") {
    val rates = Corpus.rebalanceRates(
      Map("web" -> 80L, "code" -> 20L), Map("web" -> 0.5, "code" -> 0.5))
    assert(rates("web") == 0.25 && rates("code") == 1.0)
    // realized mix: 80*0.25 = 20, 20*1.0 = 20 -> exactly 50/50
    // stratum without a target -> excluded; target for an ABSENT stratum
    // (e.g. a misspelling) fails loudly instead of silently falling
    // through to stratifiedSample's defaultRate; measured-but-empty
    // stratum -> rate 0; empty-target edge -> all zero
    val r2 = Corpus.rebalanceRates(
      Map("web" -> 60L, "junk" -> 40L), Map("web" -> 1.0, "junk" -> 0.0))
    assert(r2 == Map("web" -> 1.0, "junk" -> 0.0))
    val err = intercept[IllegalArgumentException] {
      Corpus.rebalanceRates(
        Map("web" -> 60L, "junk" -> 40L), Map("web" -> 1.0, "books" -> 0.5))
    }
    assert(err.getMessage.contains("books"))
    assert(Corpus.rebalanceRates(
      Map("web" -> 60L, "books" -> 0L), Map("web" -> 1.0, "books" -> 0.5))
      == Map("web" -> 1.0, "books" -> 0.0))
    assert(Corpus.rebalanceRates(Map("a" -> 5L), Map.empty) == Map("a" -> 0.0))
    // three-way mix with a non-trivial binding stratum
    val r3 = Corpus.rebalanceRates(
      Map("a" -> 100L, "b" -> 50L, "c" -> 10L),
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    // c binds (10/0.2 = 50): rates = 50*share/tokens
    assert(math.abs(r3("a") - 0.25) < 1e-12)
    assert(math.abs(r3("b") - 0.3) < 1e-12)
    assert(r3("c") == 1.0)
    // realized: 25 / 15 / 10 tokens = exactly 0.5 / 0.3 / 0.2
  }

  // ---------- global token-budget curation ----------

  test("tokenBudgetTake == brute-force prefix rule; boundary/zero/huge budgets; parts-invariant") {
    val rnd = new scala.util.Random(77)
    val sp = spark
    import sp.implicits._
    // coarse quality steps so ties are common — the id tie-break must bite
    val rows = (1L to 120L).map { i =>
      (i, rnd.nextInt(5) / 4.0, rnd.nextInt(30).toLong)
    }
    val df = rows.toDF("doc_id", "quality", "n_tokens").repartition(9)
    val ordered = rows.sortBy { case (id, q, _) => (-q, id) }
    val cums = ordered.scanLeft(0L)(_ + _._3).tail
    val total = cums.last
    for (budget <- Seq(0L, 1L, total / 3, cums(49), total, total + 100);
         parts <- Seq(2, 7)) {
      val expected = ordered.zip(cums).takeWhile(_._2 <= budget)
        .map { case ((id, q, t), c) => (id, q, t, c) }
      val got = Corpus.tokenBudgetTake(df, budget,
          quality = col("quality"), id = col("doc_id"),
          nTokens = col("n_tokens"), parts = parts)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (-x._2, x._1)).toSeq
      assert(got == expected, s"budget=$budget parts=$parts")
    }
  }

  test("tokenBudgetTake: null/NaN quality and null id drop; null tokens count 0; negatives clamp") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("quality", DoubleType),
      StructField("n_tokens", LongType)))
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, 0.9, 5L),
      Row(2L, 0.8, null), // null tokens -> 0
      Row(3L, 0.7, -4L), // negative clamps to 0
      Row(null, 0.99, 1L), // null id drops
      Row(5L, null, 1L), // null quality drops
      Row(6L, Double.NaN, 1L), // NaN quality drops
      Row(7L, 0.6, 100L)), schema) // over budget
    val got = Corpus.tokenBudgetTake(df, budget = 6L,
        quality = col("quality"), id = col("doc_id"),
        nTokens = col("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 5L, 5L), (2L, 0L, 5L), (3L, 0L, 5L)))
  }

  test("tokenBudgetTake: default token counter is the q08 whitespace count") {
    val df = docsDf(Seq((1L, "a b  c"), (2L, "d e")))
      .withColumn("quality", lit(1.0) - col("doc_id") / lit(10.0))
    val got = Corpus.tokenBudgetTake(df, budget = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L))) // doc 2 (cum 5) crosses the budget
  }

  // ---------- per-stratum score buckets ----------

  test("scoreBuckets: exact thirds on distinct scores; tied class lands whole in its lowest bucket") {
    val sp = spark
    import sp.implicits._
    val a = (1 to 9).map(i => (i.toLong, "a", i.toDouble)) // 3/3/3 split
    // stratum b: hist (1.0 x4, 2.0, 3.0); n=6, ranks k1=2 k2=4 both land
    // inside the tied class -> c0=c1=1.0: the whole class buckets low and
    // the middle bucket is legitimately EMPTY
    val b = Seq((11L, "b", 1.0), (12L, "b", 1.0), (13L, "b", 1.0),
      (14L, "b", 1.0), (15L, "b", 2.0), (16L, "b", 3.0))
    val got = Corpus.scoreBuckets((a ++ b).toDF("doc_id", "stratum", "score"),
        stratum = col("stratum"), score = col("score"),
        labels = Seq("lo", "mid", "hi"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert((1L to 3L).forall(got(_) == "lo"))
    assert((4L to 6L).forall(got(_) == "mid"))
    assert((7L to 9L).forall(got(_) == "hi"))
    assert((11L to 14L).forall(got(_) == "lo"))
    assert(got(15L) == "hi" && got(16L) == "hi")
  }

  test("scoreBuckets == brute-force rank rule on random corpora") {
    val rnd = new scala.util.Random(41)
    val sp = spark
    import sp.implicits._
    val rows = (1L to 200L).map { i =>
      (i, s"s${rnd.nextInt(3)}", (rnd.nextInt(7) + 1).toDouble / 7.0)
    }
    // cutoff = k-th smallest where k = ceil(n*num/den): the smallest score
    // whose cumulative count reaches k
    def cutoff(scores: Seq[Double], num: Int, den: Int): Double = {
      val k = (scores.size * num + den - 1) / den
      scores.sorted.apply(k - 1)
    }
    val byStratum = rows.groupBy(_._2).map { case (st, rs) =>
      st -> (cutoff(rs.map(_._3), 1, 3), cutoff(rs.map(_._3), 2, 3))
    }
    val expected = rows.map { case (id, st, sc) =>
      val (c0, c1) = byStratum(st)
      id -> (if (sc <= c0) "t" else if (sc <= c1) "m" else "h")
    }.toMap
    val got = Corpus.scoreBuckets(rows.toDF("doc_id", "stratum", "score")
          .repartition(5),
        stratum = col("stratum"), score = col("score"),
        labels = Seq("t", "m", "h"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == expected)
  }

  test("scoreBuckets: rejects non-ascending cuts and mis-sized labels") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a", 0.5)).toDF("doc_id", "stratum", "score")
    intercept[IllegalArgumentException] {
      Corpus.scoreBuckets(df, col("stratum"), col("score"),
        cuts = Seq((2, 3), (1, 3)), labels = Seq("a", "b", "c"))
    }
    intercept[IllegalArgumentException] {
      Corpus.scoreBuckets(df, col("stratum"), col("score"),
        labels = Seq("only", "two"))
    }
    intercept[IllegalArgumentException] {
      Corpus.scoreBuckets(df, col("stratum"), col("score"),
        cuts = Seq((3, 3)), labels = Seq("a", "b"))
    }
  }

  // ---------- C4 cleaning heuristics ----------

  test("c4Filter: every line rule and page rule on hand vectors") {
    val good1 = "This is a perfectly reasonable sentence of text."
    val good2 = "Another good sentence follows right here too!"
    val good3 = "A third one keeps the page over the minimum?"
    val df = docsDf(Seq(
      (1L, s"$good1\n$good2\n$good3"), // clean page: all kept
      (2L, s"$good1\nshort one.\n$good2\n$good3"), // <5 words line drops
      (3L, s"$good1\nno terminal punctuation here at all\n$good2\n$good3"),
      (4L, s"$good1\nPlease enable JavaScript to view this.\n$good2\n$good3"),
      (5L, s"$good1\nThis site uses cookies for tracking purposes.\n$good2\n$good3"),
      (6L, s"$good1\n$good2\n$good3\nWe meant lorem ipsum as filler."), // page drop
      (7L, s"$good1\n$good2\n$good3\nif (x) { return; }"), // '{' page drop
      (8L, s"$good1\n$good2"), // only 2 sentences -> page drop
      (9L, s"$good1\nShe said \"This ends in a quote.\"\n$good2\n$good3")))
    val got = Corpus.c4Filter(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((s"$good1\n$good2\n$good3", 3L, 3L, true)))
    // the offending line drops but the page survives on the 3 good ones
    for (id <- 2L to 5L)
      assert(got(id) == ((s"$good1\n$good2\n$good3", 3L, 3L, true)), s"doc $id")
    // lorem/curly kill the PAGE even though their lines also failed/passed
    assert(got(6L)._4 == false && got(6L)._2 == 4L) // lorem line itself is a valid line
    assert(got(7L)._4 == false && got(7L)._2 == 3L)
    assert(got(8L) == ((s"$good1\n$good2", 2L, 2L, false)))
    // quote after terminal punct is a valid line end; quoted sentence
    // inside the line adds to the count
    assert(got(9L)._2 == 4L && got(9L)._4 == true)
  }

  test("c4Filter: pageDropWords and thresholds are honored; empty text survives as empty unkept row") {
    val good = "This is a perfectly reasonable sentence of text."
    val df = docsDf(Seq(
      (1L, s"$good\nThe forbidden word BADTOKEN appears here.\n$good"),
      (2L, s"$good\n$good\n$good"),
      (3L, "")))
    val got = Corpus.c4Filter(df, minWordsPerLine = 5, minSentences = 2,
        pageDropWords = Seq("badtoken"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L)._3 == false) // page word hits in the ORIGINAL text
    assert(got(2L) == ((3L, 3L, true)))
    assert(got(3L) == ((0L, 0L, false)))
  }

  // ---------- DSIR importance weights ----------

  test("dsir importanceWeights == brute-force hashed-ngram re-derivation") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("the", "cat", "sat", "dog", "ran", "code", "fn", "var")
    def doc(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val targetRows = (1L to 20L).map(i => (i, doc(12)))
    val target = targetRows.toDF("doc_id", "text")
    val rawRows = (100L to 160L).map(i => (i, if (i == 150L) "" else doc(15)))
    val raw = rawRows.toDF("doc_id", "text").repartition(5)
    val B = 64
    def grams(t: String): Seq[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      toks ++ (if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
               else Seq.empty)
    }
    def bkt(g: String): Int = {
      val m = (Hashing.md5Long(g) % B).toInt
      if (m < 0) m + B else m
    }
    def hist(docs: Seq[(Long, String)]): Map[Int, Long] =
      docs.flatMap(d => grams(d._2)).groupBy(bkt).map { case (b, gs) => b -> gs.size.toLong }
    val tc = hist(targetRows)
    val rc = hist(rawRows)
    val tTot = tc.values.sum.toDouble + B
    val rTot = rc.values.sum.toDouble + B
    def lq(b: Int): Long = math.floor((math.log((tc.getOrElse(b, 0L) + 1.0) / tTot)
      - math.log((rc.getOrElse(b, 0L) + 1.0) / rTot)) * 1e6 + 0.5).toLong
    val expected = rawRows.map { case (id, t) =>
      val s = grams(t).map(g => lq(bkt(g))).sum
      id -> ((s, s / 1e6))
    }.toMap
    val got = Dsir.importanceWeights(raw, target, buckets = B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (s, w)) =>
      assert(got(id) == ((s, w)), s"doc $id: got ${got(id)} want ($s, $w)")
    }
    assert(got(150L) == ((0L, 0.0))) // empty doc scores exactly 0
  }

  test("dsir importanceWeights: target-like raw docs outweigh dissimilar ones") {
    val sp = spark
    import sp.implicits._
    val target = (1L to 10L).map(i => (i, "the cat sat on the mat")).toDF("doc_id", "text")
    val raw = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "var fn impl struct enum match")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(100L) > w(101L), w.toString)
  }

  test("perplexityFilter: natural text scores below gibberish; kept respects threshold") {
    val df = docsDf(Seq(
      (1L, "the cat sat on the mat and the dog was in the house"),
      (2L, "zxq jwv qqq kxz vvq zzj wqx")))
    val scores = Corpus.perplexityFilter(df, maxScore = Double.MaxValue)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_score"))
      .toMap
    assert(scores(1L) < scores(2L), scores.toString)
    val kept = Corpus.perplexityFilter(df, (scores(1L) + scores(2L)) / 2)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }

  // ---------- chunkByTokens ----------

  private def chunksOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"),
      r.getAs[Int]("start_tok"), r.getAs[Long]("n_tok"),
      r.getAs[String]("chunk"))).sortBy(t => (t._1, t._2)).toSeq

  test("chunkByTokens: stride windows + final window covering the last token, no degenerate tail") {
    val toks21 = (1 to 21).map(i => s"t$i")
    val df = docsDf(Seq((1L, toks21.mkString(" "))))
    val got = chunksOf(Corpus.chunkByTokens(df, maxTokens = 12, overlap = 4))
    // n=21, stride=8: windows [0,12), [8,20), [16,21) — start 16 kept
    // because [8,20) missed token 21; a 4th window would be degenerate
    assert(got == Seq(
      (1L, 0, 0, 12L, toks21.slice(0, 12).mkString(" ")),
      (1L, 1, 8, 12L, toks21.slice(8, 20).mkString(" ")),
      (1L, 2, 16, 5L, toks21.slice(16, 21).mkString(" "))))
    // exact-coverage parity: n=20 ends flush on window 2 — NO third window
    val flush = chunksOf(Corpus.chunkByTokens(
      docsDf(Seq((2L, (1 to 20).map(i => s"t$i").mkString(" ")))),
      maxTokens = 12, overlap = 4))
    assert(flush.map(c => (c._2, c._3, c._4)) == Seq((0, 0, 12L), (1, 8, 12L)))
  }

  test("chunkByTokens: short docs = one chunk; empty/blank/null text = no rows; overlap 0 tiles") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, Option("a b c")), (2L, Option("")),
      (3L, Option("   ")), (4L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = chunksOf(Corpus.chunkByTokens(df, maxTokens = 12, overlap = 4))
    assert(got == Seq((1L, 0, 0, 3L, "a b c")))
    val tiled = chunksOf(Corpus.chunkByTokens(
      docsDf(Seq((9L, (1 to 7).map(_.toString).mkString(" ")))),
      maxTokens = 3, overlap = 0))
    assert(tiled == Seq((9L, 0, 0, 3L, "1 2 3"), (9L, 1, 3, 3L, "4 5 6"),
      (9L, 2, 6, 1L, "7")))
    // whitespace runs collapse to the token stream, never empty tokens
    val ws = chunksOf(Corpus.chunkByTokens(
      docsDf(Seq((10L, "  a\t\tb \n c  "))), maxTokens = 2, overlap = 1))
    assert(ws == Seq((10L, 0, 0, 2L, "a b"), (10L, 1, 1, 2L, "b c")))
  }
}
