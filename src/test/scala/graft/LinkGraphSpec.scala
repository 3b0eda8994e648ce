package graft

import graft.ops.LinkGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Link-graph operators: hand-walked redirect chains (cap, cycles,
  * functionalization), anchor aggregation tie-breaks, PageRank against an
  * in-test reference implementation, and the Bloom prefilter's exactness
  * pin against the plain anti-join.
  */
class LinkGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-linkgraphspec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  import scala.collection.immutable.Seq

  private def edgesDf(rows: Seq[(String, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("url", "redirect_url")
  }

  private def chains(rows: Seq[(String, String)], maxHops: Int)
      : Map[String, (Option[String], Option[Long], Boolean)] =
    LinkGraph.resolveRedirectChains(edgesDf(rows), maxHops).collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3))).toMap

  // ---------- resolveRedirectChains ----------

  test("redirect chains: linear chain resolves every source to the terminal") {
    val out = chains(Seq(("a", "b"), ("b", "c"), ("c", "d")), maxHops = 16)
    assert(out === Map(
      "a" -> (Some("d"), Some(3L), true),
      "b" -> (Some("d"), Some(2L), true),
      "c" -> (Some("d"), Some(1L), true)))
  }

  test("redirect chains: maxHops caps — chain end just past the budget is unresolved") {
    // a is 4 hops from the terminal e; with maxHops=3 only b/c/d resolve
    val out = chains(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")),
      maxHops = 3)
    assert(out("a") === ((None, None, false)))
    assert(out("b") === ((Some("e"), Some(3L), true)))
    assert(out("d") === ((Some("e"), Some(1L), true)))
  }

  test("redirect chains: chain length exactly maxHops resolves (non-power-of-two cap)") {
    val out = chains(Seq(("a", "b"), ("b", "c"), ("c", "d")), maxHops = 3)
    assert(out("a") === ((Some("d"), Some(3L), true)))
  }

  test("redirect chains: cycles are unresolved (feeders too); canonical self-edges drop as already-terminal") {
    val out = chains(Seq(("x", "y"), ("y", "x"), ("s", "s"), ("in", "x"),
      ("ok", "t")), maxHops = 16)
    assert(out("x") === ((None, None, false)))
    assert(out("y") === ((None, None, false)))
    assert(!out.contains("s")) // self-edge: the source IS its chain end
    assert(out("in") === ((None, None, false)))
    assert(out("ok") === ((Some("t"), Some(1L), true)))
  }

  test("redirect chains: raw sources canonicalize so hops link up (the redirectEdges feed shape)") {
    // redirectEdges emits raw src + canonical dst: without folding the
    // source too, the walk from the first hop would stop at https://b
    // (only http://b/ would be a source key) and falsely resolve there
    val out = chains(Seq(
      ("http://a.example/", "https://a2.example"),
      ("http://a2.example/", "https://a3.example")), maxHops = 8)
    assert(out("https://a.example") ===
      ((Some("https://a3.example"), Some(2L), true)))
    assert(out("https://a2.example") ===
      ((Some("https://a3.example"), Some(1L), true)))
    // the everyday http->https upgrade redirect folds to a self-edge
    // and drops: consumers' coalesce(final_url, url) is already right
    val up = chains(Seq(("http://up.example/p", "https://up.example/p")),
      maxHops = 8)
    assert(up.isEmpty)
  }

  test("redirect chains: conflicting captures functionalize to min(dst); duplicates collapse") {
    val out = chains(Seq(("a", "z"), ("a", "b"), ("a", "b"), ("b", "c")),
      maxHops = 4)
    assert(out("a") === ((Some("c"), Some(2L), true)))
  }

  test("redirect chains: maxHops=1 resolves only direct-to-terminal hops") {
    val out = chains(Seq(("a", "b"), ("b", "c")), maxHops = 1)
    assert(out("a") === ((None, None, false)))
    assert(out("b") === ((Some("c"), Some(1L), true)))
  }

  // ---------- anchorTextAgg ----------

  test("anchorTextAgg: counts, canonical target merge, null anchors as empty string") {
    val sp = spark
    import sp.implicits._
    val edges = Seq(
      ("HTTP://T.Example:80/p", "hier"),
      ("https://t.example/p", "hier"),
      ("https://t.example/p", null),
      ("https://t.example/p", "dort"),
      ("https://other.example/x", "solo")).toDF("url", "anchor")
    val out = LinkGraph.anchorTextAgg(edges).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(out("https://t.example/p") === ((4L, 3L, "hier", 2L)))
    assert(out("https://other.example/x") === ((1L, 1L, "solo", 1L)))
  }

  test("anchorTextAgg: top-anchor tie breaks on the smaller string") {
    val sp = spark
    import sp.implicits._
    val edges = Seq(
      ("https://t.example/p", "zeta"), ("https://t.example/p", "zeta"),
      ("https://t.example/p", "alpha"), ("https://t.example/p", "alpha"))
      .toDF("url", "anchor")
    val row = LinkGraph.anchorTextAgg(edges).collect().head
    assert(row.getString(3) === "alpha")
    assert(row.getLong(4) === 2L)
  }

  // ---------- pageRank ----------

  /** Reference implementation of the documented recurrence, driver-side. */
  private def refPageRank(edges: Set[(String, String)], iters: Int,
      d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(out.contains).map(pr).sum
      val contrib = edges.toSeq.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => pr(s) / out(s) }.sum }
      pr = nodes.map(u =>
        u -> ((1 - d) / n + d * (contrib.getOrElse(u, 0.0) + dm / n))).toMap
    }
    pr
  }

  test("pageRank: matches the reference recurrence on a graph with dangling nodes") {
    val sp = spark
    import sp.implicits._
    val edgeSet = Set(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("c", "sink"), ("lone", "sink"))
    // duplicate edges in the frame must not change the result
    val frame = (edgeSet.toSeq ++ Seq(("a", "b"), ("c", "sink")))
      .toDF("url", "dst_url")
    val got = LinkGraph.pageRank(frame, iterations = 4).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = refPageRank(edgeSet, iters = 4, d = 0.85)
    assert(got.keySet === want.keySet)
    for ((u, w) <- want)
      assert(math.abs(got(u) - w) < 1e-12, s"node $u: got ${got(u)}, want $w")
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: a hub-endorsed page outranks an equally-in-degreed orphan-endorsed page") {
    val sp = spark
    import sp.implicits._
    // hub h is pointed at by many; h -> star. orphan o -> other. star and
    // other both have in-degree 1, but star's single vote comes from a
    // well-ranked hub.
    val edges = Seq(("f1", "h"), ("f2", "h"), ("f3", "h"), ("h", "star"),
      ("o", "other")).toDF("url", "dst_url")
    val got = LinkGraph.pageRank(edges, iterations = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("star") > got("other"))
  }

  // ---------- hostGraph / mirrorHosts ----------

  test("hostGraph: normalizes spellings, drops same-host and unparseable edges, distinct pairs") {
    val sp = spark
    import sp.implicits._
    val edges = Seq(
      ("HTTPS://A.Example:443/p1", "https://b.example/x"),
      ("https://a.example/p2", "https://b.example/y"), // same host pair
      ("https://a.example/p3", "https://a.example/p4"), // intra-site
      ("kein url", "https://b.example/z"),
      ("https://c.example/p", "https://a.example/p"))
      .toDF("url", "dst_url")
    val out = LinkGraph.hostGraph(edges).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("a.example", "b.example"),
      ("c.example", "a.example")))
  }

  test("hostGraph feeds pageRank at the domain tier") {
    val sp = spark
    import sp.implicits._
    val edges = Seq(
      ("https://f1.example/a", "https://hub.example/x"),
      ("https://f2.example/b", "https://hub.example/y"),
      ("https://hub.example/z", "https://t.example/c"))
      .toDF("url", "dst_url")
    val ranks = LinkGraph.pageRank(LinkGraph.hostGraph(edges),
        iterations = 2, srcCol = "src_host", dstCol = "dst_host")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.keySet === Set("f1.example", "f2.example",
      "hub.example", "t.example"))
    assert(ranks("hub.example") > ranks("f1.example"))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
  }

  test("mirrorHosts: pools both pair orientations, excludes same-host pairs, threshold binds") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "https://ma.example/1"), (2L, "https://ma.example/2"),
      (3L, "https://ma.example/3"), (4L, "https://ma.example/4"),
      (11L, "https://mb.example/1"), (12L, "https://mb.example/2"),
      (13L, "https://mb.example/3"), (14L, "https://mb.example/4"),
      (21L, "https://mc.example/1")).toDF("doc_id", "url")
    val pairs = Seq(
      (1L, 11L), (12L, 2L), (3L, 13L), // both orientations pool -> 3 + 1
      (14L, 4L),
      (1L, 21L),                        // ma-mc: only 1, cut by minShared
      (1L, 2L))                         // same host: excluded
      .toDF("doc_a", "doc_b") // the default pair-operator column names
    val out = LinkGraph.mirrorHosts(docs, pairs, minShared = 4L).collect()
    assert(out.length == 1)
    assert((out.head.getString(0), out.head.getString(1),
      out.head.getLong(2)) === (("ma.example", "mb.example", 4L)))
  }

  test("mirrorHosts pairs feed duplicateClusters: mirror groups by string min-label") {
    val sp = spark
    import sp.implicits._
    // two mirror components: {m1,m2,m3} chained via shared dups (m1-m2
    // and m2-m3 pass minShared, m1-m3 never directly paired) and {n1,n2}
    val docs = (
      (1 to 3).map(i => (10L + i, s"https://m1.example/$i")) ++
      (1 to 3).map(i => (20L + i, s"https://m2.example/$i")) ++
      (1 to 3).map(i => (30L + i, s"https://m3.example/$i")) ++
      (1 to 3).map(i => (40L + i, s"https://n1.example/$i")) ++
      (1 to 3).map(i => (50L + i, s"https://n2.example/$i"))
    ).toDF("doc_id", "url")
    val pairs = (
      (1 to 3).map(i => (10L + i, 20L + i)) ++ // m1-m2 x3
      (1 to 3).map(i => (20L + i, 30L + i)) ++ // m2-m3 x3
      (1 to 3).map(i => (40L + i, 50L + i))    // n1-n2 x3
    ).toDF("doc_a", "doc_b")
    val mirrors = LinkGraph.mirrorHosts(docs, pairs, minShared = 3L)
    val groups = graft.ops.Dedup.duplicateClusters(mirrors,
        idACol = "host_a", idBCol = "host_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(groups == Map(
      "m1.example" -> "m1.example", "m2.example" -> "m1.example",
      "m3.example" -> "m1.example",
      "n1.example" -> "n1.example", "n2.example" -> "n1.example"))
  }

  // ---------- compositions ----------

  test("pageRank feeds fetchSchedule(priorityCol): the horizon cap keeps the top-ranked urls") {
    val sp = spark
    import sp.implicits._
    // h is hub-endorsed (3 in-links), t2 orphan-endorsed, t3 unlinked-to
    // beyond one vote; all on ONE host so the cap must choose by rank
    val edges = Seq(
      ("https://s.example/f1", "https://s.example/h"),
      ("https://s.example/f2", "https://s.example/h"),
      ("https://s.example/f3", "https://s.example/h"),
      ("https://s.example/h", "https://s.example/t2"),
      ("https://s.example/o", "https://s.example/t3"))
      .toDF("url", "dst_url")
    val ranks = LinkGraph.pageRank(edges, iterations = 3)
    val frontier = Seq("https://s.example/h", "https://s.example/t2",
      "https://s.example/t3").toDF("url")
      .join(ranks, Seq("url"), "left")
    val robots = Seq(("s.example", "")).toDF("host", "robots_txt")
    val plan = graft.pipeline.WebPrep.fetchSchedule(frontier, robots,
        maxPerHost = 2, priorityCol = Some("rank"))
      .collect().map(r => r.getAs[String]("url") ->
        r.getAs[Int]("fetch_seq")).toMap
    // the hub h and the hub-endorsed t2 hold the 2-url horizon (after 3
    // power steps the hub's mass has flowed INTO t2, so t2 sequences
    // first — rank moves through the graph, which is the point);
    // t3's single orphan vote falls off the horizon
    assert(plan.keySet === Set("https://s.example/h",
      "https://s.example/t2"))
    assert(plan("https://s.example/t2") == 1)
  }

  test("redirect chains feed document identity: dedup on the chain END collapses hop-variant fetches") {
    val sp = spark
    import sp.implicits._
    // the same article fetched via two redirect entry points and once
    // directly; identity = the chain end (falling back to the fetch url
    // when no redirect row exists)
    val edges = Seq(
      ("https://id.example/old", "https://id.example/mid"),
      ("https://id.example/mid", "https://id.example/final"))
      .toDF("url", "redirect_url")
    val chains = LinkGraph.resolveRedirectChains(edges, maxHops = 8)
    val docs = Seq(
      (1L, "https://id.example/old"),
      (2L, "https://id.example/mid"),
      (3L, "https://id.example/final"),
      (4L, "https://id.example/other")).toDF("doc_id", "url")
    val identity = docs.join(
        chains.filter(col("resolved"))
          .select(col("url"), col("final_url")), Seq("url"), "left")
      .select(col("doc_id"),
        coalesce(col("final_url"), col("url")).as("url"))
    val keep = graft.ops.Web.urlDedup(identity).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // docs 1/2/3 share the identity https://id.example/final -> doc 1 keeps
    assert(keep === Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("recrawlSchedule parses fractional-second and colon-offset W3C stamps (WARC-Date forms)") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      ("https://w3c.example/f", "2026-01-01T00:00:00.500Z", "a"),
      ("https://w3c.example/f", "2026-01-01T02:00:00+01:00", "b"))
      .toDF("url", "fetch_ts", "digest")
    val r = graft.pipeline.WebPrep
      .recrawlSchedule(rows, minIntervalS = 100L, maxIntervalS = 100000L)
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_captures") == 2L) // neither stamp dropped
    // +01:00 resolves to 01:00:00Z -> last epoch 1767229200
    assert(r.head.getAs[Long]("next_fetch_epoch") ==
      1767229200L + math.floor(3600.0 / math.log(3.0)).toLong)
  }

  // ---------- frontierNewBloom ----------

  test("frontierNewBloom: equals frontierNew for any fpp, nulls included") {
    val sp = spark
    import sp.implicits._
    val frontier = ((0 until 400).map(i => s"https://bl.example/p$i") ++
      Seq(null, null)).toDF("url")
    val fetched = (0 until 400).filter(_ % 3 != 0)
      .map(i => s"HTTP://BL.Example:80/p$i?utm_source=t").toDF("url")
    for (fpp <- Seq(0.5, 0.01)) {
      val exact = graft.pipeline.WebPrep.frontierNew(frontier, fetched)
        .collect().map(r => Option(r.getString(0))).sortBy(_.getOrElse(""))
      val bloom = graft.pipeline.WebPrep
        .frontierNewBloom(frontier, fetched, fpp = fpp)
        .collect().map(r => Option(r.getString(0))).sortBy(_.getOrElse(""))
      assert(bloom === exact, s"fpp=$fpp")
    }
  }
}
