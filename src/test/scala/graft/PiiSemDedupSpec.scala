package graft

import graft.ops.{Pii, SemDedup, Similarity}
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PII scrub + SemDeDup: hand-computed cases and a brute-force
  * cross-check of the within-cluster duplicate rule.
  */
class PiiSemDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-piisemdedup")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  import scala.collection.immutable.Seq

  // ---------- Pii ----------

  private def scrub(rows: Seq[(Long, String)]): Map[Long, Row] = {
    val sp = spark
    import sp.implicits._
    Pii.piiScrub(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("piiScrub: emails, urls, ips, phones counted and redacted") {
    val out = scrub(Seq(
      (1L, "write to alice.smith+x@mail-host.co.uk today"),
      (2L, "see https://ex.org/a?b=1&c=2#f and http://10.1.2.3/x"),
      (3L, "server 192.168.0.1 port 8080"),
      (4L, "call +1 (555) 123-4567 now"),
      (5L, "no pii here 1.2 out of 5"),
      (6L, "go to HTTPS://Example.COM/path now"),
      (7L, "version 10.24.300.1 is not an address"),
      (8L, "reset at https://user@evil.example.com/reset?token=SECRET now")))
    assert(out(1L).getAs[Long]("n_emails") == 1)
    assert(out(1L).getAs[String]("clean_text") == "write to <EMAIL> today")
    // the host-style IP inside the URL is redacted AS a URL (staging),
    // never double-counted as an IP
    assert(out(2L).getAs[Long]("n_urls") == 2)
    assert(out(2L).getAs[Long]("n_ips") == 0)
    assert(out(2L).getAs[String]("clean_text") == "see <URL> and <URL>")
    assert(out(3L).getAs[Long]("n_ips") == 1)
    assert(out(3L).getAs[String]("clean_text") == "server <IP> port 8080")
    assert(out(4L).getAs[Long]("n_phones") == 1)
    assert(out(4L).getAs[String]("clean_text") == "call <PHONE> now")
    Seq("n_emails", "n_urls", "n_ips", "n_phones").foreach { c =>
      assert(out(5L).getAs[Long](c) == 0, c)
    }
    assert(out(5L).getAs[String]("clean_text") == "no pii here 1.2 out of 5")
    // scheme matching is case-insensitive
    assert(out(6L).getAs[Long]("n_urls") == 1)
    assert(out(6L).getAs[String]("clean_text") == "go to <URL> now")
    // octet-bounded: a version string with a 300 octet is NOT an IP
    assert(out(7L).getAs[Long]("n_ips") == 0)
    assert(out(7L).getAs[String]("clean_text") == "version 10.24.300.1 is not an address")
    // userinfo URL is ONE url (URL stage runs before the email stage —
    // redacting the authority as an email first would leave the
    // token-bearing path+query unredacted)
    assert(out(8L).getAs[Long]("n_urls") == 1)
    assert(out(8L).getAs[Long]("n_emails") == 0)
    assert(out(8L).getAs[String]("clean_text") == "reset at <URL> now")
  }

  test("piiScrub fuzz: counts match planted PII; redaction is idempotent") {
    val rng = new graft.fixtures.Fixtures.Rng(77L)
    val words = Vector("lorem", "ipsum", "dolor", "sit", "amet", "verba", "textus")
    def word() = words(rng.nextInt(words.size))
    val docs: Seq[(Long, String, (Int, Int, Int, Int))] = (0L until 40L).map { i =>
      val sb = new StringBuilder
      var (e, u, ip, ph) = (0, 0, 0, 0)
      (0 until 30).foreach { _ =>
        if (sb.nonEmpty) sb += ' '
        rng.nextInt(10) match {
          case 0 => e += 1; sb ++= s"u${rng.nextInt(99)}@host${rng.nextInt(9)}.org"
          case 1 => u += 1; sb ++= s"https://s${rng.nextInt(9)}.example.com/p/${rng.nextInt(999)}"
          case 2 => ip += 1; sb ++= s"10.${rng.nextInt(256)}.${rng.nextInt(256)}.${rng.nextInt(256)}"
          // a non-digit word always follows a phone so the greedy
          // separator class can't swallow a neighboring number
          case 3 => ph += 1; sb ++= s"+49 30 ${1000000 + rng.nextInt(999999)} ${word()}"
          case _ => sb ++= word()
        }
      }
      (i, sb.toString, (e, u, ip, ph))
    }
    val sp = spark
    import sp.implicits._
    val out = Pii.piiScrub(docs.map(d => (d._1, d._2)).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, _, (e, u, ip, ph)) =>
      val r = out(id)
      assert(r.getAs[Long]("n_emails") == e, s"emails doc $id")
      assert(r.getAs[Long]("n_urls") == u, s"urls doc $id")
      assert(r.getAs[Long]("n_ips") == ip, s"ips doc $id")
      assert(r.getAs[Long]("n_phones") == ph, s"phones doc $id")
    }
    // idempotence: scrubbing the redacted text finds nothing
    val again = Pii.piiScrub(out.toSeq.map { case (id, r) =>
      (id, r.getAs[String]("clean_text")) }.toDF("doc_id", "text")).collect()
    again.foreach { r =>
      Seq("n_emails", "n_urls", "n_ips", "n_phones").foreach { c =>
        assert(r.getAs[Long](c) == 0, s"$c after redaction")
      }
    }
  }

  // ---------- SemDedup ----------

  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    (1L, Seq(1f, 0f)),       // seed centroid 1
    (2L, Seq(0f, 1f)),       // seed centroid 2
    (3L, Seq(0.9f, 0.1f)),   // cluster 1
    (4L, Seq(0f, 2f)),       // colinear with 2 -> dup_of 2
    (5L, Seq(1.8f, 0.2f)),   // colinear with 3 -> dup_of 3
    (6L, Seq(0.70f, 0.71f)), // cluster 2 (barely)
    (7L, Seq(0.71f, 0.70f))) // cluster 1; near-dup of 6 ACROSS clusters

  private def semOut(threshold: Double): Map[Long, Row] = {
    val sp = spark
    import sp.implicits._
    SemDedup.semDedup(vecs.toDF("vec_id", "embedding"), nClusters = 2,
      threshold = threshold).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
  }

  test("semDedup: deterministic assignment, lower-id dup rule, cross-cluster pairs excluded") {
    val out = semOut(0.9999)
    assert(out.size == 7)
    // assignment: cluster_id is the centroid's vec_id
    assert(Seq(1L, 3L, 5L, 7L).forall(out(_).getAs[Long]("cluster_id") == 1L))
    assert(Seq(2L, 4L, 6L).forall(out(_).getAs[Long]("cluster_id") == 2L))
    // colinear pairs marked, smallest qualifying id wins
    assert(out(4L).getAs[Boolean]("is_dup") && out(4L).getAs[Long]("dup_of") == 2L)
    assert(out(5L).getAs[Boolean]("is_dup") && out(5L).getAs[Long]("dup_of") == 3L)
    // 6 and 7 are near-dups of each other (cos ~0.99991) but in DIFFERENT
    // clusters -> SemDeDup by design does not pair them
    assert(!out(6L).getAs[Boolean]("is_dup"))
    assert(!out(7L).getAs[Boolean]("is_dup"))
    // representatives kept
    Seq(1L, 2L, 3L).foreach(id => assert(!out(id).getAs[Boolean]("is_dup"), id))
  }

  test("semDedupKmeans: refined centroids recover planted clusters; dup rule holds") {
    val sp = spark
    import sp.implicits._
    // even ids point near (1,0), odd ids near (0,1); deltas spaced 0.1 so
    // no accidental pair clears the 0.999 threshold
    val a = (0 until 5).map(m => (2L * m, Seq(1f, 0.1f * m)))
    val b = (0 until 5).map(m => (2L * m + 1, Seq(0.1f * m, 1f)))
    val planted = Seq((10L, Seq(2f, 0.2f))) // = 2 x vec 2 -> exact dup
    val out = SemDedup.semDedupKmeans((a ++ b ++ planted).toDF("vec_id", "embedding"),
      nClusters = 2, iters = 3, threshold = 0.999)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    val clusterOf = out.view.mapValues(_.getAs[Long]("cluster_id")).toMap
    assert((0 until 5).map(m => clusterOf(2L * m)).toSet.size == 1, "group A split")
    assert((0 until 5).map(m => clusterOf(2L * m + 1)).toSet.size == 1, "group B split")
    assert(clusterOf(0L) != clusterOf(1L), "groups merged")
    assert(clusterOf(10L) == clusterOf(2L))
    assert(out(10L).getAs[Boolean]("is_dup") && out(10L).getAs[Long]("dup_of") == 2L)
    (0L until 10L).foreach(id => assert(!out(id).getAs[Boolean]("is_dup"), id))
  }

  test("semDedupKmeans: dup rule == brute force GIVEN its own assignment") {
    val rng = new graft.fixtures.Fixtures.Rng(4321L)
    val rvecs: Seq[(Long, Seq[Float])] = (0L until 50L).map { i =>
      (i, Seq.fill(6)((rng.nextDouble() * 2 - 1).toFloat))
    }
    val t = 0.5
    val sp = spark
    import sp.implicits._
    val got = SemDedup.semDedupKmeans(rvecs.toDF("vec_id", "embedding"),
      nClusters = 3, iters = 2, threshold = t).collect()
    val cluster = got.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    val byId = rvecs.toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      Similarity.round6(Similarity.cosine(a.toArray, b.toArray))
    var dups = 0
    got.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val expected = rvecs.filter { case (j, w) =>
        j < id && cluster(j) == cluster(id) && cos(byId(id), w) >= t
      }.map(_._1).sorted.headOption
      val dupOf = Option(r.getAs[java.lang.Long]("dup_of")).map(_.longValue())
      assert(dupOf == expected, s"dup_of of $id")
      if (expected.isDefined) dups += 1
    }
    assert(dups > 0, "vacuous: no dups in the random corpus")
  }

  test("semDedup == brute-force recomputation of the rule (random vectors)") {
    val rng = new graft.fixtures.Fixtures.Rng(1234L)
    val rvecs: Seq[(Long, Seq[Float])] = (0L until 60L).map { i =>
      (i, Seq.fill(8)((rng.nextDouble() * 2 - 1).toFloat))
    }
    val k = 4
    val t = 0.5
    // brute-force expected: assignment by argmax round6 cosine to the k
    // smallest ids, then min lower same-cluster id with cos >= t
    val cents = rvecs.take(k)
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      Similarity.round6(Similarity.cosine(a.toArray, b.toArray))
    val assign: Map[Long, Long] = rvecs.map { case (id, v) =>
      id -> cents.maxBy { case (cid, cv) => (cos(cv, v), -cid) }._1
    }.toMap
    val expected: Map[Long, Option[Long]] = rvecs.map { case (id, v) =>
      id -> rvecs.filter { case (j, w) =>
        j < id && assign(j) == assign(id) && cos(v, w) >= t
      }.map(_._1).sorted.headOption
    }.toMap

    val sp = spark
    import sp.implicits._
    val got = SemDedup.semDedup(rvecs.toDF("vec_id", "embedding"),
      nClusters = k, threshold = t).collect()
    assert(got.length == rvecs.length)
    // non-vacuity: the random corpus must actually contain some dups
    assert(expected.values.count(_.isDefined) > 0)
    got.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("cluster_id") == assign(id), s"cluster of $id")
      val dupOf = Option(r.getAs[java.lang.Long]("dup_of")).map(_.longValue())
      assert(dupOf == expected(id), s"dup_of of $id")
      assert(r.getAs[Boolean]("is_dup") == expected(id).isDefined, s"is_dup of $id")
    }
  }
}
