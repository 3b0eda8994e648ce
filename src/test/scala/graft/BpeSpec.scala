package graft

import graft.ops.Bpe
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** BPE train + encode: the Sennrich worked example, tie determinism,
  * greedy rank-order encoding, distributed == driver, cache/null edges.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bpespec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  import scala.collection.immutable.Seq

  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("fitFromFrequencies: the Sennrich example, hand-derived merge order with ties") {
    val merges = Bpe.fitFromFrequencies(sennrich, numMerges = 4)
    // round 1: (e,s)=9 ties (s,t▁)=9 -> lexicographically smaller pair;
    // round 2: (es,t▁)=9; round 3: (l,o)=7; round 4: (e,w)=6 ties
    // (n,e) and (w,est▁) -> smallest again
    assert(merges == Vector(
      ("e", "s"), ("es", "t▁"), ("l", "o"), ("e", "w")), merges.toString)
  }

  test("fit stops before count-1 merges instead of memorizing single words") {
    val merges = Bpe.fitFromFrequencies(Seq(("ab", 1L), ("cd", 1L)), 10)
    assert(merges.isEmpty, merges.toString)
    // and a count-2 pair still merges
    val m2 = Bpe.fitFromFrequencies(Seq(("ab", 2L)), 10)
    assert(m2 == Vector(("a", "b▁")), m2.toString)
  }

  test("encodeWord: merges replay in rank order; unmerged symbols pass through") {
    val ranks = Bpe.fitFromFrequencies(sennrich, 4).zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks) == Vector("lo", "w", "est▁"))
    assert(Bpe.encodeWord("newest", ranks) == Vector("n", "ew", "est▁"))
    assert(Bpe.encodeWord("low", ranks) == Vector("lo", "w▁"))
    // never-seen word: only the merges that apply, rest are symbols
    assert(Bpe.encodeWord("xslow", ranks) == Vector("x", "s", "lo", "w▁"))
    assert(Bpe.encodeWord("z", ranks) == Vector("z▁"))
  }

  test("encodeText: pre-tokenization splits letters/digits/punct; cache is correct") {
    val ranks = Bpe.fitFromFrequencies(sennrich, 4).zipWithIndex.toMap
    val cache = mutable.HashMap.empty[String, Vector[String]]
    val got = Bpe.encodeText("low lowest, low 42!", ranks, cache)
    assert(got == Vector("lo", "w▁", "lo", "w", "est▁", ",▁",
      "lo", "w▁", "4", "2▁", "!▁"), got.toString)
    assert(cache.contains("low") && cache.contains("42"))
  }

  test("distributed fit == driver loop on hand-counted frequencies; encode == driver encode") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest"),
      (4L, "newest newest newest"),
      (5L, "widest widest widest"),
      (6L, Option.empty[String].orNull))
      .toDF("doc_id", "text").repartition(3)
    val merges = Bpe.fit(docs, numMerges = 4, minCount = 2)
    assert(merges == Bpe.fitFromFrequencies(sennrich, 4), merges.toString)
    val ranks = merges.zipWithIndex.toMap
    val got = Bpe.encode(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    val texts = Map(1L -> "low low low low low", 2L -> "lower lower",
      3L -> "newest newest newest", 4L -> "newest newest newest",
      5L -> "widest widest widest")
    got.foreach { case (id, n, joined) =>
      if (id == 6L) assert(n == 0L && joined == "")
      else {
        val ref = Bpe.encodeText(texts(id), ranks,
          mutable.HashMap.empty[String, Vector[String]])
        assert(n == ref.length.toLong, s"doc $id")
        assert(joined == ref.mkString(" "), s"doc $id")
      }
    }
  }

  test("minCount and maxWords bound the dict deterministically") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    // cc appears once -> cut by minCount=2; with maxWords=1 only aa (top
    // count, then token order) survives, so the only merge is (a,a▁)
    val merges = Bpe.fit(docs, numMerges = 5, minCount = 2, maxWords = 1)
    assert(merges == Vector(("a", "a▁")), merges.toString)
  }

  test("astral code points stay whole symbols through fit and encode") {
    val ranks = Map.empty[(String, String), Int]
    val got = Bpe.encodeWord("a😀b", ranks) // a😀b
    assert(got == Vector("a", "😀", "b▁"), got.toString)
  }

  test("encodeWord on the empty word yields no symbols (ADVICE r7)") {
    assert(Bpe.encodeWord("", Map.empty) == Vector.empty)
  }
}
