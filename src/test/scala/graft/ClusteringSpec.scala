package graft

import graft.ops.Clustering
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Integer-exact k-means: brute-force Lloyd re-derivation, tie/empty
  * edges, quantization rule, partitioning invariance.
  */
class ClusteringSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-clusteringspec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  import scala.collection.immutable.Seq

  private def vecsDf(rows: Seq[(Long, Seq[Float])]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // reference implementation: the documented contract, plain Scala
  private def refKmeans(rows: Seq[(Long, Seq[Float])], k: Int, iters: Int)
      : (Array[Array[Long]], Map[Long, (Int, Long)]) = {
    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val q = rows.sortBy(_._1).map { case (id, v) => id -> quant(v) }
    var cents = q.take(k).map(_._2.map(identity)).toArray
    (0 until iters).foreach { _ =>
      val asn = q.map { case (id, v) =>
        val best = cents.zipWithIndex.minBy { case (c, i) => (d2(c, v), i) }._2
        (best, v)
      }
      val next = cents.map(_.clone())
      asn.groupBy(_._1).foreach { case (c, vs) =>
        val n = vs.size.toLong
        next(c) = vs.map(_._2).transpose.map(_.sum / n).toArray
      }
      cents = next
    }
    val out = q.map { case (id, v) =>
      val best = cents.zipWithIndex.minBy { case (c, i) => (d2(c, v), i) }._2
      id -> ((best, d2(cents(best), v)))
    }.toMap
    (cents, out)
  }

  test("kmeansMicro == brute-force integer Lloyd; invariant to partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 60L).map { i =>
      (i, Seq.fill(8)((rnd.nextDouble() - 0.5).toFloat))
    }
    val (refCents, refAsn) = refKmeans(rows, k = 4, iters = 3)
    for (parts <- Seq(1, 7)) {
      val df = vecsDf(rows).repartition(parts)
      val cents = Clustering.kmeansMicroFit(df, k = 4, iters = 3)
      assert(cents.map(_.toSeq).toSeq == refCents.map(_.toSeq).toSeq,
        s"parts=$parts centroids")
      val got = Clustering.kmeansMicro(df, k = 4, iters = 3)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
        .toMap
      assert(got == refAsn, s"parts=$parts assignment")
    }
  }

  test("ties pick the smallest centroid index; empty clusters keep their previous centroid") {
    // two IDENTICAL seeds: every vector is equidistant to c0 and c1, so
    // everything lands on 0 and cluster 1 keeps its seed forever
    val v = Seq.fill(4)(0.25f)
    val rows = (1L to 6L).map(i => (i, v))
    val cents = Clustering.kmeansMicroFit(vecsDf(rows), k = 2, iters = 3)
    assert(cents(0).toSeq == cents(1).toSeq)
    assert(cents(0).toSeq == Seq.fill(4)(250000L))
    val asn = Clustering.kmeansMicro(vecsDf(rows), k = 2, iters = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(asn.forall(_ == ((0, 0L))), asn.toSeq.toString)
  }

  test("quantize: floor(x*scale + 0.5) — halves round UP, including negatives") {
    val sp = spark
    import sp.implicits._
    // 0.625 is dyadic (5/8): exact as float, and 0.625*4 = 2.5 exact in
    // double — so the half-rule is actually exercised, not ULP luck
    val df = Seq((1L, Seq(0.625f, -0.625f, 0.5f, -0.5f)))
      .toDF("vec_id", "embedding")
    val q = df.select(Clustering.quantize(col("embedding"), scale = 4L).as("q"))
      .collect()(0).getSeq[Long](0)
    // +2.5 -> floor(3.0) = 3; -2.5 -> floor(-2.0) = -2 (UP, not away-from-0)
    assert(q == Seq(3L, -2L, 2L, -2L), q.toString)
    val micro = df.select(Clustering.quantize(col("embedding")).as("q"))
      .collect()(0).getSeq[Long](0)
    assert(micro == Seq(625000L, -625000L, 500000L, -500000L), micro.toString)
  }

  test("clusterBalancedSample: small clusters keep everything; big ones keep the md5 rule exactly") {
    val rnd = new scala.util.Random(3)
    def blob(c: Double) = Seq.fill(4)((c + rnd.nextDouble() * 0.01).toFloat)
    // seeds are the two smallest ids — place one in each blob so k=2
    // separates deterministically: cluster 0 = 40 vecs, cluster 1 = 5
    val rows = Seq((1L, blob(0.4)), (2L, blob(-0.4))) ++
      (3L to 41L).map(i => (i, blob(0.4))) ++
      (100L to 103L).map(i => (i, blob(-0.4)))
    val got = Clustering.clusterBalancedSample(vecsDf(rows).repartition(3),
        k = 2, perClusterTarget = 10L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).toSeq
    val byCluster = got.groupBy(_._2)
    assert(byCluster(1).map(_._1).toSet == Set(2L, 100L, 101L, 102L, 103L))
    def key(id: Long) =
      (graft.ops.Hashing.md5Long(s"${id}graft-cluster-sample-v1")
        & ((1L << 60) - 1)) % 10000L
    val thresh = math.floor(math.min(1.0, 10.0 / 40) * 10000 + 0.5).toLong
    val expectBig = (1L +: (3L to 41L)).filter(key(_) < thresh).toSet
    assert(expectBig.nonEmpty) // the draw actually bites
    assert(byCluster.get(0).map(_.map(_._1).toSet)
      .getOrElse(Set.empty[Long]) == expectBig)
    got.foreach { case (id, _, sk) => assert(sk == key(id), s"id $id") }
  }

  test("prototypePrune: per-cluster integer drop count over (dist, id) rank") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 50L).map { i =>
      (i, Seq.fill(6)((rnd.nextDouble() - 0.5).toFloat))
    }
    val (_, refAsn) = refKmeans(rows, k = 3, iters = 3)
    val got = Clustering.prototypePrune(vecsDf(rows).repartition(5), k = 3,
        dropNearestFrac = 0.3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getAs[Long]("proto_rank"), r.getAs[Boolean]("kept")))
    assert(got.length == 50)
    got.groupBy(_._2).foreach { case (c, members) =>
      val n = members.length.toLong
      val dropN = n * 3000L / 10000L
      // rank must be the (dist ASC, id ASC) position within the cluster,
      // against the brute-force reference assignment
      val order = members.sortBy(m => (m._3, m._1)).map(_._1)
      members.foreach { case (id, cl, d, rank, kept) =>
        assert(refAsn(id) == ((cl, d)), s"id $id")
        assert(rank == order.indexOf(id) + 1, s"id $id rank")
        assert(kept == (rank > dropN), s"id $id kept")
      }
      assert(members.count(!_._5) == dropN, s"cluster $c drop count")
    }
  }

  test("centroid division truncates toward zero on negative sums") {
    // one cluster, two vectors summing to a negative odd total: -3 / 2
    // must be -1 (toward zero), not -2 (floor)
    val rows = Seq(
      (1L, Seq(-0.000001f)), // -1 micro
      (2L, Seq(-0.000002f))) // -2 micro
    val cents = Clustering.kmeansMicroFit(vecsDf(rows), k = 1, iters = 1)
    assert(cents(0).toSeq == Seq(-1L), cents(0).toSeq.toString)
  }

  test("ragged embedding dimension fails loudly instead of prefix-clustering (ADVICE r7)") {
    val rows = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f))) // truncated vector — dimension corruption
    val ex = intercept[org.apache.spark.SparkException] {
      Clustering.kmeansMicroFit(vecsDf(rows), k = 1, iters = 1)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("dimension")), ex.toString)
  }
}
