package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id, embedding: array<float>, label)`).
  *
  * Scale design:
  *  - brute-force top-k: queries are broadcast (small side), the corpus is
  *    scanned once; each partition keeps a k-sized heap per query, then one
  *    tiny shuffle merges the per-partition top-ks. Shuffled volume is
  *    O(queries * k * partitions), never O(corpus).
  *  - LSH (random hyperplanes): one signature per vector map-side, one
  *    shuffle on the bucket key, search within buckets — the 100 TB path
  *    when the query set is large too.
  *  - cosine near-dup: LSH buckets + verified cosine >= threshold.
  */
object Similarity {

  final case class Scored(query_id: Long, vec_id: Long, score: Double)

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val d = norm(a) * norm(b)
    if (d == 0) 0.0 else dot(a, b) / d
  }

  /** HALF_UP 6-decimal rounding (= Spark round / DuckDB round); applied
    * BEFORE top-k comparisons so ties resolve identically to the SQL
    * oracle's (score DESC, vec_id) ordering.
    */
  def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def asArray(s: Seq[Float]): Array[Float] = s.toArray

  /** Brute-force cosine top-k of `queries` against `corpus` — the exact
    * baseline. Queries are collected + broadcast (must be the small side).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, e) => (id, asArray(e), norm(asArray(e))) }
    val qb = spark.sparkContext.broadcast(q)

    val partial: Dataset[Scored] =
      corpus.select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Seq[Float])]
        .mapPartitions { it =>
          val qs = qb.value
          // one k-heap per query
          // head = worst kept element under (score DESC, vec_id ASC)
          val worstFirst: Ordering[Scored] = Ordering.by(s => (-s.score, s.vec_id))
          val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[Scored]()(worstFirst))
          it.foreach { case (id, e) =>
            val v = asArray(e)
            val nv = norm(v)
            var i = 0
            while (i < qs.length) {
              val (qid, qv, qn) = qs(i)
              val denom = nv * qn
              val sc = round6(if (denom == 0) 0.0 else dot(qv, v) / denom)
              val h = heaps(i)
              if (h.size < k) h.enqueue(Scored(qid, id, sc))
              else {
                val w = h.head
                if (sc > w.score || (sc == w.score && id < w.vec_id)) {
                  h.dequeue(); h.enqueue(Scored(qid, id, sc))
                }
              }
              i += 1
            }
          }
          heaps.iterator.flatMap(_.iterator)
        }

    // merge partial top-ks: tiny shuffle on query_id
    partial.groupByKey(_.query_id)
      .flatMapGroups { (_, it) =>
        it.toSeq.sortBy(s => (-s.score, s.vec_id)).take(k)
      }
      .toDF("query_id", "vec_id", "score")
      .withColumn("score", round(col("score"), 6))
      .orderBy(col("query_id"), col("score").desc, col("vec_id"))
  }

  /** Deterministic random hyperplanes for sign-LSH (seeded splitmix). */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Float]] = {
    (0 until bits).map { b =>
      val rng = new graft.fixtures.Fixtures.Rng(seed + b)
      Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)
    }.toArray
  }

  def signSignature(v: Array[Float], planes: Array[Array[Float]]): Int = {
    var sig = 0
    var i = 0
    while (i < planes.length) {
      if (dot(v, planes(i)) >= 0) sig |= (1 << i)
      i += 1
    }
    sig
  }

  /** LSH-bucketed ANN: bucket both sides by hyperplane sign signature
    * (plus single-bit-flip probes on the query side for recall), cosine
    * within buckets, top-k per query. One shuffle on the bucket key.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 12, seed: Long = 42L, probes: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(col("embedding")).as[Seq[Float]].head().length
    val planes = hyperplanes(dim, bits, seed)
    val pb = spark.sparkContext.broadcast(planes)

    val bucketed = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, e) =>
        (signSignature(asArray(e), pb.value), id, e)
      }.toDF("bucket", "vec_id", "embedding")

    val qBucketed = queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, e) =>
        val sig = signSignature(asArray(e), pb.value)
        val sigs =
          if (probes <= 0) Iterator.single(sig)
          else Iterator.single(sig) ++ (0 until bits).iterator.map(b => sig ^ (1 << b))
        sigs.map(s => (s, id, e))
      }.toDF("bucket", "query_id", "q_embedding")

    bucketed.join(qBucketed, "bucket")
      .select(col("query_id"), col("vec_id"), col("embedding"), col("q_embedding"))
      .as[(Long, Long, Seq[Float], Seq[Float])]
      .map { case (qid, id, e, qe) =>
        Scored(qid, id, round6(cosine(asArray(e), asArray(qe))))
      }
      .groupByKey(_.query_id)
      .flatMapGroups { (_, it) =>
        it.toSeq.distinct.sortBy(s => (-s.score, s.vec_id)).take(k)
      }
      .toDF("query_id", "vec_id", "score")
      .withColumn("score", round(col("score"), 6))
      .orderBy(col("query_id"), col("score").desc, col("vec_id"))
  }

  /** Embedding-cosine near-duplicate pairs: sign-LSH bucket self-join +
    * exact cosine verification.
    */
  def cosineNearDupPairs(vecs: DataFrame, threshold: Double = 0.95,
      bits: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dim = vecs.select(col("embedding")).as[Seq[Float]].head().length
    val pb = spark.sparkContext.broadcast(hyperplanes(dim, bits, seed))
    // persisted: both sides of the bucket self-join read the signatures
    val bucketed = vecs.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, e) => (signSignature(asArray(e), pb.value), id, e) }
      .toDF("bucket", "id", "e")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = bucketed.toDF("bucket", "a", "ea")
    val r = bucketed.toDF("bucket", "b", "eb")
    // exact verification via the native cosine_sim expression — stays in
    // whole-stage codegen, no encoder round-trip of the embedding arrays
    graft.functions.GraftFunctions.register(spark)
    l.join(r, "bucket").filter(col("a") < col("b"))
      .withColumn("cosine", expr("cosine_sim(ea, eb)"))
      .filter(col("cosine") >= threshold)
      .select(col("a").as("vec_a"), col("b").as("vec_b"),
        round(col("cosine"), 6).as("cosine"))
      .distinct()
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
