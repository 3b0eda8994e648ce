package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication over an embedding column
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): cluster the embedding space, then
  * mark within-cluster near-duplicates, keeping the lowest vec_id of each
  * near-dup group as the representative.
  *
  * Determinism contract (what makes this exactly SQL-oracle-checkable):
  *  - centroids are the embeddings of the `nClusters` SMALLEST vec_ids
  *    (no iterative refinement on the gate path — `Similarity.ivfTopK`
  *    holds the k-means machinery for quality-tuned centroids);
  *  - assignment is argmax of the 6-decimal-rounded cosine, ties to the
  *    smallest centroid id — identical to the oracle's
  *    row_number() OVER (ORDER BY cos DESC, cid);
  *  - a vector is a duplicate iff SOME same-cluster vector with a smaller
  *    vec_id has round6(cosine) >= threshold; `dup_of` is the smallest
  *    such id (pairwise rule, not greedy-chain — order-independent).
  *
  * Scale design:
  *  - centroid set is tiny and broadcast; assignment is one map-side pass
  *    (zero shuffle);
  *  - the only shuffle is the within-cluster self-join keyed on
  *    cluster_id; per-cluster work is quadratic BY SEMANTICS (that is
  *    SemDeDup), so the scale knob is `nClusters` ~ corpus/target-cluster
  *    -size (the paper runs 50k clusters over 1e9+ embeddings, keeping
  *    clusters at ~1e4-1e5 rows — each a single executor's task here);
  *  - cosine verification runs through the codegen'd dot_product/vec_norm
  *    expressions with norms hoisted out of the pair loop — no UDF
  *    encoder round-trip of the arrays.
  */
object SemDedup {

  /** Deterministic seed centroids: the nClusters smallest vec_ids. */
  def seedCentroids(vecs: DataFrame, nClusters: Int): Array[(Long, Array[Float])] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .orderBy(col("vec_id")).limit(nClusters).collect()
      .map { case (id, e) => (id, e.toArray) }
  }

  /** (vec_id, cluster_id, embedding): each vector assigned to the centroid
    * with the highest round6 cosine (ties -> smallest centroid id).
    * Centroids broadcast; one map-side pass, zero shuffle.
    */
  def assignClusters(vecs: DataFrame, nClusters: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents = seedCentroids(vecs, nClusters)
      .map { case (id, v) => (id, v, Similarity.norm(v)) }
    if (cents.isEmpty)
      return spark.emptyDataset[(Long, Long, Seq[Float])]
        .toDF("vec_id", "cluster_id", "embedding")
    val cb = spark.sparkContext.broadcast(cents)
    vecs.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cs = cb.value // sorted by centroid id (seedCentroids orderBy)
        it.map { case (id, e) =>
          val v = e.toArray
          val nv = Similarity.norm(v)
          var best = 0
          var bestCos = Double.NegativeInfinity
          var i = 0
          while (i < cs.length) {
            val (_, cv, cn) = cs(i)
            val denom = nv * cn
            val c = Similarity.round6(if (denom == 0) 0.0 else Similarity.dot(cv, v) / denom)
            if (c > bestCos) { bestCos = c; best = i } // strict: first (smallest id) wins ties
            i += 1
          }
          (id, cs(best)._1, e)
        }
      }
      .toDF("vec_id", "cluster_id", "embedding")
  }

  /** (vec_id, cluster_id, is_dup, dup_of): within-cluster near-duplicate
    * marking. `dup_of` = smallest same-cluster vec_id with round6 cosine
    * >= threshold (null when the vector is its group's representative).
    */
  def semDedup(vecs: DataFrame, nClusters: Int = 8,
      threshold: Double = 0.9): DataFrame = {
    val spark = vecs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val asn = assignClusters(vecs, nClusters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = asn.select(col("cluster_id"), col("vec_id").as("a"),
      col("embedding").as("ea")).withColumn("na", expr("vec_norm(ea)"))
    val r = asn.select(col("cluster_id"), col("vec_id").as("b"),
      col("embedding").as("eb")).withColumn("nb", expr("vec_norm(eb)"))
    val dupOf = l.join(r, Seq("cluster_id")).filter(col("a") < col("b"))
      .withColumn("cosine", round(
        when(col("na") * col("nb") === 0.0, lit(0.0))
          .otherwise(expr("dot_product(ea, eb)") / (col("na") * col("nb"))), 6))
      .filter(col("cosine") >= threshold)
      .groupBy(col("b").as("vec_id")).agg(min(col("a")).as("dup_of"))
    asn.join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
      .orderBy(col("vec_id"))
  }
}
