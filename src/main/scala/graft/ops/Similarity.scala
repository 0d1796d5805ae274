package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set
  *    against the corpus, one pass, per-query top-k via aggregation. The
  *    corpus is never shuffled; cost is |corpus| x |queries| cosines.
  *  - [[ivfTopK]] — scale path: IVF coarse quantizer. Centroids are learned
  *    with a few Lloyd iterations over a deterministic sample, corpus rows
  *    are assigned to their nearest centroid (one narrow pass, centroids
  *    broadcast), queries probe the nProbe nearest centroids, candidates
  *    meet through a (centroid) equi-join — the classic IVF recall/cost
  *    trade, entirely in DataFrame ops.
  */
object Similarity {

  /** Exact top-k: returns (query_id, neighbor_id, cosine, rank).
    *
    * ORACLE-ONLY at scale: all |Q| x |C| scored pairs cross the top-k
    * window's exchange, so this is the correctness baseline for tests and
    * small query sets — [[ivfTopK]] is the scale path (narrow assignment,
    * candidates bounded by probed buckets).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     queryId: String, corpusId: String,
                     queryVec: String, corpusVec: String,
                     k: Int = 10, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("_qv"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("_cv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine_similarity(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic k-means (few Lloyd rounds on a driver-collected sample).
    * The sample is the `sampleSize` smallest rows by xxhash64(id) — a
    * deterministic pseudorandom draw over the WHOLE corpus. Smallest-id
    * sampling (the previous form) is biased at real scale: consecutive ids
    * are one crawl epoch/domain, so centroids would model a corner of the
    * embedding space. Hash order decorrelates from id order, reproduces
    * bit-identically across runs, and still costs one narrow pass (top-K
    * per partition + driver merge, no full sort exchange). Returns
    * centroids as Array[Array[Float]] — small (nCentroids x dim), meant
    * for broadcast.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     nCentroids: Int, sampleSize: Int = 2000, iters: Int = 5): Array[Array[Float]] = {
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    var centroids = sample.take(nCentroids).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0
        var bestSim = Double.MinValue
        var ci = 0
        while (ci < centroids.length) {
          val s = graft.core.TextKernels.cosine(v, centroids(ci))
          if (s > bestSim) { bestSim = s; best = ci }
          ci += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
      }
      centroids = centroids.indices.map { ci =>
        if (counts(ci) == 0) centroids(ci)
        else {
          val m = new Array[Float](dim)
          var d = 0
          while (d < dim) { m(d) = (sums(ci)(d) / counts(ci)).toFloat; d += 1 }
          m
        }
      }.toArray
      it += 1
    }
    centroids
  }

  /** IVF ANN top-k. Recall < 1 by design (for nProbe < nCentroids); verified
    * against brute force in tests on recall@k, and EXACT-equal to brute
    * force when nProbe == nCentroids (the driver-oracle configuration).
    *
    * Scale shape: corpus-to-centroid assignment is a doc-local argmax
    * expression over the plan-embedded centroid table — a ZERO-shuffle
    * narrow map (no Exchange between the corpus scan and the probe join).
    * The query side (small by contract) broadcasts; the only shuffle in the
    * whole operator is the final per-query top-k window over candidates.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              queryId: String, corpusId: String,
              queryVec: String, corpusVec: String,
              k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4,
              excludeSelf: Boolean = true): DataFrame = {
    val centroids = trainCentroids(corpus, corpusId, corpusVec, nCentroids)

    // corpus assignment: narrow map, no exchange
    val assigned = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("_cv"))
      .withColumn("_cid", nearest_centroid(col("_cv"), centroids))

    // query probes: nProbe best centroids per query, exploded to (query, cid)
    val probes = queries.select(col(queryId).as("query_id"), col(queryVec).as("_qv"))
      .withColumn("_cid", explode(nearest_centroids(col("_qv"), centroids, nProbe)))

    // each corpus row has exactly ONE _cid and each query probes distinct
    // _cids, so a (query, neighbor) pair meets at most once — no dedup needed
    val scored = assigned.join(broadcast(probes), Seq("_cid"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine_similarity(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
