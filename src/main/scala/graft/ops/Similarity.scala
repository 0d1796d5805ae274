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
    // a fixed-size driver sample under-determines the codebook once the
    // cluster count approaches the sample size (at ~8 samples per centroid
    // Lloyd's means are noise, and whole clusters can be absent from the
    // sample); switch to the distributed trainer, which sees the WHOLE
    // corpus each iteration
    if (nCentroids.toLong * 8 > sampleSize)
      trainCentroidsDistributed(corpus, idCol, vecCol, nCentroids, iters)
    else
      trainCentroidsSampled(corpus, idCol, vecCol, nCentroids, sampleSize, iters)
  }

  /** The driver-sample Lloyd path (fast, fine while nCentroids << sampleSize). */
  private[ops] def trainCentroidsSampled(corpus: DataFrame, idCol: String, vecCol: String,
                                         nCentroids: Int, sampleSize: Int, iters: Int): Array[Array[Float]] = {
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

  /** Distributed mini-batch-free Lloyd: ONE treeAggregate pass over the whole
    * corpus per iteration (centroids broadcast; per-partition partial sums
    * combine in a tree, so driver traffic is O(nCentroids x dim x
    * log(partitions)), never O(rows)). Removes the sampled path's ceiling:
    * at 100 TB with hundreds of centroids a fixed driver sample both misses
    * whole clusters and trains each mean on a handful of points
    * (SimilaritySpec quantifies the under-fit at nCentroids=256).
    * Deterministic: hash-ordered init, fixed partition tree.
    */
  def trainCentroidsDistributed(corpus: DataFrame, idCol: String, vecCol: String,
                                nCentroids: Int, iters: Int = 5): Array[Array[Float]] = {
    val sc = corpus.sparkSession.sparkContext
    // init: the nCentroids hash-smallest rows — the same deterministic
    // decorrelated draw the sampled path uses, just exactly codebook-sized
    var centroids = corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nCentroids)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(centroids.nonEmpty, "empty corpus")
    val dim = centroids.head.length
    val k = centroids.length
    // one decode of the vector column, CACHED across the Lloyd iterations —
    // without this every iteration re-scans the source and re-unboxes the
    // rows (5 iters = 5 full corpus reads); with it each pass is a pure
    // in-memory sweep (spills to disk per-partition if the corpus outgrows
    // executor memory, which is the right degradation at 100 TB)
    val vecs = corpus.select(col(vecCol)).rdd.map(_.getSeq[Float](0).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var it = 0
    while (it < iters) {
      val bc = sc.broadcast(centroids)
      val zero = (Array.fill(k)(new Array[Double](dim)), new Array[Long](k))
      val (sums, counts) = vecs.treeAggregate(zero)(
        seqOp = { case ((s, c), v) =>
          val cs = bc.value
          var best = 0
          var bestSim = Double.MinValue
          var ci = 0
          while (ci < cs.length) {
            val sim = graft.core.TextKernels.cosine(v, cs(ci))
            if (sim > bestSim) { bestSim = sim; best = ci }
            ci += 1
          }
          c(best) += 1
          var d = 0
          while (d < dim) { s(best)(d) += v(d); d += 1 }
          (s, c)
        },
        combOp = { case ((s1, c1), (s2, c2)) =>
          var ci = 0
          while (ci < k) {
            c1(ci) += c2(ci)
            var d = 0
            while (d < dim) { s1(ci)(d) += s2(ci)(d); d += 1 }
            ci += 1
          }
          (s1, c1)
        })
      bc.destroy()
      centroids = Array.tabulate(k) { ci =>
        if (counts(ci) == 0) centroids(ci)
        else {
          val m = new Array[Float](dim)
          var d = 0
          while (d < dim) { m(d) = (sums(ci)(d) / counts(ci)).toFloat; d += 1 }
          m
        }
      }
      it += 1
    }
    vecs.unpersist(blocking = false)
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
