package graft.spark

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * counterpart to [[Ann]]'s sign-LSH path: vectors are assigned to the
  * nearest of `nLists` centroids once (the persistable INDEX artifact,
  * same economics as [[Ann.signatureTable]]), and a query scans only the
  * `nProbe` lists whose centroids score highest, instead of the corpus.
  *
  * Centroid choice is PLUGGABLE and deliberately deterministic here: the
  * vectors with the `nLists` smallest ids. Production would run k-means /
  * k-means|| for tighter lists; the IVF *mechanics* — assignment,
  * inverted lists, multi-probe, exact re-scoring — are identical and are
  * what this operator builds. Deterministic centroids are also what lets
  * the DuckDB oracle REPLAY the whole index+probe plan exactly (k-means'
  * float-sum reduction order differs across engines, which would break
  * hash-level replay).
  *
  * Scale shape (10^9+ vectors): the assignment pass is map-only with the
  * (small) centroid set broadcast; the index table partitions/persists by
  * `list_id`; a query batch is broadcast and each index row does an O(1)
  * probe-set lookup — the only shuffle anywhere is the final per-query
  * top-k, same as [[Ann.lshCosineTopKPrecomputed]].
  *
  * Cosines are rounded (HALF_UP) before every comparison, with id
  * tie-breaks, so ranking is stable and engine-portable (the same trick
  * e1/e2 use); zero-norm vectors have no defined cosine and are excluded
  * from index, centroid set, and query set on both engines.
  */
object Ivf {

  /** Round to `scale` decimals, HALF_UP — mirrors Column/DuckDB round. */
  @inline private def rnd(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  private def dotJvm(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Collected (id, vector, norm) rows for the centroid set: the vectors
    * with the `nLists` smallest ids whose norm is positive. Small by
    * construction (nLists ≈ sqrt(corpus) in practice; a few thousand rows
    * even at 10^9 vectors) — the same bounded-by-contract collect as the
    * ANN query sides.
    */
  private def centroids(vectors: DataFrame, nLists: Int,
      idCol: String, vecCol: String): Array[(Long, Array[Double], Double)] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val vd = vectors.select(
      Dedup.requireLongId(col(idCol), "Ivf.centroids").as("cid"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    // norm > 0 BEFORE the id-ordered limit — exactly the oracle's
    // `WHERE list_dot_product(v, v) > 0 ORDER BY vec_id LIMIT nLists`,
    // so zero-norm rows can never shift the centroid set between engines.
    // TakeOrderedAndProject: per-partition heap, no full sort.
    vd.filter(aggregate(zip_with(col("cv"), col("cv"), (a, b) => a * b),
        lit(0.0), (s, x) => s + x) > 0)
      .orderBy(col("cid"))
      .limit(nLists)
      .as[(Long, Seq[Double])]
      .collect()
      .map { case (id, v) => val a = v.toArray; (id, a, math.sqrt(dotJvm(a, a))) }
  }

  /** Build the inverted-file index: (vec_id, v, norm, list_id) with
    * list_id = centroid maximizing round(cosine, 6) (smallest centroid id
    * wins ties). One map-only pass, centroids broadcast. Zero-norm rows
    * are dropped (no defined cosine ⇒ no meaningful list).
    */
  def ivfIndex(vectors: DataFrame, nLists: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val cents = centroids(vectors, nLists, idCol, vecCol)
    require(cents.nonEmpty, "Ivf.ivfIndex: no usable (non-zero-norm) centroid vectors")
    val bc = spark.sparkContext.broadcast(cents)
    vectors
      .select(Dedup.requireLongId(col(idCol), "Ivf.ivfIndex"),
        transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, vseq) =>
          val v = vseq.toArray
          val nrm = math.sqrt(dotJvm(v, v))
          if (nrm == 0.0) Iterator.empty
          else {
            var bestList = -1L
            var bestCos = Double.NegativeInfinity
            var j = 0
            while (j < cs.length) {
              val (cid, cv, cn) = cs(j)
              val c = rnd(dotJvm(v, cv) / (nrm * cn), 6)
              if (c > bestCos) { bestCos = c; bestList = cid }
              j += 1
            }
            Iterator.single((id, vseq, nrm, bestList))
          }
        }
      }
      .toDF("vec_id", "v", "norm", "list_id")
  }

  /** Probe a prebuilt [[ivfIndex]]: each query ranks the centroids, takes
    * its `nProbe` best lists, and scores exactly only the index rows in
    * those lists. Output (query_id, vec_id, cosine, rk), rk ≤ k per
    * query — the same surface as [[Ann.cosineTopK]].
    */
  def ivfTopK(index: DataFrame, vectors: DataFrame, queries: DataFrame,
      k: Int, nLists: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val cents = centroids(vectors, nLists, idCol, vecCol)
    val qRows = queries
      .select(Dedup.requireLongId(col(idCol), "Ivf.ivfTopK"),
        transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Seq[Double])].collect()
    // list_id -> queries probing it
    val probeIndex = new java.util.HashMap[java.lang.Long, Array[(Long, Array[Double], Double)]]()
    qRows.foreach { case (qid, qv) =>
      val arr = qv.toArray
      val qn = math.sqrt(dotJvm(arr, arr))
      if (qn > 0.0) {
        val ranked = cents
          .map { case (cid, cv, cn) => (cid, rnd(dotJvm(arr, cv) / (qn * cn), 6)) }
          .sortBy { case (cid, c) => (-c, cid) }
          .take(nProbe)
        ranked.foreach { case (cid, _) =>
          val key = java.lang.Long.valueOf(cid)
          val prev = probeIndex.get(key)
          val entry = (qid, arr, qn)
          probeIndex.put(key, if (prev == null) Array(entry) else prev :+ entry)
        }
      }
    }
    val bc = spark.sparkContext.broadcast(probeIndex)
    val scored = index
      .select(col("vec_id"), col("v"), col("norm"), col("list_id"))
      .as[(Long, Seq[Double], Double, Long)]
      .mapPartitions { it =>
        val idx = bc.value
        it.flatMap { case (vid, vseq, vn, listId) =>
          val hits = idx.get(java.lang.Long.valueOf(listId))
          if (hits == null) Iterator.empty
          else {
            var v: Array[Double] = null // materialized on first scoring hit
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
            var qi = 0
            while (qi < hits.length) {
              val (qid, qv, qn) = hits(qi)
              if (qid != vid) {
                if (v == null) v = vseq.toArray
                out += ((qid, vid, rnd(dotJvm(qv, v) / (qn * vn), 3)))
              }
              qi += 1
            }
            out.iterator
          }
        }
      }
      .toDF("query_id", "vec_id", "cosine")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }
}
