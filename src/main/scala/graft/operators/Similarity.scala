package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * Two paths:
 *  - [[bruteForceTopK]]: exact cosine top-k, query side broadcast —
 *    one full corpus pass, no corpus shuffle. The correctness baseline
 *    and the right plan whenever |queries| is small (the common "search
 *    the lake for these N probes" shape).
 *  - [[lshTopK]]: sign-LSH (random hyperplane) bucketing with multiprobe
 *    (flip each single bit) — corpus is hashed once into buckets; each
 *    query only scans its probe buckets, the IVF-style scale path where
 *    the corpus is too large for a full pass per query batch.
 */
object Similarity {

  /**
   * Exact top-k by cosine for every query vector.
   * Plan: broadcast(queries) × corpus → cosine → per-query top-k.
   * The rank window partitions by query id, so the only shuffle is the
   * scored pairs — (query_id, corpus_id, score) triples, never vectors.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .select(col(queryId), col(corpusId),
        cosine(col(corpusVec), col(queryVec)).as("score"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(corpusId).asc)
    scored.select(col(queryId), col(corpusId), col("score"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }

  /**
   * IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
   * corpus into `k` cells; each query scans only its `nprobe` nearest
   * cells. This is the classic billion-scale layout (Jégou et al.,
   * "Product Quantization for Nearest Neighbor Search", PAMI'11 — the
   * IVF part, without PQ compression).
   *
   * Training is `iters` Lloyd rounds as pure DataFrame ops:
   *  - centroids seed deterministically from the `k` smallest
   *    xxhash64(id) rows (a uniform hash-min sample — no RNG state);
   *  - assignment broadcasts the k centroids (k is small) and argmins
   *    with the native cosine kernel — one corpus pass per round;
   *  - update averages member vectors per cell (posexplode → groupBy
   *    (cell, dim) → avg → collect k×dim to the driver; k·dim is tiny).
   *
   * At 100 TB the corpus pass is the only large stage and it is
   * embarrassingly parallel; centroids always fit on the driver.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nCells: Int = 16, nprobe: Int = 4, iters: Int = 3,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._

    // --- train the coarse quantizer ---------------------------------
    var centroids: Array[(Int, Array[Double])] = corpus
      .select(col(corpusId), col(corpusVec))
      .withColumn("__h", xxhash64(col(corpusId)))
      .orderBy(col("__h")).limit(nCells)
      .collect().zipWithIndex
      .map { case (r, i) =>
        // element type may be float or double — go through Number
        (i, r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toArray)
      }

    def centroidDf(cs: Array[(Int, Array[Double])]): DataFrame = {
      val schema = StructType(Seq(StructField("cell", IntegerType),
        StructField("cvec", ArrayType(DoubleType))))
      spark.createDataFrame(
        java.util.Arrays.asList(cs.map(c => Row(c._1, c._2.toSeq)): _*), schema)
    }

    def assign(df: DataFrame, vecCol: String): DataFrame = {
      val cs = centroidDf(centroids)
      val scored = df.join(broadcast(cs))
        .withColumn("__sim", cosine(col(vecCol), col("cvec")))
      val w = Window.partitionBy(df.columns.map(col): _*)
        .orderBy(col("__sim").desc, col("cell").asc)
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__sim", "__rn", "cvec")
    }

    (0 until iters).foreach { _ =>
      val assigned = assign(corpus.select(col(corpusId), col(corpusVec)), corpusVec)
      val updated = assigned
        .select(col("cell"), posexplode(col(corpusVec)).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("v")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          val vec = new Array[Double](dim)
          rows.foreach(r => vec(r.getInt(1)) = r.getDouble(2))
          (cell, vec)
        }.toArray
      // keep empty cells at their previous position
      val updatedMap = updated.toMap
      centroids = centroids.map { case (c, v) => (c, updatedMap.getOrElse(c, v)) }
    }

    // --- search ------------------------------------------------------
    val cells = assign(corpus.select(col(corpusId), col(corpusVec)), corpusVec)
    val cs = centroidDf(centroids)
    val probeW = Window.partitionBy(col(queryId))
      .orderBy(col("__sim").desc, col("cell").asc)
    val probes = queries.join(broadcast(cs))
      .withColumn("__sim", cosine(col(queryVec), col("cvec")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nprobe)
      .select(col(queryId), col(queryVec), col("cell"))
    val scored = cells.join(probes, "cell")
      .select(col(queryId), col(corpusId),
        cosine(col(corpusVec), col(queryVec)).as("score"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(corpusId).asc)
    scored.select(col(queryId), col(corpusId), col("score"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }

  /**
   * LSH-bucketed ANN: corpus bucketed once by `nBits` hyperplane signs;
   * queries probe their own bucket plus every 1-bit-flip neighbor
   * (multiprobe), then rank exactly within probed buckets.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nBits: Int = 8,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val bucketedCorpus = corpus.select(col(corpusId), col(corpusVec),
      signLshBucket(col(corpusVec), dim, nBits).as("bucket"))
    val qBucket = signLshBucket(col(queryVec), dim, nBits)
    // multiprobe: own bucket + each single-bit flip
    val probes = explode(array(
      (Seq(qBucket) ++ (0 until nBits).map(b =>
        qBucket.bitwiseXOR(lit(1L << b)))): _*)).as("bucket")
    val probedQueries = queries.select(col(queryId), col(queryVec), probes)
    val scored = bucketedCorpus.join(probedQueries, "bucket")
      .select(col(queryId), col(corpusId),
        cosine(col(corpusVec), col(queryVec)).as("score"))
      // a (query, corpus) pair can surface from several probes — dedup
      .groupBy(col(queryId), col(corpusId)).agg(max("score").as("score"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(corpusId).asc)
    scored.select(col(queryId), col(corpusId), col("score"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }
}
