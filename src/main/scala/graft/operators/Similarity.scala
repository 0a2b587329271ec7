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
