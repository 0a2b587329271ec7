package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text retrieval over a document table — the query side of a
 * training-data pipeline (mining a corpus for passages relevant to a
 * prompt set, building retrieval eval sets, RAG-style passage search).
 */
object Retrieval {

  /**
   * Okapi BM25 top-k (Robertson et al., TREC-3; the Lucene-shape
   * non-negative idf): for each query,
   * `score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))`
   * with `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))`.
   *
   * Plan shape, 100 TB first:
   *  - ONE corpus pass emits (doc, dlen, term, tf) — tokenize once,
   *    length and term counts in the same projection;
   *  - the broadcast query-term set prunes postings BEFORE anything
   *    shuffles, so every downstream stage is ~|postings of query
   *    terms|, never |corpus tokens| (the inverted-index access an
   *    engine with a real index would do, expressed as a map-side
   *    semi-join);
   *  - df per query term comes exactly from its own surviving postings;
   *  - corpus-level stats (N, Σdlen) are one tiny aggregate of LONGS,
   *    so avgdl is a deterministic division, not an order-dependent
   *    float mean.
   *
   * Determinism contract: per-(query,doc) totals are summed as
   * MICRO-UNIT INTEGERS (each term contribution rounded to 1e-6, then
   * an exact integer sum) — float addition order can never change a
   * score or a rank, and a SQL oracle replays the totals bit-for-bit.
   * Ranking ties break on doc id.
   *
   * Queries are a driver-side literal (the "search the lake for these
   * prompts" shape); tokenization matches [[TextFunctions.tokens]]
   * (lower, trim, split on whitespace).
   */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stats = docs.agg(count(lit(1)).as("n"),
      coalesce(sum(size(TextFunctions.tokens(col(textCol)))), lit(0L))
        .as("toks")).head()
    val n = stats.getLong(0)
    val avgdl = if (n == 0) 1.0 else stats.getLong(1).toDouble / n

    val qTerms = queries.flatMap { case (qid, q) =>
      q.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")

    val toks = TextFunctions.tokens(col(textCol))
    val tf = docs
      .select(col(idCol), size(toks).as("dlen"), explode(toks).as("term"))
      .join(broadcast(qTerms.select(col("term")).distinct()), "term")
      .groupBy(col(idCol), col("dlen"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("term")).agg(countDistinct(col(idCol)).as("df"))

    val contrib = tf.join(broadcast(dfs), "term")
      .join(broadcast(qTerms), "term")
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("c",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dlen") / lit(avgdl))))
      .withColumn("ci", round(col("c") * lit(1e6), 0).cast("long"))

    val scored = contrib.groupBy(col("query_id"), col(idCol))
      .agg(sum(col("ci")).as("score_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col(idCol), (col("score_micro") / lit(1e6)).as("score"))
  }

  /**
   * Reciprocal-rank fusion (Cormack & Clarke, SIGIR'09) of ranked
   * retrieval runs — the standard hybrid-search combiner (sparse BM25 +
   * dense cosine in RAG stacks): `score(q,d) = Σ_runs 1/(k0+rank)`,
   * with documents absent from a run contributing nothing. Fusing on
   * RANKS needs no score calibration between runs, which is why RRF is
   * the default hybrid combiner in production search engines.
   *
   * Each run is `(query_id, rank, <idCol>)` — the output shape of
   * [[bm25TopK]] and of [[graft.operators.Similarity]]'s top-k family.
   * Contributions are micro-unit integers (`round(1e6/(k0+rank))`)
   * summed exactly, so fused scores and ranks are order-independent
   * and SQL-replayable; ties break on doc id.
   *
   * Scale shape: inputs are already per-query top-k — O(queries·k·runs)
   * rows total, corpus-size-independent — so the fusion is a union, one
   * hash aggregate, and one per-query window over a tiny frame. The
   * expensive work stays in the run producers, which each keep their
   * own 100 TB plan shape.
   */
  def rrfFuse(runs: Seq[DataFrame], k: Int, k0: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    val contrib = runs.map(r =>
      r.select(col("query_id"), col(idCol),
        round(lit(1e6) / (lit(k0) + col("rank")), 0).cast("long").as("ci")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy(col("query_id"), col(idCol))
      .agg(sum(col("ci")).as("score_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col(idCol), (col("score_micro") / lit(1e6)).as("score"))
  }
}
