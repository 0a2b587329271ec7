package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus-curation operators a large-scale training-data pipeline needs
 * beyond dedup/similarity: benchmark decontamination, deterministic
 * sampling and dataset splits, sequence packing, and repetition-based
 * quality filters (the "Gopher rules" family).
 *
 * Everything here is declarative DataFrame code — narrow map stages
 * where possible, hash-partitioned aggregations where not — and every
 * randomized-looking decision (sampling, splits) is a pure function of
 * a portable md5 hash, so results are reproducible run-to-run, engine
 * to engine (a SQL oracle can replay them exactly), and stable under
 * repartitioning — the property that matters when a 100 TB corpus is
 * re-curated incrementally.
 */
object Curation {

  // ---- deterministic hashing --------------------------------------------

  /** Uniform-[0,1) fraction from a portable 60-bit md5 hash of
    * `key` + `salt`. Stable across engines (DuckDB re-derives it with
    * the same expression), partitioning, and runs; changing `salt`
    * draws an independent sample. */
  def hashFraction(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast(StringType), lit("_" + salt))), 1, 15),
      16, 10).cast(LongType) % 1000000L / 1000000.0

  /** Keep each row with probability `rate`, deterministically by key.
    * A narrow filter — no shuffle, no RNG state, safe to re-run on any
    * subset of partitions (the property reservoir sampling lacks). */
  def bernoulliSample(df: DataFrame, key: Column, rate: Double,
      salt: String = "sample"): DataFrame =
    df.filter(hashFraction(key, salt) < rate)

  /** Per-stratum sampling rates (domain mixing): rows in stratum s keep
    * with probability rates(s), `defaultRate` otherwise. This is the
    * standard way to hit a target domain mixture on a corpus too large
    * to shuffle: one narrow pass, no per-stratum scans. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "strata"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(hashFraction(key, salt) < rate)
  }

  /** Assign each row a split label from cumulative `weights`
    * (e.g. train 0.8 / val 0.1 / test 0.1) by hash range. Disjoint,
    * exhaustive, deterministic — and docs keep their split when the
    * corpus grows, so eval sets never silently absorb training docs. */
  def assignSplit(df: DataFrame, key: Column,
      weights: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val f = hashFraction(key, salt)
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail
    val expr = weights.init.zip(cuts.init).foldRight(
      lit(weights.last._1): Column) { case (((name, _), cut), acc) =>
      when(f < cut, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  // ---- benchmark decontamination ----------------------------------------

  /**
   * Flag corpus documents that share ≥ `minShared` distinct word
   * `n`-grams with any benchmark/eval document — the standard guard
   * against test-set leakage into training data.
   *
   * Plan shape (the only one that survives 100 TB): both sides explode
   * to (id, shingle) inverted indexes and meet in an equi-join keyed by
   * the shingle string — work is proportional to true overlap, never
   * |corpus|×|bench|. Shingles seen in more than `maxDocFreq` corpus
   * docs are boilerplate (and join-skew bombs); they are dropped from
   * BOTH sides, which only makes the filter conservative about
   * ubiquitous phrases, exactly like production decontamination at
   * n-gram sizes 8-13 where such collisions are noise anyway.
   */
  def decontaminate(corpus: DataFrame, bench: DataFrame, n: Int = 3,
      minShared: Int = 2, maxDocFreq: Int = 100,
      idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "bench_id"): DataFrame = {
    def inv(df: DataFrame, id: String) = df.select(col(id),
      explode(TextFunctions.shingles(col(textCol), n)).as("g"))
    val corpusInv = inv(corpus, idCol)
    val keep = corpusInv.groupBy(col("g"))
      .agg(count(lit(1)).as("df_"))
      .filter(col("df_") <= maxDocFreq)
      .select(col("g"))
    val benchInv = inv(bench.withColumnRenamed(idCol, benchIdCol), benchIdCol)
    corpusInv.join(keep, "g")
      .join(benchInv, "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col(benchIdCol)).as("n_bench_docs"))
      .filter(col("n_shared_ngrams") >= minShared)
  }

  /**
   * Bloom-prefiltered decontamination — the 100 TB shape of
   * [[decontaminate]]. The benchmark side is always small (eval suites:
   * thousands of docs, millions of n-grams); the corpus is not. So:
   * build a Bloom filter over the benchmark's distinct n-grams once (a
   * `treeAggregate` — executors build partial filters, the driver ORs
   * them), broadcast it, and drop ~every corpus n-gram MAP-SIDE before
   * anything shuffles. Only the ≈|true overlap| × (1+fpp) survivors
   * enter the exact equi-join that removes false positives — so the
   * output is EXACT (identical to [[decontaminate]] without the
   * doc-frequency cutoff) while the shuffle volume falls from
   * |corpus n-grams| to |overlap|. This is the same runtime-filter
   * technique Spark's own bloom-join rule applies, made explicit
   * because the build side here is an exploded intermediate, not a
   * scan.
   */
  def decontaminateBloom(corpus: DataFrame, bench: DataFrame, n: Int = 3,
      minShared: Int = 2, fpp: Double = 0.01,
      idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "bench_id"): DataFrame = {
    def inv(df: DataFrame, id: String) = df.select(col(id),
      explode(TextFunctions.shingles(col(textCol), n)).as("g"))
    val benchInv = inv(bench.withColumnRenamed(idCol, benchIdCol), benchIdCol)
    val benchGrams = benchInv.select(col("g")).distinct().cache()
    val expected = math.max(benchGrams.count(), 1L)
    // Build the filter over xxhash64(g) longs and probe with Spark's
    // own BloomFilterMightContain expression (the one its runtime
    // bloom-join rule injects) — the probe stays inside whole-stage
    // codegen, where a Scala UDF would force per-row boxing and block
    // the codegen span. Hashing must match end to end: putLong(
    // xxhash64(g)) on the build side, mightContainLong(XxHash64(g)) on
    // the probe side. A null g hashes to the seed and may pass the
    // filter; the exact join below never matches nulls, so output is
    // unchanged.
    val bloom = benchGrams.select(xxhash64(col("g")).as("h"))
      .stat.bloomFilter("h", expected, fpp)
    benchGrams.unpersist()
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val probe = org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bos.toByteArray, org.apache.spark.sql.types.BinaryType),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(org.apache.spark.sql.graft.ColumnBridge.expression(col("g"))))))
    inv(corpus, idCol)
      .filter(probe)                         // map-side: no shuffle yet
      .join(benchInv, "g")                   // exact: false positives die here
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col(benchIdCol)).as("n_bench_docs"))
      .filter(col("n_shared_ngrams") >= minShared)
  }

  /**
   * Weighted sampling without replacement, top-`k` (Efraimidis–Spirtsis
   * A-Res): each row draws u = [[hashFraction]](key) and scores
   * u^(1/weight); the k largest scores are the sample, distributed as
   * weighted draws without replacement. Deterministic (the "draw" is
   * the portable md5 hash), one narrow map + a TakeOrdered (per-
   * partition top-k, then a k-row merge on the driver) — no full sort,
   * no shuffle of the data itself. Weights must be > 0.
   */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = "wsample"): DataFrame =
    df.withColumn("__wsample_score",
        pow(hashFraction(key, salt), lit(1.0) / weight.cast(DoubleType)))
      .orderBy(col("__wsample_score").desc, key)
      .limit(k)
      .drop("__wsample_score")   // internal ranking key, not output

  /**
   * CCNet-shaped LM QUALITY SCORE: a bigram language model with add-k
   * smoothing, trained on the corpus ITSELF, scores every document by
   * its average per-token log-probability (self-perplexity). Documents
   * far below the corpus mean read as boilerplate/garbled text; far
   * above as degenerate repetition — the standard perplexity-bucket
   * quality filter, here without an external KenLM artifact.
   *
   * 100 TB shape: the model IS two hash aggregates (bigram and
   * bigram-head counts) and one scalar (vocabulary size); scoring
   * joins each document bigram against the count tables keyed BY
   * BIGRAM — uniformly distributed, no broadcast of an unbounded
   * vocabulary, document text through exactly one explode. Per-bigram
   * contributions quantize to integer micro-units BEFORE the per-doc
   * sum ([[graft.operators.Retrieval]]'s BM25 trick), so scores are
   * partition-order-independent and replayable exactly.
   */
  def lmScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", alpha: Double = 0.1): DataFrame = {
    import graft.functions.TextFunctions
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("w"))
    val vocab = toks.select(explode(col("w")).as("t"))
      .agg(countDistinct(col("t"))).collect()(0).getLong(0)
    val bigrams = toks.filter(size(col("w")) >= 2)
      .select(Seq(col(idCol), col("w"),
        posexplode(col("w")).as(Seq("i", "prev"))): _*)
      .filter(col("i") < size(col("w")) - 1)
      .select(col(idCol), col("prev"),
        element_at(col("w"), col("i") + 2).as("cur"))
    val cbi = bigrams.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c_bi"))
    val chead = bigrams.groupBy(col("prev"))
      .agg(count(lit(1)).as("c_head"))
    bigrams
      .join(cbi, Seq("prev", "cur"))
      .join(chead, Seq("prev"))
      .select(col(idCol),
        round(log((col("c_bi") + lit(alpha)) /
          (col("c_head") + lit(alpha * vocab))) * lit(1e6), 0)
          .cast(LongType).as("ci"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        floor(sum(col("ci")) / count(lit(1))).cast(LongType)
          .as("avg_logprob_micro"))
  }

  /**
   * DOMAIN-MIXTURE PLANNING: given per-source target weights for the
   * training mix (summing to 1), compute the largest corpus budget the
   * data can serve WITHOUT upsampling — `N = min_s(tokens_s / w_s)` —
   * and each source's keep fraction `w_s·N / tokens_s` (1.0 for the
   * binding source, < 1 for over-represented ones). One aggregate over
   * the corpus; the plan itself is #sources rows, so the global min
   * via an unpartitioned window costs nothing. Fractions round to 6
   * decimals — the hash-filter's own granularity. Sources without a
   * target weight are excluded (weight-0 semantics).
   */
  def mixturePlan(df: DataFrame, sourceCol: String, tokens: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty &&
      math.abs(targets.values.sum - 1.0) < 1e-9,
      "mixture target weights must sum to 1")
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(sourceCol)).agg(sum(tokens).as("tokens_total"))
      .withColumn("weight",
        element_at(typedLit(targets), col(sourceCol)))
      .filter(col("weight").isNotNull)
      .withColumn("corpus_budget",
        min(col("tokens_total") / col("weight"))
          .over(Window.partitionBy()))
      .withColumn("keep_fraction",
        round(col("weight") * col("corpus_budget") / col("tokens_total"), 6))
      .withColumn("sampled_tokens_est",
        (col("keep_fraction") * col("tokens_total")).cast(LongType))
      .select(col(sourceCol), col("tokens_total"), col("weight"),
        col("keep_fraction"), col("sampled_tokens_est"))
  }

  /** Execute a [[mixturePlan]]: deterministic hash-filter each source
    * at its planned keep fraction (the [[stratifiedSample]] machinery
    * with data-derived rates). The plan is #sources rows — broadcast;
    * the corpus pass stays one narrow filter. */
  def sampleToMixture(df: DataFrame, sourceCol: String, key: Column,
      tokens: Column, targets: Map[String, Double],
      salt: String = "mixture"): DataFrame = {
    val plan = mixturePlan(df, sourceCol, tokens, targets)
      .select(col(sourceCol), col("keep_fraction"))
    df.join(broadcast(plan), Seq(sourceCol))
      .filter(hashFraction(key, salt) < col("keep_fraction"))
      .drop("keep_fraction")
  }

  /**
   * Split documents into fixed-size token chunks with overlap — the
   * standard pre-training / retrieval chunking pass. Chunk i covers
   * tokens [i·stride, i·stride + chunkTokens) with
   * stride = chunkTokens − overlapTokens; a document yields
   * max(1, ⌈(n − overlap) / stride⌉) chunks, so short docs emit
   * themselves once and nothing is dropped. Pure array expressions
   * (tokenize once, slice per chunk) — a narrow map + generate, no
   * shuffle; documents with no tokens are filtered out.
   */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, overlapTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, "chunk size must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlap must be in [0, chunk size) — a negative overlap would skip tokens")
    val stride = chunkTokens - overlapTokens
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    val nChunks = greatest(lit(1),
      ceil((n - lit(overlapTokens)).cast(DoubleType) / stride).cast(IntegerType))
    docs.select(col(idCol), toks.as("__toks"), n.as("__n"), nChunks.as("__nc"))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens)).as("__c"))
      .select(col(idCol), col("chunk_id"),
        size(col("__c")).cast(LongType).as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  // ---- sequence packing -------------------------------------------------

  /**
   * Contiguous greedy packing: within each `group`, documents in
   * `order` accumulate into bins of ≈ `budgetTokens` — bin =
   * floor(exclusive-running-sum / budget), so a bin closes once the
   * docs before the current one fill the budget. This is the
   * distributed analogue of first-fit packing for training-sequence
   * construction: one window per group (a single hash-partitioned
   * sort), no driver loop, deterministic. Groups are the parallelism
   * unit — at corpus scale, pack per (source, shard) to bound any one
   * group's sort.
   */
  def packContiguous(docs: DataFrame, budgetTokens: Long,
      group: Column, order: Column, tokenCount: Column): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("n_tokens", tokenCount)
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) /
          budgetTokens).cast(LongType))
  }

  // ---- repetition quality filters (Gopher rules) ------------------------

  /**
   * Per-document repetition statistics (Rae et al., "Scaling Language
   * Models: ... Gopher", arXiv:2112.11446 §A1.1 data pipeline):
   * duplicate-bigram fraction and most-frequent-token share. Both are
   * cheap distributed passes: the bigram fraction is a pure array
   * expression (narrow), the top-token share is two partial-aggregated
   * groupBys keyed by (doc, token) then doc — no all-pairs anything.
   * Returned frame: id, n_tokens, dup_bigram_frac, top_token_share.
   */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val bi = TextFunctions.ngrams(toks, 2)
    val base = docs.select(col(idCol), toks.as("__toks"), bi.as("__bi"))
      .select(col(idCol),
        size(col("__toks")).cast(LongType).as("n_tokens"),
        when(size(col("__bi")) > 0,
          lit(1.0) - size(array_distinct(col("__bi"))).cast(DoubleType) /
            size(col("__bi")))
          .otherwise(lit(0.0)).as("dup_bigram_frac"),
        col("__toks"))
    val freq = base.select(col(idCol), explode(col("__toks")).as("t"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg((max(col("c")).cast(DoubleType) / sum(col("c"))).as("top_token_share"))
    base.drop("__toks")
      .join(freq, Seq(idCol), "left")
      .withColumn("top_token_share", coalesce(col("top_token_share"), lit(0.0)))
  }

  /**
   * DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
   * arXiv:2302.03169): score every raw document by how much its hashed
   * unigram distribution looks like a TARGET corpus, as the summed
   * per-token log importance ratio `Σ log(p_target[b]/p_raw[b])` over
   * Laplace-smoothed bucket probabilities. High scores = most
   * target-like; selection is a top-k (or weighted sample) over them.
   *
   * Scale shape: features are portable md5 hash buckets (the oracle
   * derives identical buckets in SQL), so the model is TWO fixed-size
   * (`nBuckets`-row) count aggregates — the per-bucket log-ratio table
   * broadcasts and scoring is one narrow map + one per-doc sum, no
   * shuffle carries text. Per-token ratios quantize to integer
   * micro-units BEFORE the sum (exact integer addition), so scores are
   * partition-order-independent — the [[lmScore]] discipline.
   */
  def dsirScore(raw: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      nBuckets: Int = 1024, alpha: Double = 1.0): DataFrame = {
    def bucket(t: Column): Column =
      pmod(conv(substring(md5(t), 1, 15), 16, 10).cast(LongType),
        lit(nBuckets.toLong))
    def bucketed(df: DataFrame): DataFrame =
      df.select(col(idCol),
          explode(TextFunctions.tokens(col(textCol))).as("__t"))
        .select(col(idCol), bucket(col("__t")).as("b"))
    // DSIR is two passes over the raw corpus (fit the bucket model,
    // then score) — both narrow token→bucket maps feeding fixed-size
    // aggregates, so re-scanning beats pinning the exploded token
    // frame in memory
    val rawB = bucketed(raw)
    val tgtCounts = bucketed(target).groupBy(col("b"))
      .agg(count(lit(1)).as("c_t"))
    val rawCounts = rawB.groupBy(col("b")).agg(count(lit(1)).as("c_r"))
    // two scalar totals (token counts) from the FIXED-SIZE bucket
    // aggregates — no extra pass over either corpus
    val tTot = tgtCounts.agg(coalesce(sum(col("c_t")), lit(0L)))
      .collect()(0).getLong(0)
    val rTot = rawCounts.agg(coalesce(sum(col("c_r")), lit(0L)))
      .collect()(0).getLong(0)
    val b = nBuckets.toDouble
    val ratios = rawCounts.join(tgtCounts, Seq("b"), "left")
      .select(col("b"),
        round(log(((coalesce(col("c_t"), lit(0L)) + alpha) / (tTot + alpha * b)) /
          ((col("c_r") + alpha) / (rTot + alpha * b))) * lit(1e6), 0)
          .cast(LongType).as("lr_micro"))
    rawB.join(broadcast(ratios), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lr_micro")).as("dsir_score_micro"))
  }
}
