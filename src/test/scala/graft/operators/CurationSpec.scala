package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("assignSplit: disjoint, exhaustive, deterministic, ~weight-proportioned") {
    val docs = spark.range(10000).toDF("id")
    val split = Curation.assignSplit(docs, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.sum === 10000L)
    assert(math.abs(counts("train") - 8000) < 300, counts)
    assert(math.abs(counts("val") - 1000) < 150, counts)
    assert(math.abs(counts("test") - 1000) < 150, counts)
    // stability: the same keys get the same split regardless of
    // partitioning or corpus size (hash of key only)
    val sub = Curation.assignSplit(
      spark.range(100).toDF("id").repartition(7), col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    val full = split.filter(col("id") < 100).as[(Long, String)].collect().toMap
    assert(sub === full)
  }

  test("stratifiedSample: per-stratum rates hit, deterministic by key") {
    val df = spark.range(20000)
      .select(col("id"), (when(col("id") % 2 === 0, "a").otherwise("b")).as("s"))
    val sampled = Curation.stratifiedSample(df, col("s"), col("id"),
      Map("a" -> 0.5), defaultRate = 0.05)
    val counts = sampled.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("a") - 5000) < 300, counts)
    assert(math.abs(counts("b") - 500) < 120, counts)
    // re-running draws the identical sample
    assert(sampled.agg(sum("id")).head.getLong(0) ===
      Curation.stratifiedSample(df, col("s"), col("id"), Map("a" -> 0.5), 0.05)
        .agg(sum("id")).head.getLong(0))
  }

  test("decontaminate flags docs overlapping the benchmark, not clean docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "entirely unrelated words describing cabbages and kings here"),
      (3L, "quick brown fox jumps over something else entirely now")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "a benchmark question about the quick brown fox jumps clearly")
    ).toDF("doc_id", "text")
    val hits = Curation.decontaminate(corpus, bench, n = 3, minShared = 2)
      .select("doc_id", "n_shared_ngrams").as[(Long, Long)].collect().toMap
    // docs 1 and 3 share ≥2 3-grams ("quick brown fox", "brown fox jumps");
    // doc 2 shares none
    assert(hits.keySet === Set(1L, 3L), hits)
    assert(hits.values.forall(_ >= 2))
  }

  test("decontaminateBloom: identical hits to the exact inverted-index join") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "entirely unrelated words describing cabbages and kings here"),
      (3L, "quick brown fox jumps over something else entirely now"),
      (4L, "more clean filler text that overlaps with no benchmark at all")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "a benchmark question about the quick brown fox jumps clearly")
    ).toDF("doc_id", "text")
    val exact = Curation.decontaminate(corpus, bench, n = 3, minShared = 2,
        maxDocFreq = Int.MaxValue)
      .select("doc_id", "n_shared_ngrams", "n_bench_docs")
      .as[(Long, Long, Long)].collect().toSet
    val bloomed = Curation.decontaminateBloom(corpus, bench, n = 3, minShared = 2)
      .select("doc_id", "n_shared_ngrams", "n_bench_docs")
      .as[(Long, Long, Long)].collect().toSet
    // the bloom prefilter may only SHRINK the joined volume, never the
    // answer — false positives die in the verify join
    assert(bloomed === exact)
    assert(exact.map(_._1) === Set(1L, 3L))
  }

  test("weightedSample: deterministic, weight-monotone on equal draws") {
    val df = spark.range(1000).toDF("id")
      .withColumn("w", (col("id") % 10 + 1).cast("double"))
    val s1 = Curation.weightedSample(df, col("id"), col("w"), k = 50)
      .select("id").as[Long].collect().toSeq
    val s2 = Curation.weightedSample(df, col("id"), col("w"), k = 50)
      .select("id").as[Long].collect().toSeq
    assert(s1 === s2)                  // same draws every run
    assert(s1.distinct.size === 50)    // without replacement
    // heavier rows must be overrepresented: mean weight of the sample
    // is well above the population mean (5.5)
    val meanW = Curation.weightedSample(df, col("id"), col("w"), k = 200)
      .agg(avg("w")).head.getDouble(0)
    assert(meanW > 6.0, s"weighted sample mean weight $meanW")
  }

  test("chunkDocuments: overlapping windows cover every token, short docs emit once") {
    val text100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text100), (2L, "just five little tokens here"),
      (3L, "")).toDF("doc_id", "text")
    val chunks = Curation.chunkDocuments(docs, chunkTokens = 64, overlapTokens = 16)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Long, String)].collect()
    // 100 tokens, stride 48 → ceil((100-16)/48) = 2 chunks: [1,64], [49,100]
    val d1 = chunks.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3)).toSeq === Seq((0, 64L), (1, 52L)))
    assert(d1(0)._4.startsWith("t1 ") && d1(0)._4.endsWith(" t64"))
    assert(d1(1)._4.startsWith("t49 ") && d1(1)._4.endsWith(" t100"))
    // overlap: chunk 1 re-covers tokens 49-64
    assert(d1(1)._4.split(" ").take(16).toSeq ===
      d1(0)._4.split(" ").takeRight(16).toSeq)
    // short doc → exactly one chunk of its own length; empty doc → none
    assert(chunks.filter(_._1 == 2L).map(c => (c._2, c._3)).toSeq === Seq((0, 5L)))
    assert(!chunks.exists(_._1 == 3L))
  }

  test("packContiguous: bins close when the docs before fill the budget") {
    val docs = Seq(
      ("s", 1L, 300L), ("s", 2L, 300L), ("s", 3L, 300L), ("s", 4L, 50L),
      ("t", 1L, 900L), ("t", 2L, 10L)
    ).toDF("source", "doc_id", "nt")
    val packed = Curation.packContiguous(docs, budgetTokens = 512,
        group = col("source"), order = col("doc_id"), tokenCount = col("nt"))
      .select("source", "doc_id", "bin").as[(String, Long, Long)]
      .collect().toSet
    // s: cum-before = 0,300,600,900 → bins 0,0,1,1 ; t: 0,900 → 0,1
    assert(packed === Set(("s", 1L, 0L), ("s", 2L, 0L), ("s", 3L, 1L),
      ("s", 4L, 1L), ("t", 1L, 0L), ("t", 2L, 1L)))
  }

  test("repetitionStats: hand-computed fractions, empty doc safe") {
    val docs = Seq(
      (1L, "a b a b a"),      // bigrams: ab,ba,ab,ba → dup 0.5; top a: 3/5
      (2L, "x y z"),          // all distinct → dup 0 ; top 1/3
      (3L, "")                // empty → zeros
    ).toDF("doc_id", "text")
    val st = Curation.repetitionStats(docs)
      .select("doc_id", "n_tokens", "dup_bigram_frac", "top_token_share")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(st(1L)._1 === 5L)
    assert(math.abs(st(1L)._2 - 0.5) < 1e-12)
    assert(math.abs(st(1L)._3 - 0.6) < 1e-12)
    assert(st(2L) === ((3L, 0.0, math.abs(1.0 / 3))))
    assert(st(3L) === ((0L, 0.0, 0.0)))
  }

  test("bucketed join: no shuffle exchange between bucketed tables") {
    val li = Td2.lineitemSmall(spark, sf0001)
    val o = Td2.ordersSmall(spark, sf0001)
    graft.queries.Pipeline2.dropManagedTable(spark, "spec_bkt_lineitem")
    graft.queries.Pipeline2.dropManagedTable(spark, "spec_bkt_orders")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("spec_bkt_lineitem")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("spec_bkt_orders")
    val joined = spark.table("spec_bkt_lineitem").hint("merge")
      .join(spark.table("spec_bkt_orders"),
        col("l_orderkey") === col("o_orderkey"))
    joined.count() // materialize so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      plan)
    // same rows as the plain (shuffled) join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === expected)
  }

  /** tiny projections for the bucketing test */
  private object Td2 {
    def lineitemSmall(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.queries.Td.lineitem(s, dir).select("l_orderkey", "l_quantity")
    def ordersSmall(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.queries.Td.orders(s, dir).select("o_orderkey", "o_orderpriority")
  }

  test("connectedComponents: path graph needs multiple rounds, isolated pair kept apart") {
    // path 1-2-3-4-5 (diameter 4 → >1 propagation round) + pair 10-11
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("mixturePlan: binding source keeps 1.0; fractions hit the target mix") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L),            // a: 200 tokens
      ("b", 3L, 300L), ("b", 4L, 300L),            // b: 600 tokens
      ("c", 5L, 999L)).toDF("source", "doc_id", "nt")
    val plan = Curation.mixturePlan(docs, "source", col("nt"),
        Map("a" -> 0.5, "b" -> 0.5))
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // budget N = min(200/0.5, 600/0.5) = 400 → a keeps 1.0, b keeps
    // 0.5*400/600 = 1/3; untargeted c is absent
    assert(plan.keySet === Set("a", "b"))
    assert(plan("a")._4 === 1.0)
    assert(plan("b")._4 === 0.333333)
    assert(plan("a")._5 === 200L && plan("b")._5 === 199L)
  }

  test("lmScore: corpus-frequent continuations score above junk bigrams") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the cat sat on the mat"),
      (4L, "zq xv qqj lkw pzt mnb")).toDF("doc_id", "text")
    val s = Curation.lmScore(docs).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // docs 1-3 share almost every bigram; doc 4's are all singletons
    // over a different head distribution — strictly less probable
    assert(s(1L) > s(4L) && s(3L) === s(1L))
    assert(s(2L) < s(1L))          // one rare continuation ("the rug")
  }

  test("dsirScore ranks target-like documents above off-target ones") {
    // raw corpus: "english-ish" docs sharing the target's vocabulary
    // vs "code-ish" docs that don't; target = the english slice. DSIR
    // must put every english doc above every code doc.
    val en = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "a quiet morning with the brown dog and the fox", "en"),
      (3L, "the dog jumps and the fox runs over the field", "en"))
    val code = Seq(
      (10L, "def foo(bar): return bar * 42 # xyzzy", "code"),
      (11L, "SELECT plugh FROM corge WHERE grault = 7", "code"))
    val raw = (en ++ code).toDF("doc_id", "text", "lang")
    val scored = Curation.dsirScore(raw, raw.filter(col("lang") === "en"))
      .select("doc_id", "dsir_score_micro").as[(Long, Long)].collect().toMap
    assert(scored.keySet === Set(1L, 2L, 3L, 10L, 11L))
    val minEn = Seq(1L, 2L, 3L).map(scored).min
    val maxCode = Seq(10L, 11L).map(scored).max
    assert(minEn > maxCode,
      s"english floor $minEn must beat code ceiling $maxCode")
    // deterministic: the same inputs score identically run-to-run
    val again = Curation.dsirScore(raw, raw.filter(col("lang") === "en"))
      .select("doc_id", "dsir_score_micro").as[(Long, Long)].collect().toMap
    assert(again === scored)
  }

  test("tokenCount parity: packContiguous uses the oracle's token definition") {
    val docs = Seq(("s", 1L, "  hello   world  "), ("s", 2L, "")).toDF("source", "doc_id", "text")
    val out = Curation.packContiguous(docs, 512, col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")))
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 2L -> 0L))
  }
}
