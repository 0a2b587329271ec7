package graft.queries

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Round-4 curation surface: benchmark decontamination, deterministic
 * sampling/splits, sequence packing, repetition quality filters
 * (Gopher rules), embedding centroids, and a bucketed co-located join.
 * Every query is oracle-checked — sampling/split decisions are pure
 * md5-hash functions the DuckDB side re-derives exactly.
 */
object Pipeline2 {

  /** Drop a session-catalog table AND its leftover warehouse directory —
    * the in-memory catalog forgets tables across JVMs while their
    * location survives on disk, which makes a bare saveAsTable fail
    * with LOCATION_ALREADY_EXISTS on the next run. */
  def dropManagedTable(s: org.apache.spark.sql.SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    wh.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wh, true)
  }

  /** DuckDB replica of [[Curation.hashFraction]] for a BIGINT key. */
  private def duckHash(keyExpr: String, salt: String): String =
    s"(CAST('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || '_$salt'), 1, 15) " +
      s"AS BIGINT) % 1000000) / 1000000.0"

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Benchmark decontamination: corpus docs sharing ≥2 distinct
    // 3-grams with the held-out set (doc_id % 97 == 0 plays the role
    // of the benchmark). Inverted-index equi-join — never |C|×|B|.
    Q("decontaminate_ngram", fn = (s, dir) => {
      val docs = Td.documents(s, dir)
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Curation.decontaminate(corpus, bench, n = 3, minShared = 2,
          maxDocFreq = 100)
        .orderBy(col("doc_id"))
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> x <> '') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(w[i:i+2], ' ')
                              for i in generate_series(1, len(w) - 2)]) AS s
        FROM toks WHERE len(w) >= 3),
      inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
      corpus AS (SELECT * FROM inv WHERE doc_id % 97 <> 0),
      bench AS (SELECT doc_id AS bench_id, g FROM inv WHERE doc_id % 97 = 0),
      keep AS (SELECT g FROM corpus GROUP BY g HAVING count(*) <= 100)
      SELECT c.doc_id,
             count(DISTINCT c.g) AS n_shared_ngrams,
             count(DISTINCT b.bench_id) AS n_bench_docs
      FROM corpus c JOIN keep USING (g) JOIN bench b USING (g)
      GROUP BY c.doc_id
      HAVING count(DISTINCT c.g) >= 2
      ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Dedup cluster resolution: connected components over the
    // MinHash-LSH near-dup pair graph (min-label propagation — O(|E|)
    // label rows per round, converges at cluster diameter). The oracle
    // rebuilds the identical pair set, then closes it transitively with
    // a recursive CTE — the whole pairs→clusters path is hash-checked.
    Q("dedup_clusters", fn = (s, dir) => {
      val pairs = graft.operators.Dedup.minhashLsh(
        Td.documents(s, dir), threshold = 0.5)
      graft.operators.Dedup.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy(col("doc_id"))
    }, oracle = Some("""
      WITH RECURSIVE
      toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> x <> '') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(w[i:i+2], ' ')
                              for i in generate_series(1, len(w) - 2)]) AS s
        FROM toks WHERE len(w) >= 3),
      inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
      keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) >= 2),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM inv a JOIN keep USING (g) JOIN inv b USING (g)
        WHERE a.doc_id < b.doc_id),
      pairs AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b
        WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
              len(list_distinct(list_concat(sa.s, sb.s))) >= 0.5),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT a AS id, a AS r FROM edges
        UNION
        SELECT e.a AS id, r.r FROM edges e JOIN reach r ON r.id = e.b)
      SELECT id AS doc_id, min(r) AS component
      FROM reach GROUP BY id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Deterministic stratified sampling (domain mixing): per-language
    // keep rates as one narrow hash filter; the oracle re-derives the
    // identical md5 fraction, so the sampled multiset is checked
    // exactly, not statistically.
    Q("sample_stratified", fn = (s, dir) =>
      Curation.stratifiedSample(Td.documents(s, dir), col("lang"),
          col("doc_id"), Map("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("lang")),
      oracle = Some(s"""
      SELECT lang, count(*) AS n_sampled FROM documents
      WHERE ${duckHash("doc_id", "strata")} <
            CASE WHEN lang = 'en' THEN 0.5
                 WHEN lang = 'de' THEN 0.25 ELSE 0.1 END
      GROUP BY lang ORDER BY lang""")),

    // Domain-mixture planning + execution: the largest corpus budget
    // the data serves WITHOUT upsampling (N = min tokens_s/w_s), each
    // source's keep fraction, then the deterministic hash-filter
    // sample at those data-derived rates. The oracle re-derives the
    // same plan arithmetic and the same md5 fractions, so both the
    // PLAN and the sampled multiset are value-checked.
    Q("mixture_plan", fn = (s, dir) =>
      Curation.mixturePlan(Td.documents(s, dir), "source",
          TextFunctions.tokenCount(col("text")),
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .orderBy(col("source")),
      oracle = Some("""
      WITH t AS (
        SELECT source,
               CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> x <> '')) AS BIGINT) AS nt
        FROM documents),
      tot AS (SELECT source, SUM(nt) AS tokens_total FROM t GROUP BY source),
      plan AS (
        SELECT source, tokens_total,
               CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                           WHEN 'src2' THEN 0.2 END AS DOUBLE) AS weight
        FROM tot WHERE source IN ('src0','src1','src2')),
      budget AS (SELECT min(tokens_total / weight) AS n FROM plan)
      SELECT p.source, CAST(p.tokens_total AS BIGINT) AS tokens_total,
             p.weight,
             round(p.weight * b.n / p.tokens_total, 6) AS keep_fraction,
             CAST(floor(round(p.weight * b.n / p.tokens_total, 6)
                  * p.tokens_total) AS BIGINT) AS sampled_tokens_est
      FROM plan p, budget b ORDER BY p.source""")),

    Q("sample_to_mixture", fn = (s, dir) =>
      Curation.sampleToMixture(Td.documents(s, dir), "source",
          col("doc_id"), TextFunctions.tokenCount(col("text")),
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
        .orderBy(col("source")),
      oracle = Some(s"""
      WITH t AS (
        SELECT doc_id, source,
               CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                 x -> x <> '')) AS BIGINT) AS nt
        FROM documents),
      tot AS (SELECT source, SUM(nt) AS tokens_total FROM t GROUP BY source),
      plan AS (
        SELECT source, tokens_total,
               CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                           WHEN 'src2' THEN 0.2 END AS DOUBLE) AS weight
        FROM tot WHERE source IN ('src0','src1','src2')),
      budget AS (SELECT min(tokens_total / weight) AS n FROM plan),
      frac AS (
        SELECT p.source,
               round(p.weight * b.n / p.tokens_total, 6) AS keep_fraction
        FROM plan p, budget b)
      SELECT t.source, count(*) AS n_docs, CAST(sum(t.nt) AS BIGINT) AS n_tokens
      FROM t JOIN frac f ON f.source = t.source
      WHERE ${duckHash("doc_id", "mixture")} < f.keep_fraction
      GROUP BY t.source ORDER BY t.source""")),

    // CCNet-shaped self-perplexity: an add-k bigram LM trained on the
    // corpus itself scores each doc's average token log-prob. The
    // oracle retrains the identical model in SQL and replays the
    // micro-unit quantization, so model AND scores are value-checked.
    Q("text_lm_score", fn = (s, dir) =>
      Curation.lmScore(Td.documents(s, dir))
        .orderBy(col("doc_id")),
      oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> x <> '') AS w
        FROM documents),
      v AS (SELECT count(DISTINCT t) AS nv
            FROM (SELECT unnest(w) AS t FROM toks)),
      big AS (
        SELECT doc_id, unnest(
          [{'prev': w[i], 'cur': w[i+1]} for i in generate_series(1, len(w) - 1)],
          recursive := true)
        FROM toks WHERE len(w) >= 2),
      cbi AS (SELECT prev, cur, count(*) AS c_bi FROM big GROUP BY prev, cur),
      chead AS (SELECT prev, count(*) AS c_head FROM big GROUP BY prev),
      scored AS (
        SELECT b.doc_id,
               CAST(round(ln((cbi.c_bi + 0.1) / (chead.c_head + 0.1 * v.nv))
                    * 1e6, 0) AS BIGINT) AS ci
        FROM big b JOIN cbi USING (prev, cur) JOIN chead USING (prev)
        CROSS JOIN v)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(floor(sum(ci) * 1.0 / count(*)) AS BIGINT) AS avg_logprob_micro
      FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // Hash-range train/val/test split: disjoint, exhaustive, stable as
    // the corpus grows (a doc never migrates between splits).
    Q("split_train_test", fn = (s, dir) =>
      Curation.assignSplit(Td.documents(s, dir), col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("lang")),
      oracle = Some(s"""
      WITH f AS (
        SELECT lang, ${duckHash("doc_id", "split")} AS fr FROM documents)
      SELECT CASE WHEN fr < 0.8 THEN 'train'
                  WHEN fr < 0.9 THEN 'val' ELSE 'test' END AS split,
             lang, count(*) AS n
      FROM f GROUP BY split, lang ORDER BY split, lang""")),

    // ------------------------------------------------------------------
    // Sequence packing: contiguous greedy bins of ~512 tokens per
    // source — one window per group, bin = floor(exclusive-cumsum /
    // budget), replayed exactly by the oracle's window sum.
    Q("pack_sequences", fn = (s, dir) =>
      Curation.packContiguous(Td.documents(s, dir), budgetTokens = 512,
          group = col("source"), order = col("doc_id"),
          tokenCount = TextFunctions.tokenCount(col("text")))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
        .orderBy(col("source"), col("bin")),
      oracle = Some("""
      WITH t AS (
        SELECT doc_id, source,
               CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> x <> '')) AS BIGINT) AS nt
        FROM documents),
      b AS (
        SELECT source, nt,
               CAST(floor(coalesce(sum(nt) OVER (PARTITION BY source
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) / 512) AS BIGINT) AS bin
        FROM t)
      SELECT source, bin, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS bin_tokens
      FROM b GROUP BY source, bin ORDER BY source, bin""")),

    // ------------------------------------------------------------------
    // PII redaction: plant deterministic emails/phones/IPs (symmetric
    // in the oracle), count with regexp_count, redact with chained
    // regexp_replace; md5 of the redacted text checks the full rewrite
    // byte-for-byte. Narrow codegen'd map — no shuffle.
    Q("pii_redact", fn = (s, dir) => {
      val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val phoneRe = """\+\d[\d\- ]{7,}\d"""
      val ipRe = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
      val planted = concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast(StringType),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" call +1 555-123-4567 now"))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast(StringType),
            lit("."), (col("doc_id") % 100).cast(StringType)))
          .otherwise(lit("")))
      val redacted = regexp_replace(regexp_replace(regexp_replace(
        planted, emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>")
      Td.documents(s, dir).select(col("doc_id"),
          regexp_count(planted, lit(emailRe)).cast(LongType).as("n_emails"),
          regexp_count(planted, lit(phoneRe)).cast(LongType).as("n_phones"),
          regexp_count(planted, lit(ipRe)).cast(LongType).as("n_ips"),
          md5(redacted).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }, oracle = Some("""
      WITH p AS (
        SELECT doc_id,
               text ||
               CASE WHEN doc_id % 5 = 0 THEN ' contact user' ||
                 CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
               CASE WHEN doc_id % 7 = 0 THEN ' call +1 555-123-4567 now'
                 ELSE '' END ||
               CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' ||
                 CAST(doc_id % 256 AS VARCHAR) || '.' ||
                 CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(t, '\+\d[\d\- ]{7,}\d')) AS BIGINT) AS n_phones,
             CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
             md5(regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+\d[\d\- ]{7,}\d', '<PHONE>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
      FROM p ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Gopher-style repetition filters: duplicate-bigram fraction (pure
    // array expression) + top-token share (two partial-agg groupBys).
    // keep thresholds computed on UNROUNDED doubles — both engines do
    // the identical IEEE arithmetic, so the flag is deterministic.
    Q("gopher_repetition", fn = (s, dir) =>
      Curation.repetitionStats(Td.documents(s, dir))
        .select(col("doc_id"), col("n_tokens"),
          round(col("dup_bigram_frac"), 6).as("dup_bigram_frac"),
          round(col("top_token_share"), 6).as("top_token_share"),
          (col("dup_bigram_frac") <= 0.1 && col("top_token_share") <= 0.12)
            .as("keep"))
        .orderBy(col("doc_id")),
      oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> x <> '') AS w
        FROM documents),
      bi AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
               CASE WHEN len(w) >= 2
                 THEN [array_to_string(w[i:i+1], ' ')
                       for i in generate_series(1, len(w) - 1)]
                 ELSE [] END AS b
        FROM toks),
      dup AS (
        SELECT doc_id, n_tokens,
               CASE WHEN len(b) > 0
                 THEN 1 - CAST(len(list_distinct(b)) AS DOUBLE) / len(b)
                 ELSE 0.0 END AS dupf
        FROM bi),
      freq AS (
        SELECT doc_id, t, count(*) AS c FROM
          (SELECT doc_id, unnest(w) AS t FROM toks)
        GROUP BY doc_id, t),
      top AS (
        SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS tops
        FROM freq GROUP BY doc_id)
      SELECT d.doc_id, d.n_tokens,
             round(d.dupf, 6) AS dup_bigram_frac,
             round(coalesce(t.tops, 0.0), 6) AS top_token_share,
             (d.dupf <= 0.1 AND coalesce(t.tops, 0.0) <= 0.12) AS keep
      FROM dup d LEFT JOIN top t USING (doc_id)
      ORDER BY d.doc_id""")),

    // ------------------------------------------------------------------
    // Per-label centroids of L2-normalized embeddings: posexplode →
    // partial-agg avg keyed by (label, dim) — only (label, dim, partial
    // sum) triples shuffle, never vectors. The oracle normalizes with
    // the same double arithmetic (list_dot_product matches the native
    // kernel bit-for-bit); round(6) absorbs summation-order jitter.
    Q("embedding_centroids", fn = (s, dir) => {
      val e = Td.embeddings(s, dir)
      val nrm = sqrt(VectorFunctions.dot(col("embedding"), col("embedding")))
      e.select(col("label"), nrm.as("__nrm"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(round(avg(col("v").cast(DoubleType) / col("__nrm")), 6)
          .as("centroid"))
        .orderBy(col("label"), col("dim"))
    }, oracle = Some("""
      SELECT label, CAST(i - 1 AS INTEGER) AS dim,
             round(avg(embedding[i]::DOUBLE /
               sqrt(list_dot_product(embedding::DOUBLE[],
                 embedding::DOUBLE[]))), 6) AS centroid
      FROM embeddings, generate_series(1, 64) g(i)
      GROUP BY label, i ORDER BY label, dim""")),

    // ------------------------------------------------------------------
    // Change feed out of the transactional table: TxTable.diff replays
    // insert/update/delete between committed snapshots (computed
    // Delta-CDF). The staged seed + merge batch let the oracle classify
    // the same changes in SQL — the append→merge→delete history and the
    // diff logic are both under the hash check.
    Q("table_change_feed", fn = (s, dir) => {
      import graft.ingest.SampleData
      import graft.model.Schemas
      import graft.table.TableCatalog
      import org.apache.hadoop.fs.Path
      val seedDir = Pipeline.stagedInput("cdf_seed", "parquet") {
        SampleData.transactions(s, 100, seed = 5L)
      }
      val batchDir = Pipeline.stagedInput("cdf_batch", "parquet") {
        val seed = s.read.parquet(seedDir)
        val mods = seed.orderBy("transaction_id").limit(20)
          .withColumn("amount", (col("amount") + lit(100)).cast(DecimalType(12, 2)))
          .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
        val inserts = SampleData.transactions(s, 120, seed = 5L)
          .join(seed.select("transaction_id"), Seq("transaction_id"), "left_anti")
        mods.unionByName(inserts.select(mods.columns.map(col): _*))
      }
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("cdf")))
      val t = cat.createTable("analytics", "txns_cdf",
        Schemas.transactions, Seq("date"))
      t.append(s.read.parquet(seedDir))                                  // v1
      t.merge(s.read.parquet(batchDir),
        key = "transaction_id", orderCol = "processing_timestamp")       // v2
      t.delete(col("risk_score") === "HIGH")                             // v3
      t.diff(1, 2, "transaction_id").withColumn("phase", lit("v1_v2"))
        .unionByName(
          t.diff(2, 3, "transaction_id").withColumn("phase", lit("v2_v3")))
        .select(col("phase"), col("_change_type").as("change_type"),
          col("transaction_id"), col("amount").cast(DoubleType).as("amount"))
        .orderBy(col("phase"), col("change_type"), col("transaction_id"))
    }, oracle = Some(s"""
      WITH seed AS (SELECT * FROM read_parquet('${Pipeline.oracleInputsRoot}/cdf_seed/*.parquet')),
      batch AS (SELECT * FROM read_parquet('${Pipeline.oracleInputsRoot}/cdf_batch/*.parquet')),
      v2 AS (
        SELECT * FROM batch
        UNION ALL
        SELECT s.* FROM seed s WHERE NOT EXISTS
          (SELECT 1 FROM batch b WHERE b.transaction_id = s.transaction_id)),
      d12 AS (
        SELECT 'v1_v2' AS phase,
               CASE WHEN s.transaction_id IS NULL THEN 'insert'
                    ELSE 'update' END AS change_type,
               b.transaction_id, CAST(b.amount AS DOUBLE) AS amount
        FROM batch b LEFT JOIN seed s ON b.transaction_id = s.transaction_id),
      d23 AS (
        SELECT 'v2_v3' AS phase, 'delete' AS change_type,
               transaction_id, CAST(amount AS DOUBLE) AS amount
        FROM v2 WHERE risk_score = 'HIGH')
      SELECT * FROM d12 UNION ALL SELECT * FROM d23
      ORDER BY phase, change_type, transaction_id""")),

    // ------------------------------------------------------------------
    // Bucketed co-located join (SURVEY "co-locate joins via bucketing"):
    // both sides written bucketed+sorted on the join key into the
    // session catalog, then sort-merge joined with ZERO shuffle — the
    // exchange-free plan is asserted in PlanSpec. At 100 TB this is the
    // difference between re-shuffling 100 TB per join and reading
    // pre-aligned buckets.
    Q("join_bucketed", fn = (s, dir) => {
      val li = Td.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"))
      val o = Td.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
      dropManagedTable(s, "graft_bkt_lineitem")
      dropManagedTable(s, "graft_bkt_orders")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("graft_bkt_lineitem")
      o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_bkt_orders")
      s.table("graft_bkt_lineitem").hint("merge")
        .join(s.table("graft_bkt_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }, oracle = Some("""
      SELECT o_orderpriority, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))
  )
}
