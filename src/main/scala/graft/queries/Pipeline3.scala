package graft.queries

import graft.ingest.{CdcPipeline, SampleData}
import graft.model.Schemas
import graft.operators.Curation
import graft.table.TableCatalog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Round-5 surface: row-level DML (UPDATE / DELETE as SQL text routed to
 * the transactional table), delete-propagating CDC merge (the REMOVE
 * path the reference's Lambda drops), incremental materialized-view
 * maintenance off the pre-image change feed, Bloom-prefiltered
 * decontamination, and weighted sampling. Every query is oracle-checked
 * — table mutations replay in SQL from staged seed inputs.
 */
object Pipeline3 {

  /** DuckDB replica of [[Curation.hashFraction]] (same as Pipeline2's). */
  private def duckHash(keyExpr: String, salt: String): String =
    s"(CAST('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || '_$salt'), 1, 15) " +
      s"AS BIGINT) % 1000000) / 1000000.0"

  private val root = Pipeline.oracleInputsRoot

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Row-level DML as SQL TEXT: UPDATE … SET … WHERE and DELETE FROM …
    // routed through GraftSql to copy-on-write rewrites on the
    // transactional table (the Athena/Iceberg row-level-ops surface the
    // reference gets from its engine; update_metadata.py manages the
    // same tables by SQL string). SET expressions read PRE-update
    // values; the oracle replays both statements over the staged seed.
    Q("table_update_delete", fn = (s, dir) => {
      val seedDir = Pipeline.stagedInput("ud_seed", "parquet") {
        SampleData.transactions(s, 200, seed = 11L)
      }
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("upddel")))
      val t = cat.createTable("analytics", "txns_ud",
        Schemas.transactions, Seq("date"))
      t.append(s.read.parquet(seedDir))
      cat.sql("UPDATE analytics.txns_ud SET status = 'REVIEWED', " +
        "amount = amount * 2 WHERE risk_score = 'HIGH'")
      cat.sql("DELETE FROM analytics.txns_ud WHERE status = 'DECLINED'")
      t.toDF.select(col("transaction_id"),
          col("amount").cast(DoubleType).as("amount"),
          col("status"), col("risk_score"))
        .orderBy(col("transaction_id"))
    }, oracle = Some(s"""
      WITH seed AS (SELECT * FROM read_parquet('$root/ud_seed/*.parquet')),
      u AS (
        SELECT transaction_id,
               CAST(CASE WHEN risk_score = 'HIGH' THEN amount * 2
                         ELSE amount END AS DOUBLE) AS amount,
               CASE WHEN risk_score = 'HIGH' THEN 'REVIEWED'
                    ELSE status END AS status,
               risk_score
        FROM seed)
      SELECT * FROM u WHERE status IS NULL OR status <> 'DECLINED'
      ORDER BY transaction_id""")),

    // ------------------------------------------------------------------
    // DELETE-PROPAGATING CDC merge: where the reference drops REMOVE
    // events (lambda/transform/index.py:25), this path forwards them —
    // batch 2 carries REMOVEs for every HIGH-risk row (pre-image wire
    // shape: Keys + OldImage) racing later MODIFY re-inserts for the
    // FLAGGED subset. Last-writer-wins by processing_timestamp decides
    // per key: the re-inserted rows survive with new values, the rest
    // of the HIGH rows are deleted from the table. The oracle replays
    // exactly that algebra from the staged row sets.
    Q("cdc_remove_merge", fn = (s, dir) => {
      val seedDir = Pipeline.stagedInput("cdcrm_seed", "parquet") {
        SampleData.transactions(s, 300, seed = 13L)
      }
      val rmDir = Pipeline.stagedInput("cdcrm_removes", "parquet") {
        s.read.parquet(seedDir).filter(col("risk_score") === "HIGH")
          .withColumn("processing_timestamp",
            col("processing_timestamp") + 10000L)
      }
      val reDir = Pipeline.stagedInput("cdcrm_reinserts", "parquet") {
        s.read.parquet(seedDir)
          .filter(col("risk_score") === "HIGH" && col("status") === "FLAGGED")
          .withColumn("processing_timestamp",
            col("processing_timestamp") + 20000L)
          .withColumn("amount", (col("amount") + 1000).cast(DecimalType(12, 2)))
          .withColumn("status", lit("RESTORED"))
      }
      // frames go through a storage boundary, like every ingest path
      // (generator and decoder must not fuse into one Catalyst plan)
      val f1 = Pipeline.stagedInput("cdcrm_frames1", "json") {
        SampleData.toKinesisFrames(
          SampleData.toCdcEnvelopes(s.read.parquet(seedDir)))
      }
      val f2 = Pipeline.stagedInput("cdcrm_frames2", "json") {
        SampleData.toKinesisFrames(
          SampleData.toCdcRemoveEnvelopes(s.read.parquet(rmDir)).unionByName(
            SampleData.toCdcEnvelopes(s.read.parquet(reDir), lit("MODIFY"))))
      }
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("cdcrm")))
      val t = cat.createTable("analytics", "txns_rm",
        Schemas.transactions, Seq("date"))
      t.merge(CdcPipeline.kinesisPath(
          s.read.schema(Schemas.kinesisFrame).json(f1)),
        key = "transaction_id", orderCol = "processing_timestamp")
      t.merge(CdcPipeline.kinesisPathWithDeletes(
          s.read.schema(Schemas.kinesisFrame).json(f2)),
        key = "transaction_id", orderCol = "processing_timestamp",
        deleteCol = Some("_deleted"))
      t.toDF.select(col("transaction_id"),
          col("amount").cast(DoubleType).as("amount"),
          col("status"), col("risk_score"))
        .orderBy(col("transaction_id"))
    }, oracle = Some(s"""
      WITH seed AS (SELECT * FROM read_parquet('$root/cdcrm_seed/*.parquet')),
      rm AS (SELECT transaction_id FROM read_parquet('$root/cdcrm_removes/*.parquet')),
      re AS (SELECT * FROM read_parquet('$root/cdcrm_reinserts/*.parquet'))
      SELECT transaction_id, CAST(amount AS DOUBLE) AS amount, status, risk_score
      FROM (
        SELECT s.* FROM seed s
        WHERE s.transaction_id NOT IN (SELECT transaction_id FROM rm)
        UNION ALL
        SELECT * FROM re)
      ORDER BY transaction_id""")),

    // ------------------------------------------------------------------
    // SQL-text MERGE INTO (the Iceberg/Athena statement the reference's
    // engine runs for its unique_keys upsert, WHEN MATCHED AND op='D'
    // THEN DELETE included): routed to TxTable.merge with LWW + delete
    // semantics. The oracle replays upsert/delete algebra in SQL.
    Q("table_sql_merge", fn = (s, dir) => {
      val seedDir = Pipeline.stagedInput("sqlm_seed", "parquet") {
        SampleData.transactions(s, 200, seed = 29L)
      }
      val batchDir = Pipeline.stagedInput("sqlm_batch", "parquet") {
        val seed = s.read.parquet(seedDir)
        val ups = seed.filter(col("risk_score") === "HIGH")
          .withColumn("amount", (col("amount") + 7).cast(DecimalType(12, 2)))
          .withColumn("__op", lit("U"))
        val dels = seed.filter(col("status") === "DECLINED" &&
            col("risk_score") =!= "HIGH")
          .withColumn("__op", lit("D"))
        val fresh = SampleData.transactions(s, 230, seed = 29L)
          .join(seed.select("transaction_id"), Seq("transaction_id"), "left_anti")
          .withColumn("__op", lit("U"))
        ups.unionByName(dels).unionByName(fresh.select(ups.columns.map(col): _*))
      }
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("sqlmerge")))
      val t = cat.createTable("analytics", "txns_sm",
        Schemas.transactions, Seq("date"))
      t.append(s.read.parquet(seedDir))
      s.read.parquet(batchDir).createOrReplaceTempView("sqlm_cdc")
      cat.sql("""
        MERGE INTO analytics.txns_sm AS t USING sqlm_cdc AS s
        ON t.transaction_id = s.transaction_id
        WHEN MATCHED AND s.__op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      t.toDF.select(col("transaction_id"),
          col("amount").cast(DoubleType).as("amount"),
          col("status"), col("risk_score"))
        .orderBy(col("transaction_id"))
    }, oracle = Some(s"""
      WITH seed AS (SELECT * FROM read_parquet('$root/sqlm_seed/*.parquet')),
      batch AS (SELECT * FROM read_parquet('$root/sqlm_batch/*.parquet'))
      SELECT transaction_id, CAST(amount AS DOUBLE) AS amount, status, risk_score
      FROM (
        SELECT transaction_id, amount, status, risk_score
        FROM batch WHERE __op <> 'D'
        UNION ALL
        SELECT s.transaction_id, s.amount, s.status, s.risk_score
        FROM seed s WHERE NOT EXISTS
          (SELECT 1 FROM batch b WHERE b.transaction_id = s.transaction_id))
      ORDER BY transaction_id""")),

    // ------------------------------------------------------------------
    // Incremental materialized-view maintenance: a per-region aggregate
    // is initialized once from v1, then advanced to v3 using ONLY the
    // pre-image change feed (diff with update_preimage/update_postimage
    // rows): insert/postimage add, delete/preimage subtract — never a
    // re-scan of the base table. At 100 TB this is the difference
    // between touching |changes| rows and recomputing the world. The
    // hash check proves incremental == full recompute, because the
    // oracle computes the v3 aggregate directly from the staged inputs.
    Q("mv_incremental", fn = (s, dir) => {
      val seedDir = Pipeline.stagedInput("mv_seed", "parquet") {
        SampleData.transactions(s, 150, seed = 17L)
      }
      val batchDir = Pipeline.stagedInput("mv_batch", "parquet") {
        val seed = s.read.parquet(seedDir)
        val mods = seed.orderBy("transaction_id").limit(30)
          .withColumn("amount", (col("amount") + 50).cast(DecimalType(12, 2)))
          .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
        val inserts = SampleData.transactions(s, 180, seed = 17L)
          .join(seed.select("transaction_id"), Seq("transaction_id"), "left_anti")
        mods.unionByName(inserts.select(mods.columns.map(col): _*))
      }
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("mvinc")))
      val t = cat.createTable("analytics", "txns_mv",
        Schemas.transactions, Seq("date"))
      t.append(s.read.parquet(seedDir))                                  // v1
      val mv0 = t.asOf(1).groupBy(col("region"))
        .agg(count(lit(1)).as("n"),
          sum(col("amount")).cast(DecimalType(22, 2)).as("total"))
      t.merge(s.read.parquet(batchDir),
        key = "transaction_id", orderCol = "processing_timestamp")       // v2
      t.delete(col("risk_score") === "HIGH")                             // v3
      val changes = t.diff(1, 3, "transaction_id", preimages = true)
      val adds = col("_change_type").isin("insert", "update_postimage")
      val delta = changes.groupBy(col("region"))
        .agg(sum(when(adds, 1L).otherwise(-1L)).as("dn"),
          sum(when(adds, col("amount")).otherwise(-col("amount")))
            .cast(DecimalType(22, 2)).as("dtotal"))
      mv0.join(delta, Seq("region"), "full_outer")
        .select(col("region"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("total"), lit(0).cast(DecimalType(22, 2))) +
            coalesce(col("dtotal"), lit(0).cast(DecimalType(22, 2))))
            .cast(DoubleType).as("total"))
        .filter(col("n") > 0)
        .orderBy(col("region"))
    }, oracle = Some(s"""
      WITH seed AS (SELECT * FROM read_parquet('$root/mv_seed/*.parquet')),
      batch AS (SELECT * FROM read_parquet('$root/mv_batch/*.parquet')),
      v2 AS (
        SELECT * FROM batch
        UNION ALL
        SELECT s.* FROM seed s WHERE NOT EXISTS
          (SELECT 1 FROM batch b WHERE b.transaction_id = s.transaction_id)),
      v3 AS (SELECT * FROM v2 WHERE risk_score <> 'HIGH')
      SELECT region, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(amount) AS DOUBLE) AS total
      FROM v3 GROUP BY region ORDER BY region""")),

    // ------------------------------------------------------------------
    // Incremental dedup: a new ingest batch dedups against the
    // accumulated fingerprint store (16 bytes/doc) and within itself —
    // the historical CORPUS is never re-read, which is the only shape
    // that works when history is 100 TB and the daily batch is 100 GB.
    // documents with doc_id % 3 == 0 play the new batch; the rest are
    // history.
    Q("dedup_incremental", fn = (s, dir) => {
      val docs = Td.documents(s, dir)
      val store = graft.operators.Dedup.exact(docs.filter(col("doc_id") % 3 =!= 0))
        .select(col("fingerprint"))
      graft.operators.Dedup.exactIncremental(
          docs.filter(col("doc_id") % 3 === 0), store)
        .select(col("doc_id"), col("fingerprint"))
        .orderBy(col("doc_id"))
    }, oracle = Some("""
      WITH f AS (
        SELECT doc_id, md5(concat(array_to_string(
          list_filter(string_split(lower(trim(text)), ' '), x -> x <> ''), ' '),
          '')) AS fingerprint
        FROM documents),
      hist AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id % 3 <> 0),
      keep AS (SELECT fingerprint, min(doc_id) AS doc_id
               FROM f WHERE doc_id % 3 = 0 GROUP BY 1)
      SELECT doc_id, fingerprint FROM keep
      WHERE fingerprint NOT IN (SELECT fingerprint FROM hist)
      ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Bloom-prefiltered decontamination: benchmark n-grams folded into a
    // broadcast Bloom filter, corpus n-grams dropped map-side before the
    // exact verify join — same EXACT output as an unfiltered inverted-
    // index join (false positives die in the join), shuffle volume
    // ~|overlap| instead of |corpus n-grams|. Oracle: the plain exact
    // inverted-index decontamination in SQL.
    Q("decontaminate_bloom", fn = (s, dir) => {
      val docs = Td.documents(s, dir)
      Curation.decontaminateBloom(docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0), n = 3, minShared = 2)
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
      bench AS (SELECT doc_id AS bench_id, g FROM inv WHERE doc_id % 97 = 0)
      SELECT c.doc_id,
             count(DISTINCT c.g) AS n_shared_ngrams,
             count(DISTINCT b.bench_id) AS n_bench_docs
      FROM corpus c JOIN bench b USING (g)
      GROUP BY c.doc_id
      HAVING count(DISTINCT c.g) >= 2
      ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Per-file Bloom index point lookup: min/max stats cannot prune a
    // high-cardinality id spread across every file, the Bloom sidecar
    // can — and with no false negatives the result stays exact, which
    // is what the oracle (a plain filter over the staged seed) checks.
    Q("table_bloom_pointlookup", fn = (s, dir) => {
      val seedDir = Pipeline.stagedInput("bloom_seed", "parquet") {
        SampleData.transactions(s, 400, seed = 23L)
      }
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("bloomix")))
      val t = cat.createTable("analytics", "txns_bloom",
        Schemas.transactions, Nil)
      val seed = s.read.parquet(seedDir)
      // four appends → four full-range files
      (0 until 4).foreach(i => t.append(seed.filter(pmod(xxhash64(
        col("transaction_id")), lit(4)) === i)))
      t.buildBloomIndex("transaction_id")
      val probes = seed.select("transaction_id").orderBy("transaction_id")
        .limit(5).collect().map(_.getString(0))
      probes.map(p => t.readWhereEquals("transaction_id", p)
          .select(col("transaction_id"),
            col("amount").cast(DoubleType).as("amount"), col("status")))
        .reduce(_ unionByName _)
        .orderBy(col("transaction_id"))
    }, oracle = Some(s"""
      SELECT transaction_id, CAST(amount AS DOUBLE) AS amount, status
      FROM read_parquet('$root/bloom_seed/*.parquet')
      WHERE transaction_id IN (
        SELECT transaction_id FROM read_parquet('$root/bloom_seed/*.parquet')
        ORDER BY transaction_id LIMIT 5)
      ORDER BY transaction_id""")),

    // ------------------------------------------------------------------
    // Partition evolution (Iceberg REPLACE PARTITION FIELD): the table
    // starts date-partitioned, is atomically re-laid-out by region, and
    // must read back byte-identical rows — with the query pattern now
    // partition-pruned on region instead of date. The oracle is the
    // staged seed itself: evolution must be invisible to readers.
    Q("table_partition_evolution", fn = (s, dir) => {
      val seedDir = Pipeline.stagedInput("pe_seed", "parquet") {
        SampleData.transactions(s, 120, seed = 19L)
      }
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("pevolve")))
      val t = cat.createTable("analytics", "txns_pe",
        Schemas.transactions, Seq("date"))
      t.append(s.read.parquet(seedDir))
      t.repartitionTable(Seq("region"))
      t.read(Map("region" -> "EU"))
        .select(col("transaction_id"),
          col("amount").cast(DoubleType).as("amount"),
          col("region"), col("risk_score"))
        .orderBy(col("transaction_id"))
    }, oracle = Some(s"""
      SELECT transaction_id, CAST(amount AS DOUBLE) AS amount, region, risk_score
      FROM read_parquet('$root/pe_seed/*.parquet')
      WHERE region = 'EU' ORDER BY transaction_id""")),

    // ------------------------------------------------------------------
    // Space-Saving heavy hitters as a native TypedImperativeAggregate:
    // at most `capacity` counters per partition cross the shuffle, the
    // stream itself never does — the sketch that answers "top tokens /
    // domains / brands" on a corpus too large to group-by exactly.
    // Run here with capacity ≥ distinct items, where Space-Saving is
    // provably exact (no eviction anywhere), so the DuckDB oracle can
    // hash-check counts; accuracy under eviction is pinned in
    // OperatorsSpec.
    Q("agg_topk_sketch", fn = (s, dir) =>
      Td.part(s, dir)
        .agg(graft.functions.VectorFunctions.topkSketch(col("p_brand"),
          k = 10, capacity = 1024).as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("p_brand"), col("e.count_est").as("n"),
          col("e.err").as("err"))
        .orderBy(col("n").desc, col("p_brand")),
      oracle = Some("""
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n, CAST(0 AS BIGINT) AS err
      FROM part GROUP BY p_brand
      ORDER BY n DESC, p_brand LIMIT 10""")),

    // ------------------------------------------------------------------
    // BPE-style pre-tokenization (the GPT-2 pattern family): split text
    // into contraction / space-prefixed letter runs / digit runs /
    // punctuation runs / whitespace — the unit a byte-pair tokenizer
    // merges within. Pure regexp_extract_all, codegen'd, narrow; the
    // oracle runs the identical pattern through DuckDB's RE2.
    Q("text_pretokenize", fn = (s, dir) => {
      val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+|\\s+"
      val pieces = regexp_extract_all(lower(col("text")), lit(pat), lit(0))
      Td.documents(s, dir)
        .select(col("doc_id"),
          size(pieces).cast(LongType).as("n_pieces"),
          size(filter(pieces, p => p.rlike("^ ?[a-z]")))
            .cast(LongType).as("n_word_pieces"),
          size(filter(pieces, p => p.rlike("^ ?[0-9]")))
            .cast(LongType).as("n_num_pieces"))
        .orderBy(col("doc_id"))
    }, oracle = Some("""
      WITH p AS (
        SELECT doc_id, regexp_extract_all(lower(text),
          '''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+|\s+')
          AS pieces
        FROM documents)
      SELECT doc_id,
             CAST(len(pieces) AS BIGINT) AS n_pieces,
             CAST(len(list_filter(pieces, x -> regexp_matches(x, '^ ?[a-z]')))
               AS BIGINT) AS n_word_pieces,
             CAST(len(list_filter(pieces, x -> regexp_matches(x, '^ ?[0-9]')))
               AS BIGINT) AS n_num_pieces
      FROM p ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // ntile quartiles + cume_dist over a TOTALLY ordered window (the
    // tiebreak on orderkey is what makes ntile engine-portable — both
    // engines then assign identical bucket boundaries).
    Q("window_ntile", fn = (s, dir) =>
      Td.orders(s, dir).filter(col("o_custkey") % 250 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          ntile(4).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))).as("quartile"),
          round(cume_dist().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))), 6).as("cd"))
        .orderBy(col("o_orderkey")),
      oracle = Some("""
      SELECT o_orderkey, o_custkey,
             ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
             round(cume_dist() OVER (ORDER BY o_totalprice DESC, o_orderkey), 6) AS cd
      FROM orders WHERE o_custkey % 250 = 0
      ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // FULL OUTER join (both-sides-preserved; the shape diff() builds
    // on): per-customer order/lineitem totals where either side may be
    // absent.
    Q("join_full_outer", fn = (s, dir) => {
      val o = Td.orders(s, dir).filter(col("o_custkey") % 500 === 0)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"))
      val big = Td.orders(s, dir).filter(col("o_totalprice") > 350000)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_big"))
      o.join(big, Seq("custkey"), "full_outer")
        .select(col("custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy(col("custkey"))
    }, oracle = Some("""
      WITH o AS (
        SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders WHERE o_custkey % 500 = 0 GROUP BY 1),
      big AS (
        SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_big
        FROM orders WHERE o_totalprice > 350000 GROUP BY 1)
      SELECT coalesce(o.custkey, big.custkey) AS custkey,
             coalesce(o.n_orders, 0) AS n_orders,
             coalesce(big.n_big, 0) AS n_big
      FROM o FULL OUTER JOIN big ON o.custkey = big.custkey
      ORDER BY custkey""")),

    // ------------------------------------------------------------------
    // Data-quality checks (the Deequ-style ANALYZE surface a lake runs
    // before publishing a table): completeness, composite-key
    // uniqueness, value range, accepted values, referential integrity.
    // Every check is one partial-aggregated scan (plus a left-anti join
    // for RI) — the whole battery is two jobs regardless of table
    // width, the shape that matters when the table is 100 TB.
    Q("data_quality_checks", fn = (s, dir) => {
      val li = Td.lineitem(s, dir)
      val o = Td.orders(s, dir)
      def row(name: String, metric: Column, passed: Column)(df: DataFrame) =
        df.select(lit(name).as("check_name"),
          round(metric, 6).cast(DoubleType).as("metric"),
          passed.as("passed"))
      val completeness = row("completeness_l_orderkey",
        col("m"), col("m") === 1.0)(
        li.agg((count(col("l_orderkey")).cast(DoubleType) / count(lit(1))).as("m")))
      val uniqueness = row("uniqueness_orderkey_linenumber",
        col("m"), col("m") === 1.0)(
        li.agg((countDistinct(concat_ws("|", col("l_orderkey"),
          col("l_linenumber"))).cast(DoubleType) / count(lit(1))).as("m")))
      val range = row("range_l_quantity_1_50",
        col("mx"), col("mn") >= 1.0 && col("mx") <= 50.0)(
        li.agg(min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx")))
      val accepted = row("accepted_values_l_returnflag",
        col("m"), col("m") === 0.0)(
        li.agg(sum(when(col("l_returnflag").isin("A", "N", "R"), 0)
          .otherwise(1)).cast(DoubleType).as("m")))
      val ri = row("referential_l_orderkey_in_orders",
        col("m"), col("m") === 0.0)(
        li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).cast(DoubleType).as("m")))
      completeness.unionByName(uniqueness).unionByName(range)
        .unionByName(accepted).unionByName(ri)
        .orderBy(col("check_name"))
    }, oracle = Some("""
      SELECT * FROM (
        SELECT 'completeness_l_orderkey' AS check_name,
               round(count(l_orderkey) * 1.0 / count(*), 6) AS metric,
               count(l_orderkey) = count(*) AS passed
        FROM lineitem
        UNION ALL
        SELECT 'uniqueness_orderkey_linenumber',
               round(count(DISTINCT concat_ws('|', l_orderkey, l_linenumber))
                 * 1.0 / count(*), 6),
               count(DISTINCT concat_ws('|', l_orderkey, l_linenumber)) = count(*)
        FROM lineitem
        UNION ALL
        SELECT 'range_l_quantity_1_50', round(max(l_quantity), 6),
               min(l_quantity) >= 1.0 AND max(l_quantity) <= 50.0
        FROM lineitem
        UNION ALL
        SELECT 'accepted_values_l_returnflag',
               round(CAST(sum(CASE WHEN l_returnflag IN ('A','N','R')
                 THEN 0 ELSE 1 END) AS DOUBLE), 6),
               sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'referential_l_orderkey_in_orders',
               CAST(count(*) AS DOUBLE), count(*) = 0
        FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      ) ORDER BY check_name""")),

    // ------------------------------------------------------------------
    // RANGE-frame window (value-based, not row-based): trailing-30-day
    // spend per customer — frames defined on a day-number axis so both
    // engines agree exactly. One hash partition per customer, sorted
    // once; the frame is a pointer range over the sorted run.
    Q("window_range_frame", fn = (s, dir) => {
      val o = Td.orders(s, dir).filter(col("o_custkey") % 100 === 0)
        .withColumn("day", datediff(to_date(col("o_orderdate")),
          lit("1990-01-01").cast(DateType)).cast(LongType))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-30, 0)
      o.select(col("o_orderkey"), col("o_custkey"), col("day"),
          round(sum(col("o_totalprice")).over(w), 2).as("trailing_30d"))
        .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
    }, oracle = Some("""
      WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', DATE '1990-01-01',
                 CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
               o_totalprice
        FROM orders WHERE o_custkey % 100 = 0)
      SELECT o_orderkey, o_custkey, day,
             round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY day
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS trailing_30d
      FROM o ORDER BY o_custkey, day, o_orderkey""")),

    // ------------------------------------------------------------------
    // Product-Quantization ANN: 64-dim vectors compress to 8 one-byte
    // codes (8 subspaces × 16 codewords); search is the paper's
    // asymmetric-distance computation — a per-query m×kCodes lookup
    // table, m lookups per scored pair, no reconstruction column.
    // Codebooks are the deterministic hash-min sample (no Lloyd
    // rounds), so the oracle re-derives codebooks, codes, and scores
    // exactly; the engines' float association differs only at ULP
    // scale, absorbed by the 6-decimal rounding.
    Q("ann_pq", fn = (s, dir) => {
      val emb = Td.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      graft.operators.Similarity.pqTopK(emb, queries, k = 10, dim = 64,
          m = 8, kCodes = 16)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }, oracle = Some("""
      WITH cents AS (
        SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, cvec
        FROM (SELECT CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h,
                     vec_id, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY h, vec_id LIMIT 16)),
      subs AS (
        SELECT j, mi, cvec[mi*8+1 : mi*8+8] AS cw
        FROM cents, generate_series(0, 7) g(mi)),
      codes AS (
        SELECT vec_id, mi, j AS code FROM (
          SELECT e.vec_id, s.mi, s.j,
                 row_number() OVER (PARTITION BY e.vec_id, s.mi
                   ORDER BY list_distance(
                     (e.embedding::DOUBLE[])[s.mi*8+1 : s.mi*8+8], s.cw) ASC,
                     s.j ASC) AS rn
          FROM embeddings e CROSS JOIN subs s) WHERE rn = 1),
      recons AS (
        SELECT c.vec_id, flatten(list(s.cw ORDER BY c.mi)) AS recon
        FROM codes c JOIN subs s ON s.mi = c.mi AND s.j = c.code
        GROUP BY c.vec_id),
      scored AS (
        SELECT q.vec_id AS query_id, r.vec_id,
               list_dot_product(q.embedding::DOUBLE[], r.recon) AS score
        FROM recons r CROSS JOIN embeddings q WHERE q.vec_id < 8),
      ranked AS (
        SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id, round(score, 6) AS score
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // ------------------------------------------------------------------
    // IVF-PQ: the composed billion-scale ANN layout — coarse cells
    // bound WHAT a query scans (nprobe/nCells of the corpus), PQ codes
    // bound what the scan READS (8 bytes, not 64 doubles). Both
    // quantizers are the deterministic hash-min sample, so the oracle
    // replays cells, probes, codes, reconstructions, and scores.
    Q("ann_ivfpq", fn = (s, dir) => {
      val emb = Td.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      // derived capacities passed EXPLICITLY (the oracle re-derives the
      // same formulas in SQL; nprobe <= 0 now means the calibrated
      // operating point, which SQL cannot replay)
      val cells = graft.operators.Similarity.autoCells(emb.count())
      graft.operators.Similarity.ivfPqTopK(emb, queries, k = 10, dim = 64,
          nCells = cells, nprobe = graft.operators.Similarity.autoProbes(cells),
          m = 8, kCodes = 16,
          // the oracle shape: untrained sample quantizer, pure ADC
          // ranking — every stage replays exactly in the SQL oracle
          // (recall-tuned deployments use the trained + re-ranked
          // defaults; see BENCH ann_recall)
          iters = 0, rerankTo = 0)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }, oracle = Some("""
      WITH cap AS (
        SELECT GREATEST(16, LEAST(4096,
                 CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS cells
        FROM embeddings),
      capp AS (
        SELECT cells, GREATEST(2, LEAST(64,
                 CAST(CEIL(SQRT(cells)) AS BIGINT))) AS probes
        FROM cap),
      cents AS (
        SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, cvec
        FROM (SELECT CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h,
                     vec_id, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY h, vec_id
              LIMIT (SELECT cells FROM cap))),
      cbook AS (
        SELECT j, cvec FROM cents WHERE j < 16),
      assigned AS (
        SELECT vec_id, j AS cell FROM (
          SELECT e.vec_id, c.j,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, j AS cell FROM (
          SELECT q.vec_id, c.j,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings q CROSS JOIN cents c
          WHERE q.vec_id < 8) WHERE rn <= (SELECT probes FROM capp)),
      subs AS (
        SELECT j, mi, cvec[mi*8+1 : mi*8+8] AS cw
        FROM cbook, generate_series(0, 7) g(mi)),
      codes AS (
        SELECT vec_id, mi, j AS code FROM (
          SELECT e.vec_id, s.mi, s.j,
                 row_number() OVER (PARTITION BY e.vec_id, s.mi
                   ORDER BY list_distance(
                     (e.embedding::DOUBLE[])[s.mi*8+1 : s.mi*8+8], s.cw) ASC,
                     s.j ASC) AS rn
          FROM embeddings e CROSS JOIN subs s) WHERE rn = 1),
      recons AS (
        SELECT c.vec_id, flatten(list(s.cw ORDER BY c.mi)) AS recon
        FROM codes c JOIN subs s ON s.mi = c.mi AND s.j = c.code
        GROUP BY c.vec_id),
      scored AS (
        SELECT p.query_id, a.vec_id,
               list_dot_product(qe.embedding::DOUBLE[], r.recon) AS score
        FROM probes p
        JOIN assigned a ON a.cell = p.cell
        JOIN recons r ON r.vec_id = a.vec_id
        JOIN embeddings qe ON qe.vec_id = p.query_id),
      ranked AS (
        SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id, round(score, 6) AS score
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // ------------------------------------------------------------------
    // The persisted-index search shape (IVFADC+R): build the model +
    // encoded corpus the way TxTable.buildVectorIndex persists them,
    // then search with an ADC short list (top 40) exact-re-ranked by
    // true cosine — deterministic at iters = 0 (hash-min quantizers),
    // so the oracle replays cells, probes, codes, the ADC shortlist,
    // AND the exact re-rank. The trained/calibrated regime is measured
    // in BENCH ann_recall; VectorIndexSpec pins the table-side sidecar
    // round trip.
    Q("ann_index_rerank", fn = (s, dir) => {
      import graft.operators.Similarity
      val emb = Td.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cells = Similarity.autoCells(emb.count())
      val model = Similarity.trainIvfPqModel(emb, dim = 64, nCells = cells,
        m = 8, kCodes = 16, iters = 0, rerankTo = 40)
      val indexed = Similarity.encodeIvfPq(emb, model)
      Similarity.searchIndexed(indexed, emb, queries, model, k = 10,
          nprobe = Similarity.autoProbes(cells), rerankTo = 40)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }, oracle = Some("""
      WITH cap AS (
        SELECT GREATEST(16, LEAST(4096,
                 CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS cells
        FROM embeddings),
      capp AS (
        SELECT cells, GREATEST(2, LEAST(64,
                 CAST(CEIL(SQRT(cells)) AS BIGINT))) AS probes
        FROM cap),
      cents AS (
        SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, cvec
        FROM (SELECT CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h,
                     vec_id, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY h, vec_id
              LIMIT (SELECT cells FROM cap))),
      cbook AS (
        SELECT j, cvec FROM cents WHERE j < 16),
      assigned AS (
        SELECT vec_id, j AS cell FROM (
          SELECT e.vec_id, c.j,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, j AS cell FROM (
          SELECT q.vec_id, c.j,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings q CROSS JOIN cents c
          WHERE q.vec_id < 8) WHERE rn <= (SELECT probes FROM capp)),
      subs AS (
        SELECT j, mi, cvec[mi*8+1 : mi*8+8] AS cw
        FROM cbook, generate_series(0, 7) g(mi)),
      codes AS (
        SELECT vec_id, mi, j AS code FROM (
          SELECT e.vec_id, s.mi, s.j,
                 row_number() OVER (PARTITION BY e.vec_id, s.mi
                   ORDER BY list_distance(
                     (e.embedding::DOUBLE[])[s.mi*8+1 : s.mi*8+8], s.cw) ASC,
                     s.j ASC) AS rn
          FROM embeddings e CROSS JOIN subs s) WHERE rn = 1),
      recons AS (
        SELECT c.vec_id, flatten(list(s.cw ORDER BY c.mi)) AS recon
        FROM codes c JOIN subs s ON s.mi = c.mi AND s.j = c.code
        GROUP BY c.vec_id),
      adc AS (
        SELECT p.query_id, a.vec_id,
               list_dot_product(qe.embedding::DOUBLE[], r.recon) AS score
        FROM probes p
        JOIN assigned a ON a.cell = p.cell
        JOIN recons r ON r.vec_id = a.vec_id
        JOIN embeddings qe ON qe.vec_id = p.query_id),
      shortlist AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, vec_id ASC) AS rank
          FROM adc) WHERE rank <= 40),
      exact AS (
        SELECT sl.query_id, sl.vec_id,
               list_cosine_similarity(ce.embedding::DOUBLE[],
                 qe.embedding::DOUBLE[]) AS score
        FROM shortlist sl
        JOIN embeddings ce ON ce.vec_id = sl.vec_id
        JOIN embeddings qe ON qe.vec_id = sl.query_id),
      reranked AS (
        SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS rank
        FROM exact)
      SELECT query_id, rank, vec_id, round(score, 6) AS score
      FROM reranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // ------------------------------------------------------------------
    // FILTERED index search (the FAISS IDSelector shape): top-k among
    // rows matching a metadata predicate — the candidate set restricts
    // via a semi-join on the filtered ids BEFORE the probe scan (exact
    // w.r.t. the index; "top-k then filter" under-fills k), the exact
    // re-rank then scores only surviving rows. Deterministic at
    // iters = 0, so the oracle replays the whole filtered pipeline.
    Q("ann_index_filtered", fn = (s, dir) => {
      import graft.operators.Similarity
      val emb = Td.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cells = Similarity.autoCells(emb.count())
      val model = Similarity.trainIvfPqModel(emb, dim = 64, nCells = cells,
        m = 8, kCodes = 16, iters = 0, rerankTo = 40)
      val filtered = emb.filter(col("label") <= 4)
      val indexed = Similarity.encodeIvfPq(emb, model)
        .join(filtered.select(col("vec_id")), Seq("vec_id"), "left_semi")
      Similarity.searchIndexed(indexed, filtered, queries, model, k = 10,
          nprobe = Similarity.autoProbes(cells), rerankTo = 40)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }, oracle = Some("""
      WITH cap AS (
        SELECT GREATEST(16, LEAST(4096,
                 CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS cells
        FROM embeddings),
      capp AS (
        SELECT cells, GREATEST(2, LEAST(64,
                 CAST(CEIL(SQRT(cells)) AS BIGINT))) AS probes
        FROM cap),
      cents AS (
        SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, cvec
        FROM (SELECT CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h,
                     vec_id, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY h, vec_id
              LIMIT (SELECT cells FROM cap))),
      cbook AS (
        SELECT j, cvec FROM cents WHERE j < 16),
      assigned AS (
        SELECT vec_id, j AS cell FROM (
          SELECT e.vec_id, c.j,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings e CROSS JOIN cents c
          WHERE e.label <= 4) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, j AS cell FROM (
          SELECT q.vec_id, c.j,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings q CROSS JOIN cents c
          WHERE q.vec_id < 8) WHERE rn <= (SELECT probes FROM capp)),
      subs AS (
        SELECT j, mi, cvec[mi*8+1 : mi*8+8] AS cw
        FROM cbook, generate_series(0, 7) g(mi)),
      codes AS (
        SELECT vec_id, mi, j AS code FROM (
          SELECT e.vec_id, s.mi, s.j,
                 row_number() OVER (PARTITION BY e.vec_id, s.mi
                   ORDER BY list_distance(
                     (e.embedding::DOUBLE[])[s.mi*8+1 : s.mi*8+8], s.cw) ASC,
                     s.j ASC) AS rn
          FROM embeddings e CROSS JOIN subs s
          WHERE e.label <= 4) WHERE rn = 1),
      recons AS (
        SELECT c.vec_id, flatten(list(s.cw ORDER BY c.mi)) AS recon
        FROM codes c JOIN subs s ON s.mi = c.mi AND s.j = c.code
        GROUP BY c.vec_id),
      adc AS (
        SELECT p.query_id, a.vec_id,
               list_dot_product(qe.embedding::DOUBLE[], r.recon) AS score
        FROM probes p
        JOIN assigned a ON a.cell = p.cell
        JOIN recons r ON r.vec_id = a.vec_id
        JOIN embeddings qe ON qe.vec_id = p.query_id),
      shortlist AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, vec_id ASC) AS rank
          FROM adc) WHERE rank <= 40),
      exact AS (
        SELECT sl.query_id, sl.vec_id,
               list_cosine_similarity(ce.embedding::DOUBLE[],
                 qe.embedding::DOUBLE[]) AS score
        FROM shortlist sl
        JOIN embeddings ce ON ce.vec_id = sl.vec_id
        JOIN embeddings qe ON qe.vec_id = sl.query_id),
      reranked AS (
        SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS rank
        FROM exact)
      SELECT query_id, rank, vec_id, round(score, 6) AS score
      FROM reranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // ------------------------------------------------------------------
    // The vector_search SQL TVF (r13 VERDICT task 4): the SAME
    // persisted-index search as ann_index_rerank, but end-to-end
    // through the GOVERNED SQL surface — table created in a catalog,
    // index BUILT as a committed sidecar (buildVectorIndex, iters = 0
    // so quantizers are oracle-replayable), query table a governed
    // relation, nprobe pinned in the call (the stored calibrated
    // default is measured in BENCH, not hash-checked). The oracle
    // replays cells, probes, codes, ADC shortlist, and exact re-rank —
    // identical math to ann_index_rerank because vectorSearch delegates
    // to the same searchIndexed kernel over the sidecar parquet.
    Q("vector_search_tvf", fn = (s, dir) => {
      import graft.operators.Similarity
      val emb = Td.embeddings(s, dir)
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("vectvf")))
      val t = cat.createTable("vec", "corpus", emb.schema, Nil)
      t.append(emb)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val q = cat.createTable("vec", "q", queries.schema, Nil)
      q.append(queries)
      val cells = Similarity.autoCells(emb.count())
      t.buildVectorIndex("vec_id", "embedding", dim = 64,
        nCells = cells, kCodes = 16, iters = 0, rerankTo = 40)
      cat.sql("SELECT * FROM vector_search('vec.corpus', 'vec.q', 10, " +
          s"'embedding', ${Similarity.autoProbes(cells)})")
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }, oracle = Some("""
      WITH cap AS (
        SELECT GREATEST(16, LEAST(4096,
                 CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS cells
        FROM embeddings),
      capp AS (
        SELECT cells, GREATEST(2, LEAST(64,
                 CAST(CEIL(SQRT(cells)) AS BIGINT))) AS probes
        FROM cap),
      cents AS (
        SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, cvec
        FROM (SELECT CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h,
                     vec_id, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY h, vec_id
              LIMIT (SELECT cells FROM cap))),
      cbook AS (
        SELECT j, cvec FROM cents WHERE j < 16),
      assigned AS (
        SELECT vec_id, j AS cell FROM (
          SELECT e.vec_id, c.j,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, j AS cell FROM (
          SELECT q.vec_id, c.j,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings q CROSS JOIN cents c
          WHERE q.vec_id < 8) WHERE rn <= (SELECT probes FROM capp)),
      subs AS (
        SELECT j, mi, cvec[mi*8+1 : mi*8+8] AS cw
        FROM cbook, generate_series(0, 7) g(mi)),
      codes AS (
        SELECT vec_id, mi, j AS code FROM (
          SELECT e.vec_id, s.mi, s.j,
                 row_number() OVER (PARTITION BY e.vec_id, s.mi
                   ORDER BY list_distance(
                     (e.embedding::DOUBLE[])[s.mi*8+1 : s.mi*8+8], s.cw) ASC,
                     s.j ASC) AS rn
          FROM embeddings e CROSS JOIN subs s) WHERE rn = 1),
      recons AS (
        SELECT c.vec_id, flatten(list(s.cw ORDER BY c.mi)) AS recon
        FROM codes c JOIN subs s ON s.mi = c.mi AND s.j = c.code
        GROUP BY c.vec_id),
      adc AS (
        SELECT p.query_id, a.vec_id,
               list_dot_product(qe.embedding::DOUBLE[], r.recon) AS score
        FROM probes p
        JOIN assigned a ON a.cell = p.cell
        JOIN recons r ON r.vec_id = a.vec_id
        JOIN embeddings qe ON qe.vec_id = p.query_id),
      shortlist AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, vec_id ASC) AS rank
          FROM adc) WHERE rank <= 40),
      exact AS (
        SELECT sl.query_id, sl.vec_id,
               list_cosine_similarity(ce.embedding::DOUBLE[],
                 qe.embedding::DOUBLE[]) AS score
        FROM shortlist sl
        JOIN embeddings ce ON ce.vec_id = sl.vec_id
        JOIN embeddings qe ON qe.vec_id = sl.query_id),
      reranked AS (
        SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS rank
        FROM exact)
      SELECT query_id, rank, vec_id, round(score, 6) AS score
      FROM reranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // ------------------------------------------------------------------
    // TVF COMPOSABILITY (r14 VERDICT task 1): the same persisted-index
    // search, but the TVF sits inside a CTE, is JOINED back to the
    // governed corpus for a column the search output does not carry
    // (label), and is FILTERED on its rank — the statement shapes the
    // old whole-statement regex dispatch could not serve. Resolution
    // happens at analysis level (GraftSql.substituteTvfs), so the bars
    // compose identically to the direct form. Oracle: the full index
    // replay of vector_search_tvf plus the same join + rank filter.
    Q("vector_search_tvf_composed", fn = (s, dir) => {
      import graft.operators.Similarity
      val emb = Td.embeddings(s, dir)
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("vectvfc")))
      val t = cat.createTable("vec", "corpus", emb.schema, Nil)
      t.append(emb)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val q = cat.createTable("vec", "q", queries.schema, Nil)
      q.append(queries)
      val cells = Similarity.autoCells(emb.count())
      t.buildVectorIndex("vec_id", "embedding", dim = 64,
        nCells = cells, kCodes = 16, iters = 0, rerankTo = 40)
      cat.sql(
        "WITH hits AS (SELECT * FROM vector_search('vec.corpus', " +
          s"'vec.q', 10, 'embedding', ${Similarity.autoProbes(cells)})) " +
          "SELECT h.query_id, h.rank, h.vec_id, c.label, h.score " +
          "FROM hits h JOIN vec.corpus c ON c.vec_id = h.vec_id " +
          "WHERE h.rank <= 5")
        .select(col("query_id"), col("rank"), col("vec_id"), col("label"),
          round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }, oracle = Some("""
      WITH cap AS (
        SELECT GREATEST(16, LEAST(4096,
                 CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS cells
        FROM embeddings),
      capp AS (
        SELECT cells, GREATEST(2, LEAST(64,
                 CAST(CEIL(SQRT(cells)) AS BIGINT))) AS probes
        FROM cap),
      cents AS (
        SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, cvec
        FROM (SELECT CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h,
                     vec_id, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY h, vec_id
              LIMIT (SELECT cells FROM cap))),
      cbook AS (
        SELECT j, cvec FROM cents WHERE j < 16),
      assigned AS (
        SELECT vec_id, j AS cell FROM (
          SELECT e.vec_id, c.j,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, j AS cell FROM (
          SELECT q.vec_id, c.j,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings q CROSS JOIN cents c
          WHERE q.vec_id < 8) WHERE rn <= (SELECT probes FROM capp)),
      subs AS (
        SELECT j, mi, cvec[mi*8+1 : mi*8+8] AS cw
        FROM cbook, generate_series(0, 7) g(mi)),
      codes AS (
        SELECT vec_id, mi, j AS code FROM (
          SELECT e.vec_id, s.mi, s.j,
                 row_number() OVER (PARTITION BY e.vec_id, s.mi
                   ORDER BY list_distance(
                     (e.embedding::DOUBLE[])[s.mi*8+1 : s.mi*8+8], s.cw) ASC,
                     s.j ASC) AS rn
          FROM embeddings e CROSS JOIN subs s) WHERE rn = 1),
      recons AS (
        SELECT c.vec_id, flatten(list(s.cw ORDER BY c.mi)) AS recon
        FROM codes c JOIN subs s ON s.mi = c.mi AND s.j = c.code
        GROUP BY c.vec_id),
      adc AS (
        SELECT p.query_id, a.vec_id,
               list_dot_product(qe.embedding::DOUBLE[], r.recon) AS score
        FROM probes p
        JOIN assigned a ON a.cell = p.cell
        JOIN recons r ON r.vec_id = a.vec_id
        JOIN embeddings qe ON qe.vec_id = p.query_id),
      shortlist AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, vec_id ASC) AS rank
          FROM adc) WHERE rank <= 40),
      exact AS (
        SELECT sl.query_id, sl.vec_id,
               list_cosine_similarity(ce.embedding::DOUBLE[],
                 qe.embedding::DOUBLE[]) AS score
        FROM shortlist sl
        JOIN embeddings ce ON ce.vec_id = sl.vec_id
        JOIN embeddings qe ON qe.vec_id = sl.query_id),
      reranked AS (
        SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS rank
        FROM exact)
      SELECT r.query_id, r.rank, r.vec_id, e.label,
             round(r.score, 6) AS score
      FROM reranked r JOIN embeddings e ON e.vec_id = r.vec_id
      WHERE r.rank <= 5 ORDER BY r.query_id, r.rank""")),

    // ------------------------------------------------------------------
    // INLINE-VECTOR TVF form (r15 VERDICT task 8): the first thing a
    // real user does with one query embedding is inline it —
    // vector_search('ns.t', array(...), k) accepts a literal array
    // beside the relation-name source, same corpus bars, query_id 0.
    // The literal here is vec_id 3's own embedding rendered into the
    // SQL text, so the oracle replays the identical index math with
    // q.vec_id = 3 as the query and emits query_id 0.
    Q("vector_search_literal", fn = (s, dir) => {
      import graft.operators.Similarity
      val emb = Td.embeddings(s, dir)
      val cat = new TableCatalog(s, new Path(Pipeline.scratch("veclit")))
      val t = cat.createTable("vec", "corpus", emb.schema, Nil)
      t.append(emb)
      val cells = Similarity.autoCells(emb.count())
      t.buildVectorIndex("vec_id", "embedding", dim = 64,
        nCells = cells, kCodes = 16, iters = 0, rerankTo = 40)
      val vals = emb.filter(col("vec_id") === 3L)
        .select("embedding").collect()(0).getSeq[Float](0)
      cat.sql("SELECT * FROM vector_search('vec.corpus', " +
          s"array(${vals.mkString(", ")}), 10, 'embedding', " +
          s"${Similarity.autoProbes(cells)})")
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("rank"))
    }, oracle = Some("""
      WITH cap AS (
        SELECT GREATEST(16, LEAST(4096,
                 CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS cells
        FROM embeddings),
      capp AS (
        SELECT cells, GREATEST(2, LEAST(64,
                 CAST(CEIL(SQRT(cells)) AS BIGINT))) AS probes
        FROM cap),
      cents AS (
        SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, cvec
        FROM (SELECT CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h,
                     vec_id, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY h, vec_id
              LIMIT (SELECT cells FROM cap))),
      cbook AS (
        SELECT j, cvec FROM cents WHERE j < 16),
      assigned AS (
        SELECT vec_id, j AS cell FROM (
          SELECT e.vec_id, c.j,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
      probes AS (
        SELECT 0 AS query_id, j AS cell FROM (
          SELECT q.vec_id, c.j,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.cvec)
                     DESC, c.j ASC) AS rn
          FROM embeddings q CROSS JOIN cents c
          WHERE q.vec_id = 3) WHERE rn <= (SELECT probes FROM capp)),
      subs AS (
        SELECT j, mi, cvec[mi*8+1 : mi*8+8] AS cw
        FROM cbook, generate_series(0, 7) g(mi)),
      codes AS (
        SELECT vec_id, mi, j AS code FROM (
          SELECT e.vec_id, s.mi, s.j,
                 row_number() OVER (PARTITION BY e.vec_id, s.mi
                   ORDER BY list_distance(
                     (e.embedding::DOUBLE[])[s.mi*8+1 : s.mi*8+8], s.cw) ASC,
                     s.j ASC) AS rn
          FROM embeddings e CROSS JOIN subs s) WHERE rn = 1),
      recons AS (
        SELECT c.vec_id, flatten(list(s.cw ORDER BY c.mi)) AS recon
        FROM codes c JOIN subs s ON s.mi = c.mi AND s.j = c.code
        GROUP BY c.vec_id),
      adc AS (
        SELECT p.query_id, a.vec_id,
               list_dot_product(qe.embedding::DOUBLE[], r.recon) AS score
        FROM probes p
        JOIN assigned a ON a.cell = p.cell
        JOIN recons r ON r.vec_id = a.vec_id
        JOIN embeddings qe ON qe.vec_id = 3),
      shortlist AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, vec_id ASC) AS rank
          FROM adc) WHERE rank <= 40),
      exact AS (
        SELECT sl.query_id, sl.vec_id,
               list_cosine_similarity(ce.embedding::DOUBLE[],
                 qe.embedding::DOUBLE[]) AS score
        FROM shortlist sl
        JOIN embeddings ce ON ce.vec_id = sl.vec_id
        JOIN embeddings qe ON qe.vec_id = 3),
      reranked AS (
        SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS rank
        FROM exact)
      SELECT query_id, rank, vec_id, round(score, 6) AS score
      FROM reranked WHERE rank <= 10 ORDER BY rank""")),

    // ------------------------------------------------------------------
    // Document chunking: fixed 64-token windows with 16-token overlap
    // (stride 48) — the pre-training / retrieval chunking pass. One
    // tokenize + slice per chunk, narrow all the way; the oracle
    // re-derives every window with list slicing.
    Q("chunk_documents", fn = (s, dir) =>
      Curation.chunkDocuments(Td.documents(s, dir),
          chunkTokens = 64, overlapTokens = 16)
        .orderBy(col("doc_id"), col("chunk_id")),
      oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> x <> '') AS w
        FROM documents),
      base AS (
        SELECT doc_id, w,
               greatest(1, CAST(ceil((len(w) - 16) / 48.0) AS INTEGER)) AS nc
        FROM toks WHERE len(w) > 0),
      c AS (
        SELECT doc_id,
               unnest([i for i in generate_series(0, nc - 1)]) AS chunk_id,
               unnest([w[i*48+1 : i*48+64]
                       for i in generate_series(0, nc - 1)]) AS ch
        FROM base)
      SELECT doc_id, chunk_id,
             CAST(len(ch) AS BIGINT) AS n_chunk_tokens,
             array_to_string(ch, ' ') AS chunk_text
      FROM c ORDER BY doc_id, chunk_id""")),

    // ------------------------------------------------------------------
    // TF-IDF top terms per document — the classic corpus-keyword pass.
    // Plan shape at 100 TB: tf is one hash aggregation on (doc, term);
    // df one more on term (both partial-aggregated map-side); idf joins
    // back by term (dimension-sized — Spark broadcasts it); the top-3
    // window partitions by doc_id, the same key tf already hashed on.
    // Scores are rounded BEFORE ranking so the oracle's libm and the
    // JVM's agree on the ordering they rank over.
    Q("text_tfidf_topterms", fn = (s, dir) => {
      import graft.functions.TextFunctions
      val docs = Td.documents(s, dir)
      val n = docs.count()
      val tf = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val scored = tf.join(df_, "term")
        .withColumn("score",
          round(col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast(LongType).as("rank"),
          col("term"), col("score"))
        .orderBy(col("doc_id"), col("rank"))
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> x <> '')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      scored AS (
        SELECT doc_id, term,
               round(tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS score
        FROM tf CROSS JOIN n JOIN df USING (term)),
      ranked AS (
        SELECT doc_id, term, score, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        FROM scored)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // ------------------------------------------------------------------
    // Weighted sampling without replacement (Efraimidis–Spirtsis A-Res):
    // score = u^(1/weight) with u the portable md5 hash fraction, take
    // the global top-k — one narrow map + TakeOrdered, no shuffle of
    // the data. Weight here is document length, so longer docs are
    // proportionally likelier, and the oracle re-derives every draw.
    Q("sample_weighted", fn = (s, dir) =>
      Curation.weightedSample(
          Td.documents(s, dir).withColumn("n_chars", length(col("text"))),
          col("doc_id"), greatest(col("n_chars"), lit(1)).cast(DoubleType),
          k = 25)
        .select(col("doc_id"), col("n_chars")),
      oracle = Some(s"""
      WITH sc AS (
        SELECT doc_id, length(text) AS n_chars,
               pow(${duckHash("doc_id", "wsample")},
                   1.0 / greatest(length(text), 1)) AS score
        FROM documents)
      SELECT doc_id, n_chars FROM sc
      ORDER BY score DESC, doc_id LIMIT 25""")),

    // ------------------------------------------------------------------
    // DSIR importance scoring (Xie et al. 2023): hashed-unigram bucket
    // model of a TARGET slice (lang='en') vs the whole raw corpus;
    // each doc scores Σ log(p_target[b]/p_raw[b]) over its tokens,
    // micro-quantized per token before the sum (order-independent).
    // The 40 most target-like docs are the selection — the oracle
    // replays buckets, smoothing, quantization, and the top-k exactly.
    Q("curation_dsir", fn = (s, dir) => {
      val docs = Td.documents(s, dir)
      Curation.dsirScore(docs, docs.filter(col("lang") === "en"),
          nBuckets = 1024)
        .orderBy(col("dsir_score_micro").desc, col("doc_id"))
        .limit(40)
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, lang,
               unnest(list_filter(
                 regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> x <> '')) AS t
        FROM documents),
      bt AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 1024 AS b
        FROM toks),
      tgt AS (SELECT b, count(*) AS c_t FROM bt WHERE lang = 'en' GROUP BY b),
      raw AS (SELECT b, count(*) AS c_r FROM bt GROUP BY b),
      tot AS (SELECT (SELECT count(*) FROM bt WHERE lang = 'en') AS tt,
                     (SELECT count(*) FROM bt) AS rt),
      lr AS (
        SELECT r.b,
               CAST(round(ln(((COALESCE(t.c_t, 0) + 1.0) / (tot.tt + 1024.0)) /
                 ((r.c_r + 1.0) / (tot.rt + 1024.0))) * 1000000, 0) AS BIGINT)
                 AS lr_micro
        FROM raw r LEFT JOIN tgt t USING (b), tot),
      scored AS (
        SELECT bt.doc_id, count(*) AS n_tokens,
               CAST(sum(lr.lr_micro) AS BIGINT) AS dsir_score_micro
        FROM bt JOIN lr USING (b) GROUP BY bt.doc_id)
      SELECT doc_id, n_tokens, dsir_score_micro FROM scored
      ORDER BY dsir_score_micro DESC, doc_id LIMIT 40"""))
  )
}
