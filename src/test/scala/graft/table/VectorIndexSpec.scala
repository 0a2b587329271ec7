package graft.table

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/**
 * Persisted ANN index (r12 VERDICT task 1): train + calibrate ONCE,
 * commit the quantizers/probe count/codes as table sidecars, query
 * many — with the freshness contract (appended rows exact-scored,
 * deleted rows retired at the re-rank join) pinned.
 */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def embTable(name: String): TxTable = {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val t = TxTable.create(spark, new Path(freshDir(name), "t"),
      s"vec.$name", emb.schema, Nil)
    t.append(emb)
    t
  }

  private def queriesFrom(t: TxTable, n: Int) =
    t.toDF.filter(col("vec_id") % 7 === 3).limit(n)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  private def recallOf(t: TxTable,
      approx: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int): Double = {
    val exact = Similarity.bruteForceTopK(t.toDF, queries, k)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = approx.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    (exact & got).size.toDouble / exact.size
  }

  test("build + search: calibrated persisted index meets the recall target") {
    val t = embTable("vecidx_recall")
    val np = t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val meta = t.vectorIndexMeta("embedding").get
    assert(meta.nprobe === np && np >= 2 && np <= meta.centroids.size)
    info(s"calibrated nprobe=$np of ${meta.centroids.size} cells")
    // the sidecars are real files a fresh process could read — the
    // meta lives in a CAS'd slot file (r16: meta-<seq>.json, highest
    // seq live; the first publish takes slot 0)
    val fs = t.root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(t.root, "_index/vector_embedding"))
      .exists(st => st.getPath.getName.matches("meta-\\d{9}\\.json")))
    assert(fs.exists(new Path(t.root,
      s"_index/vector_embedding/${meta.codesDir}")))
    val queries = queriesFrom(t, 8)
    val recall = recallOf(t, t.vectorSearch(queries, k = 10), queries, 10)
    info(s"held-out recall@10 through the persisted index = $recall")
    // calibration targeted 0.9 on its own sample; held-out queries get
    // a small sampling allowance
    assert(recall >= 0.85, s"persisted-index recall@10 = $recall")
    // every query returns exactly k ranked rows
    val counts = t.vectorSearch(queries, k = 10)
      .groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ == 10L))
  }

  test("rows appended after the build are found (exact-scored delta)") {
    val t = embTable("vecidx_delta")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    // append NEW vectors the index has never seen — including an exact
    // copy of a probe vector, which must come back at rank 1
    val probe = t.toDF.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Any](0)
    val fresh = Seq((100001L, probe.map(_.asInstanceOf[Number].floatValue())),
        (100002L, probe.map(v => -v.asInstanceOf[Number].floatValue())))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast(
        t.toDF.schema("embedding").dataType))
    t.append(fresh.select(t.toDF.columns.map(c =>
      if (fresh.columns.contains(c)) col(c) else lit(null).cast(
        t.toDF.schema(c).dataType).as(c)): _*))
    val queries = t.toDF.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = t.vectorSearch(queries, k = 3).orderBy(col("rank"))
      .select("vec_id").as[Long].collect()
    // the un-indexed duplicate ties the self-match at score 1.0; both
    // must be in the top ranks — a stale index never drops new rows
    assert(top.take(2).toSet === Set(3L, 100001L),
      s"appended duplicate not found: ${top.toSeq}")
  }

  test("rows deleted after the build are retired at the re-rank join") {
    val t = embTable("vecidx_delete")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val queries = queriesFrom(t, 4)
    val before = t.vectorSearch(queries, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(before.nonEmpty)
    val victim = before.head
    t.delete(col("vec_id") === victim)
    val after = t.vectorSearch(queries, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(!after.contains(victim),
      s"deleted row $victim still served from the stale index")
  }

  test("refreshVectorIndex encodes only the delta and folds it into the index") {
    val t = embTable("vecidx_refresh")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val v0 = t.vectorIndexMeta("embedding").get.builtAtVersion
    // nothing new → no-op
    assert(t.refreshVectorIndex("embedding") === 0L)
    // append an exact duplicate of vector 3 under a new id
    val probe = t.toDF.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Any](0)
    val fresh = Seq((200001L, probe.map(_.asInstanceOf[Number].floatValue())))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast(
        t.toDF.schema("embedding").dataType))
    t.append(fresh.select(t.toDF.columns.map(c =>
      if (fresh.columns.contains(c)) col(c) else lit(null).cast(
        t.toDF.schema(c).dataType).as(c)): _*))
    assert(t.refreshVectorIndex("embedding") === 1L)
    val meta = t.vectorIndexMeta("embedding").get
    assert(meta.builtAtVersion > v0)
    // the refreshed row now serves through the INDEX path (no delta
    // files remain above builtAtVersion), at rank ≤ 2 for its source
    val queries = t.toDF.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = t.vectorSearch(queries, k = 3).orderBy(col("rank"))
      .select("vec_id").as[Long].collect()
    assert(top.take(2).toSet === Set(3L, 200001L), s"got ${top.toSeq}")
    // no id is ever served twice, whatever mix of stale/fresh code
    // rows the append-only sidecar accumulates
    val all = t.vectorSearch(queriesFrom(t, 6), k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(all.distinct.length === all.length)
  }

  test("filtered search: predicate restricts candidates, k stays filled") {
    // the FAISS IDSelector shape: top-k AMONG rows matching a metadata
    // predicate — candidates semi-join on the filtered ids before the
    // probe scan, so a selective predicate still fills k (never
    // "top-k then filter")
    val t = embTable("vecidx_filter")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val queries = queriesFrom(t, 6)
    val pred = col("label") <= 4
    val got = t.vectorSearch(queries, k = 10, where = Some(pred))
    // every hit satisfies the predicate...
    val hitIds = got.select("vec_id").as[Long].collect().toSet
    val allowed = t.toDF.filter(pred).select("vec_id").as[Long].collect().toSet
    assert(hitIds.subsetOf(allowed), s"filtered search leaked ${hitIds -- allowed}")
    // ...k stays filled (enough candidates exist under this filter)...
    val counts = got.groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ == 10L))
    // ...and recall vs brute-force ON THE FILTERED corpus holds
    val exact = Similarity.bruteForceTopK(t.toDF.filter(pred), queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = got.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"filtered recall@10 = $recall")
    assert(recall >= 0.85, s"filtered recall@10 = $recall")
  }

  test("probed cells push into the codes scan as a literal IN filter") {
    // the 100 TB claim "scan only probed cells' codes" must be in the
    // PLAN, not the prose: the probe assignment is a broadcast join
    // (dynamic keys never reach parquet row-group pruning), so
    // vectorSearch collects the distinct probed cells and pushes a
    // literal IN — on the cell-sorted sidecar that prunes row groups
    val t = embTable("vecidx_pushdown")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val queries = queriesFrom(t, 2)
    val df = t.vectorSearch(queries, k = 5, nprobe = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(cell"),
      s"no pushed IN(cell) filter on the codes scan:\n${plan.take(2000)}")
    assert(df.count() === 10L)
  }

  test("build/refresh_vector_index are callable as V2 procedures") {
    val cat = new TableCatalog(spark,
      new Path(freshDir("vecidx_proc_wh")))
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val t = cat.createTable("vec", "t", emb.schema, Nil)
    t.append(emb)
    spark.conf.set("spark.sql.catalog.vecproc", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vecproc.warehouse",
      cat.warehouse.toString)
    try {
      val built = spark.sql("""CALL vecproc.system.build_vector_index(
        table => 'vec.t', id_column => 'vec_id',
        vector_column => 'embedding', dim => 64)""").collect()(0)
      val np = built.getInt(0)
      assert(np === t.vectorIndexMeta("embedding").get.nprobe)
      val refreshed = spark.sql("""CALL vecproc.system.refresh_vector_index(
        'vec.t', 'embedding')""").collect()(0)
      assert(refreshed.getLong(0) === 0L)   // nothing new yet
      // the maintenance policy is callable too, including the opt-in
      // measured drift check (healthy index → still noop: the freshly
      // calibrated operating point meets its own target)
      val maintained = spark.sql("""CALL vecproc.system.maintain_vector_index(
        table => 'vec.t', vector_column => 'embedding',
        check_recall => true)""").collect()(0)
      assert(maintained.getString(0) === "noop")
      val queries = queriesFrom(t, 4)
      assert(t.vectorSearch(queries, k = 5).count() === 20L)
    } finally {
      spark.conf.unset("spark.sql.catalog.vecproc")
      spark.conf.unset("spark.sql.catalog.vecproc.warehouse")
    }
  }

  test("RESTORE re-adding pre-build-deleted rows: they are exact-scored, never dropped") {
    // ADVICE r13 (medium): restore() re-adds files with their ORIGINAL
    // commit seq, so a `seq > builtAtVersion` delta rule would classify
    // a restored pre-build-deleted file as covered — silently missing
    // from results. Coverage is by file PATH now.
    val t = embTable("vecidx_restore")
    val preDelete = t.currentVersion
    val victim = 3L
    // materialize the victim's vector as a LOCAL query table before the
    // delete (a lazy DataFrame would re-read the post-delete snapshot)
    val queries0 = t.toDF.filter(col("vec_id") === victim)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val queries = spark.createDataFrame(
      spark.sparkContext.parallelize(queries0.collect().toSeq),
      queries0.schema)
    t.delete(col("vec_id") === victim)
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    // sanity: the deleted row is absent while it IS deleted
    assert(!t.vectorSearch(queries, k = 3).select("vec_id").as[Long]
      .collect().contains(victim))
    t.restore(preDelete)
    // the restored file is NOT in the covered path set → exact-scored;
    // the victim's own vector must come back at rank 1
    val top = t.vectorSearch(queries, k = 3).orderBy(col("rank"))
      .select("vec_id").as[Long].collect()
    assert(top.head === victim,
      s"restored pre-build-deleted row $victim missing: ${top.toSeq}")
  }

  test("rebuild publishes atomically: prior generation survives until superseded; a crashed build changes nothing") {
    val t = embTable("vecidx_atomic")
    val fs = t.root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idxDir = new Path(t.root, "_index/vector_embedding")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val gen1 = t.vectorIndexMeta("embedding").get.codesDir
    // a CRASHED build (codes written, meta never published — simulated
    // by a stray generation dir) leaves the prior index fully intact
    fs.mkdirs(new Path(idxDir, "codes_v99_deadbeef"))
    assert(t.vectorIndexMeta("embedding").get.codesDir === gen1)
    val queries = queriesFrom(t, 4)
    assert(t.vectorSearch(queries, k = 5).count() === 20L)
    // rebuild: new generation published, PRIOR one kept (a concurrent
    // search planned against the old meta may still be scanning it) —
    // never a "no index" window
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val gen2 = t.vectorIndexMeta("embedding").get.codesDir
    assert(gen2 !== gen1)
    assert(fs.exists(new Path(idxDir, gen1)), "prior generation GC'd too early")
    assert(fs.exists(new Path(idxDir, gen2)))
    // the stray crashed-build dir was GC'd as unreferenced
    assert(!fs.exists(new Path(idxDir, "codes_v99_deadbeef")))
    // third build retires gen1 (kept-window is one generation)
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    assert(!fs.exists(new Path(idxDir, gen1)))
    assert(t.vectorSearch(queries, k = 5).count() === 20L)
  }

  test("dropping or renaming an indexed column invalidates the vector sidecar") {
    val t = embTable("vecidx_evolve")
    val fs = t.root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    assert(t.vectorIndexMeta("embedding").isDefined)
    // a column the index does not reference leaves it alone
    t.dropColumn("label")
    assert(t.vectorIndexMeta("embedding").isDefined)
    // renaming the ID column poisons id→row attribution → invalidated
    t.renameColumn("vec_id", "doc_id")
    assert(t.vectorIndexMeta("embedding").isEmpty)
    assert(!fs.exists(new Path(t.root, "_index/vector_embedding")))
    intercept[IllegalStateException](t.vectorSearch(
      t.toDF.limit(1).select(col("doc_id").as("query_id"),
        col("embedding").as("query_vec")), k = 3))
    // rebuild under the new name, then rename the VECTOR column
    t.buildVectorIndex("doc_id", "embedding", dim = 64)
    assert(t.vectorIndexMeta("embedding").isDefined)
    t.renameColumn("embedding", "emb2")
    assert(t.vectorIndexMeta("embedding").isEmpty)
    assert(t.vectorIndexMeta("emb2").isEmpty)
  }

  test("rewriteVectorIndex bin-packs refresh-appended code files; results unchanged") {
    val t = embTable("vecidx_compact")
    val fs = t.root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    // three refresh epochs, each appending a small batch of codes
    for (epoch <- 1 to 3) {
      val probe = t.toDF.filter(col("vec_id") === 3L)
        .select(col("embedding")).head().getSeq[Any](0)
      val fresh = Seq((300000L + epoch,
          probe.map(_.asInstanceOf[Number].floatValue())))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(
          t.toDF.schema("embedding").dataType))
      t.append(fresh.select(t.toDF.columns.map(c =>
        if (fresh.columns.contains(c)) col(c) else lit(null).cast(
          t.toDF.schema(c).dataType).as(c)): _*))
      assert(t.refreshVectorIndex("embedding") === 1L)
    }
    val metaBefore = t.vectorIndexMeta("embedding").get
    // write-size probe (r14 VERDICT task 3): each refresh wrote ONE
    // coverage delta holding exactly the newly covered paths — one
    // line here — never a rewrite of the whole covered set
    metaBefore.coveredDeltaFiles.foreach { d =>
      val in = fs.open(new Path(t.root, s"_index/vector_embedding/$d"))
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().count(_.nonEmpty) finally in.close()
      assert(lines === 1, s"delta $d covers $lines paths; expected 1")
    }
    def partFiles(gen: String): Int =
      fs.listStatus(new Path(t.root, s"_index/vector_embedding/$gen"))
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val before = partFiles(metaBefore.codesDir)
    val queries = queriesFrom(t, 6)
    val resultsBefore = t.vectorSearch(queries, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val after = t.rewriteVectorIndex("embedding")
    val metaAfter = t.vectorIndexMeta("embedding").get
    assert(metaAfter.codesDir !== metaBefore.codesDir)
    assert(after < before,
      s"compaction did not shrink the sidecar: $before -> $after")
    assert(after === partFiles(metaAfter.codesDir))
    // the three refresh epochs each appended ONE coverage delta
    // (O(new files) bytes — never a rewrite of the whole set), and the
    // compaction folded base + deltas back into a single base
    assert(metaBefore.coveredDeltaFiles.size === 3)
    assert(metaAfter.coveredDeltaFiles.isEmpty)
    // coverage SET and quantizers are untouched; search results identical
    assert(t.showIndexes.filter(col("column") === "embedding")
      .select("coverage").as[Double].head() === 1.0)
    assert(metaAfter.centroids === metaBefore.centroids)
    val resultsAfter = t.vectorSearch(queries, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(resultsAfter === resultsBefore)
  }

  test("vector_search TVF and SHOW INDEXES serve the persisted index through SQL") {
    val cat = new TableCatalog(spark, new Path(freshDir("vecidx_tvf_wh")))
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val t = cat.createTable("vec", "t", emb.schema, Nil)
    t.append(emb)
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    // query source = another table of the same catalog (a governed
    // relation, resolved through the surface like any other)
    val queries = queriesFrom(t, 5)
    val q = cat.createTable("vec", "q", queries.schema, Nil)
    q.append(queries)
    val got = GraftSql.sql(cat,
      "SELECT * FROM vector_search('vec.t', 'vec.q', 10)")
    assert(got.columns.toSeq === Seq("query_id", "vec_id", "score", "rank"))
    val tvf = got.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val api = t.vectorSearch(queries, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(tvf === api, "TVF and JVM API disagree")
    // explicit column + nprobe arguments
    assert(GraftSql.sql(cat,
      "SELECT * FROM vector_search('vec.t', 'vec.q', 5, 'embedding', 2)")
      .count() === 25L)
    // a per-part-quoted query source normalizes cleanly (ADVICE r14:
    // the single outer strip used to emit malformed ns`.`q)
    assert(GraftSql.sql(cat,
      "SELECT * FROM vector_search('vec.t', '`vec`.`q`', 10)")
      .count() === 50L)
    // COMPOSED positions (r15): the TVF resolves at analysis level, so
    // a WHERE over its output, a JOIN back to the corpus, and a CTE all
    // work — the whole-statement regex dispatch served none of them
    assert(GraftSql.sql(cat,
      "SELECT * FROM vector_search('vec.t', 'vec.q', 10) WHERE rank <= 3")
      .count() === 15L)
    val joined = GraftSql.sql(cat,
      "SELECT h.query_id, h.rank, c.label " +
        "FROM vector_search('vec.t', 'vec.q', 5) h " +
        "JOIN vec.t c ON c.vec_id = h.vec_id WHERE h.rank = 1")
    assert(joined.count() === 5L)
    val cte = GraftSql.sql(cat,
      "WITH hits AS (SELECT * FROM vector_search('vec.t', 'vec.q', 5)) " +
        "SELECT query_id, count(*) AS n FROM hits GROUP BY query_id")
    assert(cte.count() === 5L &&
      cte.select("n").as[Long].collect().forall(_ == 5L))
    // non-literal TVF arguments fail closed — they would resolve
    // outside the governed walk
    intercept[SecurityException](GraftSql.sql(cat,
      "SELECT * FROM vector_search(concat('vec', '.t'), 'vec.q', 10)"))
    // SHOW INDEXES: full coverage right after the build...
    val idx1 = GraftSql.sql(cat, "SHOW INDEXES ON vec.t").collect()
    assert(idx1.length === 1)
    assert(idx1(0).getString(0) === "vector" &&
      idx1(0).getString(1) === "embedding" &&
      idx1(0).getString(2) === "vec_id")
    assert(idx1(0).getDouble(7) === 1.0)
    // ...an unrefreshed append drops coverage below 1 (the exact-scored
    // delta an operator watches), refresh restores it
    t.append(t.toDF.limit(50))
    val cov2 = GraftSql.sql(cat, "SHOW INDEXES ON vec.t")
      .select("coverage").as[Double].collect()(0)
    assert(cov2 < 1.0, s"coverage $cov2 ignores the unindexed append")
    t.refreshVectorIndex("embedding")
    val cov3 = GraftSql.sql(cat, "SHOW INDEXES ON vec.t")
      .select("coverage").as[Double].collect()(0)
    assert(cov3 === 1.0)
    // a Bloom sidecar lists alongside
    t.buildBloomIndex("vec_id")
    val kinds = GraftSql.sql(cat, "SHOW INDEXES ON vec.t")
      .select("index_type").as[String].collect().sorted.toSeq
    assert(kinds === Seq("bloom", "vector"))
    // ...and the same rows serve as the `.indexes` metadata RELATION,
    // so observability composes (WHERE over coverage, joins, CTEs) —
    // SHOW INDEXES is the statement form, vec.t.indexes the relational
    val rel = GraftSql.sql(cat,
      "SELECT column FROM vec.t.indexes " +
        "WHERE index_type = 'vector' AND coverage >= 1.0")
    assert(rel.as[String].collect().toSeq === Seq("embedding"))
    assert(GraftSql.sql(cat,
      "WITH idx AS (SELECT * FROM vec.t.indexes) " +
        "SELECT count(*) AS n FROM idx").as[Long].collect()(0) === 2L)
    // the drift probe is callable standalone through SQL (read-only,
    // full-select bar) — a freshly refreshed index measures at or
    // near its calibration target
    val recall = GraftSql.sql(cat,
      "CALL system.measure_vector_index_recall('vec.t', 'embedding')")
      .collect()(0).getDouble(0)
    assert(recall >= 0.7 && recall <= 1.0, s"measured recall $recall")
  }

  test("maintainVectorIndex takes the cheapest sufficient action from the staleness signals") {
    val t = embTable("vecidx_maintain")
    val fs = t.root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val total = t.toDF.count()
    // fresh index → noop
    assert(t.maintainVectorIndex("embedding")._1 === "noop")
    // small unindexed append (coverage just below the floor) → refresh
    t.append(t.toDF.limit((total / 5).toInt))
    val (a1, n1) = t.maintainVectorIndex("embedding", coverageFloor = 0.9)
    assert(a1 === "refreshed" && n1 === total / 5)
    assert(t.maintainVectorIndex("embedding")._1 === "noop")
    // pathological small-file accumulation → compact (coverage is fine)
    val meta = t.vectorIndexMeta("embedding").get
    def codeFiles(): Int =
      fs.listStatus(new Path(t.root,
          s"_index/vector_embedding/${t.vectorIndexMeta("embedding").get.codesDir}"))
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val before = codeFiles()
    val (a2, n2) = t.maintainVectorIndex("embedding",
      maxCodeFiles = math.max(1, before - 1))
    assert(a2 === "compacted" && n2 < before)
    // heavy churn (most of the corpus postdates the build) → rebuild
    t.append(t.toDF)   // coverage drops to ~0.5
    t.append(t.toDF.limit((total / 2).toInt))
    val (a3, _) = t.maintainVectorIndex("embedding", rebuildBelow = 0.6)
    assert(a3 === "rebuilt")
    val after = t.vectorIndexMeta("embedding").get
    assert(after.builtAtVersion > meta.builtAtVersion)
    // a rebuilt index covers the whole current snapshot again
    assert(t.maintainVectorIndex("embedding")._1 === "noop")
  }

  test("meta publish is CAS-guarded: a stale planner refuses instead of last-writer-winning") {
    val t = embTable("vecidx_cas")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    // writer A plans against this meta...
    val planned = t.vectorIndexMeta("embedding").get
    assert(planned.nonce.isDefined)
    // ...while writer B (a separate handle — separate process in
    // production, so the in-JVM maintenance lock does not serialize
    // them) publishes a compaction first
    val t2 = TxTable.open(spark, t.root, t.name)
    t2.rewriteVectorIndex("embedding")
    val won = t2.vectorIndexMeta("embedding").get
    assert(won.nonce !== planned.nonce)
    // A's publish presents the stale nonce: the compare REFUSES — B's
    // codes generation is not silently reverted
    intercept[java.util.ConcurrentModificationException] {
      t.publishVectorIndexMeta("embedding",
        planned.copy(builtAtVersion = 999L), planned.nonce)
    }
    val live = t.vectorIndexMeta("embedding").get
    assert(live.codesDir === won.codesDir &&
      live.builtAtVersion === won.builtAtVersion)
  }

  test("racing refresh and rewrite serialize: no lost codes, no coverage reversion") {
    val t1 = embTable("vecidx_race")
    t1.buildVectorIndex("vec_id", "embedding", dim = 64)
    // give the refresh real work: an exact duplicate of vector 3
    val probe = t1.toDF.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Any](0)
    val fresh = Seq((400001L, probe.map(_.asInstanceOf[Number].floatValue())))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast(
        t1.toDF.schema("embedding").dataType))
    t1.append(fresh.select(t1.toDF.columns.map(c =>
      if (fresh.columns.contains(c)) col(c) else lit(null).cast(
        t1.toDF.schema(c).dataType).as(c)): _*))
    val t2 = TxTable.open(spark, t1.root, t1.name)
    // two handles race; the CAS admits any serialization and REFUSES
    // the rest — both orders are legal, lost updates are not
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def run(label: String)(op: => Unit): Thread = {
      val th = new Thread(() =>
        try { op; outcomes.add(s"$label:ok") }
        catch {
          case _: java.util.ConcurrentModificationException =>
            outcomes.add(s"$label:refused")
        })
      th.start(); th
    }
    val a = run("refresh")(t1.refreshVectorIndex("embedding"))
    val b = run("rewrite")(t2.rewriteVectorIndex("embedding"))
    a.join(120000); b.join(120000)
    info(s"race outcomes: ${outcomes.toArray.mkString(", ")}")
    assert(outcomes.size === 2)
    // whatever interleaving happened, the published index is coherent:
    // a retried refresh (the loser re-reads and re-runs) must land the
    // appended row; if the refresh lost, the row is exact-scored via
    // the uncovered delta — either way it is FOUND at rank 1
    if (!outcomes.contains("refresh:ok")) t1.refreshVectorIndex("embedding")
    val queries = t1.toDF.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = t1.vectorSearch(queries, k = 3).orderBy(col("rank"))
      .select("vec_id").as[Long].collect()
    assert(top.take(2).toSet === Set(3L, 400001L),
      s"row lost in the race: ${top.toSeq}")
    // and the coverage chain the live meta references actually exists
    val live = t1.vectorIndexMeta("embedding").get
    val fsys = t1.root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (live.coveredFilesFile.toSeq ++ live.coveredDeltaFiles).foreach { f =>
      assert(fsys.exists(new Path(t1.root, s"_index/vector_embedding/$f")),
        s"live meta references GC'd sidecar $f")
    }
  }

  test("legacy watermark metas upgrade in place to an exact covered path set") {
    val t = embTable("vecidx_legacy")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    // hand-craft a PRE-r15 meta: no covered set, no nonce, no build
    // params — only the builtAtVersion watermark
    val modern = t.vectorIndexMeta("embedding").get
    val legacy = modern.copy(coveredFiles = None, coveredFilesFile = None,
      coveredDeltaFiles = Nil, nonce = None, buildIters = None,
      buildSampleQueries = None, buildK = None, buildNCells = None)
    val fsys = t.root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaPath = new Path(t.root, "_index/vector_embedding/meta.json")
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val out = fsys.create(metaPath, true)
    try out.write(org.json4s.jackson.Serialization.write(legacy)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // a truly pre-slot table has no meta-<seq>.json slots — remove the
    // build's (slots shadow the legacy file by design)
    fsys.listStatus(new Path(t.root, "_index/vector_embedding"))
      .filter(_.getPath.getName.matches("meta-\\d{9}\\.json"))
      .foreach(st => fsys.delete(st.getPath, false))
    // first touch through a FRESH handle (no caches) materializes the
    // watermark into a path set and publishes it
    val t2 = TxTable.open(spark, t.root, t.name)
    assert(t2.vectorIndexMeta("embedding").get.coveredFilesFile.isEmpty)
    val cov = t2.showIndexes.filter(col("index_type") === "vector")
      .select("coverage").as[Double].head()
    assert(cov === 1.0)
    val upgraded = t2.vectorIndexMeta("embedding").get
    assert(upgraded.coveredFilesFile.isDefined,
      "legacy meta not materialized to a path set")
    assert(upgraded.nonce.isDefined)
    assert(fsys.exists(new Path(t.root,
      s"_index/vector_embedding/${upgraded.coveredFilesFile.get}")))
    // the upgraded set drives refresh like any modern meta
    assert(t2.refreshVectorIndex("embedding") === 0L)
  }

  test("maintenance rebuilds replay the original build parameters") {
    val t = embTable("vecidx_replay")
    // the deterministic, oracle-replayable shape: explicit cells,
    // iters = 0 (hash-min seeded quantizers, no Lloyd refinement)
    t.buildVectorIndex("vec_id", "embedding", dim = 64,
      nCells = 12, iters = 0, sampleQueries = 16, k = 5)
    val built = t.vectorIndexMeta("embedding").get
    assert(built.buildNCells === Some(12) && built.buildIters === Some(0))
    assert(built.centroids.size === 12)
    // churn enough that maintenance chooses REBUILD
    val total = t.toDF.count()
    t.append(t.toDF)
    t.append(t.toDF.limit((total / 2).toInt))
    val (action, _) = t.maintainVectorIndex("embedding", rebuildBelow = 0.6)
    assert(action === "rebuilt")
    val rebuilt = t.vectorIndexMeta("embedding").get
    // the rebuild replayed the ORIGINAL shape — not the API defaults
    // (which would be auto cells and iters = 3)
    assert(rebuilt.centroids.size === 12,
      s"rebuild reshaped nCells: 12 -> ${rebuilt.centroids.size}")
    assert(rebuilt.buildIters === Some(0) &&
      rebuilt.buildNCells === Some(12) &&
      rebuilt.buildSampleQueries === Some(16) &&
      rebuilt.buildK === Some(5))
  }

  test("checkRecall: in-place churn at full coverage flips maintenance to rebuild") {
    // 16 well-separated planted clusters, dim 16
    def clustered(ids: Range, seed: Int, axis: Int => Int): Seq[(Long, Seq[Float])] = {
      val r = new java.util.Random(seed)
      ids.map { i =>
        val c = i % 16
        val v = Array.fill(16)((r.nextGaussian() * 0.05).toFloat)
        v(axis(c) % 16) += 1.0f
        v((axis(c) * 3 + 1) % 16) += 0.5f
        (i.toLong, v.toSeq)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val t = TxTable.create(spark, new Path(freshDir("vecidx_drift"), "t"),
      "vec.vecidx_drift", schema, Nil)
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(
        clustered(0 until 2000, seed = 7, axis = identity).map(x =>
          org.apache.spark.sql.Row(x._1, x._2)), 4), schema))
    // coarse PQ (m=2, 16 codewords) so ADC ranking leans hard on the
    // trained codebooks — the drift signal under test
    t.buildVectorIndex("vec_id", "embedding", dim = 16,
      nCells = 16, m = 2, kCodes = 16, rerankTo = 40, recallTarget = 0.9)
    // churn IN PLACE: 90% of rows are replaced by vectors from a
    // DIFFERENT cluster geometry; refresh restores coverage to 1.0 by
    // encoding them with the STALE quantizers
    t.delete(col("vec_id") < 1800L)
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(
        clustered(10000 until 11800, seed = 11,
          axis = c => c * 5 + 7).map(x =>
          org.apache.spark.sql.Row(x._1, x._2)), 4), schema))
    t.refreshVectorIndex("embedding")
    assert(t.showIndexes.select("coverage").as[Double].head() === 1.0)
    // the append-shaped signals see a healthy index...
    assert(t.maintainVectorIndex("embedding")._1 === "noop")
    // ...but measured recall at the stored operating point has drifted
    val drifted = t.measureVectorIndexRecall("embedding")
    info(s"recall after churn, stale quantizers: $drifted")
    assert(drifted < 0.9, s"churn did not degrade recall ($drifted) — " +
      "the drift scenario under test did not materialize")
    val (action, _) =
      t.maintainVectorIndex("embedding", checkRecall = true)
    assert(action === "rebuilt")
    val recovered = t.measureVectorIndexRecall("embedding")
    info(s"recall after drift-triggered rebuild: $recovered")
    assert(recovered > drifted,
      s"rebuild did not improve measured recall: $drifted -> $recovered")
  }

  test("searchIndexed over a reloaded codes parquet matches the in-memory path") {
    // the persisted artifact IS the index: a fresh read of the codes
    // parquet + stored model must produce the same top-k as encoding
    // in memory with the same model
    val t = embTable("vecidx_roundtrip")
    t.buildVectorIndex("vec_id", "embedding", dim = 64,
      kCodes = 16, iters = 0)
    val meta = t.vectorIndexMeta("embedding").get
    val model = Similarity.VectorIndexModel(meta.dim, meta.centroids,
      meta.codebooks, meta.nprobe, meta.rerankTo)
    val queries = queriesFrom(t, 6)
    val stored = t.vectorSearch(queries, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val inMem = Similarity.searchIndexed(
        Similarity.encodeIvfPq(t.toDF, model), t.toDF, queries, model, 10)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)]
      .collect().toSet
    assert(stored === inMem)
  }

  test("rewrite reaps dead code rows; the dead-row signal drives the maintain policy") {
    val t = embTable("vecidx_reap")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    def codesCount(): Long = spark.read.parquet(new Path(t.root,
      s"_index/vector_embedding/${t.vectorIndexMeta("embedding").get.codesDir}")
      .toString).count()
    val n0 = t.toDF.count()
    assert(t.vectorIndexMeta("embedding").get.codeRows.contains(n0))
    // two churn cycles: COW delete + O(new) refresh — each cycle
    // re-encodes the rewritten survivors while the deleted ids' codes
    // (and the prior cycle's superseded copies) accumulate as dead
    // weight every probed-cell scan pays for
    t.delete(col("vec_id") === 3L)
    t.refreshVectorIndex("embedding")
    t.delete(col("vec_id") === 10L)
    t.refreshVectorIndex("embedding")
    val live = t.toDF.count()
    assert(live === n0 - 2)
    assert(codesCount() > live, "churn produced no dead code rows")
    // the signal is observable metadata-side (codeRows − live covered
    // rows), beside dead_entries
    val row = t.showIndexes.filter(col("index_type") === "vector")
      .collect()(0)
    assert(row.getAs[Long]("dead_code_rows") > 0L)
    // the maintain policy triggers the compaction on the dead-row
    // signal ALONE (file-count arm disabled) and the rewrite's live-id
    // semi-join shrinks the sidecar back to live-row count
    val (a, _) = t.maintainVectorIndex("embedding", maxCodeFiles = 1000000)
    assert(a === "compacted", s"dead-row signal did not trigger (got $a)")
    assert(codesCount() === live,
      "reap left dead code rows (or dropped live ones)")
    assert(t.vectorIndexMeta("embedding").get.codeRows.contains(live))
    assert(t.showIndexes.filter(col("index_type") === "vector")
      .collect()(0).getAs[Long]("dead_code_rows") === 0L)
    assert(t.maintainVectorIndex("embedding",
      maxCodeFiles = 1000000)._1 === "noop")
    // results stay correct: a live row still finds itself at rank 1,
    // a deleted id never resurfaces
    val qLive = t.toDF.filter(col("vec_id") === 7L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = t.vectorSearch(qLive, k = 5).orderBy(col("rank"))
      .select("vec_id").as[Long].collect()
    assert(top.head === 7L)
    assert(!t.vectorSearch(qLive, k = 5).select("vec_id").as[Long]
      .collect().contains(3L))
  }

  test("reap keeps the newest refresh EPOCH even when part mtimes tie") {
    // ADVICE r16 low: the reap picked the newest copy per churned id
    // by part-file MTIME — on stores with coarse (1 s) granularity two
    // refresh epochs tie and the cell tie-break could keep the STALE
    // copy. Refresh parts now carry the snapshot version in their
    // name (`g<v>-…`) and the reap orders by that; this spec forces
    // the exact tie (identical mtimes on every part) and pins that
    // the surviving code row is the CURRENT vector's encoding.
    import graft.operators.Similarity
    val t = embTable("vecidx_epoch")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val fsx = t.root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def churn(scale: Double): Unit = {
      // replace id 5's vector: COW delete + append of a scaled copy
      val row = t.toDF.filter(col("vec_id") === 5L)
        .select(col("vec_id"),
          transform(col("embedding"), x => x * scale)
            .cast(t.toDF.schema("embedding").dataType).as("embedding"))
        .collect()(0)
      t.delete(col("vec_id") === 5L)
      import spark.implicits._
      t.append(Seq((row.getLong(0),
        row.getSeq[Float](1))).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(
          t.toDF.schema("embedding").dataType)))
      assert(t.refreshVectorIndex("embedding") > 0)
    }
    churn(0.5)    // epoch A encodes the 0.5× copy
    churn(2.0)    // epoch B encodes the CURRENT (0.5×2.0 = 1.0×) copy
    val meta = t.vectorIndexMeta("embedding").get
    val codesDir = new Path(t.root,
      s"_index/vector_embedding/${meta.codesDir}")
    // force the tie the mtime ordering could not break
    val now = (System.currentTimeMillis() / 1000) * 1000
    fsx.listStatus(codesDir).filter(_.isFile)
      .foreach(st => fsx.setTimes(st.getPath, now, now))
    assert(t.rewriteVectorIndex("embedding") >= 1)
    val meta2 = t.vectorIndexMeta("embedding").get
    val kept = spark.read.parquet(new Path(t.root,
      s"_index/vector_embedding/${meta2.codesDir}").toString)
      .filter(col("vec_id") === 5L).collect()
    assert(kept.length === 1, s"expected one surviving copy, ${kept.length}")
    // the survivor must be the CURRENT vector's encoding
    val model = Similarity.VectorIndexModel(meta2.dim, meta2.centroids,
      meta2.codebooks, meta2.nprobe, meta2.rerankTo)
    val expect = Similarity.encodeIvfPq(
      t.toDF.filter(col("vec_id") === 5L), model, "vec_id", "embedding")
      .collect()(0)
    val keptRow = kept(0)
    assert(keptRow.getAs[Int]("cell") === expect.getAs[Int]("cell"),
      "stale epoch's cell survived the tie")
    assert(keptRow.getAs[scala.collection.Seq[Byte]]("codes").toSeq ===
      expect.getAs[scala.collection.Seq[Byte]]("codes").toSeq,
      "stale epoch's codes survived the tie")
  }

  test("MOR position deletes surface as dead code rows and trigger the reap") {
    // in-place churn the file-granularity signal was blind to: DV
    // deletes leave every covered PATH live (coverage stays 1.0) while
    // most codes can never surface — the DV-aware dead-code count sees
    // them and the policy compacts
    val t = embTable("vecidx_dvdead")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val n0 = t.toDF.count()
    t.deletePos(col("vec_id") % 3 < 2)   // ~2/3 of the corpus
    val live = t.toDF.count()
    assert(live < n0 / 2)
    val row = t.showIndexes.filter(col("index_type") === "vector")
      .collect()(0)
    assert(row.getAs[Double]("coverage") === 1.0)
    assert(row.getAs[Long]("dead_code_rows") === n0 - live)
    val (a, _) = t.maintainVectorIndex("embedding", maxCodeFiles = 1000000)
    assert(a === "compacted", s"DV dead-code signal did not trigger ($a)")
    val codes = spark.read.parquet(new Path(t.root,
      s"_index/vector_embedding/${t.vectorIndexMeta("embedding").get.codesDir}")
      .toString).count()
    assert(codes === live)
    assert(t.showIndexes.filter(col("index_type") === "vector")
      .collect()(0).getAs[Long]("dead_code_rows") === 0L)
    assert(t.maintainVectorIndex("embedding",
      maxCodeFiles = 1000000)._1 === "noop")
    // a surviving row still finds itself; a DV-deleted one never
    // resurfaces from its reaped codes
    val qLive = t.toDF.filter(col("vec_id") === 2L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    assert(t.vectorSearch(qLive, k = 3).orderBy(col("rank"))
      .select("vec_id").as[Long].collect().head === 2L)
  }

  test("recall measurements persist to the meta, surface in SHOW INDEXES, and memoize checkRecall") {
    val t = embTable("vecidx_recallmemo")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    assert(t.vectorIndexMeta("embedding").get.measuredRecall.isEmpty)
    val r = t.measureVectorIndexRecall("embedding")
    val m = t.vectorIndexMeta("embedding").get
    assert(m.measuredRecall.contains(r))
    assert(m.measuredAtVersion.contains(t.currentVersion))
    assert(m.measuredK.contains(10))
    // a monitor reads the trend + staleness with zero corpus I/O
    val row = t.showIndexes.filter(col("index_type") === "vector")
      .collect()(0)
    assert(row.getAs[Double]("last_recall") === r)
    assert(row.getAs[Long]("recall_measured_at_version") === t.currentVersion)
    // memoization: stamp an artificially LOW recall at the CURRENT
    // snapshot version — checkRecall must TRUST the memo (a live
    // re-measure of this healthy index would read ~$r and noop), so a
    // rebuild proves no measurement ran
    t.publishVectorIndexMeta("embedding",
      m.copy(measuredRecall = Some(0.01)), m.nonce)
    assert(t.maintainVectorIndex("embedding",
      checkRecall = true)._1 === "rebuilt")
    // the rebuild minted a FRESH meta: measurements never survive the
    // quantizers they measured
    assert(t.vectorIndexMeta("embedding").get.measuredRecall.isEmpty)
    // a memo from a STALE snapshot version does not apply: the probe
    // re-measures (healthy) and the policy noops
    val m2 = t.vectorIndexMeta("embedding").get
    t.publishVectorIndexMeta("embedding",
      m2.copy(measuredRecall = Some(0.01),
        measuredAtVersion = Some(t.currentVersion - 1),
        measuredK = Some(10)), m2.nonce)
    assert(t.maintainVectorIndex("embedding",
      checkRecall = true)._1 === "noop")
    // ...and the fresh measurement re-stamped itself at the current
    // version
    val m3 = t.vectorIndexMeta("embedding").get
    assert(m3.measuredAtVersion.contains(t.currentVersion))
    assert(m3.measuredRecall.exists(_ >= 0.9))
    // READ-BAR surface (ADVICE r16 low): persist=false — what the
    // FULL_SELECT-gated measure_vector_index_recall procedure passes —
    // returns a usable value but publishes NO meta slot: a SELECT-only
    // principal's probe must not mutate _index state
    val slotsBefore = t.root.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      .listStatus(new Path(t.root, "_index/vector_embedding"))
      .count(_.getPath.getName.matches("meta-\\d{9}\\.json"))
    val memoBefore = t.vectorIndexMeta("embedding").get.measuredAtMs
    val probed = t.measureVectorIndexRecall("embedding", persist = false)
    assert(probed >= 0.0 && probed <= 1.0)
    val slotsAfter = t.root.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      .listStatus(new Path(t.root, "_index/vector_embedding"))
      .count(_.getPath.getName.matches("meta-\\d{9}\\.json"))
    assert(slotsAfter === slotsBefore,
      "a persist=false recall probe published a meta slot")
    assert(t.vectorIndexMeta("embedding").get.measuredAtMs === memoBefore)
  }

  test("meta publish CAS goes through the commit protocol: a claimed slot refuses cross-process") {
    // the r15 residual: the nonce compare was best-effort ACROSS
    // PROCESSES on rename stores. The publish now rides the same
    // CommitProtocol seam as the transaction log, so a service-side
    // conditional-PUT mock (the TxTableSpec commit-path mock shape —
    // the reference's UpdateTableMetadataLocation CAS,
    // kfs/scripts/update_metadata.py:135-141) arbitrates slot winners
    // even when nothing is readable yet — the window rename stores
    // cannot close.
    class ConditionalPutMock extends CommitProtocol {
      val slots = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val puts = new java.util.concurrent.atomic.AtomicInteger(0)
      override def putIfAbsent(f: org.apache.hadoop.fs.FileSystem,
          target: Path, content: Array[Byte],
          next: Long, expected: Option[Long]): Unit = {
        if (f.exists(target) || !slots.add(target.toString))
          throw new CommitConflictException(
            s"slot $target taken (stale expected=$expected)")
        val out = f.create(target, true)
        try out.write(content) finally out.close()
        puts.incrementAndGet()
      }
    }
    val t = embTable("vecidx_proto")
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val mock = new ConditionalPutMock
    TxLog.protocolOverride = Some(mock)
    try {
      // positive path: a maintenance publish routes through the mock
      val before = mock.puts.get()
      t.rewriteVectorIndex("embedding")
      assert(mock.puts.get() === before + 1,
        "meta publish did not route through the commit protocol")
      // cross-process window: another process CLAIMED the next slot
      // after our read but before its content is visible — the
      // in-process nonce compare passes, and only the protocol CAS
      // can refuse (on a rename store both writers would 'win')
      val meta = t.vectorIndexMeta("embedding").get
      val liveSeq = t.root.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        .listStatus(new Path(t.root, "_index/vector_embedding"))
        .map(_.getPath.getName)
        .collect { case n if n.matches("meta-\\d{9}\\.json") =>
          n.stripPrefix("meta-").stripSuffix(".json").toLong }
        .max
      mock.slots.add(new Path(t.root,
        f"_index/vector_embedding/meta-${liveSeq + 1}%09d.json").toString)
      intercept[java.util.ConcurrentModificationException] {
        t.publishVectorIndexMeta("embedding",
          meta.copy(builtAtVersion = 777L), meta.nonce)
      }
      // the loser changed nothing readable
      assert(t.vectorIndexMeta("embedding").get.builtAtVersion
        === meta.builtAtVersion)
    } finally TxLog.protocolOverride = None
  }
}
