package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/**
 * Manifest-list partition summaries + manifest skipping (r16 VERDICT
 * task 1): every manifest ref carries per-partition-column min/max in
 * the same tagged [[ColStats]] shape file skipping uses, and a COLD
 * PRUNED plan through the V2 catalog resolves only the manifests
 * whose range can match the pushed predicate — the Iceberg
 * manifest-list behavior for the reference's date-partitioned
 * workload (kfs/scripts/update_metadata.py:114, kfs/README.md:181).
 */
class ManifestSummarySpec extends SparkSpec {

  private def conf = spark.sessionState.newHadoopConf()

  /** A date-partitioned table whose commits cluster by date, so tier
    * manifests cover disjoint-ish date ranges (the real ingest
    * shape). Large enough to spill several manifests. */
  private def buildTable(wh: String): TxTable = {
    spark.conf.set("spark.sql.catalog.graftms", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftms.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftms.ms")
    spark.sql("CREATE TABLE graftms.ms.t (id LONG, v DOUBLE, date DATE) " +
      "PARTITIONED BY (date)")
    val cat = new TableCatalog(spark, new Path(wh))
    val t = cat.getTable("ms", "t")
    import spark.implicits._
    // 12 date-clustered commits of 40 files each (one file per id via
    // repartition) — enough to spill past the inline bound repeatedly
    (0 until 12).foreach { d =>
      val date = java.sql.Date.valueOf(f"2026-01-${d + 1}%02d")
      t.append((1 to 40).map(i => (d * 1000L + i, i * 1.5, date))
        .toDF("id", "v", "date").repartition(40))
    }
    t
  }

  test("manifest refs carry correct per-column summaries and byte/row sums") {
    val t = buildTable(freshDir("ms_stamp"))
    val hdr = t.snapshotHeader
    assert(hdr.manifests.nonEmpty, "no manifests spilled")
    assert(hdr.manifests.forall(_.sizeBytes >= 0))
    assert(hdr.manifests.forall(_.rowCount >= 0))
    val summarized = hdr.manifests.filter(_.summaries.isDefined)
    assert(summarized.nonEmpty, "no ref carries summaries")
    // each summary's bounds equal a recount over the manifest's files
    summarized.foreach { r =>
      val files = TxLog.resolveRefs(new Path(t.root, "_log"), Seq(r), conf)
      assert(r.fileCount === files.size)
      assert(r.sizeBytes === files.map(_.sizeBytes).sum)
      assert(r.rowCount === files.map(_.rowCount).sum)
      val cs = r.summaries.get("date")
      assert(cs.tag === "date")
      val days = files.flatMap(_.partitionValues.get("date"))
        .map(v => java.time.LocalDate.parse(v).toEpochDay)
      assert(cs.min.toLong === days.min, s"min of $r")
      assert(cs.max.toLong === days.max, s"max of $r")
      assert(cs.nullCount === 0L)
    }
    // the whole-table row sum from HEADER metadata alone
    assert(hdr.manifests.map(_.rowCount).sum +
      hdr.files.map(_.rowCount).sum === 480L)
  }

  test("a cold pruned plan resolves only the manifests whose range can match") {
    val t = buildTable(freshDir("ms_prune"))
    val full = spark.sql(
      "SELECT id, v FROM graftms.ms.t WHERE date = DATE'2026-01-03'")
      .collect().map(_.getLong(0)).sorted
    assert(full.length === 40)
    // cold: purge parsed headers, manifest content, and layouts — the
    // fresh-driver shape the 10⁶-file bench measures
    val logDir = new Path(t.root, "_log")
    TxLog.purgeRawCache(logDir)
    TxLog.purgeManifestCache()
    org.apache.spark.sql.graft.SnapshotFileIndex.purgeLayoutCache()
    val totalRefs = t.snapshotHeader.manifests.size
    val matchRefs = t.snapshotHeader.manifests.count(r =>
      r.summaries.isEmpty || {
        val cs = r.summaries.get("date")
        val day = java.time.LocalDate.parse("2026-01-03").toEpochDay
        cs.min.toLong <= day && day <= cs.max.toLong
      })
    assert(matchRefs < totalRefs,
      s"layout gives nothing to skip: $matchRefs of $totalRefs match")
    val before = TxLog.manifestResolutionCount
    val pruned = spark.sql(
      "SELECT id, v FROM graftms.ms.t WHERE date = DATE'2026-01-03'")
      .collect().map(_.getLong(0)).sorted
    val resolved = TxLog.manifestResolutionCount - before
    assert(pruned.toSeq === full.toSeq, "pruned result diverged")
    assert(resolved <= matchRefs,
      s"cold pruned plan resolved $resolved manifests; only $matchRefs " +
        s"of $totalRefs can match")
    // and an UNFILTERED read still sees everything (the deferred
    // index's full-selection fallback)
    assert(spark.sql("SELECT count(*) FROM graftms.ms.t")
      .head().getLong(0) === 480L)
    // a filter no summary can decide (non-partition column) reads all
    // rows correctly too
    assert(spark.sql("SELECT count(*) FROM graftms.ms.t WHERE v > 0")
      .head().getLong(0) === 480L)
  }

  test("deferred == eager under a randomized predicate fuzz") {
    // the manifest-skipping plan path must be RESULT-invisible: for a
    // deterministic battery of predicate shapes (equality, ranges,
    // IN, disjunctions, non-partition filters, no filter), the
    // deferred V2 scan answers exactly what the resolved snapshot
    // answers — whatever mix of skipped and read manifests each shape
    // admits
    val t = buildTable(freshDir("ms_fuzz"))
    val full = t.toDF   // eager path: resolved snapshot, V1 relation
    val preds = Seq(
      "date = DATE'2026-01-01'",
      "date = DATE'2026-01-12'",
      "date = DATE'2025-12-31'",                        // matches nothing
      "date BETWEEN DATE'2026-01-02' AND DATE'2026-01-04'",
      "date >= DATE'2026-01-10'",
      "date < DATE'2026-01-03'",
      "date IN (DATE'2026-01-01', DATE'2026-01-09')",
      "date = DATE'2026-01-02' OR date = DATE'2026-01-11'",
      "v > 30.0",                                       // non-partition
      "date = DATE'2026-01-05' AND v <= 12.0",
      "1 = 1")
    preds.foreach { p =>
      val viaCatalog = spark.sql(
        s"SELECT id FROM graftms.ms.t WHERE $p ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      val viaEager = full.where(p).select("id").orderBy("id")
        .collect().map(_.getLong(0)).toSeq
      assert(viaCatalog === viaEager, s"deferred diverged under: $p")
    }
  }

  test("a DV-bearing table keeps manifest skipping on merge-on-read reads") {
    // r17 forced the FULL resolved snapshot whenever any deletion
    // vector or equality delete was outstanding (morGroups ran at
    // scan-builder construction, before filters arrived) — a
    // streaming-upsert MOR table lost the whole cold-planning win
    // between compactions. Group construction now defers into
    // build(), selecting refs with the SAME predicate the batch path
    // uses.
    val t = buildTable(freshDir("ms_mor"))
    // positional delete on half of one date's rows: files untouched,
    // one DV per affected file
    t.deletePos(col("date") === lit(java.sql.Date.valueOf("2026-01-03")) &&
      col("id") % 2 === 0)
    assert(t.snapshot.deletionVectors.nonEmpty)
    val q = "SELECT id FROM graftms.ms.t WHERE date = DATE'2026-01-03'"
    val expected = spark.sql(q).collect().map(_.getLong(0)).sorted
    assert(expected.length === 20, s"${expected.length} rows survived")
    // cold shape: purge parsed headers, manifest content, layouts
    val logDir = new Path(t.root, "_log")
    TxLog.purgeRawCache(logDir)
    TxLog.purgeManifestCache()
    org.apache.spark.sql.graft.SnapshotFileIndex.purgeLayoutCache()
    val totalRefs = t.snapshotHeader.manifests.size
    assert(totalRefs >= 2, s"nothing to skip: $totalRefs refs")
    val before = TxLog.manifestResolutionCount
    val pruned = spark.sql(q).collect().map(_.getLong(0)).sorted
    val resolved = TxLog.manifestResolutionCount - before
    assert(pruned.toSeq === expected.toSeq,
      "pruned MOR result diverged (DV not applied or wrong skip)")
    assert(resolved < totalRefs,
      s"DV-bearing read resolved all $totalRefs manifests (no skipping)")
    // unfiltered MOR read: full-selection fallback, DVs still applied
    assert(spark.sql("SELECT count(*) FROM graftms.ms.t")
      .head().getLong(0) === 460L)
  }

  test("deferred scans skip exact row stats instead of resolving (add_files shape)") {
    // r17: when ANY ref carried rowCount = -1 (an add_files import
    // anywhere in history), the exactRows fallback touched snap.files —
    // materializing the whole snapshot at PLAN time even though the
    // scan itself deferred. The statistic is now skipped instead.
    val t = buildTable(freshDir("ms_addf"))
    val logDir = new Path(t.root, "_log")
    val fs = logDir.getFileSystem(conf)
    val cur = TxLog.read(logDir, t.currentVersion, conf)
    // an import-shaped commit: a real parquet copied under a fresh
    // partition, appended with UNKNOWN rowCount (the unreadable-footer
    // degrade add_files takes)
    val donor = cur.files.head
    val rel = "date=2026-01-13/gimport-0001.parquet"
    val dataDir = new Path(t.root, "data")
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(dataDir, donor.path),
      fs, new Path(dataDir, rel), false, conf)
    TxLog.commit(logDir, Some(cur.version), cur.copy(
      version = cur.version + 1,
      timestampMs = System.currentTimeMillis(),
      operation = "ADD_FILES",
      files = cur.files :+ DataFile(rel, Map("date" -> "2026-01-13"),
        rowCount = -1L, sizeBytes = donor.sizeBytes)), conf)
    val hdr = TxLog.readRaw(logDir, cur.version + 1, conf)
    assert(hdr.manifests.nonEmpty &&
      hdr.manifests.forall(_.sizeBytes >= 0L) &&
      hdr.manifests.exists(_.summaries.isDefined),
      "import commit lost deferral eligibility")
    assert(hdr.manifests.exists(_.rowCount < 0) || hdr.files.exists(_.rowCount < 0),
      "import commit did not produce an unknown row sum")
    // r17 behavior: the exactRows fallback called snap.files during
    // OPTIMIZATION — every manifest resolved before any filter could
    // prune. Now the only resolution planning pays is listFiles'
    // filter-pruned selection (Spark's supportsColumnar forces
    // partition planning inside executedPlan, so "zero" is not
    // reachable — "only the matching manifests" is the real contract).
    val day = java.time.LocalDate.parse("2026-01-05").toEpochDay
    val matchRefs = hdr.manifests.count(r =>
      r.summaries.flatMap(_.get("date")) match {
        case Some(cs) => cs.min.toLong <= day && day <= cs.max.toLong
        case None => true
      })
    assert(matchRefs < hdr.manifests.size, "nothing skippable")
    val df = spark.sql(
      "SELECT id FROM graftms.ms.t WHERE date = DATE'2026-01-05'")
    val before = TxLog.manifestResolutionCount
    df.queryExecution.executedPlan // full planning, no execution
    val atPlan = TxLog.manifestResolutionCount - before
    assert(atPlan <= matchRefs,
      s"planning resolved $atPlan manifests (> $matchRefs matching) — " +
        "the unknown-rowCount statistic forced the snapshot")
    // execution: result unaffected by the import (different partition)
    val rows = df.collect().map(_.getLong(0)).sorted
    assert(rows.length === 40)
    assert(TxLog.manifestResolutionCount - before < hdr.manifests.size,
      "resolved every manifest despite the date filter")
  }

  test("data-column summaries skip manifests on non-partition predicates") {
    // r18: manifest refs fold their members' per-file footer stats
    // into manifest-level [min, max] per data column — the level that
    // makes ingest-ordered (and sort-clustered) layouts skip at the
    // MANIFEST before any file materializes. buildTable's ids are
    // monotone across commits (d*1000+i), so tier manifests cover
    // disjoint id ranges with NO date predicate anywhere in the query.
    val t = buildTable(freshDir("ms_datacol"))
    val hdr = t.snapshotHeader
    val withId = hdr.manifests.filter(_.summaries.exists(_.contains("id")))
    assert(withId.nonEmpty, "no ref carries a data-column summary")
    // summary == recount over the members' footer stats
    withId.foreach { r =>
      val files = TxLog.resolveRefs(new Path(t.root, "_log"), Seq(r), conf)
      val cs = r.summaries.get("id")
      assert(cs.tag === "long")
      val mins = files.map(_.stats.get("id").min.toLong)
      val maxs = files.map(_.stats.get("id").max.toLong)
      assert(cs.min.toLong === mins.min, s"id min of $r")
      assert(cs.max.toLong === maxs.max, s"id max of $r")
    }
    val q = "SELECT v FROM graftms.ms.t WHERE id BETWEEN 3005 AND 3030"
    val expected = spark.sql(q).collect().map(_.getDouble(0)).sorted
    assert(expected.length === 26)
    val logDir = new Path(t.root, "_log")
    TxLog.purgeRawCache(logDir)
    TxLog.purgeManifestCache()
    org.apache.spark.sql.graft.SnapshotFileIndex.purgeLayoutCache()
    val totalRefs = hdr.manifests.size
    val before = TxLog.manifestResolutionCount
    val pruned = spark.sql(q).collect().map(_.getDouble(0)).sorted
    val resolved = TxLog.manifestResolutionCount - before
    assert(pruned.toSeq === expected.toSeq, "data-pruned result diverged")
    assert(resolved < totalRefs,
      s"data-column predicate skipped nothing: $resolved of $totalRefs")
    // a predicate every summary admits still reads everything
    assert(spark.sql(
      "SELECT count(*) FROM graftms.ms.t WHERE v > 0").head().getLong(0)
      === 480L)
  }

  test("summaries never skip wrongly: nulls and strings prune conservatively") {
    val root = new Path(freshDir("ms_cons"))
    import spark.implicits._
    val t = TxTable.create(spark, root, "cons",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("region",
          org.apache.spark.sql.types.StringType))), Seq("region"))
    // region values chosen so LEXICOGRAPHIC order is exercised, plus a
    // NULL partition — summaries must record nulls and IsNull reads
    // must keep the manifest
    (0 until 5).foreach { b =>
      val rows = (1 to 40).map { i =>
        val r = if (i % 20 == 0) null
          else f"r${b}%02d_${i % 3}"
        (b * 100L + i, r)
      }
      t.append(rows.toDF("id", "region").repartition(8))
    }
    val hdr = t.snapshotHeader
    val sums = hdr.manifests.flatMap(_.summaries).flatMap(_.get("region"))
    assert(sums.nonEmpty)
    assert(sums.forall(_.tag === "string"))
    assert(sums.exists(_.nullCount > 0), "null partitions not recorded")
    // correctness equivalence: every region + the null bucket (null
    // partition values read back as NULL — the Hive sentinel mapping)
    val all = t.toDF.count()
    val viaEq = t.toDF.filter(col("region") === "r02_1").count()
    val viaNull = t.toDF.filter(col("region").isNull).count()
    assert(all === 200L)
    assert(viaEq === 13L, s"viaEq=$viaEq")
    assert(viaNull === 10L, s"viaNull=$viaNull")
  }

  test("partition-scoped row-level operations plan O(matching manifests)") {
    // r18 VERDICT task 3: the row-level scan paths kept an EAGER
    // supplier — a one-partition UPDATE/DELETE/MERGE parsed every
    // manifest before grouping. Both branches (batch and DV-bearing
    // MOR) now defer through the SAME selectRefs predicate; a file in
    // a skipped manifest provably matches no statement row and is
    // kept, never rewritten. (The commit itself still resolves the
    // table to assemble kept ∪ new — this pins SCAN planning.)
    val t = buildTable(freshDir("ms_rowlvl"))
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    import org.apache.spark.sql.types.DateType
    val day = java.time.LocalDate.parse("2026-01-05").toEpochDay.toInt
    val info = new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
      override def command() = org.apache.spark.sql.connector.write
        .RowLevelOperation.Command.UPDATE
      override def options() =
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
    }
    def planScan(): Long = {
      TxLog.purgeRawCache(new Path(t.root, "_log"))
      TxLog.purgeManifestCache()
      org.apache.spark.sql.graft.SnapshotFileIndex.purgeLayoutCache()
      val before = TxLog.manifestResolutionCount
      val sb = new graft.catalog.GraftV2Table(t)
        .newRowLevelOperationBuilder(info).build()
        .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      val pred = EqualTo(
        AttributeReference("date", DateType)(), Literal(day, DateType))
      sb match {
        case m: org.apache.spark.sql.graft.MorScanBuilder =>
          m.pushFilters(Seq(pred))
        case c: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
          c.pushFilters(Seq(pred))
        case other => fail(s"unexpected builder ${other.getClass}")
      }
      sb.build().toBatch.planInputPartitions()
      TxLog.manifestResolutionCount - before
    }
    val totalRefs = t.snapshotHeader.manifests.size
    assert(totalRefs >= 2, s"nothing to skip: $totalRefs refs")
    val batchResolved = planScan()
    assert(batchResolved < totalRefs,
      s"batch row-level scan resolved $batchResolved of $totalRefs")
    // DV-bearing shape: outstanding deletes must not force the table
    t.deletePos(col("date") === lit(java.sql.Date.valueOf("2026-01-03")) &&
      col("id") % 2 === 0)
    assert(t.snapshot.deletionVectors.nonEmpty)
    val totalRefs2 = t.snapshotHeader.manifests.size
    val morResolved = planScan()
    assert(morResolved < totalRefs2,
      s"MOR row-level scan resolved $morResolved of $totalRefs2")
    // end-to-end: a real UPDATE through SQL on the DV'd partition —
    // deleted rows must NOT resurrect through the rewrite
    spark.sql("""UPDATE graftms.ms.t SET v = v + 10000
                 WHERE date = DATE'2026-01-03'""")
    assert(spark.sql(
      "SELECT count(*) FROM graftms.ms.t WHERE date = DATE'2026-01-03'")
      .head().getLong(0) === 20L, "deleted rows resurrected or lost")
    assert(spark.sql(
      "SELECT count(*) FROM graftms.ms.t WHERE v >= 10000")
      .head().getLong(0) === 20L, "update missed rows")
    assert(spark.sql("SELECT count(*) FROM graftms.ms.t")
      .head().getLong(0) === 460L)
  }

  test("an oversized single-commit spill is born as sealed chunks") {
    // ADVICE r17 medium: only mergeTiers chunked its output — a full-
    // table rewrite or a bulk commit spilling > ManifestSplitMaxFiles
    // entries in ONE placement created a permanent mega-manifest whose
    // summary spanned the whole table (sealed, never re-split), so one
    // matching predicate re-admitted the resolve-everything cold plan.
    // Metadata-only commit: 70k synthetic entries, no parquet written.
    val logDir = new Path(freshDir("ms_megaspill"), "_log")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("date",
        org.apache.spark.sql.types.StringType)))
    val n = TxLog.ManifestSplitMaxFiles + 5000
    val files = (0 until n).map(i => DataFile(
      f"date=2026-01-${i / 8192 + 1}%02d/f$i%07d.parquet",
      Map("date" -> f"2026-01-${i / 8192 + 1}%02d"), 1024L, 10L)).toVector
    TxLog.commit(logDir, None, Snapshot(version = 0L,
      timestampMs = 1700000000000L, operation = "CREATE",
      schemaJson = schema.json, partitionColumns = Seq("date"),
      files = files), conf)
    val hdr = TxLog.readRaw(logDir, 0L, conf)
    assert(hdr.manifests.size >= 2,
      s"one placement produced ${hdr.manifests.size} ref(s) for $n files")
    assert(hdr.manifests.forall(_.fileCount <= TxLog.ManifestSplitMaxFiles),
      s"mega-manifest born: ${hdr.manifests.map(_.fileCount)}")
    // chunks carry their own TIGHT summaries (ingest order is date
    // order here, so the first chunk must not span the whole range)
    val first = hdr.manifests.minBy(r =>
      r.summaries.flatMap(_.get("date")).map(_.min).getOrElse(""))
    val firstMax = first.summaries.flatMap(_.get("date")).map(_.max)
    assert(firstMax.exists(_ < "2026-01-09"),
      s"first chunk's summary spans the table: $firstMax")
    // resolution parity: the chunks concatenate back to the input
    val resolved = TxLog.read(logDir, 0L, conf).files
    assert(resolved.map(_.path) === files.map(_.path),
      "chunked placement changed served order or membership")
  }
}
