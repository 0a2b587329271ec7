package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/**
 * Differential fuzz for the round-11 O(delta) append fast path in
 * [[TxLog.layout]]: the SAME randomized commit sequence (appends with
 * and without pre-stamped seqs, carried-entry mutations, removals,
 * compaction-triggering bursts) runs against two logs — one committed
 * normally (warm head-state cache → fast path fires on pure appends),
 * one with the cache purged before EVERY commit (cold → the full
 * re-resolving path, the pre-round-11 behavior). The contract is
 * byte-identity of every file either log writes: headers, manifests,
 * AND (round 12) the two-level layout's manifest-list files. Any
 * placement, stamping, tier-merge, ref-list-spill, or
 * `added`-provenance divergence between the paths shows up as a raw
 * byte mismatch.
 */
class LayoutFuzzSpec extends SparkSpec {

  private def conf = spark.sessionState.newHadoopConf()

  private def listFiles(dir: java.io.File): Map[String, Array[Byte]] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("."))
      // the hint file is a best-effort overwrite (not part of the
      // committed state contract) but should match here too since the
      // sequences are identical — keep it in the comparison
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath)).toMap

  test("fast-path and full-path layouts write byte-identical logs") {
    val rnd = new scala.util.Random(4211L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val baseA = new java.io.File(freshDir("layout_fuzz_a"), "_log")
    val baseB = new java.io.File(freshDir("layout_fuzz_b"), "_log")
    val dirA = new Path(baseA.getAbsolutePath)
    val dirB = new Path(baseB.getAbsolutePath)

    // one shared evolving logical state; each step derives the next
    // file list, then both logs commit the IDENTICAL snapshot
    var files = Vector.empty[DataFile]
    var expected: Option[Long] = None
    var nextId = 0
    def newFile(seq: Long): DataFile = {
      nextId += 1
      DataFile(f"f$nextId%06d.parquet",
        Map("date" -> f"2026-02-${nextId % 28 + 1}%02d"),
        rowCount = 100L + nextId, sizeBytes = 1000L * (nextId % 7 + 1),
        seq = seq)
    }
    (0 until 320).foreach { i =>
      val version = expected.map(_ + 1).getOrElse(0L)
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 | 4 | 5 =>
          // pure append, 1-3 files; half the time the caller drops the
          // seq (0 → stamped with this version), half pre-stamps it
          files = files ++ (0 until 1 + rnd.nextInt(3)).map(_ =>
            newFile(if (rnd.nextBoolean()) 0L else version))
        case 6 =>
          // append burst — pushes `remaining` past InlineMaxFiles (32)
          // so manifest spills (and eventually tier merges + ref-list
          // spills) exercise on both paths
          files = files ++ (0 until 34 + rnd.nextInt(60)).map(_ => newFile(0L))
        case 7 if files.nonEmpty =>
          // removal (a rewrite dropping files) — must force the full
          // path and still lay out identically
          val drop = rnd.nextInt(files.size)
          files = files.patch(drop, Nil, 1 + rnd.nextInt(
            math.min(3, files.size - drop)))
        case 8 if files.nonEmpty =>
          // carried-entry mutation (stats change on a live path) —
          // the fast path must detect it and fall back
          val at = rnd.nextInt(files.size)
          files = files.updated(at,
            files(at).copy(rowCount = files(at).rowCount + 1))
        case _ =>
          // caller passes carried entries with seq dropped to 0 — the
          // stamping rule must re-adopt stored seqs on BOTH paths
          files = files.map(f =>
            if (rnd.nextBoolean()) f.copy(seq = 0L) else f)
      }
      def snap = Snapshot(version = version,
        timestampMs = 1700000000000L + i * 1000L,
        operation = if (version == 0L) "CREATE" else "APPEND",
        schemaJson = schema.json,
        partitionColumns = Seq("date"), files = files)
      TxLog.commit(dirA, expected, snap, conf)
      TxLog.purgeRawCache(dirB)           // cold cache → full path
      TxLog.commit(dirB, expected, snap, conf)
      expected = Some(version)
    }
    // manifest and manifest-list file names embed a random UUID
    // (orphan-safe naming), so "byte-identical" is asserted modulo
    // that: manifests canonicalize to m-<version>-<contentHash> (a
    // tier-merge commit can write SEVERAL manifests at one version:
    // the spill plus cascading merges — content-hash naming matches
    // them across logs iff their contents match), the renames are then
    // substituted into every file's text (headers AND list files embed
    // manifest names), and finally list files canonicalize by the hash
    // of their substituted content.
    val ManifestRe = """m-(\d{8})-[0-9a-f-]+\.manifest\.json""".r
    // header-CARRIED manifest refs embed a publish nonce in the NAME
    // (orphan-safe like the UUID file names) — collapse it before the
    // byte comparison; the carried CONTENT is compared as part of the
    // header bytes themselves
    val HdrNonceRe = """hdr:v(\d+)-[0-9a-f]+"""
    val ListRe = """ml-(\d{8})-[0-9a-f-]+\.manifestlist\.json""".r
    def sha(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
        .take(8).map("%02x".format(_)).mkString
    def canonicalize(files: Map[String, Array[Byte]])
        : Map[String, Array[Byte]] = {
      val manifestRename: Map[String, String] = files.collect {
        case (n @ ManifestRe(v), bytes) =>
          n -> s"m-$v-${sha(bytes)}.manifest.json"
      }
      def substitute(bytes: Array[Byte], renames: Map[String, String]) = {
        val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        renames.foldLeft(text) { case (t, (from, to)) => t.replace(from, to) }
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }
      val pass1 = files.map { case (name, bytes) =>
        val text = new String(substitute(bytes, manifestRename),
          java.nio.charset.StandardCharsets.UTF_8)
        manifestRename.getOrElse(name, name) ->
          text.replaceAll(HdrNonceRe, "hdr:v$1")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }
      val listRename: Map[String, String] = pass1.collect {
        case (n @ ListRe(v), bytes) =>
          n -> s"ml-$v-${sha(bytes)}.manifestlist.json"
      }
      pass1.map { case (name, bytes) =>
        listRename.getOrElse(name, name) -> substitute(bytes, listRename)
      }
    }
    val a = canonicalize(listFiles(baseA))
    val b = canonicalize(listFiles(baseB))
    assert(a.keySet === b.keySet,
      s"file sets diverged: ${a.keySet.diff(b.keySet)} vs ${b.keySet.diff(a.keySet)}")
    a.foreach { case (name, bytes) =>
      assert(java.util.Arrays.equals(bytes, b(name)),
        s"$name differs between fast-path and full-path logs")
    }
    // the tiered-merge branch must have fired on this sequence: some
    // version references a manifest holding ≥ TierBase×TierUnit (36)
    // files — only a merge produces one that large from 9-file spills
    val rawHeads = (0L to expected.get).map(v =>
      TxLog.readRaw(dirA, v, conf))
    assert(rawHeads.exists(_.manifests.exists(_.fileCount >= 36)),
      "fuzz sequence never exercised the tier-merge branch")
    // ...and it BOUNDS the ref list: logarithmic in table size, never
    // O(spills) — 320 commits of 1-30 files stay well under 16 refs
    assert(rawHeads.forall(_.manifests.size <= 16),
      s"ref list unbounded: ${rawHeads.map(_.manifests.size).max} refs")
    // (ref-list spill to a manifest-list file needs 4 populated tiers
    // ≈ 2,300+ files — covered by the dedicated deterministic test
    // below, not this sequence)
    // and the resolved head state agrees with the logical state
    val headA = TxLog.read(dirA, expected.get, conf)
    assert(headA.files.map(_.path).sorted ===
      files.map(_.path).sorted.distinct)
  }

  test("spec-evolution commits lay out byte-identically on both paths") {
    // a metadata-only EVOLVE_SPEC commit rides the O(delta) append
    // fast path (files unchanged, zero added) with CHANGED
    // partitionColumns / partitionSpec / previousSpecFields — the
    // byte-identity contract must hold for it and for the appends
    // that follow under the new spec. Inline-only file counts keep
    // every byte deterministic (no UUID manifest names to
    // canonicalize).
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val baseA = new java.io.File(freshDir("layout_evolve_a"), "_log")
    val baseB = new java.io.File(freshDir("layout_evolve_b"), "_log")
    val dirA = new Path(baseA.getAbsolutePath)
    val dirB = new Path(baseB.getAbsolutePath)
    val daySpec = Seq(PartField("ts_day", "day", "ts"))
    val monthSpec = Seq(PartField("ts_month", "month", "ts"))
    val dayFiles = (0 until 20).map(i => DataFile(
      f"ts_day=2026-01-${i % 5 + 1}%02d/d$i%04d.parquet",
      Map("ts_day" -> f"2026-01-${i % 5 + 1}%02d"), 10L, 1000L,
      seq = 0L)).toVector
    val monthFiles = (0 until 3).map(i => DataFile(
      f"ts_month=2026-02/m$i%04d.parquet",
      Map("ts_month" -> "2026-02"), 10L, 1000L, seq = 2L)).toVector
    val steps: Seq[Snapshot] = Seq(
      Snapshot(0L, 1700000000000L, "CREATE", schema.json, Seq("ts_day"),
        dayFiles, partitionSpec = daySpec),
      // the evolution: same files, new spec, day retired
      Snapshot(1L, 1700000001000L, "EVOLVE_SPEC", schema.json,
        Seq("ts_month"), dayFiles, partitionSpec = monthSpec,
        previousSpecFields = daySpec),
      // appends under the NEW spec keep carrying the retired fields
      Snapshot(2L, 1700000002000L, "APPEND", schema.json,
        Seq("ts_month"), dayFiles ++ monthFiles,
        partitionSpec = monthSpec, previousSpecFields = daySpec))
    var expected: Option[Long] = None
    steps.foreach { snap =>
      TxLog.commit(dirA, expected, snap, conf)
      TxLog.purgeRawCache(dirB)           // cold cache → full path
      TxLog.commit(dirB, expected, snap, conf)
      expected = Some(snap.version)
    }
    val a = listFiles(baseA)
    val b = listFiles(baseB)
    assert(a.keySet === b.keySet,
      s"file sets diverged: ${a.keySet.diff(b.keySet)} vs ${b.keySet.diff(a.keySet)}")
    a.foreach { case (name, bytes) =>
      assert(java.util.Arrays.equals(bytes, b(name)),
        s"$name differs between fast-path and full-path logs")
    }
    // the retired fields round-trip through parse and resolution
    val head = TxLog.read(dirA, 2L, conf)
    assert(head.previousSpecFields === daySpec)
    assert(head.partitionSpec === monthSpec)
    assert(head.files.size === 23)
  }

  test("ref list spills to a manifest-list file, is reused, and cascades") {
    // Deterministic walk of the two-level layout's whole life cycle:
    // tier-sized bursts (33, 150, 550 files — tiers 1, 2, 3 at
    // TierUnit 33) stack three manifests per tier WITHOUT triggering a
    // merge, pushing the ref list past the inline bound (9 > 8) → refs
    // move to a manifest-list file and the header stores
    // "manifests":[]; pure-inline appends then REUSE the parent's list
    // file byte-for-byte (zero ref-list writes on the hot append
    // path); a fourth tier-1 burst finally fires the full merge
    // CASCADE (4 at tier 1 → merged lands in tier 2 → 4 there → tier 3
    // → 4 there → one tier-4 manifest), collapsing the refs back
    // inline.
    val base = new java.io.File(freshDir("layout_mlist"), "_log")
    val dir = new Path(base.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    var files = Vector.empty[DataFile]
    var expected: Option[Long] = None
    var nextId = 0
    def commitBurst(n: Int): Unit = {
      files = files ++ (0 until n).map { _ =>
        nextId += 1
        DataFile(f"b$nextId%06d.parquet", Map("date" -> "2026-03-01"),
          10L, 100L)
      }
      val v = expected.map(_ + 1).getOrElse(0L)
      TxLog.commit(dir, expected, Snapshot(version = v,
        timestampMs = 1700000000000L + v * 1000L,
        operation = if (v == 0L) "CREATE" else "APPEND",
        schemaJson = schema.json, partitionColumns = Seq("date"),
        files = files), conf)
      expected = Some(v)
    }
    commitBurst(0)                                   // CREATE, empty
    Seq(33, 33, 33, 150, 150, 150, 550, 550, 550).foreach(commitBurst)
    val atSpill = TxLog.readRaw(dir, expected.get, conf)
    assert(atSpill.manifests.size === 9)
    assert(atSpill.manifestList.isDefined,
      "9 refs should have spilled to a manifest-list file")
    // the STORED header really is two-level: empty inline refs
    val storedText = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(base, f"v${expected.get}%08d.metadata.json").toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(storedText.contains(""""manifests":[]"""))
    assert(storedText.contains(atSpill.manifestList.get))
    // pure-inline appends reuse the parent's list file (no new writes)
    commitBurst(2); commitBurst(3)
    val reused = TxLog.readRaw(dir, expected.get, conf)
    assert(reused.manifestList === atSpill.manifestList,
      "inline append should reuse the parent's manifest-list file")
    assert(reused.manifests === atSpill.manifests)
    // fourth tier-1 burst → full cascade to ONE manifest, refs inline
    // again (the 5 inline files ride along into the spill first:
    // 5 + 33 = 38 files, still tier 1)
    commitBurst(33)
    val cascaded = TxLog.readRaw(dir, expected.get, conf)
    assert(cascaded.manifests.size === 1,
      s"cascade should collapse to one manifest, got ${cascaded.manifests}")
    assert(cascaded.manifestList.isEmpty)
    assert(cascaded.manifests.head.fileCount === files.size)
    // resolution stayed exact through spill, reuse, and cascade
    val head = TxLog.read(dir, expected.get, conf)
    assert(head.files.map(_.path).sorted === files.map(_.path).sorted)
  }

  test("pre-upgrade logs (inline refs, no list files) read and extend") {
    // a log written BEFORE the two-level layout: headers carry their
    // manifest refs inline (the old shape allowed up to 32) and no
    // manifestList field at all — hand-written JSON, not round-tripped
    // through current code, so this pins true cross-version readability
    val base = new java.io.File(freshDir("layout_upgrade"), "_log")
    base.mkdirs()
    val dir = new Path(base.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    def write(name: String, text: String): Unit =
      java.nio.file.Files.write(new java.io.File(base, name).toPath,
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def manifestJson(paths: Seq[String]): String =
      s"""{"files":[${paths.map(p =>
        s"""{"path":"$p","partitionValues":{"date":"2026-02-01"},""" +
          s""""rowCount":10,"sizeBytes":100}""").mkString(",")}]}"""
    // 10 manifests of 9 files each — MORE than the new inline-refs
    // bound, proving the reader takes stored inline refs as-is
    val manifestNames = (0 until 10).map(i =>
      f"m-00000000-0000-0000-0000-00000000000$i.manifest.json")
    val allPaths = (0 until 10).flatMap(i =>
      (0 until 9).map(j => f"old-$i%02d-$j%02d.parquet"))
    manifestNames.zipWithIndex.foreach { case (nm, i) =>
      write(nm, manifestJson(allPaths.slice(i * 9, i * 9 + 9)))
    }
    val refsJson = manifestNames.map(nm =>
      s"""{"path":"$nm","fileCount":9}""").mkString(",")
    write("v00000000.metadata.json",
      s"""{"version":0,"timestampMs":1700000000000,"operation":"CREATE",""" +
        s""""schemaJson":${org.json4s.jackson.JsonMethods.compact(
          org.json4s.JString(schema.json))},""" +
        s""""partitionColumns":["date"],"files":[],""" +
        s""""manifests":[$refsJson]}""")
    val head0 = TxLog.read(dir, 0L, conf)
    assert(head0.files.map(_.path).sorted === allPaths.sorted)
    // extend it: the new layout takes over (tier-merges the ten 9-file
    // manifests, spilling refs to a list only if still past the bound)
    // and the resolved state stays exact
    val more = (0 until 3).map(i => DataFile(f"new-$i%02d.parquet",
      Map("date" -> "2026-02-02"), 10L, 100L))
    TxLog.commit(dir, Some(0L), Snapshot(version = 1L,
      timestampMs = 1700000001000L, operation = "APPEND",
      schemaJson = schema.json, partitionColumns = Seq("date"),
      files = head0.files ++ more), conf)
    val head1 = TxLog.read(dir, 1L, conf)
    assert(head1.files.map(_.path).sorted ===
      (allPaths ++ more.map(_.path)).sorted)
    // v0 stays byte-untouched and still readable (time travel below
    // the upgrade boundary)
    TxLog.purgeRawCache(dir)
    assert(TxLog.read(dir, 0L, conf).files.size === 90)
    // the ten same-tier manifests merged: the new head's ref list is
    // bounded, not inherited at length 10+
    val raw1 = TxLog.readRaw(dir, 1L, conf)
    assert(raw1.manifests.size <= 4,
      s"upgrade commit kept ${raw1.manifests.size} refs")
  }

  test("pre-upgrade over-bound inline refs stay inline on no-change commits") {
    // a pre-upgrade header carrying 10 INLINE refs spread across tiers
    // (no merge fires): a pure-inline append keeps the refs unchanged —
    // the layout must NOT start writing a fresh manifest-list file per
    // commit just because the count is past the new inline bound
    val base = new java.io.File(freshDir("layout_grandfather"), "_log")
    base.mkdirs()
    val dir = new Path(base.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    def write(name: String, text: String): Unit =
      java.nio.file.Files.write(new java.io.File(base, name).toPath,
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def manifestJson(paths: Seq[String]): String =
      s"""{"files":[${paths.map(p =>
        s"""{"path":"$p","partitionValues":{"date":"2026-02-01"},""" +
          s""""rowCount":10,"sizeBytes":100}""").mkString(",")}]}"""
    // tier spread 3/3/3/1 (sizes 9, 40, 150, 600) — below every merge
    // threshold, 10 refs total
    val sizes = Seq(9, 9, 9, 40, 40, 40, 150, 150, 150, 600)
    var next = 0
    val refs = sizes.zipWithIndex.map { case (n, i) =>
      val nm = f"m-00000000-0000-0000-0000-0000000000$i%02d.manifest.json"
      val paths = (0 until n).map { _ => next += 1; f"g$next%06d.parquet" }
      write(nm, manifestJson(paths))
      (nm, n)
    }
    write("v00000000.metadata.json",
      s"""{"version":0,"timestampMs":1700000000000,"operation":"CREATE",""" +
        s""""schemaJson":${org.json4s.jackson.JsonMethods.compact(
          org.json4s.JString(schema.json))},""" +
        s""""partitionColumns":["date"],"files":[],""" +
        s""""manifests":[${refs.map { case (nm, n) =>
          s"""{"path":"$nm","fileCount":$n}""" }.mkString(",")}]}""")
    val head0 = TxLog.read(dir, 0L, conf)
    assert(head0.files.size === sizes.sum)
    // two pure-inline appends: refs unchanged, so the headers must keep
    // them INLINE (no manifest-list file appears in the log dir)
    (1L to 2L).foreach { v =>
      TxLog.commit(dir, Some(v - 1), Snapshot(version = v,
        timestampMs = 1700000000000L + v, operation = "APPEND",
        schemaJson = schema.json, partitionColumns = Seq("date"),
        files = TxLog.read(dir, v - 1, conf).files :+
          DataFile(f"new-$v%02d.parquet", Map("date" -> "2026-02-02"),
            10L, 100L)), conf)
      val raw = TxLog.readRaw(dir, v, conf)
      assert(raw.manifestList.isEmpty, s"v$v spilled refs to a list file")
      assert(raw.manifests.map(_.path) === refs.map(_._1))
    }
    assert(!base.listFiles().exists(_.getName.endsWith(".manifestlist.json")))
    assert(TxLog.read(dir, 2L, conf).files.size === sizes.sum + 2)
  }

  test("concurrent appends stay coherent through the layout cache") {
    // 4 threads race CAS appends on ONE log; a loser re-reads the head
    // and retries. The head-state cache updates only after a CAS win,
    // so a racing thread sees either the PREVIOUS state (version
    // mismatch → full re-resolving path) or the WINNER's (fast path) —
    // either way the final log must hold every thread's files, and the
    // resolved head must match a cache-purged (cold) re-read exactly.
    val base = new java.io.File(freshDir("layout_race"), "_log")
    val dir = new Path(base.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    TxLog.commit(dir, None, Snapshot(0L, 1700000000000L, "CREATE",
      schema.json, Seq("date"), Vector.empty), conf)
    val perThread = 25
    val threads = (0 until 4).map { tid =>
      new Thread(() => {
        (0 until perThread).foreach { i =>
          val mine = DataFile(f"t$tid%02d-f$i%04d.parquet",
            Map("date" -> "2026-02-01"), 1L, 10L)
          var done = false
          while (!done) {
            val cur = TxLog.currentVersion(dir, conf).get
            val snap = TxLog.read(dir, cur, conf)
            try {
              TxLog.commit(dir, Some(cur), Snapshot(cur + 1,
                1700000000000L + cur * 10 + 5, "APPEND", schema.json,
                Seq("date"), snap.files :+ mine), conf)
              done = true
            } catch { case _: CommitConflictException => () }
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val head = TxLog.currentVersion(dir, conf).get
    assert(head === 4L * perThread)
    val warm = TxLog.read(dir, head, conf)
    assert(warm.files.size === 4 * perThread)
    assert(warm.files.map(_.path).distinct.size === 4 * perThread)
    // cold re-read (cache purged) resolves the identical state
    TxLog.purgeRawCache(dir)
    val cold = TxLog.read(dir, head, conf)
    assert(cold.files.sortBy(_.path) === warm.files.sortBy(_.path))
  }

  test("lifecycle fuzz: random append/delete/overwrite/tag/expire/vacuum/restore keeps head and tags exact") {
    // Seeded random interplay across the WHOLE retention machinery —
    // appends accumulating through carried tier-0 spills and tier
    // merges, COW/MOR deletes, compaction rewrites, tags, expiry at
    // random horizons (leaving header gaps above a later vacuum's
    // window — the r15 retainedBy fix), vacuum at grace 0, and
    // restores of tagged versions. The durable contract checked on a
    // COLD handle every few steps: the head reads exactly the model's
    // rows, and every TAG still time-travels to exactly the rows it
    // pinned (Iceberg's refs-survive-maintenance rule), whatever
    // maintenance ran in between.
    import org.apache.spark.sql.functions.{col, concat, lit}
    val root = new Path(freshDir("lifecycle_fuzz"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType)))
    var t = TxTable.create(spark, root, "fz", schema, Nil)
    val rnd = new scala.util.Random(20260816L)
    var nextId = 0L
    def batch(n: Int): (org.apache.spark.sql.DataFrame, Set[Long]) = {
      val ids = (nextId until nextId + n).toSet; nextId += n
      import spark.implicits._
      (ids.toSeq.sorted.toDF("id")
        .withColumn("payload", concat(lit("p"), col("id")))
        .repartition(1), ids)
    }
    var headIds = Set.empty[Long]
    var tagged = Map.empty[String, Set[Long]]
    var tagN = 0
    // branch model: name -> (expected ids on the branch, fork version)
    var branched = Map.empty[String, (Set[Long], Long)]
    var brN = 0
    (1 to 130).foreach { step =>
      rnd.nextInt(16) match {
        case 0 | 1 | 2 | 3 | 4 | 5 =>              // single-file append
          val (df, ids) = batch(1 + rnd.nextInt(3))
          t.append(df); headIds ++= ids
        case 6 =>                                  // COW/MOR delete
          if (headIds.nonEmpty) {
            val k = 2 + rnd.nextInt(5)
            t.delete(col("id") % k === 0)
            headIds = headIds.filterNot(_ % k == 0)
          }
        case 7 =>                                  // overwrite
          val (df, ids) = batch(2)
          t.overwrite(df); headIds = ids
        case 8 =>                                  // tag the head
          tagN += 1; val name = s"tag$tagN"
          t.tag(name); tagged += name -> headIds
        case 9 =>                                  // expire, TIGHT horizon
          t.expireSnapshots(1 + rnd.nextInt(3))
        case 10 =>                                 // orphan sweep, grace 0,
          // WIDER window than the expires — overlapping an expiry gap
          // (the r15 retainedBy fix) is a sequence this fuzz must hit
          t.vacuum(3 + rnd.nextInt(5), graceMillis = 0L)
        case 11 =>                                 // restore a random tag
          if (tagged.nonEmpty) {
            val (name, ids) =
              tagged.toSeq(rnd.nextInt(tagged.size))
            t.restore(t.tags(name)); headIds = ids
          }
        case 12 =>                                 // fork a branch
          if (branched.size < 2) {
            brN += 1; val name = s"br$brN"
            val fork = t.createBranch(name)
            branched += name -> (headIds, fork)
          }
        case 13 =>                                 // append on a branch
          if (branched.nonEmpty) {
            val (name, (ids, fork)) =
              branched.toSeq(rnd.nextInt(branched.size))
            val (df, fresh) = batch(1 + rnd.nextInt(2))
            t.branch(name).append(df)
            branched += name -> (ids ++ fresh, fork)
          }
        case 14 =>                                 // publish when eligible
          // fast-forward requires main unmoved since the fork — which
          // also means the fork header is the LIVE head, so no expiry
          // in between can have removed it (the reason forks need no
          // explicit expire protection)
          branched.find(_._2._2 == t.currentVersion).foreach {
            case (name, (ids, _)) =>
              t.fastForward(name); headIds = ids
              t.dropBranch(name); branched -= name
          }
        case 15 =>                                 // full maintenance policy
          // the r16 one-call/declarative path mid-lifecycle: random
          // thresholds, zero grace — compaction + expiry + vacuum
          // composed in the policy's own order must preserve the
          // model's rows, tags, and branches like the individual arms
          t.maintainTable(
            minSmallFiles = 2 + rnd.nextInt(6),
            retainSnapshots = 1 + rnd.nextInt(5),
            removeOrphans = rnd.nextBoolean(),
            orphanGraceMs = 0L)
      }
      if (step % 10 == 0) {
        // COLD verification: purge every in-process log cache and
        // re-open the table, so reads resolve through stored headers,
        // carried manifests, and sidecars alone
        TxLog.purgeRawCacheUnder(new Path(root, "_log"))
        t = TxTable.open(spark, root, "fz")
        val got = t.toDF.select("id").collect().map(_.getLong(0)).toSet
        assert(got === headIds,
          s"step $step head mismatch: missing ${headIds -- got}, " +
            s"extra ${got -- headIds}")
        tagged.foreach { case (name, ids) =>
          val at = t.asOfTag(name).select("id").collect()
            .map(_.getLong(0)).toSet
          assert(at === ids,
            s"step $step tag $name mismatch: missing ${ids -- at}, " +
              s"extra ${at -- ids}")
        }
        // branch chains read their own expected rows — main's expiry
        // and zero-grace vacuums must never reclaim what a live branch
        // references (branchRetainedFiles)
        branched.foreach { case (name, (ids, _)) =>
          val at = t.branch(name).toDF.select("id").collect()
            .map(_.getLong(0)).toSet
          assert(at === ids,
            s"step $step branch $name mismatch: missing ${ids -- at}, " +
              s"extra ${at -- ids}")
        }
      }
    }
    assert(tagged.nonEmpty && nextId > 50 && brN >= 1,
      s"fuzz degenerate: ${tagged.size} tags, $nextId ids, $brN branches")
    // deterministic coda: the exact adjacency the random walk may
    // visit rarely — a TIGHT expire immediately under a WIDE vacuum
    // window, so the sweep is GUARANTEED to walk headers the expiry
    // just removed (throws FileNotFoundException without retainedBy)
    t.expireSnapshots(1)
    t.vacuum(8, graceMillis = 0L)
    TxLog.purgeRawCacheUnder(new Path(root, "_log"))
    t = TxTable.open(spark, root, "fz")
    assert(t.toDF.select("id").collect().map(_.getLong(0)).toSet === headIds)
    tagged.foreach { case (name, ids) =>
      assert(t.asOfTag(name).select("id").collect()
        .map(_.getLong(0)).toSet === ids, s"coda tag $name")
    }
  }
}
