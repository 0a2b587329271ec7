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
 * byte-identity of every file either log writes: headers AND
 * manifests. Any placement, stamping, or `added`-provenance divergence
 * between the paths shows up as a raw byte mismatch.
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
          // append burst — pushes `remaining` past InlineMaxFiles so
          // manifest spills (and eventually the all-refs compaction)
          // exercise on both paths
          files = files ++ (0 until 12 + rnd.nextInt(20)).map(_ => newFile(0L))
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
    // manifest file names embed a random UUID (orphan-safe naming), so
    // "byte-identical" is asserted modulo that: each side's manifest
    // names canonicalize to m-<version> (at most one new manifest per
    // commit) and header bytes compare after substituting the actual
    // names with the canonical ones
    val ManifestRe = """m-(\d{8})-[0-9a-f-]+\.manifest\.json""".r
    def canonicalize(files: Map[String, Array[Byte]])
        : Map[String, Array[Byte]] = {
      val rename: Map[String, String] = files.keys.collect {
        case n @ ManifestRe(v) => n -> s"m-$v.manifest.json"
      }.toMap
      files.map { case (name, bytes) =>
        val canonName = rename.getOrElse(name, name)
        val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val canonText = rename.foldLeft(text) { case (t, (from, to)) =>
          t.replace(from, to) }
        canonName -> canonText.getBytes(java.nio.charset.StandardCharsets.UTF_8)
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
    // the all-refs compaction branch (kept manifests at the cap,
    // everything rewritten into ONE manifest) must have fired at least
    // once on this sequence — a header whose manifest list is exactly
    // one entry while the table is well past the inline size
    val sawCompaction = (0L to expected.get).exists { v =>
      val s = TxLog.read(dirA, v, conf)
      s.files.size > 40 && {
        val raw = new String(a(f"v$v%08d.metadata.json"),
          java.nio.charset.StandardCharsets.UTF_8)
        ("\"m-" + "\\d{8}").r.findAllIn(raw).size == 1
      }
    }
    assert(sawCompaction,
      "fuzz sequence never exercised the all-refs compaction branch")
    // and the resolved head state agrees with the logical state
    val headA = TxLog.read(dirA, expected.get, conf)
    assert(headA.files.map(_.path).sorted ===
      files.map(_.path).sorted.distinct)
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
}
