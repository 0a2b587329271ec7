package graft
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Dev tool: pre-build the synthetic N-commit / N-file header-only log
  * the metadata shakeouts read (built once, reused across bench runs —
  * immutable once the head version exists). Prints per-decade commit
  * rates so the build cost's growth in accumulated files is visible. */
object BuildMetaLog {
  def main(args: Array[String]): Unit = {
    val commits = if (args.nonEmpty) args(0).toInt else 100000
    val wh = if (args.length > 1) args(1)
      else "target/qwork/bench_metadata100k_wh"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val built = graft.Bench.buildSyntheticLog(spark,
      new Path(s"$wh/meta/big/_log"), commits, verbose = true)
    println(f"built=$built total=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}

/** O(delta) trusted-append probe at the million-ENTRY shape (r12
  * VERDICT task 5): fabricate a log whose head references `args(0)`
  * file entries (bursts of 100k per commit — the entry count is the
  * shape under test, not the commit count), then measure the marginal
  * cost of 1-file appends through
  *  (a) the trusted DELTA path (`appendOf` — the internal
  *      streaming/append path; commit CPU must be O(added + log
  *      files): only the added files are examined, the resolved list
  *      extends by structural sharing), and
  *  (b) the WALKING verify path (the external-caller bar: an O(files)
  *      reference-equality walk — ~2 ns/entry after the r13 `eq`
  *      shortcut, vs ~250 ns/entry for the field-equality compare it
  *      replaced).
  * Both outputs stay byte-identical to the full re-resolving layout
  * (LayoutFuzzSpec pins that). */
object BuildMetaLogWide {
  def main(args: Array[String]): Unit = {
    import graft.table.{DataFile, Snapshot, TxLog}
    import org.apache.hadoop.fs.Path
    val totalFiles = if (args.nonEmpty) args(0).toInt else 1000000
    val wh = if (args.length > 1) args(1) else "target/qwork/bench_metawide_wh"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sessionState.newHadoopConf()
    val logDir = new Path(s"$wh/meta/wide/_log")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    var files = Vector.empty[DataFile]
    var expected: Option[Long] = None
    val t0 = System.nanoTime()
    var next = 0
    while (next < totalFiles) {
      val n = math.min(100000, totalFiles - next)
      files = files ++ (0 until n).map(i => DataFile(
        f"w${next + i}%08d.parquet", Map("date" -> "2026-01-01"), 10L, 100L))
      next += n
      val v = expected.map(_ + 1).getOrElse(0L)
      expected = Some(TxLog.commit(logDir, expected, Snapshot(v,
        1700000000000L + v, if (v == 0) "CREATE" else "APPEND",
        schema.json, Seq("date"), files), conf))
    }
    println(f"seeded $totalFiles entries in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def probe(tag: String, n: Int, delta: Boolean): Double = {
      val s0 = System.nanoTime()
      (0 until n).foreach { _ =>
        val base = TxLog.readCurrentTrusted(logDir, conf).get
        val v = base.version + 1
        val added = DataFile(f"$tag-$v%08d.parquet",
          Map("date" -> "2026-01-01"), 10L, 100L)
        TxLog.commit(logDir, Some(base.version), base.copy(version = v,
          timestampMs = base.timestampMs + 1, operation = "APPEND",
          files = base.files :+ added, added = Nil,
          manifests = Nil, manifestList = None), conf,
          appendOf = if (delta) Some((base, Seq(added))) else None)
      }
      (System.nanoTime() - s0) / 1e9 / n
    }
    probe("warm", 5, delta = true)
    val d = probe("d", 50, delta = true)
    val w = probe("w", 50, delta = false)
    println(f"entries=$totalFiles delta_ms_per_commit=${d * 1000}%.3f " +
      f"walk_ms_per_commit=${w * 1000}%.3f walk_over_delta=${w / d}%.1f")
    spark.stop()
  }
}

/** Marginal-rate probe: append `n` more 1-file commits at the CURRENT
  * head of an existing synthetic log and print the rate — run on a
  * quiet machine against logs of different sizes, this isolates how
  * per-commit cost grows with accumulated table size (fs-directory
  * scaling + the O(files) carried-entry verify), with none of the
  * noise a 50-minute full build accumulates. */
object BuildMetaLogExtend {
  def main(args: Array[String]): Unit = {
    import graft.table.{DataFile, Snapshot, TxLog}
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val wh = if (args.length > 1) args(1)
      else "target/qwork/bench_metadata100k_wh"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val logDir = new Path(s"$wh/meta/big/_log")
    val conf = spark.sessionState.newHadoopConf()
    val head = TxLog.currentVersion(logDir, conf).getOrElse(
      sys.error(s"no log at $logDir"))
    val snap = TxLog.read(logDir, head, conf)
    var files = snap.files.toVector
    var expected: Option[Long] = Some(head)
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      val v = expected.get + 1
      files = files :+ DataFile(f"x$v%08d.parquet",
        Map("date" -> f"2026-01-${i % 28 + 1}%02d"), 1000L, 1000000L)
      expected = Some(TxLog.commit(logDir, expected, snap.copy(
        version = v, timestampMs = snap.timestampMs + v,
        operation = "APPEND", files = files, added = Nil,
        manifests = Nil, manifestList = None), conf))
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"extended head=$head by $n in $dt%.1f s (${n / dt}%.0f commits/s)")
    spark.stop()
  }
}
