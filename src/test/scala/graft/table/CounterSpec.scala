package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/**
 * Commit-time maintenance counters (r16 VERDICT task 3): every commit
 * stamps [[Snapshot.counters]] — incrementally on the O(delta) append
 * paths — and the per-commit auto-maintain gate reads ONLY them. The
 * pinned contract: counter == recount over the resolved file list, for
 * every commit shape (append, compact, delete, restore, overwrite).
 */
class CounterSpec extends SparkSpec {

  private def recount(s: Snapshot): Map[String, Long] = {
    val thr = s.properties.get(TxTable.MaintainPrefix + "smallFileBytes")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .filter(_ > 0).getOrElse(64L * 1024 * 1024)
    val base = Map(
      "totalFiles" -> s.files.size.toLong,
      "totalBytes" -> s.files.map(_.sizeBytes).sum,
      "smallCount" -> s.files.count(_.sizeBytes < thr).toLong,
      "smallThreshold" -> thr)
    if (s.files.forall(_.rowCount >= 0))
      base + ("totalRows" -> s.files.map(_.rowCount).sum)
    else base
  }

  private def checkCounters(t: TxTable, where: String): Unit = {
    val s = t.snapshot
    recount(s).foreach { case (k, v) =>
      assert(s.counters.get(k).contains(v),
        s"$where: counter $k=${s.counters.get(k)} != recount $v " +
          s"(counters: ${s.counters})")
    }
    // cum* are monotone and conserve: total = cumAdded - cumRemoved
    // (counters started at CREATE, so the identity is exact here)
    assert(s.counters("cumAdded") - s.counters("cumRemoved") ===
      s.files.size.toLong, s"$where: cum identity broken: ${s.counters}")
  }

  test("counters == recount across append / compact / delete / restore / overwrite") {
    import spark.implicits._
    val t = TxTable.create(spark, new Path(freshDir("counters")), "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))), Nil)
    checkCounters(t, "create")
    (1 to 12).foreach { i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v"))
      checkCounters(t, s"append $i")
    }
    val restorePoint = t.currentVersion
    t.compactSmallFiles()
    checkCounters(t, "compact")
    t.delete(org.apache.spark.sql.functions.expr("id <= 3"))
    checkCounters(t, "delete")
    t.restore(restorePoint)
    checkCounters(t, "restore")
    t.overwrite((13L to 20L).map(i => (i, s"w$i")).toDF("id", "v"))
    checkCounters(t, "overwrite")
    // threshold reconfiguration: the next commit recounts against the
    // new configured threshold and stamps it
    t.setProperties(Map(TxTable.MaintainPrefix + "smallFileBytes" -> "1"))
    t.append(Seq((21L, "z")).toDF("id", "v"))
    val s = t.snapshot
    assert(s.counters("smallThreshold") === 1L)
    assert(s.counters("smallCount") === 0L,
      s"no file is under 1 byte: ${s.counters}")
    checkCounters(t, "rethreshold")
  }

  test("the O(1) gate: quiet counters skip, a crossed signal admits") {
    import spark.implicits._
    val t = TxTable.create(spark, new Path(freshDir("countergate")), "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Nil)
    t.setProperties(Map(
      TxTable.MaintainPrefix + "minSmallFiles" -> "6",
      TxTable.MaintainPrefix + "retainSnapshots" -> "100"))
    (1L to 3L).foreach(i => t.append(Seq(i).toDF("id")))
    // no evaluation memo yet → due (conservative)
    assert(!t.maintenanceQuiet(t.snapshot))
    // one auto-shaped sweep evaluates and memoizes
    t.maintainTableConfigured(orphanGraceMs = Some(0L), trigger = "auto")
    assert(t.maintenanceQuiet(t.snapshot),
      s"gate not quiet after a full evaluation: ${t.snapshot.counters}")
    // small-file signal crosses → due, exactly at the configured floor
    (4L to 6L).foreach(i => t.append(Seq(i).toDF("id")))
    assert(!t.maintenanceQuiet(t.snapshot),
      s"gate quiet with ${t.snapshot.counters("smallCount")} small files")
    // a policy-property change invalidates the memo
    t.maintainTableConfigured(orphanGraceMs = Some(0L), trigger = "auto")
    val afterSweep = t.snapshot
    if (t.maintenanceQuiet(afterSweep)) {
      t.setProperties(Map(TxTable.MaintainPrefix + "minSmallFiles" -> "2"))
      assert(!t.maintenanceQuiet(t.snapshot),
        "gate quiet across a policy change")
    }
    // pre-upgrade headers (no counters) are always due
    assert(!t.maintenanceQuiet(afterSweep.copy(counters = Map.empty)))
  }

  test("age-retention gates O(1): quiet while young, due past the horizon") {
    import spark.implicits._
    // r17 answered "due" unconditionally whenever maxSnapshotAgeMs was
    // configured, so an age-policied table paid a full background
    // sweep evaluation on EVERY commit. The cleared-through memo makes
    // the age dimension gateable: quiet until wall clock passes the
    // last cleared horizon + maxAge + slack.
    // maxAge and slack both 10 min: nothing ages out during the test,
    // and the quiet window after a sweep (= slack) is comfortably
    // wider than the sweep itself. The horizon-passed case is driven
    // by rolling the memo back directly — waiting out a real horizon
    // would make the spec wall-clock-long and flaky.
    val maxAge = 600000L
    val root = new Path(freshDir("agegate"))
    val t = TxTable.create(spark, root, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Nil)
    t.setProperties(Map(
      TxTable.MaintainPrefix + "minSmallFiles" -> "64",
      TxTable.MaintainPrefix + "retainSnapshots" -> "100",
      TxTable.MaintainPrefix + "maxSnapshotAgeMs" -> maxAge.toString,
      TxTable.MaintainPrefix + "ageSlackMs" -> maxAge.toString))
    (1L to 3L).foreach(i => t.append(Seq(i).toDF("id")))
    val key = new Path(root, "_log").toString
    TxTable.ageClearedThrough.remove(key)
    // no cleared-through memo yet → due (the admitted sweep seeds it)
    assert(!t.maintenanceQuiet(t.snapshot),
      "age policy with no cleared horizon must evaluate")
    t.maintainTableConfigured(orphanGraceMs = Some(0L), trigger = "auto")
    // the sweep just cleared through (now - maxAge): provably quiet
    assert(t.maintenanceQuiet(t.snapshot),
      s"gate not quiet right after an age sweep: ${t.snapshot.counters}")
    // wall clock passes the cleared horizon + maxAge + slack → due
    // (simulated by rolling the memo back past the window)
    TxTable.ageClearedThrough.put(key,
      Long.box(System.currentTimeMillis() - 2 * maxAge - 1000))
    assert(!t.maintenanceQuiet(t.snapshot),
      "gate quiet past the age horizon")
    // the admitted sweep re-quiets it even when NOTHING was expirable
    // (memo advances on the versionAtOrBefore-miss path too — without
    // that a young table under an age policy would hot-loop sweeps)
    t.maintainTableConfigured(orphanGraceMs = Some(0L), trigger = "auto")
    assert(t.maintenanceQuiet(t.snapshot),
      "a sweep that expired nothing did not advance the age horizon")
    // drop/recreate at the same log dir: the memo claims only
    // "nothing ≤ T is expirable", which holds vacuously for a younger
    // table — after a rollback past the window the recreated table is
    // due (never wedged quiet), and its no-op sweep re-quiets it
    val fs = root.getFileSystem(conf)
    fs.delete(root, true)
    val t2 = TxTable.create(spark, root, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Nil)
    t2.setProperties(Map(
      TxTable.MaintainPrefix + "minSmallFiles" -> "64",
      TxTable.MaintainPrefix + "retainSnapshots" -> "100",
      TxTable.MaintainPrefix + "maxSnapshotAgeMs" -> maxAge.toString,
      TxTable.MaintainPrefix + "ageSlackMs" -> maxAge.toString))
    (1L to 3L).foreach(i => t2.append(Seq(i).toDF("id")))
    TxTable.ageClearedThrough.put(key,
      Long.box(System.currentTimeMillis() - 2 * maxAge - 1000))
    assert(!t2.maintenanceQuiet(t2.snapshot),
      "recreated table wedged quiet past the horizon")
    t2.maintainTableConfigured(orphanGraceMs = Some(0L), trigger = "auto")
    assert(t2.maintenanceQuiet(t2.snapshot),
      "recreated table's no-op age sweep did not re-quiet the gate")
  }

  test("age slack is ceilinged at 1 h on long-retention policies") {
    import spark.implicits._
    // a 7-day policy's proportional slack (maxAge/8 ≈ 21 h) would let
    // headers linger most of a day past the horizon; the default is
    // now min(max(60 s, maxAge/8), 1 h) so sweeps fire within an
    // operator-predictable window (r18 VERDICT observation 3)
    val maxAge = 7L * 24 * 3600 * 1000
    val root = new Path(freshDir("ageslack"))
    val t = TxTable.create(spark, root, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Nil)
    t.setProperties(Map(
      TxTable.MaintainPrefix + "minSmallFiles" -> "64",
      TxTable.MaintainPrefix + "retainSnapshots" -> "100",
      TxTable.MaintainPrefix + "maxSnapshotAgeMs" -> maxAge.toString))
    (1L to 3L).foreach(i => t.append(Seq(i).toDF("id")))
    val key = new Path(root, "_log").toString
    t.maintainTableConfigured(orphanGraceMs = Some(0L), trigger = "auto")
    // inside the window: cleared horizon + maxAge + 59 min → quiet
    TxTable.ageClearedThrough.put(key,
      Long.box(System.currentTimeMillis() - maxAge - 59L * 60 * 1000))
    assert(t.maintenanceQuiet(t.snapshot),
      "gate fired inside the ceilinged slack window")
    // past the ceiling: + 61 min → due (maxAge/8 would have slept ~21 h)
    TxTable.ageClearedThrough.put(key,
      Long.box(System.currentTimeMillis() - maxAge - 61L * 60 * 1000))
    assert(!t.maintenanceQuiet(t.snapshot),
      "7-day policy still quiet past horizon + 1 h — slack unceilinged")
  }

  test("a future expiry cutoff cannot wedge the age gate quiet") {
    import spark.implicits._
    // ADVICE r18 low: expire_snapshots(older_than => future) used to
    // advance the cleared-through memo to the future timestamp, whose
    // "nothing <= T remains expirable" claim fails for commits made
    // AFTER the call — the gate then slept until future + maxAge +
    // slack. The memo advance is clamped to the wall clock.
    val root = new Path(freshDir("agefuture"))
    val t = TxTable.create(spark, root, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Nil)
    (1L to 3L).foreach(i => t.append(Seq(i).toDF("id")))
    val key = new Path(root, "_log").toString
    TxTable.ageClearedThrough.remove(key)
    val farFuture = System.currentTimeMillis() + 365L * 24 * 3600 * 1000
    t.expireSnapshotsOlderThan(farFuture)
    val memo = TxTable.ageClearedThrough.get(key)
    assert(memo != null && memo <= System.currentTimeMillis(),
      s"memo advanced into the future: $memo")
  }

  private def conf = spark.sessionState.newHadoopConf()
}
