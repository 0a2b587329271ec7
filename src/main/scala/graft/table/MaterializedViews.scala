package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialized views with INCREMENTAL refresh off the stored Change
 * Data Feed — the classic self-maintainable-aggregate IVM contract
 * (SUM / COUNT with GROUP BY is closed under insert/update/delete
 * deltas), surfaced as DDL:
 *
 *   CREATE MATERIALIZED VIEW ns.mv AS
 *     SELECT region, count(*) AS n, sum(amount) AS total
 *     FROM ns.src WHERE status <> 'X' GROUP BY region
 *   REFRESH MATERIALIZED VIEW ns.mv
 *   DROP MATERIALIZED VIEW ns.mv
 *
 * The backing store is a REAL graft table `ns.mv` (time travel, SQL
 * reads, snapshots — everything a table has), plus one JSON sidecar
 * (`<warehouse>/<ns>/_mviews/<mv>.json`) recording the parsed query
 * shape and the source version the contents reflect.
 *
 * REFRESH cost model (the reason this exists at 100 TB):
 *  - incremental: reads ONLY `src.changeFeed(last+1, head)` — O(rows
 *    changed since the last refresh), never the source — folds signed
 *    contributions (insert/update_postimage = +1, delete/
 *    update_preimage = −1) into per-group deltas, then rewrites the MV
 *    (O(|MV|), the aggregate's own size). One source commit out of a
 *    10⁵-commit history costs that commit's changes, not a rescan.
 *  - full (fallback): recompute + overwrite, used when the feed is
 *    unreplayable over the gap (CDF not enabled for some commit) —
 *    always correct, never silently stale.
 *
 * A hidden `__graft_cnt` column (per-group row count) makes groups
 * self-deleting: when its maintained value reaches 0 the group is
 * dropped, which plain SUM/COUNT columns alone cannot detect.
 * Documented divergence: a surviving group whose summed column lost
 * ALL its non-null values reads 0, not NULL (exact NULL-ness would
 * need a per-aggregate non-null count; standard IVM trade).
 */
object MaterializedViews {

  /** One aggregate output: `func` ∈ {sum, count}; `arg` is the SQL
    * expression text (empty for count(*)); `alias` the output column. */
  final case class AggSpec(func: String, arg: String, alias: String)

  final case class Stored(
      name: String,
      sql: String,
      sourceNs: String,
      sourceTable: String,
      groupCols: Seq[String],
      aggs: Seq[AggSpec],
      whereSql: Option[String],
      lastSourceVersion: Long)

  private implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats

  val CountColumn = "__graft_cnt"

  private def mvDir(wh: Path, ns: String) = new Path(new Path(wh, ns), "_mviews")
  private def mvPath(wh: Path, ns: String, name: String) =
    new Path(mvDir(wh, ns), s"$name.json")

  def exists(cat: TableCatalog, ns: String, name: String): Boolean = {
    val p = mvPath(cat.warehouse, ns, name)
    p.getFileSystem(cat.spark.sessionState.newHadoopConf()).exists(p)
  }

  def load(cat: TableCatalog, ns: String, name: String): Stored = {
    val p = mvPath(cat.warehouse, ns, name)
    val fs = p.getFileSystem(cat.spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try org.json4s.jackson.JsonMethods.parse(in).extract[Stored]
    finally in.close()
  }

  private def store(cat: TableCatalog, ns: String, s: Stored): Unit = {
    val p = mvPath(cat.warehouse, ns, s.name)
    val fs = p.getFileSystem(cat.spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(org.json4s.jackson.Serialization.write(s)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def list(cat: TableCatalog, ns: String): Seq[String] = {
    val d = mvDir(cat.warehouse, ns)
    val fs = d.getFileSystem(cat.spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
  }

  // ---- the constrained query shape -------------------------------------

  private val HeadRe =
    """(?is)\s*SELECT\s+(.*?)\s+FROM\s+([`\w.]+)(?:\s+WHERE\s+(.+?))?\s+GROUP\s+BY\s+(.+?)\s*;?\s*""".r
  private val SumRe = """(?is)\s*SUM\s*\((.+)\)\s+AS\s+([`\w]+)\s*""".r
  private val CountRe = """(?is)\s*COUNT\s*\(\s*\*\s*\)\s+AS\s+([`\w]+)\s*""".r

  /** Parse the maintainable shape; IllegalArgumentException with the
    * accepted grammar otherwise. */
  def parse(name: String, sqlText: String,
      splitItems: String => Seq[String]): (String, Seq[String], Seq[AggSpec], Option[String]) =
    sqlText match {
      case HeadRe(items, src, where, groupBy) =>
        val groupCols = groupBy.split(",").map(_.trim.stripPrefix("`")
          .stripSuffix("`")).toSeq.filter(_.nonEmpty)
        var aggs = Vector.empty[AggSpec]
        val plain = Vector.newBuilder[String]
        splitItems(items).foreach {
          case SumRe(arg, alias)   => aggs :+= AggSpec("sum", arg.trim, alias)
          case CountRe(alias)      => aggs :+= AggSpec("count", "", alias)
          case col                 =>
            plain += col.trim.stripPrefix("`").stripSuffix("`")
        }
        val plainCols = plain.result()
        require(aggs.nonEmpty,
          s"materialized view $name needs at least one SUM(expr) AS a / COUNT(*) AS a")
        require(plainCols.toSet == groupCols.toSet,
          s"materialized view $name: select-list columns ${plainCols.mkString(",")} " +
            s"must equal GROUP BY ${groupCols.mkString(",")}")
        require(!aggs.exists(_.alias == CountColumn) &&
          !groupCols.contains(CountColumn), s"$CountColumn is reserved")
        (src, groupCols, aggs, Option(where).map(_.trim))
      case _ => throw new IllegalArgumentException(
        s"materialized view $name: supported shape is SELECT <group cols>, " +
          "SUM(expr) AS a | COUNT(*) AS c ... FROM ns.tbl [WHERE pred] " +
          "GROUP BY <group cols>")
    }

  /** The full recompute of the definition over `src` (build + full
    * refresh), including the hidden group count. */
  private def recompute(src: DataFrame, groupCols: Seq[String],
      aggs: Seq[AggSpec], whereSql: Option[String]): DataFrame = {
    val base = whereSql.map(w => src.filter(expr(w))).getOrElse(src)
    val aggCols = aggs.map {
      case AggSpec("sum", a, alias) => sum(expr(a)).as(alias)
      case AggSpec(_, _, alias)     => count(lit(1)).as(alias)
    } :+ count(lit(1)).as(CountColumn)
    base.groupBy(groupCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
  }

  // ---- DDL verbs --------------------------------------------------------

  /** CREATE: parse, build the backing table from a full recompute, and
    * record the source version the contents reflect (read BEFORE the
    * build — a concurrent source commit then just makes the first
    * REFRESH fold its changes, never lose them). */
  def create(cat: TableCatalog, ns: String, name: String, sqlText: String,
      splitItems: String => Seq[String]): Long = {
    require(!exists(cat, ns, name), s"materialized view $ns.$name already exists")
    val (srcName, groupCols, aggs, whereSql) = parse(name, sqlText, splitItems)
    val (sns, stbl) = srcName.split("\\.").toSeq match {
      case Seq(a, b) => (a, b)
      case Seq(b)    => (ns, b)
      case _ => throw new IllegalArgumentException(
        s"materialized view source must be ns.tbl, got '$srcName'")
    }
    val src = cat.getTable(sns, stbl)
    val atVersion = src.currentVersion
    val content = recompute(src.toDF, groupCols, aggs, whereSql)
    val t = cat.createTable(ns, name, content.schema, Nil)
    t.append(content)
    store(cat, ns, Stored(name, sqlText.trim, sns, stbl, groupCols, aggs,
      whereSql, atVersion))
    atVersion
  }

  /** The fence identity for a materialized view's folds: commits to the
    * backing table record the highest SOURCE version reflected under
    * this appId (the Delta txn protocol), which is AUTHORITATIVE over
    * the sidecar's advisory `lastSourceVersion` — a crash between a
    * fold commit and the sidecar write can never double-fold. */
  private def fenceId(ns: String, name: String) = s"graft-mv:$ns.$name"

  /** Highest source version the backing table's contents reflect. */
  private def reflectedVersion(backing: TxTable, m: Stored,
      ns: String): Long =
    backing.snapshot.appTxns.getOrElse(fenceId(ns, m.name),
      m.lastSourceVersion)

  /** REFRESH: incremental off the stored change feed when replayable,
    * full recompute otherwise. Returns (mode, folded source commits). */
  def refresh(cat: TableCatalog, ns: String, name: String): (String, Long) = {
    val m = load(cat, ns, name)
    val src = cat.getTable(m.sourceNs, m.sourceTable)
    val head = src.currentVersion
    val backing = cat.getTable(ns, name)
    val reflected = reflectedVersion(backing, m, ns)
    if (head <= reflected) return ("fresh", 0L)
    val txn = Some((fenceId(ns, name), head))
    val mode =
      try {
        val feed = src.changeFeed(reflected + 1, head)
        backing.overwrite(fold(backing.toDF, feed, m), txn)
        "incremental"
      } catch {
        case _: UnreplayableChangeFeedException => // gap contract ONLY —
          // any other failure (fold/overwrite bugs included) propagates
          // instead of masquerading as a quiet full recompute
          backing.overwrite(recompute(src.asOf(head), m.groupCols, m.aggs,
            m.whereSql), txn)
          "full"
      }
    store(cat, ns, m.copy(lastSourceVersion = head))
    (mode, head - reflected)
  }

  /**
   * CONTINUOUS refresh: a Structured Streaming query over the source's
   * `.changes` stream (the stored CDF as a V2 table) folding each
   * micro-batch's deltas into the backing table. Exactly-once: every
   * fold commits under the MV's txn fence keyed by the batch's highest
   * `_commit_version`, so a replayed micro-batch (restart, retry) is a
   * no-op on the table. Source-side cost per batch is O(that batch's
   * changes); the aggregate rewrite is O(|MV|). Stop the query with
   * `.stop()`; a later batch/manual REFRESH picks up from the fence.
   */
  def startContinuous(cat: TableCatalog, ns: String, name: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val m = load(cat, ns, name)
    val backing = cat.getTable(ns, name)
    val reflected = reflectedVersion(backing, m, ns)
    val catalogName = GraftSql.ensureCatalogRegistered(cat)
    cat.spark.readStream
      .option("startingVersion", reflected + 1)
      .table(s"$catalogName.${m.sourceNs}.${m.sourceTable}.changes")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val cur = load(cat, ns, name)
          val b = cat.getTable(ns, name)
          val maxV = batch.agg(max(col("_commit_version"))).collect()(0).getLong(0)
          b.overwrite(fold(b.toDF, batch, cur),
            Some((fenceId(ns, name), maxV)))
          store(cat, ns, cur.copy(lastSourceVersion = maxV))
        }
      }
      .start()
  }

  /** Fold the change feed into the current MV contents: signed
    * contributions grouped to deltas (O(changes) source-side), one
    * full-outer merge on the group key (O(|MV| + |delta groups|)),
    * groups whose maintained row count reaches 0 drop out. */
  private def fold(current: DataFrame, feed: DataFrame, m: Stored): DataFrame = {
    val filtered = m.whereSql.map(w => feed.filter(expr(w))).getOrElse(feed)
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val deltaCols = m.aggs.map {
      case AggSpec("sum", a, alias) =>
        sum(sign * expr(a)).as(s"__d_$alias")
      case AggSpec(_, _, alias) => sum(sign).as(s"__d_$alias")
    } :+ sum(sign).as(s"__d_$CountColumn")
    val delta = filtered.groupBy(m.groupCols.map(col): _*)
      .agg(deltaCols.head, deltaCols.tail: _*)
    val joined = current.join(delta, m.groupCols, "full_outer")
    val outCols = m.groupCols.map(col) ++
      (m.aggs.map(_.alias) :+ CountColumn).map { alias =>
        (coalesce(col(alias), lit(0)) +
          coalesce(col(s"__d_$alias"), lit(0))).as(alias)
      }
    joined.select(outCols: _*)
      .filter(col(CountColumn) > 0)
  }

  /** DROP: backing table + sidecar; idempotent via `ifExists`. */
  def drop(cat: TableCatalog, ns: String, name: String,
      ifExists: Boolean): Boolean = {
    if (!exists(cat, ns, name)) {
      require(ifExists, s"no materialized view $ns.$name")
      return false
    }
    val p = mvPath(cat.warehouse, ns, name)
    p.getFileSystem(cat.spark.sessionState.newHadoopConf()).delete(p, false)
    cat.dropTable(ns, name)
    true
  }
}
