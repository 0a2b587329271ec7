package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Persistent SQL views for the graft catalog — the Athena
 * `CREATE VIEW analytics.v AS …` surface (views are first-class in the
 * reference's query engine; kinesis-firehose-stream/README.md:139-166
 * frames the table as a general analytics target). A view is a stored
 * SQL text + the schema and catalog/namespace context captured at
 * definition time; Spark's analyzer re-parses the text at every read,
 * so a view always reflects the CURRENT table state (metadata-only —
 * nothing materialized).
 *
 * Storage: `<warehouse>/<ns>/_views/<name>.json`. The `_views`
 * directory can never be mistaken for a table (no `_log`), and
 * table listings skip underscore-prefixed directories.
 */
private[graft] object GraftViews {

  private case class Stored(
      name: String,
      sql: String,
      currentCatalog: String,
      currentNamespace: Seq[String],
      schemaJson: String,
      queryColumnNames: Seq[String],
      columnAliases: Seq[String],
      columnComments: Seq[String],
      properties: Map[String, String])

  private implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats

  private def viewsDir(wh: Path, ns: String) = new Path(new Path(wh, ns), "_views")

  private def viewPath(wh: Path, ident: Identifier): Path = {
    require(ident.namespace().length == 1,
      s"graft view namespaces are single-level, got ${ident.namespace().mkString(".")}")
    new Path(viewsDir(wh, ident.namespace()(0)), s"${ident.name()}.json")
  }

  /** Existence probes, TTL-cached: every governed SELECT asks "is this
    * relation a stored view?" per referenced table — an uncached probe
    * is one storage round-trip per statement even when NO views exist
    * (the common case). Same freshness contract as AclFileCache: a
    * view created/dropped by ANOTHER process becomes visible within
    * one TTL; same-process create/drop invalidate exactly. */
  private val ExistsTtlMs = 2000L
  private val existsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Long)]()

  def exists(spark: SparkSession, wh: Path, ident: Identifier): Boolean = {
    if (ident.namespace().length != 1) return false
    val p = viewPath(wh, ident)
    val key = p.toString
    val now = System.currentTimeMillis()
    val cached = existsCache.get(key)
    if (cached != null && now - cached._2 < ExistsTtlMs) return cached._1
    val e = p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    existsCache.put(key, (e, now))
    e
  }

  def list(spark: SparkSession, wh: Path, ns: String): Seq[Identifier] = {
    val d = viewsDir(wh, ns)
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).sorted
      .map(n => Identifier.of(Array(ns), n.stripSuffix(".json")))
  }

  /** Direct create for the GraftSql text surface (CREATE VIEW ns.v AS
    * …): stores the query text + the schema it analyzed to. `owner`
    * (the creating principal) rides the properties so replace/drop can
    * take the creator-or-namespace-owner bar. */
  def createStored(spark: SparkSession, wh: Path, ident: Identifier,
      sql: String, schema: StructType, replace: Boolean,
      owner: String = ""): Unit = {
    val p = viewPath(wh, ident)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!replace && fs.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    val props = if (owner.isEmpty) Map.empty[String, String]
      else Map(OwnerProperty -> owner)
    write(fs, p, Stored(ident.name(), sql, "", Nil, schema.json,
      schema.fieldNames.toSeq, Nil, Nil, props))
    existsCache.remove(p.toString)
  }

  val OwnerProperty = "graft.view.owner"

  /** The recorded creating principal of a stored view, if any (views
    * created before r14, or through the V2 catalog, have none). */
  def storedOwner(spark: SparkSession, wh: Path,
      ident: Identifier): Option[String] = {
    val p = viewPath(wh, ident)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else read(fs, p).properties.get(OwnerProperty)
  }

  def create(spark: SparkSession, wh: Path, info: ViewInfo,
      replace: Boolean): View = {
    val p = viewPath(wh, info.ident)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!replace && fs.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(info.ident)
    import scala.jdk.CollectionConverters._
    val stored = Stored(info.ident.name(), info.sql, info.currentCatalog,
      info.currentNamespace.toSeq, info.schema.json,
      info.queryColumnNames.toSeq, info.columnAliases.toSeq,
      info.columnComments.toSeq, info.properties.asScala.toMap)
    write(fs, p, stored)
    existsCache.remove(p.toString)
    asView(stored)
  }

  def load(spark: SparkSession, wh: Path, ident: Identifier): View = {
    val p = viewPath(wh, ident)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    asView(read(fs, p))
  }

  def drop(spark: SparkSession, wh: Path, ident: Identifier): Boolean = {
    if (ident.namespace().length != 1) return false
    val p = viewPath(wh, ident)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    existsCache.remove(p.toString)
    fs.exists(p) && fs.delete(p, false)
  }

  def rename(spark: SparkSession, wh: Path, from: Identifier,
      to: Identifier): Unit = {
    val src = viewPath(wh, from)
    val dst = viewPath(wh, to)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(src))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(from)
    if (fs.exists(dst))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(to)
    fs.mkdirs(dst.getParent)
    val moved = read(fs, src).copy(name = to.name())
    write(fs, dst, moved)
    fs.delete(src, false)
    existsCache.remove(src.toString)
    existsCache.remove(dst.toString)
  }

  def setProperties(spark: SparkSession, wh: Path, ident: Identifier,
      set: Map[String, String], unset: Seq[String]): View = {
    val p = viewPath(wh, ident)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    val updated = {
      val s = read(fs, p)
      s.copy(properties = s.properties ++ set -- unset)
    }
    write(fs, p, updated)
    asView(updated)
  }

  private def write(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      s: Stored): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(org.json4s.jackson.Serialization.write(s)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def read(fs: org.apache.hadoop.fs.FileSystem, p: Path): Stored = {
    val in = fs.open(p)
    val json = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      bos.toString("UTF-8")
    } finally in.close()
    org.json4s.jackson.JsonMethods.parse(json).extract[Stored]
  }

  private def asView(s: Stored): View = new View {
    override def name(): String = s.name
    override def query(): String = s.sql
    override def currentCatalog(): String = s.currentCatalog
    override def currentNamespace(): Array[String] = s.currentNamespace.toArray
    override def schema(): StructType =
      DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
    override def queryColumnNames(): Array[String] = s.queryColumnNames.toArray
    override def columnAliases(): Array[String] = s.columnAliases.toArray
    override def columnComments(): Array[String] = s.columnComments.toArray
    override def properties(): java.util.Map[String, String] = {
      import scala.jdk.CollectionConverters._
      s.properties.asJava
    }
  }
}
