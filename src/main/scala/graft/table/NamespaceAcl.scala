package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/**
 * Namespace-scope allow lists — the database-level LakeFormation grants
 * the reference issues (`lakeformation.py:201-215` grants DESCRIBE on the
 * database to the Athena role) re-expressed for this engine: grants
 * declared once on a namespace flow to every contained table, and a
 * table-level allow list for the same privilege OVERRIDES the namespace
 * one (most-specific wins, the LakeFormation resolution order).
 *
 * Storage is one small JSON map at `<warehouse>/<ns>/_acl.json` (an
 * underscore-prefixed FILE — `TableCatalog.listTables` only lists
 * directories, so it can never shadow a table). Namespace grants are
 * rare administrative writes; the file is overwritten whole,
 * last-writer-wins, and read per statement — one tiny metadata read,
 * the same cost class as the log-head probe every statement already
 * pays. No atomic-rename reliance (object-store safe): the overwrite
 * is a single create call.
 */
object NamespaceAcl {

  private implicit val fmts: Formats = DefaultFormats

  private def aclPath(warehouse: Path, ns: String): Path =
    new Path(new Path(warehouse, ns), "_acl.json")

  /** Drop any cached state for this namespace's ACL store — for
    * callers that remove the file out-of-band (namespace drop). */
  def invalidate(warehouse: Path, ns: String): Unit =
    AclFileCache.invalidate(aclPath(warehouse, ns))

  /** The namespace's ACL properties (`graft.acl.<priv>` → comma-joined
    * principals); empty when no namespace ACL is declared. */
  def load(spark: SparkSession, warehouse: Path, ns: String): Map[String, String] = {
    val p = aclPath(warehouse, ns)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    AclFileCache.load(fs, p, () =>
      try {
        val in = fs.open(p)
        val bytes = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          out.toByteArray
        } finally in.close()
        JsonMethods.parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          .extract[Map[String, String]]
      } catch {
        case _: java.io.FileNotFoundException => Map.empty
      })
  }

  def store(spark: SparkSession, warehouse: Path, ns: String,
      props: Map[String, String]): Unit = {
    val p = aclPath(warehouse, ns)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    if (props.isEmpty) { fs.delete(p, false); AclFileCache.invalidate(p); return }
    val out = fs.create(p, true)
    try out.write(Serialization.write(props)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    AclFileCache.invalidate(p)
  }
}
