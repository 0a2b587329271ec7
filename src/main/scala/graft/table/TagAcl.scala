package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.{JsonMethods, Serialization}

/**
 * Warehouse-level TAG grant store — the LakeFormation tag-based
 * access-control modality (LF-TBAC; the reference's LakeFormation
 * surface, `kinesis-firehose-stream/stack/lakeformation.py:186-243`,
 * uses named-resource grants, but tag grants are the remaining
 * LakeFormation grant model): privileges are granted on TAG
 * EXPRESSIONS (`'env' = 'prod' AND 'team' = 'ml'`) instead of named
 * tables, and any table whose effective tags satisfy the expression
 * serves the grant. Tags themselves are assigned per table
 * (`graft.acl.tag.<key>` table properties — under the `graft.acl.`
 * prefix so the property door, redaction, and owner-administration
 * rules apply unchanged) or per namespace (same key in the namespace
 * ACL store, inherited by contained tables, table value wins per key).
 *
 * Storage: one JSON object at `<warehouse>/_tag_acl.json`, same
 * single-file model as [[NamespaceAcl]] (grants change rarely; the
 * file is tiny and rewritten whole):
 *  - `graft.acl.owner` → comma-joined tag-administrator principals
 *    (the first tag grant seeds its issuer, like table/namespace
 *    ownership);
 *  - `grant.<PRIV>.<expr>` → comma-joined principals, where `<expr>`
 *    is the canonical sorted `k=v&k2=v2` form of the tag expression.
 */
object TagAcl {

  private implicit val fmts: Formats = DefaultFormats

  /** Tag-assignment property prefix on tables and namespaces. */
  val TagPropPrefix = "graft.acl.tag."

  private def aclPath(warehouse: Path): Path =
    new Path(warehouse, "_tag_acl.json")

  def load(spark: SparkSession, warehouse: Path): Map[String, String] = {
    val p = aclPath(warehouse)
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

  def store(spark: SparkSession, warehouse: Path,
      props: Map[String, String]): Unit = {
    val p = aclPath(warehouse)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val out = fs.create(p, /*overwrite=*/ true)
    try out.write(Serialization.write(props)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    AclFileCache.invalidate(p)
  }

  /** Canonical expression key: pairs sorted by tag key, `k=v` joined
    * with `&` — grant and revoke on the same expression hit the same
    * entry regardless of the order the caller wrote the pairs. */
  def exprKey(pairs: Seq[(String, String)]): String =
    pairs.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")

  /** Grant-entry key for one privilege on one expression. */
  def grantKey(priv: String, pairs: Seq[(String, String)]): String =
    s"grant.${priv.toUpperCase}.${exprKey(pairs)}"

  /** Parse a stored grant key back to (priv, pairs); None for
    * non-grant entries (the owner key). */
  def parseGrantKey(key: String): Option[(String, Seq[(String, String)])] =
    if (!key.startsWith("grant.")) None
    else {
      val rest = key.drop("grant.".length)
      val dot = rest.indexOf('.')
      if (dot < 0) None
      else {
        val priv = rest.take(dot)
        val pairs = rest.drop(dot + 1).split("&").toSeq.flatMap { kv =>
          val eq = kv.indexOf('=')
          if (eq < 0) None else Some((kv.take(eq), kv.drop(eq + 1)))
        }
        if (pairs.isEmpty) None else Some((priv, pairs))
      }
    }

  /** Tag keys/values embed in property keys and canonical expression
    * strings — reject the characters that would corrupt either. */
  def checkTagToken(s: String, what: String): String = {
    require(s.nonEmpty && !s.exists(c =>
        c == ',' || c == '&' || c == '=' || c.isWhitespace),
      s"$what '$s' must be non-empty with no commas, whitespace, '&' or '='")
    s
  }
}
