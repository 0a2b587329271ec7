package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/**
 * Tag-based access control (LF-TBAC) — the remaining LakeFormation
 * grant modality beyond the named-resource grants the reference issues
 * (kinesis-firehose-stream/stack/lakeformation.py:186-243): privileges
 * granted on tag EXPRESSIONS, tags assigned per table/namespace with
 * table-over-namespace inheritance, additive with named grants.
 */
class TagAclSpec extends SparkSpec {

  private def as[T](principal: String)(body: => T): T = {
    spark.conf.set("graft.sql.principal", principal)
    try body finally spark.conf.unset("graft.sql.principal")
  }

  test("tag grants serve matching tables; untagging revokes; admin seeded") {
    val cat = new TableCatalog(spark, new Path(freshDir("tag_basic")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1), (2)")
    as("admin") { GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin") }
    // first tag grant seeds dba as the tag administrator
    as("dba") {
      GraftSql.sql(cat, "GRANT SELECT ON TAG ('env' = 'prod') TO alice")
    }
    as("mallory") {
      // only tag administrators manage tag grants after the seed
      intercept[SecurityException](GraftSql.sql(cat,
        "GRANT SELECT ON TAG ('env' = 'prod') TO mallory"))
    }
    // the table is not tagged yet: alice's tag grant matches nothing
    as("alice") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM sec.t").collect())
    }
    // the owner tags the table → the tag grant activates (additive
    // with admin's named grant)
    as("admin") { GraftSql.sql(cat, "ALTER TABLE sec.t SET TAG ('env' = 'prod')") }
    as("alice") {
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM sec.t")
        .collect()(0).getLong(0) === 2L)
      // tag grantees pass the metadata (DESCRIBE) bar too
      assert(GraftSql.sql(cat, "SHOW TAGS ON sec.t").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap ===
        Map("env" -> "prod"))
      // SELECT through a tag is not INSERT
      intercept[SecurityException](
        GraftSql.sql(cat, "INSERT INTO sec.t VALUES (3)"))
    }
    as("bob") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM sec.t").collect())
    }
    // untag → the tag grant stops matching
    as("admin") { GraftSql.sql(cat, "ALTER TABLE sec.t UNSET TAG ('env')") }
    as("alice") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM sec.t").collect())
    }
    // revocation through the store works symmetrically
    as("admin") { GraftSql.sql(cat, "ALTER TABLE sec.t SET TAG ('env' = 'prod')") }
    as("dba") {
      GraftSql.sql(cat, "REVOKE SELECT ON TAG ('env' = 'prod') FROM alice")
    }
    as("alice") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM sec.t").collect())
    }
  }

  test("namespace tags inherit; table tags override; conjunctions need every pair") {
    val cat = new TableCatalog(spark, new Path(freshDir("tag_ns")))
    GraftSql.sql(cat, "CREATE TABLE nsx.t1 (id INT)")
    GraftSql.sql(cat, "INSERT INTO nsx.t1 VALUES (1)")
    GraftSql.sql(cat, "CREATE TABLE nsx.t2 (id INT)")
    GraftSql.sql(cat, "INSERT INTO nsx.t2 VALUES (1), (2)")
    as("dba") {
      GraftSql.sql(cat, "GRANT ALL ON NAMESPACE nsx TO dba")
      GraftSql.sql(cat,
        "GRANT SELECT ON TAG ('env' = 'prod', 'team' = 'ml') TO carol")
      // namespace-level tags flow to every contained table
      GraftSql.sql(cat, "ALTER NAMESPACE nsx SET TAG ('env' = 'prod')")
      GraftSql.sql(cat, "ALTER NAMESPACE nsx SET TAG ('team' = 'ml')")
    }
    as("carol") {
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM nsx.t1")
        .collect()(0).getLong(0) === 1L)
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM nsx.t2")
        .collect()(0).getLong(0) === 2L)
    }
    // a table-level override breaks the conjunction on that table only
    as("dba") { GraftSql.sql(cat, "ALTER TABLE nsx.t2 SET TAG ('env' = 'dev')") }
    as("carol") {
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM nsx.t1")
        .collect()(0).getLong(0) === 1L)
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM nsx.t2").collect())
    }
    // SHOW TAGS renders the effective (inherited + overridden) set
    as("dba") {
      assert(GraftSql.sql(cat, "SHOW TAGS ON nsx.t2").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap ===
        Map("env" -> "dev", "team" -> "ml"))
      val grants = GraftSql.sql(cat, "SHOW TAG GRANTS").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(grants.contains(("carol", "SELECT", "env=prod&team=ml")))
    }
    // SHOW GRANTS on the table includes tag-derived access with its
    // source expression (and the grantee may inspect it)
    as("carol") {
      val eff = GraftSql.sql(cat, "SHOW GRANTS ON nsx.t1").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(eff.contains(("carol", "SELECT (via tag env=prod&team=ml)")))
    }
  }

  test("tagging an ungoverned table while tag grants exist is admin-only") {
    val cat = new TableCatalog(spark, new Path(freshDir("tag_open")))
    GraftSql.sql(cat, "CREATE TABLE open.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO open.t VALUES (1)")
    as("dba") { GraftSql.sql(cat, "GRANT SELECT ON TAG ('env' = 'prod') TO alice") }
    // any principal tagging the OPEN table would flip it into
    // tag-governed state and lock everyone else out — denied unless
    // the principal administers the tag store (through the dedicated
    // arm AND the raw property door)
    as("mallory") {
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE open.t SET TAG ('env' = 'prod')"))
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE open.t SET TBLPROPERTIES ('graft.acl.tag.env'='prod')"))
    }
    as("dba") {
      GraftSql.sql(cat, "ALTER TABLE open.t SET TAG ('env' = 'prod')")
    }
    as("alice") {
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM open.t")
        .collect()(0).getLong(0) === 1L)
    }
    // ...and the symmetric widening: stripping the tag from a table
    // whose ONLY governance is tag-based would open it to the
    // stripper — denied at the same bar through every property door
    val c = GraftSql.ensureCatalogRegistered(cat)
    as("mallory") {
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE open.t UNSET TAG ('env')"))
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE open.t UNSET TBLPROPERTIES ('graft.acl.tag.env')"))
      intercept[SecurityException](GraftSql.sql(cat,
        s"ALTER TABLE $c.open.t UNSET TBLPROPERTIES ('graft.acl.tag.env')"))
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM open.t").collect())
    }
    // tag tokens that would corrupt keys/expressions are rejected
    as("dba") {
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "GRANT SELECT ON TAG ('a=b' = 'v') TO alice"))
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "GRANT SELECT ON TAG ('k' = 'v&w') TO alice"))
    }
  }

  test("tagging an ungoverned namespace never bricks later grant administration") {
    val cat = new TableCatalog(spark, new Path(freshDir("tag_ns_open")))
    GraftSql.sql(cat, "CREATE TABLE nso.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO nso.t VALUES (1)")
    // with no grants anywhere, tags are inert metadata and tagging an
    // open namespace stays open — but the tag props it writes into the
    // namespace ACL store must NOT count as governance (ADVICE r11:
    // they made every later GRANT throw for everyone, unrecoverably)
    as("eve") { GraftSql.sql(cat, "ALTER NAMESPACE nso SET TAG ('env' = 'prod')") }
    // the natural tag-then-grant flow: the first REAL grant is still
    // open and seeds its issuer as namespace owner
    as("admin") { GraftSql.sql(cat, "GRANT SELECT ON NAMESPACE nso TO alice") }
    // after the seed, owners administer — and the tag assignment
    // survives alongside the grants
    as("eve") {
      intercept[SecurityException](GraftSql.sql(cat,
        "GRANT SELECT ON NAMESPACE nso TO eve"))
      // the namespace is now governed: re-tagging falls to its owner
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER NAMESPACE nso SET TAG ('env' = 'dev')"))
    }
    as("admin") {
      GraftSql.sql(cat, "GRANT INSERT ON NAMESPACE nso TO alice")
      GraftSql.sql(cat, "ALTER NAMESPACE nso UNSET TAG ('env')")
    }
    as("admin") {
      val grants = GraftSql.sql(cat, "SHOW GRANTS ON NAMESPACE nso").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(grants.contains(("alice", "SELECT")) &&
        grants.contains(("alice", "INSERT")) &&
        grants.contains(("admin", "OWNER")))
    }
  }

  test("malformed tag-pair conjuncts are rejected, never silently dropped") {
    val cat = new TableCatalog(spark, new Path(freshDir("tag_strict")))
    GraftSql.sql(cat, "CREATE TABLE st.t (id INT)")
    as("dba") {
      // an unquoted conjunct silently dropped would create a grant on
      // FEWER pairs — strictly broader than written (ADVICE r11)
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "GRANT SELECT ON TAG ('env' = 'prod', 'team' = ml) TO alice"))
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "GRANT SELECT ON TAG ('env' = 'prod',) TO alice"))
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "ALTER TABLE st.t SET TAG ('env' = 'prod', junk)"))
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "ALTER TABLE st.t UNSET TAG ('env', junk)"))
      // no grant leaked through the failed statements
      assert(GraftSql.sql(cat, "SHOW TAG GRANTS").collect().isEmpty)
    }
  }

  test("a tag-grant change invalidates pre-existing temp views (live governance)") {
    val cat = new TableCatalog(spark, new Path(freshDir("tag_tmpview")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1), (2)")
    as("admin") { GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin") }
    as("dba") { GraftSql.sql(cat, "GRANT SELECT ON TAG ('env' = 'prod') TO alice") }
    as("admin") { GraftSql.sql(cat, "ALTER TABLE sec.t SET TAG ('env' = 'prod')") }
    as("alice") {
      GraftSql.sql(cat, "CREATE TEMP VIEW tagv AS SELECT * FROM sec.t")
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM tagv")
        .collect()(0).getLong(0) === 2L)
    }
    // revoking THROUGH THE TAG STORE (the table's own properties never
    // change) must still invalidate alice's stored temp-view plan —
    // the ACL snapshot pins the warehouse tag-grant state too
    as("dba") {
      GraftSql.sql(cat, "REVOKE SELECT ON TAG ('env' = 'prod') FROM alice")
    }
    as("alice") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM tagv").collect())
    }
    try spark.catalog.dropTempView("tagv") catch { case _: Exception => () }
  }
}
