package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/**
 * Round-10 access-control hardening (the ADVICE r9 findings): catalog-
 * alias laundering, metadata sub-table reads, ownerless administration,
 * principal syntax, native ACL-value disclosure — plus namespace-scope
 * grants (the database-level LakeFormation grant,
 * kinesis-firehose-stream/stack/lakeformation.py:201-215).
 */
class AclSpec extends SparkSpec {

  private def as[T](principal: String)(body: => T): T = {
    spark.conf.set("graft.sql.principal", principal)
    try body finally spark.conf.unset("graft.sql.principal")
  }

  test("catalog aliasing cannot launder ACLs: SET is blocked and aliases stay governed") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_alias")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1)")
    as("admin") { GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin") }
    // the SQL door to catalog conf is closed outright
    intercept[SecurityException](GraftSql.sql(cat,
      "SET spark.sql.catalog.alias=graft.catalog.GraftCatalog"))
    intercept[SecurityException](GraftSql.sql(cat,
      s"SET spark.sql.catalog.alias.warehouse=${cat.warehouse}"))
    intercept[SecurityException](GraftSql.sql(cat, "RESET"))
    intercept[SecurityException](GraftSql.sql(cat,
      "RESET graft.sql.principal"))
    // defense in depth: an alias registered HOST-side (outside the SQL
    // surface) is still governed — same plugin class + same warehouse
    // means the same grants apply
    spark.conf.set("spark.sql.catalog.aliaswh",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.aliaswh.warehouse",
      cat.warehouse.toString)
    try {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM aliaswh.sec.t"))
      as("admin") {
        assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM aliaswh.sec.t")
          .collect()(0).getLong(0) === 1L)
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.aliaswh")
      spark.conf.unset("spark.sql.catalog.aliaswh.warehouse")
    }
  }

  test("metadata sub-tables and branch reads are gated like the base table") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_meta")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1), (2)")
    cat.getTable("sec", "t").createBranch("b")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin")
      GraftSql.sql(cat, "GRANT SELECT ON sec.t TO alice")
    }
    val c = GraftSql.ensureCatalogRegistered(cat)
    // .files/.partitions/.history expose file paths, partition values,
    // and row counts — non-grantees are denied (ADVICE r9 medium)
    for (sub <- Seq("files", "partitions", "history", "branches"))
      intercept[SecurityException](
        GraftSql.sql(cat, s"SELECT * FROM $c.sec.t.$sub"))
    // a branch read is a read of the table's (forked) row data
    intercept[SecurityException](
      GraftSql.sql(cat, s"SELECT * FROM $c.sec.t.branch_b"))
    // grantees pass: metadata at the DESCRIBE bar, branches need SELECT
    as("alice") {
      assert(GraftSql.sql(cat, s"SELECT * FROM $c.sec.t.files").count() >= 1)
      assert(GraftSql.sql(cat,
        s"SELECT count(*) AS n FROM $c.sec.t.branch_b")
        .collect()(0).getLong(0) === 2L)
    }
    // ...but a branch WRITE still needs INSERT
    as("alice") {
      intercept[SecurityException](GraftSql.sql(cat,
        s"INSERT INTO $c.sec.t.branch_b VALUES (9)"))
    }
    as("admin") {
      GraftSql.sql(cat, s"INSERT INTO $c.sec.t.branch_b VALUES (9)")
    }
  }

  test("V2 property door seeds ownership; native ACL values stay owner-only") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_v2seed")))
    GraftSql.sql(cat, "CREATE TABLE sec.w (id INT)")
    val c = GraftSql.ensureCatalogRegistered(cat)
    // erin's FIRST ACL write through the V2 (3-part) property door
    // records her as owner — the ownerless state is unmintable
    as("erin") {
      GraftSql.sql(cat,
        s"ALTER TABLE $c.sec.w SET TBLPROPERTIES ('graft.acl.select'='erin')")
    }
    assert(cat.getTable("sec", "w").properties
      .get("graft.acl.owner").contains("erin"))
    as("bob") {
      intercept[SecurityException](
        GraftSql.sql(cat, "GRANT SELECT ON sec.w TO bob"))
    }
    // native SHOW TBLPROPERTIES / SHOW CREATE / DESCRIBE EXTENDED would
    // return RAW allow lists: grantee-but-not-owner is denied there
    // (the redacting 2-part arms remain available to grantees)
    as("erin") { GraftSql.sql(cat, "GRANT SELECT ON sec.w TO alice") }
    as("alice") {
      intercept[SecurityException](
        GraftSql.sql(cat, s"SHOW TBLPROPERTIES $c.sec.w"))
      intercept[SecurityException](
        GraftSql.sql(cat, s"SHOW CREATE TABLE $c.sec.w"))
      intercept[SecurityException](
        GraftSql.sql(cat, s"DESCRIBE EXTENDED $c.sec.w"))
      // the plain column listing stays at the grantee bar
      assert(GraftSql.sql(cat, s"DESCRIBE $c.sec.w").count() >= 1)
      // and the 2-part arm serves alice a REDACTED property list
      val props = GraftSql.sql(cat, "SHOW TBLPROPERTIES sec.w").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(props("graft.acl.select") === "<redacted>")
    }
    as("erin") {
      assert(GraftSql.sql(cat, s"SHOW TBLPROPERTIES $c.sec.w").count() >= 1)
    }
    // ownerless legacy ACL: raw values are redacted for EVERYONE who
    // cannot administer (previously `owners.isEmpty` showed them to all)
    GraftSql.sql(cat, "CREATE TABLE sec.leg (id INT)")
    cat.getTable("sec", "leg")
      .setProperties(Map("graft.acl.select" -> "zoe"))
    as("zoe") {
      val props = GraftSql.sql(cat, "SHOW TBLPROPERTIES sec.leg").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(props("graft.acl.select") === "<redacted>")
    }
  }

  test("principals with commas or whitespace are rejected at grant time") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_comma")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT)")
    as("admin") {
      intercept[IllegalArgumentException](
        GraftSql.sql(cat, "GRANT SELECT ON sec.t TO 'a,b'"))
      intercept[IllegalArgumentException](
        GraftSql.sql(cat, "GRANT SELECT ON sec.t TO 'a b'"))
      intercept[IllegalArgumentException](
        GraftSql.sql(cat, "REVOKE SELECT ON sec.t FROM 'a,b'"))
      GraftSql.sql(cat, "GRANT SELECT ON sec.t TO 'a.b@example.com'")
    }
  }

  test("namespace grants flow to contained tables; table grants override") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_ns")))
    GraftSql.sql(cat, "CREATE TABLE nsx.t1 (id INT)")
    GraftSql.sql(cat, "INSERT INTO nsx.t1 VALUES (1)")
    GraftSql.sql(cat, "CREATE TABLE nsx.t2 (id INT)")
    GraftSql.sql(cat, "INSERT INTO nsx.t2 VALUES (1), (2)")
    // first namespace grant seeds its issuer as namespace owner
    as("dba") {
      GraftSql.sql(cat, "GRANT SELECT ON NAMESPACE nsx TO alice")
      GraftSql.sql(cat, "GRANT ALL ON NAMESPACE nsx TO dba")
    }
    // the namespace list now governs every contained table
    as("alice") {
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM nsx.t1")
        .collect()(0).getLong(0) === 1L)
      intercept[SecurityException](
        GraftSql.sql(cat, "INSERT INTO nsx.t1 VALUES (9)"))
    }
    as("bob") {
      intercept[SecurityException](GraftSql.sql(cat, "SELECT * FROM nsx.t1"))
    }
    // non-owners cannot administer the namespace ACL
    as("alice") {
      intercept[SecurityException](
        GraftSql.sql(cat, "GRANT SELECT ON NAMESPACE nsx TO alice2"))
    }
    // in a governed namespace, only namespace owners may issue a
    // table's FIRST grant (no ownership seizure of fresh tables)
    as("mallory") {
      intercept[SecurityException](
        GraftSql.sql(cat, "GRANT SELECT ON nsx.t2 TO mallory"))
    }
    // a table-level list OVERRIDES the namespace list for that table
    as("dba") {
      GraftSql.sql(cat, "GRANT SELECT ON nsx.t2 TO carol")
    }
    as("alice") {   // ns SELECT grantee, but t2 now has its own list
      intercept[SecurityException](GraftSql.sql(cat, "SELECT * FROM nsx.t2"))
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM nsx.t1")
        .collect()(0).getLong(0) === 1L)   // t1 still via the ns list
    }
    as("carol") {
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM nsx.t2")
        .collect()(0).getLong(0) === 2L)
    }
    // DESCRIBE at namespace scope (the reference's database-level
    // grant) unlocks table METADATA but not row data
    val c = GraftSql.ensureCatalogRegistered(cat)
    as("dba") { GraftSql.sql(cat, "GRANT DESCRIBE ON NAMESPACE nsx TO dave") }
    as("dave") {
      assert(GraftSql.sql(cat, s"DESCRIBE $c.nsx.t1").count() >= 1)
      assert(GraftSql.sql(cat, s"SELECT * FROM $c.nsx.t1.files").count() >= 1)
      intercept[SecurityException](GraftSql.sql(cat, "SELECT * FROM nsx.t1"))
    }
    // SHOW GRANTS ON NAMESPACE: owners and grantees only
    as("dba") {
      val rows = GraftSql.sql(cat, "SHOW GRANTS ON NAMESPACE nsx").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows.contains(("dba", "OWNER")) &&
        rows.contains(("alice", "SELECT")) &&
        rows.contains(("dave", "DESCRIBE")))
    }
    as("stranger") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SHOW GRANTS ON NAMESPACE nsx"))
    }
    // REVOKE prunes; revoking the last grantee of a privilege drops it
    as("dba") {
      GraftSql.sql(cat, "REVOKE SELECT ON NAMESPACE nsx FROM alice")
    }
    as("alice") {
      intercept[SecurityException](GraftSql.sql(cat, "SELECT * FROM nsx.t1"))
    }
  }

  test("column-scoped SELECT: authorized-view projection, DML and side doors closed") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_cols")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT, v STRING, secret STRING)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1, 'a', 's1'), (2, 'b', 's2')")
    cat.getTable("sec", "t").createBranch("b")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin")
      GraftSql.sql(cat, "GRANT SELECT (id, v) ON sec.t TO alice")
    }
    as("alice") {
      // allowed columns read; SELECT * serves only the scope
      assert(GraftSql.sql(cat, "SELECT id, v FROM sec.t ORDER BY id")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ===
        Seq((1, "a"), (2, "b")))
      assert(GraftSql.sql(cat, "SELECT * FROM sec.t").columns.toSeq ===
        Seq("id", "v"))
      // the hidden column fails analysis — as unresolvable, like a view
      intercept[Exception](
        GraftSql.sql(cat, "SELECT secret FROM sec.t").collect())
      // scoped principals cannot write (predicates/rewrites see all
      // columns) nor reach the unscoped side doors
      intercept[SecurityException](
        GraftSql.sql(cat, "INSERT INTO sec.t VALUES (3, 'c', 's3')"))
      intercept[SecurityException](
        GraftSql.sql(cat, "DELETE FROM sec.t WHERE id = 1"))
      intercept[SecurityException](
        GraftSql.sql(cat, "CREATE TABLE sec.leak SHALLOW CLONE sec.t"))
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM table_changes('sec.t', 1)"))
      val c = GraftSql.ensureCatalogRegistered(cat)
      intercept[SecurityException](
        GraftSql.sql(cat, s"SELECT * FROM $c.sec.t.branch_b"))
      intercept[SecurityException](
        GraftSql.sql(cat, s"SELECT * FROM $c.sec.t.files"))
      // metadata at the schema level stays open to the grantee
      assert(GraftSql.sql(cat, "DESCRIBE sec.t").count() === 3)
    }
    // a view over the scoped table scopes its underlying read
    as("admin") {
      GraftSql.sql(cat, "CREATE VIEW sec.vw AS SELECT id, secret FROM sec.t")
    }
    as("alice") {
      intercept[Exception](
        GraftSql.sql(cat, "SELECT * FROM sec.vw").collect())
    }
    // SHOW GRANTS renders the scope; outsiders stay denied entirely
    as("admin") {
      val rows = GraftSql.sql(cat, "SHOW GRANTS ON sec.t").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows.contains(("alice", "SELECT (id, v)")))
    }
    as("bob") {
      intercept[SecurityException](GraftSql.sql(cat, "SELECT id FROM sec.t"))
    }
    // widening to a FULL SELECT clears the scope; revoking SELECT
    // clears both the grant and the scope
    as("admin") { GraftSql.sql(cat, "GRANT SELECT ON sec.t TO alice") }
    as("alice") {
      assert(GraftSql.sql(cat, "SELECT secret FROM sec.t").count() === 2)
    }
    as("admin") {
      GraftSql.sql(cat, "GRANT SELECT (id) ON sec.t TO alice")
      GraftSql.sql(cat, "REVOKE SELECT ON sec.t FROM alice")
      assert(!cat.getTable("sec", "t").properties
        .contains("graft.acl.selectcols.alice"))
    }
    as("alice") {
      intercept[SecurityException](GraftSql.sql(cat, "SELECT id FROM sec.t"))
    }
  }

  test("row filters push down to the scan and prune partitions") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_rows_push")))
    GraftSql.sql(cat,
      "CREATE TABLE sec.p (id STRING, date DATE, v INT) PARTITIONED BY (date)")
    GraftSql.sql(cat, """INSERT INTO sec.p VALUES
      ('a', DATE'2026-01-01', 1), ('b', DATE'2026-01-02', 2),
      ('c', DATE'2026-01-03', 3)""")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON sec.p TO admin")
      GraftSql.sql(cat,
        "GRANT SELECT ON sec.p TO alice WHERE date = DATE'2026-01-02'")
    }
    // the ACL predicate is a plan-level Filter over the relation, so
    // Catalyst pushes it into the V2 scan like any user WHERE — row
    // security that still PRUNES (only the granted partition is read)
    as("alice") {
      val q = GraftSql.sql(cat, "SELECT id FROM sec.p")
      val scans = q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.length === 1, "expected exactly one V2 BatchScan")
      assert(scans.head.inputRDD.getNumPartitions <= 1,
        "ACL row filter did not prune partitions")
      assert(q.collect().map(_.getString(0)) === Array("b"))
    }
  }

  test("temp views created through the surface are private to their creator") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_tmpview")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT, secret STRING)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1, 's1'), (2, 's2')")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin")
      GraftSql.sql(cat, "GRANT SELECT ON sec.t TO alice WHERE id = 1")
      // admin's temp view snapshots admin's UNSCOPED visibility
      GraftSql.sql(cat,
        "CREATE TEMP VIEW adm_v AS SELECT * FROM sec.t")
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM adm_v")
        .collect()(0).getLong(0) === 2L)
    }
    // another principal cannot read through it (the stored plan was
    // checked and scoped for the creator, not for the reader)
    as("alice") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM adm_v").collect())
      // alice's own temp view is scoped to HER filter, and stays hers
      GraftSql.sql(cat, "CREATE TEMP VIEW ali_v AS SELECT * FROM sec.t")
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM ali_v")
        .collect()(0).getLong(0) === 1L)
    }
    as("bob") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM ali_v").collect())
    }
    // DROP clears the record; re-creation re-keys ownership
    as("admin") { GraftSql.sql(cat, "DROP VIEW adm_v") }
    try spark.catalog.dropTempView("ali_v") catch { case _: Exception => () }
  }

  test("row-filtered SELECT: data-cells filter, composition, side doors closed") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_rows")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT, region STRING, secret STRING)")
    GraftSql.sql(cat,
      "INSERT INTO sec.t VALUES (1, 'EU', 's1'), (2, 'US', 's2'), (3, 'EU', 's3')")
    cat.getTable("sec", "t").createBranch("b")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin")
      GraftSql.sql(cat, "GRANT SELECT ON sec.t TO alice WHERE region = 'EU'")
    }
    as("alice") {
      // only the granted rows are served — on direct reads, SELECT *,
      // and aggregates alike
      assert(GraftSql.sql(cat, "SELECT id FROM sec.t ORDER BY id")
        .collect().map(_.getInt(0)).toSeq === Seq(1, 3))
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM sec.t")
        .collect()(0).getLong(0) === 2L)
      // row-filtered principals cannot write (a rewrite reads rows
      // outside the filter) nor reach unscoped side doors
      intercept[SecurityException](
        GraftSql.sql(cat, "INSERT INTO sec.t VALUES (4, 'EU', 's4')"))
      intercept[SecurityException](
        GraftSql.sql(cat, "DELETE FROM sec.t WHERE id = 1"))
      intercept[SecurityException](
        GraftSql.sql(cat, "CREATE TABLE sec.leak SHALLOW CLONE sec.t"))
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM table_changes('sec.t', 1)"))
      val c = GraftSql.ensureCatalogRegistered(cat)
      intercept[SecurityException](
        GraftSql.sql(cat, s"SELECT * FROM $c.sec.t.branch_b"))
      intercept[SecurityException](
        GraftSql.sql(cat, s"SELECT * FROM $c.sec.t.files"))
    }
    // a view over the filtered table filters its underlying read
    as("admin") {
      GraftSql.sql(cat, "CREATE VIEW sec.vw AS SELECT id, secret FROM sec.t")
    }
    as("alice") {
      assert(GraftSql.sql(cat, "SELECT id FROM sec.vw ORDER BY id")
        .collect().map(_.getInt(0)).toSeq === Seq(1, 3))
    }
    // rows × columns composition: the predicate may reference a column
    // OUTSIDE the granted list (the LakeFormation data-cells shape)
    as("admin") {
      GraftSql.sql(cat,
        "GRANT SELECT (id) ON sec.t TO bob WHERE region = 'US'")
    }
    as("bob") {
      val r = GraftSql.sql(cat, "SELECT * FROM sec.t")
      assert(r.columns.toSeq === Seq("id"))
      assert(r.collect().map(_.getInt(0)).toSeq === Seq(2))
      intercept[Exception](
        GraftSql.sql(cat, "SELECT secret FROM sec.t").collect())
    }
    // SHOW GRANTS renders the filter; invalid predicates are rejected
    // at grant time (parse, unknown column, subquery smuggling)
    as("admin") {
      val rows = GraftSql.sql(cat, "SHOW GRANTS ON sec.t").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows.contains(("alice", "SELECT WHERE region = 'EU'")))
      assert(rows.contains(("bob", "SELECT (id) WHERE region = 'US'")))
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "GRANT SELECT ON sec.t TO eve WHERE region = "))
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "GRANT SELECT ON sec.t TO eve WHERE no_such_col = 1"))
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "GRANT SELECT ON sec.t TO eve WHERE id IN (SELECT id FROM sec.t)"))
    }
    // widening to a FULL SELECT clears the filter; revoking SELECT
    // clears grant, filter, and scope
    as("admin") { GraftSql.sql(cat, "GRANT SELECT ON sec.t TO alice") }
    as("alice") {
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM sec.t")
        .collect()(0).getLong(0) === 3L)
    }
    as("admin") {
      GraftSql.sql(cat, "REVOKE SELECT ON sec.t FROM bob")
      val p = cat.getTable("sec", "t").properties
      assert(!p.contains("graft.acl.rowfilter.bob") &&
        !p.contains("graft.acl.selectcols.bob"))
    }
    as("bob") {
      intercept[SecurityException](GraftSql.sql(cat, "SELECT id FROM sec.t"))
    }
  }

  test("temp views go stale when underlying grants change (live governance)") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_tmpstale")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT, secret STRING)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1, 's1'), (2, 's2')")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin")
      GraftSql.sql(cat, "GRANT SELECT ON sec.t TO alice")
      GraftSql.sql(cat, "GRANT SELECT ON sec.t TO bob")
    }
    as("alice") {
      GraftSql.sql(cat, "CREATE TEMP VIEW stale_v AS SELECT * FROM sec.t")
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM stale_v")
        .collect()(0).getLong(0) === 2L)
    }
    // REVOKE: the pre-existing temp view must not retain alice's old
    // visibility (stored views re-check per statement; temp views
    // re-check their recorded ACL snapshot)
    as("admin") { GraftSql.sql(cat, "REVOKE SELECT ON sec.t FROM alice") }
    as("alice") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM stale_v").collect())
    }
    // a NARROWING (column scope) invalidates too — the stored plan was
    // checked unscoped
    as("bob") {
      GraftSql.sql(cat, "CREATE TEMP VIEW bob_v AS SELECT * FROM sec.t")
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM bob_v")
        .collect()(0).getLong(0) === 2L)
    }
    as("admin") { GraftSql.sql(cat, "GRANT SELECT (id) ON sec.t TO bob") }
    as("bob") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM bob_v").collect())
      // recreating under the CURRENT grants serves the scoped plan
      GraftSql.sql(cat, "DROP VIEW bob_v")
      GraftSql.sql(cat, "CREATE TEMP VIEW bob_v2 AS SELECT * FROM sec.t")
      assert(GraftSql.sql(cat, "SELECT * FROM bob_v2").columns.toSeq ===
        Seq("id"))
    }
    // an UNRELATED grant on the table also re-keys the snapshot — the
    // conservative invalidation rule: any ACL movement means recreate
    as("admin") { GraftSql.sql(cat, "GRANT SELECT ON sec.t TO carol") }
    as("bob") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT id FROM bob_v2").collect())
    }
    Seq("stale_v", "bob_v2").foreach { v =>
      try spark.catalog.dropTempView(v) catch { case _: Exception => () }
    }
  }

  test("global temp view ownership holds across sessions on the same context") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_gtmp")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT, secret STRING)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1, 's1'), (2, 's2')")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin")
      GraftSql.sql(cat,
        "CREATE GLOBAL TEMP VIEW gpriv_v AS SELECT * FROM sec.t")
      assert(GraftSql.sql(cat,
          "SELECT count(*) AS n FROM global_temp.gpriv_v")
        .collect()(0).getLong(0) === 2L)
    }
    // global temp views live in SharedState: a SECOND gateway session
    // over the same SparkContext resolves them — the ownership record
    // must hold there too (it keys per context, not per session)
    val spark2 = spark.newSession()
    val cat2 = new TableCatalog(spark2, cat.warehouse)
    spark2.conf.set("graft.sql.principal", "mallory")
    try {
      intercept[SecurityException](
        GraftSql.sql(cat2, "SELECT * FROM global_temp.gpriv_v").collect())
      // the creator still reads it from the second session
      spark2.conf.set("graft.sql.principal", "admin")
      assert(GraftSql.sql(cat2,
          "SELECT count(*) AS n FROM global_temp.gpriv_v")
        .collect()(0).getLong(0) === 2L)
    } finally {
      spark2.conf.unset("graft.sql.principal")
      try spark.catalog.dropGlobalTempView("gpriv_v")
      catch { case _: Exception => () }
    }
  }

  test("time travel, EXECUTE IMMEDIATE, replace/alter DDL, and DML subqueries are governed") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_doors13")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT, v STRING)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1, 'a'), (2, 'b')")
    GraftSql.sql(cat, "CREATE TABLE pub.mine (c INT)")
    GraftSql.sql(cat, "INSERT INTO pub.mine VALUES (7)")
    as("admin") { GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin") }
    as("mallory") {
      GraftSql.sql(cat, "GRANT ALL ON pub.mine TO mallory")

      // time travel: RelationTimeTravel hides its relation from the
      // plan walk — both forms must hit the full-select bar
      intercept[SecurityException](GraftSql.sql(cat,
        "SELECT * FROM sec.t VERSION AS OF 1").collect())
      intercept[SecurityException](GraftSql.sql(cat,
        "SELECT * FROM sec.t TIMESTAMP AS OF '2099-01-01 00:00:00'").collect())

      // EXECUTE IMMEDIATE: the embedded statement is a string the
      // governance walks cannot see
      intercept[SecurityException](GraftSql.sql(cat,
        "EXECUTE IMMEDIATE 'SELECT * FROM sec.t'").collect())

      // destructive DDL through the V2 path: replace destroys data AND
      // the ACL; column surgery mutates a governed schema
      intercept[SecurityException](GraftSql.sql(cat,
        "CREATE OR REPLACE TABLE sec.t AS SELECT 1 AS x").collect())
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE sec.t DROP COLUMN v").collect())
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE sec.t RENAME COLUMN v TO w").collect())
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE sec.t RENAME TO sec.stolen").collect())

      // DML expression subqueries would read OTHER tables outside the
      // governed walk — blocked in UPDATE SET/WHERE, DELETE, MERGE
      intercept[SecurityException](GraftSql.sql(cat,
        "UPDATE pub.mine SET c = (SELECT max(id) FROM sec.t)"))
      intercept[SecurityException](GraftSql.sql(cat,
        "DELETE FROM pub.mine WHERE c IN (SELECT id FROM sec.t)"))
      intercept[SecurityException](GraftSql.sql(cat,
        """MERGE INTO pub.mine t USING (SELECT 7 AS c) s
           ON t.c = s.c AND t.c = (SELECT max(id) FROM sec.t)
           WHEN MATCHED THEN UPDATE SET c = s.c"""))

      // maintenance arms now take the write/full-select bar
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE sec.t ADD CONSTRAINT block CHECK (false)"))
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE sec.t SET PARTITION SPEC (bucket(8, id))"))
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER TABLE sec.t WRITE ORDERED BY (id)"))
      intercept[SecurityException](GraftSql.sql(cat,
        "ANALYZE TABLE sec.t COMPUTE STATISTICS"))
    }
    // the granted principal keeps every door
    as("admin") {
      assert(GraftSql.sql(cat, "SELECT * FROM sec.t VERSION AS OF 0")
        .count() === 0L)                       // v0 = empty CREATE state
      GraftSql.sql(cat, "ANALYZE TABLE sec.t COMPUTE STATISTICS")
      GraftSql.sql(cat, "ALTER TABLE sec.t WRITE ORDERED BY (id)")
      GraftSql.sql(cat, "ALTER TABLE sec.t ADD CONSTRAINT ok CHECK (id > 0)")
      GraftSql.sql(cat, "ALTER TABLE sec.t DROP CONSTRAINT ok")
    }
    // data unharmed by the denied attempts
    as("admin") {
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM sec.t")
        .collect()(0).getLong(0) === 2L)
    }
  }

  test("DROP VIEW global_temp.<v> routes to the session registry") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_gtv_drop")))
    GraftSql.sql(cat, "CREATE TABLE gt.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO gt.t VALUES (1)")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON gt.t TO admin")
      GraftSql.sql(cat, "CREATE GLOBAL TEMP VIEW gdrop_v AS SELECT * FROM gt.t")
      assert(spark.catalog.tableExists("global_temp.gdrop_v"))
      GraftSql.sql(cat, "DROP VIEW global_temp.gdrop_v")
      assert(!spark.catalog.tableExists("global_temp.gdrop_v"),
        "global temp view survived its drop (mis-routed to the stored registry)")
      // the BACKTICKED spelling routes identically (ADVICE r13: it
      // slipped into the stored-view arm, leaving the live view and
      // its ownership record behind)
      GraftSql.sql(cat, "CREATE GLOBAL TEMP VIEW gdrop_b AS SELECT * FROM gt.t")
      assert(spark.catalog.tableExists("global_temp.gdrop_b"))
      GraftSql.sql(cat, "DROP VIEW `global_temp`.gdrop_b")
      assert(!spark.catalog.tableExists("global_temp.gdrop_b"),
        "backtick-quoted global_temp drop mis-routed to the stored registry")
    }
  }

  test("a GraftCatalog alias over a DIFFERENT warehouse is not governed by this one") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_wh_a")))
    GraftSql.sql(cat, "CREATE TABLE ns.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO ns.t VALUES (1)")
    as("admin") { GraftSql.sql(cat, "GRANT ALL ON ns.t TO admin") }
    // another warehouse whose PATH differs only in normalization is
    // the SAME warehouse and stays governed
    val samePath = cat.warehouse.toString + "/sub/.."
    spark.conf.set("spark.sql.catalog.whsame", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.whsame.warehouse", samePath)
    // a different warehouse with the same table name must NOT be
    // cross-governed (neither falsely denied nor falsely scoped)
    val other = new TableCatalog(spark, new Path(freshDir("acl_wh_b")))
    GraftSql.sql(other, "CREATE TABLE ns.t (id INT)")
    GraftSql.sql(other, "INSERT INTO ns.t VALUES (41), (42)")
    spark.conf.set("spark.sql.catalog.whother", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.whother.warehouse", other.warehouse.toString)
    try {
      as("mallory") {
        // the .. spelling of THIS warehouse still takes the grant check
        intercept[SecurityException](
          GraftSql.sql(cat, "SELECT * FROM whsame.ns.t").collect())
        // the other warehouse's ns.t is not governed by cat's ACLs —
        // mallory reads it through cat's surface without sec grants
        assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM whother.ns.t")
          .collect()(0).getLong(0) === 2L)
      }
    } finally {
      Seq("whsame", "whother").foreach { c =>
        spark.conf.unset(s"spark.sql.catalog.$c")
        spark.conf.unset(s"spark.sql.catalog.$c.warehouse")
      }
    }
  }

  test("CALL procedures take per-procedure ACL bars (r13 verdict: the string-argument bypass)") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_call")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT, v STRING)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1, 'a')")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (2, 'b')")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin")
      GraftSql.sql(cat, "GRANT SELECT ON sec.t TO bob")
      GraftSql.sql(cat, "GRANT INSERT ON sec.t TO writer")
    }
    // a zero-grant principal is refused EVERY procedure on the governed
    // table — named-argument form, positional form, bare/system-prefixed
    as("mallory") {
      for (stmt <- Seq(
          "CALL system.rollback_to_version(table => 'sec.t', version => 1)",
          "CALL system.rollback_to_version('sec.t', 1)",
          "CALL rollback_to_version('sec.t', 1)",
          "CALL system.rollback_to_timestamp('sec.t', TIMESTAMP '2020-01-01')",
          "CALL system.expire_snapshots(table => 'sec.t', retain_last => 1)",
          "CALL system.remove_orphan_files('sec.t')",
          "CALL system.create_branch('sec.t', 'b')",
          "CALL system.drop_branch('sec.t', 'b')",
          "CALL system.fast_forward('sec.t', 'b')",
          "CALL system.create_tag('sec.t', 'v1')",
          "CALL system.add_files('sec.t', '/tmp/nope')",
          "CALL system.rewrite_data_files('sec.t')",
          "CALL system.rewrite_position_deletes('sec.t')",
          "CALL system.maintain_table('sec.t')",
          "CALL system.measure_vector_index_recall('sec.t', 'id')",
          "CALL system.build_bloom_index('sec.t', 'id')",
          "CALL system.refresh_bloom_index('sec.t', 'id')",
          "CALL system.analyze_table('sec.t')",
          "CALL system.index_commits('sec.t')",
          "CALL system.shallow_clone('sec.t', 'sec.leak')"))
        withClue(stmt) {
          intercept[SecurityException](GraftSql.sql(cat, stmt).collect())
        }
      // a computed table name cannot dodge the literal resolution
      intercept[SecurityException](GraftSql.sql(cat,
        "CALL system.rollback_to_version(table => concat('sec', '.t'), version => 1)"))
    }
    // a MIXED-CASE registered alias over this warehouse cannot shed the
    // gate (conf-registered catalog names are case-sensitive; the gate
    // must compare the original spelling, never a lowercased one)
    spark.conf.set("spark.sql.catalog.AliasWh",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.AliasWh.warehouse",
      cat.warehouse.toString)
    try {
      as("mallory") {
        intercept[SecurityException](GraftSql.sql(cat,
          "CALL `AliasWh`.system.rollback_to_version('sec.t', 1)").collect())
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.AliasWh")
      spark.conf.unset("spark.sql.catalog.AliasWh.warehouse")
    }
    // a SELECT grantee clears only the DESCRIBE/full-select bars
    as("bob") {
      assert(GraftSql.sql(cat, "CALL system.analyze_table('sec.t')")
        .collect().length === 1)
      intercept[SecurityException](GraftSql.sql(cat,
        "CALL system.rewrite_data_files('sec.t')").collect())
      intercept[SecurityException](GraftSql.sql(cat,
        "CALL system.rollback_to_version('sec.t', 1)").collect())
    }
    // an INSERT grantee clears the write bar but not owner surgery
    as("writer") {
      assert(GraftSql.sql(cat, "CALL system.rewrite_data_files('sec.t')")
        .collect().length === 1)
      intercept[SecurityException](GraftSql.sql(cat,
        "CALL system.expire_snapshots(table => 'sec.t', retain_last => 1)")
        .collect())
    }
    // owners clear everything, end to end through the governed surface
    as("admin") {
      assert(GraftSql.sql(cat, "CALL system.create_tag('sec.t', 'v1')")
        .collect().length === 1)
      val rb = GraftSql.sql(cat,
        "CALL system.rollback_to_version(table => 'sec.t', version => 1)")
        .collect()
      assert(rb.length === 1)
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM sec.t")
        .collect()(0).getLong(0) === 1L)
    }
    // an UNGOVERNED table stays open (no ACL → no bar), as for DML
    GraftSql.sql(cat, "CREATE TABLE open.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO open.t VALUES (7)")
    as("mallory") {
      assert(GraftSql.sql(cat, "CALL system.analyze_table('open.t')")
        .collect().length === 1)
    }
  }

  test("CALL bars: scoped principals are refused writes and clones; sweep covers every procedure") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_call_scope")))
    GraftSql.sql(cat, "CREATE TABLE sec.t (id INT, secret STRING)")
    GraftSql.sql(cat, "INSERT INTO sec.t VALUES (1, 's')")
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON sec.t TO admin")
      GraftSql.sql(cat, "GRANT SELECT (id) ON sec.t TO alice")
      GraftSql.sql(cat, "GRANT INSERT ON sec.t TO alice")
    }
    as("alice") {
      // column-scoped: the write bar refuses (writes fabricate hidden
      // cells) and shallow_clone serves unscoped rows — both closed
      intercept[SecurityException](GraftSql.sql(cat,
        "CALL system.rewrite_data_files('sec.t')").collect())
      intercept[SecurityException](GraftSql.sql(cat,
        "CALL system.shallow_clone('sec.t', 'sec.leak')").collect())
    }
    // the sweep: a procedure without an assigned bar cannot exist —
    // registering one makes this fail until ProcedureBars covers it
    for (n <- graft.catalog.GraftProcedures.names)
      withClue(s"procedure $n lacks a governance bar") {
        assert(GraftSql.ProcedureBars.contains(n))
      }
  }

  test("temp views are private objects end to end; code-loading statements are closed") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_tv_priv")))
    GraftSql.sql(cat, "CREATE TABLE tv.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO tv.t VALUES (1), (2)")
    as("alice") {
      GraftSql.sql(cat, "CREATE TEMP VIEW priv_v AS SELECT * FROM tv.t")
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM priv_v")
        .collect()(0).getLong(0) === 2L)
    }
    // another principal can neither replace, redefine, nor drop it —
    // any of those would hijack or destroy alice's private object
    // (r14 self-review: OR REPLACE used to re-record the replacer as
    // owner and lock alice out)
    as("bob") {
      intercept[SecurityException](GraftSql.sql(cat,
        "CREATE OR REPLACE TEMP VIEW priv_v AS SELECT 1 AS x"))
      intercept[SecurityException](GraftSql.sql(cat,
        "ALTER VIEW priv_v AS SELECT 1 AS x"))
      intercept[SecurityException](GraftSql.sql(cat, "DROP VIEW priv_v"))
    }
    // the owner can do all three; ALTER refreshes the recorded state
    as("alice") {
      GraftSql.sql(cat, "ALTER VIEW priv_v AS SELECT id FROM tv.t WHERE id = 1")
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM priv_v")
        .collect()(0).getLong(0) === 1L)
      GraftSql.sql(cat, "DROP VIEW priv_v")
    }
    // code-loading statements are a governance escape (arbitrary
    // classes / shell commands run outside every plan walk) — closed
    for (stmt <- Seq(
        "ADD JAR '/tmp/evil.jar'",
        "ADD FILES '/tmp/evil.sh'",
        "CREATE TEMPORARY FUNCTION f AS 'java.lang.String'",
        "CREATE FUNCTION tv.f AS 'java.lang.String'",
        "CREATE FUNCTION tv.g(x INT) RETURNS INT RETURN x + 1",
        "SELECT TRANSFORM(id) USING 'cat' FROM tv.t"))
      withClue(stmt) {
        intercept[SecurityException](GraftSql.sql(cat, stmt).collect())
      }
    // the benign session statements stay open (value restored — this
    // SET lands on the SHARED test session)
    val ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    GraftSql.sql(cat, "SET spark.sql.ansi.enabled=false")
    GraftSql.sql(cat, s"SET spark.sql.ansi.enabled=$ansi0")
    assert(spark.conf.get("spark.sql.ansi.enabled") === ansi0)
  }

  test("stored views: replace/drop take the creator-or-namespace-owner bar; reads stay per-reader") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_sview")))
    GraftSql.sql(cat, "CREATE TABLE sv.t (id INT)")
    GraftSql.sql(cat, "INSERT INTO sv.t VALUES (1), (2)")
    as("alice") {
      GraftSql.sql(cat, "CREATE VIEW sv.v AS SELECT * FROM sv.t")
    }
    as("bob") {
      // a stored view is SHARED: reads re-check per reader (sv.t is
      // ungoverned, so bob reads fine)...
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM sv.v")
        .collect()(0).getLong(0) === 2L)
      // ...but replacing or dropping it is administration (r14
      // self-review: any principal could redefine or destroy another's
      // stored view)
      intercept[SecurityException](GraftSql.sql(cat,
        "CREATE OR REPLACE VIEW sv.v AS SELECT 1 AS x"))
      intercept[SecurityException](GraftSql.sql(cat, "DROP VIEW sv.v"))
    }
    // the creator administers their view
    as("alice") {
      GraftSql.sql(cat, "CREATE OR REPLACE VIEW sv.v AS SELECT id FROM sv.t WHERE id = 1")
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM sv.v")
        .collect()(0).getLong(0) === 1L)
    }
    // ...and so does a namespace owner
    as("dba") { GraftSql.sql(cat, "GRANT ALL ON NAMESPACE sv TO dba") }
    as("dba") {
      GraftSql.sql(cat, "DROP VIEW sv.v")
    }
  }

  test("vector_search TVF composes with grants: row filters scope candidates, column scopes gate") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_vecsearch")))
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val t = cat.createTable("vec", "t", emb.schema, Nil)
    t.append(emb)
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val queries = t.toDF.filter(
      org.apache.spark.sql.functions.col("vec_id") % 7 === 3).limit(4)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("query_vec"))
    val q = cat.createTable("vec", "q", queries.schema, Nil)
    q.append(queries)
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON vec.t TO admin")
      GraftSql.sql(cat, "GRANT SELECT ON vec.t TO carol")
      GraftSql.sql(cat, "GRANT SELECT ON vec.t TO alice WHERE label <= 4")
      GraftSql.sql(cat, "GRANT SELECT (vec_id, label) ON vec.t TO bob")
      GraftSql.sql(cat,
        "GRANT SELECT (vec_id, label, embedding) ON vec.t TO dana")
    }
    val tvf = "SELECT * FROM vector_search('vec.t', 'vec.q', 10)"
    // zero-grant: refused at the SELECT bar
    as("mallory") {
      intercept[SecurityException](GraftSql.sql(cat, tvf).collect())
      // ...and SHOW INDEXES takes the DESCRIBE bar
      intercept[SecurityException](
        GraftSql.sql(cat, "SHOW INDEXES ON vec.t").collect())
    }
    // full-select grantee: unrestricted search
    val full = as("carol") {
      GraftSql.sql(cat, tvf).select("vec_id")
        .collect().map(_.getLong(0)).toSet
    }
    assert(full.nonEmpty)
    // row-filtered grantee: the filter becomes the IDSelector — every
    // hit satisfies it, and k still fills from the visible corpus
    as("alice") {
      val got = GraftSql.sql(cat, tvf)
      val hits = got.select("vec_id").collect().map(_.getLong(0)).toSet
      val visible = t.toDF.filter(org.apache.spark.sql.functions
          .col("label") <= 4).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(hits.subsetOf(visible),
        s"row-filtered search leaked ${hits -- visible}")
      assert(got.count() === 40L)   // 4 queries x k=10, k stays filled
    }
    // column scope NOT covering the vector column: refused (the score
    // derives from cells outside the scope)
    as("bob") {
      intercept[SecurityException](GraftSql.sql(cat, tvf).collect())
    }
    // column scope covering (id, vector): allowed — the output exposes
    // nothing outside the scope
    as("dana") {
      assert(GraftSql.sql(cat, tvf).count() === 40L)
    }
    // NESTED positions take the same bars at resolution (r15): the TVF
    // inside a CTE + WHERE resolves through the same governed
    // substitution, so a refusal in the direct form is a refusal in
    // every composed form — no wrapper laundering
    val nested = "WITH hits AS (SELECT * FROM " +
      "vector_search('vec.t', 'vec.q', 10)) " +
      "SELECT * FROM hits WHERE rank <= 3"
    as("mallory") {
      intercept[SecurityException](GraftSql.sql(cat, nested).collect())
    }
    as("bob") {
      intercept[SecurityException](GraftSql.sql(cat, nested).collect())
    }
    as("alice") {
      val hits = GraftSql.sql(cat, nested).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      val visible = t.toDF.filter(org.apache.spark.sql.functions
          .col("label") <= 4).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(hits.subsetOf(visible),
        s"nested row-filtered search leaked ${hits -- visible}")
    }
    // and the same for table_changes: the feed serves unscoped rows,
    // so the full-select bar refuses scoped principals in ANY position
    as("admin") {
      GraftSql.sql(cat, "ALTER TABLE vec.t SET TBLPROPERTIES " +
        s"('${TxTable.ChangeFeedProperty}' = 'true')")
    }
    as("alice") {
      intercept[SecurityException](GraftSql.sql(cat,
        "WITH f AS (SELECT * FROM table_changes('vec.t', 0)) " +
          "SELECT count(*) FROM f").collect())
    }
    // SHOW INDEXES parity (r15): coverage is row counts over the whole
    // table — scoped principals are refused like the stats-bearing
    // metadata sub-tables; a plain grantee still reads it
    as("alice") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SHOW INDEXES ON vec.t").collect())
      // the relational form takes the identical bar
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM vec.t.indexes").collect())
    }
    as("bob") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SHOW INDEXES ON vec.t").collect())
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM vec.t.indexes").collect())
    }
    as("carol") {
      assert(GraftSql.sql(cat, "SHOW INDEXES ON vec.t").count() >= 1L)
      assert(GraftSql.sql(cat, "SELECT * FROM vec.t.indexes").count() >= 1L)
    }
    as("mallory") {
      intercept[SecurityException](
        GraftSql.sql(cat, "SELECT * FROM vec.t.indexes").collect())
    }
  }

  test("vector_search with an inline array literal takes the same corpus bars") {
    val cat = new TableCatalog(spark, new Path(freshDir("acl_veclit")))
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val t = cat.createTable("vec", "t", emb.schema, Nil)
    t.append(emb)
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON vec.t TO admin")
      GraftSql.sql(cat, "GRANT SELECT ON vec.t TO carol")
      GraftSql.sql(cat, "GRANT SELECT ON vec.t TO alice WHERE label <= 4")
      GraftSql.sql(cat, "GRANT SELECT (vec_id, label) ON vec.t TO bob")
    }
    val vals = t.toDF.filter(org.apache.spark.sql.functions
        .col("vec_id") === 3L)
      .select("embedding").collect()(0).getSeq[Float](0)
    val lit = s"array(${vals.mkString(", ")})"
    val q = s"SELECT * FROM vector_search('vec.t', $lit, 10)"
    // the literal form is the SAME governed surface: zero-grant and
    // insufficient column scope refuse exactly like the relation form
    as("mallory") {
      intercept[SecurityException](GraftSql.sql(cat, q).collect())
    }
    as("bob") {
      intercept[SecurityException](GraftSql.sql(cat, q).collect())
    }
    // full grantee: one query (query_id 0), k filled, self at rank 1
    as("carol") {
      val rows = GraftSql.sql(cat, q)
        .orderBy(org.apache.spark.sql.functions.col("rank")).collect()
      assert(rows.length === 10)
      assert(rows.forall(_.getLong(0) === 0L))   // query_id
      assert(rows.head.getAs[Long]("vec_id") === 3L)
    }
    // row-filtered grantee: the IDSelector path applies to the literal
    // form too — hits stay inside the visible rows
    as("alice") {
      val hits = GraftSql.sql(cat, q).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      val visible = t.toDF.filter(org.apache.spark.sql.functions
          .col("label") <= 4).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(hits.subsetOf(visible) && hits.size === 10)
    }
    // fail-closed shapes: a non-literal element would evaluate outside
    // the governed walk; a wrong dimension is a plain argument error
    as("carol") {
      intercept[SecurityException](GraftSql.sql(cat,
        "SELECT * FROM vector_search('vec.t', array(rand()), 5)").collect())
      intercept[IllegalArgumentException](GraftSql.sql(cat,
        "SELECT * FROM vector_search('vec.t', array(1.0, 2.0), 5)")
        .collect())
    }
  }

  test("temp view over vector_search invalidates when the QUERY SOURCE's grants change") {
    // the TVF's tables are literal ARGUMENTS — invisible to the
    // relation-walk snapshot. Arg 0 (the corpus) was captured since
    // r14; this pins arg 1 (the query source), whose resolved read the
    // stored view plan embeds just the same: a grant change on it must
    // invalidate the view, not keep serving the pre-REVOKE visibility.
    val cat = new TableCatalog(spark, new Path(freshDir("acl_vstv")))
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val t = cat.createTable("vtv", "t", emb.schema, Nil)
    t.append(emb)
    t.buildVectorIndex("vec_id", "embedding", dim = 64)
    val queries = t.toDF.limit(3)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("query_vec"))
    val q = cat.createTable("vtv", "q", queries.schema, Nil)
    q.append(queries)
    as("admin") {
      GraftSql.sql(cat, "GRANT ALL ON vtv.t TO admin")
      GraftSql.sql(cat, "GRANT ALL ON vtv.q TO admin")
      GraftSql.sql(cat, "GRANT SELECT ON vtv.t TO alice")
      GraftSql.sql(cat, "GRANT SELECT ON vtv.q TO alice")
    }
    as("alice") {
      GraftSql.sql(cat, "CREATE TEMPORARY VIEW vtv_hits AS " +
        "SELECT * FROM vector_search('vtv.t', 'vtv.q', 5)")
      assert(GraftSql.sql(cat, "SELECT count(*) AS n FROM vtv_hits")
        .collect()(0).getLong(0) === 15L)
    }
    try {
      as("admin") { GraftSql.sql(cat, "REVOKE SELECT ON vtv.q FROM alice") }
      as("alice") {
        val e = intercept[SecurityException](
          GraftSql.sql(cat, "SELECT * FROM vtv_hits").collect())
        assert(e.getMessage.contains("vtv.q"),
          s"expected the QUERY SOURCE to invalidate the view, got: $e")
      }
    } finally as("alice") {
      GraftSql.sql(cat, "DROP VIEW IF EXISTS vtv_hits")
    }
  }
}
