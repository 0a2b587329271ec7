package graft.queries

import graft.ingest.SampleData
import org.apache.spark.sql.functions._

/**
 * Round-6 surface: the DataSource V2 catalog path — `spark.sql`
 * statements resolving graft tables natively (the way the reference's
 * tables resolve through `s3tablescatalog` to Athena,
 * kinesis-firehose-stream/README.md:147) — plus generalized SQL MERGE.
 */
object Pipeline4 {

  private val root = Pipeline.oracleInputsRoot

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Native V2 catalog end-to-end: CREATE TABLE ... PARTITIONED BY AS
    // SELECT, INSERT INTO, and a grouped aggregate — every statement
    // parsed and resolved by Catalyst against graft.catalog.GraftCatalog
    // (no regex routing, no temp-view rewriting). The oracle recomputes
    // the aggregate from the staged seed: CTAS + INSERT partition the
    // seed into two disjoint slices, so table content == seed content.
    Q("catalog_v2_sql", fn = (s, dir) => {
      val seedDir = Pipeline.stagedInput("v2cat_seed", "parquet") {
        SampleData.transactions(s, 300, seed = 33L)
      }
      val wh = Pipeline.scratch("v2cat")
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.read.parquet(seedDir).createOrReplaceTempView("v2cat_seed")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.analytics")
      s.sql("""CREATE TABLE graft.analytics.txns_v2 PARTITIONED BY (date) AS
               SELECT * FROM v2cat_seed WHERE risk_score <> 'HIGH'""")
      s.sql("""INSERT INTO graft.analytics.txns_v2
               SELECT * FROM v2cat_seed WHERE risk_score = 'HIGH'""")
      s.sql("""
        SELECT region, status, count(*) AS n,
               CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM graft.analytics.txns_v2
        WHERE status IN ('COMPLETED', 'FLAGGED')
        GROUP BY region, status
        ORDER BY region, status""")
    }, oracle = Some(s"""
      SELECT region, status, count(*) AS n,
             CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM read_parquet('$root/v2cat_seed/*.parquet')
      WHERE status IN ('COMPLETED', 'FLAGGED')
      GROUP BY region, status
      ORDER BY region, status""")),
  )
}
