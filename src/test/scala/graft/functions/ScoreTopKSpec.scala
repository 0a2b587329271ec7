package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/**
 * [[graft.functions.expressions.ScoreTopK]] must select EXACTLY the
 * rows the `row_number() OVER (ORDER BY score DESC, id ASC) <= k`
 * window form it replaced selected — including rank positions — on
 * adversarial tie profiles, across id types, and across partial-merge
 * trees (the r19 optimization swapped the similarity paths' full-
 * shuffle window top-k for this map-side-combining aggregate; any
 * divergence here silently changes oracle-checked ANN outputs).
 */
class ScoreTopKSpec extends SparkSpec {
  import spark.implicits._

  private def aggTopK(scored: DataFrame, k: Int,
      idCol: String = "id"): DataFrame = {
    val agg = ColumnBridge.column(
      graft.functions.expressions.ScoreTopK(
        ColumnBridge.expression(col("score")),
        ColumnBridge.expression(col(idCol)), k).toAggregateExpression())
    scored.groupBy(col("g")).agg(agg.as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), col(s"e.id").as(idCol), col("e.score").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  private def windowTopK(scored: DataFrame, k: Int,
      idCol: String = "id"): DataFrame = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.select(col("g"), col(idCol), col("score"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }

  private def assertSame(scored: DataFrame, k: Int,
      idCol: String = "id"): Unit = {
    val a = aggTopK(scored, k, idCol).collect()
      .map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    val w = windowTopK(scored, k, idCol).collect()
      .map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(a === w, s"aggregate top-$k diverged from the window form")
  }

  test("matches the window form on seeded random scores, many groups") {
    // deterministic pseudo-random doubles with repeats (mod 97 forces
    // score ties within and across groups)
    val scored = spark.range(20000).select(
      pmod(col("id"), lit(37)).as("g"),
      col("id"),
      (pmod(xxhash64(col("id")), lit(97)) / lit(97.0)).as("score"))
    assertSame(scored, 1)
    assertSame(scored, 10)
    assertSame(scored, 64)
  }

  test("ties break to the smallest id, exactly like the window") {
    // every score identical: top-k must be the k smallest ids, ranked
    // in id order
    val scored = spark.range(1000).select(lit(0L).as("g"), col("id"),
      lit(0.5).as("score"))
    val got = aggTopK(scored, 5).orderBy("rank")
      .select("id", "rank").as[(Long, Int)].collect()
    assert(got.toSeq === Seq((0L, 1), (1L, 2), (2L, 3), (3L, 4), (4L, 5)))
    assertSame(scored, 5)
  }

  test("k larger than the group emits the whole group, ordered") {
    val scored = Seq((1L, 10L, 0.9), (1L, 11L, 0.1), (2L, 12L, 0.4))
      .toDF("g", "id", "score")
    assertSame(scored, 100)
    assert(aggTopK(scored, 100).count() === 3)
  }

  test("string ids order lexicographically, like the window") {
    val scored = Seq(
      (0L, "b", 0.5), (0L, "a", 0.5), (0L, "c", 0.5), (0L, "aa", 0.9),
      (1L, "z", 0.1), (1L, "y", 0.2))
      .toDF("g", "id", "score")
    assertSame(scored, 2)
    val got = aggTopK(scored, 2).filter(col("g") === 0)
      .orderBy("rank").select("id").as[String].collect()
    assert(got.toSeq === Seq("aa", "a"))
  }

  test("survives partial-merge trees: many input partitions, few groups") {
    val scored = spark.range(50000).repartition(32).select(
      pmod(col("id"), lit(3)).as("g"),
      col("id"),
      (pmod(xxhash64(col("id") + 7), lit(1000)) / lit(1000.0)).as("score"))
    assertSame(scored, 10)
  }

  test("null scores and null ids are dropped, never ranked") {
    val scored = Seq(
      (0L, java.lang.Long.valueOf(1L), java.lang.Double.valueOf(0.9)),
      (0L, java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Double]),
      (0L, null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(0.8)),
      (0L, java.lang.Long.valueOf(3L), java.lang.Double.valueOf(0.7)))
      .toDF("g", "id", "score")
    val got = aggTopK(scored, 10).orderBy("rank")
      .select("id", "rank").as[(Long, Int)].collect()
    assert(got.toSeq === Seq((1L, 1), (3L, 2)))
  }
}
