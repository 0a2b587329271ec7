package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, attach the most recent right row with
 * the same key whose time is <= the left row's time.
 *
 * Spark has no built-in as-of join; rather than a custom physical
 * operator, this uses the union-sort trick: tag both inputs, union
 * them, and carry the latest right-side values forward with
 * `last(_, ignoreNulls = true)` over a (key, time, tag) window. Cost is
 * ONE shuffle on the key (same as any keyed join) plus a per-partition
 * sort — strictly cheaper than the naive "join all earlier rows then
 * keep max" rewrite, which explodes quadratically, and it inherits
 * skew handling from the regular exchange. Ties (equal time) resolve
 * to the right row (tag 0 sorts before tag 1), i.e. `<=` semantics,
 * matching DuckDB's `ASOF JOIN ... ON b.ts <= a.ts`.
 */
object AsOfJoin {

  /**
   * @param left      rows to enrich
   * @param right     rows providing the as-of values
   * @param keyCols   equi-join keys present in both inputs
   * @param leftTime  event-time column name in `left`
   * @param rightTime event-time column name in `right`
   * @param valueCols right-side columns to carry (become `asof_<name>`)
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val t = col("__t")

    // Right-side values ride in ONE wrapper struct (non-null whenever a
    // right row exists, even if every value inside is null) — running
    // last(_, ignoreNulls) over bare value columns would skip a matched
    // right row whose value is null and resurrect an older row's value.
    val valueStruct = struct(valueCols.map(col): _*)

    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag"),
          valueStruct.as("__vals")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        right.select(valueCols.map(col): _*).schema.fields))
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag"),
          nullStruct.as("__vals")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(t.asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__last", last(col("__vals"), ignoreNulls = true).over(w))
      .select((keyCols.map(col) ++
        Seq(t, col("__tag")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        valueCols.map(c => col("__last").getField(c).as(s"asof_$c"))): _*)
      .filter(col("__tag") === 1)
      .drop("__t", "__tag")
  }
}
