package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Hidden-partitioning transforms — the Iceberg partition-spec model
 * (Iceberg spec §"Partition Transforms"; the reference's tables are
 * Iceberg-in-S3-Tables, whose `PARTITIONED BY (days(ts))` layouts are
 * produced by exactly this machinery). A [[PartField]] derives a
 * PHYSICAL partition value from a SOURCE column; the derived column
 * never appears in the table schema — queries filter on the source
 * column and the engine maps predicates onto partitions itself.
 *
 * One Catalyst expression definition per transform serves every
 * consumer, which is what makes the three sites provably consistent:
 *  - the bulk write path derives partition columns on the DataFrame
 *    ([[derive]] — the same expression, analyzed/codegen'd);
 *  - the V2 row-level writer evaluates it per row over a
 *    [[BoundReference]] ([[rowEval]] — interpreted eval);
 *  - scan pruning evaluates it over a pushed literal
 *    ([[renderLiteral]]) and compares against stored partition values.
 *
 * All transforms RENDER AS STRINGS (zero-padded date patterns, decimal
 * integers), so the directory name, the snapshot's `partitionValues`,
 * and every comparison share one canonical form. Date-family patterns
 * are fixed-width, so lexicographic order equals chronological order —
 * that is what lets range predicates on the source column prune
 * transformed partitions ([[monotonic]]).
 */
object PartitionTransform {

  val Identity = "identity"
  /** transform name → whether source ranges map to partition ranges */
  private val DatePatterns = Map(
    "year" -> "yyyy", "month" -> "yyyy-MM", "day" -> "yyyy-MM-dd",
    "hour" -> "yyyy-MM-dd-HH")

  val Names: Set[String] =
    DatePatterns.keySet ++ Set(Identity, "bucket", "truncate")

  /** The effective spec: explicit when stored, else one identity field
    * per partition column (pre-transform logs and identity tables). */
  def resolve(s: Snapshot): Seq[PartField] =
    if (s.partitionSpec.nonEmpty) s.partitionSpec
    else s.partitionColumns.map(c => PartField(c, Identity, c))

  def hasTransforms(s: Snapshot): Boolean = s.partitionSpec.exists(!_.isIdentity)

  /** Validate a spec against a table schema at CREATE time. */
  def validate(spec: Seq[PartField], schema: StructType): Unit = {
    require(spec.map(_.name).distinct.size == spec.size,
      s"duplicate partition field names in ${spec.map(_.name).mkString(", ")}")
    spec.foreach { f =>
      require(Names.contains(f.transform), s"unknown transform '${f.transform}'")
      require(schema.fieldNames.contains(f.source),
        s"partition source column '${f.source}' is not in the table schema")
      if (f.isIdentity) {
        require(f.name == f.source,
          s"identity partition field '${f.name}' must be named after its source")
      } else {
        require(!schema.fieldNames.contains(f.name),
          s"derived partition field '${f.name}' collides with a schema column")
        val dt = schema(f.source).dataType
        f.transform match {
          case "bucket" =>
            require(f.param > 0, s"bucket(${f.param}) requires a positive count")
          case "truncate" =>
            require(f.param > 0, s"truncate(${f.param}) requires a positive width")
            require(dt == StringType || integral(dt),
              s"truncate source '${f.source}' must be string or integral, got $dt")
          case _ =>
            require(dt == TimestampType || dt == DateType,
              s"${f.transform} source '${f.source}' must be timestamp/date, got $dt")
        }
      }
    }
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }

  /** Source ranges map to partition-value ranges (string compare):
    * date patterns are fixed-width; integral truncate is order-
    * preserving numerically but NOT lexicographically as strings, so
    * only date transforms qualify. */
  def monotonic(f: PartField): Boolean = DatePatterns.contains(f.transform)

  /**
   * The ONE definition of each transform: a Catalyst expression over
   * `child` (whose type is `childType`) producing the string partition
   * value. Resolved expressions only (explicit casts, bound zone), so
   * interpreted `eval` works without an analyzer pass.
   */
  def exprFor(f: PartField, child: Expression, childType: DataType,
      zoneId: String): Expression = f.transform match {
    case Identity =>
      Cast(child, StringType, Option(zoneId))
    case t if DatePatterns.contains(t) =>
      val ts = childType match {
        case TimestampType => child
        case DateType      => Cast(child, TimestampType, Option(zoneId))
        case other => throw new IllegalArgumentException(
          s"$t transform needs a timestamp/date source, got $other")
      }
      DateFormatClass(ts, Literal(DatePatterns(t)), Option(zoneId))
    case "bucket" =>
      // xxhash64 (seed 42, Spark's SQL function) mod n — deterministic
      // across the write path, the row writer, and pruning
      Cast(Pmod(new XxHash64(Seq(child)), Literal(f.param.toLong)), StringType)
    case "truncate" =>
      childType match {
        case StringType => Substring(child, Literal(1), Literal(f.param))
        case dt if integral(dt) =>
          // floor-to-width via pmod (non-negative remainder), the
          // Iceberg truncate semantics for negatives: -7 trunc 5 = -10
          Cast(Subtract(child, Pmod(child, Cast(Literal(f.param), dt))), StringType)
        case other => throw new IllegalArgumentException(
          s"truncate transform needs a string/integral source, got $other")
      }
    case other => throw new IllegalArgumentException(s"unknown transform '$other'")
  }

  /** Column form of [[exprFor]] over an arbitrary source column
    * (alias-qualified in join contexts). */
  def columnOver(f: PartField, source: Column, childType: DataType,
      zoneId: String): Column =
    ColumnBridge.column(
      exprFor(f, ColumnBridge.expression(source), childType, zoneId))

  /** Column form of [[exprFor]] for the bulk write path. */
  def columnFor(f: PartField, childType: DataType, zoneId: String): Column =
    columnOver(f, col(f.source), childType, zoneId)

  /** Append each DERIVED (non-identity) partition column missing from
    * `df` — identity fields are already real columns. Idempotent, so
    * callers may invoke it defensively. */
  def derive(df: DataFrame, spec: Seq[PartField], schema: StructType,
      zoneId: String): DataFrame =
    spec.filterNot(_.isIdentity).foldLeft(df) { (acc, f) =>
      if (acc.columns.contains(f.name)) acc
      else acc.withColumn(f.name, columnFor(f, schema(f.source).dataType, zoneId))
    }

  /** Per-row evaluator over an InternalRow layout (the V2 row-level
    * writer): `ordinal`/`dt` locate the SOURCE column. */
  def rowEval(f: PartField, ordinal: Int, dt: DataType,
      zoneId: String): InternalRow => String = {
    val expr = exprFor(f, BoundReference(ordinal, dt, nullable = true), dt, zoneId)
    row => {
      val v = expr.eval(row)
      if (v == null) "__HIVE_DEFAULT_PARTITION__" else v.toString
    }
  }

  /** Render the partition value a source-column literal (CATALYST-
    * internal representation) falls into — the pruning primitive. None
    * when the transform cannot evaluate the value (pruning is then
    * skipped for that conjunct, never wrong). */
  def renderLiteral(f: PartField, internalValue: Any, dt: DataType,
      zoneId: String): Option[String] =
    try {
      val v = exprFor(f, Literal(internalValue, dt), dt, zoneId)
        .eval(InternalRow.empty)
      Option(v).map(_.toString)
    } catch { case _: Exception => None }
}
