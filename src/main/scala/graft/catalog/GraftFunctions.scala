package graft.catalog

import graft.table.{PartField, PartitionTransform}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * The catalog's V2 partition-transform FUNCTIONS — the piece that makes
 * storage-partitioned joins work over hidden partitioning, exactly as
 * Iceberg ships `system.bucket`/`days`/… . When a scan reports
 * `KeyGroupedPartitioning(bucket(16, id))`, Spark's
 * `V2ScanPartitioningAndOrdering` rule resolves the transform against
 * the relation's catalog AS A FUNCTION (`FunctionCatalog.loadFunction`)
 * — no function, no key-grouped partitioning, no shuffle elision. The
 * bound functions evaluate through the very same
 * [[PartitionTransform.exprFor]] expressions the write path and the
 * pruner use, and return the STRING partition rendering, so the typed
 * partition-key rows the scan reports ([[org.apache.spark.sql.graft
 * .SnapshotFileIndex.partitionKeyFor]]) are exactly this function's
 * output domain.
 */
object GraftFunctions {

  /** plural SQL-transform name → spec transform name */
  private val DateFns =
    Map("years" -> "year", "months" -> "month", "days" -> "day",
      "hours" -> "hour")

  val names: Seq[String] = (DateFns.keys.toSeq :+ "bucket") :+ "truncate"

  def load(name: String): Option[UnboundFunction] = {
    val n = name.toLowerCase
    if (DateFns.contains(n) || n == "bucket" || n == "truncate")
      Some(new TransformFn(n))
    else None
  }

  /** Bound at analysis on the driver: capture the session zone then so
    * executor-side evaluation renders identically to the write path. */
  private final class TransformFn(fname: String) extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"graft hidden-partitioning transform $fname"

    override def bind(inputType: StructType): BoundFunction = {
      val zone = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
      val fields = inputType.fields
      val (srcOrd, paramOrd) = fname match {
        case "bucket" | "truncate" =>
          require(fields.length == 2,
            s"$fname(n, col) expects 2 arguments, got ${fields.length}")
          require(fields(0).dataType == IntegerType,
            s"$fname(n, col): first argument must be INT, got ${fields(0).dataType}")
          (1, Some(0))
        case _ =>
          require(fields.length == 1,
            s"$fname(col) expects 1 argument, got ${fields.length}")
          (0, None)
      }
      val srcDt = fields(srcOrd).dataType
      val transform = DateFns.getOrElse(fname, fname)
      new ScalarFunction[UTF8String] {
        override def inputTypes(): Array[DataType] = fields.map(_.dataType)
        override def resultType(): DataType = StringType
        override def name(): String = fname
        override def canonicalName(): String = s"graft.$fname"
        // one compiled evaluator per distinct param value (the param is
        // an argument ROW value, though in practice a constant literal)
        @transient private lazy val cache =
          scala.collection.mutable.Map.empty[Int, InternalRow => Any]
        private def evaluator(param: Int): InternalRow => Any = {
          val f = PartField("p", transform, "s", param)
          val expr = PartitionTransform.exprFor(f,
            BoundReference(srcOrd, srcDt, nullable = true), srcDt, zone)
          row => expr.eval(row)
        }
        override def produceResult(input: InternalRow): UTF8String = {
          if (input.isNullAt(srcOrd)) return null
          val param = paramOrd.map(input.getInt).getOrElse(0)
          cache.synchronized {
            cache.getOrElseUpdate(param, evaluator(param))
          }(input).asInstanceOf[UTF8String]
        }
      }
    }
  }
}
