package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Lazy merge-on-read deletion-vector membership: TRUE iff `(file,
 * pos)` is marked deleted by the snapshot's deletion vectors.
 *
 * The pre-round-12 reader expanded EVERY sidecar in the snapshot into
 * a (file, pos) frame and anti-joined — O(total delete state) per
 * scan, however few files the scan actually read (a partition-pruned
 * read under 1,000 accumulated sidecars paid for all 1,000). This
 * filter instead carries only the file→sidecar-path map (tiny
 * metadata) and resolves positions EXECUTOR-SIDE through
 * [[graft.table.DvStore]]'s bounded per-JVM cache: one sidecar load
 * per data file a task actually reads, then a binary search per row —
 * the same per-file laziness the V2 `MorScan` reader already has
 * (the Iceberg positional-delete read shape), now on the V1
 * relation/merge-probe path too. No shuffle, no broadcast build, and
 * pruned scans pay only for the files they touch.
 *
 * Codegen-friendly: the generated code calls back into this
 * expression instance (a plan reference object); the per-row cost is
 * a hash-map probe plus a binary search, dwarfed by the sidecar-load
 * amortization it replaces.
 */
case class DvDeleted(
    left: Expression,                      // file NAME (string)
    right: Expression,                     // row position (long)
    sidecarByFile: Map[String, String],    // file name -> sidecar abs path
    conf: graft.table.SerializableConf)
  extends BinaryExpression with Predicate {

  override def prettyName: String = "dv_deleted"

  /** Row-level entry point shared by eval and codegen. */
  def deleted(file: UTF8String, pos: Long): Boolean =
    sidecarByFile.get(file.toString) match {
      case Some(sidecar) => graft.table.DvStore.contains(sidecar, conf.value, pos)
      case None          => false
    }

  override def nullSafeEval(file: Any, pos: Any): Any =
    deleted(file.asInstanceOf[UTF8String], pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, p) => {
      val self = ctx.addReferenceObj("dvDeleted", this,
        classOf[DvDeleted].getName)
      s"${ev.value} = $self.deleted($f, $p);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
