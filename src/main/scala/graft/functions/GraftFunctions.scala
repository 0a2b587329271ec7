package graft.functions

import graft.functions.expressions.{CosineSimilarity, DotProduct, HashedShingleSet, L2Distance, MinHashSignature, SimHash64}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL-surface registration for the engine's native expressions, so
 * `spark.sql("SELECT vector_cosine(a, b) ...")` works — the analogue of
 * the reference's Lambda extension points (SURVEY §2.5, UDF row), but
 * as codegen-capable Catalyst expressions rather than black-box UDFs.
 *
 * Two registration paths:
 *  - [[GraftExtensions]] for `SparkSession.builder.withExtensions` /
 *    the `spark.sql.extensions` conf (cluster deployment);
 *  - [[GraftFunctions.register]] for an already-built session.
 */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("vector_dot", exprs => DotProduct(exprs(0), exprs(1))),
    ("vector_cosine", exprs => CosineSimilarity(exprs(0), exprs(1))),
    ("vector_l2_distance", exprs => L2Distance(exprs(0), exprs(1))),
    // text-hash family: hashed_shingles(text, n), minhash_signature(sh, k),
    // simhash64(text) — the dedup pipeline's kernels, SQL-callable
    ("hashed_shingles", exprs =>
      HashedShingleSet(exprs(0), intLit(exprs(1), "shingleLen"))),
    ("minhash_signature", exprs =>
      MinHashSignature(exprs(0), intLit(exprs(1), "numHashes"))),
    ("simhash64", exprs => SimHash64(exprs(0))))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
  }

  private[functions] def inject(e: SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.expressions", name), builder))
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
