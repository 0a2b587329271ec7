package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** Bridge to the `private[sql]` V2-Predicate → V1-Filter converter —
  * same extension-library pattern as [[ColumnBridge]]/[[ScanBridge]]. */
object PredicateBridge {
  def toV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)
}
