package org.apache.spark.sql

import org.apache.spark.sql.internal.{SortOrder => SO}

/** Minimal `private[sql]`-access shim (the standard extension-library
  * technique): exact ORDER BY reversal needs to inspect a Column's
  * SortOrder node, which Spark 4 keeps `private[sql]`. Nothing else in
  * graft reaches into this namespace.
  */
object GraftSortShim {

  /** Reverse a sort column exactly: a plain column (implicitly ascending,
    * nulls first) becomes `.desc` (nulls last); a column carrying an
    * explicit direction/null-order has BOTH flipped at the node level —
    * naively appending `.desc` would double-wrap the SortOrder node and
    * fail analysis. */
  def reverse(c: Column): Column = c.node match {
    case so: SO =>
      val dir = so.sortDirection match {
        case SO.Ascending  => SO.Descending
        case SO.Descending => SO.Ascending
      }
      val nulls = so.nullOrdering match {
        case SO.NullsFirst => SO.NullsLast
        case SO.NullsLast  => SO.NullsFirst
      }
      Column(SO(so.child, dir, nulls))
    case _ => c.desc
  }
}
