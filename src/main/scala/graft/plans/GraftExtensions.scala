package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer extension: rewrite anchored-literal RLIKE patterns to
  * their cheap string-predicate forms —
  *
  *   col RLIKE '^abc$'  →  col = 'abc'
  *   col RLIKE '^abc'   →  startswith(col, 'abc')
  *   col RLIKE 'abc$'   →  endswith(col, 'abc')
  *
  * The pandas `.str.match(pat)` surface (reference string_mixin / pandas
  * str.match = re.match, i.e. start-anchored) encourages exactly these
  * patterns; Spark's own LikeSimplification covers LIKE but not RLIKE. The
  * rewrite only fires when the pattern body has no regex metacharacters, so
  * semantics are exact; the resulting StartsWith/EqualTo are
  * pushdown-eligible at the data source, which an RLIKE never is — at
  * 100 TB that converts a full scan into a pruned one.
  */
object RegexAnchorSimplification extends Rule[LogicalPlan] {

  /** Characters that mean themselves in a Java regex. */
  private def literalish(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || " #@_-,:/".contains(c))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case r @ RLike(child, Literal(p: UTF8String, StringType)) =>
        val s = p.toString
        def lit(x: String) = Literal(UTF8String.fromString(x), StringType)
        if (s.length >= 2 && s.startsWith("^") && s.endsWith("$") &&
            literalish(s.substring(1, s.length - 1)))
          EqualTo(child, lit(s.substring(1, s.length - 1)))
        else if (s.startsWith("^") && literalish(s.substring(1)))
          StartsWith(child, lit(s.substring(1)))
        else if (s.endsWith("$") && literalish(s.substring(0, s.length - 1)))
          EndsWith(child, lit(s.substring(0, s.length - 1)))
        else r
    }
}

/** Cluster deployment entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftSparkExtensions` installs
  * the optimizer rule and every graft_* SQL function into each new session
  * — the SparkSessionExtensions spelling of what
  * `graft.functions.SqlFunctions.register` does for a live session.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RegexAnchorSimplification)
    graft.functions.SqlFunctions.injectInto(ext)
  }
}
