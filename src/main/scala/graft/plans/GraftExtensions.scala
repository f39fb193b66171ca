package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer extension: rewrite start-anchored-literal RLIKE
  * patterns to the cheap string predicate —
  *
  *   col RLIKE '^abc'   →  startswith(col, 'abc')
  *   col RLIKE '\Aabc'  →  startswith(col, 'abc')
  *
  * The pandas `.str.match(pat)` surface (reference string_mixin / pandas
  * str.match = re.match, i.e. start-anchored) produces exactly this shape;
  * Spark's own LikeSimplification covers LIKE but not RLIKE. The rewrite
  * only fires when the pattern body has no regex metacharacters, so
  * semantics are exact: `^` (non-MULTILINE) matches only at input start.
  * End-anchored patterns are deliberately NOT rewritten — Java regex `$`
  * also matches before a trailing '\n', so `endswith` would change results
  * on strings with trailing newlines (common in scraped text). The
  * resulting StartsWith is pushdown-eligible at the data source, which an
  * RLIKE never is — at 100 TB that converts a full scan into a pruned one.
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
        if (s.startsWith("^") && literalish(s.substring(1)))
          StartsWith(child, lit(s.substring(1)))
        else if (s.startsWith("\\A") && literalish(s.substring(2)))
          StartsWith(child, lit(s.substring(2)))
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
