package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Reads data-movement volume out of an EXECUTED physical plan's SQLMetrics.
  *
  * Why: wall time tells you a query got slower; it cannot tell you a query
  * started MOVING more data. At bench scale (sf0.1) a lost broadcast or a
  * dropped partial aggregate may cost milliseconds and hide inside machine
  * noise — at 100 TB the same plan change is the difference between a job
  * that runs and one that dies in shuffle. Shuffle/broadcast bytes are
  * plan-determined and deterministic for a fixed dataset (unlike wall/cpu/
  * gc), so ANY cross-round drift without a code change is a real plan
  * regression, with zero noise floor.
  *
  * Mechanics: SQLMetrics are accumulators merged on the driver as each task
  * completes, and an action does not return until every task of its job has
  * completed — so after `df.collect()` the values read here are final, with
  * no listener-bus race. AQE rewrites the plan at runtime; the walk descends
  * through [[AdaptiveSparkPlanExec]] (into `executedPlan`) and leaf
  * [[QueryStageExec]] wrappers (into `plan`) so materialized stages are
  * visible. `ReusedExchangeExec` is a leaf pointing at an exchange counted
  * once at its original site — the walk does not follow it, so reuse never
  * double-counts.
  */
object PlanMetrics {

  /** Bytes moved through exchanges of an executed plan.
    *
    * @param shuffleWritten  sum of `shuffleBytesWritten` over all
    *                        [[ShuffleExchangeExec]] nodes (serialized,
    *                        possibly compressed, map-output bytes — the
    *                        cross-executor wire volume)
    * @param shuffleRecords  sum of `shuffleRecordsWritten` — row count
    *                        crossing exchanges; catches a lost partial agg
    *                        even when the byte delta is small
    * @param broadcastBytes  sum of `dataSize` over [[BroadcastExchangeExec]]
    *                        nodes — what every executor must hold resident.
    *                        CAVEAT: this is the built HashedRelation's
    *                        ALLOCATED memory, which is page-quantized — a
    *                        200-row relation with a non-long key reads as
    *                        one BytesToBytesMap page (~32 MB under local
    *                        big-memory task managers; measured identical at
    *                        sf0.001 and sf0.01), and long-keyed relations
    *                        read as the LongToUnsafeRowMap's ~1 MB initial
    *                        buffer. Valid to compare across rounds at a
    *                        fixed scale/config (the quantization is
    *                        deterministic); NOT valid to read small-relation
    *                        values as wire bytes or to extrapolate across
    *                        scales until the relation outgrows its first
    *                        page.
    */
  final case class ExchangeVolume(
      shuffleWritten: Long, shuffleRecords: Long, broadcastBytes: Long) {
    def +(o: ExchangeVolume): ExchangeVolume = ExchangeVolume(
      shuffleWritten + o.shuffleWritten,
      shuffleRecords + o.shuffleRecords,
      broadcastBytes + o.broadcastBytes)
  }

  private val Zero = ExchangeVolume(0L, 0L, 0L)

  /** All reachable nodes of an executed plan, descending through AQE
    * wrappers, query stages, and subquery expressions. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    // scalar/IN subqueries hang off expressions, not children
    p +: (nested ++ p.subqueries).flatMap(allNodes)
  }

  private def metric(p: SparkPlan, key: String): Long =
    p.metrics.get(key).map(_.value).getOrElse(0L)

  /** Exchange volume of an executed plan. Call AFTER an action has run the
    * DataFrame, or every metric reads zero. */
  def exchangeVolume(df: DataFrame): ExchangeVolume =
    allNodes(df.queryExecution.executedPlan).foldLeft(Zero) { (acc, node) =>
      node match {
        case _: ShuffleExchangeExec => acc + ExchangeVolume(
          metric(node, "shuffleBytesWritten"),
          metric(node, "shuffleRecordsWritten"), 0L)
        case _: BroadcastExchangeExec =>
          acc + ExchangeVolume(0L, 0L, metric(node, "dataSize"))
        case _ => acc
      }
    }
}
