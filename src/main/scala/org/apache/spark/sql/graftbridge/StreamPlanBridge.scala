package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Bridge to a running streaming query's last executed MICRO-BATCH plan.
  *
  * Batch-side plan pins read `df.queryExecution.executedPlan`; the
  * streaming equivalent lives on `StreamExecution.lastExecution` (an
  * `IncrementalExecution`), reachable only through the `private[sql]`
  * `StreamingQueryWrapper`. The plan-shape specs use this to assert
  * scale properties of per-batch plans — e.g. that the packaged source's
  * seek filter is PUSHED into each micro-batch's parquet scan rather
  * than evaluated above it (at 100 TB an unpushed seek re-reads the
  * whole retained stream every batch).
  */
object StreamPlanBridge {

  /** The last executed micro-batch physical plan, as a string; empty if
    * no batch has executed yet.
    */
  def lastExecutedPlan(q: StreamingQuery): String = q match {
    case w: StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan.toString).getOrElse("")
    case _ => ""
  }
}
