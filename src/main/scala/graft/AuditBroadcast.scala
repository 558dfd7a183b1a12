package graft

/** Diagnostic main: list registered queries whose plan BROADCASTS an
  * aggregate-derived relation. Catalyst has no stats for
  * post-aggregation outputs, so it guesses small — right for bounded
  * relations (top-K heads, codebooks, per-source rate tables), fatal
  * for corpus-scaling ones (the t11/d16 class of bug). Works on the
  * plan STRING because AQE's AdaptiveSparkPlanExec hides its subtree
  * from SparkPlan.collect. Output is a worklist for human triage,
  * not an assertion. */
object AuditBroadcast {

  /** Count of BroadcastExchange nodes whose subtree (all following
    * lines more indented than the node) contains an Aggregate —
    * i.e. statless builds Catalyst guessed small. Shared with the
    * PlanShapeSpec pins. */
  def aggFedBroadcasts(plan: String): Int = {
    val lines = plan.split("\n")
    def indent(l: String): Int = l.indexWhere(c => c != ' ' &&
      c != ':' && c != '+' && c != '-' && c != '*' && c != '(')
    lines.indices.count { i =>
      lines(i).contains("BroadcastExchange") && {
        val base = indent(lines(i))
        lines.drop(i + 1)
          .takeWhile(l => indent(l) > base)
          .exists(_.contains("Aggregate"))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.local()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val n = aggFedBroadcasts(p)
        if (n > 0) println(s"[audit] $name: $n aggregate-fed broadcast(s)")
      } catch {
        case e: Throwable =>
          println(s"[audit] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
