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

  /** Count of Window/WindowGroupLimit nodes evaluated on a SINGLE
    * partition — the shape behind Spark's "No Partition Defined for
    * Window operation" warning. Fine for provably bounded relations
    * (per-bin offset tables, contracted total orders); fatal for
    * corpus-scaling input. The discriminator is the FIRST Exchange in
    * the node's subtree: a global window's distribution is enforced
    * by an `Exchange SinglePartition` on its input path before any
    * other exchange, while a deeper SinglePartition in some join
    * branch (a 1-row global-count scalar, say) sits behind that
    * branch's own exchange and must NOT flag. Shares
    * aggFedBroadcasts' plan-string approach (AQE hides subtrees from
    * SparkPlan.collect) and its positive control in PlanShapeSpec. */
  def singlePartitionWindows(plan: String): Int = {
    val lines = plan.split("\n")
    def indent(l: String): Int = l.indexWhere(c => c != ' ' &&
      c != ':' && c != '+' && c != '-' && c != '*' && c != '(')
    lines.indices.count { i =>
      lines(i).matches(".*\\bWindow(GroupLimit)? \\[.*") && {
        val base = indent(lines(i))
        lines.drop(i + 1)
          .takeWhile(l => indent(l) > base)
          .find(_.contains("Exchange"))
          .exists(_.contains("Exchange SinglePartition"))
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
        val w = singlePartitionWindows(p)
        if (w > 0) println(s"[audit] $name: $w single-partition window(s)")
      } catch {
        case e: Throwable =>
          println(s"[audit] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
