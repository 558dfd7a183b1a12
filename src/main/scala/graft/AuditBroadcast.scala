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

  /** True when the Window/WindowGroupLimit node line itself declares
    * non-empty PARTITION BY keys. The first argument of a
    * `windowspecdefinition(part..., order..., frame)` is a partition
    * key unless it carries a sort direction (then the partition list
    * is empty and it is an order key) or is the frame itself; a
    * WindowGroupLimit line has no spec but prints its partition keys
    * as the first bracket group, order keys always carrying
    * ASC/DESC. (ADVICE r16: keying on the first Exchange in PRINT
    * order flagged d47's q_id-partitioned windows because a bounded
    * scalar branch's SinglePartition printed first — a window with
    * partition keys is never global, whatever prints below it.) */
  def windowLineIsPartitioned(line: String): Boolean = {
    val spec = line.indexOf("windowspecdefinition(")
    if (spec >= 0) {
      val argStart = spec + "windowspecdefinition(".length
      var depth = 0
      var i = argStart
      while (i < line.length &&
          !(depth == 0 && (line(i) == ',' || line(i) == ')'))) {
        if (line(i) == '(') depth += 1
        else if (line(i) == ')') depth -= 1
        i += 1
      }
      val first = line.substring(argStart, i)
      !(first.contains(" ASC") || first.contains(" DESC") ||
        first.trim.startsWith("specifiedwindowframe"))
    } else {
      val b0 = line.indexOf('[')
      val e0 = if (b0 >= 0) line.indexOf(']', b0) else -1
      b0 >= 0 && e0 > b0 + 1 && {
        val first = line.substring(b0 + 1, e0)
        !(first.contains(" ASC") || first.contains(" DESC"))
      }
    }
  }

  /** Count of Window/WindowGroupLimit nodes evaluated on a SINGLE
    * partition — the shape behind Spark's "No Partition Defined for
    * Window operation" warning. Fine for provably bounded relations
    * (per-bin offset tables, contracted total orders); fatal for
    * corpus-scaling input. A node flags when its own line declares NO
    * partition keys ([[windowLineIsPartitioned]]) AND its input path
    * shows the single-partition funnel: either the first Exchange in
    * its subtree is `Exchange SinglePartition`, or NO exchange
    * appears at all (the global requirement was satisfied trivially —
    * e.g. a one-partition checkpointed LogicalRDD, the d47-class trap
    * r16 hit). Partitioned windows never flag, whatever prints below
    * them (the d47 false positive). Shares aggFedBroadcasts'
    * plan-string approach (AQE hides subtrees from SparkPlan.collect)
    * and its positive controls in PlanShapeSpec. */
  def singlePartitionWindows(plan: String): Int = {
    val lines = plan.split("\n")
    def indent(l: String): Int = l.indexWhere(c => c != ' ' &&
      c != ':' && c != '+' && c != '-' && c != '*' && c != '(')
    lines.indices.count { i =>
      lines(i).matches(".*\\bWindow(GroupLimit)? \\[.*") &&
        !windowLineIsPartitioned(lines(i)) && {
          val base = indent(lines(i))
          lines.drop(i + 1)
            .takeWhile(l => indent(l) > base)
            .find(_.contains("Exchange"))
            .forall(_.contains("Exchange SinglePartition"))
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
