package graft
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { k =>
      val p = SparkEntry.queries(k)(spark, dir).queryExecution.executedPlan.toString
      println(s"=== $k singlePartitionWindows=${AuditBroadcast.singlePartitionWindows(p)} ===")
      p.split("\n").zipWithIndex.foreach { case (l, i) =>
        if (l.contains("Window ") || l.contains("Exchange SinglePartition")) println(f"$i%4d $l")
      }
    }
    spark.stop()
  }
}
