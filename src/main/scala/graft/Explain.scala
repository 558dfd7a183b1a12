package graft

/** Diagnostic main: print a registered query's executed plan.
  * Usage: runMain graft.Explain <queryName> [sfDir] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local()
    val df = SparkEntry.queries(name)(spark, dir)
    // format "formatted" keeps codegen ids out so plans diff cleanly
    df.explain("formatted")
    spark.stop()
  }
}
