package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point — the reference's literal command-line workflow
  * (map2db.py:1535-1547): `graft.Main <src.map> [dst.db]`. Validates
  * the `.map` suffix, defaults the destination to `<src minus
  * .map>.db`, runs the full decode→merge→sink pipeline (the RFC16
  * parquet directory at `<dst>.d` plus the single-file SQLite `<dst>`
  * — the reference's deliverable), and prints the extracted
  * license/README statement after the build (the map2db.py:1520-1532
  * courtesy print: a user must see the map's ODbL/copyright text on
  * the console, not only inside the database). */
object Main {

  /** Argument validation, separated for spec coverage: same errors
    * and default-destination rule as the reference `__main__`. */
  def parseArgs(args: Array[String]): (String, String) = {
    require(args.nonEmpty, "map pathname not provided")
    val src = args(0)
    require(src.endsWith(".map"),
      s"$src does not appear to be a mapsforge map file")
    val dst = if (args.length >= 2) args(1) else src.dropRight(4) + ".db"
    (src, dst)
  }

  /** Run the workflow; `out` receives the courtesy prints (stdout in
    * [[main]], a capture buffer in the spec). */
  def run(spark: SparkSession, src: String, dst: String,
      out: String => Unit = println): Unit = {
    val header = sources.Mapsforge.readHeader(src)
    sources.FdoSink.map2db(spark, src, dst + ".d", Some(dst))
    val (desc, text) = sources.FdoSink.readmeRows(header, src).head
    out(s"\ndatabase written to '$dst'")
    out("\nThe following is also in the README table of the database:")
    out("Description: \"\"\"\n" + desc + "\n\"\"\"")
    out("Text: \"\"\"\n" + text + "\n\"\"\"")
  }

  def main(args: Array[String]): Unit = {
    val (src, dst) = parseArgs(args)
    val spark = Sessions.local()
    try run(spark, src, dst) finally spark.stop()
  }
}
