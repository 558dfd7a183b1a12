package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Grouped top-k as a partial-aggregable bounded heap
  * (SURVEY.md §2a).
  *
  * The window formulation (`row_number over (partition by k order by
  * s) <= n`) must sort EVERY row of every group; this aggregator
  * keeps a k-bounded heap per group, combines map-side, and ships at
  * most k entries per group per partition through the shuffle. At
  * 100 TB that is the difference between shuffling the fact table
  * and shuffling k·|keys| rows. A custom SparkPlan could do the same
  * work, but an Aggregator already gets partial aggregation from the
  * engine — preferred per the custom-operator ladder (SURVEY §4).
  *
  * Ordering: descending score, ascending id as tiebreak —
  * deterministic for any input order.
  */
object TopK {

  case class Entry(score: Double, id: Long)

  /** Buffer/result: sorted (desc score, asc id) entries, at most k.
    * A case class because typed Aggregator buffers encode as
    * Products — so the heap travels through Tungsten rows, not Java
    * serialization. */
  case class Top(entries: Seq[Entry])

  class TopKAgg(k: Int) extends Aggregator[Entry, Top, Top] {
    private def beats(a: Entry, b: Entry): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    override def zero: Top = Top(Vector.empty)
    override def reduce(buf: Top, e: Entry): Top =
      // buf is sorted, so the common case (e loses to a full buffer)
      // is one comparison against the current cutoff
      if (buf.entries.size >= k && beats(buf.entries.last, e)) buf
      else Top((buf.entries :+ e).sortWith(beats) take k)
    override def merge(a: Top, b: Top): Top =
      Top((a.entries ++ b.entries).sortWith(beats) take k)
    override def finish(buf: Top): Top = buf
    override def bufferEncoder: Encoder[Top] = Encoders.product[Top]
    override def outputEncoder: Encoder[Top] = Encoders.product[Top]
  }

  /** String-tagged variant for (count, term) rankings: descending
    * score, ascending tag as tiebreak. Same bounded-heap shape, used
    * where the ranked payload is a term (t05 top bigrams) rather than
    * a numeric id. */
  case class SEntry(score: Long, tag: String)
  case class STop(entries: Seq[SEntry])

  class TopKStrAgg(k: Int) extends Aggregator[SEntry, STop, STop] {
    private def beats(a: SEntry, b: SEntry): Boolean =
      a.score > b.score || (a.score == b.score && a.tag < b.tag)
    override def zero: STop = STop(Vector.empty)
    override def reduce(buf: STop, e: SEntry): STop =
      if (buf.entries.size >= k && beats(buf.entries.last, e)) buf
      else STop((buf.entries :+ e).sortWith(beats) take k)
    override def merge(a: STop, b: STop): STop =
      STop((a.entries ++ b.entries).sortWith(beats) take k)
    override def finish(buf: STop): STop = buf
    override def bufferEncoder: Encoder[STop] = Encoders.product[STop]
    override def outputEncoder: Encoder[STop] = Encoders.product[STop]
  }

  /** q15: top-3 lineitems by extended price per supplier — grouped
    * top-k without a per-group full sort. */
  def q15GroupedTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 3
    val agg = new TopKAgg(k)
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_suppkey"),
        struct(col("l_extendedprice").as("score"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
          .as("entry"))
      .as[(Long, Entry)]
    li.groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("top"))
      .toDF("l_suppkey", "top")
      .select(col("l_suppkey"), posexplode(col("top.entries")))
      .select(col("l_suppkey"), (col("pos") + 1).as("rank"),
        col("col.score").as("price"), col("col.id").as("line_id"))
      .orderBy(col("l_suppkey"), col("rank"))
  }

  val q15Sql: String =
    """SELECT l_suppkey, rank, price, line_id FROM (
      |  SELECT l_suppkey,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC,
      |        l_orderkey * 10 + l_linenumber) AS rank,
      |    l_extendedprice AS price,
      |    l_orderkey * 10 + l_linenumber AS line_id
      |  FROM lineitem)
      |WHERE rank <= 3
      |ORDER BY l_suppkey, rank""".stripMargin
}
