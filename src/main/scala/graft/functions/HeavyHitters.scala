package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a partial-aggregable
  * Aggregator — the mergeable-summaries path for frequency tables at
  * cluster scale: each partition ships a ≤`capacity`-entry summary
  * instead of its full vocabulary, so the shuffle is O(partitions ×
  * capacity) regardless of corpus size (an exact word count shuffles
  * the whole vocabulary; fine for words, fatal for n-grams/URLs).
  *
  * Guarantees (Misra–Gries / mergeable summaries, Agarwal et al.,
  * TODS 2013): every item with true frequency > n/(capacity+1)
  * survives, and each reported count is an undercount by at most
  * n/(capacity+1). When the true item-type count never exceeds
  * `capacity`, no truncation ever fires anywhere and the sketch is
  * EXACT — which is what makes the registered query oracle-stable:
  * approximate counts after truncation depend on merge order, so
  * they can differ across partitionings; exact ones cannot.
  */
object HeavyHitters {

  /** One reported item. */
  case class Hit(word: String, cnt: Long)

  final class MisraGries(capacity: Int)
      extends Aggregator[String, mutable.HashMap[String, Long],
        Seq[Hit]] {

    override def zero: mutable.HashMap[String, Long] =
      mutable.HashMap.empty

    override def reduce(b: mutable.HashMap[String, Long], w: String)
        : mutable.HashMap[String, Long] = {
      b.update(w, b.getOrElse(w, 0L) + 1L)
      if (b.size > capacity) trim(b)
      b
    }

    override def merge(a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long])
        : mutable.HashMap[String, Long] = {
      b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
      if (a.size > capacity) trim(a)
      a
    }

    /** Subtract the (capacity+1)-th largest count from every entry
      * and drop the non-positive ones — the standard mergeable-MG
      * step; leaves ≤ capacity entries. */
    private def trim(b: mutable.HashMap[String, Long]): Unit = {
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val dead = Seq.newBuilder[String]
      b.foreach { case (k, v) =>
        if (v - sub <= 0L) dead += k else b.update(k, v - sub)
      }
      dead.result().foreach(b.remove)
    }

    override def finish(b: mutable.HashMap[String, Long]): Seq[Hit] =
      b.iterator.map { case (k, v) => Hit(k, v) }.toSeq
        .sortBy(h => (-h.cnt, h.word))

    override def bufferEncoder
        : Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]

    override def outputEncoder: Encoder[Seq[Hit]] =
      ExpressionEncoder[Seq[Hit]]()
  }

  /** Column form: `heavyHitters(64)(col("w"))` aggregates a string
    * column into the sorted hit array. */
  def heavyHitters(capacity: Int): Column => Column =
    w => udaf(new MisraGries(capacity), Encoders.STRING).apply(w)
}
