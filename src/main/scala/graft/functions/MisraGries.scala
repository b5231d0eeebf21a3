package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a mergeable typed Aggregator —
  * the sketch half of the sketch-then-verify heavy-hitter pipeline
  * ([[graft.ops.TextAnalysis.heavyHitters]]).
  *
  * Why a sketch at all: an exact "top tokens" group-by shuffles every
  * distinct token in the corpus — at 100 TB the vocabulary (URLs, ids,
  * typos) is billions of keys and the shuffle IS the job. Misra–Gries
  * keeps a fixed `capacity`-entry summary per map task; partial
  * aggregation merges summaries, so only O(maps × capacity) entries ever
  * cross the wire — corpus-size-independent.
  *
  * Guarantee (Misra & Gries 1982; merge form Agarwal et al. 2012): every
  * token with true frequency > N/(capacity+1) survives in the merged
  * summary, and each kept estimate undercounts by at most N/(capacity+1).
  * Callers size `capacity >> k` for the intended top-k so the survivor
  * set is a superset of the true top-k under any Zipf-like distribution;
  * the verify pass then recounts survivors exactly, so sketch error never
  * reaches the reported numbers.
  *
  * The buffer is a mutable map updated in place: on the Zipf long tail
  * nearly every input arrives with the summary full, so an immutable
  * rebuild per miss would allocate O(capacity) in the hottest per-row
  * path. The in-place decrement still does O(live entries) work on a
  * miss, but that is bounded by the increments it cancels (the classic
  * amortization) and allocates nothing.
  *
  * `finish` returns the surviving tokens ordered by estimate descending
  * (token ascending on ties) — deterministic, and keys-only because the
  * estimates are intentionally not for consumption.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Array[String]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(
      b: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
    b.get(x) match {
      case Some(c) => b.update(x, c + 1L)
      case None if b.size < capacity => b.update(x, 1L)
      case None =>
        // classic decrement-all step: a miss at capacity pays one count
        // from every tracked token; zeros drop out
        b.mapValuesInPlace((_, v) => v - 1L)
        b.filterInPlace((_, v) => v > 0L)
    }
    b
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from all and drop
      // non-positives — the mergeable-summaries trim, which preserves
      // the undercount bound additively
      val cut = a.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      a.mapValuesInPlace((_, v) => v - cut)
      a.filterInPlace((_, v) => v > 0L)
    }
    a
  }

  override def finish(b: mutable.HashMap[String, Long]): Array[String] =
    b.toArray.sortBy { case (k, v) => (-v, k) }.map(_._1)

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
