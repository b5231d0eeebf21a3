package graft.functions

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
  * `finish` returns the surviving tokens ordered by estimate descending
  * (token ascending on ties) — deterministic, and keys-only because the
  * estimates are intentionally not for consumption.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < capacity => b.updated(x, 1L)
      case None =>
        // classic decrement-all step: a miss at capacity pays one count
        // from every tracked token (amortized O(1) per input via the
        // zero-removals; at most N/(capacity+1) total decrements each)
        b.flatMap { case (k, v) => if (v > 1L) Some(k -> (v - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest count from all and drop
      // non-positives — the mergeable-summaries trim, which preserves
      // the undercount bound additively
      val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      combined.flatMap { case (k, v) =>
        if (v - cut > 0L) Some(k -> (v - cut)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Array[String] =
    b.toArray.sortBy { case (k, v) => (-v, k) }.map(_._1)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
