package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k aggregator over (id, score) pairs — the one piece
  * of custom typed-aggregate machinery SURVEY.md §7.4 anticipates.
  *
  * Why not `row_number().over(Window)`: the window shuffles EVERY scored
  * pair to the query's reducer and sorts there — O(N) rows per query
  * cross the wire. A typed `Aggregator` runs as partial+final
  * aggregation, so each map task pre-reduces its slice to ≤ k entries
  * per query and the shuffle carries bounded heaps, not the score
  * matrix. At 100 TB candidates per query this is the difference
  * between a bounded shuffle and a broken stage.
  *
  * Ordering contract matches the window form exactly: score descending,
  * id ascending on ties — the heap's eviction comparator is the exact
  * inverse so the k survivors and their order agree bit-for-bit.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)], Array[(Long, Double)]] {

  // head = WORST element: lowest score first, then LARGEST id (ties
  // prefer smaller id, so the larger id must evict first)
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(
      buf: mutable.PriorityQueue[(Double, Long)],
      in: (Long, Double)): mutable.PriorityQueue[(Double, Long)] = {
    val cand = (in._2, in._1)
    if (buf.size < k) buf.enqueue(cand)
    else if (better(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { e =>
      if (a.size < k) a.enqueue(e)
      else if (better(e, a.head)) { a.dequeue(); a.enqueue(e) }
    }
    a
  }

  override def finish(buf: mutable.PriorityQueue[(Double, Long)]): Array[(Long, Double)] =
    buf.toArray
      .sortBy { case (s, id) => (-s, id) }
      .map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    Encoders.kryo[Array[(Long, Double)]]
}
