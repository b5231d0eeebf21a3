package graft.util

import org.apache.spark.sql.DataFrame

/** Rotating local-checkpoint bookkeeping for iterative operators.
  *
  * `Dataset.localCheckpoint()` materializes the frame into block-manager
  * storage, and nothing frees those blocks until the DRIVER garbage-
  * collects the underlying RDD object (ContextCleaner reacts to JVM GC;
  * its own periodic GC defaults to 30 min). An iterative operator that
  * checkpoints per round therefore keeps its ENTIRE generation history
  * alive for the lifetime of a long-running session. For the connected-
  * components loop the generation frame is corpus-sized (one label row
  * per document), so at production scale an unbounded while-loop holds
  * rounds × |corpus| rows of executor storage it will never read again.
  *
  * [[checkpoint]] eagerly materializes and records which persistent-RDD
  * ids back the frame; [[rotate]] checkpoints the next generation and
  * frees the previous one; [[free]] drops a generation's blocks.
  *
  * Contract: a freed generation is UNREADABLE (local checkpoints
  * truncate lineage — there is nothing to recompute from), so callers
  * only rotate once the next generation is materialized, which
  * [[rotate]] guarantees by checkpointing eagerly first. Id attribution
  * diffs the context's persistent-RDD registry around the checkpoint
  * call, so concurrent persists from OTHER driver threads can be
  * mis-attributed — all of this library's iterative loops are
  * single-threaded on the driver; revisit if that changes.
  */
object Lineage {

  /** A materialized generation: the checkpointed frame plus the
    * persistent-RDD ids holding its blocks. */
  final case class Gen(df: DataFrame, ids: Set[Int])

  /** Eagerly localCheckpoint `df` and record its block footprint. */
  def checkpoint(df: DataFrame): Gen = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    Gen(out, (sc.getPersistentRDDs.keySet -- before).toSet)
  }

  /** Checkpoint the next generation, then free the previous one. */
  def rotate(next: DataFrame, prev: Gen): Gen = {
    val out = checkpoint(next)
    free(prev)
    out
  }

  /** Drop a generation's blocks (non-blocking). The frame must not be
    * read again. */
  def free(g: Gen): Unit = {
    val reg = g.df.sparkSession.sparkContext.getPersistentRDDs
    g.ids.foreach(id => reg.get(id).foreach(_.unpersist(blocking = false)))
  }
}
