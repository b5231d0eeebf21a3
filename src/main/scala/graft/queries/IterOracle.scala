package graft.queries

/** An oracle the DuckDB instrument must run as a SCRIPT rather than one
  * statement: `setup` once, then `loop` until `fixpoint`'s scalar stops
  * changing (or `maxRounds`, matching the single-statement spelling's
  * unroll bound), then `finalSql` produces the gate's result table.
  * Dumped by [[graft.Verify]] as `oracle_iter.json`; tools/check.py
  * prefers it over the single-statement oracle for the same gate. The
  * DRIVER's own gate still runs the single-statement `oracleSql` entry
  * (it executes one SQL string per gate at sf0.01, where the unrolled
  * spelling is cheap) — this exists so the LOCAL sf1 sweep can check
  * the same oracle without materializing every round at once.
  */
final case class IterOracle(
    setup: Seq[String],
    loop: Seq[String],
    fixpoint: String,
    maxRounds: Int,
    finalSql: String,
)
