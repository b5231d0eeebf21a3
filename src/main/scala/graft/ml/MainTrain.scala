package graft.ml

import graft.etl.EnginePaths
import graft.util.Sessions

/** Training entry point mirroring
  * `/root/reference/src/pipeline/main_train.py:37-66`: read the curated
  * parquet layer (partition discovery over pickup_date dirs), train,
  * report metrics + wall-clock.
  */
object MainTrain {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_etl")
    val paths = EnginePaths.under(root)
    val spark = Sessions.get("nyc-taxi-train")
    try {
      val t0 = System.nanoTime()
      val curated = spark.read.parquet(paths.curated)
      val (_, m) = Trainer.trainFareModel(curated, paths.model)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[ML] RMSE: ${m.rmse}%.4f  |  MAE: ${m.mae}%.4f")
      println(f"[ML] train rows: ${m.trainRows}  test rows: ${m.testRows}")
      println(f"[ML] total: $secs%.2f s")
    } finally spark.stop()
  }
}
