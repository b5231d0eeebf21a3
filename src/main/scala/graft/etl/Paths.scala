package graft.etl

/** Layer paths for the raw→curated→agg pipeline + model artifacts.
  * Replaces the reference's module constants
  * (`/root/reference/src/gcs/paths.py:1-4`) with a config value: local
  * `file://` paths for tests, `gs://`/`s3://` in production.
  */
final case class EnginePaths(
    raw: String,
    curated: String,
    aggTripsByHour: String,
    model: String,
)

object EnginePaths {
  /** Conventional layout under a single root directory. */
  def under(root: String): EnginePaths = EnginePaths(
    raw = s"$root/raw/yellow_tripdata.csv",
    curated = s"$root/curated/yellow_tripdata",
    aggTripsByHour = s"$root/agg/trips_by_hour",
    model = s"$root/models/fare_model",
  )
}
