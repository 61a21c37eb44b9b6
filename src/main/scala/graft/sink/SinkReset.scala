package graft.sink

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** S6 — sink-collection lifecycle: truncate all snapshot tables, the
  * engine's equivalent of the reference's `reset_database.py`
  * (reset_database.py:18-35 drops the documents of all 8 MongoDB
  * collections). Here a table is a parquet directory under the sink
  * root; truncation = recursive delete + recreate of each table dir.
  */
object SinkReset {

  /** The 8 snapshot tables (reset_database.py:18-27). */
  val tables: Seq[String] = Seq(
    "summary_statistics", "anomalies", "age_group_distribution",
    "education_income", "gender_income", "work_hours",
    "occupation_stats", "raw_data")

  /** Truncate the given tables under `root` (all 8 by default).
    * Returns the per-table number of files removed, mirroring the
    * reference's per-collection deleted-count print (reset_database.py:31).
    */
  def reset(root: String, names: Seq[String] = tables): Map[String, Long] =
    names.map { name =>
      val dir = Paths.get(root, name)
      val removed = if (Files.exists(dir)) {
        var count = 0L
        val walk = Files.walk(dir)
        try
          walk.sorted(Comparator.reverseOrder[Path]())
            .forEach { p => if (Files.isRegularFile(p)) count += 1; Files.delete(p) }
        finally walk.close() // Files.walk holds directory handles open
        count
      } else 0L
      Files.createDirectories(dir)
      name -> removed
    }.toMap
}
