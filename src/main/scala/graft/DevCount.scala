package graft
object DevCount { def main(a: Array[String]): Unit = {
  println(s"[count] queries=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size} bench=${SparkEntry.benchQueries.size}") } }
