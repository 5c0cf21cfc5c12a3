package graft.tools

/** Dev tool: print the gate/oracle counts (keeps COVERAGE.md's header
  * honest against the actual SparkEntry surface). */
object CountGates {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"gates=${q.size} oracles=${o.size} benchOnly=${graft.queries.Pipeline.benchOnly.size}")
    val missing = q -- o
    if (missing.nonEmpty) println(s"gates without oracle: ${missing.toSeq.sorted.mkString(",")}")
    val orphan = o -- q
    if (orphan.nonEmpty) println(s"oracles without gate: ${orphan.toSeq.sorted.mkString(",")}")
  }
}
