package graft.tools

object ListNoOracle extends App {
  val q = graft.SparkEntry.queries.keySet
  val o = graft.SparkEntry.oracleSql.keySet
  println("total queries: " + q.size)
  println("oracled: " + o.size)
  println("no-oracle: " + (q -- o).toSeq.sorted.mkString(", "))
}
