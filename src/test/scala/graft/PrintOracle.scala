package graft

/** Print one gate's DuckDB oracle SQL — pair with [[GateDrive]] for a
  * local single-gate parity check:
  * `sbt "Test/runMain graft.PrintOracle <gate>" | grep -v '^\\[' > q.sql`. */
object PrintOracle {
  def main(args: Array[String]): Unit =
    println(queries.Catalog.oracleSql(args(0)))
}
