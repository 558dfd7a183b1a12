package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contract of [[Verify.materializeCtes]], the emission-time
  * rewrite that keeps the DuckDB oracle pass linear (round 6 shipped
  * an EMPTY correctness report because the un-hinted chained-CTE
  * oracles ran ~11 minutes and the driver's verify step died).
  */
class OracleSqlSpec extends AnyFunSuite {

  test("CTE definitions get MATERIALIZED hints") {
    val sql = "WITH a AS (SELECT 1), b AS (SELECT * FROM a)\n" +
      "SELECT * FROM a JOIN b USING (x)"
    val out = Verify.materializeCtes(sql)
    assert(out.contains("WITH a AS MATERIALIZED (SELECT 1)"))
    assert(out.contains("b AS MATERIALIZED (SELECT * FROM a)"))
  }

  test("named-window clauses are NOT rewritten") {
    val sql = "SELECT sum(x) OVER w FROM t WINDOW w AS (PARTITION BY k)"
    assert(Verify.materializeCtes(sql) == sql)
  }

  test("column aliases and subquery aliases are NOT rewritten") {
    val sql = "SELECT a AS b, (SELECT 1) AS c FROM (SELECT 2 AS d) t"
    assert(Verify.materializeCtes(sql) == sql)
  }

  test("no registered oracle declares comma-separated named windows") {
    // the `),\s*name AS (` half of the rewrite would also match a
    // SECOND window in `WINDOW a AS (...), b AS (...)` — keep that
    // shape out of builder SQL (split the windows across subqueries
    // or inline one) so the rewrite stays CTE-only
    // immediate adjacency only: `WINDOW a AS (<no nested parens>),
    // b AS (` — a window spec whose closing paren is followed by
    // another definition. A window INSIDE a CTE followed by the next
    // CTE (`...WINDOW w AS (...))\n, next AS (`) is fine: that comma
    // is a real CTE boundary and SHOULD be hinted (s02/s07's shape).
    // the SAME guard Verify.main runs at dump time (shared regex —
    // a drifting copy here would let a bad oracle through emission)
    Verify.assertRewriteSafe(SparkEntry.oracleSql)
    // and the dump-time guard actually rejects the bad shape
    val bad = Map("x" ->
      "SELECT sum(a) OVER w1, sum(b) OVER w2 FROM t WINDOW w1 AS (PARTITION BY k), w2 AS (ORDER BY t)")
    assertThrows[IllegalArgumentException] {
      Verify.assertRewriteSafe(bad)
    }
  }

  test("every WITH-bearing oracle gains at least one hint") {
    val missed = SparkEntry.oracleSql.collect {
      case (k, sql) if sql.toUpperCase.contains("WITH ") &&
        !Verify.materializeCtes(sql).contains("MATERIALIZED") => k
    }
    assert(missed.isEmpty, s"CTE oracles left un-hinted: $missed")
  }
}
