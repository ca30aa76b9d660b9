package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-exact aggregation of ≤4-decimal-place double columns via scaled
  * BIGINT sums (the o34 hash-stability convention, constant-factor form).
  *
  * Why not double sums: partial-aggregation order differs across engines
  * and runs, and a last-ulp difference on a rounding boundary flips a
  * rounded hash. Why not decimal sums: Spark's Decimal aggregate path is
  * object-based (no primitive codegen) and costs a constant factor on
  * every row. A ≤4-dp value times 10⁴ is an integer, so `round(x*1e4)`
  * is exact, the BIGINT sum is exact and order-independent, and
  * `CAST(sum AS DOUBLE)/1e4` equals the decimal-sum-cast-double result
  * bit for bit while staying in primitive whole-stage codegen.
  *
  * Headroom: |Σ x·1e4| must stay < 2⁶³ (values ≤1e6 → ~9e8 rows per
  * group at worst); beyond that fall back to the decimal form. SQUARED
  * columns burn headroom quadratically — x ≈ 1e4 gives 1e12 per row and
  * overflows at ~9e6 rows per group, so global aggregates of squares
  * (o50) and full-precision metrics (softmax features in ActFeatures,
  * which also need >4 dp) use DECIMAL(28,8) instead; ssum4 on squares is
  * reserved for small bounded values like l_quantity (o35). Overflow is
  * SILENT divergence (Spark sum(long) wraps, DuckDB promotes to
  * HUGEINT) — pick the form by worst-case group size, not testdata.
  * Both engine and oracle twins MUST use the same formula — the division
  * is one IEEE op so lockstep twins are bit-identical.
  */
object ExactAgg {
  /** Exact Σx for a ≤4-dp column, as DOUBLE (= decimal-sum cast double). */
  def ssum4(c: Column): Column =
    sum(round(c * 10000).cast("long")).cast("double") / 10000.0
  // parenthesized: embedded in larger arithmetic (sx*sx/n) the division
  // must bind exactly like the Column tree or the IEEE rounding order —
  // and hence the hash — diverges in the last ulp
  def ssum4Sql(e: String): String =
    s"(CAST(sum(CAST(round(($e) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0)"
}
