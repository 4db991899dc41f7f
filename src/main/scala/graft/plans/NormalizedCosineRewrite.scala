package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarity, DotProduct, L2Normalize}

/** Catalyst optimizer rule: cosine over two L2-NORMALIZED inputs is a
  * plain dot product —
  * `cos_sim(l2_normalize(a), l2_normalize(b)) → dot_product(...)` —
  * saving 2/3 of the multiply-adds and both sqrts per scored row. On a
  * pre-normalized 100 TB corpus this is the difference between the
  * ingest-time normalization paying off at query time or being thrown
  * away by a kernel that re-derives both norms per row (which is what
  * the reference does per query, `vectorDb.ts:38-44`).
  *
  * Exactness: the rewrite preserves the documented edge semantics
  * bit-for-bit — zero vectors (l2_normalize(0) = 0 ⇒ both sides 0.0),
  * dimension mismatch (both −1.0), null elements (both NULL). On
  * regular vectors the normalized norms are 1 ± 1 ulp rather than
  * exactly 1, so values may drift in the last ulps — the same accepted
  * magnitude as cross-engine reduction-order drift, absorbed by the
  * project-wide round-6 contract (asserted in the spec).
  *
  * Injection: `spark.sql.extensions=graft.GraftExtensions` installs it
  * session-wide; on a live session use
  * `spark.experimental.extraOptimizations`.
  *
  * Comparison-consistency caveat: because the rewrite moves values by
  * last-ulp amounts, a score computed WITH the rule can round-6 (or
  * rank) differently from one computed WITHOUT it on a near-boundary
  * input. Any verify/bench comparison must therefore run the same
  * extension configuration on both sides — the repo's Verify and Bench
  * sessions deliberately build PLAIN sessions (rule inactive) to match
  * the rule-free DuckDB oracle; a production deployment that installs
  * the extension should validate against baselines produced with it
  * installed.
  */
object NormalizedCosineRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a @ L2Normalize(_), b @ L2Normalize(_)) =>
        DotProduct(a, b)
    }
}
