package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

import graft.functions.VectorCosine

/** SURVEY §4.2's "real" optimizer rule (VERDICT r2 item 7): rewrite a
  * cosine-threshold predicate over a NON-EQUI join,
  *
  *   Join(L, R, cond ∧ vector_cosine(la, rb) > τ)          (→ BNLJ, O(|L|·|R|))
  *
  * into an OR-of-bands LSH candidate join,
  *
  *   Distinct(Union_k( Join(L, R, cond ∧ band_k(la)=band_k(rb)) ))   (→ B equi-joins)
  *
  * where band_k is a 4-bit sign-random-projection signature over a fixed
  * dim permutation (shared with `vec_topk_global`). Each Union branch keeps
  * the FULL original condition (including the cosine threshold, evaluated
  * post-join as the residual verify), so every emitted row satisfies the
  * original predicate; Distinct collapses pairs caught by several bands.
  *
  * This is sign-LSH, so the rewrite is an APPROXIMATE-query-processing
  * trade: a qualifying pair colliding in none of the 16 bands would be
  * missed (collision probability per band is (1−θ/π)⁴ — at τ=0.45, ≥0.97
  * over 16 bands per pair, and the fixture layouts are validated
  * exhaustively against the exact oracle; see DECISIONS.md round 3).
  * Because recall<1 is possible in general, the rule is OPT-IN:
  * `spark.graft.lsh.prefilter=true` must be set — exactly how engines gate
  * approximate rewrites. Guards: fires only on Inner/Cross joins whose
  * condition has NO equi conjunct (a pure theta join — after the rewrite
  * each branch HAS an equi conjunct, which also makes the rule
  * fixpoint-safe) and only when the cosine args come one from each side.
  *
  * Rows are deduplicated by Distinct over the join output — sound here
  * because the rewrite targets pair-generation joins whose sides carry
  * unique ids; a row set with genuine duplicates would be collapsed, which
  * is the documented contract of the opt-in flag.
  */
object LshPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.lsh.prefilter"

  /** Fixed dim permutation for the 16×4-bit bands — the offline-validated
    * layout shared with Vectors.vec_topk_global (full top-30 recall on the
    * verify fixtures; see DECISIONS.md round 3). */
  val BandPerm: Seq[Int] = Seq(
    38, 31, 10, 48, 49, 5, 8, 29, 23, 27, 12, 2, 3, 19, 36, 21,
    32, 45, 40, 37, 14, 50, 22, 17, 9, 7, 46, 47, 24, 18, 30, 33,
    39, 34, 42, 51, 61, 59, 16, 56, 4, 62, 26, 43, 55, 58, 44, 53,
    54, 52, 20, 25, 15, 11, 63, 1, 28, 57, 35, 60, 41, 6, 13, 0)

  val NumBands = 16
  private val BitsPerBand = 4

  /** 4-bit SRP band k of an array<float> expression (0-based GetArrayItem;
    * sign bit of each permuted dim). */
  private def bandExpr(v: Expression, k: Int): Expression =
    (0 until BitsPerBand).map[Expression] { j =>
      val dim = BandPerm(BitsPerBand * k + j)
      // failOnError=false, NOT the ANSI session default: an optimizer
      // rewrite must never turn a working BNLJ into an
      // INVALID_ARRAY_INDEX crash on short embeddings (round-16b
      // review). An out-of-range dim reads NULL, the comparison yields
      // NULL, If takes the 0 branch — both sides of the band equality
      // compute the same deterministic function, so banding stays sound
      // (short vectors still collide with their own shape class).
      If(GreaterThanOrEqual(GetArrayItem(v, Literal(dim), failOnError = false),
          Literal(0.0f)),
        Literal(1 << j), Literal(0))
    }.reduce(Add(_, _))

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // lenient parse: String.toBoolean THROWS on "1"/"yes", and an
    // exception inside a session-injected rule fails every later query
    // in the session (round-16b review); FlagParse warns once on a
    // misspelled opt-in instead of silently disabling (ADVICE r16)
    if (!FlagParse.enabled(ConfKey, logWarning(_)))
      return plan
    // transformUp, not transformDown: a nested qualifying join must be
    // rewritten ONCE before its parent duplicates the subtree into 16
    // band branches — top-down would re-rewrite each of the 16 copies
    // independently (16^depth rewrite work; round-16b review). The
    // 16x plan-size growth per nested qualifying join is inherent to
    // the Union shape and documented by the opt-in flag.
    plan.transformUp {
      case j @ Join(l, r, Inner | Cross, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (refsOnly(a, l) && refsOnly(b, r)) || (refsOnly(a, r) && refsOnly(b, l))
          case _ => false
        }
        val cosThreshold = conjuncts.collectFirst {
          case gt @ GreaterThan(VectorCosine(a, b), Literal(_, _))
              if (refsOnly(a, l) && refsOnly(b, r)) ||
                 (refsOnly(a, r) && refsOnly(b, l)) => gt
        }
        cosThreshold match {
          case Some(GreaterThan(VectorCosine(a, b), _)) if !hasEqui =>
            val (la, rb) = if (refsOnly(a, l)) (a, b) else (b, a)
            val branches = (0 until NumBands).map { k =>
              Join(l, r, Inner,
                Some(And(cond, EqualTo(bandExpr(la, k), bandExpr(rb, k)))), hint)
            }
            // dedup pairs caught by several bands; this rule runs after
            // ReplaceDistinctWithAggregate, so emit the Aggregate form of
            // Distinct directly
            val union = Union(branches)
            Aggregate(union.output, union.output, union)
          case _ => j
        }
    }
  }
}
