package graft

/** Engine-wide Spark tuning shared by every entry point (Bench, Verify,
  * Explain, smoke mains, test harness). */
object EngineConf {

  /** `InferFiltersFromGenerate` inserts a `size(input) > 0 AND
    * isnotnull(input)` pre-filter under every explode. Semantics are
    * unchanged with or without it (explode already drops empty/null
    * inputs) — but the inferred predicate DUPLICATES the generate-input
    * expression, and this engine's explode inputs are staged
    * higher-order-function pipelines (tokenize → shingle → hash) that
    * the copied predicate re-evaluates with the staging collapsed: the
    * repetition-filter subplan measured 7.9 s with the rule and 0.9 s
    * without at sf0.1. Excluding it is safe and engine-appropriate;
    * plans whose generate inputs are plain attributes lose nothing.
    * (Measured + documented in SCALE.md.) */
  val ExcludedOptimizerRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
}
