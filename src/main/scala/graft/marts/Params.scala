package graft.marts

/** Engine-level determinism parameters (SURVEY §7.6 #1): the reference
  * bakes CURRENT_DATE into recency metrics
  * (gold_user_rfm_segments.sql:20-23, gold_product_performance.sql:60);
  * we take an explicit as-of date so results are reproducible and
  * oracle-comparable. Default sits just past the testdata's max ts
  * (events span 2024-01, TESTDATA.md seed=42).
  */
object Params {
  val AsOfDate = "2024-02-15"
}
