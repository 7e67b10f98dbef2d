package graft

/** The driver contract itself: registration drift between `queries` and
  * `oracleSql` silently downgrades a hash-checked operator to nothing (an
  * oracle without a query) or to rows-only (a query without an oracle) —
  * pin the two maps to the same key set, and smoke the flagship entry. */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    // The ONLY query allowed to ship without a SQL oracle: the navigable-
    // graph beam search, genuinely not SQL-replayable. It is pinned by
    // HnswPropertySpec (r11: the production walk property-checked against
    // a naive reference interpreter of the paper's Algorithm 2+5 on
    // random adversarial graphs, plus brute-force ground truth over the
    // reachable component in the exhaustive-ef regime),
    // HnswBuildPropertySpec (r12: the CONSTRUCTION — level derivation,
    // entry point, full per-level adjacency — property-checked the same
    // way against a naive Algorithm 1/3 + Mmax-prune interpreter, so a
    // build bug can no longer hide as recall drift), HnswSpec's
    // invariants, a flag-oracled measured-recall gate (emb_hnsw_recall)
    // and the oracled integer-exact rerank (emb_hnsw_rerank). The gear
    // chunker left this list in r10 — its suppressed walk is now replayed
    // by a recursive-CTE oracle (doc_cdc_gear). Anything else landing here
    // is a regression, not a new category.
    val specPinned = Set("emb_hnsw_search")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o -- specPinned).isEmpty,
      s"queries missing oracles: ${(q -- o -- specPinned).toSeq.sorted}")
    assert((specPinned -- q).isEmpty, "allowlisted query disappeared")
    assert((specPinned & o).isEmpty,
      "allowlisted query grew an oracle; remove it from the allowlist")
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the family naming convention") {
    val families = Set("q", "evt_", "doc_", "emb_", "dsl_", "src_", "geo_",
      "media_", "topn_", "rollup_", "uri_", "cust_")
    SparkEntry.queries.keys.foreach { k =>
      assert(families.exists(k.startsWith), s"unexpected family for $k")
    }
  }

  test("the flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
