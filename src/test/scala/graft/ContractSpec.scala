package graft

/** The driver contract itself: registration drift between `queries` and
  * `oracleSql` silently downgrades a hash-checked operator to nothing (an
  * oracle without a query) or to rows-only (a query without an oracle) —
  * pin the two maps to the same key set, and smoke the flagship entry. */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    // The ONLY queries allowed to ship without a SQL oracle: sequential-
    // state algorithms DuckDB cannot replay (per-chunk gear-hash walk with
    // min/max suppression; navigable-graph beam search). Each is pinned by
    // a dedicated spec (GearChunkerSpec, HnswSpec) and — for HNSW — a
    // flag-oracled measured-recall gate (emb_hnsw_recall). Anything else
    // landing here is a regression, not a new category.
    val specPinned = Set("doc_cdc_gear", "emb_hnsw_search")
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
