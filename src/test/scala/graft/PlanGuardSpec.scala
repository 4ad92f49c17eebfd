package graft

/** Global plan-shape regression guard: no gate query may acquire a
  * cartesian/nested-loop join. The only allowed exceptions are the
  * deliberate brute-force baselines, where the small side is broadcast
  * against the corpus by design (exact ANN / kNN over a bounded query
  * set, and the documented embedding-dedup baseline). A new query — or
  * a refactor of an old one — that introduces an n×n join fails here
  * before it fails at 100 TB. */
class PlanGuardSpec extends SparkSpec {

  private val allowedCartesian = Set(
    "ann_bruteforce_topk",      // bounded query set × corpus, broadcast by design
    "knn_label_vote",           // same shape: k-NN scoring of a small query set
    "dedup_embedding_bruteforce", // documented exact baseline (grid path is the headline)
    "ann_pq_topk",              // PQ scans all CODES per query by design (8 B/vec ADC)
    "ann_opq_topk",             // same scan-all-codes shape, in the OPQ-rotated space
    "text_keywords",            // 1-row corpus-count scalar broadcast, not an n×n join
    "user_rfm_approx",          // 1-row quantile-breakpoint frame broadcast to every user
    "search_bm25",              // 1-row (N, avgdl) corpus-stats broadcast
    "search_hybrid_rrf",        // fuses search_bm25 + the bounded bruteforce query batch
    "search_hybrid_rrf_weighted", // same two sides, weighted fusion (r13)
    "text_lm_score",            // 1-row vocabulary-size broadcast
    "corpus_mix",               // 1-row language-count broadcast
    "corpus_mix_bpe")           // same plan, BPE-priced n_tokens

  /** Analysis-only sweep: every gate query must RESOLVE against the
    * current testdata, with a per-query message on failure. Catches
    * data-contract drift (round 5: events.ts changed parquet encoding
    * and one query silently fell out of the correctness gate) in
    * seconds, without executing anything. */
  test("every gate query analyzes against the current testdata") {
    val dir = sf("any")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).queryExecution.analyzed; None }
      catch { case e: Throwable =>
        Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(3).mkString(" | ")}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis:\n  ${failures.mkString("\n  ")}")
  }

  test("no gate query plans a cartesian or nested-loop join (except documented baselines)") {
    val dir = sf("any")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoop")
      if (cartesian && !allowedCartesian(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian joins crept into: $offenders")
  }
}
