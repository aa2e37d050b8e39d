package graft

import org.scalatest.funsuite.AnyFunSuite

/** PlanSpec pins plans under the TEST harness profile (AQE mostly
  * inert, shuffle.partitions pinned at 4); a real cluster runs under
  * [[graft.core.GraftSession]]'s profile — AQE with partition
  * coalescing, skew-join splitting, and initialPartitionNum=1024. AQE
  * re-plans at runtime (coalesced exchanges, demoted broadcasts, split
  * skew partitions), which is exactly the kind of change that can break
  * an operator relying on an accidental property of the static plan
  * (partition-local heaps, checkpoint boundaries, two-pass prefix-sum
  * bucket offsets). This spec re-runs the suite's shuffle-heaviest
  * queries under the production confs on a fresh `newSession()` (same
  * JVM, separate SQLConf) and asserts row-for-row parity with the
  * harness session — catching AQE-only breakage before a cluster does. */
class ClusterProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  // the heaviest shuffle/plan shapes: iterative components (t15),
  // BPE corpus loop (t87), PageRank fixed point (t92), sessionization
  // windows (q21), LSH band self-join (t03), and the r15 cell-local
  // pair fold (t26 — its collect_list cells + HOF unfold must survive
  // AQE's coalesced exchanges)
  private val names = Seq("t15_dedup_components", "t87_bpe_trainer",
    "t92_dup_pagerank", "q21_sessionize", "t03_ngram_jaccard",
    "t26_semdedup")

  test("shuffle-heavy queries return identical rows under the production AQE profile") {
    val prod = graft.core.GraftSession.applyTo(spark.newSession())
    // sanity: the profile really is active on the new session and NOT
    // on the harness one (separate SQLConf despite the shared context)
    assert(prod.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum") == "1024")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    names.foreach { n =>
      val base = SparkEntry.queries(n)(spark, sf).collect()
        .map(_.toString).sorted.toSeq
      val aqe = SparkEntry.queries(n)(prod, sf).collect()
        .map(_.toString).sorted.toSeq
      assert(base.nonEmpty, s"$n returned no rows on the harness profile")
      assert(aqe == base, s"$n diverges under the production AQE profile")
    }
  }
}
