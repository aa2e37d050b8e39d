package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Components

/** Dev probe (r20 verdict ask #6, re-asked in r21 after the loop body
  * changed to the union-min form): drive the connected-components
  * operator at ADVERSARIAL DIAMETER — a manufactured long-chain dup
  * graph, the exact topology LSH corpora never produce (their components
  * are band-bucket near-cliques) and therefore the one the bench/oracle
  * fixtures never exercise at scale.
  *
  * Fixture per point: `total` docs (100× the sf0.1 corpus), background
  * near-dup noise of 2-cliques over half the remaining ids, and ONE path
  * component of `chain` nodes (edges i—i+1), diameter = chain−1.
  *
  * Measured per point:
  *  - whether the capped propagation loop gives up (diameter > 50 ⇒ it
  *    must: labels move one hop per round);
  *  - wall of the full production `connected()` composition (capped
  *    propagate, then star-contraction fallback);
  *  - star-contraction round count vs the O(log n) bound;
  *  - label correctness (component count must equal the constructed
  *    1 + #noise-cliques + #isolated).
  *
  * Output: ONE JSON line per point + a summary array written to the
  * path in arg 0 (default /tmp/components_chain_probe.json) — promote to
  * the repo as the round's recorded probe artifact.
  */
object ComponentsChainProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/components_chain_probe.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("graft-chainprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val total = 500000L // 100× the sf0.1 documents corpus (5 000 docs)
    val results = Seq(1000L, 10000L, 100000L).map { chain =>
      val docs = spark.range(total).toDF("doc_id")
      // chain over ids [0, chain); 2-clique noise over the even ids of
      // the top half — the shape of a normal near-dup corpus, so the
      // probe measures the chain's marginal cost, not an empty graph
      val noiseBase = total / 2
      val pairs = spark.range(chain - 1)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
        .unionByName(spark.range(noiseBase, total - 1, 2)
          .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b")))
      val t0 = System.nanoTime()
      val labels = Components.connected(docs, pairs, propagateRounds = 50)
        .localCheckpoint()
      val wallConnected = (System.nanoTime() - t0) / 1e9
      val nComponents = labels.select(countDistinct("label")).head.getLong(0)
      // constructed truth: 1 chain + (total-noiseBase)/2 cliques +
      // isolated ids in (chain, noiseBase)
      val expect = 1L + (total - noiseBase) / 2 + (noiseBase - chain)
      require(nComponents == expect,
        s"chain=$chain: got $nComponents components, expected $expect")
      // decomposition: does the capped loop give up, and how many star
      // rounds does the fallback need?
      val t1 = System.nanoTime()
      val propagated = Components.propagate(docs, pairs, maxRounds = 50)
      val wallPropagate = (System.nanoTime() - t1) / 1e9
      val capped = propagated.isEmpty
      val t2 = System.nanoTime()
      val (starLabels, starRounds) =
        Components.starContractCounted(docs, pairs.localCheckpoint())
      val nStar = starLabels.select(countDistinct("label")).head.getLong(0)
      val wallStar = (System.nanoTime() - t2) / 1e9
      require(nStar == expect, s"starContract disagrees: $nStar vs $expect")
      spark.catalog.clearCache()
      val line = s"""{"chain":$chain,"total":$total,""" +
        s""""propagate_capped":$capped,"star_rounds":$starRounds,""" +
        f""""wall_connected_s":$wallConnected%.2f,""" +
        f""""wall_propagate_attempt_s":$wallPropagate%.2f,""" +
        f""""wall_star_s":$wallStar%.2f,"components":$nComponents}"""
      println(line)
      line
    }
    val doc = results.mkString(
      "{\"probe\":\"components_long_chain\",\"points\":[\n ", ",\n ", "\n]}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      doc.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }
}
