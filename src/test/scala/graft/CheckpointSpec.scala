package graft

import org.apache.spark.sql.functions._

/** The `spark.graft.checkpoint.dir` switch (see [[graft.Ckpt]]): one
  * runtime conf flips every lineage-truncation site in the engine from
  * localCheckpoint (executor-pinned blocks, the local/dev posture) to
  * reliable checkpoint files (the executor-loss-safe posture for
  * multi-hour 100 TB runs). Both paths must produce identical results on
  * the iterative operators that depend on the barrier.
  */
class CheckpointSpec extends SparkSuite {
  import TestSpark.spark.implicits._
  import graft.operators.{Dedup, Graph}

  test("reliable-checkpoint path == localCheckpoint path on the iterative operators, files land under the dir") {
    val seqIds = (1L to 12L)
    val ids = spark.range(1, 13).select(col("id").as("doc_id"))
    val pairs = seqIds.dropRight(1).map(i => (i, i + 1))
      .toDF("a_id", "b_id") // a chain: exercises multiple propagation rounds
    // default path first (flag unset)
    assert(spark.conf.getOption(Ckpt.DirKey).isEmpty)
    val ccLocal = Dedup.connectedComponents(ids, pairs).collect().toSet
    val prLocal = Graph.g1PageRank(spark, sf).collect().toSet
    val pdLocal = Graph.g1PageRankDangling(spark, sf).collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toString
    spark.conf.set(Ckpt.DirKey, dir)
    try {
      val ccReliable = Dedup.connectedComponents(ids, pairs).collect().toSet
      assert(ccReliable == ccLocal)
      val prReliable = Graph.g1PageRank(spark, sf).collect().toSet
      assert(prReliable == prLocal)
      val pdReliable = Graph.g1PageRankDangling(spark, sf).collect().toSet
      assert(pdReliable == pdLocal)
      // the reliable path genuinely wrote checkpoint files under the dir
      // (rdd-<id> directories), proving the switch took effect
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-"))
        .count()
      assert(files > 0, s"no reliable checkpoint files under $dir")
    } finally spark.conf.unset(Ckpt.DirKey)
    // and unsetting restores the local path (no new files appear)
    val before = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).count()
    Dedup.connectedComponents(ids, pairs).collect()
    val after = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).count()
    assert(after == before, "flag unset but reliable checkpoints still written")
  }
}
