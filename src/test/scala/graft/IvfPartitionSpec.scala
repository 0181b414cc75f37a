package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** SCALE.md's IVF routing claim made concrete: the corpus written
  * partitioned by centroid id, a probe reading ONLY its cluster's
  * partition via partition pruning. */
class IvfPartitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("IVF corpus partitioned by centroid_id: probe reads one cluster, pruned at the source") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/corpus"
    val assigned = emb.join(
      Similarity.ivfAssign(emb, 8).select("vec_id", "centroid_id"), "vec_id")
    assigned.write.partitionBy("centroid_id").parquet(dir)

    val corpus = spark.read.parquet(dir)
    val probe = corpus.filter(col("centroid_id") === 3)
    // pruning: the scan's partition filter carries the centroid predicate
    val scan = probe.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("centroid_id"))
    // the probe's rows are exactly cluster 3's assignment
    val expected = assigned.filter(col("centroid_id") === 3).count()
    assert(probe.count() == expected && expected > 0)
    // and every cluster is nonempty-ish overall (sane assignment spread)
    assert(corpus.select("centroid_id").distinct().count() == 8)
  }
}
