package graft.tools

import org.apache.spark.sql.SparkSession

/** Generate the synthetic bench corpus outside a Bench run:
  * `runMain graft.tools.GenCorpus <nDocs> [genCores]` writes
  * `/tmp/graft_bench_corpus_<nDocs>` (same path/layout Bench.prepCorpus
  * uses, so a pre-generated corpus is picked up by the next Bench run
  * instead of being re-generated inside its budget). */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toInt
    val genCores = if (args.length > 1) args(1).toInt else 32
    val dir = s"/tmp/graft_bench_corpus_$nDocs"
    if (new java.io.File(dir, "_SUCCESS").exists) {
      println(s"already exists: $dir")
      return
    }
    val spark = SparkSession.builder()
      .master(s"local[$genCores]")
      .appName("graft-gen-corpus")
      .config("spark.sql.shuffle.partitions", genCores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    try graft.ingest.Corpus.synthetic(spark, nDocs, partitions = 64)
      .write.mode("overwrite").parquet(dir)
    finally spark.stop()
    println(f"wrote $dir in ${(System.nanoTime() - t0) / 1e9}%.1fs")
  }
}
