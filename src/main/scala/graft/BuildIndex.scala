package graft

/** Deployment tool: materialize the gram-index artifact for a corpus —
  * `sbt "runMain graft.BuildIndex <sfDir> <outDir> [n]"`. A later
  * session started with `SPARK_GRAFT_INDEX_DIR=<outDir>` (or the
  * `spark.graft.index.dir` conf) serves the whole dedup /
  * decontamination / search-index family from the artifact instead of
  * re-running the tokenize+hash corpus scan, as long as the stored
  * corpus fingerprint still matches. */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val n = if (args.length > 2) args(2).toInt else 4
    val spark = GraftSession.get()
    val t0 = System.nanoTime()
    functions.GramIndex.saveIndex(Tables.documents(spark, sfDir), n, outDir)
    println(f"[build-index] wrote $outDir in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
