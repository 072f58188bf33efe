package graft

/** Deployment tool: materialize the gram-index artifact for a corpus —
  * `sbt "runMain graft.BuildIndex <sfDir> <outDir> [n]"`. A later
  * session started with `SPARK_GRAFT_INDEX_DIR=<outDir>` (or the
  * `spark.graft.index.dir` conf) serves the whole dedup /
  * decontamination / search-index family from the artifact instead of
  * re-running the tokenize+hash corpus scan, as long as the stored
  * corpus fingerprint still matches.
  *
  * `--update` runs [[functions.GramIndex.updateIndex]] instead: an
  * append-only corpus delta PATCHES the artifact at delta cost
  * (per-doc shapes append; fingerprint folds incrementally), an
  * unchanged corpus is a no-op, and a mutated corpus falls back to
  * the full rebuild — the nightly-ingest maintenance call. */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    val update = args.contains("--update")
    val rest = args.filterNot(_ == "--update")
    val (sfDir, outDir) = (rest(0), rest(1))
    val n = if (rest.length > 2) rest(2).toInt else 4
    val spark = GraftSession.get()
    val t0 = System.nanoTime()
    val action =
      if (update)
        functions.GramIndex.updateIndex(
          Tables.documents(spark, sfDir), n, outDir)
      else {
        functions.GramIndex.saveIndex(
          Tables.documents(spark, sfDir), n, outDir)
        "build"
      }
    println(f"[build-index] $action $outDir in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
