package graft.tools

import graft.operators.Similarity

/** Dev tool: prints the DuckDB hyperplane-signature SQL fragment so the
  * banding/radius constants in `Dedup.embeddingNearDup` can be measured
  * against the testdata corpora with plain DuckDB. */
object DumpSigSql {
  def main(args: Array[String]): Unit =
    println(Similarity.hyperplaneSigSql(if (args.nonEmpty) args(0) else "v"))
}
