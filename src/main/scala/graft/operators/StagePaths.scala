package graft.operators

/** Collision-resistant staging-path components for the staged-artifact
  * memos ([[ClusterStage]]/[[GraphStage]]/[[TermStage]]/[[ErStage]]/
  * [[KnnStage]]/[[GramStage]]). A 32-bit `(dir, params).hashCode` can
  * collide across two distinct snapshot dirs in one JVM — the second
  * compute would overwrite the first's parquet while the first memo
  * entry still points there, silently serving the wrong snapshot's
  * artifact. An md5 over the canonical key string makes that
  * practically impossible (the memo map itself still keys on the full
  * tuple, so the digest only has to keep distinct keys on distinct
  * paths).
  */
private[operators] object StagePaths {

  /** Hex md5 of the NUL-joined string forms of the key parts (NUL so a
    * part containing the join character cannot shift boundaries). */
  def component(parts: Any*): String = {
    val key = parts.map(String.valueOf).mkString("\u0000")
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
