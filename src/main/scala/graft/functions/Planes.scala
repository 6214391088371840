package graft.functions

/**
 * Deterministic ±1 random hyperplanes for sign-LSH, derived from md5 so they
 * are reproducible anywhere (the constants are INLINED into both the Spark
 * plan and the DuckDB oracle SQL — no engine-specific hash in the hot path).
 *
 * Performance: the planes are compile-time constants, so each projection is
 * `dot_q(q, lit(plane))` — one fused codegen'd primitive loop per plane
 * (graft.functions.DotQ) instead of the interpreted
 * `aggregate(zip_with(...))` higher-order-function pair this replaces
 * (round-1 bench: 4.9 s emb_near_dup vs 0.8 s for dot_q-powered brute force
 * on the same vectors).
 */
object Planes {

  /** Component i of plane p: +1 if the low bit of md5("plane:p:i")'s first
    * byte is 0, else -1. */
  def vec(p: Int, dim: Int): IndexedSeq[Long] =
    (0 until dim).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"plane:$p:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1L else -1L
    }

  /** The same plane as a SQL list literal for the DuckDB oracle. */
  def sqlList(p: Int, dim: Int): String = vec(p, dim).mkString("[", ",", "]")
}
