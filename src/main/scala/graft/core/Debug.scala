package graft.core

/** Env-gated wall-clock laps — the profiling hooks the perf rounds
  * leave in place (`GRAFT_REC_DEBUG`, `GRAFT_E11_DEBUG`,
  * `GRAFT_ML_DEBUG`, `GRAFT_N2V_DEBUG`). One definition instead of a
  * copy per module; prints nothing and adds one env lookup when the
  * variable is unset.
  */
object Debug {
  def lap[T](envVar: String, tag: String)(f: => T): T =
    if (!sys.env.contains(envVar)) f
    else {
      val t0 = System.nanoTime()
      val r = f
      val label = envVar.stripPrefix("GRAFT_").stripSuffix("_DEBUG").toLowerCase
      println(f"[$label] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
}
