package graft

/** Diagnosis-only: print one kernel-canary reading (rows/s) and exit 0 if
  * it clears the healthy floor plus an optional margin (argv(0), default
  * 0). Lets a measurement wrapper wait for a GENUINELY healthy window
  * before launching a full bench: this box's contention episodes end in a
  * long marginal tail (1600-1700 rows/s) during which a run admitted at
  * the bare floor collapses mid-run — two such runs are kept at
  * optruns_r19/final{2,3}_32cpu_CONTENDED.json. No Spark session.
  */
object DiagCanary {
  def main(args: Array[String]): Unit = {
    val margin = args.headOption.map(_.toDouble).getOrElse(0.0)
    val k = Canary.kernelCanaryRowsPerSec()
    println(s"""{"kernel_canary_rows_per_sec":$k,"floor":${Canary.HealthyKernelFloor},"margin":$margin}""")
    if (k < Canary.HealthyKernelFloor + margin) sys.exit(3)
  }
}
