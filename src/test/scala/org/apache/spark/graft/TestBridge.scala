package org.apache.spark.graft

import org.apache.spark.{SparkConf, SparkContext}

/** Test-only accessor for the LIVE SparkContext conf (`sc.conf` is
  * private[spark]; `getConf` returns a copy). Needed to emulate
  * `spark-submit --conf spark.sql.extensions=...` on a reused local
  * context, since static confs are read from the context conf by
  * SparkSession.getOrCreate.
  */
object TestBridge {
  def liveConf(sc: SparkContext): SparkConf = sc.conf
}
