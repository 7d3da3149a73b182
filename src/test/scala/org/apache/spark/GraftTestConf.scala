package org.apache.spark

/** Test-only bridge to the LIVE SparkContext conf (package-private in
  * Spark): `spark.sql.extensions` is a static conf that getOrCreate reads
  * from the running context's conf, so exercising the extensions
  * registration path on a shared test context requires mutating it.
  */
object GraftTestConf {
  def set(sc: SparkContext, key: String, value: String): Unit = sc.conf.set(key, value)
  def remove(sc: SparkContext, key: String): Unit = sc.conf.remove(key)
}
