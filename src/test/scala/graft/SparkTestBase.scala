package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (getOrCreate reuses one JVM-wide). */
trait SparkTestBase {
  lazy val spark: SparkSession = Sessions.local("graft-test")
}
