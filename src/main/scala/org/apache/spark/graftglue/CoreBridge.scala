package org.apache.spark.graftglue

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Bridge for `private[spark]` core utilities (same pattern as
  * org.apache.spark.sql.graftglue.Bridge): ship a Hadoop
  * Configuration to executors the way Spark's own file sources do.
  */
object CoreBridge {
  type SerializableConf = SerializableConfiguration

  def broadcastHadoopConf(sc: SparkContext, conf: Configuration): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc, conf)

  def confOf(bc: Broadcast[SerializableConfiguration]): Configuration = bc.value.value

  /** Drain the listener bus so SparkListener-collected metrics are
    * complete before a snapshot is read (the bus is async; without the
    * drain a per-query metrics delta can attribute task events to the
    * wrong query).
    */
  def waitListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
