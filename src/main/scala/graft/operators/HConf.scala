package graft.operators

import org.apache.hadoop.conf.Configuration
import scala.jdk.CollectionConverters._

/** Ships the driver's Hadoop configuration to executor tasks.
  *
  * The byte-path tasks can't use Spark's own `SerializableConfiguration`
  * (it is `private[spark]`), and a bare `new Configuration()` on an executor
  * sees only classpath defaults — dropping everything the session set at
  * runtime (`spark.hadoop.*` props, object-store credentials, custom FS
  * impls). So the driver snapshots its `sparkContext.hadoopConfiguration`
  * as plain key/value pairs (a small broadcast-friendly Seq of Strings) and
  * each task overlays them onto a fresh Configuration. Values are copied
  * raw, so `${var}` substitution still resolves on `get` as usual.
  */
object HConf {

  /** Driver side: snapshot every entry of the live Hadoop conf. */
  def snapshot(hconf: Configuration): Seq[(String, String)] =
    hconf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq

  /** Task side: classpath defaults overlaid with the driver's entries. */
  def restore(entries: Seq[(String, String)]): Configuration = {
    val c = new Configuration()
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
