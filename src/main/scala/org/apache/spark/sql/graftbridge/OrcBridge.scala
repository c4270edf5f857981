package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.datasources.orc.OrcUtils
import org.apache.spark.sql.types.StructType

/** Footer-only ORC schema resolution through Spark's own ORC reader and
  * ORC->Catalyst type converter (both live in `private[sql]`
  * `execution.datasources.orc.OrcUtils`; this shim re-exports exactly the
  * schema probe the concat planner needs). Mirrors what
  * `graft.operators.Concat.parquetFooterSchema` does for parquet: one
  * footer read per file, never a per-file DataSource resolution.
  */
object OrcBridge {
  def footerSchema(path: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): StructType =
    OrcUtils.readSchema(path, conf, ignoreCorruptFiles = false)
      .map(OrcUtils.toCatalystSchema)
      .getOrElse(throw new IllegalArgumentException(s"unreadable ORC footer: $path"))
}
