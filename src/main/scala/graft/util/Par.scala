package graft.util

/** Run independent Spark ACTIONS concurrently from the driver (guide-§2.6
  * job overlap): Spark's scheduler happily runs several jobs at once inside
  * one application — actions are only sequential because driver code calls
  * them sequentially. Two table writes that share nothing (or share only
  * already-materialized inputs) waste the tail of each other's stages when
  * run back-to-back; submitted together, the second job's tasks back-fill
  * executor slots freed by the first job's stragglers. Inputs that BOTH
  * actions consume must be materialized (persist+count / localCheckpoint)
  * before calling, or the racing actions may compute the shared subplan
  * twice.
  *
  * Failure semantics match sequential code: waits for all, then rethrows
  * the first failure (the other action has already finished — no orphaned
  * half-running job).
  */
object Par {
  def actions(fs: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val futs = fs.map(f => Future(f()))
    // await every future before surfacing a failure: rethrowing the first
    // while a sibling write is mid-flight would hand control back to a
    // caller that believes nothing is running
    val results = futs.map(f => Await.ready(f, Duration.Inf).value.get)
    results.collectFirst { case scala.util.Failure(e) => throw e }
  }
}
