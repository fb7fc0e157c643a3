package graft.service

import org.apache.spark.sql.SparkSession

import graft.sinks.{Storage, Warehouse}
import graft.sources.DataExportSource

/** Multi-tenant scale-out: the reference runs N independent hauser
  * processes under supervisord, one per account/config
  * (reference: recipes/multi-hauser/README.md, start.sh). On Spark the
  * processes collapse into parameterized pipelines sharing one session —
  * each tenant's transform stage is distributed over the executors, and
  * tenants run concurrently from the driver.
  */
object MultiTenant {

  final case class Tenant(name: String, config: ServiceConfig,
                          source: DataExportSource, storage: Storage,
                          warehouse: Option[Warehouse])

  /** Run every tenant's catch-up loop; `parallelism` tenants in flight at
    * once (each is driver-light — the heavy work is executor-side).
    * Returns per-tenant processed bundles; a tenant failure doesn't stop
    * the others (reported as a Left). */
  def runAll(spark: SparkSession, tenants: Seq[Tenant],
             parallelism: Int = 4,
             now: () => java.time.Instant = () => java.time.Instant.now())
      : Map[String, Either[Throwable, Seq[BundleProcessed]]] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, tenants.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futures = tenants.map { t =>
        val fut = scala.concurrent.Future {
          // one scheduler-group per tenant so the Spark UI/fair scheduler
          // can attribute and interleave their jobs
          spark.sparkContext.setJobGroup(s"tenant-${t.name}",
            s"graft tenant ${t.name}", interruptOnCancel = true)
          val svc = new ExportService(spark, t.config, t.source, t.storage,
            t.warehouse, pollInterval = java.time.Duration.ofMillis(1),
            now = now)
          svc.runUntilCaughtUp()
        }
        t.name -> fut
      }
      futures.map { case (name, fut) =>
        name -> scala.util.Try(scala.concurrent.Await.result(fut,
          scala.concurrent.duration.Duration.Inf)).toEither
      }.toMap
    } finally pool.shutdown()
  }
}
