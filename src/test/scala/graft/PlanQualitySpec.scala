package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Automated plan-quality gate over EVERY registered query: no accidental
  * cartesian products, and column pruning must reach every scan of a wide
  * table (a scan reading all of lineitem's 16 columns for a 2-column
  * projection would be a silent 100 TB regression). Runs on the physical
  * plan at sf0.001 — plan shape, not data. */
class PlanQualitySpec extends SparkSuite {

  private val wideTables = Map(
    "lineitem" -> 16, "orders" -> 6, "events" -> 6, "customer" -> 5)

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: no cartesian product, wide scans pruned") {
      val plan = fn(spark, sf0001).queryExecution.executedPlan
      val planStr = plan.toString
      assert(!planStr.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      plan.collect { case scan: FileSourceScanExec => scan }.foreach { scan =>
        val loc = scan.relation.location.rootPaths.mkString(",")
        wideTables.foreach { case (table, nCols) =>
          if (loc.contains(s"$table.parquet")) {
            assert(scan.requiredSchema.size < nCols,
              s"$name reads ALL $nCols columns of $table " +
                s"(got ${scan.requiredSchema.map(_.name).mkString(", ")})")
          }
        }
      }
    }
  }
}
