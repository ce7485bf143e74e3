package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Plan auditor: executes every SparkEntry query and prints a one-line
  * physical-plan summary — join strategies, exchange count, codegen
  * coverage, scan pushdown — plus a RED flag for shapes that do not
  * survive scale (cartesian/broadcast-nested-loop joins).
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case _ => p.children.flatMap(flatten)
    }
    p +: inner
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // audit-only: AQE's executedPlan view hides the codegen-collapsed
      // stage plans, so the static (non-adaptive) plan is the honest lens
      // for join strategy / pushdown / whole-stage-codegen inspection
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    (SparkEntry.queries ++ SparkEntry.benchOnlyQueries)
      .toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val nodes = flatten(df.queryExecution.executedPlan)
        def count(pred: String => Boolean): Int =
          nodes.count(n => pred(n.nodeName))
        val joins = nodes.map(_.nodeName).filter(_.contains("Join"))
          .groupBy(identity).view.mapValues(_.size)
          .map { case (k, v) => s"$k×$v" }.mkString(",")
        val shuffles = count(_.contains("Exchange"))
        val wscg = count(_.startsWith("WholeStageCodegen"))
        val scans = nodes.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            val pushed = s.metadata.getOrElse("PushedFilters", "[]")
            if (pushed == "[]") "scan:nofilter" else "scan:pushed"
        }.groupBy(identity).view.mapValues(_.size)
          .map { case (k, v) => s"$k×$v" }.mkString(",")
        val red = nodes.map(_.nodeName).filter(n =>
          n.contains("CartesianProduct") || n.contains("BroadcastNestedLoopJoin"))
        val flag = if (red.nonEmpty) s"  RED=[${red.distinct.mkString(",")}]" else ""
        println(f"$name%-24s shuffles=$shuffles%-3d wscg=$wscg%-3d joins=[$joins] $scans$flag")
      } catch {
        case e: Throwable => println(f"$name%-24s AUDIT-ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
