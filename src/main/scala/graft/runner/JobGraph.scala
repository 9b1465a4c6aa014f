package graft.runner

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Declarative DAG config — the reference's Airflow orchestration layer
  * (`airflow.yaml:1-7` indexing per-package `dags.yaml` files, e.g.
  * `siri/dags.yaml:1-96`, `gtfs/dags.yaml:1-19`, `packagers/dags.yaml:
  * 1-36`): each DAG has a name, a schedule interval, and an ordered
  * task list whose entries name a function plus kwargs with optional
  * defaults. The same YAML shape is used here (parsed with the Jackson
  * YAML support already on Spark's classpath), and the executor applies
  * Airflow's task semantics: tasks in a DAG run in declared order, a
  * failed task skips the DAG's remaining tasks, and independent DAGs
  * keep running.
  */
case class TaskDef(id: String, function: String,
                   kwargs: Map[String, Option[String]])

case class DagDef(name: String, scheduleInterval: String,
                  tasks: Seq[TaskDef])

/** One task execution: status ∈ success | error | skipped. */
case class TaskRun(dag: String, taskId: String, status: String, error: String)

object JobGraph {

  /** A runnable task: resolved kwargs (defaults ∪ overrides, `"None"`
    * strings sanitized per F14) to side effects.
    */
  type TaskFn = (SparkSession, Map[String, String]) => Unit

  private val mapper = new ObjectMapper(new YAMLFactory())

  def parseYaml(yaml: String): Seq[DagDef] = {
    val root = mapper.readTree(yaml)
    root.get("dags").elements().asScala.map { dag =>
      DagDef(
        name = dag.get("name").asText(),
        scheduleInterval =
          Option(dag.get("schedule_interval")).map(_.asText()).getOrElse("@daily"),
        tasks = dag.get("tasks").elements().asScala.map { t =>
          TaskDef(
            id = t.get("id").asText(),
            function = t.get("function").asText(),
            kwargs = kwargDefaults(t.get("kwargs")))
        }.toSeq)
    }.toSeq
  }

  /** `kwargs: {num_days: {default: "4"}, min_date: {}}` — the
    * reference's kwarg shape (`siri/dags.yaml:17-21`): every key is
    * declared, defaults are optional.
    */
  private def kwargDefaults(n: JsonNode): Map[String, Option[String]] =
    if (n == null) Map.empty
    else n.fieldNames().asScala.map { k =>
      k -> Option(n.get(k).get("default")).map(_.asText())
    }.toMap

  def fromResource(path: String = "/graft/dags.yaml"): Seq[DagDef] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try parseYaml(new String(in.readAllBytes(), "UTF-8")) finally in.close()
  }

  /** Execute every DAG (optionally only one schedule tier) against a
    * function registry. Unknown functions are task errors, not crashes
    * — the report carries them like any other failure.
    */
  def run(spark: SparkSession, dags: Seq[DagDef],
          registry: Map[String, TaskFn],
          overrides: Map[String, String] = Map.empty,
          scheduleFilter: Option[String] = None): Seq[TaskRun] = {
    // sanitize BEFORE merging: an override that is absent/""/"None"
    // (Main passes "" for unset CLI flags) must leave the task's YAML
    // default in force, not erase it
    val cleanOverrides = overrides.flatMap { case (k, v) =>
      Main.sanitize(Some(v)).map(k -> _)
    }
    dags.filter(d => scheduleFilter.forall(_ == d.scheduleInterval)).flatMap { dag =>
      var failed = false
      dag.tasks.map { t =>
        if (failed) TaskRun(dag.name, t.id, "skipped", "")
        else {
          val kwargs = t.kwargs.flatMap { case (k, default) =>
            cleanOverrides.get(k)
              .orElse(default.flatMap(d => Main.sanitize(Some(d))))
              .map(k -> _)
          }
          registry.get(t.function) match {
            case None =>
              failed = true
              TaskRun(dag.name, t.id, "error", s"unknown function ${t.function}")
            case Some(fn) =>
              try { fn(spark, kwargs); TaskRun(dag.name, t.id, "success", "") }
              catch {
                case e: Throwable =>
                  failed = true
                  TaskRun(dag.name, t.id, "error", String.valueOf(e))
              }
          }
        }
      }
    }
  }
}
