package graft.pipeline

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Engine configuration (SURVEY §2A R12), mirroring the reference's
  * `config/etl_config.yml` keys (/root/reference/config/etl_config.yml:1-8)
  * plus the checkpoint dir that replaces its two hand-rolled state files.
  * The reference wired its `num_executors` key to `spark.executor.cores`
  * (/root/reference/etl/transform.py:85) — here the two are distinct and
  * correctly named.
  */
case class EtlConfig(
    master: String = "local[*]",
    executorMemory: String = "4g",
    executorCores: Int = 4,
    rawDataPath: String = "data/raw",
    transformedDataPath: String = "data/transformed",
    checkpointPath: String = "data/checkpoints")

object EtlConfig {

  /** Minimal flat-YAML parser (`key: value` lines, `#` comments) — the
    * reference's config shape needs nothing more, and the zero-egress
    * build has no YAML library.
    */
  def fromYaml(path: String): EtlConfig = {
    val kv = Files.readAllLines(Paths.get(path)).asScala
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val Array(k, v) = l.split(":", 2)
        k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
    val base = EtlConfig()
    EtlConfig(
      master = kv.getOrElse("master", kv.getOrElse("pyspark.master", base.master)),
      executorMemory = kv.getOrElse("executor_memory", base.executorMemory),
      executorCores = kv.get("executor_cores").map(_.toInt)
        .getOrElse(base.executorCores),
      rawDataPath = kv.getOrElse("raw_data_path", base.rawDataPath),
      transformedDataPath = kv.getOrElse("transformed_data_path", base.transformedDataPath),
      checkpointPath = kv.getOrElse("checkpoint_path", base.checkpointPath))
  }

  /** Apply to a session builder (master + executor confs). */
  def sessionBuilder(c: EtlConfig): org.apache.spark.sql.SparkSession.Builder =
    org.apache.spark.sql.SparkSession.builder()
      .master(c.master)
      .config("spark.executor.memory", c.executorMemory)
      .config("spark.executor.cores", c.executorCores.toString)
}
