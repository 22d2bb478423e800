package graft.pipeline

import java.nio.file.Paths

/** spark-submit entrypoint for the containerized deployment
  * (deploy/Dockerfile), replaying the reference's two-stage operation
  * (`/root/reference/Dockerfile:33` CMD → `etl/extract.py` +
  * `etl/transform.py`) as one class with subcommands:
  *
  *   spark-submit --class graft.pipeline.Main app.jar [extract|transform|run] [config.yml]
  *
  * `extract`  — REST pull → NDJSON raw file + watermark commit (R1–R3);
  *              no-op (like the reference) when LICHESS_API_URL /
  *              LICHESS_USERNAME are unset.
  * `transform`— drain raw dir → filter/project → PGN sink, exactly-once
  *              via the streaming checkpoint (R4–R11).
  * `run`      — both (default).
  *
  * Config comes from the reference-shaped YAML (arg 2, default
  * `config/etl_config.yml` when present); Spark confs layer
  * [[graft.Tuning]] on top of the YAML's master/memory/cores.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("run")
    if (!Set("extract", "transform", "run").contains(mode)) {
      // a typo'd subcommand must not exit 0 looking like a successful
      // no-op in the container entrypoint
      System.err.println(s"unknown mode '$mode'; usage: Main [extract|transform|run] [config.yml]")
      sys.exit(2)
    }
    val cfg = args.drop(1).headOption
      .orElse(Option("config/etl_config.yml")
        .filter(p => java.nio.file.Files.exists(Paths.get(p))))
      .map(EtlConfig.fromYaml)
      .getOrElse(EtlConfig())

    if (mode == "extract" || mode == "run") {
      val wrote = LichessClient.runExtract(
        stateDir = Paths.get(cfg.checkpointPath, "extract"),
        rawDir = Paths.get(cfg.rawDataPath),
        until = System.currentTimeMillis())
      println(wrote match {
        case Some(p) => s"[extract] wrote $p"
        case None => "[extract] nothing new (or LICHESS_* env unset)"
      })
    }

    if (mode == "transform" || mode == "run") {
      val spark = graft.Tuning(EtlConfig.sessionBuilder(cfg)).getOrCreate()
      try ChessPipeline.runStream(spark, cfg.rawDataPath,
        cfg.transformedDataPath, s"${cfg.checkpointPath}/transform")
      finally spark.stop()
      println(s"[transform] drained ${cfg.rawDataPath} -> ${cfg.transformedDataPath}")
    }
  }
}
