package graft.corpus

import org.apache.spark.sql.DataFrame

/** Config-driven curation — the extension tier's analogue of the
  * reference's `config.toml` surface (config/AppConfig): a pipeline is
  * DECLARED as an ordered stage list with per-stage parameters in a
  * minimal TOML subset (sections + `key = value` lines, comments
  * stripped the same way), validated with the same posture the
  * reference takes — unknown sections, unknown stages and unknown keys
  * are hard errors, not silent ignores (AppConfig's unknown-key
  * reject), so a typo'd threshold can never quietly curate a 100 TB
  * corpus with defaults.
  *
  * Grammar:
  * {{{
  * [pipeline]
  * stages = "quality_filter, dedup_exact, split"   # ordered, required
  *
  * [quality_filter]                                 # optional params
  * max_repeated_5gram_ratio = "0.2"
  * min_distinct_word_ratio  = "0.5"
  *
  * [split]
  * train_pct      = "80"
  * validation_pct = "10"
  * salt           = "split:"
  * }}}
  *
  * `run` folds the declared stages over [[CorpusPipeline]]'s library
  * transforms, so everything the config can express is exactly the
  * deterministic, partitioning-independent surface the oracle gate
  * already pins.
  */
final case class PipelineConfig(
    stages: Seq[String],
    params: Map[String, Map[String, String]]) {

  private def p(stage: String, key: String): Option[String] =
    params.getOrElse(stage, Map.empty).get(key)

  private def doubleParam(stage: String, key: String, dflt: Double): Double =
    p(stage, key).map { v =>
      try v.toDouble catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"[$stage] $key: '$v' is not a number")
      }
    }.getOrElse(dflt)

  private def intParam(stage: String, key: String, dflt: Int): Int =
    p(stage, key).map { v =>
      try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"[$stage] $key: '$v' is not an integer")
      }
    }.getOrElse(dflt)

  /** Apply the declared stages in order. `idCol`/`textCol` name the
    * document schema; the `split` stage adds its column.
    */
  def run(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    stages.foldLeft(docs) { (df, stage) =>
      stage match {
        case "quality_filter" => CorpusPipeline.qualityFilter(df, textCol,
          doubleParam(stage, "max_repeated_5gram_ratio", 0.2),
          doubleParam(stage, "min_distinct_word_ratio", 0.5))
        case "dedup_exact" => CorpusPipeline.dedupExact(df, idCol, textCol)
        case "split" => CorpusPipeline.withSplit(df, idCol,
          intParam(stage, "train_pct", 80),
          intParam(stage, "validation_pct", 10),
          p(stage, "salt").getOrElse("split:"))
        case other => throw new IllegalArgumentException(
          s"unknown stage '$other'") // unreachable post-parse; defensive
      }
    }
}

object PipelineConfig {

  private val KnownStages = Seq("quality_filter", "dedup_exact", "split")
  private val KnownKeys: Map[String, Set[String]] = Map(
    "pipeline" -> Set("stages"),
    "quality_filter" ->
      Set("max_repeated_5gram_ratio", "min_distinct_word_ratio"),
    "dedup_exact" -> Set.empty,
    "split" -> Set("train_pct", "validation_pct", "salt"))

  /** Parse and validate; `Left` carries the reference-style error
    * message (what was wrong AND what would be accepted).
    */
  def fromToml(text: String): Either[String, PipelineConfig] = {
    var section = ""
    var stages = Seq.empty[String]
    var sawPipeline = false
    var params = Map.empty[String, Map[String, String]]

    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && (t.head == '"' || t.head == '\'') && t.last == t.head)
        t.substring(1, t.length - 1)
      else t
    }

    for (rawLine <- text.linesIterator) {
      val line = graft.config.AppConfig.stripComment(rawLine).trim
      if (line.nonEmpty) {
        if (line.startsWith("[")) {
          section = line.stripPrefix("[").stripSuffix("]").trim
          if (section == "pipeline") sawPipeline = true
          else if (!KnownStages.contains(section))
            return Left(s"Unknown section [$section] in pipeline.toml. " +
              s"Valid sections: pipeline, ${KnownStages.mkString(", ")}")
        } else {
          val eq = line.indexOf('=')
          if (eq < 0) return Left(s"Invalid line in pipeline.toml: '$line'")
          val key = unquote(line.take(eq))
          val value = unquote(line.drop(eq + 1))
          if (section.isEmpty)
            return Left(s"Key '$key' outside any section")
          val known = KnownKeys.getOrElse(section, Set.empty)
          if (!known.contains(key))
            return Left(s"Unknown key '$key' in [$section]. " +
              (if (known.isEmpty) "This stage takes no parameters."
               else s"Valid keys: ${known.mkString(", ")}"))
          if (section == "pipeline" && key == "stages")
            stages = value.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          else params = params.updated(section,
            params.getOrElse(section, Map.empty).updated(key, value))
        }
      }
    }
    if (!sawPipeline) Left("Missing [pipeline] section")
    else if (stages.isEmpty) Left("[pipeline] stages must name at least one stage")
    else stages.find(!KnownStages.contains(_)) match {
      case Some(bad) => Left(s"Unknown stage '$bad' in stages. " +
        s"Valid stages: ${KnownStages.mkString(", ")}")
      case None =>
        params.keys.find(sec => !stages.contains(sec)) match {
          case Some(orphan) => Left(
            s"Section [$orphan] configures a stage not listed in stages")
          case None => Right(PipelineConfig(stages, params))
        }
    }
  }
}
