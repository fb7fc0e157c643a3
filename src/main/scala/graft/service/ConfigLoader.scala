package graft.service

import java.time.{Duration, Instant}

/** Config-file loader with the reference's keys, defaults, deprecations and
  * validation semantics (reference: config/config.go:141-251).
  *
  * The accepted format is the TOML subset hauser's example config actually
  * uses: `Key = value` lines (quoted strings, bools, Go-style durations,
  * RFC3339 times, trailing `#` comments) scoped by `[section]` headers.
  * Section headers prefix the keys that follow — `Timeout` under `[s3]`
  * becomes `s3.Timeout` — so same-named keys in different sections (the
  * reference has `Timeout`, `ExportTable`, `SyncTable`, `Bucket` in
  * several) never collide. Section names are case-folded like BurntSushi
  * toml's field matching; key names keep their written case.
  */
object ConfigLoader {

  val DefaultApiUrl = "https://api.fullstory.com"
  val DefaultSegmentId = "everyone"

  /** Parse a Go-style duration literal: "90s", "15m", "1h30m", "24h". */
  def parseDuration(s: String): Duration = {
    val re = "(\\d+)(h|m|s)".r
    val parts = re.findAllMatchIn(s.trim).toSeq
    require(parts.nonEmpty && parts.map(_.matched).mkString == s.trim.replace(" ", ""),
      s"invalid duration literal: $s")
    parts.foldLeft(Duration.ZERO) { (acc, m) =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "h" => acc.plusHours(n)
        case "m" => acc.plusMinutes(n)
        case "s" => acc.plusSeconds(n)
      }
    }
  }

  private def stripValue(v: String): String = {
    val t = v.trim
    if (t.startsWith("\"")) {
      val end = t.indexOf('"', 1)
      if (end > 0) t.substring(1, end) else t.stripPrefix("\"")
    } else t.split("#", 2)(0).trim
  }

  /** Section-aware parse of the TOML subset into a flat map with dotted
    * keys: top-level `Key`, `[Section]` `Key` -> `section.Key`. */
  def parseDoc(text: String): Map[String, String] = {
    var section = ""
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    for (raw <- text.linesIterator) {
      val l = raw.trim
      if (l.startsWith("[") && l.contains("]")) {
        section = l.substring(1, l.indexOf(']')).trim.toLowerCase
      } else if (l.nonEmpty && !l.startsWith("#") && l.contains("=")) {
        val Array(k, v) = l.split("=", 2)
        val key = (if (section.isEmpty) "" else s"$section.") + k.trim
        out(key) = stripValue(v)
      }
    }
    out.toMap
  }

  /** Parse + validate, returning the reference's WARNING/INFO log lines
    * alongside the config (config/config.go Validate): the
    * `GroupFilesByDay` and `Warehouse` deprecations, the local-provider
    * StorageOnly override, and the ExportDuration/StartTime default
    * notices. Callers that execute the lifecycle (Main) print them;
    * library callers can assert on them. */
  def parseWithWarnings(text: String,
                        now: () => Instant = () => Instant.now())
      : (ServiceConfig, Seq[String]) = {
    val kv = parseDoc(text)
    val warn = Seq.newBuilder[String]

    def bool(k: String, default: Boolean) =
      kv.get(k).map(_.toBoolean).getOrElse(default)
    def dur(k: String, default: Duration) =
      kv.get(k).map(parseDuration).getOrElse(default)

    // Provider, with the deprecated Warehouse fallback
    // (config/config.go:206-223)
    val provider = kv.get("Provider").filter(_.nonEmpty).orElse {
      kv.get("Warehouse").map { w =>
        val p = w match {
          case "local" => "local"
          case "redshift" => "aws"
          case "bigquery" => "gcp"
          case other => throw new IllegalArgumentException(
            s"warehouse type '$other' unrecognized")
        }
        warn += """WARNING: The "Warehouse" option is deprecated. Please use "Provider" instead."""
        p
      }
    }

    // GroupFilesByDay is honored (with its deprecation warning) only when
    // ExportDuration is unset — an explicit duration wins, silently, like
    // the reference (config/config.go:172-180)
    val durationSet = kv.contains("ExportDuration")
    val gfbd = bool("GroupFilesByDay", default = false) && !durationSet
    if (gfbd)
      warn += """WARNING: The "GroupFilesByDay" option is deprecated. Please use "ExportDuration" instead."""
    else if (!durationSet)
      warn += """INFO: "ExportDuration" not set in config. Defaulting to 1 hour"""

    // provider-specific StorageOnly folds (config/config.go:225-244):
    // local only supports storage; the deprecated per-section S3Only /
    // GCSOnly flags raise the main-level option
    var storageOnly = bool("StorageOnly", default = false)
    provider match {
      case Some("local") =>
        warn += """WARNING: The "local" provider only supports "StorageOnly = true"."""
        storageOnly = true
      case Some("aws") if bool("s3.S3Only", default = false) =>
        storageOnly = true
      case Some("gcp") if bool("gcs.GCSOnly", default = false) =>
        storageOnly = true
      case _ => ()
    }

    val startTime = kv.get("StartTime").map(Instant.parse).getOrElse {
      warn += """INFO: "StartTime" not set in config. Defaulting to 30 days in the past"""
      now().minus(Duration.ofDays(30))
    }

    val cfg = ServiceConfig(
      startTime = startTime,
      // defaults mirror config/config.go:18-21 (1h duration, 24h delay)
      exportDuration = dur("ExportDuration", Duration.ofHours(1)),
      exportDelay = dur("ExportDelay", Duration.ofHours(24)),
      backoff = dur("Backoff", Duration.ofSeconds(30)),
      backoffStepsMax = kv.get("BackoffStepsMax").map(_.toInt).getOrElse(8),
      storageOnly = storageOnly,
      saveAsJson = bool("SaveAsJson", default = false),
      groupFilesByDay = gfbd,
      includeMobile = bool("IncludeMobileAppsFields", default = false),
      useStartTime = bool("UseStartTime", default = false))
    (cfg, warn.result())
  }

  def parse(text: String): ServiceConfig = parseWithWarnings(text)._1
}
