package graft.service

import java.time.{Duration, Instant}

/** Config-file loader with the reference's keys, defaults, deprecations and
  * validation semantics (reference: config/config.go:141-251). Accepts a
  * simple `Key = value` line format (the TOML subset hauser actually uses:
  * scalar keys, quoted strings, bools, Go-style durations, RFC3339 times).
  */
object ConfigLoader {

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

  def parse(text: String): ServiceConfig = {
    val kv = text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("[") && l.contains("="))
      .map { l =>
        val Array(k, v) = l.split("=", 2)
        k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap

    def bool(k: String, default: Boolean) =
      kv.get(k).map(_.toBoolean).getOrElse(default)
    def dur(k: String, default: Duration) =
      kv.get(k).map(parseDuration).getOrElse(default)

    ServiceConfig(
      startTime = kv.get("StartTime").map(Instant.parse)
        .getOrElse(Instant.EPOCH),
      // defaults mirror config/config.go:18-21 (1h duration, 24h delay)
      exportDuration = dur("ExportDuration", Duration.ofHours(1)),
      exportDelay = dur("ExportDelay", Duration.ofHours(24)),
      backoff = dur("Backoff", Duration.ofSeconds(30)),
      backoffStepsMax = kv.get("BackoffStepsMax").map(_.toInt).getOrElse(8),
      storageOnly = bool("StorageOnly", default = false),
      saveAsJson = bool("SaveAsJson", default = false),
      // legacy alias: GroupFilesByDay forces 24h bundles
      // (reference: config/config.go:174-180)
      groupFilesByDay = bool("GroupFilesByDay", default = false),
      includeMobile = bool("IncludeMobileAppsFields", default = false),
      useStartTime = bool("UseStartTime", default = false))
  }
}
