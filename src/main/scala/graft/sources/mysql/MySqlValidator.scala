package graft.sources.mysql

/** MySQL server-precondition validation — the reference's `MySqlValidator`
  * (`flink-connector-mysql-cdc/.../MySqlValidator.java:70-253`), as pure
  * checks over the values a live connection queries (`SELECT VERSION()`,
  * `SHOW GLOBAL VARIABLES LIKE 'binlog_…'`,
  * `TIME_TO_SEC(TIMEDIFF(NOW(), UTC_TIMESTAMP()))`). A CDC run against a
  * server in STATEMENT binlog mode or MINIMAL row image silently loses
  * change images — these refuse up front with the reference's wording.
  */
object MySqlValidator {

  val BinlogFormatRow = "ROW"
  val BinlogFormatImageFull = "FULL"
  val DefaultBinlogRowValueOptions = ""
  /** `TIME_ZONE_TOLERANCE_SECONDS` — NOW()-vs-UTC drift allowance. */
  val TimeZoneToleranceSeconds = 600

  /** `checkVersion:94` — first two version components, >= 5.6. */
  def checkVersion(version: String): Unit = {
    val nums = version.split("\\.").take(2).map(_.toInt)
    val ok =
      if (nums(0) > 5) true
      else if (nums(0) < 5) false
      else nums(1) >= 6
    if (!ok)
      throw new IllegalArgumentException(
        "Currently Flink MySql CDC connector only supports MySql " +
          s"whose version is larger or equal to 5.6, but actual is ${nums(0)}.${nums(1)}.")
  }

  /** `checkBinlogFormat:122`. */
  def checkBinlogFormat(mode0: String): Unit = {
    val mode = mode0.toUpperCase
    if (mode != BinlogFormatRow)
      throw new IllegalArgumentException(
        s"The MySQL server is configured with binlog_format $mode rather than " +
          s"$BinlogFormatRow, which is required for this connector to work properly. " +
          "Change the MySQL configuration to use a binlog_format=ROW and restart the connector.")
  }

  /** `checkBinlogRowImage:140`. */
  def checkBinlogRowImage(rowImage0: String): Unit = {
    val rowImage = rowImage0.toUpperCase
    if (rowImage != BinlogFormatImageFull)
      throw new IllegalArgumentException(
        s"The MySQL server is configured with binlog_row_image $rowImage rather than " +
          s"$BinlogFormatImageFull, which is required for this connector to work properly. " +
          "Change the MySQL configuration to use a binlog_row_image=FULL and restart the connector.")
  }

  /** `checkBinlogRowValueOptions:166` — PARTIAL_JSON can drop binlog events. */
  def checkBinlogRowValueOptions(options0: String): Unit = {
    val options = options0.trim.toUpperCase
    if (options != DefaultBinlogRowValueOptions)
      throw new IllegalArgumentException(
        s"The MySQL server is configured with binlog_row_value_options=$options, " +
          "which is possible to cause losing some binlog events for the mysql cdc connector. " +
          "Please remove the binlog_row_value_options setting in the MySQL server and rerun the job." +
          "See more details at https://dev.mysql.com/doc/refman/8.0/en/replication-features-json.html.")
  }

  /** `checkTimeZone:190` — the server's NOW()-vs-UTC drift must match the
    * CONFIGURED zone's offset (± tolerance; in daylight time the standard
    * offset one hour back is also accepted).
    */
  def checkTimeZone(
      timeDiffInSeconds: Int,
      configuredZone: String,
      configuredZoneOffsetSeconds: Int,
      inDaylightTime: Boolean = false): Unit = {
    def close(a: Long, b: Long) = math.abs(a - b) <= TimeZoneToleranceSeconds
    val matches =
      if (!inDaylightTime) close(timeDiffInSeconds, configuredZoneOffsetSeconds)
      else close(timeDiffInSeconds, configuredZoneOffsetSeconds) ||
        close(timeDiffInSeconds, configuredZoneOffsetSeconds - 3600L)
    if (!matches)
      throw new IllegalArgumentException(
        s"The MySQL server has a timezone offset (${math.abs(timeDiffInSeconds)} seconds " +
          s"${if (timeDiffInSeconds >= 0) "ahead of" else "behind"} UTC) which does not match " +
          s"the configured timezone $configuredZone. Specify the right server-time-zone to " +
          "avoid inconsistencies for time-related fields.")
  }
}
