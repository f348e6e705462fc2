package graft.sources.mysql

import org.scalatest.funsuite.AnyFunSuite

/** 1:1 transcription of `MySqlValidatorTest`
  * (`flink-connector-mysql-cdc/src/test/.../MySqlValidatorTest.java`): the
  * server-precondition refusal wordings for version, binlog_format,
  * binlog_row_image and timezone mismatch (the container-backed harness only
  * supplies the queried values; the assertions are on the validator).
  */
class MySqlValidatorRefSpec extends AnyFunSuite {

  // testValidateVersion:66 (V5_5 → refuse; the @Disabled note is about the
  // container's driver, not the expectation)
  test("version below 5.6 refuses; 5.6+, 8.x pass") {
    val e = intercept[IllegalArgumentException](MySqlValidator.checkVersion("5.5.62"))
    assert(e.getMessage ==
      "Currently Flink MySql CDC connector only supports MySql " +
        "whose version is larger or equal to 5.6, but actual is 5.5.")
    MySqlValidator.checkVersion("5.6.51")
    MySqlValidator.checkVersion("5.7.36")
    MySqlValidator.checkVersion("8.0.27")
    intercept[IllegalArgumentException](MySqlValidator.checkVersion("4.1.22"))
  }

  // testValidateBinlogFormat:78
  test("binlog_format must be ROW") {
    val e = intercept[IllegalArgumentException](
      MySqlValidator.checkBinlogFormat("STATEMENT"))
    assert(e.getMessage ==
      "The MySQL server is configured with binlog_format STATEMENT rather than ROW, " +
        "which is required for this connector to work properly. Change the MySQL " +
        "configuration to use a binlog_format=ROW and restart the connector.")
    MySqlValidator.checkBinlogFormat("ROW")
    MySqlValidator.checkBinlogFormat("row") // SHOW VARIABLES value upper-cases
  }

  // testValidateBinlogRowImage:96
  test("binlog_row_image must be FULL") {
    val e = intercept[IllegalArgumentException](
      MySqlValidator.checkBinlogRowImage("MINIMAL"))
    assert(e.getMessage ==
      "The MySQL server is configured with binlog_row_image MINIMAL rather than FULL, " +
        "which is required for this connector to work properly. Change the MySQL " +
        "configuration to use a binlog_row_image=FULL and restart the connector.")
    MySqlValidator.checkBinlogRowImage("FULL")
  }

  // MySqlValidator.checkBinlogRowValueOptions:166 (no dedicated test method —
  // the validate() chain runs it between row-image and timezone)
  test("binlog_row_value_options must be unset") {
    val e = intercept[IllegalArgumentException](
      MySqlValidator.checkBinlogRowValueOptions("PARTIAL_JSON"))
    assert(e.getMessage.contains(
      "binlog_row_value_options=PARTIAL_JSON, which is possible to cause losing"))
    MySqlValidator.checkBinlogRowValueOptions("")
    MySqlValidator.checkBinlogRowValueOptions("  ")
  }

  // testValidateTimezone:114 — server at +12:34 (45240 s) vs configured UTC
  test("server timezone offset must match the configured zone") {
    val e = intercept[IllegalArgumentException] {
      MySqlValidator.checkTimeZone(
        timeDiffInSeconds = 45240, configuredZone = "UTC",
        configuredZoneOffsetSeconds = 0)
    }
    assert(e.getMessage ==
      "The MySQL server has a timezone offset (45240 seconds ahead of UTC) which does " +
        "not match the configured timezone UTC. Specify the right server-time-zone to " +
        "avoid inconsistencies for time-related fields.")
    // within tolerance passes; daylight time accepts the standard offset too
    MySqlValidator.checkTimeZone(10, "UTC", 0)
    MySqlValidator.checkTimeZone(3600, "Europe/Berlin", 7200, inDaylightTime = true)
    val behind = intercept[IllegalArgumentException] {
      MySqlValidator.checkTimeZone(-18000, "UTC", 0)
    }
    assert(behind.getMessage.contains("(18000 seconds behind UTC)"))
  }
}
