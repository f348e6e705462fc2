package graft.pipeline

/** Factory option validation — the reference's `FactoryHelper`
  * (`flink-cdc-common/.../factories/FactoryHelper.java:57-150`): a factory
  * declares required and optional typed options; validation checks (in this
  * order) that every required option is present, that every declared option's
  * value parses at its declared type, and that no unconsumed keys remain —
  * with `validateExcept(prefixes…)` skipping pass-through namespaces
  * (`debezium.*`, `properties.*`, graft's `driver.*`).
  */
object FactoryOptions {

  sealed trait OptionType {
    /** throws if `raw` is not a value of this type. */
    def parse(raw: String): Any
  }
  case object IntType extends OptionType { def parse(raw: String): Any = raw.trim.toInt }
  case object DoubleType extends OptionType { def parse(raw: String): Any = raw.trim.toDouble }
  case object BooleanType extends OptionType {
    def parse(raw: String): Any = raw.trim.toLowerCase match {
      case "true" => true
      case "false" => false
      case other => throw new IllegalArgumentException(s"not a boolean: $other")
    }
  }
  case object StringType extends OptionType { def parse(raw: String): Any = raw }
  /** `ConfigOptions.key(...).mapType()`: `k1:v1,k2:v2`. */
  case object MapType extends OptionType {
    def parse(raw: String): Any =
      raw.split(",").filter(_.nonEmpty).map { kv =>
        kv.split(":", 2) match {
          case Array(k, v) => k.trim -> v.trim
          case _ => throw new IllegalArgumentException(s"not a key:value entry: $kv")
        }
      }.toMap
  }

  final case class ConfigOpt(key: String, tpe: OptionType, default: Option[String] = None)

  /** `validateFactoryOptions` (:66-87): missing-required check first (a
    * present-but-unparseable REQUIRED value surfaces as the parse error from
    * the presence probe), then every present optional parses.
    */
  def validateFactoryOptions(
      required: Set[ConfigOpt],
      optional: Set[ConfigOpt],
      config: Map[String, String]): Unit = {
    def get(opt: ConfigOpt): Option[Any] =
      config.get(opt.key).orElse(opt.default).map { raw =>
        try opt.tpe.parse(raw)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"Could not parse value '$raw' for key '${opt.key}'.", e)
        }
      }
    val missing = required.toSeq.filter(get(_).isEmpty).map(_.key).sorted
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        "One or more required options are missing.\n\n" +
          "Missing required options are:\n\n" + missing.mkString("\n"))
    optional.foreach(get)
  }

  /** `validateUnconsumedKeys` (:90-106). */
  def validateUnconsumedKeys(
      factoryIdentifier: String,
      allOptionKeys: Set[String],
      consumedOptionKeys: Set[String]): Unit = {
    val remaining = allOptionKeys -- consumedOptionKeys
    if (remaining.nonEmpty)
      throw new IllegalArgumentException(
        s"Unsupported options found for '$factoryIdentifier'.\n\n" +
          "Unsupported options:\n\n" + remaining.toSeq.sorted.mkString("\n") +
          "\n\nSupported options:\n\n" + consumedOptionKeys.mkString("\n"))
  }

  /** `FactoryHelper.validate` (:108-119). */
  def validate(
      identifier: String,
      required: Set[ConfigOpt],
      optional: Set[ConfigOpt],
      config: Map[String, String]): Unit = {
    validateFactoryOptions(required, optional, config)
    validateUnconsumedKeys(
      identifier, config.keySet, (required ++ optional).map(_.key))
  }

  /** `FactoryHelper.validateExcept` (:121-150): keys under any given prefix
    * are exempt from the unconsumed-key check (still no typed parse — they
    * pass through verbatim).
    */
  def validateExcept(
      identifier: String,
      required: Set[ConfigOpt],
      optional: Set[ConfigOpt],
      config: Map[String, String],
      prefixesToSkip: String*): Unit = {
    require(prefixesToSkip.nonEmpty, "Prefixes to skip can not be empty.")
    validateFactoryOptions(required, optional, config)
    val filteredKeys = config.keySet.filterNot(k => prefixesToSkip.exists(k.startsWith))
    validateUnconsumedKeys(identifier, filteredKeys, (required ++ optional).map(_.key))
  }
}
