package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Rejects output schemas containing types the driver's hasher canonicalizes
    * differently from its DuckDB oracle. Today that is DecimalType (round 7:
    * `c_lakehouse_agg` was value-exact vs the oracle yet failed hash_match —
    * the only decimal-output query of 108). Every comparison surface must cast
    * DECIMAL→DOUBLE (the q1_agg convention); this makes the pre-validation
    * loop fail LOUDLY instead of shipping a value-equal output the driver
    * hashes red. Checked recursively through struct/array/map.
    */
  def assertHashSafeSchema(name: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types._
    def fragile(dt: DataType): Option[String] = dt match {
      case _: DecimalType    => Some(dt.simpleString)
      case s: StructType     => s.fields.iterator.flatMap(f => fragile(f.dataType)).nextOption()
      case a: ArrayType      => fragile(a.elementType)
      case m: MapType        => fragile(m.keyType).orElse(fragile(m.valueType))
      case _                 => None
    }
    schema.fields.foreach { f =>
      fragile(f.dataType).foreach { t =>
        throw new IllegalStateException(
          s"query '$name' output column '${f.name}' has hash-fragile type $t: " +
            "cast to DOUBLE at the comparison surface (q1_agg convention)")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always runs the full registry with 2 args)
    val (sfDir, outDir, only) = args match {
      case Array(s, o) => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts is ns
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val written = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        Verify.assertHashSafeSchema(name, df.schema)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        written += name
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // per-component coverage self-report (SURVEY §2 enumeration — Coverage):
    // "green" here = the gate RAN and wrote output; the driver's DuckDB
    // compare is the value-level verdict on top
    if (only.isEmpty) {
      println("[verify] per-component gate coverage:")
      SparkEntry.components.toSeq.sortBy(_._1).foreach { case (comp, gates) =>
        val ok = gates.count(written.contains)
        println(f"[verify]   $ok%3d/${gates.size}%-3d $comp")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // belt-and-braces for the driver contract: never leave the driver's
    // correctness run hanging on a stray non-daemon thread
    sys.exit(0)
  }
}
