package graft.tools

import graft.{SparkEntry, XGolden}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Freezes the deterministic fixture-driven query outputs as TSV goldens
  * under src/main/resources/xgoldens/ (see XGolden for the contract and
  * why this is sound). Run once per intentional kernel change, review the
  * diff, commit:
  *
  *   sbt "runMain graft.tools.XOracleGen"
  *
  * Refuses NaN/Infinity (no stable SQL literal) and empty results (a
  * vacuous gate row — the round-1 lesson).
  */
object XOracleGen {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_REPO",
      System.getProperty("user.dir")), "src", "main", "resources", "xgoldens")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("xoracle-gen")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")


    XGolden.names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/nonexistent-by-contract")
      val schema = df.schema
      schema.fields.foreach { f =>
        f.dataType match {
          case StringType | IntegerType | LongType | DoubleType |
               FloatType | BooleanType => ()
          case t => sys.error(s"$name: unsupported golden column type $t")
        }
      }
      val rows = df.collect()
      require(rows.nonEmpty, s"$name: empty result — refusing a vacuous golden")
      val header = schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString("\t")
      val body = rows.map { r =>
        schema.fields.indices.map { i =>
          if (r.isNullAt(i)) "\\N"
          else schema.fields(i).dataType match {
            case StringType => XGolden.escape(r.getString(i))
            case DoubleType =>
              val d = r.getDouble(i)
              require(!d.isNaN && !d.isInfinite, s"$name col $i: $d")
              d.toString
            case FloatType =>
              val d = r.getFloat(i)
              require(!d.isNaN && !d.isInfinite, s"$name col $i: $d")
              d.toString
            case _ => r.get(i).toString
          }
        }.mkString("\t")
      }
      Files.write(outDir.resolve(s"$name.tsv"),
        ((header +: body.toSeq).mkString("\n") + "\n")
          .getBytes("UTF-8"))
      println(s"[xoracle] $name: ${rows.length} rows frozen")
    }
    spark.stop()
  }
}
