package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Sessions
import graft.extract.{EntitySource, ParquetEntitySource}
import graft.model.{ColumnMapping, ExtractConfig, TableConfig, TargetType}
import graft.sinks.Fs

/** Config generator (K6, reference `subgraph_config_generator`,
  * cli.py:383-487) as a non-interactive CLI: discovers a subgraph's
  * extractable tables and emits a ready-to-edit JSON config with the
  * reference's default partition tiers and the default uint64
  * clamp-with-validity mapping for every numeric column.
  *
  * Usage: runMain graft.tools.ConfigGen <sourceRoot> <subgraphName> <outPath>
  */
object ConfigGen {

  /** ≈ 1 month / 1 week / 1 day / 1.5 h of gnosis blocks
    * (cli.py:450-456).
    */
  val DefaultTiers: Seq[Long] = Seq(524288L, 131072L, 16384L, 1024L)

  val Uint64Max: BigInt = BigInt("18446744073709551615")

  def generate(spark: SparkSession, source: EntitySource,
      subgraphName: String): ExtractConfig = {
    val cat = source.catalog(spark).getOrElse(subgraphName,
      throw new IllegalArgumentException(s"unknown subgraph: $subgraphName"))
    val tables = source.tableNames(spark, cat.schemaName).map { t =>
      val numericCols = source.columnTypes(spark, cat.schemaName, t)
        .collect { case (c, "numeric") => c }.toSeq.sorted
      // default mapping mirrors the generator's uint64 clamp
      // (cli.py:477-484): value <= uint64max ? value : 0, plus validity
      val mappings = numericCols.map { c =>
        c -> Seq(ColumnMapping(s"${c}_uint64", TargetType.UInt64,
          maxValue = Some(Uint64Max), default = Some(BigInt(0)),
          validityColumn = Some(s"${c}_uint64_valid")))
      }.toMap
      t -> TableConfig(DefaultTiers, mappings)
    }.toMap
    ExtractConfig(
      name = subgraphName,
      version = "0.0.1",
      subgraph = subgraphName,
      tables = tables)
  }

  /** Interactive flow mirroring the reference generator
    * (cli.py:383-487): pick a subgraph from the catalog, multi-select
    * its extractable tables (with optional LIMIT-10 preview, S5), and
    * emit the config with default tiers + uint64 mappings. Input/output
    * are injected so tests drive it with scripted answers; the real CLI
    * passes stdin/stdout.
    */
  def interactive(spark: SparkSession, source: EntitySource,
      in: java.io.BufferedReader, out: java.io.PrintStream): ExtractConfig = {
    def ask(prompt: String): String = {
      out.print(prompt); out.flush()
      Option(in.readLine()).getOrElse("").trim
    }
    // reprompt on invalid input (reference TUI behavior) — but give up
    // after a few attempts so a scripted/closed stdin can't loop forever
    @annotation.tailrec
    def askValid[A](prompt: String, parse: String => A, attempts: Int = 3): A = {
      val raw = ask(prompt)
      scala.util.Try(parse(raw)) match {
        case scala.util.Success(v) => v
        case scala.util.Failure(e) =>
          if (attempts <= 1) throw new IllegalArgumentException(
            s"invalid input '$raw': ${e.getMessage}")
          out.println(s"  invalid input '$raw', try again")
          askValid(prompt, parse, attempts - 1)
      }
    }
    val cat = source.catalog(spark)
    val names = cat.keys.toSeq.sorted
    out.println("Subgraphs:")
    names.zipWithIndex.foreach { case (n, i) =>
      out.println(s"  [$i] $n (${cat(n).network}, blocks ${cat(n).earliestBlock}..${cat(n).latestBlock})")
    }
    val subgraph = askValid(s"Pick subgraph [0-${names.size - 1}]: ",
      s => names(s.toInt))

    val all = source.tableNames(spark, cat(subgraph).schemaName)
    out.println(s"Extractable tables in ${cat(subgraph).schemaName}:")
    all.zipWithIndex.foreach { case (t, i) => out.println(s"  [$i] $t") }
    val sel = askValid("Tables (comma-separated indexes, or 'all'): ", {
      case "" | "all" => all
      case csv =>
        csv.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
          .toSeq.distinct.map(all)
    })

    if (ask("Preview tables? [y/N]: ").equalsIgnoreCase("y"))
      sel.foreach { t =>
        out.println(s"-- $t (first 10 rows)")
        source.scanRange(spark, cat(subgraph).schemaName, t, 0L, Long.MaxValue)
          .limit(10).collect().foreach(r => out.println("   " + r.toString))
      }

    val full = generate(spark, source, subgraph)
    full.copy(tables = full.tables.view.filterKeys(sel.contains).toMap)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-configgen")
    try {
      val (cfg, outPath) = args match {
        case Array(sourceRoot, "--interactive", path) =>
          (interactive(spark, new ParquetEntitySource(sourceRoot),
            new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
            System.out), path)
        case Array(sourceRoot, subgraphName, path) =>
          (generate(spark, new ParquetEntitySource(sourceRoot), subgraphName), path)
        case other => throw new IllegalArgumentException(
          s"usage: ConfigGen <sourceRoot> (<subgraph>|--interactive) <outPath>; got ${other.mkString(" ")}")
      }
      Fs.writeString(outPath, ExtractConfig.toJson(cfg),
        spark.sparkContext.hadoopConfiguration)
      println(s"wrote $outPath")
    } finally spark.stop()
  }
}
