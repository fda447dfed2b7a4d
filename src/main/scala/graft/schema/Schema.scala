package graft.schema

import graft.sqlx._

/** One table/view declaration from a zenodb-style schema file
  * (/root/reference/schema.go + table.go:34-64 TableOpts).
  */
final case class TableConfig(
    name: String,
    sql: String,
    isView: Boolean = false,
    retentionMillis: Option[Long] = None,
    backfillMillis: Option[Long] = None,
    maxFlushLatencyMillis: Option[Long] = None,
    minFlushLatencyMillis: Option[Long] = None,
    partitionBy: Seq[String] = Nil,
    // an `annindex:` entry declares a SIMSEARCH-queryable ANN index
    // instead of a table: the daemon registers it at boot (and on live
    // ALTER), so the console's vector search needs no Scala call.
    annIndexPath: Option[String] = None,
    annVecCol: String = "embedding",
    annIdCol: String = "id",
    annBaseTable: Option[String] = None,
    annRefineK: Int = 0,
    annQuantized: Boolean = true,
    // `maintain: true` enrolls the declared ANN index with the daemon's
    // maintenance loop (--maintain-interval), making the index lifecycle
    // fully config-driven: probed-fraction measured per tick, blue/green
    // re-cluster when over `maintainbudget`. An IVF-PQ index additionally
    // names its rebuild corpus with `maintainsource:` (a schema table whose
    // rows hold the original vectors — codes cannot re-cluster from
    // themselves); `maintaingc: true` opts into old-generation GC (reader
    // leases respected), `maintainnprobe:` sets the probe width the
    // trigger statistic is measured at.
    maintain: Boolean = false,
    maintainBudget: Double = 0.5,
    maintainNProbe: Int = 4,
    maintainSource: Option[String] = None,
    maintainGc: Boolean = false,
    // a `dedupindex:` entry declares a dedup-family index (exact /
    // near-dup / containment — the layout is detected at tick time) for
    // daemon maintenance, the declarative twin of
    // registerDedupMaintenance. It has no query surface of its own, so
    // `maintain: true` is REQUIRED (parse-validated); `maintainfiles:`
    // sets the fragmentation trigger (max files per prefix).
    dedupIndexPath: Option[String] = None,
    maintainFiles: Int = 16)

/** Minimal parser for the zenodb schema YAML subset: top-level table names,
  * scalar options, `sql: >`-folded blocks. (No external YAML dependency —
  * the grammar the reference actually uses is this small.)
  */
object SchemaParser {

  def parse(text: String): Seq[TableConfig] = {
    val lines = text.split("\n", -1)
    val tables = scala.collection.mutable.ArrayBuffer.empty[TableConfig]
    var cur: Option[TableConfig] = None
    var i = 0
    def flush(): Unit = { cur.foreach(tables += _); cur = None }
    while (i < lines.length) {
      val line = lines(i)
      val trimmed = line.trim
      if (trimmed.isEmpty || trimmed.startsWith("#")) i += 1
      else if (!line.head.isWhitespace && trimmed.endsWith(":")) {
        flush()
        cur = Some(TableConfig(trimmed.dropRight(1).trim.toLowerCase, sql = ""))
        i += 1
      } else if (cur.isDefined && line.head.isWhitespace) {
        val idx = trimmed.indexOf(':')
        require(idx > 0, s"bad schema line: '$line'")
        val key = trimmed.substring(0, idx).trim.toLowerCase
        val value = trimmed.substring(idx + 1).trim
        if (key == "sql" && (value == ">" || value == "|" || value.isEmpty)) {
          // folded block: consume following more-indented lines
          val baseIndent = line.takeWhile(_.isWhitespace).length
          val sb = new StringBuilder
          i += 1
          var done = false
          while (i < lines.length && !done) {
            val l = lines(i)
            if (l.trim.isEmpty) { sb.append('\n'); i += 1 }
            else if (l.takeWhile(_.isWhitespace).length > baseIndent) {
              sb.append(l.trim).append('\n'); i += 1
            } else done = true
          }
          cur = cur.map(_.copy(sql = sb.toString.trim))
        } else {
          cur = Some(applyOpt(cur.get, key, value))
          i += 1
        }
      } else {
        throw new IllegalArgumentException(s"unparseable schema line: '$line'")
      }
    }
    flush()
    // config mistakes fail HERE, named, not as a late NPE/parse error deep
    // in db construction or — worse — as silently wrong behavior
    locally {
      val dup = tables.groupBy(_.name).collectFirst {
        case (n, cs) if cs.size > 1 => n
      }
      // resolveSchema keys tables by name: a duplicate would silently drop
      // all but the LAST definition (a yaml copy-paste typo eating a table)
      require(dup.isEmpty, s"duplicate table '${dup.getOrElse("")}' in schema")
    }
    tables.foreach { c =>
      require(c.name.nonEmpty, "schema entry with an empty name")
      // an inert dedupindex declaration is always a misconfiguration: the
      // entry's only purpose is enrolling the daemon — fail loud at parse
      if (c.dedupIndexPath.isDefined && !c.maintain)
        throw new IllegalArgumentException(
          s"dedupindex entry '${c.name}' declares no maintenance — " +
            "add 'maintain: true' (dedupindex entries exist to enroll " +
            "the daemon's fragmentation maintenance)")
      if (c.annIndexPath.isEmpty && c.dedupIndexPath.isEmpty)
        require(c.sql.nonEmpty,
          s"table '${c.name}' needs sql: (only annindex:/dedupindex: " +
            "entries are sql-less)")
      // a NEGATIVE horizon silently drops every inserted point (the
      // truncation cutoff lands in the future); zero retains nothing
      for ((k, v) <- Seq(
          "retentionperiod" -> c.retentionMillis,
          "backfill" -> c.backfillMillis,
          "maxflushlatency" -> c.maxFlushLatencyMillis,
          "minflushlatency" -> c.minFlushLatencyMillis))
        v.foreach(ms => require(ms > 0,
          s"table '${c.name}': $k must be positive (got ${ms}ms)"))
    }
    tables.toSeq
  }

  private def applyOpt(c: TableConfig, key: String, value0: String): TableConfig = {
    val value = value0.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'")
    key match {
      case "sql"             => c.copy(sql = value)
      case "view"            => c.copy(isView = value.toBoolean)
      case "retentionperiod" => c.copy(retentionMillis = Some(Durations.parseMillis(value)))
      case "backfill"        => c.copy(backfillMillis = Some(Durations.parseMillis(value)))
      case "maxflushlatency" => c.copy(maxFlushLatencyMillis = Some(Durations.parseMillis(value)))
      case "minflushlatency" => c.copy(minFlushLatencyMillis = Some(Durations.parseMillis(value)))
      case "partitionby" =>
        val list = value.stripPrefix("[").stripSuffix("]")
          .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
        c.copy(partitionBy = list)
      case "annindex"   => c.copy(annIndexPath = Some(value))
      case "annvec"     => c.copy(annVecCol = value)
      case "annid"      => c.copy(annIdCol = value)
      case "annbase"    => c.copy(annBaseTable = Some(value.toLowerCase))
      case "annrefinek" => c.copy(annRefineK = value.toInt)
      case "annquantized" => c.copy(annQuantized = value.toBoolean)
      case "maintain"       => c.copy(maintain = value.toBoolean)
      case "maintainbudget" => c.copy(maintainBudget = value.toDouble)
      case "maintainnprobe" => c.copy(maintainNProbe = value.toInt)
      case "maintainsource" => c.copy(maintainSource = Some(value.toLowerCase))
      case "maintaingc"     => c.copy(maintainGc = value.toBoolean)
      case "dedupindex"     => c.copy(dedupIndexPath = Some(value))
      case "maintainfiles"  =>
        val v = value.toInt
        // fail loud at parse like the inert-dedupindex check: 0 would make
        // EVERY tick a full blue/green rewrite of the whole index (each
        // compaction leaves 1 file/prefix > 0) — unbounded I/O churn that
        // reads as normal 'compacted -> ...' status lines
        if (v < 1) throw new IllegalArgumentException(
          s"maintainfiles must be >= 1 (got $v): 0 or less re-compacts " +
            "the entire index on every maintenance tick")
        c.copy(maintainFiles = v)
      case other =>
        throw new IllegalArgumentException(s"unknown table option '$other'")
    }
  }

  /** Resolve a view against its parent table's definition
    * (/root/reference/table.go:194-250): the view derives fields / GROUP BY /
    * resolution from the parent when unspecified, merges WHERE clauses, and
    * is fed FROM THE SAME STREAM (it is its own independent materialization,
    * not a lazy view).
    */
  def resolveView(view: Query, parent: Query): Query = {
    val fields =
      if (view.selectAll && view.fields.isEmpty) parent.fields
      else if (view.selectAll) parent.fields ++
        view.fields.filterNot(f => parent.fields.exists(_.name == f.name))
      else view.fields.map { f =>
        f.expr match {
          // a bare column in a view SELECT refers to the parent field's
          // full defining expression
          case MBare(n) => parent.fields.find(_.name == n)
            .getOrElse(FieldSel(n, MBare(n)))
          case _ => f
        }
      }
    val where = (parent.where, view.where) match {
      case (Some(a), Some(b)) => Some(DAnd(a, b))
      case (a, b)             => a.orElse(b)
    }
    val (gb, gba) =
      if (view.groupByAll) (Seq.empty[GroupCol], true)
      else if (view.groupBy.nonEmpty) (view.groupBy, false)
      else (parent.groupBy, parent.groupByAll)
    Query(
      fields = fields,
      selectAll = false,
      from = parent.from, // the parent's STREAM
      where = where,
      groupBy = gb,
      groupByAll = gba,
      resolution = view.resolution.orElse(parent.resolution))
  }
}
