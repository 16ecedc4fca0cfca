package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL maintenance procedures for the snapshot format — Spark 4's
  * native DSv2 `CALL` statement (ProcedureCatalog on [[SnapshotCatalog]]),
  * the Iceberg `CALL cat.system.<proc>` operational surface:
  *
  * {{{
  *   CALL g.system.rewrite_segments('events')     -- metadata-only manifest compaction
  *   CALL g.system.compact('events', 134217728)   -- transactional small-file rewrite
  *   CALL g.system.rollback('events', 7)          -- restore a prior version (history intact)
  *   CALL g.system.vacuum('events', 2)            -- reclaim unreferenced files
  * }}}
  *
  * Each procedure is the SQL face of the corresponding
  * [[SnapshotTable]] maintenance call — the logic lives there (and is
  * already oracled/spec-pinned); this layer only binds arguments and
  * reports the outcome as a result row, so a platform team can run the
  * table's whole day-2 lifecycle without leaving SQL. Results surface
  * what the call DID (versions published, segments/files/manifests
  * touched) — maintenance you can't observe is maintenance you can't
  * audit at 100 TB.
  *
  * Table arguments are catalog-relative names (`'t'` or `'ns.t'`),
  * resolved against the owning catalog's warehouse — never raw paths,
  * so a CALL cannot escape the catalog root.
  */
private[sources] object SnapshotProcedures {

  /** One procedure: UNBOUND and BOUND in one object — binding is
    * trivial because every parameter is declared with an exact type
    * (Spark coerces the CALL's literals to them before `call`). */
  private case class Proc(
      name: String,
      params: Seq[ProcedureParameter],
      out: StructType,
      override val description: String)(run: InternalRow => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    // maintenance mutates table state — never cache/reuse a CALL's plan
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val result = run(input)
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = result.toArray
        override def readSchema(): StructType = out
      }
      java.util.List.of(scan).iterator()
    }
  }

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  /** Optional parameter: the SQL-literal default applies when the CALL
    * omits it (positionally or with named arguments —
    * `CALL g.system.vacuum(table => 't')`). */
  private def pd(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def row(vs: Any*): Seq[InternalRow] =
    Seq(new GenericInternalRow(vs.toArray))

  private def procs(warehouse: String): Seq[Proc] = {
    // catalog-relative resolution: the CALL names a table of THIS
    // catalog, never an arbitrary filesystem path
    def path(input: InternalRow): String = {
      val name = input.getUTF8String(0).toString
      require(!name.contains("/") && !name.contains(".."),
        s"procedure table arguments are catalog-relative names, got '$name'")
      val t = (warehouse +: name.split('.').toSeq).mkString("/")
      require(SnapshotTable.currentVersion(t) > 0, s"no snapshot table '$name' in this catalog")
      t
    }
    Seq(
      Proc("rewrite_segments",
        Seq(p("table", StringType), pd("smaller_than", IntegerType, "10000")),
        StructType(Seq(
          StructField("segments_before", IntegerType, nullable = false),
          StructField("segments_after", IntegerType, nullable = false),
          StructField("version", LongType, nullable = false))),
        "metadata-only manifest compaction: re-bundle segments smaller than " +
          "`smaller_than` files; zero data files touched") { in =>
        val (before, after, v) = SnapshotTable.rewriteSegments(path(in), in.getInt(1))
        row(before, after, v)
      },
      Proc("compact",
        Seq(p("table", StringType), pd("target_bytes", LongType, "134217728"),
          pd("zorder_by", StringType, "''")),
        StructType(Seq(
          StructField("files_before", IntegerType, nullable = false),
          StructField("version", LongType, nullable = false))),
        "transactional small-file compaction: rewrite the current snapshot " +
          "into ~target_bytes files, published as a new version; " +
          "zorder_by => 'a,b' clusters the rewrite on the Morton interleave " +
          "of the named columns so selective reads on ANY of them prune at " +
          "the manifest (Delta's OPTIMIZE ZORDER BY)") { in =>
        val cols =
          if (in.isNullAt(2)) Nil
          else in.getUTF8String(2).toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val (files, v) =
          if (cols.isEmpty)
            SnapshotTable.compactSnapshot(SparkSession.active, path(in), in.getLong(1))
          else
            SnapshotTable.compactZOrder(SparkSession.active, path(in), cols, in.getLong(1))
        row(files, v)
      },
      Proc("consolidate_dvs",
        Seq(p("table", StringType)),
        StructType(Seq(
          StructField("sidecars_before", IntegerType, nullable = false),
          StructField("sidecars_after", IntegerType, nullable = false),
          StructField("distinct_keys", LongType, nullable = false))),
        "rewrite the outstanding deletion-vector chain into one deduped, " +
          "range-tagged sidecar per effective sequence — zero data files " +
          "touched; the maintenance mid-point between trickle-CDC reads " +
          "and full compaction") { in =>
        val (before, after, keys) =
          SnapshotTable.consolidateDeleteVectors(SparkSession.active, path(in))
        row(before, after, keys)
      },
      Proc("expire_snapshots",
        Seq(p("table", StringType), p("older_than", LongType)),
        StructType(Seq(
          StructField("manifests_expired", IntegerType, nullable = false),
          StructField("data_files_deleted", IntegerType, nullable = false))),
        "age-based retention (Iceberg's expire_snapshots): expire every " +
          "snapshot whose recorded commit stamp is below older_than — head " +
          "always kept, stampless commits kept (age unprovable), files shared " +
          "with survivors survive; expired versions refuse time travel") { in =>
        val (manifests, files) =
          SnapshotTable.expireSnapshots(path(in), in.getLong(1))
        row(manifests, files)
      },
      Proc("rollback",
        Seq(p("table", StringType), p("to_version", LongType)),
        StructType(Seq(
          StructField("previous_version", LongType, nullable = false),
          StructField("restored_from", LongType, nullable = false),
          StructField("version", LongType, nullable = false))),
        "restore a prior version's exact state as a NEW commit (history intact)") { in =>
        val t = path(in)
        val prev = SnapshotTable.currentVersion(t)
        val v = SnapshotTable.rollback(t, in.getLong(1))
        row(prev, in.getLong(1), v)
      },
      Proc("create_branch",
        Seq(p("table", StringType), p("branch", StringType)),
        StructType(Seq(
          StructField("fork_of", LongType, nullable = false),
          StructField("branch_version", LongType, nullable = false))),
        "fork the current snapshot into a branch (one metadata write — " +
          "forking a 100 TB table costs nothing); write to it as " +
          "<catalog>.<table>.branches.<branch>, main's readers see nothing") { in =>
        val t = path(in)
        val forkOf = SnapshotTable.currentVersion(t)
        val v = SnapshotTable.createBranch(t, in.getUTF8String(1).toString)
        row(forkOf, v)
      },
      Proc("publish_branch",
        Seq(p("table", StringType), p("branch", StringType)),
        StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("mode", StringType, nullable = false))),
        "write-audit-publish gate: fast-forward main onto the audited branch " +
          "head in ONE metadata commit (refused if main moved since the fork); " +
          "pure-append branches publish as mode=append so incremental readers survive") { in =>
        val t = path(in)
        val v = SnapshotTable.publishBranch(t, in.getUTF8String(1).toString)
        row(v, org.apache.spark.unsafe.types.UTF8String.fromString(
          SnapshotTable.manifest(t, v).extra.getOrElse("mode", "?")))
      },
      Proc("drop_branch",
        Seq(p("table", StringType), p("branch", StringType)),
        StructType(Seq(
          StructField("manifests_deleted", IntegerType, nullable = false),
          StructField("data_files_deleted", IntegerType, nullable = false))),
        "drop a branch: its manifest chain always, its data/segment files only " +
          "when no MAIN manifest references them (an audit-failed branch reclaims " +
          "its writes; a published branch's files survive)") { in =>
        val (manifests, files) = SnapshotTable.dropBranch(path(in), in.getUTF8String(1).toString)
        row(manifests, files)
      },
      Proc("compact_fragmented",
        Seq(p("table", StringType), pd("target_bytes", LongType, (128L << 20).toString)),
        StructType(Seq(
          StructField("groups_rewritten", IntegerType, nullable = false),
          StructField("files_rewritten", IntegerType, nullable = false),
          StructField("version", LongType, nullable = false))),
        "SELECTIVE layout maintenance (Iceberg's filtered " +
          "rewrite_data_files): rewrite only the groups fragmented across " +
          ">1 file, carrying single-file groups and cold periods verbatim — " +
          "the scheduled pass that consolidates today's streaming appends " +
          "without paying a year of cold data") { in =>
        val (groups, files, v) = SnapshotTable.compactFragmented(
          SparkSession.active, path(in), in.getLong(1))
        row(groups, files, v)
      },
      Proc("compact_evolved",
        Seq(p("table", StringType), pd("target_bytes", LongType, (128L << 20).toString)),
        StructType(Seq(
          StructField("files_rewritten", IntegerType, nullable = false),
          StructField("version", LongType, nullable = false))),
        "GENERATION-TARGETED compaction after partition-spec evolution: " +
          "rewrite only the files stamped under PAST layout generations " +
          "through the current spec, carrying the new generation verbatim — " +
          "O(old generation) instead of compactSnapshot's O(table), and the " +
          "scan's key grouping (SPJ) returns once every file holds a " +
          "current-spec stamp") { in =>
        val (files, v) = SnapshotTable.compactEvolved(
          SparkSession.active, path(in), in.getLong(1))
        row(files, v)
      },
      Proc("create_tag",
        Seq(p("table", StringType), p("tag", StringType),
          pd("version", LongType, "-1")),
        StructType(Seq(
          StructField("tag", StringType, nullable = false),
          StructField("version", LongType, nullable = false))),
        "tag a published snapshot with an immutable name (Iceberg tag refs): " +
          "resolvable via VERSION AS OF 'name', PINS retention — vacuum and " +
          "expire_snapshots keep tagged manifests and their files regardless " +
          "of age; version defaults to the current head") { in =>
        val t = path(in)
        val name = in.getUTF8String(1).toString
        val ver = if (in.getLong(2) < 0) None else Some(in.getLong(2))
        val v = SnapshotTable.createTag(t, name, ver)
        row(org.apache.spark.unsafe.types.UTF8String.fromString(name), v)
      },
      Proc("drop_tag",
        Seq(p("table", StringType), p("tag", StringType)),
        StructType(Seq(
          StructField("existed", BooleanType, nullable = false))),
        "drop a tag: the name frees and the snapshot returns to ordinary " +
          "retention rules") { in =>
        row(java.lang.Boolean.valueOf(
          SnapshotTable.dropTag(path(in), in.getUTF8String(1).toString)))
      },
      Proc("vacuum",
        Seq(p("table", StringType), pd("retain_last", IntegerType, "2")),
        StructType(Seq(
          StructField("manifests_deleted", IntegerType, nullable = false),
          StructField("data_files_deleted", IntegerType, nullable = false))),
        "retention: keep the last `retain_last` snapshots, reclaim manifests " +
          "and data files nothing retained references") { in =>
        val (manifests, files) = SnapshotTable.vacuum(path(in), in.getInt(1))
        row(manifests, files)
      })
  }

  def names: Seq[String] = Seq(
    "rewrite_segments", "compact", "rollback", "vacuum", "expire_snapshots",
    "consolidate_dvs", "create_branch", "publish_branch", "drop_branch",
    "create_tag", "drop_tag", "compact_fragmented", "compact_evolved")

  def load(name: String, warehouse: String): UnboundProcedure =
    procs(warehouse).find(_.name == name).getOrElse(
      throw new RuntimeException(
        s"unknown procedure '$name' — available under <catalog>.system: ${names.mkString(", ")}"))

  def idents(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty
}
