package graft.substrate

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Driver-side reads of METADATA-scale parquet tables — manifests and
  * meta rows — WITHOUT scheduling a Spark job. A real table format's
  * commit path reads its manifests with plain file I/O; resolving an
  * O(#files) manifest through a cluster job pays full job-scheduling
  * latency per metadata lookup, and a derived publish chains several
  * such lookups (ancestry gate, provenance stamp, unreferenced sweep,
  * version listing) — the r13 bench measured the tiny-job storm
  * dominating the stored-index entries' walls. At 100 TB the same
  * property matters for a different reason: commit/serve planning must
  * not occupy cluster resources or queue behind running queries.
  *
  * Scope: SIMPLE scalar schemas only (strings and ints/longs, nullable)
  * — the manifest's (file, cell) and the meta row. Corpus-sized tables
  * and array-typed tables (codes, codebook, centroids) stay Spark
  * scans; relational manifest ALGEBRA (vacuum anti-joins, the
  * DataFrame-typed changedCells split) stays DataFrame — this is only
  * the bounded driver-side collect path, done without a job.
  */
private[substrate] object MetaIo {

  /** All rows of every `*.parquet` file directly under `dir`, as
    * parquet example Groups. Empty when the directory is absent.
    */
  def groups(conf: Configuration, dir: String): Seq[Group] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Seq.empty
    val files = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    files.flatMap { f =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), f)
        .withConf(conf)
        .build()
      try Iterator.continually(reader.read()).takeWhile(_ != null).toVector
      finally reader.close()
    }
  }

  /** Nullable integral field (parquet INT32 or INT64) by name. */
  def optLong(g: Group, name: String): Option[Long] = {
    val t = g.getType
    if (!t.containsField(name)) return None
    if (g.getFieldRepetitionCount(name) == 0) return None
    t.getType(name).asPrimitiveType().getPrimitiveTypeName match {
      case PrimitiveTypeName.INT32 => Some(g.getInteger(name, 0).toLong)
      case PrimitiveTypeName.INT64 => Some(g.getLong(name, 0))
      case other => throw new IllegalStateException(
        s"metadata field $name is $other, expected an integral type")
    }
  }

  /** Nullable string field by name. */
  def optString(g: Group, name: String): Option[String] = {
    if (!g.getType.containsField(name)) return None
    if (g.getFieldRepetitionCount(name) == 0) return None
    Some(g.getString(name, 0))
  }
}
