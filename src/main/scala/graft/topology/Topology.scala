package graft.topology

import org.apache.spark.sql.DataFrame

/** The source→mapping→sink wiring layer (reference
  * `config/MappingConfiguration.java:31-42`,
  * `IncomingRequestProcessor.java:51-137`): mappings subscribe to sources,
  * sinks subscribe to mappings, many-to-many; per-mapping discard flags for
  * corrupt/duplicate events (`Mapping.java:102-126`); one schema per sink
  * (`config/constraint/OneSchemaPerSink.java`, `SchemaRegistry.java:65-79`).
  *
  * In Spark terms a topology is a DAG of DataFrames: each source frame is
  * shared (cache-once, fan-out-many — the reference's queue fan-out
  * collapses into plan reuse), each (mapping × sink) pair becomes one output
  * frame the caller writes with its sink of choice.
  */
final case class MappingSpec(
    name: String,
    sources: Seq[String],
    mapper: DataFrame => DataFrame,
    schemaName: String,
    discardCorrupted: Boolean = false,
    discardDuplicates: Boolean = false)

final case class SinkSpec(name: String, mappings: Seq[String])

final class Topology(mappings: Seq[MappingSpec], sinks: Seq[SinkSpec]) {

  /** Reference semantics: a sink that names no mappings receives ALL of
    * them (the unspecified-list default of the reference's config layer) —
    * normalized BEFORE validation so one-schema-per-sink covers the
    * defaulted set too, and apply() never reduces an empty list. */
  private val normSinks: Seq[SinkSpec] = sinks.map(s =>
    if (s.mappings.isEmpty) s.copy(mappings = mappings.map(_.name)) else s)

  // ---- startup validation (reference: ValidatedConfiguration fail-fast)
  {
    val mappingNames = mappings.map(_.name)
    require(mappingNames.distinct.size == mappingNames.size, "duplicate mapping names")
    val sinkNames = sinks.map(_.name)
    require(sinkNames.distinct.size == sinkNames.size,
      s"duplicate sink names: ${sinkNames.diff(sinkNames.distinct).distinct}" +
        " (toMap would silently drop a sink's mappings)")
    val known = mappingNames.toSet
    normSinks.foreach { s =>
      val missing = s.mappings.filterNot(known)
      require(missing.isEmpty, s"sink '${s.name}' references unknown mappings: $missing")
      // one-schema-per-sink: all mappings feeding a sink must share a schema
      val schemas = s.mappings.map(m => mappings.find(_.name == m).get.schemaName).distinct
      require(schemas.size <= 1,
        s"sink '${s.name}' would receive multiple schemas: $schemas " +
          "(reference constraint OneSchemaPerSink)")
    }
  }

  /** Run the topology over the given source frames. Returns the frame each
    * sink receives (union of its mappings' outputs). Source frames consumed
    * by multiple mappings are cached once before fan-out. */
  def apply(sources: Map[String, DataFrame]): Map[String, DataFrame] = {
    import org.apache.spark.sql.functions.col
    val sourceUses = mappings.flatMap(_.sources).groupBy(identity).view.mapValues(_.size)
    val shared = sources.map { case (name, df) =>
      // streaming frames can't cache(); Spark shares the streaming source
      // across the queries natively, so fan-out just reuses the plan
      name -> (if (sourceUses.getOrElse(name, 0) > 1 && !df.isStreaming) df.cache() else df)
    }
    import org.apache.spark.sql.functions.{coalesce, lit}
    val mapped: Map[String, DataFrame] = mappings.map { m =>
      // reference default: a mapping that names no sources reads ALL of
      // them; heterogeneous source shapes (browser vs JSON frames) union
      // with allowMissingColumns — the mapping layer itself handles the
      // missing sub-records (DefaultMapping's optCol)
      val srcNames = if (m.sources.isEmpty) sources.keys.toSeq.sorted else m.sources
      val in = srcNames.map(s => shared.getOrElse(s,
        throw new IllegalArgumentException(s"mapping '${m.name}' needs missing source '$s'")))
        .reduce(_.unionByName(_, allowMissingColumns = true))
      var out = m.mapper(in)
      // NULL flags (a source without the transport column) must KEEP the
      // row: the reference's flags are primitive booleans that default
      // false, and filter(!NULL) = filter(NULL) silently drops the row
      if (m.discardCorrupted && out.columns.contains("detectedCorruption"))
        out = out.filter(!coalesce(col("detectedCorruption"), lit(false)))
      if (m.discardDuplicates && out.columns.contains("detectedDuplicate"))
        out = out.filter(!coalesce(col("detectedDuplicate"), lit(false)))
      m.name -> out
    }.toMap
    normSinks.map { s =>
      s.name -> s.mappings.map(mapped).reduce(_ unionByName _)
    }.toMap
  }
}
