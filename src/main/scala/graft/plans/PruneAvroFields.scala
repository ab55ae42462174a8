package graft.plans

import org.apache.avro.Schema

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, GetStructField}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.FromAvroGraft

/** Optimizer rule: schema pruning through the Avro serde boundary.
  *
  * When a projection only extracts SOME fields of a decoded record —
  * `from_avro_graft(value).id` — decoding the full record materializes
  * every field (string/bytes allocations included) just to throw most
  * of them away. This rule rewrites the decode to use a pruned READER
  * schema containing only the referenced fields; Avro schema resolution
  * then skips the others during parsing (a skip is a length hop for
  * strings/bytes, no allocation). The Spark-native analogue of Parquet
  * nested-column pruning, applied across the serde boundary.
  *
  * Conservative trigger: within a Project, a given decode is rewritten
  * only if EVERY occurrence of it is directly under a `GetStructField`
  * (if the whole struct is also needed, pruning would decode twice).
  * All extractions of the same decode share one pruned schema, so the
  * rewritten decodes stay identical and codegen subexpression
  * elimination still evaluates the decode once.
  */
object PruneAvroFields extends Rule[LogicalPlan] {

  /** Pruned copy of `schemaJson` keeping only `ordinals` (writer field
    * order preserved — required for Avro resolution to skip-read).
    */
  private def prunedSchemaJson(schemaJson: String, ordinals: Seq[Int]): String = {
    val writer = new Schema.Parser().parse(schemaJson)
    val keep = ordinals.sorted
    val fields = keep.map { i =>
      val f = writer.getFields.get(i)
      new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    val out = Schema.createRecord(writer.getName, writer.getDoc,
      writer.getNamespace, false)
    out.setFields(java.util.Arrays.asList(fields: _*))
    out.toString
  }

  private def structSize(f: FromAvroGraft): Int =
    f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType].size

  /** Rewrite direct `GetStructField(FromAvroGraft)` uses inside one
    * projection list (the collapsed-Project shape).
    */
  private def rewriteDirect(p: Project): Project = {
    val all = p.projectList.flatMap(_.collect {
      case f: FromAvroGraft if f.readerSchemaJson.isEmpty => f
    })
    if (all.isEmpty) return p
    val extracted = p.projectList.flatMap(_.collect {
      case GetStructField(f: FromAvroGraft, ord, _)
          if f.readerSchemaJson.isEmpty => (f, ord)
    })
    val occurrences = all.groupBy(identity).view.mapValues(_.size).toMap
    val rewrites: Map[FromAvroGraft, (String, Map[Int, Int])] =
      extracted.groupBy(_._1).collect {
        case (f, uses)
            if uses.size == occurrences.getOrElse(f, 0) &&
              uses.map(_._2).distinct.size < structSize(f) =>
          val ords = uses.map(_._2).distinct.sorted
          f -> ((prunedSchemaJson(f.schemaJson, ords), ords.zipWithIndex.toMap))
      }.toMap
    if (rewrites.isEmpty) p
    else p.copy(projectList = p.projectList.map(_.transform {
      case GetStructField(f: FromAvroGraft, ord, name) if rewrites.contains(f) =>
        val (readerJson, remap) = rewrites(f)
        GetStructField(f.copy(readerSchemaJson = Some(readerJson)), remap(ord), name)
    }.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))
  }

  /** Rewrite the two-level shape CollapseProject leaves behind when the
    * decode is referenced more than once:
    * `Project(...struct-field extractions of attr...,
    *          Project(Alias(FromAvroGraft, attr), child))`.
    */
  private def rewriteAliased(outer: Project, inner: Project): Project = {
    val decodes = inner.projectList.collect {
      case a @ Alias(f: FromAvroGraft, _) if f.readerSchemaJson.isEmpty => a.exprId -> (a, f)
    }.toMap
    if (decodes.isEmpty) return outer
    // how each decode attribute is used in the outer projection
    val attrUses = outer.projectList.flatMap(_.collect {
      case a: AttributeReference if decodes.contains(a.exprId) => (a.exprId, None)
    })
    val fieldUses = outer.projectList.flatMap(_.collect {
      case GetStructField(a: AttributeReference, ord, _)
          if decodes.contains(a.exprId) => (a.exprId, Some(ord))
    })
    // AttributeReference matches inside GetStructField too: an id is
    // whole-struct-used iff it has more bare uses than field uses
    val bareCount = attrUses.groupBy(_._1).view.mapValues(_.size).toMap
    val fieldCount = fieldUses.groupBy(_._1).view.mapValues(_.size).toMap
    val rewrites = fieldUses.groupBy(_._1).collect {
      case (id, uses)
          if bareCount.getOrElse(id, 0) == fieldCount.getOrElse(id, 0) &&
            uses.flatMap(_._2).distinct.size < structSize(decodes(id)._2) =>
        val ords = uses.flatMap(_._2).distinct.sorted
        id -> ((prunedSchemaJson(decodes(id)._2.schemaJson, ords),
          ords.zipWithIndex.toMap))
    }
    if (rewrites.isEmpty) return outer
    val newInner = inner.copy(projectList = inner.projectList.map {
      case a @ Alias(f: FromAvroGraft, name) if rewrites.contains(a.exprId) =>
        val (readerJson, _) = rewrites(a.exprId)
        val pruned = f.copy(readerSchemaJson = Some(readerJson))
        Alias(pruned, name)(exprId = a.exprId, qualifier = a.qualifier)
      case other => other
    })
    val newOuter = outer.projectList.map(_.transform {
      case GetStructField(a: AttributeReference, ord, name)
          if rewrites.contains(a.exprId) =>
        val (readerJson, remap) = rewrites(a.exprId)
        val newType =
          decodes(a.exprId)._2.copy(readerSchemaJson = Some(readerJson)).dataType
        GetStructField(
          a.copy(dataType = newType)(a.exprId, a.qualifier), remap(ord), name)
    }.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression])
    Project(newOuter, newInner)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, inner: Project) => rewriteDirect(rewriteAliased(p, inner))
    case p: Project => rewriteDirect(p)
  }
}
