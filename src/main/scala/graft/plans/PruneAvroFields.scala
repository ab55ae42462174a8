package graft.plans

import org.apache.avro.Schema

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, GetStructField, NamedExpression}
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
  * Pruning is recursive over NESTED field paths: `decode(v).meta.id`
  * prunes both meta's siblings AND id's siblings inside meta (the
  * nested record keeps only the extracted leaves).
  *
  * Conservative trigger: within a Project, a given decode is rewritten
  * only if EVERY occurrence of it is under a `GetStructField` chain
  * (if the whole struct is also needed, pruning would decode twice).
  * All extractions of the same decode share one pruned schema, so the
  * rewritten decodes stay identical and codegen subexpression
  * elimination still evaluates the decode once.
  */
object PruneAvroFields extends Rule[LogicalPlan] {

  /** Which parts of a (record) subtree are needed. */
  private sealed trait Node
  /** The whole subtree is referenced — don't prune below here. */
  private case object Whole extends Node
  /** Only these field ordinals (each with its own sub-requirement). */
  private case class Keep(children: Map[Int, Node]) extends Node

  private def insert(n: Node, path: List[Int]): Node = (n, path) match {
    case (Whole, _) => Whole
    case (_, Nil) => Whole
    case (Keep(m), h :: t) =>
      Keep(m.updated(h, insert(m.getOrElse(h, Keep(Map.empty)), t)))
  }

  /** Ordinal remapping produced by a prune: old ordinal → new ordinal,
    * plus the nested remap for ordinals whose subtree was also pruned.
    */
  private case class Remap(ord: Map[Int, Int], children: Map[Int, Remap])
  private val identityRemap = Remap(Map.empty, Map.empty)

  private def isRecord(s: Schema): Boolean = s.getType == Schema.Type.RECORD

  /** Union-aware unwrap: Some(branch, nullable) for plain fields and
    * single-branch unions; None for multi-branch unions, which the
    * rule treats as opaque leaves — their siblings still prune, but
    * nothing inside a member struct does (dropping fields from one
    * branch's record would have to keep every branch readable for
    * Avro resolution AND remap the Spark member struct; the win is
    * small next to sibling pruning and the complexity is not).
    */
  private def unwrap(fs: Schema): Option[(Schema, Boolean)] = fs.getType match {
    case Schema.Type.UNION =>
      val (bs, nullable) = graft.functions.AvroStructConverter.branches(fs)
      if (bs.length == 1) Some((bs.head, nullable)) else None
    case _ => Some((fs, false))
  }

  private def rewrap(inner: Schema, nullable: Boolean): Schema =
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), inner)
    else inner

  /** Does pruning `s` by `node` actually drop anything? */
  private def drops(s: Schema, node: Node): Boolean = node match {
    case Whole => false
    case Keep(children) =>
      children.size < s.getFields.size ||
        children.exists { case (i, n) =>
          unwrap(s.getFields.get(i).schema()) match {
            case Some((fs, _)) => isRecord(fs) && drops(fs, n)
            case None => false // multi-union: opaque, never pruned below
          }
        }
  }

  /** Recursively pruned copy of a record schema (writer field order
    * preserved at every level — required for Avro resolution to
    * skip-read), plus the ordinal remap.
    */
  private def pruneSchema(s: Schema, node: Node): (Schema, Remap) = node match {
    case Whole => (s, identityRemap)
    case Keep(children) =>
      val keep = children.keys.toSeq.sorted
      var childRemaps = Map.empty[Int, Remap]
      val fields = keep.map { i =>
        val f = s.getFields.get(i)
        val sub = children(i)
        unwrap(f.schema()) match {
          case Some((fs, nullable)) if isRecord(fs) && drops(fs, sub) =>
            val (prunedInner, innerRemap) = pruneSchema(fs, sub)
            childRemaps += (i -> innerRemap)
            // drop the default: it may not conform to the pruned nested
            // schema, and reader⊆writer resolution never consults it
            new Schema.Field(f.name(), rewrap(prunedInner, nullable), f.doc())
          case _ =>
            new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
        }
      }
      val out = Schema.createRecord(s.getName, s.getDoc, s.getNamespace, false)
      out.setFields(java.util.Arrays.asList(fields: _*))
      (out, Remap(keep.zipWithIndex.toMap, childRemaps))
  }

  private def prunedSchemaJson(schemaJson: String, node: Node): (String, Remap) = {
    val (s, remap) = pruneSchema(new Schema.Parser().parse(schemaJson), node)
    (s.toString, remap)
  }

  /** The GetStructField chain rooted at an unpruned decode, path
    * root-first with the original result names.
    */
  private def stripChain(e: Expression): Option[(FromAvroGraft, List[(Int, Option[String])])] =
    e match {
      case GetStructField(child, ord, name) =>
        stripChain(child).map { case (f, p) => (f, p :+ ((ord, name))) }
      case f: FromAvroGraft if f.readerSchemaJson.isEmpty => Some((f, Nil))
      case _ => None
    }

  /** Record each decode occurrence with the MAXIMAL extraction chain
    * above it (Nil = bare whole-struct use, which blocks pruning).
    */
  private def collectUses(e: Expression,
                          acc: scala.collection.mutable.Buffer[(FromAvroGraft, List[(Int, Option[String])])]): Unit =
    e match {
      case g: GetStructField => stripChain(g) match {
        case Some(hit) => acc += hit
        case None => g.children.foreach(collectUses(_, acc))
      }
      case f: FromAvroGraft if f.readerSchemaJson.isEmpty => acc += ((f, Nil))
      case other => other.children.foreach(collectUses(_, acc))
    }

  private def rebuildChain(pruned: FromAvroGraft, rootRemap: Remap,
                           path: List[(Int, Option[String])]): Expression = {
    var expr: Expression = pruned
    var remap = rootRemap
    path.foreach { case (ord, name) =>
      expr = GetStructField(expr, remap.ord.getOrElse(ord, ord), name)
      remap = remap.children.getOrElse(ord, identityRemap)
    }
    expr
  }

  /** Rewrite `GetStructField`-chain uses inside one projection list
    * (the collapsed-Project shape).
    */
  private def rewriteDirect(p: Project): Project = {
    val uses = scala.collection.mutable.Buffer.empty[(FromAvroGraft, List[(Int, Option[String])])]
    p.projectList.foreach(collectUses(_, uses))
    if (uses.isEmpty) return p
    val rewrites: Map[FromAvroGraft, (FromAvroGraft, Remap)] =
      uses.groupBy(_._1).collect {
        case (f, fUses) if fUses.forall(_._2.nonEmpty) =>
          val tree = fUses.foldLeft(Keep(Map.empty): Node) { (n, u) =>
            insert(n, u._2.map(_._1))
          }
          (f, tree)
      }.collect {
        case (f, tree) if drops(new Schema.Parser().parse(f.schemaJson), tree) =>
          val (readerJson, remap) = prunedSchemaJson(f.schemaJson, tree)
          f -> ((f.copy(readerSchemaJson = Some(readerJson)), remap))
      }.toMap
    if (rewrites.isEmpty) p
    else p.copy(projectList = p.projectList.map(_.transform {
      case g: GetStructField => stripChain(g) match {
        case Some((f, path)) if rewrites.contains(f) =>
          val (pruned, remap) = rewrites(f)
          rebuildChain(pruned, remap, path)
        case _ => g
      }
    }.asInstanceOf[NamedExpression]))
  }

  /** The GetStructField chain rooted at an AttributeReference, path
    * root-first. Only attributes still carrying the UNPRUNED dataType
    * qualify (`origType` filter) — rebuilt chains carry the pruned
    * attribute type, which keeps the pre-order transform from firing a
    * second time on their inner nodes.
    */
  private def stripAttrChain(e: Expression,
                             origTypes: Map[Long, org.apache.spark.sql.types.DataType])
      : Option[(AttributeReference, List[(Int, Option[String])])] = e match {
    case GetStructField(child, ord, name) =>
      stripAttrChain(child, origTypes).map { case (a, p) => (a, p :+ ((ord, name))) }
    case a: AttributeReference
        if origTypes.get(a.exprId.id).contains(a.dataType) => Some((a, Nil))
    case _ => None
  }

  private def collectAttrUses(e: Expression,
                              origTypes: Map[Long, org.apache.spark.sql.types.DataType],
                              acc: scala.collection.mutable.Buffer[(Long, List[(Int, Option[String])])]): Unit =
    e match {
      case g: GetStructField => stripAttrChain(g, origTypes) match {
        case Some((a, path)) => acc += ((a.exprId.id, path))
        case None => g.children.foreach(collectAttrUses(_, origTypes, acc))
      }
      case a: AttributeReference if origTypes.contains(a.exprId.id) =>
        acc += ((a.exprId.id, Nil)) // bare whole-struct use: blocks pruning
      case other => other.children.foreach(collectAttrUses(_, origTypes, acc))
    }

  /** Rewrite the two-level shape CollapseProject leaves behind when the
    * decode is referenced more than once:
    * `Project(...struct-field extraction chains of attr...,
    *          Project(Alias(FromAvroGraft, attr), child))`.
    * Chains recurse into nested records exactly like [[rewriteDirect]].
    */
  private def rewriteAliased(outer: Project, inner: Project): Project = {
    val decodes = inner.projectList.collect {
      case a @ Alias(f: FromAvroGraft, _) if f.readerSchemaJson.isEmpty =>
        a.exprId.id -> (a, f)
    }.toMap
    if (decodes.isEmpty) return outer
    val origTypes = decodes.map { case (id, (_, f)) => id -> f.dataType }
    val uses = scala.collection.mutable.Buffer.empty[(Long, List[(Int, Option[String])])]
    outer.projectList.foreach(collectAttrUses(_, origTypes, uses))
    val rewrites: Map[Long, (String, Remap)] = uses.groupBy(_._1).collect {
      case (id, idUses) if idUses.forall(_._2.nonEmpty) =>
        val tree = idUses.foldLeft(Keep(Map.empty): Node) { (n, u) =>
          insert(n, u._2.map(_._1))
        }
        (id, tree)
    }.collect {
      case (id, tree)
          if drops(new Schema.Parser().parse(decodes(id)._2.schemaJson), tree) =>
        val (readerJson, remap) = prunedSchemaJson(decodes(id)._2.schemaJson, tree)
        id -> ((readerJson, remap))
    }.toMap
    if (rewrites.isEmpty) return outer
    val newInner = inner.copy(projectList = inner.projectList.map {
      case a @ Alias(f: FromAvroGraft, name) if rewrites.contains(a.exprId.id) =>
        val (readerJson, _) = rewrites(a.exprId.id)
        val pruned = f.copy(readerSchemaJson = Some(readerJson))
        Alias(pruned, name)(exprId = a.exprId, qualifier = a.qualifier)
      case other => other
    })
    val newOuter = outer.projectList.map(_.transform {
      case g: GetStructField => stripAttrChain(g, origTypes) match {
        case Some((a, path)) if rewrites.contains(a.exprId.id) =>
          val (readerJson, remap) = rewrites(a.exprId.id)
          val newType =
            decodes(a.exprId.id)._2.copy(readerSchemaJson = Some(readerJson)).dataType
          var expr: Expression = a.copy(dataType = newType)(a.exprId, a.qualifier)
          var r = remap
          path.foreach { case (ord, name) =>
            expr = GetStructField(expr, r.ord.getOrElse(ord, ord), name)
            r = r.children.getOrElse(ord, identityRemap)
          }
          expr
        case _ => g
      }
    }.asInstanceOf[NamedExpression])
    Project(newOuter, newInner)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, inner: Project) => rewriteDirect(rewriteAliased(p, inner))
    case p: Project => rewriteDirect(p)
  }
}
