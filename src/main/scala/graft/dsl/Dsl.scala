package graft.dsl

import graft.ast._
import graft.ast.PropertyValue._

/** Fluent traversal builder mirroring the reference SDK surface
  * (g().n_with_label(..).out(..).count() — sdks/rust/src/dsl.rs
  * builder methods, 3377-4262). Runtime-checked rather than
  * typestate-checked; the compiler validates stream kinds.
  */
final case class Tr(t: Traversal) {
  private def +(s: Step) = Tr(t + s)

  // sources
  def n(): Tr = this + Step.N(NodeRef.All)
  def n(ids: Long*): Tr = this + Step.N(NodeRef.Ids(ids))
  def nVar(name: String): Tr = this + Step.N(NodeRef.Var(name))
  def nWhere(p: Predicate): Tr = this + Step.NWhere(p)
  def nWithLabel(l: String): Tr = this + Step.NWhere(Predicate.Eq("$label", VString(l)))
  def nWithLabelWhere(l: String, p: Predicate): Tr =
    this + Step.NWhere(Predicate.And(Seq(Predicate.Eq("$label", VString(l)), p)))
  def e(): Tr = this + Step.E(EdgeRef.All)
  def eWhere(p: Predicate): Tr = this + Step.EWhere(p)
  def eWithLabel(l: String): Tr = this + Step.EWhere(Predicate.Eq("$label", VString(l)))
  def eWithLabelWhere(l: String, p: Predicate): Tr =
    this + Step.EWhere(Predicate.And(Seq(Predicate.Eq("$label", VString(l)), p)))
  def vectorSearchNodes(label: String, prop: String, q: Seq[Float], k: Int,
      tenant: Option[PropertyValue] = None): Tr =
    this + Step.VectorSearchNodes(label, prop, tenant.map(PropertyInput.Value),
      PropertyInput.Value(VF32Array(q)), StreamBound.Literal(k))
  def textSearchNodes(label: String, prop: String, q: String, k: Int,
      tenant: Option[PropertyValue] = None): Tr =
    this + Step.TextSearchNodes(label, prop, tenant.map(PropertyInput.Value),
      PropertyInput.Value(VString(q)), StreamBound.Literal(k))
  def vectorSearchEdges(label: String, prop: String, q: Seq[Float], k: Int,
      tenant: Option[PropertyValue] = None): Tr =
    this + Step.VectorSearchEdges(label, prop, tenant.map(PropertyInput.Value),
      PropertyInput.Value(VF32Array(q)), StreamBound.Literal(k))
  def textSearchEdges(label: String, prop: String, q: String, k: Int,
      tenant: Option[PropertyValue] = None): Tr =
    this + Step.TextSearchEdges(label, prop, tenant.map(PropertyInput.Value),
      PropertyInput.Value(VString(q)), StreamBound.Literal(k))
  def inject(v: String): Tr = this + Step.Inject(v)

  // navigation
  def out(l: String): Tr = this + Step.Out(Some(l))
  def out(): Tr = this + Step.Out(None)
  def in(l: String): Tr = this + Step.In(Some(l))
  def in(): Tr = this + Step.In(None)
  def both(l: String): Tr = this + Step.Both(Some(l))
  def both(): Tr = this + Step.Both(None)
  def outE(l: String): Tr = this + Step.OutE(Some(l))
  def outE(): Tr = this + Step.OutE(None)
  def inE(l: String): Tr = this + Step.InE(Some(l))
  def inE(): Tr = this + Step.InE(None)
  def bothE(l: String): Tr = this + Step.BothE(Some(l))
  def bothE(): Tr = this + Step.BothE(None)
  def outN(): Tr = this + Step.OutN
  def inN(): Tr = this + Step.InN
  def otherN(): Tr = this + Step.OtherN

  // filters
  def has(p: String, v: PropertyValue): Tr = this + Step.Has(p, v)
  def has(p: String, v: String): Tr = this + Step.Has(p, VString(v))
  def has(p: String, v: Long): Tr = this + Step.Has(p, VI64(v))
  def hasLabel(l: String): Tr = this + Step.HasLabel(l)
  def hasKey(p: String): Tr = this + Step.HasKey(p)
  def where(p: Predicate): Tr = this + Step.Where(p)
  def dedup(): Tr = this + Step.Dedup
  def within(v: String): Tr = this + Step.Within(v)
  def without(v: String): Tr = this + Step.Without(v)
  def edgeHas(p: String, v: PropertyValue): Tr = this + Step.EdgeHas(p, PropertyInput.Value(v))
  def edgeHasLabel(l: String): Tr = this + Step.EdgeHasLabel(l)

  // sort / page
  def orderBy(p: String, o: SortOrder = SortOrder.Asc): Tr = this + Step.OrderBy(p, o)
  def orderByMultiple(ks: (String, SortOrder)*): Tr = this + Step.OrderByMultiple(ks)
  def limit(n: Long): Tr = this + Step.Limit(n)
  def skip(n: Long): Tr = this + Step.Skip(n)
  def range(a: Long, b: Long): Tr = this + Step.Range(a, b)
  def limitBy(e: Expr): Tr = this + Step.LimitBy(e)

  // aggregations
  def group(p: String): Tr = this + Step.Group(p)
  def groupCount(p: String): Tr = this + Step.GroupCount(p)
  def aggregateBy(fn: AggFn, p: String): Tr = this + Step.AggregateBy(fn, p)
  def fold(): Tr = this + Step.Fold
  def unfold(): Tr = this + Step.Unfold

  // terminals
  def count(): Tr = this + Step.Count
  def exists(): Tr = this + Step.Exists
  def id(): Tr = this + Step.Id
  def label(): Tr = this + Step.Label
  def values(ps: String*): Tr = this + Step.Values(ps)
  def valueMap(): Tr = this + Step.ValueMap(None)
  def valueMap(ps: String*): Tr = this + Step.ValueMap(Some(ps))
  def project(ps: Projection*): Tr = this + Step.Project(ps)
  def projectBindings(ps: BindingProjection*): Tr = this + Step.ProjectBindings(ps, distinct = false)
  def projectDistinctBindings(ps: BindingProjection*): Tr = this + Step.ProjectBindings(ps, distinct = true)
  def edgeProperties(): Tr = this + Step.EdgeProperties

  // control flow
  def as(name: String): Tr = this + Step.As(name)
  def store(name: String): Tr = this + Step.StoreVar(name)
  def select(name: String): Tr = this + Step.SelectVar(name)
  def bind(name: String): Tr = this + Step.Bind(name)
  def union(bs: Tr*): Tr = this + Step.Union(bs.map(_.t))
  def choose(p: Predicate, thenT: Tr, elseT: Tr): Tr =
    this + Step.Choose(p, thenT.t, Some(elseT.t))
  def choose(p: Predicate, thenT: Tr): Tr = this + Step.Choose(p, thenT.t, None)
  def coalesceSteps(bs: Tr*): Tr = this + Step.Coalesce(bs.map(_.t))
  def optional(b: Tr): Tr = this + Step.Optional(b.t)
  def repeat(cfg: RepeatConfig): Tr = this + Step.Repeat(cfg)
  def repeat(body: Tr, times: Int): Tr =
    this + Step.Repeat(RepeatConfig(body.t, times = Some(times)))

  // mutations
  def addN(label: String, props: (String, PropertyValue)*): Tr =
    this + Step.AddN(label, props.map { case (k, v) => k -> (PropertyInput.Value(v): PropertyInput) })
  def addNIn(label: String, props: (String, PropertyInput)*): Tr =
    this + Step.AddN(label, props)
  def addE(label: String, to: NodeRef, props: (String, PropertyValue)*): Tr =
    this + Step.AddE(label, to, props.map { case (k, v) => k -> (PropertyInput.Value(v): PropertyInput) })
  def addEIn(label: String, to: NodeRef, props: (String, PropertyInput)*): Tr =
    this + Step.AddE(label, to, props)
  def setProperty(name: String, v: PropertyValue): Tr =
    this + Step.SetProperty(name, PropertyInput.Value(v))
  def removeProperty(name: String): Tr = this + Step.RemoveProperty(name)
  def drop(): Tr = this + Step.Drop

  // index DDL (dsl.rs:3121-3167 create/drop index builders)
  def createIndex(spec: IndexSpec, ifNotExists: Boolean = true): Tr =
    this + Step.CreateIndex(spec, ifNotExists)
  def dropIndex(spec: IndexSpec): Tr = this + Step.DropIndex(spec)
  def createTextIndexNodes(l: String, p: String, tenant: Option[String] = None): Tr =
    this + Step.CreateTextIndexNodes(l, p, tenant)
  def createTextIndexEdges(l: String, p: String, tenant: Option[String] = None): Tr =
    this + Step.CreateTextIndexEdges(l, p, tenant)
  def createVectorIndexNodes(l: String, p: String, tenant: Option[String] = None): Tr =
    this + Step.CreateVectorIndexNodes(l, p, tenant)
  def createVectorIndexEdges(l: String, p: String, tenant: Option[String] = None): Tr =
    this + Step.CreateVectorIndexEdges(l, p, tenant)
}

object Dsl {
  /** Entry point: g().nWithLabel("Customer").out("PLACED").count() */
  def g(): Tr = Tr(Traversal.empty)
  /** Sub-traversal entry for union/choose/coalesce/repeat bodies. */
  def sub(): Tr = Tr(Traversal.empty)

  // predicate helpers
  import Predicate._
  def eq_(p: String, v: PropertyValue): Predicate = Eq(p, v)
  def eq_(p: String, v: String): Predicate = Eq(p, VString(v))
  def eq_(p: String, v: Long): Predicate = Eq(p, VI64(v))
  def gt(p: String, v: Double): Predicate = Gt(p, VF64(v))
  def gt(p: String, v: Long): Predicate = Gt(p, VI64(v))
  def gte(p: String, v: Double): Predicate = Gte(p, VF64(v))
  def lt(p: String, v: Double): Predicate = Lt(p, VF64(v))
  def lt(p: String, v: Long): Predicate = Lt(p, VI64(v))
  def lte(p: String, v: Double): Predicate = Lte(p, VF64(v))
  def between(p: String, lo: PropertyValue, hi: PropertyValue): Predicate = Between(p, lo, hi)
  def startsWith(p: String, s: String): Predicate = StartsWith(p, s)
  def endsWith(p: String, s: String): Predicate = EndsWith(p, s)
  def containsStr(p: String, s: String): Predicate = Contains(p, s)
  def isIn(p: String, vs: PropertyValue*): Predicate = IsIn(p, vs)
  def and(ps: Predicate*): Predicate = And(ps)
  def or(ps: Predicate*): Predicate = Or(ps)
  def not(p: Predicate): Predicate = Not(p)
  def prop(n: String): Expr = Expr.Property(n)
  def lit_(v: Long): Expr = Expr.Constant(VI64(v))
  def lit_(v: Double): Expr = Expr.Constant(VF64(v))
  def lit_(v: String): Expr = Expr.Constant(VString(v))
}
