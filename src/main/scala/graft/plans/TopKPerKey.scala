package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** GROUPED TOP-K — the third native whole-operator plan (after
  * [[AsOfJoinNode]] and [[IntervalAggNode]]): for every key, the k
  * best rows under (order desc, id asc), ranked 1..k.
  *
  * Why a physical operator: this operator plans the
  * partial-aggregation shape for RANKING — the same two-phase split
  * `HashAggregate` gets: a PARTIAL exec with NO distribution
  * requirement runs a bounded heap per (map-partition, key) and emits
  * at most k candidate rows per key per partition, so the exchange
  * that satisfies the FINAL exec's `ClusteredDistribution(key)`
  * carries at most partitions·keys·k rows instead of n. The final
  * exec re-heaps the candidates and emits ranks.
  *
  * Honest differential vs the built-in (measured, `TopKStress`):
  * Spark 4's `WindowGroupLimit` pushdown ALREADY cuts the shuffle to
  * per-partition rank-k survivors (partial mode below the exchange,
  * plan-verified), so at 100× on the orders table the two forms tie —
  * 1.71 s native vs 1.66 s window, min-of-2, result-identity asserted.
  * What the heap exec changes is the MEMORY shape, not the row counts:
  * the window form SORTS each map partition in full (O(n log n)
  * compares, a sort buffer sized by partition rows, spill under
  * pressure) where the heap does O(n log k) compares in
  * O(keys-per-partition · k) bounded state with no sort buffer at all.
  * That regime is REACHED and measured (r9, `TopKStress --flood`):
  * 20 M rows with 90% on one key across 4 fat partitions under a
  * 1.5 GB heap — native 2.2 s vs window 9.4 s, warm min-of-2, 4.3×,
  * result-identity asserted; the window form's per-partition
  * UnsafeExternalSorter pays the flooded partition's full sort under
  * memory pressure while the heap exec's state stays keys·k entries.
  * Both boundary rows stand: parity where partitions fit (orders at
  * 100×), 4.3× where one doesn't.
  *
  * Determinism: (order, id) with a unique non-null id is a TOTAL
  * order, so the retained set and the ranks are independent of arrival
  * order — the partial/final split cannot change the answer (the same
  * argument as partial aggregation's commutative monoid).
  *
  * Null/float semantics MIRROR the declarative window form (r9, was a
  * drop-nulls contract): a NULL key forms its own group exactly as
  * `PARTITION BY` groups nulls together; a NULL order ranks last
  * (`ORDER BY ord DESC` is NULLS LAST in Spark); a NULL tie id ranks
  * last among order-ties — the exec's tie contract is explicitly
  * `id.asc_nulls_last` (DuckDB's ASC default; Spark's plain `id ASC`
  * defaults to NULLS FIRST, so a declarative twin must spell
  * `asc_nulls_last`, as `topKPerKey`'s doc and the spec's comparison
  * window both do). Float/double driving
  * values are normalized before grouping/comparison (-0.0 → 0.0; NaN
  * canonicalizes via doubleToLongBits in boxed equals/hashCode) — the
  * same NormalizeFloatingNumbers discipline Catalyst applies to
  * window partition/sort keys, so native ≡ declarative holds on ALL
  * inputs, not just null-free integer-keyed ones.
  *
  * `ev_asof_native`'s discipline applies: the operator is gated by the
  * SAME DuckDB oracle as the declarative window form, so native ≡
  * declarative is machine-checked every round. */
case class TopKPerKeyNode(
    child: LogicalPlan,
    key: Attribute, order: Attribute, tieId: Attribute, k: Int,
    rankAttr: AttributeReference) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(Seq(rankAttr))
  override def references: AttributeSet =
    AttributeSet(child.output) // all child columns ride through
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(c, key, order, tid, k, rank) =>
      // the partial/final split HashAggregate gets, hand-planned: the
      // exchange between them (inserted by EnsureRequirements for the
      // final's ClusteredDistribution) sees only per-partition top-k
      // survivors
      TopKPerKeyExec(
        TopKPerKeyExec(planLater(c), key, order, tid, k, rank, partial = true),
        key, order, tid, k, rank, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    child: SparkPlan,
    key: Attribute, order: Attribute, tieId: Attribute, k: Int,
    rankAttr: AttributeReference, partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(Seq(key)) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val keyOrd = TypeUtils.getInterpretedOrdering(key.dataType)
    val ordOrd = TypeUtils.getInterpretedOrdering(order.dataType)
    val idOrd = TypeUtils.getInterpretedOrdering(tieId.dataType)
    val kk = k
    val isPartial = partial
    val out = output
    val rank = rankAttr
    // PARTIAL-STATE CAP (r13): the partial phase's bounded-heap state is
    // O(keys-per-partition · k) — bounded in ROWS RETAINED but not in
    // KEY CARDINALITY, and a high-cardinality key under a large k blows
    // the heap (found by measurement: the ×100 knn-graph build at the
    // corpus-derived degree 25 holds 200 k keys × 25 copied rows in
    // EVERY one of 32 concurrent map tasks — OOM at 16 GB). When a
    // partition's retained-entry count passes the cap, the current
    // survivors FLUSH to the exchange and the state restarts — the
    // ObjectHashAggregate fallback discipline: correctness is untouched
    // (the FINAL exec re-heaps everything per key; a flush only makes
    // the partial filter less selective on the flushed keys), memory is
    // truly bounded, and below the cap the plan is byte-identical to
    // the unflushed form. The final phase never flushes: it must see
    // every candidate of a key before ranking, and its post-exchange
    // state is keys-per-REDUCE-partition · k — the cap rides the
    // shuffle partition count there, the standard aggregate story.
    val maxEntries: Long =
      if (!isPartial) Long.MaxValue
      else {
        val raw = session.sessionState.conf
          .getConfString("spark.graft.topk.maxPartialEntries", (1L << 18).toString)
        // validate LOUD at plan time: a value ≤ 0 would make the consume
        // loop below spin forever (entries < maxEntries never holds, so
        // nothing inserts, drain() never fires, hasNext stays true — an
        // executor-side hang instead of a config error), and a
        // non-numeric value would surface as a raw NumberFormatException
        // mid-task (ADVICE r13)
        val parsed = try raw.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"spark.graft.topk.maxPartialEntries must be a positive integer, got '$raw'")
        }
        require(parsed > 0,
          s"spark.graft.topk.maxPartialEntries must be > 0, got $parsed")
        parsed
      }
    child.execute().mapPartitions({ iter =>
      val keyB = BindReferences.bindReference(key: Expression, childOut)
      val ordB = BindReferences.bindReference(order: Expression, childOut)
      val idB = BindReferences.bindReference(tieId: Expression, childOut)
      // NormalizeFloatingNumbers-style value normalization: -0.0 → 0.0
      // (x + 0.0 maps both zeros to +0.0; boxed NaN already canonicalizes
      // via doubleToLongBits in equals/hashCode), so float keys group and
      // float orders tie exactly as the window form's normalized keys do
      def norm(dt: org.apache.spark.sql.types.DataType): Any => Any = dt match {
        case org.apache.spark.sql.types.DoubleType =>
          v => if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Double] + 0.0d)
        case org.apache.spark.sql.types.FloatType =>
          v => if (v == null) null else java.lang.Float.valueOf(v.asInstanceOf[Float] + 0.0f)
        case _ => identity
      }
      val normK = norm(key.dataType)
      val normO = norm(order.dataType)
      val normI = norm(tieId.dataType)
      // "goodness": greater order wins (NULL order least good — DESC is
      // NULLS LAST), ties to the SMALLER id (NULL id least good — ASC is
      // NULLS LAST) — a total order when id is unique and non-null, so
      // retained sets are arrival-invariant
      case class Entry(ord: Any, id: Any, row: InternalRow)
      val better = new java.util.Comparator[Entry] {
        override def compare(a: Entry, b: Entry): Int = {
          val c =
            if (a.ord == null && b.ord == null) 0
            else if (a.ord == null) -1
            else if (b.ord == null) 1
            else ordOrd.compare(a.ord, b.ord)
          if (c != 0) c
          else if (a.id == null && b.id == null) 0
          else if (a.id == null) -1
          else if (b.id == null) 1
          else idOrd.compare(b.id, a.id) // smaller id = greater goodness
        }
      }
      // NULL keys form their own group, as PARTITION BY groups them — a
      // sentinel stands in because HashMap.get(null) can't share a slot
      // with "absent"
      val NullKey = new AnyRef
      // per-key bounded min-heap: head = least good retained entry
      var heaps = new java.util.HashMap[Any, java.util.PriorityQueue[Entry]]()
      var entries = 0L // rows currently retained across all heaps

      def insert(r: InternalRow): Unit = {
        val kv0 = keyB.eval(r)
        val kv = if (kv0 == null) NullKey else normK(kv0)
        val ov = normO(ordB.eval(r))
        val iv = normI(idB.eval(r))
        var h = heaps.get(kv)
        if (h == null) {
          h = new java.util.PriorityQueue[Entry](kk + 1, better)
          // map keys must own their storage: eval of an UnsafeRow-backed
          // attribute can return memory reused by the next row
          heaps.put(if (kv.asInstanceOf[AnyRef] eq NullKey) kv
            else InternalRow.copyValue(kv), h)
        }
        if (h.size < kk) {
          h.offer(Entry(InternalRow.copyValue(ov), InternalRow.copyValue(iv), r.copy()))
          entries += 1L
        } else if (better.compare(Entry(ov, iv, null), h.peek()) > 0) {
          h.poll()
          h.offer(Entry(InternalRow.copyValue(ov), InternalRow.copyValue(iv), r.copy()))
        }
      }

      // snapshot-and-reset emit of the current state (ranked in final
      // mode); the snapshot owns its map so a concurrent refill of
      // `heaps` during the next consume phase can't disturb it
      def drain(): Iterator[InternalRow] = {
        val snap = heaps
        heaps = new java.util.HashMap[Any, java.util.PriorityQueue[Entry]]()
        entries = 0L
        val keys = new java.util.ArrayList[Any](snap.keySet())
        // deterministic emit order, null-key group last (useful locally;
        // the gated query adds its own global orderBy over the
        // keys·k-row result)
        java.util.Collections.sort(keys, new java.util.Comparator[Any] {
          override def compare(a: Any, b: Any): Int = {
            val an = a.asInstanceOf[AnyRef] eq NullKey
            val bn = b.asInstanceOf[AnyRef] eq NullKey
            if (an && bn) 0 else if (an) 1 else if (bn) -1
            else keyOrd.compare(a, b)
          }
        })
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        val resultProj =
          if (isPartial) null
          else UnsafeProjection.create(out: Seq[Expression], childOut :+ rank)
        val it = keys.iterator()
        new Iterator[InternalRow] {
          private var buf: Array[Entry] = Array.empty
          private var pos = 0
          override def hasNext: Boolean = pos < buf.length || it.hasNext
          override def next(): InternalRow = {
            if (pos >= buf.length) {
              val h = snap.get(it.next())
              buf = new Array[Entry](h.size)
              var i = buf.length - 1
              while (i >= 0) { buf(i) = h.poll(); i -= 1 } // poll worst-first → best-first
              pos = 0
            }
            val e = buf(pos); pos += 1
            if (isPartial) e.row
            else { rankRow.update(0, pos.toLong); resultProj(joined(e.row, rankRow)) }
          }
        }
      }

      // consume-until-cap / drain cycles; the final phase's cap is
      // infinite, so it runs exactly one cycle (pre-r13 behavior)
      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        private def advance(): Unit = {
          while (!cur.hasNext && (iter.hasNext || !heaps.isEmpty)) {
            while (iter.hasNext && entries < maxEntries) insert(iter.next())
            if (!heaps.isEmpty) cur = drain()
          }
        }
        override def hasNext: Boolean = { advance(); cur.hasNext }
        override def next(): InternalRow = { advance(); cur.next() }
      }
    }, preservesPartitioning = true)
  }
}

object TopKPlans {

  /** Append [[TopKPerKeyStrategy]] to an existing session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
  }

  /** Per `keyCol`, the `k` best rows under (`orderCol` desc NULLS
    * LAST, `idCol` asc NULLS LAST), with a 1-based `rankName` column
    * appended — NULL keys form their own group, exactly as the window
    * form `row_number() OVER (PARTITION BY key ORDER BY ord DESC, id)`
    * treats them. */
  def topKPerKey(df: DataFrame, keyCol: String, orderCol: String,
      idCol: String, k: Int, rankName: String): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"topKPerKey: column '$name' not found in ${plan.output.map(_.name)}"))
    require(k > 0, s"topKPerKey: k must be positive, got $k")
    val node = TopKPerKeyNode(plan, attr(keyCol), attr(orderCol), attr(idCol), k,
      AttributeReference(rankName, LongType, nullable = false)())
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }
}
