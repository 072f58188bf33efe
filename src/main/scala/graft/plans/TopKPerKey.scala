package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, Descending, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode,
  UnsafeExternalRowSorter}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.LongType

/** Per-key top-k as a first-class operator — logical node + strategy +
  * physical exec, the (c)-tier extension point
  * (`LogicalPlan`/`SparkStrategy`/`SparkPlan` via
  * `SparkSessionExtensions`) that the rest of the engine deliberately
  * avoids when built-ins suffice.
  *
  * Here the built-in CAN express the semantics —
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) ≤ k` — but
  * its physical plan cannot express the RESOURCE bound: WindowExec
  * sorts the ENTIRE key partition (every row of the 100 TB fact table
  * flows through an UnsafeExternalSorter, spilling at scale) to then
  * discard all but k rows per key. [[TopKPerKeyExec]] replaces the
  * per-partition full sort with one bounded heap per key: O(k) memory
  * per key instead of O(rows-per-key), no sort, no spill, same single
  * hash shuffle on the key (`requiredChildDistribution` lets
  * EnsureRequirements plan the exchange exactly as for the window).
  * Rows stream through `compare + occasional heap replace` — the
  * skew-resistant shape: a hot key costs O(n·log k) comparisons and
  * k retained rows, where WindowExec pays an O(n·log n) sort and n
  * buffered rows.
  *
  * Ties: the operator keeps the FIRST k rows in `order`; callers must
  * make `order` a TOTAL order (append a unique tiebreak column, as
  * every oracled query in this repo already does) or the retained set
  * is nondeterministic — same contract as `row_number`.
  */
object TopKPerKey {
  /** Append-rank per-key top-k over `df`. The result carries `df`'s
    * columns plus `rankName` (1-based BIGINT rank within the key in
    * the requested order). `orderBy` entries are (column, descending?).
    * Columns are resolved by name against `df` directly (pre-project
    * derived expressions) — the node is injected below the analyzer,
    * so it works with already-resolved attributes only. Inter-key
    * output order is unspecified, as with any aggregate — order the
    * final result explicitly. */
  def topKPerKey(df: DataFrame, keys: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int, rankName: String = "rk")
      : DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains(rankName),
      s"rank column '$rankName' collides with an existing column; " +
        s"pass a distinct rankName")
    val child = PlanBridge.logicalPlan(df)
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column '$n' not found in ${child.output.map(_.name)}"))
    val keyExprs: Seq[Expression] = keys.map { n =>
      val a = attr(n)
      // Raw UnsafeProjection key bytes bypass the NormalizeFloatingNumbers
      // treatment a logical groupBy gets: -0.0 vs 0.0 and NaN bit patterns
      // would split float/double keys into distinct groups and silently
      // diverge from the row_number window twin. Reject rather than
      // normalize — no caller has a float key, and an explicit error beats
      // a latent grouping divergence.
      require(!a.dataType.isInstanceOf[org.apache.spark.sql.types.FloatType]
          && !a.dataType.isInstanceOf[org.apache.spark.sql.types.DoubleType],
        s"float/double key column '$n' not supported (raw-byte grouping " +
          s"does not normalize -0.0/NaN); cast or hash the key first")
      a: Expression
    }
    val sortExprs = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    PlanBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keyExprs, sortExprs, k, rankAttr, child))
  }
}

/** Logical per-key top-k. `rankAttr` travels in the constructor so
  * `copy()` under rule rewrites preserves the exprId parent plans
  * reference. */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan)
      : TopKPerKeyPlan = copy(child = c)
}

/** Plans [[TopKPerKeyPlan]] to a PARTIAL + FINAL [[TopKPerKeyExec]]
  * pair — the same two-phase shape as hash aggregation: the partial
  * node runs the bounded heap over each INPUT partition with no
  * distribution requirement, so at most k rows per (key, partition)
  * reach the exchange (at 100 TB the shuffle carries keys·k·partitions
  * rows, not the fact table); the final node re-heaps after the
  * key shuffle and assigns ranks. Top-k is mergeable (the top-k of a
  * union is the top-k of the per-part top-ks), which is what makes the
  * partial pass lossless. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * `spark.experimental.extraStrategies` (GraftCatalog). */
object TopKPerKeyStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr,
        TopKPerKeyExec(keys, order, k, rankAttr, planLater(child),
          partial = true)) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k. `partial = true` is the map-side phase:
  * no required distribution, emits the retained rows UNRANKED (child
  * schema) — ranks can only be assigned once all of a key's rows are
  * co-located. `partial = false` (final) requires the key cluster,
  * re-heaps the survivors and appends the 1-based rank. */
object TopKPerKeyExec {
  /** Partial-phase flush bound (retained rows per partition before the
    * heap map is emitted and cleared): ~1M rows ≈ low hundreds of MB
    * at typical row widths, far below executor memory, while still
    * giving the map-side reduction plenty of keys to fold. Override
    * per session with `graft.topk.partialFlushRows` (specs set it to a
    * handful to exercise the flush path). */
  val DefaultPartialFlushRows: Int = 1 << 20

  /** Final-phase retained-rows bound before the exec abandons the
    * all-keys-in-one-heap-map fast path and falls back to a
    * spill-capable external sort (sort by key then order, stream ranks
    * group-at-a-time) — the HashAggregateExec sort-fallback shape. The
    * fast path is O(keys-in-partition × k) with no spill; with
    * low partition counts × high key cardinality × large k that is an
    * executor OOM, and this operator is the ranking backbone for ~20
    * queries. 4M rows ≈ several hundred MB at typical row widths.
    * Override with `graft.topk.finalRetainedRows`. */
  val DefaultFinalRetainedRows: Int = 1 << 22
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, child: SparkPlan,
    partial: Boolean = false)
    extends UnaryExecNode {
  import org.apache.spark.sql.execution.metric.SQLMetrics

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  /** The rank attribute is born here (it rides the constructor only so
    * `copy()` preserves its exprId) — declare it produced or the plan
    * printer flags the node `!` as missing input. */
  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rankAttr)

  override lazy val metrics =
    if (partial) Map(
      "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
        "output rows"),
      // NOT distinct keys: a key spanning multiple flush chunks folds
      // once per chunk, so this counts heap-map groups folded
      "numHeapGroups" -> SQLMetrics.createMetric(sparkContext,
        "heap groups folded (once per key per flush chunk)"),
      "numReplacements" -> SQLMetrics.createMetric(sparkContext,
        "heap replacements (rows that displaced a retained row)"))
    else Map(
      "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
        "output rows"),
      "numKeys" -> SQLMetrics.createMetric(sparkContext, "distinct keys"),
      "numReplacements" -> SQLMetrics.createMetric(sparkContext,
        "heap replacements (rows that displaced a retained row)"),
      "numFallbackSorts" -> SQLMetrics.createMetric(sparkContext,
        "partitions that fell back to external sort (exceeded " +
          "graft.topk.finalRetainedRows)"))

  /** Final phase: one hash shuffle on the key — the same distribution
    * the window twin needs, so the exchange cost is identical;
    * everything past the exchange is where the operator wins. Partial
    * phase: none — it folds whatever partitioning arrives, emitting
    * ≤ k rows per (key, partition) into the exchange. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kLocal = k
    val partialLocal = partial
    val outRows = longMetric("numOutputRows")
    val nKeys =
      if (partial) longMetric("numHeapGroups") else longMetric("numKeys")
    val nRepl = longMetric("numReplacements")
    val nFallback =
      if (partial) None else Some(longMetric("numFallbackSorts"))
    val flushRows =
      if (partial)
        org.apache.spark.sql.internal.SQLConf.get
          .getConfString("graft.topk.partialFlushRows",
            TopKPerKeyExec.DefaultPartialFlushRows.toString).toInt
      else
        org.apache.spark.sql.internal.SQLConf.get
          .getConfString("graft.topk.finalRetainedRows",
            TopKPerKeyExec.DefaultFinalRetainedRows.toString).toInt
    child.execute().mapPartitions({ iter =>
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap w.r.t. the output order: the root is the WORST row
      // currently retained, so a better row replaces it in O(log k)
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ord.compare(b, a)
      }
      val heaps =
        new java.util.LinkedHashMap[UnsafeRow,
          java.util.PriorityQueue[UnsafeRow]]()
      var retained = 0
      def foldInput(): Unit = while (iter.hasNext && retained < flushRows) {
        val row = toUnsafe(iter.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) { heap.add(row.copy()); retained += 1 }
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
          nRepl += 1
        }
      }
      import scala.jdk.CollectionConverters._
      if (partialLocal) {
        // Map-side phase: emit retained rows as-is (the final heap
        // re-ranks). The heap map is O(keys-seen × k) — with high-
        // cardinality keys that approaches the whole partition, so the
        // partial phase FLUSHES at `flushRows` retained rows and
        // starts over: lossless (emitting extra rows per key is fine,
        // the final phase re-reduces them; a key's per-chunk top-k
        // union is a superset of its partition top-k), and it bounds
        // partial memory independently of key cardinality — the
        // property hash aggregation gets from sort-based fallback,
        // bought here with plain re-emission instead of a sort.
        new Iterator[InternalRow] {
          private var emit: java.util.Iterator[UnsafeRow] =
            java.util.Collections.emptyIterator()
          private def drain(): Unit = {
            val all = new scala.collection.mutable.ArrayBuffer[UnsafeRow]()
            heaps.values().iterator().asScala
              .foreach(h => all ++= h.iterator().asScala)
            nKeys += heaps.size()
            heaps.clear()
            retained = 0
            emit = all.iterator.asJava
          }
          private def advance(): Boolean =
            emit.hasNext || {
              if (iter.hasNext) { foldInput(); drain(); advance() }
              else if (!heaps.isEmpty) { drain(); emit.hasNext }
              else false
            }
          override def hasNext: Boolean = advance()
          override def next(): InternalRow = {
            advance(); outRows += 1; emit.next()
          }
        }
      } else {
        foldInput()
        val outProj = UnsafeProjection.create(output, output)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        if (!iter.hasNext) {
          // Fast path: the whole partition's survivors fit under
          // `graft.topk.finalRetainedRows` — drain the heaps directly.
          nKeys += heaps.size()
          heaps.values().iterator().asScala.flatMap { heap =>
            // drain the max-heap worst-first, fill from the back → the
            // array is in output order; k is small, no sort needed
            val arr = new Array[UnsafeRow](heap.size)
            var i = arr.length - 1
            while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
            arr.iterator.zipWithIndex.map { case (row, idx) =>
              rankRow.setLong(0, idx + 1L)
              outRows += 1
              outProj(joined(row, rankRow))
            }
          }
        } else {
          // Sort fallback: retained rows hit the bound with input left —
          // low partition count × high key cardinality × large k would
          // otherwise grow the heap map toward partition size with no
          // spill path. Hand everything (heap survivors + the rest of
          // the input) to a spill-capable external sort on
          // (key, order) and stream ranks one key group at a time — the
          // same degradation HashAggregateExec makes to sort-based
          // aggregation. Lossless: rows a heap already discarded were
          // provably outside their key's top-k (all of a key's rows are
          // in this partition).
          nFallback.foreach(_ += 1)
          val unorderable = keyExprs.filterNot(e =>
            org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(e.dataType))
          if (unorderable.nonEmpty) throw new IllegalStateException(
            s"TopKPerKey final phase exceeded graft.topk.finalRetainedRows" +
              s"=$flushRows retained rows in one partition, and key " +
              s"type(s) ${unorderable.map(_.dataType.simpleString)} are " +
              s"not sort-orderable, so the external-sort fallback cannot " +
              s"run. Raise graft.topk.finalRetainedRows, repartition the " +
              s"input wider, or map the key to an orderable type.")
          val schema = org.apache.spark.sql.types.StructType(
            childOutput.map(a => org.apache.spark.sql.types.StructField(
              a.name, a.dataType, a.nullable)))
          val fullOrd = GenerateOrdering.generate(
            keyExprs.map(SortOrder(_, Ascending)) ++ sortOrder, childOutput)
          val prefixComputer =
            new UnsafeExternalRowSorter.PrefixComputer {
              private val p =
                new UnsafeExternalRowSorter.PrefixComputer.Prefix
              override def computePrefix(row: InternalRow)
                  : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
                // zero prefix → comparator always falls through to the
                // full generated ordering; correctness over the radix
                // micro-optimization (keys are compound and arbitrary)
                p.value = 0L; p.isNull = false; p
              }
            }
          val sorter = UnsafeExternalRowSorter.create(
            schema, fullOrd,
            org.apache.spark.util.collection.unsafe.sort
              .PrefixComparators.LONG,
            prefixComputer, 4L * 1024 * 1024, false)
          org.apache.spark.TaskContext.get()
            .addTaskCompletionListener[Unit](_ => sorter.cleanupResources())
          heaps.values().iterator().asScala
            .foreach(h => h.iterator().asScala.foreach(sorter.insertRow))
          heaps.clear()
          while (iter.hasNext) sorter.insertRow(toUnsafe(iter.next()))
          var curKey: UnsafeRow = null
          var rank = 0L
          sorter.sort().flatMap { r =>
            val row = r.asInstanceOf[UnsafeRow]
            val key = keyProj(row)
            if (curKey == null || key != curKey) {
              curKey = key.copy(); rank = 0L; nKeys += 1
            }
            rank += 1
            if (rank <= kLocal) {
              rankRow.setLong(0, rank)
              outRows += 1
              Some(outProj(joined(row, rankRow)))
            } else None
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan)
      : TopKPerKeyExec = copy(child = c)
}
