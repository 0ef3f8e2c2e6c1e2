package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext

/** Shared codegen helpers for the vector/set kernels ([[VectorDot]],
  * [[VectorCosine]], [[SortedIntersectSize]], [[SortedIntersectFirstSize]]).
  *
  * Each kernel used to inline its loop at every call site; a plan like
  * `greatest()` over a 16-centroid codebook then carries 16 copies of the
  * same loop in ONE generated method — bytecode bloat that pushes the
  * whole-stage method toward HotSpot's JIT limits and duplicates cold code.
  * These helpers are emitted ONCE per [[CodegenContext]] (private methods on
  * the generated class) so every call site is a single invocation of a
  * shared, JIT-hot kernel, and the non-null fast path is the original
  * bulk-copy primitive loop (`toFloatArray` is a memcpy for unsafe arrays).
  *
  * The WeakHashMap memo is keyed by the context identity: codegen for one
  * plan builds one context on the driver, so the map stays tiny and dies
  * with the context.
  */
private[functions] object VecCodegen {
  private val AD = "org.apache.spark.sql.catalyst.util.ArrayData"

  private val cache =
    new java.util.WeakHashMap[CodegenContext, java.util.HashMap[String, String]]()

  private def memo(ctx: CodegenContext, key: String)(emit: => String): String =
    cache.synchronized {
      var m = cache.get(ctx)
      if (m == null) { m = new java.util.HashMap[String, String](); cache.put(ctx, m) }
      var name = m.get(key)
      if (name == null) { name = emit; m.put(key, name) }
      name
    }

  /** Length-mismatch + null-element precheck shared by every kernel: true
    * means the result is NULL (zip_with null-pad / null-poison parity).
    * The per-side scans are gated by the STATIC schema flags the caller
    * passes as constants, so a containsNull=false side costs nothing after
    * JIT constant-folds the branch. */
  def nullScan(ctx: CodegenContext): String = memo(ctx, "nullScan") {
    ctx.addNewFunction("graftVecNullScan",
      s"""
         |private boolean graftVecNullScan($AD a, $AD b, boolean sl, boolean sr) {
         |  int n = a.numElements();
         |  if (n != b.numElements()) return true;
         |  if (sl) for (int i = 0; i < n; i++) if (a.isNullAt(i)) return true;
         |  if (sr) for (int i = 0; i < n; i++) if (b.isNullAt(i)) return true;
         |  return false;
         |}
       """.stripMargin)
  }

  /** Same precheck for inputs whose lengths may legitimately differ
    * (the sorted-set kernels): only null elements poison. */
  def nullScanUneven(ctx: CodegenContext): String = memo(ctx, "nullScanUneven") {
    ctx.addNewFunction("graftVecNullScanUneven",
      s"""
         |private boolean graftVecNullScanUneven($AD a, $AD b, boolean sl, boolean sr) {
         |  if (sl) { int n = a.numElements();
         |    for (int i = 0; i < n; i++) if (a.isNullAt(i)) return true; }
         |  if (sr) { int n = b.numElements();
         |    for (int i = 0; i < n; i++) if (b.isNullAt(i)) return true; }
         |  return false;
         |}
       """.stripMargin)
  }

  /** dot(a,b) with double accumulation — null-free inputs only.
    * Reads elements in place via getFloat: a join residual evaluates this
    * once per CANDIDATE PAIR, and the former toFloatArray form allocated
    * and copied two float[] per evaluation — ~8M allocations per banded
    * self-join run at sf0.1, pure GC pressure (r18; getFloat on
    * UnsafeArrayData is a direct word read and JIT-inlines). */
  def dot(ctx: CodegenContext): String = memo(ctx, "dot") {
    ctx.addNewFunction("graftVecDot",
      s"""
         |private double graftVecDot($AD a, $AD b) {
         |  int n = a.numElements();
         |  double acc = 0.0;
         |  for (int i = 0; i < n; i++) {
         |    acc += ((double) a.getFloat(i)) * ((double) b.getFloat(i));
         |  }
         |  return acc;
         |}
       """.stripMargin)
  }

  /** Fused cosine (dot + both norms in one pass) — null-free inputs only.
    * Allocation-free for the same reason as [[dot]]. */
  def cosine(ctx: CodegenContext): String = memo(ctx, "cosine") {
    ctx.addNewFunction("graftVecCosine",
      s"""
         |private double graftVecCosine($AD a, $AD b) {
         |  int n = a.numElements();
         |  double dot = 0.0, na = 0.0, nb = 0.0;
         |  for (int i = 0; i < n; i++) {
         |    double x = (double) a.getFloat(i); double y = (double) b.getFloat(i);
         |    dot += x * y; na += x * x; nb += y * y;
         |  }
         |  return dot / java.lang.Math.sqrt(na * nb);
         |}
       """.stripMargin)
  }

  /** |a ∩ b| merge scan over ascending-sorted int arrays — null-free. */
  def intersectSize(ctx: CodegenContext): String = memo(ctx, "intersectSize") {
    ctx.addNewFunction("graftSortedIntersectSize",
      s"""
         |private int graftSortedIntersectSize($AD a, $AD b) {
         |  int na = a.numElements(); int nb = b.numElements();
         |  int i = 0; int j = 0; int n = 0;
         |  while (i < na && j < nb) {
         |    int x = a.getInt(i); int y = b.getInt(j);
         |    if (x == y) { n++; i++; j++; }
         |    else if (x < y) { i++; } else { j++; }
         |  }
         |  return n;
         |}
       """.stripMargin)
  }

  /** (smallest common element, |a ∩ b|) in ONE merge scan, packed as
    * `(first << 32) | size` with first = −1 on empty — null-free inputs. */
  def intersectFirstSize(ctx: CodegenContext): String = memo(ctx, "intersectFirstSize") {
    ctx.addNewFunction("graftSortedIntersectFirstSize",
      s"""
         |private long graftSortedIntersectFirstSize($AD a, $AD b) {
         |  int na = a.numElements(); int nb = b.numElements();
         |  int i = 0; int j = 0; int n = 0; int first = -1;
         |  while (i < na && j < nb) {
         |    int x = a.getInt(i); int y = b.getInt(j);
         |    if (x == y) { if (n == 0) first = x; n++; i++; j++; }
         |    else if (x < y) { i++; } else { j++; }
         |  }
         |  return (((long) first) << 32) | (((long) n) & 0xffffffffL);
         |}
       """.stripMargin)
  }

  /** Early-abort merge scan for thresholded verifies — see
    * [[SortedIntersectPrune]] for the contract. Returns the sentinel
    * packing (first = −1, size = 0) as soon as the row provably fails the
    * caller's downstream filters (first common element ≠ sid, or matches
    * can no longer reach alpha); otherwise the same `(first << 32) | size`
    * packing as intersectFirstSize. The sentinel's low word is 0 so the
    * unpacked size casts to int without ANSI overflow and fails any
    * `i ≥ alpha ≥ 1` threshold, and its high word is −1 so it fails any
    * `sid = first` dedup; a surviving row always has size ≥ alpha ≥ 1, so
    * the sentinel can never collide with a real result. */
  def intersectPrune(ctx: CodegenContext): String = memo(ctx, "intersectPrune") {
    ctx.addNewFunction("graftSortedIntersectPrune",
      s"""
         |private long graftSortedIntersectPrune($AD a, $AD b, int sid, int alpha) {
         |  int na = a.numElements(); int nb = b.numElements();
         |  long drop = ((long) -1) << 32; // (first = -1, size = 0)
         |  int i = 0; int j = 0; int n = 0; int first = -1;
         |  while (i < na && j < nb) {
         |    int rem = na - i < nb - j ? na - i : nb - j;
         |    if (n + rem < alpha) return drop;
         |    int x = a.getInt(i); int y = b.getInt(j);
         |    if (x == y) {
         |      if (n == 0) { first = x; if (sid >= 0 && x != sid) return drop; }
         |      n++; i++; j++;
         |    }
         |    else if (x < y) { i++; } else { j++; }
         |  }
         |  if (n < alpha) return drop;
         |  return (((long) first) << 32) | (((long) n) & 0xffffffffL);
         |}
       """.stripMargin)
  }
}
