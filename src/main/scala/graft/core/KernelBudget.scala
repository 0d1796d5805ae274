package graft.core

/** Deterministic op-count budget — the TIME half of the reference's
  * per-extraction resource envelope (/root/reference/src/util/
  * ResourceLimits.h:94-197; Main.cc:30-33,177-191 turns a blown limit into
  * a structured `timeout`/`memout` outcome instead of a crash).
  *
  * A wall-clock kill is nondeterministic: the same document could time out
  * on one executor and succeed on a retry, which breaks the resume
  * checksums (Manifest) and makes results host-dependent. Instead the
  * budget counts the kernel's own unit of work — clause-literal visits —
  * which is a pure function of the document, so the `timeout` outcome is
  * bit-stable across reruns, hosts, and parallelism levels while bounding
  * the same resource (CPU time is proportional to charged ops in these
  * kernels).
  *
  * Linear kernels (hash/base-feature extraction) know their op count after
  * the parse (total literal slots), so they check once up front; the
  * super-linear gate kernel ([[Gates.analyze]] — blocked-set checks are
  * quadratic in occurrence-list sizes) charges online at each hot site.
  * The SAT solver keeps its own conflict-work budget ([[Sat.Ipasir]]);
  * both surface through the same `status = "timeout"` channel.
  */
object KernelBudget {
  /** Stackless (thrown once per pathological document, caught one frame up
    * in the expression layer — a filled stack trace would dominate the
    * cost of the structured outcome).
    */
  final class KernelTimeout
      extends RuntimeException("kernel op budget exceeded", null, false, false)

  final val Unlimited: Long = Long.MaxValue
}

/** One instance per document evaluation (allocation is noise next to the
  * kernel work); NOT thread-safe — never share across rows.
  */
final class KernelBudget(limit: Long) {
  private var used: Long = 0L

  @inline def charge(n: Long): Unit = {
    used += n
    if (used > limit) throw new KernelBudget.KernelTimeout
  }

  /** Ops charged so far (diagnostics / the super-linearity property test). */
  def opsUsed: Long = used
}
