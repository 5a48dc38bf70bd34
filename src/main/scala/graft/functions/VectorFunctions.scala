package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (`Array[Float]` columns) for
  * similarity search and near-dup detection — extension operators the
  * reference lacks entirely (north star, /root/repo/BASELINE.json).
  *
  * All pure Catalyst higher-order functions (`zip_with`/`aggregate`) —
  * codegen-friendly, no UDFs, no driver-side collection. Accumulation is
  * promoted to double in index order so results are reproducible across
  * engines.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy of the vector (x / ‖x‖, double). NULL for NULL
    * input and zero-norm vectors (undefined → NULL, the [[cosine]] /
    * graft_cosine contract — a NaN would sort above every double and
    * poison downstream top-k).
    *
    * The norm rides in as `array_repeat(norm, size)`: a FUNCTION
    * ARGUMENT evaluates once per row, whereas referencing the norm
    * subexpression inside the `transform` lambda would re-evaluate it
    * per ELEMENT after CollapseProject inlining — O(dim²) per row (the
    * same expression-duplication hazard minhash hit with md5). */
  def l2Normalize(a: Column): Column = {
    val nrm = norm(a)
    // !isnan guard: Spark orders NaN ABOVE every double, so NaN > 0 is
    // TRUE — without it a vector containing NaN would pass the gate and
    // emit an all-NaN array, the exact top-k poison the NULL contract
    // exists to prevent
    when(a.isNotNull && !isnan(nrm) && nrm > 0,
      zip_with(d(a), array_repeat(nrm, size(a)), (x, n) => x / n))
  }

  /** MinHash signature over a 32-bit-hashed shingle array:
    * sig_j = min over shingles of (a_j·h + b_j) mod p.
    *
    * Constants are chosen to stay overflow-safe in signed 64-bit in any
    * engine (a_j < 2^30, h < 2^32 ⇒ product < 2^62). */
  val MinhashP: Long = 4294967311L // prime > 2^32
  def minhashCoeffA(j: Int): Long = 1073741789L - 7919L * j // < 2^30
  def minhashCoeffB(j: Int): Long = 15485863L * (j + 1) % MinhashP

  def minhashSignature(hashes: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(hashes,
        h => (lit(minhashCoeffA(j)) * h + lit(minhashCoeffB(j))) % lit(MinhashP)))
    }: _*)

  /** LSH band key: slice the signature into bands of `r` rows; band `b`
    * is identified by its joined values. Equal band ⇒ candidate pair. */
  def bandKey(sig: Column, b: Int, r: Int): Column =
    concat_ws("_", transform(slice(sig, b * r + 1, r), x => x.cast("string")))
}
