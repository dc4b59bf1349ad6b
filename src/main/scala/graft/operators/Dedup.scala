package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Deduplication operators for large-scale text corpora: exact,
  * n-gram-Jaccard similarity join, MinHash+LSH, SimHash.
  *
  * The reference pipeline dedups nothing (its idempotency comes from
  * deterministic output names, `main.py:124-131`); these are the
  * training-data-pipeline extensions (SURVEY.md §7.1 ext), built
  * shuffle-aware:
  *
  *  - exact: one hash-shuffle on the (normalized) text key;
  *  - Jaccard join: inverted-index self-join on shingles (prefix
  *    index), NOT an O(n²) crossJoin — pair candidates are generated
  *    only for docs sharing a shingle, then verified exactly;
  *  - MinHash LSH: 128 permutations → 32 bands × 4 rows; candidate
  *    generation via band-hash equi-join (buckets), then exact
  *    verification on the candidates. At 100 TB the band join is the
  *    only shuffle that grows with corpus size and it's an equi-join
  *    Catalyst executes as a standard hash shuffle; no all-pairs.
  *  - SimHash: 64-bit fingerprint; all pairs within Hamming distance
  *    ≤ 3 found exactly via the 4×16-bit chunk pigeonhole join.
  *
  * All hash functions are Spark built-ins (xxhash64/murmur3) —
  * codegen'd, no UDFs anywhere.
  */
object Dedup {

  /** Word n-gram shingle set (distinct), matching the oracle's
    * DuckDB formulation word-for-word: split on single space, join
    * n consecutive words with a space. Docs shorter than n words get
    * an empty set. */
  def shingles(text: Column, n: Int = 3): Column =
    // native codegen kernel (functions/ShingleSet) — semantically the
    // HOF chain sort_array(array_distinct(transform(sequence(...),
    // i => concat_ws(" ", slice(split(text," "), i+1, n))))), but one
    // byte-scan pass instead of per-position array slices + concat
    // buffers (the HOF allocation gotcha); output arrives SORTED in
    // binary UTF8 order, so downstream sort_array is unnecessary
    graft.functions.ShingleSet.shingleSet(text, n)

  /** Shared shingle materialization for the similarity-join family:
    * (id, s, sz), checkpointed lazily so the split+distinct shingle
    * computation (and the source scan under it) runs once per frame
    * however many times the caller consumes it. ONE definition — the
    * self/cross Jaccard, MinHash and containment joins must never
    * disagree on what a shingle is. */
  private def shingledFrame(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // sorted ascending (binary UTF8 order) so the verification stage
    // can count intersections with the allocation-free merge-walk
    // kernel (SortedIntersectCount) instead of per-pair hash sets
    // shingles() already emits ascending binary UTF8 order (the
    // ShingleSet kernel pins it) — no sort_array needed
    df.select(col(idCol).as("id"), shingles(col(textCol), n).as("s"))
      .withColumn("sz", size(col("s")))
      .localCheckpoint(eager = false)

  /** Posting list of a shingled frame: (id, sz, tok) with 8-byte
    * xxhash64 tokens — fixed-width join/shuffle keys instead of
    * ~25-byte strings. Sound for candidate generation: a hash
    * collision only MERGES two universe elements, so hash-overlap ⊇
    * true overlap; exact verification on the shingle arrays kills
    * spurious candidates. */
  private def postsFrame(sh: DataFrame): DataFrame =
    sh.select(col("id"), col("sz"), explode(col("s")).as("shingle"))
      .select(col("id"), col("sz"), xxhash64(col("shingle")).as("tok"))

  /** Hot-token skew guard for the posting-index candidate joins: the
    * per-token join work is |Lₐ|·|L_b|, so one stopword-grade shingle
    * whose posting list holds a corpus-scale fraction of docs makes a
    * single reducer the straggler at 100×. Tokens whose combined
    * posting count exceeds `hotCutoff` are routed through the salted
    * join (a-side hash-split into `factor` groups, b-side replicated
    * — [[Salting.saltedEquiJoin]]); the rest take the plain equi-join.
    *
    * Candidate-set EXACT, not approximate: per token, the salted join
    * emits precisely the plain join's (a, b) pairs (each a-row meets
    * the one b-replica carrying its salt), hot and cold route
    * disjoint token sets, and the union is the original candidate
    * multiset — downstream prefix/size/verify logic is untouched.
    * The hot set collects to the driver, hard-capped at
    * [[MaxHotTokens]] hottest tokens (descending count, token value
    * tiebreak — deterministic): a caller passing a tiny cutoff on a
    * large corpus would otherwise collect an unbounded token list
    * into driver memory AND a pathological isin plan. Truncation
    * never costs correctness — a hot token left in the cold route
    * still joins exactly, it just skips the skew mitigation (a
    * warning notes it).
    *
    * NOTE (laziness): computing the hot set runs an eager Spark job
    * (one count aggregate + a bounded collect) at DataFrame-
    * CONSTRUCTION time — the builders that use it (jaccardJoin,
    * jaccardJoinCross, containmentJoinCross) are not purely lazy plan
    * constructors. Repeated callers (e.g. per-micro-batch streaming
    * decontam) should build once and reuse the frame, or pass
    * hotTokenCutoff = Int.MaxValue-scale values to make the scan
    * trivially empty.
    *
    * `counts`, when supplied, is a (tok, cnt) frame whose cnt UPPER-
    * BOUNDS the token's combined posting count across both sides —
    * callers that already aggregate token frequencies (the ppjoin
    * paths' dfreq) reuse that aggregate instead of paying a second
    * full index scan. Any upper bound is sound: overestimating only
    * routes extra tokens through the (exact) salted join. */
  private[graft] val MaxHotTokens = 4096

  private def skewAwareTokJoin(
      ia: DataFrame, // (tok, a, asz)
      ib: DataFrame, // (tok, b, bsz)
      hotCutoff: Int,
      factor: Int,
      counts: Option[DataFrame] = None): DataFrame = {
    require(hotCutoff > 0 && factor > 0,
      s"need hotTokenCutoff ($hotCutoff) and saltFactor ($factor) > 0")
    val hotRows = counts.getOrElse(
        ia.select("tok").union(ib.select("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt")))
      .where(col("cnt") > hotCutoff)
      .orderBy(col("cnt").desc, col("tok"))
      .limit(MaxHotTokens + 1)
      .select("tok").collect()
    if (hotRows.length > MaxHotTokens)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"skewAwareTokJoin: >$MaxHotTokens tokens above hotTokenCutoff=" +
          s"$hotCutoff; salting only the $MaxHotTokens hottest (exactness " +
          "unaffected; raise the cutoff to silence)")
    val hot = hotRows.take(MaxHotTokens).map(_.getLong(0))
    if (hot.isEmpty) ia.join(ib, Seq("tok"))
    else {
      // >10 values ⇒ Catalyst folds isin to an O(1) InSet probe
      val cold = ia.where(!col("tok").isin(hot: _*))
        .join(ib.where(!col("tok").isin(hot: _*)), Seq("tok"))
      val salted = Salting.saltedEquiJoin(
        ia.where(col("tok").isin(hot: _*)),
        ib.where(col("tok").isin(hot: _*)),
        Seq("tok"), factor)
      cold.unionByName(salted)
    }
  }

  /** Exact dedup by content key: one representative (min id) +
    * multiplicity per distinct key. */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Canonical text-normalization key: lowercase, strip everything
    * but alphanumerics and whitespace, THEN collapse whitespace runs
    * (order matters: stripping must keep \t/\n so the collapse sees
    * them — deleting them would fuse adjacent words), trim. The
    * standard "fuzzy exact" dedup key (case/punctuation/whitespace
    * variants of one document collapse) used by web-scale corpus
    * pipelines before any near-dup pass. Pure Column expression. */
  def normalizedKey(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Exact dedup over the normalized key. */
  def normalizedExact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), normalizedKey(col(textCol)).as("norm_key"))
      .groupBy(col("norm_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Page-level exact dedup at scale (the q241 semantics without
    * shuffling rasters): pass 1 shuffles only (dims, xxhash64(sig))
    * — 8 bytes per page instead of ~9 bytes per pixel of the raw
    * signature — and pages alone in their hash bucket are their own
    * canonical page with dup_count 1; pass 2 re-attaches the full
    * signature ONLY for hash-colliding pages (true duplicates plus
    * rare collisions) and verifies EXACTLY inside each bucket, so a
    * collision can never merge distinct pages. The exact≡hash
    * discipline: output is identical to a direct (dims, sig) window
    * — spec-asserted, including under a deliberately-degenerate hash
    * that forces every page through the verify pass. `sigs` columns:
    * id, page, width, height, sig; output matches q241's shape
    * (dup_count + canonical page, canon packed as id·stride+page
    * with page < stride). On a duplicate-heavy corpus most pages
    * carry their signature into pass 2 — that is the operator
    * working as designed, not a leak: the exact verify is the point. */
  def pageDupGroups(sigs: DataFrame, stride: Int,
      hash: Column = xxhash64(col("sig"))): DataFrame = {
    val base = sigs.select(col("id"), col("page"), col("width"),
      col("height"), col("sig"))
    val hw = Window.partitionBy(col("width"), col("height"), col("h64"))
    val counted = base
      .select(col("id"), col("page"), col("width"), col("height"),
        hash.as("h64"))
      .select(col("id"), col("page"), col("width"), col("height"),
        col("h64"), count(lit(1)).over(hw).as("hcnt"))
    val singles = counted.filter(col("hcnt") === 1)
      .select(col("id"), col("page"),
        lit(1).cast("int").as("dup_count"),
        col("id").as("canon_id"), col("page").as("canon_page"))
    val multiKeys = counted.filter(col("hcnt") > 1)
      .select(col("id"), col("page"))
    val ex = Window.partitionBy(col("width"), col("height"), col("sig"))
    val multi = base.join(multiKeys, Seq("id", "page"))
      .select(col("id"), col("page"),
        count(lit(1)).over(ex).cast("int").as("dup_count"),
        min(col("id") * stride + col("page")).over(ex).as("canon"))
      .select(col("id"), col("page"), col("dup_count"),
        expr(s"canon DIV $stride").as("canon_id"),
        expr(s"CAST(canon % $stride AS INT)").as("canon_page"))
    singles.unionByName(multi)
  }

  /** All-pairs n-gram Jaccard similarity join via inverted index.
    *
    * Returns (a, b, n_inter, n_union) for every doc pair with
    * Jaccard(shingles(a), shingles(b)) ≥ threshold — integer
    * evidence columns so the result is float-free and exactly
    * comparable across engines.
    *
    * NOT a purely lazy builder: the hot-token skew scan (see
    * [[skewAwareTokJoin]]) runs one eager count aggregate at call
    * time.
    */
  def jaccardJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      prefixFilter: Boolean = true,
      hotTokenCutoff: Int = 1 << 17,
      saltFactor: Int = 32): DataFrame = {
    // the shingle table feeds the posting index once and the exact
    // verification twice. The index/prefix machinery runs on the
    // posting frame's xxhash64 tokens; the ppjoin prefix theorem
    // (under the hash-space total order) still guarantees every
    // qualifying pair a shared indexed token, and the exact
    // verification below uses the true shingle arrays.
    val sh = shingledFrame(df, idCol, textCol, n)
    val posts = postsFrame(sh)

    // candidate (a,b) pairs sharing an indexed token, size-ratio
    // pruned (J ≥ t forces t·|B| ≤ |A| ≤ |B|/t). The hot-token scan
    // reuses `counts` (2× the full-posting document frequency — an
    // upper bound on the self-join's combined index counts) instead
    // of re-aggregating the index union.
    def pairsFrom(index: DataFrame, counts: DataFrame): DataFrame = {
      val a = index.select(col("tok"), col("id").as("a"), col("sz").as("asz"))
      val b = index.select(col("tok"), col("id").as("b"), col("sz").as("bsz"))
      skewAwareTokJoin(a, b, hotTokenCutoff, saltFactor, Some(counts))
        .where(col("a") < col("b"))
        .where(col("bsz").cast("double") * lit(threshold) <= col("asz").cast("double") &&
          col("asz").cast("double") * lit(threshold) <= col("bsz").cast("double"))
        .select("a", "b").distinct()
    }

    val dfreq = posts.groupBy(col("tok")).agg(count(lit(1)).as("dfc"))
    val selfCounts = dfreq.select(col("tok"), (col("dfc") * 2).as("cnt"))
    val cand =
      if (!prefixFilter) pairsFrom(posts, selfCounts)
      else {
        // positional prefix filter (ppjoin): under a global canonical
        // token order (ascending document frequency, then value), a
        // pair with overlap ≥ α = ⌈t·|x|⌉ must share an element inside
        // each side's first |x| − α + 1 tokens — so only the prefix
        // is indexed. Rare tokens sort first, which keeps posting
        // lists short exactly where the index is dense.
        val w = Window.partitionBy(col("id")).orderBy(col("dfc"), col("tok"))
        val prefix = posts.join(dfreq, Seq("tok"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <=
            col("sz") - ceil(lit(threshold) * col("sz").cast("double")).cast("int") + 1)
          .select("tok", "id", "sz")
        pairsFrom(prefix, selfCounts)
      }

    // exact verification on the candidates via row-local set ops
    cand
      .join(sh.select(col("id").as("a"), col("s").as("sa"), col("sz").as("asz")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("s").as("sb"), col("sz").as("bsz")), Seq("b"))
      .withColumn("n_inter", graft.functions.SortedIntersectCount(col("sa"), col("sb")).cast("long"))
      .withColumn("n_union", (col("asz") + col("bsz") - col("n_inter")).cast("long"))
      .where(col("n_inter").cast("double") >= lit(threshold) * col("n_union").cast("double"))
      .select(col("a"), col("b"), col("n_inter"), col("n_union"))
  }

  /** Per-doc MinHash signature: numPerm long columns `mh0..mhN-1`,
    * computed as numPerm map-side-combinable `min` aggregates over
    * the exploded shingle posting list — one shuffle keyed by doc id.
    * Permutation i is `xxhash64(xxhash64(shingle), seed, i)`: each
    * shingle is string-hashed once, then re-mixed per permutation
    * over the fixed-width long (cheap, overflow-free under ANSI
    * mode, deterministic across engines/runs). */
  def minhashSignature(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numPerm: Int = 128,
      n: Int = 3,
      seed: Long = 42L): DataFrame =
    minhashSignatureFromShingles(
      df.select(col(idCol).as("id"), shingles(col(textCol), n).as("s")),
      numPerm, seed)

  /** Signature over a pre-shingled `(id, s)` frame — lets callers
    * that also need the shingle sets (LSH verification) share ONE
    * materialization instead of re-deriving them. */
  private def minhashSignatureFromShingles(
      sh: DataFrame,
      numPerm: Int,
      seed: Long): DataFrame = {
    val posts = sh.select(col("id"), explode(col("s")).as("shingle"))
      .withColumn("h1", xxhash64(col("shingle")))
    val mins = (0 until numPerm).map(i =>
      min(xxhash64(col("h1"), lit(seed), lit(i))).as(s"mh$i"))
    posts.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** (id, band_idx, band_hash) bucket rows from a pre-shingled
    * frame: signature → per-band xxhash64 of the band's r contiguous
    * slots → posexplode. ONE definition shared by the self- and
    * cross-corpus LSH joins, so the band-hash family cannot drift
    * between them. */
  private def bandBuckets(
      sh: DataFrame,
      numPerm: Int,
      bands: Int,
      seed: Long): DataFrame = {
    val rows = numPerm / bands
    val sig = minhashSignatureFromShingles(sh, numPerm, seed)
    val bandCols = (0 until bands).map { bIdx =>
      xxhash64((lit(bIdx) +: (0 until rows)
        .map(r => col(s"mh${bIdx * rows + r}"))): _*).as(s"band$bIdx")
    }
    sig.select(col("id") +: bandCols: _*)
      .select(col("id"),
        posexplode(array((0 until bands).map(i => col(s"band$i")): _*)))
      .toDF("id", "band_idx", "band_hash")
  }

  /** MinHash-LSH near-duplicate join: band-bucket candidate
    * generation + exact Jaccard verification. Output shape equals
    * [[jaccardJoin]] — with enough bands the candidate set contains
    * every true pair w.h.p. (r=4, b=32 at j=0.9: miss ≈ 1e-15). */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numPerm: Int = 128,
      bands: Int = 32,
      n: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(bands > 0 && bands <= numPerm && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm); bands > numPerm would " +
        "make every band hash constant and degenerate candidates to all pairs")
    // one shingle materialization feeds both the signature and the
    // exact verification (the checkpoint spills rather than OOMs at
    // scale)
    val sh = shingledFrame(df, idCol, textCol, n)
    val buckets = bandBuckets(sh, numPerm, bands, seed)
    val cand = buckets.select(col("band_idx"), col("band_hash"), col("id").as("a"))
      .join(buckets.select(col("band_idx"), col("band_hash"), col("id").as("b")),
        Seq("band_idx", "band_hash"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()

    // exact verification: join back the shingle sets (array ops are
    // row-local; candidate count ≪ n² by construction)
    cand
      .join(sh.select(col("id").as("a"), col("s").as("sa")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("s").as("sb")), Seq("b"))
      .withColumn("n_inter", graft.functions.SortedIntersectCount(col("sa"), col("sb")))
      .withColumn("n_union", size(col("sa")) + size(col("sb")) - col("n_inter"))
      .where(col("n_inter").cast("double") >= lit(threshold) * col("n_union").cast("double"))
      .select(col("a"), col("b"), col("n_inter"), col("n_union"))
  }

  /** Cross-corpus (R×S) n-gram Jaccard similarity join — the
    * decontamination primitive: pair every `left` doc with every
    * `right` doc at Jaccard ≥ threshold. Same inverted-index +
    * positional-prefix (ppjoin) shape as the self-join [[jaccardJoin]],
    * with two cross-side changes:
    *
    *  - no `a < b` dedup trick — sides are distinct corpora, every
    *    (a, b) ordered pair is a result;
    *  - the canonical token order (ascending document frequency, then
    *    value) is computed over the UNION of both posting sets — the
    *    prefix-filter theorem needs one GLOBAL order shared by both
    *    sides; per-side orders would disagree and drop true pairs.
    *
    * The size-ratio prune is side-symmetric (J ≥ t ⇒ t·|B| ≤ |A| ≤
    * |B|/t) so it applies unchanged. At 100 TB the typical call has a
    * small right side (an eval/benchmark set): its posting list is
    * tiny, the candidate join is bounded by the right side's index,
    * and the big side is streamed through one token-keyed shuffle.
    *
    * Returns (a, b, n_inter, n_union): a from `left`, b from `right`,
    * integer evidence columns (float-free, engine-exact). Not purely
    * lazy: the hot-token scan ([[skewAwareTokJoin]]) runs at call
    * time. */
  def jaccardJoinCross(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      prefixFilter: Boolean = true,
      hotTokenCutoff: Int = 1 << 17,
      saltFactor: Int = 32): DataFrame = {
    val shL = shingledFrame(left, idCol, textCol, n)
    val shR = shingledFrame(right, idCol, textCol, n)
    val pL = postsFrame(shL)
    val pR = postsFrame(shR)

    def pairsFrom(ia: DataFrame, ib: DataFrame,
        counts: Option[DataFrame]): DataFrame =
      skewAwareTokJoin(
        ia.select(col("tok"), col("id").as("a"), col("sz").as("asz")),
        ib.select(col("tok"), col("id").as("b"), col("sz").as("bsz")),
        hotTokenCutoff, saltFactor, counts)
        .where(col("bsz").cast("double") * lit(threshold) <= col("asz").cast("double") &&
          col("asz").cast("double") * lit(threshold) <= col("bsz").cast("double"))
        .select("a", "b").distinct()

    val cand =
      if (!prefixFilter) pairsFrom(pL, pR, None)
      else {
        // dfreq doubles as the hot-token count source: it already IS
        // the combined (union) posting frequency of both sides
        val dfreq = pL.select("tok").union(pR.select("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("dfc"))
        def prefixOf(posts: DataFrame): DataFrame = {
          val w = Window.partitionBy(col("id")).orderBy(col("dfc"), col("tok"))
          posts.join(dfreq, Seq("tok"))
            .withColumn("rk", row_number().over(w))
            .where(col("rk") <=
              col("sz") - ceil(lit(threshold) * col("sz").cast("double")).cast("int") + 1)
            .select("tok", "id", "sz")
        }
        pairsFrom(prefixOf(pL), prefixOf(pR),
          Some(dfreq.select(col("tok"), col("dfc").as("cnt"))))
      }

    cand
      .join(shL.select(col("id").as("a"), col("s").as("sa"), col("sz").as("asz")), Seq("a"))
      .join(shR.select(col("id").as("b"), col("s").as("sb"), col("sz").as("bsz")), Seq("b"))
      .withColumn("n_inter", graft.functions.SortedIntersectCount(col("sa"), col("sb")).cast("long"))
      .withColumn("n_union", (col("asz") + col("bsz") - col("n_inter")).cast("long"))
      .where(col("n_inter").cast("double") >= lit(threshold) * col("n_union").cast("double"))
      .select(col("a"), col("b"), col("n_inter"), col("n_union"))
  }

  /** Cross-corpus n-gram CONTAINMENT join — the asymmetric complement
    * of [[jaccardJoinCross]]: pair (a from `left`, b from `right`)
    * whenever |shingles(a) ∩ shingles(b)| ≥ threshold · |shingles(b)|,
    * i.e. at least that fraction of b's n-grams appear in a. This is
    * the quote/boilerplate/leak COVERAGE measure: a long document
    * containing a short eval item verbatim has low Jaccard (the union
    * is dominated by the long side) but containment ≈ 1 — GPT-3-style
    * leak audits are defined this way. Candidates come from the same
    * 8-byte-token inverted index (hash-overlap ⊇ true overlap, exact
    * verification kills spurious candidates); the size prune is the
    * one-sided |A| ≥ t·|B| (since inter ≤ |A|). The RIGHT side is
    * prefix-filtered by the CONTAINMENT prefix theorem: a qualifying
    * pair has |A∩B| ≥ ⌈t·|B|⌉, so at most |B| − ⌈t·|B|⌉ of B's tokens
    * miss A — indexing only B's first |B| − ⌈t·|B|⌉ + 1 tokens (rarest
    * first, any FIXED order is sound by pigeonhole since A stays
    * fully indexed) cannot lose a pair, and at t = 0.8 it cuts the
    * B-side posting rows (hence the candidate join and the verify
    * volume) ~5×. Measured at the 100× scale proof this was q64's
    * super-linear step — the eval×corpus candidate families — and the
    * prefix converts most of it back to index size.
    *
    * Returns (a, b, n_inter, n_b): integer evidence, engine-exact;
    * containment = n_inter / n_b. Right docs with empty shingle sets
    * (< n words) match nothing. Not purely lazy: the hot-token scan
    * ([[skewAwareTokJoin]]) runs at call time. */
  def containmentJoinCross(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      hotTokenCutoff: Int = 1 << 17,
      saltFactor: Int = 32): DataFrame = {
    // soundness precondition: candidates need >= 1 shared posting
    // token, so pairs with zero overlap are never emitted — complete
    // only for a strictly positive containment threshold
    require(threshold > 0 && threshold <= 1,
      s"containment threshold must be in (0, 1], got $threshold")
    val shL = shingledFrame(left, idCol, textCol, n)
    val shR = shingledFrame(right, idCol, textCol, n)
    val postsL = postsFrame(shL)
      .select(col("tok"), col("id").as("a"), col("sz").as("asz"))
    val postsRAll = postsFrame(shR)
    // containment prefix (see scaladoc): keep only each right doc's
    // sz − ⌈t·sz⌉ + 1 rarest tokens; rarest-first ordering minimizes
    // candidates, any fixed order preserves completeness
    val dfreq = postsL.select("tok").union(postsRAll.select("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("dfc"))
    val wPre = Window.partitionBy(col("id")).orderBy(col("dfc"), col("tok"))
    val postsR = postsRAll.join(dfreq, Seq("tok"))
      .withColumn("rk", row_number().over(wPre))
      .where(col("rk") <= col("sz") -
        ceil(lit(threshold) * col("sz").cast("double")).cast("int") + 1)
      .select(col("tok"), col("id").as("b"), col("sz").as("bsz"))
    val cand = skewAwareTokJoin(postsL, postsR, hotTokenCutoff, saltFactor)
      .where(col("asz").cast("double") >= lit(threshold) * col("bsz").cast("double"))
      .select("a", "b").distinct()
    cand
      .join(shL.select(col("id").as("a"), col("s").as("sa")), Seq("a"))
      .join(shR.select(col("id").as("b"), col("s").as("sb"), col("sz").as("n_b")), Seq("b"))
      .withColumn("n_inter", graft.functions.SortedIntersectCount(col("sa"), col("sb")).cast("long"))
      .where(col("n_b") > 0 &&
        col("n_inter").cast("double") >= lit(threshold) * col("n_b").cast("double"))
      .select(col("a"), col("b"), col("n_inter"), col("n_b").cast("long").as("n_b"))
  }

  /** Cross-corpus MinHash-LSH near-duplicate join: [[minhashLsh]]'s
    * band-bucket candidate generation across two frames. Both sides
    * hash with the SAME permutation family (seed + index), so equal
    * band values mean equal signature slices regardless of side.
    * Output shape equals [[jaccardJoinCross]]. */
  def minhashLshCross(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numPerm: Int = 128,
      bands: Int = 32,
      n: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(bands > 0 && bands <= numPerm && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm)")
    val shL = shingledFrame(left, idCol, textCol, n)
    val shR = shingledFrame(right, idCol, textCol, n)
    val cand = bandBuckets(shL, numPerm, bands, seed)
      .select(col("band_idx"), col("band_hash"), col("id").as("a"))
      .join(bandBuckets(shR, numPerm, bands, seed)
        .select(col("band_idx"), col("band_hash"), col("id").as("b")),
        Seq("band_idx", "band_hash"))
      .select("a", "b").distinct()
    cand
      .join(shL.select(col("id").as("a"), col("s").as("sa")), Seq("a"))
      .join(shR.select(col("id").as("b"), col("s").as("sb")), Seq("b"))
      .withColumn("n_inter", graft.functions.SortedIntersectCount(col("sa"), col("sb")).cast("long"))
      .withColumn("n_union",
        (size(col("sa")) + size(col("sb")) - col("n_inter")).cast("long"))
      .where(col("n_inter").cast("double") >= lit(threshold) * col("n_union").cast("double"))
      .select(col("a"), col("b"), col("n_inter"), col("n_union"))
  }

  /** Decontamination: drop every `corpus` row whose text
    * near-duplicates (n-gram Jaccard ≥ threshold) ANY `contam` row —
    * the "remove training docs that leak the eval set" pass run
    * before every serious model training job. Candidates come from
    * the cross-corpus LSH (index both sides, equi-join on band
    * hashes — never all-pairs), verification is exact, and the final
    * step is one left_anti join on the corpus id.
    *
    * Recall bound: LSH candidate recall follows the banding S-curve —
    * a pair at Jaccard j is a candidate with probability
    * 1 − (1 − j^r)^b (r = numPerm/bands rows per band, b = bands).
    * At the defaults (r=4, b=32) a pair at j = threshold = 0.5 is
    * found with p ≈ 0.87, at j = 0.7 with p ≈ 0.9998, at j = 0.9 with
    * 1 − ~1e-15 — so pairs NEAR the threshold can be silently missed
    * and leaked docs under-removed. Callers needing guaranteed
    * removal set `exact = true`: candidates then come from
    * [[jaccardJoinCross]]'s inverted index (complete by the ppjoin
    * prefix theorem — every qualifying pair shares an indexed token),
    * at the cost of joining on raw token postings instead of band
    * hashes. */
  def decontaminate(
      corpus: DataFrame,
      contam: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numPerm: Int = 128,
      bands: Int = 32,
      n: Int = 3,
      seed: Long = 42L,
      exact: Boolean = false): DataFrame = {
    val pairs =
      if (exact) jaccardJoinCross(corpus, contam, idCol, textCol, threshold, n)
      else minhashLshCross(corpus, contam, idCol, textCol, threshold,
        numPerm, bands, n, seed)
    val bad = pairs.select(col("a").as(idCol)).distinct()
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** Connected components over a near-dup pair graph: every doc gets
    * the minimum id reachable through dup pairs as its `cluster`.
    *
    * Alternating large-star / small-star rounds (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond"): each round
    * rewires edges toward local minima —
    *
    *  - large-star: every node connects its strictly LARGER neighbors
    *    to the minimum of its closed neighborhood;
    *  - small-star: every node connects its smaller neighbors (and
    *    itself) to the minimum of its smaller neighbors.
    *
    * Both preserve connectivity, and the edge set converges to stars
    * rooted at each component's minimum id in O(log n) rounds — where
    * plain min-label propagation needs O(diameter) rounds and an
    * adversarial chain (pairwise-overlapping boilerplate) needs one
    * round PER HOP. Each round is two self-aggregations over the PAIR
    * graph, not the corpus; eager checkpoints keep the lineage flat.
    * This is what turns a pair list (jaccardJoin / minhashLsh /
    * simhashNearDup output) into an actual deduplication: keep rows
    * where id == cluster. */
  def clusters(ids: DataFrame, pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // canonical (hi > lo) orientation, self-loops dropped, distinct —
    // materialized ONCE so rounds don't recompute pair discovery
    var edges = pairs
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .where(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint(eager = true)
    // Driver union-find kernel for tiny pair graphs — the
    // graph-family gate (spark.graft.graph.driverGraphBytes, 0
    // disables): a near-dup pair list is typically corpus-tiny (pairs
    // ∝ duplicates, not documents), while each alternating-star round
    // costs two aggregate shuffles plus two convergence-count probe
    // jobs. The kernel's min-root components equal the converged star
    // labels exactly (DedupSpec path equality); the corpus-sized
    // `ids` frame never reaches the driver — only the pair list does,
    // and the root table returns via one parallelize into the same
    // left join.
    val dgb = edges.sparkSession.conf
      .getOption("spark.graft.graph.driverGraphBytes")
      .map(_.trim.toLong).getOrElse(64L * 1024 * 1024)
    if (dgb > 0 && edges.count() * 32L <= dgb) {
      val rows = edges.collect()
      val root = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (root.getOrDefault(r, r) != r) r = root.getOrDefault(r, r)
        // path compression
        var c = x
        while (root.getOrDefault(c, c) != r) {
          val nxt = root.getOrDefault(c, c); root.put(c, r); c = nxt
        }
        r
      }
      rows.foreach { e =>
        val (a, b) = (find(e.getLong(0)), find(e.getLong(1)))
        if (a != b) root.put(math.max(a, b), math.min(a, b))
      }
      // second pass: label every seen node with its component MIN
      // (union-by-min above keeps roots minimal, so find() IS the min)
      val nodes = new java.util.HashSet[Long]()
      rows.foreach { e => nodes.add(e.getLong(0)); nodes.add(e.getLong(1)) }
      import scala.jdk.CollectionConverters._
      val out = nodes.asScala.toSeq.collect {
        case n if find(n) != n => org.apache.spark.sql.Row(n, find(n))
      }
      val spark = edges.sparkSession
      val rootsDf = spark.createDataFrame(
        spark.sparkContext.parallelize(out,
          math.max(1, math.min(spark.sparkContext.defaultParallelism,
            out.size / 10000 + 1))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, false),
          org.apache.spark.sql.types.StructField("root",
            org.apache.spark.sql.types.LongType, false))))
      // explicit broadcast only under the family's 32 MB hash-map
      // bound (finishTriangles discipline) — a 2M-edge graph at the
      // gate can carry millions of labeled nodes
      val rootsSide =
        if (out.size * 48L <= 32L * 1024 * 1024) broadcast(rootsDf)
        else rootsDf
      return ids.select(col("id"))
        .join(rootsSide, Seq("id"), "left")
        .select(col("id"), coalesce(col("root"), col("id")).as("cluster"))
    }

    // large-star: group BOTH directions by u; m = min(Γ(u) ∪ {u});
    // emit (v, m) for neighbors v > u. Output is canonical: v > u ≥ m.
    def largeStar(e: DataFrame): DataFrame = {
      val dir = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = dir.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      dir.join(mins, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
    }

    // small-star: canonical edges grouped by hi; m = min of smaller
    // neighbors; emit (v, m) for v ∈ Γ⁻(hi) ∪ {hi} minus the (m, m)
    // self-loop. Every output edge has lo = m < v.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      e.join(mins, Seq("hi"))
        .where(col("lo") > col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(mins.select(col("hi"), col("m").as("lo")))
        .distinct()
    }

    // distinct-set equality: same row count and empty difference (both
    // sides are distinct by construction; counts are free off the
    // eager checkpoints)
    def sameSet(a: DataFrame, b: DataFrame): Boolean =
      a.count() == b.count() && a.except(b).limit(1).count() == 0

    var converged = edges.limit(1).count() == 0 // no edges → all singletons
    var it = 0
    while (!converged && it < maxIters) {
      val afterLarge = largeStar(edges).localCheckpoint(eager = true)
      val afterSmall = smallStar(afterLarge).localCheckpoint(eager = true)
      converged = sameSet(afterLarge, edges) && sameSet(afterSmall, afterLarge)
      edges = afterSmall
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"clusters() hit maxIters=$maxIters before converging — labels may " +
          "be non-minimal and dedup may keep extra representatives")
    // at convergence edges form stars (leaf → component-min root);
    // min-aggregate is belt-and-braces for the non-converged warn path
    val roots = edges.groupBy(col("hi").as("id")).agg(min(col("lo")).as("root"))
    ids.select(col("id"))
      .join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster"))
  }

  /** Full near-dup deduplication: exact-duplicate pre-pass → pair
    * discovery (MinHash LSH) over DISTINCT texts → connected
    * components → keep each cluster's minimum-id row.
    *
    * The pre-pass matters at corpus scale: identical documents share
    * every band hash, so a web-scale exact-dup cluster of size k
    * would put k rows in 32 band buckets each and emit k² candidate
    * pairs. Collapsing to one representative per distinct text first
    * (one hash shuffle on a 128-bit text key — xxhash64 ⊕
    * rolling_hash, collision odds ~2⁻¹²⁵ per pair) makes the band
    * join's input distinct-text-sized; member rows rejoin their
    * component through rep→member edges. Connectivity is preserved
    * exactly: similarity is a function of the text, so any edge LSH
    * would have found from a duplicate member is implied
    * transitively through its representative. */
  def dedupNear(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(textCol),
      xxhash64(col(textCol)).as("__k1"),
      graft.functions.RollingHash.fingerprint(col(textCol)).as("__k2"))
    val reps = keyed.groupBy(col("__k1"), col("__k2"))
      .agg(min(col("id")).as("rep"))
    // rep -> member edges inside each exact-dup group
    val repEdges = keyed.join(reps, Seq("__k1", "__k2"))
      .where(col("id") =!= col("rep"))
      .select(col("rep").as("a"), col("id").as("b"))
    // LSH pair discovery over one row per distinct text
    val repRows = keyed.join(
        reps.select(col("rep").as("id")), Seq("id"), "left_semi")
      .select(col("id").as(idCol), col(textCol))
    val lshPairs = minhashLsh(repRows, idCol, textCol, threshold)
      .select(col("a"), col("b"))
    val ids = df.select(col(idCol).as("id"))
    val keep = clusters(ids, lshPairs.union(repEdges))
      .where(col("id") === col("cluster"))
      .select(col("id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Canonical selection within near-duplicate clusters: instead of
    * dedupNear's keep-minimum-id rule, keep each cluster's BEST
    * document — the curation policy real pipelines run (drop the
    * truncated mirror, keep the full article). "Best" is an INTEGER
    * key chain (token count DESC, id ASC), so every decision is
    * exact cross-engine — no double ordering, no margin gate.
    *
    * Pair discovery is [[jaccardJoin]]'s inverted index (COMPLETE by
    * the ppjoin prefix theorem — every pair at Jaccard ≥ threshold
    * shares an indexed token — unlike the LSH path's S-curve recall),
    * clustering is the alternating-star connected components. One
    * row per cluster: (cluster = min member id, keep_id, n_members,
    * keep_tokens) — integer-only output.
    */
  def canonicalSelect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3): DataFrame = {
    val pairs = jaccardJoin(df, idCol, textCol, threshold, n)
      .select(col("a"), col("b"))
    val ids = df.select(col(idCol).as("id"))
    val comp = clusters(ids, pairs)
    val stats = df.select(col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    val byCluster = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
    val pick = byCluster.orderBy(col("n_tokens").desc, col("id").asc)
    comp.join(stats, Seq("id"))
      .withColumn("rn", row_number().over(pick))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .where(col("rn") === 1)
      .select(col("cluster"), col("id").as("keep_id"),
        col("n_members"), col("n_tokens").as("keep_tokens"))
  }

  /** Substring-level exact dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): two documents are
    * substring duplicates when they share ANY contiguous run of
    * `windowTokens` tokens. The classic complement to whole-document
    * near-dup — catches boilerplate, quoted passages, and templated
    * text that document-level Jaccard misses.
    *
    * Shape: every window fingerprint comes from ONE O(bytes) pass per
    * document ([[graft.functions.WindowFingerprints]], codegen
    * prefix-hash kernel — not windowTokens× re-hashing), pairs come
    * from an inverted-index equi-join over distinct fingerprints —
    * never all-pairs; the join's key space is the distinct-window
    * universe, and web-scale boilerplate (the same window in k docs)
    * costs k posting rows, k(k−1)/2 output pairs, exactly the true
    * result size.
    *
    * Output (a, b, n_shared): the number of DISTINCT window
    * fingerprints the pair shares — integer evidence, engine-exact
    * (the oracle recomputes the same polynomial hashes). */
  def substringDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50): DataFrame = {
    val fps = graft.functions.WindowFingerprints
      .windowFingerprints(col(textCol), windowTokens)
    val posts = df
      .select(col(idCol).as("id"), explode(array_distinct(fps)).as("fp"))
      .localCheckpoint(eager = false) // feeds both join sides once
    posts.select(col("fp"), col("id").as("a"))
      .join(posts.select(col("fp"), col("id").as("b")), Seq("fp"))
      .where(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Substring-level decontamination (how eval-set leakage is
    * actually removed in practice, per Lee et al. 2022 / GPT-3
    * appendix C): drop every `corpus` doc sharing ANY contiguous
    * `windowTokens`-token run with a `contam` doc. Window
    * fingerprints come from the O(bytes) prefix-hash kernel; the
    * membership test is a left_semi join of corpus posting rows
    * against the contam side's distinct fingerprints (small —
    * broadcast-able for real eval sets), then one left_anti on the
    * corpus id. */
  def decontaminateSubstring(
      corpus: DataFrame,
      contam: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50): DataFrame =
    decontaminateSubstringAgainst(corpus,
      contamFingerprints(contam, idCol, textCol, windowTokens),
      idCol, textCol, windowTokens)

  /** The contam side's distinct window fingerprints — one `fp` column.
    * Split out so long-lived callers (the streaming pass) compute the
    * eval set's fingerprints ONCE and reuse them across micro-batches
    * instead of re-deriving them per batch. */
  def contamFingerprints(
      contam: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50): DataFrame =
    contam.select(
        explode(array_distinct(graft.functions.WindowFingerprints
          .windowFingerprints(col(textCol), windowTokens))).as("fp"))
      .distinct()

  /** [[decontaminateSubstring]] against a precomputed fingerprint
    * set (from [[contamFingerprints]] — possibly checkpointed once
    * and shared across many corpus passes). */
  def decontaminateSubstringAgainst(
      corpus: DataFrame,
      contamFps: DataFrame, // (fp long)
      idCol: String,
      textCol: String,
      windowTokens: Int = 50): DataFrame = {
    val posts = corpus.select(col(idCol).as("id"),
      explode(array_distinct(graft.functions.WindowFingerprints
        .windowFingerprints(col(textCol), windowTokens))).as("fp"))
    // left_semi needs no distinct on the build side — duplicate fps
    // would not multiply rows anyway
    val bad = posts
      .join(contamFps.select("fp"), Seq("fp"), "left_semi")
      .select(col("id").as(idCol)).distinct()
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash fingerprint per doc: sum the ±1 contribution of
    * every shingle's hash bit, bit j of the fingerprint = sign of
    * sum_j. 64 map-side-combinable sums, one shuffle. */
  def simhash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2): DataFrame = {
    val posts = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("shingle"))
      .withColumn("h", xxhash64(col("shingle")))
    val bitSums = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as(s"s$j"))
    val sums = posts.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce[Column](_.bitwiseOR(_))
    sums.select(col("id"), fp.as("simhash"))
  }

  /** Cross-corpus SimHash near-dup join: all (a from `left`, b from
    * `right`) fingerprint pairs within Hamming ≤ maxDist — the
    * SimHash member of the cross family (jaccardJoinCross /
    * minhashLshCross / cosineNearDupCross are its siblings). Same
    * two-chunk pigeonhole blocking as [[simhashNearDup]], over the
    * DISTINCT fingerprints of each side; both sides chunk with the
    * SAME partition of the 64 bits, so a left fingerprint lands in
    * exactly the buckets its ≤ maxDist right neighbors share. Every
    * ordered (a, b) pair is a result (ids equal across sides are
    * excluded as self-matches, the family-wide convention). */
  def simhashNearDupCross(
      left: DataFrame,  // (id, simhash)
      right: DataFrame, // (id, simhash)
      maxDist: Int = 3): DataFrame = {
    val nChunks = maxDist + 2
    require(nChunks <= 64, "need at least one bit per chunk (maxDist <= 62)")
    val base = 64 / nChunks
    val extra = 64 % nChunks
    val offsets = (0 to nChunks).map(c => c * base + math.min(c, extra))
    def chunk(c: Int): Column = {
      val width = offsets(c + 1) - offsets(c)
      val mask = if (width == 64) -1L else (1L << width) - 1
      shiftrightunsigned(col("simhash"), offsets(c)).bitwiseAND(lit(mask))
    }
    val bandKeys = for {
      i <- 0 until nChunks
      j <- i + 1 until nChunks
    } yield struct(lit(i * nChunks + j).as("band"),
      chunk(i).as("c1"), chunk(j).as("c2"))
    def banded(df: DataFrame): DataFrame =
      df.select(col("simhash")).distinct()
        .select(col("simhash"), explode(array(bandKeys: _*)).as("bk"))
        .select(col("simhash"), col("bk.band").as("band"),
          col("bk.c1").as("c1"), col("bk.c2").as("c2"))
    val fpPairs = banded(left)
      .select(col("band"), col("c1"), col("c2"), col("simhash").as("fa"))
      .join(banded(right).select(col("band"), col("c1"), col("c2"),
        col("simhash").as("fb")), Seq("band", "c1", "c2"))
      .select("fa", "fb").distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= maxDist)
    fpPairs
      .join(left.select(col("simhash").as("fa"), col("id").as("a")), Seq("fa"))
      .join(right.select(col("simhash").as("fb"), col("id").as("b")), Seq("fb"))
      .where(col("a") =!= col("b"))
      .select(col("a"), col("b"), col("hamming"))
  }

  /** All pairs with Hamming(simhash_a, simhash_b) ≤ maxDist, found
    * exactly, with joins whose key space scales with the corpus:
    *
    *  1. The join runs over DISTINCT fingerprints, so exact-duplicate
    *     clusters (the dominant skew at web scale — identical docs
    *     share a fingerprint) collapse to one row each; identical-
    *     fingerprint (Hamming 0) id pairs come from a separate
    *     equi-join on the full 64-bit value.
    *  2. Two-chunk blocking: the fingerprint splits into maxDist+2
    *     chunks, so ≤ maxDist differing bits leave at least TWO
    *     chunks intact (pigeonhole) — some ordered chunk PAIR matches.
    *     Banding on all C(maxDist+2, 2) chunk pairs gives join keys
    *     of ~2·64/(maxDist+2) bits (≈26 bits at maxDist=3, vs 16 bits
    *     for single-chunk blocking) — bucket sizes shrink by ~2^10 and
    *     candidate pairs by ~2^20 at any corpus size.
    */
  def simhashNearDup(
      fps: DataFrame, // (id, simhash)
      maxDist: Int = 3): DataFrame = {
    val nChunks = maxDist + 2
    require(nChunks <= 64, "need at least one bit per chunk (maxDist <= 62)")
    // chunk c covers bits [offsets(c), offsets(c+1)): widths differ by
    // at most one — the pigeonhole argument holds for any partition
    val base = 64 / nChunks
    val extra = 64 % nChunks
    val offsets = (0 to nChunks).map(c => c * base + math.min(c, extra))
    def chunk(c: Int): Column = {
      val width = offsets(c + 1) - offsets(c)
      val mask = if (width == 64) -1L else (1L << width) - 1
      shiftrightunsigned(col("simhash"), offsets(c)).bitwiseAND(lit(mask))
    }
    val reps = fps.select(col("simhash")).distinct()
    val bandKeys = for {
      i <- 0 until nChunks
      j <- i + 1 until nChunks
    } yield struct(lit(i * nChunks + j).as("band"),
      chunk(i).as("c1"), chunk(j).as("c2"))
    val banded = reps
      .select(col("simhash"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("simhash"), col("bk.band").as("band"),
        col("bk.c1").as("c1"), col("bk.c2").as("c2"))
    val fpPairs = banded
      .select(col("band"), col("c1"), col("c2"), col("simhash").as("fa"))
      .join(banded.select(col("band"), col("c1"), col("c2"),
        col("simhash").as("fb")), Seq("band", "c1", "c2"))
      .where(col("fa") < col("fb"))
      .select("fa", "fb").distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= maxDist)
    val ids = fps.select(col("id"), col("simhash"))
    // cross-fingerprint id pairs (output-size bound, no intermediate
    // blowup: fpPairs is already Hamming-filtered)
    val cross = fpPairs
      .join(ids.select(col("simhash").as("fa"), col("id").as("ia")), Seq("fa"))
      .join(ids.select(col("simhash").as("fb"), col("id").as("ib")), Seq("fb"))
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("hamming"))
    // identical-fingerprint pairs (Hamming 0)
    val within = ids.select(col("simhash"), col("id").as("a"))
      .join(ids.select(col("simhash"), col("id").as("b")), Seq("simhash"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), lit(0).as("hamming"))
    // disjoint by construction (hamming >= 1 vs == 0; one fp per id)
    cross.union(within)
  }

  /** Corpus-level overlap matrix: for every pair of groups (sources,
    * dumps, crawls), the exact count of SHARED DISTINCT SHINGLES plus
    * both group sizes — the audit that tells a data curator which
    * corpora substantially duplicate each other before any doc-level
    * dedup runs. Same shingle definition as the whole similarity
    * family ([[shingles]] — one definition, never two).
    *
    * Scale shape: ONE corpus-sized exchange — groupBy(shingle) with a
    * map-side-combining collect_set(group) subsumes both the
    * (group, shingle) distinct AND the shingle-keyed self-join this
    * used to run (three full exchanges collapsed to one). Each
    * shingle's group set is ≤ G elements, so per-key state is bounded
    * and skew structurally capped; group sizes and the ≤ C(G,2)
    * per-shingle pair expansion both derive NARROWLY from the
    * checkpointed per-shingle sets. All integer outputs; consumers
    * derive Jaccard/containment as rationals from (inter, n_a, n_b)
    * without losing exactness. */
  def sourceOverlap(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val bySh = df.select(col(groupCol).as("grp"),
        explode(shingles(col(textCol), n)).as("sh"))
      .groupBy("sh").agg(collect_set(col("grp")).as("gs"))
      .localCheckpoint(eager = true) // feeds sizes AND pair expansion
    // exploding the per-shingle DISTINCT group sets yields exactly the
    // distinct (group, shingle) pairs — sizes without a second exchange
    // over the corpus (the groupBy here is G-sized)
    val sizes = bySh.select(explode(col("gs")).as("grp"))
      .groupBy("grp").agg(count(lit(1)).as("n_sh"))
    bySh.where(size(col("gs")) >= 2)
      .select(explode(col("gs")).as("ga"), col("gs"))
      .select(col("ga"), explode(col("gs")).as("gb"))
      .where(col("ga") < col("gb"))
      .groupBy(col("ga").as("grp_a"), col("gb").as("grp_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("grp").as("grp_a"), col("n_sh").as("n_a")),
        Seq("grp_a"))
      .join(sizes.select(col("grp").as("grp_b"), col("n_sh").as("n_b")),
        Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("inter"),
        col("n_a"), col("n_b"))
  }
}