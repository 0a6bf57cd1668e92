"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — brute-force cosine top-k: exact baseline.
  Dot products run as JVM expressions (``aggregate``/``zip_with`` over
  the arrays, double accumulation) inside a broadcast nested-loop join
  of the (small) query set against the corpus — no Python, no UDF.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH.
  Each vector gets a ``n_planes``-bit signature against Rademacher
  (±1) hyperplanes derived from md5 parity — deterministic, no stored
  model, and embedded as LITERAL arrays in the plan so the DuckDB
  oracle carries the identical planes; candidates share a signature
  bucket (multi-probe over ``n_tables`` independent tables), exact
  cosine re-ranks inside buckets. At 10^9 vectors the bucket join
  replaces the O(n·q) cross product.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours of each query vector (self
    excluded). Queries broadcast; corpus scanned once."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


@lru_cache(maxsize=None)  # default config needs n_tables*n_planes=32 entries
def rademacher_plane(table: int, plane: int, dim: int) -> tuple[float, ...]:
    """Deterministic ±1 hyperplane: component j is +1 when the first
    md5 hex digit of ``"{table}_{plane}_{j}"`` is odd. Pure-Python (one
    md5 per component, computed once per process) — the DuckDB oracle
    embeds the SAME literal array, so signatures agree bit-for-bit."""
    return tuple(
        1.0 if int(hashlib.md5(f"{table}_{plane}_{j}".encode()).hexdigest()[0], 16) % 2
        else -1.0
        for j in range(dim)
    )


def _signature(vec: Column, n_planes: int, table: int, dim: int) -> Column:
    """Random-hyperplane signature over literal Rademacher planes.
    The sign test uses round(proj, 6): both engines round the projection
    to the same grid before comparing against 0, so a last-ulp
    summation difference cannot flip a bucket bit."""
    bits = []
    for p in range(n_planes):
        comp = F.array(*[F.lit(v) for v in rademacher_plane(table, p, dim)])
        proj = F.aggregate(
            F.zip_with(vec, comp, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(F.round(proj, 6) >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in at least one
    of ``n_tables`` hyperplane tables; exact cosine re-ranks candidates.

    ``multiprobe`` also probes every Hamming-distance-1 bucket on the
    QUERY side (sig XOR one flipped plane bit): 1+n_planes probes per
    (query, table) instead of more tables — recall rises at the cost of
    a small bounded fan-out of the tiny query side, while the corpus
    keeps exactly one bucket row per table (the side that matters at
    10^9 vectors)."""
    def with_sigs(df, idname, probe):
        out = df.select(F.col(id_col).alias(idname), F.col(vec_col).alias(f"{idname}_v"))
        def probes(sig):
            if not probe:
                return [sig]
            return [sig] + [sig.bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(n_planes)]

        sigs = F.array(
            *[
                F.struct(F.lit(t).alias("table"), s.alias("sig"))
                for t in range(n_tables)
                for s in probes(_signature(F.col(f"{idname}_v"), n_planes, t, dim))
            ]
        )
        return out.withColumn("b", F.explode(sigs)).select(
            idname, f"{idname}_v", "b.table", "b.sig"
        )

    qs = with_sigs(queries, "query_id", multiprobe)
    cs = with_sigs(corpus, "cand_id", False)
    cand = (
        cs.join(qs, ["table", "sig"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn(
            "cosine", F.round(cosine_sim(F.col("query_id_v"), F.col("cand_id_v")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Bucketed embedding near-duplicate pairs (``id_a < id_b``,
    ``cosine >= threshold``) — the at-scale sibling of the brute-force
    all-pairs tier (``queries.q_embedding_neardup``).

    Candidates must share a random-hyperplane bucket in at least one of
    ``n_tables`` tables; exact cosine then verifies, so precision is
    exact and only recall is approximate (byte-identical vectors hash
    to identical signatures in every table — guaranteed recall for
    exact copies; near-copies miss only when noise flips a
    near-zero-projection sign bit in all tables).

    Scale shape mirrors :func:`~astrospectro_spark.functions.dedup.
    minhash_lsh_candidates`: the self-join shuffles ONLY
    ``(table, sig, id)`` — 3 longs per row per table — and the wide
    vectors are re-attached to the deduplicated candidate pairs
    afterwards. At 10^9 vectors the bucket exchange stays ~100 GB
    while a vector-carrying join would be tens of TB.
    """
    sigs = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        _signature(F.col(vec_col), n_planes, t, dim).alias("sig"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.table", "b.sig")

    a = sigs.select(F.col(id_col).alias("id_a"), "table", "sig")
    b = sigs.select(F.col(id_col).alias("id_b"), "table", "sig")
    cand = (
        # shuffle-both-sides (see dedup.minhash_lsh_candidates): a
        # broadcast of one side would re-execute the signature
        # projection for the build side instead of reusing the twin
        # exchange, and can never apply at 10^9 vectors anyway
        a.join(b.hint("shuffle_hash"), ["table", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    v = df.select(F.col(id_col), F.col(vec_col))
    cand = cand.join(
        v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")), "id_a"
    ).join(v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")), "id_b")
    return (
        cand.withColumn("cosine", F.round(cosine_sim(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the data-dependent
    sibling of :func:`lsh_cosine_topk` (random planes ignore the data
    distribution; IVF cells adapt to it).

    Centroids are a deterministic md5-ordered sample of corpus vectors
    (no iterative k-means: at 10^9 vectors a seeded sample is the
    standard centroid bootstrap, and determinism keeps reruns and
    engines agreeing). Every corpus vector is assigned to its single
    nearest centroid by cosine (one scan, a 16-way literal dot-product
    expression — centroids are broadcast as plan literals, KB-sized);
    each query probes its ``n_probe`` nearest cells, candidates are
    exact-cosine re-ranked. Guaranteed recall for byte-identical
    vectors (same vector → same argmax cell, and the query's best cell
    is always probed).

    Scale shape: the corpus keeps ONE row per vector tagged with a
    cell id; only the (cell, query) join fans out, bounded by
    n_probe × per-cell population — the classic IVF candidate budget.
    """
    cents = [
        (int(r[0]), list(r[1]))
        for r in corpus.select(
            F.col(id_col),
            F.col(vec_col),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h")
        .limit(n_centroids)
        .select(id_col, vec_col)
        .collect()
    ]
    if not cents:
        # empty corpus: no cells to probe — empty result, stable schema
        return (
            queries.select(F.col(id_col).alias("query_id"))
            .limit(0)
            .withColumn("cand_id", F.col("query_id"))
            .withColumn("cosine", F.lit(0.0))
            .withColumn("rank", F.lit(0).cast("long"))
        )

    def cell_scores(vec: Column) -> list[Column]:
        out = []
        for ci, (_, cvec) in enumerate(cents):
            cv = F.array(*[F.lit(float(x)) for x in cvec])
            out.append(
                F.struct(
                    F.round(cosine_sim(vec, cv), 6).alias("score"),
                    F.lit(ci).alias("cell"),
                )
            )
        return out

    def best_cell(vec: Column) -> Column:
        # ties break toward the LARGER cell index (greatest on struct)
        return F.greatest(*cell_scores(vec)).getField("cell")

    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        best_cell(F.col(vec_col)).alias("cell"),
    )
    # query probes: top n_probe cells by score (sort desc via struct)
    probes = F.slice(
        F.reverse(F.array_sort(F.array(*cell_scores(F.col(vec_col))))),
        1,
        n_probe,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probes).alias("p"),
    ).select("query_id", "qv", F.col("p.cell").alias("cell"))

    cand = (
        c.join(q, "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )
