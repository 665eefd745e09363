"""Vector math over ``array<float|double>`` columns as Catalyst
expressions (JVM-side; no UDFs).

Determinism contract: dot products and norms are sequential left
folds (``F.aggregate``) over double-cast arrays, which is the same
evaluation order as DuckDB's ``list_reduce`` — results are
bit-identical across engines, so oracle comparison works even on
floating point."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two equal-length arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def sqdist(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance — same evaluation order as
    DuckDB's ``list_reduce`` over the per-component squares, so the
    double result is bit-identical across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def sign_bucket(a: Column, bits: int = 8) -> Column:
    """LSH-style bucket id from the signs of the first ``bits``
    components: bit j set iff a[j] >= 0. A cheap deterministic
    space partitioner for bucketed ANN search."""
    acc = F.lit(0)
    for j in range(bits):
        acc = acc + F.when(F.element_at(a, j + 1) >= 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
    return acc.cast("int")


def banded_sign_buckets(a: Column, bands: int = 4, bits: int = 8) -> Column:
    """Banded sign-LSH: array of (band_id, bucket) structs where band
    ``t``'s bucket packs the signs of components [t*bits, (t+1)*bits).

    The MinHash-banding trick applied to sign hashes: two vectors are
    near-dup candidates if ANY band matches entirely, so recall decays
    per-band (p^bits) but recovers across bands (1-(1-p^bits)^bands).
    Near-identical vectors disagree only on components near zero, so
    unperturbed bands match exactly."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("band_id"),
                sign_bucket(F.slice(a, t * bits + 1, bits), bits).alias("bucket"),
            )
            for t in range(bands)
        ]
    )


def projection_weights(
    dim: int, bands: int, bits: int, seed: str = "proj"
) -> list[list[list[int]]]:
    """Deterministic ±1 random-projection weights, ``[band][bit][dim]``,
    from md5 parity of ``"{seed}:{band}:{bit}:{j}"`` — pure stdlib, no
    RNG state, so both engines (and any re-run) derive the identical
    matrix. Rademacher ±1 entries give the same sign-LSH collision
    geometry as Gaussian projections (Charikar 2002 SimHash uses
    arbitrary symmetric distributions) while keeping the fold exact on
    integers-times-doubles."""
    import hashlib

    return [
        [
            [
                1
                if int(
                    hashlib.md5(
                        f"{seed}:{t}:{b}:{j}".encode()
                    ).hexdigest()[:7],
                    16,
                )
                % 2
                == 0
                else -1
                for j in range(dim)
            ]
            for b in range(bits)
        ]
        for t in range(bands)
    ]


def banded_projection_buckets(
    a: Column, dim: int, bands: int = 4, bits: int = 16,
    seed: str = "proj",
) -> Column:
    """Banded sign-LSH over RANDOM PROJECTIONS — the scale path past
    :func:`banded_sign_buckets`'s ceiling. Raw-component sign banding
    runs out of bucket space at ``bands * bits = dim`` (64-dim → at
    most 2^16 buckets/band, saturating near 10^7 vectors; measured
    rule in SCALE.md round 11). Here band ``t``'s bucket packs the
    signs of ``bits`` Rademacher projections ``Σ_j w[t][b][j]·a[j]``
    with weights from :func:`projection_weights` — 2^bits buckets per
    band for ANY ``bits``, decoupled from the embedding dimension.

    Each projection is the same sequential left fold both engines use
    for dot products (Spark ``F.aggregate`` ≡ DuckDB ``list_reduce``
    over the identical literal weights), so bucket ids are
    bit-identical across engines and the construction stays
    oracle-mirrorable. A near-identical pair flips a projection sign
    only when the projection sits within the perturbation's reach of
    zero — the SimHash S-curve — so recall is governed by
    (bands, bits) exactly like the raw-sign variant.
    """
    ws = projection_weights(dim, bands, bits, seed)

    def proj(t: int, b: int) -> Column:
        w = F.array(*[F.lit(float(x)) for x in ws[t][b]])
        return F.aggregate(
            F.zip_with(a, w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return F.array(
        *[
            F.struct(
                F.lit(t).alias("band_id"),
                sum(
                    [
                        F.when(proj(t, b) >= 0, F.lit(1 << b)).otherwise(
                            F.lit(0)
                        )
                        for b in range(bits)
                    ],
                    F.lit(0),
                ).cast("int").alias("bucket"),
            )
            for t in range(bands)
        ]
    )
