"""Data-layout operators: Z-order (Morton) clustering for scan pruning.

Beyond-reference surface. At 100 TB the cheapest query is the one that
never reads the data: parquet row-group/file min-max statistics prune
scans, but they only help when the layout CLUSTERS the filtered
columns. A single-column sort gives perfect pruning on that column and
none on any other; Z-ordering interleaves the bits of several columns'
bucket ids so that files cover small HYPERCUBES of the value space —
every interleaved column prunes, each a little less sharply than a
dedicated sort (the Delta/Iceberg OPTIMIZE ZORDER rationale).

Everything here is deterministic arithmetic (equi-width buckets from
min/max bounds + bit interleave), so z-values replay in ANSI SQL and
the gate hash-matches them (``zorder_sql`` generates the mirror).
The write path is plain Spark: repartitionByRange on the z-value
(range exchange = contiguous z-blocks per file) + sortWithinPartitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_col(v: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Equi-width bucket id in [0, 2^bits): floor((v-mn)/span * 2^bits),
    clamped (v == max lands in the top bucket); constant columns and
    NULLs map to bucket 0."""
    m = (1 << bits) - 1
    span = mx - mn
    raw = F.floor((F.coalesce(v, mn) - mn) / span * F.lit(float(1 << bits)))
    return F.when(span <= 0, F.lit(0)).otherwise(
        F.least(F.lit(m).cast("long"), F.greatest(F.lit(0).cast("long"),
                                                  raw))).cast("long")


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of column i lands at position b*c + i.
    Pure +/*/div/mod arithmetic — no shift-by-column, replayable."""
    c = len(buckets)
    z = F.lit(0).cast("long")
    for i, bk in enumerate(buckets):
        for b in range(bits):
            z = z + F.pmod(F.floor(bk / F.lit(float(1 << b))).cast("long"),
                           F.lit(2)) * F.lit(1 << (b * c + i))
    return z


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16,
                 bounds: dict | None = None,
                 out_col: str = "_z") -> DataFrame:
    """df + ``out_col``: the Morton code of the given columns.

    Bounds default to the columns' true min/max gathered in ONE
    aggregate row broadcast onto the data (pass ``bounds`` as
    {col: (lo, hi)} to skip that scan — the right call when writing
    incrementally with stable domain bounds, so today's files bucket
    identically to yesterday's). c*bits must fit a BIGINT (<= 63).
    """
    if not cols or len(cols) * bits > 63:
        raise ValueError(
            f"need 1+ cols with len(cols)*bits <= 63,"
            f" got {len(cols)}x{bits}")
    if bounds is not None:
        missing = [c for c in cols if c not in bounds]
        if missing:
            raise ValueError(f"bounds missing for {missing}")
        lo = {c: F.lit(float(bounds[c][0])) for c in cols}
        hi = {c: F.lit(float(bounds[c][1])) for c in cols}
        joined = df
    else:
        agg = df.agg(*[f for c in cols for f in
                       (F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                        F.max(F.col(c).cast("double")).alias(f"_mx_{c}"))])
        joined = df.crossJoin(F.broadcast(agg))
        lo = {c: F.col(f"_mn_{c}") for c in cols}
        hi = {c: F.col(f"_mx_{c}") for c in cols}
    buckets = [
        _bucket_col(F.col(c).cast("double"), lo[c], hi[c], bits)
        for c in cols
    ]
    return joined.select(*df.columns,
                         _interleave(buckets, bits).alias(out_col))


def zorder_sql(cols: list[str], bits: int, table: str = "part") -> str:
    """GENERATED ANSI-SQL mirror of zorder_value with derived bounds
    (the gopher generated-oracle rule): same bucket formula, same
    interleave arithmetic."""
    c = len(cols)
    mins = ", ".join(
        f"min(CAST({col} AS DOUBLE)) AS mn_{col},"
        f" max(CAST({col} AS DOUBLE)) AS mx_{col}" for col in cols)
    terms = []
    for i, col in enumerate(cols):
        bk = (f"CAST(CASE WHEN mx_{col} - mn_{col} <= 0 THEN 0 "
              f"ELSE least({(1 << bits) - 1}, greatest(0, "
              f"floor((coalesce(CAST({col} AS DOUBLE), mn_{col})"
              f" - mn_{col}) / (mx_{col} - mn_{col})"
              f" * {float(1 << bits)!r}))) END AS BIGINT)")
        for b in range(bits):
            terms.append(
                f"(CAST(floor(({bk}) / {float(1 << b)!r}) AS BIGINT)"
                f" % 2) * {1 << (b * c + i)}")
    return (f"SELECT t.*, ({' + '.join(terms)}) AS _z"
            f" FROM {table} t, (SELECT {mins} FROM {table}) s")


def zorder_repartition(df: DataFrame, cols: list[str], num_files: int,
                       bits: int = 16,
                       bounds: dict | None = None) -> DataFrame:
    """Range-partition + sort the frame by its z-value — each output
    partition (file, when written) covers one contiguous z-range, i.e.
    one small hypercube chain of the value space, so EVERY interleaved
    column's min/max statistics prune. Drop-in before write_parquet."""
    z = zorder_value(df, cols, bits, bounds)
    return (
        z.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
