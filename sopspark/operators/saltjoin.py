"""Salted equi-join: the explicit hot-key skew rewrite for joins.

A plain equi-join hashes every row of a hot key to ONE reducer pair —
a celebrity key owning 10% of a 100 TB fact table turns into a single
straggler task. The classic rewrite: append a salt in [0, S) to the
BIG side's key, replicate each small-side row S times (one per salt
value), and join on (key, salt) — the hot key's rows now spread over S
reducers. AQE's skew-join split does this adaptively at runtime; this
operator is the explicit, deterministic form for when the skew is known
up front (or AQE is unavailable, e.g. streaming-static joins).

Correctness is machine-verified: the registered oracle is the PLAIN
join, so parity proves the rewrite is semantics-preserving — every
(left, right) match appears exactly once (each left row carries ONE
salt value; the right row replicated with that same value is the unique
partner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side
    salted over ``salt_buckets`` reducers per key. The small side is
    replicated ``salt_buckets``× (explode of a literal range — keep it
    the dimension side). Supports ``inner`` and ``left`` (left = big
    side preserved)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    # deterministic per-row salt: a function of the row's own key + a
    # stable row discriminator would need an id column; crc32 of the
    # whole-row hash is retry-stable because xxhash64 is evaluated on the
    # row's column VALUES, not its physical position
    salt = F.pmod(F.xxhash64(*big.columns), F.lit(salt_buckets)).cast("int")
    b = big.withColumn("_salt", salt)
    # no cast around the explode: a generator can't nest in expressions;
    # sequence(int, int) already yields ints matching the salt's cast
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = b.join(s, on=[on, "_salt"], how=how)
    return out.drop("_salt")
