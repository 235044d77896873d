"""Skew mitigation: manual key salting as the fallback behind AQE.

AQE's skew-join splitting (on by default in session.py) is the first
line of defense for hot keys — e.g. power users in the uid-keyed J1
self-join (SURVEY §4, skew note). This utility is the explicit
fallback for when runtime stats aren't enough (extreme single-key
skew, or a build side too large to split): the large side spreads
each hot key across ``n_salts`` shuffle partitions, the small side is
replicated once per salt, and the join key becomes (key, salt) —
turning one hot partition into n even ones at the cost of an
n-fold replication of the small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with ``small`` replicated across ``n_salts`` salt
    values. Result rows are identical to ``large.join(small, on,
    how)`` — the salt only changes the shuffle distribution.

    The large side's salt is a deterministic hash of its entire row,
    so hot-key rows scatter uniformly and re-runs are stable. Supports
    inner and left joins (the small side must be unique per key for
    left semantics to match, same as the unsalted join).
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt_src = [c for c in large.columns]
    salted_large = large.withColumn(
        _SALT, F.pmod(F.hash(*salt_src), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias(_SALT)
    salted_small = small.select("*", salts)
    joined = salted_large.join(salted_small, keys + [_SALT], how)
    return joined.drop(_SALT)
