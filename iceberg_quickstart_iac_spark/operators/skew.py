"""Skew mitigation for hot-key joins (SURVEY §2.3 scale hardening).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `session.get_spark`) handles most skew by splitting oversized
sort-merge partitions at runtime. Explicit salting remains the tool for
the cases AQE can't fix: a single key too hot for any partition split
(every row still lands in one reducer) joined against a replicable side.

:func:`salted_join` splits every hot key into ``salt`` sub-keys: the big
side gets a deterministic content-hash salt, the small side replicates
``salt`` times with every salt value. The join becomes uniform on
(key…, salt) at the cost of `|small| × salt` build rows — the classic
replication/balance trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted.

    Only join types that keep the big side outer-safe are supported
    (``inner``, ``left``/``left_outer``, ``left_semi``, ``left_anti``):
    salting the big side never changes its row multiplicity, while the
    small side is replicated per salt value, which would corrupt right /
    full outer semantics.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in {"inner", "left", "left_outer", "left_semi", "left_anti"}:
        raise ValueError(f"salted_join does not support how={how!r}")
    salted_big = big.withColumn(_SALT, F.pmod(F.xxhash64(*big.columns), F.lit(salt)))
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    return salted_big.join(replicated, [*keys, _SALT], how).drop(_SALT)
