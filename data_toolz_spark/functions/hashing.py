"""The engine-portable hash device, in ONE place.

``conv(substring(md5(x), 1, 15), 16, 10)`` — the first 15 hex chars of
an md5 as a 60-bit non-negative long — is the hash every
oracle-replayable operator here uses (DSIR buckets, classifier
features, bloom positions, minhash permutations, shard order): any SQL
engine or plain ``hashlib`` reproduces it exactly, unlike
``xxhash64``.  Changing the prefix width or the seed separator is a
cross-engine-compatibility change and must happen HERE, nowhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix60(col: Column, seed: int | None = None) -> Column:
    """60-bit non-negative long from the md5 hex prefix of ``col``
    (cast to string), optionally salted as ``value || '|' || seed`` —
    the plain-Python twin is
    ``int(hashlib.md5(f"{v}|{seed}".encode()).hexdigest()[:15], 16)``.
    """
    s = col.cast("string")
    if seed is not None:
        s = F.concat_ws("|", s, F.lit(str(seed)))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


__all__ = ["md5_prefix60"]
