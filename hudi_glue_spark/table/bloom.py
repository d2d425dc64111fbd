"""Per-file key Bloom filters — Hudi bloom-index parity.

The reference's upsert relies on Hudi's bloom index to tag incoming
records against existing file groups (implied by the upsert operation,
glue/HudiJarGlueJob.py:83; Hudi stores the filters in parquet footers).
Here each data file gets a ``<file>.bloom`` sidecar built from the key
column(s) at write time, and :meth:`KeyedTable.read_keys` consults the
sidecars to prune files BEFORE any scan — a point lookup on a 100 TB
table opens only the files that may hold the key, typically one per
partition, instead of every file min/max overlap would admit (keys are
usually scattered, so min/max pruning is useless for them — exactly why
Hudi uses blooms and not range stats for its index).

False positives only (a pruned-in file may lack the key — the exact
filter after the scan settles it); a MISSING sidecar keeps the file, so
false negatives are impossible by construction. Sidecars are internal
metadata: hashes only need to be stable within this library, so md5 of
the stringified key is fine (and engine-portable if anything else ever
wants to read them).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

#: ~1% false-positive rate at 10 bits/key with 7 probes.
BITS_PER_KEY = 10
NUM_PROBES = 7

SIDECAR_SUFFIX = ".bloom"


def key_string(values) -> str:
    """Canonical string form of a (possibly composite) key tuple."""
    return "|".join(str(v) for v in values)


def _hash_pair(key: str) -> tuple[int, int]:
    d = hashlib.md5(key.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big")


def build(keys: list[str]) -> dict:
    """A serializable bloom over ``keys`` (double hashing: probe i uses
    h1 + i*h2 mod m — the standard Kirsch-Mitzenmacher construction)."""
    m = max(1024, len(keys) * BITS_PER_KEY)
    arr = bytearray((m + 7) // 8)
    for key in keys:
        h1, h2 = _hash_pair(key)
        for i in range(NUM_PROBES):
            b = (h1 + i * h2) % m
            arr[b >> 3] |= 1 << (b & 7)
    return {"m": m, "k": NUM_PROBES, "n": len(keys), "b64": base64.b64encode(bytes(arr)).decode()}


def maybe_contains(bloom: dict, key: str) -> bool:
    m, k = bloom["m"], bloom["k"]
    arr = base64.b64decode(bloom["b64"])
    h1, h2 = _hash_pair(key)
    for i in range(k):
        b = (h1 + i * h2) % m
        if not arr[b >> 3] & (1 << (b & 7)):
            return False
    return True


def write_sidecar(data_file_path: str, keys: list[str]) -> None:
    with open(data_file_path + SIDECAR_SUFFIX, "w") as f:
        json.dump(build(keys), f)


def read_sidecar(data_file_path: str) -> dict | None:
    p = data_file_path + SIDECAR_SUFFIX
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
