"""Per-partition checkpointing: atomic writes + a manifest of finished work.

"Resumable from checkpoint" for a batch pipeline (north rule) means:
- output is written one directory per input shard, to a temp dir first and
  atomically renamed into place (a crashed writer leaves no half-partition);
- a manifest records each completed shard with an input FINGERPRINT (file
  names + sizes) and lineage (row counts, wall time);
- on resume, shards whose fingerprint matches are skipped; changed inputs
  invalidate only their own shard.

Shard identity is derived from input file paths, so reruns are idempotent:
stage outputs are content-deterministic (content-hashed ids, deterministic
decode ordering), making retries safe at any granularity.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field


def shard_fingerprint(files: list[str]) -> str:
    """Identity of a shard's inputs: name + size + mtime_ns per file.
    mtime_ns catches same-size rewrites (common for fixed-width or
    re-generated parquet), which a name+size fingerprint silently missed
    (ADVICE round 1)."""
    parts = []
    for f in sorted(files):
        st = os.stat(f)
        parts.append(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


@dataclass
class Manifest:
    path: str
    shards: dict[str, dict] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "Manifest":
        m = cls(path)
        if os.path.exists(path):
            with open(path) as f:
                m.shards = json.load(f)
        return m

    def done(self, shard: str, fingerprint: str) -> bool:
        got = self.shards.get(shard)
        return bool(got) and got.get("fingerprint") == fingerprint

    def record(self, shard: str, fingerprint: str, lineage: dict) -> None:
        self.shards[shard] = {"fingerprint": fingerprint,
                              "completed_at": time.time(), **lineage}
        tmp = self.path + ".tmp"
        if os.path.dirname(self.path):
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(self.shards, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)


def atomic_write_parquet(ds, out_dir: str, **write_kwargs) -> int:
    """Write a Dataset to ``out_dir`` atomically (temp dir + rename).

    Row count is read back from the written parquet FOOTERS — calling
    ``ds.count()`` would re-execute the whole (lazy) pipeline a second time,
    which doubled stage cost when this first shipped."""
    tmp = out_dir.rstrip("/") + ".__tmp__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp, **write_kwargs)
    import pyarrow.parquet as pq

    n = 0
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            n += pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return n
