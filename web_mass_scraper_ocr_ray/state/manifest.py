"""Per-partition lineage manifests — the resume/checkpoint story (§4.5).

Replaces the reference's Postgres state machine
(pending→completed/failed rows in ``scraping_logs`` — db_utils.py:125-170
mark-pending, db_utils.py:251-295 commit, db_utils.py:76-123
skip-if-completed, main.py:598-606 pending drain):

  - every page row gets ``part_id = hash64(url) % P`` — a stable,
    input-independent shard key (url is the unit of work, §4.3);
  - output Parquet is laid out ``out/part_id=<k>/...`` (one directory
    per partition — resumable, never one giant file);
  - after the data for the run lands, one ``_manifest/part-<k>.json``
    commit record per partition is written (tmp+rename, atomic on POSIX)
    carrying row/status counts and the associative session counters
    (main.py:30-44) for that partition;
  - on restart: committed part_ids are read back, uncommitted partition
    directories are deleted (a partial write without its commit record
    is garbage — idempotent replay), and the input is anti-join-filtered
    to uncommitted parts only (J2: ``check_url_scraped`` analog, as a
    broadcast-set filter — no shuffle).

Scale note: P is fixed per job; the committed-set is O(P) integers —
trivially broadcastable at any corpus size. Manifest writes are one
small JSON per partition, not a central lock (§4.2: no driver-side
bottleneck).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Dict, Iterable, List, Optional, Set

import pyarrow as pa

PART_COL = "part_id"


def hash64(s: str) -> int:
    """Stable 64-bit key hash (md5-derived; no PYTHONHASHSEED dependence)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def assign_part_id(batch: pa.Table, num_partitions: int,
                   key: str = "url") -> pa.Table:
    """Vectorized-enough part assignment (one md5 per row, ~1 µs)."""
    keys = batch.column(key).to_pylist()
    parts = [hash64(k) % num_partitions for k in keys]
    return batch.append_column(PART_COL, pa.array(parts, pa.int64()))


def manifest_dir(output_dir: str, dirname: str = "_manifest") -> str:
    return os.path.join(output_dir, dirname)


def manifest_path(output_dir: str, part_id: int,
                  dirname: str = "_manifest") -> str:
    return os.path.join(manifest_dir(output_dir, dirname), f"part-{part_id:05d}.json")


def committed_parts(output_dir: str, dirname: str = "_manifest") -> Set[int]:
    """Scan commit records → set of finished partitions (S4/J2 analog)."""
    mdir = manifest_dir(output_dir, dirname)
    done: Set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            try:
                done.add(int(name[len("part-"):-len(".json")]))
            except ValueError:
                continue
    return done


def commit_partition(output_dir: str, part_id: int, stats: Dict,
                     dirname: str = "_manifest") -> str:
    """Atomic commit record — the `update_scraping_log_status('completed')`
    analog (db_utils.py:251-295). Data files MUST be fully written first."""
    mdir = manifest_dir(output_dir, dirname)
    os.makedirs(mdir, exist_ok=True)
    path = manifest_path(output_dir, part_id, dirname)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"part_id": part_id, **stats}, f, ensure_ascii=False, indent=2)
    os.replace(tmp, path)
    return path


def read_manifests(output_dir: str, dirname: str = "_manifest") -> List[Dict]:
    mdir = manifest_dir(output_dir, dirname)
    out: List[Dict] = []
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name), encoding="utf-8") as f:
                out.append(json.load(f))
    return out


def clean_uncommitted(output_dir: str, committed: Set[int]) -> List[str]:
    """Delete partition dirs that have data but no commit record —
    partial output from a crashed run; replay is idempotent because the
    partition's input set is a pure function of url (keyed output)."""
    removed: List[str] = []
    if not os.path.isdir(output_dir):
        return removed
    for name in os.listdir(output_dir):
        if not name.startswith(f"{PART_COL}="):
            continue
        try:
            pid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if pid not in committed:
            full = os.path.join(output_dir, name)
            shutil.rmtree(full, ignore_errors=True)
            removed.append(full)
    return removed


def filter_uncommitted_batch(batch: pa.Table, committed: Set[int]) -> pa.Table:
    """Broadcast-set anti-join filter (J2) — vectorized isin over part_id."""
    import pyarrow.compute as pc

    if not committed:
        return batch
    mask = pc.is_in(
        batch.column(PART_COL),
        value_set=pa.array(sorted(committed), pa.int64()),
    )
    return batch.filter(pc.invert(mask))
