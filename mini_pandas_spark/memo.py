"""Session-memo plumbing shared by every stage-table builder
(CLAUDE.md invariant 9): fixture fingerprints for cache keys and the
bounded-LRU eviction loop that also deletes on-disk directories.

One implementation instead of per-module copies — the round-10 review
found the fingerprint helper pasted three times and the eviction loop
four times; new memos must use these (the pre-round-10 copies in
windows.py/relational.py predate this module and are stable)."""

from __future__ import annotations

import os
import shutil
from collections import OrderedDict


def table_fingerprint(sf_dir: str, name: str):
    """(mtime_ns, size) change-detector for a fixture table file or
    directory-of-parts — never reads data.  Invalidates memos when
    tooling rewrites a fixture in-process."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        if os.path.isdir(path):
            parts = [
                os.stat(os.path.join(path, f))
                for f in sorted(os.listdir(path))
                if f.endswith(".parquet")
            ]
            return tuple((p.st_mtime_ns, p.st_size) for p in parts)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def evict_lru_dirs(memo: OrderedDict, max_entries: int) -> None:
    """Pop least-recently-used memo entries past ``max_entries``,
    rmtree-ing every directory in each entry's value tuple (memo values
    are always TUPLES of dirs — invariant 10's teardown recipe)."""
    while len(memo) > max_entries:
        _, dirs = memo.popitem(last=False)
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
