"""Write-once staged publication for content-addressed local layouts.

Every stored layout in the repo (z-order, PQ index, BM25 postings,
bucketed tables, the streaming stage, the incremental-PQ merge) follows
the same discipline: build under ``{path}.build.{pid}``, then publish
with ONE atomic ``os.rename`` — concurrent builders produce identical
bytes by construction, so the loser just drops its copy. This module
centralizes the two failure-path obligations those sites used to handle
inconsistently (ADVICE r9 + VERDICT r9 #8):

1. **No orphans**: if the build itself dies (executor OOM mid-write,
   ctrl-C), the ``*.build.{pid}`` dir is reaped in ``finally`` instead
   of living in /tmp forever.
2. **No phantom publishes**: if the rename fails for a reason OTHER
   than "a concurrent winner already published" (cross-device tmp,
   permissions), the error is re-raised instead of swallowed, so
   callers never cache a path that does not exist.

At cluster scale the same shape maps onto a distributed FS rename (or a
manifest pointer swap, ``sinks/manifest.py``); the obligations are
identical.
"""

from __future__ import annotations

import os
import shutil
from contextlib import contextmanager
from typing import Iterator


@contextmanager
def staged_build(final_path: str, marker: str | None = "_SUCCESS") -> Iterator[str]:
    """Yield a private build dir; publish it to ``final_path`` on
    normal exit via atomic rename.

    ``marker`` is the file that proves a complete publish (parquet
    writes drop ``_SUCCESS``; pass ``None`` to accept any existing
    directory, for layouts with a different completeness convention).
    After a failed rename the marker is checked: present means a
    concurrent builder won (fine — identical bytes); absent means the
    rename itself failed, and the OSError propagates rather than
    leaving callers to cache a phantom path.

    The build dir is removed on EVERY exit path — success (it was
    renamed away; rmtree is a no-op), concurrent loss, or a build
    exception.
    """
    tmp = f"{final_path}.build.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        yield tmp
        os.makedirs(os.path.dirname(final_path), exist_ok=True)
        try:
            os.rename(tmp, final_path)
        except OSError:
            published = (
                os.path.exists(os.path.join(final_path, marker))
                if marker is not None
                else os.path.isdir(final_path)
            )
            if not published:
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
