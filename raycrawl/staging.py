"""Atomic staged-directory builds.

Every on-disk cache in the engine (fixture corpora, LSH/IVF/postings/
backlink indexes, materialized serial oracles) follows the same
convention: a keyed directory whose completeness is signalled by a
``_DONE`` marker.  The original build-in-place pattern was crash-safe
(a dir without ``_DONE`` is wiped and redone) but NOT concurrency-safe:
two processes hitting the same keyed dir (driver + replica correctness
gate, parallel bench runs) could interleave rmtree/write before
``_DONE`` and then read partial parquet.

`atomic_build_dir` closes that: the build happens in a process-unique
sibling temp dir, then a single `os.rename` installs it — readers only
ever see a missing dir or a complete one.  If the rename loses a race
to a concurrent builder, the winner's (complete) dir is used and the
loser's staging dir is discarded; a stale incomplete target left by a
pre-atomic crash is cleared and the rename retried once.
"""
from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable

DONE_MARKER = "_DONE"


def is_complete(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, DONE_MARKER))


def atomic_build_dir(out_dir: str, build: Callable[[str], None],
                     done_payload: str = "ok") -> str:
    """Build ``out_dir`` atomically: run ``build(tmp_dir)``, write the
    ``_DONE`` marker, then rename ``tmp_dir`` into place.  Returns
    ``out_dir``.  A no-op if a complete build already exists."""
    done = os.path.join(out_dir, DONE_MARKER)
    if os.path.exists(done):
        return out_dir
    parent = os.path.dirname(out_dir.rstrip("/")) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(
        prefix=os.path.basename(out_dir.rstrip("/")) + ".tmp-", dir=parent)
    try:
        build(tmp)
        with open(os.path.join(tmp, DONE_MARKER), "w") as f:
            f.write(done_payload)
        for _ in range(2):
            try:
                os.rename(tmp, out_dir)
                return out_dir
            except OSError:
                if os.path.exists(done):
                    return out_dir  # concurrent builder won with a complete dir
                # stale incomplete target (pre-atomic leftover): clear, retry
                shutil.rmtree(out_dir, ignore_errors=True)
        raise OSError(f"could not install staged dir at {out_dir}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
