"""S13 — input-file archival after a successful load.

The reference moves every processed ``.xlsx`` into a ``data/``
subdirectory once exportation finishes, deleting any same-named file
already there (`reports_exporter_v0.83.py:1839-1850`). This completes
the at-least-once ingest story: inputs that were loaded are no longer
in the discovery directory, so a re-run doesn't re-process them (the
idempotent partition overwrite covers the crash-between case).

Driver-side filesystem op by design — at scale this is the same
pattern against an object store (copy + delete of processed keys).
"""

from __future__ import annotations

import os
import shutil


def archive_inputs(paths: list[str], dest_dir: str) -> list[str]:
    """Move processed input files into ``dest_dir`` (created on
    demand), overwriting same-named files already archived. Missing
    sources are skipped (another report type may have archived the
    shared file first, as in the reference's per-report loop).

    Returns the destination paths of the files actually moved.
    """
    os.makedirs(dest_dir, exist_ok=True)
    moved = []
    for path in paths:
        if not os.path.exists(path):
            continue
        dest = os.path.join(dest_dir, os.path.basename(path))
        if os.path.exists(dest):
            os.remove(dest)
        shutil.move(path, dest)
        moved.append(dest)
    return moved
