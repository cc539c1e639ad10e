"""Session-cache keying helpers.

The session-scoped artifact caches (``verified_pairs_cached`` in
:mod:`llm.dedup`, the exact ANN ground-truth cache in
:mod:`llm.similarity`, the pipeline corpus registry in
:mod:`llm.pipeline`) key on the logical plan's ``semanticHash`` and
re-verify hits with ``sameSemantics``.  Those compare PLANS, not data:
re-running the same read over a path whose parquet files were rewritten
or appended within one application would return the stale artifact
(round-9 advice, low).  ``data_fingerprint`` closes that hole by
folding the plan's input files' (path, mtime, size) into the key — a
rewritten/appended source changes the fingerprint, so the cache misses
and recomputes.

Best-effort by design: ``DataFrame.inputFiles()`` is documented as a
best-effort snapshot (and is empty for non-file sources); a source we
cannot fingerprint falls back to plan-only keying, which remains
correct for the immutable-input sessions the caches target.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame


def data_fingerprint(df: DataFrame) -> tuple | None:
    """Hashable fingerprint of the DataFrame's file inputs:
    ``((path, mtime_ns, size), ...)`` sorted, or ``None`` when the
    inputs aren't local files we can stat (then callers key on plan
    semantics alone, as before)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    out = []
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            return None  # remote store: no cheap stat — plan-only key
        local = unquote(p.path) if p.scheme == "file" else uri
        try:
            st = os.stat(local)
        except OSError:
            return None
        out.append((local, st.st_mtime_ns, st.st_size))
    return tuple(sorted(out))
