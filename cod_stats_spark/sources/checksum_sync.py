"""Checksum-gated publish sink (SURVEY §2.1 S11).

The reference's deploy step re-uploads only report documents whose
content changed (checksum compare against the published copy). Same
contract here as a local-filesystem sink the report emit layer calls
after writing a document set; an object-store deployment swaps the
copy/read primitives.

Driver-side by design, like the reference's S9/S11 publish stage: the
inputs are the emitted report documents (small, bounded — the gold
layer), never table-scale data.
"""

from __future__ import annotations

import hashlib
import os
import shutil


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def sync_with_checksums(src_dir: str, dest_dir: str) -> dict[str, str]:
    """Copy every file under ``src_dir`` to ``dest_dir`` UNLESS the
    destination already holds byte-identical content (sha256 compare).
    Returns {relative_path: "copied" | "unchanged"} plus a written
    ``.manifest.json``-style sidecar of checksums for the next sync.
    """
    import json

    statuses: dict[str, str] = {}
    checksums: dict[str, str] = {}
    for root, _dirs, files in os.walk(src_dir):
        for name in files:
            src = os.path.join(root, name)
            rel = os.path.relpath(src, src_dir)
            dest = os.path.join(dest_dir, rel)
            digest = _sha256_file(src)
            checksums[rel] = digest
            if os.path.exists(dest) and _sha256_file(dest) == digest:
                statuses[rel] = "unchanged"
                continue
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.copyfile(src, dest)
            statuses[rel] = "copied"
    with open(os.path.join(dest_dir, ".checksums.json"), "w") as f:
        json.dump(checksums, f, sort_keys=True, indent=0)
    return statuses
