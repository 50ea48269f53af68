"""Project persistence — K4 (SURVEY.md §2.1).

Reference behavior (tss-persistence/src/io/save.rs:15-70,
io/hash.rs:14-41): atomic tmp+rename save of the project state with
SHA-256 source-file change detection. The reference uses a binary
rkyv format; driver-side state is schema-sized, so JSON is the
natural Spark-era choice (the data plane lives in parquet/Delta, not
the project file).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

SCHEMA_VERSION = 1


def file_sha256(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while True:
            b = fh.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def save_project(path: str, state: dict) -> None:
    """Atomic write: tmp file in the target dir + rename."""
    payload = {"schema_version": SCHEMA_VERSION, "state": state}
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_project(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as fh:
        payload = json.load(fh)
    if payload.get("schema_version") != SCHEMA_VERSION:
        raise ValueError(
            f"unsupported project schema_version {payload.get('schema_version')}"
        )
    return payload["state"]


def sources_changed(state: dict, key: str = "source_hashes") -> dict[str, bool]:
    """Compare stored SHA-256 hashes against the files on disk."""
    out = {}
    for path, stored in (state.get(key) or {}).items():
        try:
            out[path] = file_sha256(path) != stored
        except FileNotFoundError:
            out[path] = True
    return out
