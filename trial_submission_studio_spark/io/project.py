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
from dataclasses import dataclass

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


@dataclass
class AutosaveConfig:
    """Debounce policy (reference tss-persistence autosave/config.rs):
    save once ``debounce_s`` has passed since the LAST change, but
    never later than ``max_delay_s`` after the FIRST unsaved change
    (continuous edits can't starve the save forever)."""

    enabled: bool = True
    debounce_s: float = 2.0
    max_delay_s: float = 30.0

    def should_save(self, since_last: float, since_first: float) -> bool:
        if not self.enabled:
            return False
        return since_last >= self.debounce_s or since_first >= self.max_delay_s


class Autosaver:
    """Driver-side debounced autosave with dirty tracking (reference
    tss-persistence autosave/{config,tracker}.rs).

    Call :meth:`mark_dirty` after every project mutation and
    :meth:`tick` periodically from the host loop; ``tick`` saves via
    :func:`save_project` when the policy fires. Saves are also
    hash-gated: if the serialized state is byte-identical to the last
    written payload, the tracker resets without touching disk. The
    ``clock`` is injectable (monotonic seconds) so policies are
    testable without sleeping.
    """

    def __init__(
        self,
        path: str,
        state_fn,
        config: AutosaveConfig | None = None,
        clock=None,
    ) -> None:
        import time

        self.path = path
        self.state_fn = state_fn
        self.config = config or AutosaveConfig()
        self.clock = clock or time.monotonic
        self.dirty = False
        self.last_change: float | None = None
        self.first_unsaved: float | None = None
        self.save_count = 0
        self._last_digest: str | None = None

    def mark_dirty(self) -> None:
        now = self.clock()
        self.dirty = True
        self.last_change = now
        if self.first_unsaved is None:
            self.first_unsaved = now

    def _digest(self, state: dict) -> str:
        return hashlib.sha256(
            json.dumps(state, sort_keys=True, default=str).encode()
        ).hexdigest()

    def tick(self) -> bool:
        """Save if due. Returns True when a file write happened."""
        if not self.dirty or self.last_change is None:
            return False
        now = self.clock()
        if not self.config.should_save(
            now - self.last_change, now - (self.first_unsaved or now)
        ):
            return False
        return self.save_now()

    def save_now(self) -> bool:
        """Unconditional save request; skips the write when the state
        hash is unchanged since the last save. Failures keep the
        tracker dirty (reference tracker.rs save_failed)."""
        state = self.state_fn()
        digest = self._digest(state)
        if digest == self._last_digest:
            self.dirty = False
            self.first_unsaved = None
            return False
        save_project(self.path, state)  # raises on failure → stays dirty
        self._last_digest = digest
        self.dirty = False
        self.first_unsaved = None
        self.save_count += 1
        return True
