"""Reference-semantics encoder: the compressed-size yardstick.

A faithful Python reimplementation of what the reference library would
store for a commit chain — serde-JSON-serialized ``DeltaSnapshot``
chains (/root/reference/deltoid/src/snapshot/delta.rs:185-191, chain
encode from default ``""`` per snapshot/full.rs:123-142) whose string
deltas are **full replacements** (``StringDelta(Option<String>)``,
/root/reference/deltoid/src/string.rs:16-32; the golden JSON form is
shown in string.rs:146-160) and whose struct deltas are per-field
``Option`` with ``None`` == unchanged
(/root/reference/deltoid-derive/src/gen/structs.rs:449-477).

``BASELINE.json`` north_rule requires our engine's output ≤ this
encoder's output bytes on the same input.  The reference publishes no
throughput numbers (no benches/ in the tree), so bytes are the only
comparable axis.
"""

from __future__ import annotations

import json

import pandas as pd


def _field_delta(old: str | None, new: str | None) -> dict | None:
    """StringDelta: full replacement when changed, None when equal."""
    if old == new:
        return None
    return {"StringDelta": new}  # mirrors golden JSON in string.rs:146-160


def encode_chain_json(rows: list[dict]) -> bytes:
    """Encode one (repo, path) chain as a DeltaSnapshots JSON document.

    The initial state is the type's default (empty strings), so the
    first delta carries every field — "the first delta is effectively
    a full snapshot" (snapshot/delta.rs:137-151).
    """
    default = {"repo": "", "path": "", "commit": "", "lang": "", "content": ""}
    prev = default
    snapshots = []
    for i, row in enumerate(rows):
        delta = {
            field: _field_delta(prev[field], row[field])
            for field in ("repo", "path", "commit", "lang", "content")
        }
        snapshots.append(
            {"timestamp": i, "origin": "encoder", "msg": row["commit"][:8], "delta": delta}
        )
        prev = row
    doc = {"snapshots": snapshots, "current": prev}
    return json.dumps(doc, separators=(",", ":"), ensure_ascii=False).encode("utf-8")


def reference_encoded_bytes(df: pd.DataFrame) -> int:
    """Total bytes the reference-semantics encoder stores for a table."""
    total = 0
    df = df.sort_values(["repo", "path", "commit"], kind="mergesort")
    for _, g in df.groupby(["repo", "path"], sort=False):
        total += len(encode_chain_json(g.to_dict("records")))
    return total


def decode_chain_json(doc: bytes) -> list[dict]:
    """Round-trip check for the yardstick itself (apply-fold from default)."""
    data = json.loads(doc.decode("utf-8"))
    state = {"repo": "", "path": "", "commit": "", "lang": "", "content": ""}
    out = []
    for snap in data["snapshots"]:
        for field, d in snap["delta"].items():
            if d is not None:
                state = {**state, field: d["StringDelta"]}
        out.append(dict(state))
    return out
