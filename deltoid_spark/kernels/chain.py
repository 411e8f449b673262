"""CHAIN codec: deltoid-style inter-version content deltas.

Re-expresses the reference's snapshot chain
(``DeltaSnapshots``/``push_snapshot``/``to_full_snapshots``,
/root/reference/deltoid/src/snapshot/delta.rs:108-151) and its Vec edit
alphabet (``EltDelta::{Edit{index,item}, Add(delta), Remove{count}}``,
/root/reference/deltoid/src/vec.rs:103-137) as a columnar kernel:

* a file's commit chain = ordered versions of ``content`` within one
  ``(repo, path)`` group (rows must arrive group-contiguous, ordered);
* version 0 and every K-th version is a **keyframe** (full text) —
  mirrors "the first delta is a full snapshot" (delta.rs:137-151) while
  bounding decode cost;
* other versions store a positional line edit script vs the previous
  version: edit (index, new line), appended lines, tail-remove count —
  exactly the reference's stack-like positional diff (vec.rs:8-11,
  50-67: NOT an LCS), with consecutive removes coalesced into one count
  (vec.rs:61-64);
* a delta that would be larger than the full text degrades to a
  keyframe (short-circuit, analog of gen/structs.rs:457 equality check);
* nulls are explicit states: any null->x or x->null transition forces a
  keyframe, so value->null round-trips exactly — fixing the
  ``OptionDelta`` ambiguity the reference documents
  (/root/reference/deltoid-quickcheck-tests/src/main.rs:14-22).

Round-trip law (reference: deltoid-quickcheck-tests/src/main.rs:26-32):
``decode_chain(encode_chain(contents, groups)) == contents`` bytewise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import blocks
from .intcodec import pack_ints, pack_ints_z, unpack_ints, unpack_ints_z
from .strings import decode_plain, encode_plain_arrow

DEFAULT_KEYFRAME_INTERVAL = 32


def _line_delta(prev: list[str], new: list[str]) -> tuple[np.ndarray, list[str], list[str], int]:
    """Positional edit script prev -> new (deltoid Vec semantics).

    Thin wrapper over _version_deltas kept for tests/direct callers."""
    e_idx, elines, adds, remove, _p, _d, _i = _version_deltas(
        np.array(prev, dtype=object), np.array(new, dtype=object)
    )
    return e_idx, list(elines), list(adds), remove


def _splice_delta(prev: list[str], new: list[str]) -> tuple[int, int, list[str]]:
    """Single-splice script: common prefix/suffix trim, middle replaced.

    Engine upgrade over the reference's purely positional diff
    (vec.rs:8-11 admits it's stack-like): a middle insert shifts every
    later line, which positional diff encodes as edits-to-end-of-file;
    the splice encodes just (start, n_deleted, inserted_lines).
    Returns (start, del_count, ins_lines).
    """
    _e, _el, _a, _r, p, sdel, sins = _version_deltas(
        np.array(prev, dtype=object), np.array(new, dtype=object)
    )
    return p, sdel, list(sins)


def _version_deltas(a: np.ndarray, b: np.ndarray):
    """BOTH delta scripts (positional + splice) from one elementwise
    comparison of two line arrays — the hot path converts each version
    to an object array exactly once and shares the prefix comparison.

    Returns (edit_idx, edit_lines, adds, remove, splice_start,
    splice_del, splice_ins) with the array results as object ndarrays.
    """
    na, nb = len(a), len(b)
    m = min(na, nb)
    if m:
        neq = a[:m] != b[:m]
        edit_idx = np.nonzero(neq)[0]
        p = int(edit_idx[0]) if len(edit_idx) else m
    else:
        edit_idx = np.zeros(0, dtype=np.int64)
        p = 0
    elines = b[:m][edit_idx] if m else b[:0]
    adds = b[m:] if nb > m else b[:0]
    remove = na - nb if na > nb else 0
    max_s = m - p
    if max_s > 0:
        ne_tail = (a[na - max_s :] != b[nb - max_s :])[::-1]
        last_ne = np.nonzero(ne_tail)[0]
        s = int(last_ne[0]) if len(last_ne) else max_s
    else:
        s = 0
    return (
        edit_idx, elines, adds, remove,
        p, na - p - s, b[p : nb - s],
    )


def _script_cost(n_lines_chars: int, n_ints: int) -> int:
    return n_lines_chars + 8 * n_ints


def encode_chain(
    contents: pd.Series,
    group_sizes: np.ndarray,
    keyframe_interval: int = DEFAULT_KEYFRAME_INTERVAL,
    level: int | None = None,
    base_texts: list | None = None,
    base_versions: np.ndarray | None = None,
) -> bytes:
    """Encode a content column whose rows are group-contiguous chains.

    base_texts / base_versions implement the reference's incremental
    ``push_snapshot`` (delta.rs:108-125): when a group continues an
    already-encoded chain, its first version deltas against the supplied
    base text instead of opening with a keyframe, and the keyframe
    cadence counts from base_versions[g] so appended fragments keep the
    same bounded decode depth.  The decoder must be handed the same
    base texts (the previous fragment's tails) — meta records which
    groups are seeded.

    Accepts either a pandas Series or a pyarrow string array; the whole
    kernel is Arrow-native (round 3): lines are dictionary-encoded ONCE
    and every per-version comparison runs on int codes (exact: Arrow's
    hashing is byte-aware), keyframe texts and delta lines leave via
    Arrow takes into encode_plain_arrow — the content column never
    materializes as Python strings.
    """
    if isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    if isinstance(contents, pa.Array):
        arr = contents if contents.type == pa.large_utf8() else contents.cast(pa.large_utf8())
    else:
        arr = pa.Array.from_pandas(contents, type=pa.large_utf8())
    n = len(arr)
    assert int(np.sum(group_sizes)) == n, "group sizes must cover all rows"
    is_null = (
        pc.is_null(arr).to_numpy(zero_copy_only=False) if n else np.zeros(0, dtype=bool)
    )
    # ONE Arrow pass splits every version into lines, ONE dictionary
    # encode maps every line to an int code; version i's lines are then
    # the int slice codes[loffs[i]:loffs[i+1]] and all elementwise
    # line comparisons are C integer compares
    if n:
        la = pc.split_pattern(arr, pattern="\n")
        ld = pc.dictionary_encode(la.values)
        codes = ld.indices.to_numpy().astype(np.int64)
        line_dict = ld.dictionary
        loffs = la.offsets.to_numpy().astype(np.int64)
        # per-line char counts via the (small) dictionary + prefix sums:
        # every script-cost term in the loop is O(1) lookups
        dlens = pc.utf8_length(line_dict).to_numpy(zero_copy_only=False).astype(np.int64)
        line_lens = dlens[codes] if len(codes) else np.zeros(0, dtype=np.int64)
        clen = np.concatenate(([0], np.cumsum(line_lens)))
    else:
        codes = np.zeros(0, dtype=np.int64)
        line_dict = pa.array([], type=pa.large_utf8())
        loffs = np.zeros(1, dtype=np.int64)
        line_lens = np.zeros(0, dtype=np.int64)
        clen = np.zeros(1, dtype=np.int64)
    n_groups = len(group_sizes)
    if base_texts is None:
        base_texts = [None] * n_groups
    if base_versions is None:
        base_versions = np.zeros(n_groups, dtype=np.int64)
    seeded = np.array([t is not None for t in base_texts], dtype=bool)

    unseen: dict[str, int] = {}

    def _seed_codes(text: str) -> np.ndarray:
        """Map a seed text's lines into code space: dictionary hits get
        their code, lines outside the dictionary get stable negative
        ids (equal seed lines share one id; never equal to any code)."""
        lines = text.split("\n")
        hits = pc.index_in(
            pa.array(lines, type=pa.large_utf8()), value_set=line_dict
        ).fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        if (hits < 0).any():
            hits = hits.copy()
            for j, ln in enumerate(lines):
                if hits[j] < 0:
                    code = unseen.get(ln)
                    if code is None:
                        code = -(len(unseen) + 1)
                        unseen[ln] = code
                    hits[j] = code
        return hits

    is_key = np.zeros(n, dtype=bool)
    key_idx: list[int] = []
    # per delta row: cnt1/cnt2/cnt3 are (edit_count, add_count,
    # remove_count) for positional scripts, (ins_count, start, del_count)
    # for splice scripts; splice_flags picks the interpretation
    edit_counts: list[int] = []
    add_counts: list[int] = []
    remove_counts: list[int] = []
    edit_indices: list[np.ndarray] = []
    delta_lines: list[np.ndarray] = []  # per-script line arrays, concat once
    splice_flags: list[bool] = []

    row = 0
    for g, gsize in enumerate(group_sizes):
        if seeded[g]:
            prev_arr: np.ndarray | None = _seed_codes(base_texts[g])
            prev_null = False
        else:
            prev_arr = None
            prev_null = True
        v0 = int(base_versions[g])
        for v in range(int(gsize)):
            i = row + v
            cur_null = bool(is_null[i])
            force_key = (
                (v0 + v) % keyframe_interval == 0 or cur_null or prev_null
            )
            if not force_key:
                # zero-copy int-code slice; one prefix comparison shared
                # by both candidate scripts
                lo, hi = loffs[i], loffs[i + 1]
                new_arr = codes[lo:hi]
                eidx, elines, adds, rem, sp, sdel, sins = _version_deltas(
                    prev_arr, new_arr
                )
                # char totals via the prefix sums (no per-line len calls):
                # edits index into new, adds/sins are contiguous new slices
                m = hi - lo if len(prev_arr) > hi - lo else len(prev_arr)
                echars = int(line_lens[lo + eidx].sum()) if len(eidx) else 0
                achars = int(clen[hi] - clen[lo + m])
                pos_cost = _script_cost(echars + achars, len(eidx) + 3)
                spl_cost = _script_cost(int(clen[lo + sp + len(sins)] - clen[lo + sp]), 3)
                # degrade to keyframe if neither script pays
                text_chars = int(clen[hi] - clen[lo]) + (hi - lo - 1)
                if min(pos_cost, spl_cost) >= text_chars:
                    force_key = True
                elif spl_cost < pos_cost:
                    splice_flags.append(True)
                    edit_counts.append(len(sins))
                    add_counts.append(sp)
                    remove_counts.append(sdel)
                    edit_indices.append(np.zeros(0, dtype=np.int64))
                    delta_lines.append(sins)
                    prev_arr = new_arr
                else:
                    splice_flags.append(False)
                    edit_counts.append(len(eidx))
                    add_counts.append(len(adds))
                    remove_counts.append(rem)
                    edit_indices.append(eidx)
                    delta_lines.append(elines)
                    delta_lines.append(adds)
                    prev_arr = new_arr
            if force_key:
                is_key[i] = True
                if not cur_null:
                    key_idx.append(i)
                    prev_arr = codes[loffs[i] : loffs[i + 1]]
                else:
                    prev_arr = None
            prev_null = cur_null
        row += int(gsize)

    gmeta, gpay = pack_ints(np.asarray(group_sizes, dtype=np.int64))
    seed_bits = blocks.pack_mask(seeded)
    key_bits = blocks.pack_mask(is_key)
    null_bits = blocks.pack_mask(is_null)
    splice_bits = blocks.pack_mask(np.array(splice_flags, dtype=bool))
    # keyframe texts and delta lines leave as Arrow takes (C gathers),
    # never as Python strings
    keys_block = encode_plain_arrow(
        arr.take(pa.array(np.array(key_idx, dtype=np.int64))), level
    )
    emeta, epay = pack_ints(np.array(edit_counts, dtype=np.int64))
    ameta, apay = pack_ints(np.array(add_counts, dtype=np.int64))
    rmeta, rpay = pack_ints(np.array(remove_counts, dtype=np.int64))
    flat_idx = (
        np.concatenate(edit_indices) if edit_indices else np.zeros(0, np.int64)
    )
    imeta, ipay = pack_ints_z(flat_idx)
    flat_line_codes = (
        np.concatenate(delta_lines) if delta_lines else np.zeros(0, dtype=np.int64)
    )
    lines_block = encode_plain_arrow(
        line_dict.take(pa.array(flat_line_codes.astype(np.int64))), level
    )

    meta = {
        "n": n, "k": keyframe_interval,
        "groups": gmeta, "gplen": len(gpay),
        "kb_len": len(key_bits), "nb_len": len(null_bits),
        "seeded": bool(seeded.any()), "sd_len": len(seed_bits),
        "sb_len": len(splice_bits), "n_deltas": len(splice_flags),
        "keys_len": len(keys_block),
        "ec": emeta, "eclen": len(epay),
        "ac": ameta, "aclen": len(apay),
        "rc": rmeta, "rclen": len(rpay),
        "ei": imeta, "eilen": len(ipay),
    }
    payload = b"".join(
        (gpay, seed_bits, key_bits, null_bits, splice_bits, keys_block,
         epay, apay, rpay, ipay, lines_block)
    )
    return blocks.frame("chain", meta, payload)


def decode_chain(meta: dict, payload: bytes, base_texts: list | None = None) -> pd.Series:
    n = meta["n"]
    p = 0
    gplen = meta["gplen"]
    group_sizes = unpack_ints(meta["groups"], payload[p : p + gplen]); p += gplen
    seeded = blocks.unpack_mask(payload[p : p + meta["sd_len"]], len(group_sizes)); p += meta["sd_len"]
    if meta.get("seeded") and base_texts is None:
        raise ValueError("chain block has seeded groups; decode needs base_texts")
    is_key = blocks.unpack_mask(payload[p : p + meta["kb_len"]], n); p += meta["kb_len"]
    is_null = blocks.unpack_mask(payload[p : p + meta["nb_len"]], n); p += meta["nb_len"]
    splice = blocks.unpack_mask(payload[p : p + meta["sb_len"]], meta["n_deltas"]); p += meta["sb_len"]
    _, kmeta, kpay = blocks.unframe(payload[p : p + meta["keys_len"]]); p += meta["keys_len"]
    key_texts = decode_plain(kmeta, kpay).tolist()
    edit_counts = unpack_ints(meta["ec"], payload[p : p + meta["eclen"]]); p += meta["eclen"]
    add_counts = unpack_ints(meta["ac"], payload[p : p + meta["aclen"]]); p += meta["aclen"]
    remove_counts = unpack_ints(meta["rc"], payload[p : p + meta["rclen"]]); p += meta["rclen"]
    edit_idx_flat = unpack_ints_z(meta["ei"], payload[p : p + meta["eilen"]]); p += meta["eilen"]
    _, lmeta, lpay = blocks.unframe(payload[p:])
    delta_lines = decode_plain(lmeta, lpay).tolist()

    out = np.empty(n, dtype=object)
    ki = 0          # keyframe text cursor
    di = 0          # delta row cursor
    ei = 0          # flat edit-index cursor
    li = 0          # delta line cursor
    row = 0
    for g, gsize in enumerate(group_sizes):
        if seeded[g]:
            base = base_texts[g]
            if base is None:
                raise ValueError(f"seeded group {g} has no base text")
            prev_lines: list[str] | None = base.split("\n")
        else:
            prev_lines = None
        for v in range(int(gsize)):
            i = row + v
            if is_key[i]:
                if is_null[i]:
                    out[i] = None
                    prev_lines = None
                else:
                    text = key_texts[ki]; ki += 1
                    out[i] = text
                    prev_lines = text.split("\n")
            else:
                c1 = int(edit_counts[di]); c2 = int(add_counts[di]); c3 = int(remove_counts[di])
                is_splice = bool(splice[di])
                di += 1
                if is_splice:  # (ins_count, start, del_count)
                    ins = delta_lines[li : li + c1]; li += c1
                    lines = prev_lines[:c2] + ins + prev_lines[c2 + c3 :]
                else:  # (edit_count, add_count, remove_count)
                    idx = edit_idx_flat[ei : ei + c1]; ei += c1
                    elines = delta_lines[li : li + c1]; li += c1
                    alines = delta_lines[li : li + c2]; li += c2
                    lines = list(prev_lines)
                    for j, line in zip(idx, elines):
                        lines[int(j)] = line
                    if c3:
                        del lines[len(lines) - c3 :]
                    lines.extend(alines)
                out[i] = "\n".join(lines)
                prev_lines = lines
        row += int(gsize)
    return pd.Series(out, dtype=object)
