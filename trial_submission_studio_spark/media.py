"""Composed media-corpus governance pipeline — the image/audio
analog of :func:`corpus.prepare_corpus` (the LAION-style recipe):
probe → decodability quarantine → exact perceptual dedup → near-dup
group resolution, with a per-stage retention ledger.

Stage order follows the same cheapest-first rule as the text
pipeline: the header probe touches bytes (no decode), the
fingerprint pass decodes once and reduces every payload to 8 bytes,
and everything after — exact dup, Hamming banding, connected
components — works on fingerprints only, so the expensive decode
runs exactly once per record regardless of how many dedup stages
follow.

Scale shape: probe and fingerprint are narrow mapInPandas passes
(auto-widened for narrow inputs); exact dedup shuffles 8-byte
fingerprints; near-dup candidates come from the pigeonhole banded
equi-join (never all-pairs) and survivorship from the standard CC
loop. Payload BYTES are only shuffled by the explicit
`widen_if_narrow` guard on narrow inputs — at real scale the bytes
never move.

The reference engine has no media surface; this composes the
§2.13 extension family (SURVEY.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MediaConfig:
    """Stage toggles + thresholds for :func:`prepare_media`."""

    kinds: tuple[str, ...] = ("image",)
    #: Hamming radius for near-duplicate fingerprints (0 disables the
    #: near stage; exact stage always runs)
    max_hamming: int = 2
    #: "null" → undecodable payloads quarantine; "keep" admits them
    #: after an exact-byte (md5 payload) dedup — perceptual stages
    #: still skip them
    on_undecodable: str = "null"
    #: filled by prepare_media when collect_stats=True
    stats: dict = field(default_factory=dict)


def media_fingerprints(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """(id, fp) — the perceptual 64-bit fingerprint per record,
    dispatched by kind: image → :func:`multimodal.image_dhash`,
    audio → :func:`multimodal.audio_fingerprint`. Undecodable
    payloads yield NULL fp (the caller's quarantine signal). Kinds
    without a fingerprint implementation (video containers are
    deduped at the FRAME level — see the sampled-frame recipe in
    COVERAGE.md) also yield NULL."""
    from trial_submission_studio_spark.operators.multimodal import (
        audio_fingerprint,
        image_dhash,
    )

    img = media.filter(F.col(kind_col) == "image")
    aud = media.filter(F.col(kind_col) == "audio")
    rest = media.filter(~F.col(kind_col).isin("image", "audio")).select(
        F.col(id_col), F.lit(None).cast("long").alias("fp")
    )
    parts = []
    # empty frames still carry the right schema — union stays cheap
    parts.append(
        image_dhash(img, payload_col, id_col, on_error="null").withColumnRenamed(
            "dhash", "fp"
        )
    )
    parts.append(
        audio_fingerprint(aud, payload_col, id_col, on_error="null").withColumnRenamed(
            "afp", "fp"
        )
    )
    parts.append(rest)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def prepare_media(
    media: DataFrame,
    cfg: MediaConfig | None = None,
    id_col: str = "media_id",
    payload_col: str = "payload",
    collect_stats: bool = False,
) -> DataFrame:
    """Run the media governance chain; returns the surviving records
    (original columns + ``kind`` + ``fp``).

    Stages (cheapest first; each drops rows the next never pays for):

    1. **probe** — header-only kind classification; keep
       ``cfg.kinds``;
    2. **decode gate** — perceptual fingerprint with per-record
       quarantine (NULL fp = undecodable payload; dropped under
       ``on_undecodable="null"``, kept under ``"keep"``);
    3. **exact perceptual dup** — identical fingerprint (same pixels
       under any codec) → min-id survivor;
    4. **near dup** — Hamming ≤ ``max_hamming`` pairs via the
       pigeonhole banded join, connected-components group
       resolution, min-id survivor per component.

    ``collect_stats=True`` fills ``cfg.stats`` with the retention
    ledger (row counts per stage — the numbers a governance review
    asks for first). Stats collection runs one count per stage;
    leave it off in production flows.
    """
    from trial_submission_studio_spark.operators.dedup import (
        duplicate_groups,
        simhash_hamming_pairs,
    )
    from trial_submission_studio_spark.operators.multimodal import probe_media

    cfg = cfg or MediaConfig()
    if cfg.on_undecodable not in ("null", "keep"):
        raise ValueError("on_undecodable must be 'null' or 'keep'")

    def note(name: str, df: DataFrame) -> None:
        if collect_stats:
            cfg.stats[name] = df.count()

    note("input", media)
    probed = probe_media(media, payload_col)
    typed = probed.filter(F.col("kind").isin(*cfg.kinds))
    note("kind_kept", typed)

    fps = media_fingerprints(typed, id_col, payload_col)
    typed = typed.join(fps, id_col, "left")
    decodable = typed.filter(F.col("fp").isNotNull())
    if cfg.on_undecodable == "null":
        typed = decodable
        note("decodable", typed)

    # exact: same 64-bit fingerprint → min-id survivor (covers exact
    # pixel dups across codecs)
    survivors = decodable.join(
        decodable.groupBy("fp").agg(F.min(id_col).alias(id_col)),
        [id_col, "fp"],
        "left_semi",
    )
    if cfg.on_undecodable == "keep":
        # kept undecodables can't be perceptually deduped, but exact
        # BYTE duplicates among them still collapse: md5(payload)
        # min-id survivor (16-byte keys shuffle, payloads don't move)
        undec = typed.filter(F.col("fp").isNull())
        bkey = F.md5(F.col(payload_col).cast("binary"))
        undec = undec.withColumn("_bkey", bkey)
        undec = (
            undec.join(
                undec.groupBy("_bkey").agg(F.min(id_col).alias(id_col)),
                [id_col, "_bkey"],
                "left_semi",
            )
            .drop("_bkey")
        )
        survivors = survivors.unionByName(undec)
    note("exact_deduped", survivors)

    if cfg.max_hamming > 0:
        with_fp = survivors.filter(F.col("fp").isNotNull())
        pairs = simhash_hamming_pairs(
            with_fp.select(id_col, "fp"), id_col, "fp", cfg.max_hamming
        )
        reps = duplicate_groups(pairs)
        dropped = reps.filter(F.col("id") != F.col("rep")).select(
            F.col("id").alias(id_col)
        )
        survivors = survivors.join(dropped, id_col, "left_anti")
        note("near_deduped", survivors)
    return survivors
