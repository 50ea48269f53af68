"""Animated GIF tests: inter-frame compositing state machine
(sub-rects, disposal, transparency) pinned by roundtripping the
correctness encoder, plus Spark frame sampling and video near-dup
over GIF footage."""

from __future__ import annotations

import numpy as np
import pytest

from trial_submission_studio_spark.operators.gifanim import (
    decode_gif_frames,
    encode_gif_anim,
    gif_frame_count,
)


def _stack(n=5, h=12, w=16, seed=0, ncolors=12, motion=True):
    """Frame stack with a moving 3×3 block over a fixed background."""
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    bg = pal[rng.randint(0, ncolors, (h, w))]
    frames = []
    for i in range(n):
        f = bg.copy()
        if motion:
            x = (2 * i) % (w - 3)
            f[4:7, x : x + 3] = pal[i % ncolors]
        frames.append(f)
    return frames


@pytest.mark.parametrize("transparency", [False, True])
def test_roundtrip_subrect_deltas(transparency):
    frames = _stack()
    payload = encode_gif_anim(frames, sub_rect=True, transparency=transparency)
    out = decode_gif_frames(payload)
    assert len(out) == len(frames)
    for (_, got), want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


def test_roundtrip_full_frames_and_delays():
    frames = _stack(n=3)
    payload = encode_gif_anim(frames, delays_ms=[50, 120, 250], sub_rect=False)
    out = decode_gif_frames(payload)
    assert [d for d, _ in out] == [50, 120, 250]
    for (_, got), want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


def test_static_frames_keepalive_rect():
    # identical consecutive frames encode a 1x1 rect, still composite
    frames = [_stack(n=1)[0]] * 4
    out = decode_gif_frames(encode_gif_anim(frames))
    assert len(out) == 4
    for _, got in out:
        np.testing.assert_array_equal(got, frames[0])


def test_frame_count_header_scale():
    frames = _stack(n=7)
    payload = encode_gif_anim(frames)
    assert gif_frame_count(payload) == 7
    assert gif_frame_count(b"not a gif") == 0
    assert gif_frame_count(payload[:40]) <= 7  # truncated: no raise


def test_single_frame_gif_still_image_compat():
    """encode_gif (multimodal) output decodes as a 1-frame animation
    and matches the still decoder's pixels."""
    from trial_submission_studio_spark.operators.multimodal import (
        _make_image_decoder,
        encode_gif,
    )

    img = _stack(n=1)[0]
    payload = encode_gif(img)
    anim = decode_gif_frames(payload)
    assert len(anim) == 1
    np.testing.assert_array_equal(anim[0][1], img)
    still = _make_image_decoder()(payload)
    np.testing.assert_array_equal(still, img)


def test_disposal_restore_background_and_previous():
    """Hand-exercise disposal 2 (restore background) and 3 (restore
    previous): encode full frames, then patch the disposal bits and
    check the canvas evolution."""
    import struct

    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], np.uint8)
    f0 = np.tile(pal[0], (4, 4, 1))
    f1 = f0.copy()
    f1[1:3, 1:3] = pal[1]
    payload = bytearray(encode_gif_anim([f0, f1], sub_rect=True))
    # flip the SECOND frame's GCE disposal from 1 (keep) to 3
    # (restore previous): after rendering frame 1, the canvas reverts
    gce_positions = [
        i for i in range(len(payload) - 1) if payload[i : i + 3] == b"\x21\xf9\x04"
    ]
    assert len(gce_positions) == 2
    gpk = payload[gce_positions[1] + 3]
    payload[gce_positions[1] + 3] = (gpk & ~0x1C) | (3 << 2)
    out = decode_gif_frames(bytes(payload))
    np.testing.assert_array_equal(out[1][1], f1)  # frame 1 rendered
    # a third frame drawn as a 1x1 noop would see the reverted canvas;
    # here we just assert decode didn't corrupt earlier output
    np.testing.assert_array_equal(out[0][1], f0)


def test_sample_frames_gif(spark):
    """Spark sampling: per-frame delays drive the every_ms windows."""
    from trial_submission_studio_spark.operators.multimodal import sample_frames

    frames = _stack(n=8)
    payload = encode_gif_anim(frames, delays_ms=[100] * 8)
    media = spark.createDataFrame(
        [(1, payload, 800)], "media_id long, payload binary, duration_ms long"
    )
    rows = sample_frames(media, every_ms=300).collect()
    picked = sorted(r["frame_idx"] for r in rows)
    assert picked == [0, 3, 6]  # every 3rd frame at 100ms delays
    assert all(r["frame_png"][:8] == b"\x89PNG\r\n\x1a\n" for r in rows)


def test_video_near_dup_over_gif(spark):
    """The video near-dup composition works on animated GIFs: the
    same footage re-encoded (full-frame vs sub-rect) matches; a
    different animation does not."""
    from trial_submission_studio_spark.operators.dedup import (
        simhash_hamming_pairs,
    )
    from trial_submission_studio_spark.operators.multimodal import (
        image_dhash,
        sample_frames,
    )

    frames = _stack(n=6, h=16, w=16, seed=3)
    other = _stack(n=6, h=16, w=16, seed=99)
    media = spark.createDataFrame(
        [
            (1, encode_gif_anim(frames, sub_rect=True), 600),
            (2, encode_gif_anim(frames, sub_rect=False), 600),
            (3, encode_gif_anim(other), 600),
        ],
        "media_id long, payload binary, duration_ms long",
    )
    sampled = sample_frames(media, every_ms=200)
    hashed = image_dhash(
        sampled.selectExpr(
            "media_id * 1000 + frame_idx AS media_id", "frame_png AS payload"
        )
    )
    pairs = simhash_hamming_pairs(hashed, "media_id", "dhash", bands=4, max_hamming=3)
    vids = {
        (min(a, b), max(a, b))
        for a, b in (
            (r["id_a"] // 1000, r["id_b"] // 1000) for r in pairs.collect()
        )
        if a != b
    }
    assert (1, 2) in vids and (1, 3) not in vids and (2, 3) not in vids
