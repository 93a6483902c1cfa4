"""B4 pad-to-max-in-batch collate: deterministic batch composition,
per-batch padding, partition-layout invariance."""

from __future__ import annotations

import hashlib

import numpy as np

from vietnamese_ocr_spark.operators.batching import pad_stack_batches


def _media(spark, n=70, seed=3):
    """Variable-width gray8 PNGs keyed by ref."""
    from vietnamese_ocr_spark.functions.imaging import png_encode

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(40, 200))
        img = rng.integers(0, 256, (64, w), dtype=np.uint8)
        rows.append((f"m-{i:04d}", bytearray(png_encode(img))))
    return spark.createDataFrame(rows, "media_ref string, png binary")


def _local_collate(spark, media_df, batch_size, seed=42):
    """Single-process mirror: same md5(seed:0:key) ranking, same pad."""
    from vietnamese_ocr_spark.functions.imaging import png_decode

    rows = [(r["media_ref"], bytes(r["png"])) for r in media_df.collect()]
    ranked = sorted(
        rows, key=lambda r: (hashlib.md5(f"{seed}:0:{r[0]}".encode()).hexdigest(), r[0])
    )
    out = {}
    for b in range(0, len(ranked), batch_size):
        grp = ranked[b : b + batch_size]
        imgs = [png_decode(p) for _, p in grp]
        h = max(im.shape[0] for im in imgs)
        mw = max(im.shape[1] for im in imgs)
        stacked = np.zeros((len(imgs), h, mw), dtype=np.uint8)
        for i, im in enumerate(imgs):
            stacked[i, : im.shape[0], : im.shape[1]] = im
        out[b // batch_size] = (
            len(imgs), h, mw, hashlib.md5(stacked.tobytes()).hexdigest()
        )
    return out


def test_collate_matches_local_mirror_and_keeps_partial_batch(spark):
    media = _media(spark, n=70)
    got = {
        r["batch_id"]: (r["n"], r["height"], r["max_width"], r["tensor_md5"])
        for r in pad_stack_batches(media, batch_size=32).collect()
    }
    want = _local_collate(spark, media, 32)
    assert got == want
    assert got[2][0] == 70 - 64  # last partial batch kept (B1 semantics)


def test_collate_partition_layout_invariant(spark):
    media = _media(spark, n=50)
    a = {r["batch_id"]: r["tensor_md5"]
         for r in pad_stack_batches(media, batch_size=16).collect()}
    b = {r["batch_id"]: r["tensor_md5"]
         for r in pad_stack_batches(media.repartition(7), batch_size=16).collect()}
    assert a == b and len(a) == 4


def test_pad_cells_accounting(spark):
    """pad_cells equals the sum of (batch_max_area - image_area) —
    the same quantity q_batch_slices accounts for on the events table."""
    from vietnamese_ocr_spark.functions.imaging import png_decode

    media = _media(spark, n=20)
    sizes = {
        r["media_ref"]: png_decode(bytes(r["png"])).shape for r in media.collect()
    }
    for r in pad_stack_batches(media, batch_size=8).collect():
        assert r["pad_cells"] >= 0
        assert r["height"] == 64
    total_pad = sum(r["pad_cells"] for r in pad_stack_batches(media, 8).collect())
    # global invariant: sum(batch areas) - sum(image areas)
    batches = _local_collate(spark, media, 8)
    want = sum(n * h * w for n, h, w, _ in batches.values()) - sum(
        h * w for h, w in sizes.values()
    )
    assert total_pad == want
