"""Multimodal (image) stages: decode / feature-extract as actor pools.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt) —
the input-hint schema.  The decode step is STUBBED on this container
(no PIL/libjpeg): :mod:`planetiler_ray.codec` provides a deterministic
stand-in codec with real compression + (for "jpeg") real quantization
loss, so the Ray-side plumbing — actor-pool signature, batch sizing for
wide binary rows, output schema, PSNR validation — is fully real.  Swap
``codec.decode_image`` for a PIL call in deployment; nothing else
changes.

Usage:

    ds.map_batches(DecodeImages(), batch_format="pyarrow",
                   batch_size=256,        # small: rows are wide
                   concurrency=8)         # actor pool
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codec


class DecodeImages:
    """Actor-pool stage: decode image bytes → pixel stats + phash.

    ``__init__`` runs once per actor (codec/library setup); ``__call__``
    per batch.  Emits per-image: ok flag, mean/std pixel value, decoded
    w/h, recomputed phash, and PSNR vs the stored phash contract is
    validated downstream.
    """

    def __init__(self):
        # real deployments initialise PIL / turbojpeg handles here
        self.decode = codec.decode_image
        self.phash = codec.phash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        n = len(blobs)
        ok = np.zeros(n, bool)
        mean = np.full(n, np.nan)
        std = np.full(n, np.nan)
        sum_px = np.zeros(n, np.int64)  # exact integer pixel sum (oracle-friendly)
        w = np.zeros(n, np.int32)
        h = np.zeros(n, np.int32)
        ph = np.zeros(n, np.int64)
        for i, blob in enumerate(blobs):
            if not blob:
                continue
            try:
                px = self.decode(blob)
            except codec.ImageDecodeError:
                continue
            ok[i] = True
            mean[i] = float(px.mean())
            std[i] = float(px.std())
            sum_px[i] = int(px.sum(dtype=np.int64))
            h[i], w[i] = px.shape[:2]
            ph[i] = self.phash(px)
        return pa.table({
            "image_id": batch["image_id"],
            "ok": ok, "mean_px": mean, "std_px": std, "sum_px": sum_px,
            "dec_w": w, "dec_h": h, "phash_dec": ph,
            "phash_src": batch["phash"],
            "fmt": batch["fmt"],
        })


class ResizeStub:
    """Actor-pool stage shape for resize / frame-sample operators.

    The pixel kernel is a deterministic numpy nearest-neighbor resize on
    the stub codec's output (stands in for PIL's resampling); the
    actor/batch plumbing is the real article.
    """

    def __init__(self, target: tuple[int, int] = (8, 8)):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        out = []
        for blob in batch["bytes"].to_pylist():
            if not blob:
                out.append(None)
                continue
            try:
                px = codec.decode_image(blob)
            except codec.ImageDecodeError:
                out.append(None)
                continue
            ys = (np.arange(th) * px.shape[0]) // th
            xs = (np.arange(tw) * px.shape[1]) // tw
            small = px[ys][:, xs]
            out.append(codec.encode_image(np.ascontiguousarray(small), "png"))
        return pa.table({"image_id": batch["image_id"],
                         "thumb": pa.array(out, pa.binary())})
