"""Serving CLI: run an exported StableHLO artifact over a dataset split.

    python serve.py --config <yml> --artifact model.stablehlo \
        [--split test] [--out preds/] [--colorize] [--limit N]

Closes the production loop the reference never had (its eval path needs the
full Python model stack, reference test.py:20-121): the artifact produced by
``scripts/export_serving.py`` rehydrates WITHOUT model code — this CLI only
needs the data pipeline and ``jax.export`` — and emits per-frame class maps
(`<frame>_<cam>.png`, ids; ``--colorize`` adds an RGB panel) plus the comm
graph bandwidth. The artifact is self-describing: batch size and input
shape/dtype come from its serialized input avals (export.ServingArtifact);
the last partial batch is padded by repetition, trimmed after, and excluded
from the per-frame bandwidth accounting.
"""

from __future__ import annotations

import argparse
import os
import time


def main():
    p = argparse.ArgumentParser(description="serve an exported artifact")
    p.add_argument("--config", required=True)
    p.add_argument("--artifact", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--out", default="preds")
    p.add_argument("--colorize", action="store_true",
                   help="also write RGB-colorized panels")
    p.add_argument("--limit", type=int, default=None,
                   help="serve at most N frames")
    args = p.parse_args()

    from multiagentperception_tpu.utils import (
        apply_platform_override,
        enable_compile_cache,
        enable_hang_debug,
    )

    apply_platform_override()
    enable_compile_cache()
    enable_hang_debug()

    import numpy as np

    from multiagentperception_tpu.config import load_config
    from multiagentperception_tpu.data import get_loader
    from multiagentperception_tpu.export import load_serving

    cfg = load_config(args.config)
    data_cfg = cfg["data"]

    with open(args.artifact, "rb") as f:
        served = load_serving(f.read())

    loader_cls = get_loader(data_cfg["dataset"])
    ds = loader_cls(
        root=data_cfg["path"],
        split=args.split,
        img_size=(data_cfg["img_rows"], data_cfg["img_cols"]),
        commun_label="None",
        target_view=data_cfg["target_view"],
    )

    os.makedirs(args.out, exist_ok=True)
    n_frames = len(ds) if args.limit is None else min(len(ds), args.limit)
    if n_frames == 0:
        raise SystemExit(f"split '{args.split}' has no frames")

    # the artifact's serialized input avals carry its exact input spec
    batch = served.batch
    sample_shape = (1,) + np.asarray(ds[0][0]).shape
    if served.input_shape[1:] != sample_shape[1:]:
        raise SystemExit(
            f"artifact expects input {served.input_shape} "
            f"({served.input_dtype}), but this dataset/config yields "
            f"per-frame shape {sample_shape[1:]} — config mismatch")
    print(f"artifact batch={batch} input={served.input_shape} "
          f"{served.input_dtype}, serving {n_frames} frames "
          f"from split '{args.split}'")

    t0 = time.time()
    total_cams = 0
    bw_sum = 0.0

    def dispatch(i):
        """Dispatch one batch; device work proceeds asynchronously."""
        idxs = list(range(i, min(i + batch, n_frames)))
        ims = [np.asarray(ds[j][0]) for j in idxs]
        while len(ims) < batch:  # pad the tail by repetition
            ims.append(ims[-1])
        cls_map, prob, num_connect = served(np.stack(ims))
        return idxs, cls_map, num_connect

    def drain(idxs, cls_map, num_connect):
        nonlocal total_cams, bw_sum
        cls_map = np.asarray(cls_map)  # blocks: device->host readback
        nc = np.atleast_1d(np.asarray(num_connect)).reshape(-1)
        if nc.size == batch:
            # per-frame links (current exports): tail-batch padding frames
            # are simply excluded — exact accounting
            bw_sum += float(nc[: len(idxs)].sum())
        else:
            # legacy scalar artifact: batch mean includes padded frames
            bw_sum += float(nc.mean()) * len(idxs)
        # MO output is batch-major (b*N + cam); single-output is (B, H, W)
        n_cams = cls_map.shape[0] // batch if cls_map.ndim == 3 and \
            cls_map.shape[0] != batch else 1
        for bi, j in enumerate(idxs):
            for cam in range(n_cams):
                row = cls_map[bi * n_cams + cam] if n_cams > 1 else cls_map[bi]
                _write_pred(args.out, j, cam, row, ds, args.colorize)
                total_cams += 1

    # depth-2 pipeline (same as Trainer._pipelined_eval): batch k+1 is
    # dispatched before batch k's readback + PNG encode, so decode/encode
    # host work overlaps device execution
    from collections import deque

    pending: deque = deque()
    for i in range(0, n_frames, batch):
        pending.append(dispatch(i))
        if len(pending) > 2:
            drain(*pending.popleft())
    while pending:
        drain(*pending.popleft())
    dt = time.time() - t0
    print(f"wrote {total_cams} prediction maps ({n_frames} frames x "
          f"{total_cams // n_frames} cams) to {args.out}/ — "
          f"{n_frames / dt:.1f} frames/sec, {total_cams / dt:.1f} maps/sec "
          f"wall incl. decode+encode; "
          f"avg bandwidth {bw_sum / n_frames:.2f} links/agent")


def _write_pred(out_dir, frame_idx, cam, cls_map, ds, colorize):
    import numpy as np

    try:
        import cv2
    except ImportError:  # pragma: no cover
        cv2 = None

    base = os.path.join(out_dir, f"frame{frame_idx:05d}_cam{cam}")
    ids = cls_map.astype(np.uint8)
    if cv2 is not None:
        cv2.imwrite(base + ".png", ids)
        if colorize:
            rgb = ds.decode_segmap(ids)  # (H, W, 3) float 0..1
            cv2.imwrite(base + "_rgb.png",
                        (rgb[..., ::-1] * 255).astype(np.uint8))
    else:
        np.save(base + ".npy", ids)


if __name__ == "__main__":
    main()
