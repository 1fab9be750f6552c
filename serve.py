"""Serving CLI: run an exported StableHLO artifact over a dataset split.

    python serve.py --config <yml> --artifact model.stablehlo \
        [--split test] [--out preds/] [--colorize] [--limit N]

Closes the production loop the reference never had (its eval path needs the
full Python model stack, reference test.py:20-121): the artifact produced by
``scripts/export_serving.py`` rehydrates WITHOUT model code — this CLI only
needs the data pipeline and ``jax.export`` — and emits per-frame class maps
(`<frame>_<cam>.png`, ids; ``--colorize`` adds an RGB panel) plus the comm
graph bandwidth. Batch size is fixed by the artifact's input shape; the last
partial batch is padded by repetition and trimmed after.
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

    import jax

    # MAP_PLATFORM overrides the JAX platform in-process (this image's
    # sitecustomize rewrites JAX_PLATFORMS; same hook as train.py/test.py)
    if os.environ.get("MAP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MAP_PLATFORM"])

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

    # probe the batch size the artifact was exported with
    sample = np.asarray(ds[0][0])[None]  # (1, N, H, W, 3)
    batch = _probe_batch(served, sample)
    print(f"artifact batch={batch}, serving {n_frames} frames "
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
        # num_connect is the batch-mean link count. Weighting by the real
        # frame count is exact for full batches; on a padded tail the mean
        # still includes the duplicated frames, so the final average is
        # approximate when per-frame link counts differ within that batch
        bw_sum += float(np.asarray(num_connect)) * len(idxs)
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


def _probe_batch(served, sample):
    """Find the artifact's expected batch size by probing tiled inputs."""
    import numpy as np

    errs = []
    for b in (1, 2, 4, 8, 16, 20, 32):
        x = np.repeat(sample, b, axis=0)
        try:
            served(x)
            return b
        except Exception as e:
            errs.append(f"batch {b}: {e}")
            continue
    raise SystemExit("could not match the artifact's input batch size "
                     "(tried 1..32); re-export with a standard --batch.\n"
                     "first error: " + errs[0][:2000] + "\n"
                     "last error: " + errs[-1][:500])


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
