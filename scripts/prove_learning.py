"""Learning-quality proof: the communication models actually LEARN to
communicate (VERDICT round-1 Missing #2).

Trains MIMOcom (the when2com flagship) on the *informative* synthetic
fixture (data/synthetic.py:generate_informative_fixture): degraded agents'
views are occluded while their labels stay full, and a distinct normal
partner observes the same content — so high mIoU on the degraded agents is
achievable ONLY by routing the partner's features through the attention
graph, and the graph argmax must match the gt link labels.

Success criteria (recorded in BASELINE.md and pinned by
tests/test_learning.py):
- overall mIoU on the memorized train set > 0.9;
- mimo when2com selection accuracy > the always-self baseline
  ((N - n_noisy) / N ~ 0.67 for 2/6 noisy agents) — i.e. the degraded
  agents' argmax links point at their partners.

Run: python scripts/prove_learning.py [--iters 400] [--cpu]
"""

import argparse
import logging
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(iters=400, batch=4, img=128, lr=1e-4, platform=None, root=None,
         val_interval=None, frames=32, tradeoff=False):
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    import numpy as np

    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.data import AirsimDataset, DataLoader
    from multiagentperception_tpu.data.synthetic import (
        generate_informative_fixture,
    )
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import get_trainer

    root = root or os.path.join(tempfile.mkdtemp(prefix="learnfx_"), "data")
    if not os.path.isdir(root):
        generate_informative_fixture(root, target_view="6agent", img_size=img,
                                     frames_per_traj=frames, n_noisy=2)
    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 6,
                  "shared_img_encoder": "unified", "attention": "general",
                  "sparse": False, "query": True, "query_size": 32,
                  "key_size": 1024, "enc_backbone": "resnet_encoder",
                  "dec_backbone": "simple_decoder", "feat_squeezer": -1,
                  "feat_channel": 512, "multiple_output": True},
        "data": {"dataset": "airsim", "img_rows": img, "img_cols": img,
                 "path": root, "target_view": "6agent",
                 "commun_label": "mimo"},
        "training": {"train_iters": iters, "batch_size": batch,
                     "val_interval": val_interval or iters, "n_workers": 2,
                     "print_interval": max(iters // 8, 1),
                     "optimizer": {"name": "adam", "lr": lr},
                     "loss": {"name": "cross_entropy", "size_average": True}},
    })
    ds = AirsimDataset(root, split="train", target_view="6agent",
                       img_size=(img, img), commun_label="mimo")
    trainloader = DataLoader(ds, batch, shuffle=True, drop_last=True,
                             num_workers=2, seed=0)
    evalloader = DataLoader(ds, batch, shuffle=False, num_workers=2)
    model = get_model(cfg, 11)
    trainer = get_trainer(cfg)(
        cfg, None, logging.getLogger("learn"), model, get_loss_function(cfg),
        trainloader, evalloader, get_optimizer(cfg))
    trainer.train()

    score, _ = trainer.evaluate(evalloader, inference_mode="activated")
    rm = trainer.last_eval_metrics
    miou = score["Mean IoU : \t"]
    when_acc, who_acc = rm.get_selection_accuracy()
    bandwidth = rm.get_avg_bandW() if rm.count else float("nan")
    n_noisy, n = 2, 6
    chance = 100.0 * (n - n_noisy) / n
    print(f"train-set mIoU (activated): {miou:.4f}")
    print(f"mimo when2com selection accuracy: {when_acc:.2f}% "
          f"(always-self baseline {chance:.1f}%)")
    print(f"who2com (noisy-agent link) accuracy: {who_acc:.2f}%")
    print(f"avg bandwidth (links/agent): {bandwidth:.3f}")

    miou_int8 = int8_miou(trainer, model, evalloader)
    print(f"train-set mIoU, int8-quantized serving path: {miou_int8:.4f} "
          f"(delta {miou_int8 - miou:+.4f})")
    if tradeoff:
        tradeoff_curve(trainer, cfg, evalloader)
    return miou, when_acc, who_acc, miou_int8


def tradeoff_curve(trainer, cfg, evalloader):
    """Bandwidth-vs-mIoU curve on the trained weights: the top-k pruned
    graph (k = 1..N), the activated threshold sweep, hard argmax, and full
    softmax fusion (BASELINE.json's bandwidth-constrained configuration).
    k and the threshold are static model/config attributes, so each point
    is its own compiled eval program over the same parameters."""
    import jax
    import jax.numpy as jnp

    from multiagentperception_tpu.metrics import runningScore
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.ops.comm import confusion_matrix

    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    batches = [(jnp.asarray(trainer._model_inputs(b[0])),
                jnp.asarray(trainer._labels(b[1]).astype("int32")))
               for b in evalloader]
    n = int(cfg["model"]["agent_num"])

    def run(model, inference):
        @jax.jit
        def step(variables, x, y):
            pred, prob, act, nc = model.apply(
                variables, x, train=False, mo_flag=True, inference=inference)
            hist = confusion_matrix(y, jnp.argmax(pred, -1), trainer.n_classes)
            return hist, nc

        rm = runningScore(trainer.n_classes)
        for x, y in batches:
            hist, nc = step(variables, x, y)
            rm.update_hist(hist)
            rm.update_bandW(float(nc))
        score, _ = rm.get_scores()
        return score["Mean IoU : \t"], rm.get_avg_bandW()

    rows = []
    for k in range(1, n + 1):
        model_k = get_model(
            {**cfg, "model": {**cfg["model"], "topk_k": k}}, trainer.n_classes)
        miou, bw = run(model_k, "topk")
        rows.append((f"topk k={k}", bw, miou))
    base = get_model(cfg, trainer.n_classes)
    for mode in ("argmax_test", "activated", "softmax"):
        miou, bw = run(base, mode)
        rows.append((mode, bw, miou))
    print("\nbandwidth-vs-mIoU tradeoff (trained fixture weights):")
    print(f"{'mode':>14s}  {'links/agent':>11s}  {'mIoU':>7s}")
    for mode, bw, miou in rows:
        print(f"{mode:>14s}  {bw:11.3f}  {miou:7.4f}")
    return rows


def int8_miou(trainer, model, evalloader):
    """mIoU of the post-training-quantized serving path (quantize.py) on the
    trained weights — the accuracy half of the int8 speedup claim."""
    import jax
    import jax.numpy as jnp

    from multiagentperception_tpu.metrics import runningScore
    from multiagentperception_tpu.ops.comm import confusion_matrix
    from multiagentperception_tpu.quantize import (
        calibrate_activations,
        quantized_apply,
    )

    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    batches = [(trainer._model_inputs(b[0]), trainer._labels(b[1]))
               for b in evalloader]
    scales = calibrate_activations(
        model, variables, [jnp.asarray(batches[0][0])],
        train=False, mo_flag=True, inference="activated")

    @jax.jit
    def step(variables, x, labels):
        pred, _, _, _ = quantized_apply(
            model, variables, x, act_scales=scales,
            train=False, mo_flag=True, inference="activated")
        return confusion_matrix(labels, jnp.argmax(pred, axis=-1),
                                trainer.n_classes)

    metrics = runningScore(trainer.n_classes)
    for x, y in batches:
        hist = step(variables, jnp.asarray(x), jnp.asarray(y.astype("int32")))
        metrics.update_hist(hist)
    score, _ = metrics.get_scores()
    return score["Mean IoU : \t"]


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--root", default=None)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--tradeoff", action="store_true",
                   help="after the proof, sweep the bandwidth-vs-mIoU curve")
    a = p.parse_args()
    main(iters=a.iters, batch=a.batch, lr=a.lr,
         platform="cpu" if a.cpu else None, root=a.root, frames=a.frames,
         tradeoff=a.tradeoff)
