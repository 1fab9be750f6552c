"""Trainers (reference: ptsemseg/trainer.py, 8 near-identical classes).

One parametrized :class:`Trainer` drives every architecture; thin subclasses
``Trainer_<Arch>`` keep the reference's public surface (``.train() ->
save_path``, ``.load_weight(path)``, ``.evaluate(loader[, inference_mode])``).

TPU-native structure instead of the reference's per-batch Python loop body:

- the whole optimization step (forward incl. BN stat updates, loss, backward,
  optimizer update) is ONE jitted function ``(state, batch) -> (state,
  metrics)`` with donated state buffers;
- evaluation computes the confusion matrices and predictions on device
  (``ops.confusion_matrix`` one-hot matmuls); per batch the host reads back
  three (C, C) histograms + tiny action arrays instead of full label maps;
- DP/TP sharding: with a mesh, state is replicated / model-sharded once and
  batches are placed with a batch sharding; XLA inserts the gradient psum
  over ICI (replaces nn.DataParallel, train.py:177).

Behavioral parity notes (SURVEY.md §2.1): n_classes is fixed at 11 like every
reference trainer (trainer.py:44 etc.); in-training validation runs the
soft-fusion forward in BN-eval mode (reference: model.eval() +
training=True forward, trainer.py:694-722); per-arch eval defaults —
who2com 'argmax_test', when2com/MIMO 'activated' (trainer.py:251, 526, 774).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from multiagentperception_tpu.checkpoint import (
    load_checkpoint,
    resolve_checkpoint,
    save_checkpoint,
)
from multiagentperception_tpu.metrics import averageMeter, runningScore
from multiagentperception_tpu.ops.comm import confusion_matrix
from multiagentperception_tpu.ops.normalize import normalize_images
from multiagentperception_tpu.ops.pallas.upsample_argmax import (
    find_pre_logits,
    upsample_argmax,
)
from multiagentperception_tpu.parallel.mesh import (
    batch_sharding,
    chunk_batch_sharding,
    param_shardings,
    replicate_sharding,
)
from multiagentperception_tpu.utils import host_rss_gb, init_variables, reexec_self

N_CLASSES = 11  # hard-coded in every reference trainer (trainer.py:44, ...)

# arch families
_COMM_4TUPLE = {"MIMOcom", "MIMOcomWho"}  # forward returns (pred, prob, action, nc)
_COMM_SRMS = {"LearnWho2Com", "LearnWhen2Com"}


def chunk_sizes(start_iter: int, total: int, steps_per_call: int,
                *boundaries):
    """Successive steps_per_call chunk sizes from ``start_iter`` to ``total``,
    clipped so no chunk crosses a multiple of any boundary (val_interval,
    save_interval) — validation/checkpointing then still fire at exactly the
    configured iterations even though the device executes K steps per call."""
    i = int(start_iter)
    total = int(total)
    while i < total:
        k = min(int(steps_per_call), total - i)
        for b in boundaries:
            if b:
                k = min(k, int(b) - i % int(b))
        yield k
        i += k
_SELECTION = {"All_agents", "MIMO_All_agents"}  # may return (pred, action)
_EVAL_DEFAULT = {
    "LearnWhen2Com": "activated",
    "LearnWho2Com": "argmax_test",
    "MIMOcom": "activated",
    "MIMOcomWho": "activated",
}


class _StallWatchdog:
    """Background thread that dumps every thread's Python stack to stderr if
    no training progress heartbeat arrives within ``timeout_s``.

    Long runs on tunneled TPU hosts can hang inside a stalled device RPC —
    zero CPU use, no log movement, nothing to debug after the fact (this
    image ships no gdb/py-spy). The watchdog turns that silent hang into a
    loud, stack-attributed log event; the run can then be killed and resumed
    from the ``training.save_interval`` 'latest' checkpoint. Diagnosis only —
    it never kills or restarts anything itself.

    Two legitimate long silences must NOT trip it (a watchdog that cries
    wolf trains operators to ignore it):

    - the FIRST chunk, which includes compile (+ checkpoint restore on
      resume) — ~20 min observed for the flagship 512² through the tunnel
      vs the 600 s default timeout. Until the first beat() the threshold is
      ``timeout_s * FIRST_GRACE``;
    - a legitimately long ``steps_per_call`` chunk (K × step time can exceed
      the timeout). ``beat(expected_secs=...)`` raises the next threshold to
      3× the expected chunk duration when that exceeds the base timeout."""

    FIRST_GRACE = 6.0  # pre-first-step multiplier (compile + restore window)

    def __init__(self, timeout_s: float, logger):
        import threading

        self._timeout = float(timeout_s)
        self._next = float(timeout_s) * self.FIRST_GRACE
        self._logger = logger
        self._beat = time.time()
        self._dumped = False
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="stall-watchdog")
        self._thread.start()

    def beat(self, expected_secs: float | None = None) -> None:
        self._beat = time.time()
        self._dumped = False
        self._next = (self._timeout if expected_secs is None
                      else max(self._timeout, 3.0 * float(expected_secs)))

    def stop(self) -> None:
        self._stop.set()

    def _run(self) -> None:
        import faulthandler
        import sys

        while not self._stop.wait(min(self._timeout / 4.0, 30.0)):
            silent = time.time() - self._beat
            if silent > self._next and not self._dumped:
                self._dumped = True  # once per stall; beat() re-arms
                self._logger.warning(
                    "no training progress for %.0f s — likely a stalled "
                    "device RPC (tunneled TPU) or a blocked input pipeline; "
                    "dumping all thread stacks to stderr. If hung, kill and "
                    "resume from the 'latest' checkpoint "
                    "(training.save_interval).", silent)
                faulthandler.dump_traceback(file=sys.stderr, all_threads=True)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


class Trainer:
    """Architecture-parametrized trainer/evaluator."""

    # injection point for training.rss_limit_gb's restart (tests substitute
    # a recorder; production execs a fresh resumed process — utils.reexec_self)
    _reexec_fn = staticmethod(reexec_self)

    def __init__(
        self,
        cfg,
        writer,
        logger,
        model,
        loss_fn,
        trainloader,
        valloader,
        optimizer,
        scheduler=None,
        mesh=None,
        seed: int = 1337,
    ):
        self.cfg = cfg
        self.writer = writer
        self.logger = logger
        self.model = model
        self.loss_fn = loss_fn
        self.trainloader = trainloader
        self.valloader = valloader
        # `scheduler` is the optax schedule FUNCTION (step -> lr) the
        # optimizer was built with (train.py bakes it into optax; the
        # reference steps a stateful torch scheduler, trainer.py:658). The
        # trainer only uses it to log the current lr to TensorBoard.
        self.tx = optimizer
        self.schedule = scheduler
        self.mesh = mesh
        self.n_classes = N_CLASSES
        self.arch = cfg["model"]["arch"]
        self.MO_flag = bool(cfg["model"].get("multiple_output"))
        self.agent_num = int(cfg["model"].get("agent_num") or 5)
        self.if_commun_label = cfg["data"].get("commun_label", "None")
        # model.eval_inference overrides the per-arch default eval mode
        # (e.g. 'topk' for the bandwidth-constrained when2com config)
        self.eval_default = (cfg["model"].get("eval_inference")
                             or _EVAL_DEFAULT.get(self.arch))
        self.running_metrics_val = runningScore(self.n_classes)
        self.seed = seed
        self._last_save_path: str | None = None
        self._needs_action_rng = (
            self.arch in _SELECTION
            and cfg["model"].get("shuffle_features") == "selection"
        )
        # on-device normalization of raw uint8 inputs (our extension,
        # data.on_device_normalize; pairs with AirsimDataset(raw_images=True))
        self.normalize_on_device = bool(cfg["data"].get("on_device_normalize"))
        # jax.profiler trace capture (framework extension; the reference only
        # has wall-clock meters, trainer.py:645, 675-688): set
        # training.profile_dir to capture iters [10, 15) to that directory
        self.profile_dir = cfg["training"].get("profile_dir")
        self.profile_range = tuple(cfg["training"].get("profile_range", (10, 15)))
        self.state: TrainState | None = None
        self._jitted: dict = {}

    # ------------------------------------------------------------------
    # batch plumbing
    # ------------------------------------------------------------------
    def _model_inputs(self, images: np.ndarray) -> np.ndarray:
        """(B, N, H, W, 3) batch -> model input per arch family."""
        if self.arch == "Single_agent":
            if self.MO_flag:  # fold views into batch (trainer.py:1390-1392)
                b, n = images.shape[:2]
                return images.reshape((b * n,) + images.shape[2:])
            return images[:, 0]
        return images

    def _labels(self, labels: np.ndarray) -> np.ndarray:
        """(B, N, H, W) -> target per arch family (batch-major MO stacking).

        Targets travel as uint8: class ids are 0..10 and the ignore index is
        250, both < 256, and the host->device link is the eval bottleneck on
        tunneled hosts (4x less label traffic than int32)."""
        if self.MO_flag and self.arch != "All_agents":
            b, n = labels.shape[:2]
            labels = labels.reshape((b * n,) + labels.shape[2:])
        else:
            labels = labels[:, 0]
        return labels.astype(np.uint8, copy=False)

    def _apply_kwargs(self, train: bool, inference: str | None = None) -> dict:
        kw: dict = {"train": train}
        if self.arch in _COMM_4TUPLE:
            kw["mo_flag"] = self.MO_flag
            kw["inference"] = inference or "softmax"
        elif self.arch in _COMM_SRMS:
            kw["inference"] = inference or "softmax"
        return kw

    # ------------------------------------------------------------------
    # state / jit
    # ------------------------------------------------------------------
    def _init_rngs(self) -> dict:
        rngs = {"params": jax.random.PRNGKey(self.seed)}
        if self._needs_action_rng:
            rngs["action"] = jax.random.PRNGKey(self.seed + 1)
        return rngs

    def _init_state(self, example_images: np.ndarray) -> TrainState:
        x = jnp.asarray(self._model_inputs(example_images))
        variables = init_variables(self.model, self._init_rngs(), x,
                                   **self._apply_kwargs(True))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=jax.random.PRNGKey(self.seed + 2),
        )
        return self._place_state(state)

    def _abstract_state(self, example_images: np.ndarray) -> TrainState:
        """_init_state's tree as shape/dtype skeletons with ZERO device work
        (jax.eval_shape — no compile, no execution, no transfers). Used when
        a resume checkpoint is about to overwrite the state anyway: the real
        init's compile+run through the tunneled backend cost ~20 min per
        restart, all thrown away (found by the flagship run's rss_limit_gb
        restarts — the restarted image sat in `int(self.state.step)` waiting
        for the discarded init to drain). `rng` stays a real key: it is not
        checkpointed (_ckpt_dict), so resumed runs use it directly."""
        import functools

        x_np = np.asarray(self._model_inputs(example_images))
        x = jax.ShapeDtypeStruct(x_np.shape, x_np.dtype)
        init = functools.partial(self.model.init, **self._apply_kwargs(True))
        variables = jax.eval_shape(init, self._init_rngs(), x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = jax.eval_shape(self.tx.init, params)
        return TrainState(
            step=jax.ShapeDtypeStruct((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=jax.random.PRNGKey(self.seed + 2),
        )

    def _place_state(self, state: TrainState) -> TrainState:
        if self.mesh is None:
            return state
        rep = replicate_sharding(self.mesh)
        shardings = TrainState(
            step=rep,
            params=param_shardings(self.mesh, state.params),
            batch_stats=jax.tree_util.tree_map(
                lambda _: rep, state.batch_stats),
            opt_state=jax.tree_util.tree_map(lambda _: rep, state.opt_state),
            rng=rep,
        )
        return jax.device_put(state, shardings)

    def _local_stream(self) -> bool:
        """True when each jax process loads only ITS slice of the data
        (training.shard_data_by_process): batch_size is then PER-PROCESS and
        the global batch is process_count × batch_size. Without it, every
        process loads the identical global batch (same seed/order) and the
        plain device_put path below is correct."""
        return (jax.process_count() > 1
                and bool(self.cfg["training"].get("shard_data_by_process")))

    def _put_batch(self, *arrays, local: bool | None = None):
        """Device-place one batch. ``local`` says whether the caller's
        arrays are this process's SLICE of the global batch (the
        shard_data_by_process train stream) or the full global batch
        (non-sharded loaders — eval/val, where every process loads the same
        data); default: the train-stream semantics."""
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        bs = batch_sharding(self.mesh)
        if local is None:
            local = self._local_stream()
        if local and jax.process_count() > 1:
            # per-process LOCAL batches: device_put would treat each local
            # batch as the GLOBAL array and silently keep only this
            # process's addressable rows of it (half of every loaded batch
            # dropped at P=2) — assemble the global array from the local
            # shards instead
            return tuple(
                jax.make_array_from_process_local_data(bs, np.asarray(a))
                for a in arrays)
        # a partial tail batch (loader without drop_last) may not divide the
        # data axis; place it unsharded rather than failing — the jit
        # retraces for the new shape anyway, so per-batch placement is free
        n_data = self.mesh.shape.get("data", 1)
        if any(a.shape[0] % n_data for a in arrays):
            if jax.process_count() > 1:
                # a process-local (unsharded) array cannot feed a jit whose
                # state lives on the global mesh; replicate instead — every
                # process holds the identical full batch here
                rep = replicate_sharding(self.mesh)
                return tuple(jax.device_put(jnp.asarray(a), rep)
                             for a in arrays)
            return tuple(jnp.asarray(a) for a in arrays)
        return tuple(jax.device_put(jnp.asarray(a), bs) for a in arrays)

    def _train_step_fn(self) -> Callable:
        if "train" in self._jitted:
            return self._jitted["train"]
        self._jitted["train"] = jax.jit(self._train_step_body(),
                                        donate_argnums=0)
        return self._jitted["train"]

    def _train_multi_step_fn(self) -> Callable:
        """K train steps per dispatch: ``multi(state, xs, ys)`` scans the
        single-step body over a stacked (K, B, ...) chunk and returns
        ``(state, losses[K])``. One host->device transfer and ONE dispatch
        amortize the per-call RTT over K optimizer steps — the flagship 512²
        run measured ~250 ms/iter end-to-end vs a 70-90 ms device step, the
        difference being per-call dispatch on the tunneled backend
        (BASELINE.md flagship section). The reference has no analog (its loop
        is one synchronous CUDA step per Python iteration,
        trainer.py:642-700); on directly-attached TPU hosts this is the
        standard multi-step training-loop idiom."""
        if "train_multi" in self._jitted:
            return self._jitted["train_multi"]
        body = self._train_step_body()

        def multi(state: TrainState, xs, ys):
            def scan_step(s, xy):
                return body(s, xy[0], xy[1])

            return jax.lax.scan(scan_step, state, (xs, ys))

        self._jitted["train_multi"] = jax.jit(multi, donate_argnums=0)
        return self._jitted["train_multi"]

    def _train_step_body(self) -> Callable:
        """The un-jitted ``step(state, images, labels) -> (state, loss)``
        closure, shared by the single-step jit and the steps_per_call scan."""
        model = self.model
        tx = self.tx
        loss_fn = self.loss_fn
        needs_rng = self._needs_action_rng

        # training.freeze_bn_stats (fine-tuning extension): run BN on the
        # checkpoint's running averages and skip the per-batch stat updates —
        # torch's model.eval()-during-fine-tune idiom, and measured 12%
        # faster per step (BASELINE.md train ablation: the stat math costs
        # ~23 ms of the 198 ms step at batch 20). bn_train=False freezes ONLY
        # BatchNorm; the forward stays on the training branch (path
        # selection — dense vs ring — is governed by train/ring_train, not
        # by the BN mode)
        freeze_bn = bool(self.cfg["training"].get("freeze_bn_stats"))
        kw = self._apply_kwargs(True)
        if freeze_bn:
            kw["bn_train"] = False

        normalize = self.normalize_on_device

        def step(state: TrainState, images, labels):
            rng, action_rng = jax.random.split(state.rng)
            if normalize:
                images = normalize_images(images)

            def compute_loss(params):
                variables = {"params": params, "batch_stats": state.batch_stats}
                rngs = {"action": action_rng} if needs_rng else None
                if freeze_bn:
                    out = model.apply(variables, images, rngs=rngs, **kw)
                    new_stats = state.batch_stats
                else:
                    out, updates = model.apply(
                        variables, images, mutable=["batch_stats"],
                        rngs=rngs, **kw
                    )
                    new_stats = updates["batch_stats"]
                pred = out[0] if isinstance(out, tuple) else out
                loss = loss_fn(input=pred, target=labels)
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                rng=rng,
            )
            return new_state, loss

        return step

    def _eval_step_fn(self, inference: str | None, with_loss: bool,
                      int8_scales: dict | None = None) -> Callable:
        # scales are baked into the traced program as constants, so the jit
        # cache must key on their VALUES — a fresh calibration (different
        # eval data) must not silently reuse a stale compiled step
        scales_key = (None if int8_scales is None
                      else hash(tuple(sorted(int8_scales.items()))))
        key = ("eval", inference, with_loss, scales_key)
        if key in self._jitted:
            return self._jitted[key]
        model = self.model
        loss_fn = self.loss_fn
        kw = self._apply_kwargs(False, inference)
        needs_rng = self._needs_action_rng
        n_classes = self.n_classes
        mimo = self.if_commun_label == "mimo"
        agent_num = self.agent_num
        mo = self.MO_flag and self.arch != "All_agents"

        normalize = self.normalize_on_device

        def _quant_ctx():
            """int8 serving path (quantize.py): active only when calibrated
            scales were provided; the interceptor wraps the traced apply."""
            if int8_scales is None:
                return contextlib.nullcontext()
            from flax import linen as nn

            from multiagentperception_tpu.quantize import int8_interceptor

            return nn.intercept_methods(
                int8_interceptor(act_scales=int8_scales))

        def step(state: TrainState, images, labels, rng, commun_label=None):
            if normalize:
                images = normalize_images(images)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            # fresh key per eval batch: the randcom baselines re-randomize
            # their supporter pick every forward like the reference's
            # random.randint (agent.py:452-456); a fixed key would evaluate a
            # single supporter pattern instead of averaging over them
            rngs = {"action": rng} if needs_rng else None
            pre = None
            if with_loss:
                with _quant_ctx():
                    out = model.apply(variables, images, rngs=rngs, **kw)
            else:
                # capture the decoder's pre-upsample logits: the fused
                # Pallas upsample+argmax epilogue then computes the class
                # map in VMEM and XLA dead-code-eliminates the full-res
                # logits tensor (ops/pallas/upsample_argmax.py)
                with _quant_ctx():
                    out, mut = model.apply(
                        variables, images, rngs=rngs,
                        mutable=["intermediates"], **kw)
                pre = find_pre_logits(mut.get("intermediates"))
            pred_logits = out[0] if isinstance(out, tuple) else out
            if pre is not None and pre.shape[-1] == n_classes:
                pred = upsample_argmax(pre, labels.shape[-2], labels.shape[-1])
            else:
                pred = jnp.argmax(pred_logits, axis=-1)
            hist = confusion_matrix(labels, pred, n_classes)
            res = {"hist": hist, "pred_count": labels.shape[0]}
            if with_loss:
                res["loss"] = loss_fn(input=pred_logits, target=labels)
            if isinstance(out, tuple):
                if len(out) > 2 and out[2] is not None:
                    res["action"] = out[2]
                if len(out) > 3:
                    res["num_connect"] = out[3]
                elif len(out) == 2:
                    res["action"] = out[1]
            if commun_label is not None:
                if mimo:
                    normal = (commun_label[:, 0, :] == 0)  # (B, N)
                    flags = normal.reshape(-1) if mo else normal[:, 0]
                else:
                    flags = commun_label == -1  # (B,)
                res["hist_pos"] = confusion_matrix(
                    labels, pred, n_classes, sample_mask=flags
                )
                res["hist_neg"] = confusion_matrix(
                    labels, pred, n_classes, sample_mask=~flags
                )
            return res

        self._jitted[key] = jax.jit(step)
        return self._jitted[key]

    def _calibrate_int8(self, loader, inference: str | None,
                        calib_loader=None) -> dict:
        """Static activation scales for the int8 eval path
        (quantize.calibrate_activations).

        Calibration frames come from ``calib_loader`` if given, else the
        TRAIN loader, else ``loader`` itself (last resort — calibrating on
        the split being evaluated leaks eval data into the quantization
        config). ``training.calib_batches`` (default 4) batches are
        max-reduced; a single-batch calibration under-covers activation
        outliers (scale-drift test: tests/test_quantize.py)."""
        from multiagentperception_tpu.quantize import calibrate_activations

        model = self.model
        if self.cfg["model"].get("remat"):
            # the calibration recorder cannot capture inside nn.remat
            # regions (see calibrate_activations); remat doesn't change the
            # param tree, so calibrate on a remat-free twin
            from multiagentperception_tpu.models import get_model

            cfg = {**self.cfg, "model": {**self.cfg["model"], "remat": False}}
            model = get_model(cfg, self.n_classes)

        # explicit None checks: an empty DataLoader is falsy (len 0), and
        # silently swapping it for the eval loader would both leak eval data
        # into the scales and suppress the warning below
        src = calib_loader if calib_loader is not None else (
            self.trainloader if self.trainloader is not None else loader)
        if calib_loader is None and self.trainloader is None:
            self.logger.warning(
                "int8 calibration falling back to the evaluation loader "
                "itself; pass calib_loader (test.py --calib_split) to "
                "calibrate on held-out frames")
        n_batches = int(self.cfg["training"].get("calib_batches") or 4)
        ds = getattr(src, "dataset", None)
        bs = int(getattr(src, "batch_size", None) or 1)
        if ds is not None:
            n = min(len(ds), n_batches * bs)
            frames = [np.asarray(ds[i][0]) for i in range(n)]
            batches = [np.stack(frames[i:i + bs])
                       for i in range(0, n, bs)]
        else:
            batches = [self._example_images(src)]
        if not batches:
            raise ValueError(
                "int8 calibration source yielded no frames; pass a non-empty "
                "calib_loader or train split")

        def prep(images):
            x = jnp.asarray(self._model_inputs(images))
            return normalize_images(x) if self.normalize_on_device else x

        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        kw = self._apply_kwargs(False, inference)
        rngs = ({"action": jax.random.PRNGKey(0)}
                if self._needs_action_rng else None)
        # equal-size batches share one compiled recording program; a ragged
        # tail batch would force a recompile, so drop it when avoidable
        sizes = {b.shape[0] for b in batches}
        if len(sizes) > 1:
            batches = [b for b in batches if b.shape[0] == bs] or batches[:1]
        return calibrate_activations(model, variables,
                                     [prep(b) for b in batches],
                                     rngs=rngs, **kw)

    # ------------------------------------------------------------------
    # selection-accuracy plumbing
    # ------------------------------------------------------------------
    def _update_selection(self, metrics: runningScore, commun_label, action):
        if self.if_commun_label == "None" or action is None:
            return
        action = np.asarray(action)
        if self.arch == "LearnWho2Com":
            # +1: the requester is not a candidate key (trainer.py:454-455)
            action = action + 1
        metrics.update_selection(self.if_commun_label, np.asarray(commun_label), action)

    # ------------------------------------------------------------------
    # eval pipelining + loader plumbing
    # ------------------------------------------------------------------
    def _example_images(self, loader) -> np.ndarray:
        """A shape-correct example batch for state init WITHOUT consuming the
        loader: ``next(iter(loader))`` would spin a producer thread that
        prefetches and then blocks forever, leaking the thread and the first
        epoch's leading batches."""
        ds = getattr(loader, "dataset", None)
        bs = getattr(loader, "batch_size", None)
        if ds is not None and bs:
            sample = ds[0]
            return np.stack([np.asarray(sample[0])] * int(bs), axis=0)
        return next(iter(loader))[0]

    def _train_batches(self):
        """Endless train-batch stream. Grain-backed loaders iterate their
        *persistent* (checkpointable) iterator so a resumed run continues
        mid-epoch; the default loader restarts per-epoch shuffles."""
        if hasattr(self.trainloader, "persistent_iterator"):
            it = self.trainloader.persistent_iterator()
            while True:
                yield next(it)
        else:
            while True:
                yield from self.trainloader

    def _split_batch(self, data_list):
        if self.if_commun_label != "None":
            images, labels, commun_label = data_list
        else:
            (images, labels), commun_label = data_list[:2], None
        return images, labels, commun_label

    def _device_train_batches(self):
        """Yield (x_dev, y_dev, commun_label, stream_state) with the NEXT
        batch's host work (decode/collate + host->device transfer) overlapped
        behind the current device step (training.device_prefetch, default
        depth 2; 0 = synchronous).

        The transfer term is real: on tunneled hosts a 512d batch costs more
        wall-clock than the device step itself (BASELINE.md eval table), and
        even PCIe hosts pay ~ms per batch. ``stream_state`` is the grain
        iterator position captured in the producer immediately after pulling
        that batch — checkpointing THIS value (not the live iterator, which
        runs up to `depth` batches ahead) keeps preemption resume exact under
        prefetch."""
        has_state = hasattr(self.trainloader, "get_state")

        def prepared():
            for data_list in self._train_batches():
                images, labels, commun_label = self._split_batch(data_list)
                x, y = self._put_batch(
                    self._model_inputs(images), self._labels(labels))
                state = self.trainloader.get_state() if has_state else None
                yield x, y, commun_label, state

        return self._prefetched(prepared(), self._prefetch_depth())

    def _prefetch_depth(self) -> int:
        depth = self.cfg["training"].get("device_prefetch")
        return 2 if depth is None else int(depth)

    def _prefetched(self, gen, depth: int):
        """Drain ``gen`` in a producer thread, keeping up to ``depth`` items
        (already device-placed) queued ahead of the consumer."""
        if depth <= 0:
            yield from gen
            return

        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=depth)
        stop = threading.Event()

        def _put(item) -> None:
            # stop-checking put: an unbounded blocking q.put would pin the
            # producer (and its `depth` device-placed batches) forever if
            # the consumer exited first with the queue full
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return
                except queue.Full:
                    continue

        def produce():
            try:
                for item in gen:
                    _put(item)
                    if stop.is_set():
                        return
            except BaseException as exc:  # surface loader errors in the consumer
                _put(exc)

        t = threading.Thread(target=produce, daemon=True,
                             name="train-device-prefetch")
        t.start()
        # exposed for _shutdown_input_pipeline (rss_limit_gb re-exec): the
        # generator's own finally only runs when the consumer loop unwinds
        self._prefetch_stop, self._prefetch_thread = stop, t
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def _shutdown_input_pipeline(self) -> None:
        """Best-effort teardown of the prefetch thread and the train loader
        before an exec-restart (utils.reexec_self): stop the producer, join
        it briefly, and ask the loader to drop its iterator (grain worker
        processes exit when their parent-side pipes close)."""
        stop = getattr(self, "_prefetch_stop", None)
        if stop is not None:
            stop.set()
        t = getattr(self, "_prefetch_thread", None)
        if t is not None and t.is_alive():
            t.join(timeout=5.0)
        shutdown = getattr(self.trainloader, "shutdown", None)
        if callable(shutdown):
            shutdown()
        import gc

        gc.collect()

    def _put_chunk(self, *arrays):
        """Place a stacked (K, B, ...) steps_per_call chunk: batch axis 1
        sharded over 'data' when divisible (axis 0 is scanned sequentially,
        _train_multi_step_fn)."""
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        cs = chunk_batch_sharding(self.mesh)
        if self._local_stream():
            # per-process local chunks -> one global array (see _put_batch)
            return tuple(
                jax.make_array_from_process_local_data(cs, np.asarray(a))
                for a in arrays)
        n_data = self.mesh.shape.get("data", 1)
        if any(a.shape[1] % n_data for a in arrays):
            return tuple(jnp.asarray(a) for a in arrays)
        return tuple(jax.device_put(jnp.asarray(a), cs) for a in arrays)

    def _device_train_chunks(self, steps_per_call: int, start_iter: int,
                             cfg_t: dict):
        """Yield (xs, ys, k, stream_state) stacked chunks for the multi-step
        path, prefetched like _device_train_batches. Chunks never cross a
        validation/save/end boundary (chunk_sizes), so those actions still
        fire at exactly the configured iterations. ``stream_state`` is the
        data position AFTER the chunk's last batch — checkpoints only happen
        at chunk ends, so preemption resume stays exact."""
        has_state = hasattr(self.trainloader, "get_state")

        def prepared():
            batches = self._train_batches()
            for k in chunk_sizes(start_iter, int(cfg_t["train_iters"]),
                                 steps_per_call, cfg_t["val_interval"],
                                 cfg_t.get("save_interval")):
                xs, ys = [], []
                for _ in range(k):
                    images, labels, _cl = self._split_batch(next(batches))
                    xs.append(self._model_inputs(images))
                    ys.append(self._labels(labels))
                state = self.trainloader.get_state() if has_state else None
                x, y = self._put_chunk(np.stack(xs), np.stack(ys))
                yield x, y, k, state

        return self._prefetched(prepared(), self._prefetch_depth())

    def _dispatch_eval(self, eval_step, data_list, batch_idx: int, base_rng):
        commun_label = None
        if self.if_commun_label != "None":
            images, labels, commun_label = data_list
        else:
            images, labels = data_list[0], data_list[1]
        x, y = self._put_batch(self._model_inputs(images), self._labels(labels))
        rng = jax.random.fold_in(base_rng, batch_idx)
        args = (self.state, x, y, rng)
        if commun_label is not None:
            args += (jnp.asarray(commun_label),)
        return eval_step(*args), commun_label

    def _pipelined_eval(self, loader, eval_step, depth: int = 2):
        """Yield (res, commun_label) with up to ``depth`` eval steps in
        flight: batch k+1 is dispatched before batch k's device arrays are
        read back, hiding the dispatch RTT (~20 ms through this image's
        tunnel) and the device step behind host-side metric work. The
        reference's loop is fully synchronous (trainer.py:774-840)."""
        from collections import deque

        base_rng = jax.random.PRNGKey(self.seed + 3)
        pending: deque = deque()
        for bi, data_list in enumerate(loader):
            pending.append(self._dispatch_eval(eval_step, data_list, bi, base_rng))
            if len(pending) > depth:
                yield pending.popleft()
        while pending:
            yield pending.popleft()

    # ------------------------------------------------------------------
    # public API (reference trainer surface)
    # ------------------------------------------------------------------
    def train(self) -> str:
        cfg_t = self.cfg["training"]
        start_iter = 0
        save_path = None

        # resolve resume FIRST: when a checkpoint will overwrite the state
        # anyway, build only its shape skeleton (_abstract_state) instead of
        # compiling+running a device init whose result is discarded —
        # through the tunneled backend that waste was ~20 min per
        # rss_limit_gb restart. Swap-state resolution handles runs preempted
        # MID-SAVE ('.new'/'.old', checkpoint.resolve_checkpoint).
        resume = cfg_t.get("resume")
        resolved = resolve_checkpoint(str(resume)) if resume is not None else None
        if self.state is None:
            example = self._example_images(self.trainloader)
            self.state = (self._abstract_state(example) if resolved is not None
                          else self._init_state(example))

        best_iou = -100.0
        if resolved is not None:
            best_iou = self._restore_full(resolved)
            start_iter = int(self.state.step)
            self.logger.info("Loaded checkpoint '%s' (iter %d)",
                             resolved, start_iter)
        elif resume is not None:
            self.logger.info("No checkpoint found at '%s'", resume)

        train_step = self._train_step_fn()
        val_loss_meter = averageMeter()
        time_meter = averageMeter()
        # preemption-safe periodic checkpointing (framework extension; the
        # reference only saves on new-best val mIoU, trainer.py:751-764):
        # training.save_interval writes/overwrites a 'latest' checkpoint
        # (+data-stream position) every K iters; training.resume accepts it
        save_interval = cfg_t.get("save_interval")
        i = start_iter

        # stall diagnosis (framework extension): training.watchdog_secs
        # (default 600; 0 disables) — see _StallWatchdog
        watchdog_secs = cfg_t.get("watchdog_secs")
        watchdog_secs = 600.0 if watchdog_secs is None else float(watchdog_secs)
        watchdog = (_StallWatchdog(watchdog_secs, self.logger)
                    if watchdog_secs > 0 else None)
        try:
            self._train_loop(cfg_t, train_step, val_loss_meter, time_meter,
                             save_interval, i, best_iou, watchdog)
        finally:
            if watchdog is not None:
                watchdog.stop()
        return self._last_save_path

    def _train_loop(self, cfg_t, train_step, val_loss_meter, time_meter,
                    save_interval, i, best_iou, watchdog):
        save_path = None

        # self-healing host-memory limit (framework extension):
        # training.rss_limit_gb — when the process RSS crosses the limit,
        # checkpoint 'latest' and exec a fresh process that resumes exactly.
        # Exists because this image's tunneled TPU backend leaks host memory
        # per transfer (~21 MB/iter at 512², native, unfixable from Python);
        # without it any long run is OOM-killed mid-iteration (observed at
        # iter 12800/20000 of the flagship run). See utils.reexec_self.
        rss_limit = float(cfg_t.get("rss_limit_gb") or 0.0)
        if rss_limit and jax.process_count() > 1:
            # exec'ing one process of a jax.distributed job would desync the
            # collective/barrier stream on the other hosts
            self.logger.warning(
                "training.rss_limit_gb is single-process only; disabling "
                "(process_count=%d)", jax.process_count())
            rss_limit = 0.0
        rss_baseline_logged = False

        # training.steps_per_call (framework extension): K optimizer steps
        # per device dispatch (lax.scan over a stacked chunk,
        # _train_multi_step_fn) — amortizes the per-call dispatch RTT that
        # made the flagship 512² run ~3x slower end-to-end than its device
        # step (BASELINE.md flagship section). Chunks never cross a
        # validation/save boundary, so cadence is unchanged; pick K dividing
        # val_interval/save_interval or the straggler chunks each compile
        # their own scan length.
        steps_per_call = max(1, int(cfg_t.get("steps_per_call") or 1))
        if steps_per_call > 1:
            for b_name in ("val_interval", "save_interval"):
                b = cfg_t.get(b_name)
                if b and int(b) % steps_per_call:
                    self.logger.info(
                        "steps_per_call=%d does not divide %s=%d: boundary "
                        "chunks will be shorter (one extra compile each)",
                        steps_per_call, b_name, int(b))
            multi_step = self._train_multi_step_fn()
            stream = self._device_train_chunks(steps_per_call, i, cfg_t)
        else:
            multi_step = None
            stream = ((x, y, 1, st) for x, y, _cl, st
                      in self._device_train_batches())

        print_interval = int(cfg_t["print_interval"])
        per_iter_est = None  # measured per-step wall time (None until the
        # first completed chunk — beating before it would drop the
        # watchdog's FIRST_GRACE threshold in the middle of the compile)
        for x, y, k, stream_state in stream:
            self._consumed_stream_state = stream_state
            if watchdog is not None and per_iter_est is not None:
                watchdog.beat(expected_secs=k * per_iter_est)

            start_ts = time.time()
            if self.profile_dir and i < self.profile_range[0] <= i + k:
                jax.profiler.start_trace(self.profile_dir)
            if multi_step is None:
                self.state, loss = train_step(self.state, x, y)
                losses = None
            else:
                self.state, losses = multi_step(self.state, x, y)
            if self.profile_dir and i < self.profile_range[1] <= i + k:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()

            # on print iters the loss readback drains the device queue FIRST,
            # so the timed window measures real work, not dispatch (through
            # the tunnel only a host readback blocks — BASELINE.md artifact)
            loss_host = None
            if any((i + j + 2) % print_interval == 0 for j in range(k)):
                loss_host = (np.asarray(losses) if losses is not None
                             else np.asarray([float(loss)]))
            per_iter = (time.time() - start_ts) / k
            per_iter_est = per_iter

            for j in range(k):
                i += 1
                time_meter.update(per_iter)
                if (i + 1) % print_interval == 0:
                    loss_val = float(loss_host[j])
                    print_str = (
                        f"Iter [{i + 1:d}/{cfg_t['train_iters']:d}]  "
                        f"Loss: {loss_val:.4f}  "
                        f"Time/Image: "
                        f"{time_meter.avg / cfg_t['batch_size']:.4f}"
                    )
                    print(print_str)
                    self.logger.info(print_str)
                    if self.writer is not None:
                        self.writer.add_scalar(
                            "loss/train_loss", loss_val, i + 1)
                        if self.schedule is not None:
                            self.writer.add_scalar(
                                "lr", float(self.schedule(i)), i + 1)
                    time_meter.reset()

            if i % cfg_t["val_interval"] == 0 or i == cfg_t["train_iters"]:
                self._validate(i, val_loss_meter)
                score, _ = self.running_metrics_val.get_scores()
                miou = score["Mean IoU : \t"]
                self._log_val_scores(i)
                val_loss_meter.reset()
                self.running_metrics_val.reset()
                if miou >= best_iou:
                    best_iou = miou
                    save_path = self._save_best(i, best_iou)

            if save_interval and i % int(save_interval) == 0:
                self._save_ckpt("latest", i, best_iou)

            if rss_limit and i < cfg_t["train_iters"]:
                rss = host_rss_gb()
                if not rss_baseline_logged:
                    rss_baseline_logged = True
                    if rss >= rss_limit:
                        # a limit below the post-compile working set would
                        # exec-loop forever — refuse it instead
                        self.logger.warning(
                            "training.rss_limit_gb=%.1f is below this "
                            "process's working RSS %.2f GiB; disabling the "
                            "restart guard", rss_limit, rss)
                        rss_limit = 0.0
                elif rss > rss_limit:
                    path = self._save_ckpt("latest", i, best_iou)
                    self.logger.warning(
                        "RSS %.2f GiB > training.rss_limit_gb=%.1f at iter "
                        "%d: checkpointed '%s', re-exec'ing to shed the "
                        "leaked host memory", rss, rss_limit, i, path)
                    if self.writer is not None:
                        self.writer.flush()
                    # release the input pipeline BEFORE the exec: execv skips
                    # interpreter shutdown, and the prefetch thread / grain
                    # loader are referenced by this very stack frame, so
                    # reexec_self's gc.collect alone frees nothing
                    self._shutdown_input_pipeline()
                    self._reexec_fn(path)  # never returns in production
                    self._last_save_path = save_path
                    return

            if i >= cfg_t["train_iters"]:
                break
        self._last_save_path = save_path

    def _validate(self, i: int, val_loss_meter: averageMeter):
        eval_step = self._eval_step_fn(None, with_loss=True)
        for res, commun_label in self._pipelined_eval(self.valloader, eval_step):
            self.running_metrics_val.update_hist(
                res["hist"], res.get("hist_pos"), res.get("hist_neg")
            )
            if commun_label is not None and "action" in res:
                self._update_selection(
                    self.running_metrics_val, commun_label, res["action"]
                )
            val_loss_meter.update(float(res["loss"]))
        self._val_loss_avg = val_loss_meter.avg

    def _log_val_scores(self, i: int):
        rm = self.running_metrics_val
        if self.if_commun_label != "None" and rm.total_agent > 0:
            when_acc, who_acc = rm.get_selection_accuracy()
            print(f"Validation when2com accuracy:{when_acc}")
            print(f"Validation who2com accuracy:{who_acc}")
            if self.writer is not None:
                self.writer.add_scalar("val_metrics/when_com_accuacy", when_acc, i)
                self.writer.add_scalar("val_metrics/who_com_accuracy", who_acc, i)
        if self.writer is not None:
            self.writer.add_scalar("loss/val_loss", self._val_loss_avg, i)
        self.logger.info("Iter %d Loss: %.4f", i, self._val_loss_avg)
        sections = []
        if self.if_commun_label != "None":
            sections += [
                ("Normal", rm.get_only_normal_scores()),
                ("Noise", rm.get_only_noise_scores()),
            ]
        sections.append(("Overall", rm.get_scores()))
        for title, (score, class_iou) in sections:
            print(title)
            rm.print_score(self.n_classes, score, class_iou)
        if self.writer is not None:
            score, class_iou = rm.get_scores()
            for k, v in score.items():
                self.writer.add_scalar(f"val_metrics/{k.strip()}", v, i)
            for k, v in class_iou.items():
                self.writer.add_scalar(f"val_metrics/cls_{k}", v, i)

    # ------------------------------------------------------------------
    def _ckpt_dict(self, i: int, best_iou: float) -> dict:
        return {
            "epoch": np.asarray(i),
            "model_state": {
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(self.state.batch_stats),
            },
            "optimizer_state": jax.device_get(self.state.opt_state),
            "best_iou": np.asarray(best_iou),
        }

    def _save_ckpt(self, name: str, i: int, best_iou: float) -> str:
        logdir = (
            self.writer.file_writer.get_logdir()
            if self.writer is not None
            else os.path.join("runs", "default")
        )
        # multi-host DP: single-writer checkpointing. State is replicated
        # (every host holds the full PyTree) and ALL processes call
        # save_checkpoint — orbax's save issues internal cross-process
        # barriers, so a process skipping the call desynchronizes the
        # barrier stream (found by scripts/dryrun_multiprocess.py); only
        # process 0 touches the filesystem (checkpoint.save_checkpoint).
        # EVERY process's data-stream position rides in the sidecar
        # (checkpoint.pack_process_sidecars, a collective allgather), so a
        # resumed multi-host run continues each process's stream exactly
        # mid-epoch — validated by scripts/dryrun_multiprocess.py leg 6.
        save_path = os.path.join(
            logdir,
            f"{self.cfg['model']['arch']}_{self.cfg['data']['dataset']}_{name}.ckpt",
        )
        # checkpointable data stream (grain backend): the iterator position
        # is variable-length bytes; it rides through save_checkpoint's
        # crash-safe swap as a sidecar so the restored model state and data
        # position always pair up. Resume continues mid-epoch where the
        # reference restarts its DataLoader (reference trainer.py:59-75).
        # Under device prefetch the LIVE iterator runs ahead of the trained
        # batches, so we save the position captured with the last CONSUMED
        # batch (_device_train_batches) — falling back to the live state
        # only outside the train loop (e.g. a save before any step).
        sidecar = getattr(self, "_consumed_stream_state", None)
        if sidecar is None and hasattr(self.trainloader, "get_state"):
            sidecar = self.trainloader.get_state()
        if sidecar is not None and jax.process_count() > 1:
            # collective: every process contributes its own position (all
            # processes run this symmetric code path, so the allgather
            # pairs up)
            from multiagentperception_tpu.checkpoint import pack_process_sidecars

            sidecar = pack_process_sidecars(sidecar)
        save_checkpoint(save_path, self._ckpt_dict(i, best_iou),
                        sidecar=sidecar)
        return save_path

    def _save_best(self, i: int, best_iou: float) -> str:
        return self._save_ckpt("best_model", i, best_iou)

    def _abstract_ckpt_dict(self) -> dict:
        """Shape/dtype-only template matching _ckpt_dict's tree — used as the
        orbax restore target so resume never reads the (about-to-be-
        overwritten) initialized state back from the device. On tunneled TPU
        hosts that readback is ~340 MB of pure waste and was observed to hang
        outright on a degraded tunnel (diagnosed via training.watchdog_secs +
        SIGUSR1; see ARCHITECTURE.md round-4 notes)."""
        def abstract(tree):
            # .shape/.dtype (not jnp.shape) so the template also builds from
            # a state that is itself abstract (_abstract_state resume path)
            return jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)

        return {
            "epoch": jax.ShapeDtypeStruct((), np.asarray(0).dtype),
            "model_state": {
                "params": abstract(self.state.params),
                "batch_stats": abstract(self.state.batch_stats),
            },
            "optimizer_state": abstract(self.state.opt_state),
            "best_iou": jax.ShapeDtypeStruct((), np.asarray(0.0).dtype),
        }

    def _restore_full(self, path: str) -> float:
        """Restore the full training state; returns the checkpoint's
        best-so-far val mIoU so resumed runs don't overwrite the best
        checkpoint with a worse one."""
        restored = load_checkpoint(path, target=self._abstract_ckpt_dict())
        # restored leaves are HOST arrays: with a mesh they are placed here;
        # single-device state uploads lazily with the first jitted step (one
        # batched transfer instead of orbax per-leaf puts)
        self.state = self._place_state(self.state.replace(
            step=jnp.asarray(int(restored["epoch"]), jnp.int32),
            params=restored["model_state"]["params"],
            batch_stats=restored["model_state"]["batch_stats"],
            opt_state=restored["optimizer_state"],
        ))
        # the sidecar lives inside the resolved candidate (save_checkpoint),
        # so it always pairs with exactly this model state
        from multiagentperception_tpu.checkpoint import (
            read_sidecar,
            unpack_process_sidecar,
        )

        sidecar = read_sidecar(str(path))
        if sidecar is not None:
            local = unpack_process_sidecar(sidecar)
            if local is None:
                self.logger.warning(
                    "checkpoint '%s' saved per-process data positions for a "
                    "different process count; data stream restarts at the "
                    "epoch boundary", path)
            elif hasattr(self.trainloader, "set_state"):
                self.trainloader.set_state(local)
                self.logger.info(
                    "Restored data-stream position from '%s'", path)
        return float(restored["best_iou"])

    def load_weight(self, model_path: str):
        """Load params/batch_stats only (reference: trainer.py:246-248).

        Restores without a target tree: the optimizer state on disk may have
        been built with a different LR schedule than this session's (e.g.
        eval-time test.py), and only the model state matters here.
        """
        if self.state is None:
            loader = self.valloader or self.trainloader
            self.state = self._init_state(self._example_images(loader))
        if os.path.isfile(model_path):
            # A plain file is a reference torch checkpoint (.pkl saved by
            # /root/reference/ptsemseg/trainer.py:229-240); orbax checkpoints
            # are directories. Convert the torch state_dict into our PyTree
            # (compat/torch_import.py) so reference-trained weights evaluate
            # here directly (reference load path: trainer.py:770-772).
            from multiagentperception_tpu.compat import load_reference_checkpoint

            template = {"params": self.state.params,
                        "batch_stats": self.state.batch_stats}
            variables = load_reference_checkpoint(
                self.cfg, self.n_classes, model_path, template)
        else:
            # a run preempted mid-save leaves the newest complete checkpoint
            # at '.new'/'.old' (checkpoint.resolve_checkpoint)
            model_path = resolve_checkpoint(model_path) or model_path
            try:
                # typed restore keeps shardings/dtypes (an untyped restore
                # replicates everything and drops the training sharding)
                restored = load_checkpoint(
                    model_path, target=self._ckpt_dict(0, 0.0))
            except Exception:
                # optimizer tree on disk may differ from this session's
                # (e.g. a different optimizer name at eval time)
                restored = load_checkpoint(model_path)
            variables = restored["model_state"]
        self.state = self.state.replace(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
        )

    def evaluate(self, testloader, inference_mode: str | None = None,
                 int8: bool = False, calib_loader=None):
        """Test-split evaluation with Normal/Noise/Overall breakdown and
        bandwidth reporting (reference: trainer.py:774-840).

        ``int8=True`` runs the post-training-quantized serving path
        (quantize.py): activation scales are calibrated over
        ``training.calib_batches`` batches of ``calib_loader`` (default: the
        train loader), conv towers run int8 on the MXU (1.27x measured at
        mIoU parity, BASELINE.md)."""
        if inference_mode is None:
            inference_mode = self.eval_default
        if self.state is None:
            self.state = self._init_state(self._example_images(testloader))
        scales = (self._calibrate_int8(testloader, inference_mode,
                                       calib_loader=calib_loader)
                  if int8 else None)
        eval_step = self._eval_step_fn(inference_mode, with_loss=False,
                                       int8_scales=scales)
        running_metrics = runningScore(self.n_classes)

        for res, commun_label in self._pipelined_eval(testloader, eval_step):
            running_metrics.update_hist(
                res["hist"], res.get("hist_pos"), res.get("hist_neg")
            )
            if "num_connect" in res:
                running_metrics.update_bandW(float(res["num_connect"]))
            # the reference's LearnWhen2Com.evaluate skips update_selection
            # (trainer.py:251-301); Who2Com and the MIMO trainers report it
            if (
                commun_label is not None
                and "action" in res
                and self.arch != "LearnWhen2Com"
            ):
                self._update_selection(running_metrics, commun_label, res["action"])

        if self.if_commun_label != "None" and running_metrics.total_agent > 0:
            when_acc, who_acc = running_metrics.get_selection_accuracy()
            print(f"Validation when2com accuracy:{when_acc}")
            print(f"Validation who2com accuracy:{who_acc}")
        if running_metrics.count > 0:
            print("Bandwidth: " + str(running_metrics.get_avg_bandW()))

        sections = []
        if self.if_commun_label != "None":
            sections += [
                ("Normal", running_metrics.get_only_normal_scores()),
                ("Noise", running_metrics.get_only_noise_scores()),
            ]
        sections.append(("Overall", running_metrics.get_scores()))
        for title, (score, class_iou) in sections:
            print(title)
            running_metrics.print_score(self.n_classes, score, class_iou)

        score, class_iou = running_metrics.get_scores()
        # programmatic access to selection accuracy / bandwidth / splits
        # (the reference only prints them, trainer.py:815-838)
        self.last_eval_metrics = running_metrics
        return score, class_iou


# ---------------------------------------------------------------------------
# per-arch classes (reference: Trainer_LearnWhen2Com at trainer.py:31, etc.)
# ---------------------------------------------------------------------------
class Trainer_LearnWhen2Com(Trainer):
    pass


class Trainer_LearnWho2Com(Trainer):
    pass


class Trainer_MIMOcom(Trainer):
    pass


class Trainer_MIMOcomWho(Trainer):
    pass


class Trainer_MIMO_All_agents(Trainer):
    pass


class Trainer_Single_agent(Trainer):
    pass


class Trainer_All_agents(Trainer):
    pass


ARCH2TRAINER = {
    "LearnWhen2Com": Trainer_LearnWhen2Com,
    "LearnWho2Com": Trainer_LearnWho2Com,
    "MIMOcom": Trainer_MIMOcom,
    "MIMOcomWho": Trainer_MIMOcomWho,
    "MIMO_All_agents": Trainer_MIMO_All_agents,
    "Single_agent": Trainer_Single_agent,
    "All_agents": Trainer_All_agents,
}


def get_trainer(cfg) -> type[Trainer]:
    """Per-arch trainer dispatch (reference: train.py:195-212)."""
    arch = cfg["model"]["arch"]
    if arch not in ARCH2TRAINER:
        raise KeyError(f"No trainer for arch {arch}")
    return ARCH2TRAINER[arch]
