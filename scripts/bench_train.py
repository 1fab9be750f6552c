"""Training-throughput benchmark for the flagship mrms_when2com (MIMOcom)
model: one full optimization step (forward + BN stats + backward + adam) on
real hardware, device time amortized over an on-device fori_loop (see
bench.py for why — ~20 ms tunnel RTT per dispatch in this image)."""

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax import lax

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.loss import cross_entropy2d
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.utils import init_variables


def bench_train(batch=4, img=512, agents=6, iters=10, mixed_precision=True):
    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": agents, "query_size": 32,
                  "key_size": 1024, "multiple_output": True},
        "data": {"img_rows": img, "img_cols": img},
        "training": {"mixed_precision": mixed_precision},
    })
    model = get_model(cfg, 11)
    x0 = jnp.zeros((batch, agents, img, img, 3), jnp.float32)
    variables = init_variables(
        model, {"params": jax.random.PRNGKey(0)}, x0, train=True, mo_flag=True
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-5)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 11, size=(batch * agents, img, img)), jnp.int32)

    def one_step(carry, images, labels):
        params, batch_stats, opt_state = carry

        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mo_flag=True, mutable=["batch_stats"],
            )
            return cross_entropy2d(out[0], labels), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_stats, new_opt), loss

    def make_loop(k):
        @jax.jit
        def loop(params, batch_stats, opt_state, images, labels):
            def body(i, carry):
                state, acc, x = carry
                state, loss = one_step(state, x, labels)
                x = x + jnp.asarray(1e-6, x.dtype) * (i + 1)
                return state, acc + loss, x

            state, acc, _ = lax.fori_loop(
                0, k, body, ((params, batch_stats, opt_state), jnp.float32(0), images)
            )
            return acc

        return loop

    def run(loop):
        np.asarray(loop(params, batch_stats, opt_state, xs, ys))
        t0 = time.time()
        np.asarray(loop(params, batch_stats, opt_state, xs, ys))
        return time.time() - t0

    lo, hi = make_loop(1), make_loop(1 + iters)
    t_lo = min(run(lo), run(lo))
    t_hi = min(run(hi), run(hi))
    dt = (t_hi - t_lo) / iters
    frames = batch * agents
    print(f"train step (batch={batch}, {'bf16' if mixed_precision else 'f32'}): "
          f"{dt*1000:.1f} ms -> {frames/dt:.1f} frames/sec")
    return frames / dt


if __name__ == "__main__":
    bench_train()
