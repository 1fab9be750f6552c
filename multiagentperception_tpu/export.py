"""Serving export: serialize a jitted eval step to a portable artifact.

Production-deployment path the reference lacks entirely: ``jax.export``
lowers the flagship eval function (encoder -> handshake -> pruned fusion ->
decoder -> class map) to versioned StableHLO that a serving binary rehydrates
without Python model code. Weights are baked as constants by default (single
artifact) or kept as inputs (``bake_weights=False``) for weight-hotswap
serving.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import export as jax_export


def make_eval_fn(model, mo_flag: bool = True, inference: str = "activated",
                 apply_fn=None):
    """The canonical serving function: images -> (class map, comm graph,
    per-frame bandwidth ``(B,)``).

    The bandwidth output is per batch element (ops.comm.per_frame_links) so a
    padded tail batch can be accounted exactly at serving time; its mean
    equals the model's scalar ``num_connect``.

    ``apply_fn`` substitutes for ``model.apply`` (same signature) so variant
    serving graphs — quantize.make_int8_eval_fn's interceptor-wrapped apply —
    share this bandwidth accounting instead of copying it.
    """
    from multiagentperception_tpu.ops.comm import per_frame_links

    apply = apply_fn if apply_fn is not None else model.apply

    def eval_fn(variables, images):
        pred, prob, action, num_connect = apply(
            variables, images, train=False, mo_flag=mo_flag, inference=inference
        )
        if prob.ndim == 3 and prob.shape[1] == prob.shape[2]:
            nc = per_frame_links(prob, inference, prob.shape[1],
                                 topk_k=getattr(model, "topk_k", 2))
        else:  # SRMS single-query graphs: broadcast the model scalar
            nc = jnp.broadcast_to(num_connect, (images.shape[0],))
        return jnp.argmax(pred, axis=-1).astype(jnp.int32), prob, nc

    return eval_fn


def export_serving(
    model,
    variables,
    input_shape: tuple,
    input_dtype=jnp.float32,
    inference: str = "activated",
    mo_flag: bool = True,
    bake_weights: bool = True,
    int8: bool = False,
    act_scales: dict | None = None,
) -> bytes:
    """Serialize the eval step; returns the artifact bytes.

    ``int8=True`` exports the post-training-quantized serving graph
    (quantize.py): conv towers run int8 on the MXU; with ``bake_weights``
    the int8 kernels are constant-folded into the artifact. ``act_scales``
    (from quantize.calibrate_activations) bakes static activation scales —
    the fast path; without it activations are scaled dynamically.
    """
    if int8:
        from multiagentperception_tpu.quantize import make_int8_eval_fn
        eval_fn = make_int8_eval_fn(model, mo_flag, inference,
                                    act_scales=act_scales)
    else:
        eval_fn = make_eval_fn(model, mo_flag, inference)
    x_spec = jax.ShapeDtypeStruct(input_shape, input_dtype)
    if bake_weights:
        fn = jax.jit(functools.partial(eval_fn, variables))
        exported = jax_export.export(fn)(x_spec)
    else:
        v_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
        )
        exported = jax_export.export(jax.jit(eval_fn))(v_spec, x_spec)
    return bytes(exported.serialize())


class ServingArtifact:
    """A rehydrated serving artifact: callable, and self-describing.

    ``jax.export`` serializes the input avals with the program, so the
    artifact's expected batch/shape/dtype are read directly — no probing
    (the image input is the last positional aval; weight-hotswap exports
    put the variable tree first).
    """

    def __init__(self, exported):
        self.exported = exported
        self.in_avals = exported.in_avals

    @property
    def input_shape(self) -> tuple:
        return tuple(self.in_avals[-1].shape)

    @property
    def input_dtype(self):
        return self.in_avals[-1].dtype

    @property
    def batch(self) -> int:
        return int(self.input_shape[0])

    def __call__(self, *args):
        return self.exported.call(*args)


def load_serving(artifact: bytes) -> ServingArtifact:
    """Rehydrate an exported artifact into a self-describing callable."""
    return ServingArtifact(jax_export.deserialize(artifact))
