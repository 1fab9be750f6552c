"""Model registry (reference: ptsemseg/models/__init__.py:8-101)."""

from __future__ import annotations

from typing import Any, Mapping

from multiagentperception_tpu.models.agents import (
    AllAgents,
    LearnWhen2Com,
    LearnWho2Com,
    MIMOAllAgents,
    MIMOcom,
    MIMOcomWho,
    SingleAgent,
)

MODELS = {
    "Single_agent": SingleAgent,
    "All_agents": AllAgents,
    "MIMO_All_agents": MIMOAllAgents,
    "LearnWho2Com": LearnWho2Com,
    "LearnWhen2Com": LearnWhen2Com,
    "MIMOcom": MIMOcom,
    "MIMOcomWho": MIMOcomWho,
}


def get_model(cfg: Mapping[str, Any], n_classes: int, agent_mesh=None):
    """Build a model from a reference-schema config dict.

    Mirrors the constructor plumbing of the reference registry
    (models/__init__.py:8-86) — same config keys, same per-arch argument
    selection.

    ``agent_mesh``: a Mesh with an 'agent' axis routes MIMOcom's eval fusion
    through the ICI ring (parallel/ring.py) for large agent counts — built
    by the CLIs from ``model.agent_parallel`` / ``--agent_parallel``
    (parallel.agent_parallel_mesh).
    """
    m = cfg["model"]
    name = m["arch"]
    if name not in MODELS:
        raise KeyError(f"Model {name} not available")

    if name != "MIMOcom":
        # MIMOcom-only extension keys on another arch would otherwise no-op
        # silently (the raw-dict schema swallows them)
        import logging

        for k in ("pallas_comm", "topk_k", "remat", "agent_parallel",
                  "agent_parallel_train"):
            if m.get(k):
                logging.getLogger("multiagentperception_tpu").warning(
                    "config: model.%s is a MIMOcom extension and is ignored "
                    "for arch %s", k, name)

    # compute dtype: model.dtype ('bfloat16'|'float32') or the
    # training.mixed_precision shorthand; params/BN stats stay f32 either way
    dtype = None
    dtype_name = m.get("dtype")
    if dtype_name is None and cfg.get("training", {}).get("mixed_precision"):
        dtype_name = "bfloat16"
    if dtype_name not in (None, "None", "float32"):
        import jax.numpy as jnp

        dtype = {"bfloat16": jnp.bfloat16, "float16": jnp.float16}[dtype_name]

    common = dict(
        n_classes=n_classes,
        feat_channel=m.get("feat_channel", 512),
        feat_squeezer=m.get("feat_squeezer", -1),
        enc_backbone=m["enc_backbone"],
        dec_backbone=m["dec_backbone"],
        dtype=dtype,
    )
    if name == "Single_agent":
        return SingleAgent(**common)
    if name == "All_agents":
        return AllAgents(
            shuffle_flag=m.get("shuffle_features"),
            agent_num=m["agent_num"],
            **common,
        )
    if name == "MIMO_All_agents":
        return MIMOAllAgents(
            shuffle_flag=m.get("shuffle_features"),
            agent_num=m["agent_num"],
            **common,
        )
    comm = dict(
        attention=m["attention"],
        has_query=m["query"],
        sparse=m["sparse"],
        agent_num=m["agent_num"],
        shared_img_encoder=m["shared_img_encoder"],
        query_size=m["query_size"],
        key_size=m["key_size"],
        **common,
    )
    if name == "MIMOcom":
        comm["use_pallas_comm"] = bool(m.get("pallas_comm"))
        if comm["use_pallas_comm"] and agent_mesh is not None:
            # the ring branch handles argmax_test/activated itself and
            # returns before the Pallas branch (agents.py), so pallas_comm
            # would be silently ignored — make the conflict loud
            raise ValueError(
                "model.pallas_comm and agent-axis parallelism are mutually "
                "exclusive: the agent ring fuses the comm step itself, so "
                "the Pallas comm kernel would be silently bypassed. Drop "
                "model.pallas_comm or model.agent_parallel.")
        comm["remat"] = bool(m.get("remat"))
        # bandwidth-constrained top-k pruned graph (inference='topk'):
        # model.topk_k sets the per-query link budget
        if m.get("topk_k") is not None:
            comm["topk_k"] = int(m["topk_k"])
        if agent_mesh is not None:
            comm["agent_mesh"] = agent_mesh
            # model.agent_parallel_train: differentiate through the ring —
            # the TRAIN step's softmax fusion also runs agent-sharded
            comm["ring_train"] = bool(m.get("agent_parallel_train"))
        elif m.get("agent_parallel_train"):
            raise ValueError(
                "model.agent_parallel_train requires model.agent_parallel "
                "(no agent mesh was built — training would silently run "
                "dense)")
    elif agent_mesh is not None:
        raise ValueError(
            f"agent-axis parallelism is a MIMOcom feature (arch {name!r})")
    return MODELS[name](**comm)


__all__ = ["MODELS", "get_model"] + list(MODELS)
